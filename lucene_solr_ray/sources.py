"""Corpus sources beyond Parquet — the Solr update-handler formats.

Reference: Solr ingests JSON and CSV through its loaders
(``solr/core/src/java/org/apache/solr/handler/loader/JsonLoader.java`` /
``CSVLoader.java``); here each becomes a Ray Data read returning the
engine's 5-column corpus schema (repo, path, commit, lang, content), ready
for :func:`lucene_solr_ray.index.build.build_index`.

Both readers stream (Ray Data's JSON/CSV datasources split by file/block);
schema is validated and coerced once per batch, vectorized.
"""

from __future__ import annotations

import pyarrow as pa

CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def _coerce(batch: pa.Table) -> pa.Table:
    missing = [c for c in CORPUS_COLUMNS if c not in batch.column_names]
    if missing:
        raise ValueError(f"corpus source missing columns: {missing}")
    return pa.table(
        {
            "repo": batch["repo"].cast(pa.string()),
            "path": batch["path"].cast(pa.string()),
            "commit": batch["commit"].cast(pa.string()),
            "lang": batch["lang"].cast(pa.string()),
            "content": batch["content"].cast(pa.large_string()),
        }
    )


def read_corpus_jsonl(path: str):
    """JSON-lines corpus (Solr JsonLoader analog) → corpus Dataset."""
    import ray.data

    return ray.data.read_json(path).map_batches(_coerce, batch_format="pyarrow")


def read_corpus_csv(path: str):
    """CSV corpus (Solr CSVLoader analog) → corpus Dataset."""
    import ray.data

    return ray.data.read_csv(path).map_batches(_coerce, batch_format="pyarrow")


def read_corpus_solr_xml(paths: str | list[str]):
    """Solr XML update format (``solr/core/src/java/org/apache/solr/handler/
    loader/XMLLoader.java``: ``<add><doc><field name="...">...</field>``) →
    corpus Dataset. One or many ``.xml`` files; each file may carry any
    number of ``<doc>`` elements.

    Ray shape: files are the parallelism unit (``read_binary_files`` +
    per-file parse in ``map_batches`` — XML is not block-splittable, same
    trade Solr's loader makes per POST body). Field names map 1:1 to the
    corpus columns; missing fields raise, extra fields are ignored
    (XMLLoader's unknown-field behavior is schema-driven; our schema IS the
    5 corpus columns)."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        import xml.etree.ElementTree as ET

        rows: dict[str, list] = {c: [] for c in CORPUS_COLUMNS}
        for blob in batch["bytes"].to_pylist():
            root = ET.fromstring(blob.decode("utf-8"))
            docs = root.iter("doc") if root.tag in ("add", "update") else (
                [root] if root.tag == "doc" else root.iter("doc"))
            for doc in docs:
                # itertext() captures full element text (CDATA mixed with
                # children); repeated <field name=...> raises — the corpus
                # schema is single-valued, and silently keeping one value
                # would drop data (Solr's XMLLoader appends multivalued
                # fields; ADVICE r4)
                fields: dict[str, str] = {}
                for f in doc.iter("field"):
                    name = f.get("name")
                    if name in fields:
                        raise ValueError(
                            f"solr xml doc repeats single-valued field "
                            f"{name!r} (corpus schema has no multivalued "
                            f"fields)")
                    fields[name] = "".join(f.itertext())
                missing = [c for c in CORPUS_COLUMNS if c not in fields]
                if missing:
                    raise ValueError(
                        f"solr xml doc missing fields: {missing}")
                for c in CORPUS_COLUMNS:
                    rows[c].append(fields[c])
        return pa.table({
            "repo": pa.array(rows["repo"], pa.string()),
            "path": pa.array(rows["path"], pa.string()),
            "commit": pa.array(rows["commit"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "content": pa.array(rows["content"], pa.large_string()),
        })

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow")


def read_corpus_solr_json(paths: str | list[str]):
    """Solr JSON update format (``JsonLoader.java``): a top-level ARRAY of
    doc objects, or the command form ``{"add": {"doc": {...}}, ...}`` (one
    or repeated ``add`` keys are both accepted by Solr's streaming parser;
    json.loads surfaces only the last repeated key, which is the documented
    restriction here — use the array form for bulk). One doc object per
    corpus row."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        import json

        out: list[dict] = []
        for blob in batch["bytes"].to_pylist():
            data = json.loads(blob.decode("utf-8"))
            if isinstance(data, list):
                docs = data
            elif isinstance(data, dict):
                if "add" not in data:
                    raise ValueError(
                        "solr json update: dict payload has no 'add' key "
                        "(only add commands and doc arrays are supported)")
                add = data["add"]
                if isinstance(add, dict):
                    add = [add]
                docs = [a.get("doc", a) for a in add]
            else:
                raise ValueError("unsupported solr json update payload")
            out.extend(docs)
        rows = {c: [] for c in CORPUS_COLUMNS}
        for d in out:
            missing = [c for c in CORPUS_COLUMNS if c not in d]
            if missing:
                raise ValueError(f"solr json doc missing fields: {missing}")
            for c in CORPUS_COLUMNS:
                rows[c].append(str(d[c]))
        return pa.table({
            "repo": pa.array(rows["repo"], pa.string()),
            "path": pa.array(rows["path"], pa.string()),
            "commit": pa.array(rows["commit"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "content": pa.array(rows["content"], pa.large_string()),
        })

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow")
