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
