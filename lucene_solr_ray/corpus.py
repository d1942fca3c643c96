"""Deterministic synthetic source-code corpus generator (FIXTURES.md §1).

Produces the canonical 5-column input table from BASELINE.json's input_hint:
``repo:string, path:string, commit:string, lang:string, content:large_string``.

Content mixes language keywords, a zipf-distributed identifier vocabulary
(~10k identifiers, s≈1.2), an Apache-license-style header on ~60% of files
(drives realistic term skew), numeric literals, and an occasional >255-char
token (exercises the maxTokenLength skip semantics of
``StandardTokenizer.java:154-164``).

Everything derives from a fixed seed; no wall clock, no external data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

LICENSE_HEADER = (
    "Licensed to the Apache Software Foundation ASF under one or more "
    "contributor license agreements. See the NOTICE file distributed with "
    "this work for additional information regarding copyright ownership. "
    "The ASF licenses this file to You under the Apache License Version 2.0 "
    "the License. You may not use this file except in compliance with the "
    "License. You may obtain a copy of the License at "
    "http://www.apache.org/licenses/LICENSE-2.0"
)

_KEYWORDS = (
    "def return class int public static void import from for while else elif "
    "func var let const fn pub struct impl match type interface package"
).split()

_EXTS = ["py", "java", "go", "js", "rs", "md"]
_LANG = {"py": "python", "java": "java", "go": "go", "js": "javascript", "rs": "rust", "md": "markdown"}
_DIRS = ["core", "util", "search", "index", "store", "analysis", "codec", "io"]

SIZES = {"tiny": 64, "small": 5_000, "bench": 200_000}


def _identifier_vocab(rng: np.random.Generator, n: int = 10_000) -> np.ndarray:
    syll = np.array(
        "get set buf idx tmp node list map hash term doc seg read write pos "
        "len val ptr ctx cfg arr iter tok str num fmt enc dec sum acc key".split()
    )
    a = rng.integers(0, len(syll), size=n)
    b = rng.integers(0, len(syll), size=n)
    c = rng.integers(0, 100, size=n)
    vocab = np.array([f"{syll[i]}_{syll[j]}{k}" for i, j, k in zip(a, b, c)], dtype=object)
    return vocab


CHUNK_ROWS = 10_000  # generation chunk: rng seeded per (seed, chunk) → parallelizable


def _vocab_and_probs(seed: int):
    rng = np.random.default_rng([seed, 777001])
    vocab = _identifier_vocab(rng)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = ranks ** -1.2
    probs /= probs.sum()
    return vocab, probs


def generate_chunk(start: int, n: int, seed: int = 42) -> pa.Table:
    """Rows [start, start+n) of the corpus; deterministic per (seed, chunk) —
    independent of how many chunks are generated or in what order."""
    vocab, probs = _vocab_and_probs(seed)
    rng = np.random.default_rng([seed, start // CHUNK_ROWS + 1])
    idx = np.arange(start, start + n)

    repo = np.array([f"org{i % 7}/repo{i % 23}" for i in idx], dtype=object)
    ext_idx = rng.integers(0, len(_EXTS), size=n)
    dir_idx = rng.integers(0, len(_DIRS), size=n)
    path = np.array(
        [f"src/{_DIRS[dir_idx[j]]}/file_{i}.{_EXTS[ext_idx[j]]}" for j, i in enumerate(idx)],
        dtype=object,
    )
    commit = np.array([rng.bytes(20).hex() for _ in range(n)], dtype=object)
    lang = np.array([_LANG[_EXTS[j]] for j in ext_idx], dtype=object)

    has_header = rng.random(n) < 0.6
    n_idents = rng.integers(30, 220, size=n)

    contents = np.empty(n, dtype=object)
    for j in range(n):
        i = int(idx[j])
        k = int(n_idents[j])
        idents = vocab[rng.choice(len(vocab), size=k, p=probs)]
        kws = [_KEYWORDS[x] for x in rng.integers(0, len(_KEYWORDS), size=max(4, k // 6))]
        nums = [str(int(x)) for x in rng.integers(0, 99999, size=max(2, k // 10))]
        parts: list[str] = []
        if has_header[j]:
            parts.append(LICENSE_HEADER)
        body: list[str] = []
        for t in range(k):
            body.append(idents[t])
            if t < len(kws):
                body.append(kws[t])
            if t < len(nums):
                body.append(f"{nums[t]};")
            if t % 7 == 3:
                body.append(f"{idents[t]}.call(arg{t % 5})")
        parts.append(" ".join(body))
        if i % 97 == 13:  # occasional overlong token: skipped by the analyzer
            parts.append("x" * 300)
        contents[j] = "\n".join(parts)

    return pa.table(
        {
            "repo": pa.array(repo, type=pa.string()),
            "path": pa.array(path, type=pa.string()),
            "commit": pa.array(commit, type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
            "content": pa.array(contents, type=pa.large_string()),
        }
    )


def generate_corpus(n_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic corpus table; same (n_rows, seed) → byte-identical table."""
    chunks = [
        generate_chunk(s, min(CHUNK_ROWS, n_rows - s), seed)
        for s in range(0, n_rows, CHUNK_ROWS)
    ] or [generate_chunk(0, 0, seed)]
    return pa.concat_tables(chunks)


def corpus_sha256(table: pa.Table) -> list[str]:
    return [hashlib.sha256(c.encode("utf-8")).hexdigest() for c in table["content"].to_pylist()]


def write_corpus(
    out_dir: str, n_rows: int, seed: int = 42, parallel: bool | None = None
) -> list[str]:
    """Write the corpus as one Parquet file per generation chunk —
    a deterministic layout regardless of parallelism. If a Ray session is
    live, chunks are generated as parallel Ray tasks."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    chunk_starts = list(range(0, n_rows, CHUNK_ROWS)) or [0]

    def write_one(start: int) -> str:
        n = min(CHUNK_ROWS, n_rows - start) if n_rows else 0
        p = os.path.join(out_dir, f"part-{start // CHUNK_ROWS:05d}.parquet")
        pq.write_table(generate_chunk(start, n, seed), p)
        return p

    use_ray = parallel
    if use_ray is None:
        try:
            import ray

            use_ray = ray.is_initialized() and len(chunk_starts) > 1
        except ImportError:
            use_ray = False
    if use_ray:
        import ray

        task = ray.remote(write_one)
        return ray.get([task.remote(s) for s in chunk_starts])
    return [write_one(s) for s in chunk_starts]


def documents_as_corpus(sf_dir: str):
    """Map the driver's ``documents`` table into the 5-column corpus schema.

    Used to run the engine over /root/testdata tables (TESTDATA.md): each
    document row becomes one "source file"; content is the document text.
    """
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")

    def to_corpus(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        return pa.table(
            {
                "repo": batch["source"].cast(pa.string()),
                "path": pa.array([f"doc/{d}" for d in doc_ids], type=pa.string()),
                "commit": pa.array([f"{d:040x}" for d in doc_ids], type=pa.string()),
                "lang": batch["lang"].cast(pa.string()),
                "content": batch["text"].cast(pa.large_string()),
            }
        )

    return ds.map_batches(to_corpus, batch_format="pyarrow")
