"""Significant terms — Solr's ``{!sigterms}`` handler
(``solr/core/src/java/org/apache/solr/search/SignificantTermsQParserPlugin.java``)
and the ``significantTerms`` streaming expression
(``solr/solrj/.../io/stream/SignificantTermsStream.java``).

Reference semantics (SignificantTermsQParserPlugin.java:155-215): for every
term in the field — subject to doc-freq bounds (absolute when ≥1, fraction of
numDocs when <1.0) and a minimum term length — count ``fg`` = number of
FOREGROUND docs (docs matching q) containing the term, then score

    score = log(fg) * (log((numDocs + 1) / (docFreq + 1)) + 1.0)

and keep the top ``limit``. docFreq bounds apply to the GLOBAL df (the
reference enumerates the merged reader), so per-segment pruning on df is not
sound — the scan decodes every posting (that IS the operator; a manifest-level
global-df column would enable pushdown at scale and is the documented
evolution path).

Ray shape: one scatter for the foreground match ids (per-segment local ids,
broadcast via ``ray.put``), then a ``map_batches`` over the postings parquet
(column-pruned to ``seg,term,df,doc_blob``) doing a zero-copy batch FOR
decode + sorted-membership count per term — partials ``(term, df, fg)`` move,
never postings. Final scoring runs once over the pruned candidate table with
scalar ``math.log`` (float64 sql-compat; the reference computes in float32 —
rankings are compared after round(score, 6) like the MLT oracle).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _foreground_by_seg(searcher, query) -> dict[int, np.ndarray]:
    """seg → sorted local ids of foreground (query-matching) docs."""
    out: dict[int, list[np.ndarray]] = {}
    scattered = searcher._scatter_match(query, "ids")
    if scattered is None:
        raise ValueError("significant_terms requires a term-routable query")
    for b in scattered.iter_batches(batch_format="pyarrow"):
        if len(b) == 0:
            continue
        segs = b["seg"].to_numpy()
        lids = b["local_id"].to_numpy().astype(np.int64)
        for sv in np.unique(segs):
            out.setdefault(int(sv), []).append(lids[segs == sv])
    return {s: np.sort(np.concatenate(parts)) for s, parts in out.items()}


class _CountForeground:
    """Actor: decode each term's doc list, count hits in the broadcast
    foreground set for that segment → (term, df, fg) partials."""

    def __init__(self, fg_ref, min_term_length: int):
        import ray

        self.fg = ray.get(fg_ref)
        self.min_len = min_term_length

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util.forutil import decode_sequences

        if self.min_len > 1:
            batch = batch.filter(
                pc.greater_equal(pc.utf8_length(batch["term"]), self.min_len)
            )
        if batch.num_rows == 0:
            return pa.table({
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "fg": pa.array([], pa.int64()),
            })
        parts = []
        for sv in pc.unique(batch["seg"]).to_pylist():
            t = batch.filter(pc.equal(batch["seg"], sv))
            fg_ids = self.fg.get(int(sv))
            dfs = t["df"].to_numpy().astype(np.int64)
            if fg_ids is None or len(fg_ids) == 0:
                fg_counts = np.zeros(len(t), dtype=np.int64)
            else:
                arr = t["doc_blob"].combine_chunks()
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.chunk(0)
                bufs = arr.buffers()
                offs = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1,
                                     offset=arr.offset * 8)
                data = (np.frombuffer(bufs[2], dtype=np.uint8)
                        if bufs[2] is not None else np.zeros(0, np.uint8))
                deltas = decode_sequences(data, offs, dfs)
                # segmented cumsum → local ids (delta encoding stores id0+1)
                starts = np.zeros(len(dfs) + 1, dtype=np.int64)
                np.cumsum(dfs, out=starts[1:])
                c = np.cumsum(deltas)
                base = np.where(starts[:-1] > 0, c[np.maximum(starts[:-1] - 1, 0)], 0)
                ids = c - np.repeat(base, dfs) - 1
                # sorted-membership: fg_ids is sorted, ids ascend per term
                pos = np.searchsorted(fg_ids, ids)
                hit = (pos < len(fg_ids)) & (fg_ids[np.minimum(pos, len(fg_ids) - 1)] == ids)
                fg_counts = np.add.reduceat(hit.astype(np.int64), starts[:-1]) \
                    if len(ids) else np.zeros(len(t), np.int64)
                fg_counts[dfs == 0] = 0
            parts.append(pa.table({
                "term": t["term"].cast(pa.string()),
                "df": pa.array(dfs, pa.int64()),
                "fg": pa.array(fg_counts, pa.int64()),
            }))
        return pa.concat_tables(parts)


def _combine_partials(batch: pa.Table) -> pa.Table:
    g = pa.TableGroupBy(batch, ["term"]).aggregate([("df", "sum"), ("fg", "sum")])
    return pa.table({
        "term": g["term"],
        "df": g["df_sum"],
        "fg": g["fg_sum"],
    })


def significant_terms(searcher, query, limit: int = 20,
                      min_doc_freq: float = 5, max_doc_freq: float = 0.3,
                      min_term_length: int = 4) -> pa.Table:
    """→ (rank, term, fg, df): top ``limit`` terms of the content field by
    the reference score, ranked (round(score,6) desc, term asc). Bounds <1.0
    are fractions of numDocs (SignificantTermsQParserPlugin.java:168-186)."""
    import ray
    import ray.data

    fg_by_seg = _foreground_by_seg(searcher, query)
    fg_ref = ray.put(fg_by_seg)
    ds = ray.data.read_parquet(
        searcher.reader.postings_files(),
        columns=["seg", "term", "df", "doc_blob"],
        filter=pc.field("field") == "content",
    )
    partials = ds.map_batches(
        _CountForeground,
        fn_constructor_kwargs=dict(fg_ref=fg_ref, min_term_length=min_term_length),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
        max_restarts=0,
    )
    combined = partials.repartition(1).map_batches(
        _combine_partials, batch_format="pyarrow", batch_size=None
    )
    tbl = pa.concat_tables(combined.iter_batches(batch_format="pyarrow"))

    num_docs = searcher.reader.stats.doc_count
    lo = min_doc_freq if min_doc_freq >= 1.0 else min_doc_freq * num_docs
    hi = max_doc_freq if max_doc_freq >= 1.0 else max_doc_freq * num_docs
    df = tbl["df"].to_numpy().astype(np.int64)
    fg = tbl["fg"].to_numpy().astype(np.int64)
    keep = (fg > 0) & (df >= lo) & (df <= hi)
    terms = np.asarray(tbl["term"].to_pylist(), dtype=object)[keep]
    df, fg = df[keep], fg[keep]
    scores = np.asarray([
        round(math.log(f) * (math.log((num_docs + 1) / (d + 1)) + 1.0), 6)
        for f, d in zip(fg.tolist(), df.tolist())
    ])
    order = np.lexsort((terms, -scores))[:limit]
    return pa.table({
        "rank": pa.array(np.arange(len(order)), pa.int64()),
        "term": pa.array(terms[order], pa.string()),
        "fg": pa.array(fg[order], pa.int64()),
        "df": pa.array(df[order], pa.int64()),
    })
