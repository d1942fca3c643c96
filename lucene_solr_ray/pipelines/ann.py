"""Similarity search over the ``embeddings`` table (list<float> column).

- :func:`ann_topk` — brute-force cosine top-k: the query matrix is broadcast
  once (``ray.put``), each batch does one numpy matmul against it and emits a
  per-batch partial top-k (pre-aggregation), the driver merges the tiny
  partials. No shuffle; scales linearly with corpus blocks.
- :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH buckets
  (deterministic seeded planes) restrict each query to its bucket. Approximate
  → no SQL oracle (rows-only driver check); recall vs brute force is pinned in
  pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

N_QUERIES = 10
TOP_K = 10
LSH_PLANES = 5  # planes per table → 2^5 buckets
LSH_TABLES = 4  # candidate set = union over tables (classic multi-table LSH)
LSH_SEED = 42


def _emb(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t["vec_id"], N_QUERIES))
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def ann_topk(sf_dir: str) -> pa.Table:
    """(query_id, rank, neighbor_id): exact cosine top-10 for the first 10
    vectors (self excluded); rank ties broken by neighbor_id asc."""
    import ray

    qids, qmat = _query_matrix(sf_dir)
    qnorm = np.linalg.norm(qmat, axis=1)
    qref = ray.put((qids, qmat, qnorm))

    class BatchScorer:
        def __init__(self):
            self.qids, self.qmat, self.qnorm = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            mat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
            sims = (mat @ self.qmat.T) / np.outer(np.linalg.norm(mat, axis=1), self.qnorm)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                s = sims[:, qi]
                mask = ids != qid
                cand_ids, cand_s = ids[mask], s[mask]
                if len(cand_ids) > TOP_K:
                    part = np.argpartition(-cand_s, TOP_K - 1)
                    kth = cand_s[part[TOP_K - 1]]
                    keep = cand_s >= kth  # keep boundary ties for exact merge
                    cand_ids, cand_s = cand_ids[keep], cand_s[keep]
                out_q.append(np.full(len(cand_ids), qid, dtype=np.int64))
                out_n.append(cand_ids.astype(np.int64))
                out_s.append(cand_s)
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                    "sim": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    ds = _emb(sf_dir).map_batches(BatchScorer, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4))
    parts = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    return _merge_topk(parts)


def _merge_topk(parts: pa.Table) -> pa.Table:
    q = parts["query_id"].to_numpy()
    n = parts["neighbor_id"].to_numpy()
    s = parts["sim"].to_numpy()
    out_q, out_r, out_n = [], [], []
    for qid in np.unique(q):
        m = q == qid
        order = np.lexsort((n[m], -s[m]))[:TOP_K]
        out_q.extend([int(qid)] * len(order))
        out_r.extend(range(len(order)))
        out_n.extend(n[m][order].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
        }
    )


SQL_ANN_TOPK = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT q.qid, e.vec_id AS nid, list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q JOIN embeddings e ON e.vec_id <> q.qid
),
r AS (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) - 1 AS rnk
  FROM s
)
SELECT CAST(qid AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rank, CAST(nid AS BIGINT) AS neighbor_id
FROM r WHERE rnk < {TOP_K} ORDER BY query_id, rank
"""


def lsh_buckets(mat: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic random-hyperplane bucket ids, one per hash table →
    shape (n, LSH_TABLES). Sign patterns of LSH_PLANES projections."""
    rng = np.random.default_rng(LSH_SEED)
    out = np.empty((len(mat), LSH_TABLES), dtype=np.int64)
    for t in range(LSH_TABLES):
        planes = rng.standard_normal((dim, LSH_PLANES))
        signs = (mat @ planes) > 0
        out[:, t] = (signs.astype(np.int64) << np.arange(LSH_PLANES)).sum(axis=1)
    return out


def ann_lsh_topk(sf_dir: str) -> pa.Table:
    """Approximate top-k: queries only scan their own LSH bucket. At scale the
    bucket id becomes the partition key (groupby → per-bucket brute force)."""
    import ray

    qids, qmat = _query_matrix(sf_dir)
    dim = qmat.shape[1]
    qbuckets = lsh_buckets(qmat, dim)
    qnorm = np.linalg.norm(qmat, axis=1)
    qref = ray.put((qids, qmat, qnorm, qbuckets))

    class BucketScorer:
        def __init__(self):
            self.qids, self.qmat, self.qnorm, self.qbuckets = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            mat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
            buckets = lsh_buckets(mat, mat.shape[1])
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                m = (buckets == self.qbuckets[qi]).any(axis=1) & (ids != qid)
                if not m.any():
                    continue
                s = (mat[m] @ self.qmat[qi]) / (np.linalg.norm(mat[m], axis=1) * self.qnorm[qi])
                out_q.append(np.full(m.sum(), qid, dtype=np.int64))
                out_n.append(ids[m].astype(np.int64))
                out_s.append(s)
            if not out_q:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "neighbor_id": pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                    "sim": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    ds = _emb(sf_dir).map_batches(BucketScorer, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4))
    parts = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    if len(parts) == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
            }
        )
    return _merge_topk(parts)
