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

from ..util.vectors import vec_matrix

N_QUERIES = 10
TOP_K = 10
LSH_PLANES = 5  # planes per table → 2^5 buckets
LSH_TABLES = 4  # candidate set = union over tables (classic multi-table LSH)
LSH_SEED = 42


def _emb(sf_dir: str):
    # all ANN consumers read exactly (vec_id, embedding) — label stays behind
    from .io import sized_read

    return sized_read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t["vec_id"], N_QUERIES))
    ids = t["vec_id"].to_numpy()
    mat = vec_matrix(t["embedding"])
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
            mat = vec_matrix(batch["embedding"])
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

    ds = _emb(sf_dir).map_batches(
        BatchScorer, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8),
        max_restarts=0,
    )
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


IVF_K = 16  # centroids (nlist)
IVF_NPROBE = 4  # centroids probed per query
IVF_ITERS = 5  # Lloyd iterations
IVF_TRAIN_N = 512  # training-sample cap (vec_id order — deterministic)


def train_ivf_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic spherical k-means on a bounded sample: train vectors are
    the first IVF_TRAIN_N by vec_id, init = evenly spaced sample rows, fixed
    IVF_ITERS Lloyd steps on L2-normalized vectors (cosine ⇔ dot). No RNG —
    identical centroids at any parallelism (the 100-TB path trains once on a
    driver-side sample and broadcasts, standard IVF practice)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    order = np.argsort(ids)[:IVF_TRAIN_N]
    mat = vec_matrix(t["embedding"])[order].astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    k = min(IVF_K, len(mat))
    cent = mat[np.linspace(0, len(mat) - 1, k).astype(np.int64)].copy()
    for _ in range(IVF_ITERS):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                v = mat[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    cent[c] = v / n
    return cent


def ann_ivf_topk(sf_dir: str, stats: dict | None = None) -> pa.Table:
    """Approximate top-k via an IVF (inverted-file) index — the second scale
    path next to LSH: vectors are assigned to their nearest centroid
    (map_batches, broadcast centroids), shuffled ONCE by centroid id, and each
    query probes only its IVF_NPROBE nearest centroid groups — scanned rows ∝
    probed-list sizes, not the corpus.

    At 100 TB the assignment becomes a one-time centroid-partitioned Parquet
    write (reused across query batches); scoring stays per-group. ``stats``
    receives ``scanned_rows`` / ``corpus_rows`` (pinned ≪ brute force in
    pytest, together with recall vs the exact oracle)."""
    import ray

    cent = train_ivf_centroids(sf_dir)
    qids, qmat = _query_matrix(sf_dir)
    qnorm = np.linalg.norm(qmat, axis=1)
    qn = qmat / np.maximum(qnorm[:, None], 1e-12)
    nprobe = min(IVF_NPROBE, len(cent))
    qprobes = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    qref = ray.put((qids, qmat, qnorm, qprobes))
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = vec_matrix(batch["embedding"]).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pa.table(
            {
                "centroid": pa.array(np.argmax(mat @ c.T, axis=1).astype(np.int32), pa.int32()),
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "embedding": batch["embedding"],
            }
        )

    def score_list(group: pa.Table) -> pa.Table:
        qids_b, qmat_b, qnorm_b, qprobes_b = ray.get(qref)
        cid = int(group["centroid"][0].as_py())
        qsel = np.flatnonzero((qprobes_b == cid).any(axis=1))
        empty = {
            "query_id": np.empty(0, np.int64),
            "neighbor_id": np.empty(0, np.int64),
            "sim": np.empty(0, np.float64),
            "scanned": np.empty(0, np.int64),
        }
        if len(qsel) == 0:
            return pa.table({k: pa.array(v) for k, v in empty.items()})
        ids = group["vec_id"].to_numpy()
        mat = vec_matrix(group["embedding"])
        sims = (mat @ qmat_b[qsel].T) / np.outer(np.linalg.norm(mat, axis=1), qnorm_b[qsel])
        out_q, out_n, out_s = [], [], []
        for ci, qi in enumerate(qsel):
            qid = int(qids_b[qi])
            m = ids != qid
            cand_ids = ids[m].astype(np.int64)
            cand_sims = sims[m, ci]
            # per-(query, partition) TOP-K truncation: the cross-partition
            # merge only needs each group's k best — without this the
            # gather grows with partition size (sim desc, id asc tie-break
            # keeps the final merge identical to the full emit)
            if len(cand_ids) > TOP_K:
                sel = np.lexsort((cand_ids, -cand_sims))[:TOP_K]
                cand_ids, cand_sims = cand_ids[sel], cand_sims[sel]
            out_q.append(np.full(len(cand_ids), qid, dtype=np.int64))
            out_n.append(cand_ids)
            out_s.append(cand_sims)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate([*out_q, [-1]]), pa.int64()),
                "neighbor_id": pa.array(np.concatenate([*out_n, [-1]]), pa.int64()),
                "sim": pa.array(np.concatenate([*out_s, [0.0]]), pa.float64()),
                "scanned": pa.array(
                    np.concatenate([np.zeros(sum(map(len, out_q)), np.int64), [len(ids) * len(qsel)]]),
                    pa.int64(),
                ),
            }
        )

    ds = (
        _emb(sf_dir)
        .map_batches(assign, batch_format="pyarrow", batch_size=4096)
        .groupby("centroid")
        .map_groups(score_list, batch_format="pyarrow")
    )
    parts = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    scanned = 0
    if len(parts):
        sentinel = pa.compute.equal(parts["query_id"], -1)
        scanned = int(pa.compute.sum(parts.filter(sentinel)["scanned"]).as_py() or 0)
        parts = parts.filter(pa.compute.invert(sentinel))
    if stats is not None:
        import pyarrow.parquet as _pq

        stats["scanned_rows"] = scanned
        stats["corpus_rows"] = _pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
        stats["n_queries"] = len(qids)
    if len(parts) == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
            }
        )
    return _merge_topk(parts)


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


def ann_lsh_topk(sf_dir: str, stats: dict | None = None) -> pa.Table:
    """Approximate top-k via BUCKET-PARTITIONED LSH: vectors are exploded to
    one row per hash table, shuffled by ``(table, bucket)``, and each bucket
    group scores ONLY the queries that hash into it — scanned rows are
    proportional to the matching buckets' sizes, not the corpus (the round-1
    version re-scanned every row per batch).

    At 100 TB the explode+groupby becomes a one-time bucketed Parquet write
    (partition dir per (table, bucket)) reused across query batches; the
    per-bucket scoring stage is unchanged. ``stats`` (optional dict) receives
    ``scanned_rows`` (Σ bucket_size × matching queries) and ``corpus_rows`` —
    pinned ≪ brute force in pytest."""
    import ray

    qids, qmat = _query_matrix(sf_dir)
    dim = qmat.shape[1]
    qbuckets = lsh_buckets(qmat, dim)
    qnorm = np.linalg.norm(qmat, axis=1)
    qref = ray.put((qids, qmat, qnorm, qbuckets))

    def add_buckets(batch: pa.Table) -> pa.Table:
        """Explode each vector to LSH_TABLES (table, bucket) rows."""
        ids = batch["vec_id"].to_numpy()
        mat = vec_matrix(batch["embedding"])
        buckets = lsh_buckets(mat, mat.shape[1])  # (n, LSH_TABLES)
        n = len(ids)
        take = pa.array(np.repeat(np.arange(n, dtype=np.int64), LSH_TABLES))
        return pa.table(
            {
                "tbl": pa.array(np.tile(np.arange(LSH_TABLES, dtype=np.int32), n), pa.int32()),
                "bucket": pa.array(buckets.reshape(-1), pa.int64()),
                "vec_id": pa.array(np.repeat(ids, LSH_TABLES).astype(np.int64), pa.int64()),
                "embedding": batch["embedding"].take(take),
            }
        )

    def score_bucket(group: pa.Table) -> pa.Table:
        """One (table, bucket) group: brute-force cosine against the queries
        routed to this bucket. Emits one sentinel row (query_id = -1) carrying
        the scanned-row count for the driver-side counter."""
        qids_b, qmat_b, qnorm_b, qbuckets_b = ray.get(qref)
        tblid = int(group["tbl"][0].as_py())
        bucket = int(group["bucket"][0].as_py())
        qsel = np.flatnonzero(qbuckets_b[:, tblid] == bucket)
        empty = {
            "query_id": np.empty(0, np.int64),
            "neighbor_id": np.empty(0, np.int64),
            "sim": np.empty(0, np.float64),
            "scanned": np.empty(0, np.int64),
        }
        if len(qsel) == 0:
            return pa.table({k: pa.array(v) for k, v in empty.items()})
        ids = group["vec_id"].to_numpy()
        mat = vec_matrix(group["embedding"])
        sims = (mat @ qmat_b[qsel].T) / np.outer(np.linalg.norm(mat, axis=1), qnorm_b[qsel])
        out_q, out_n, out_s = [], [], []
        for ci, qi in enumerate(qsel):
            qid = int(qids_b[qi])
            m = ids != qid
            cand_ids = ids[m].astype(np.int64)
            cand_sims = sims[m, ci]
            # per-(query, partition) TOP-K truncation: the cross-partition
            # merge only needs each group's k best — without this the
            # gather grows with partition size (sim desc, id asc tie-break
            # keeps the final merge identical to the full emit)
            if len(cand_ids) > TOP_K:
                sel = np.lexsort((cand_ids, -cand_sims))[:TOP_K]
                cand_ids, cand_sims = cand_ids[sel], cand_sims[sel]
            out_q.append(np.full(len(cand_ids), qid, dtype=np.int64))
            out_n.append(cand_ids)
            out_s.append(cand_sims)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate([*out_q, [-1]]), pa.int64()),
                "neighbor_id": pa.array(np.concatenate([*out_n, [-1]]), pa.int64()),
                "sim": pa.array(np.concatenate([*out_s, [0.0]]), pa.float64()),
                "scanned": pa.array(
                    np.concatenate([np.zeros(sum(map(len, out_q)), np.int64), [len(ids) * len(qsel)]]),
                    pa.int64(),
                ),
            }
        )

    ds = (
        _emb(sf_dir)
        .map_batches(add_buckets, batch_format="pyarrow", batch_size=4096)
        .groupby(["tbl", "bucket"])
        .map_groups(score_bucket, batch_format="pyarrow")
    )
    parts = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    scanned = 0
    if len(parts):
        sentinel = pa.compute.equal(parts["query_id"], -1)
        scanned = int(pa.compute.sum(parts.filter(sentinel)["scanned"]).as_py() or 0)
        parts = parts.filter(pa.compute.invert(sentinel))
    if stats is not None:
        import pyarrow.parquet as _pq

        stats["scanned_rows"] = scanned
        stats["corpus_rows"] = _pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
        stats["n_queries"] = len(qids)
    if len(parts) == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
            }
        )
    # same neighbor can surface from several tables — collapse duplicates
    # (identical sim) before the top-k merge
    q = parts["query_id"].to_numpy()
    n = parts["neighbor_id"].to_numpy()
    s = parts["sim"].to_numpy()
    _, keep = np.unique(np.stack([q, n], axis=1), axis=0, return_index=True)
    parts = pa.table(
        {
            "query_id": pa.array(q[keep], pa.int64()),
            "neighbor_id": pa.array(n[keep], pa.int64()),
            "sim": pa.array(s[keep], pa.float64()),
        }
    )
    return _merge_topk(parts)


def emb_quantize(sf_dir: str) -> pa.Table:
    """Per-vector min-max scalar quantization to 8-bit levels (the standard
    embedding-compression step before ANN at scale; Lucene 9's
    ScalarQuantizer semantics family): q = floor((v-min)/(max-min)*255+0.5),
    all-equal vectors quantize to 0. Fully vectorized — one matrix op per
    batch; emits summary columns (sum/first/last) instead of the quantized
    payload so the oracle compares integers.
    → (vec_id, vmin, vmax, q_sum, q_first, q_last)."""
    from ..util.vectors import vec_matrix

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        m = vec_matrix(batch["embedding"], dtype=np.float64)
        mn = m.min(axis=1)
        mx = m.max(axis=1)
        rng = mx - mn
        safe = np.where(rng == 0.0, 1.0, rng)
        q = np.floor((m - mn[:, None]) / safe[:, None] * 255.0 + 0.5)
        q[rng == 0.0, :] = 0.0
        q = q.astype(np.int64)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "vmin": pa.array(mn, pa.float64()),
            "vmax": pa.array(mx, pa.float64()),
            "q_sum": pa.array(q.sum(axis=1), pa.int64()),
            "q_first": pa.array(q[:, 0], pa.int64()),
            "q_last": pa.array(q[:, -1], pa.int64()),
        })

    ds = _emb(sf_dir).map_batches(fn, batch_format="pyarrow")
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).sort_by("vec_id")


SQL_EMB_QUANTIZE = """
WITH e AS (
  SELECT vec_id, embedding AS v,
         CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
         CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx
  FROM embeddings
),
q AS (
  SELECT vec_id, mn, mx,
         CASE WHEN mx = mn
              THEN list_transform(v, x -> CAST(0 AS BIGINT))
              ELSE list_transform(v, x ->
                CAST(floor((CAST(x AS DOUBLE) - mn) / (mx - mn) * 255.0 + 0.5) AS BIGINT))
         END AS qv
  FROM e
)
SELECT vec_id, mn AS vmin, mx AS vmax,
       CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
       CAST(qv[1] AS BIGINT) AS q_first,
       CAST(qv[len(qv)] AS BIGINT) AS q_last
FROM q ORDER BY vec_id
"""
