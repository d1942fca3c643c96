"""Index build orchestration — the IndexWriter analog, Ray-Data-first.

Pipeline (SURVEY.md §3.1 "Ours"):

1. :func:`~.plan.compute_plan` — deterministic segment ranges + doc bases
   (column-pruned passes over the 3 key columns only).
2. ``map_batches(AnalyzeInvert, batch_format='pyarrow', concurrency=...)`` —
   tokenize + invert + norms per batch (actor pool; DWPT analog).
3. ``groupby('range_id').map_groups(SegmentWriter)`` — the single all-to-all
   shuffle; each group builds + atomically commits one segment.
4. Global stats aggregate from the tiny manifest rows; two-phase
   ``manifest.json`` commit (``segments_N`` analog,
   ``index/SegmentInfos.java:57-138``).

Resume: a re-run with the same ``index_dir`` reloads ``plan.json``, drops rows
of already-committed segments inside the analyze stage (cheap mask — they
never enter the shuffle), and keeps their manifest entries. Doc IDs are dense
ranks of ``(repo, path, commit)``, so any parallelism level and any resume
point produce byte-identical segments.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..analysis.tokenizer import StandardAnalyzer
from .plan import BuildPlan, compute_plan
from .segment import (
    CONTENT_FIELD,
    DEFAULT_KEYWORD_FIELDS,
    AnalyzeInvert,
    SegmentWriter,
    load_segment_meta,
)


@dataclass
class IndexStats:
    """CollectionStatistics analog (search/IndexSearcher.java:808)."""

    doc_count: int
    sum_ttf: int
    sum_df: int
    num_terms: int  # sum over segments (terms counted once per segment)

    @property
    def avgdl(self) -> np.float32:
        # (float)(sumTotalTermFreq / (double) docCount), BM25Similarity.java:87-101
        if self.doc_count == 0:
            return np.float32(1.0)
        return np.float32(self.sum_ttf / float(self.doc_count))

    def to_dict(self) -> dict:
        return {
            "doc_count": self.doc_count,
            "sum_ttf": self.sum_ttf,
            "sum_df": self.sum_df,
            "num_terms": self.num_terms,
        }


@dataclass
class BuildResult:
    index_dir: str
    generation: int
    stats: IndexStats
    segments: list[dict] = field(default_factory=list)
    resumed_segments: int = 0


def build_index(
    corpus,
    index_dir: str,
    *,
    docs_per_segment: int = 100_000,
    analyzer: StandardAnalyzer | None = None,
    concurrency: int | None = None,
    batch_size: int = 1024,
    resume: bool = True,
    positions: bool = True,
    keyword_fields: tuple[str, ...] = DEFAULT_KEYWORD_FIELDS,
    feature_fields: dict | None = None,
    store_content: bool = False,
    store_offsets: bool = False,
    sort_fields: tuple[str, ...] = (),
) -> BuildResult:
    """Build (or resume) the inverted index for a 5-column corpus.

    ``corpus``: a ``ray.data.Dataset`` with columns
    (repo, path, commit, lang, content), or a parquet path/dir.
    """
    import time

    import ray
    import ray.data

    debug = os.environ.get("LSR_DEBUG")
    t_start = time.time()

    def _dbg(msg: str) -> None:
        if debug:
            print(f"[build +{time.time() - t_start:6.1f}s] {msg}", flush=True)

    corpus_path = None
    if isinstance(corpus, (str, os.PathLike)):
        corpus_path = str(corpus)
        corpus = ray.data.read_parquet(corpus_path)

    os.makedirs(os.path.join(index_dir, "segments"), exist_ok=True)
    plan_path = os.path.join(index_dir, "plan.json")
    if resume and os.path.exists(plan_path):
        plan = BuildPlan.load(plan_path)
    else:
        plan = compute_plan(corpus, docs_per_segment, sort_fields=sort_fields,
                            corpus_path=corpus_path)
        plan.save(plan_path)
    _dbg(f"plan ready: {plan.n_segments} segments, {plan.total_rows} rows")

    # full-coverage early exit: a committed manifest for this plan means the
    # build is done (segments may since have been merged/renamed — their raw
    # dirs are gone, but the manifest is authoritative)
    manifest_path = os.path.join(index_dir, "manifest.json")
    if resume and os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                m = json.load(f)
            if m.get("stats", {}).get("doc_count") == plan.total_rows:
                stats = IndexStats(**{k: m["stats"][k] for k in ("doc_count", "sum_ttf", "sum_df", "num_terms")})
                return BuildResult(
                    index_dir=index_dir,
                    generation=m["generation"],
                    stats=stats,
                    segments=m["segments"],
                    resumed_segments=len(m["segments"]),
                )
        except (OSError, json.JSONDecodeError, KeyError):
            pass

    done = frozenset(
        rid for rid in range(plan.n_segments) if resume and load_segment_meta(index_dir, rid) is not None
    )

    analyzer = analyzer or StandardAnalyzer()
    manifest_rows: list[dict] = []
    todo = [rid for rid in range(plan.n_segments) if rid not in done and plan.counts[rid] > 0]
    if todo:
        from .segment import analyze_invert_fn

        # TASK-based analyze (not an actor pool): tasks run in Ray's
        # reusable warm workers — a fresh actor-pool process pays 20-35 s of
        # first-touch page faults per build (and a (1,1) pool deadlocks a
        # 1-cpu budget). Per-worker compiled state is cached inside
        # analyze_invert_fn; ``concurrency`` (when given) caps the task
        # parallelism, otherwise Ray autoscales to available CPUs.
        analyzed = corpus.map_batches(
            analyze_invert_fn,
            fn_kwargs={
                "plan": plan,
                "analyzer": analyzer,
                "done_ranges": done,
                "positions": positions,
                "store_content": store_content,
                "store_offsets": store_offsets,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            **({"concurrency": concurrency} if concurrency is not None else {}),
        )
        # task-based (no CPU reservation): SegmentWriter holds no amortizable
        # state, and a second actor pool can starve tiny CPU budgets
        out = analyzed.groupby("range_id").map_groups(
            _write_segment_group,
            fn_kwargs={
                "index_dir": index_dir,
                "plan": plan,
                "keyword_fields": keyword_fields,
                "positions": positions,
                "feature_fields": feature_fields,
            },
            batch_format="pyarrow",
        )
        for b in out.iter_batches(batch_format="pyarrow"):
            for row in b.to_pylist():
                manifest_rows.append(row)
        _dbg(f"pipeline done: {len(manifest_rows)} segments built")
        if debug:
            try:
                print(out.stats(), flush=True)
            except Exception:
                pass

    # per-field stats (FieldInfos/CollectionStatistics analog): aggregate the
    # per-segment field_stats dicts from the committed _SEGMENT.json files
    field_stats: dict[str, dict] = {}
    for rid in range(plan.n_segments):
        meta = load_segment_meta(index_dir, rid)
        if meta is None:
            continue
        for f, fs in meta.get("field_stats", {}).items():
            agg = field_stats.setdefault(
                f, {"doc_count": 0, "num_terms": 0, "sum_df": 0, "sum_ttf": 0,
                    "has_norms": fs.get("has_norms", f == CONTENT_FIELD)}
            )
            for k in ("doc_count", "num_terms", "sum_df", "sum_ttf"):
                agg[k] += fs.get(k, 0)

    # include previously-committed segments in the manifest
    built = {r["seg"] for r in manifest_rows}
    n_resumed = sum(1 for r in manifest_rows if r.get("resumed"))
    for rid in sorted(done):
        if rid not in built:
            meta = load_segment_meta(index_dir, rid)
            manifest_rows.append(
                {
                    "seg": meta["seg"],
                    "doc_base": meta["doc_base"],
                    "doc_count": meta["doc_count"],
                    "sum_len": meta["sum_len"],
                    "num_terms": meta["num_terms"],
                    "sum_df": meta["sum_df"],
                    "sum_ttf": meta["sum_ttf"],
                    "resumed": True,
                }
            )
            n_resumed += 1
    manifest_rows.sort(key=lambda r: r["seg"])

    # hard invariant: actual rows per segment must equal the planned counts —
    # a mismatch means the planning read and the Ray shuffle saw different
    # file sets (sidecars / partial writes; ADVICE r1), and the doc-id bases
    # derived from the plan would overlap. Fail loudly, never commit.
    for r in manifest_rows:
        planned = plan.counts[r["seg"]] if r["seg"] < len(plan.counts) else None
        if planned is not None and r["doc_count"] != planned:
            raise RuntimeError(
                f"segment {r['seg']}: built {r['doc_count']} rows but the "
                f"plan counted {planned} — corpus file set changed between "
                "planning and build; delete plan.json (or the index dir) "
                "and rebuild")

    stats = IndexStats(
        doc_count=sum(r["doc_count"] for r in manifest_rows),
        sum_ttf=sum(r["sum_ttf"] for r in manifest_rows),
        sum_df=sum(r["sum_df"] for r in manifest_rows),
        num_terms=sum(r["num_terms"] for r in manifest_rows),
    )
    generation = _next_generation(index_dir)
    manifest = {
        "generation": generation,
        "docs_per_segment": docs_per_segment,
        "analyzer": {
            "max_token_length": analyzer.max_token_length,
            "lowercase": analyzer.lowercase,
            "n_stopwords": len(analyzer.stopwords),
        },
        "positions": positions,
        "payloads": analyzer.delimited_payload is not None,
        "offsets": store_offsets,
        "keyword_fields": list(keyword_fields),
        "feature_fields": sorted(feature_fields) if feature_fields else [],
        "sort_fields": plan.key_cols,
        "stats": stats.to_dict(),
        "field_stats": field_stats,
        # per-partition lineage: the sort-key range each segment was planned
        # from (plan boundaries are upper-exclusive cut points) + planned vs
        # actual row counts — a failed run's survivor segments are
        # attributable to exact input ranges, and a resume can prove it
        # re-covered precisely the missing ranges
        "segments": [
            {
                **{k: r[k] for k in ("seg", "doc_base", "doc_count", "sum_len", "num_terms", "sum_df", "sum_ttf")},
                "lineage": {
                    "key_lo": plan.boundaries[r["seg"] - 1] if r["seg"] > 0 and plan.boundaries else None,
                    "key_hi": plan.boundaries[r["seg"]] if r["seg"] < len(plan.boundaries) else None,
                    "planned_rows": plan.counts[r["seg"]] if r["seg"] < len(plan.counts) else None,
                    "resumed": bool(r.get("resumed")),
                },
            }
            for r in manifest_rows
        ],
        # build metrics (checkpointed with the commit, ray-job-observable)
        "metrics": {
            "build_wall_sec": round(time.time() - t_start, 3),
            "segments_built": len(built),
            "segments_resumed": n_resumed,
            "docs_per_sec": round(stats.doc_count / max(time.time() - t_start, 1e-9), 1),
        },
    }
    tmp = os.path.join(index_dir, f".pending_manifest_{generation}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))  # two-phase commit analog

    return BuildResult(
        index_dir=index_dir,
        generation=generation,
        stats=stats,
        segments=manifest["segments"],
        resumed_segments=n_resumed,
    )


def _write_segment_group(group, *, index_dir: str, plan: BuildPlan,
                         keyword_fields=DEFAULT_KEYWORD_FIELDS, positions=True,
                         feature_fields=None):
    from .segment import SegmentWriter

    return SegmentWriter(
        index_dir, plan, keyword_fields=keyword_fields, positions=positions,
        feature_fields=feature_fields,
    )(group)


def _next_generation(index_dir: str) -> int:
    p = os.path.join(index_dir, "manifest.json")
    if os.path.exists(p):
        try:
            with open(p) as f:
                return int(json.load(f).get("generation", 0)) + 1
        except (OSError, json.JSONDecodeError, ValueError):
            return 1
    return 1
