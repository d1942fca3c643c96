#!/usr/bin/env python
"""Index-build job — the `ray job submit` entry point.

    ray job submit -- python scripts/build_index_job.py \
        --corpus /data/corpus_parquet --index-dir /data/index \
        --docs-per-segment 1000000

On a cluster, RAY_ADDRESS is set by the job runtime and `ray.init()` attaches
to it; standalone it starts a local session. Resumable: re-submit with the
same --index-dir after a failure and completed segments are skipped.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True, help="parquet file/dir with (repo,path,commit,lang,content)")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--docs-per-segment", type=int, default=1_000_000)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--no-positions", action="store_true")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--merge", action="store_true", help="run a tiered merge round after the build")
    p.add_argument("--check", action="store_true", help="run CheckIndex validation after the build")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True, logging_level="ERROR")
    # simple linear Ray Data chains: per-operator CPU reservation only
    # throttles them (see bench.py) — job scripts own their session
    from ray.data import DataContext

    DataContext.get_current().op_resource_reservation_enabled = False

    from lucene_solr_ray.index.build import build_index

    t0 = time.time()
    res = build_index(
        args.corpus,
        args.index_dir,
        docs_per_segment=args.docs_per_segment,
        batch_size=args.batch_size,
        positions=not args.no_positions,
        resume=not args.no_resume,
    )
    out = {
        "index_dir": res.index_dir,
        "generation": res.generation,
        "segments": len(res.segments),
        "resumed_segments": res.resumed_segments,
        "doc_count": res.stats.doc_count,
        "build_sec": round(time.time() - t0, 2),
    }
    if args.merge:
        from lucene_solr_ray.index.merge import merge_index

        t0 = time.time()
        out["merge"] = merge_index(args.index_dir) | {"merge_sec": round(time.time() - t0, 2)}
    if args.check:
        from lucene_solr_ray.index.checkindex import check_index

        out["check"] = check_index(args.index_dir)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
