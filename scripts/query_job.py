#!/usr/bin/env python
"""Query job — classic-syntax queries against a built index.

    ray job submit -- python scripts/query_job.py --index-dir /data/index \
        -q 'license AND apache' -q '"apache software foundation"' -k 10

Prints one JSON line per query with ranked (doc_id, score) plus resolved
stored fields for the winners (two-phase fetch).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("-q", "--query", action="append", required=True, dest="queries")
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--fetch-fields", default="repo,path", help="stored fields to resolve (empty to skip)")
    p.add_argument("--local", action="store_true", help="in-process scoring (skip the Ray scatter)")
    p.add_argument("--method", default="auto", choices=["auto", "wand", "exhaustive"])
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True, logging_level="ERROR")
    # simple linear Ray Data chains: per-operator CPU reservation only
    # throttles them (see bench.py) — job scripts own their session
    from ray.data import DataContext

    DataContext.get_current().op_resource_reservation_enabled = False

    from lucene_solr_ray.search import Searcher, parse_query

    searcher = Searcher(args.index_dir)
    queries = {f"q{i}": parse_query(q) for i, q in enumerate(args.queries)}
    t0 = time.time()
    res = searcher.search(queries, k=args.k, use_ray=not args.local, method=args.method)
    took = time.time() - t0

    fields = [f for f in args.fetch_fields.split(",") if f]
    docs = {}
    if fields and res.num_rows:
        fetched = searcher.reader.fetch_docs(
            list(set(res["doc_id"].to_pylist())), columns=["doc_id", *fields]
        )
        docs = {r["doc_id"]: {f: r[f] for f in fields} for r in fetched.to_pylist()}

    rows = res.to_pylist()
    for i, qtext in enumerate(args.queries):
        qid = f"q{i}"
        hits = [
            {"rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"], **docs.get(r["doc_id"], {})}
            for r in rows
            if r["query_id"] == qid
        ]
        print(json.dumps({"query": qtext, "took_sec": round(took, 3), "hits": hits}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
