"""Lucene classification-module analogs over the inverted index.

- Naive Bayes — SimpleNaiveBayesClassifier (ref lucene/classification/src/
  java/org/apache/lucene/classification/SimpleNaiveBayesClassifier.java):
  per input doc and class c,

      score(d, c) = ln(df_c) - ln(N)                       (calculateLogPrior)
                  + Σ_w tf_w(d) · ln((hits(w, c) + 1) / (avgU · df_c + N))

  with hits(w, c) = |docs containing w with class c| (getWordFreqForClass),
  avgU = sumDocFreq/docCount of the text field (getTextTermFreqForClass) and
  N = docs carrying the class field. This mirrors the CODE at :203-230 (the
  denominator adds docsWithClass, not the "+|V|" the comment claims).
  Tie-break: lexicographically first class (the reference iterates classes
  in TermsEnum order and only replaces on strictly-greater).

  All token statistics come from the index itself: one Ray pass over the
  postings (groupby('seg') → per-segment (term, class, count) partials +
  (doc, term, tf) rows for the sampled docs). Only vocab×classes co-counts
  and the sample's tf rows travel to the driver — never documents.

- KNN — KNearestNeighborClassifier (same dir, :51): MoreLikeThis top-k
  neighbors of the input doc, class = max neighbor count, ties by higher
  summed neighbor score then lexicographic class.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


class NBSegmentPartials:
    """map_groups callable over postings ``groupby('seg')``: emits
    kind='co' rows (term, class, doc-count) for the whole segment and
    kind='tf' rows (doc_id, term, tf) for sampled docs (global id <
    ``sample_max``)."""

    def __init__(self, seg_dirs: dict, doc_bases: dict, class_field: str,
                 sample_max: int):
        self.seg_dirs = seg_dirs
        self.doc_bases = doc_bases
        self.class_field = class_field
        self.sample_max = sample_max

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from .scorer import decode_segment_postings

        seg = int(group["seg"][0].as_py())
        base = self.doc_bases[seg]
        cls_col = pq.read_table(
            os.path.join(self.seg_dirs[seg], "docs.parquet"),
            columns=[self.class_field],
        )[self.class_field].to_numpy(zero_copy_only=False).astype(str)
        classes, codes = np.unique(cls_col, return_inverse=True)
        decoded = decode_segment_postings(group)

        out_kind: list[str] = []
        out_term: list[str] = []
        out_cls: list[str] = []
        out_n: list[int] = []
        out_doc: list[int] = []
        for (field, term), (ids, freqs) in decoded.items():
            if field != "content":
                continue
            cnt = np.bincount(codes[ids], minlength=len(classes))
            nz = np.flatnonzero(cnt)
            out_kind.extend(["co"] * len(nz))
            out_term.extend([term] * len(nz))
            out_cls.extend(classes[nz].tolist())
            out_n.extend(cnt[nz].tolist())
            out_doc.extend([0] * len(nz))
            if base < self.sample_max:
                gids = ids + base
                m = gids < self.sample_max
                k = int(m.sum())
                if k:
                    out_kind.extend(["tf"] * k)
                    out_term.extend([term] * k)
                    out_cls.extend([""] * k)
                    out_n.extend(freqs[m].tolist())
                    out_doc.extend(gids[m].tolist())
        return pa.table(
            {
                "kind": pa.array(out_kind, pa.string()),
                "term": pa.array(out_term, pa.string()),
                "cls": pa.array(out_cls, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "doc_id": pa.array(out_doc, pa.int64()),
            }
        )


def classify_naive_bayes(searcher, sample_max: int = 100,
                         class_field: str = "lang") -> pa.Table:
    """Classify the first ``sample_max`` docs (by global id) of the index
    with the index-trained Naive Bayes model → (doc_id, assigned).

    Docs whose analyzed text is empty never appear in the postings and are
    skipped (no likelihood evidence), matching the SQL oracle's join shape.
    """
    import math

    import ray.data

    r = searcher.reader
    co: dict[tuple[str, str], int] = {}
    doc_tf: dict[int, list[tuple[str, int]]] = {}
    ds = ray.data.read_parquet(
        r.postings_files(), filter=pa.compute.field("field") == "content"
    )
    parts = ds.groupby("seg").map_groups(
        NBSegmentPartials,
        fn_constructor_kwargs=dict(
            seg_dirs=r.seg_dirs(),
            doc_bases={s["seg"]: s["doc_base"] for s in r.segments},
            class_field=class_field,
            sample_max=sample_max,
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
        max_restarts=0,
    )
    for b in parts.iter_batches(batch_format="pyarrow"):
        kinds = b["kind"].to_pylist()
        terms = b["term"].to_pylist()
        clss = b["cls"].to_pylist()
        ns = b["n"].to_pylist()
        docs = b["doc_id"].to_pylist()
        for kind, term, cls, n, doc in zip(kinds, terms, clss, ns, docs):
            if kind == "co":
                co[(term, cls)] = co.get((term, cls), 0) + n
            else:
                doc_tf.setdefault(doc, []).append((term, n))

    classes = sorted({c for _t, c in co})
    n_docs = r.stats.doc_count
    content_stats = r.field_stats.get("content") or {
        "sum_df": r.stats.sum_df, "doc_count": n_docs
    }
    avg_u = content_stats["sum_df"] / content_stats["doc_count"]
    df_c = {
        c: r.term_stats([(class_field, c)])[(class_field, c)][0] for c in classes
    }

    out_doc: list[int] = []
    out_cls: list[str] = []
    for doc in sorted(doc_tf):
        best_c, best_s = None, None
        for c in classes:  # lexicographic order; replace on strictly greater
            den = avg_u * df_c[c] + n_docs
            s = math.log(df_c[c]) - math.log(n_docs)
            for term, tf in doc_tf[doc]:
                s += tf * math.log((co.get((term, c), 0) + 1) / den)
            if best_s is None or s > best_s:
                best_c, best_s = c, s
        out_doc.append(doc)
        out_cls.append(best_c)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "assigned": pa.array(out_cls, pa.string()),
        }
    )


def classify_knn(searcher, doc_ids: list[int], k: int = 10,
                 class_field: str = "lang", **mlt_kwargs) -> pa.Table:
    """KNN classification of existing docs — KNearestNeighborClassifier
    (classifyFromTopDocs): MLT top-k neighbors (the query doc itself
    excluded), class = max neighbor count, ties by summed neighbor score
    desc then class asc → (doc_id, assigned)."""
    from collections import Counter

    from .mlt import mlt_query

    out_doc: list[int] = []
    out_cls: list[str] = []
    for did in doc_ids:
        q = mlt_query(searcher, did, **mlt_kwargs)
        if not q.should:
            continue
        res = searcher.search({"q": q}, k=k + 1, use_ray=False)
        ids = [i for i in res["doc_id"].to_pylist() if i != did][:k]
        scores = {
            i: s for i, s in zip(res["doc_id"].to_pylist(), res["score"].to_pylist())
        }
        if not ids:
            continue
        fetched = searcher.reader.fetch_docs(ids, columns=["doc_id", class_field])
        cmap = dict(zip(fetched["doc_id"].to_pylist(),
                        fetched[class_field].to_pylist()))
        counts: Counter = Counter(cmap[i] for i in ids)
        ssum: dict[str, float] = {}
        for i in ids:
            ssum[cmap[i]] = ssum.get(cmap[i], 0.0) + float(scores[i])
        # ssum rounded to 6 decimals: the SHOULD-sum is float-order-dependent
        # and the SQL oracle's sum() order is unspecified (ft_mlt precedent)
        best = sorted(counts, key=lambda c: (-counts[c], -round(ssum[c], 6), c))[0]
        out_doc.append(did)
        out_cls.append(best)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "assigned": pa.array(out_cls, pa.string()),
        }
    )


class BM25NBPartials:
    """map_groups callable over postings ``groupby('seg')`` for the BM25
    Naive Bayes classifier: per (term, class) the segment max of the
    norm-dependent BM25 factor x = tf/(tf + cache[norm]), per-term df
    partials, and (doc, term, tf) rows for sampled docs. The global
    idf*(k1+1) weight multiplies OUTSIDE the max (it is constant per
    term), so the pass needs only the broadcast norm cache."""

    def __init__(self, seg_dirs: dict, doc_bases: dict, class_field: str,
                 sample_max: int, norm_cache):
        self.seg_dirs = seg_dirs
        self.doc_bases = doc_bases
        self.class_field = class_field
        self.sample_max = sample_max
        self.norm_cache = np.asarray(norm_cache, dtype=np.float64)

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from .scorer import decode_segment_postings

        seg = int(group["seg"][0].as_py())
        base = self.doc_bases[seg]
        dtbl = pq.read_table(
            os.path.join(self.seg_dirs[seg], "docs.parquet"),
            columns=[self.class_field, "norm_byte"],
        )
        cls_col = dtbl[self.class_field].to_numpy(
            zero_copy_only=False).astype(str)
        norms = dtbl["norm_byte"].to_numpy(zero_copy_only=False)
        classes, codes = np.unique(cls_col, return_inverse=True)
        cache = self.norm_cache[norms]
        decoded = decode_segment_postings(group)

        out_kind: list[str] = []
        out_term: list[str] = []
        out_cls: list[str] = []
        out_n: list[int] = []
        out_doc: list[int] = []
        out_v: list[float] = []
        for (field, term), (ids, freqs) in decoded.items():
            if field != "content":
                continue
            f = freqs.astype(np.float64)
            x = f / (f + cache[ids])
            mx = np.full(len(classes), -1.0)
            np.maximum.at(mx, codes[ids], x)
            nz = np.flatnonzero(mx >= 0)
            out_kind.extend(["mx"] * len(nz))
            out_term.extend([term] * len(nz))
            out_cls.extend(classes[nz].tolist())
            out_n.extend([0] * len(nz))
            out_doc.extend([0] * len(nz))
            out_v.extend(mx[nz].tolist())
            out_kind.append("df")
            out_term.append(term)
            out_cls.append("")
            out_n.append(int(len(ids)))
            out_doc.append(0)
            out_v.append(0.0)
            if base < self.sample_max:
                gids = ids + base
                m = gids < self.sample_max
                k = int(m.sum())
                if k:
                    out_kind.extend(["tf"] * k)
                    out_term.extend([term] * k)
                    out_cls.extend([""] * k)
                    out_n.extend(freqs[m].tolist())
                    out_doc.extend(gids[m].tolist())
                    out_v.extend([0.0] * k)
        return pa.table(
            {
                "kind": pa.array(out_kind, pa.string()),
                "term": pa.array(out_term, pa.string()),
                "cls": pa.array(out_cls, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "v": pa.array(out_v, pa.float64()),
            }
        )


def classify_bm25nb(searcher, sample_max: int = 100,
                    class_field: str = "lang") -> pa.Table:
    """BM25NBClassifier (ref lucene/classification/.../BM25NBClassifier.
    java): per class c, score = ln(prior(c)) + Σ_w tf_w·ln(termProb(c,w))
    where prior(c) and termProb(c,w) are the BM25 top-1 scores of
    {class=c} and {MUST class=c, SHOULD w}. The class field is a keyword
    field (norms omitted ⇒ its BM25 factor is 1/(1+k1) for every doc), so
    prior(c) = idf_c exactly and termProb(c,w) = idf_c + weight_w·max_x
    with max_x the per-(term,class) max of tf/(tf+cache[norm]) — computed
    in ONE distributed postings pass (BM25NBPartials); only
    vocab×classes maxima and the sample's tf rows reach the driver.
    Softmax normalization (:79-103) is monotonic, so the assigned class
    is the raw argmax. float64 scoring (oracle mode)."""
    import math

    import ray.data

    from .bm25 import BM25Similarity

    r = searcher.reader
    sim = BM25Similarity(dtype=np.float64)
    n_docs = r.stats.doc_count
    avgdl = r.field_sum_ttf("content") / r.field_doc_count("content")
    cache = sim.norm_cache(np.float64(avgdl))

    mx: dict[tuple[str, str], float] = {}
    dfs: dict[str, int] = {}
    doc_tf: dict[int, list[tuple[str, int]]] = {}
    ds = ray.data.read_parquet(
        r.postings_files(), filter=pa.compute.field("field") == "content"
    )
    parts = ds.groupby("seg").map_groups(
        BM25NBPartials,
        fn_constructor_kwargs=dict(
            seg_dirs=r.seg_dirs(),
            doc_bases={s["seg"]: s["doc_base"] for s in r.segments},
            class_field=class_field,
            sample_max=sample_max,
            norm_cache=cache,
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
        max_restarts=0,
    )
    for b in parts.iter_batches(batch_format="pyarrow"):
        for kind, term, cls, n, doc, v in zip(
                b["kind"].to_pylist(), b["term"].to_pylist(),
                b["cls"].to_pylist(), b["n"].to_pylist(),
                b["doc_id"].to_pylist(), b["v"].to_pylist()):
            if kind == "mx":
                key = (term, cls)
                if v > mx.get(key, -1.0):
                    mx[key] = v
            elif kind == "df":
                dfs[term] = dfs.get(term, 0) + n
            else:
                doc_tf.setdefault(doc, []).append((term, n))

    classes = sorted({c for _t, c in mx})
    df_c = {
        c: r.term_stats([(class_field, c)])[(class_field, c)][0]
        for c in classes
    }
    const_c = {
        c: math.log(1 + (n_docs - df_c[c] + 0.5) / (df_c[c] + 0.5))
        for c in classes
    }
    k1p1 = sim.k1 + 1.0
    weight = {
        t: math.log(1 + (n_docs - d + 0.5) / (d + 0.5)) * k1p1
        for t, d in dfs.items()
    }

    out_doc: list[int] = []
    out_cls: list[str] = []
    for doc in sorted(doc_tf):
        best_c, best_s = None, None
        for c in classes:
            s = math.log(const_c[c])
            for term, tf in doc_tf[doc]:
                m = mx.get((term, c))
                tp = const_c[c] + (weight[term] * m if m is not None else 0.0)
                s += tf * math.log(tp)
            if best_s is None or s > best_s:
                best_c, best_s = c, s
        out_doc.append(doc)
        out_cls.append(best_c)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "assigned": pa.array(out_cls, pa.string()),
        }
    )


def nearest_fuzzy_terms(searcher, text: str,
                        field: str = "content") -> list[tuple[str, float]]:
    """NearestFuzzyQuery term selection (``classification/utils/
    NearestFuzzyQuery.java:141-273``): per unique analyzed token, fuzzy
    variants (maxEdits=1, prefixLength=2) boosted 1 − ed/min(len) (exact
    match = 1.0, FuzzyTermsEnum.java:229-236), capped at
    MAX_VARIANTS_PER_TERM=50 per source token by (boost desc, term asc)
    (:157,175-180); each kept variant rescored boost² · idf(df_source or
    avg variant df) with idf = ln((N+1)/(df+1)) + 1 (:197,208-210); global
    top MAX_NUM_TERMS=300 over (source, variant) PAIRS (:231). The rewrite
    keeps one SHOULD clause per surviving (source, variant) pair (:252-268),
    so a variant reachable from two source tokens contributes the SUM of
    both scores → [(variant_term, summed_score)]."""
    import math

    from ..analysis.tokenizer import StandardAnalyzer, analyze_with_positions
    from .query import FuzzyQuery

    r = searcher.reader
    n_docs = r.field_doc_count(field)
    seen: set[str] = set()
    scored: list[tuple[float, str, str]] = []  # (score, variant, source)
    for tok, _p in analyze_with_positions(text, StandardAnalyzer()):
        if tok in seen:
            continue
        seen.add(tok)
        try:
            variants = r.expand_terms(
                FuzzyQuery(tok, max_edits=1, prefix_length=2, field=field))
        except ValueError:
            continue
        if not variants:
            continue
        stats = r.term_stats(sorted((field, v) for v in variants))
        df = stats.get((field, tok), (0, 0))[0]
        if df == 0:
            dfs = [stats.get((field, v), (0, 0))[0] for v in variants]
            df = sum(dfs) // len(dfs)
        idf = math.log((n_docs + 1) / (df + 1)) + 1.0
        per_term = sorted(
            ((1.0 if v == tok else 1.0 - 1.0 / min(len(tok), len(v)), v)
             for v in variants),
            key=lambda bv: (-bv[0], bv[1]))[:50]
        scored.extend((b * b * idf, v, tok) for b, v in per_term)
    # global queue over (source, variant) pairs; reference tie-break is by
    # variant term only — source added as a deterministic third key
    scored.sort(key=lambda svt: (-svt[0], svt[1], svt[2]))
    summed: dict[str, float] = {}
    for s, v, _src in scored[:300]:
        summed[v] = summed.get(v, 0.0) + s
    return sorted(summed.items())


def classify_knn_fuzzy(searcher, doc_ids: list[int], k: int = 10,
                       class_field: str = "lang") -> pa.Table:
    """KNearestFuzzyClassifier (``classification/KNearestFuzzyClassifier.
    java``): NearestFuzzyQuery top-k neighbors scored with ARTIFICIAL
    df=1 term stats (newTermQuery :160-175 — every variant shares
    idf(df=1)), per-class boost = Σ score/maxScore, final score =
    boost/max(k, hits... per :200-215 boost/k with the <k correction =
    boost/hits); argmax with a lexicographic tie-break (the reference
    iterates a HashMap — unspecified; ours is pinned). The input doc is
    excluded from its own neighbors (same deviation as classify_knn —
    the reference classifies unseen text). → (doc_id, assigned)."""
    import math

    from .bm25 import BM25Similarity
    from .scorer import decode_postings

    r = searcher.reader
    sim = BM25Similarity(dtype=np.float64)
    n_docs = r.field_doc_count("content")
    avgdl = r.field_sum_ttf("content") / r.field_doc_count("content")
    cache = sim.norm_cache(np.float64(avgdl))
    idf1 = math.log(1 + (n_docs - 1 + 0.5) / (1 + 0.5))
    seg_base = {s["seg"]: s["doc_base"] for s in r.segments}

    out_doc: list[int] = []
    out_cls: list[str] = []
    for did in doc_ids:
        docs = r.fetch_docs([int(did)], columns=["doc_id", "content"])
        if not docs.num_rows:
            continue
        terms = nearest_fuzzy_terms(searcher, docs["content"][0].as_py() or "")
        if not terms:
            continue
        weights = {t: s * idf1 * (sim.k1 + 1.0) for t, s in terms}
        rows = r.postings_for_terms([("content", t) for t, _s in terms])
        scores: dict[int, float] = {}
        for i in range(rows.num_rows):
            seg = int(rows["seg"][i].as_py())
            term = rows["term"][i].as_py()
            ids, freqs = decode_postings(
                rows["doc_blob"][i].as_py(), rows["freq_blob"][i].as_py(),
                int(rows["df"][i].as_py()))
            norms = r.segment_norms(seg)[ids]
            f = freqs.astype(np.float64)
            sc = weights[term] * f / (f + cache[norms])
            gids = ids + seg_base[seg]
            for g, s in zip(gids.tolist(), sc.tolist()):
                scores[g] = scores.get(g, 0.0) + s
        scores.pop(did, None)
        if not scores:
            continue
        top = sorted(scores.items(), key=lambda gs: (-gs[1], gs[0]))[:k]
        max_score = top[0][1]
        ids = [g for g, _s in top]
        fetched = r.fetch_docs(ids, columns=["doc_id", class_field])
        cmap = dict(zip(fetched["doc_id"].to_pylist(),
                        fetched[class_field].to_pylist()))
        boosts: dict[str, float] = {}
        for g, s in top:
            c = cmap[g]
            boosts[c] = boosts.get(c, 0.0) + s / max_score
        # (count·(boost/count))/k with the sumdoc<k correction == boost/hits
        # (hits == k makes the two cases coincide)
        denom = float(len(top))
        best = sorted(boosts, key=lambda c: (-round(boosts[c] / denom, 9), c))[0]
        out_doc.append(did)
        out_cls.append(best)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "assigned": pa.array(out_cls, pa.string()),
        }
    )
