"""Suggest + spellcheck over the term dictionary (SURVEY.md §2 "suggest").

- :func:`suggest_prefix` — completion suggester: top terms by collection df
  under a prefix (``lucene/suggest/.../analyzing/AnalyzingSuggester.java``
  with weight = docFreq, over the postings term dictionary instead of a
  dedicated FST — the term dict's sorted parquet column IS the automaton
  analog here).
- :func:`spell_suggest` — DirectSpellChecker analog
  (``lucene/suggest/.../spell/DirectSpellChecker.java``): candidate terms
  within ``max_edits`` Levenshtein of the input, more frequent than the
  input term, ranked (distance asc, df desc, term asc) — the reference
  ranks by a distance-derived score then docFreq; the integer ordering here
  is the deterministic equivalent.

Both run as one column-pruned distributed pass over the postings files
(term + df only), with a cheap per-block prefilter before the exact
Levenshtein (length band |len−len(q)| ≤ max_edits).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .query import CONTENT_FIELD


def _term_df(reader, field: str, flt, top: int | None = None) -> pa.Table:
    """Distributed (term, df) aggregation over postings blocks with a
    per-block vectorized filter ``flt(term_array) -> mask``, summed per
    term by a distributed ``groupby(term).aggregate(Sum)``. With ``top``
    set, each output block is truncated to its per-block top rows by
    (df desc, term asc) BEFORE the driver gather, so even an unselective
    filter (the infix suggester's substring match over the whole
    vocabulary) ships only ≤ top×blocks rows to the driver."""
    import numpy as np
    import ray.data
    from ray.data.aggregate import Sum

    def pick(batch: pa.Table) -> pa.Table:
        terms = batch["term"]
        mask = flt(terms)
        sel = batch.filter(pa.array(mask))
        return pa.table({"term": sel["term"], "df": sel["df"].cast(pa.int64())})

    ds = (
        ray.data.read_parquet(
            reader.postings_files(),
            columns=["field", "term", "df"],
            filter=pa.compute.field("field") == field,
        )
        .map_batches(pick, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
    if top is not None:
        def block_topk(batch: pa.Table) -> pa.Table:
            if len(batch) <= top:
                return batch
            terms = batch["term"].to_numpy(zero_copy_only=False)
            dfs = batch["df"].to_numpy(zero_copy_only=False)
            order = np.lexsort((terms, -dfs))[:top]
            return batch.take(pa.array(np.sort(order)))

        ds = ds.map_batches(block_topk, batch_format="pyarrow")
    empty = pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
    return pa.concat_tables(
        [empty, *(b for b in ds.iter_batches(batch_format="pyarrow") if len(b))],
        promote_options="default",
    )


def suggest_prefix(reader, prefix: str, num: int = 5, field: str = CONTENT_FIELD,
                   use_automaton: bool = False) -> pa.Table:
    """→ (term, df) top-``num`` by (df desc, term asc).

    ``use_automaton=True``: serve from the per-process in-memory weighted
    prefix automaton (search/suggest_fst.py — the AnalyzingSuggester FST
    analog, built once per index generation): microsecond hot-path lookups
    instead of a distributed term-dictionary scan per query. Identical
    results (pinned in tests/test_suggest_fst.py)."""
    if use_automaton:
        from .suggest_fst import automaton_for

        hits = automaton_for(reader, field).top_k(prefix, num)
        return pa.table({
            "term": pa.array([t for t, _ in hits], pa.string()),
            "df": pa.array([w for _, w in hits], pa.int64()),
        })
    import pyarrow.compute as pc

    tbl = _term_df(reader, field, lambda t: pc.starts_with(t, prefix).to_numpy(zero_copy_only=False), top=num)
    df = tbl.to_pandas().sort_values(["df", "term"], ascending=[False, True]).head(num)
    return pa.table(
        {"term": pa.array(df["term"], pa.string()), "df": pa.array(df["df"], pa.int64())}
    )


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return prev[lb]


def spell_suggest(reader, term: str, max_edits: int = 2, num: int = 5,
                  field: str = CONTENT_FIELD, more_popular: bool = True) -> pa.Table:
    """→ (term, dist, df) top-``num`` by (dist asc, df desc, term asc).

    ``more_popular``: only suggest terms with df > the input term's df
    (DirectSpellChecker's docfreq comparison; an unknown input has df 0)."""

    def flt(terms: pa.Array):
        lens = pa.compute.utf8_length(terms).to_numpy(zero_copy_only=False)
        return np.abs(lens - len(term)) <= max_edits

    tbl = _term_df(reader, field, flt)
    terms = tbl["term"].to_pylist()
    dfs = tbl["df"].to_numpy() if len(tbl) else np.empty(0, np.int64)
    in_df = 0
    rows = []
    for t, df in zip(terms, dfs):
        if t == term:
            in_df = int(df)
            continue
        d = _levenshtein(term, t)
        if d <= max_edits:
            rows.append((d, -int(df), t))
    if more_popular:
        rows = [r for r in rows if -r[1] > in_df]
    rows.sort()
    rows = rows[:num]
    return pa.table(
        {
            "term": pa.array([t for _d, _nd, t in rows], pa.string()),
            "dist": pa.array([d for d, _nd, _t in rows], pa.int64()),
            "df": pa.array([-nd for _d, nd, _t in rows], pa.int64()),
        }
    )


def suggest_infix(reader, substring: str, num: int = 5,
                  field: str = CONTENT_FIELD) -> pa.Table:
    """AnalyzingInfixSuggester analog
    (``lucene/suggest/.../analyzing/AnalyzingInfixSuggester.java`` — matches
    the query anywhere inside the suggestion, not just at its start): terms
    CONTAINING ``substring``, ranked (df desc, term asc) → (term, df)."""
    import pyarrow.compute as pc

    def flt(terms):
        return pc.match_substring(terms, substring).to_numpy(zero_copy_only=False)

    tbl = _term_df(reader, field, flt, top=num)
    if not len(tbl):
        return tbl
    df = tbl["df"].to_numpy()
    terms = np.asarray(tbl["term"].to_pylist(), dtype=object)
    order = np.lexsort((terms, -df))[:num]
    return pa.table({
        "term": pa.array(terms[order], pa.string()),
        "df": pa.array(df[order].astype(np.int64), pa.int64()),
    })


def word_breaks(reader, terms: list[str], num: int = 5, min_freq: int = 1,
                field: str = CONTENT_FIELD) -> pa.Table:
    """WordBreakSpellChecker.suggestWordBreaks analog (lucene/suggest/.../
    spell/WordBreakSpellChecker.java:90-121, maxChanges=1): every split
    (lhs, rhs) of an input where both halves are dictionary terms with
    df ≥ min_freq; ranked NUM_CHANGES_THEN_MAX_FREQUENCY — one break
    everywhere, so (max(df_l, df_r) desc, lhs asc); the reference's heap
    order on freq ties is unspecified, the lhs tie-break pins ours.

    Distributed df lookup: ONE pruned postings scan filtered to the ≤2·Σlen
    candidate half-strings (is_in prefilter per block), tiny partials."""
    import pyarrow.compute as pc

    halves: set[str] = set()
    for t in terms:
        for i in range(1, len(t)):
            halves.add(t[:i])
            halves.add(t[i:])
    hv = pa.array(sorted(halves), pa.string())

    def flt(ts):
        return pc.is_in(ts, value_set=hv).to_numpy(zero_copy_only=False)

    tbl = _term_df(reader, field, flt)
    dfm = dict(zip(tbl["term"].to_pylist(), (int(x) for x in tbl["df"].to_pylist())))
    out_i, out_r, out_l, out_rh, out_f = [], [], [], [], []
    for t in terms:
        cands = []
        for i in range(1, len(t)):
            dl, dr = dfm.get(t[:i], 0), dfm.get(t[i:], 0)
            if dl >= min_freq and dr >= min_freq:
                cands.append((max(dl, dr), t[:i], t[i:]))
        cands.sort(key=lambda c: (-c[0], c[1]))
        for r, (f, lh, rh) in enumerate(cands[:num]):
            out_i.append(t)
            out_r.append(r)
            out_l.append(lh)
            out_rh.append(rh)
            out_f.append(f)
    return pa.table({
        "input": pa.array(out_i, pa.string()),
        "rank": pa.array(out_r, pa.int64()),
        "lhs": pa.array(out_l, pa.string()),
        "rhs": pa.array(out_rh, pa.string()),
        "freq": pa.array(out_f, pa.int64()),
    })


def suggest_fuzzy(reader, q: str, num: int = 10, max_edits: int = 1,
                  non_fuzzy_prefix: int = 1, field: str = CONTENT_FIELD) -> pa.Table:
    """FuzzySuggester analog (suggest/analyzing/FuzzySuggester.java:
    defaults maxEdits=1, nonFuzzyPrefix=1): completions whose first-len(q)
    prefix is within ``max_edits`` plain-Levenshtein of the typed text, the
    first ``non_fuzzy_prefix`` chars matching exactly; weight = df, rank
    (df desc, term asc). Fixed-length-prefix simplification of the
    reference's Levenshtein automaton (length-changing edits realign there;
    identical on both sides of the oracle). Same distributed pruned df scan
    as spell_suggest."""

    def flt(ts):
        out = np.zeros(len(ts), dtype=bool)
        head = q[:non_fuzzy_prefix]
        for i, t in enumerate(ts.to_pylist()):
            if not t or t[:non_fuzzy_prefix] != head:
                continue
            out[i] = _levenshtein(t[: len(q)], q) <= max_edits
        return out

    tbl = _term_df(reader, field, flt)
    df = tbl.to_pandas().sort_values(["df", "term"], ascending=[False, True]).head(num)
    return pa.table({
        "term": pa.array(df["term"], pa.string()),
        "df": pa.array(df["df"].astype("int64"), pa.int64()),
    })
