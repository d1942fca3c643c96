"""UnifiedHighlighter-style snippets (SURVEY.md §2.5 "highlighting").

Semantics mirror ``lucene/highlighter/src/java/org/apache/lucene/search/
uhighlight/``:

- Offset source = ANALYSIS (AnalysisOffsetStrategy.java): stored text is
  re-tokenized with char offsets at highlight time — the two-phase
  stored-fields fetch, no postings-format change. (POSTINGS offsets are the
  deferred scale option; at top-k = 10 docs per query, re-analysis is what
  Lucene itself does for fields indexed without offsets.)
- Passages = sentence-ish units. Deviation from
  ``BreakIterator.getSentenceInstance(Locale.ROOT)``: boundaries are
  ``[.!?]+`` followed by whitespace, or a blank line — a deterministic
  regex subset of ICU sentence rules.
- Passage scoring = PassageScorer.java:80-142 exactly:
  ``score = norm(start) * Σ_unique_terms tf(freq_in_passage, len) *
  weight(content_len, ttf_in_doc)`` with
  ``weight = (k1+1)·ln(1 + (1 + len/pivot + 0.5)/(ttf + 0.5))``,
  ``tf = freq/(freq + k1·((1−b) + b·len/pivot))``,
  ``norm = 1 + 1/ln(pivot + start)``; defaults k1=1.2, b=0.75, pivot=87.
- Formatting = DefaultPassageFormatter.java: matches wrapped in
  ``<b>…</b>`` (overlapping matches merged), selected passages ordered by
  offset, joined with ``"... "``.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from ..analysis.tokenizer import StandardAnalyzer, analyze_with_offsets
from .query import CONTENT_FIELD, Query, query_terms, rewrite

_SENTENCE_BREAK = re.compile(r"(?<=[.!?])\s+|\n\s*\n")

DEFAULT_PIVOT = 87.0  # "typical average english sentence length" (PassageScorer.java:60)


@dataclass
class Passage:
    start: int
    end: int
    matches: list[tuple[int, int, str]] = field(default_factory=list)  # (s, e, term)
    score: float = 0.0


def sentence_spans(text: str) -> list[tuple[int, int]]:
    """(start, end) spans of sentence-ish passages covering ``text``."""
    spans = []
    prev = 0
    for m in _SENTENCE_BREAK.finditer(text):
        if m.start() > prev:
            spans.append((prev, m.start()))
        prev = m.end()
    if prev < len(text):
        spans.append((prev, len(text)))
    return spans or ([(0, 0)] if not text else [(0, len(text))])


class PassageScorer:
    """PassageScorer.java formulas, float64."""

    def __init__(self, k1: float = 1.2, b: float = 0.75, pivot: float = DEFAULT_PIVOT):
        self.k1, self.b, self.pivot = k1, b, pivot

    def weight(self, content_len: int, ttf: int) -> float:
        num_docs = 1 + content_len / self.pivot
        return (self.k1 + 1) * math.log(1 + (num_docs + 0.5) / (ttf + 0.5))

    def tf(self, freq: int, passage_len: int) -> float:
        norm = self.k1 * ((1 - self.b) + self.b * (passage_len / self.pivot))
        return freq / (freq + norm)

    def norm(self, passage_start: int) -> float:
        return 1 + 1 / math.log(self.pivot + passage_start)

    def score(self, passage: Passage, content_len: int, ttf_of: dict[str, int]) -> float:
        freqs: dict[str, int] = {}
        for _s, _e, t in passage.matches:
            freqs[t] = freqs.get(t, 0) + 1
        plen = passage.end - passage.start
        s = 0.0
        for t, f in freqs.items():
            s += self.tf(f, plen) * self.weight(content_len, ttf_of.get(t, f))
        return s * self.norm(passage.start)


def _query_highlight_terms(q: Query, reader, fld: str) -> set[str]:
    """Terms to highlight: query terms on ``fld`` AFTER rewrite (so
    prefix/wildcard/fuzzy/regexp expansions highlight their concrete
    matches, like UnifiedHighlighter's extracted automata terms)."""
    rq = rewrite(q, reader)
    return {t for f, t in query_terms(rq) if f == fld}


def highlight_text(
    text: str,
    terms: set[str],
    *,
    max_passages: int = 3,
    analyzer: StandardAnalyzer | None = None,
    scorer: PassageScorer | None = None,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
) -> str | None:
    """Best-passage snippet of ``text`` for ``terms``; None when nothing
    matches (UnifiedHighlighter returns null for no-match docs). Offset
    source = ANALYSIS (re-tokenization)."""
    if not terms or not text:
        return None
    toks = analyze_with_offsets(text, analyzer or StandardAnalyzer())
    hits = [(s, e, t) for (t, _p, s, e) in toks if t in terms]
    ttf_of: dict[str, int] = {}
    for t, _p, _s, _e in toks:
        if t in terms:
            ttf_of[t] = ttf_of.get(t, 0) + 1
    return _snippet_from_hits(text, hits, ttf_of, max_passages=max_passages,
                              scorer=scorer, pre_tag=pre_tag, post_tag=post_tag)


def _snippet_from_hits(
    text: str,
    hits: list[tuple[int, int, str]],
    ttf_of: dict[str, int],
    *,
    max_passages: int = 3,
    scorer: PassageScorer | None = None,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
) -> str | None:
    """Passage selection + formatting over precomputed (start, end, term)
    match offsets — shared by the ANALYSIS and POSTINGS offset sources."""
    if not hits:
        return None
    hits = sorted(hits)
    passages = [Passage(s, e) for s, e in sentence_spans(text)]
    hi = 0
    for p in passages:
        while hi < len(hits) and hits[hi][0] < p.start:
            hi += 1
        while hi < len(hits) and hits[hi][1] <= p.end:
            p.matches.append(hits[hi])
            hi += 1
    sc = scorer or PassageScorer()
    matched = [p for p in passages if p.matches]
    for p in matched:
        p.score = sc.score(p, len(text), ttf_of)
    # top-N by score (ties: earlier passage first, like the PQ's offset tie),
    # then re-order the selected passages by offset for display
    best = sorted(matched, key=lambda p: (-p.score, p.start))[:max_passages]
    best.sort(key=lambda p: p.start)
    parts = []
    for p in best:
        # merge overlapping/adjacent match ranges (DefaultPassageFormatter:62-74)
        merged: list[list[int]] = []
        for s, e, _t in sorted(p.matches):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        out = []
        cur = p.start
        for s, e in merged:
            out.append(text[cur:s])
            out.append(pre_tag)
            out.append(text[s:e])
            out.append(post_tag)
            cur = e
        out.append(text[cur : p.end])
        parts.append("".join(out))
    return "... ".join(parts)


def _postings_offset_hits(searcher, terms: set[str], doc_ids: list[int],
                          fld: str):
    """POSTINGS offset source (IndexOptions ..._AND_OFFSETS;
    uhighlight/FieldOffsetStrategy POSTINGS): per hit doc, match offsets
    come straight off the indexed off_blob streams — no re-analysis of the
    stored text. Returns ({doc_id: [(s, e, term)]}, {doc_id: {term: tf}})."""
    import os

    import numpy as np

    from ..index.reader import read_postings_rows
    from .wand import build_lazy

    reader = searcher.reader
    hits: dict[int, list[tuple[int, int, str]]] = {int(d): [] for d in doc_ids}
    ttf: dict[int, dict[str, int]] = {int(d): {} for d in doc_ids}
    segs = sorted(reader.segments, key=lambda s: s["doc_base"])
    bases = [s["doc_base"] for s in segs]
    by_seg: dict[int, list[int]] = {}
    for d in doc_ids:
        i = int(np.searchsorted(bases, int(d), side="right")) - 1
        by_seg.setdefault(i, []).append(int(d))
    pairs = [(fld, t) for t in terms]
    for i, gids in by_seg.items():
        seg = segs[i]
        path = os.path.join(reader.seg_dir(seg["seg"]), "postings.parquet")
        lazy = build_lazy(read_postings_rows(path, pairs))
        for t in terms:
            tp = lazy.get((fld, t))
            if tp is None or not tp.off_blob:
                continue
            ids, freqs = tp.full()
            f_off, starts, ends = tp.offsets()
            for gid in gids:
                lid = gid - seg["doc_base"]
                j = int(np.searchsorted(ids, lid))
                if j < len(ids) and ids[j] == lid:
                    sl = slice(int(f_off[j]), int(f_off[j + 1]))
                    hits[gid].extend(
                        (int(s), int(e), t)
                        for s, e in zip(starts[sl], ends[sl])
                    )
                    ttf[gid][t] = int(freqs[j])
    return hits, ttf


def highlight_hits(searcher, query: Query, doc_ids: list[int],
                   fld: str = CONTENT_FIELD, max_passages: int = 3):
    """Two-phase fetch + snippet per hit → {doc_id: snippet | None}.

    Requires an index built with ``store_content=True`` (stored-fields
    analog); raises KeyError otherwise. When the index was built with
    ``store_offsets=True`` the match offsets come from the postings
    (index-stored offsets — cheap at scale: no re-tokenization of k stored
    texts per query); otherwise the stored text is re-analyzed."""
    import pyarrow as pa

    terms = _query_highlight_terms(query, searcher.reader, fld)
    docs = searcher.reader.fetch_docs(list(doc_ids), columns=["doc_id", "content"])
    text_of = dict(zip(docs["doc_id"].to_pylist(), docs["content"].to_pylist()))
    if searcher.reader.manifest.get("offsets"):
        off_hits, ttf = _postings_offset_hits(searcher, terms, doc_ids, fld)
        return {
            int(d): _snippet_from_hits(
                text_of.get(int(d)) or "", off_hits[int(d)], ttf[int(d)],
                max_passages=max_passages)
            for d in doc_ids
        }
    return {
        int(d): highlight_text(text_of.get(int(d)) or "", terms, max_passages=max_passages)
        for d in doc_ids
    }
