"""CheckIndex-style invariant validation (``index/CheckIndex.java:723,1191,1727``).

Walks every segment, decodes every posting list, and re-derives the stats the
manifest claims. Raises ``CheckIndexError`` listing all violations.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from ..util.forutil import decode_postings
from ..util.smallfloat import int_to_byte4
from .reader import IndexReader


class CheckIndexError(AssertionError):
    pass


def check_index(index_dir: str, corpus_sha: dict[tuple, str] | None = None) -> dict:
    """Validate the index; returns summary metrics on success.

    ``corpus_sha``: optional {(repo, path, commit): sha256} mapping to verify
    per-row content fidelity end-to-end (BASELINE.json per-row invariant).
    """
    r = IndexReader(index_dir)
    problems: list[str] = []
    tot_docs = tot_pairs = tot_ttf = tot_len = 0
    seen_doc_ids: list[np.ndarray] = []

    for seg in r.segments:
        sd = r.seg_dir(seg["seg"])
        docs = pq.read_table(os.path.join(sd, "docs.parquet"))
        posts = pq.read_table(os.path.join(sd, "postings.parquet"))
        n = len(docs)
        if n != seg["doc_count"]:
            problems.append(f"seg {seg['seg']}: doc_count mismatch {n} != {seg['doc_count']}")
        doc_ids = docs["doc_id"].to_numpy()
        if n and not (
            doc_ids[0] == seg["doc_base"] and np.array_equal(doc_ids, seg["doc_base"] + np.arange(n))
        ):
            problems.append(f"seg {seg['seg']}: doc_ids not dense from base")
        # doc sort order == index sort (sort_fields + KEY_COLS tiebreak);
        # [] (post-addIndexes) keeps the per-segment check on the default key
        # order of the segment's ORIGINATING build, which we can't know —
        # skip the order check, the dense-id + uniqueness checks still run
        sort_cols = r.sort_fields or None
        if sort_cols is not None:
            cols = list(dict.fromkeys([*sort_cols, "repo", "path", "commit"]))
            keys = list(zip(*(docs[c].to_pylist() for c in cols)))
            if keys != sorted(keys):
                problems.append(f"seg {seg['seg']}: docs not sorted by key")
        else:
            keys = list(zip(docs["repo"].to_pylist(), docs["path"].to_pylist(),
                            docs["commit"].to_pylist()))
        if len(set(keys)) != len(keys):
            problems.append(f"seg {seg['seg']}: duplicate (repo,path,commit) keys")
        # norms consistent with field_len
        fl = docs["field_len"].to_numpy().astype(np.int64)
        nb = docs["norm_byte"].to_numpy()
        if not np.array_equal(int_to_byte4(fl), nb):
            problems.append(f"seg {seg['seg']}: norm_byte != intToByte4(field_len)")
        if corpus_sha is not None:
            for k, sha in zip(keys, docs["content_sha256"].to_pylist()):
                if corpus_sha.get(k) != sha:
                    problems.append(f"seg {seg['seg']}: sha mismatch for {k}")
                    break
        # stored content (store_content=True) must hash to content_sha256
        if "content" in docs.column_names:
            import hashlib

            for sha, text in zip(
                docs["content_sha256"].to_pylist(), docs["content"].to_pylist()
            ):
                if hashlib.sha256((text or "").encode("utf-8")).hexdigest() != sha:
                    problems.append(f"seg {seg['seg']}: stored content != content_sha256")
                    break

        terms = posts["term"].to_pylist()
        fields = (
            posts["field"].to_pylist()
            if "field" in posts.column_names
            else ["content"] * len(terms)
        )
        if list(zip(fields, terms)) != sorted(zip(fields, terms)):
            problems.append(f"seg {seg['seg']}: (field, term) rows not sorted")
        dfs = posts["df"].to_numpy()
        ttfs = posts["ttf"].to_numpy()
        pair_count = 0  # content-field sums (top-level stats cover content)
        ttf_count = 0
        for i in range(len(posts)):
            df = int(dfs[i])
            is_content = fields[i] == "content"
            ids, freqs = decode_postings(
                posts["doc_blob"][i].as_py(), posts["freq_blob"][i].as_py(), df
            )
            if len(ids) != df or len(np.unique(ids)) != df or not np.all(np.diff(ids) > 0):
                problems.append(f"seg {seg['seg']}: postings of {terms[i]!r} not sorted-unique")
                break
            if ids[-1] >= n or ids[0] < 0:
                problems.append(f"seg {seg['seg']}: doc id out of range for {terms[i]!r}")
                break
            if int(freqs.sum()) != int(ttfs[i]):
                problems.append(f"seg {seg['seg']}: ttf mismatch for {terms[i]!r}")
                break
            pos_blob = posts["pos_blob"][i].as_py() if "pos_blob" in posts.column_names else b""
            if pos_blob:
                from ..util.forutil import decode_blocks

                vals = decode_blocks(pos_blob, int(ttfs[i])).astype(np.int64)
                f_off = np.concatenate([[0], np.cumsum(freqs)])
                c = np.cumsum(vals)
                base = np.where(f_off[:-1] > 0, c[np.maximum(f_off[:-1] - 1, 0)], 0)
                pos = c - np.repeat(base, freqs)
                if np.any(pos < 0):
                    problems.append(f"seg {seg['seg']}: negative position for {terms[i]!r}")
                    break
                # strictly increasing within each doc
                same_doc = np.ones(len(pos), dtype=bool)
                same_doc[f_off[:-1]] = False
                if np.any((np.diff(pos, prepend=pos[0] if len(pos) else 0) <= 0) & same_doc):
                    problems.append(f"seg {seg['seg']}: positions not increasing for {terms[i]!r}")
                    break
            last = np.asarray(posts["block_last_doc"][i].as_py())
            maxf = np.asarray(posts["block_max_freq"][i].as_py())
            if not np.all(np.diff(last) > 0):
                problems.append(f"seg {seg['seg']}: block last_doc not increasing for {terms[i]!r}")
                break
            for bi in range(len(last)):
                blk = freqs[bi * 128 : (bi + 1) * 128]
                if maxf[bi] != blk.max():
                    problems.append(f"seg {seg['seg']}: block_max_freq wrong for {terms[i]!r}")
                    break
            if is_content:
                pair_count += df
                ttf_count += int(ttfs[i])
        if pair_count != seg["sum_df"]:
            problems.append(f"seg {seg['seg']}: sum_df mismatch")
        if ttf_count != seg["sum_ttf"]:
            problems.append(f"seg {seg['seg']}: sum_ttf mismatch")
        if ttf_count != int(fl.sum()):
            problems.append(f"seg {seg['seg']}: sum ttf != sum field_len")
        tot_docs += n
        tot_pairs += pair_count
        tot_ttf += ttf_count
        tot_len += int(fl.sum())
        seen_doc_ids.append(doc_ids)

    all_ids = np.concatenate(seen_doc_ids) if seen_doc_ids else np.empty(0, dtype=np.int64)
    if len(np.unique(all_ids)) != len(all_ids):
        problems.append("global doc_ids not unique")
    if tot_docs and not np.array_equal(np.sort(all_ids), np.arange(tot_docs)):
        problems.append("global doc_ids not dense 0..N-1")
    if tot_docs != r.stats.doc_count:
        problems.append("stats.doc_count mismatch")
    if tot_ttf != r.stats.sum_ttf:
        problems.append("stats.sum_ttf mismatch")
    if tot_pairs != r.stats.sum_df:
        problems.append("stats.sum_df mismatch")

    if problems:
        raise CheckIndexError("; ".join(problems[:20]))
    return {
        "segments": len(r.segments),
        "docs": tot_docs,
        "term_doc_pairs": tot_pairs,
        "sum_ttf": tot_ttf,
    }
