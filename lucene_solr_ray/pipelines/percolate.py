"""Percolate driver entry — stored monitor queries over the streaming
documents table (``search/percolate.py``; MemoryIndex.java percolation
use-case). Doc ids are the raw ``documents.doc_id`` (no index / dense-id
mapping involved — percolation never touches an index)."""

from __future__ import annotations

import pyarrow as pa

from ..analysis.tokenizer import ENGLISH_STOP_WORDS

#: monitor query set: AND / OR / NOT / phrase via the classic parser
PERC_QUERIES = [
    ("alert_merge_join", "merge AND join"),
    ("alert_vector_or_window", "vector OR window"),
    ("alert_spark_not_slow", "spark AND NOT slow"),
    ("alert_phrase_batch", '"batch batch"'),
]


def percolate(sf_dir: str) -> pa.Table:
    """(doc_id, query_id) — which monitor queries match each document."""
    from ..search.percolate import percolate as run

    from .io import sized_read

    ds = sized_read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = run(ds, PERC_QUERIES)
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return tbl.sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


_STOPLIST = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))

SQL_PERCOLATE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM documents
),
kept AS (
  SELECT doc_id, tok FROM toks
  WHERE length(tok) <= 255 AND tok NOT IN ({_STOPLIST})
),
tfq AS (SELECT DISTINCT doc_id, tok FROM kept),
rawt AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+') AS toks FROM documents
),
tpos AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(toks), 1))) AS i, toks
  FROM rawt WHERE len(toks) > 0
),
tp AS (SELECT doc_id, toks[i] AS tok, i - 1 AS p FROM tpos WHERE i <= len(toks)),
ktp AS (
  SELECT doc_id, tok, p FROM tp
  WHERE length(tok) <= 255 AND tok NOT IN ({_STOPLIST})
)
SELECT doc_id, query_id FROM (
  SELECT doc_id, 'alert_merge_join' AS query_id FROM tfq
  WHERE tok IN ('merge', 'join') GROUP BY doc_id HAVING count(*) = 2
  UNION ALL
  SELECT DISTINCT doc_id, 'alert_vector_or_window' FROM tfq
  WHERE tok IN ('vector', 'window')
  UNION ALL
  SELECT doc_id, 'alert_spark_not_slow' FROM (
    (SELECT doc_id FROM tfq WHERE tok = 'spark')
    EXCEPT (SELECT doc_id FROM tfq WHERE tok = 'slow'))
  UNION ALL
  SELECT DISTINCT t0.doc_id, 'alert_phrase_batch' FROM ktp t0
  JOIN ktp t1 ON t1.doc_id = t0.doc_id AND t1.p = t0.p + 1
  WHERE t0.tok = 'batch' AND t1.tok = 'batch'
) ORDER BY query_id, doc_id
"""
