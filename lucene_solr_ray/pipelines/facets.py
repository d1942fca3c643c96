"""Facet / grouping / stats operators — Solr faceting
(``lucene/facet``, ``FacetsCollector``), result grouping
(``lucene/grouping/FirstPassGroupingCollector``) and the stats component, as
Ray Data groupby pipelines (SURVEY.md §2.5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _docs(sf_dir: str, columns: tuple[str, ...] | None = None):
    """Documents read, column-pruned at the parquet layer — facet/grouping
    passes never need the wide ``text`` column."""
    import ray.data

    from .io import sized_read

    return sized_read(f"{sf_dir}/documents.parquet",
                      columns=list(columns) if columns else None)


def facet_counts(sf_dir: str) -> pa.Table:
    """(lang, source, n) — two-dim facet counts: per-batch partial counts
    (combiner), then a tiny (lang, source, n) groupby — partials shuffle,
    never rows."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, ["lang", "source"]).aggregate([([], "count_all")])
        return pa.table({
            "lang": g["lang"],
            "source": g["source"],
            "n": g["count_all"].cast(pa.int64()),
        })

    out = (
        _docs(sf_dir, ("lang", "source"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
    )
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return pa.table(
        {
            "lang": tbl["lang"].cast(pa.string()),
            "source": tbl["source"].cast(pa.string()),
            "n": tbl["n"].cast(pa.int64()),
        }
    )


SQL_FACET_COUNTS = """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY lang, source ORDER BY lang, source
"""


def grouped_topk(sf_dir: str, per_group: int = 2) -> pa.Table:
    """(source, rnk, doc_id, n_chars) — top-N docs per source by
    (n_chars desc, doc_id asc); two-pass grouping collector analog."""

    def topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(per_group)
        g = g.assign(rnk=np.arange(len(g), dtype=np.int64))
        return g[["source", "rnk", "doc_id", "n_chars"]]

    out = (
        _docs(sf_dir, ("source", "doc_id", "n_chars"))
        .groupby("source")
        .map_groups(topn, batch_format="pandas")
    )
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return pa.table(
        {
            "source": tbl["source"].cast(pa.string()),
            "rnk": tbl["rnk"].cast(pa.int64()),
            "doc_id": tbl["doc_id"].cast(pa.int64()),
            "n_chars": tbl["n_chars"].cast(pa.int64()),
        }
    )


SQL_GROUPED_TOPK = """
WITH r AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) - 1 AS rnk
  FROM documents
)
SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM r WHERE rnk < 2 ORDER BY source, rnk
"""


def lang_char_stats(sf_dir: str) -> pa.Table:
    """(lang, n, min_chars, max_chars, sum_chars) — stats component analog,
    pre-aggregated per batch before the tiny groupby."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select(["lang", "n_chars"]), "lang").aggregate(
            [("n_chars", "count"), ("n_chars", "min"),
             ("n_chars", "max"), ("n_chars", "sum")]
        )
        return pa.table({
            "lang": g["lang"],
            "n": g["n_chars_count"].cast(pa.int64()),
            "min_chars": g["n_chars_min"],
            "max_chars": g["n_chars_max"],
            "sum_chars": g["n_chars_sum"],
        })

    ds = _docs(sf_dir, ("lang", "n_chars")).map_batches(partial, batch_format="pyarrow")
    out = ds.groupby("lang").aggregate(
        Sum("n", alias_name="n"),
        Min("min_chars", alias_name="min_chars"),
        Max("max_chars", alias_name="max_chars"),
        Sum("sum_chars", alias_name="sum_chars"),
    )
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return pa.table(
        {
            "lang": tbl["lang"].cast(pa.string()),
            "n": tbl["n"].cast(pa.int64()),
            "min_chars": tbl["min_chars"].cast(pa.int64()),
            "max_chars": tbl["max_chars"].cast(pa.int64()),
            "sum_chars": tbl["sum_chars"].cast(pa.int64()),
        }
    )


SQL_LANG_CHAR_STATS = """
SELECT lang, CAST(count(*) AS BIGINT) AS n, CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
"""
