"""Solr streaming expressions re-expressed as Ray Data pipelines.

The reference surface is Solr 7.7's streaming-expression language
(``solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/`` —
``CloudSolrStream`` for ``search()``, ``RollupStream``, ``InnerJoinStream`` /
``HashJoinStream`` / ``LeftOuterJoinStream``, ``UniqueStream``, ``RankStream``
for ``top()``, ``SortStream``, ``SelectStream``, ``HavingStream``,
``MergeStream``, ``IntersectStream``, ``ComplementStream``, ``FacetStream``,
``StatsStream``; metrics in ``io/stream/metrics/``; grammar in
``io/stream/expr/StreamExpressionParser.java``).

Architecture (Ray-Data-first, NOT a port of Solr's tuple iterators):

- every stream node is a lazy ``ray.data.Dataset`` plus an *ordering spec*.
  Solr streams are strictly merge-sorted tuple iterators; a distributed
  block-streaming engine deliberately keeps blocks unordered and instead
  records the declared sort as metadata, applying it only where semantics
  require it (``unique`` picks its representative with the spec; ``top`` /
  ``sort`` establish real order).
- ``search(collection, ...)`` reads the collection's parquet with column
  pruning (``fl``) and predicate pushdown (``q``) at the read.
- aggregating decorators (``rollup`` / ``facet`` / ``stats``) run the
  combiner pattern: vectorized per-block partial aggregates via
  ``pyarrow.TableGroupBy`` inside ``map_batches``, then one final combine —
  partials move through the shuffle, never rows.
- joins / ``intersect`` / ``complement`` / ``fetch`` broadcast the small
  (hashed) side once via ``ray.put`` and do a vectorized Acero
  ``pyarrow.Table.join`` per left block — the exact analog of Solr's
  ``HashJoinStream``, which also materializes the hashed stream in memory.
  Partitioning assumption: the hashed side fits in a worker heap; a
  big-big join would instead hash-partition both sides on the key.
"""

from .parser import StreamExpression, parse_expression
from .streams import StreamNode, build_stream, run_expression

__all__ = [
    "StreamExpression",
    "parse_expression",
    "StreamNode",
    "build_stream",
    "run_expression",
]
