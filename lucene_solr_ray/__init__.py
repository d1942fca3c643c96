"""lucene_solr_ray — a Ray-Data-native inverted-index + BM25 engine.

A from-scratch reimplementation of the *capabilities* of Lucene/Solr
(reference: fullstorydev/lucene-solr @ 7.7.1, read-only at /root/reference)
expressed as Ray Data pipelines over zero-copy Arrow batches:

- ``analysis``  — StandardAnalyzer-equivalent tokenize/lowercase/stopword kernel
- ``util``      — SmallFloat norm quantization, FOR/delta posting codec
- ``index``     — distributed segment build (doc-id assignment, postings,
                  manifest/commit, CheckIndex-style validation)
- ``search``    — BM25 scoring (float32-faithful), boolean ops, block-max WAND,
                  top-k merge
- ``pipelines`` — training-data operators: dedup (exact/minhash/simhash),
                  ANN similarity search, text analysis, windowed events,
                  multimodal stubs

Nothing here calls ``ray.init``; callers own the Ray session.
"""

__version__ = "0.1.0"


def _silence_schema_hash_warning() -> None:
    """Drop Ray Data's per-read ``Failed to hash the schemas (for
    deduplication): unhashable type: 'dict'`` warning
    (``ray/data/_internal/arrow_ops/transform_pyarrow.py:181``): it fires on
    every read of a parquet file whose field metadata holds a dict (the
    ``events.props`` extension metadata), is harmless (Ray just skips a
    dedup fast path and unifies the schemas), and floods bench/driver logs
    enough to mask real warnings. Targeted filter — everything else from
    that logger still passes."""
    import logging

    class _DropSchemaHashWarning(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_DropSchemaHashWarning())


_silence_schema_hash_warning()

from .util.mem import tune_malloc as _tune_malloc  # noqa: E402

_tune_malloc()  # once per process; see util/mem.py for why
