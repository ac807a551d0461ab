"""Ray-Data-native KG-construction + training-data engine.

Package-import side effect (deliberate): a targeted logging filter for
Ray's pandas size estimator. Zero-row pandas blocks with object/string
columns are LEGAL intermediate states here (typed empty frames are the
repo's zero-row-schema rule), but Ray 2.49's
``PandasBlockAccessor.size_bytes`` samples object columns with
``np.vectorize``, which raises on size-0 input and logs
``Error calculating size for column ...`` as a warning on EVERY worker
that sees an empty block — a log storm at 10^5 tasks. The estimator
recovers (it just skips the column's data bytes, exact for 0 rows), so
the warning carries no signal for empty blocks. Workers import this
package when deserializing stage UDFs, so installing the filter here
covers every worker process; only the size-0 variant is dropped —
genuine size-calculation errors still warn.
"""

import logging as _logging


class _EmptyBlockSizeFilter(_logging.Filter):
    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        msg = record.getMessage()
        return not ("Error calculating size for column" in msg
                    and "size 0 inputs" in msg)


_logging.getLogger("ray.data._internal.pandas_block").addFilter(
    _EmptyBlockSizeFilter())


class _SchemaHashFilter(_logging.Filter):
    """Drop Ray's 'Failed to hash the schemas (for deduplication):
    unhashable type: dict' worker warning. Root cause (measured): parquet
    files written by pandas carry a ``b'pandas'`` schema-metadata entry,
    and ``pa.Schema.__hash__`` raises ``unhashable type: 'dict'`` on any
    metadata-bearing schema, so ``unify_schemas``'s ``set(schemas)``
    fast-path dedup fails and logs before falling through to the full
    (correct) unify path — a wasted fast path, zero correctness impact.
    Only the dict-hash variant is dropped; other hash failures warn."""

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        msg = record.getMessage()
        return not ("Failed to hash the schemas" in msg
                    and "unhashable type: 'dict'" in msg)


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow").addFilter(
    _SchemaHashFilter())
