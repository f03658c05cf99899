"""Operator layer — the reference's dataflow API surface, DataFrame-first.

Every operator keeps the reference's oks/errs dual-stream contract
(IcebergOpOut, operators.py:58-84) via the shared ``_error`` column +
``error_split``.
"""

from .enrich import enrich_with_callable, enrich_with_metadata
from .errors import ERROR_COL, OpOut, error_split, with_error_col
from .partitioning import PartitionField, partition_columns, partition_key, transform_column
from .serialize import (
    DEFAULT_JSON_SERDE,
    DEFAULT_PARQUET_SERDE,
    DEFAULT_PICKLE_SERDE,
    IcebergSerDe,
    JsonSerDe,
    ParquetSerDe,
    PickleSerDe,
    serialize_records,
)
from .sink import LakeSink, iceberg_runtime_available
from .validate import validate_schema, validate_with_callable

__all__ = [
    "ERROR_COL",
    "OpOut",
    "error_split",
    "with_error_col",
    "validate_schema",
    "validate_with_callable",
    "serialize_records",
    "IcebergSerDe",
    "JsonSerDe",
    "ParquetSerDe",
    "PickleSerDe",
    "DEFAULT_JSON_SERDE",
    "DEFAULT_PARQUET_SERDE",
    "DEFAULT_PICKLE_SERDE",
    "enrich_with_metadata",
    "enrich_with_callable",
    "PartitionField",
    "partition_key",
    "partition_columns",
    "transform_column",
    "LakeSink",
    "iceberg_runtime_available",
]
