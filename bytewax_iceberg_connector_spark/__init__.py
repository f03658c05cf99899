"""bytewax_iceberg_connector_spark — a PySpark-native analytics engine with
the capability surface of KingMohan45/bytewax-iceberg-connector, rebuilt
Spark-first.

The reference (/root/reference, read-only snapshot) is a Bytewax→Iceberg
streaming sink connector: batching writer, Iceberg hidden partitioning,
optimistic commits, checkpointed state, and a small validate/serialize/enrich
operator layer. This package re-expresses that surface on Spark — where the
batching/commit/recovery machinery is subsumed by Structured Streaming +
the Iceberg Spark runtime — and adds the full relational + LLM-data-pipeline
query battery the north star mandates (SURVEY.md §2 Part B), every operator
designed for 100 TB scale.

Layout:
- session.py            SparkSession factory (AQE, Arrow, UTC)
- config.py             SinkConfig + throughput presets (reference models.py parity)
- sources/              parquet/table loaders (read path; reference has none)
- operators/            validate / serialize / enrich / error-split / partition
                        transforms / sink (reference operators.py+connector.py parity)
- functions/            deterministic numerics, text analysis, similarity kernels
- plans/                the query battery: relational, operator, LLM, streaming, lake
- streaming/            event-time windows, watermarks, micro-batch sinks
"""

from .config import CatalogType, FileFormat, IcebergSinkConfig
from .operators import (
    DEFAULT_JSON_SERDE,
    DEFAULT_PARQUET_SERDE,
    DEFAULT_PICKLE_SERDE,
    IcebergSerDe,
    JsonSerDe,
    LakeSink,
    OpOut,
    ParquetSerDe,
    PickleSerDe,
    enrich_with_metadata,
    error_split,
    serialize_records,
    validate_schema,
)
from .session import ensure_engine_conf, get_spark

#: reference __init__.py parity (src/bytewax_iceberg_connector/__init__.py:
#: exports IcebergSink, IcebergSinkConfig, IcebergOpOut envelope, default
#: SerDes). `IcebergSink` → LakeSink, `IcebergOpOut` → OpOut; the
#: message/state/error envelopes dissolve into DataFrame columns (SURVEY.md
#: §1.1), so there is nothing to export for them.
IcebergSink = LakeSink
IcebergOpOut = OpOut

__all__ = [
    "get_spark",
    "ensure_engine_conf",
    # reference public API (renamed + aliased)
    "IcebergSink",
    "LakeSink",
    "IcebergSinkConfig",
    "FileFormat",
    "CatalogType",
    "IcebergOpOut",
    "OpOut",
    "error_split",
    "validate_schema",
    "serialize_records",
    "enrich_with_metadata",
    "IcebergSerDe",
    "JsonSerDe",
    "ParquetSerDe",
    "PickleSerDe",
    "DEFAULT_JSON_SERDE",
    "DEFAULT_PARQUET_SERDE",
    "DEFAULT_PICKLE_SERDE",
]
__version__ = "0.1.0"
