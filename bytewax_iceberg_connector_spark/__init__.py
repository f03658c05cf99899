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

from .session import ensure_engine_conf, get_spark

__all__ = ["get_spark", "ensure_engine_conf"]
__version__ = "0.1.0"
