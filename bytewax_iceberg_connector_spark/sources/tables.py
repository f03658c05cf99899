"""Parquet table sources for the driver-generated test corpus.

The reference has NO read path at all (it is sink-only; see SURVEY.md §2
"Not present in the reference"). All scans in this engine are native Spark
parquet scans so that Catalyst pushes predicates/projections into the reader
(``PushedFilters`` / ``ReadSchema`` in .explain) and partition/file pruning
comes for free when the same tables live in Iceberg.

Scale notes: never materialize or cache here — these loaders return lazy
DataFrames; column pruning only works if callers ``select`` narrow and let
Catalyst prune the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_engine_conf

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: tables small enough to broadcast at ANY scale factor (TPC-H fixes region=5,
#: nation=25 rows; supplier stays tiny in this corpus). Join sides built from
#: these should be wrapped in F.broadcast().
BROADCAST_TABLES = frozenset({"region", "nation"})


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes types to engine conventions.

    - ``events.ts`` as parquet timestamp[ns]: Spark reads it as a long
      (nanosAsLong) and we truncate to microseconds — identical to DuckDB's
      TIMESTAMP_NS→TIMESTAMP cast, so oracle comparisons line up. Integer
      `div` (not `/`) avoids double-precision loss on epoch-nanos.
    - parquet timestamp[us] without timezone: Spark 4 reads it as
      TIMESTAMP_NTZ, which time-arithmetic builtins (``unix_micros`` et al.)
      reject. Cast every NTZ column to the session type — with the engine's
      pinned UTC session timezone this is value-identical to DuckDB's naive
      TIMESTAMP read, and it keeps query code on ONE timestamp type no
      matter which physical annotation the test-data generator emitted.
    """
    ensure_engine_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Expose the corpus tables as temp views so the FULL engine surface
    is reachable from plain ``spark.sql`` — same lazy scans, same
    pushdown; the view layer adds nothing physical."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
