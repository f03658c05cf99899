"""Lake round-trip query (B23): the reference's core write path end-to-end.

A1 (sink) + A6 (hidden partition transforms) + A9 (create-if-missing) as one
verifiable query: write events into a day-partitioned lake table via
LakeSink, read it back, aggregate per partition. The oracle reads the
ORIGINAL parquet — so the check proves the round-trip loses/duplicates
nothing and the partition transform groups exactly like date_trunc.

Uses the parquet-warehouse backend in this container (no Iceberg jar — see
operators/sink.py); the Iceberg backend takes the identical code path via
writeTo/partitionedBy.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IcebergSinkConfig
from ..functions.numeric import sql_dsum
from ..operators.sink import LakeSink
from ..sources.tables import load_table


def iceberg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write → read-back → per-partition accounting.

    Idempotent per invocation: a fresh warehouse dir per call (the driver may
    run the query callable repeatedly).
    """
    ev = load_table(spark, sf_dir, "events")
    warehouse = tempfile.mkdtemp(prefix="bic_lake_")
    cfg = IcebergSinkConfig(
        table_name="analytics.events_lake",
        warehouse_path=warehouse,
        num_partitions=8,
        partition_spec=[("ts", "day")],
    )
    sink = LakeSink(spark, cfg)
    sink.append(ev)
    back = sink.read()
    # partition column round-trips as a directory key; Spark reads the
    # hive-layout value back as a timestamp-typed partition column
    out = (
        back.groupBy(F.col("_p_ts_day").cast("date").alias("p_day"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_id").alias("n_distinct_ids"),
        )
        .orderBy("p_day")
    )
    # materialize before the temp warehouse can be cleaned up by the OS; the
    # result is small (one row per day partition)
    rows = out.collect()
    shutil.rmtree(warehouse, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


_SQL_ROUNDTRIP = """
SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS p_day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_id) AS n_distinct_ids
FROM events
GROUP BY p_day
ORDER BY p_day
"""


QUERIES = {"iceberg_roundtrip": iceberg_roundtrip}
ORACLE = {"iceberg_roundtrip": _SQL_ROUNDTRIP}
