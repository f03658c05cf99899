"""load_table type-normalization contract.

The driver regenerates the test parquet between rounds and has shipped the
SAME logical column under different physical annotations (events.ts:
timestamp[ns] in round 2 → timestamp[us] in round 3). Spark 4 reads
annotation-free timestamp[us] as TIMESTAMP_NTZ, which time-arithmetic
builtins (unix_micros, window, …) reject — every query must therefore see
ONE stable timestamp type regardless of what the generator emitted.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bytewax_iceberg_connector_spark.sources.tables import TABLE_NAMES, load_table


def test_no_table_exposes_timestamp_ntz(spark, sf_dir):
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
        assert not ntz, f"{name}: NTZ columns leaked through load_table: {ntz}"


def test_events_ts_supports_time_arithmetic(spark, sf_dir):
    """unix_micros is the canary: it rejects TIMESTAMP_NTZ outright."""
    df = load_table(spark, sf_dir, "events")
    n = df.select(F.expr("unix_micros(ts)").alias("us")).where(F.col("us") > 0).count()
    assert n > 0


def test_ntz_cast_is_value_preserving_under_utc(spark, tmp_path):
    """Writing a naive timestamp and reading it back through the cast must
    not shift wall-clock values (session tz is pinned UTC)."""
    import datetime as dt

    p = str(tmp_path / "events.parquet")
    want = dt.datetime(2024, 3, 1, 12, 34, 56)
    spark.createDataFrame(
        [(1, want)], "event_id long, ts timestamp_ntz"
    ).write.parquet(p)
    got = load_table(spark, str(tmp_path), "events").collect()[0]
    assert dict(got.asDict())["ts"] == want
