"""Iceberg partition-transform tests (A6 parity: named + computed specs,
transform edge cases — the coverage the reference claims, README.md:120-123)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bytewax_iceberg_connector_spark.operators.partitioning import (
    PartitionField,
    partition_columns,
    partition_key,
    transform_column,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            Row(id=7, name="alpha", ts=dt.datetime(2024, 3, 15, 13, 45, 1)),
            Row(id=-7, name="beta", ts=dt.datetime(2024, 3, 16, 0, 0, 0)),
            Row(id=25, name="gamma", ts=dt.datetime(2023, 12, 31, 23, 59, 59)),
        ]
    )


def test_identity(df):
    got = df.select(transform_column("id", "identity").alias("k")).collect()
    assert [r.k for r in got] == [7, -7, 25]


@pytest.mark.parametrize(
    "transform,expected_first",
    [
        ("day", dt.datetime(2024, 3, 15)),
        ("month", dt.datetime(2024, 3, 1)),
        ("year", dt.datetime(2024, 1, 1)),
        ("hour", dt.datetime(2024, 3, 15, 13)),
    ],
)
def test_time_transforms(df, transform, expected_first):
    got = df.select(transform_column("ts", transform).alias("k")).first()
    assert got.k == expected_first


def test_bucket_range_and_determinism(df):
    got1 = df.select(transform_column("id", "bucket[4]").alias("k")).collect()
    got2 = df.select(transform_column("id", "bucket(4)").alias("k")).collect()
    assert [r.k for r in got1] == [r.k for r in got2]  # both spellings
    assert all(0 <= r.k < 4 for r in got1)


def test_truncate_int_negative_safe(df):
    # Iceberg spec: truncate[10] of -7 is -10 (floor to multiple), not 0
    got = {r.id: r.k for r in df.select(
        "id", transform_column("id", "truncate[10]", "bigint").alias("k")
    ).collect()}
    assert got == {7: 0, -7: -10, 25: 20}


def test_truncate_string(df):
    got = [r.k for r in df.select(
        transform_column("name", "truncate[3]", "string").alias("k")
    ).collect()]
    assert got == ["alp", "bet", "gam"]


def test_unsupported_transform_raises():
    with pytest.raises(ValueError, match="unsupported partition transform"):
        transform_column("id", "zorp[3]")


def test_partition_key_and_columns(df):
    spec = [("ts", "day"), PartitionField("id", "bucket[8]", name="id_b")]
    keyed = partition_key(df, spec)
    assert partition_columns(spec) == ["_p_ts_day", "_p_id_b"]
    assert set(partition_columns(spec)) <= set(keyed.columns)
    # unpartitioned: no-op (connector.py:286-288 parity)
    assert partition_key(df, []).columns == df.columns


def test_partition_grouping_counts(df):
    # the distributed analogue of _partition_records' group-by-key buffers
    keyed = partition_key(df, [("ts", "month")])
    counts = {
        r["_p_ts_month"]: r["n"]
        for r in keyed.groupBy("_p_ts_month").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {dt.datetime(2024, 3, 1): 2, dt.datetime(2023, 12, 1): 1}
