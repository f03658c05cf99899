"""Continuous-aggregate refresh: incremental folds equal full recomputes,
the watermark is crash-safe (re-runs are no-ops), and replacing commits on
the base trigger the documented full-recompute fallback."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bytewax_iceberg_connector_spark.config import IcebergSinkConfig
from bytewax_iceberg_connector_spark.operators.matview import ContinuousAggregate
from bytewax_iceberg_connector_spark.operators.sink import LakeSink


def _mk(spark, tmp_path):
    base = LakeSink(spark, IcebergSinkConfig(
        table_name="db.mv_base", warehouse_path=str(tmp_path), num_partitions=2,
    ))
    agg = LakeSink(spark, IcebergSinkConfig(
        table_name="db.mv_agg", warehouse_path=str(tmp_path), num_partitions=1,
    ))
    cagg = ContinuousAggregate(
        base, agg,
        group_exprs={"day": F.to_date("ts")},
        measures={"total_v": "v"},
    )
    return base, cagg


def _batch(spark, lo, hi):
    return spark.createDataFrame(
        [Row(event_id=i, ts=dt.datetime(2024, 1, 1 + i % 3, 10), v=float(i))
         for i in range(lo, hi)]
    )


def _expected(spark, base):
    return {
        (r.day, float(r.total_v), r.n_rows)
        for r in base.read()
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum("v").cast("decimal(18,2)").alias("total_v"),
             F.count("*").alias("n_rows"))
        .collect()
    }


def _view(cagg):
    return {(r.day, float(r.total_v), r.n_rows) for r in cagg.read().collect()}


def test_initial_build_then_incremental_fold(spark, tmp_path):
    base, cagg = _mk(spark, tmp_path)
    base.append(_batch(spark, 0, 10))
    assert cagg.refresh()["mode"] == "full"  # first build
    assert _view(cagg) == _expected(spark, base)

    base.append(_batch(spark, 10, 30))
    base.append(_batch(spark, 30, 40))
    r = cagg.refresh()
    assert r["mode"] == "incremental"
    assert _view(cagg) == _expected(spark, base)


def test_refresh_is_idempotent_noop_at_head(spark, tmp_path):
    base, cagg = _mk(spark, tmp_path)
    base.append(_batch(spark, 0, 10))
    cagg.refresh()
    before = _view(cagg)
    assert cagg.refresh()["mode"] == "noop"
    assert _view(cagg) == before


def test_replacing_commit_falls_back_to_full(spark, tmp_path):
    base, cagg = _mk(spark, tmp_path)
    base.append(_batch(spark, 0, 10))
    cagg.refresh()
    base.delete("event_id % 2 = 0")  # replacing commit
    base.append(_batch(spark, 10, 20))
    r = cagg.refresh()
    assert r["mode"] == "full"
    assert _view(cagg) == _expected(spark, base)


def test_incremental_never_rescans_base_files(spark, tmp_path):
    """The fast path must read only the delta commits: feed it a poisoned
    base read() that fails if called."""
    base, cagg = _mk(spark, tmp_path)
    base.append(_batch(spark, 0, 10))
    cagg.refresh()
    base.append(_batch(spark, 10, 20))

    orig = base.read
    def _boom(**kw):  # pragma: no cover
        raise AssertionError("full base scan during incremental refresh")
    base.read = _boom
    try:
        r = cagg.refresh()
    finally:
        base.read = orig
    assert r["mode"] == "incremental"
    assert _view(cagg) == _expected(spark, base)
