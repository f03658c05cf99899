"""Unit tests for the as-of join operator (operators/asof.py) and the
temporal query battery's edge semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bytewax_iceberg_connector_spark.operators.asof import asof_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(5), "c")],
        "k INT, ts TIMESTAMP, tag STRING",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(15), 150.0), (2, _ts(9), 900.0)],
        "k INT, ts TIMESTAMP, v DOUBLE",
    )
    out = {
        r["tag"]: (r["ts_right"], r["v_right"])
        for r in asof_join(left, right, on="k", value_cols=("v",)).collect()
    }
    # equal timestamps match (inclusive)
    assert out["a"] == (_ts(10), 100.0)
    # picks the latest right row <= left.ts, not just any
    assert out["b"] == (_ts(15), 150.0)
    # right row AFTER the left row does not match → nulls
    assert out["c"] == (None, None)


def test_asof_no_right_rows_for_key(spark):
    left = spark.createDataFrame([(7, _ts(1), "x")], "k INT, ts TIMESTAMP, tag STRING")
    right = spark.createDataFrame([(8, _ts(0), 1.0)], "k INT, ts TIMESTAMP, v DOUBLE")
    rows = asof_join(left, right, on="k", value_cols=("v",)).collect()
    assert len(rows) == 1 and rows[0]["v_right"] is None


def test_asof_tiebreak_dedup(spark):
    left = spark.createDataFrame([(1, _ts(10), "x")], "k INT, ts TIMESTAMP, tag STRING")
    right = spark.createDataFrame(
        [(1, _ts(5), 1.0, 1), (1, _ts(5), 2.0, 2)],
        "k INT, ts TIMESTAMP, v DOUBLE, seq INT",
    )
    rows = asof_join(
        left, right, on="k", value_cols=("v",), tiebreak="seq"
    ).collect()
    # greatest tiebreak wins deterministically
    assert rows[0]["v_right"] == 2.0


def test_asof_left_row_count_preserved(spark, sf_dir):
    """As-of join is 1:1 — output cardinality equals the left side."""
    from bytewax_iceberg_connector_spark.plans.temporal import asof_join_events
    from bytewax_iceberg_connector_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    n_purchases = ev.where(F.col("event_type") == "purchase").count()
    assert asof_join_events(spark, sf_dir).count() == n_purchases


def test_gapfill_locf_fills_gaps_with_prior_value(spark, sf_dir):
    from bytewax_iceberg_connector_spark.plans.temporal import gapfill_locf

    rows = gapfill_locf(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, series in by_user.items():
        # dense hourly grid: consecutive rows are exactly 1 hour apart
        for a, b in zip(series, series[1:]):
            assert (b.h - a.h).total_seconds() == 3600, (user, a.h, b.h)
        # first grid point is an observation, so LOCF is always defined
        assert series[0].n_events > 0
        gaps = [i for i, r in enumerate(series) if r.n_events == 0]
        assert gaps, "fixture must contain empty hours"
        for i in gaps:
            assert series[i].value_locf == series[i - 1].value_locf
