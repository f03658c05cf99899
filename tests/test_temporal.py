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


def test_gapfill_linear_interpolates_exactly(spark, tmp_path):
    """Hand-checked bracket: observations at hour 0 (100.00) and hour 3
    (400.00) -> gap hours at 200.00 / 300.00 cents-exact; a negative
    slope truncates toward zero identically on both engines."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.temporal import (
        _SQL_GAPFILL_LINEAR,
        gapfill_linear,
    )

    base = 1_700_000_000_000_000  # epoch-us, hour-aligned? make it aligned:
    base = (base // 3_600_000_000) * 3_600_000_000
    rows = [
        (1, base, 1, "tick", 100.0, "{}"),
        (2, base + 3 * 3_600_000_000, 1, "tick", 400.0, "{}"),
        # user 2: negative slope with a non-divisible span
        (3, base, 2, "tick", 10.0, "{}"),
        (4, base + 2 * 3_600_000_000, 2, "tick", 3.0, "{}"),
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }),
        tmp_path / "events.parquet",
    )
    sp = gapfill_linear(spark, str(tmp_path)).toPandas()
    _diff(sp, _oracle(tmp_path, _SQL_GAPFILL_LINEAR))
    u1 = sp[sp.user_id == 1]["value_lin_cents"].tolist()
    assert u1 == [10000, 20000, 30000, 40000]
    u2 = sp[sp.user_id == 2]["value_lin_cents"].tolist()
    # 1000 -> 300 over 2h: midpoint 1000 + (-700 * 1) div 2 = 650
    assert u2 == [1000, 650, 300]


def test_weekly_growth_observed_week_semantics(spark, tmp_path):
    """Growth compares consecutive OBSERVED weeks (a skipped calendar
    week does not insert a zero row); the first week's growth is NULL;
    negative growth truncates toward zero under both engines' integer
    div — crafted corpus vs hand values and the oracle."""
    import datetime as _dt
    import os as _os

    import duckdb
    from pyspark.sql import Row

    from bytewax_iceberg_connector_spark.plans.temporal import (
        _SQL_WEEKLY_GROWTH,
        weekly_growth,
    )

    def monday(w, d=0):
        return _dt.datetime(2024, 1, 1) + _dt.timedelta(weeks=w, days=d)

    rows = (
        [Row(event_id=i, ts=monday(0, i % 3), user_id=1, event_type="view")
         for i in range(4)]            # week 0: 4 events
        + [Row(event_id=10 + i, ts=monday(1), user_id=1, event_type="view")
           for i in range(6)]          # week 1: 6 events -> +50%
        + [Row(event_id=20, ts=monday(3), user_id=1, event_type="view")]
        # week 3 (week 2 skipped): 1 event -> growth vs week 1 = -833334
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        _os.path.join(sf_dir, "events.parquet")
    )
    got = {
        (r.week.isoformat(), r.n_events): (r.prev_events, r.growth_ppm)
        for r in weekly_growth(spark, sf_dir).collect()
    }
    assert got[("2024-01-01", 4)] == (None, None)
    assert got[("2024-01-08", 6)] == (4, 500_000)
    # BOTH engines truncate integer division toward zero (Spark div and
    # DuckDB // alike): -5000000/6 -> -833333, not floor's -833334
    assert got[("2024-01-22", 1)] == (6, -833_333)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('{}')".format(
            _os.path.join(sf_dir, "events.parquet", "*.parquet")
        )
    )
    want = {
        (w.isoformat() if hasattr(w, "isoformat") else str(w), n): (p, g)
        for _, w, n, p, g in con.execute(_SQL_WEEKLY_GROWTH).fetchall()
    }
    want = {(k[0][:10], k[1]): v for k, v in want.items()}
    assert got == want


def _orders_nation_fixture(tmp_path, rows):
    """rows: (o_orderkey, o_custkey, o_totalprice, o_orderdate-str|None).
    One nation per custkey (nation key = custkey) named N<custkey>."""
    import os as _os

    import pandas as pd

    d = str(tmp_path)
    op = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    op["o_orderkey"] = op["o_orderkey"].astype("int64")
    op["o_custkey"] = op["o_custkey"].astype("Int64")
    op["o_orderdate"] = pd.to_datetime(op["o_orderdate"]).astype(
        "datetime64[us]"
    )
    op.to_parquet(_os.path.join(d, "orders.parquet"))
    keys = sorted({r[1] for r in rows if r[1] is not None})
    cp = pd.DataFrame(
        {"c_custkey": keys, "c_nationkey": keys}
    )
    cp["c_custkey"] = cp["c_custkey"].astype("int64")
    cp["c_nationkey"] = cp["c_nationkey"].astype("int32")
    cp.to_parquet(_os.path.join(d, "customer.parquet"))
    np_ = pd.DataFrame(
        {"n_nationkey": keys, "n_name": [f"N{k}" for k in keys]}
    )
    np_["n_nationkey"] = np_["n_nationkey"].astype("int32")
    np_.to_parquet(_os.path.join(d, "nation.parquet"))
    return d


def test_cusum_drift_recurrence_and_trunc_div(spark, tmp_path):
    """Hand-replayed CUSUM: breach counting, FIRST-day peak on ties, and
    truncate-toward-zero k on a negative odd sum (Python floor would
    give -101); full-frame oracle diff replays the recursive CTE."""
    import datetime as _dt

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.temporal import (
        _SQL_CUSUM,
        cusum_drift,
    )

    rows = []
    # N1: [0,0,0,500,500] -> k=200 h=400: S=[0,0,0,300,600] peak d5 1 breach
    for i, v in enumerate([0.0, 0.0, 0.0, 500.0, 500.0]):
        rows.append((100 + i, 1, v, f"2024-01-{i + 1:02d}"))
    # N2: [300,0,300,0] -> k=150: S=[150,0,150,0] peak = FIRST max day (d1)
    for i, v in enumerate([300.0, 0.0, 300.0, 0.0]):
        rows.append((200 + i, 2, v, f"2024-02-{i + 1:02d}"))
    # N3: [-100,-101] -> k = trunc(-201/2) = -100
    rows.append((300, 3, -100.0, "2024-03-01"))
    rows.append((301, 3, -101.0, "2024-03-02"))
    rows.append((400, None, 99.0, "2024-03-03"))   # NULL custkey drops
    rows.append((401, 1, 77.0, None))              # NULL date drops
    d = _orders_nation_fixture(tmp_path, rows)
    sp = cusum_drift(spark, d).toPandas().set_index("n_name")
    n1 = sp.loc["N1"]
    assert (n1.k_cents, n1.max_cusum_cents, n1.n_breaches) == (
        20000, 60000, 1
    )
    assert n1.peak_day == _dt.date(2024, 1, 5)
    n2 = sp.loc["N2"]
    assert n2.max_cusum_cents == 15000
    assert n2.peak_day == _dt.date(2024, 2, 1)
    assert sp.loc["N3"].k_cents == -10050
    _diff(sp.reset_index(), _oracle(tmp_path, _SQL_CUSUM))


def test_seasonal_anomaly_weekday_median_parity(spark, tmp_path):
    """Mondays [100,200,1000] cents: med2=400, one 2x-median anomaly,
    peak ratio 5000000 ppm; Tuesdays [100..400]: even-n med2=500, zero
    anomalies. Weekday frames agree across engines (dayofweek vs dow+1)."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.temporal import (
        _SQL_SEASONAL,
        seasonal_anomaly,
    )

    rows = []
    for i, (day, v) in enumerate(
        [("2024-01-01", 1.0), ("2024-01-08", 2.0), ("2024-01-15", 10.0),
         ("2024-01-02", 1.0), ("2024-01-09", 2.0), ("2024-01-16", 3.0),
         ("2024-01-23", 4.0)]
    ):
        rows.append((i, 1, v, day))
    d = str(tmp_path)
    op = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    op["o_orderkey"] = op["o_orderkey"].astype("int64")
    op["o_custkey"] = op["o_custkey"].astype("int64")
    op["o_orderdate"] = pd.to_datetime(op["o_orderdate"]).astype(
        "datetime64[us]"
    )
    op.to_parquet(_os.path.join(d, "orders.parquet"))
    sp = seasonal_anomaly(spark, d).toPandas().set_index("dow")
    mon, tue = sp.loc[2], sp.loc[3]  # Spark dayofweek: Mon=2, Tue=3
    assert (mon.n_days, mon.med2_cents, mon.n_anomalies) == (3, 400, 1)
    assert mon.max_ratio_ppm == 5_000_000
    assert (tue.n_days, tue.med2_cents, tue.n_anomalies) == (4, 500, 0)
    _diff(sp.reset_index(), _oracle(tmp_path, _SQL_SEASONAL))


def test_rolling_median_range_frame_calendar_gaps(spark, tmp_path):
    """RANGE (not ROWS) framing: a calendar gap shrinks the window to
    the days actually within 6 days; even/odd windows use the twice-
    median integer picks."""
    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.temporal import (
        _SQL_ROLLING_MEDIAN,
        rolling_median_revenue,
    )

    rows = [
        (0, 1, 1.0, "2024-01-01"),
        (1, 1, 3.0, "2024-01-02"),
        (2, 1, 2.0, "2024-01-03"),
        (3, 1, 4.0, "2024-01-10"),  # 7-day gap: window = itself only
    ]
    d = _orders_nation_fixture(tmp_path, rows)
    sp = rolling_median_revenue(spark, d).toPandas()
    assert list(sp.n_window) == [1, 2, 3, 1]
    assert list(sp.med2_cents) == [200, 400, 400, 800]
    _diff(sp, _oracle(tmp_path, _SQL_ROLLING_MEDIAN))


def test_shipping_delay_profile_exact_percentile_picks(spark, tmp_path):
    """Month with delays 1..10: med2 = 11, nearest-rank p90 = element 9;
    month with [2,4,6]: odd-n med2 doubles the middle (8), p90 = last.
    NULL dates drop symmetrically."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.temporal import (
        _SQL_SHIP_DELAY,
        shipping_delay_profile,
    )

    d = str(tmp_path)
    li_rows, o_rows = [], []
    for k in range(1, 11):  # month 2024-01: order day 1, ship day 1+k
        o_rows.append((k, "2024-01-01"))
        li_rows.append((k, 1, f"2024-01-{1 + k:02d}"))
    for j, delay in enumerate([2, 4, 6]):  # month 2024-02
        o_rows.append((100 + j, "2024-02-01"))
        li_rows.append((100 + j, 1, f"2024-02-{1 + delay:02d}"))
    o_rows.append((999, None))          # NULL order date drops
    li_rows.append((999, 1, "2024-03-01"))
    o_rows.append((998, "2024-03-01"))
    li_rows.append((998, 1, None))      # NULL ship date drops
    li = pd.DataFrame(li_rows, columns=["l_orderkey", "l_linenumber", "l_shipdate"])
    li["l_orderkey"] = li["l_orderkey"].astype("int64")
    li["l_linenumber"] = li["l_linenumber"].astype("int32")
    li["l_shipdate"] = pd.to_datetime(li["l_shipdate"]).astype("datetime64[us]")
    li.to_parquet(_os.path.join(d, "lineitem.parquet"))
    op = pd.DataFrame(o_rows, columns=["o_orderkey", "o_orderdate"])
    op["o_orderkey"] = op["o_orderkey"].astype("int64")
    op["o_orderdate"] = pd.to_datetime(op["o_orderdate"]).astype("datetime64[us]")
    op.to_parquet(_os.path.join(d, "orders.parquet"))
    sp = shipping_delay_profile(spark, d).toPandas()
    assert len(sp) == 2
    jan, feb = sp.iloc[0], sp.iloc[1]
    assert (jan.n_lines, jan.med2_delay_days, jan.p90_delay_days,
            jan.max_delay_days) == (10, 11, 9, 10)
    assert (feb.n_lines, feb.med2_delay_days, feb.p90_delay_days,
            feb.max_delay_days) == (3, 8, 6, 6)
    _diff(sp, _oracle(tmp_path, _SQL_SHIP_DELAY))


def test_theil_sen_trend_outlier_resistant_median_slope(spark, tmp_path):
    """Daily cents 100/200/300/1000: the six pairwise slopes are
    [1,1,1,3,4,7]e8 micro/day — med2 = 4e8 (median 2e8) while OLS would
    chase the outlier; truncation parity on the slope division."""
    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.temporal import (
        _SQL_THEIL_SEN,
        theil_sen_trend,
    )

    rows = [
        (0, 1, 1.0, "2024-01-01"),
        (1, 1, 2.0, "2024-01-02"),
        (2, 1, 3.0, "2024-01-03"),
        (3, 1, 10.0, "2024-01-04"),
    ]
    d = _orders_nation_fixture(tmp_path, rows)
    sp = theil_sen_trend(spark, d).toPandas()
    row = sp.iloc[0]
    assert row.n_pairs == 6
    assert row.med2_slope_micro == 400_000_000
    assert (row.min_slope_micro, row.max_slope_micro) == (
        100_000_000, 700_000_000
    )
    _diff(sp, _oracle(tmp_path, _SQL_THEIL_SEN))
