"""Behavioral-analytics queries: funnel ordering semantics, retention
cohort arithmetic, and the single-shuffle plan contract for the stacked
per-user windows."""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import functions as F

from bytewax_iceberg_connector_spark.plans.behavioral import (
    event_funnel,
    retention_cohorts,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_funnel_counts_monotone_and_bounded(spark, sf_dir):
    row = event_funnel(spark, sf_dir).collect()[0]
    assert row.n_signup >= row.n_view >= row.n_click >= row.n_purchase >= 0
    assert row.n_signup > 0
    assert abs(row.conversion - round(row.n_purchase / row.n_signup, 6)) < 1e-9


def test_funnel_strict_ordering_semantics(spark):
    # user 1: full ordered funnel; user 2: purchase BEFORE click -> stops
    # at click; user 3: view only, no signup -> counted in no stage.
    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        (1, ts(0), "signup"), (1, ts(1), "view"), (1, ts(2), "click"),
        (1, ts(3), "purchase"),
        (2, ts(0), "signup"), (2, ts(1), "view"), (2, ts(2), "purchase"),
        (2, ts(3), "click"),
        (3, ts(0), "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    import bytewax_iceberg_connector_spark.plans.behavioral as B

    orig = B.load_table
    B.load_table = lambda spark, sf_dir, name: ev
    try:
        row = event_funnel(spark, "ignored").collect()[0]
    finally:
        B.load_table = orig
    assert (row.n_signup, row.n_view, row.n_click, row.n_purchase) == (2, 2, 2, 1)


def test_funnel_single_hash_exchange(spark, sf_dir):
    plan = _plan(event_funnel(spark, sf_dir))
    hash_exchanges = re.findall(r"Exchange hashpartitioning", plan)
    assert len(hash_exchanges) == 1, plan
    assert plan.count("Window ") == 4


def test_retention_day0_equals_cohort_size(spark, sf_dir):
    out = retention_cohorts(spark, sf_dir)
    rows = out.collect()
    assert all(0 <= r.day_offset <= 7 for r in rows)
    # day-0 count is the cohort size: every later offset count is <= it
    day0 = {r.cohort_day: r.n_active for r in rows if r.day_offset == 0}
    for r in rows:
        assert r.cohort_day in day0
        assert r.n_active <= day0[r.cohort_day]
    # cohort sizes sum to the distinct-user universe
    from bytewax_iceberg_connector_spark.sources.tables import load_table

    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(day0.values()) == n_users


def test_decayed_counts_partials_merge(spark, sf_dir):
    """The documented mergeability contract: decayed sums computed over
    disjoint slices of the corpus and ADDED must equal the whole-corpus
    result exactly (integer arithmetic — no tolerance)."""
    from bytewax_iceberg_connector_spark.plans.behavioral import decayed_counts
    from bytewax_iceberg_connector_spark.sources.tables import load_table

    whole = {
        r.event_type: (r.decayed_count_ppm, r.decayed_value_milli)
        for r in decayed_counts(spark, sf_dir).collect()
    }
    # recompute per-slice with the SAME reference day, then add
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    ref = ev.agg(F.max(F.to_date("ts")).alias("d_ref"))
    div = "shiftleft(1L, cast(least(datediff(d_ref, to_date(ts)), 40) as int))"
    merged: dict = {}
    for part in (F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1):
        sl = (
            load_table(spark, sf_dir, "events")
            .where(part)
            .crossJoin(F.broadcast(ref))
            .select(
                "event_type",
                F.expr(f"1000000L div {div}").alias("w_ppm"),
                F.expr(f"cast(round(value * 1000) as long) div {div}").alias(
                    "v_milli"
                ),
            )
            .groupBy("event_type")
            .agg(F.sum("w_ppm").alias("c"), F.sum("v_milli").alias("v"))
        )
        for r in sl.collect():
            c, v = merged.get(r.event_type, (0, 0))
            merged[r.event_type] = (c + r.c, v + r.v)
    assert merged == whole


def test_value_histogram_cells_merge(spark, sf_dir):
    """Fixed-bin histogram cells from disjoint slices add to the whole."""
    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _HIST_BINS,
        _HIST_WIDTH,
        value_histogram,
    )
    from bytewax_iceberg_connector_spark.sources.tables import load_table

    whole = {
        (r.o_orderpriority, r.bin): r.n
        for r in value_histogram(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    bin_ = F.least(
        F.floor(F.col("o_totalprice") / _HIST_WIDTH).cast("long"),
        F.lit(_HIST_BINS - 1).cast("long"),
    )
    merged: dict = {}
    for part in (F.col("o_orderkey") % 2 == 0, F.col("o_orderkey") % 2 == 1):
        sl = (
            orders.where(part)
            .select("o_orderpriority", bin_.alias("bin"))
            .groupBy("o_orderpriority", "bin")
            .agg(F.count("*").alias("n"))
        )
        for r in sl.collect():
            k = (r.o_orderpriority, r.bin)
            merged[k] = merged.get(k, 0) + r.n
    assert merged == whole


def test_decayed_counts_oracle_survives_long_spans(spark, tmp_path):
    """Round-3 ADVICE regression: the DuckDB oracle's decay divisor used a
    32-bit `1 <<`, which raises Out of Range for shifts >= 32 — i.e. any
    events corpus spanning >= ~31 days crashed the oracle while the Spark
    side (shiftleft(1L, ...)) ran fine. Both engines must agree on a
    60-day span with the documented 40-doubling cap reachable."""
    import datetime as _dt
    import os as _os

    import duckdb
    from pyspark.sql import Row

    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_DECAYED,
        decayed_counts,
    )

    t0 = _dt.datetime(2024, 1, 1)
    rows = [
        Row(event_type="a", ts=t0 + _dt.timedelta(days=d), value=float(d))
        for d in range(0, 61, 5)  # 0..60 days: shifts up to 40+ requested
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        _os.path.join(sf_dir, "events.parquet")
    )

    got = {
        (r.event_type, r.n_events, r.decayed_count_ppm, r.decayed_value_milli)
        for r in decayed_counts(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('{}')".format(
            _os.path.join(sf_dir, "events.parquet", "*.parquet")
        )
    )
    want = set(map(tuple, con.execute(_SQL_DECAYED).fetchall()))
    assert got == want


def test_sessionize_gap_boundary_semantics(spark, tmp_path):
    """An exactly-30-min gap stays in-session (boundary is strictly >);
    31 min splits; single-event sessions have zero duration — and the
    crafted corpus (tied timestamps included) matches the oracle."""
    import datetime as _dt
    import os as _os

    import duckdb
    from pyspark.sql import Row

    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_SESSIONIZE,
        sessionize,
    )

    t0 = _dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + _dt.timedelta(minutes=m)

    rows = [
        Row(event_id=1, ts=ts(0), user_id=1, event_type="view"),
        Row(event_id=2, ts=ts(10), user_id=1, event_type="view"),   # 10-min gap: same
        Row(event_id=3, ts=ts(40), user_id=1, event_type="view"),   # exactly 30: same
        Row(event_id=4, ts=ts(71), user_id=1, event_type="view"),   # 31: new session
        Row(event_id=5, ts=ts(0), user_id=2, event_type="view"),    # lone event
        Row(event_id=6, ts=ts(0), user_id=3, event_type="view"),    # tied timestamps
        Row(event_id=7, ts=ts(0), user_id=3, event_type="view"),
        Row(event_id=8, ts=None, user_id=3, event_type="view"),     # NULL ts: excluded
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        _os.path.join(sf_dir, "events.parquet")
    )
    got = {tuple(r) for r in sessionize(spark, sf_dir).collect()}
    # sizes: 1-event x2 (u1 second sess, u2), 2-event x1 (u3, dur 0),
    # 3-event x1 (u1 first sess, dur 40 min)
    assert got == {
        (1, 2, 0, 0, 0, 0),
        (2, 1, 0, 0, 0, 0),
        (3, 1, 2400_000_000, 2400_000_000, 2400_000_000, 2400_000_000),
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('{}')".format(
            _os.path.join(sf_dir, "events.parquet", "*.parquet")
        )
    )
    assert got == set(map(tuple, con.execute(_SQL_SESSIONIZE).fetchall()))


def test_sessionize_single_user_exchange(spark, sf_dir):
    """Both stacked windows AND the per-(user, session) aggregate must
    ride ONE hashpartitioning(user_id) — the grouping key's user_id
    prefix satisfies the distribution, so only the final histogram
    rollup re-shuffles. Scan prunes to (event_id, ts, user_id) with the
    ts IS NOT NULL filter pushed."""
    from bytewax_iceberg_connector_spark.plans.behavioral import sessionize

    plan = _plan(sessionize(spark, sf_dir))
    assert plan.count("Window ") == 2
    hashes = re.findall(r"Exchange hashpartitioning\(([^,)]*)", plan)
    assert len(hashes) == 2, hashes
    assert sorted(h.split("#")[0] for h in hashes) == [
        "session_events",
        "user_id",
    ]
    assert "PushedFilters: [IsNotNull(ts)]" in plan


def test_conversion_latency_first_touch_semantics(spark, tmp_path):
    """Purchases BEFORE the first signup don't convert (first purchase AT
    or after it does, latency 0 on ties); never-signed-up purchasers are
    excluded from the denominator; the discrete median picks rank
    (n+1) div 2 — all pinned by hand, then vs the oracle."""
    import datetime as _dt
    import os as _os

    import duckdb
    from pyspark.sql import Row

    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_CONVERSION_LATENCY,
        conversion_latency,
    )

    t0 = _dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + _dt.timedelta(minutes=m)

    rows = [
        Row(event_id=1, ts=ts(0), user_id=1, event_type="signup"),
        Row(event_id=2, ts=ts(10), user_id=1, event_type="purchase"),
        Row(event_id=3, ts=ts(0), user_id=2, event_type="purchase"),  # early
        Row(event_id=4, ts=ts(5), user_id=2, event_type="signup"),
        Row(event_id=5, ts=ts(20), user_id=2, event_type="purchase"),
        Row(event_id=6, ts=ts(0), user_id=3, event_type="signup"),
        Row(event_id=7, ts=ts(0), user_id=3, event_type="purchase"),  # tie
        Row(event_id=8, ts=ts(0), user_id=4, event_type="signup"),    # never
        Row(event_id=9, ts=ts(0), user_id=5, event_type="purchase"),  # no signup
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        _os.path.join(sf_dir, "events.parquet")
    )
    got = conversion_latency(spark, sf_dir).collect()[0]
    m = 60_000_000  # one minute in microseconds
    assert (got.n_signup_users, got.n_converted) == (4, 3)
    assert got.conversion_ppm == 3 * 1_000_000 // 4
    # latencies: u3=0, u1=10m, u2=15m -> median rank 2 = 10m
    assert (got.min_latency_us, got.p50_latency_us, got.max_latency_us) == (
        0, 10 * m, 15 * m,
    )
    assert got.mean_latency_us == (0 + 10 * m + 15 * m) // 3
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('{}')".format(
            _os.path.join(sf_dir, "events.parquet", "*.parquet")
        )
    )
    assert tuple(got) == con.execute(_SQL_CONVERSION_LATENCY).fetchone()


def test_session_paths_ordering_and_short_sessions(spark, tmp_path):
    """Step order follows (ts, event_id) within the session; sessions
    shorter than 3 steps emit their whole path (no trailing
    separators); a >30-min gap splits one user's activity into two
    counted paths — crafted corpus vs both hand values and the oracle."""
    import datetime as _dt
    import os as _os

    import duckdb
    from pyspark.sql import Row

    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_SESSION_PATHS,
        session_paths,
    )

    t0 = _dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + _dt.timedelta(minutes=m)

    rows = [
        # u1 session 1: view > click > purchase (4th event ignored)
        Row(event_id=1, ts=ts(0), user_id=1, event_type="view"),
        Row(event_id=2, ts=ts(1), user_id=1, event_type="click"),
        Row(event_id=3, ts=ts(2), user_id=1, event_type="purchase"),
        Row(event_id=4, ts=ts(3), user_id=1, event_type="view"),
        # u1 session 2 after a 31-min gap: single view
        Row(event_id=5, ts=ts(34), user_id=1, event_type="view"),
        # u2: tied ts resolved by event_id -> view > click
        Row(event_id=7, ts=ts(0), user_id=2, event_type="click"),
        Row(event_id=6, ts=ts(0), user_id=2, event_type="view"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        _os.path.join(sf_dir, "events.parquet")
    )
    got = {(r.path, r.n_sessions) for r in session_paths(spark, sf_dir).collect()}
    assert got == {
        ("view>click>purchase", 1),
        ("view", 1),
        ("view>click", 1),
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('{}')".format(
            _os.path.join(sf_dir, "events.parquet", "*.parquet")
        )
    )
    want = {(p, n) for _, p, n, _ in con.execute(_SQL_SESSION_PATHS).fetchall()}
    assert got == want


def test_ab_test_eval_balanced_null_and_known_z(spark, tmp_path):
    """Arm assignment is a pure function of user_id (same user always
    lands the same arm); NULL users/values join neither arm; a crafted
    A/B with known means yields the hand-computed Welch z on both
    engines."""
    import math
    import os as _os

    import duckdb
    import pandas as pd

    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_AB_TEST,
        ab_test_eval,
    )

    # find user ids for each arm from the md5 rule itself
    import hashlib

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[30:32], 16) % 2

    a_users = [u for u in range(100) if arm(u) == 0][:2]
    b_users = [u for u in range(100) if arm(u) == 1][:2]
    rows = []
    eid = 0
    for u, vals in zip(a_users, ([1.0, 2.0], [3.0, 4.0])):
        for v in vals:
            rows.append((eid, pd.Timestamp("2024-01-01"), u, "view", v))
            eid += 1
    for u, vals in zip(b_users, ([5.0, 6.0], [7.0, 8.0])):
        for v in vals:
            rows.append((eid, pd.Timestamp("2024-01-01"), u, "view", v))
            eid += 1
    rows.append((eid, pd.Timestamp("2024-01-01"), None, "view", 99.0))
    rows.append((eid + 1, pd.Timestamp("2024-01-01"), a_users[0], "view", None))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["event_id"] = pdf["event_id"].astype("int64")
    pdf["user_id"] = pdf["user_id"].astype("Int64")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sf_dir = str(tmp_path)
    pdf.to_parquet(_os.path.join(sf_dir, "events.parquet"))
    got = ab_test_eval(spark, sf_dir).collect()[0]
    assert (got.n_a, got.n_b) == (4, 4)
    assert (got.mean_a, got.mean_b, got.lift) == (2.5, 6.5, 4.0)
    # var both arms = 5/3; z = 4 / sqrt(2*(5/3)/4)
    z = 4.0 / math.sqrt(2 * (5.0 / 3.0) / 4.0)
    assert abs(got.z_stat - round(z, 6)) < 1e-9
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('{}')".format(
            _os.path.join(sf_dir, "events.parquet")  # single file (pandas)
        )
    )
    assert tuple(got) == con.execute(_SQL_AB_TEST).fetchone()


def test_followed_by_within_deadline_and_tie_semantics(spark, tmp_path):
    """A purchase 59 min after a view matches, 61 min does not; a
    purchase with NO preceding view never matches; a view at the SAME
    timestamp as the purchase matches via the (ts, event_id) order only
    when its event_id sorts first — crafted corpus vs hand values and
    the oracle."""
    import datetime as _dt
    import os as _os

    import duckdb
    from pyspark.sql import Row

    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_FOLLOWED_BY,
        followed_by_within,
    )

    t0 = _dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + _dt.timedelta(minutes=m)

    rows = [
        # u1: view then purchase 59 min later -> hit (gap 59m)
        Row(event_id=1, ts=ts(0), user_id=1, event_type="view"),
        Row(event_id=2, ts=ts(59), user_id=1, event_type="purchase"),
        # u2: view then purchase 61 min later -> miss
        Row(event_id=3, ts=ts(0), user_id=2, event_type="view"),
        Row(event_id=4, ts=ts(61), user_id=2, event_type="purchase"),
        # u3: purchase with no view at all -> miss
        Row(event_id=5, ts=ts(0), user_id=3, event_type="purchase"),
        # u4: tied ts, view's event_id sorts first -> hit with gap 0
        Row(event_id=6, ts=ts(0), user_id=4, event_type="view"),
        Row(event_id=7, ts=ts(0), user_id=4, event_type="purchase"),
        # u5: tied ts, PURCHASE sorts first -> its view is not preceding
        Row(event_id=9, ts=ts(0), user_id=5, event_type="view"),
        Row(event_id=8, ts=ts(0), user_id=5, event_type="purchase"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        _os.path.join(sf_dir, "events.parquet")
    )
    got = followed_by_within(spark, sf_dir).collect()[0]
    m = 60_000_000
    assert (got.n_b_events, got.n_matched) == (5, 2)
    assert got.match_ppm == 2 * 1_000_000 // 5
    assert (got.min_gap_us, got.max_gap_us) == (0, 59 * m)
    assert got.mean_gap_us == (0 + 59 * m) // 2
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('{}')".format(
            _os.path.join(sf_dir, "events.parquet", "*.parquet")
        )
    )
    assert tuple(got) == con.execute(_SQL_FOLLOWED_BY).fetchone()


def test_rfm_segmentation_null_date_and_singleton_segment(spark, tmp_path):
    """NULL-recency customers sort NULLS FIRST into r_q=1 on both
    engines; a singleton segment gets (1,1,1); NULL o_custkey orders are
    dropped symmetrically. Full-frame oracle diff on the same fixture."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_RFM,
        rfm_segmentation,
    )

    d = str(tmp_path)
    orders = []
    custs = []
    for k in range(1, 9):  # segment S: 8 customers, 1 order each
        orders.append((k, k, k * 100.0, f"2024-01-{k:02d}"))
        custs.append((k, "S"))
    orders.append((9, 9, 50.0, None))  # NULL date -> NULL recency
    custs.append((9, "S"))
    orders.append((10, 10, 7.0, "2024-02-01"))  # singleton segment T
    custs.append((10, "T"))
    orders.append((11, None, 99.0, "2024-02-02"))  # NULL custkey: dropped
    op = pd.DataFrame(
        orders, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    op["o_orderkey"] = op["o_orderkey"].astype("int64")
    op["o_custkey"] = op["o_custkey"].astype("Int64")
    op["o_orderdate"] = pd.to_datetime(op["o_orderdate"]).astype("datetime64[us]")
    op.to_parquet(_os.path.join(d, "orders.parquet"))
    cp = pd.DataFrame(custs, columns=["c_custkey", "c_mktsegment"])
    cp["c_custkey"] = cp["c_custkey"].astype("int64")
    cp.to_parquet(_os.path.join(d, "customer.parquet"))

    got = rfm_segmentation(spark, d).toPandas()
    assert int(got.n_customers.sum()) == 10
    t = got[got.c_mktsegment == "T"]
    assert len(t) == 1 and tuple(t.iloc[0][["r_q", "f_q", "m_q"]]) == (1, 1, 1)
    # NULL-date customer 9: NULLS FIRST -> tile 1 of the recency ntile;
    # cents 5000 is the 2nd-smallest of S -> m_q = 1 as well
    s_cells = got[(got.c_mktsegment == "S") & (got.r_q == 1)]
    assert int(s_cells.n_customers.sum()) == 3  # 9 customers -> 3,2,2,2
    _diff(got, _oracle(tmp_path, _SQL_RFM))


def test_quantile_bins_fill_rule_and_null_year(spark, tmp_path):
    """25 rows -> decile sizes 3,3,3,3,3,2,2,2,2,2 (SQL-standard NTILE
    fill); a NULL order date forms its own year partition on both
    engines; bin edges are the exact sorted cents."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_QUANTILE_BINS,
        quantile_bins,
    )

    d = str(tmp_path)
    rows = [(k, 1, float(k), "2023-03-01") for k in range(1, 26)]
    rows.append((100, 1, 42.0, None))
    op = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    op["o_orderkey"] = op["o_orderkey"].astype("int64")
    op["o_custkey"] = op["o_custkey"].astype("int64")
    op["o_orderdate"] = pd.to_datetime(op["o_orderdate"]).astype("datetime64[us]")
    op.to_parquet(_os.path.join(d, "orders.parquet"))

    got = quantile_bins(spark, d).toPandas()
    y = got[got.o_year == 2023].sort_values("decile")
    assert list(y.n_orders) == [3, 3, 3, 3, 3, 2, 2, 2, 2, 2]
    assert list(y.lo_cents) == [100, 400, 700, 1000, 1300, 1600, 1800,
                                2000, 2200, 2400]
    assert list(y.hi_cents) == [300, 600, 900, 1200, 1500, 1700, 1900,
                                2100, 2300, 2500]
    nully = got[got.o_year.isna()]
    assert len(nully) == 1 and int(nully.iloc[0].n_orders) == 1
    _diff(got, _oracle(tmp_path, _SQL_QUANTILE_BINS))


def test_mad_outliers_robust_vs_contamination(spark, tmp_path):
    """Values [1..9, 1000]: median-based stats shrug at the outlier
    (med2=11, MAD*4=10) and flag exactly the one value with
    2*dev > 3*mad4; negative values floor symmetrically on both
    engines; NULL values drop."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_MAD,
        mad_outliers,
    )

    d = str(tmp_path)
    rows = [(k, "buy", float(k)) for k in range(1, 10)]
    rows.append((10, "buy", 1000.0))
    rows.append((11, "buy", None))
    rows.append((12, "neg", -1.5))   # floor(-1.5e6) both engines
    rows.append((13, "neg", -0.5))
    ev = pd.DataFrame(rows, columns=["event_id", "event_type", "value"])
    ev["event_id"] = ev["event_id"].astype("int64")
    ev.to_parquet(_os.path.join(d, "events.parquet"))
    sp = mad_outliers(spark, d).toPandas().set_index("event_type")
    buy = sp.loc["buy"]
    # micros 1e6..9e6, 1e9; n=10; med2 = 5e6+6e6 = 11e6
    assert buy.med2_micro == 11_000_000
    # devs |2x-med2|: [9,7,5,3,1,1,3,5,7,1989]e6; sorted
    # [1,1,3,3,5,5,7,7,9,1989]e6 -> middle pair 5,5
    assert buy.mad4_micro == 10_000_000
    assert buy.n_outliers == 1  # only 1000.0: 2*1989e6 > 3*8e6
    neg = sp.loc["neg"]
    assert neg.med2_micro == -2_000_000  # floor(-1.5e6)+floor(-0.5e6)
    _diff(sp.reset_index(), _oracle(tmp_path, _SQL_MAD))


def test_psi_drift_hand_terms_and_degenerate_bin(spark, tmp_path):
    """First half 3xbin0+1xbin1, second half 1xbin0+3xbin1+1xbin2:
    bin2 is one-sided (degenerate, excluded from the log), the two used
    bins' micro terms match an independent Python computation within
    rounding, and the oracle agrees exactly."""
    import math
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_PSI,
        psi_drift,
    )

    d = str(tmp_path)
    rows = []
    k = 0
    # first half: days around 2024-01-01..05 (dn small)
    for price in (100.0, 100.0, 100.0, 30000.0):
        rows.append((k, 1, price, f"2024-01-{(k % 5) + 1:02d}")); k += 1
    # second half: days 2024-03-01.. (dn large)
    for price in (100.0, 30000.0, 30000.0, 30000.0, 60000.0):
        rows.append((k, 1, price, f"2024-03-{(k % 5) + 1:02d}")); k += 1
    op = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    op["o_orderkey"] = op["o_orderkey"].astype("int64")
    op["o_custkey"] = op["o_custkey"].astype("int64")
    op["o_orderdate"] = pd.to_datetime(op["o_orderdate"]).astype(
        "datetime64[us]"
    )
    op.to_parquet(_os.path.join(d, "orders.parquet"))
    sp = psi_drift(spark, d).toPandas()
    row = sp.iloc[0]
    assert (row.n_bins_used, row.n_degenerate_bins) == (2, 1)
    assert (row.n_first_half, row.n_second_half) == (4, 5)
    want = round((3 / 4 - 1 / 5) * math.log((3 * 5) / (1 * 4)) * 1e6) + round(
        (1 / 4 - 3 / 5) * math.log((1 * 5) / (3 * 4)) * 1e6
    )
    assert abs(int(row.psi_micro) - want) <= 2
    _diff(sp, _oracle(tmp_path, _SQL_PSI))


def test_cohort_revenue_ltv_offsets_and_cumulation(spark, tmp_path):
    """Customer signed up 2023-11 buying across a year boundary: offsets
    are pure month-number subtraction (Nov->Feb = 3); cumulative cents
    accumulate within the cohort; a second cohort stays independent."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_COHORT_LTV,
        cohort_revenue_ltv,
    )

    d = str(tmp_path)
    rows = [
        (1, 1, 1.0, "2023-11-05"),
        (2, 1, 2.0, "2023-11-20"),   # same cohort month, offset 0
        (3, 1, 4.0, "2024-02-01"),   # offset 3 across the year boundary
        (4, 2, 8.0, "2024-01-15"),   # separate cohort
    ]
    op = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    op["o_orderkey"] = op["o_orderkey"].astype("int64")
    op["o_custkey"] = op["o_custkey"].astype("int64")
    op["o_orderdate"] = pd.to_datetime(op["o_orderdate"]).astype(
        "datetime64[us]"
    )
    op.to_parquet(_os.path.join(d, "orders.parquet"))
    sp = cohort_revenue_ltv(spark, d).toPandas()
    assert list(zip(sp.cohort_month, sp["offset"])) == [
        ("2023-11", 0), ("2023-11", 3), ("2024-01", 0)
    ]
    assert list(sp.cents) == [300, 400, 800]
    assert list(sp.cum_cents) == [300, 700, 800]
    _diff(sp, _oracle(tmp_path, _SQL_COHORT_LTV))
