"""Degenerate-input contracts for plans/profiling.py — differential vs the
DuckDB oracle on adversarial shapes the synthetic testdata never exercises:
NULL keys, planted orphans, all-NULL columns, single-event users, timestamp
ties, and fewer keys than the top-k cut."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from _diffutil import assert_df_match as _diff
from _diffutil import duck_oracle as _oracle
from bytewax_iceberg_connector_spark.plans import profiling as P


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_us_epoch, user_id, event_type, value, props)."""
    tab = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tab, tmp_path / "events.parquet")
    return str(tmp_path)


def _write_orders(tmp_path, rows):
    """rows: (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
    o_orderdate_us, o_orderpriority)."""
    tab = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tab, tmp_path / "orders.parquet")
    return str(tmp_path)


_TS0 = 1_700_000_000_000_000  # fixed epoch-µs base


def test_interarrival_single_event_streams_yield_no_gaps(spark, tmp_path):
    """One event per (user, type) → zero gaps → that type absent from the
    report on BOTH engines (no 0-gap or NULL row invented)."""
    d = _write_events(
        tmp_path,
        [
            (1, _TS0, 10, "click", 1.0, "{}"),
            (2, _TS0 + 5_000_000, 11, "click", 1.0, "{}"),
            (3, _TS0, 10, "view", 1.0, "{}"),
        ],
    )
    sp = P.interarrival_stats(spark, d).toPandas()
    assert sp.empty  # every stream has exactly one event
    _diff(sp, _oracle(tmp_path, P._SQL_INTERARRIVAL))


def test_interarrival_timestamp_ties_break_on_event_id(spark, tmp_path):
    """Two events at the SAME (user, type, ts): the event_id tie-break
    must make both engines pick the same consecutive pairing — gap 0 —
    and the third event's gap measures from the later event_id."""
    d = _write_events(
        tmp_path,
        [
            (5, _TS0, 1, "click", 1.0, "{}"),
            (4, _TS0, 1, "click", 1.0, "{}"),
            (6, _TS0 + 7_000_000, 1, "click", 1.0, "{}"),
        ],
    )
    sp = P.interarrival_stats(spark, d).toPandas()
    assert sp.loc[0, "n_gaps"] == 2
    assert sp.loc[0, "min_gap_us"] == 0
    assert sp.loc[0, "max_gap_us"] == 7_000_000
    _diff(sp, _oracle(tmp_path, P._SQL_INTERARRIVAL))


def test_key_skew_fewer_keys_than_topk(spark, tmp_path):
    """Fewer distinct keys than the top-k cut: report exactly |keys| rows,
    cumulative share reaching 1e6 ppm on the last row."""
    d = _write_events(
        tmp_path,
        [(i, _TS0 + i, 100 + (i % 2), "click", 1.0, "{}") for i in range(6)],
    )
    sp = P.key_skew_report(spark, d).toPandas().sort_values("rnk")
    assert len(sp) == 2
    assert sp["cum_share_ppm"].iloc[-1] == 1_000_000
    _diff(sp, _oracle(tmp_path, P._SQL_SKEW))


def test_transition_matrix_single_event_users_contribute_nothing(
    spark, tmp_path
):
    """Users with one event have no bigram; ts ties break on event_id so
    the transition direction is identical on both engines."""
    d = _write_events(
        tmp_path,
        [
            (1, _TS0, 1, "view", 1.0, "{}"),
            (2, _TS0, 1, "click", 1.0, "{}"),  # same ts — id orders view→click
            (3, _TS0, 2, "purchase", 1.0, "{}"),  # singleton user
        ],
    )
    sp = P.event_transition_matrix(spark, d).toPandas()
    assert len(sp) == 1
    assert (sp.loc[0, "prev_type"], sp.loc[0, "next_type"]) == ("view", "click")
    assert sp.loc[0, "prob_ppm"] == 1_000_000
    _diff(sp, _oracle(tmp_path, P._SQL_TRANSITION))


def test_table_profile_nulls_and_bounds(spark, tmp_path):
    """NULLs count into n_null, never into distincts/bounds; money bounds
    are exact cents, date bounds exact epoch-µs, on BOTH engines."""
    d = _write_orders(
        tmp_path,
        [
            (1, 10, "O", 100.005, _TS0, "1-URGENT"),
            (2, None, "F", 99.994, _TS0 + 86_400_000_000, None),
            (3, 10, None, None, None, "5-LOW"),
        ],
    )
    sp = P.table_profile(spark, d).toPandas().set_index("col_name")
    assert sp.loc["o_custkey", "n_null"] == 1
    assert sp.loc["o_custkey", "n_distinct"] == 1
    assert sp.loc["o_totalprice", "min_num"] == 9999  # round(99.994*100)
    assert sp.loc["o_totalprice", "max_num"] == 10001  # round-half-up parity
    assert sp.loc["o_orderdate", "min_num"] == _TS0
    assert sp.loc["o_orderpriority", "min_str"] == "1-URGENT"
    _diff(sp.reset_index(), _oracle(tmp_path, P._SQL_PROFILE))


def test_table_profile_empty_table(spark, tmp_path):
    """Zero rows: every count 0, every bound NULL — and the oracle agrees
    row for row."""
    d = _write_orders(tmp_path, [])
    sp = P.table_profile(spark, d).toPandas()
    assert len(sp) == len(P._PROFILE_COLS)
    assert (sp["n_rows"] == 0).all() and (sp["n_distinct"] == 0).all()
    assert sp["min_num"].isna().all() and sp["min_str"].isna().all()
    _diff(sp, _oracle(tmp_path, P._SQL_PROFILE))


@pytest.fixture()
def _star_fixture(tmp_path):
    """Minimal star schema with planted violations: one NULL child key
    (violates nothing) and one orphan key per audited fact edge."""
    def t(name, cols):
        pq.write_table(pa.table(cols), tmp_path / f"{name}.parquet")

    t("region", {"r_regionkey": pa.array([0], pa.int64()),
                 "r_name": pa.array(["R"], pa.string())})
    t("nation", {"n_nationkey": pa.array([0], pa.int64()),
                 "n_regionkey": pa.array([0], pa.int64()),
                 "n_name": pa.array(["N"], pa.string())})
    t("customer", {"c_custkey": pa.array([1], pa.int64()),
                   "c_nationkey": pa.array([0], pa.int64())})
    t("supplier", {"s_suppkey": pa.array([1], pa.int64()),
                   "s_nationkey": pa.array([0], pa.int64())})
    t("part", {"p_partkey": pa.array([1], pa.int64())})
    t("orders", {"o_orderkey": pa.array([1, 2], pa.int64()),
                 "o_custkey": pa.array([1, 99], pa.int64())})  # 99 orphan
    t("lineitem", {"l_orderkey": pa.array([1, 7, None], pa.int64()),
                   "l_partkey": pa.array([1, 1, 1], pa.int64()),
                   "l_suppkey": pa.array([1, 8, 8], pa.int64())})
    return tmp_path


def test_fk_integrity_counts_planted_orphans_and_null_keys(
    spark, _star_fixture
):
    tmp_path = _star_fixture
    sp = P.fk_integrity(spark, str(tmp_path)).toPandas().set_index("edge")
    lo = sp.loc["lineitem.l_orderkey->orders"]
    assert (lo["child_rows"], lo["null_rows"]) == (3, 1)
    assert (lo["orphan_rows"], lo["orphan_keys"]) == (1, 1)  # key 7
    ls = sp.loc["lineitem.l_suppkey->supplier"]
    assert (ls["orphan_rows"], ls["orphan_keys"]) == (2, 1)  # key 8 twice
    oc = sp.loc["orders.o_custkey->customer"]
    assert (oc["orphan_rows"], oc["orphan_keys"]) == (1, 1)  # key 99
    _diff(sp.reset_index(), _oracle(tmp_path, P._SQL_FK))


def test_interarrival_null_ts_excluded_on_both_engines(spark, tmp_path):
    """NULL-timestamp events must not form or split gaps: the engines
    disagree on NULL placement in window order (Spark NULLS FIRST, DuckDB
    NULLS LAST), so the exclusion is the only divergence-free semantic."""
    d = _write_events(
        tmp_path,
        [
            (1, _TS0, 1, "click", 1.0, "{}"),
            (2, None, 1, "click", 1.0, "{}"),
            (3, _TS0 + 3_000_000, 1, "click", 1.0, "{}"),
        ],
    )
    sp = P.interarrival_stats(spark, d).toPandas()
    assert sp.loc[0, "n_gaps"] == 1 and sp.loc[0, "max_gap_us"] == 3_000_000
    _diff(sp, _oracle(tmp_path, P._SQL_INTERARRIVAL))
    tm = P.event_transition_matrix(spark, d).toPandas()
    assert tm["n_trans"].sum() == 1
    _diff(tm, _oracle(tmp_path, P._SQL_TRANSITION))


def test_key_skew_null_key_reported_and_ordered_identically(spark, tmp_path):
    """A NULL user_id is a legitimate hot key: it must appear in the
    report and sort identically through the top-k cut on both engines
    (NULLS FIRST pinned in the oracle)."""
    d = _write_events(
        tmp_path,
        [
            (1, _TS0, None, "click", 1.0, "{}"),
            (2, _TS0 + 1, None, "click", 1.0, "{}"),
            (3, _TS0 + 2, 7, "click", 1.0, "{}"),
            (4, _TS0 + 3, 8, "click", 1.0, "{}"),  # ties 7 and 8 at 1 event
        ],
    )
    sp = P.key_skew_report(spark, d).toPandas().sort_values("rnk")
    assert len(sp) == 3
    assert pd.isna(sp.iloc[0]["user_id"]) and sp.iloc[0]["n_events"] == 2
    _diff(sp, _oracle(tmp_path, P._SQL_SKEW))


# -- temporal additions (reuse the events fixture writer) --------------------

from bytewax_iceberg_connector_spark.plans import temporal as T


def test_twa_trapezoid_exact_and_single_readings_excluded(spark, tmp_path):
    """10.00 → 20.00 over 10 s is exactly 15.00 time-weighted; a stream
    with one reading has no elapsed time and must vanish (0/0), on BOTH
    engines."""
    d = _write_events(
        tmp_path,
        [
            (1, _TS0, 1, "sensor", 10.0, "{}"),
            (2, _TS0 + 10_000_000, 1, "sensor", 20.0, "{}"),
            (3, _TS0, 2, "lonely", 7.0, "{}"),
        ],
    )
    sp = T.time_weighted_avg(spark, d).toPandas()
    assert list(sp["event_type"]) == ["sensor"]
    assert sp.loc[0, "mean_twa_cents"] == 1500
    _diff(sp, _oracle(tmp_path, T._SQL_TWA))


def test_ohlc_open_close_tie_break_on_event_id(spark, tmp_path):
    """Two ticks at the same timestamp: open is the LOWER event_id, close
    the higher — the struct-min/max selection must agree with the
    oracle's rank-1 windows."""
    d = _write_events(
        tmp_path,
        [
            (5, _TS0, 1, "trade", 101.0, "{}"),
            (4, _TS0, 1, "trade", 99.0, "{}"),
            (6, _TS0 + 60_000_000, 1, "trade", 107.0, "{}"),
        ],
    )
    sp = T.ohlc_bars(spark, d).toPandas()
    assert len(sp) == 1
    assert sp.loc[0, "open"] == 99.0  # event_id 4 at the tied ts
    assert sp.loc[0, "close"] == 107.0
    assert (sp.loc[0, "high"], sp.loc[0, "low"]) == (107.0, 99.0)
    _diff(sp, _oracle(tmp_path, T._SQL_OHLC))


def test_compaction_planning_skips_empty_slices(spark, tmp_path):
    """A corpus with fewer events than commit slices: empty appends must
    not invent 0-row report lines (the oracle's GROUP BY has no such
    group), and tiny commits write exactly min(num_partitions, rows)
    files."""
    from bytewax_iceberg_connector_spark.plans import lake as L

    d = _write_events(
        tmp_path,
        [
            (0, _TS0, 1, "click", 1.0, "{}"),
            (1, _TS0 + 1, 1, "click", 1.0, "{}"),
            (6, _TS0 + 2, 2, "view", 1.0, "{}"),  # residue 0 again
        ],
    )
    sp = L.compaction_planning(spark, d).toPandas()
    assert sorted(sp["commit_id"]) == [0, 1]  # residues 2-5 empty → absent
    assert sp.set_index("commit_id").loc[0, "n_files"] == 2  # 2 rows → 2 files
    _diff(sp, _oracle(tmp_path, L._SQL_COMPACT))


def test_attribution_null_user_purchase_is_unattributed(spark, tmp_path):
    """A NULL-user purchase must survive (left semantics) but never
    attribute — SQL's equi-ASOF can't match NULL = NULL, and the
    window-based operator must not pool NULL users into a phantom
    stream. A click without a k key also lands in unattributed."""
    d = _write_events(
        tmp_path,
        [
            (1, _TS0, None, "click", 1.0, '{"k": 3}'),
            (2, _TS0 + 1, None, "purchase", 50.0, "{}"),
            (3, _TS0, 9, "click", 1.0, "{}"),  # no k key
            (4, _TS0 + 1, 9, "purchase", 25.0, "{}"),
        ],
    )
    sp = T.event_attribution(spark, d).toPandas()
    assert list(sp["channel"]) == ["unattributed"]
    assert sp.loc[0, "n_purchases"] == 2
    _diff(sp, _oracle(tmp_path, T._SQL_ATTRIBUTION))


def test_corr_matrix_degenerate_constant_and_tiny(spark, tmp_path):
    """A constant column has zero variance → corr NULL (0/0) on both
    engines; a perfectly linear pair hits exactly ±1e6 micro."""
    pq.write_table(
        pa.table(
            {
                "l_quantity": pa.array([1.0, 2.0, 3.0], pa.float64()),
                "l_extendedprice": pa.array([10.0, 20.0, 30.0], pa.float64()),
                "l_discount": pa.array([0.05, 0.05, 0.05], pa.float64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    sp = (
        P.corr_matrix(spark, str(tmp_path))
        .toPandas()
        .set_index(["x_col", "y_col"])
    )
    assert sp.loc[("l_quantity", "l_extendedprice"), "corr_micro"] == 1_000_000
    assert pd.isna(sp.loc[("l_quantity", "l_discount"), "corr_micro"])
    _diff(sp.reset_index(), _oracle(tmp_path, P._SQL_CORR))


def test_rolling_actives_exact_window_membership(spark, tmp_path):
    """A user active on day D must count in windows D..D+6 and no other;
    a user active twice in one day counts once. 3 fixture days with a
    2-day gap pin the inner-join day domain (observed days only)."""
    from bytewax_iceberg_connector_spark.plans import behavioral as B

    day_us = 86_400_000_000
    d = _write_events(
        tmp_path,
        [
            (1, _TS0, 1, "click", 1.0, "{}"),
            (2, _TS0 + 1_000_000, 1, "view", 1.0, "{}"),  # same user+day
            (3, _TS0, 2, "click", 1.0, "{}"),
            (4, _TS0 + 3 * day_us, 2, "click", 1.0, "{}"),
            (5, _TS0 + 9 * day_us, 3, "click", 1.0, "{}"),  # outside 7d of day 0
        ],
    )
    sp = B.rolling_active_users(spark, d).toPandas().sort_values("day")
    assert list(sp["dau"]) == [2, 1, 1]
    # day 3's window [day-3..day3] sees users {1,2}; day 9's window
    # [day3..day9] sees user 2 (day 3) + user 3 (day 9) → also 2
    assert list(sp["wau7"]) == [2, 2, 2]
    _diff(sp, _oracle(tmp_path, B._SQL_ROLLING_ACTIVE))


def test_corr_matrix_pairwise_complete_null_handling(spark, tmp_path):
    """A NULL in one measure must drop that ROW from that pair's moments
    entirely (built-in corr semantics): two non-NULL pairs that are
    perfectly linear give exactly +1e6 even with a third NULL row, and n
    reports the pairwise-complete count."""
    pq.write_table(
        pa.table(
            {
                "l_quantity": pa.array([10.0, 20.0, 31.0], pa.float64()),
                "l_extendedprice": pa.array([10.0, 20.0, 31.0], pa.float64()),
                "l_discount": pa.array([0.01, None, 0.09], pa.float64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    sp = (
        P.corr_matrix(spark, str(tmp_path))
        .toPandas()
        .set_index(["x_col", "y_col"])
    )
    row = sp.loc[("l_quantity", "l_discount")]
    assert row["n"] == 2
    assert row["corr_micro"] == 1_000_000  # (10,.01),(31,.09) are linear
    assert sp.loc[("l_quantity", "l_extendedprice"), "n"] == 3
    _diff(sp.reset_index(), _oracle(tmp_path, P._SQL_CORR))


def test_rolling_actives_null_users_excluded(spark, tmp_path):
    """NULL user_ids are not active users: previously dau counted them
    (count(*) over membership) while wau7 dropped them (countDistinct),
    making the two definitions disagree — both now exclude them."""
    from bytewax_iceberg_connector_spark.plans import behavioral as B

    d = _write_events(
        tmp_path,
        [
            (1, _TS0, None, "click", 1.0, "{}"),
            (2, _TS0, 7, "click", 1.0, "{}"),
        ],
    )
    sp = B.rolling_active_users(spark, d).toPandas()
    assert len(sp) == 1
    assert (sp.loc[0, "dau"], sp.loc[0, "wau7"]) == (1, 1)
    assert sp.loc[0, "stickiness_ppm"] == 1_000_000
    _diff(sp, _oracle(tmp_path, B._SQL_ROLLING_ACTIVE))


def test_benford_conforming_corpus_near_zero_delta(spark, tmp_path):
    """A corpus drawn AS Benford (counts proportional to log10(1+1/d))
    lands each digit's share within 1 ppm-rounding of the expectation;
    shares sum to ~1e6 — then differential vs the oracle."""
    import math
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.profiling import (
        _SQL_BENFORD,
        benford_check,
    )

    rows = []
    key = 0
    # 10^6-scaled Benford counts, one representative price per digit
    for d in range(1, 10):
        n = round(math.log10(1 + 1 / d) * 10000)
        for _ in range(n):
            rows.append((key, float(d) * 1.11))  # leading digit d
            key += 1
    pdf = pd.DataFrame(rows, columns=["o_orderkey", "o_totalprice"])
    pdf["o_orderkey"] = pdf["o_orderkey"].astype("int64")
    pdf.to_parquet(_os.path.join(str(tmp_path), "orders.parquet"))
    sp = benford_check(spark, str(tmp_path)).toPandas()
    assert list(sp.digit) == [str(d) for d in range(1, 10)]
    assert abs(int(sp.share_ppm.sum()) - 1_000_000) < 10
    assert (sp.delta_ppm.abs() < 200).all()  # 10^4 draws: <0.02% off
    _diff(sp, _oracle(tmp_path, _SQL_BENFORD))


def test_order_reconciliation_delta_accounting(spark, tmp_path):
    """Exact reconciliation within 1 cent; a 2-cent discrepancy counts
    as unreconciled with its delta in the mean/max; lineless orders and
    headless lines land in their tails — hand values, then the oracle."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.profiling import (
        _SQL_RECONCILIATION,
        order_reconciliation,
    )

    d = str(tmp_path)
    orders = pd.DataFrame(
        [(1, 110.0), (2, 110.02), (3, 50.0)],
        columns=["o_orderkey", "o_totalprice"],
    )
    orders["o_orderkey"] = orders["o_orderkey"].astype("int64")
    orders.to_parquet(_os.path.join(d, "orders.parquet"))
    # one line per order: 100 * (1-0) * (1+0.10) = 110.00 exactly
    lines = pd.DataFrame(
        [(1, 100.0, 0.0, 0.10), (2, 100.0, 0.0, 0.10), (4, 10.0, 0.0, 0.0)],
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )
    lines["l_orderkey"] = lines["l_orderkey"].astype("int64")
    lines.to_parquet(_os.path.join(d, "lineitem.parquet"))
    got = order_reconciliation(spark, d).collect()[0]
    assert (got.n_with_both, got.n_reconciled) == (2, 1)
    assert got.reconciled_ppm == 500_000
    assert (got.mean_abs_delta_cents, got.max_abs_delta_cents) == (1, 2)
    assert (got.n_lineless_orders, got.n_headless_lines) == (1, 1)
    _diff(
        order_reconciliation(spark, d).toPandas(),
        _oracle(tmp_path, _SQL_RECONCILIATION),
    )


def test_revenue_gini_known_distributions(spark, tmp_path):
    """Perfect equality gives Gini 0 exactly; a 4-customer market where
    one holds (almost) everything approaches (n-1)/n; the top-decile
    share is exact — hand values, then the oracle."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.profiling import (
        _SQL_GINI,
        revenue_gini_by_nation,
    )

    d = str(tmp_path)
    # nation 0 "EQ": 4 customers x 100.00 -> gini 0
    # nation 1 "WHALE": 0.01,0.01,0.01,999.99
    orders = []
    custs = []
    k = 0
    for nk, vals in ((0, [100.0] * 4), (1, [0.01, 0.01, 0.01, 999.99])):
        for v in vals:
            orders.append((k, k, v))
            custs.append((k, nk))
            k += 1
    op = pd.DataFrame(orders, columns=["o_orderkey", "o_custkey", "o_totalprice"])
    for c in ("o_orderkey", "o_custkey"):
        op[c] = op[c].astype("int64")
    op.to_parquet(_os.path.join(d, "orders.parquet"))
    cp = pd.DataFrame(custs, columns=["c_custkey", "c_nationkey"])
    cp["c_custkey"] = cp["c_custkey"].astype("int64")
    cp["c_nationkey"] = cp["c_nationkey"].astype("int32")
    cp.to_parquet(_os.path.join(d, "customer.parquet"))
    np_ = pd.DataFrame(
        [(0, "EQ"), (1, "WHALE")], columns=["n_nationkey", "n_name"]
    )
    np_["n_nationkey"] = np_["n_nationkey"].astype("int32")
    np_.to_parquet(_os.path.join(d, "nation.parquet"))
    sp = revenue_gini_by_nation(spark, d).toPandas().set_index("n_name")
    assert sp.loc["EQ"].gini_ppm == 0
    # WHALE: cents [1,1,1,99999], tot=100002, sum(i*x)=1+2+3+4*99999
    tot, sixi, n = 100_002, 1 + 2 + 3 + 4 * 99_999, 4
    want = (2 * sixi - (n + 1) * tot) * 1_000_000 // (n * tot)
    assert sp.loc["WHALE"].gini_ppm == want
    assert sp.loc["WHALE"].top_decile_share_ppm == 0  # n div 10 = 0 -> none
    _diff(
        revenue_gini_by_nation(spark, d).toPandas(),
        _oracle(tmp_path, _SQL_GINI),
    )


def test_crosstab_deviation_known_contingency(spark, tmp_path):
    """2x2 contingency with counts 3/1/1/3: every cell deviates by |8|
    (obs*N - row*col), ordered by the (nation, segment) tie-break; the
    oracle replays cell-for-cell."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.profiling import (
        _SQL_CROSSTAB,
        crosstab_deviation,
    )

    d = str(tmp_path)
    rows = []
    k = 0
    for nk, seg, cnt in ((0, "X", 3), (0, "Y", 1), (1, "X", 1), (1, "Y", 3)):
        for _ in range(cnt):
            rows.append((k, nk, seg))
            k += 1
    cp = pd.DataFrame(rows, columns=["c_custkey", "c_nationkey", "c_mktsegment"])
    cp["c_custkey"] = cp["c_custkey"].astype("int64")
    cp["c_nationkey"] = cp["c_nationkey"].astype("int32")
    cp.to_parquet(_os.path.join(d, "customer.parquet"))
    np_ = pd.DataFrame([(0, "A"), (1, "B")], columns=["n_nationkey", "n_name"])
    np_["n_nationkey"] = np_["n_nationkey"].astype("int32")
    np_.to_parquet(_os.path.join(d, "nation.parquet"))
    sp = crosstab_deviation(spark, d).toPandas()
    assert list(zip(sp.n_name, sp.c_mktsegment)) == [
        ("A", "X"), ("A", "Y"), ("B", "X"), ("B", "Y")
    ]
    assert list(sp.dev) == [8, -8, -8, 8]
    _diff(sp, _oracle(tmp_path, _SQL_CROSSTAB))


def test_k_anonymity_audit_class_histogram(spark, tmp_path):
    """QI classes of sizes 1/3/7/12 land in the four labelled buckets
    with exact class and row counts; the balance bucket is exact
    cents div 10000 (409.99 and 401.00 share bucket 4, 399.99 does
    not)."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.profiling import (
        _SQL_K_ANON,
        k_anonymity_audit,
    )

    d = str(tmp_path)
    rows = []
    k = 0
    # class A: size 1 (singleton); B: 3 (under k); C: 7 (5-9); D: 12 (10+)
    for seg, bal, cnt in (
        ("A", 100.0, 1), ("B", 200.0, 3), ("C", 300.0, 7), ("D", 500.0, 12)
    ):
        for _ in range(cnt):
            rows.append((k, 0, seg, bal))
            k += 1
    # bucket-edge pair: 409.99 and 401.00 share bucket 4; 399.99 is bucket 3
    rows += [(k, 1, "E", 409.99), (k + 1, 1, "E", 401.00),
             (k + 2, 1, "E", 399.99)]
    cp = pd.DataFrame(
        rows, columns=["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"]
    )
    cp["c_custkey"] = cp["c_custkey"].astype("int64")
    cp["c_nationkey"] = cp["c_nationkey"].astype("int32")
    cp.to_parquet(_os.path.join(d, "customer.parquet"))
    sp = k_anonymity_audit(spark, d).toPandas().set_index("size_bucket")
    assert sp.loc["1: singleton"].n_classes == 2  # A + the 399.99 lone row
    assert sp.loc["2: under_k"].n_classes == 2    # B + the E-pair
    assert (sp.loc["2: under_k"].n_rows) == 5
    assert sp.loc["3: 5-9"].n_rows == 7
    assert sp.loc["4: 10+"].n_rows == 12
    assert list(sp.violates_k) == [1, 1, 0, 0]
    _diff(sp.reset_index(), _oracle(tmp_path, _SQL_K_ANON))


def test_return_rate_outliers_threshold_and_min_lines(spark, tmp_path):
    """Base rate 25%: a 5-line customer with 2 returns (40% > 1.5x base)
    flags; one with 1 return (20%) does not; a 100%-returning 2-line
    customer is excluded by the min-lines gate. Multiply-through
    comparison — no divisions — matches the oracle."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.profiling import (
        _SQL_RETURN_OUTLIERS,
        return_rate_outliers,
    )

    d = str(tmp_path)
    li_rows, o_rows = [], []

    def add_cust(ck, flags):
        ok = ck * 100
        o_rows.append((ok, ck))
        for f in flags:
            li_rows.append((ok, f))

    add_cust(1, "RNNNN")        # 1/5 = 20%: under
    add_cust(2, "RRNNN")        # 2/5 = 40%: over 1.5 x base
    add_cust(3, "RR")           # 100% but only 2 lines: min-lines gate
    add_cust(4, "NNNNNNNN")     # 0%: drags base rate down
    li = pd.DataFrame(li_rows, columns=["l_orderkey", "l_returnflag"])
    li["l_orderkey"] = li["l_orderkey"].astype("int64")
    li.to_parquet(_os.path.join(d, "lineitem.parquet"))
    op = pd.DataFrame(o_rows, columns=["o_orderkey", "o_custkey"])
    for c in op.columns:
        op[c] = op[c].astype("int64")
    op.to_parquet(_os.path.join(d, "orders.parquet"))
    # base: 5 returns / 20 lines = 25%
    sp = return_rate_outliers(spark, d).toPandas()
    assert list(sp.o_custkey) == [2]
    assert (sp.iloc[0].rate_ppm, sp.iloc[0].base_rate_ppm) == (400_000, 250_000)
    _diff(sp, _oracle(tmp_path, _SQL_RETURN_OUTLIERS))


def test_blocking_efficiency_hand_counts(spark, tmp_path):
    """4 customers in 2 nations x 2 segments: cross pairs C(4,2)=6;
    nation blocking -> 2 blocks of 2 = 2 pairs (reduction 666666 ppm);
    the compound key -> 4 singletons = 0 pairs (full reduction)."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.profiling import (
        _SQL_BLOCKING,
        blocking_efficiency,
    )

    d = str(tmp_path)
    cp = pd.DataFrame(
        [(1, 0, "X"), (2, 0, "Y"), (3, 1, "X"), (4, 1, "Y")],
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
    )
    cp["c_custkey"] = cp["c_custkey"].astype("int64")
    cp["c_nationkey"] = cp["c_nationkey"].astype("int32")
    cp.to_parquet(_os.path.join(d, "customer.parquet"))
    sp = blocking_efficiency(spark, d).toPandas().set_index("strategy")
    nat = sp.loc["1: nation"]
    assert (nat.n_blocks, nat.max_block, nat.candidate_pairs) == (2, 2, 2)
    assert nat.reduction_ppm == 666_666
    both = sp.loc["3: nation+segment"]
    assert (both.n_blocks, both.candidate_pairs, both.reduction_ppm) == (
        4, 0, 1_000_000
    )
    _diff(sp.reset_index(), _oracle(tmp_path, _SQL_BLOCKING))
