"""Property-based tests (hypothesis): operator semantics pinned against
independent reference implementations on randomized inputs — the corpus
queries prove fixed answers; these prove the CONTRACT over the input space.

Example counts are kept small (Spark round-trip per example ~0.3 s); the
generators bias toward the edges that burned us before: short docs, equal
timestamps, duplicate keys.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from bytewax_iceberg_connector_spark.functions import text as X

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "eee", "f0"]), min_size=0, max_size=12
)


@given(docs=st.lists(_WORDS, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_shingles_agree_with_reference(spark, docs):
    """JVM shingles() == a trivial Python reference on arbitrary token
    streams (incl. docs shorter than n — the round-1 crash class)."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = {
        r.doc_id: sorted(r.s)
        for r in df.select("doc_id", X.shingles("text", 3).alias("s")).collect()
    }
    for i, ws in enumerate(docs):
        want = sorted({" ".join(ws[j:j + 3]) for j in range(max(len(ws) - 2, 0))})
        assert got[i] == want, (i, ws)


@st.composite
def _asof_frames(draw):
    """Left/right event frames; unique (key, ts) per side so the as-of
    match is unambiguous (ties are covered by the deterministic tiebreak
    tests in test_temporal)."""
    keys = draw(st.lists(st.integers(0, 2), min_size=1, max_size=4))
    base = dt.datetime(2024, 1, 1)
    left, right = [], []
    used_l, used_r = set(), set()
    for k in keys:
        for t in draw(st.lists(st.integers(0, 40), min_size=1, max_size=5)):
            if (k, t) not in used_l:
                used_l.add((k, t))
                left.append((k, base + dt.timedelta(seconds=t)))
        for t in draw(st.lists(st.integers(0, 40), min_size=1, max_size=5)):
            if (k, t) not in used_r:
                used_r.add((k, t))
                right.append((k, base + dt.timedelta(seconds=t), float(t)))
    return left, right


@given(frames=_asof_frames())
@settings(**_SETTINGS)
@pytest.mark.deep
def test_asof_join_agrees_with_pandas_merge_asof(spark, frames):
    """asof_join == pandas.merge_asof (direction='backward', inclusive) on
    random key/timestamp layouts."""
    from bytewax_iceberg_connector_spark.operators.asof import asof_join

    left_rows, right_rows = frames
    left = spark.createDataFrame(
        [Row(user_id=k, ts=t) for k, t in left_rows]
    )
    right = spark.createDataFrame(
        [Row(user_id=k, ts=t, value=v) for k, t, v in right_rows]
    )
    got = {
        (r.user_id, r.ts): (r.ts_right, r.value_right)
        for r in asof_join(
            left, right, on="user_id", ts_col="ts", value_cols=["value"]
        ).collect()
    }
    lp = pd.DataFrame(left_rows, columns=["user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(
        right_rows, columns=["user_id", "ts", "value"]
    ).sort_values("ts")
    want_df = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward",
        suffixes=("", "_right"),
    )
    for rec in want_df.itertuples(index=False):
        w_ts = None if pd.isna(rec.value) else rec.ts  # matched right ts
        g_ts, g_v = got[(rec.user_id, rec.ts)]
        if pd.isna(rec.value):
            assert g_v is None, (rec, g_ts, g_v)
        else:
            assert g_v == rec.value, (rec, g_ts, g_v)


@given(
    target=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)),
                    min_size=1, max_size=10),
    updates=st.lists(st.tuples(st.integers(0, 5), st.integers(200, 300)),
                     min_size=0, max_size=6, unique_by=lambda t: t[0]),
)
@settings(**_SETTINGS)
@pytest.mark.deep
def test_merge_upsert_reference_semantics(spark, target, updates):
    """merge_upsert == dict-overlay semantics: update wins on matched keys,
    unmatched keys insert, untouched target rows survive."""
    from bytewax_iceberg_connector_spark.operators.merge import merge_upsert

    tgt = {k: v for k, v in target}  # last occurrence wins for duplicates
    t_df = spark.createDataFrame(list(tgt.items()), "k INT, v INT")
    u_df = spark.createDataFrame(updates, "k INT, v INT") if updates else \
        spark.createDataFrame([], "k INT, v INT")
    got = {r.k: r.v for r in merge_upsert(t_df, u_df, keys=["k"]).collect()}
    want = dict(tgt)
    want.update(dict(updates))
    assert got == want


@given(frames=_asof_frames())
@settings(**_SETTINGS)
@pytest.mark.deep
def test_asof_forward_agrees_with_pandas(spark, frames):
    """asof_join(direction='forward') == pandas.merge_asof forward on
    random layouts — the nearest upcoming right row, inclusive."""
    from bytewax_iceberg_connector_spark.operators.asof import asof_join

    left_rows, right_rows = frames
    left = spark.createDataFrame([Row(user_id=k, ts=t) for k, t in left_rows])
    right = spark.createDataFrame(
        [Row(user_id=k, ts=t, value=v) for k, t, v in right_rows]
    )
    got = {
        (r.user_id, r.ts): r.value_right
        for r in asof_join(
            left, right, on="user_id", ts_col="ts",
            value_cols=["value"], direction="forward",
        ).collect()
    }
    lp = pd.DataFrame(left_rows, columns=["user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(
        right_rows, columns=["user_id", "ts", "value"]
    ).sort_values("ts")
    want_df = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="forward",
        suffixes=("", "_right"),
    )
    for rec in want_df.itertuples(index=False):
        g_v = got[(rec.user_id, rec.ts)]
        if pd.isna(rec.value):
            assert g_v is None, rec
        else:
            assert g_v == rec.value, (rec, g_v)


@given(frames=_asof_frames())
@settings(**_SETTINGS)
@pytest.mark.deep
def test_asof_nearest_agrees_with_pandas(spark, frames):
    """asof_join(direction='nearest') == pandas merge_asof nearest
    (backward wins distance ties; exact match always wins)."""
    from bytewax_iceberg_connector_spark.operators.asof import asof_join

    left_rows, right_rows = frames
    left = spark.createDataFrame([Row(user_id=k, ts=t) for k, t in left_rows])
    right = spark.createDataFrame(
        [Row(user_id=k, ts=t, value=v) for k, t, v in right_rows]
    )
    got = {
        (r.user_id, r.ts): r.value_right
        for r in asof_join(
            left, right, on="user_id", ts_col="ts",
            value_cols=["value"], direction="nearest",
        ).collect()
    }
    lp = pd.DataFrame(left_rows, columns=["user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(
        right_rows, columns=["user_id", "ts", "value"]
    ).sort_values("ts")
    want_df = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="nearest",
        suffixes=("", "_right"),
    )
    for rec in want_df.itertuples(index=False):
        g_v = got[(rec.user_id, rec.ts)]
        if pd.isna(rec.value):
            assert g_v is None, rec
        else:
            assert g_v == rec.value, (rec, g_v)


# ---------------------------------------------------------------------------
# round-4 kernels: salted join row-invisibility, SCD2 conservation
# ---------------------------------------------------------------------------

_SKEW_ROWS = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 100)),
    min_size=1,
    max_size=25,
)


@given(rows=_SKEW_ROWS, n_salts=st.sampled_from([1, 3, 8]))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.deep
def test_salted_join_row_invisible(spark, rows, n_salts):
    """salted_join's contract: row-identical to the plain join for ANY
    fact multiset / salt count — only the partitioning may differ."""
    from bytewax_iceberg_connector_spark.operators.skew import salted_join

    facts = spark.createDataFrame(rows, "k string, v int")
    dims = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 30), ("d", 40)], "k string, w int"
    )
    got = sorted(map(tuple, salted_join(facts, dims, on="k",
                                        n_salts=n_salts).collect()))
    want = sorted(map(tuple, facts.join(dims, "k").collect()))
    assert got == want


_SCD_EVENTS = st.lists(
    st.tuples(
        st.integers(1, 3),                    # user
        st.integers(0, 50),                   # minute offset
        st.sampled_from(["x", "y"]),          # state
    ),
    min_size=1,
    max_size=20,
)


@given(events=_SCD_EVENTS)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_scd2_conserves_time_and_intervals(spark, events):
    """SCD2 invariants for ANY event stream: per user exactly one OPEN
    interval; closed interval seconds sum to (last ts − first ts); the
    interval count equals the number of state CHANGES + 1 (computed
    independently in pandas)."""
    import pandas as pd

    rows = [
        Row(
            user_id=u,
            ts=dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m),
            event_id=i,
            event_type=s,
        )
        for i, (u, m, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows)

    # run the same pipeline scd2_history builds, on this frame
    from pyspark.sql import Window

    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = df.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(wo).isNull()
            | (F.lag("event_type").over(wo) != F.col("event_type")),
            1,
        ).otherwise(0),
    ).withColumn(
        "run_id", F.sum("chg").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    runs = flagged.groupBy("user_id", "run_id").agg(
        F.min("ts").alias("valid_from")
    )
    wr = Window.partitionBy("user_id").orderBy("valid_from")
    hist = runs.withColumn("valid_to", F.lead("valid_from").over(wr)).toPandas()

    pdf = pd.DataFrame(
        [(u, m, s, i) for i, (u, m, s) in enumerate(events)],
        columns=["u", "m", "s", "i"],
    ).sort_values(["u", "m", "i"])
    for u, g in pdf.groupby("u"):
        h = hist[hist.user_id == u]
        assert (h.valid_to.isna()).sum() == 1           # one open interval
        n_changes = (g.s != g.s.shift()).sum()          # first row counts as 1
        assert len(h) == n_changes
        closed = h.dropna(subset=["valid_to"])
        total = (closed.valid_to - closed.valid_from).dt.total_seconds().sum()
        # closed intervals tile [first event, start of the LAST run)
        run_starts = g.m[(g.s != g.s.shift()).values]
        span = (run_starts.iloc[-1] - g.m.iloc[0]) * 60
        assert total == span


# ---------------------------------------------------------------------------
# degenerate-input contracts (ANSI-mode parity with the DuckDB oracle)
# ---------------------------------------------------------------------------


def test_davg_all_null_group_yields_null(spark):
    """A group whose measure is entirely NULL must average to NULL (the
    oracle's x/0 semantics), not raise DIVIDE_BY_ZERO under ANSI."""
    from bytewax_iceberg_connector_spark.functions.numeric import davg

    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 2.0)], "k string, v double"
    )
    rows = {r.k: r.avg for r in df.groupBy("k").agg(davg("v").alias("avg")).collect()}
    assert rows["a"] is None
    assert rows["b"] == 2.0


def test_cosine_zero_norm_yields_null(spark):
    from bytewax_iceberg_connector_spark.functions.similarity import cosine

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = [r[0] for r in df.select(cosine(F.col("a"), F.col("b"))).collect()]
    assert got[0] is None
    assert abs(got[1] - 1.0) < 1e-12


def test_simhash_np_null_matches_expression_twin(spark):
    """Null/empty shingle sets must fingerprint as NULL on BOTH kernels —
    a 0 fingerprint would band-match every null doc with every other."""
    from bytewax_iceberg_connector_spark.functions.similarity import (
        simhash64,
        simhash64_np,
    )

    df = spark.createDataFrame(
        [(None,), ([],), ([7, 12, 99],)], "h array<long>"
    )
    got = df.select(
        simhash64_np()(F.col("h")).alias("np"),
        simhash64(F.col("h")).alias("expr"),
    ).collect()
    for r in got:
        assert r.np == r.expr, (r.np, r.expr)
    assert got[0].np is None and got[1].np is None


def test_zorder_key_many_columns_stays_in_63_bits(spark):
    """9 columns at default 8 bits would shift past bit 63 (sign flip /
    mod-64 wrap); the key must degrade bits-per-column and stay
    non-negative."""
    from bytewax_iceberg_connector_spark.functions.zorder import zorder_key

    import pyspark.sql.functions as SF

    cols = [f"c{i}" for i in range(9)]
    df = spark.range(100).select(
        *[(SF.col("id") * (i + 1) % 97).cast("double").alias(c)
          for i, c in enumerate(cols)]
    )
    z = df.select(zorder_key(df, cols).alias("z"))
    assert z.where("z < 0").count() == 0
    assert z.select(SF.max("z")).first()[0] < 2**63


# -- temporal kernels: OHLC and trapezoid TWA vs pure-Python references ------

@st.composite
def _event_stream(draw):
    """Random (event_id, t_us, user, type, cents) stream biased toward the
    edges: timestamp ties (distinct ids), sub-second deltas (dt_s == 0),
    single-reading streams, multi-hour spans."""
    n = draw(st.integers(1, 14))
    base = 1_700_000_000_000_000
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                base + draw(st.integers(0, 3 * 3600 * 1_000_000)),
                draw(st.integers(0, 2)),
                draw(st.sampled_from(["a", "b"])),
                draw(st.integers(1, 9999)),  # cents, 2-dp money
            )
        )
    return rows


def _events_dir(rows):
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="bic_prop_")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] / 100.0 for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        f"{d}/events.parquet",
    )
    return d


@given(rows=_event_stream())
@settings(**_SETTINGS)
@pytest.mark.deep
def test_twa_matches_python_reference(spark, rows):
    """The engine's trapezoid TWA == an independent integer reference on
    arbitrary streams (ties, zero-second intervals, singleton streams)."""
    import shutil
    from collections import defaultdict

    from bytewax_iceberg_connector_spark.plans.temporal import (
        time_weighted_avg,
    )

    d = _events_dir(rows)
    try:
        got = {
            r.event_type: (r.n_streams, r.sum_twa_cents, r.mean_twa_cents,
                           r.min_twa_cents, r.max_twa_cents)
            for r in time_weighted_avg(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    streams = defaultdict(list)
    for eid, t_us, user, typ, cents in rows:
        streams[(user, typ)].append((t_us, eid, cents))
    twas = defaultdict(list)
    for (user, typ), evs in streams.items():
        evs.sort()
        integral2 = dur = 0
        for (t1, _, v1), (t2, _, v2) in zip(evs, evs[1:]):
            dt_s = (t2 - t1) // 1_000_000
            integral2 += (v1 + v2) * dt_s
            dur += dt_s
        if dur > 0:
            twas[typ].append(integral2 // (2 * dur))
    want = {
        t: (len(v), sum(v), sum(v) // len(v), min(v), max(v))
        for t, v in twas.items()
    }
    assert got == want


@given(rows=_event_stream())
@settings(**_SETTINGS)
@pytest.mark.deep
def test_ohlc_matches_python_reference(spark, rows):
    """struct-min/max open/close selection == the reference's
    first/last-by-(ts, event_id); volume compared in exact cents."""
    import shutil
    from collections import defaultdict

    from bytewax_iceberg_connector_spark.plans.temporal import ohlc_bars

    d = _events_dir(rows)
    try:
        got = {
            (r.event_type, r.bar_hour): (
                round(r.open * 100), round(r.high * 100), round(r.low * 100),
                round(r.close * 100), round(r.volume * 100), r.n_ticks,
            )
            for r in ohlc_bars(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    import datetime as dtm

    bars = defaultdict(list)
    for eid, t_us, user, typ, cents in rows:
        hour_us = t_us - t_us % (3600 * 1_000_000)
        bars[(typ, hour_us)].append((t_us, eid, cents))
    assert len(got) == len(bars)
    for (typ, hour_us), evs in bars.items():
        evs.sort()
        key = (
            typ,
            dtm.datetime(1970, 1, 1) + dtm.timedelta(microseconds=hour_us),
        )
        cents = [c for _, _, c in evs]
        want = (
            evs[0][2], max(cents), min(cents), evs[-1][2], sum(cents),
            len(evs),
        )
        assert got[key] == want, (typ, hour_us)


@given(rows=_event_stream())
@settings(**_SETTINGS)
def test_interarrival_matches_python_reference(spark, rows):
    """Per-type gap statistics == an independent reference on arbitrary
    streams (ties broken by event_id, singleton streams excluded)."""
    import shutil
    from collections import defaultdict

    from bytewax_iceberg_connector_spark.plans.profiling import (
        interarrival_stats,
    )

    d = _events_dir(rows)
    try:
        got = {
            r.event_type: (r.n_gaps, r.min_gap_us, r.max_gap_us,
                           r.sum_gap_us, r.mean_gap_us)
            for r in interarrival_stats(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    streams = defaultdict(list)
    for eid, t_us, user, typ, _ in rows:
        streams[(user, typ)].append((t_us, eid))
    gaps = defaultdict(list)
    for (user, typ), evs in streams.items():
        evs.sort()
        gaps[typ].extend(b[0] - a[0] for a, b in zip(evs, evs[1:]))
    want = {
        t: (len(g), min(g), max(g), sum(g), sum(g) // len(g))
        for t, g in gaps.items()
        if g
    }
    assert got == want


@given(rows=_event_stream())
@settings(**_SETTINGS)
@pytest.mark.deep
def test_transition_matrix_matches_python_reference(spark, rows):
    """Bigram transition counts and row-normalized ppm == a reference
    walk of each user's (ts, event_id)-ordered stream."""
    import shutil
    from collections import Counter, defaultdict

    from bytewax_iceberg_connector_spark.plans.profiling import (
        event_transition_matrix,
    )

    d = _events_dir(rows)
    try:
        got = {
            (r.prev_type, r.next_type): (r.n_trans, r.prob_ppm)
            for r in event_transition_matrix(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    streams = defaultdict(list)
    for eid, t_us, user, typ, _ in rows:
        streams[user].append((t_us, eid, typ))
    counts = Counter()
    for evs in streams.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    row_tot = defaultdict(int)
    for (a, _), n in counts.items():
        row_tot[a] += n
    want = {
        k: (n, n * 1_000_000 // row_tot[k[0]]) for k, n in counts.items()
    }
    assert got == want


@given(
    vals=st.lists(
        st.integers(-10_000, 10_000), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
@pytest.mark.deep
def test_mad_outliers_matches_python_reference(spark, tmp_path_factory, vals):
    """mad_outliers' double twice-median pipeline == a direct Python
    median/MAD computation on arbitrary integer-cent value sets (ties,
    negatives, singletons)."""
    import os as _os

    from bytewax_iceberg_connector_spark.plans.behavioral import mad_outliers

    d = str(tmp_path_factory.mktemp("mad"))
    pdf = pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "event_type": ["t"] * len(vals),
            "value": [v / 1000.0 for v in vals],
        }
    )
    pdf["event_id"] = pdf["event_id"].astype("int64")
    pdf.to_parquet(_os.path.join(d, "events.parquet"))
    row = mad_outliers(spark, d).collect()[0]

    import math

    micros = sorted(math.floor(v / 1000.0 * 1_000_000) for v in vals)
    n = len(micros)
    med2 = micros[(n + 1) // 2 - 1] + micros[(n + 2) // 2 - 1]
    devs = sorted(abs(2 * m - med2) for m in micros)
    mad4 = devs[(n + 1) // 2 - 1] + devs[(n + 2) // 2 - 1]
    n_out = sum(1 for m in micros if 2 * abs(2 * m - med2) > 3 * mad4)
    assert (row.n_values, row.med2_micro, row.mad4_micro, row.n_outliers) == (
        n, med2, mad4, n_out
    )


@given(
    days=st.lists(
        st.tuples(st.integers(0, 40), st.integers(1, 500)),
        min_size=2,
        max_size=15,
        unique_by=lambda t: t[0],
    )
)
@settings(**_SETTINGS)
@pytest.mark.deep
def test_theil_sen_bucket_selection_is_lossless(spark, tmp_path_factory, days):
    """The distributed bucket-selection median == a naive Python median
    of all pairwise truncated slopes, on arbitrary (day, cents) series —
    the selection must be exactly the global-sort answer, including tie
    pileups that land many equal slopes in one bucket."""
    import datetime as _dt
    import os as _os

    from bytewax_iceberg_connector_spark.plans.temporal import theil_sen_trend

    d = str(tmp_path_factory.mktemp("ts"))
    base = _dt.date(2024, 1, 1)
    rows = []
    for i, (dn, dollars) in enumerate(days):
        rows.append(
            (i, 1, float(dollars), (base + _dt.timedelta(days=dn)).isoformat())
        )
    pdf = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    pdf["o_orderkey"] = pdf["o_orderkey"].astype("int64")
    pdf["o_custkey"] = pdf["o_custkey"].astype("int64")
    pdf["o_orderdate"] = pd.to_datetime(pdf["o_orderdate"]).astype(
        "datetime64[us]"
    )
    pdf.to_parquet(_os.path.join(d, "orders.parquet"))
    row = theil_sen_trend(spark, d).collect()[0]

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    daily = sorted((dn, dollars * 100) for dn, dollars in days)
    slopes = sorted(
        trunc_div((c2 - c1) * 1_000_000, d2 - d1)
        for i, (d1, c1) in enumerate(daily)
        for (d2, c2) in daily[i + 1:]
    )
    n = len(slopes)
    want = slopes[(n + 1) // 2 - 1] + slopes[(n + 2) // 2 - 1]
    assert row.n_pairs == n
    assert row.med2_slope_micro == want
    assert row.min_slope_micro == slopes[0]
    assert row.max_slope_micro == slopes[-1]


@given(
    series=st.lists(
        st.integers(-500, 2000), min_size=1, max_size=20
    )
)
@settings(**_SETTINGS)
@pytest.mark.deep
def test_cusum_drift_matches_python_replay(spark, tmp_path_factory, series):
    """cusum_drift's Arrow kernel == a direct Python replay of the
    clamped recurrence on arbitrary daily series (negative revenues,
    all-equal days, single-day nations)."""
    import datetime as _dt
    import os as _os

    from bytewax_iceberg_connector_spark.plans.temporal import (
        _CUSUM_H_MULT,
        _trunc_div,
        cusum_drift,
    )

    d = str(tmp_path_factory.mktemp("cusum"))
    base = _dt.date(2024, 1, 1)
    rows = [
        (i, 1, float(v), (base + _dt.timedelta(days=i)).isoformat())
        for i, v in enumerate(series)
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
    cp = pd.DataFrame({"c_custkey": [1], "c_nationkey": [0]})
    cp["c_custkey"] = cp["c_custkey"].astype("int64")
    cp["c_nationkey"] = cp["c_nationkey"].astype("int32")
    cp.to_parquet(_os.path.join(d, "customer.parquet"))
    np_ = pd.DataFrame({"n_nationkey": [0], "n_name": ["N"]})
    np_["n_nationkey"] = np_["n_nationkey"].astype("int32")
    np_.to_parquet(_os.path.join(d, "nation.parquet"))

    row = cusum_drift(spark, d).collect()[0]
    cents = [v * 100 for v in series]
    k = _trunc_div(sum(cents), len(cents))
    h = _CUSUM_H_MULT * k
    s = mx = breaches = 0
    peak = base
    for i, x in enumerate(cents):
        s = max(0, s + x - k)
        if s > mx:
            mx, peak = s, base + _dt.timedelta(days=i)
        if s > h:
            breaches += 1
    assert (row.n_days, row.k_cents, row.max_cusum_cents, row.n_breaches) == (
        len(series), k, mx, breaches
    )
    assert row.peak_day == peak


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 100_000)),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
@pytest.mark.deep
def test_streaming_dedup_watermark_matches_python_replay(
    spark, tmp_path_factory, rows
):
    """The greedy keep-chain kernel == a direct Python replay of the
    per-key recurrence on arbitrary id/timestamp patterns — run with
    Arrow batches capped at 3 rows so keys SPLIT across batches and the
    kernel's carry state (last key, last kept µs) is actually exercised
    (production batch sizes never split the small fixtures). Duplicate
    base ids merge into one 6-occurrence key; event_type is a function
    of the id so tie-order inside a key can't flip per-type counts."""
    import datetime as _dt
    import os as _os

    from bytewax_iceberg_connector_spark.plans.streaming_queries import (
        _DDW_DELTA_US,
        streaming_dedup_watermark,
    )

    d = str(tmp_path_factory.mktemp("ddw"))
    t0 = _dt.datetime(2024, 1, 1)
    ev = pd.DataFrame(
        {
            "event_id": [eid for eid, _ in rows],
            "ts": [t0 + _dt.timedelta(minutes=m) for _, m in rows],
            "event_type": ["ab"[eid % 2] for eid, _ in rows],
        }
    )
    ev["event_id"] = ev["event_id"].astype("int64")
    ev["ts"] = pd.to_datetime(ev["ts"]).astype("datetime64[us]")
    ev.to_parquet(_os.path.join(d, "events.parquet"))

    # python replay of the full pipeline (echo fan-out + greedy chain)
    base_us = int(t0.timestamp()) * 1_000_000
    occ: dict[int, list[int]] = {}
    for eid, m in rows:
        tsu = base_us + m * 60_000_000
        occ.setdefault(eid, []).extend(
            (
                tsu,
                tsu + (eid % 150 + 1) * 60_000_000,
                tsu + (eid % 120 + 180) * 60_000_000,
            )
        )
    want: dict[str, list[int]] = {}
    for eid, tss in occ.items():
        typ = "ab"[eid % 2]
        agg = want.setdefault(typ, [0, 0, 0])  # kept, suppressed, checksum
        last_kept = None
        for t in sorted(tss):
            if last_kept is None or t - last_kept >= _DDW_DELTA_US:
                last_kept = t
                agg[0] += 1
                agg[2] += eid % 1000
            else:
                agg[1] += 1

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        got = {
            r.event_type: [r.n_kept, r.n_suppressed, r.kept_id_checksum]
            for r in streaming_dedup_watermark(spark, d).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == want, (got, want)


@given(
    rows=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=0,
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
@pytest.mark.deep
def test_minhash_np_bit_identical_to_expression_twin(spark, rows):
    """The Arrow minhash kernel claims BIT-identical signatures to the
    higher-order-expression form (same affine hashes mod the same Mersenne
    prime). Pin it across the full signed-64 hash domain — including
    min-int64, where numpy's floor-mod and Spark's trunc-mod-then-pmod
    must still land on the same residue — plus NULL/empty sets (both
    must yield NULL, never a 0-signature that band-matches everything)."""
    from bytewax_iceberg_connector_spark.functions.similarity import (
        minhash_signature,
        minhash_signature_np,
    )

    n_perm = 8
    df = spark.createDataFrame([(r,) for r in rows], "h array<long>")
    got = df.select(
        minhash_signature_np(n_perm)(F.col("h")).alias("np"),
        F.when(
            F.size("h") > 0, F.array(*minhash_signature(F.col("h"), n_perm))
        ).alias("expr"),
    ).collect()
    for r, src in zip(got, rows):
        if src is None or len(src) == 0:
            assert r.np is None and r.expr is None, (src, r)
        else:
            assert r.np == r.expr, (src, r.np, r.expr)


@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-8, max_value=8).map(float),
            min_size=6,
            max_size=6,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(**_SETTINGS)
@pytest.mark.deep
def test_sign_lsh_np_matches_expression_twin(spark, vecs):
    """The Arrow sign-LSH kernel must bucket identically to the
    higher-order-expression reference (same seeded hyperplanes, same
    bit-packing) — integer-valued components make every plane dot exact,
    so a divergence is a real plane/packing bug, never summation order."""
    from bytewax_iceberg_connector_spark.functions.similarity import (
        sign_lsh_keys_np,
        sign_lsh_tables,
    )

    dim, n_tables, bits = 6, 4, 3
    df = spark.createDataFrame([(v,) for v in vecs], "e array<double>")
    got = df.select(
        sign_lsh_keys_np(dim, n_tables, bits)(F.col("e")).alias("np"),
        sign_lsh_tables(F.col("e"), dim, n_tables, bits).alias("expr"),
    ).collect()
    for r in got:
        assert list(r.np) == [e.key for e in r.expr], (r.np, r.expr)
        assert [e.table for e in r.expr] == list(range(n_tables))


def test_case_mapping_consistent_between_jvm_and_python_kernels(spark):
    """The engine lowercases in TWO runtimes — JVM expressions (F.lower,
    X.tokens) and Python Arrow kernels (shingle_hashes_np's .lower()) —
    and they MUST agree or the same document would tokenize differently
    on the two paths. Pin the hard codepoints (Turkish İ → i+U+0307,
    Greek final sigma) where Unicode full case mapping is easy to break
    with a stray .casefold()/simple-fold. NOTE: DuckDB's lower() maps
    İ→i and trailing Σ→σ instead — a DOCUMENTED oracle-dialect boundary
    (SURVEY.md), not an engine inconsistency; the synthetic corpus is
    ASCII so oracle comparisons are unaffected."""
    from pyspark.sql import functions as F

    tricky = [
        "İSTANBUL ß ÅNGSTRÖM ﬁn ΣΟΦΟΣ",
        "STRASSE ÄÖÜ İİİ ΣΣΣ",
    ]
    df = spark.createDataFrame([(t,) for t in tricky], "t string")

    @F.pandas_udf("string")
    def _pylower(s: pd.Series) -> pd.Series:
        return s.str.lower()

    rows = df.select(
        F.lower("t").alias("jvm"), _pylower(F.col("t")).alias("py")
    ).collect()
    for r in rows:
        assert r.jvm == r.py, (r.jvm, r.py)


def test_levenshtein_unit_dialect_boundary(spark):
    """Spark's levenshtein counts CODE POINTS; DuckDB's counts BYTES —
    a DOCUMENTED oracle-dialect boundary (r08 unicode sweep: twin pairs
    whose dropped prefix held multibyte chars measured lev 10 on Spark
    vs 12 on DuckDB). The synthetic corpus is ASCII so the registered
    dedup_edit_distance differential is unaffected; this pin records the
    unit difference so a future multibyte corpus red isn't mistaken for
    an engine bug."""
    import duckdb
    from pyspark.sql import functions as F

    row = spark.createDataFrame([("héllo 世界", "hello xy")], "a string, b string") \
        .select(F.levenshtein("a", "b").alias("lev")).collect()[0]
    assert row.lev == 3  # three code-point substitutions: é→e, 世→x, 界→y
    duck = duckdb.connect().execute(
        "SELECT levenshtein('héllo 世界', 'hello xy')"
    ).fetchone()[0]
    assert duck > row.lev  # byte-based: every multibyte char costs extra


def test_json_duplicate_key_dialect_boundary(spark):
    """RFC 8259 leaves duplicate-key objects undefined, and the engines
    pick opposite conventions: Spark's Jackson parser keeps the LAST
    value, DuckDB's json_extract the FIRST — a DOCUMENTED oracle-dialect
    boundary (r09 props sweep: sum_k_valid diverged by exactly the
    duplicate-key rows). Scalar-typed, valid, unique-key JSON — the whole
    registered surface — is unaffected; this pin records the convention
    split so a future dup-key corpus red isn't mistaken for an engine
    bug."""
    import duckdb
    from pyspark.sql import functions as F

    row = (
        spark.createDataFrame([('{"k":1,"k":2}',)], "praw string")
        .select(F.from_json("praw", "k INT")["k"].alias("pk"))
        .collect()[0]
    )
    assert row.pk == 2  # Jackson: last wins
    duck = duckdb.connect().execute(
        """SELECT json_extract_string('{"k":1,"k":2}', '$.k')"""
    ).fetchone()[0]
    assert duck == "1"  # DuckDB: first wins
