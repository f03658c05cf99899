"""Property-based tests (hypothesis): the custom operators vs brute-force
Python references on arbitrary small inputs.

Few examples, deliberately: each example pays Spark job overhead, and the
operators' state space (ordering, ties, missing keys) is covered well by
~15 random shapes plus the explicit edge-case unit tests.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_row = st.tuples(
    st.integers(min_value=0, max_value=3),    # key
    st.integers(min_value=0, max_value=30),   # ts (seconds)
    st.integers(min_value=-100, max_value=100),  # value / tiebreak seed
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@settings(**_SETTINGS)
@given(
    left=st.lists(_row, min_size=1, max_size=12),
    right=st.lists(_row, min_size=0, max_size=12),
)
def test_asof_join_matches_bruteforce(spark, left, right):
    from bytewax_iceberg_connector_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t, _) in enumerate(left)],
        "k INT, ts TIMESTAMP, lid INT",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(t), float(v), i) for i, (k, t, v) in enumerate(right)],
        "k INT, ts TIMESTAMP, v DOUBLE, seq INT",
    )
    got = {
        r.lid: (r.ts_right, r.v_right)
        for r in asof_join(ldf, rdf, on="k", value_cols=("v",), tiebreak="seq").collect()
    }

    # brute force: for each left row, the right row with max (ts, seq)
    # among same-key rows with ts <= left.ts
    want = {}
    for i, (lk, lt, _) in enumerate(left):
        best = None
        for j, (rk, rt, rv) in enumerate(right):
            if rk == lk and rt <= lt:
                cand = (rt, j, rv)
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        want[i] = (None, None) if best is None else (_ts(best[0]), float(best[2]))
    assert got == want


@settings(**_SETTINGS)
@given(
    target=st.lists(_row, min_size=0, max_size=10),
    updates=st.lists(_row, min_size=0, max_size=10),
)
def test_merge_upsert_matches_dict_semantics(spark, target, updates):
    from bytewax_iceberg_connector_spark.operators.merge import merge_upsert

    # unique keys in target (a table's invariant); updates deduped by seq
    tgt = {k: v for k, _, v in target}
    tdf = spark.createDataFrame(
        [(k, float(v)) for k, v in tgt.items()] or [(None, None)],
        "k INT, v DOUBLE",
    ).where("k IS NOT NULL")
    udf = spark.createDataFrame(
        [(k, float(v), i) for i, (k, _, v) in enumerate(updates)] or [(None, None, None)],
        "k INT, v DOUBLE, seq INT",
    ).where("k IS NOT NULL")

    got = {
        r.k: (r.v, r.seq is not None)
        for r in merge_upsert(
            tdf.withColumn("seq", tdf.k * 0 - 1), udf, ["k"], tiebreak="seq"
        ).collect()
    }

    want_vals = dict(tgt)
    upd_best: dict[int, tuple[int, int]] = {}
    for i, (k, _, v) in enumerate(updates):
        if k not in upd_best or i > upd_best[k][0]:
            upd_best[k] = (i, v)
    for k, (_, v) in upd_best.items():
        want_vals[k] = v
    assert {k: v for k, (v, _) in got.items()} == {
        k: float(v) for k, v in want_vals.items()
    }
