"""The full differential gate as a test: every declared query vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

import math
import os
from collections import Counter

import duckdb
import pytest

import __spark_entry__ as entrymod

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return round(v, 9 - int(math.floor(math.log10(abs(v)))) if abs(v) > 1 else 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in _TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_every_oracle_key_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def _driver_fidelity_check(spdf, opdf, name):
    """Reproduce the DRIVER's canonicalization constraints locally.

    The driver routes both results through pandas, sorts, and hashes the
    cell VALUES — so divergences invisible to a python-level == compare
    still fail there (CORRECTNESS_r03): DuckDB HUGEINT lands in pandas as
    float64 while Spark emits int64 (12.0 vs 12 hash-diverge), and an
    array-typed column is unhashable in pandas sort/factorize and crashes
    the comparison outright. Catch both classes pre-driver.
    """
    import numpy as np

    _NUMERIC = {"i", "u", "f"}
    for c in spdf.columns:
        sk, ok = spdf[c].dtype.kind, opdf[c].dtype.kind
        if sk in _NUMERIC or ok in _NUMERIC:
            assert sk == ok, (
                f"{name}.{c}: pandas dtype kind diverges (spark={spdf[c].dtype}"
                f", oracle={opdf[c].dtype}) — the driver hashes through pandas"
                f" and an int/float split is a hash mismatch even when values"
                f" are equal; CAST the oracle column explicitly"
            )
    for frame, side in ((spdf, "spark"), (opdf, "oracle")):
        bad = [
            c
            for c in frame.columns
            if frame[c]
            .map(lambda v: isinstance(v, (list, tuple, dict, np.ndarray)))
            .any()
        ]
        assert not bad, (
            f"{name}: {side} returns array/struct column(s) {bad} — "
            f"unhashable in the driver's pandas canonicalizer; serialize to"
            f" a deterministic string on both sides"
        )


@pytest.fixture(scope="module")
def spark_results(spark, sf_dir):
    """Concurrent Spark-side prefetch for the whole battery (r10 suite
    trim): the 202 per-query tests serially paid ~0.5–9 s of driver/job
    latency each; a shared 8-worker executor overlaps them while the
    parametrized tests below keep their per-query identity (each still
    fails individually with its own diff). Workers touch ONLY Spark
    (thread-safe: plain collect/toPandas, no session-conf toggles); the
    DuckDB side stays in the test body on the module connection.

    Single-test selection (-k name) still triggers the full prefetch —
    the documented single-query iteration loop is tools/diffcheck.py.
    """
    from concurrent.futures import ThreadPoolExecutor

    def one(name):
        # persist: the frame is executed twice (collect for the value
        # multiset, toPandas for driver fidelity) — heavy queries would
        # otherwise pay their full plan cost twice
        sdf = _QUERIES[name](spark, sf_dir).persist()
        try:
            srows = [tuple(r) for r in sdf.collect()]
            spdf = sdf.toPandas() if name in _ORACLES else None
            return (list(sdf.columns), srows, spdf)
        finally:
            sdf.unpersist()

    ex = ThreadPoolExecutor(max_workers=8)
    futures = {n: ex.submit(one, n) for n in sorted(_QUERIES)}
    yield futures
    ex.shutdown(wait=False, cancel_futures=True)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark_results, duck):
    cols, srows, spdf = spark_results[name].result()
    if name not in _ORACLES:
        # rows-only contract: must at least run and return a stable schema
        assert cols
        return
    res = duck.execute(_ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(cols) == sorted(dcols), "column names must match"
    assert len(srows) == len(drows), "row counts must match"
    assert _norm(cols, srows) == _norm(dcols, drows), (
        "values must match"
    )
    _driver_fidelity_check(
        spdf, duck.execute(_ORACLES[name]).df(), name
    )


def test_no_duplicate_query_names_across_plan_modules():
    """dict.update in the registry would silently shadow a query defined in
    two plan modules — enforce global uniqueness instead."""
    import importlib

    from bytewax_iceberg_connector_spark.plans import registry

    seen: dict[str, str] = {}
    for mod_name in registry._PLAN_MODULES:
        mod = importlib.import_module(
            f"bytewax_iceberg_connector_spark.plans.{mod_name}"
        )
        for name in getattr(mod, "QUERIES", {}):
            assert name not in seen, (
                f"query {name!r} defined in both {seen[name]} and {mod_name}"
            )
            seen[name] = mod_name
        for name in getattr(mod, "ORACLE", {}):
            assert name in getattr(mod, "QUERIES", {}), (
                f"oracle {name!r} in {mod_name} has no matching query"
            )


def test_registry_orders_unproven_queries_into_gate_window():
    """The driver records only the first _GATE_WINDOW queries() entries per
    round; the registry derives its order from the CORRECTNESS_r*.json
    artifacts so red / never-checked queries land inside that window
    (round-3 ADVICE: no hand-maintained priority tuple)."""
    from bytewax_iceberg_connector_spark.plans import registry

    q = registry.all_queries()
    recs = registry._driver_records()
    window = list(q)[: registry._GATE_WINDOW]
    priority = [n for n in q if registry._rank(recs, n)[0] < 2]
    assert len(priority) <= registry._GATE_WINDOW, (
        "more unproven queries than the driver can check in one round — "
        "stage registrations across rounds"
    )
    missing = [n for n in priority if n not in window]
    assert not missing, missing


def test_registry_rank_semantics():
    """Red-latest sorts before never-checked before green; greens rotate
    stalest-first."""
    from bytewax_iceberg_connector_spark.plans import registry

    recs = {"red": (3, False), "old_green": (1, True), "new_green": (3, True)}
    order = sorted(
        ["new_green", "never", "red", "old_green"],
        key=lambda n: registry._rank(recs, n),
    )
    assert order == ["red", "never", "old_green", "new_green"]


def test_registry_rank_weak_record_with_oracle_reenters_window():
    """A query converted rows-only -> oracle-checked has never been
    hash-verified: its weak no_oracle record must rank with the
    never-checked tier, not wait out the stale-green rotation."""
    from bytewax_iceberg_connector_spark.plans import registry

    recs = {
        "converted": (3, True, True),   # latest record weak, oracle now exists
        "still_weak": (3, True, True),  # weak, still no oracle
        "green": (1, True, False),
    }
    rank = lambda n, has: registry._rank(recs, n, has)
    assert rank("converted", True)[0] == 1
    assert rank("still_weak", False)[0] == 2
    assert rank("green", True)[0] == 2
    # legacy 2-tuple records (older tests / artifacts) still parse
    assert registry._rank({"x": (2, True)}, "x", True)[0] == 2


def test_rotation_keeps_every_oracle_query_fresh():
    """With a 50-slot gate window and 146+ queries, a full regression
    rotation takes ~3 rounds. If registration outpaces the window, some
    oracle-checked query's latest driver record ages beyond that — this
    contract catches rotation STARVATION, not sanctioned displacement:
    registering new queries (which take never-checked priority) can push
    up to that many stale greens one round past the ``max_round - 3``
    horizon, and the artifact-derived ordering guarantees those lead the
    very next window. So the property asserted is the one that matters:
    every over-age query must sit inside the NEXT gate window (it will be
    re-proven before it can age further). A query that is over-age AND
    outside the next window is genuinely starved — that still fails."""
    import pytest

    from bytewax_iceberg_connector_spark.plans import registry

    recs = registry._driver_records()
    if not recs:
        pytest.skip("no driver artifacts (fresh checkout)")
    max_rnd = max(r[0] for r in recs.values())
    oracles = registry.all_oracles()
    stale = {
        n: recs[n][0]
        for n in oracles
        if n in recs and recs[n][0] < max_rnd - 3
    }
    if not stale:
        return
    next_window = list(registry.all_queries())[: registry._GATE_WINDOW]
    starved = {n: r for n, r in stale.items() if n not in next_window}
    assert not starved, (
        "oracle-checked queries starved out of the gate rotation (over-age "
        f"AND not in the next {registry._GATE_WINDOW}-slot window): {starved}"
    )
    # displaced-but-healing queries are capped at one round over-age:
    # anything two+ rounds past the horizon means the heal never landed
    twice_stale = {n: r for n, r in stale.items() if r < max_rnd - 4}
    assert not twice_stale, (
        f"queries over-age by 2+ rounds — the next-window heal never ran: "
        f"{twice_stale}"
    )
