import pytest



def test_distinct_approx_tracks_exact(spark, sf_dir):
    """Since r06 distinct_approx IS the contract audit (exact count +
    earned 3·rsd flag, oracle-checked); this twin keeps the independent
    cross-check against distinct_exact and asserts every flag is earned."""
    from bytewax_iceberg_connector_spark.plans.relational import (
        distinct_approx,
        distinct_exact,
    )

    exact = {r.event_type: r.n_users for r in distinct_exact(spark, sf_dir).collect()}
    audited = {
        r.event_type: (r.n_users_exact, r.approx_ok)
        for r in distinct_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(audited)
    for et, n in exact.items():
        n_exact, ok = audited[et]
        assert n_exact == n, (et, n, n_exact)
        assert ok == 1, (et, n)


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """approx_percentile (sketch form — the 100 TB path) guarantees RANK
    accuracy, not value accuracy: the returned value's empirical rank must
    sit within ±2% of the requested quantile (value-space comparison would
    spuriously fail wherever adjacent order statistics differ — the sketch
    returns a real data point, the exact form interpolates). Same
    self-check-net idea as distinct_approx."""
    from pyspark.sql import functions as F

    from bytewax_iceberg_connector_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    approx = {
        r.event_type: r.ap
        for r in ev.groupBy("event_type")
        .agg(F.expr("approx_percentile(value, array(0.5, 0.95), 10000)").alias("ap"))
        .collect()
    }
    assert approx
    for et, (p50, p95) in approx.items():
        grp = ev.where(F.col("event_type") == et)
        n = grp.count()
        for q, v in ((0.5, p50), (0.95, p95)):
            rank = grp.where(F.col("value") <= v).count() / n
            assert abs(rank - q) <= 0.02, (et, q, v, rank)


def test_sketch_rollup_accuracy_and_mergeability(spark, sf_dir):
    """Since r06 sketch_rollup IS the mergeability audit (exact weekly
    distinct + earned 5% flag, oracle-checked); this twin keeps the
    independent exact cross-check and asserts every flag is earned."""
    from pyspark.sql import functions as F

    from bytewax_iceberg_connector_spark.plans.relational import sketch_rollup
    from bytewax_iceberg_connector_spark.sources.tables import load_table

    audited = {
        r.week: (r.n_users_exact, r.approx_ok)
        for r in sketch_rollup(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.week: r.n
        for r in ev.groupBy(F.date_trunc("week", "ts").alias("week"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(audited) == set(exact)
    for wk, (n_exact, ok) in audited.items():
        assert n_exact == exact[wk], (wk, n_exact, exact[wk])
        assert ok == 1, (wk, n_exact)


@pytest.mark.deep
def test_pagerank_copurchase_invariants(spark, sf_dir):
    """Integer PageRank sanity: ranks are a strict (pr desc, part asc)
    order, every score >= the teleport floor 150000, and the most
    connected part (highest co-occurrence mass) lands a top rank."""
    from bytewax_iceberg_connector_spark.plans.relational import (
        _PR_TOPK,
        pagerank_copurchase,
    )

    rows = pagerank_copurchase(spark, sf_dir).collect()
    assert 0 < len(rows) <= _PR_TOPK
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    prev = None
    for r in rows:
        assert r.pr_micro >= 150000
        if prev is not None:
            assert (prev.pr_micro, -prev.part_key) > (r.pr_micro, -r.part_key)
        prev = r


@pytest.mark.deep
def test_pagerank_degenerate_symmetric_pairs_match_oracle(spark, tmp_path):
    """Two disconnected symmetric pairs: every node's mass is exactly
    conserved (pr stays 1_000_000 through all iterations) and NULL
    order keys contribute no edges — differentially verified."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_PAGERANK,
        pagerank_copurchase,
    )

    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 30), (3, 40),
            (None, 50), (None, 60)]
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }),
        tmp_path / "lineitem.parquet",
    )
    sp = pagerank_copurchase(spark, str(tmp_path)).toPandas()
    _diff(sp, _oracle(tmp_path, _SQL_PAGERANK))
    assert list(sp["part_key"]) == [10, 20, 30, 40]
    assert set(sp["pr_micro"]) == {1_000_000}


def test_copurchase_cosine_perfect_pairs_score_one(spark, tmp_path):
    """Exclusive pairs have cosine exactly 1.0 (1e6 micro) regardless of
    raw support; NULL order keys contribute nothing — differential."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_COPURCHASE_COSINE,
        copurchase_cosine,
    )

    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 30), (3, 40),
            (None, 50), (None, 60)]
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }),
        tmp_path / "lineitem.parquet",
    )
    sp = copurchase_cosine(spark, str(tmp_path)).toPandas()
    _diff(sp, _oracle(tmp_path, _SQL_COPURCHASE_COSINE))
    assert set(sp["cos_micro"]) == {1_000_000}
    assert set(zip(sp["pa"], sp["pb"])) == {(10, 20), (30, 40)}


def _li_graph(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }),
        tmp_path / "lineitem.parquet",
    )
    return str(tmp_path)


def test_triangle_count_known_graphs_match_oracle(spark, tmp_path):
    """One basket of 4 parts = K4 (4 triangles, 12 wedges, clustering
    1.0); a disjoint 3-part path via two 2-part baskets adds 1 wedge and
    0 triangles; NULL order keys add nothing — exact counts on a graph
    small enough to verify by hand, then differentially vs the naive
    3-way self-join oracle."""
    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_TRIANGLES,
        triangle_count,
    )

    rows = [
        (1, 10), (1, 20), (1, 30), (1, 40),   # K4
        (2, 50), (2, 60), (3, 60), (3, 70),   # path 50-60-70
        (None, 80), (None, 90),
    ]
    d = _li_graph(tmp_path, rows)
    sp = triangle_count(spark, d).toPandas()
    row = sp.iloc[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        7, 8, 13, 4,
    )
    # K4 closure: 12 of 13 wedges close -> 3*4*1e6 // 13
    assert row.global_clustering_ppm == 3 * 4 * 1_000_000 // 13
    _diff(sp, _oracle(tmp_path, _SQL_TRIANGLES))


def test_triangle_count_triangle_free_graph(spark, tmp_path):
    """A star (one hub basket pairs with leaves via 2-part baskets) has
    wedges but ZERO triangles — the clustering coefficient is exactly 0,
    not NULL (regression guard for the div-by-nonzero path)."""
    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_TRIANGLES,
        triangle_count,
    )

    rows = [(1, 1), (1, 2), (2, 1), (2, 3), (3, 1), (3, 4)]
    d = _li_graph(tmp_path, rows)
    sp = triangle_count(spark, d).toPandas()
    row = sp.iloc[0]
    assert (row.n_triangles, row.global_clustering_ppm) == (0, 0)
    assert row.n_wedges == 3  # hub degree 3 -> C(3,2)
    _diff(sp, _oracle(tmp_path, _SQL_TRIANGLES))


def test_basket_lift_hand_computed_rules(spark, tmp_path):
    """Parts 1,2 co-occur in 2 of 3 orders and never apart: both directed
    rules have confidence 100% and lift = N/(ca·cb/w)·1000 = 1500; the
    min-support gate drops w=1 pairs — verified by hand, then vs the
    oracle."""
    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_BASKET_LIFT,
        basket_lift,
    )

    rows = [
        (1, 10), (1, 20),           # basket {10,20}
        (2, 10), (2, 20),           # basket {10,20} again -> w=2
        (3, 30), (3, 40),           # w=1 pair: below min support
    ]
    d = _li_graph(tmp_path, rows)
    sp = basket_lift(spark, d).toPandas()
    assert len(sp) == 2  # only the w=2 pair survives, both directions
    assert set(zip(sp.a, sp.b)) == {(10, 20), (20, 10)}
    assert (sp.support == 2).all()
    assert (sp.confidence_ppm == 1_000_000).all()
    # lift = w*N*1000 // (ca*cb) = 2*3*1000 // (2*2)
    assert (sp.lift_milli == 1500).all()
    _diff(sp, _oracle(tmp_path, _SQL_BASKET_LIFT))


def test_basket_lift_no_frequent_pairs_is_empty(spark, tmp_path):
    """A corpus of only singleton co-occurrences yields zero rules on
    both engines."""
    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_BASKET_LIFT,
        basket_lift,
    )

    d = _li_graph(tmp_path, [(1, 1), (1, 2), (2, 3), (2, 4)])
    sp = basket_lift(spark, d).toPandas()
    assert len(sp) == 0
    _diff(sp, _oracle(tmp_path, _SQL_BASKET_LIFT))


def test_supplier_share_trend_rank_moves(spark, tmp_path):
    """Two years, two suppliers swapping the lead: rank_gain is +1 for
    the riser, -1 for the faller, NULL prev_rank in year one; shares
    are exact ppm of each year's cents — hand-checked, then vs the
    oracle."""
    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_SUPPLIER_TREND,
        supplier_share_trend,
    )

    rows = [
        # (suppkey, shipdate, extendedprice, discount)
        (1, "1995-06-01", 300.0, 0.0),
        (2, "1995-06-01", 100.0, 0.0),
        (1, "1996-06-01", 100.0, 0.0),
        (2, "1996-06-01", 300.0, 0.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
    )
    # micros, not pandas' default ns — real lineitem fixtures are micros
    pdf["l_shipdate"] = pd.to_datetime(pdf["l_shipdate"]).astype(
        "datetime64[us]"
    )
    pdf["l_suppkey"] = pdf["l_suppkey"].astype("int64")
    pdf.to_parquet(tmp_path / "lineitem.parquet")
    sp = supplier_share_trend(spark, str(tmp_path)).toPandas()
    got = {
        (r.yr, r.rnk, r.suppkey, r.rev_cents, r.share_ppm): (
            r.prev_rnk, r.rank_gain
        )
        for r in sp.itertuples(index=False)
    }
    assert all(pd.isna(v) for v in got[(1995, 1, 1, 30000, 750000)])
    assert got[(1996, 1, 2, 30000, 750000)] == (2, 1)
    assert got[(1996, 2, 1, 10000, 250000)] == (1, -1)
    _diff(sp, _oracle(tmp_path, _SQL_SUPPLIER_TREND))


def test_skyline_pareto_semantics_and_partition_invariance(spark, tmp_path):
    """Domination semantics by hand: equal-on-one-dimension points
    dominate when strictly better on the other; duplicates of an optimal
    point ALL survive; and the two-phase result is identical when the
    input is split across 4 files (partition-local pruning is lossless)
    — both layouts vs the quadratic oracle."""
    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_SKYLINE,
        skyline_pareto,
    )

    rows = [
        # (partkey, retailprice, size)
        (1, 10.00, 5),   # skyline
        (2, 10.00, 5),   # duplicate of an optimum: survives too
        (3, 10.00, 7),   # same price, bigger: dominated by 1
        (4, 12.00, 5),   # pricier, same size: dominated by 1
        (5, 12.00, 3),   # skyline (smaller than anything cheaper)
        (6, 15.00, 3),   # dominated by 5 (pricier, equal size)
        (7, 20.00, 1),   # skyline
        (8, None, 2),    # NULL price: excluded
    ]
    pdf = pd.DataFrame(
        rows, columns=["p_partkey", "p_retailprice", "p_size"]
    )
    pdf["p_partkey"] = pdf["p_partkey"].astype("int64")
    pdf["p_size"] = pdf["p_size"].astype("Int64")

    pdf.to_parquet(tmp_path / "part.parquet")
    sp = skyline_pareto(spark, str(tmp_path)).toPandas()
    assert list(sp.p_partkey) == [1, 2, 5, 7]
    _diff(sp, _oracle(tmp_path, _SQL_SKYLINE))

    # 4-file layout: phase-1 windows see different pid splits; result
    # must be layout-invariant (the oracle can't read a directory — the
    # single-file diff above already anchors the values)
    (tmp_path / "part.parquet").unlink()
    spark.createDataFrame(pdf).repartition(4).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "part.parquet"))
    sp4 = skyline_pareto(spark, str(tmp_path)).toPandas()
    assert list(sp4.p_partkey) == [1, 2, 5, 7]
    assert sp4.equals(sp)


def test_graph_degree_profile_star_chain(spark, tmp_path):
    """Hub 1-{2,3,4} plus chain 4-5-6-7: knn(k) curve hand-computed
    (deg-1 nodes average 2666 milli, deg-2 2000, deg-3 1333); duplicate
    lineitem rows and NULL partkeys change nothing on either engine."""
    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_DEGREE_PROFILE,
        graph_degree_profile,
    )

    rows = [
        (10, 1), (10, 2), (10, 2),       # edge 1-2 (dup row collapses)
        (11, 1), (11, 3),
        (12, 1), (12, 4),
        (13, 4), (13, 5),
        (14, 5), (14, 6),
        (15, 6), (15, 7),
        (16, None), (16, 9),             # NULL partkey: no pair emitted
    ]
    d = _li_graph_nullable(tmp_path, rows)
    sp = graph_degree_profile(spark, d).toPandas().set_index("deg")
    assert list(sp.index) == [1, 2, 3]
    assert list(sp.n_nodes) == [3, 3, 1]
    assert list(sp.sum_nbr_deg) == [8, 12, 4]
    assert list(sp.mean_nbr_deg_milli) == [2666, 2000, 1333]
    _diff(sp.reset_index(), _oracle(tmp_path, _SQL_DEGREE_PROFILE))


def _li_graph_nullable(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }),
        tmp_path / "lineitem.parquet",
    )
    return str(tmp_path)


def test_bfs_reach_frontiers_exact_shortest_distance(spark, tmp_path):
    """Same star+chain graph: root is hub 1 (deg 3, smallest id wins any
    tie); frontiers are SHORTEST-distance sets {2,3,4} / {5} / {6} —
    node 7 at distance 4 stays out; a disconnected component never
    appears."""
    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_BFS,
        bfs_reach,
    )

    rows = [
        (10, 1), (10, 2),
        (11, 1), (11, 3),
        (12, 1), (12, 4),
        (13, 4), (13, 5),
        (14, 5), (14, 6),
        (15, 6), (15, 7),
        (17, 100), (17, 101),            # disconnected edge
        # back-edge 2-4 makes 4 reachable at hop 1 AND 2: must count once
        (18, 2), (18, 4),
    ]
    d = _li_graph_nullable(tmp_path, rows)
    sp = bfs_reach(spark, d).toPandas()
    assert list(sp.hop) == [0, 1, 2, 3]
    assert list(sp.n_nodes) == [1, 3, 1, 1]
    _diff(sp, _oracle(tmp_path, _SQL_BFS))


def test_basket_triples_fanout_equals_self_join(spark, tmp_path):
    """A 4-part basket emits its C(4,3)=4 canonical triples; support
    counts across baskets; min-support drops singles; duplicate lines
    and NULL parts are hygiene-filtered — against the 3-way-join
    oracle."""
    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_BASKET_TRIPLES,
        basket_triples,
    )

    rows = [
        (1, 10), (1, 20), (1, 30), (1, 40),   # C(4,3) = 4 triples
        (2, 10), (2, 20), (2, 30), (2, 30),   # {10,20,30} again -> support 2
        (3, 50), (3, 60), (3, 70),            # support-1 triple: dropped
        (4, None), (4, 80), (4, 90),          # NULL part: only a pair left
    ]
    d = _li_graph_nullable(tmp_path, rows)
    sp = basket_triples(spark, d).toPandas()
    assert len(sp) == 1
    assert tuple(sp.iloc[0]) == (10, 20, 30, 2)
    _diff(sp, _oracle(tmp_path, _SQL_BASKET_TRIPLES))


def test_percentile_approx_check_flags_and_exact_values(spark, tmp_path):
    """4-row group: exact disc p50 = 2nd value, p90 = 4th; both contract
    flags must be earned (1) — the oracle states them as literals, so a
    sketch-bound violation would hash-mismatch. Full-frame oracle diff."""
    import os as _os

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_PCTL_APPROX,
        percentile_approx_check,
    )

    import pandas as pd

    rows = [("1-URGENT", p) for p in (10.00, 20.00, 30.00, 40.00)]
    rows += [("2-HIGH", p) for p in (5.50, 7.25)]
    op = pd.DataFrame(rows, columns=["o_orderpriority", "o_totalprice"])
    op.to_parquet(_os.path.join(str(tmp_path), "orders.parquet"))

    sp = percentile_approx_check(spark, str(tmp_path)).toPandas()
    by = sp.set_index("o_orderpriority")
    u = by.loc["1-URGENT"]
    assert (u.n_orders, u.p50_exact_cents, u.p90_exact_cents) == (4, 2000, 4000)
    h = by.loc["2-HIGH"]
    assert (h.n_orders, h.p50_exact_cents, h.p90_exact_cents) == (2, 550, 725)
    assert (sp.p50_approx_ok == 1).all() and (sp.p90_approx_ok == 1).all()
    _diff(sp, _oracle(tmp_path, _SQL_PCTL_APPROX))


def test_distinct_approx_null_users_drop_symmetrically(spark, tmp_path):
    """The twostage pair pre-aggregate must not turn NULL users into a
    phantom distinct, and an event_type whose users are ALL NULL must
    drop on both engines (the oracle carries the same pre-filter)."""
    import os as _os

    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.relational import (
        _SQL_DISTINCT_APPROX,
        distinct_approx,
    )

    ev = pd.DataFrame(
        {
            "event_type": ["a", "a", "a", "a", "b", "b"],
            "user_id": [1, 1, 2, None, None, None],
        }
    )
    ev["user_id"] = ev["user_id"].astype("Int64")
    ev.to_parquet(_os.path.join(str(tmp_path), "events.parquet"))

    sp = distinct_approx(spark, str(tmp_path)).toPandas()
    assert list(sp.event_type) == ["a"]  # 'b' (all-NULL users) drops
    assert sp.n_users_exact.tolist() == [2] and sp.approx_ok.tolist() == [1]
    _diff(sp, _oracle(tmp_path, _SQL_DISTINCT_APPROX))
