"""Distributed k-means + SemDeDup-style semantic dedup: Lloyd convergence,
deterministic assignment, cell purity vs the synthetic labels, and dedup
recall against the exact all-pairs cosine form."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bytewax_iceberg_connector_spark.functions.clustering import (
    kmeans_assign,
    kmeans_fit,
)
from bytewax_iceberg_connector_spark.plans.llm import (
    _SEM_TAU,
    _semantic_cells,
    semantic_dedup,
)
from bytewax_iceberg_connector_spark.sources.tables import load_table


def _vecs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_inertia_monotone_decreasing(spark, sf_dir):
    _, history = kmeans_fit(_vecs(spark, sf_dir), k=8, iters=4, seed=23)
    assert len(history) == 4
    for prev, cur in zip(history, history[1:]):
        assert cur <= prev + 1e-6, history


def test_assignment_deterministic_and_total(spark, sf_dir):
    vecs = _vecs(spark, sf_dir).persist()
    cents, _ = kmeans_fit(vecs, k=8, iters=3, seed=23)
    a1 = {r.vec_id: r.cluster for r in kmeans_assign(vecs, cents).collect()}
    a2 = {r.vec_id: r.cluster for r in kmeans_assign(vecs, cents).collect()}
    assert a1 == a2
    assert len(a1) == vecs.count()
    assert set(a1.values()) <= set(range(8))


def test_fit_improves_objective_and_is_non_degenerate(spark, sf_dir):
    """No supervised signal exists in the synthetic embeddings (labels are
    geometry-free: within-label cosine == cross-label cosine), so quality
    is judged unsupervised: Lloyd iterations must cut inertia well below
    the seed-centroid partition, and the cells must stay balanced."""
    vecs = _vecs(spark, sf_dir).persist()
    cents, history = kmeans_fit(vecs, k=16, iters=5, seed=23)
    assert history[-1] < 0.97 * history[0], history
    sizes = (
        kmeans_assign(vecs, cents).groupBy("cluster").count().collect()
    )
    n = sum(r["count"] for r in sizes)
    assert n == 500
    assert len(sizes) >= 8  # most cells survive
    assert max(r["count"] for r in sizes) < 0.5 * n  # no collapse


def test_semantic_dedup_census_and_recall(spark, sf_dir):
    out = _semantic_cells(spark, sf_dir).collect()
    assert sum(r.n_members for r in out) == 500
    for r in out:
        assert r.n_kept + r.n_dropped == r.n_members
        assert 1 <= r.n_kept <= r.n_members
        assert r.top_label_n <= r.n_members

    # recall: of all true near-dup pairs (cos >= tau, exact all-pairs),
    # how many fall inside one k-means cell? Semantic clustering must
    # co-locate most of them; dropped count can't exceed true-pair reach.
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pdf = emb.orderBy("vec_id").toPandas()
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    g = xn @ xn.T
    iu = np.triu_indices(len(xn), k=1)
    true_pairs = int((g[iu] >= _SEM_TAU).sum())
    n_dropped = sum(r.n_dropped for r in out)
    assert true_pairs > 0
    # every drop is justified by a true pair with its kept representative
    assert n_dropped <= true_pairs
    # and the cells catch a real share of the duplicate mass
    assert n_dropped >= 0.3 * len(
        {b for a, b in zip(*iu) if g[a, b] >= _SEM_TAU}
    ), (n_dropped, true_pairs)


def test_semantic_dedup_audit_flags_all_green(spark, sf_dir):
    """The registered semantic_dedup contract audit (oracle-checked since
    r06) must be one summary row with every flag = 1: the two theorems
    (membership partition, drop ≤ tau-reach) and the two calibrations
    (coverage floor, cell sanity)."""
    rows = semantic_dedup(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_vectors > 0 and r.n_dup_reach > 0
    assert r.members_conserved == 1
    assert r.dropped_bounded == 1
    assert r.coverage_ok == 1
    assert r.cells_ok == 1
