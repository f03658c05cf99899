

def test_distinct_approx_tracks_exact(spark, sf_dir):
    """The HLL sketch has no oracle by design; pin it to the exact answer
    instead — every group within 3·rsd (rsd=0.01 → ±3%)."""
    from bytewax_iceberg_connector_spark.plans.relational import (
        distinct_approx,
        distinct_exact,
    )

    exact = {r.event_type: r.n_users for r in distinct_exact(spark, sf_dir).collect()}
    approx = {
        r.event_type: r.n_users_approx for r in distinct_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(3, 0.03 * n), (et, n, approx[et])
