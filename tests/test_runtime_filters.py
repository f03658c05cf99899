"""Runtime bloom-filter join pruning: with a selective dimension filter,
Spark injects a bloom filter built from the dim side into the fact scan
(`might_contain(...)` before the shuffle join), cutting the shuffled fact
volume to roughly the semi-join size — on a 100 TB fact table this is the
difference between shuffling the full table and shuffling only matching
rows. The thresholds below are what a cluster deployment tunes:
``applicationSideScanSizeThreshold`` gates on fact-scan size (default
10 GB — far above the local fixtures, hence lowered here) and
``creationSideThreshold`` caps the dim side the filter is built from."""

from __future__ import annotations

import pytest

from bytewax_iceberg_connector_spark.sources.tables import load_table

_CONFS = {
    # both thresholds: the session tunes them to 64MB (set-once), and the
    # bloom injection only fires on shuffle joins — the regime under test
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@pytest.fixture()
def bloom_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is not None:
            spark.conf.set(k, v)


def _join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where("o_orderpriority = '1-URGENT'")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )


def test_bloom_filter_injected_on_fact_scan(spark, sf_dir, bloom_confs):
    plan = _join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, plan
    assert "bloom_filter_agg" in plan
    # the probe must sit on the FACT side (filters l_orderkey), built from
    # the filtered dim side (aggregates o_orderkey)
    assert "might_contain" in plan.split("bloom_filter_agg")[0]
    probe_line = next(l for l in plan.splitlines() if "might_contain" in l)
    assert "l_orderkey" in probe_line


def test_bloom_filter_preserves_result(spark, sf_dir, bloom_confs):
    with_bloom = _join(spark, sf_dir).collect()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    without = _join(spark, sf_dir).collect()
    assert sorted(map(tuple, with_bloom)) == sorted(map(tuple, without))
