"""Skew handling at the physical-plan level: AQE's runtime skew-join split
(the built-in mitigation) actually fires, and salted_join (the manual
mitigation for when AQE can't help, e.g. aggregations) agrees with the
plain join — together the 100 TB hot-key story.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skewed(spark):
    """1 hot key (90% of rows) + uniform tail, joined to a small dim."""
    facts = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dims = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    )
    return facts, dims


def test_aqe_splits_skewed_join_partitions(spark, skewed):
    """With skew thresholds lowered to toy scale, AQE must mark the hot
    partition for splitting (`isSkew=true` in the final plan) and still
    return exact results — the runtime re-plan the engine relies on
    instead of hand-scheduling."""
    facts, dims = skewed
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
        # AQE consults its own threshold (session-tuned to 64MB) when
        # re-planning — without this the SMJ flips to broadcast and the
        # skew split never happens
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = facts.join(dims, "k")
        # the action must run on THIS DataFrame's QueryExecution — a
        # .count() would plan a separate query and leave this one unfinal.
        # (No aggregation on k downstream either: AQE skips the skew split
        # when it would break a required child distribution.)
        rows = joined.collect()
        assert len(rows) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "isSkew=true" in plan or "skew=true" in plan.lower()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_matches_plain_join_on_skew(spark, skewed):
    """The manual mitigation returns row-identical results to the plain
    join on a genuinely skewed key distribution."""
    from bytewax_iceberg_connector_spark.operators.skew import salted_join

    facts, dims = skewed
    plain = facts.join(dims, on="k", how="inner")
    salted = salted_join(facts, dims, on="k", how="inner", n_salts=8)
    assert salted.count() == plain.count()
    diff = salted.select(*plain.columns).exceptAll(plain.select(*plain.columns))
    assert diff.count() == 0
