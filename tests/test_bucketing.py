"""Bucketed co-located joins: the exchange must disappear."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytewax_iceberg_connector_spark.operators.bucketing import (
    read_table,
    write_bucketed,
)
from bytewax_iceberg_connector_spark.sources.tables import load_table


def test_bucketed_join_eliminates_exchanges(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "b_orders", ["o_orderkey"], n_buckets=4)
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "b_lineitem", ["o_orderkey"], n_buckets=4)

    bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: bucket metadata proves both sides partition-equal →
        # sort-merge join with NO shuffle on either side
        assert "Exchange" not in plan
        # correctness: same count as the plain-file join
        assert joined.count() == o.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_avoids_shuffle(spark, sf_dir):
    """groupBy on the bucket key reuses the bucketing as its partitioning."""
    bo = read_table(spark, "b_orders")
    plan = (
        bo.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
