"""merge_upsert (MERGE semantics) and salted_join (skew mitigation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytewax_iceberg_connector_spark.operators.merge import merge_upsert
from bytewax_iceberg_connector_spark.operators.skew import salted_join


def test_merge_updates_replace_and_inserts_append(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k INT, s STRING, v DOUBLE"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k INT, s STRING, v DOUBLE"
    )
    got = {r.k: (r.s, r.v) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_tiebreak_dedups_update_batch(spark):
    target = spark.createDataFrame([(1, "a", 0)], "k INT, s STRING, seq INT")
    updates = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2)], "k INT, s STRING, seq INT"
    )
    rows = merge_upsert(target, updates, ["k"], tiebreak="seq").collect()
    assert len(rows) == 1 and rows[0].s == "y"


def test_salted_join_row_identical_to_plain(spark, sf_dir):
    from bytewax_iceberg_connector_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    dims = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)],
        "event_type STRING, weight DOUBLE",
    )
    plain = ev.join(dims, "event_type")
    salted = salted_join(ev, dims, on="event_type", n_salts=8)
    assert salted.count() == plain.count()
    assert (
        salted.select(F.sum(F.col("value") * F.col("weight"))).first()[0]
        == plain.select(F.sum(F.col("value") * F.col("weight"))).first()[0]
        or abs(
            salted.select(F.sum(F.col("value") * F.col("weight"))).first()[0]
            - plain.select(F.sum(F.col("value") * F.col("weight"))).first()[0]
        ) < 1e-6
    )
    got = {
        (r.event_type, r.event_id) for r in salted.select("event_type", "event_id").collect()
    }
    want = {
        (r.event_type, r.event_id) for r in plain.select("event_type", "event_id").collect()
    }
    assert got == want


def test_salted_join_partitions_on_key_and_salt(spark, sf_dir):
    """The shuffle key must be (key, salt) — that's the whole point."""
    import re

    from bytewax_iceberg_connector_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dims = spark.createDataFrame([("click", 1.0)], "event_type STRING, w DOUBLE")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            salted_join(ev, dims, on="event_type", n_salts=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert re.search(r"Exchange hashpartitioning\(event_type#\d+, _salt", plan)
