"""applyInPandasWithState operators: real streaming runs checked against
their batch-aggregation oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytewax_iceberg_connector_spark.sources.tables import load_table
from bytewax_iceberg_connector_spark.streaming.stateful import (
    dedup_first_seen,
    running_counter,
)
from bytewax_iceberg_connector_spark.streaming.windows import read_events_stream


def _drain(df, name, cp):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(cp))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_dedup_first_seen_matches_batch_min(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, sf_dir)
    _drain(dedup_first_seen(stream), "dedup_t", tmp_path / "cp_dedup")
    # update mode re-emits a key on every batch it appears in; keep the last
    got_rows = spark.table("dedup_t").collect()
    got = {}
    for r in got_rows:
        got[r.user_id] = (r.first_ts, r.n_suppressed)

    ev = load_table(spark, sf_dir, "events")
    want = {
        r.user_id: (r.first_ts, r.n_suppressed)
        for r in ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            (F.count("*") - 1).alias("n_suppressed"),
        )
        .collect()
    }
    assert got == want


def test_running_counter_matches_batch_agg(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, sf_dir)
    _drain(running_counter(stream), "counter_t", tmp_path / "cp_counter")
    got = {}
    for r in spark.table("counter_t").collect():
        got[r.event_type] = (r.n_events, r.total_cents)

    ev = load_table(spark, sf_dir, "events")
    want = {
        r.event_type: (r.n_events, r.total_cents)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
        )
        .collect()
    }
    assert got == want
