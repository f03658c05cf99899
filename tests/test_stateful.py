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


def _tws_available() -> bool:
    """transformWithStateInPandas ships a protobuf-based state-server
    protocol; this container has no google.protobuf, so the API is
    capability-gated exactly like the iceberg runtime (the suite runs the
    moment the dependency appears)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


import pytest as _pytest


@_pytest.mark.skipif(not _tws_available(), reason="google.protobuf absent")
def test_transform_with_state_running_count(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: per-key running count with
    ValueState must match the batch groupBy count."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CountProc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self._n = handle.getValueState("n", "n BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

        def close(self):
            pass

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "src")
    spark.range(100).select(
        (F.col("id") % 7).alias("user_id"), F.current_timestamp().alias("ts")
    ).write.parquet(src)
    stream = spark.readStream.schema("user_id BIGINT, ts TIMESTAMP").parquet(src)
    out = stream.groupBy("user_id").transformWithStateInPandas(
        CountProc(), "user_id BIGINT, n BIGINT", "Update", "ProcessingTime"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tws_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.n) for r in spark.sql("select * from tws_counts").collect()
        }
    finally:
        q.stop()
    want = {
        (r.user_id, r.n)
        for r in spark.range(100)
        .select((F.col("id") % 7).alias("user_id"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert want <= got
