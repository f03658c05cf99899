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


def test_stateful_kernels_survive_adversarial_events(spark, tmp_path):
    """NULL timestamps/values/keys through the REAL streaming path: a NaT
    event time must not corrupt first_ts (pre-fix it emitted year 1677 —
    NaT's min-int64 payload), a NULL value must not kill the stream
    (astype(int64) on NaN raised), and both kernels must still match
    their declared batch twins, whose SQL min/sum ignore NULLs."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "signup", 10.0),
        (1, t0 + dt.timedelta(minutes=5), 1, "view", 20.5),
        (2, None, 1, "view", 3.0),                     # NULL ts
        (3, t0 + dt.timedelta(minutes=9), 2, "view", None),  # NULL value
        (4, t0 + dt.timedelta(minutes=2), None, None, 4.0),  # NULL key+type
    ]
    d = tmp_path / "adv"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        d / "events.parquet",
    )

    stream = read_events_stream(spark, str(d))
    _drain(dedup_first_seen(stream), "dedup_adv", tmp_path / "cp_da")
    got = {
        r.user_id: (r.first_ts, r.n_suppressed)
        for r in spark.table("dedup_adv").collect()
    }
    assert got[1] == (t0, 2)  # NaT row suppressed-counted, never the min
    assert got[2] == (t0 + dt.timedelta(minutes=9), 0)
    assert got[None] == (t0 + dt.timedelta(minutes=2), 0)

    _drain(
        running_counter(read_events_stream(spark, str(d))),
        "counter_adv",
        tmp_path / "cp_ca",
    )
    got = {
        r.event_type: (r.n_events, r.total_cents)
        for r in spark.table("counter_adv").collect()
    }
    assert got["view"] == (3, 2350)  # NULL value dropped like SQL SUM
    assert got["signup"] == (1, 1000)
    assert got[None] == (1, 400)


def test_stateful_state_carries_across_microbatch_boundaries(spark, tmp_path):
    """Adversarial rows SPLIT ACROSS micro-batches (maxFilesPerTrigger=1,
    one file per trigger): per-key state must carry the running minimum /
    totals across batch boundaries, with the NULL-ts and NULL-value rows
    landing in DIFFERENT batches than the values they must not disturb."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1)
    batches = [
        # batch 1: u1 starts late, u2 starts
        [(0, t0 + dt.timedelta(minutes=30), 1, "view", 10.0),
         (1, t0 + dt.timedelta(minutes=1), 2, "view", 20.0)],
        # batch 2: u1's TRUE minimum arrives later + a NULL value row
        [(2, t0, 1, "view", None),
         (3, t0 + dt.timedelta(minutes=2), 2, "view", 5.0)],
        # batch 3: u1 gets a NULL-ts row (must not reset the minimum)
        [(4, None, 1, "view", 7.0)],
    ]
    d = tmp_path / "src"
    d.mkdir()
    for i, rows in enumerate(batches):
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array(
                        [r[3] for r in rows], pa.string()
                    ),
                    "value": pa.array([r[4] for r in rows], pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            d / f"b{i}.parquet",
        )

    from pyspark.sql import functions as F

    schema = spark.read.parquet(str(d)).schema

    def _stream():
        # NTZ→session-tz cast, same normalization read_events_stream does
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    # capture emissions through foreachBatch (synchronous, driver-side)
    # instead of the memory sink: under a busy suite the memory sink was
    # observed to LOSE a whole batch's update rows while the state
    # itself provably carried — the sink is test scaffolding, and
    # foreachBatch collection cannot drop a committed batch
    def _drain_rows(df, cp):
        rows = []

        def _sink(batch_df, _epoch):
            rows.extend(batch_df.collect())

        q = (
            df.writeStream.foreachBatch(_sink)
            .outputMode("update")
            .option("checkpointLocation", str(cp))
            .trigger(availableNow=True)
            .start()
        )
        # assert the DRAIN COMPLETED: on a loaded host a slow batch past
        # the timeout used to return partial rows and fail the VALUE
        # asserts with a misleading message (r09 one-off flake)
        finished = q.awaitTermination(300)
        assert finished, "availableNow drain timed out — host overloaded"
        # per-batch state-store census (r11 verdict item 1a): the r11
        # flake showed a key's state reading back EMPTY one batch later;
        # the store row counts across batches distinguish version loss
        # in the store (numRowsTotal drops) from a write that never
        # landed (numRowsUpdated short) — ride every assert message
        store = [
            {
                "batch": p["batchId"],
                **{
                    k: so.get(k)
                    for so in p.get("stateOperators", [])
                    for k in (
                        "numRowsTotal",
                        "numRowsUpdated",
                        "numRowsRemoved",
                        "numShufflePartitions",
                    )
                },
            }
            for p in q.recentProgress
        ]
        return rows, store

    # update mode re-emits per batch — identify each key's LATEST
    # emission by its monotonically-growing n_suppressed
    emitted, store = _drain_rows(
        dedup_first_seen(_stream()), tmp_path / "cp_mb"
    )
    got = {}
    for r in emitted:
        cur = got.get(r.user_id)
        if cur is None or r.n_suppressed > cur[1]:
            got[r.user_id] = (r.first_ts, r.n_suppressed)
    # raw emissions + per-batch store counts ride the assert message:
    # the r11 flake finally showed the mechanism class — a key's state
    # read back EMPTY one batch later (duplicate "first" emission with
    # n_suppressed reset to 0) while a sibling key's state carried.
    # Sink loss and timeout misfire are excluded (r11 verdict item 1);
    # the store census now distinguishes store version loss
    # (numRowsTotal drops between batches) from a write that never
    # landed (numRowsUpdated short in the earlier batch)
    assert got.get(1) == (t0, 2), (emitted, store)  # min in b2; NaT ok
    assert got.get(2) == (t0 + dt.timedelta(minutes=1), 1), (
        emitted, store,
    )

    emitted, store = _drain_rows(
        running_counter(_stream()), tmp_path / "cp_cmb"
    )
    got = {}
    for r in emitted:
        cur = got.get(r.event_type)
        if cur is None or r.n_events > cur[0]:
            got[r.event_type] = (r.n_events, r.total_cents)
    # 5 rows total; the NULL value drops out of the cents sum only
    assert got.get("view") == (5, 4200), (emitted, store)


@_pytest.mark.deep
def test_stateful_soak_no_state_loss_200_keys_8_batches(spark, tmp_path):
    """SOAK pin for the r11 state-loss flake (verdict item 1 'weak'
    grade): 200 keys x 8 single-file micro-batches, every key in every
    batch, under the session-pinned RocksDB provider. The r11 mechanism
    was a key's state reading back EMPTY one batch later (n_suppressed
    reset to 0, duplicate 'first' emission); here EVERY key asserts the
    full monotone carry — its n_suppressed sequence in batch order must
    be exactly 0..7 — so a single lost version anywhere in 1600
    key-batch state reads fails loudly with the store census attached.
    Half the keys get DESCENDING event times (the running min must
    update every batch), half ascending (the min must never move)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    n_keys, n_batches = 200, 8
    t0 = dt.datetime(2024, 1, 1)
    d = tmp_path / "soak_src"
    d.mkdir()
    for b in range(n_batches):
        rows = []
        for k in range(n_keys):
            # even keys ascend (min fixed in batch 0); odd keys descend
            # (min moves EVERY batch — 8 state rewrites per key)
            mins = b if k % 2 == 0 else (2 * n_batches - b)
            rows.append((b * n_keys + k, t0 + dt.timedelta(minutes=mins), k))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [r[1] for r in rows], pa.timestamp("us")
                    ),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                }
            ),
            d / f"b{b}.parquet",
        )
        # the file source orders by modification time; all 8 writes land
        # in the same mtime second, so stamp ascending mtimes to make
        # the micro-batch order (and the per-key trajectories asserted
        # below) deterministic
        import os as _os

        _os.utime(d / f"b{b}.parquet", (1_700_000_000 + b, 1_700_000_000 + b))

    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )

    per_epoch: list[list] = []
    store = []

    def _sink(batch_df, epoch):
        per_epoch.append([(epoch, r) for r in batch_df.collect()])

    q = (
        dedup_first_seen(stream, watermark="30 days")
        .writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp_soak"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "soak drain timed out"
    store = [
        {
            "batch": p["batchId"],
            **{
                k: so.get(k)
                for so in p.get("stateOperators", [])
                for k in ("numRowsTotal", "numRowsUpdated", "numRowsRemoved")
            },
        }
        for p in q.recentProgress
    ]

    seqs: dict[int, list[tuple[int, int, object]]] = {}
    for batch_rows in per_epoch:
        for epoch, r in batch_rows:
            seqs.setdefault(r.user_id, []).append(
                (epoch, r.n_suppressed, r.first_ts)
            )
    assert len(seqs) == n_keys, (sorted(seqs)[:10], store)
    bad = {}
    for k, seq in seqs.items():
        seq.sort()
        sup = [s for _, s, _ in seq]
        if sup != list(range(n_batches)):
            bad[k] = seq
            continue
        firsts = [f for _, _, f in seq]
        want = (
            [t0] * n_batches
            if k % 2 == 0
            else [
                t0 + dt.timedelta(minutes=2 * n_batches - b)
                for b in range(n_batches)
            ]
        )
        if firsts != want:
            bad[k] = seq
    assert not bad, (dict(list(bad.items())[:3]), store)
    # store census: the row count must build to n_keys and NEVER drop —
    # a drop is exactly the version loss the r11 flake evidenced
    totals = [s.get("numRowsTotal") for s in store if s.get("numRowsTotal") is not None]
    assert totals and totals[-1] == n_keys, store
    assert all(a <= b for a, b in zip(totals, totals[1:])), store


def test_ttl_horizon_bounds():
    """Unit pin for _ttl_horizon_ms: horizon always lands in
    [wm + ttl, wm + 2*ttl] once a real watermark exists, the first batch
    (wm == 0) keeps the uncapped event-time anchor, and a NULL-only
    batch anchors at the watermark."""
    from bytewax_iceberg_connector_spark.streaming.stateful import (
        _ttl_horizon_ms,
    )

    ttl = 60_000
    wm = 1_700_000_000_000
    # normal data: event max inside the cap — pure event-time anchor
    assert _ttl_horizon_ms(wm, wm + 30_000, ttl) == wm + 30_000 + ttl
    # corrupt far-future event: capped at wm + 2*ttl, never chases it
    assert _ttl_horizon_ms(wm, 253_402_300_799_000, ttl) == wm + 2 * ttl
    # event max behind the watermark (all-late batch): anchor = wm
    assert _ttl_horizon_ms(wm, wm - 10_000, ttl) == wm + ttl
    # NULL-only batch: anchor = wm
    assert _ttl_horizon_ms(wm, None, ttl) == wm + ttl
    # first batch, wm == 0: uncapped event anchor (the r11 fix)
    assert _ttl_horizon_ms(0, 9_000_000, ttl) == 9_000_000 + ttl


@_pytest.mark.deep
def test_corrupt_far_future_event_is_quarantined_not_fatal(spark, tmp_path):
    """r12 review find, upgraded on investigation: a year-9999 event was
    not just a state-pinner — Spark's Arrow→pandas serializer casts
    timestamp[us] to ns, so the corrupt row CRASHED the whole stream at
    the applyInPandasWithState boundary, and had it survived it would
    have poisoned the global watermark (every later normal event
    silently dropped stream-wide). The operator now QUARANTINES rows
    outside the pandas-ns-representable range before the watermark:
    the stream completes, the corrupt row is not counted, the sibling
    key's flow and the watermark are undisturbed."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1)
    corrupt = dt.datetime(9999, 12, 31)
    ancient = dt.datetime(1400, 1, 1)  # pre-1677: underflows ns too
    batches = [
        [(0, t0, 1), (1, t0, 2)],
        [(2, corrupt, 1), (3, t0 + dt.timedelta(minutes=1), 2)],
        [(4, ancient, 1), (5, t0 + dt.timedelta(minutes=2), 2)],
    ]
    d = tmp_path / "corrupt_src"
    d.mkdir()
    for i, rows in enumerate(batches):
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                }
            ),
            d / f"b{i}.parquet",
        )

    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )

    rows = []

    def _sink(batch_df, epoch):
        rows.extend((epoch, r) for r in batch_df.collect())

    q = (
        dedup_first_seen(stream, watermark="1 minute")
        .writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp_corrupt"))
        .trigger(availableNow=True)
        .start()
    )
    # the stream must COMPLETE — pre-fix the corrupt row killed it with
    # ArrowInvalid: casting timestamp[us] to [ns] out of bounds
    assert q.awaitTermination(300), "drain timed out"
    store = [
        {
            "batch": p["batchId"],
            **{
                k: so.get(k)
                for so in p.get("stateOperators", [])
                for k in ("numRowsTotal", "numRowsUpdated", "numRowsRemoved")
            },
        }
        for p in q.recentProgress
    ]
    k1 = sorted((e, r.first_ts, r.n_suppressed) for e, r in rows
                if r.user_id == 1)
    k2 = sorted((e, r.first_ts, r.n_suppressed) for e, r in rows
                if r.user_id == 2)
    # key 1: ONLY its clean batch-1 emission — both corrupt rows are
    # quarantined, never counted, never emitted, never duplicate-first
    assert [(ts, n) for _, ts, n in k1] == [(t0, 0)], (k1, store)
    # key 2's flow is untouched: the watermark was never poisoned, so
    # its batch-3 event is NOT late and n_suppressed reaches 2
    assert [(ts, n) for _, ts, n in k2] == [
        (t0, 0), (t0, 1), (t0, 2)
    ], (k2, store)
    # both keys' state alive at the end (no corrupt watermark jump)
    totals = [s["numRowsTotal"] for s in store
              if s.get("numRowsTotal") is not None]
    assert totals and totals[-1] == 2, store
