"""Streaming-semantics queries in batch-replayable form (B21–B22).

Each runs the REAL streaming builders (streaming/windows.py) on the batch
frame — the expressions are mode-agnostic, so the oracle checks exactly the
computation the streaming query performs per micro-batch. The
streaming-mode execution path itself (readStream → trigger → sink) is
exercised in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import sql_dsum
from ..sources.tables import load_table
from ..streaming.windows import hopping_agg, session_windows_batch, tumbling_agg

# ---------------------------------------------------------------------------
# B21: tumbling event-time windows
# ---------------------------------------------------------------------------

def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling counts/sums per event_type (epoch-aligned windows ≡
    date_trunc('hour') in the batch oracle).

    NULL event-time contract (r06 adversarial find): a row with no ts is
    UN-WINDOWABLE — Spark's F.window drops it (real streaming semantics),
    so the batch oracles filter ts IS NOT NULL instead of minting a NULL
    bucket. Applies to tumbling/hopping/topk alike."""
    ev = load_table(spark, sf_dir, "events")
    return tumbling_agg(ev, "ts", "1 hour", ("event_type",)).orderBy(
        "window_start", "event_type"
    )


_SQL_TUMBLING = f"""
SELECT DATE_TRUNC('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
WHERE ts IS NOT NULL
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""

# ---------------------------------------------------------------------------
# B21a: hopping (sliding) event-time windows
# ---------------------------------------------------------------------------

def streaming_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every hour per event_type — each event counts
    in exactly two overlapping windows. Oracle: UNION ALL of the two
    epoch-aligned window starts per event (trunc(ts,1h) and -1h)."""
    ev = load_table(spark, sf_dir, "events")
    return hopping_agg(ev, "ts", "2 hours", "1 hour", ("event_type",)).orderBy(
        "window_start", "event_type"
    )


_SQL_HOPPING = f"""
WITH contrib AS (
  SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS window_start,
         event_type, value
  FROM events WHERE ts IS NOT NULL
  UNION ALL
  SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) - INTERVAL 1 HOUR,
         event_type, value
  FROM events WHERE ts IS NOT NULL
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM contrib
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""

# ---------------------------------------------------------------------------
# B22: session windows (lag+cumsum island form — oracle-able)
# ---------------------------------------------------------------------------

def streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap sessions: span + volume per session."""
    ev = load_table(spark, sf_dir, "events")
    sessions = session_windows_batch(ev, "ts", "user_id", gap_minutes=30)
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "session_idx")
    )


_SQL_SESSION = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                -- date_diff (second-boundary count) == the Spark side's
                -- truncated cast-to-long diff; fractional EPOCH() would
                -- split sessions on sub-second gap excess Spark ignores
                OR date_diff('second', LAG(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
), assigned AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM marked
)
SELECT user_id, session_idx,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM assigned
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""

# ---------------------------------------------------------------------------
# B21b: stream-stream interval join (click → purchase attribution)
# ---------------------------------------------------------------------------

def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks joined to same-user purchases within 30 minutes — the
    attribution-style stream-stream join; per click-hour pair counts and
    integer-exact total delay."""
    from ..streaming.windows import interval_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = interval_join(clicks, purchases, key="user_id", max_delay_minutes=30)
    delay_s = F.floor(
        (F.unix_micros(F.col("r_ts")) - F.unix_micros(F.col("l_ts"))) / 1_000_000
    ).cast("long")
    return (
        joined.groupBy(F.date_trunc("hour", "l_ts").alias("click_hour"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(delay_s).alias("total_delay_s"),
        )
        .orderBy("click_hour")
    )


_SQL_INTERVAL_JOIN = """
WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT c.user_id, c.ts AS cts, p.ts AS pts
  FROM c JOIN p ON c.user_id = p.user_id
   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
)
SELECT CAST(DATE_TRUNC('hour', cts) AS TIMESTAMP) AS click_hour,
       COUNT(*) AS n_pairs,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM((EPOCH_US(pts) - EPOCH_US(cts)) // 1000000) AS BIGINT)
         AS total_delay_s
FROM j
GROUP BY click_hour
ORDER BY click_hour
"""

# ---------------------------------------------------------------------------
# B21b: windowed top-k (trending items per window)
# ---------------------------------------------------------------------------


def streaming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per 6-hour tumbling window by count — the
    trending-items dashboard query. Batch-replayable form: the window
    aggregate is the mode-agnostic core (same epoch-aligned buckets the
    streaming path emits per micro-batch); the rank-and-keep runs over
    the AGGREGATED frame, so in streaming mode it lands downstream of
    the stateful window agg (complete/update output), never over raw
    events.

    Scale: one (window, type) aggregate with map-side partials — the
    ranked frame is windows×types sized, thousands of rows at any corpus
    scale; the top-k window costs nothing material there.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    agg = tumbling_agg(ev, "ts", "6 hours", ("event_type",))
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("window_start", "rank", "event_type", "n_events", "total_value")
        .orderBy("window_start", "rank")
    )


_SQL_TOPK = f"""
WITH agg AS (
  SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP)
           - INTERVAL (EXTRACT(HOUR FROM ts)::INT % 6) HOUR AS window_start,
         event_type,
         COUNT(*) AS n_events,
         {sql_dsum('value')} AS total_value
  FROM events
  WHERE ts IS NOT NULL
  GROUP BY 1, 2
)
SELECT window_start, rank, event_type, n_events, total_value FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY window_start
      ORDER BY n_events DESC, event_type ASC) AS BIGINT) AS rank
  FROM agg
) t WHERE rank <= 3
ORDER BY window_start, rank
"""


# ---------------------------------------------------------------------------
# B22a: streaming first-seen dedup (batch-replayable contract of the
# stateful operator)
# ---------------------------------------------------------------------------


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once first-seen dedup, batch-replayable form: per key the
    FIRST event time and the count of suppressed later occurrences — the
    precise output contract of the stateful streaming operator
    ``streaming/stateful.dedup_first_seen`` (applyInPandasWithState, one
    seen-marker per live key, watermark-TTL'd state). The streaming-mode
    execution path is exercised in tests/test_stateful.py; THIS entry
    puts the operator's declared batch equivalence (its docstring:
    groupBy(key).min(ts)) under the differential oracle, so the stateful
    kernel and the SQL semantics can never drift apart silently. One
    DELIBERATE carve-out (r12): the streaming operator quarantines rows
    whose event time falls outside the pandas-ns range (year 1677-2262)
    — such a row crashes the Arrow boundary and poisons the global
    watermark in streaming, where batch SQL is unaffected; see
    streaming/stateful._quarantine_ts.

    Scale: one narrow groupBy(key) with map-side partial min/count — the
    same state-per-key footprint the streaming operator carries, batch
    form; no window, no sort.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            (F.count("*") - 1).cast("long").alias("n_suppressed"),
        )
        .orderBy("user_id")
    )


_SQL_DEDUP_FIRST_SEEN = """
SELECT user_id,
       MIN(ts) AS first_ts,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_suppressed
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog→latest-state upsert view, batch-replayable form: each
    user's LATEST event (ts desc, event_id tiebreak) is their current
    state; rolled up per state type. This is exactly the table
    ``LakeSink.write_stream_merge`` (foreachBatch + MERGE, the Spark CDC
    idiom) materializes from the stream — the streaming execution path
    with replay-crash dedup is exercised in
    tests/test_streaming.py::test_stream_merge_builds_latest_state; THIS
    entry pins the declared upsert semantics under the oracle.

    Scale: one row_number window on a user_id hash exchange (state-sized,
    not changelog-sized, after the cut), then a 5-row rollup.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = (
        ev.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    return (
        latest.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.max("event_id").cast("long").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


_SQL_UPSERT = """
WITH latest AS (
  SELECT user_id, event_type, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MAX(event_id) AS BIGINT) AS max_event_id
FROM latest
WHERE rn = 1
GROUP BY event_type
ORDER BY event_type
"""


_LATE_DELAY_MIN = 30


def streaming_late_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data accounting, batch-replayable: replaying each
    event_type's stream in ARRIVAL order (event_id is the arrival
    sequence), an event is late iff it arrives after the stream's
    watermark — running max event time minus 30 min — has passed its own
    timestamp; exactly the rows `withWatermark('ts', '30 minutes')`
    drops from a streaming aggregate. Per-type: late count, late ppm
    (bigint division), and the worst lateness in seconds — the numbers
    that justify a watermark setting before deploying the streaming job.

    Scale: one hash exchange on event_type feeds the running-max window
    (arrival order within the partition); the rollup rides the same
    distribution. A GLOBAL watermark would need a single-partition
    running max — per-key watermark is the scale-correct form (and how
    multi-source streams track watermarks per partition anyway).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    marked = ev.select(
        "event_type",
        "ts",
        F.max("ts").over(w).alias("high_water"),
    ).withColumn(
        "late_sec",
        (
            F.unix_timestamp("high_water")
            - F.lit(_LATE_DELAY_MIN * 60)
            - F.unix_timestamp("ts")
        ),
    )
    return (
        marked.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            # coalesce: a singleton type has ONLY the NULL-high_water row,
            # and sum over all-NULL is NULL while the oracle's CASE sums 0
            F.coalesce(F.sum((F.col("late_sec") > 0).cast("long")), F.lit(0))
            .cast("long")
            .alias("n_late"),
            F.expr(
                "cast(coalesce(sum(cast(late_sec > 0 as long)), 0) * 1000000"
                "     div count(*) as long)"
            ).alias("late_ppm"),
            F.coalesce(
                F.max(F.when(F.col("late_sec") > 0, F.col("late_sec"))),
                F.lit(0),
            )
            .cast("long")
            .alias("max_late_sec"),
        )
        .orderBy("event_type")
    )


_SQL_LATE = f"""
WITH marked AS (
  SELECT event_type, ts,
         MAX(ts) OVER (PARTITION BY event_type ORDER BY event_id NULLS FIRST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS high_water
  FROM events
), scored AS (
  SELECT event_type,
         date_diff('second', ts, high_water) - {_LATE_DELAY_MIN * 60}
           AS late_sec
  FROM marked
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN late_sec > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(SUM(CASE WHEN late_sec > 0 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS late_ppm,
       CAST(COALESCE(MAX(CASE WHEN late_sec > 0 THEN late_sec END), 0)
            AS BIGINT) AS max_late_sec
FROM scored
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# B21g: stream-static dimension enrichment
# ---------------------------------------------------------------------------

def streaming_enrich_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly revenue per market segment from the event stream enriched
    with the STATIC customer dimension — the canonical stream-static
    join (no state, no watermark on the dim side: Spark re-reads the
    lookup table per micro-batch, exactly the slowly-changing-dimension
    contract). Mode-agnostic expressions: this batch replay IS the
    per-micro-batch computation, and the streaming execution path of the
    same join shape is exercised in
    tests/test_streaming.py::test_stream_static_join_matches_batch.

    Semantics: LEFT join — stream rows whose user has no dimension row
    survive as segment 'unknown' (dropping facts on a dim miss is how
    enrichment silently loses data; the A13 enrich stage keeps them).

    Scale: the dimension prunes to two columns and BROADCASTS under the
    stream-static contract (the stream side can never be the build
    side); one tumbling aggregate per (window, segment) on top — the
    same single-exchange shape as streaming_tumbling.
    """
    ev = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = ev.join(F.broadcast(dim), "user_id", "left").withColumn(
        "segment", F.coalesce("c_mktsegment", F.lit("unknown"))
    )
    return tumbling_agg(enriched, "ts", "1 hour", ("segment",)).orderBy(
        "window_start", "segment"
    )


_SQL_ENRICH_DIM = f"""
SELECT DATE_TRUNC('hour', ts) AS window_start,
       COALESCE(c_mktsegment, 'unknown') AS segment,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
LEFT JOIN customer ON c_custkey = user_id
GROUP BY window_start, segment
ORDER BY window_start, segment
"""


# ---------------------------------------------------------------------------
# B21c: watermark-scoped streaming dedup (dropDuplicatesWithinWatermark)
# ---------------------------------------------------------------------------

_DDW_DELTA_US = 7_200 * 1_000_000  # 2-hour dedup window, integer µs


def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-SCOPED dedup, batch-replayable form — the state-TTL'd
    twin of ``streaming_dedup``: ``dropDuplicatesWithinWatermark(key)``
    suppresses a duplicate only while the key's state is alive (first
    kept occurrence + delta); once the watermark expires the state, the
    next occurrence is EMITTED AGAIN. Batch contract = the event-time-
    ordered greedy replay: per key, keep a row iff it is the first or
    its gap from the LAST KEPT row is ≥ delta. This is a genuinely
    sequential recurrence (the chain resets on every keep — no window
    function expresses gap-from-last-kept), so it runs as the
    ``cusum_drift``-class kernel: one hash shuffle on the key, sort
    within partitions, one Arrow-batched ``mapInPandas`` scan carrying
    two scalars of state across batches. The streaming-mode execution of
    the built-in is exercised in tests/test_streaming.py::
    test_drop_duplicates_within_watermark; THIS entry puts the batch
    equivalence under the differential oracle (recursive-CTE replay).

    Input construction (both engines, integer µs): each event appears 3×
    — at ts, at ts + (id%150 + 1) min (sometimes inside the 2 h window,
    sometimes out), and at ts + (180 + id%120) min (beyond the window
    from BASE, but possibly within it from a kept first echo — the case
    that forces the recurrence). Output: per event_type, kept/suppressed
    counts and an id-checksum over kept rows.

    Scale: the shuffle moves 3n skinny rows (key, type, µs ≈ 24 bytes);
    kernel state is O(1) per partition; at 100 TB this is one narrow
    exchange + a linear scan — the same footprint the streaming operator
    carries as its state store.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_id").isNotNull() & F.col("ts").isNotNull()
    )
    base = ev.select(
        "event_id", "event_type", F.unix_micros("ts").alias("tsu")
    )
    dup = (
        base.unionByName(
            base.select(
                "event_id",
                "event_type",
                (
                    F.col("tsu")
                    + (F.pmod(F.col("event_id"), 150) + 1) * F.lit(60_000_000)
                ).alias("tsu"),
            )
        ).unionByName(
            base.select(
                "event_id",
                "event_type",
                (
                    F.col("tsu")
                    + (F.pmod(F.col("event_id"), 120) + 180) * F.lit(60_000_000)
                ).alias("tsu"),
            )
        )
    )

    def _greedy(batches):
        """Per-key greedy keep-chain over (event_id, tsu)-sorted rows;
        state (last key, last kept µs) carries across Arrow batches
        within the partition."""
        import pandas as pd

        last_key = None
        last_kept = 0
        for pdf in batches:
            keys = pdf["event_id"].to_numpy()
            tss = pdf["tsu"].to_numpy()
            kept = [0] * len(pdf)
            for i in range(len(pdf)):
                k = keys[i]
                t = tss[i]
                if k != last_key:
                    last_key = k
                    last_kept = t
                    kept[i] = 1
                elif t - last_kept >= _DDW_DELTA_US:
                    last_kept = t
                    kept[i] = 1
            yield pd.DataFrame(
                {
                    "event_type": pdf["event_type"],
                    "kept": pd.Series(kept, dtype="int64"),
                    # numpy % is FLOOR-mod: non-negative for positive
                    # modulus even on negative ids — the oracle restates
                    # it as ((id % 1000) + 1000) % 1000 (DuckDB % truncs)
                    "idmod": (pdf["event_id"] % 1000).astype("int64"),
                }
            )

    scanned = (
        dup.repartition("event_id")
        .sortWithinPartitions("event_id", "tsu")
        .mapInPandas(_greedy, "event_type string, kept long, idmod long")
    )
    return (
        scanned.groupBy("event_type")
        .agg(
            F.sum("kept").cast("long").alias("n_kept"),
            (F.count("*") - F.sum("kept")).cast("long").alias("n_suppressed"),
            F.sum(F.col("kept") * F.col("idmod"))
            .cast("long")
            .alias("kept_id_checksum"),
        )
        .orderBy("event_type")
    )


_SQL_DEDUP_WATERMARK = f"""
WITH RECURSIVE dup AS MATERIALIZED (
  SELECT event_id, event_type, epoch_us(ts) AS tsu
  FROM events WHERE event_id IS NOT NULL AND ts IS NOT NULL
  UNION ALL
  SELECT event_id, event_type,
         epoch_us(ts) + ((((event_id % 150) + 150) % 150) + 1) * 60000000
  FROM events WHERE event_id IS NOT NULL AND ts IS NOT NULL
  UNION ALL
  SELECT event_id, event_type,
         epoch_us(ts) + ((((event_id % 120) + 120) % 120) + 180) * 60000000
  FROM events WHERE event_id IS NOT NULL AND ts IS NOT NULL
), seq AS MATERIALIZED (
  SELECT event_id, event_type, tsu,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY tsu)
              AS BIGINT) AS rn
  FROM dup
), walk AS (
  SELECT event_id, event_type, tsu, rn, TRUE AS kept, tsu AS last_kept
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.event_id, s.event_type, s.tsu, s.rn,
         s.tsu - w.last_kept >= {_DDW_DELTA_US},
         CASE WHEN s.tsu - w.last_kept >= {_DDW_DELTA_US}
              THEN s.tsu ELSE w.last_kept END
  FROM walk w JOIN seq s ON s.event_id = w.event_id AND s.rn = w.rn + 1
)
SELECT event_type,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
         AS n_suppressed,
       CAST(SUM(CASE WHEN kept
                THEN ((event_id % 1000) + 1000) % 1000 ELSE 0 END)
            AS BIGINT) AS kept_id_checksum
FROM walk
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "streaming_tumbling": streaming_tumbling,
    "streaming_upsert": streaming_upsert,
    "streaming_late_events": streaming_late_events,
    "streaming_hopping": streaming_hopping,
    "streaming_session": streaming_session,
    "streaming_interval_join": streaming_interval_join,
    "streaming_topk": streaming_topk,
    "streaming_dedup": streaming_dedup,
    "streaming_dedup_watermark": streaming_dedup_watermark,
    "streaming_enrich_dim": streaming_enrich_dim,
}

ORACLE = {
    "streaming_tumbling": _SQL_TUMBLING,
    "streaming_upsert": _SQL_UPSERT,
    "streaming_late_events": _SQL_LATE,
    "streaming_hopping": _SQL_HOPPING,
    "streaming_session": _SQL_SESSION,
    "streaming_interval_join": _SQL_INTERVAL_JOIN,
    "streaming_topk": _SQL_TOPK,
    "streaming_dedup": _SQL_DEDUP_FIRST_SEEN,
    "streaming_dedup_watermark": _SQL_DEDUP_WATERMARK,
    "streaming_enrich_dim": _SQL_ENRICH_DIM,
}
