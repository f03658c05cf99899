"""Temporal & range-join queries (custom-operator showcase, north star:
"as-of join, range join" as compositions of built-in DataFrame ops).

Both queries are DuckDB-oracle-checked: ASOF JOIN is native DuckDB syntax;
the range join replays as an inequality join on a VALUES list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec, dsum, sql_dsum
from ..operators.asof import asof_join
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# as-of join: each purchase ↦ the user's most recent prior click
# ---------------------------------------------------------------------------

def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward-inclusive as-of self-join on events: for every purchase,
    the same user's latest click at-or-before the purchase time, plus the
    gap in seconds (null-safe long).

    Plan shape: single hash shuffle on user_id + one running-last window —
    no range-candidate blow-up (see operators/asof.py).
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        ts_col="ts",
        value_cols=("value",),
        suffix="_click",
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_click").alias("last_click_ts"),
        F.col("value_click").alias("last_click_value"),
        # integer micros → floor-divide: exact, engine-neutral (timestamp→
        # long casts truncate in Spark but EPOCH()::BIGINT rounds in DuckDB)
        F.expr("(unix_micros(ts) - unix_micros(ts_click)) div 1000000")
        .alias("gap_seconds"),
    )


_SQL_ASOF = """
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'click'
  ) WHERE rn = 1
)
SELECT p.event_id, p.user_id, p.ts,
       c.ts AS last_click_ts,
       c.value AS last_click_value,
       (EPOCH_US(p.ts) - EPOCH_US(c.ts)) // 1000000 AS gap_seconds
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""

def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every purchase, the same user's NEXT click at or
    after the purchase (conversion-lag analysis) — same one-shuffle window
    plan as the backward form, ordered descending."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        ts_col="ts",
        value_cols=("value",),
        suffix="_click",
        tiebreak="event_id",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_click").alias("next_click_ts"),
        F.col("value_click").alias("next_click_value"),
        F.expr("(unix_micros(ts_click) - unix_micros(ts)) div 1000000")
        .alias("wait_seconds"),
    )


_SQL_ASOF_FWD = """
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'click'
  ) WHERE rn = 1
)
SELECT p.event_id, p.user_id, p.ts,
       c.ts AS next_click_ts,
       c.value AS next_click_value,
       (EPOCH_US(c.ts) - EPOCH_US(p.ts)) // 1000000 AS wait_seconds
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
"""

# ---------------------------------------------------------------------------
# range join: lineitem quantities vs a banded dimension
# ---------------------------------------------------------------------------

_BANDS = (
    ("tiny", 0, 10),
    ("small", 10, 20),
    ("medium", 20, 35),
    ("large", 35, 51),
)


def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality (range) join: every lineitem lands in its quantity band
    [lo, hi); revenue and counts per band.

    The band table is tiny and explicitly broadcast, so the range predicate
    evaluates as a broadcast nested-loop join — each task streams its
    lineitem partition against 4 in-memory rows; no shuffle, no cartesian
    materialization. This is the only plan shape where a nested-loop join
    is the RIGHT answer at 100 TB (|bands| is O(1)); a big-big range join
    would instead bucketize both sides to equi-join on overlapping buckets.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice", "l_discount")
    bands = spark.createDataFrame(list(_BANDS), "band STRING, lo INT, hi INT")
    joined = li.join(
        F.broadcast(bands),
        (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            # exact-decimal product & sum (functions/numeric.py): double
            # products round half-differently across engines
            dsum(dec("l_extendedprice") * (1 - dec("l_discount")), 4).alias("revenue"),
        )
        .orderBy("band")
    )


_SQL_RANGE = f"""
WITH bands(band, lo, hi) AS (
  VALUES ('tiny', 0, 10), ('small', 10, 20), ('medium', 20, 35), ('large', 35, 51)
)
SELECT band,
       COUNT(*) AS n_items,
       {sql_dsum('(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))))', 4)} AS revenue
FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
GROUP BY band
ORDER BY band
"""

# ---------------------------------------------------------------------------
# Gap-filled hourly series with last-observation-carried-forward
# ---------------------------------------------------------------------------


def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style ``time_bucket_gapfill`` + ``locf``: a dense hourly
    grid per user over that user's observed span, empty hours filled with
    zero counts and the last seen hourly value carried forward.

    Per-user spans come from the hourly aggregate (tiny), the dense grid
    is ``sequence(lo, hi, 1 hour)`` exploded — generated, never stored —
    and LOCF is one running ``last(ignorenulls)`` window. Scale: the
    aggregate is word-count-shaped; the grid join and the LOCF window both
    hash on user_id, so AQE coalesces them onto one exchange lineage; grid
    size is bounded by span x users, not by raw event volume — at 100 TB
    of events the dense grid is still only users x hours rows.

    Restricted to user_id < 10 to keep the driver-side correctness
    comparison bounded; the plan shape is user-count-invariant.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 10)
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("hour_value"))
    )
    span = hourly.groupBy("user_id").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h"),
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "h",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("hour_value", ignorenulls=True).over(w).alias("value_locf"),
    ).orderBy("user_id", "h")


_SQL_GAPFILL = f"""
WITH ev AS (SELECT user_id, ts, value FROM events WHERE user_id < 10),
hourly AS (
  SELECT user_id, CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS h,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         {sql_dsum('value')} AS hour_value
  FROM ev GROUP BY 1, 2
),
span AS (SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM span
)
SELECT g.user_id, g.h,
       COALESCE(n_events, 0) AS n_events,
       LAST_VALUE(hour_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
FROM grid g LEFT JOIN hourly USING (user_id, h)
ORDER BY user_id, h
"""

# ---------------------------------------------------------------------------
# SCD Type-2 dimension history (gaps-and-islands run collapse)
# ---------------------------------------------------------------------------


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 build: each user's event_type
    stream becomes a versioned history — consecutive runs of the same
    state collapse to one interval with ``valid_from``/``valid_to``
    (NULL = current), the table shape every warehouse dimension load
    produces (Kimball SCD2; the lake layer's MERGE is the other half).
    Rolled up per state so the result is bounded: interval count, closed
    count, and total closed duration in exact integer seconds.

    Gaps-and-islands: a lag-change flag and its running sum assign run
    ids; ``valid_to`` is the lead of the next run's start. Every window
    is partitioned by ``user_id`` and ordered by (ts, event_id) — the
    event_id tiebreak makes run assignment total-order deterministic.

    Scale: ONE hash exchange on user_id feeds the lag window, the
    run-group aggregate, and the lead window (Catalyst reuses the same
    distribution); the final state rollup is a 5-row aggregate with
    map-side partials. No self-joins, no global sort.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(wo).isNull()
            | (F.lag("event_type").over(wo) != F.col("event_type")),
            1,
        ).otherwise(0),
    ).withColumn(
        "run_id",
        F.sum("chg").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = flagged.groupBy("user_id", "run_id").agg(
        F.first("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
    )
    # run_id tiebreak: two runs of a user CAN share a valid_from (two
    # state changes at the same timestamp); run_id is the total order
    wr = Window.partitionBy("user_id").orderBy("valid_from", "run_id")
    hist = runs.withColumn("valid_to", F.lead("valid_from").over(wr))
    return (
        hist.groupBy("state")
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            F.sum(F.col("valid_to").isNotNull().cast("long"))
            .cast("long")
            .alias("n_closed"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("valid_to").isNotNull(),
                        F.unix_timestamp("valid_to")
                        - F.unix_timestamp("valid_from"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("closed_sec"),
        )
        .orderBy("state")
    )


_SQL_SCD2 = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(event_type) OVER w IS NULL
                OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs0 AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS run_id
  FROM flagged
), runs AS (
  SELECT user_id, run_id, MIN(event_type) AS state, MIN(ts) AS valid_from
  FROM runs0 GROUP BY 1, 2
), hist AS (
  SELECT *, LEAD(valid_from) OVER (PARTITION BY user_id
                                   ORDER BY valid_from, run_id) AS valid_to
  FROM runs
)
SELECT state,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_closed,
       CAST(COALESCE(SUM(CASE WHEN valid_to IS NOT NULL
                              THEN date_diff('second', valid_from, valid_to)
                         END), 0) AS BIGINT) AS closed_sec
FROM hist
GROUP BY state
ORDER BY state
"""

# ---------------------------------------------------------------------------

QUERIES = {
    "asof_join_events": asof_join_events,
    "asof_join_forward": asof_join_forward,
    "range_join_bands": range_join_bands,
    "gapfill_locf": gapfill_locf,
    "scd2_history": scd2_history,
}

ORACLE = {
    "asof_join_events": _SQL_ASOF,
    "asof_join_forward": _SQL_ASOF_FWD,
    "range_join_bands": _SQL_RANGE,
    "gapfill_locf": _SQL_GAPFILL,
    "scd2_history": _SQL_SCD2,
}
