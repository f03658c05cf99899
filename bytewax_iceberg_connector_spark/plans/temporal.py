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

QUERIES = {
    "asof_join_events": asof_join_events,
    "asof_join_forward": asof_join_forward,
    "range_join_bands": range_join_bands,
}

ORACLE = {
    "asof_join_events": _SQL_ASOF,
    "asof_join_forward": _SQL_ASOF_FWD,
    "range_join_bands": _SQL_RANGE,
}
