"""Behavioral / product-analytics queries over the events stream: ordered
funnel conversion and cohort retention. These are the classic event-log
analyses every OLAP engine ships (reference scope: the north star's "query
battery over an event stream"; the reference itself only lands events into
the lake — connector.py:245 — so the analysis layer is the Spark-native
value-add).

Both queries are oracle-checked with integer-exact outputs (counts and a
single IEEE division for the conversion ratio — the repo's standard parity
discipline, functions/numeric.py).

Scale design, shared by both: ONE hash exchange on ``user_id`` feeds every
per-user window (stacked unbounded-partition windows reuse the same
Exchange — Catalyst plans a single shuffle followed by window operators on
the same distribution), then a tiny aggregate. No self-joins, no
per-stage re-scans of the fact table: at 100 TB the fact table is read
once, shuffled once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# Ordered funnel: signup → view → click → purchase
# ---------------------------------------------------------------------------

_STAGES = ("signup", "view", "click", "purchase")


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 4-stage funnel: a user converts stage k only with
    an event of stage k's type at a time strictly after their stage-(k-1)
    conversion time (first-touch semantics: earliest qualifying event).

    Implementation: stage-k first-touch time is a per-user window min over
    ``CASE WHEN type = stage_k AND ts > stage_{k-1} THEN ts END``. The four
    windows share one partitioning (``user_id``, whole-partition frame), so
    Spark plans ONE Exchange + four Window operators — the sequential
    dependency between stages costs no extra shuffle. A per-user aggregate
    collapses to one row per user, then a global aggregate emits the
    funnel. Scale: shuffle width is (user_id, ts, event_type) — three
    narrow columns; both aggregates are partial-agg friendly.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    df = ev
    prev = None
    for i, stage in enumerate(_STAGES, start=1):
        cond = F.col("event_type") == stage
        if prev is not None:
            cond = cond & (F.col("ts") > F.col(prev))
        df = df.withColumn(f"s{i}", F.min(F.when(cond, F.col("ts"))).over(w))
        prev = f"s{i}"
    per_user = df.groupBy("user_id").agg(
        *[F.max(f"s{i}").alias(f"s{i}") for i in range(1, 5)]
    )
    return per_user.agg(
        F.count("s1").alias("n_signup"),
        F.count("s2").alias("n_view"),
        F.count("s3").alias("n_click"),
        F.count("s4").alias("n_purchase"),
        F.round(F.count("s4") * F.lit(1.0) / F.count("s1"), 6).alias("conversion"),
    )


_SQL_FUNNEL = """
WITH e AS (SELECT user_id, ts, event_type FROM events),
u1 AS (SELECT *, MIN(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS s1 FROM e),
u2 AS (SELECT *, MIN(CASE WHEN event_type = 'view' AND ts > s1 THEN ts END)
               OVER (PARTITION BY user_id) AS s2 FROM u1),
u3 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > s2 THEN ts END)
               OVER (PARTITION BY user_id) AS s3 FROM u2),
u4 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > s3 THEN ts END)
               OVER (PARTITION BY user_id) AS s4 FROM u3),
per_user AS (
  SELECT user_id, MAX(s1) AS s1, MAX(s2) AS s2, MAX(s3) AS s3, MAX(s4) AS s4
  FROM u4 GROUP BY user_id
)
SELECT CAST(COUNT(s1) AS BIGINT) AS n_signup,
       CAST(COUNT(s2) AS BIGINT) AS n_view,
       CAST(COUNT(s3) AS BIGINT) AS n_click,
       CAST(COUNT(s4) AS BIGINT) AS n_purchase,
       ROUND(COUNT(s4) * 1.0 / COUNT(s1), 6) AS conversion
FROM per_user
"""

# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-cohort retention triangle: users grouped by first-active day,
    distinct-active counts at day offsets 0..7.

    One window min (same single user_id Exchange as the funnel) derives the
    cohort day; the distinct aggregate shuffles (cohort, offset, user_id) —
    three small ints — after an early projection drops everything else.
    Scale: COUNT(DISTINCT user) per cell is the one inherently two-phase
    agg here; Spark plans it as expand + two-level hash agg with partial
    de-dup before the exchange, which is the right 100 TB plan (the
    alternative, approx HLL, is ``distinct_approx``'s territory).
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", F.to_date("ts").alias("d"))
    f = e.withColumn("cohort_day", F.min("d").over(Window.partitionBy("user_id")))
    off = F.datediff(F.col("d"), F.col("cohort_day"))
    return (
        f.where(off <= 7)
        .groupBy("cohort_day", off.cast("long").alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


_SQL_RETENTION = """
WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
f AS (SELECT user_id, d, MIN(d) OVER (PARTITION BY user_id) AS cohort_day FROM e)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, d) AS BIGINT) AS day_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM f
WHERE date_diff('day', cohort_day, d) <= 7
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES = {
    "event_funnel": event_funnel,
    "retention_cohorts": retention_cohorts,
}

ORACLE = {
    "event_funnel": _SQL_FUNNEL,
    "retention_cohorts": _SQL_RETENTION,
}


# ---------------------------------------------------------------------------
# Anomaly detection: deterministic z-score outliers per event_type
# ---------------------------------------------------------------------------


def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type outlier audit: count of |z| > 3 values and the
    maximum |z|, with mean/stddev derived from EXACT decimal sums
    (sum and sum-of-squares) so the statistics — and therefore every
    z-score — are bit-identical across partitionings and engines.
    Native STDDEV would accumulate doubles in nondeterministic order;
    here variance = (s2 - s1^2/n) / (n-1) is a fixed sequence of IEEE
    ops on exact operands (functions/numeric.py discipline).

    Scale: pass 1 aggregates 5 stat rows (map-side partial, one tiny
    shuffle); the stats then BROADCAST back onto the fact scan — the
    second pass is shuffle-free, so at 100 TB the cost is two scans of
    the value column (or one with the input cached), never a wide
    exchange. The classic two-pass parallel z-score plan.
    """
    from ..functions.numeric import dec

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("s1"),
        F.sum(dec("value") * dec("value")).cast("double").alias("s2"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("mean", F.col("s1") / F.col("n"))
        .withColumn(
            "std",
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - F.lit(1))
            ),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.abs(z) > 3, 1).otherwise(0)).cast("long").alias("n_outliers"),
            F.round(F.max(F.abs(z)), 6).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


_SQL_ANOMALY = """
WITH stats AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(18,2))
                  * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type
), scored AS (
  SELECT e.event_type,
         (e.value - s.s1 / s.n)
           / SQRT((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS z
  FROM events e JOIN stats s ON e.event_type = s.event_type
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN ABS(z) > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(MAX(ABS(z)), 6) AS max_abs_z
FROM scored
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["anomaly_zscore"] = anomaly_zscore
ORACLE["anomaly_zscore"] = _SQL_ANOMALY
