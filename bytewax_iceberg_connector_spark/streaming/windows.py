"""Event-time windowing — the streaming capability the reference lacks.

The reference uses time only as a flush cadence (connector.py:178-191);
Structured Streaming gives true event-time semantics: watermarks bound state,
tumbling/session windows aggregate late-arriving data correctly. These
builders return DataFrames that work in BOTH batch and streaming mode (the
same expressions; watermark is a no-op on batch frames), which is what makes
the oracle comparison possible — the driver checks the batch replay.

Scale: windowed aggregation state is partitioned by (window, keys); the
watermark is what keeps state bounded — without it a 100 TB/day stream
accretes state forever. Session windows merge per key; skewed users are the
risk — cap session length upstream if a key can be hot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dsum


def with_watermark_if_streaming(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Watermark on streaming frames; identity on batch (batch replay path)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per key — batch- and stream-compatible.

    Epoch-aligned windows: for whole-unit durations the window start equals
    date_trunc of that unit, which is exactly the oracle's batch form.
    """
    src = with_watermark_if_streaming(df, ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def hopping_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "2 hours",
    slide: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Hopping (sliding) window counts/sums — batch- and stream-compatible.

    Each event belongs to duration/slide overlapping windows (here 2);
    ``F.window`` generates that per-row window list and Catalyst explodes
    it BEFORE the partial aggregate, so the shuffle still carries one row
    per (window, key) group, not per event — the overlap factor inflates
    the map-side input, never the exchange. Epoch-aligned starts make the
    batch oracle exact: the windows containing ts start at
    trunc(ts, slide) - k*slide for k in 0..dur/slide-1.
    """
    src = with_watermark_if_streaming(df, ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window, slide).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def session_windows_batch(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap_minutes: int = 30,
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """Session assignment via the lag+cumsum island formulation (batch form).

    Deterministic and oracle-expressible (SURVEY.md §7 prefers this shape
    over session_window for verifiability): a session break is a gap >
    ``gap_minutes`` from the previous event of the same key; the running
    count of breaks is the session index. ``tiebreak`` makes same-``ts``
    events total-order deterministic (default fits the events schema;
    pass None for frames without such a column — like asof_join's
    explicit tiebreaks, the parameter is part of the semantic input).
    """
    from pyspark.sql import Window

    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", F.sum(is_new).over(run).cast("long"))


def session_agg_streaming(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """True streaming session windows (F.session_window) — the scale path;
    state merges sessions per key and the watermark closes them."""
    src = with_watermark_if_streaming(df, ts_col, watermark)
    return (
        src.groupBy(F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("w"), key)
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def read_events_stream(spark, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source streaming read of the events table (schema from the batch
    read; ns→us normalization identical to sources/tables.py).

    The ``maxFilesPerTrigger`` admission cap is the Spark analogue of the
    reference's batch_size flush bound (A4) — per-trigger volume control.
    """
    import os
    import tempfile

    src_file = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(src_file)
    # the file source requires a DIRECTORY (it watches for arriving files);
    # expose the single test file through a symlink dir — in production the
    # source would be a landing directory / Iceberg table already
    stream_dir = tempfile.mkdtemp(prefix="bic_stream_src_")
    link = os.path.join(stream_dir, "events-000.parquet")
    if not os.path.exists(link):
        os.symlink(src_file, link)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_delay_minutes: int = 30,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Event-time interval (stream-stream) join: each left row pairs with
    right rows of the same key whose timestamp falls in
    ``[l_ts, l_ts + max_delay_minutes]``.

    ``how="left_outer"`` keeps unmatched left rows (null right columns):
    in streaming mode Spark emits them only once the watermark proves no
    in-interval right row can still arrive — the time-bound condition is
    what makes outer results FINAL rather than retractable.

    Mode-agnostic like the other builders: on streaming inputs both sides
    get watermarks and the time-bound condition is exactly what Structured
    Streaming requires to bound join state (each side's buffer is evicted
    once the other side's watermark passes the interval); on batch frames
    the same condition is a plain range join, which is what the oracle
    replays.

    Returns left's columns (ts renamed ``l_ts``) + right's ts as ``r_ts``
    + right's remaining non-key columns. Callers pre-select to avoid name
    collisions.

    Scale: equi-key + time-band → ONE hash shuffle per side on the key;
    state per key is bounded by (watermark + interval) of rows. Skewed
    keys are the hazard, same mitigation as salted_join.
    """
    l = left.withColumnRenamed(ts_col, "l_ts")
    r = right.withColumnRenamed(ts_col, "r_ts")
    l = with_watermark_if_streaming(l, "l_ts", watermark)
    r = with_watermark_if_streaming(r, "r_ts", watermark)
    r_extra = [c for c in r.columns if c not in (key, "r_ts")]
    r = r.select(F.col(key).alias("_rk"), "r_ts", *r_extra)
    if how not in ("inner", "left_outer", "leftouter", "left"):
        raise ValueError(f"interval_join supports inner/left_outer, got {how!r}")
    cond = (
        (F.col(key) == F.col("_rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_delay_minutes} MINUTES"))
    )
    return l.join(r, on=cond, how=how).drop("_rk")
