"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only state is its flush buffer (connector.py:337-350) —
replayed wholesale from checkpoint. Structured Streaming instead gives
KEYED state with watermark-driven expiry; this module implements the
custom stateful operators a training-data ingest pipeline needs that
aren't expressible as windowed aggregations.

Scale notes:
- State lives per key-group partition in the state store (RocksDB/HDFS
  backend on a cluster); a 100 TB/day stream MUST bound it — every
  operator here takes an event-time timeout so expired keys are dropped
  at the watermark instead of accreting forever.
- ``applyInPandasWithState`` ships each key group to Python as Arrow
  batches — the same Arrow-vectorized boundary as the rest of the engine's
  Python kernels (north star: never per-row Python).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

#: interval-unit → milliseconds, for parsing Spark duration strings
_UNIT_MS = {
    "millisecond": 1,
    "second": 1_000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
    "week": 604_800_000,
}


def duration_ms(spec: str) -> int:
    """Parse a Spark interval string ('2 hours', '30 minutes', '1 day')
    into milliseconds. The state-TTL horizon must track the caller's
    watermark — a hardcoded TTL would retain state longer (or shorter)
    than the declared lateness bound."""
    m = re.fullmatch(r"\s*(\d+)\s+([a-z]+?)s?\s*", spec.lower())
    if not m or m.group(2) not in _UNIT_MS:
        raise ValueError(f"unparseable duration: {spec!r}")
    return int(m.group(1)) * _UNIT_MS[m.group(2)]


#: event-time plausibility bounds = the pandas datetime64[ns] range. Rows
#: outside it are QUARANTINED (dropped) before the watermark, for three
#: reasons at once (r12 review find): (1) Spark's Arrow→pandas serializer
#: casts timestamp[us] to ns, so one year-9999 row CRASHES the stream at
#: the applyInPandasWithState boundary; (2) uncapped, such a row pinned
#: its key's state forever (see _ttl_horizon_ms); (3) worst of all, it
#: poisons the GLOBAL watermark — every subsequent normal-time event
#: becomes late and is silently dropped stream-wide. Same quarantine
#: pattern as load_vectors' invalid-embedding contract: validate at the
#: boundary, keep the kernel total.
_TS_QUARANTINE_LO = "1677-09-22 00:00:00"
_TS_QUARANTINE_HI = "2262-04-10 23:59:59"


def _quarantine_ts(events: DataFrame, ts_col: str) -> DataFrame:
    """Drop rows whose event time falls outside the representable pandas
    ns range (NULL event times pass through — they are counted but
    un-orderable, the pinned n_seen contract)."""
    c = F.col(ts_col)
    return events.where(
        c.isNull()
        | ((c >= F.lit(_TS_QUARANTINE_LO).cast("timestamp"))
           & (c <= F.lit(_TS_QUARANTINE_HI).cast("timestamp")))
    )


def _ttl_horizon_ms(wm_ms: int, batch_max_ms: int | None, ttl_ms: int) -> int:
    """Event-time TTL horizon for keyed state, bounded on both sides.

    Anchor = max(watermark, batch max event time) — the r11 fix: the
    FIRST batch (watermark still 0/epoch) must never set an
    epoch-anchored horizon already in the past of the very next
    watermark update. But the event-time anchor is CAPPED at
    watermark + ttl once a real watermark exists (r12 review find): an
    uncapped anchor let one corrupt far-future timestamp (year-9999
    sentinel) pin its key's state forever — the horizon chased the
    corrupt event time and no achievable watermark could pass it. With
    the cap the horizon is always inside [wm + ttl, wm + 2·ttl], so
    state lifetime is bounded by watermark progress no matter what the
    data says. Trade-off: a key whose event time jumps more than ttl
    ahead of the watermark in one batch can expire up to ttl early if
    it then goes silent — bounded state beats unbounded retention; the
    first batch (wm == 0) keeps the uncapped anchor by necessity and
    re-caps on the key's next activity."""
    anchor = wm_ms
    if batch_max_ms is not None:
        cap = wm_ms + ttl_ms if wm_ms > 0 else batch_max_ms
        anchor = max(anchor, min(batch_max_ms, cap))
    return anchor + ttl_ms


def dedup_first_seen(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: emit each key's FIRST event (by event time),
    suppress every later occurrence; state = one seen-marker per live key,
    expired at the watermark via EventTimeTimeout.

    Batch-mode equivalent (the oracle shape): groupBy(key).min(ts) — the
    operator emits exactly that row per key when each micro-batch arrives
    sorted or not (the kernel sorts its Arrow batch by event time).

    Contrast with ``dropDuplicates([key])`` on a stream: that built-in
    keeps arbitrary-first by arrival; this keeps min-event-time and
    surfaces the state-TTL contract explicitly.
    """
    # key dtype comes from the input schema (a hardcoded LongType would
    # break string/other key columns); TTL tracks the watermark parameter
    out_schema = StructType(
        [
            StructField(key_col, events.schema[key_col].dataType),
            StructField("first_ts", TimestampType()),
            StructField("n_suppressed", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("first_ts_us", LongType()),
            StructField("n_seen", LongType()),
        ]
    )
    ttl_ms = duration_ms(watermark)

    def _dedup(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return

        first_us, n_seen = state.get if state.exists else (None, 0)
        batch_max_us = None
        for pdf in pdf_iter:
            n_seen += len(pdf)
            # NULL event times are un-orderable: SQL min(ts) ignores them
            # (the declared batch twin), and NaT's int64 payload is the
            # min-int64 sentinel — without the dropna an adversarial NULL
            # ts silently corrupted first_ts to year 1677 (r06 find)
            valid = pdf[ts_col].dropna()
            if not len(valid):
                continue
            # normalize to ns first: pandas may hand datetime64[ns] or
            # [us]; _quarantine_ts bounds the values to the ns range
            ts_us = (
                valid.astype("datetime64[ns]").astype("int64") // 1000
            ).astype("int64")
            batch_min = int(ts_us.min())
            if first_us is None or batch_min < first_us:
                first_us = batch_min
            batch_max = int(ts_us.max())
            if batch_max_us is None or batch_max > batch_max_us:
                batch_max_us = batch_max
        state.update((first_us, n_seen))
        # watermark/event-time anchored + capped TTL horizon (see
        # _ttl_horizon_ms for the bounds and the corrupt-future rationale)
        state.setTimeoutTimestamp(
            _ttl_horizon_ms(
                state.getCurrentWatermarkMs(),
                None if batch_max_us is None else batch_max_us // 1000,
                ttl_ms,
            )
        )
        # first_ts rides an EXPLICIT datetime64[us] series: pandas-2
        # non-nano covers the full Spark timestamp range (year 9999),
        # where a ns-default construction overflows at year 2262
        fs = (
            pd.Series([first_us], dtype="int64").astype("datetime64[us]")
            if first_us is not None
            else pd.Series([pd.NaT], dtype="datetime64[us]")
        )
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "first_ts": fs,
                "n_suppressed": [n_seen - 1],
            }
        )

    src = _quarantine_ts(events, ts_col)
    src = src.withWatermark(ts_col, watermark) if events.isStreaming else src
    return (
        src.groupBy(key_col)
        .applyInPandasWithState(
            _dedup,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_counter(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-key running totals across micro-batches (count + exact-decimal
    sum carried as integer cents in state) — the streaming analogue of a
    groupBy().agg() whose state the caller wants to inspect/checkpoint
    explicitly. Mirrors the reference's enrich/metadata counters
    (operators.py:494-552) as keyed state instead of per-record maps."""
    out_schema = StructType(
        [
            StructField(key_col, events.schema[key_col].dataType),
            StructField("n_events", LongType()),
            StructField("total_cents", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )
    ttl_ms = duration_ms(watermark)

    def _acc(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return

        n, cents = state.get if state.exists else (0, 0)
        batch_max_us = None
        for pdf in pdf_iter:
            n += len(pdf)
            # decimal-exact in integer cents: float sum order never leaks.
            # NULL values drop out like SQL SUM (the batch twin) — the
            # astype(int64) on a NaN raised and killed the stream (r06)
            vals = pdf[value_col].dropna()
            cents += int((vals * 100).round().astype("int64").sum())
            ts_valid = pdf[ts_col].dropna()
            if len(ts_valid):
                mx = int(
                    ts_valid.astype("datetime64[ns]").astype("int64").max()
                    // 1000
                )
                if batch_max_us is None or mx > batch_max_us:
                    batch_max_us = mx
        state.update((n, cents))
        # watermark/event-time anchored + capped TTL horizon
        state.setTimeoutTimestamp(
            _ttl_horizon_ms(
                state.getCurrentWatermarkMs(),
                None if batch_max_us is None else batch_max_us // 1000,
                ttl_ms,
            )
        )
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total_cents": [cents]})

    src = _quarantine_ts(events, ts_col)
    src = src.withWatermark(ts_col, watermark) if events.isStreaming else src
    return src.groupBy(key_col).applyInPandasWithState(
        _acc,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
