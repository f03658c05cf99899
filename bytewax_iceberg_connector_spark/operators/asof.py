"""As-of (time-travel) join — a temporal operator the reference lacks and
Spark has no built-in for (SURVEY.md §2 Part B scope; custom operators are
"a composition of existing DataFrame ops" first, per the north star).

Semantics (backward, inclusive): for each left row, attach the single right
row with the same key and the greatest ``ts`` ≤ left.ts — DuckDB's
``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts``.

Implementation: NOT a range join. Both sides are tagged and unioned, then a
single running ``last(col, ignorenulls=True)`` window ordered by
``(ts, side)`` per key carries the most recent right-side values onto every
left row:

- one hash shuffle on the key (the same shuffle a plain equi-join would
  pay), zero candidate blow-up — a range-condition join would expand to
  |left|×|right-per-key| pairs before filtering;
- window state is O(1) per row (a running "last seen"), so it streams
  through Spark's window operator without spilling;
- at 100 TB this is shuffle-bound, exactly like the equivalent sort-merge
  equi-join; skewed keys behave like any skewed groupBy (salt upstream).

Right-side rows with duplicate (key, ts) are deduplicated deterministically
(greatest tiebreak column wins) so engine-vs-oracle comparison is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = (),
    suffix: str = "_right",
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join, inclusive: left enriched per ``on`` key with
    - ``direction="backward"`` (default): the most recent right row with
      right.ts ≤ left.ts — DuckDB ASOF JOIN / pandas merge_asof default;
    - ``direction="forward"``: the nearest upcoming right row with
      right.ts ≥ left.ts — pandas merge_asof(direction='forward').

    - ``direction="nearest"``: whichever of the two is closer in time
      (backward wins ties — pandas merge_asof(direction='nearest')).

    Forward reuses the identical one-shuffle running-last machinery with
    the window ordered ts-DESC: the last right row seen above a left row
    in descending order is exactly the smallest right.ts ≥ left.ts.

    ``tolerance_seconds`` (pandas ``tolerance``): a match farther than
    this from left.ts is dropped (null enrichment) — a post-window filter,
    no extra shuffle.

    Output: all left columns, plus ``{ts_col}{suffix}`` (matched right
    timestamp, null if none) and ``{c}{suffix}`` for each of value_cols.

    ``tiebreak`` costs NO extra shuffle: right rows sharing (key, ts) are
    ordered tiebreak-ASC inside the one window sort, so the running
    ``last`` naturally carries the greatest-tiebreak row — a separate
    dedup window would hash-partition a second time.

    All carried fields travel in ONE struct column under a single
    ``last(ignorenulls=True)`` — per-column ``last`` calls would stitch a
    frankenrow when the matched right row holds a NULL value column (the
    window would skip back to an older row's non-null value while ts_right
    came from the newer row). The struct is non-null iff the row is a
    right row, so every carried field comes from the same matched row —
    including its genuine NULLs — matching ASOF JOIN / DuckDB semantics.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    # NULL-timestamp contract (r09 family #13 sweep): a row without a
    # timestamp has NO position in time, so it can never be an as-of
    # MATCH — DuckDB's ASOF JOIN (l.ts >= r.ts is NULL) and pandas
    # merge_asof agree. Before this filter, Spark's NULLS FIRST window
    # order made a NULL-ts RIGHT row the running-last candidate for
    # every early left row (it attributed purchases in
    # event_attribution where the oracle never matched it), and a
    # NULL-ts LEFT row could match under direction="forward" (DESC
    # order puts NULLs last, behind real rows). Right side: dropped
    # here; left side: rows are KEPT (left-join semantics) with null
    # enrichment via the mask below.
    right = right.where(F.col(ts_col).isNotNull())
    carried = [ts_col, *value_cols]
    left_cols = left.columns
    rtypes = dict(right.dtypes)
    tb_type = rtypes[tiebreak] if tiebreak is not None else "int"
    r_struct_t = "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in carried) + ">"

    # side=0 sorts right-side rows BEFORE left rows at equal ts → inclusive
    l_tagged = left.select(
        F.col(on), F.col(ts_col), F.lit(1).alias("_side"),
        F.lit(None).cast(tb_type).alias("_tb"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols if c not in (on, ts_col)],
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on), F.col(ts_col), F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak is not None else F.lit(0)).cast(tb_type).alias("_tb"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_l_{c}")
          for c in left_cols if c not in (on, ts_col)],
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("_r"),
    )

    ts_order = (
        F.col(ts_col).desc() if direction == "forward" else F.col(ts_col).asc()
    )
    # at equal ts the right row must sort BEFORE the left row either way
    # (_side 0 < 1) so the join stays inclusive in both directions
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction == "nearest":
        # single pass, two frames over ONE sort: running-last behind
        # (backward candidate) + leading-first ahead (forward candidate),
        # then pick the smaller |Δts| — backward wins ties, matching
        # pandas merge_asof(direction='nearest'). Exact matches live in
        # the backward frame (right sorts before left at equal ts), and
        # Δ_backward = 0 always wins, so the exclusive forward frame is
        # harmless. Same one shuffle; Spark reuses the sort for both
        # frames.
        wf = (
            Window.partitionBy(on)
            .orderBy(ts_order, F.col("_side").asc(), F.col("_tb").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        rb = F.last(F.col("_r"), ignorenulls=True).over(w)
        rf = F.first(F.col("_r"), ignorenulls=True).over(wf)
        d_back = F.unix_micros(F.col(ts_col)) - F.unix_micros(rb.getField(ts_col))
        d_fwd = F.unix_micros(rf.getField(ts_col)) - F.unix_micros(F.col(ts_col))
        chosen = (
            F.when(rb.isNull(), rf)
            .when(rf.isNull(), rb)
            .when(d_back <= d_fwd, rb)
            .otherwise(rf)
        )
    else:
        chosen = F.last(F.col("_r"), ignorenulls=True).over(w)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col(ts_col)) - F.unix_micros(chosen.getField(ts_col))
        )
        chosen = F.when(gap <= int(tolerance_seconds * 1_000_000), chosen)
    # NULL-ts left rows keep their row but match nothing (see contract
    # note above) — without the mask, backward order happens to yield
    # NULL anyway but forward/nearest would enrich from a real row
    chosen = F.when(F.col(ts_col).isNotNull(), chosen)
    enriched = l_tagged.unionByName(r_tagged).select(
        F.col(on), F.col(ts_col), F.col("_side"),
        *[F.col(f"_l_{c}") for c in left_cols if c not in (on, ts_col)],
        chosen.alias("_r"),
    )
    return enriched.where(F.col("_side") == 1).select(
        *[
            F.col(c) if c in (on, ts_col) else F.col(f"_l_{c}").alias(c)
            for c in left_cols
        ],
        F.col("_r").getField(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.col("_r").getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )
