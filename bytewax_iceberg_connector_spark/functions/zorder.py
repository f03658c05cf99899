"""Z-order (Morton) clustering key for multi-column data skipping.

``zorder_key`` maps each clustering column into ``2**bits`` rank buckets
and bit-interleaves the bucket ids into one long — rows close in z-value
are close in EVERY clustering dimension, so range-partitioning + sorting
files by z gives tight per-file min/max statistics on all the columns at
once (Iceberg's ``rewrite_data_files(strategy => 'sort', sort_order =>
'zorder(...)')``, Delta's ``OPTIMIZE ... ZORDER BY``). A single-column
sort gets skipping on that column only; z-order trades a little
per-column tightness for skipping on all of them.

Everything is JVM-side: one tiny min/max aggregate per clustering column
(a scalar reduce — no shuffle of the data), then ``width_bucket`` + bit
arithmetic inside whole-stage codegen. Bucketing is uniform in value
space; heavily skewed columns would prefer quantile boundaries
(approxQuantile-fed CASE ladder) — noted, not needed for rank-ish keys.

Scale: the z-key costs O(bits x ncols) integer expressions per row and the
clustering write is exactly one range exchange — the same shuffle a plain
sorted write pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Morton-interleaved clustering key over ``cols`` (numeric or
    timestamp). Collects per-column min/max once; NULLs map to bucket 0
    (they cluster together at the low end, like NULLS FIRST)."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    # the interleaved key must fit 63 usable bits of a signed long: bit 63
    # would flip the sign (top-bucket rows of the last column range-sort
    # FIRST) and JVM shift amounts wrap mod 64 (dimension 9+ would
    # silently collide with dimension 1's slots). Degrade bits-per-column
    # so total interleaved width <= 63 — coarser buckets, correct order.
    bits = min(bits, 63 // len(cols))
    if bits == 0:
        raise ValueError(
            f"zorder_key over {len(cols)} columns cannot fit even 1 bit "
            "per column in a signed long key — cluster on fewer columns"
        )
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"lo_{c}"), F.max(v).alias(f"hi_{c}")]
    row = df.agg(*aggs).first()

    n = 2**bits
    buckets: list[Column] = []
    for c in cols:
        lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
        if lo is None or hi is None or hi <= lo:
            buckets.append(F.lit(0).cast("long"))
            continue
        b = F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n))
        # width_bucket is 1..n in range, 0/n+1 out of range; clamp to 0..n-1
        b = F.least(F.greatest(b - 1, F.lit(0)), F.lit(n - 1))
        buckets.append(F.coalesce(b, F.lit(0)).cast("long"))

    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, b in enumerate(buckets):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * len(buckets) + i))
    return z
