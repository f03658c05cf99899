"""Frequency-sketch helpers: Misra–Gries heavy-hitter candidates.

The scalable exact-top-k recipe for columns whose distinct-value universe
is too large to shuffle (n-grams at 100 TB): a per-partition Misra–Gries
summary of size ``s`` retains every item whose PARTITION count exceeds
n_p/s; by pigeonhole any item with GLOBAL count > N/s exceeds that bound
in at least one partition, so the UNION of per-partition candidate keys
is a superset of all global heavy hitters. Candidates (≤ s·partitions
keys, tiny) broadcast back for an exact recount of only those keys — the
word-count shuffle shrinks from |distinct terms| to |candidates|.

Exactness guarantee: if the k-th largest global count f_k > N/s, the
top-k is provably inside the candidate set and the recount is exact —
choose s ≥ N/f_k (estimable from any sample); otherwise the result is
still a certified subset (every returned count is exact).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def misra_gries_candidates(df: DataFrame, col: str, s: int = 256) -> list:
    """Union of per-partition Misra–Gries summary keys for ``df[col]``.

    One zero-shuffle scan; driver receives ≤ s keys per task. Uses the
    mergeable-summary form (batch value_counts folded in, then the
    (s+1)-th largest counter subtracted from all and non-positives
    evicted) — vectorized per Arrow batch instead of the per-row counter
    dance, same retention guarantee.
    """

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > s:
                thresh = sorted(counters.values(), reverse=True)[s]
                counters = {k: c - thresh for k, c in counters.items() if c > thresh}
        yield pd.DataFrame({col: list(counters.keys())})

    out = df.select(col).mapInPandas(_mg, schema=df.select(col).schema)
    return [r[0] for r in out.distinct().collect()]
