"""Result-scoped plan caches.

Several query plans persist an internal frame (a shingle table, an LSH
bucket index, an IVF assignment table) because two or more branches of the
same final action consume it — one materialization instead of N corpus
scans. The returned DataFrame is lazy, so the persist must outlive the
plan-building function; but it must NOT outlive the RESULT, or every
query run in a long-lived session (the pytest suite, the driver's 50-query
correctness loop) leaks a pinned frame into the next query's memory budget
(round-3 ADVICE finding on bm25_rank / similarity_ivf_pq).

``scoped(result, *cached)`` ties each cached frame's lifetime to the
result object: when the caller drops the result, a weakref finalizer
unpersists the caches. While the result is alive — including during its
action — the caches stay hot, which is exactly the contract the plans
need. ``bench.py``'s per-query ``clearCache()`` remains a belt-and-braces
second layer for its own loop.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def _safe_unpersist(df: DataFrame) -> None:
    try:
        df.unpersist()
    except Exception:
        # session already stopped / JVM gone — nothing left to release
        pass


def scoped(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist every frame in ``cached`` once ``result`` is GC'd."""
    for c in cached:
        weakref.finalize(result, _safe_unpersist, c)
    return result
