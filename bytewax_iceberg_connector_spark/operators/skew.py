"""Skew-mitigation join: salting — the manual complement to AQE's
skew-join splitting (north star: "skewed keys hurt ... salting for skew").

A shuffle join hash-partitions both sides on the key; a hot key lands its
entire volume on ONE reducer and the stage runs at the speed of that task.
AQE's skewedJoin handles sort-merge cases adaptively; salting is the
explicit, planner-independent form — required when the skew is known and
extreme (e.g. joining events on a 5-value ``event_type``), or when the
join type/shape falls outside AQE's skew handling.

Mechanics: the fact side appends a deterministic salt in [0, n); the dim
side replicates each row n times; the join key becomes (key, salt), so a
hot key spreads over n reducers. Replication multiplies the dim shuffle by
n — use on small-to-medium dims only (for genuinely big-big skewed joins,
split hot keys out and broadcast just those).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``facts ⋈ dims`` on ``on`` with an ``n_salts``-way salt.

    Result is row-identical to ``facts.join(dims, on, how)``; only the
    partitioning changes. The salt is derived from the fact row's content
    hash (deterministic, no rand() → replays identically on retries, which
    a nondeterministic salt does not under Spark's task-retry semantics).

    ``how`` is restricted to fact-preserving joins (inner / left outer /
    left semi / left anti): the dim side is replicated once per salt, so a
    right or full outer join would emit each UNMATCHED dim row n_salts
    times. Raises ValueError for the unsupported join types rather than
    silently duplicating rows.
    """
    allowed = {
        "inner", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
    }
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the salted dim side "
            "is replicated per salt, so right/full outer joins would emit "
            f"unmatched dim rows {n_salts}x. Use one of {sorted(allowed)}."
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n_salts))
    salted_facts = facts.withColumn("_salt", salt)
    salted_dims = dims.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        salted_facts.join(salted_dims, on=[on, "_salt"], how=how).drop("_salt")
    )
