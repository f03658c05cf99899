"""Bucketed (pre-shuffled) tables — shuffle-free co-located joins.

The 100 TB lever the north star names explicitly ("bucketing for
co-located joins"): both join sides are written hash-bucketed on the join
key; at read time Spark's bucketing metadata proves the co-partitioning,
so the join plans with ZERO exchanges — the single biggest cost in a
fact-fact join simply disappears, on every subsequent query, forever.

When to pay for it: tables joined repeatedly on a stable key (fact-fact
star joins, incremental dedup against a history table). Bucket count
rules: a power of two ≥ cluster parallelism; both sides must agree (or be
multiples) for the exchange elimination to kick in. The Iceberg analogue
is the ``bucket(n, col)`` partition transform + storage-partitioned joins
— same idea, file-format-level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets additionally removes the JOIN-side sort for
    sort-merge joins → a pure zip of pre-sorted streams.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
