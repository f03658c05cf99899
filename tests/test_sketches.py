"""Misra–Gries candidate guarantee: the per-partition summary union must
contain every item with global count > N/s, across skew patterns and
partition layouts."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from bytewax_iceberg_connector_spark.functions.sketches import (
    misra_gries_candidates,
)


def _zipf_df(spark, n_items, n_rows, parts):
    # zipf-ish skew: item i drawn proportionally to 1/(i+1)
    rows = []
    i = 0
    while len(rows) < n_rows:
        for item in range(n_items):
            reps = max(1, n_items // (item + 1))
            rows.extend([Row(v=f"item_{item}")] * reps)
            if len(rows) >= n_rows:
                break
        i += 1
    return spark.createDataFrame(rows[:n_rows]).repartition(parts)


@pytest.mark.parametrize("s,parts", [(4, 2), (8, 4), (16, 8)])
def test_candidates_superset_of_heavy_items(spark, s, parts):
    df = _zipf_df(spark, n_items=50, n_rows=5000, parts=parts)
    exact = {r.v: r["count"] for r in df.groupBy("v").count().collect()}
    n = sum(exact.values())
    cands = set(misra_gries_candidates(df, "v", s=s))
    heavy = {k for k, c in exact.items() if c > n / s}
    assert heavy <= cands, (sorted(heavy - cands), s, parts)


def test_heavy_hitters_matches_plain_topk(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bytewax_iceberg_connector_spark.functions import text as X
    from bytewax_iceberg_connector_spark.plans.llm import heavy_hitters
    from bytewax_iceberg_connector_spark.sources.tables import load_table

    got = [(r.rnk, r.term, r.n) for r in heavy_hitters(spark, sf_dir).collect()]
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(X.tokens("text")).alias("term"))
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    want = [
        (r.rnk, r.term, r.n)
        for r in toks.groupBy("term")
        .agg(F.count("*").alias("n"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where("rnk <= 10")
        .collect()
    ]
    assert got == sorted(want)
