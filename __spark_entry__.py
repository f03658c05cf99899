"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bytewax_iceberg_connector_spark`` (see SURVEY.md §2
for the inventory; plans/ for the query battery).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bytewax_iceberg_connector_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary, TPC-H Q1 shape) on sf0.001."""
    from bytewax_iceberg_connector_spark.plans.relational import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys → rows-only check."""
    return _registry.all_oracles()
