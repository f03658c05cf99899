"""Physical-plan quality gates: the scale properties the queries claim in
their docstrings must actually appear in the optimized plan."""

import pytest


def _plan(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    from bytewax_iceberg_connector_spark.plans.relational import scan_project_filter

    plan = _plan(scan_project_filter(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    # projection pruned to the selected + filter columns only
    read = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "l_comment" not in read
    assert "l_orderkey" in read and "l_quantity" in read


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    from bytewax_iceberg_connector_spark.plans.relational import pricing_summary

    plan = _plan(pricing_summary(spark, sf_dir))
    # map-side partial agg before the exchange: shuffle carries groups, not rows
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters" in plan


def test_multi_join_broadcasts_dimensions(spark, sf_dir):
    from bytewax_iceberg_connector_spark.plans.relational import join_inner_multi

    plan = _plan(join_inner_multi(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the only shuffle-worthy join is lineitem⋈orders; everything else is
    # broadcast — so at most one non-broadcast join in the plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_sort_limit_compiles_to_topk(spark, sf_dir):
    from bytewax_iceberg_connector_spark.plans.relational import sort_limit

    plan = _plan(sort_limit(spark, sf_dir))
    # per-partition top-k + driver merge, not a global sort materialization
    assert "TakeOrderedAndProject" in plan


@pytest.mark.deep
def test_relational_battery_has_no_python_udfs(spark, sf_dir):
    """The whole relational+operator battery stays JVM-side (codegen)."""
    from bytewax_iceberg_connector_spark.plans import operator_queries, relational

    for name, fn in {**relational.QUERIES, **operator_queries.QUERIES}.items():
        plan = _plan(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name} fell back to Python UDF"
        assert "ArrowEvalPython" not in plan, f"{name} uses pandas UDF unexpectedly"


def test_semi_and_anti_join_operators(spark, sf_dir):
    from bytewax_iceberg_connector_spark.plans.relational import join_anti, join_semi

    assert "LeftSemi" in _plan(join_semi(spark, sf_dir))
    assert "LeftAnti" in _plan(join_anti(spark, sf_dir))


def test_similarity_topk_broadcasts_queries(spark, sf_dir):
    from bytewax_iceberg_connector_spark.plans.llm import similarity_topk

    plan = _plan(similarity_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
