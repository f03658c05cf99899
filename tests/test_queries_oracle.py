"""The full differential gate as a test: every declared query vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

import math
import os
from collections import Counter

import duckdb
import pytest

import __spark_entry__ as entrymod

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return round(v, 9 - int(math.floor(math.log10(abs(v)))) if abs(v) > 1 else 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in _TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_every_oracle_key_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = _QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in _ORACLES:
        # rows-only contract: must at least run and return a stable schema
        assert sdf.columns
        return
    res = duck.execute(_ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), "column names must match"
    assert len(srows) == len(drows), "row counts must match"
    assert _norm(sdf.columns, srows) == _norm(dcols, drows), "values must match"


def test_no_duplicate_query_names_across_plan_modules():
    """dict.update in the registry would silently shadow a query defined in
    two plan modules — enforce global uniqueness instead."""
    import importlib

    from bytewax_iceberg_connector_spark.plans import registry

    seen: dict[str, str] = {}
    for mod_name in registry._PLAN_MODULES:
        mod = importlib.import_module(
            f"bytewax_iceberg_connector_spark.plans.{mod_name}"
        )
        for name in getattr(mod, "QUERIES", {}):
            assert name not in seen, (
                f"query {name!r} defined in both {seen[name]} and {mod_name}"
            )
            seen[name] = mod_name
        for name in getattr(mod, "ORACLE", {}):
            assert name in getattr(mod, "QUERIES", {}), (
                f"oracle {name!r} in {mod_name} has no matching query"
            )


def test_check_first_names_resolve():
    """Every name in the driver-gate priority block must be a registered
    query (a typo would silently fall out of the checked set)."""
    from bytewax_iceberg_connector_spark.plans import registry

    q = registry.all_queries()
    missing = [n for n in registry._CHECK_FIRST if n not in q]
    assert not missing, missing
