"""Quick differential check for a handful of queries while iterating.

Usage: python tools/qcheck.py <query_name> [<query_name> ...] [--sf=DIR | --sf DIR]

Runs each named query on Spark (local[4]) and its DuckDB oracle over the
same parquet dir, applies the SAME canonicalization the pytest gate uses
(tests/test_queries_oracle.py), and prints PASS/FAIL per query. This is a
developer loop tool only — the authoritative gates are the pytest suite
and the external driver.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args: list[str] = []
    sf_dir = "/root/testdata/sf0.001"
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf":
            i += 1
            if i == len(argv):
                raise SystemExit("--sf requires a directory argument")
            sf_dir = argv[i]
        elif a.startswith("--"):
            raise SystemExit(f"unknown option {a!r}")
        else:
            args.append(a)
        i += 1

    import duckdb

    import __spark_entry__ as entrymod
    from bytewax_iceberg_connector_spark.session import get_spark

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_queries_oracle import _TABLES, _driver_fidelity_check, _norm

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    spark = get_spark(
        app_name="qcheck",
        master="local[4]",
        **{
            "spark.sql.shuffle.partitions": "4",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )

    rc = 0
    for name in args:
        if name not in queries:
            print(f"{name}: NOT REGISTERED")
            rc = 1
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name}: rows-only, {len(srows)} rows OK")
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            assert sorted(sdf.columns) == sorted(dcols), (
                f"cols {sorted(sdf.columns)} vs {sorted(dcols)}"
            )
            assert len(srows) == len(drows), f"rows {len(srows)} vs {len(drows)}"
            assert _norm(sdf.columns, srows) == _norm(dcols, drows), "values"
            _driver_fidelity_check(
                sdf.toPandas(), con.execute(oracles[name]).df(), name
            )
            print(f"{name}: PASS ({len(srows)} rows)")
        except Exception as e:  # noqa: BLE001 — dev loop tool
            print(f"{name}: FAIL — {type(e).__name__}: {e}")
            rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
