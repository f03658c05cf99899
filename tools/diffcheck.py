"""Local differential harness mimicking the driver's DuckDB-oracle gate.

Runs every ``queries()`` entry on Spark and (where declared) the matching
``oracle_sql()`` on DuckDB over the same parquet, then compares:
  - row count
  - column names (sorted)
  - column types (loose families: int/float/str/ts/date/bool/list)
  - order-insensitive multiset of rows (floats rounded to 9 significant-ish
    decimals to absorb representation noise; exact for everything else)

Usage: python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


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


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def _driver_fidelity(sdf, con, oracle_sql) -> list[str]:
    """Mirror tests/test_queries_oracle._driver_fidelity_check for the CLI
    loop: pandas dtype-kind splits (int vs float) and unhashable
    array/struct cells fail the DRIVER's canonicalizer even when values
    compare equal python-side."""
    import numpy as np

    problems = []
    spdf = sdf.toPandas()
    opdf = con.execute(oracle_sql).df()
    numeric = {"i", "u", "f"}
    for c in spdf.columns:
        sk, ok = spdf[c].dtype.kind, opdf[c].dtype.kind
        if (sk in numeric or ok in numeric) and sk != ok:
            problems.append(
                f"dtype-kind split on {c}: spark={spdf[c].dtype}"
                f" duck={opdf[c].dtype} (driver hash would diverge)"
            )
    for frame, side in ((spdf, "spark"), (opdf, "duck")):
        for c in frame.columns:
            if frame[c].map(
                lambda v: isinstance(v, (list, tuple, dict, np.ndarray))
            ).any():
                problems.append(
                    f"{side}.{c} holds array/struct cells (unhashable in"
                    f" the driver's canonicalizer)"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from bytewax_iceberg_connector_spark.session import get_spark

    spark = get_spark(app_name="diffcheck")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    from bytewax_iceberg_connector_spark.plans.registry import IMPORT_ERRORS

    if IMPORT_ERRORS:
        print(f"!! plan-module import errors: {IMPORT_ERRORS}")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # persist: the frame is executed twice (collect for the value
            # multiset, toPandas for driver fidelity) — without it the
            # heavy queries pay their full plan cost twice
            sdf = fn(spark, sf_dir).persist()
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex!r}"[:500])
            failures += 1
            continue
        try:
            if name not in oracles:
                print(
                    f"ok?   {name}: rows-only, {len(srows)} rows "
                    f"({time.time()-t0:.1f}s)"
                )
                continue
            try:
                res = con.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
            except Exception as ex:
                print(f"FAIL  {name}: duckdb error: {ex!r}"[:500])
                failures += 1
                continue
            problems = []
            if sorted(scols) != sorted(dcols):
                problems.append(
                    f"cols spark={sorted(scols)} duck={sorted(dcols)}"
                )
            if len(srows) != len(drows):
                problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
            if not problems:
                sset, dset = _norm_rows(scols, srows), _norm_rows(dcols, drows)
                if sset != dset:
                    diff_s = list((sset - dset).items())[:3]
                    diff_d = list((dset - sset).items())[:3]
                    problems.append(
                        f"values spark-only={diff_s} duck-only={diff_d}"
                    )
            if not problems:
                # driver fidelity: the real gate hashes through pandas,
                # where a HUGEINT→float64 vs int64 split or an array-typed
                # cell fails even when python-level values compare equal
                # (round-3 reds). Guarded: one query's Arrow/duckdb hiccup
                # must print ITS fail line, not abort the whole sweep.
                try:
                    problems.extend(_driver_fidelity(sdf, con, oracles[name]))
                except Exception as ex:
                    problems.append(f"fidelity check error: {ex!r}")
            if problems:
                print(f"FAIL  {name}: " + " | ".join(problems)[:800])
                failures += 1
            else:
                print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        finally:
            sdf.unpersist()
    spark.stop()
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
