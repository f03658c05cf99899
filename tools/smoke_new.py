"""Quick differential smoke for a subset of queries (iteration helper).

Usage: python tools/smoke_new.py [sf_dir] name1 name2 ...
Runs each named query on Spark and its oracle on DuckDB, canonicalizes
both through pandas the way the driver does, and prints PASS/FAIL.
"""

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    names = args or sorted(qs)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("smoke")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    fails = 0
    for n in names:
        sp = _canon(qs[n](spark, sf_dir).toPandas())
        if n not in os_:
            print(f"{n}: rows-only, {len(sp)} rows")
            continue
        od = _canon(con.sql(os_[n]).df())
        ok_rows = len(sp) == len(od)
        ok_cols = list(sp.columns) == list(od.columns)
        ok_dtype = all(
            (sp[c].dtype.kind == od[c].dtype.kind)
            or (sp[c].dtype.kind not in "iuf" and od[c].dtype.kind not in "iuf")
            for c in sp.columns
        ) if ok_cols else False
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                diff = 0
                for c in sp.columns:
                    a, b = sp[c], od[c]
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        bad = ~(
                            (a.isna() & b.isna())
                            | ((a - b).abs() <= 1e-9 + 1e-9 * b.abs())
                        )
                    else:
                        bad = ~((a.isna() & b.isna()) | (a == b))
                    diff += int(bad.sum())
                ok_vals = diff == 0
            except Exception as e:  # noqa: BLE001
                print(f"  compare error: {e}")
        status = "PASS" if (ok_rows and ok_cols and ok_dtype and ok_vals) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(
            f"{n}: {status} rows={len(sp)}/{len(od)} cols_match={ok_cols} "
            f"dtype_match={ok_dtype} vals_match={ok_vals}"
        )
        if status == "FAIL" and ok_cols:
            print("  spark:", sp.head(3).to_dict("records"))
            print("  oracle:", od.head(3).to_dict("records"))
        elif status == "FAIL":
            print("  spark cols:", list(sp.columns))
            print("  oracle cols:", list(od.columns))
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
