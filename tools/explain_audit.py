"""Print formatted physical plans for every declared query — the manual
review loop for shuffle/pushdown/codegen auditing.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from bytewax_iceberg_connector_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        print(f"\n{'=' * 70}\n## {name}\n{'=' * 70}")
        try:
            df = fn(spark, sf_dir)
            plan = df.sparkSession._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            print(plan)
            flags = []
            if "BatchEvalPython" in plan:
                flags.append("PYTHON-UDF")
            if "ArrowEvalPython" in plan:
                flags.append("PANDAS-UDF")
            if "Exchange" in plan:
                flags.append(f"exchanges={plan.count('Exchange ')}")
            if "PushedFilters: []" in plan:
                flags.append("NO-PUSHDOWN")
            print(f">>> audit: {', '.join(flags) or 'clean'}")
        except Exception as exc:  # noqa: BLE001
            print(f">>> failed to plan: {exc!r}")
    spark.stop()


if __name__ == "__main__":
    main()
