"""Dead-cache audit: for every registered query, count DataFrame
persist/unpersist calls fired while the query BUILDS its plan, then check
whether the final physical plan still contains any InMemoryTableScan.

A query that persists frames during build but whose final plan reads no
cache has stranded its persists: a ``scoped()`` finalizer tied to an
intermediate DataFrame fires when the intermediate's Python reference
dies inside the outer builder, unpersisting the cache BEFORE the action
runs (the r13 semantic_dedup finding). Queries whose persists only feed
eager build-time jobs (BPE merge loop, lake warehouse round-trips) are
expected hits — check the build path before calling it a bug.

Usage: python tools/dead_cache_audit.py [sf_dir] [query ...]
"""
import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod
from bytewax_iceberg_connector_spark.session import get_spark
from pyspark.sql.classic.dataframe import DataFrame

spark = get_spark(app_name="deadcache")
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
qs = entrymod.queries()

c = {"p": 0, "u": 0}
_p, _u = DataFrame.persist, DataFrame.unpersist
def pp(self, *a, **k):
    c["p"] += 1
    return _p(self, *a, **k)
def uu(self, *a, **k):
    c["u"] += 1
    return _u(self, *a, **k)
DataFrame.persist, DataFrame.unpersist = pp, uu

names = sys.argv[2:] or sorted(qs)
for n in names:
    spark.catalog.clearCache()
    gc.collect()
    c["p"] = c["u"] = 0
    try:
        df = qs[n](spark, sf)
    except Exception as e:
        print(f"{n}: BUILD ERROR {type(e).__name__}", flush=True); continue
    bp, bu = c["p"], c["u"]
    gc.collect()
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    mem = plan.count("InMemoryTableScan")
    if bp and not mem:
        print(f"{n}: persists={bp} build_unpersists={bu} gc_unpersists={c['u']-bu} final plan has NO InMemoryTableScan  <-- DEAD", flush=True)
    elif bu or c["u"] > bu:
        print(f"{n}: persists={bp} unpersists(build/gc)={bu}/{c['u']-bu} mem_scans={mem}  <-- EARLY-UNPERSIST", flush=True)
    del df
gc.collect()
spark.stop()
