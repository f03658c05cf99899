"""Parquet table sources for the driver-generated test corpus.

The reference has NO read path at all (it is sink-only; see SURVEY.md §2
"Not present in the reference"). All scans in this engine are native Spark
parquet scans so that Catalyst pushes predicates/projections into the reader
(``PushedFilters`` / ``ReadSchema`` in .explain) and partition/file pruning
comes for free when the same tables live in Iceberg.

Scale notes: never materialize or cache here — these loaders return lazy
DataFrames; column pruning only works if callers ``select`` narrow and let
Catalyst prune the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_engine_conf

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: tables small enough to broadcast at ANY scale factor (TPC-H fixes region=5,
#: nation=25 rows; supplier stays tiny in this corpus). Join sides built from
#: these should be wrapped in F.broadcast().
BROADCAST_TABLES = frozenset({"region", "nation"})


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def widen_for_kernel(df: DataFrame) -> DataFrame:
    """Round-robin a NARROW frame up to the session's core count before a
    CPU-heavy Arrow kernel (r12 optimization round, guide §2.5/§4).

    A single-row-group parquet file scans as ONE task no matter what
    ``maxPartitionBytes``/``minPartitionNum`` say (splits beyond row-group
    boundaries come back empty), so a per-row kernel applied directly to
    the scan runs serial while every other core idles — the
    bytes-per-task heuristic undercounts vectorized-Python stage cost by
    orders of magnitude (same rationale as the AQE minPartitionSize
    floor in session.py, which covers only POST-SHUFFLE stages). The
    repartition is guarded: a frame already at/above the default
    parallelism (any real at-scale scan, or a pending 32-partition
    shuffle) passes through untouched, so this is a no-op on a cluster
    and an exchange of a few hundred KB locally. Call it on the NARROW
    projection (the columns the kernel needs) so scan-level column
    pruning is preserved.
    """
    spark = df.sparkSession
    dp = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < dp:
        return df.repartition(dp)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes types to engine conventions.

    - ``events.ts`` as parquet timestamp[ns]: Spark reads it as a long
      (nanosAsLong) and we truncate to microseconds — identical to DuckDB's
      TIMESTAMP_NS→TIMESTAMP cast, so oracle comparisons line up. Integer
      `div` (not `/`) avoids double-precision loss on epoch-nanos.
    - parquet timestamp[us] without timezone: Spark 4 reads it as
      TIMESTAMP_NTZ, which time-arithmetic builtins (``unix_micros`` et al.)
      reject. Cast every NTZ column to the session type — with the engine's
      pinned UTC session timezone this is value-identical to DuckDB's naive
      TIMESTAMP read, and it keeps query code on ONE timestamp type no
      matter which physical annotation the test-data generator emitted.
    """
    ensure_engine_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


#: DuckDB twin of load_vectors' validity contract — prepend inside WITH(...)
#: and read FROM embeddings_valid. Kept beside the loader so the two sides
#: of the contract cannot drift.
SQL_VALID_EMB = """embeddings_valid AS (
  SELECT * FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    AND len(embedding) = (
      SELECT len(embedding) FROM embeddings WHERE embedding IS NOT NULL
      GROUP BY 1 ORDER BY COUNT(*) DESC, 1 DESC LIMIT 1)
)"""

#: DuckDB twin of nonzero=True (cosine consumers): excludes zero vectors.
SQL_NONZERO_EMB = "len(list_filter(embedding, x -> x <> 0)) > 0"


def load_vectors(
    spark: SparkSession, sf_dir: str, nonzero: bool = False
) -> DataFrame:
    """The ``embeddings`` table quarantined to the VALID-VECTOR contract —
    what every vector operator (similarity, ANN, dedup, clustering,
    embedding audits) reads instead of the raw table.

    Valid := ``vec_id`` IS NOT NULL (results must be addressable),
    ``embedding`` IS NOT NULL, and ``size(embedding)`` equals the corpus's
    MODAL dimension (ties break to the larger dim). Schema drift at 100 TB
    WILL produce NULL/empty/ragged vectors, and before this contract one
    such row crashed every GEMM kernel mid-job (ragged numpy batch — r06
    adversarial-sweep find); quarantining at the source is the only place
    all ~12 consumers inherit the fix. ``nonzero=True`` additionally drops
    zero vectors — cosine consumers use it because the two engines
    disagree pathologically on 0/0 scores (numpy NaN sorts LAST under
    lexsort; DuckDB NaN sorts as the LARGEST double, i.e. rank 1).

    The modal dim is resolved ONCE per corpus (memoized on the parquet
    file stamp — the BPE corpus-stamp precedent) and injected as a
    LITERAL predicate, so every consumer's plan is a scan-level filter
    with no extra pass or join (an A/B with a lazy broadcast-join dim
    lookup measured similarity_topk 0.73 → 1.63 s at sf0.1 — 2× for a
    validity check). This is exactly what a production deployment does:
    the dim lives in table metadata, the filter is a literal.
    """
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    d = _modal_dim(spark, sf_dir)
    if d is None:  # no valid vectors at all
        out = emb.where(F.lit(False))
    else:
        out = emb.where(F.size("embedding") == d)
    if nonzero:
        out = out.where(F.exists("embedding", lambda x: x != 0))
    return out


_MODAL_DIM_MEMO: dict[tuple, int | None] = {}


def _emb_stamp(sf_dir: str) -> tuple:
    """Identity stamp of the embeddings parquet (file or directory):
    sorted (relpath, size, mtime_ns) tuples — a changed corpus changes
    the stamp, so the modal-dim memo can never serve a stale dim."""
    root = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isfile(root):
        st = os.stat(root)
        return (("", st.st_size, st.st_mtime_ns),)
    entries = []
    for base, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(base, f)
            st = os.stat(p)
            entries.append((os.path.relpath(p, root), st.st_size, st.st_mtime_ns))
    return tuple(sorted(entries))


def _modal_dim(spark: SparkSession, sf_dir: str) -> int | None:
    """Most frequent embedding dimension (ties → larger), one bounded
    1-row aggregate per DISTINCT corpus per process."""
    key = (os.path.abspath(sf_dir), _emb_stamp(sf_dir))
    if key not in _MODAL_DIM_MEMO:
        row = (
            load_table(spark, sf_dir, "embeddings")
            .where(F.col("embedding").isNotNull())
            .groupBy(F.size("embedding").alias("_d"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .orderBy(F.desc("_n"), F.desc("_d"))
            .limit(1)
            .collect()
        )
        _MODAL_DIM_MEMO[key] = int(row[0]["_d"]) if row else None
    return _MODAL_DIM_MEMO[key]


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Expose the corpus tables as temp views so the FULL engine surface
    is reachable from plain ``spark.sql`` — same lazy scans, same
    pushdown; the view layer adds nothing physical."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
