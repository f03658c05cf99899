"""Z-order clustering: the compaction variant that buys min/max file
skipping on EVERY clustering column at once. Proves (a) the data survives
byte-identically, (b) z-ordered footers admit far fewer files than a
single-column sort for predicates on the secondary column, and (c) the
write plans exactly one range exchange."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row

from bytewax_iceberg_connector_spark.config import IcebergSinkConfig
from bytewax_iceberg_connector_spark.functions.zorder import zorder_key
from bytewax_iceberg_connector_spark.operators.sink import LakeSink


def _sink(spark, tmp_path, **kw):
    cfg = IcebergSinkConfig(
        table_name="db.zorder_t",
        warehouse_path=str(tmp_path),
        num_partitions=16,
        **kw,
    )
    return LakeSink(spark, cfg)


@pytest.fixture()
def grid(spark):
    # two independent uniform dimensions — the worst case for a
    # single-column sort, the home turf of z-order
    rows = [Row(a=i % 64, b=i // 64, v=float(i)) for i in range(64 * 64)]
    return spark.createDataFrame(rows)


def _files_admitting(sink, col, point):
    """Parquet-footer file skipping, simulated: files whose [min,max]
    stats on `col` admit `point` (what any stats-based pruner reads)."""
    files = []
    for f in glob.glob(f"{sink._path}/**/*.parquet", recursive=True):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        admit = False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or (st.min <= point <= st.max):
                admit = True
        files.append(admit)
    return sum(files), len(files)


def test_zorder_compact_preserves_rows_and_skips_both_dims(spark, tmp_path, grid):
    sink = _sink(spark, tmp_path, sort_order=["a"])
    sink.append(grid)
    before = {(r.a, r.b, r.v) for r in sink.read().collect()}

    sink.compact(zorder_by=["a", "b"])
    after = {(r.a, r.b, r.v) for r in sink.read().collect()}
    assert after == before
    sink.expire_snapshots(keep_last=1)  # glob below must see live files only

    hit_a, total = _files_admitting(sink, "a", 7)
    hit_b, _ = _files_admitting(sink, "b", 7)
    assert total >= 8
    # both dimensions skip most files — the z-order contract
    assert hit_a <= total / 2, (hit_a, total)
    assert hit_b <= total / 2, (hit_b, total)


def test_single_sort_does_not_skip_secondary_dim(spark, tmp_path, grid):
    """Baseline contrast: sort_order=["a"] gives tight stats on a but the
    secondary column b spans its full range in every file."""
    sink = _sink(spark, tmp_path, sort_order=["a"])
    sink.append(grid)
    sink.compact()  # re-sorts by config.sort_order=["a"] within partitions
    sink.expire_snapshots(keep_last=1)
    hit_b, total = _files_admitting(sink, "b", 7)
    assert total >= 8
    assert hit_b >= 0.9 * total, (hit_b, total)


def test_zorder_key_is_jvm_expression_single_range_exchange(spark, tmp_path, grid):
    sink = _sink(spark, tmp_path)
    sink.append(grid)
    live = sink.read().select("a", "b", "v")
    z = zorder_key(live, ["a", "b"])
    plan = (
        live.withColumn("_z", z)
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1, plan


def test_zorder_key_null_and_constant_columns(spark):
    df = spark.createDataFrame(
        [Row(a=None, b=5), Row(a=1, b=5), Row(a=2, b=5)],
        "a int, b int",
    )
    vals = df.select(zorder_key(df, ["a", "b"]).alias("z")).collect()
    # constant column contributes bucket 0 everywhere; nulls land low
    assert all(r.z is not None for r in vals)
    assert vals[0].z == min(r.z for r in vals)
