"""Lake sink — the reference's core capability (A1–A9), Spark-first.

Reference: /root/reference/src/bytewax_iceberg_connector/connector.py —
``IcebergSink`` (396-454), fixed partition writers (112-145, 456-495),
buffer/flush machinery (147-259), partition-key grouping (261-335),
checkpoint state (337-350), table load/create (358-393).

What is deliberately NOT ported (SURVEY.md §7): the buffer/retry/snapshot
machinery. Spark's micro-batch planner + file-sink manifest (or Iceberg's
snapshot commit) + checkpointLocation subsume A4/A5/A7/A8 with a *stronger*
guarantee — replayable source offsets + atomic commits give exactly-once
without serializing an in-flight buffer (the reference's
``last_committed_batch`` dedup is declared but never updated,
connector.py:137, so its exactly-once is aspirational).

Two backends behind one API:
- **iceberg** (when iceberg-spark-runtime is on the classpath): real hidden
  partitioning, snapshot commits, `commit.retry.num-retries` for the
  reference's optimistic-commit loop (connector.py:242-257).
- **parquet warehouse** (always available; the test default): hive-style
  layout under ``warehouse/table`` with partition transforms from
  operators/partitioning.py materialized as ``_p_*`` directory columns —
  same co-location and pruning properties, minus snapshot isolation.

Scale: the append path repartitions by partition key before writing
(`write.distribution-mode=hash` equivalent) so 1000 executors produce
|partitions| files per commit, not |executors|×|partitions| small files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..config import IcebergSinkConfig
from .partitioning import PartitionField, partition_columns, partition_key


def iceberg_runtime_available(spark: SparkSession) -> bool:
    """True when iceberg-spark-runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class LakeSink:
    """A1 ``IcebergSink`` equivalent: batch append + streaming micro-batch.

    The reference's ``num_partitions`` fixed writer fan-out (A2 list_parts,
    connector.py:456-468) maps to ``repartition(num_partitions, keys)``; its
    dual size/time flush trigger (A4, connector.py:187-191) maps to the
    streaming trigger interval (time) — Spark has no per-record count
    trigger, the documented semantic gap.
    """

    def __init__(self, spark: SparkSession, config: IcebergSinkConfig) -> None:
        if not isinstance(config, IcebergSinkConfig):
            # parity: IcebergSink.__init__ validates config type
            # (connector.py:451-454)
            raise TypeError("config must be an IcebergSinkConfig")
        self.spark = spark
        self.config = config
        self.backend = "iceberg" if iceberg_runtime_available(spark) else "parquet"
        if self.backend == "iceberg":
            for k, v in config.spark_catalog_conf().items():
                spark.conf.set(k, v)

    # -- identity ----------------------------------------------------------

    @property
    def _spec(self) -> list[PartitionField]:
        return [PartitionField(*f) if not isinstance(f, PartitionField) else f
                for f in (self.config.partition_spec or [])]

    @property
    def _qualified(self) -> str:
        return f"{self.config.catalog_name}.{self.config.table_name}"

    @property
    def _path(self) -> str:
        wh = self.config.warehouse_path or "/tmp/bic_spark_warehouse"
        return os.path.join(wh, *self.config.table_name.split("."))

    def table_exists(self) -> bool:
        if self.backend == "iceberg":
            return self.spark.catalog.tableExists(self._qualified)
        return os.path.isdir(self._path) and bool(os.listdir(self._path))

    # -- A9: load-or-create ------------------------------------------------

    def ensure_table(self, like: DataFrame) -> None:
        """Create the table if missing (A9, connector.py:358-393): schema
        from ``like``, hidden partition spec from config. No-op when present.

        Parity note: the reference raises when the table is missing AND no
        schema was declared (connector.py:389-392); here the DataFrame being
        written always carries its schema, strictly removing that failure
        mode.
        """
        if self.table_exists():
            return
        if self.backend == "iceberg":
            from pyspark.sql.functions import col, days, hours, months, years

            _tf = {"year": years, "month": months, "day": days, "hour": hours}
            parts = []
            for f in self._spec:
                t = f.transform.split("[")[0].split("(")[0]
                parts.append(_tf[t](col(f.source)) if t in _tf else col(f.source))
            writer = like.limit(0).writeTo(self._qualified)
            for k, v in self.config.table_properties().items():
                writer = writer.tableProperty(k, v)
            if parts:
                writer = writer.partitionedBy(*parts)
            writer.create()
        else:
            os.makedirs(self._path, exist_ok=True)
            keyed = partition_key(like.limit(0), self._spec)
            pcols = partition_columns(self._spec)
            w = keyed.write.mode("append")
            if pcols:
                w = w.partitionBy(*pcols)
            w.parquet(self._path)

    # -- A1/A4/A5: batch append -------------------------------------------

    def append(self, df: DataFrame) -> None:
        """Atomic-append a batch (the reference's _flush, collapsed).

        Partition-key grouping (A6) + per-group Arrow write + commit (A5)
        become: compute transform columns → hash-repartition on them →
        columnar write. Iceberg backend commits one snapshot; parquet
        backend relies on Spark's output-committer (task-temp + rename).
        """
        self.ensure_table(df)
        if self.backend == "iceberg":
            df.writeTo(self._qualified).append()
            return
        keyed = partition_key(df, self._spec)
        pcols = partition_columns(self._spec)
        if pcols:
            keyed = keyed.repartition(self.config.num_partitions, *pcols)
            keyed.write.mode("append").partitionBy(*pcols).parquet(self._path)
        else:
            keyed.repartition(self.config.num_partitions).write.mode("append").parquet(self._path)

    # -- streaming path (A1 streaming + A7 checkpoint) ---------------------

    def write_stream(self, df: DataFrame, checkpoint: str,
                     trigger_override: dict | None = None):
        """Micro-batch streaming write with exactly-once checkpointing.

        The reference checkpoints its unflushed buffer (A7); Spark instead
        replays from source offsets recorded in ``checkpointLocation`` and
        the file-sink manifest / Iceberg snapshot makes re-commits
        idempotent — the strictly stronger guarantee (SURVEY.md §3.3).

        ``trigger_override`` replaces the config's processing-time trigger
        (e.g. ``{"availableNow": True}`` to drain a bounded source).
        """
        trigger = trigger_override or self.config.trigger()
        if self.backend == "iceberg":
            return (
                df.writeStream.format("iceberg")
                .outputMode("append")
                .trigger(**trigger)
                .option("checkpointLocation", checkpoint)
                .toTable(self._qualified)
            )
        keyed = partition_key(df, self._spec)
        pcols = partition_columns(self._spec)
        writer = (
            keyed.writeStream.format("parquet")
            .outputMode("append")
            .trigger(**trigger)
            .option("path", self._path)
            .option("checkpointLocation", checkpoint)
        )
        if pcols:
            writer = writer.partitionBy(*pcols)
        return writer.start()

    # -- read-back ---------------------------------------------------------

    def read(self, merge_schema: bool = False) -> DataFrame:
        """Read the table back; ``merge_schema=True`` unions schemas across
        files so batches appended with ADDED columns surface (nulls for
        older rows) — the additive schema evolution the reference forbids
        ("Static schemas only", reference README.md:68). Iceberg handles
        this through table metadata; the parquet backend pays a footer
        merge pass, so keep it off for fixed-schema hot paths.
        """
        if self.backend == "iceberg":
            return self.spark.table(self._qualified)
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(self._path)
