"""Config model parity tests (reference models.py:104-262)."""

import warnings

import pytest
from pydantic import ValidationError

from bytewax_iceberg_connector_spark.config import (
    CatalogType,
    FileFormat,
    IcebergSinkConfig,
)


def test_defaults_match_reference():
    # models.py:149-166 defaults: batch 1000 / 15s / 1 partition / parquet
    c = IcebergSinkConfig(table_name="db.t")
    assert c.batch_size == 1000
    assert c.batch_interval_seconds == 15
    assert c.num_partitions == 1
    assert c.file_format == FileFormat.PARQUET


@pytest.mark.parametrize(
    "field,value",
    [
        ("batch_size", 0),
        ("batch_size", 100_001),
        ("batch_interval_seconds", 0),
        ("batch_interval_seconds", 301),
        ("num_partitions", 0),
        ("num_partitions", 101),
    ],
)
def test_guardrails_reject_out_of_range(field, value):
    # models.py:149-166 field constraints
    with pytest.raises(ValidationError):
        IcebergSinkConfig(table_name="db.t", **{field: value})


def test_warning_validators():
    # models.py:204-218: warn (not reject) on long intervals / many partitions
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        IcebergSinkConfig(table_name="db.t", batch_interval_seconds=120, num_partitions=60)
    messages = " | ".join(str(w.message) for w in caught)
    assert "60s" in messages and "small files" in messages


def test_presets():
    # models.py:220-262
    hi = IcebergSinkConfig.for_high_throughput("db.t")
    assert (hi.batch_size, hi.batch_interval_seconds, hi.num_partitions) == (10_000, 30, 8)
    lo = IcebergSinkConfig.for_low_latency("db.t")
    assert (lo.batch_size, lo.batch_interval_seconds, lo.num_partitions) == (100, 5, 2)
    pb = IcebergSinkConfig.for_petabyte_scale("db.t")
    assert (pb.batch_size, pb.batch_interval_seconds, pb.num_partitions) == (50_000, 60, 32)
    assert pb.file_format == FileFormat.PARQUET


def test_spark_compilation():
    c = IcebergSinkConfig(
        table_name="db.t",
        catalog_name="lake",
        catalog_type=CatalogType.REST,
        catalog_uri="http://example.invalid:8181",
        warehouse_path="/tmp/wh",
        extra_options={"io-impl": "x.Y"},
    )
    conf = c.spark_catalog_conf()
    assert conf["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.lake.type"] == "rest"
    assert conf["spark.sql.catalog.lake.uri"] == "http://example.invalid:8181"
    assert conf["spark.sql.catalog.lake.warehouse"] == "/tmp/wh"
    assert conf["spark.sql.catalog.lake.io-impl"] == "x.Y"
    assert c.trigger() == {"processingTime": "15 seconds"}
    props = c.table_properties()
    assert props["commit.retry.num-retries"] == "3"  # connector.py:201 parity
    assert props["write.distribution-mode"] == "hash"


def test_session_pins_broadcast_threshold_and_state_store():
    """r12 pins: the 64 MB broadcast threshold (triangle_count closure
    join de-bimodalized — BASELINE.md r12 adjudication) and the RocksDB
    state-store provider (dedup_first_seen state-loss mitigation) are
    session DEFAULTS; losing either in a session.py refactor would
    silently reintroduce the flip / the flake. They live in _TUNING_CONF
    (set-once per session), NOT _RUNTIME_CONF: re-applying them on every
    load_table clobbered user threshold overrides mid-query (r12 find)."""
    from bytewax_iceberg_connector_spark.session import (
        _RUNTIME_CONF,
        _TUNING_CONF,
    )

    assert _TUNING_CONF["spark.sql.autoBroadcastJoinThreshold"] == str(
        64 * 1024 * 1024
    )
    assert _TUNING_CONF[
        "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ] == str(64 * 1024 * 1024)
    assert _TUNING_CONF[
        "spark.sql.streaming.stateStore.providerClass"
    ].endswith("RocksDBStateStoreProvider")
    assert not set(_TUNING_CONF) & set(_RUNTIME_CONF)


def test_ensure_engine_conf_respects_user_tuning_overrides(spark):
    """A user's explicit threshold override must survive ensure_engine_conf
    (load_table calls it on every load): tuning defaults are set-once."""
    from bytewax_iceberg_connector_spark.session import ensure_engine_conf

    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        ensure_engine_conf(spark)
        assert spark.conf.get(key) == "-1"
        # invariants DO re-apply
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set(key, old)
