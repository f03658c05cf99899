"""Operator-layer tests: error routing (A14), validation (A11), enrichment
(A13), SerDes (A15-A18). Mirrors the reference's claimed unit coverage
(README.md:120-123) on the Spark implementations."""

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from bytewax_iceberg_connector_spark.operators import (
    ERROR_COL,
    JsonSerDe,
    ParquetSerDe,
    PickleSerDe,
    enrich_with_callable,
    enrich_with_metadata,
    error_split,
    serialize_records,
    validate_schema,
    validate_with_callable,
)


def _events(spark):
    return spark.createDataFrame(
        [
            Row(id=1, kind="click", value=10.0),
            Row(id=2, kind="purchase", value=-5.0),
            Row(id=3, kind="mystery", value=1.0),
        ]
    )


def test_error_split_routes_by_error_col(spark):
    df = _events(spark).withColumn(
        ERROR_COL, F.when(F.col("id") == 2, F.lit("boom")).otherwise(F.lit(None))
    )
    out = error_split(df)
    assert [r.id for r in out.oks.orderBy("id").collect()] == [1, 3]
    assert ERROR_COL not in out.oks.columns  # dropped on the ok stream
    errs = out.errs.collect()
    assert len(errs) == 1 and errs[0][ERROR_COL] == "boom"  # record kept intact
    assert errs[0].id == 2


def test_validate_schema_first_failing_rule_wins(spark):
    # sequential-validator parity: first declared failing rule is reported
    out = validate_schema(
        _events(spark),
        {
            "value_nonneg": F.col("value") >= 0,
            "known_kind": F.col("kind").isin(["click", "purchase"]),
        },
    )
    errs = {r.id: r[ERROR_COL] for r in out.errs.collect()}
    assert errs == {
        2: "validation failed: value_nonneg",
        3: "validation failed: known_kind",
    }
    assert [r.id for r in out.oks.collect()] == [1]


def test_validate_schema_no_rules_passes_everything(spark):
    # parity default: "is a dict" (operators.py:402-406) — rows always are
    out = validate_schema(_events(spark))
    assert out.oks.count() == 3 and out.errs.count() == 0


def test_validate_with_callable(spark):
    out = validate_with_callable(_events(spark), lambda d: d["value"] > 0, "nonpos")
    assert sorted(r.id for r in out.oks.collect()) == [1, 3]
    assert [r[ERROR_COL] for r in out.errs.collect()] == ["nonpos"]


def test_enrich_with_metadata(spark):
    out = enrich_with_metadata(
        _events(spark), {"double_value": F.col("value") * 2}
    )
    got = {r.id: r.double_value for r in out.oks.collect()}
    assert got == {1: 20.0, 2: -10.0, 3: 2.0}
    assert out.errs.count() == 0


def test_enrich_with_callable_routes_failures(spark):
    def enricher(d):
        if d["id"] == 2:
            raise ValueError("bad record")
        return {**d, "tag": d["kind"].upper()}

    out = enrich_with_callable(
        _events(spark), enricher, "id BIGINT, kind STRING, value DOUBLE, tag STRING"
    )
    assert sorted(r.tag for r in out.oks.collect()) == ["CLICK", "MYSTERY"]
    errs = out.errs.collect()
    assert len(errs) == 1 and "bad record" in errs[0][ERROR_COL]


def test_json_serde_roundtrip(spark):
    df = _events(spark)
    serde = JsonSerDe(schema="id BIGINT, kind STRING, value DOUBLE")
    packed = serde.serialize(df)
    assert packed.columns == ["json_data"]
    payload = json.loads(packed.orderBy(F.col("json_data")).first()["json_data"])
    assert set(payload) == {"id", "kind", "value"}
    back = serde.deserialize(packed)
    assert sorted((r.id, r.kind) for r in back.collect()) == sorted(
        (r.id, r.kind) for r in df.collect()
    )


def test_parquet_serde_demotes_nested(spark):
    # operators.py:197-199: list/dict → JSON strings; primitives untouched
    df = spark.createDataFrame(
        [Row(id=1, tags=["a", "b"], meta={"k": 1}, name="x")]
    )
    flat = ParquetSerDe().serialize(df)
    types = dict(flat.dtypes)
    assert types["tags"] == "string" and types["meta"] == "string"
    assert types["id"] == "bigint" and types["name"] == "string"
    row = flat.first()
    assert json.loads(row.tags) == ["a", "b"]
    assert json.loads(row.meta) == {"k": 1}


def test_pickle_serde_roundtrip(spark):
    df = _events(spark)
    serde = PickleSerDe()
    packed = serde.serialize(df)
    assert set(packed.columns) == {"pickle_data", "type"}
    assert packed.first()["type"] == "pickle"  # operators.py:235-241 envelope
    decoded = serde.deserialize(packed)
    payloads = [json.loads(r.json_data) for r in decoded.collect()]
    assert sorted(p["id"] for p in payloads) == [1, 2, 3]


def test_serialize_records_default_parquet(spark):
    out = serialize_records(_events(spark))
    assert out.errs.count() == 0
    assert out.oks.count() == 3


def test_serialize_poisoned_column_routes_to_errs(spark):
    """Per-column error capture: one bad value in ONE column sends exactly
    that row to errs with the column named; clean rows keep their coerced
    types (the reference's per-record try/except, now declarative)."""
    from bytewax_iceberg_connector_spark.operators.serialize import (
        ParquetSerDe,
        serialize_records,
    )

    df = spark.createDataFrame(
        [("1", "a"), ("not-a-number", "b"), ("3", "c")], "n STRING, s STRING"
    )
    out = serialize_records(df, ParquetSerDe(target_schema={"n": "int"}))
    errs = out.errs.collect()
    assert len(errs) == 1
    assert errs[0].s == "b" and "column n" in errs[0]._error
    oks = out.oks.collect()
    assert sorted(r.n for r in oks) == [1, 3]  # coerced to int, not string
    assert dict(out.oks.dtypes)["n"] == "int"


def test_pickle_serde_failure_is_null_not_crash(spark):
    """A NULL payload row pickles fine; the all-null probe only fires when
    the encoder itself nulls out — regression net for the try/except."""
    from bytewax_iceberg_connector_spark.operators.serialize import (
        PickleSerDe,
        serialize_records,
    )

    df = spark.createDataFrame([(1, "x"), (2, None)], "a INT, b STRING")
    out = serialize_records(df, PickleSerDe())
    assert out.oks.count() == 2 and out.errs.count() == 0


def test_observe_errors_single_action(spark):
    """A26 op.inspect analogue: error metrics come out of the SAME action
    that consumed the frame — no second job."""
    from pyspark.sql import functions as F

    from bytewax_iceberg_connector_spark.operators.inspect import observe_errors

    df = spark.createDataFrame(
        [(1, None), (2, "boom"), (3, None), (4, "bad")], "id INT, _error STRING"
    )
    observed, obs = observe_errors(df)
    n_ok = observed.where(F.col("_error").isNull()).count()  # the one action
    assert n_ok == 2
    got = obs.get
    assert got["n_rows"] == 4 and got["n_errors"] == 2
    assert got["first_error"] in ("boom", "bad")
