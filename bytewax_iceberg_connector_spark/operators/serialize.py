"""SerDe layer + serialize operator (A10, A15–A19).

Reference: /root/reference/src/bytewax_iceberg_connector/operators.py —
``IcebergSerDe`` base (90-99), ``JsonSerDe`` (102-153), ``ParquetSerDe``
(156-210), ``PickleSerDe`` (213-249), module defaults (253-260), and the
``serialize_records`` operator (290-351).

Spark-first translation: a SerDe is a *DataFrame→DataFrame codec*, not a
per-record callable. Encoding happens once in the Catalyst plan (to_json /
casts — JVM, codegen), not per record in Python. Only PickleSerDe needs a
Python UDF (arbitrary object graphs are not SQL-expressible — quarantined
off hot paths, exactly as SURVEY.md §7 prescribes).

Scale: JsonSerDe/ParquetSerDe stay inside whole-stage codegen at any scale;
PickleSerDe pays one Python worker round-trip per batch and should only ever
see low-volume control streams.
"""

from __future__ import annotations

import base64
import pickle

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .errors import ERROR_COL, OpOut, error_split

#: columns treated as envelope metadata, never payload
#: (IcebergSinkMessage fields, models.py:27-64)
META_COLS = ("event_timestamp", ERROR_COL)


def _payload_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c not in META_COLS]


class IcebergSerDe:
    """Abstract codec contract (operators.py:90-99)."""

    def serialize(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def deserialize(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError


class JsonSerDe(IcebergSerDe):
    """Payload ↔ single JSON-string column (operators.py:102-153).

    ``serialize`` packs every payload column into ``json_field`` via
    ``to_json(struct(...))``; ``deserialize`` needs the row schema (Spark is
    schema-first — pass a DDL string or StructType, or use
    ``schema_of_json`` upstream on a sample).
    """

    def __init__(self, json_field: str = "json_data",
                 schema: T.StructType | str | None = None) -> None:
        self.json_field = json_field
        self.schema = schema

    def serialize(self, df: DataFrame) -> DataFrame:
        payload = _payload_cols(df)
        meta = [c for c in df.columns if c not in payload]
        return df.select(
            F.to_json(F.struct(*payload)).alias(self.json_field), *meta
        )

    def deserialize(self, df: DataFrame) -> DataFrame:
        if self.schema is None:
            raise ValueError("JsonSerDe.deserialize requires a schema")
        meta = [c for c in df.columns if c != self.json_field]
        parsed = df.withColumn("_parsed", F.from_json(F.col(self.json_field), self.schema))
        return parsed.select("_parsed.*", *meta)


class ParquetSerDe(IcebergSerDe):
    """Coerce rows to a Parquet-safe flat schema (operators.py:156-210).

    Reference semantics: primitives pass through (operators.py:190-196),
    ``list``/``dict`` values are JSON-stringified (197-199), anything else
    is ``str()``-ed (200-201); deserialize is identity (203-210).

    Here: nested Spark types (array/map/struct) → ``to_json`` strings,
    primitives and timestamps untouched, exotic types → string cast. NOTE
    this demotion exists for *parity and interop* — natively the engine keeps
    nested types first-class (see plans/llm.py multimodal queries), which is
    the deliberate upgrade over the reference.

    ``target_schema`` ({column: Spark type DDL}) coerces named columns to
    the table's declared types via ``try_cast`` — the reference's
    per-record type coercion toward the table schema (operators.py:
    190-201), null-on-failure so serialize_records can route the exact
    failing column to the error stream instead of crashing the batch.
    """

    def __init__(self, target_schema: dict[str, str] | None = None) -> None:
        self.target_schema = target_schema or {}

    def column_exprs(self, df: DataFrame) -> list[tuple[str, Column]]:
        """(name, encoder expression) per column — the per-column contract
        serialize_records' error capture compares against."""
        out: list[tuple[str, Column]] = []
        for f in df.schema.fields:
            tgt = self.target_schema.get(f.name)
            if tgt is not None:
                out.append((f.name, F.col(f.name).try_cast(tgt)))
            elif isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                out.append((f.name, F.to_json(F.col(f.name))))
            elif isinstance(f.dataType, (T.NumericType, T.StringType, T.BooleanType,
                                         T.TimestampType, T.DateType, T.BinaryType)):
                out.append((f.name, F.col(f.name)))
            else:
                out.append((f.name, F.col(f.name).try_cast("string")))
        return out

    def serialize(self, df: DataFrame) -> DataFrame:
        return df.select(*[e.alias(n) for n, e in self.column_exprs(df)])

    def deserialize(self, df: DataFrame) -> DataFrame:
        return df


class PickleSerDe(IcebergSerDe):
    """Payload ↔ base64(pickle) string column (operators.py:213-249).

    The reference stores ``{pickle_field: base64(pickle.dumps(x)),
    "type": "pickle"}``. Only SerDe requiring Python execution; plain UDF by
    necessity (pickled object graphs are opaque to Arrow/SQL).
    """

    def __init__(self, pickle_field: str = "pickle_data") -> None:
        self.pickle_field = pickle_field

    def serialize(self, df: DataFrame) -> DataFrame:
        payload = _payload_cols(df)
        meta = [c for c in df.columns if c not in payload]

        @F.udf(returnType=T.StringType())
        def _enc(row) -> str | None:
            # null-on-failure (reference's per-record try/except,
            # operators.py:290-351): the all-null probe downstream routes
            # the row to errs instead of the exception killing the batch
            try:
                return base64.b64encode(
                    pickle.dumps(row.asDict(recursive=True))
                ).decode("ascii")
            except Exception:
                return None

        return df.select(
            _enc(F.struct(*payload)).alias(self.pickle_field),
            F.lit("pickle").alias("type"),
            *meta,
        )

    def deserialize(self, df: DataFrame) -> DataFrame:
        """Decode to a JSON string column (schema-free); chain
        ``JsonSerDe(schema=...).deserialize`` to recover typed columns."""
        import json

        @F.udf(returnType=T.StringType())
        def _dec(s: str) -> str | None:
            if s is None:
                return None
            return json.dumps(pickle.loads(base64.b64decode(s)), default=str)

        return df.withColumn("json_data", _dec(F.col(self.pickle_field)))


#: module-level defaults (operators.py:253-260)
DEFAULT_JSON_SERDE = JsonSerDe()
DEFAULT_PARQUET_SERDE = ParquetSerDe()
DEFAULT_PICKLE_SERDE = PickleSerDe()


def serialize_records(
    df: DataFrame,
    serde: IcebergSerDe | None = None,
    stamp_event_time: bool = False,
) -> OpOut:
    """A10 (operators.py:290-351): encode payloads, split failures.

    ``stamp_event_time`` adds the reference's ``event_timestamp=now_ms``
    envelope field (models.py:64) — off by default because wall-clock stamps
    break deterministic replay/oracle comparison.

    Error capture — the reference's per-record try/except (operators.py:
    290-351) as declarative column probes, JVM-side:
    - **ParquetSerDe** (per-column codecs): each column's encoder is a
      ``try_*`` expression that yields NULL on failure; a NULL-out on a
      NULL-in source is legitimate, so the probe flags exactly the columns
      where (source non-NULL ∧ encoded NULL), first-fail-wins, naming the
      column in ``_error`` — one poisoned column routes the ROW to errs
      while clean rows keep flowing.
    - **envelope serdes** (Json/Pickle: payload collapses into one field):
      the weaker whole-payload probe — encoded field NULL while the row
      had payload. PickleSerDe's UDF is null-on-failure so this net
      actually catches.
    """
    serde = serde or DEFAULT_PARQUET_SERDE
    if isinstance(serde, ParquetSerDe):
        exprs = serde.column_exprs(df)
        cases = [
            F.when(
                F.col(n).isNotNull() & e.isNull(),
                F.lit(f"column {n} failed to encode"),
            )
            for n, e in exprs if n not in META_COLS
        ]
        err = F.coalesce(*cases) if cases else F.lit(None)
        encoded = df.select(
            *[e.alias(n) for n, e in exprs if n != ERROR_COL],
            err.cast("string").alias(ERROR_COL),
        )
        if stamp_event_time:
            encoded = encoded.withColumn(
                "event_timestamp",
                (F.unix_micros(F.current_timestamp()) / 1000).cast("long"),
            )
        return error_split(encoded)
    encoded = serde.serialize(df)
    if stamp_event_time:
        encoded = encoded.withColumn(
            "event_timestamp", (F.unix_micros(F.current_timestamp()) / 1000).cast("long")
        )
    probe_cols = [
        f.name for f in encoded.schema.fields
        if isinstance(f.dataType, T.StringType) and f.name not in META_COLS and f.name != "type"
    ]
    if probe_cols:
        all_null = F.lit(True)
        for c in probe_cols:
            all_null = all_null & F.col(c).isNull()
        err = F.when(all_null, F.lit("serialization produced no payload"))
    else:  # pragma: no cover - serde with no string output
        err = F.lit(None)
    encoded = encoded.withColumn(ERROR_COL, err.cast("string") if probe_cols else F.lit(None).cast("string"))
    return error_split(encoded)
