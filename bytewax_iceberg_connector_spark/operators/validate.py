"""Schema/rule validation operator (A11).

Reference: ``validate_schema`` /root/reference/src/bytewax_iceberg_connector/
operators.py:354-426 — validates each record with a caller-supplied callable
(default: "is a dict"), routing failures to the error stream.

Spark-first translation: rules are boolean *Column expressions*, evaluated
JVM-side inside whole-stage codegen — no Python in the hot path. The first
failing rule's name becomes the ``_error`` value (reference embeds a message
string the same way). A caller who truly needs arbitrary Python validation
uses ``validate_with_callable`` (Arrow-batched pandas path), the analogue of
the reference's callable hook — but at 100 TB the expression form is the one
that survives.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .errors import ERROR_COL, OpOut, error_split


def validate_schema(
    df: DataFrame,
    rules: Mapping[str, Column] | None = None,
) -> OpOut:
    """Validate rows against named boolean rules; route failures to errs.

    ``rules`` maps rule-name → Column predicate that must hold. With no rules
    the parity default applies: every row is structurally a Row (the
    reference's default just checks ``isinstance(x, dict)``,
    operators.py:402-406), so everything passes.
    """
    if not rules:
        return error_split(df.withColumn(ERROR_COL, F.lit(None).cast("string")))
    err = F.lit(None).cast("string")
    # reverse so the FIRST declared failing rule wins, like sequential checks
    for name, cond in reversed(list(rules.items())):
        err = F.when(~F.coalesce(cond, F.lit(False)), F.lit(f"validation failed: {name}")).otherwise(err)
    return error_split(df.withColumn(ERROR_COL, err))


def validate_with_callable(
    df: DataFrame,
    validator: Callable[[dict], bool],
    error_message: str = "validation failed",
) -> OpOut:
    """Arbitrary-Python validation via Arrow-batched pandas (slow path).

    Parity with the reference's callable hook (operators.py:358); batches
    cross the JVM↔Python boundary as Arrow, ~10-100x better than row-at-a-time
    UDFs, but still orders slower than expression rules — keep off hot paths.
    """
    from pyspark.sql import types as T

    cols = df.columns

    def _check(it):
        for pdf in it:
            ok = pdf.apply(lambda r: bool(validator(r.to_dict())), axis=1)
            out = pdf.copy()
            out[ERROR_COL] = [None if o else error_message for o in ok]
            yield out

    schema = T.StructType(list(df.schema.fields) + [T.StructField(ERROR_COL, T.StringType())])
    return error_split(df.mapInPandas(_check, schema=schema).select(*cols, ERROR_COL))
