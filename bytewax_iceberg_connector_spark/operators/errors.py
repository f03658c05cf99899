"""Dual-stream (oks/errs) result contract — the reference API's signature
feature.

Reference: ``IcebergOpOut(oks, errs)`` /root/reference/src/
bytewax_iceberg_connector/operators.py:58-84 and ``_iceberg_error_split``
operators.py:263-287 (branch by isinstance(IcebergSinkMessage)).

Spark-first translation: a record's error state is a COLUMN (``_error``),
not a Python type; the split is two complementary filters over one Catalyst
plan. Both branches share the scan (Spark reuses the subplan / exchange), so
unlike the reference there is no per-stage Python map cost and the split is
free at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: error column carried through operator chains; NULL ⇒ record is ok.
ERROR_COL = "_error"


@dataclass(frozen=True)
class OpOut:
    """Parity with IcebergOpOut (operators.py:58-84): a pair of streams."""

    oks: DataFrame
    errs: DataFrame


def with_error_col(df: DataFrame) -> DataFrame:
    """Ensure the _error column exists (NULL = ok)."""
    if ERROR_COL in df.columns:
        return df
    return df.withColumn(ERROR_COL, F.lit(None).cast("string"))


def error_split(df: DataFrame, drop_error_col: bool = True) -> OpOut:
    """Split a mixed stream into oks/errs (A14, operators.py:263-287).

    ``errs`` keeps the offending record intact plus the error message —
    the dead-letter pattern (reference IcebergError keeps the failed record,
    models.py:67-101).
    """
    df = with_error_col(df)
    oks = df.filter(F.col(ERROR_COL).isNull())
    if drop_error_col:
        oks = oks.drop(ERROR_COL)
    errs = df.filter(F.col(ERROR_COL).isNotNull())
    return OpOut(oks=oks, errs=errs)
