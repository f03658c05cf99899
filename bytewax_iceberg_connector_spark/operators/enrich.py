"""Metadata-enrichment operator (A13).

Reference: ``enrich_with_metadata`` /root/reference/src/
bytewax_iceberg_connector/operators.py:494-552 — maps each message through a
caller-supplied ``enricher`` callable, routing failures to the error stream.

Spark-first translation: the enricher is a mapping of new-column-name →
Column expression, applied in one ``withColumns`` — JVM-side, codegen'd,
zero Python. The callable form exists for parity (Arrow-batched), same
trade-off as validate.validate_with_callable.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .errors import ERROR_COL, OpOut, error_split


def enrich_with_metadata(
    df: DataFrame,
    columns: Mapping[str, Column],
    processing_time: bool = False,
) -> OpOut:
    """Add derived/metadata columns; expression errors → error stream.

    ``processing_time=True`` adds the classic ``processed_at`` wall-clock
    stamp (the reference's canonical enricher example, operators.py:509-513)
    — off by default to keep queries deterministic.
    """
    out = df.withColumns(dict(columns))
    if processing_time:
        out = out.withColumn("processed_at", F.current_timestamp())
    # Column expressions are total functions (errors surface as NULL under
    # ANSI-off), so the err stream is structurally empty here; the split is
    # kept for API parity with the reference's oks/errs contract.
    return error_split(out.withColumn(ERROR_COL, F.lit(None).cast("string")))


def enrich_with_callable(
    df: DataFrame,
    enricher: Callable[[dict], dict],
    result_schema: str,
) -> OpOut:
    """Arbitrary-Python enrichment via Arrow batches (parity slow path).

    ``result_schema`` is the DDL of the enriched row. Rows whose enrichment
    raises are routed to errs with the exception text (reference
    operators.py:536-543).
    """
    import pandas as pd
    from pyspark.sql.types import _parse_datatype_string

    schema = f"{result_schema}, {ERROR_COL} STRING"
    out_cols = _parse_datatype_string(schema).fieldNames()

    def _apply(it):
        for pdf in it:
            rows = []
            for rec in pdf.to_dict("records"):
                try:
                    enriched = enricher(dict(rec))
                    enriched[ERROR_COL] = None
                except Exception as exc:  # noqa: BLE001 - dead-letter contract
                    enriched = dict(rec)
                    enriched[ERROR_COL] = f"enrichment failed: {exc!r:.200}"
                rows.append(enriched)
            # pin the column set: a batch whose rows all failed would
            # otherwise miss enricher-added columns entirely
            yield pd.DataFrame(rows, columns=out_cols)

    return error_split(df.mapInPandas(_apply, schema=schema))
