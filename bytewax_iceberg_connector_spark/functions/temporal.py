"""Calendar-safe temporal helpers.

The r10 extreme-timestamp lake probe found that comparing a column
against a plain Python ``datetime`` silently shifts pre-1582 values:
pyspark's py4j literal converter routes through ``java.sql.Timestamp``,
whose HYBRID (Julian/Gregorian) calendar rebases proleptic dates — so
``F.col("ts") == datetime(1, 1, 3)`` compiles to the literal
``0001-01-05 00:00:00`` and matches nothing, while the column's own
values (parquet, Arrow, DuckDB, and every engine computation —
proleptic Gregorian throughout) are correct. The
``spark.sql.datetime.java8API.enabled`` conf does NOT reach this
converter (verified empirically on pyspark 4.1.2); the shift is an
upstream literal-conversion wart, not an engine calendar bug.

``ts_lit`` is the safe way to build a timestamp literal: it routes
through an ISO string, which Catalyst parses prolepticly — exact for
the full year 1–9999 range.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_lit(value: dt.datetime | str) -> Column:
    """Proleptic-exact timestamp literal (see module docstring: a plain
    ``F.lit(datetime)`` shifts pre-1582 values by up to 2 days)."""
    if isinstance(value, dt.datetime):
        value = value.isoformat(sep=" ")
    return F.to_timestamp(F.lit(value))
