"""Shared fixture-corpus differential helpers for the degenerate-input
suites (test_corpus.py, test_profiling.py): one DuckDB-oracle runner and
one frame canonicalizer, so every adversarial-shape suite enforces the
SAME comparison contract."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings"
).split()


def duck_oracle(dirpath, sql: str) -> pd.DataFrame:
    """Run oracle SQL over whichever corpus tables exist as parquet in
    ``dirpath`` (registered under their standard view names)."""
    con = duckdb.connect()
    for t in TABLES:
        p = dirpath / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    try:
        return con.sql(sql).df()
    finally:
        con.close()


def spark_to_pandas(df) -> pd.DataFrame:
    """``toPandas`` that survives timestamps outside pandas' ns range.

    Spark's Arrow collection coerces timestamp columns to datetime64[ns],
    so a query whose OUTPUT carries year-0001/9999 values (SCD2
    sentinels, corrupt-upstream rows the ts-extremes sweep plants) raises
    ArrowInvalid even though the engine computed fine. Fall back to row
    collection: JVM timestamps arrive as python datetime (years 1-9999),
    normalized by assert_df_match onto datetime64[us]."""
    spark = df.sparkSession
    # Spark's toPandas silently falls back to its NON-Arrow path on Arrow
    # errors, which converts through the hybrid Julian calendar — pre-1582
    # values shift by up to 2 days (or ValueError on year 0) instead of
    # failing loudly. Disable that fallback so the error reaches US, then
    # collect through java.time (proleptic Gregorian — matching Arrow,
    # DuckDB, and the engine's own arithmetic).
    fb_key = "spark.sql.execution.arrow.pyspark.fallback.enabled"
    old_fb = spark.conf.get(fb_key, "true")
    spark.conf.set(fb_key, "false")
    try:
        return df.toPandas()
    except Exception:
        j8_key = "spark.sql.datetime.java8API.enabled"
        old_j8 = spark.conf.get(j8_key, "false")
        spark.conf.set(j8_key, "true")
        try:
            rows = df.collect()
        finally:
            spark.conf.set(j8_key, old_j8)
        return pd.DataFrame(
            [r.asDict(recursive=True) for r in rows], columns=df.columns
        )
    finally:
        spark.conf.set(fb_key, old_fb)


def assert_df_match(spdf: pd.DataFrame, opdf: pd.DataFrame) -> None:
    """Order-insensitive frame equality under a shared canonical form:
    columns sorted by name, rows sorted by every column. Column SETS must
    match exactly first — an oracle-only helper column left in the final
    SELECT is a shape divergence, not something to silently drop."""
    cols = sorted(spdf.columns)
    assert sorted(opdf.columns) == cols, (
        f"column sets diverge: spark={cols} oracle={sorted(opdf.columns)}"
    )

    def _norm(df):
        import datetime as dt

        df = df[cols].copy()
        for c in cols:
            s = df[c]
            # Spark DATE arrives as datetime.date objects, DuckDB DATE as
            # midnight datetime64 — same value, different carrier. Unify
            # onto python date objects (never pd.to_datetime: its
            # datetime64[ns] ceiling raises OutOfBoundsDatetime on
            # sentinel dates like 9999-12-31 that adversarial fixtures
            # legitimately use).
            if pd.api.types.is_datetime64_any_dtype(s):
                if s.dropna().dt.time.eq(dt.time()).all():
                    df[c] = s.dt.date
                else:
                    # Spark arrives as datetime64[ns], DuckDB as [us];
                    # assert_frame_equal(check_dtype=False) compares the
                    # RAW int64 payloads across units, so same instants
                    # "differ" by 1000x. Unify on [us] (Spark timestamps
                    # are µs-precision; ns→us is lossless here, and [us]
                    # still holds sentinel dates like 9999-12-31 that
                    # would overflow [ns]).
                    df[c] = s.dt.as_unit("us")
            elif s.dtype == object and len(s.dropna()) and s.dropna().map(
                lambda v: isinstance(v, dt.datetime)
            ).all():
                if all(
                    v.time() == dt.time() for v in s.dropna()
                ):
                    df[c] = s.map(
                        lambda v: v.date() if isinstance(v, dt.datetime) else v
                    )
                else:
                    # spark_to_pandas' collect() fallback carries python
                    # datetimes as objects — unify on [us] like the
                    # datetime64 branch so they compare against DuckDB
                    df[c] = s.astype("datetime64[us]")
        return df.sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(_norm(spdf), _norm(opdf), check_dtype=False)
