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
        return df.sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(_norm(spdf), _norm(opdf), check_dtype=False)
