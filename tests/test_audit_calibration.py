"""r07 audit-slice calibration: the two formerly-O(N²) registered audits
(`dedup_embedding_cosine`, `semantic_dedup`) now run on a declared-ppm
hash-admitted slice of the corpus. These tests pin

1. the SAMPLING CONTRACT — the registered slice output equals the
   full-corpus exact form restricted to admitted ids (no approximation
   inside the slice, the admission predicate is the only difference) at
   two SFs;
2. the ADMISSION predicate's three-way parity (Spark expression ==
   DuckDB oracle twin == the Python reference used by fixture tests);
3. the CALIBRATION floors — the semantic audit's coverage flag stays
   green on the slice across all three test SFs (the floor was probed on
   the slice, not the corpus, since r07).
"""

from __future__ import annotations

import hashlib

import pytest

from bytewax_iceberg_connector_spark.plans import llm as L

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]


def _py_admit(vec_id: int) -> bool:
    return (
        int(hashlib.md5(f"emb:{vec_id}".encode()).hexdigest()[:6], 16) % 1_000_000
        < L._EMB_SAMPLE_PPM
    )


def _pairs(df):
    return {
        (r.vec_a, r.vec_b, round(r.cos_sim, 6)) for r in df.collect()
    }


@pytest.mark.parametrize("sf", SFS)
def test_cosine_slice_equals_exact_restricted_to_admitted(spark, sf):
    """The registered audit slice is EXACT on its slice: it must equal the
    full-corpus O(N²) twin restricted to pairs whose BOTH endpoints are
    admitted — same ids, same rounded-6dp scores."""
    got = _pairs(L.dedup_embedding_cosine(spark, sf))
    full = _pairs(L._dedup_embedding_cosine_exact(spark, sf))
    want = {t for t in full if _py_admit(t[0]) and _py_admit(t[1])}
    assert got == want
    assert len(want) > 0, "fixture slice must contain real near-dup pairs"
    assert len(want) < len(full), "slice must be a strict subset of full"


def test_admission_three_way_parity(spark):
    """Spark's conv(md5) expression, the DuckDB oracle twin, and the
    Python reference must admit the SAME vec_ids over a dense id range —
    the whole oracle-checkability of the sliced audits rests on this."""
    import duckdb
    from pyspark.sql import functions as F

    n = 2000
    spark_ids = {
        r.vec_id
        for r in spark.range(n)
        .select(F.col("id").alias("vec_id"))
        .filter(L._emb_sample_admit())
        .collect()
    }
    duck_ids = {
        r[0]
        for r in duckdb.sql(
            f"SELECT vec_id FROM (SELECT range AS vec_id FROM range({n}))"
            f" WHERE {L.SQL_EMB_SAMPLE_ADMIT}"
        ).fetchall()
    }
    py_ids = {i for i in range(n) if _py_admit(i)}
    assert spark_ids == py_ids
    assert duck_ids == py_ids
    # rate sanity: the declared ppm is a real admission rate, not 0/100%
    assert 0.15 * n < len(py_ids) < 0.35 * n


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_semantic_audit_flags_green_on_slice_all_sfs(spark, sf):
    """The coverage floor (_SEM_COVERAGE_PPM) was re-probed on the
    hash-admitted slice when the audit moved off the full corpus (r07):
    every flag must hold at all three synthetic SFs, with a non-vacuous
    reach so coverage_ok is genuinely on the line."""
    r = L.semantic_dedup(spark, sf).collect()[0]
    assert r.n_vectors > 0 and r.n_dup_reach > 0
    assert r.members_conserved == 1
    assert r.dropped_bounded == 1
    assert r.coverage_ok == 1
    assert r.cells_ok == 1
