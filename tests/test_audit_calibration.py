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


def _gen_clustered(n, d):
    """Deterministic clustered corpus (32 Gaussian centers, 64-dim) at
    two sizes from ONE distribution — isolates the N-scaling of ANN
    recall from distribution shift. Seed fixed; same generator as the
    r07 probe run that calibrated the floors."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rs = np.random.RandomState(7)
    centers = rs.randn(32, 64) * 2.0
    labels = rs.randint(0, 32, n)
    vecs = centers[labels] + rs.randn(n, 64)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    vecs.astype(np.float32).tolist(), pa.list_(pa.float32())
                ),
                "label": pa.array(labels.astype(np.int32), pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    return str(d)


@pytest.mark.deep
def test_ann_recall_stable_under_corpus_growth(spark, tmp_path):
    """The r06 verdict's calibration hazard: recall fell with N at fixed
    probes, so the recall_ok floors could go red on a bigger corpus with
    no engine bug. r07 made the producers N-adaptive (probes ~ sqrt(K),
    PQ refine ~ candidates/4); this pins the scaling law — at 4× the
    corpus, each variant's recall must not sag more than 0.10 below its
    small-corpus value, and all must clear their audit floors with
    margin. (Probed r07: LSH 0.985→0.99, IVF 0.975→1.00, PQ 0.975→0.93.)"""
    from bytewax_iceberg_connector_spark.plans.llm import (
        _IVF_PQ_RECALL_PPM,
        _IVF_RECALL_PPM,
        _LSH_RECALL_PPM,
        _ann_lsh_topk,
        _ivf_pq_topk,
        _ivf_topk,
        similarity_topk,
    )

    def recall(ann_df, exact_df):
        e = {(r.q_id, r.neighbor_id) for r in exact_df.collect()}
        a = {(r.q_id, r.neighbor_id) for r in ann_df.collect()}
        return len(e & a) / len(e)

    variants = {
        "lsh": (_ann_lsh_topk, _LSH_RECALL_PPM),
        "ivf": (_ivf_topk, _IVF_RECALL_PPM),
        "pq": (_ivf_pq_topk, _IVF_PQ_RECALL_PPM),
    }
    got = {}
    for n in (2000, 8000):
        d = tmp_path / f"synth{n}"
        d.mkdir()
        _gen_clustered(n, d)
        exact = similarity_topk(spark, str(d))
        for name, (fn, _) in variants.items():
            got[(name, n)] = recall(fn(spark, str(d)), exact)
    for name, (_, floor_ppm) in variants.items():
        small, big = got[(name, 2000)], got[(name, 8000)]
        assert big >= small - 0.10, (name, small, big)
        for r in (small, big):
            assert r * 1_000_000 >= floor_ppm + 100_000, (name, r, floor_ppm)


@pytest.mark.parametrize(
    "sf",
    [
        "/root/testdata/sf0.001",
        pytest.param("/root/testdata/sf0.01", marks=pytest.mark.deep),
        pytest.param("/root/testdata/sf0.1", marks=pytest.mark.deep),
    ],
)
def test_ann_audit_floors_hold_at_all_sfs(spark, sf):
    """The registered audits' recall_ok flags (the floors the driver
    hash-checks against the oracle's literal 1) must hold at every
    synthetic SF — the flag must never go red from scale alone."""
    from bytewax_iceberg_connector_spark.plans.llm import (
        similarity_ann_lsh,
        similarity_ivf,
        similarity_ivf_pq,
    )

    for fn in (similarity_ann_lsh, similarity_ivf, similarity_ivf_pq):
        rows = fn(spark, sf).collect()
        assert rows and all(r.recall_ok == 1 for r in rows), (fn.__name__, sf)
        assert all(r.ann_bounded == 1 for r in rows), (fn.__name__, sf)


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
