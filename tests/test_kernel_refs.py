"""Third-reference kernel pins (r09 VERDICT item 6): the differential
gate is structurally blind to both-engines-agree-but-wrong (the
BPE/Sennrich precedent), so the agreement-risk vector kernels get an
INDEPENDENT pure-Python reference implementing the documented spec from
scratch — no numpy argmax/argsort/lexsort, no shared helper code — on
small adversarial fixtures (duplicate centroids, exact ties, zero
vectors, NULL ids, byte-identical re-ingest rows, negative ids).

Exactness discipline (the sign-LSH twin-pin precedent): every fixture
vector is INTEGER-valued, so all dot products and norms are exact in
float64 regardless of summation order (BLAS reordering vs sequential
loops), and any divergence is a real spec bug, never float noise. The
fractional values that k-means means introduce flow through identical
elementary IEEE operations in identical order on both sides (all
reductions are < 128 elements — below numpy's pairwise-summation
blocksize, so numpy sums sequentially too).
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bytewax_iceberg_connector_spark.plans.llm import (
    _IVF_MERGE_MOD,
    _IVF_MERGE_RESIDUE,
    _IVF_STRIDE,
    _PQ_ITERS,
    _PQ_K,
    _PQ_M,
    _PQ_REFINE,
    _PQ_REFINE_DIV,
    _PQ_SAMPLE,
    _QUERY_STRIDE,
    _TOPK,
    _ivf_nprobe,
)

DIM = 16  # _PQ_M=16 -> one component per subspace (sub=1)


def _dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _norm(a):
    return math.sqrt(_dot(a, a))


def _valid_rows(rows):
    """Pure-python restatement of the load_vectors quarantine: non-NULL
    id, non-NULL vector, modal dim (ties -> larger), nonzero; then
    DISTINCT (id, vector) rows (byte-identical re-ingest = one entity)."""
    dims = {}
    for _i, v in rows:
        if v is not None:
            dims[len(v)] = dims.get(len(v), 0) + 1
    if not dims:
        return []
    modal = sorted(dims.items(), key=lambda kv: (-kv[1], -kv[0]))[0][0]
    seen = set()
    out = []
    for i, v in rows:
        if i is None or v is None or len(v) != modal:
            continue
        if all(x == 0 for x in v):
            continue
        key = (i, tuple(v))
        if key in seen:
            continue
        seen.add(key)
        out.append((i, list(v)))
    return out


@pytest.fixture(scope="module")
def adv_ivf_dir(tmp_path_factory):
    """Adversarial IVF corpus: duplicate centroid vectors at two seed ids
    (every assignment to them is an exact tie), a vector exactly
    equidistant between two distinct seeds, zero vector, NULL id,
    byte-identical duplicate row, ragged row, negative ids."""
    d = tmp_path_factory.mktemp("adv_ivf")
    e = [[0] * DIM for _ in range(5)]
    # seeds: ids % 61 == 0 and (for the merge query) % 5 != 2
    e[0] = [3, 1] + [0] * (DIM - 2)            # seed id 0
    e[1] = [1, 3] + [0] * (DIM - 2)            # seed id 61
    e[2] = [2, 2, 1] + [0] * (DIM - 3)         # seed id 183
    e[3] = [3, 1] + [0] * (DIM - 2)            # seed id 244 == seed 0 (dup!)
    e[4] = [0, 0, 5] + [0] * (DIM - 3)         # seed id 305
    seeds = {0: e[0], 61: e[1], 183: e[2], 244: e[3], 305: e[4]}
    rows = list(seeds.items())
    # member vectors: assorted, incl. an exact tie between seeds 0 and 61
    # ([1,1,...] has equal cosine to [3,1] and [1,3]) and negative ids
    rows += [
        (1, [1, 1] + [0] * (DIM - 2)),      # exact tie 0 vs 61 -> cell 0
        (2, [5, 2] + [0] * (DIM - 2)),
        (3, [1, 4] + [0] * (DIM - 2)),
        (7, [0, 1, 9] + [0] * (DIM - 3)),   # id%5==2 -> "new" batch row
        (-7, [2, 1] + [0] * (DIM - 2)),
        (-13, [1, 2, 2] + [0] * (DIM - 3)),  # pmod(-13,5)==2 -> "new"
        (9, [4, 4] + [0] * (DIM - 2)),      # exact tie -> cell 0
        (12, [0, 0, 2] + [0] * (DIM - 3)),  # id%5==2 -> "new"
        (14, [6, 2, 1] + [0] * (DIM - 3)),
        (None, [9] * DIM),                   # NULL id: quarantined
        (15, [0] * DIM),                     # zero vector: quarantined
        (16, None),                          # NULL vector: quarantined
        (17, [1, 2]),                        # ragged: quarantined
        (14, [6, 2, 1] + [0] * (DIM - 3)),  # byte-identical re-ingest
    ]
    ids = [i for i, _ in rows]
    vecs = [v for _, v in rows]
    pq.write_table(
        pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [None if v is None else [float(x) for x in v] for v in vecs],
                pa.list_(pa.float32()),
            ),
        }),
        d / "embeddings.parquet",
    )
    return d, rows


def test_ivf_merge_assignment_matches_pure_python_reference(
    spark, adv_ivf_dir
):
    """similarity_ivf_merge's census vs a from-scratch reference of the
    documented spec: argmax over ROUND(cosine, 6) against the id-sorted
    seed block, exact ties to the SMALLER seed id (the duplicated seed
    244 must win nothing over seed 0), pmod batch split, quarantine and
    DISTINCT-row identity. DuckDB already agrees with the engine
    (CORRECTNESS gate) — this reference is the third vote that both
    aren't wrong together."""
    from bytewax_iceberg_connector_spark.plans.llm import similarity_ivf_merge

    d, rows = adv_ivf_dir
    got = {
        r["cell"]: (r["n_base"], r["n_added"], r["n_total"])
        for r in similarity_ivf_merge(spark, str(d)).collect()
    }

    valid = _valid_rows(rows)
    seeds = sorted(
        (i, v) for i, v in valid
        if i % _IVF_STRIDE == 0
        and i % _IVF_MERGE_MOD != _IVF_MERGE_RESIDUE  # ids here are >= 0
    )
    census: dict[int, list[int]] = {}
    for i, v in valid:
        best_cell, best_cos = None, None
        for cid, cv in seeds:  # id-ascending: strict > keeps ties low
            c = round(_dot(v, cv) / (_norm(v) * _norm(cv)), 6)
            if best_cos is None or c > best_cos:
                best_cell, best_cos = cid, c
        is_new = (i % _IVF_MERGE_MOD + _IVF_MERGE_MOD) % _IVF_MERGE_MOD \
            == _IVF_MERGE_RESIDUE
        n = census.setdefault(best_cell, [0, 0, 0])
        n[0] += 0 if is_new else 1
        n[1] += 1 if is_new else 0
        n[2] += 1
    want = {c: tuple(n) for c, n in census.items()}

    assert got == want, (got, want)
    # the fixture actually exercised the adversarial arms
    assert 244 not in got          # duplicated seed loses every tie to 0
    assert got[0][2] >= 4          # tie winners landed on the low seed


def _ref_train(rows):
    """From-scratch _pq_train_ctx per the documented spec: id-sorted
    centroid/sample subsets, residuals vs nearest centroid (first-min
    tie), per-subspace k-means with init = first K sorted residuals,
    _PQ_ITERS iterations, first-min assignment ties, empty clusters keep
    their previous centroid."""
    cen = sorted((i, v) for i, v in rows if i % _IVF_STRIDE == 0)
    c_ids = [i for i, _ in cen]
    C = [v for _, v in cen]
    sam = sorted((i, v) for i, v in rows if i % _PQ_SAMPLE == 0)
    X = [v for _, v in sam]

    def _nearest(v, refs):
        best, bd = 0, None
        for j, r in enumerate(refs):
            dd = sum((a - b) ** 2 for a, b in zip(v, r))
            if bd is None or dd < bd:
                best, bd = j, dd
        return best

    R = [[a - b for a, b in zip(x, C[_nearest(x, C)])] for x in X]
    sub = DIM // _PQ_M
    books = []
    for m in range(_PQ_M):
        S = [r[m * sub:(m + 1) * sub] for r in R]
        B = [list(s) for s in S[:_PQ_K]]
        for _ in range(_PQ_ITERS):
            assign = [_nearest(s, B) for s in S]
            for k in range(len(B)):
                members = [S[j] for j in range(len(S)) if assign[j] == k]
                if members:
                    B[k] = [
                        sum(col) / len(members) for col in zip(*members)
                    ]
        books.append(B)
    return c_ids, C, books


@pytest.fixture(scope="module")
def pq_corpus():
    """1000 integer-valued vectors (ids 0..999, deterministic LCG
    components in [-4, 5]), large enough that the ADC top-R cut is
    ACTIVE for every query (candidates per query > 4*_PQ_REFINE, so the
    approximate scores genuinely decide who reaches the exact re-rank);
    the corpus spans two _BLOCK tiles, exercising the per-tile kernel
    against the tile-agnostic reference. Duplicate sample rows and a
    duplicated centroid vector keep the tie arms live."""
    n = 1000
    vecs = []
    state = 12345
    for i in range(n):
        v = []
        for _ in range(DIM):
            state = (state * 1103515245 + 12345) % (1 << 31)
            v.append(state % 10 - 4)
        if all(x == 0 for x in v):
            v[0] = 1
        vecs.append(v)
    vecs[122] = list(vecs[61])   # duplicated CENTROID vector (61 and 122)
    vecs[14] = list(vecs[7])     # duplicated SAMPLE rows (both % 7 == 0)
    return [(i, vecs[i]) for i in range(n)]


def test_pq_train_ctx_matches_pure_python_kmeans(pq_corpus):
    """The deterministic codebook training (_pq_train_ctx) vs the
    from-scratch k-means above — bit-identical centroid ids, centroid
    matrix, and all _PQ_M codebooks, with the broadcast arriving in a
    hostile (reversed) collect order to prove order-invariance."""
    import numpy as np

    from bytewax_iceberg_connector_spark.plans.llm import _pq_train_ctx

    rows = list(reversed(pq_corpus))  # hostile collect_list order
    all_ids = [i for i, _ in rows]
    all_vecs = [[float(x) for x in v] for _, v in rows]
    c_ids, C, books = _pq_train_ctx(all_ids, all_vecs)

    ref_ids, ref_C, ref_books = _ref_train(pq_corpus)
    assert list(c_ids) == ref_ids
    np.testing.assert_array_equal(C, np.asarray(ref_C, dtype=np.float64))
    assert len(books) == _PQ_M == len(ref_books)
    for m in range(_PQ_M):
        np.testing.assert_array_equal(
            books[m], np.asarray(ref_books[m], dtype=np.float64)
        )


def test_ivf_pq_topk_matches_pure_python_pipeline(spark, pq_corpus,
                                                  tmp_path_factory):
    """END-TO-END third reference for the PQ ADC scoring path: the full
    _ivf_pq_topk result (coarse assign -> residual PQ encode -> ADC
    lookup-table scoring -> top-R cut -> exact re-rank -> top-5) vs a
    from-scratch pipeline of the documented spec. The corpus is sized so
    the ADC cut is ACTIVE (> 4*_PQ_REFINE candidates/query): wrong ADC
    scores change which candidates reach the exact re-rank and the final
    top-5 diverges — the agreement-risk surface the oracle can't see."""
    import numpy as np  # noqa: F401  (engine side only)

    from bytewax_iceberg_connector_spark.plans.llm import _ivf_pq_topk

    d = tmp_path_factory.mktemp("pq_corpus")
    pq.write_table(
        pa.table({
            "vec_id": pa.array([i for i, _ in pq_corpus], pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for _, v in pq_corpus],
                pa.list_(pa.float32()),
            ),
        }),
        d / "embeddings.parquet",
    )
    got = [
        (r["q_id"], r["rank"], r["neighbor_id"], r["score"])
        for r in _ivf_pq_topk(spark, str(d)).collect()
    ]

    # ---- reference pipeline ----
    rows = _valid_rows(pq_corpus)
    c_ids, C, books = _ref_train(rows)
    nprobe = min(_ivf_nprobe(len(c_ids)), len(c_ids))
    sub = DIM // _PQ_M

    def _probe_cells(v):
        """argsort(-cos) over the id-sorted centroid block, stable ties."""
        cos = []
        nv = _norm(v)
        for cid, cv in zip(c_ids, C):
            cos.append(_dot(v, cv) / (nv * _norm(cv)))
        order = sorted(range(len(cos)), key=lambda j: (-cos[j], j))
        return [c_ids[j] for j in order[:nprobe]]

    member, code, nrm = {}, {}, {}
    cvec = dict(zip(c_ids, C))
    for i, v in rows:
        cells = _probe_cells(v)
        member[i] = cells[0]
        resid = [a - b for a, b in zip(v, cvec[cells[0]])]
        code[i] = []
        for m in range(_PQ_M):
            s = resid[m * sub:(m + 1) * sub]
            best, bd = 0, None
            for k, b in enumerate(books[m]):
                dd = sum((a - x) ** 2 for a, x in zip(s, b))
                if bd is None or dd < bd:
                    best, bd = k, dd
            code[i].append(best)
        nrm[i] = _norm(v)

    want = []
    queries = sorted(i for i, _ in rows if i % _QUERY_STRIDE == 0)
    for qid in queries:
        qv = dict(rows)[qid]
        qn = _norm(qv)
        probed = set(_probe_cells(qv))
        cands = sorted(
            i for i, _ in rows if i != qid and member[i] in probed
        )
        assert len(cands) > _PQ_REFINE * _PQ_REFINE_DIV, (
            "fixture too small: the ADC cut is inactive and the test "
            f"proves nothing ({len(cands)} candidates)"
        )
        table = [
            [_dot(b, qv[m * sub:(m + 1) * sub]) for b in books[m]]
            for m in range(_PQ_M)
        ]
        adc = {}
        for i in cands:
            # association per the kernel: centroid dot + (SUM of the M
            # table entries) — not a running accumulation from the dot
            resid = 0.0
            for m in range(_PQ_M):
                resid += table[m][code[i][m]]
            dot = _dot(qv, cvec[member[i]]) + resid
            adc[i] = round(dot / (qn * nrm[i]), 6)
        n_keep = max(_PQ_REFINE, len(cands) // _PQ_REFINE_DIV)
        survivors = sorted(cands, key=lambda i: (-adc[i], i))[:n_keep]
        vec = dict(rows)
        exact = {
            i: round(_dot(qv, vec[i]) / (qn * _norm(vec[i])), 6)
            for i in survivors
        }
        top = sorted(survivors, key=lambda i: (-exact[i], i))[:_TOPK]
        for rank, i in enumerate(top, start=1):
            want.append((qid, rank, i, exact[i]))

    assert sorted(got) == sorted(want), (
        sorted(set(want) - set(got))[:5],
        sorted(set(got) - set(want))[:5],
    )


def test_topk_cols_stable_matches_full_stable_argsort():
    """The r11 top-slice selection must be bit-identical to the full-row
    stable argsort it replaced — including exact ties AT the k-th
    boundary (the case plain argpartition gets wrong) and NaN rows."""
    import numpy as np

    from bytewax_iceberg_connector_spark.plans.llm import _topk_cols_stable

    rng = np.random.default_rng(7)
    for K in (3, 64, 65, 200, 513):
        for k in (1, 3, min(17, K), K):
            cos = rng.random((40, K))
            # force heavy exact ties, incl. at the selection boundary
            cos[::2] = np.round(cos[::2], 1)
            cos[5] = 0.5                         # whole row tied
            cos[7, : K // 2] = cos[7, K // 2]    # half row tied
            if K > 64:                           # NaN fallback path
                cos[9] = np.nan
                cos[11, ::3] = np.nan
            want = np.argsort(-cos, axis=1, kind="stable")[:, :k]
            got = _topk_cols_stable(cos, k)
            assert got.shape == want.shape, (K, k)
            assert (got == want).all(), (K, k)
