"""r11-staged queries (register after the r11 gate lands, the r10
stage-then-register discipline): full differential pins at sf0.001 so the
staged surface cannot rot while it waits for a rotation-window slot."""

from pathlib import Path

import pytest

from _diffutil import assert_df_match, duck_oracle, spark_to_pandas

_SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not Path(_SF).exists(), reason="driver testdata absent")
def test_staged_similarity_mmr_matches_oracle(spark):
    from bytewax_iceberg_connector_spark.plans.llm import (
        _MMR_K,
        _SQL_SIM_MMR,
        similarity_mmr,
    )

    sp = spark_to_pandas(similarity_mmr(spark, _SF))
    du = duck_oracle(Path(_SF), _SQL_SIM_MMR)
    assert len(sp) and len(sp) % _MMR_K == 0
    assert_df_match(sp, du)
    # diversity actually bites: at least one query's MMR pick sequence
    # must differ from the pure relevance top-k (else the query is just
    # similarity_topk again). Measured 10/10 queries reordered at
    # sf0.001 and 40/40 at sf0.1 for the 7/3 balance.
    from bytewax_iceberg_connector_spark.plans.llm import _topk_scored

    rel = spark_to_pandas(_topk_scored(spark, _SF, _MMR_K))
    rel_seq = rel.sort_values(["q_id", "rank"]).groupby("q_id")[
        "neighbor_id"].apply(tuple)
    mmr_seq = sp.sort_values(["q_id", "mmr_rank"]).groupby("q_id")[
        "cand_id"].apply(tuple)
    assert (rel_seq != mmr_seq).any(), (
        "MMR never reordered any query's candidates"
    )


@pytest.mark.skipif(not Path(_SF).exists(), reason="driver testdata absent")
def test_staged_run_length_segments_matches_oracle(spark):
    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_RUN_LENGTH,
        run_length_segments,
    )

    sp = spark_to_pandas(run_length_segments(spark, _SF))
    du = duck_oracle(Path(_SF), _SQL_RUN_LENGTH)
    assert len(sp)
    assert_df_match(sp, du)
    # islands sanity: runs_ge3 <= n_runs, max_run >= mean/100
    assert (sp["runs_ge3"] <= sp["n_runs"]).all()
    assert (sp["max_run"] * 100 >= sp["mean_len_x100"]).all()


def test_r11_staged_queries_are_registered_r12():
    """Stage-then-register cadence, r12 half: the three r11-staged
    queries are now LIVE (moved into QUERIES/ORACLE at the start of
    r12) and each carries an oracle. They lead the gate window only
    WHILE never driver-checked; once a CORRECTNESS artifact records
    them green (the r12 drop did), they rotate by staleness like every
    other green query — assert the tier they are actually in."""
    from bytewax_iceberg_connector_spark.plans import registry

    registered = {"similarity_mmr", "run_length_segments",
                  "doc_winnowing"}
    live = registry.all_queries()
    oracles = registry.all_oracles()
    assert registered <= set(live)
    assert registered <= set(oracles)
    records = registry._driver_records()
    window = list(live)[:50]
    unchecked = registered - set(records)
    # never-driver-checked staged queries must lead the window (rank
    # right after any reds; there are no reds in the artifacts)
    assert unchecked <= set(window[: max(len(unchecked), 1) + 2]), (
        window[:5]
    )
    for name in registered & set(records):
        # driver-checked: the record must be GREEN (a red would re-lead
        # the window and mean the staged query regressed)
        assert records[name][1], (name, records[name])


@pytest.mark.skipif(not Path(_SF).exists(), reason="driver testdata absent")
def test_staged_doc_winnowing_matches_oracle(spark):
    from bytewax_iceberg_connector_spark.plans.corpus import (
        _SQL_WINNOWING,
        doc_winnowing,
    )

    sp = spark_to_pandas(doc_winnowing(spark, _SF))
    du = duck_oracle(Path(_SF), _SQL_WINNOWING)
    assert len(sp)
    assert_df_match(sp, du)
    # winnowing density guarantee: expected 2/(w+1) of grams selected;
    # must also never exceed 1 fingerprint/gram
    full = sp[sp["n_grams"] >= 20]
    assert len(full) and (full["n_fp"] <= full["n_grams"]).all()
    assert 100_000 < full["fp_density_ppm"].median() < 600_000


# -- third-reference pins (r10 methodology): the differential gate is
# blind to both-engines-agree-but-wrong, so each staged query also gets
# an INDEPENDENT pure-Python reference implementing the documented spec
# from scratch — different algorithm where possible (linear-scan islands
# vs the engines' rn-difference trick), integer-valued fixture vectors so
# every dot product is exact in float64 regardless of summation order.

import math

import pyarrow as pa
import pyarrow.parquet as pq


def _dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


@pytest.mark.deep
def test_similarity_mmr_matches_pure_python_reference(spark, tmp_path):
    from bytewax_iceberg_connector_spark.plans.llm import (
        _MMR_C,
        _MMR_K,
        _QUERY_STRIDE,
        similarity_mmr,
    )

    DIM = 8
    rows = [
        (0, [4, 0, 0, 0, 0, 0, 0, 0]),       # query
        (50, [0, 4, 0, 0, 0, 0, 0, 0]),      # query
        (-100, [1, 1, 0, 0, 0, 0, 0, 0]),    # negative-id query
        # a near-duplicate cluster: pure relevance ranks all three high,
        # MMR must push the redundant copies down
        (1, [4, 1, 0, 0, 0, 0, 0, 0]),
        (2, [4, 1, 0, 0, 0, 0, 0, 0]),       # exact tie with 1 (id-asc)
        (3, [8, 2, 0, 0, 0, 0, 0, 0]),       # same direction, scaled
        # byte-identical re-ingest duplicate (the r12 adversarial-corpus
        # find): a pick excludes the ID — 3 must never be selected twice
        (3, [8, 2, 0, 0, 0, 0, 0, 0]),
        # diverse spread
        (4, [3, 3, 0, 0, 0, 0, 0, 0]),
        (5, [0, 3, 3, 0, 0, 0, 0, 0]),
        (6, [1, 0, 5, 0, 0, 0, 0, 0]),
        (8, [2, 2, 2, 2, 0, 0, 0, 0]),
        (9, [0, 0, 0, 7, 0, 0, 0, 0]),
        (11, [5, 0, 0, 5, 0, 0, 0, 0]),
        (13, [1, 2, 3, 4, 0, 0, 0, 0]),
        (-7, [0, 1, 1, 1, 1, 0, 0, 0]),
        # quarantine rows
        (None, [9] * DIM),
        (21, None),
        (22, [0] * DIM),
        (23, [1, 2]),
    ]
    d = tmp_path / "mmr"
    d.mkdir()
    pq.write_table(
        pa.table({
            "vec_id": pa.array([i for i, _ in rows], pa.int64()),
            "embedding": pa.array(
                [None if v is None else [float(x) for x in v]
                 for _, v in rows],
                pa.list_(pa.float32()),
            ),
        }),
        d / "embeddings.parquet",
    )

    got = {
        (r.q_id, r.mmr_rank): (r.cand_id, r.mmr_score_u)
        for r in similarity_mmr(spark, str(d)).collect()
    }

    # pure-python reference, from the spec
    modal = {}
    for i, v in rows:
        if v is not None:
            modal[len(v)] = modal.get(len(v), 0) + 1
    dim = max(sorted(modal), key=lambda k: (modal[k], k))
    valid = [
        (i, v) for i, v in rows
        if i is not None and v is not None and len(v) == dim
        and any(x != 0 for x in v)
    ]
    vecs = dict(valid)
    want = {}
    for qid, qv in valid:
        if qid % _QUERY_STRIDE != 0:
            continue
        scored = sorted(
            (
                (cid, round(_dot(qv, cv)
                            / (math.sqrt(_dot(qv, qv))
                               * math.sqrt(_dot(cv, cv))), 6))
                for cid, cv in valid if cid != qid
            ),
            key=lambda t: (-t[1], t[0]),
        )[:_MMR_C]
        rel = {c: math.floor(s * 1e6 + 0.5) for c, s in scored}
        sim = {
            (a, b): math.floor(
                round(_dot(vecs[a], vecs[b])
                      / (math.sqrt(_dot(vecs[a], vecs[a]))
                         * math.sqrt(_dot(vecs[b], vecs[b]))), 6)
                * 1e6 + 0.5
            )
            for a, _ in scored for b, _ in scored if a != b
        }
        picked = []
        for step in range(1, min(_MMR_K, len(scored)) + 1):
            best = None
            for cid, _ in scored:
                if cid in picked:
                    continue
                ms = max((sim[(cid, p)] for p in picked), default=0)
                mmr = 7 * rel[cid] - 3 * ms
                if best is None or (-mmr, cid) < best[0]:
                    best = ((-mmr, cid), cid, mmr)
            picked.append(best[1])
            want[(qid, step)] = (best[1], best[2])
    assert got == want, (
        sorted(set(want) - set(got)), sorted(set(got) - set(want)),
        {k: (got.get(k), want.get(k)) for k in want if got.get(k) != want[k]},
    )
    # the fixture must actually exercise the diversity trade: some
    # query's picks must not be the pure-relevance prefix
    assert any(
        [want[(q, s)][0] for s in range(1, 6) if (q, s) in want]
        != [c for c, _ in sorted(
            ((cid, round(_dot(vecs[q], cv)
                         / (math.sqrt(_dot(vecs[q], vecs[q]))
                            * math.sqrt(_dot(cv, cv))), 6))
             for cid, cv in valid if cid != q),
            key=lambda t: (-t[1], t[0]))][:5]
        for q in {k[0] for k in want}
    )


@pytest.mark.deep
def test_run_length_segments_matches_pure_python_reference(spark, tmp_path):
    import datetime as dt

    from bytewax_iceberg_connector_spark.plans.behavioral import (
        run_length_segments,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    # (event_id, ts, user_id, event_type): exact-ts ties with NULL
    # event_ids, interleaved users, NULL-field rows that must drop
    ev = [
        (1, t0, 10, "a"), (2, t0 + m, 10, "a"), (3, t0 + 2 * m, 10, "a"),
        (4, t0 + 3 * m, 10, "b"), (5, t0 + 4 * m, 10, "a"),
        (None, t0 + 4 * m, 10, "a"),        # NULL id tied with id 5's ts
        (None, t0 + 4 * m, 10, "b"),        # second NULL id, same ts
        (6, t0, 20, "b"), (7, t0, 20, "b"),  # exact tie, ids order
        (8, t0 + m, 20, "a"),
        (9, None, 20, "a"),                  # NULL ts: dropped
        (10, t0 + m, None, "a"),             # NULL user: dropped
        (11, t0 + 2 * m, 20, None),          # NULL type: dropped
        (12, t0 + 2 * m, 20, "b"),
    ]
    d = tmp_path / "rls"
    d.mkdir()
    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in ev], pa.int64()),
            "ts": pa.array([r[1] for r in ev], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in ev], pa.int64()),
            "event_type": pa.array([r[3] for r in ev], pa.string()),
            "value": pa.array([1.0] * len(ev), pa.float64()),
            "props": pa.array(["{}"] * len(ev), pa.string()),
        }),
        d / "events.parquet",
    )

    got = {
        r.event_type: (r.n_runs, r.max_run, r.runs_ge3, r.mean_len_x100)
        for r in run_length_segments(spark, str(d)).collect()
    }

    # independent formulation: per-user linear scan over the pinned
    # order, counting maximal constant runs directly (no row-number
    # difference trick)
    keep = [r for r in ev
            if r[1] is not None and r[2] is not None and r[3] is not None]
    runs = []
    for u in sorted({r[2] for r in keep}):
        seq = sorted(
            (r for r in keep if r[2] == u),
            key=lambda r: (
                r[1],
                (0, 0) if r[0] is None else (1, r[0]),  # NULLS FIRST
                r[3],
            ),
        )
        cur_t, cur_n = None, 0
        for r in seq:
            if r[3] == cur_t:
                cur_n += 1
            else:
                if cur_t is not None:
                    runs.append((cur_t, cur_n))
                cur_t, cur_n = r[3], 1
        if cur_t is not None:
            runs.append((cur_t, cur_n))
    want = {}
    for t in sorted({t for t, _ in runs}):
        ls = [n for tt, n in runs if tt == t]
        want[t] = (len(ls), max(ls), sum(1 for n in ls if n >= 3),
                   sum(ls) * 100 // len(ls))
    assert got == want, (got, want)
    # the tie rows must actually have landed where the pinned order says
    assert want["a"][1] >= 3  # user 10's leading a-run survives the tie


@pytest.mark.deep
def test_doc_winnowing_matches_pure_python_reference(spark, tmp_path):
    """From-scratch winnowing reference: the paper's imperative
    formulation (slide a window of W gram hashes, record each window's
    rightmost minimum, keep the distinct selections) — no window
    functions, no packed keys — over a crafted corpus with heavy hash
    ties (repeated grams), short docs (partial-window rule), empty and
    NULL texts, and a byte-identical duplicate row."""
    import hashlib

    from bytewax_iceberg_connector_spark.plans.corpus import (
        _WINNOW_K,
        _WINNOW_W,
        doc_winnowing,
    )

    texts = {
        1: "a b c d e f g h i j k l m n o p",          # normal doc
        2: "x x x x x x x x x x",                       # all grams tied
        3: "a b c d",                                   # exactly one gram
        4: "a b c",                                     # too short: 0 grams
        5: "",                                          # empty: 0 grams
        6: None,                                        # NULL text
        7: "a b c d e f g h i j k l m n o p",          # same text as 1
    }
    rows = list(texts.items()) + [(7, texts[7])]        # duplicate row
    pq.write_table(
        pa.table({
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array(
                [len(t) if t else 0 for _, t in rows], pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_fp, r.fp_density_ppm, r.fp_checksum,
                   r.fp_min)
        for r in doc_winnowing(spark, str(tmp_path)).collect()
    }

    def winnow(text):
        if not text:
            return 0, []
        tk = [w for w in text.lower().split() if w]
        grams = [" ".join(tk[i:i + _WINNOW_K])
                 for i in range(max(len(tk) - _WINNOW_K + 1, 0))]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:6], 16)
              for g in grams]
        picked = set()
        for j in range(len(hs)):
            lo = max(j - _WINNOW_W + 1, 0)
            if j >= _WINNOW_W - 1 or j == len(hs) - 1:
                window = hs[lo:j + 1]
                m = min(window)
                # rightmost minimum — scan from the right
                for off in range(len(window) - 1, -1, -1):
                    if window[off] == m:
                        picked.add((lo + off, hs[lo + off]))
                        break
        return len(hs), sorted(picked)

    for d, t in texts.items():
        n_grams, picks = winnow(t)
        n_fp = len(picks)
        checksum = sum(h for _, h in picks)
        fmin = min((h for _, h in picks), default=0)
        dens = n_fp * 1_000_000 // n_grams if n_grams else 0
        assert got[d] == (n_grams, n_fp, dens, checksum, fmin), (
            d, got[d], (n_grams, n_fp, dens, checksum, fmin))
    assert got[1] == got[7]  # duplicate row + same text elsewhere agree
    # the all-tied doc: every window picks its RIGHTMOST gram
    n2, picks2 = winnow(texts[2])
    assert [p for p, _ in picks2] == list(range(_WINNOW_W - 1, n2))


# =========================================================================
# r12-staged queries (register at the start of r13): differential pins at
# sf0.001 + from-scratch pure-Python third references, same discipline as
# the r11 batch above.
# =========================================================================


def test_staged_r12_dicts_are_not_registered():
    """Stage discipline, r12 half: the r12-staged names must NOT be in
    the live registry until r13 (the r12 window is already committed to
    the three r11 registrations + the r07/r08-stale greens)."""
    from bytewax_iceberg_connector_spark.plans import (
        behavioral,
        corpus,
        llm,
        registry,
    )

    staged = (set(llm.R12_QUERIES) | set(behavioral.R12_QUERIES)
              | set(corpus.R12_QUERIES))
    assert staged == {"ngram_novelty", "session_entropy",
                      "multimodal_dedup"}
    live = set(registry.all_queries())
    assert not (staged & live)
    assert (set(llm.R12_ORACLE) | set(behavioral.R12_ORACLE)
            | set(corpus.R12_ORACLE)) == staged


@pytest.mark.skipif(not Path(_SF).exists(), reason="driver testdata absent")
def test_staged_ngram_novelty_matches_oracle(spark):
    from bytewax_iceberg_connector_spark.plans.corpus import (
        _SQL_NGRAM_NOVELTY,
        ngram_novelty,
    )

    sp = spark_to_pandas(ngram_novelty(spark, _SF))
    du = duck_oracle(Path(_SF), _SQL_NGRAM_NOVELTY)
    assert len(sp)
    assert_df_match(sp, du)
    # novelty sanity: ppm bounded, the corpus has SOME novelty
    assert (sp["avg_novel_ppm"] <= 1_000_000).all()
    assert sp["avg_novel_ppm"].max() > 0
    assert (sp["n_fully_novel"] + sp["n_zero_novel"] <= sp["n_docs"]).all()


@pytest.mark.skipif(not Path(_SF).exists(), reason="driver testdata absent")
def test_staged_session_entropy_matches_oracle(spark):
    from bytewax_iceberg_connector_spark.plans.behavioral import (
        _SQL_SESSION_ENTROPY,
        session_entropy,
    )

    sp = spark_to_pandas(session_entropy(spark, _SF))
    du = duck_oracle(Path(_SF), _SQL_SESSION_ENTROPY)
    assert len(sp)
    assert_df_match(sp, du)
    # entropy of k types is bounded by ln(k) (+1 micro-nat of rounding)
    import math

    for _, r in sp.iterrows():
        cap = int(math.log(r["n_types"]) * 1e6) + len(sp) + 1
        assert 0 <= r["max_entropy_micro"] <= cap + 1


@pytest.mark.skipif(not Path(_SF).exists(), reason="driver testdata absent")
def test_staged_multimodal_dedup_matches_oracle(spark):
    from bytewax_iceberg_connector_spark.plans.llm import (
        _SQL_MULTIMODAL_DEDUP,
        multimodal_dedup,
    )

    sp = spark_to_pandas(multimodal_dedup(spark, _SF))
    du = duck_oracle(Path(_SF), _SQL_MULTIMODAL_DEDUP)
    assert len(sp)
    assert_df_match(sp, du)
    # canonicalization can only MERGE classes: canon dupes >= exact dupes
    assert (sp["n_canon_dupes"] >= sp["n_exact_dupes"]).all()


@pytest.mark.deep
def test_ngram_novelty_matches_pure_python_reference(spark, tmp_path):
    """From-scratch reference: set-of-trigrams per doc, first-seer by min
    doc_id — over a corpus with an exact copy (novelty 0), a partial
    derivative, a short doc (no grams: absent from the census), a NULL
    doc_id row (dropped), and a byte-identical duplicate row."""
    texts = {
        10: "the quick brown fox jumps over the lazy dog",
        20: "the quick brown fox jumps over the lazy dog",   # exact copy
        30: "the quick brown fox sat very still today ok",   # partial
        40: "one two",                                       # no grams
        50: "alpha beta gamma delta",                        # one gram.. 2
    }
    rows = ([(d, t, "s1" if d < 30 else "s2") for d, t in texts.items()]
            + [(None, "null id doc text here", "s1"),
               (30, texts[30], "s2")])                       # dup row
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )
    from bytewax_iceberg_connector_spark.plans.corpus import ngram_novelty

    got = {
        r.source: (r.n_docs, r.avg_novel_ppm, r.n_fully_novel,
                   r.n_zero_novel)
        for r in ngram_novelty(spark, str(tmp_path)).collect()
    }

    def grams(t):
        tk = [w for w in t.lower().split() if w]
        return {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}

    per = {d: grams(t) for d, t in texts.items() if grams(t)}
    first = {}
    for d in sorted(per):
        for g in per[d]:
            first.setdefault(g, d)
    want = {}
    for src in ("s1", "s2"):
        docs = [d for d in per
                if (("s1" if d < 30 else "s2") == src)]
        ppms = {d: sum(1 for g in per[d] if first[g] == d) * 1_000_000
                // len(per[d]) for d in docs}
        want[src] = (
            len(docs),
            sum(ppms.values()) // len(docs),
            sum(1 for p in ppms.values() if p == 1_000_000),
            sum(1 for p in ppms.values() if p == 0),
        )
    assert got == want, (got, want)
    assert want["s1"][3] >= 1  # the exact copy really scored zero


@pytest.mark.deep
def test_session_entropy_matches_pure_python_reference(spark, tmp_path):
    """From-scratch reference: direct Shannon entropy with math.log and
    the same micro-nat quantization — uniform user (max entropy),
    single-type bot (0 nats, >=10 events: flagged), skewed user, NULL
    user/type rows dropped."""
    import datetime as dt
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1)
    ev = []
    eid = 0

    def add(u, ty, k):
        nonlocal eid
        for _ in range(k):
            ev.append((eid, t0, u, ty, 1.0))
            eid += 1

    add(1, "a", 5)          # uniform over 2 types
    add(1, "b", 5)
    add(2, "a", 20)         # bot: 20 events, 1 type -> flagged
    add(3, "a", 9)          # low entropy but only 10 events? 9+1=10
    add(3, "b", 1)
    add(4, "a", 3)          # 3 types, skewed
    add(4, "b", 2)
    add(4, "c", 1)
    ev.append((eid, t0, None, "a", 1.0)); eid += 1
    ev.append((eid, t0, 5, None, 1.0)); eid += 1

    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in ev], pa.int64()),
            "ts": pa.array([r[1] for r in ev], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in ev], pa.int64()),
            "event_type": pa.array([r[3] for r in ev], pa.string()),
            "value": pa.array([r[4] for r in ev], pa.float64()),
            "props": pa.array(["{}"] * len(ev), pa.string()),
        }),
        tmp_path / "events.parquet",
    )
    from bytewax_iceberg_connector_spark.plans.behavioral import (
        session_entropy,
    )

    got = {
        r.n_types: (r.n_users, r.avg_entropy_micro, r.min_entropy_micro,
                    r.max_entropy_micro, r.n_bot_like)
        for r in session_entropy(spark, str(tmp_path)).collect()
    }

    counts = {}
    for _, _, u, ty, _ in ev:
        if u is None or ty is None:
            continue
        counts.setdefault(u, {}).setdefault(ty, 0)
        counts[u][ty] += 1
    per_u = {}
    for u, cs in counts.items():
        n = sum(cs.values())
        micro = sum(
            c * int(math.floor(
                (math.log(n) - math.log(c)) * 1e6 + 0.5))
            for c in cs.values()
        ) // n
        per_u[u] = (len(cs), n, micro)
    want = {}
    for nt in sorted({v[0] for v in per_u.values()}):
        us = [v for v in per_u.values() if v[0] == nt]
        micros = [m for _, _, m in us]
        want[nt] = (
            len(us),
            sum(micros) // len(us),
            min(micros),
            max(micros),
            sum(1 for _, n, m in us if m < 300_000 and n >= 10),
        )
    assert got == want, (got, want)
    assert want[1][4] >= 1          # the bot really got flagged
    # uniform 2-type user sits at ln(2) up to quantization
    assert abs(per_u[1][2] - 693147) <= 2


@pytest.mark.deep
def test_multimodal_dedup_matches_pure_python_reference(spark, tmp_path):
    """From-scratch reference with hashlib: exact copies, whitespace
    variants (canon dup, not exact), a unicode-NBSP variant (NOT
    canon-collapsed: the shared WS_CLASS is ASCII-only by contract), and
    NULL payloads dropping out of both counts."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        ("s1", "Hello World"),
        ("s1", "Hello World"),            # exact dup
        ("s1", "hello   world"),          # canon dup of the above
        ("s1", "hello world"),       # NBSP: NOT a canon dup
        ("s1", None),                     # unhashable: out of census
        ("s2", "unique text"),
        ("s2", "UNIQUE\ttext "),          # canon dup via tab+trim+case
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array([t for _, t in texts], pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array([s for s, _ in texts], pa.string()),
            "n_chars": pa.array(
                [len(t) if t else 0 for _, t in texts], pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )
    from bytewax_iceberg_connector_spark.plans.llm import multimodal_dedup

    got = {
        r.source: (r.n_assets, r.n_exact_dupes, r.n_canon_dupes,
                   r.exact_dup_ppm)
        for r in multimodal_dedup(spark, str(tmp_path)).collect()
    }

    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    want = {}
    for src in ("s1", "s2"):
        ts = [t for s, t in texts if s == src and t is not None]
        ex = [hashlib.md5(t.encode()).hexdigest() for t in ts]
        cn = [hashlib.md5(ws.sub(" ", t.lower()).strip(" \t\n\x0b\f\r")
                          .encode()).hexdigest() for t in ts]
        want[src] = (
            len(ts),
            len(ts) - len(set(ex)),
            len(ts) - len(set(cn)),
            (len(ts) - len(set(ex))) * 1_000_000 // len(ts),
        )
    assert got == want, (got, want)
    assert want["s1"][2] > want["s1"][1]   # canon merged MORE than exact


# -- staged ADVERSARIAL gate (r12 lesson): a staged query must survive the
# shared adversarial corpus for every table it reads BEFORE registration.
# similarity_mmr passed its sf0.001 pin and still shipped a duplicate-id
# re-selection bug that only the adversarial embeddings fixture (re-ingest
# duplicate vec_id) could see — this gate makes that class of miss
# impossible for future stagings. The corpora are the SAME conftest
# fixtures the registered-query sweeps use.


def _staged_surface():
    from bytewax_iceberg_connector_spark.plans import behavioral, corpus, llm

    qs = {**llm.R12_QUERIES, **behavioral.R12_QUERIES, **corpus.R12_QUERIES}
    oracles = {**llm.R12_ORACLE, **behavioral.R12_ORACLE,
               **corpus.R12_ORACLE}
    return qs, oracles


# table each staged query reads -> the adversarial fixture to run it on;
# extend when staging a query over a new table
_STAGED_ADV_TABLE = {
    "ngram_novelty": "adv_dir",          # documents
    "multimodal_dedup": "adv_dir",       # documents (binary from text)
    "session_entropy": "adv_events_dir",  # events
}


def test_every_staged_query_has_an_adversarial_assignment():
    qs, _ = _staged_surface()
    assert set(qs) == set(_STAGED_ADV_TABLE), (
        "new staged query lacks an adversarial-corpus assignment"
    )


@pytest.mark.deep
def test_staged_queries_match_oracle_on_adversarial_corpus(
    spark, adv_dir, adv_emb_dir, adv_events_dir
):
    dirs = {"adv_dir": adv_dir, "adv_emb_dir": adv_emb_dir,
            "adv_events_dir": adv_events_dir}
    qs, oracles = _staged_surface()
    failures = []
    for name, fn in sorted(qs.items()):
        d = dirs[_STAGED_ADV_TABLE[name]]
        try:
            sp = spark_to_pandas(fn(spark, str(d)))
            du = duck_oracle(Path(str(d)), oracles[name])
            assert_df_match(sp, du)
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:300]}")
    assert not failures, "\n".join(failures)
