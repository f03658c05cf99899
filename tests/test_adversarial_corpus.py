"""Adversarial-corpus differential: EVERY documents-only oracle query runs
on a fixture of NULL/empty/degenerate rows and must match DuckDB exactly.

This sweep (scratch/adversarial_sweep.py, promoted here after it found 8
real bugs in r06) pins the NULL-robustness contract the synthetic corpus
never exercises:

- NULL doc_id rows must flow through kernels (the multimodal kernels
  crashed on ``int(NaN)`` — one NULL-keyed asset aborted the whole job)
  and must not be silently dropped/zeroed by doc_id-keyed oracle joins
  (repetition_ratio, doc_chunking, multimodal_audio finds);
- NULL text must mean the EMPTY payload on both engines (multimodal_video:
  DuckDB's NULL-ignoring GREATEST/LEAST minted a phantom 1-byte frame);
- empty/whitespace/unicode/single-token/duplicate rows must agree
  everywhere else.

New documents-only queries are covered automatically via the registry.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from _diffutil import assert_df_match, duck_oracle, spark_to_pandas


# The adv_dir / adv_emb_dir / adv_events_dir corpora live in conftest.py —
# shared with the staged-queries gate (register-only-after-adversarial, r12).


_OTHER_TABLES = (
    "lineitem", "orders", "customer", "supplier", "part", "nation",
    "region",
)


def _single_table_targets(table: str):
    from bytewax_iceberg_connector_spark.plans import registry

    other = tuple(
        t
        for t in _OTHER_TABLES + ("embeddings", "documents", "events")
        if t != table
    )
    oracles = registry.all_oracles()
    return sorted(
        n
        for n, sql in oracles.items()
        if table in sql and not any(t in sql for t in other)
    )


def _documents_only_targets():
    return _single_table_targets("documents")


def _parallel_match(spark, d, targets, workers: int = 8) -> list[str]:
    """Run a plain match-the-oracle sweep with CONCURRENT job submission
    (r09 VERDICT suite-trim item): per-query wall time on these fixtures
    is dominated by driver/job latency, not compute (profiled 108 s Spark
    vs 1.6 s DuckDB on the empty corpus), so overlapping submissions cuts
    the sweep ~3-4x. Everything on this path is thread-safe: plain
    ``.toPandas()`` (no session-conf toggles — the spark_to_pandas sweeps
    stay serial), per-call DuckDB connections, idempotent memo/view
    registration. Returns the failure list."""
    from concurrent.futures import ThreadPoolExecutor
    from pathlib import Path

    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    dirpath = Path(str(d))

    def one(name: str):
        try:
            sp = qs[name](spark, str(d)).toPandas()
            op = duck_oracle(dirpath, oracles[name])
            assert_df_match(sp, op)
            return None
        except Exception as exc:  # noqa: BLE001
            return f"{name}: {type(exc).__name__}: {str(exc)[:200]}"

    with ThreadPoolExecutor(max_workers=workers) as ex:
        results = list(ex.map(one, targets))
    return [r for r in results if r]


@pytest.mark.deep
def test_documents_only_queries_match_oracle_on_adversarial_corpus(
    spark, adv_dir
):
    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    targets = _documents_only_targets()
    # the sweep must actually sweep: if the registry shrinks drastically
    # (an import error dropping a plan module), fail loudly instead of
    # green-washing an empty loop
    assert len(targets) >= 40, targets
    failures = _parallel_match(spark, adv_dir, targets)
    assert not failures, "\n".join(failures)


@pytest.mark.deep
def test_embeddings_only_queries_match_oracle_on_adversarial_corpus(
    spark, adv_emb_dir
):
    """Every embeddings-only oracle query must survive NULL/empty/ragged/
    zero vectors and match DuckDB — the load_vectors quarantine contract
    (valid := non-NULL id + non-NULL vector + modal dim; cosine consumers
    additionally drop zero vectors) enforced end to end. Before r06, one
    ragged row crashed every GEMM kernel and DuckDB NaN-ranked zero
    vectors into top-k lists."""
    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    targets = _single_table_targets("embeddings")
    assert len(targets) >= 8, targets
    failures = _parallel_match(spark, adv_emb_dir, targets)
    assert not failures, "\n".join(failures)


@pytest.mark.deep
def test_events_only_queries_match_oracle_on_adversarial_corpus(
    spark, adv_events_dir
):
    """Every events-only oracle query must survive NULL ids/timestamps/
    types/values, duplicate ids, tie timestamps, and malformed JSON —
    and match DuckDB. r06 finds this pins: ab_test_eval's ANSI division
    on degenerate arms, json_valid oracle guards, try_parse_json for
    VARIANT, the NULL-ts un-windowable contract, and the lake queries'
    total parity split + _spec_id era attribution."""
    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    targets = _single_table_targets("events")
    assert len(targets) >= 40, targets
    failures = _parallel_match(spark, adv_events_dir, targets)
    assert not failures, "\n".join(failures)


def test_cross_table_queries_match_oracle_on_adversarial_corpus(
    spark, adv_dir, adv_emb_dir, tmp_path
):
    """The documents ⋈ embeddings queries (doc_id ≡ vec_id join) on BOTH
    adversarial fixtures at once: orphan keys on each side, NULL join
    keys, and quarantined-invalid embeddings for otherwise-valid docs
    must reconcile identically on both engines."""
    import shutil

    d = tmp_path / "cross"
    d.mkdir()
    shutil.copy(adv_dir / "documents.parquet", d / "documents.parquet")
    shutil.copy(adv_emb_dir / "embeddings.parquet", d / "embeddings.parquet")

    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    failures = []
    for name in ("cluster_quality_profile", "curation_pipeline", "hybrid_rank"):
        try:
            sp = qs[name](spark, str(d)).toPandas()
            op = duck_oracle(d, oracles[name])
            assert_df_match(sp, op)
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:200]}")
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def adv_tpch_dir(tmp_path_factory):
    """Real sf0.001 TPC-H tables with injected adversarial rows: NULL
    order/part/supp/cust keys, NULL dates/prices/flags, zero-value lines
    — the relational-family twin of the documents/embeddings/events
    fixtures (r06 finds: continuous_aggregate's parity split dropped a
    NULL-keyed order; percentile_approx_check's band flag went 0 instead
    of vacuous-true on an all-NULL group)."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("adv_tpch")
    for t in ("region", "nation", "supplier", "part", "events",
              "documents", "embeddings"):
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{src}/lineitem.parquet')
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (NULL, 1, 1, 99, 5.0, 100.0, 0.1, 0.02, 'N', 'O',
         TIMESTAMP '1995-06-01'),
        (1, NULL, NULL, 98, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
        (2, 2, 2, 97, 0.0, 0.0, 0.0, 0.0, 'R', 'F', NULL)
      ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
          l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
          l_shipdate)
    ) TO '{d}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{src}/orders.parquet')
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (NULL, 1, 'O', 100.0, TIMESTAMP '1995-06-01', '1-URGENT'),
        (999991, NULL, NULL, NULL, NULL, NULL)
      ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
          o_orderpriority)
    ) TO '{d}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{src}/customer.parquet')
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (NULL, 'null-key customer', 1, 0.0, 'BUILDING'),
        (999992, NULL, NULL, NULL, NULL)
      ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    ) TO '{d}/customer.parquet' (FORMAT PARQUET)
    """)
    con.close()
    return d


@pytest.mark.deep
def test_tpch_queries_match_oracle_on_adversarial_corpus(spark, adv_tpch_dir):
    """Every oracle query touching lineitem/orders/customer must agree
    with DuckDB on the NULL-injected TPC-H corpus."""
    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    targets = sorted(
        n
        for n, sql in oracles.items()
        if any(t in sql for t in ("lineitem", "orders", "customer"))
    )
    assert len(targets) >= 50, targets
    failures = _parallel_match(spark, adv_tpch_dir, targets)
    assert not failures, "\n".join(failures)


# ---------------------------------------------------------------------------
# Empty-corpus sweep (r07): every oracle query on 0-row tables
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def empty_corpus_dir(tmp_path_factory):
    """Schema-exact 0-row copies of all ten tables. The degenerate class
    the row-level fixtures can't reach: at 100 TB a filter, a partition,
    or a whole snapshot is routinely empty — engine code must degrade to
    the oracle's empty/vacuous answer, not crash or invent rows.

    r07 finds (8, via scratch/adversarial_empty.py): ANSI div-by-zero in
    dataset_card's dup_ppm; corr_matrix's pairwise n NULL where the
    oracle counts 0; Spark's Expand-based ROLLUP/CUBE/GROUPING SETS
    emitting NOTHING where the SQL standard (and DuckDB) still produce
    the () grand-total row (grouping_rollup, grouping_cube,
    grouping_sets_mix, time_rollup — fixed by rebuilding the total from
    the detail rows of the same exchange-reused aggregate);
    snapshot_changes' oracle inventing unconditional n=0 summary rows
    the CDC diff never produced; semantic_dedup's theorem flags going
    NULL/red instead of vacuous green on a 0-vector slice.
    """
    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("empty_corpus")
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), d / f"{t}.parquet")
    return d


@pytest.mark.deep
def test_every_oracle_query_matches_on_empty_corpus(spark, empty_corpus_dir):
    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    targets = sorted(n for n in qs if n in oracles)
    assert len(targets) >= 190, targets
    # 0-row jobs are pure per-job driver latency, so concurrency is the
    # whole win here (a scoped shuffle.partitions=1 / AQE-off variant was
    # measured SLOWER — AQE short-circuits empty stages)
    failures = _parallel_match(spark, empty_corpus_dir, targets)
    assert not failures, "\n".join(failures)


# ---------------------------------------------------------------------------
# Non-finite measure contract (r07): NaN/Inf must ABORT, never NULL away
# ---------------------------------------------------------------------------


def test_nan_poisoned_measure_aborts_on_both_engines(spark, tmp_path):
    """Spark casts NaN/±Inf → decimal as NULL even under ANSI, which
    would SILENTLY drop value mass from every decimal-exact sum; DuckDB
    aborts. dec() now carries a non-finite abort guard so both engines
    enforce the same finite-input contract (the decimal-overflow
    posture: abort, don't NULL value mass)."""
    import math

    import duckdb
    from pyspark.sql import functions as F
    from pyspark.sql.utils import PythonException

    from bytewax_iceberg_connector_spark.functions.numeric import (
        dsum,
        sql_dsum,
    )

    # pyarrow directly: pandas' to_parquet would turn NaN into NULL
    # (missing), but the class under test is a GENUINE IEEE NaN payload
    tbl = pa.table({"x": pa.array([1.5, math.nan, 2.25], type=pa.float64())})
    p = tmp_path / "m.parquet"
    pq.write_table(tbl, p)

    sdf = spark.read.parquet(str(p))
    with pytest.raises(Exception, match="non-finite"):
        sdf.agg(dsum("x")).collect()
    # Inf aborts identically
    sdf2 = spark.createDataFrame([(1.0,), (float("inf"),)], "x double")
    with pytest.raises(Exception, match="non-finite"):
        sdf2.agg(dsum("x")).collect()
    # NULL is absent, not poisoned: passes and is skipped
    sdf3 = spark.createDataFrame([(1.5,), (None,), (2.25,)], "x double")
    assert sdf3.agg(dsum("x").alias("s")).collect()[0].s == 3.75

    # oracle arm: DuckDB's bare CAST aborts on the same input
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW m AS SELECT * FROM read_parquet('{p}')")
        with pytest.raises(Exception):
            con.execute(f"SELECT {sql_dsum('x')} FROM m").fetchall()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Negative-ids sweep (r07): sign-safe modulo across the %-using class
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def neg_ids_dir(tmp_path_factory):
    """sf0.001 with every documents/embeddings/events id shifted to a
    large NEGATIVE (id − 2⁴⁰). The class it pins: `x % k == i` filters
    and `% k` range constructions are only total over non-negative keys
    — Spark's and DuckDB's `%` keep the dividend's sign, so a negative
    odd id returns −1 and escapes BOTH parity arms (the same
    vanish-through-every-filter class the r06 NULL hardening fixed).

    r07 finds (4, via /tmp/negid_sweep.py protocol): partition_evolution
    and schema_evolution dropped every negative-odd row from both batch
    splits; compaction_planning's slice filters matched no negative
    residue; streaming_dedup_watermark's replay offsets went negative
    AND its pandas checksum (floor-mod, non-negative) diverged from the
    oracle's trunc-mod. All now sign-safe pmod on both engines.
    """
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("neg_ids")
    S = 1 << 40
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT event_id - {S} AS event_id, ts, user_id - {S} AS "
        f"user_id, event_type, value, props FROM "
        f"read_parquet('{src}/events.parquet')) TO "
        f"'{d}/events.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT doc_id - {S} AS doc_id, text, lang, source, "
        f"n_chars FROM read_parquet('{src}/documents.parquet')) TO "
        f"'{d}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT vec_id - {S} AS vec_id, embedding, label FROM "
        f"read_parquet('{src}/embeddings.parquet')) TO "
        f"'{d}/embeddings.parquet' (FORMAT PARQUET)"
    )
    con.close()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    return d


@pytest.mark.deep
def test_modulo_using_queries_match_oracle_on_negative_ids(
    spark, neg_ids_dir
):
    """Every oracle query that uses `%` over the re-keyed tables must
    agree with DuckDB when ids are large negatives."""
    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    tpch = ("lineitem", "orders", "customer", "supplier", "part",
            "nation", "region")
    targets = sorted(
        n
        for n, sql in oracles.items()
        if "%" in sql
        and not any(t in sql for t in tpch)
        and any(t in sql for t in ("documents", "embeddings", "events"))
    )
    assert len(targets) >= 25, targets
    failures = _parallel_match(spark, neg_ids_dir, targets)
    assert not failures, "\n".join(failures)


# ---------------------------------------------------------------------------
# All-NULL-columns sweep (r07): rows exist, every non-key column NULL
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def all_null_docs_dir(tmp_path_factory):
    """documents with every non-key column NULL (ids intact). Harder than
    the EMPTY corpus for grouped aggregates: groups exist (n_docs > 0)
    but every measure input is NULL, so SUM-over-all-NULL vs CASE-ELSE-0
    conventions that agree on mixed groups (SUM skips NULL = +0) diverge
    here.

    r07 finds (8, via scratch/adversarial_allnull.py): SQL_BPE_COUNT's
    empty-list COALESCE also mapped NULL text → 0 where Spark propagates
    NULL (token_stats, bpe_encode, tokenizer_fertility oracles); Spark
    bool-cast `(cond).cast(long)` summed NULL where the oracle's CASE
    counted 0 (quality_filter n_kept, token_budget_cap n_docs_kept,
    text_analysis chars_ok); repetition_ratio's dist and doc_chunking's
    chunk-token fold needed the empty-payload 0 like their totals."""
    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("allnull_docs")
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT doc_id, CAST(NULL AS VARCHAR) AS text, "
        f"CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS VARCHAR) AS source, "
        f"CAST(NULL AS BIGINT) AS n_chars FROM "
        f"read_parquet('{src}/documents.parquet')) TO "
        f"'{d}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()
    return d


@pytest.mark.deep
def test_documents_only_queries_match_oracle_on_all_null_corpus(
    spark, all_null_docs_dir
):
    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    targets = _documents_only_targets()
    assert len(targets) >= 40, targets
    failures = _parallel_match(spark, all_null_docs_dir, targets)
    assert not failures, "\n".join(failures)


# -- r08: huge-document differential (promoted from the r07 engine-only
# probe once the oracle restatements went set-based) ----------------------


@pytest.fixture(scope="module")
def huge_doc_dir(tmp_path_factory):
    """sf0.001 documents + ONE ~1 MB / 170k-token document (deterministic
    varied vocabulary). The r07 probe proved the ENGINE side handles the
    payload; the DuckDB oracle only joined once doc_chunking's list-slice
    fold and multimodal_audio's per-byte substr comprehension were
    rewritten set-based (length arithmetic / byte-value histogram)."""
    import duckdb

    d = tmp_path_factory.mktemp("huge_doc")
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT * FROM '/root/testdata/sf0.001/documents.parquet'
          UNION ALL
          SELECT 9000000 AS doc_id,
                 (SELECT string_agg('tok' || (i * 2654435761 % 50021) ||
                                    CASE WHEN i % 97 = 0 THEN '.' ELSE '' END,
                                    ' ' ORDER BY i)
                  FROM (SELECT unnest(generate_series(1, 170000)) AS i)
                 ) AS text,
                 'en' AS lang, 'huge_src' AS source,
                 CAST(1700000 AS BIGINT) AS n_chars
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
    """)
    con.close()
    return d


# the heaviest per-token / per-shingle / per-byte kernel paths — the ones a
# 1 MB payload actually stresses; the full 56-query form lives in
# scratch/adversarial_hugedoc.py (56/56 green, r08) and stays out of the
# suite for runtime budget
_HUGE_DOC_TARGETS = (
    "doc_chunking",          # chunk fold (the 45 s oracle before r08)
    "multimodal_audio",      # per-byte Σb²/max (minutes before r08)
    "multimodal_pipeline",   # chained byte kernels
    "span_dedup",            # positional shingle spans
    "bpe_encode",            # merge-table encode over every token
    "tokenizer_fertility",
    "char_entropy",
    "token_stats",
    "text_analysis",
    "dedup_near_ngram",      # 170k-shingle doc through the pair join
    "unigram_surprise",
    "repetition_ratio",
)


@pytest.mark.deep
def test_heavy_kernels_match_oracle_on_megabyte_document(
    spark, huge_doc_dir
):
    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    failures = []
    for name in _HUGE_DOC_TARGETS:
        try:
            sp = qs[name](spark, str(huge_doc_dir)).toPandas()
            op = duck_oracle(huge_doc_dir, oracles[name])
            assert_df_match(sp, op)
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:200]}")
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def two_payload_dir(tmp_path_factory):
    """Same doc_id carrying two DIFFERENT texts — the upstream identity
    error shape (r08 family #10 boundary). Built so every per-document
    family is exercised non-vacuously: doc 1's payloads split the
    bm25 query terms ("join vector" / "scan join"), docs 3/4 are doc 1's
    payloads solo (so the union semantic is checkable against their
    shingle sets), doc 5 duplicates doc 3's text (a cross-id exact pair
    must still surface)."""
    d = tmp_path_factory.mktemp("two_payload")
    texts = [
        (1, "alpha beta gamma delta epsilon zeta join vector"),
        (1, "eta theta iota kappa lambda mu scan join"),
        (2, "totally different content here now"),
        (3, "alpha beta gamma delta epsilon zeta join vector"),
        (4, "eta theta iota kappa lambda mu scan join"),
        (5, "alpha beta gamma delta epsilon zeta join vector"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in texts], pa.int64()),
                "text": pa.array([t for _, t in texts], pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s1"] * len(texts), pa.string()),
                "n_chars": pa.array(
                    [len(t) for _, t in texts], pa.int64()
                ),
            }
        ),
        d / "documents.parquet",
    )
    return d


@pytest.mark.deep
def test_same_id_different_payload_pins_union_contract(spark, two_payload_dir):
    """r08 documented same-id-different-payload as an out-of-contract
    boundary ('the oracles union per id, the engine may keep versions
    distinct'); r09 pins the ACTUAL behavior per per-document family:
    since the r08 `_shingle_array` doc_id-union groupBy, the ENGINE also
    unions per id — for ngram/minhash/simhash/bm25 the two payloads of
    one doc_id behave exactly like one concatenated-set document on BOTH
    engines, so the boundary is defined (and identical), not undefined.
    A regression in any family's identity handling breaks this pin, not
    just a README paragraph."""
    from pathlib import Path

    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    for name in ("dedup_near_ngram", "dedup_minhash_lsh", "dedup_simhash",
                 "bm25_rank"):
        sp = qs[name](spark, str(two_payload_dir)).toPandas()
        op = duck_oracle(Path(two_payload_dir), oracles[name])
        assert_df_match(sp, op)
        # non-vacuous: bm25 must rank docs (terms present); the dedup
        # families must surface the planted cross-id exact pair (3,5)
        if name == "bm25_rank":
            assert len(sp) >= 3, sp
        else:
            assert len(sp) >= 1, sp


@pytest.mark.deep
def test_same_id_shingle_set_is_union_of_payloads(spark, two_payload_dir):
    """Kernel-level pin of the identity semantic: doc 1 (two payloads) has
    exactly the DISTINCT UNION of docs 3 and 4's shingle sets (its
    payloads solo)."""
    from bytewax_iceberg_connector_spark.plans.llm import _shingle_array

    rows = {
        r["doc_id"]: set(r["sha"])
        for r in _shingle_array(spark, str(two_payload_dir)).collect()
    }
    assert rows[1] == rows[3] | rows[4]
    assert rows[3] != rows[4]  # payloads genuinely differ


# ---------------------------------------------------------------------------
# Extreme-magnitude / non-finite measure sweep (r09, family #12)
# ---------------------------------------------------------------------------


def _copy_other_tables(d, exclude: str) -> None:
    import shutil

    src = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        if t != exclude:
            shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")


@pytest.fixture(scope="module")
def nonfinite_events_dir(tmp_path_factory):
    """events with NaN/+Inf/-Inf mixed into ~5% of value rows — the
    poisoned-measure shape BEYOND the dec() abort path: double-math
    consumers (percentile/histogram/binning) have NO cross-engine NaN
    contract, so the posture is abort-on-both (r09 family #12 sweep
    finds: enrich_metadata binned NaN into bucket 0 via Spark's silently
    saturating floor(double)->bigint; ks_drift likewise; percentiles
    shifted every quantile — Spark ranks NaN greatest, DuckDB skips it;
    gapfill_linear's raw decimal cast NULLed NaN mass)."""
    import duckdb

    d = tmp_path_factory.mktemp("nonfinite_events")
    con = duckdb.connect()
    con.execute(
        """COPY (SELECT event_id, ts, user_id, event_type,
           CASE WHEN event_id % 60 = 7 THEN 'NaN'::DOUBLE
                WHEN event_id % 60 = 23 THEN 'Infinity'::DOUBLE
                WHEN event_id % 60 = 41 THEN '-Infinity'::DOUBLE
                ELSE value END AS value, props
           FROM read_parquet('/root/testdata/sf0.001/events.parquet'))
           TO '{}' (FORMAT PARQUET)""".format(d / "events.parquet")
    )
    con.close()
    _copy_other_tables(d, "events")
    return d


@pytest.fixture(scope="module")
def extreme_events_dir(tmp_path_factory):
    """events with huge-but-finite magnitudes (±1e307, ±1e38, subnormal)
    — the decimal-domain boundary: dec()-routed queries abort on BOTH
    engines (overflow posture), double-math queries must still agree."""
    import duckdb

    d = tmp_path_factory.mktemp("extreme_events")
    con = duckdb.connect()
    con.execute(
        """COPY (SELECT event_id, ts, user_id, event_type,
           CASE WHEN event_id % 80 = 3 THEN 1e307
                WHEN event_id % 80 = 11 THEN -1e307
                WHEN event_id % 80 = 29 THEN 1e38
                WHEN event_id % 80 = 47 THEN -1e38
                WHEN event_id % 80 = 63 THEN 5e-324
                ELSE value END AS value, props
           FROM read_parquet('/root/testdata/sf0.001/events.parquet'))
           TO '{}' (FORMAT PARQUET)""".format(d / "events.parquet")
    )
    con.close()
    _copy_other_tables(d, "events")
    return d


def _sweep_match_or_both_abort(spark, d, names, min_matches: int,
                               min_aborts: int = 0):
    """Every query must MATCH the oracle or abort on BOTH engines — a
    one-sided abort (silent value on the other engine) is the bug class
    this sweep exists for. Vacuity guards on BOTH outcomes: the
    dec()-routed majority must actually abort (min_aborts) and the
    double-math survivors must actually match (min_matches)."""
    from concurrent.futures import ThreadPoolExecutor
    from pathlib import Path

    import pandas as pd

    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()

    # CONCURRENT form of the r09 serial loop (suite-trim): the per-query
    # conf toggles spark_to_pandas does are NOT thread-safe, so instead
    # set both confs ONCE for the whole sweep — Arrow fallback off (a
    # silent non-Arrow fallback converts through the hybrid calendar and
    # shifts pre-1582 rows) and java8API on (so the row-collect rescue
    # path below converts through proleptic java.time) — and restore
    # after. Workers then need no session mutation at all.
    fb_key = "spark.sql.execution.arrow.pyspark.fallback.enabled"
    j8_key = "spark.sql.datetime.java8API.enabled"
    saved = {k: spark.conf.get(k, None) for k in (fb_key, j8_key)}

    def _collect(df) -> pd.DataFrame:
        try:
            return df.toPandas()
        except Exception:
            # extreme-timestamp outputs: Arrow's ns range can't hold them;
            # row collection via java.time (proleptic) — see _diffutil
            rows = df.collect()
            return pd.DataFrame(
                [r.asDict(recursive=True) for r in rows], columns=df.columns
            )

    def one(name: str):
        """Returns (name, 'abort'|'match'|failure-string)."""
        sp_err = ora_err = None
        sp = op = None
        try:
            sp = _collect(qs[name](spark, str(d)))
        except Exception as e:  # noqa: BLE001
            sp_err = f"{type(e).__name__}: {str(e)[:120]}"
        try:
            op = duck_oracle(Path(d), oracles[name])
        except Exception as e:  # noqa: BLE001
            ora_err = f"{type(e).__name__}: {str(e)[:120]}"
        if sp_err and ora_err:
            return "abort"  # both-abort: the poisoned-measure posture
        if sp_err or ora_err:
            return f"{name}: ONE-SIDED ABORT spark={sp_err} duck={ora_err}"
        try:
            assert_df_match(sp, op)
            return "match"
        except AssertionError as e:
            return f"{name}: {str(e)[:200]}"

    spark.conf.set(fb_key, "false")
    spark.conf.set(j8_key, "true")
    try:
        with ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(one, names))
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
    matches = sum(1 for r in results if r == "match")
    aborts = sum(1 for r in results if r == "abort")
    failures = [r for r in results if r not in ("match", "abort")]
    assert not failures, "\n".join(failures)
    assert matches >= min_matches, f"sweep went vacuous: {matches} matches"
    assert aborts >= min_aborts, f"abort arm went vacuous: {aborts} aborts"


def _value_touching_events_targets():
    """events-only queries whose ORACLE references the poisoned column —
    the only ones value poisoning can diverge (a query that never reads
    `value` is provably unaffected, so sweeping it here is pure suite-
    budget cost; the FULL 56-query sweep ran once in
    scratch/extreme_numeric_sweep.py and is re-runnable on demand)."""
    from bytewax_iceberg_connector_spark.plans import registry

    oracles = registry.all_oracles()
    return [n for n in _single_table_targets("events")
            if "value" in oracles[n]]


@pytest.mark.deep
def test_events_queries_on_nonfinite_values_match_or_both_abort(
    spark, nonfinite_events_dir
):
    names = _value_touching_events_targets()
    assert len(names) >= 20, names
    _sweep_match_or_both_abort(spark, nonfinite_events_dir, names, 2,
                               min_aborts=15)


@pytest.mark.deep
def test_events_queries_on_extreme_magnitudes_match_or_both_abort(
    spark, extreme_events_dir
):
    names = _value_touching_events_targets()
    assert len(names) >= 20, names
    _sweep_match_or_both_abort(spark, extreme_events_dir, names, 2,
                               min_aborts=15)


def test_bucketing_aborts_on_nonfinite_not_bucket_zero(spark):
    """The reduced form of the r09 family #12 engine bug: Spark's
    floor(double)->BIGINT SATURATES silently — floor(NaN)=0,
    floor(±Inf)=±Long.MAX — even under ANSI, so a poisoned measure landed
    in REAL bucket 0 while the DuckDB oracle aborted. measure_domain()
    makes the engine abort first; finite() is the order-statistics twin
    (Spark ranks NaN greatest, DuckDB's quantile_cont skips it)."""
    import duckdb
    from pyspark.sql import functions as F

    from bytewax_iceberg_connector_spark.functions.numeric import (
        finite,
        measure_domain,
        sql_finite,
        sql_measure_domain,
    )

    sdf = spark.createDataFrame(
        [(1.0,), (float("nan",),), (2.0,)], "v double"
    )
    with pytest.raises(Exception, match="measure domain"):
        sdf.select(F.floor(measure_domain("v") / 50)).collect()
    with pytest.raises(Exception, match="non-finite"):
        sdf.agg(F.expr("percentile(v, 0.5)").alias("p")).select(
            finite(F.lit(float("inf"))),
        ).collect()
    # huge-but-finite saturation arm: 1e307 must abort, not Long.MAX
    sdf2 = spark.createDataFrame([(1e307,)], "v double")
    with pytest.raises(Exception, match="measure domain"):
        sdf2.select(F.floor(measure_domain("v") / 50)).collect()
    # in-domain values pass through both guards unchanged; NULL passes
    ok = spark.createDataFrame([(123.45,), (None,)], "v double").select(
        measure_domain("v").alias("m"), finite("v").alias("f")
    ).collect()
    assert [r.m for r in ok] == [123.45, None]
    # oracle mirrors abort identically
    con = duckdb.connect()
    try:
        with pytest.raises(Exception):
            con.execute(
                f"SELECT {sql_measure_domain('x')} FROM "
                "(SELECT 'NaN'::DOUBLE AS x)"
            ).fetchall()
        with pytest.raises(Exception):
            con.execute(
                f"SELECT {sql_finite('x')} FROM "
                "(SELECT 'Infinity'::DOUBLE AS x)"
            ).fetchall()
        val = con.execute(
            f"SELECT {sql_measure_domain('x')}, {sql_finite('x')} FROM "
            "(SELECT 123.45::DOUBLE AS x)"
        ).fetchone()
        assert val == (123.45, 123.45)
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Extreme-timestamp sweep (r09, family #13)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def extreme_ts_events_dir(tmp_path_factory):
    """events with boundary timestamps in ~5% of ts rows: year-1 week 2
    (0001-01-08 — exactly 0001-01-01T00:00 is datetime.min and pyspark's
    Instant→datetime conversion cannot materialize it, a documented
    python-boundary, not an engine one: the engine's week-trunc of it
    string-casts identically on both engines), deep pre-epoch (1890), the
    microsecond before epoch, year 9999, and NULL.

    Classes the full sweep (scratch/extreme_ts_sweep.py, 54 match /
    2 both-abort / 0 divergences) caught and this fixture pins:
    - gapfill grid runaway: ONE corrupt timestamp made the hourly grid
      ~87.6M rows PER USER on both engines (agreement without an answer)
      → _GAPFILL_MAX_HOURS span guard aborts on both;
    - as-of NULL-ts contract: Spark's NULLS FIRST window order made a
      NULL-ts click the running-last candidate (and DuckDB's ASOF
      binary-search MATCHES a NULL probe — it sorts high, it doesn't
      reject) → operator drops NULL-ts right rows / null-enriches
      NULL-ts left rows, oracles encode the same;
    - scd2's LEAD window: oracle lacked NULLS FIRST on valid_from
      (NULL-ts-only runs ordered differently than Spark)."""
    import duckdb

    d = tmp_path_factory.mktemp("extreme_ts")
    con = duckdb.connect()
    con.execute(
        """COPY (SELECT event_id,
           CASE WHEN event_id % 90 = 7
                  THEN TIMESTAMP '1890-03-04 01:02:03.123456'
                WHEN event_id % 90 = 23
                  THEN TIMESTAMP '0001-01-08 03:00:00'
                WHEN event_id % 90 = 41
                  THEN TIMESTAMP '9999-12-31 23:59:59.999999'
                WHEN event_id % 90 = 59
                  THEN TIMESTAMP '1969-12-31 23:59:59.999999'
                WHEN event_id % 90 = 77 THEN NULL
                ELSE ts END AS ts,
           user_id, event_type, value, props
           FROM read_parquet('/root/testdata/sf0.001/events.parquet'))
           TO '{}' (FORMAT PARQUET)""".format(d / "events.parquet")
    )
    con.close()
    _copy_other_tables(d, "events")
    return d


#: the queries family #13 diverged on (or that exercise its classes):
#: as-of joins + consumers, gaps-and-islands windows, time-grid builders
#: (both-abort via the span guard), week/day truncation at the year-1 and
#: year-9999 boundaries, and watermark-ordered streaming twins. The full
#: 56-query sweep lives in scratch/extreme_ts_sweep.py.
_TS_SWEEP_QUERIES = [
    "asof_join_events", "asof_join_forward",
    # nearest has no registered query; its NULL-ts mask is driven
    # directly by test_asof_nearest_null_ts_never_matches below
    "event_attribution", "scd2_history", "sketch_rollup",
    "gapfill_locf", "gapfill_linear", "time_rollup", "window_analytic",
    "streaming_tumbling", "streaming_session", "ohlc_bars",
    "interarrival_stats", "weekly_growth",
]


@pytest.mark.deep
def test_events_queries_on_extreme_timestamps_match_or_both_abort(
    spark, extreme_ts_events_dir
):
    from bytewax_iceberg_connector_spark.plans import registry

    available = set(registry.all_oracles())
    names = [n for n in _TS_SWEEP_QUERIES if n in available]
    assert len(names) >= 12, names
    _sweep_match_or_both_abort(spark, extreme_ts_events_dir, names, 10,
                               min_aborts=2)


def test_gapfill_span_guard_aborts_on_runaway_grid(spark, tmp_path):
    """Reduced form of the family #13 grid-runaway find: one corrupt
    year-9999 timestamp must ABORT the gapfill (same message both
    engines), never materialize an ~87M-row-per-user grid."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bytewax_iceberg_connector_spark.plans.temporal import (
        _SQL_GAPFILL,
        gapfill_locf,
    )

    pq.write_table(
        pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [1704067200000000, 1704070800000000, 253402300799000000],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(["click"] * 3, pa.string()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}"] * 3, pa.string()),
        }),
        tmp_path / "events.parquet",
    )
    with pytest.raises(Exception, match="grid domain"):
        gapfill_locf(spark, str(tmp_path)).collect()
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM read_parquet('{}')".format(
                tmp_path / "events.parquet"
            )
        )
        with pytest.raises(Exception, match="grid domain"):
            con.execute(_SQL_GAPFILL).fetchall()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Adversarial props JSON (r09, family #14)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def adversarial_props_dir(tmp_path_factory):
    """events with schema-drift props shapes in ~18% of rows: malformed,
    nested object/array k, string/float/huge/boolean k, array/null
    roots, unicode-escaped key, case-variant key, empty, whitespace,
    NULL. Duplicate-key objects are EXCLUDED — Spark keeps the last
    value, DuckDB the first (RFC-undefined; pinned as a dialect boundary
    in test_property.py::test_json_duplicate_key_dialect_boundary).

    r09 find: json_ingest_errors — the VALIDATION query whose job is
    classifying these shapes — crashed its ORACLE on a non-scalar k
    (bare CAST of '[1,2]'); the oracle now gates on json_type like the
    engine's from_json('k INT') leniency. The strict-cast analytics
    (enrich/json_extract/attribution) abort on BOTH engines for
    non-scalar k — the documented malformed-upstream posture."""
    import duckdb

    shapes = [
        '{"k":',
        "{k:1}",
        '{"k":{"a":1}}',
        '{"k":[1,2]}',
        '{"k":"7"}',
        '{"k":1.9}',
        '{"k":99999999999999999999}',
        '{"k":-3}',
        '{"k":null}',
        "{}",
        "null",
        "[1,2,3]",
        "   ",
        '{"K":1}',
        '{"k":true}',
        '{"\\u006b":5}',
        '{"a":{"b":{"c":{"d":{"e":{"k":1}}}}}}',
    ]
    d = tmp_path_factory.mktemp("adv_props")
    con = duckdb.connect()
    cases = " ".join(
        "WHEN event_id % 97 = {} THEN '{}'".format(
            3 + i * 5, s.replace("'", "''")
        )
        for i, s in enumerate(shapes)
    )
    con.execute(
        """COPY (SELECT event_id, ts, user_id, event_type, value,
           CASE {} WHEN event_id % 97 = 93 THEN NULL
                ELSE props END AS props
           FROM read_parquet('/root/testdata/sf0.001/events.parquet'))
           TO '{}' (FORMAT PARQUET)""".format(cases, d / "events.parquet")
    )
    con.close()
    _copy_other_tables(d, "events")
    return d


@pytest.mark.deep
def test_props_queries_on_adversarial_json_match_or_both_abort(
    spark, adversarial_props_dir
):
    from bytewax_iceberg_connector_spark.plans import registry

    oracles = registry.all_oracles()
    names = sorted(n for n, sql in oracles.items() if "props" in sql)
    assert len(names) >= 5, names
    # the classifiers must MATCH (their job is surviving these shapes);
    # the strict-cast analytics both-abort
    _sweep_match_or_both_abort(spark, adversarial_props_dir, names, 2,
                               min_aborts=2)


def test_asof_nearest_null_ts_never_matches(spark):
    """The nearest direction's NULL-ts mask, driven directly (no
    registered query uses it): a NULL-ts left row keeps its row with
    null enrichment, and a NULL-ts right row is never a candidate in
    EITHER time direction."""
    from bytewax_iceberg_connector_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, None, "a"), (1, "2024-01-01 10:00:00", "b")],
        "k int, ts string, tag string",
    ).selectExpr("k", "cast(ts as timestamp) ts", "tag")
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, "2024-01-01 09:00:00", 1.0),
         (1, "2024-01-01 11:00:00", 2.0)],
        "k int, ts string, v double",
    ).selectExpr("k", "cast(ts as timestamp) ts", "v")
    rows = {r.tag: r for r in asof_join(
        left, right, on="k", ts_col="ts", value_cols=("v",),
        suffix="_r", direction="nearest",
    ).collect()}
    assert rows["a"].v_r is None and rows["a"].ts_r is None  # NULL-ts left
    assert rows["b"].v_r == 1.0  # backward wins the 1h tie; 99.0 never


# ---------------------------------------------------------------------------
# Control characters / NUL bytes in text (r09, family #15)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def control_char_docs_dir(tmp_path_factory):
    """documents with NUL bytes, C0/C1 control chars, vertical-tab and
    form-feed separators, CR-only/CRLF newlines, zero-width joiners and a
    BOM planted into text. The class this pins: the THREE regex dialects
    in play disagree about shorthand ``\\s`` — Java and Python-ASCII
    include \\x0b (vertical tab), DuckDB's RE2 does NOT — so one
    \\v-separated document tokenized differently on the two engines (28
    token-count divergences from a single codepoint, r09 family #15).
    Both engines now spell the shared separator class explicitly
    (functions/text.WS_CLASS and its SQL twin in every oracle)."""
    import duckdb

    shapes = [
        "alpha\x00beta gamma",
        "alpha \x00 beta",
        "ctl\x01\x02\x03chars here",
        "del\x7fchar and bell\x07 token",
        "vtab\x0bsep and formfeed\x0csep",
        "cr\ronly line sep",
        "crlf\r\nline sep",
        "zwsp​joined and zwj‍joined",
        "﻿bom prefixed text",
        "tab\tand multi  space",
    ]
    d = tmp_path_factory.mktemp("ctl_docs")
    con = duckdb.connect()
    base = con.execute(
        "SELECT doc_id, text, lang, source, n_chars FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).df()
    con.close()
    for i, s in enumerate(shapes):
        base.loc[
            base.index[(base["doc_id"] % 53) == (5 + i * 4)], "text"
        ] = s
    pq.write_table(
        pa.Table.from_pandas(base, preserve_index=False),
        d / "documents.parquet",
    )
    return d


@pytest.mark.deep
def test_documents_queries_match_oracle_on_control_chars(
    spark, control_char_docs_dir
):
    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    targets = _documents_only_targets()
    assert len(targets) >= 40, targets
    # plain Arrow collection: documents-query outputs carry no extreme
    # timestamps (the spark_to_pandas fallback's only purpose), so the
    # sweep can use the concurrent runner
    failures = _parallel_match(spark, control_char_docs_dir, targets)
    assert not failures, "\n".join(failures)


def test_ws_class_dialect_agreement(spark):
    """The reduced form of the family #15 find: shorthand \\s splits on
    \\x0b in Java/Python-ASCII but NOT in DuckDB's RE2; the explicit
    WS_CLASS renders identically in all three."""
    import duckdb
    import re

    from pyspark.sql import functions as F

    from bytewax_iceberg_connector_spark.functions import text as X

    s = "vtab\x0bsep and formfeed\x0csep"
    eng = spark.createDataFrame([(s,)], "t string").select(
        X.tokens("t").alias("tok")
    ).collect()[0].tok
    duck = duckdb.connect().execute(
        r"SELECT list_filter(string_split_regex(lower(?),"
        r" '[ \t\n\x0b\f\r]+'), x -> x <> '')", [s]
    ).fetchone()[0]
    py = [w for w in re.split(r"[ \t\n\x0b\f\r]+", s.lower()) if w]
    assert eng == duck == py == ["vtab", "sep", "and", "formfeed", "sep"]
    # the shorthand the class replaced really is dialect-split:
    assert duckdb.connect().execute(
        r"SELECT len(string_split_regex('a\x0bb', '\s+'))"
    ).fetchone()[0] == 1  # RE2 \s does NOT split on \v


# ---------------------------------------------------------------------------
# Extreme event times (r12): year-1400 and year-9999 rows through EVERY
# events-only registered query. The engine and DuckDB agree on all of
# them (proleptic-Gregorian arithmetic end to end) EXCEPT the gapfill
# pair, whose DELIBERATE grid-domain guard fires instead of generating a
# multi-million-bucket grid — the corrupt-row DoS the guard exists for.
# Collection goes through spark_to_pandas (serial; plain .toPandas()
# casts result timestamps to pandas-ns and dies at year 2262).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def adv_extreme_events_dir(adv_events_dir, tmp_path_factory):
    """The shared adversarial events corpus PLUS two extreme-ts rows —
    built FROM the conftest fixture file so the base rows can never
    drift between the two sweeps."""
    import datetime as dt

    d = tmp_path_factory.mktemp("adv_events_extreme")
    base = pq.read_table(adv_events_dir / "events.parquet")
    extreme = pa.table(
        {
            "event_id": pa.array([14, 15], pa.int64()),
            "ts": pa.array(
                [dt.datetime(1400, 1, 1), dt.datetime(9999, 12, 31)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([5, 5], pa.int64()),
            "event_type": pa.array(["view", "purchase"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(['{"k": 10}', '{"k": 11}'], pa.string()),
        }
    )
    pq.write_table(
        pa.concat_tables([base, extreme.cast(base.schema)]),
        d / "events.parquet",
    )
    return d


@pytest.mark.deep
def test_events_queries_survive_extreme_timestamps(
    spark, adv_extreme_events_dir
):
    """Match-or-both-abort over every events-only target: the 2024-era
    rows keep every differential meaningful while the extreme rows probe
    the arithmetic ends. The gapfill pair must abort on BOTH engines
    (min_aborts=2) — engine error() and oracle guard carry the same
    'grid domain' message, and a one-sided abort (one engine silently
    materializing a 1400..9999 grid) is exactly the bug class the
    shared sweep helper rejects."""
    targets = _single_table_targets("events")
    assert len(targets) >= 40, targets
    _sweep_match_or_both_abort(
        spark, adv_extreme_events_dir, targets,
        min_matches=40, min_aborts=2,
    )


@pytest.fixture(scope="module")
def adv_extreme_tpch_dir(tmp_path_factory):
    """sf0.001 TPC-H with year-0001 and year-9999 rows in lineitem's
    l_shipdate and orders' o_orderdate — the extreme ends of the Spark
    timestamp range, probing proleptic-Gregorian agreement (Spark java8
    time vs DuckDB) across the relational family's date arithmetic."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("adv_extreme_tpch")
    for t in ("region", "nation", "supplier", "part", "events",
              "documents", "embeddings", "customer"):
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{src}/lineitem.parquet')
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (31, 3, 3, 96, 1.0, 10.0, 0.0, 0.0, 'N', 'O',
         TIMESTAMP '0001-01-01'),
        (32, 4, 4, 95, 2.0, 20.0, 0.0, 0.0, 'R', 'F',
         TIMESTAMP '9999-12-31')
      ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
          l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
          l_shipdate)
    ) TO '{d}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{src}/orders.parquet')
      UNION ALL BY NAME
      SELECT * FROM (VALUES
        (999993, 1, 'O', 50.0, TIMESTAMP '0001-01-01', '1-URGENT'),
        (999994, 2, 'F', 60.0, TIMESTAMP '9999-12-31', '5-LOW')
      ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
          o_orderpriority)
    ) TO '{d}/orders.parquet' (FORMAT PARQUET)""")
    con.close()
    return d


@pytest.mark.deep
def test_relational_queries_survive_extreme_dates(
    spark, adv_extreme_tpch_dir
):
    """Every lineitem/orders/customer-touching query must match DuckDB
    (or abort on both engines) with year-0001/9999 rows present — first
    pinned r12, when all 74 targets matched with zero aborts in 21s."""
    from bytewax_iceberg_connector_spark.plans import registry

    oracles = registry.all_oracles()
    targets = sorted(
        n
        for n, sql in oracles.items()
        if any(t in sql for t in ("lineitem", "orders", "customer"))
    )
    assert len(targets) >= 60, targets
    _sweep_match_or_both_abort(
        spark, adv_extreme_tpch_dir, targets, min_matches=60
    )


@pytest.fixture(scope="module")
def nonfinite_tpch_dir(tmp_path_factory):
    """sf0.001 TPC-H with NaN/±Inf poisoned into every measure column
    (l_quantity/l_extendedprice/l_discount, o_totalprice, c_acctbal,
    p_retailprice) — the r12 sweep that found order_reconciliation and
    five siblings casting measures with bare `cast(x as decimal)` in
    expr text (Spark silently NULLed poisoned value mass where DuckDB's
    CAST aborts) and percentile_rollup's shared text silently shifting
    quantiles (Spark ranks NaN greatest, DuckDB skips it)."""
    import duckdb

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("nonfinite_tpch")
    _copy_other_tables(d, None)
    con = duckdb.connect()
    con.execute(f"""
    COPY (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       CASE WHEN l_orderkey % 60 = 7 THEN 'NaN'::DOUBLE
            ELSE l_quantity END AS l_quantity,
       CASE WHEN l_orderkey % 60 = 23 THEN 'Infinity'::DOUBLE
            WHEN l_orderkey % 60 = 41 THEN '-Infinity'::DOUBLE
            ELSE l_extendedprice END AS l_extendedprice,
       CASE WHEN l_orderkey % 60 = 53 THEN 'NaN'::DOUBLE
            ELSE l_discount END AS l_discount,
       l_tax, l_returnflag, l_linestatus, l_shipdate
     FROM read_parquet('{src}/lineitem.parquet'))
    TO '{d}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (SELECT o_orderkey, o_custkey, o_orderstatus,
       CASE WHEN o_orderkey % 70 = 11 THEN 'NaN'::DOUBLE
            WHEN o_orderkey % 70 = 37 THEN 'Infinity'::DOUBLE
            ELSE o_totalprice END AS o_totalprice,
       o_orderdate, o_orderpriority
     FROM read_parquet('{src}/orders.parquet'))
    TO '{d}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (SELECT c_custkey, c_name, c_nationkey,
       CASE WHEN c_custkey % 50 = 13 THEN 'NaN'::DOUBLE
            ELSE c_acctbal END AS c_acctbal,
       c_mktsegment
     FROM read_parquet('{src}/customer.parquet'))
    TO '{d}/customer.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (SELECT p_partkey, p_name, p_brand, p_type, p_size,
       CASE WHEN p_partkey % 40 = 17 THEN '-Infinity'::DOUBLE
            ELSE p_retailprice END AS p_retailprice
     FROM read_parquet('{src}/part.parquet'))
    TO '{d}/part.parquet' (FORMAT PARQUET)""")
    con.close()
    return d


def _tpch_measure_targets():
    from bytewax_iceberg_connector_spark.plans import registry

    oracles = registry.all_oracles()
    return sorted(
        n
        for n, sql in oracles.items()
        if any(t in sql for t in ("lineitem", "orders", "customer",
                                  "p_retailprice"))
    )


@pytest.mark.deep
def test_python_built_tpch_queries_on_nonfinite_measures_match_or_both_abort(
    spark, nonfinite_tpch_dir
):
    """Every python-built plan must match the oracle or abort on BOTH
    engines with poisoned measures — the dec()/dec_sql/finite/
    measure_domain discipline extended from events.value (r09) to every
    TPC-H measure (r12)."""
    targets = [n for n in _tpch_measure_targets()
               if not n.startswith("sql_")]
    assert len(targets) >= 40, targets
    _sweep_match_or_both_abort(
        spark, nonfinite_tpch_dir, targets, min_matches=15, min_aborts=10
    )


@pytest.mark.deep
def test_sql_battery_on_nonfinite_measures_is_the_documented_boundary(
    spark, nonfinite_tpch_dir
):
    """The shared-text sql_* battery (one SQL string runs verbatim on
    both engines — TPC-H parity is the point) CANNOT abort on Spark
    without forking the text (Spark spells abort raise_error(), DuckDB
    error()); the documented posture (functions/numeric.py shared-SQL
    boundary note) is that the ORACLE arm enforces the finite-input
    contract. Pin that shape: each battery query either matches, or the
    oracle aborts while Spark returns — a SPARK-side abort or a silent
    value divergence is a contract change that must fail here."""
    from concurrent.futures import ThreadPoolExecutor

    from bytewax_iceberg_connector_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    targets = [n for n in _tpch_measure_targets() if n.startswith("sql_")]
    assert len(targets) >= 10, targets
    d = nonfinite_tpch_dir

    def one(name):
        sp = sp_err = op_err = None
        try:
            sp = qs[name](spark, str(d)).toPandas()
        except Exception as e:  # noqa: BLE001
            sp_err = f"{type(e).__name__}: {str(e)[:120]}"
        try:
            op = duck_oracle(Path(str(d)), oracles[name])
        except Exception as e:  # noqa: BLE001
            op_err = f"{type(e).__name__}"
            op = None
        if sp_err:
            return f"{name}: SPARK-SIDE ABORT (boundary changed): {sp_err}"
        if op_err:
            return "boundary"  # oracle enforces; spark returned a value
        try:
            assert_df_match(sp, op)
            return "match"
        except AssertionError as e:
            return f"{name}: SILENT VALUE DIVERGENCE: {str(e)[:150]}"

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(one, targets))
    failures = [r for r in results if r not in ("match", "boundary")]
    assert not failures, "\n".join(failures)
    assert sum(1 for r in results if r == "boundary") >= 8, results


@pytest.fixture(scope="module")
def huge_magnitude_emb_dir(tmp_path_factory):
    """Embeddings with float32-extreme magnitudes: a 1e38 vector (norm²
    8e76, finite in f64), a subnormal 1e-30 vector (norm² underflow
    territory), and a near-f32-max component — probing the cosine
    family's overflow discipline (r12 family #22)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("huge_emb")
    dim = 8
    base = [[float(i + 1 + j) for j in range(dim)] for i in range(20)]
    vecs = base + [[1e38] * dim, [1e-30] * dim,
                   [3.4e38, 1.0] + [0.0] * 6]
    ids = list(range(20)) + [100, 101, 102]
    pq.write_table(
        pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([i % 3 for i in ids], pa.int32()),
        }),
        d / "embeddings.parquet",
    )
    return d


@pytest.mark.deep
def test_embeddings_queries_on_huge_magnitudes_match_or_both_abort(
    spark, huge_magnitude_emb_dir
):
    """The cosine family (topk/MMR/IVF/PQ/LSH...) must agree with DuckDB
    even with 1e38 and subnormal vectors in the corpus (norms stay
    finite in f64, ROUND(·,6) keeps parity), while the magnitude-derived
    integer stats (centroids/norm_stats/quantize/nested) must abort on
    BOTH engines when norm² overflows their bigint/decimal domains —
    never silently saturate. First pinned r12: 7 matches + 4 dual
    aborts."""
    targets = _single_table_targets("embeddings")
    assert len(targets) >= 10, targets
    _sweep_match_or_both_abort(
        spark, huge_magnitude_emb_dir, targets,
        min_matches=6, min_aborts=4,
    )
