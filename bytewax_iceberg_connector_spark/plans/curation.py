"""Training-data curation queries — the pipeline stages between raw crawl
and tokenizer that the north star adds beyond the reference's surface:
PII scrubbing, repetition-based quality gating (Gopher/MassiveText rule),
benchmark-contamination detection, and deterministic dataset splitting.

All four are oracle-checked. Aggregations are integer-exact wherever a
ratio is reported (ratio of integer sums, single IEEE division) so the
DuckDB comparison never depends on float summation order — the repo's
standard parity discipline (functions/numeric.py).

Scale notes per query are inline; the common thread: every stage is a
scan-speed projection or a narrow-key shuffle, and the quadratic-looking
contamination join is bounded by the benchmark side being tiny (broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as X
from ..sources.tables import (
    SQL_NONZERO_EMB,
    SQL_VALID_EMB,
    load_table,
    load_vectors,
    table_stats,
    widen_for_kernel,
)

# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails/phones; per-lang audit of scrubbed volume.

    The synthetic corpus carries no natural PII, so the query plants one
    deterministic email + phone per document (pure string construction,
    mirrored verbatim in the oracle) — the scrubber then has real work
    whose counts the oracle can predict. ``n_residual`` re-scans the
    SCRUBBED text with the same patterns and must be 0: the query proves
    removal, not just match counting.

    Scale: regexp_replace/extract_all are codegen'd JVM expressions — the
    whole stage runs at scan speed with zero shuffle before the tiny
    per-lang aggregate; scrub FIRST, before any shuffle ships unscrubbed
    bytes (functions/text.py::redact_pii).
    """
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "ptext",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-"),
            F.lpad((F.col("doc_id") % 10_000).cast("string"), 4, "0"),
        ),
    )
    n_em, n_ph = X.pii_counts("ptext")
    scrubbed = planted.select(
        "lang",
        n_em.alias("n_em"),
        n_ph.alias("n_ph"),
        X.redact_pii("ptext").alias("stext"),
    )
    r_em, r_ph = X.pii_counts("stext")
    return (
        scrubbed.withColumn("resid", r_em + r_ph)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_em").alias("n_emails"),
            F.sum("n_ph").alias("n_phones"),
            F.sum("resid").alias("n_residual"),
            F.sum(F.length("stext").cast("long")).alias("scrubbed_chars"),
        )
        .orderBy("lang")
    )


_SQL_PII = f"""
WITH planted AS (
  SELECT lang,
         text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         '@example.com or +1 555-' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS ptext
  FROM documents
), scrubbed AS (
  SELECT lang,
         len(regexp_extract_all(ptext, '{X.PII_EMAIL_RE}')) AS n_em,
         len(regexp_extract_all(ptext, '{X.PII_PHONE_RE}')) AS n_ph,
         regexp_replace(regexp_replace(ptext, '{X.PII_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{X.PII_PHONE_RE}', '<PHONE>', 'g') AS stext
  FROM planted
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_em) AS BIGINT) AS n_emails,
       CAST(SUM(n_ph) AS BIGINT) AS n_phones,
       CAST(SUM(len(regexp_extract_all(stext, '{X.PII_EMAIL_RE}')) +
                len(regexp_extract_all(stext, '{X.PII_PHONE_RE}'))) AS BIGINT)
         AS n_residual,
       CAST(SUM(len(stext)) AS BIGINT) AS scrubbed_chars
FROM scrubbed
GROUP BY lang
ORDER BY lang
"""

# ---------------------------------------------------------------------------
# Repetition ratio (Gopher/MassiveText duplicate-n-gram rule)
# ---------------------------------------------------------------------------


def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang repeated-trigram accounting: a doc whose trigrams are
    mostly repeats of themselves (distinct < half of total) is boilerplate
    and gets flagged — the Gopher "duplicate n-gram fraction" gate.

    Integer-exact: per-doc totals/distincts are ints, the per-lang ratio is
    ONE division of two integer sums, and the >½ flag is the integer test
    ``2·distinct < total`` — no float accumulation anywhere.

    Scale: trigram totals come from a length expression and distinct counts
    from size(array_distinct(...)) — per-row projections, no explode, no
    shuffle except the final per-lang aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = X.tokens("text")
    per_doc = docs.select(
        "lang",
        F.greatest(F.size(t) - 2, F.lit(0)).cast("long").alias("total"),
        # coalesce: NULL text is the empty doc here — total is already 0
        # for it on BOTH engines (greatest skips the NULL), so dist must
        # be 0 too, not a NULL that silently vanishes from the lang sum
        # (r07 all-NULL-columns sweep find)
        F.coalesce(F.size(X.shingles("text", 3)), F.lit(0))
        .cast("long")
        .alias("dist"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("total").alias("n_trigrams"),
            F.sum("dist").alias("n_distinct"),
            # nullif: a lang of only <3-token docs has sum(total)=0 —
            # ANSI would throw where the oracle's /0 yields NULL
            F.round(
                F.lit(1.0)
                - F.sum("dist") / F.nullif(F.sum("total"), F.lit(0)),
                6,
            ).alias("rep_ratio"),
            F.sum((F.lit(2) * F.col("dist") < F.col("total")).cast("long")).alias(
                "n_flagged"
            ),
        )
        .orderBy("lang")
    )


_SQL_REPETITION = """
-- dist is computed ROW-LOCALLY (list comprehension), not via a doc_id
-- join: Spark's side is a per-row projection with no key dependency, and
-- the previous doc_id-keyed LEFT JOIN silently zeroed the distinct count
-- of NULL-keyed documents (r06 adversarial-sweep find)
WITH toks AS (
  SELECT lang, list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS tokens
  FROM documents
), per AS (
  SELECT lang,
         GREATEST(len(tokens) - 2, 0) AS total,
         len(list_distinct([tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
                            for i in generate_series(1, GREATEST(len(tokens)-2, 0))])) AS dist
  FROM toks
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(total) AS BIGINT) AS n_trigrams,
       CAST(SUM(dist) AS BIGINT) AS n_distinct,
       ROUND(1.0 - SUM(dist) * 1.0 / SUM(total), 6) AS rep_ratio,
       CAST(SUM(CASE WHEN 2 * dist < total THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged
FROM per
GROUP BY lang
ORDER BY lang
"""

# ---------------------------------------------------------------------------
# Benchmark contamination check
# ---------------------------------------------------------------------------

_BENCH_STRIDE = 97     # benchmark set = every 97th doc (stand-in eval set)
_CONTAM_MIN_SHARED = 3  # shared distinct trigrams to count as contaminated


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs sharing ≥3 distinct trigram shingles with any *benchmark* doc
    (every 97th doc stands in for an eval set) — the train/test
    contamination scan every serious pretraining pipeline runs.

    Scale: the join ships 8-byte shingle hashes (never text), and the
    benchmark side is tiny by construction — broadcast it, so the corpus
    side never shuffles at all: contamination checking at 100 TB is a
    broadcast-hash scan, not a self-join.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = widen_for_kernel(
        docs.select("doc_id", "text"), *table_stats(sf_dir, "documents")
    ).select(
        "doc_id", F.explode(X.shingle_hashes_np(3)(F.col("text"))).alias("s")
    )
    bench = sh.where(F.col("doc_id") % _BENCH_STRIDE == 0).select(
        F.col("doc_id").alias("bench_id"), "s"
    )
    pairs = (
        sh.join(F.broadcast(bench), "s")
        .where(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        # DISTINCT shared shingles, not join rows: byte-identical
        # re-ingested rows (on either side) would otherwise multiply the
        # count past the >=3 threshold (r08 duplicate-rows sweep; the
        # oracle's DISTINCT (doc_id, s) always counted set overlap). Same
        # exchange — the distinct folds into this groupBy's partial agg,
        # so the corpus side still never shuffles separately.
        .agg(F.countDistinct("s").alias("shared"))
        .where(F.col("shared") >= _CONTAM_MIN_SHARED)
    )
    return (
        pairs.groupBy("doc_id")
        .agg(
            F.countDistinct("bench_id").alias("n_bench_docs"),
            F.max("shared").alias("max_shared"),
        )
        .orderBy("doc_id")
    )


_SQL_CONTAMINATION = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS tokens FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(1, GREATEST(len(tokens)-2, 0))) AS i)
), pairs AS (
  SELECT a.doc_id, b.doc_id AS bench_id, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE b.doc_id % {_BENCH_STRIDE} = 0 AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_CONTAM_MIN_SHARED}
)
SELECT doc_id,
       CAST(COUNT(DISTINCT bench_id) AS BIGINT) AS n_bench_docs,
       CAST(MAX(shared) AS BIGINT) AS max_shared
FROM pairs
GROUP BY doc_id
ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# Deterministic dataset split
# ---------------------------------------------------------------------------


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-stable train/val/test assignment (80/10/10) + per-split volume
    accounting. The bucket is md5(doc_id)'s first 24 bits mod 100 — content
    -independent, engine-portable, and STABLE under corpus growth: a doc's
    split never changes when other docs are added/removed, the property
    random() splits lack and the reason every production pipeline hashes.

    Scale: one projection + 3-row aggregate; no shuffle except the final
    tiny groupBy. The same bucket expression works as a partition filter
    for materializing each split without reading the others twice.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 100
    )
    assigned = docs.select(
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
        .alias("split"),
        F.length("text").cast("long").alias("n_chars"),
        X.token_count("text").alias("n_tokens"),
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("split")
    )


_SQL_SPLIT = """
WITH assigned AS (
  SELECT CASE
           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100 < 80
             THEN 'train'
           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100 < 90
             THEN 'val'
           ELSE 'test'
         END AS split,
         len(text) AS n_chars,
         len(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')) AS n_tokens
  FROM documents
)
SELECT split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM assigned
GROUP BY split
ORDER BY split
"""


# ---------------------------------------------------------------------------
# stratified_sample — exact per-stratum hash-threshold sampling
# ---------------------------------------------------------------------------


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified exact sampling: each (lang, source) stratum declares a
    sampling rate in ppm and every document is admitted iff its salted
    content-independent hash coordinate falls under the stratum's
    threshold — the operator that EXECUTES a training-mix recipe (the
    dataset_split / domain_mix_weights family's missing action stage),
    with exact admitted-row/token accounting per stratum.

    Distinct from ``sample_stratified`` (plans/llm.py), the COUNT-capped
    hash-ordered reservoir (keep ≤ K docs per stratum): this one executes
    a RATE recipe — admission probability per stratum, corpus-size-
    proportional yield — which is what a declared training mix specifies.

    Determinism contract (the dataset_split discipline): the admission
    coordinate is md5('samp:' ‖ doc_id)'s first 24 bits mod 10⁶ — salted
    so it is independent of the train/val/test bucket, content-
    independent, and GROWTH-STABLE: a document's fate never changes when
    other documents come or go (tests/test_curation.py proves this on a
    shrunken corpus). The declared rate is itself derived
    deterministically from the stratum name (16 steps of 62 500 ppm), so
    the whole recipe is reproducible from the schema alone.

    Scale: admission is a codegen'd projection (two md5s per row, no
    UDF) — at 100 TB it runs at scan speed exactly like dataset_split,
    and the only exchange is the final |strata|-row rollup. The same
    predicate materializes the sample without a second read.
    """
    docs = load_table(spark, sf_dir, "documents")
    stratum = F.concat_ws(
        "/", F.coalesce(F.col("lang"), F.lit("?")),
        F.coalesce(F.col("source"), F.lit("?")),
    )
    rate_ppm = (
        F.conv(F.substring(F.md5(stratum), 1, 6), 16, 10).cast("long") % 16
        + 1
    ) * 62500
    coord = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    scored = docs.select(
        "lang",
        "source",
        rate_ppm.cast("long").alias("rate_ppm"),
        (coord < rate_ppm).cast("long").alias("admitted"),
        X.token_count("text").alias("n_tokens"),
    )
    return (
        scored.groupBy("lang", "source", "rate_ppm")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("admitted").cast("long").alias("n_admitted"),
            F.expr("sum(admitted) * 1000000 div count(*)")
            .cast("long")
            .alias("admitted_ppm"),
            F.sum(F.col("admitted") * F.col("n_tokens"))
            .cast("long")
            .alias("n_tokens_admitted"),
        )
        .orderBy("lang", "source")
    )


_SQL_STRATIFIED = r"""
WITH scored AS (
  SELECT lang, source,
         (('0x' || substr(md5(COALESCE(lang, '?') || '/' ||
                              COALESCE(source, '?')), 1, 6))::BIGINT % 16
          + 1) * 62500 AS rate_ppm,
         CASE WHEN ('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)),
                                   1, 6))::BIGINT % 1000000
                   < (('0x' || substr(md5(COALESCE(lang, '?') || '/' ||
                                          COALESCE(source, '?')), 1, 6))::BIGINT
                      % 16 + 1) * 62500
              THEN 1 ELSE 0 END AS admitted,
         len(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
             x -> x <> '')) AS n_tokens
  FROM documents
)
SELECT lang, source, CAST(rate_ppm AS BIGINT) AS rate_ppm,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(admitted) AS BIGINT) AS n_admitted,
       CAST(SUM(admitted) * 1000000 // COUNT(*) AS BIGINT) AS admitted_ppm,
       CAST(SUM(admitted * n_tokens) AS BIGINT) AS n_tokens_admitted
FROM scored
GROUP BY lang, source, rate_ppm
ORDER BY lang, source
"""


# ---------------------------------------------------------------------------
# Per-source token budget cap (domain mixing)
# ---------------------------------------------------------------------------

_TOKEN_BUDGET = 300  # per (lang, source) — sized so some groups cap, some don't


def token_budget_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-(lang, source) token budgeting: documents are admitted in
    deterministic md5(doc_id) order until the group's running total reaches
    the budget — the "domain mixing weights" stage of a pretraining corpus,
    made reproducible (a re-run, or a run over a grown corpus, admits the
    same early documents).

    Admission rule: a doc is kept iff the running total BEFORE it is under
    budget (so every group keeps ≥1 doc and never stalls on an oversized
    head). Integer-exact throughout.

    Scale: one hash-partition per (lang, source) + an in-partition sort by
    the hash — the same shape as window_rank_topk; no global sort, no
    second pass.
    """

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = (
        Window.partitionBy("lang", "source")
        .orderBy(h, "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = X.token_count("text")
    cum = docs.select(
        "lang", "source",
        toks.alias("n_tok"),
        (F.sum(toks).over(w) - toks).alias("before"),
    )
    return (
        cum.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs_total"),
            F.sum("n_tok").alias("tokens_total"),
            # when/otherwise, not a bool cast: a NULL running total (the
            # all-NULL-text group) must count 0 like the oracle's CASE
            # ELSE arm, not a NULL that empties the sum
            F.sum(
                F.when(F.col("before") < _TOKEN_BUDGET, 1).otherwise(0)
            ).alias("n_docs_kept"),
            F.sum(
                F.when(F.col("before") < _TOKEN_BUDGET, F.col("n_tok")).otherwise(0)
            ).alias("tokens_kept"),
        )
        .orderBy("lang", "source")
    )


_SQL_TOKEN_BUDGET = f"""
WITH d AS (
  SELECT lang, source,
         len(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')) AS n_tok,
         md5(CAST(doc_id AS VARCHAR)) AS h, doc_id
  FROM documents
), c AS (
  SELECT lang, source, n_tok,
         SUM(n_tok) OVER (PARTITION BY lang, source ORDER BY h, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tok AS before
  FROM d
)
SELECT lang, source,
       COUNT(*) AS n_docs_total,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN before < {_TOKEN_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_kept,
       CAST(SUM(CASE WHEN before < {_TOKEN_BUDGET} THEN n_tok ELSE 0 END) AS BIGINT)
         AS tokens_kept
FROM c
GROUP BY lang, source
ORDER BY lang, source
"""

# ---------------------------------------------------------------------------
# Embedding norm audit (JVM higher-order functions, no UDF)
# ---------------------------------------------------------------------------


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Squared-L2-norm audit of the embedding column per vec_id bucket —
    the sanity pass before any similarity work (catches unnormalized /
    degenerate vectors).

    Entirely JVM-side: ``F.aggregate`` folds the array inside whole-stage
    codegen — no Python worker, no Arrow transfer; at 100 TB this runs at
    scan speed. The sum is integer-exact (per-vector norms quantized to
    1e-6 before the BIGINT sum) so the oracle never sees float-order
    drift; min/max are order-free.
    """
    emb = load_vectors(spark, sf_dir)
    norm2 = F.aggregate(
        F.col("embedding").cast("array<double>"),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    per = emb.select(
        (F.col("vec_id") % 10).alias("bucket"),
        norm2.alias("n2"),
    )
    return (
        per.groupBy("bucket")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.round(F.col("n2") * 1_000_000).cast("long")).alias("sum_n2_micros"),
            F.round(F.min("n2"), 6).alias("min_n2"),
            F.round(F.max("n2"), 6).alias("max_n2"),
        )
        .orderBy("bucket")
    )


_SQL_NORM_STATS = f"""
WITH {SQL_VALID_EMB}, per AS (
  SELECT vec_id % 10 AS bucket,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS n2
  FROM embeddings_valid
)
SELECT bucket,
       COUNT(*) AS n_vecs,
       CAST(SUM(CAST(ROUND(n2 * 1000000) AS BIGINT)) AS BIGINT) AS sum_n2_micros,
       ROUND(MIN(n2), 6) AS min_n2,
       ROUND(MAX(n2), 6) AS max_n2
FROM per
GROUP BY bucket
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Embedding int8 quantization audit
# ---------------------------------------------------------------------------


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (scale =
    127/max|x| per vector) + reconstruction-error audit per bucket — the
    4× memory cut that makes a 100 TB vector corpus fit its serving tier.

    Quantize/dequantize run as JVM higher-order functions (transform /
    aggregate) — no UDF, scan speed. Rounding is ``FLOOR(x+0.5)`` spelled
    identically on both engines (plain ROUND ties differ between Spark's
    HALF_UP and DuckDB); the error sum is quantized to 1e-9 per vector
    before the BIGINT aggregate, so the oracle comparison is float-order-
    free.
    """
    emb = load_vectors(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    max_abs = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = F.greatest(max_abs, F.lit(1e-12)) / 127.0
    # q_i = floor(x_i/scale + 0.5); reconstruction x̂_i = q_i * scale
    sq_err = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: acc
        + F.pow(x - F.floor(x / scale + 0.5) * scale, F.lit(2.0)),
    )
    per = emb.select(
        (F.col("vec_id") % 10).alias("bucket"),
        F.round(sq_err * 1e9).cast("long").alias("err_nanos"),
    )
    return (
        per.groupBy("bucket")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("err_nanos").alias("sum_sq_err_nanos"),
            F.max("err_nanos").alias("max_sq_err_nanos"),
        )
        .orderBy("bucket")
    )


_SQL_QUANTIZE = f"""
WITH {SQL_VALID_EMB}, per AS (
  SELECT vec_id % 10 AS bucket,
         CAST(ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
           x -> POW(x - FLOOR(x / (GREATEST(list_max(list_transform(
                  CAST(embedding AS DOUBLE[]), y -> ABS(y))), 1e-12) / 127.0)
                + 0.5)
              * (GREATEST(list_max(list_transform(
                  CAST(embedding AS DOUBLE[]), y -> ABS(y))), 1e-12) / 127.0),
              2.0))) * 1e9) AS BIGINT) AS err_nanos
  FROM embeddings_valid
)
SELECT bucket,
       COUNT(*) AS n_vecs,
       CAST(SUM(err_nanos) AS BIGINT) AS sum_sq_err_nanos,
       CAST(MAX(err_nanos) AS BIGINT) AS max_sq_err_nanos
FROM per
GROUP BY bucket
ORDER BY bucket
"""

# ---------------------------------------------------------------------------
# Context-window chunking
# ---------------------------------------------------------------------------

_CHUNK_W = 64   # tokens per chunk (context window)
_CHUNK_S = 48   # stride (W - S = 16 tokens of overlap)


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping ``_CHUNK_W``-token windows at
    stride ``_CHUNK_S`` — the context-window prep every tokenizer feed
    runs — and account chunks/tokens per lang (integer-exact).

    A doc shorter than one window yields exactly one (short) chunk;
    chunk count = ceil(max(tokens-W, 0)/S) + 1, and the overlap means
    sum_chunk_tokens > corpus tokens by design (the duplicated stride
    margins).

    Scale: chunk token counts are CLOSED-FORM on the token count — every
    chunk except the last holds exactly W tokens and the last holds
    n − (nc−1)·S — so the whole query is a per-row arithmetic projection
    + one tiny aggregate; no chunk is ever materialized. The previous
    slice-per-chunk transform re-evaluated the tokenizer split inside the
    higher-order lambda (no CSE across a lambda boundary), which turned a
    1 MB document into ~3.5k regex splits of the full text — 175 s for
    one doc (r08 huge-doc sweep find); this form is O(1) per row after
    one split. The oracle keeps the independent per-chunk comprehension
    restatement, so the closed form is differentially proven, not
    assumed.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = X.tokens("text")
    # coalesce: NULL text still counts 1 (short) chunk holding 0 tokens
    # on both engines (the oracle's COALESCE arm)
    n = F.coalesce(F.size(t), F.lit(0))
    n_chunks = (
        F.ceil(F.greatest(n - _CHUNK_W, F.lit(0)) / _CHUNK_S) + 1
    ).cast("long")
    per_doc = docs.select(
        "lang",
        n_chunks.alias("nc"),
        # interior chunks are full W; the last holds n − (nc−1)·S
        # (0 for the empty/NULL doc, where nc = 1 and n = 0)
        ((n_chunks - 1) * _CHUNK_W + (n - (n_chunks - 1) * _CHUNK_S))
        .cast("long").alias("ct"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nc").alias("n_chunks"),
            F.sum("ct").alias("sum_chunk_tokens"),
        )
        .orderBy("lang")
    )


_SQL_CHUNKING = f"""
-- per-doc chunk stats are computed ROW-LOCALLY (list comprehension), not
-- via a doc_id LATERAL + COUNT(DISTINCT doc_id): row identity must not
-- depend on the key, and the previous form dropped NULL-keyed documents
-- from n_docs (r06 adversarial-sweep find)
WITH toks AS (
  SELECT lang, list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
  FROM documents
), per AS (
  SELECT lang,
         CAST(CEIL(GREATEST(len(t)-{_CHUNK_W}, 0)/{_CHUNK_S}.0) AS BIGINT) + 1 AS nc,
         -- chunk token counts are pure ARITHMETIC on the length, never a
         -- materialized list slice: len(t[a:b]) = clamp(min(b, n) - a + 1)
         -- and list slicing a 170k-token doc per chunk made this oracle
         -- the slowest documents restatement (45 s on a 1 MB doc; the
         -- huge-doc sweep needs it at milliseconds). COALESCE(len, 0):
         -- GREATEST ignores NULL, so a NULL text would otherwise claim a
         -- full-width first chunk instead of the 0-token short chunk
         CAST(COALESCE(list_sum(
           [GREATEST(LEAST(i*{_CHUNK_S}+{_CHUNK_W}, COALESCE(len(t), 0))
                     - i*{_CHUNK_S}, 0)
            for i in generate_series(0, CAST(CEIL(GREATEST(len(t)-{_CHUNK_W}, 0)/{_CHUNK_S}.0) AS INT))]
         ), 0) AS BIGINT) AS ct
  FROM toks
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(nc) AS BIGINT) AS n_chunks,
       CAST(SUM(ct) AS BIGINT) AS sum_chunk_tokens
FROM per
GROUP BY lang
ORDER BY lang
"""

# ---------------------------------------------------------------------------
# End-to-end pipeline composite
# ---------------------------------------------------------------------------


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation chain as ONE plan: quality gate (≥2/3 criteria,
    integer test) → exact dedup (min doc_id per content fingerprint) →
    embedding attach (doc_id ↔ vec_id) → per-lang volume + norm audit.

    This is the query a pretraining data team actually runs; composing it
    end-to-end proves the stages share one Catalyst plan — the quality
    filter pushes below the dedup shuffle, the dedup window and the
    embedding join both hash on doc-identity, and nothing materializes
    between stages.

    Scale: one shuffle for the fingerprint window, one for the embedding
    join (both on ~uniform ids), one tiny per-lang aggregate. The filter
    runs at scan speed FIRST, so every downstream stage sees only
    survivors.
    """

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.where(X.quality_criteria_met("text") >= 2).select(
        "doc_id", "lang",
        X.token_count("text").alias("n_tok"),
        X.fingerprint("text").alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    unique = (
        kept.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "fp")
    )
    emb = load_vectors(spark, sf_dir)
    n2 = F.aggregate(
        F.col("embedding").cast("array<double>"),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    joined = unique.join(
        emb.select(F.col("vec_id").alias("doc_id"), n2.alias("n2")), "doc_id"
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum(F.round(F.col("n2") * 1_000_000).cast("long")).alias(
                "sum_n2_micros"
            ),
        )
        .orderBy("lang")
    )


_SQL_PIPELINE = rf"""
WITH {SQL_VALID_EMB}, t AS (
  SELECT doc_id, lang, text,
         len(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS n_tok,
         LENGTH(text) AS n_len,
         len(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
             x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS sw
  FROM documents
), kept AS (
  SELECT doc_id, lang, text, n_tok
  FROM t
  WHERE (CAST(n_len >= 100 AND n_len <= 20000 AS INT)
         + CAST((CASE WHEN n_tok > 0 THEN n_len * 1.0 / n_tok ELSE 0.0 END) >= 3.0
                AND (CASE WHEN n_tok > 0 THEN n_len * 1.0 / n_tok ELSE 0.0 END) <= 12.0 AS INT)
         + CAST((CASE WHEN n_tok > 0 THEN sw * 1.0 / n_tok ELSE 0.0 END) >= 0.05 AS INT)) >= 2
), uniq AS (
  SELECT doc_id, lang, n_tok
  FROM (
    SELECT doc_id, lang, n_tok,
           ROW_NUMBER() OVER (
             PARTITION BY md5(trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')))
             ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
), j AS (
  SELECT u.lang, u.n_tok,
         list_dot_product(CAST(e.embedding AS DOUBLE[]),
                          CAST(e.embedding AS DOUBLE[])) AS n2
  FROM uniq u JOIN embeddings_valid e ON e.vec_id = u.doc_id
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(CAST(ROUND(n2 * 1000000) AS BIGINT)) AS BIGINT) AS sum_n2_micros
FROM j
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Training-mix reweighting (per-source sampling weights)
# ---------------------------------------------------------------------------

_MIX_MAX_UPSAMPLE_PPM = 3_000_000  # upsampling cap: 3 epochs of a source


def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) training-mix weights: each source's sampling
    weight makes its EFFECTIVE token share uniform across sources within
    its language, capped at 3× upsampling (the DoReMi/Pile-style static
    reweighting step, computed from corpus statistics alone).

    weight_ppm = min(target_share / actual_share, 3) in parts-per-million,
    computed with integer arithmetic over exact token counts — ppm
    rationals keep both engines bit-identical (no float division drift).
    effective_tokens = tokens · weight, the number the mix planner feeds
    the sampler.

    Scale: one word-count aggregate per (lang, source) — the corpus scan
    is the entire cost; the share arithmetic runs on a |sources|-row
    frame (a broadcast-scale table at any corpus size). The weight table
    is what a sampler joins back (broadcast) onto the corpus at training
    time — that join is deliberately NOT part of this query's cost.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        docs.select("lang", "source", X.token_count("text").alias("n_tok"))
        .groupBy("lang", "source")
        .agg(F.sum("n_tok").alias("tokens"))
    )
    w_lang = Window.partitionBy("lang")
    shared = per_src.select(
        "lang",
        "source",
        "tokens",
        F.sum("tokens").over(w_lang).alias("lang_tokens"),
        F.count("*").over(w_lang).alias("n_sources"),
    )
    # target/actual = (lang_tokens / n_sources) / tokens, in ppm ints.
    # nullif: a (lang, source) of all-empty docs has tokens=0 — ANSI
    # Spark would throw where the oracle's // 0 yields NULL
    weight = F.least(
        F.expr("lang_tokens * 1000000L div nullif(n_sources * tokens, 0)"),
        F.lit(_MIX_MAX_UPSAMPLE_PPM).cast("long"),
    )
    return (
        shared.select(
            "lang",
            "source",
            F.col("tokens").cast("long").alias("tokens"),
            weight.alias("weight_ppm"),
            F.expr(
                f"tokens * least(lang_tokens * 1000000L"
                f"               div nullif(n_sources * tokens, 0), "
                f"{_MIX_MAX_UPSAMPLE_PPM}L) div 1000000L"
            ).alias("effective_tokens"),
        )
        .orderBy("lang", "source")
    )


_SQL_MIX_WEIGHTS = rf"""
WITH per_src AS (
  SELECT lang, source,
         SUM(len(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
                             x -> x <> ''))) AS tokens
  FROM documents GROUP BY lang, source
), shared AS (
  SELECT lang, source, tokens,
         SUM(tokens) OVER (PARTITION BY lang) AS lang_tokens,
         COUNT(*) OVER (PARTITION BY lang) AS n_sources
  FROM per_src
)
SELECT lang, source,
       CAST(tokens AS BIGINT) AS tokens,
       CAST(LEAST(lang_tokens * 1000000 // (n_sources * tokens),
                  {_MIX_MAX_UPSAMPLE_PPM}) AS BIGINT) AS weight_ppm,
       CAST(tokens * LEAST(lang_tokens * 1000000 // (n_sources * tokens),
                           {_MIX_MAX_UPSAMPLE_PPM}) // 1000000 AS BIGINT)
         AS effective_tokens
FROM shared
ORDER BY lang, source
"""


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk into fixed context windows)
# ---------------------------------------------------------------------------

_PACK_WINDOW = 2048  # tokens per packed training sequence


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing plan: documents concatenate in stable
    doc_id order within each (lang, source) shard and split into fixed
    2048-token training sequences; report per-bin document starts and
    token mass (the packing manifest a dataloader consumes).

    bin = (running_token_sum − n_tok) div 2048 — each doc is assigned the
    bin its FIRST token lands in, a pure prefix-sum over the shard
    ordering (GPT-style concat+chunk, not bin-packing: no reordering, no
    fragmentation bookkeeping, deterministic on any engine).

    Scale: the window partitions by (lang, source) — shards fill in
    parallel, no global ordering exists anywhere in the plan. Shuffle
    carries (lang, source, doc_id, n_tok); the manifest is
    bins-not-tokens sized. At 100 TB the shard key would include a date
    bucket to bound any one shard's window state.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "source", "doc_id", X.token_count("text").alias("n_tok")
    )
    binned = toks.withColumn(
        "bin",
        F.expr(f"(sum(n_tok) over (partition by lang, source order by doc_id) "
               f"- n_tok) div {_PACK_WINDOW}L"),
    )
    return (
        binned.groupBy("lang", "source", "bin")
        .agg(
            F.count("*").cast("long").alias("n_doc_starts"),
            F.sum("n_tok").cast("long").alias("tokens_started"),
        )
        .orderBy("lang", "source", "bin")
    )


_SQL_PACKING = rf"""
WITH toks AS (
  SELECT lang, source, doc_id,
         len(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
                         x -> x <> '')) AS n_tok
  FROM documents
), binned AS (
  SELECT lang, source, doc_id, n_tok,
         -- CAST: the windowed SUM is HUGEINT in DuckDB, which pandas
         -- renders as float64 (12.0 vs Spark's int64 12) and the driver's
         -- value hash diverges on identical values (CORRECTNESS_r03)
         CAST((SUM(n_tok) OVER (PARTITION BY lang, source ORDER BY doc_id)
          - n_tok) // {_PACK_WINDOW} AS BIGINT) AS bin
  FROM toks
)
SELECT lang, source, bin,
       CAST(COUNT(*) AS BIGINT) AS n_doc_starts,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_started
FROM binned
GROUP BY lang, source, bin
ORDER BY lang, source, bin
"""


# ---------------------------------------------------------------------------
# Unigram-LM surprise (perplexity-proxy quality filtering)
# ---------------------------------------------------------------------------

_SURPRISE_FLAG_MICRONATS = 5_500_000  # docs with mean surprise > 5.5 nats


def unigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality signal: each document's mean token
    surprise −ln p(token) under the corpus's own unigram LM, rolled up
    per (lang, source) with a count of high-surprise outlier docs — the
    CCNet/KenLM filtering stage with the corpus-internal unigram model
    standing in for an external LM (no model artifacts in this
    container).

    Determinism: each TOKEN's log-probability is quantized to integer
    micro-nats before any sum, so per-doc totals are order-independent
    bigint arithmetic — the one float op (ln of the corpus frequency) is
    computed identically per distinct token on both engines, never
    re-accumulated. Doc mean = integer div by token count.

    Scale: token→count is word-count shape; the unigram table is
    VOCABULARY-sized and joins back as a broadcast onto the (doc, term,
    tf) frame — no corpus-wide shuffle beyond the tf aggregate; the
    rollup shuffles one row per (lang, source).
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", "lang", "source",
                    F.explode(X.tokens("text")).alias("term"))
        .groupBy("doc_id", "lang", "source", "term")
        .agg(F.count("*").alias("tf"))
    )
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("n_term"))
    total = vocab.agg(F.sum("n_term").alias("n_total"))
    lm = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.expr(
            "cast(round(-ln(n_term / n_total) * 1000000) as long)"
        ).alias("surprise_micro"),
    )
    per_doc = (
        tf.join(F.broadcast(lm), "term")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.expr("sum(tf * surprise_micro) div sum(tf)").alias("mean_micro")
        )
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("mean_micro").cast("long").alias("max_mean_micronats"),
            F.sum(
                (F.col("mean_micro") > _SURPRISE_FLAG_MICRONATS).cast("long")
            ).alias("n_flagged"),
        )
        .orderBy("lang", "source")
    )


_SQL_SURPRISE = rf"""
WITH tok AS (
  SELECT doc_id, lang, source,
         unnest(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, lang, source, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2, 3, 4
), vocab AS (
  SELECT term, SUM(tf) AS n_term FROM tf GROUP BY 1
), lm AS (
  SELECT term,
         CAST(ROUND(-ln(n_term / (SELECT SUM(n_term) FROM vocab)) * 1000000)
              AS BIGINT) AS surprise_micro
  FROM vocab
), per_doc AS (
  SELECT tf.doc_id, tf.lang, tf.source,
         SUM(tf.tf * lm.surprise_micro) // SUM(tf.tf) AS mean_micro
  FROM tf JOIN lm USING (term)
  GROUP BY 1, 2, 3
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(mean_micro) AS BIGINT) AS max_mean_micronats,
       CAST(SUM(CASE WHEN mean_micro > {_SURPRISE_FLAG_MICRONATS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM per_doc
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Duplicated n-gram fraction (corpus-wide substring duplication metric)
# ---------------------------------------------------------------------------

_DUP_FLAG_PPM = 300_000  # docs with >30% duplicated trigrams get flagged


def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-trigram fraction: the share of a doc's
    trigram shingles that also occur in at least one OTHER document,
    rolled up per (lang, source) — the Gopher/RefinedWeb "duplicated
    n-gram fraction" signal, the bounded stand-in for suffix-array
    substring dedup.

    Scale: shingles shuffle as 8-byte hashes to build the document-
    frequency table, which then joins BACK on the hash — this second
    shuffle is corpus-sized and unavoidable (the df table is NOT
    vocabulary-small like unigram_surprise's LM: distinct shingles grow
    with the corpus), which is exactly why this metric is the expensive
    tier of the dedup family and runs AFTER cheap gates cut volume.
    Fractions are ppm integers (count·1e6 div total) — deterministic at
    any partitioning.

    The oracle builds the same trigrams as strings (the repo's standard
    shingle-SQL shape); hashing only changes the join key, not the
    per-doc counts, up to xxhash collisions (~1e-9 at this cardinality).
    """
    from ._cache import scoped

    docs = load_table(spark, sf_dir, "documents")
    # the shingle kernel emits DISTINCT hashes per doc, so the metric is
    # defined over distinct shingles (the common set-based formulation).
    # persisted: the frame feeds BOTH the df build and the join-back —
    # without it the Arrow shingle kernel (the query's most expensive
    # stage) runs twice over the corpus
    sh = widen_for_kernel(
        docs.select("doc_id", "lang", "source", "text"),
        *table_stats(sf_dir, "documents"),
    ).select(
        "doc_id", "lang", "source",
        F.explode(X.shingle_hashes_np(3)(F.col("text"))).alias("s"),
    ).persist()
    # docs_with counts DISTINCT documents, not rows: a byte-identical
    # re-ingested row must not turn a doc's own trigrams into
    # "duplicated" mass (r08 duplicate-rows sweep; the oracle's DISTINCT
    # (doc_id, s) always had this semantic). struct-wrap so a NULL-keyed
    # doc still counts as one value. The per-doc ppm needs no change —
    # duplicate rows double numerator and denominator together.
    df_tab = sh.groupBy("s").agg(
        F.countDistinct(F.struct("doc_id")).alias("docs_with")
    )
    per_doc = (
        sh.join(df_tab, "s")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.expr(
                "sum(case when docs_with > 1 then 1 else 0 end) * 1000000L "
                "div count(*)"
            ).alias("dup_ppm")
        )
    )
    return scoped(
        per_doc.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.expr("sum(dup_ppm) div count(*)").alias("avg_dup_ppm"),
            F.sum((F.col("dup_ppm") > _DUP_FLAG_PPM).cast("long")).alias("n_flagged"),
        )
        .orderBy("lang", "source"),
        sh,
    )


_SQL_DUP_FRACTION = rf"""
WITH toks AS (
  SELECT doc_id, lang, source,
         list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, lang, source,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, GREATEST(len(t) - 2, 0))) AS i
  )
), df AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS docs_with FROM sh GROUP BY 1
), per_doc AS (
  SELECT sh.doc_id, sh.lang, sh.source,
         SUM(CASE WHEN df.docs_with > 1 THEN 1 ELSE 0 END) * 1000000
           // COUNT(*) AS dup_ppm
  FROM sh JOIN df USING (s)
  GROUP BY 1, 2, 3
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dup_ppm) // COUNT(*) AS BIGINT) AS avg_dup_ppm,
       CAST(SUM(CASE WHEN dup_ppm > {_DUP_FLAG_PPM} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged
FROM per_doc
GROUP BY 1, 2
ORDER BY 1, 2
"""




# ---------------------------------------------------------------------------
# DSIR-style importance resampling weights (target-vs-raw unigram log-ratio)
# ---------------------------------------------------------------------------

_DSIR_TARGET_LANG = "en"  # the "high-quality target corpus" stand-in


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    reduced to its distributable core: score every raw document by the
    mean per-token log-ratio ln p_target(t) − ln p_raw(t) between a
    TARGET corpus LM (here: the ``lang = 'en'`` slice standing in for the
    curated target) and the raw-corpus LM, both add-1-smoothed over the
    joint vocabulary; documents with positive mean ratio are the ones
    importance resampling keeps. Rolled up per (lang, source): docs,
    selected docs, max score — the selection manifest.

    Determinism: the same integer-micro-nats discipline as
    ``unigram_surprise`` — each DISTINCT token's log-ratio is quantized to
    micro-nats once, per-doc totals are bigint sums, the mean is integer
    division. No float ever re-accumulates across rows.

    Scale: both LMs live in ONE vocabulary-sized table (target and raw
    counts are two aggregates of the same token frame), broadcast back
    onto the (doc, term, tf) rows; the only corpus-wide shuffle is the tf
    word-count. The target slice needs no second scan — its counts are a
    conditional aggregate of the same pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", "lang", "source",
                    F.explode(X.tokens("text")).alias("term"))
        .groupBy("doc_id", "lang", "source", "term")
        .agg(F.count("*").alias("tf"))
    )
    vocab = tf.groupBy("term").agg(
        F.sum("tf").alias("r_cnt"),
        F.sum(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, F.col("tf")).otherwise(0)
        ).alias("t_cnt"),
    )
    totals = vocab.agg(
        F.sum("r_cnt").alias("r_tot"),
        F.sum("t_cnt").alias("t_tot"),
        F.count("*").alias("v"),
    )
    lm = vocab.crossJoin(F.broadcast(totals)).select(
        "term",
        F.expr(
            "cast(round((ln((t_cnt + 1) / (t_tot + v))"
            "            - ln((r_cnt + 1) / (r_tot + v))) * 1000000) as long)"
        ).alias("ratio_micro"),
    )
    per_doc = (
        tf.join(F.broadcast(lm), "term")
        .groupBy("doc_id", "lang", "source")
        .agg(F.expr("sum(tf * ratio_micro) div sum(tf)").alias("score_micro"))
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("score_micro") > 0).cast("long")).alias("n_selected"),
            F.max("score_micro").cast("long").alias("max_score_micro"),
        )
        .orderBy("lang", "source")
    )


_SQL_DSIR = rf"""
WITH tok AS (
  SELECT doc_id, lang, source,
         unnest(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, lang, source, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2, 3, 4
), vocab AS (
  SELECT term, SUM(tf) AS r_cnt,
         SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN tf ELSE 0 END) AS t_cnt
  FROM tf GROUP BY 1
), totals AS (
  SELECT SUM(r_cnt) AS r_tot, SUM(t_cnt) AS t_tot, COUNT(*) AS v FROM vocab
), lm AS (
  SELECT term,
         CAST(ROUND((ln((t_cnt + 1) / (t_tot + v))
                     - ln((r_cnt + 1) / (r_tot + v))) * 1000000)
              AS BIGINT) AS ratio_micro
  FROM vocab CROSS JOIN totals
), per_doc AS (
  SELECT tf.doc_id, tf.lang, tf.source,
         SUM(tf.tf * lm.ratio_micro) // SUM(tf.tf) AS score_micro
  FROM tf JOIN lm USING (term)
  GROUP BY 1, 2, 3
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN score_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_selected,
       CAST(MAX(score_micro) AS BIGINT) AS max_score_micro
FROM per_doc
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Deterministic shard-shuffle manifest (seeded global shuffle for training)
# ---------------------------------------------------------------------------

_SHUFFLE_SEED = "-seed42"
_SHUFFLE_SHARDS = 8


def shard_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle: every document gets a shuffle
    key md5(doc_id || seed); the key's first two hex chars assign one of
    8 shards and the key itself is the within-shard sort order — the
    pre-training shuffle a dataloader consumes, reproducible on ANY
    engine from (doc_id, seed) alone (no RNG state, no engine hash).
    Output: per-shard manifest (docs, token mass, order-boundary keys).

    Why md5 and not Spark's rand/shuffle or xxhash64: rand is not
    cross-engine reproducible and xxhash64 has no DuckDB twin; md5 text
    is bit-identical everywhere, and a cryptographic hash of id+seed is
    exactly how deterministic dataset shuffles are specified in practice
    (reshuffle = change the seed suffix).

    Scale: the key is a projection; shard assignment shuffles one narrow
    row per doc to 8 groups (skew-free: md5 is uniform); the manifest is
    shards-not-docs sized. The full shuffled ORDER is never materialized
    globally — each shard sorts independently at read time (the
    sortWithinPartitions shape).
    """
    docs = load_table(spark, sf_dir, "documents")
    # shard from the DECODED hex value of the first two digits (uniform
    # over 0..255 → uniform mod 8). Raw ascii codes are NOT uniform mod
    # 8 (hex digits are 0-9a-f, 16 codepoints folding 3:1 onto some
    # residues) — that skew would silently unbalance training shards
    # while both engines still agree.
    _hex = "0123456789abcdef"
    keyed = docs.select(
        "doc_id",
        X.token_count("text").alias("n_tok"),
        F.expr(f"md5(doc_id || '{_SHUFFLE_SEED}')").alias("hk"),
    ).withColumn(
        "shard",
        F.expr(
            f"((instr('{_hex}', substr(hk, 1, 1)) - 1) * 16"
            f" + instr('{_hex}', substr(hk, 2, 1)) - 1)"
            f" % {_SHUFFLE_SHARDS}"
        ).cast("long"),
    )
    return (
        keyed.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
            F.min("hk").alias("first_key"),
            F.max("hk").alias("last_key"),
        )
        .orderBy("shard")
    )


_SQL_SHUFFLE = rf"""
WITH keyed AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
                         x -> x <> '')) AS n_tok,
         md5(doc_id || '{_SHUFFLE_SEED}') AS hk
  FROM documents
)
SELECT CAST(((instr('0123456789abcdef', substr(hk, 1, 1)) - 1) * 16
             + instr('0123456789abcdef', substr(hk, 2, 1)) - 1)
            % {_SHUFFLE_SHARDS} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       MIN(hk) AS first_key,
       MAX(hk) AS last_key
FROM keyed
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Length-bucket padding audit (batching-efficiency manifest)
# ---------------------------------------------------------------------------

_LB_WIDTH = 16    # tokens per bucket step (testdata docs are 10-99 tokens)
_LB_CAP = 8       # last bucket open-ended


def length_bucket_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: documents bucket by token count
    (16-token steps, last bucket open), and each bucket reports the
    padding waste a fixed-length batcher would pay — padded mass minus
    real mass, in ppm of the padded mass. The signal that decides bucket
    boundaries for length-grouped batching (the padding-efficiency lever
    in training-data pipelines).

    All integer arithmetic (bucket = div, window = (bucket+1)·_LB_WIDTH, waste
    ppm = div on exact bigint sums) — deterministic at any partitioning;
    one narrow groupBy(bucket) shuffle with map-side partials.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(X.token_count("text").alias("n_tok"))
    binned = toks.select(
        "n_tok",
        F.expr(f"least(n_tok div {_LB_WIDTH}, {_LB_CAP})").alias("bucket"),
    )
    return (
        binned.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
            F.expr(
                f"cast(count(*) * (bucket + 1) * {_LB_WIDTH} as long)"
            ).alias("padded_tok"),
            F.expr(
                f"cast(greatest(count(*) * (bucket + 1) * {_LB_WIDTH}"
                f"              - sum(n_tok), 0) * 1000000L"
                f"     div (count(*) * (bucket + 1) * {_LB_WIDTH}) as long)"
            ).alias("waste_ppm"),
        )
        .orderBy("bucket")
    )


_SQL_LENGTH_BUCKETS = rf"""
WITH toks AS (
  SELECT len(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
                         x -> x <> '')) AS n_tok
  FROM documents
), binned AS (
  SELECT n_tok, LEAST(n_tok // {_LB_WIDTH}, {_LB_CAP}) AS bucket FROM toks
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       CAST(COUNT(*) * (bucket + 1) * {_LB_WIDTH} AS BIGINT) AS padded_tok,
       CAST(GREATEST(COUNT(*) * (bucket + 1) * {_LB_WIDTH} - SUM(n_tok), 0)
            * 1000000 // (COUNT(*) * (bucket + 1) * {_LB_WIDTH}) AS BIGINT)
         AS waste_ppm
FROM binned
GROUP BY bucket
ORDER BY bucket
"""


QUERIES = {
    "domain_mix_weights": domain_mix_weights,
    "sequence_packing": sequence_packing,
    "unigram_surprise": unigram_surprise,
    "dup_ngram_fraction": dup_ngram_fraction,
    "embedding_quantize": embedding_quantize,
    "doc_chunking": doc_chunking,
    "curation_pipeline": curation_pipeline,
    "token_budget_cap": token_budget_cap,
    "embedding_norm_stats": embedding_norm_stats,
    "pii_scrub": pii_scrub,
    "repetition_ratio": repetition_ratio,
    "contamination_check": contamination_check,
    "dataset_split": dataset_split,
    "stratified_sample": stratified_sample,
    "dsir_importance": dsir_importance,
    "shard_shuffle_manifest": shard_shuffle_manifest,
    "length_bucket_audit": length_bucket_audit,
}
ORACLE = {
    "domain_mix_weights": _SQL_MIX_WEIGHTS,
    "sequence_packing": _SQL_PACKING,
    "unigram_surprise": _SQL_SURPRISE,
    "dup_ngram_fraction": _SQL_DUP_FRACTION,
    "embedding_quantize": _SQL_QUANTIZE,
    "doc_chunking": _SQL_CHUNKING,
    "curation_pipeline": _SQL_PIPELINE,
    "token_budget_cap": _SQL_TOKEN_BUDGET,
    "embedding_norm_stats": _SQL_NORM_STATS,
    "pii_scrub": _SQL_PII,
    "repetition_ratio": _SQL_REPETITION,
    "contamination_check": _SQL_CONTAMINATION,
    "dataset_split": _SQL_SPLIT,
    "stratified_sample": _SQL_STRATIFIED,
    "dsir_importance": _SQL_DSIR,
    "shard_shuffle_manifest": _SQL_SHUFFLE,
    "length_bucket_audit": _SQL_LENGTH_BUCKETS,
}


# ---------------------------------------------------------------------------
# Character-entropy quality gate (fixed alphabet, zero-shuffle scoring)
# ---------------------------------------------------------------------------

_ENT_ALPHABET = "abcdefghijklmnopqrstuvwxyz "
_ENT_LOW_MICRO = 2_500_000  # 2.5 nats — below this a doc reads as repetitive


def _entropy_exprs(div: str) -> tuple[list[str], str, str]:
    """Generate the shared (count exprs, n expr, entropy expr) SQL for a
    FIXED 27-char alphabet.

    Per-char counts use the classic length-difference trick
    ``length(t) - length(replace(t, c, ''))`` — pure scalar expressions
    both engines codegen identically; ``div`` is the only dialect split
    (Spark ``div`` vs DuckDB ``//``).
    """
    cnts = [
        f"(length(t) - length(replace(t, '{c}', ''))) AS c{i}"
        for i, c in enumerate(_ENT_ALPHABET)
    ]
    n = "(" + " + ".join(f"c{i}" for i in range(len(_ENT_ALPHABET))) + ") AS n"
    terms = " + ".join(
        f"(CASE WHEN c{i} > 0 THEN c{i} * CAST(ROUND((LN(n) - LN(c{i}))"
        f" * 1000000) AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(len(_ENT_ALPHABET))
    )
    return cnts, n, f"({terms}) {div} n"


def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document over a fixed 27-char
    alphabet (a–z + space), rolled up per lang: the cheapest gibberish /
    mojibake / repetition detector a crawl-filtering pipeline runs before
    any tokenization. Low-entropy docs (< 2.5 nats) are the flag count.

    Determinism: per-char log terms are quantized to integer micro-nats
    once, per-doc entropy is a bigint-sum integer division — no float
    ever re-accumulates across rows or engines.

    Scale: the entire per-doc score is 27 codegen'd scalar expressions
    (length-difference counting — no explode, no per-char shuffle, no
    UDF); the only exchange is the final 2-group rollup with map-side
    partials. This is the shape that survives 100 TB: scoring rides the
    scan.
    """
    cnts, n_sql, ent_sql = _entropy_exprs("div")
    docs = load_table(spark, sf_dir, "documents")
    scored = (
        docs.selectExpr("doc_id", "lang", "lower(text) AS t")
        .selectExpr("doc_id", "lang", *cnts)
        .selectExpr("*", n_sql)
        .where(F.col("n") > 0)
        .selectExpr("doc_id", "lang", f"{ent_sql} AS entropy_micro")
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("entropy_micro") < _ENT_LOW_MICRO).cast("long"))
            .cast("long")
            .alias("n_low_entropy"),
            F.min("entropy_micro").cast("long").alias("min_entropy_micro"),
            F.max("entropy_micro").cast("long").alias("max_entropy_micro"),
        )
        .orderBy("lang")
    )


def _sql_char_entropy() -> str:
    cnts, n_sql, ent_sql = _entropy_exprs("//")
    return f"""
WITH lowered AS (
  SELECT doc_id, lang, lower(text) AS t FROM documents
), counted0 AS (
  SELECT doc_id, lang, {", ".join(cnts)} FROM lowered
), counted AS (
  SELECT *, {n_sql} FROM counted0
), scored AS (
  SELECT doc_id, lang, {ent_sql} AS entropy_micro
  FROM counted WHERE n > 0
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN entropy_micro < {_ENT_LOW_MICRO} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low_entropy,
       CAST(MIN(entropy_micro) AS BIGINT) AS min_entropy_micro,
       CAST(MAX(entropy_micro) AS BIGINT) AS max_entropy_micro
FROM scored
GROUP BY lang
ORDER BY lang
"""


QUERIES["char_entropy"] = char_entropy
ORACLE["char_entropy"] = _sql_char_entropy()


# ---------------------------------------------------------------------------
# Per-label embedding centroids (integer-exact cluster statistics)
# ---------------------------------------------------------------------------


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding table, component-exact: every
    float component is quantized once to integer micro-units, per-(label,
    dim) sums are bigint, and the centroid component is integer division
    — the k-means-update / class-prototype statistic with none of the
    float-summation nondeterminism that makes naive AVG(embedding[i])
    engine- and partitioning-dependent. float→double widening is exact,
    so both engines quantize identical doubles.

    Scale: posexplode ships (label, dim, micro) triples — 16 bytes of
    payload per component — into ONE groupBy(label, dim) shuffle with
    map-side partials; output is |labels|·dims rows, data-independent.
    This is exactly how distributed k-means updates centroids (sum +
    count per dim), so the shape is the 100 TB shape by construction.
    """
    emb = load_vectors(spark, sf_dir)
    comps = emb.select(
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "val"),
    ).select(
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.expr("cast(round(cast(val as double) * 1000000) as long)").alias("q"),
    )
    return (
        comps.groupBy("label", "dim")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.expr("sum(q) div count(*)").alias("centroid_micro"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            "dim",
            "n_vecs",
            "centroid_micro",
        )
        .orderBy("label", "dim")
    )


_SQL_CENTROIDS = f"""
WITH {SQL_VALID_EMB}, comps AS (
  SELECT label, UNNEST(range(0, len(embedding))) AS dim,
         UNNEST(embedding) AS val
  FROM embeddings_valid
), q AS (
  SELECT label, dim,
         CAST(ROUND(CAST(val AS DOUBLE) * 1000000) AS BIGINT) AS q
  FROM comps
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(q) // COUNT(*) AS BIGINT) AS centroid_micro
FROM q
GROUP BY label, dim
ORDER BY label, dim
"""

QUERIES["embedding_centroids"] = embedding_centroids
ORACLE["embedding_centroids"] = _SQL_CENTROIDS


# ---------------------------------------------------------------------------
# Cross-modal cluster quality profile (documents ⋈ embeddings)
# ---------------------------------------------------------------------------


def cluster_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level curation signal: join each document to its embedding
    row (vec_id ≡ doc_id in the synthetic corpus) and profile every
    embedding cluster (label) by the text-quality statistics of its
    members — docs, token mass, mean chars (integer division), distinct
    languages. This is the table a curation pipeline ranks to PRUNE
    whole low-quality clusters (the cluster-level analogue of per-doc
    filtering, cf. semantic dedup / SemDeDup-style cluster pruning).

    Scale: one co-partitioned equi-join on the id (both sides shuffle
    once on the same key; with both tables bucketed by id in the lake it
    is exchange-free), then a 10-group rollup with map-side partials.
    Integer discipline throughout — no float accumulates.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    joined = docs.join(emb, "doc_id")
    return (
        joined.groupBy(F.col("label").cast("long").alias("label"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(X.token_count("text")).cast("long").alias("sum_tok"),
            F.expr("sum(n_chars) div count(*)").alias("mean_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
        .orderBy("label")
    )


_SQL_CLUSTER_QUALITY = r"""
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
                                x -> x <> ''))) AS BIGINT) AS sum_tok,
       CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY label
ORDER BY label
"""

QUERIES["cluster_quality_profile"] = cluster_quality_profile
ORACLE["cluster_quality_profile"] = _SQL_CLUSTER_QUALITY


# ---------------------------------------------------------------------------
# Dataset card: the one-row datasheet manifest
# ---------------------------------------------------------------------------


def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus datasheet in one row — docs, exact token and char mass,
    language/source breadth, exact-duplicate rate in ppm, and the
    min/max document length: the numbers every released training set
    publishes in its dataset card, computed engine-side so the card can
    never drift from the data.

    Scale: token/char masses are per-row projections feeding one global
    aggregate (map-side partials); the duplicate rate reuses the
    fingerprint discipline (count - distinct fp) — one narrow distinct
    over 128-bit fingerprints, never text. All integers.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        X.token_count("text").alias("n_tok"),
        F.col("n_chars"),
        "lang",
        "source",
        X.fingerprint("text").alias("fp"),
    )
    return per.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.expr(
            # nullif guard (hapax_ratio precedent): ANSI Spark throws on
            # div 0 where DuckDB's // 0 is NULL — an empty corpus must
            # produce the oracle's NULL dup rate, not a crash
            "cast((count(*) - count(distinct fp)) * 1000000"
            "     div nullif(count(*), 0) as long)"
        ).alias("dup_ppm"),
        F.min("n_tok").cast("long").alias("min_tok"),
        F.max("n_tok").cast("long").alias("max_tok"),
    )


_SQL_DATASET_CARD = r"""
WITH per AS (
  SELECT len(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
                         x -> x <> '')) AS n_tok,
         n_chars, lang, source,
         md5(trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g'))) AS fp
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST((COUNT(*) - COUNT(DISTINCT fp)) * 1000000
            // NULLIF(COUNT(*), 0) AS BIGINT) AS dup_ppm,
       CAST(MIN(n_tok) AS BIGINT) AS min_tok,
       CAST(MAX(n_tok) AS BIGINT) AS max_tok
FROM per
"""

QUERIES["dataset_card"] = dataset_card
ORACLE["dataset_card"] = _SQL_DATASET_CARD


# ---------------------------------------------------------------------------
# Hapax ratio: lexical-diversity signal per source
# ---------------------------------------------------------------------------


def hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena share per source: the fraction (ppm) of a source's
    token OCCURRENCES whose term appears exactly once in the WHOLE
    corpus — the classic lexical-diversity / templated-text detector (a
    boilerplate farm has almost no corpus-hapaxes; natural prose is
    full of them).

    Scale: corpus term frequencies are ONE word-count shuffle; the
    hapax flag broadcasts back vocabulary-sized onto the per-(source,
    term) counts from the same pass — no second corpus scan. Pure
    bigint ppm division.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(X.tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("tf"))
    )
    corpus = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    return (
        tf.join(F.broadcast(corpus.where(F.col("cf") == 1)), "term", "left")
        .groupBy("source")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("cf").isNotNull(), F.col("tf")).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
            F.expr(
                "cast(sum(case when cf is not null then tf else 0 end)"
                "     * 1000000 div nullif(sum(tf), 0) as long)"
            ).alias("hapax_ppm"),
        )
        .orderBy("source")
    )


_SQL_HAPAX = r"""
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2
), corpus AS (
  SELECT term, SUM(tf) AS cf FROM tf GROUP BY 1
)
SELECT source,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN cf = 1 THEN tf ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(SUM(CASE WHEN cf = 1 THEN tf ELSE 0 END) * 1000000
            // NULLIF(SUM(tf), 0) AS BIGINT) AS hapax_ppm
FROM tf JOIN corpus USING (term)
GROUP BY source
ORDER BY source
"""

QUERIES["hapax_ratio"] = hapax_ratio
ORACLE["hapax_ratio"] = _SQL_HAPAX


# ---------------------------------------------------------------------------
# bigram_perplexity — conditional-LM surprise (the unigram_surprise sequel)
# ---------------------------------------------------------------------------

_BIGRAM_FLAG_MICRONATS = 7_000_000  # docs with mean surprise > 7 nats


def bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean BIGRAM surprise −ln p(w₂|w₁) under the corpus's
    own Laplace-smoothed bigram LM — p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V) —
    rolled up per (lang, source): the conditional-context sequel to
    ``unigram_surprise`` (word-order-scrambled text scores identically
    there but lights up here). V is the vocabulary of bigram-position
    tokens (|{w₁}∪{w₂}|), so the LM derives from ONE bigram pass — no
    second corpus-wide token explode.

    Determinism (the unigram recipe): the single float op — ln of the
    smoothed ratio — is computed once per DISTINCT bigram and quantized
    to integer micro-nats before any accumulation; per-doc means are
    bigint ``div``. Docs with <2 tokens have no bigram and drop on both
    engines.

    Scale: bigram fan-out is word-count shape (size-1 structs per
    token); the LM is bigram-VOCABULARY-sized — bigger than the unigram
    LM but still corpus-sublinear — so the score join-back runs as a
    hash join on the (w₁,w₂) key, NOT a forced broadcast (at 100 TB the
    bigram table outgrows an executor; AQE may still elect broadcast at
    small SF). Context counts and V fold from the bigram-count table,
    never re-scanning the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    bg = (
        docs.select("doc_id", "lang", "source",
                    X.tokens("text").alias("t"))
        .where(F.size("t") >= 2)
        .select(
            "doc_id", "lang", "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i ->"
                    " struct(element_at(t, i) as w1,"
                    "        element_at(t, i + 1) as w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "lang", "source", "p.w1", "p.w2")
    )
    from ._cache import scoped

    # tf feeds the LM build AND the score join-back; cbg feeds counts,
    # contexts, and V — both persist result-scoped or the bigram fan-out
    # (the query's expensive stage) replays once per consumer branch
    tf = bg.groupBy("doc_id", "lang", "source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    ).persist()
    cbg = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("cbg")).persist()
    cw1 = cbg.groupBy("w1").agg(F.sum("cbg").alias("cw1"))
    vocab = (
        cbg.select(F.col("w1").alias("w"))
        .unionAll(cbg.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    lm = (
        cbg.join(cw1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1", "w2",
            F.expr(
                "cast(round(-ln((cbg + 1) / (cw1 + v)) * 1000000) as long)"
            ).alias("surprise_micro"),
        )
    )
    per_doc = (
        tf.join(lm, ["w1", "w2"])
        .groupBy("doc_id", "lang", "source")
        .agg(F.expr("sum(tf * surprise_micro) div sum(tf)").alias("mean_micro"))
    )
    result = (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("mean_micro").cast("long").alias("max_mean_micronats"),
            F.sum(
                (F.col("mean_micro") > _BIGRAM_FLAG_MICRONATS).cast("long")
            ).alias("n_flagged"),
        )
        .orderBy("lang", "source")
    )
    return scoped(result, tf, cbg)


_SQL_BIGRAM = rf"""
WITH tok AS (
  SELECT doc_id, lang, source,
         list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
                     x -> x <> '') AS ts
  FROM documents
), pos AS (
  SELECT doc_id, lang, source, ts,
         unnest(generate_series(1, len(ts) - 1)) AS i
  FROM tok WHERE len(ts) >= 2
), bg AS (
  SELECT doc_id, lang, source, ts[i] AS w1, ts[i + 1] AS w2 FROM pos
), tf AS (
  SELECT doc_id, lang, source, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
  FROM bg GROUP BY 1, 2, 3, 4, 5
), cbg AS (
  SELECT w1, w2, SUM(tf) AS cbg FROM tf GROUP BY 1, 2
), cw1 AS (
  SELECT w1, SUM(cbg) AS cw1 FROM cbg GROUP BY 1
), voc AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM (
    SELECT w1 AS w FROM cbg UNION ALL SELECT w2 AS w FROM cbg
  )
), lm AS (
  SELECT w1, w2,
         CAST(ROUND(-ln((cbg + 1) / (cw1 + v)) * 1000000) AS BIGINT)
           AS surprise_micro
  FROM cbg JOIN cw1 USING (w1) CROSS JOIN voc
), per_doc AS (
  SELECT tf.doc_id, tf.lang, tf.source,
         SUM(tf.tf * lm.surprise_micro) // SUM(tf.tf) AS mean_micro
  FROM tf JOIN lm USING (w1, w2)
  GROUP BY 1, 2, 3
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(mean_micro) AS BIGINT) AS max_mean_micronats,
       CAST(SUM(CASE WHEN mean_micro > {_BIGRAM_FLAG_MICRONATS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM per_doc
GROUP BY 1, 2
ORDER BY 1, 2
"""

QUERIES["bigram_perplexity"] = bigram_perplexity
ORACLE["bigram_perplexity"] = _SQL_BIGRAM
