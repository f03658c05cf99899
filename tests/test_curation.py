"""Curation-stage tests: PII redaction semantics, repetition flagging,
contamination detection, and split stability — properties the hash-based
oracle comparison can't see (it proves equality, not intent)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bytewax_iceberg_connector_spark.functions import text as X


def test_redact_pii_removes_and_tags(spark):
    df = spark.createDataFrame(
        [
            Row(t="mail me at jane.doe+x@sub.example.co.uk today"),
            Row(t="call +1 555-0199 or +44 555-0200 now"),
            Row(t="no pii here"),
        ]
    )
    out = df.select(
        X.redact_pii("t").alias("s"),
        *[c.alias(n) for n, c in zip(("em", "ph"), X.pii_counts("t"))],
    ).collect()
    assert out[0].s == "mail me at <EMAIL> today" and out[0].em == 1
    assert out[1].s == "call <PHONE> or <PHONE> now" and out[1].ph == 2
    assert out[2].s == "no pii here" and out[2].em == 0 and out[2].ph == 0
    # residual scan on scrubbed text finds nothing
    resid = df.select(X.redact_pii("t").alias("s"))
    r_em, r_ph = X.pii_counts("s")
    assert resid.select((r_em + r_ph).alias("r")).agg(F.sum("r")).collect()[0][0] == 0


def test_repetition_flag_is_integer_exact(spark, sf_dir):
    """A fully-repetitive doc is flagged; a unique-trigram doc is not; and
    the flag threshold is the exact integer test 2·distinct < total."""
    from bytewax_iceberg_connector_spark.plans.curation import repetition_ratio

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c " * 50, lang="xx", source="s", n_chars=0),
            Row(doc_id=2, text=" ".join(f"w{i}" for i in range(50)), lang="yy",
                source="s", n_chars=0),
        ]
    )
    t = X.tokens("text")
    per = df.select(
        "lang",
        F.greatest(F.size(t) - 2, F.lit(0)).alias("total"),
        F.size(X.shingles("text", 3)).alias("dist"),
    ).collect()
    by_lang = {r.lang: r for r in per}
    assert by_lang["xx"].dist == 3 and by_lang["xx"].total == 148   # flagged
    assert by_lang["yy"].dist == by_lang["yy"].total == 48          # clean
    # registered query runs end-to-end on the real corpus
    rows = repetition_ratio(spark, sf_dir).collect()
    assert rows and all(r.n_distinct <= r.n_trigrams for r in rows)


def test_contamination_finds_planted_overlap(spark):
    """A doc sharing a long passage with a benchmark doc is caught; an
    unrelated doc is not."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=bench_text),                      # benchmark (0 % 97 == 0)
            Row(doc_id=5, text="intro words " + bench_text),      # contaminated
            Row(doc_id=6, text="totally unrelated content here model data"),
        ]
    )
    sh = docs.select(
        "doc_id", F.explode(X.shingle_hashes_np(3)(F.col("text"))).alias("s")
    )
    bench = sh.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "s"
    )
    pairs = (
        sh.join(bench, "s")
        .where(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= 3)
        .collect()
    )
    assert {(p.doc_id, p.bench_id) for p in pairs} == {(5, 0)}


def test_dataset_split_is_stable_under_growth(spark, sf_dir):
    """Hash-based assignment: each doc's split is a pure function of its
    id — adding more docs never reassigns existing ones (the property a
    random split lacks), and proportions land near 80/10/10."""
    from bytewax_iceberg_connector_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    full = {r.doc_id: r.s for r in docs.select("doc_id", split.alias("s")).collect()}
    half = {
        r.doc_id: r.s
        for r in docs.where(F.col("doc_id") % 2 == 0)
        .select("doc_id", split.alias("s"))
        .collect()
    }
    assert all(full[d] == s for d, s in half.items())
    n = len(full)
    n_train = sum(1 for s in full.values() if s == "train")
    assert 0.7 * n <= n_train <= 0.9 * n


def test_doc_chunking_window_arithmetic(spark):
    """Chunk-count and overlap arithmetic on known docs: short doc → one
    chunk; exact multiple of stride; overlap duplicates W-S tokens."""
    from pyspark.sql import functions as F

    from bytewax_iceberg_connector_spark.functions import text as X

    W, S = 64, 48
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),    # < W → 1 chunk
            (2, " ".join(f"t{i}" for i in range(64))),    # == W → 1 chunk
            (3, " ".join(f"t{i}" for i in range(112))),   # W + S → 2 chunks
            (4, " ".join(f"t{i}" for i in range(113))),   # W + S + 1 → 3
        ],
        "doc_id INT, text STRING",
    )
    t = X.tokens("text")
    n_chunks = (F.ceil(F.greatest(F.size(t) - W, F.lit(0)) / S) + 1).cast("int")
    sizes = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.size(F.slice(t, i * S + 1, W)),
    )
    rows = {r.doc_id: r for r in docs.select(
        "doc_id", n_chunks.alias("nc"),
        F.aggregate(sizes, F.lit(0), lambda a, x: a + x).alias("ct"),
    ).collect()}
    assert rows[1].nc == 1 and rows[1].ct == 10
    assert rows[2].nc == 1 and rows[2].ct == 64
    assert rows[3].nc == 2 and rows[3].ct == 64 + 64      # 16-token overlap
    assert rows[4].nc == 3 and rows[4].ct == 64 + 64 + 17


def test_shard_shuffle_assignment_is_uniform():
    """The md5-derived shard formula must be UNIFORM mod the shard count —
    raw ascii codes of hex digits are not (16 symbols fold 3:1 onto mod-8
    residues, a silent 3:1 training-shard imbalance both engines would
    agree on). Checked distribution-level in DuckDB (no Spark needed)."""
    import duckdb

    from bytewax_iceberg_connector_spark.plans.curation import (
        _SHUFFLE_SHARDS,
        _SQL_SHUFFLE,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        "SELECT i AS doc_id, 'word word word' AS text FROM range(100000) t(i)"
    )
    counts = {r[0]: r[1] for r in con.execute(_SQL_SHUFFLE).fetchall()}
    con.close()
    assert len(counts) == _SHUFFLE_SHARDS
    expected = 100000 / _SHUFFLE_SHARDS
    for shard, n in counts.items():
        assert abs(n - expected) < 0.05 * expected, (shard, n)


def test_stratified_sample_growth_stable_and_rate_bounded(spark, sf_dir):
    """stratified_sample (r05): a doc's admission is a pure function of
    (doc_id, stratum) — shrinking the corpus never flips survivors'
    fates — and each stratum's admitted_ppm is statistically near its
    declared rate (binomial bound, loose)."""
    from bytewax_iceberg_connector_spark.plans.curation import (
        stratified_sample,
    )

    full = {
        (r.lang, r.source): r
        for r in stratified_sample(spark, sf_dir).collect()
    }
    for (lang, source), r in full.items():
        assert 0 <= r.n_admitted <= r.n_docs
        assert r.admitted_ppm == r.n_admitted * 1000000 // r.n_docs
        assert 62500 <= r.rate_ppm <= 1000000
    # growth stability at the doc level: admission flag recomputed on a
    # half corpus must agree with the full corpus for every shared doc
    from pyspark.sql import functions as F

    from bytewax_iceberg_connector_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    stratum = F.concat_ws(
        "/", F.coalesce(F.col("lang"), F.lit("?")),
        F.coalesce(F.col("source"), F.lit("?")),
    )
    rate = (
        F.conv(F.substring(F.md5(stratum), 1, 6), 16, 10).cast("long") % 16 + 1
    ) * 62500
    coord = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))),
                1, 6,
            ), 16, 10,
        ).cast("long") % 1000000
    )
    adm = (coord < rate).alias("adm")
    full_flags = {
        r.doc_id: r.adm for r in docs.select("doc_id", adm).collect()
    }
    half_flags = {
        r.doc_id: r.adm
        for r in docs.where(F.col("doc_id") % 2 == 0)
        .select("doc_id", adm)
        .collect()
    }
    assert all(full_flags[d] == a for d, a in half_flags.items())


def test_bigram_perplexity_hand_lm_and_short_doc_drop(spark, tmp_path):
    """One real doc 'A b a b': Laplace LM p(b|a)=3/4, p(a|b)=2/3; doc
    mean = (2*287682 + 405465) div 3 = 326943 micro-nats (case-folded);
    1-token and empty docs drop on both engines."""
    import pandas as pd

    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.curation import (
        _SQL_BIGRAM,
        bigram_perplexity,
    )

    rows = [
        (0, "A b a b", "en", "web", 7),
        (1, "z", "en", "web", 1),        # no bigram: drops
        (2, "   ", "en", "web", 3),      # whitespace-only: drops
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    pdf.to_parquet(tmp_path / "documents.parquet")
    d = str(tmp_path)
    sp = bigram_perplexity(spark, d).toPandas()
    assert len(sp) == 1
    row = sp.iloc[0]
    assert (row.n_docs, row.max_mean_micronats, row.n_flagged) == (1, 326943, 0)
    _diff(sp, _oracle(tmp_path, _SQL_BIGRAM))
