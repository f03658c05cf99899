"""Degenerate-input contracts for plans/corpus.py — the same differential
discipline as the main gate, but on adversarial corpora the synthetic
testdata never exercises: sub-k-token docs, empty/whitespace text, single
sources, and duplicate-free corpora."""

from __future__ import annotations

import pandas as pd
import pytest

from _diffutil import assert_df_match as _diff
from _diffutil import duck_oracle as _oracle

from bytewax_iceberg_connector_spark.plans import corpus as C


def _docs_dir(tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


DEGENERATE = [
    # shorter than k=3 tokens, duplicated pair, whitespace-only, 1-token
    (0, "alpha beta", "en", "srcA", 10),
    (1, "alpha beta gamma alpha beta gamma", "en", "srcA", 33),
    (2, "alpha beta gamma alpha beta gamma", "en", "srcB", 33),
    (3, "   ", "en", "srcB", 3),
    (4, "solo", "de", "srcC", 4),
]


def test_span_dedup_short_and_blank_docs_match_oracle(spark, tmp_path):
    d = _docs_dir(tmp_path, DEGENERATE)
    _diff(C.span_dedup(spark, d).toPandas(), _oracle(tmp_path, C._SQL_SPAN_DEDUP))


def test_span_dedup_within_doc_repeat_counts_as_duplicated(spark, tmp_path):
    """C4 removes exact repeated spans wherever the twin lives — a gram
    occurring twice INSIDE one doc is duplicated even with no cross-doc
    twin."""
    d = _docs_dir(
        tmp_path,
        [(0, "x y z q r x y z", "en", "s0", 15)],  # 'x y z' twice, one doc
    )
    row = C.span_dedup(spark, d).collect()[0]
    # dup starts at pos 1 and 6: contrib 3 + min(3, 5) = 6 covered tokens
    assert row.removed_tokens == 6
    assert row.n_docs_hit == 1
    _diff(C.span_dedup(spark, d).toPandas(), _oracle(tmp_path, C._SQL_SPAN_DEDUP))


def test_quality_adaptive_excludes_empty_docs_on_both_engines(spark, tmp_path):
    d = _docs_dir(tmp_path, DEGENERATE)
    sp = C.quality_adaptive_filter(spark, d).toPandas()
    _diff(sp, _oracle(tmp_path, C._SQL_ADAPTIVE))
    # the whitespace-only doc is excluded from its language's cohort
    assert int(sp.loc[sp.lang == "en", "n_docs"].iloc[0]) == 3


def test_quality_adaptive_singleton_language(spark, tmp_path):
    """A language with ONE doc: threshold = that doc's own score, doc
    survives (≥), kept_ppm = 1e6."""
    d = _docs_dir(tmp_path, DEGENERATE)
    sp = C.quality_adaptive_filter(spark, d).toPandas()
    de = sp[sp.lang == "de"].iloc[0]
    assert de.n_docs == 1 and de.n_kept == 1 and de.kept_ppm == 1_000_000


def test_vocab_build_min_cf_prunes_and_coverage_counts_all_mass(spark, tmp_path):
    d = _docs_dir(tmp_path, DEGENERATE)
    sp = C.vocab_build(spark, d).toPandas()
    _diff(sp, _oracle(tmp_path, C._SQL_VOCAB))
    # 'solo' (cf=1) must be pruned, but its mass still counts in the
    # denominator: top vocab coverage stays < 1e6
    assert "solo" not in set(sp.term)
    assert sp.coverage_ppm.max() < 1_000_000


def test_source_overlap_single_source_is_empty(spark, tmp_path):
    d = _docs_dir(
        tmp_path,
        [
            (0, "a b c d e", "en", "only", 9),
            (1, "a b c d e", "en", "only", 9),
        ],
    )
    assert C.source_overlap_matrix(spark, d).count() == 0


def test_source_overlap_counts_distinct_shared_grams(spark, tmp_path):
    """Shared grams count DISTINCT per pair even when repeated within
    either source — and agree with the oracle's self-join formulation."""
    d = _docs_dir(
        tmp_path,
        [
            (0, "a b c a b c", "en", "s1", 11),  # grams: abc,bca,cab,abc
            (1, "a b c z z z", "en", "s2", 11),  # shares only 'a b c'
        ],
    )
    sp = C.source_overlap_matrix(spark, d).toPandas()
    assert len(sp) == 1 and int(sp.shared_grams.iloc[0]) == 1
    _diff(sp, _oracle(tmp_path, C._SQL_OVERLAP))


def test_pmi_null_doc_id_excluded_on_both_engines(spark, tmp_path):
    """A NULL-keyed document cannot be attributed: Spark's groupBy would
    pool all NULLs into one phantom doc while the oracle's equi-self-join
    drops them — both sides must exclude it from membership AND the
    n_docs denominator (regression for the confirmed divergence)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, None], pa.int64()),
                "text": pa.array(["alpha beta"] * 3, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["s"] * 3, pa.string()),
                "n_chars": pa.array([10] * 3, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    sp = C.cooccurrence_pmi(spark, str(tmp_path)).toPandas()
    assert list(sp["n_ab"]) == [2]  # the NULL doc contributes no pair
    assert sp.loc[0, "pmi_micro"] == 0  # ln(2*2/(2*2)) — NULL doc out of n_docs
    _diff(sp, _oracle(tmp_path, C._SQL_PMI))


def test_pmi_degenerate_corpora(spark, tmp_path):
    """Single-term docs produce no pairs; a whitespace-only doc produces
    no membership; both engines agree on the empty report."""
    d = _docs_dir(
        tmp_path,
        [(0, "solo", "en", "s", 4), (1, "   ", "en", "s", 3)],
    )
    sp = C.cooccurrence_pmi(spark, d).toPandas()
    assert sp.empty
    _diff(sp, _oracle(tmp_path, C._SQL_PMI))


# ---------------------------------------------------------------------------
# bpe_merges (r05)
# ---------------------------------------------------------------------------

def test_bpe_merges_learns_expected_rules_and_matches_oracle(spark, tmp_path):
    """Tiny corpus with a hand-checkable merge sequence: 'aaab' x3 + 'ab'.
    Vocab: aaab(3), ab(1). Pairs r1: (a,a):6, (a,b):4 -> merge (a,a).
    r2: reprs 'aa a b'(3), 'a b'(1): (aa,a):3, (a,b):4 -> merge (a,b).
    r3: 'aa ab'(3), 'ab'(1): (aa,ab):3 -> merge. r4: no pairs -> stop."""
    d = _docs_dir(
        tmp_path,
        [(0, "aaab aaab aaab ab", "en", "s0", 17)],
    )
    sp = C.bpe_merges(spark, d).toPandas()
    got = [tuple(r) for r in sp.itertuples(index=False)]
    assert got == [
        (1, "a", "a", 6),
        (2, "a", "b", 4),
        (3, "aa", "ab", 3),
    ]
    _diff(sp, _oracle(tmp_path, C._SQL_BPE))


def test_bpe_merge_is_greedy_nonoverlapping(spark, tmp_path):
    """'aaa' must merge to ['aa','a'] not ['aa','aa'] — the literal-replace
    left-to-right scan IS greedy BPE; pair counting stays overlapping
    (Sennrich get_stats)."""
    d = _docs_dir(tmp_path, [(0, "aaa aaa", "en", "s0", 7)])
    sp = C.bpe_merges(spark, d).toPandas()
    got = [tuple(r) for r in sp.itertuples(index=False)]
    # r1: (a,a) counted overlapping: 2 per word x2 words = 4
    # r2: reprs 'aa a': (aa,a): 2 -> merge
    assert got[0] == (1, "a", "a", 4)
    assert got[1] == (2, "aa", "a", 2)
    _diff(sp, _oracle(tmp_path, C._SQL_BPE))


def test_bpe_empty_and_single_char_corpus(spark, tmp_path):
    """Single-char words have no pairs: zero merges on both engines."""
    d = _docs_dir(
        tmp_path,
        [(0, "a b c a b", "en", "s0", 9), (1, "   ", "en", "s0", 3)],
    )
    sp = C.bpe_merges(spark, d).toPandas()
    assert len(sp) == 0
    _diff(sp, _oracle(tmp_path, C._SQL_BPE))


def test_bpe_encode_compression_arithmetic(spark, tmp_path):
    """Known corpus: 'aaab' x3 + 'ab' learns ((a,a),(a,b),(aa,ab)); the
    encoded corpus is then 1 symbol per word. before = 14 chars,
    after = 4 symbols, compression = 4e6 // 14."""
    d = _docs_dir(tmp_path, [(0, "aaab aaab aaab ab", "en", "s0", 17)])
    sp = C.bpe_encode(spark, d).toPandas()
    assert len(sp) == 1
    r = sp.iloc[0]
    assert (r["tokens_before"], r["tokens_after"]) == (14, 4)
    assert r["compression_ppm"] == 4 * 1000000 // 14
    _diff(sp, _oracle(tmp_path, C._SQL_BPE_ENCODE))


def test_bpe_encode_fewer_merges_than_budget_is_noop_tail(spark, tmp_path):
    """A corpus that dries up after 2 merges: the 6 absent merges must be
    no-ops on BOTH engines (Spark applies fewer replaces; the oracle's
    NULL scalar subqueries coalesce to the identity needle)."""
    d = _docs_dir(tmp_path, [(0, "aaa aaa", "en", "s0", 7)])
    sp = C.bpe_encode(spark, d).toPandas()
    # 'aaa' -> merge1 (a,a) -> 'aa a' -> merge2 (aa,a) -> 'aaa': 1 symbol
    r = sp.iloc[0]
    assert (r["tokens_before"], r["tokens_after"]) == (6, 2)
    _diff(sp, _oracle(tmp_path, C._SQL_BPE_ENCODE))


def test_bpe_merge_true_greedy_on_even_repeats(spark, tmp_path):
    """The r05 review finding: 'aaaa' must merge to ('aa','aa'), not the
    shared-delimiter skip ('aa','a','a') — pair (a,a) counted 3x per word
    (overlapping), merged greedily left-to-right non-overlapping."""
    d = _docs_dir(tmp_path, [(0, "aaaa aaaa abab", "en", "s0", 14)])
    sp = C.bpe_merges(spark, d).toPandas()
    got = [tuple(r) for r in sp.itertuples(index=False)]
    # r1: (a,a): 3 per 'aaaa' x2 = 6; (a,b): 2, (b,a): 1 -> merge (a,a)
    assert got[0] == (1, "a", "a", 6)
    # r2: reprs 'aa  aa' x2, 'a  b  a  b': (aa,aa):2, (a,b):2, (b,a):1
    #     tie on 2 -> lexicographic (a,b) wins over (aa,aa)
    assert got[1] == (2, "a", "b", 2)
    # r3: 'aa  aa' x2, 'ab  ab': (aa,aa):2, (ab,ab):1 -> (aa,aa)
    assert got[2] == (3, "aa", "aa", 2)
    # r4 continues: ('ab','ab') merges too (budget is 8)
    assert tuple(got[3]) == (4, "ab", "ab", 1)
    _diff(sp, _oracle(tmp_path, C._SQL_BPE))
    enc = C.bpe_encode(spark, d).toPandas().iloc[0]
    # encoded: 'aaaa' -> 1 symbol after r3, 'abab' -> 1 symbol after r4
    assert (enc["tokens_before"], enc["tokens_after"]) == (12, 3)
    _diff(C.bpe_encode(spark, d).toPandas(), _oracle(tmp_path, C._SQL_BPE_ENCODE))


def _ref_bpe(word_freqs, n_merges):
    """Pure-Python Sennrich reference: overlapping pair counts, greedy
    left-to-right non-overlapping merge, ties (count DESC, l, r ASC)."""
    reprs = {w: tuple(w) for w in word_freqs}
    merges = []
    for it in range(1, n_merges + 1):
        counts = {}
        for w, f in word_freqs.items():
            s = reprs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        merges.append((it, best[0], best[1], counts[best]))
        for w, s in reprs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            reprs[w] = tuple(out)
    return merges


@pytest.mark.parametrize(
    "text",
    [
        "aaaa aaaa abab",          # even repeats (the r05 delimiter bug)
        "banana banana bandana",   # overlapping pair families
        "aaa aa a aaaa aaaaa",     # mixed run lengths
        "abcabc cabcab bcabca",    # rotations
        "xy xy xy yx yx xxyy",     # 2-symbol ties
    ],
)
def test_bpe_matches_pure_python_reference(spark, tmp_path, text):
    """The engine's merge loop must agree with an independent pure-Python
    Sennrich implementation — the oracle replays the same replace trick,
    so only a third implementation with DIFFERENT mechanics can catch a
    both-engines-wrong semantics bug (the r05 review finding's class)."""
    d = _docs_dir(tmp_path, [(0, text, "en", "s0", len(text))])
    got = [
        tuple(r)
        for r in C.bpe_merges(spark, d).toPandas().itertuples(index=False)
    ]
    freqs = {}
    for w in text.split():
        freqs[w] = freqs.get(w, 0) + 1
    assert got == _ref_bpe(freqs, C._BPE_MERGES)


def test_source_keywords_degenerate_matches_oracle(spark, tmp_path):
    """Blank docs, sub-topk vocabularies, a single-term source, and a
    NULL-source row (the cooccurrence_pmi NULL-key class, here on the
    GROUP BY side where both engines pool NULLs identically)."""
    d = _docs_dir(
        tmp_path,
        DEGENERATE + [(5, "alpha beta omega", "en", None, 16)],
    )
    _diff(
        C.source_keywords(spark, d).toPandas(),
        _oracle(tmp_path, C._SQL_SOURCE_KEYWORDS),
    )


def test_source_keywords_single_source_all_idf_zero(spark, tmp_path):
    """With one source every term's idf is ln(1/1)=0, so every score is
    exactly 0 and the top-k is the deterministic term-asc head."""
    d = _docs_dir(
        tmp_path,
        [(0, "delta charlie bravo alpha echo foxtrot golf", "en", "s0", 43)],
    )
    sp = C.source_keywords(spark, d).toPandas()
    assert len(sp) == C._KEYWORDS_TOPK
    assert (sp.score_micro == 0).all()
    assert list(sp.term) == sorted(sp.term)
    _diff(sp, _oracle(tmp_path, C._SQL_SOURCE_KEYWORDS))


def test_source_keywords_discriminative_term_outranks_common(spark, tmp_path):
    """A term unique to one source must outrank a higher-tf term shared
    by every source (idf 0 zeroes the shared term's score)."""
    d = _docs_dir(
        tmp_path,
        [
            (0, "the the the the cat", "en", "s1", 19),
            (1, "the the the the dog", "en", "s2", 19),
        ],
    )
    sp = C.source_keywords(spark, d).toPandas()
    top = sp[sp.rnk == 1].set_index("source").term
    assert top["s1"] == "cat" and top["s2"] == "dog"
    _diff(sp, _oracle(tmp_path, C._SQL_SOURCE_KEYWORDS))


def test_tokenizer_fertility_bounds_and_oracle(spark, tmp_path):
    """BPE merges can only SHRINK a word's symbol string, never below one
    symbol per word: words <= bpe_tokens <= chars, so fertility_milli and
    chars_per_token_milli are both >= 1000 — and the crafted multi-lang
    corpus (empty and whitespace-only docs included) matches the oracle."""
    d = _docs_dir(
        tmp_path,
        [
            (0, "aa aa aa aa bb", "en", "s0", 14),
            (1, "aa bb aa bb aa", "en", "s0", 14),
            (2, "cc dd cc dd cc", "de", "s1", 14),
            (3, "", "de", "s1", 0),
            (4, "   ", "fr", "s2", 3),
        ],
    )
    sp = C.tokenizer_fertility(spark, d).toPandas()
    nonzero = sp[sp.words > 0]
    assert (nonzero.words <= nonzero.bpe_tokens).all()
    assert (nonzero.bpe_tokens <= nonzero.chars).all()
    assert (nonzero.fertility_milli >= 1000).all()
    assert (nonzero.chars_per_token_milli >= 1000).all()
    # 'fr' has only whitespace: all-zero counts, NULL ratios
    fr = sp[sp.lang == "fr"].iloc[0]
    assert fr.words == 0 and fr.bpe_tokens == 0
    _diff(sp, _oracle(tmp_path, C._SQL_FERTILITY))


def test_bpe_memo_invalidates_on_corpus_rewrite(spark, tmp_path):
    """The per-process merge memo must hit on an identical corpus stamp
    and RETRAIN when the file is rewritten (different mtime) —
    staleness across fixtures would poison every BPE consumer."""
    d = _docs_dir(tmp_path, [(0, "aa aa bb", "en", "s", 8)])
    m1 = C._learn_bpe(spark, d)
    assert C._learn_bpe(spark, d) is m1  # stamp hit: same object
    import time

    time.sleep(0.01)  # ensure distinguishable mtime_ns
    d = _docs_dir(tmp_path, [(0, "cc cc dd", "en", "s", 8)])
    m2 = C._learn_bpe(spark, d)
    assert m2 is not m1
    assert m2 != m1  # different corpus -> different merges


def test_boilerplate_prefixes_families_and_folding(spark, tmp_path):
    """A 3-doc template family (one member UPPERCASED — case folds), a
    2-doc short-text family (whole text = prefix), a singleton (dropped),
    and an empty doc (dropped); tie families rank by prefix ASC."""
    from _diffutil import assert_df_match as _diff
    from _diffutil import duck_oracle as _oracle
    from bytewax_iceberg_connector_spark.plans.corpus import (
        _SQL_BOILERPLATE,
        boilerplate_prefixes,
    )

    tpl = "cookie consent banner text here!" + "~"  # 32 chars + tail marker
    assert len(tpl) == 33
    rows = [
        (0, tpl + " page one", "en", "web", 40),
        (1, tpl.upper() + " page two", "en", "web", 40),
        (2, tpl + " page three", "en", "web", 40),
        (3, "short", "en", "web", 5),
        (4, "short", "en", "web", 5),
        (5, "a lone document prefix nobody shares", "en", "web", 36),
        (6, "", "en", "web", 0),
    ]
    d = _docs_dir(tmp_path, rows)
    sp = boilerplate_prefixes(spark, d).toPandas()
    assert list(sp.n_docs) == [3, 2]
    assert sp.iloc[0].prefix == tpl[:32]
    assert sp.iloc[1].prefix == "short"
    assert list(sp["rank"]) == [1, 2]
    _diff(sp, _oracle(tmp_path, _SQL_BOILERPLATE))
