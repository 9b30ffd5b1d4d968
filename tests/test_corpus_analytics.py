"""Properties of the round-4 corpus-analytics additions: source-mix
entropy, Zipf rank-frequency fit, and PMI collocations (exact value
parity vs DuckDB is covered by tools/verify_local.py; these pin the
semantic invariants)."""

import math

from myserver_datawarehouse_spark.plans import llm_text as LT
from myserver_datawarehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_source_mix_entropy_bounds(spark):
    rows = LT.source_mix_entropy(spark, SF).collect()
    assert rows
    total_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == total_docs
    for r in rows:
        # 0 <= H <= log2(n_sources); effective count within [1, n_sources].
        assert 0.0 <= r.entropy_bits <= math.log2(r.n_sources) + 1e-9
        assert 1.0 - 1e-9 <= r.effective_sources <= r.n_sources + 1e-9
        assert abs(r.effective_sources - 2**r.entropy_bits) < 1e-3


def test_token_zipf_fit_slope_negative(spark):
    rows = LT.token_zipf_fit(spark, SF).collect()
    assert rows
    for r in rows:
        # Frequencies are non-increasing in rank, so the LS slope of
        # log(freq) on log(rank) can never be positive.
        assert r.zipf_slope <= 0.0
        assert 2 <= r.n_terms <= LT.ZIPF_TOP_N


def test_word_cooccurrence_pmi_invariants(spark):
    rows = LT.word_cooccurrence_pmi(spark, SF).collect()
    assert rows
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        ranks = sorted(r.rk for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= LT.PMI_TOP_K
        for r in rs:
            assert r.w1 < r.w2  # canonical pair order
            # doc-grain counts: a pair can't co-occur more often than
            # either member occurs.
            assert r.c12 <= min(r.c1, r.c2)
            assert r.c12 >= LT.PMI_MIN_PAIR_DOCS


def test_quality_weighted_sample_properties(spark):
    rows = LT.quality_weighted_sample(spark, SF).collect()
    assert rows
    docs = load_table(spark, SF, "documents").select("lang", "n_chars").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    corpus = {}
    for r in docs:
        corpus.setdefault(r.lang, []).append(r.n_chars)
    for lang, rs in by_lang.items():
        ranks = sorted(r.rk for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= LT.WSAMPLE_K
        # es_key ordering is what defined the ranks.
        keyed = sorted(rs, key=lambda r: r.rk)
        keys = [r.es_key for r in keyed]
        assert keys == sorted(keys, reverse=True)
        # Weighted draw pulls the sample mean ABOVE the corpus mean
        # (weight = n_chars): deterministic on this fixture.
        if len(corpus[lang]) > LT.WSAMPLE_K:
            sample_mean = sum(r.n_chars for r in rs) / len(rs)
            corpus_mean = sum(corpus[lang]) / len(corpus[lang])
            assert sample_mean > corpus_mean


def test_quality_weighted_sample_deterministic(spark):
    a = [tuple(r) for r in LT.quality_weighted_sample(spark, SF).collect()]
    b = [tuple(r) for r in LT.quality_weighted_sample(spark, SF).collect()]
    assert a == b


def test_dup_ngram_coverage_duplicates_score_high(spark):
    rows = LT.dup_ngram_coverage(spark, SF).collect()
    assert rows
    n_docs = load_table(spark, SF, "documents").count()
    # Docs shorter than K tokens are excluded by construction; everything
    # else appears exactly once.
    assert len(rows) <= n_docs
    assert len({r.doc_id for r in rows}) == len(rows)
    for r in rows:
        assert 0 <= r.n_dup_grams <= r.n_grams
        assert abs(r.dup_gram_frac - round(r.n_dup_grams / r.n_grams, 6)) < 1e-9
    # The corpus contains exact duplicates (dedup_exact finds copies), and
    # every gram of an exact copy is corpus-duplicated by definition.
    full = [r for r in rows if r.dup_gram_frac == 1.0]
    dups = LT.dedup_exact(spark, SF).filter("n_copies > 1").collect()
    if dups:
        assert full


def test_gopher_quality_flags_rollup(spark):
    rows = LT.gopher_quality_flags(spark, SF).collect()
    assert rows
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        # pass_all is the conjunction: never exceeds any individual gate.
        assert r.n_pass_all <= min(r.n_pass_len, r.n_pass_mwl, r.n_pass_stop)
        assert 0.0 <= r.pass_rate <= 1.0
        assert abs(r.pass_rate - round(r.n_pass_all / r.n_docs, 6)) < 1e-9


def test_leakage_safe_split_no_cluster_crosses_sides(spark):
    rows = LT.leakage_safe_split(spark, SF).collect()
    assert rows
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        # the construction forces zero leakage, and it is a CHECKED output
        assert r.leaked_clusters == 0
        assert r.n_roots <= r.n_docs
