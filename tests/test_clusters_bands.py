"""Tests for the round-2 additions: connected-component dedup clusters,
repetition quality gates, TF-IDF top terms, the value-band range join,
and the multi-resolution rollup."""

import pytest

from myserver_datawarehouse_spark.plans import llm_text as LT
from myserver_datawarehouse_spark.plans import relational as R
from myserver_datawarehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _union_find(pairs):
    """Driver-side reference: union-find over the same pair list."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


# Module scope: dedup_clusters is the iterative connected-components job
# (~3s); both cluster tests only read its output, so run it once.
@pytest.fixture(scope="module")
def cluster_rows(spark):
    return LT.dedup_clusters(spark, SF).collect()


def test_dedup_clusters_matches_union_find(spark, cluster_rows):
    pairs = [
        (r.doc_a, r.doc_b)
        for r in LT._minhash_pair_frame(spark, SF).collect()
    ]
    got = {r.doc_id: (r.cluster_id, r.n_members) for r in cluster_rows}
    want = _union_find(pairs)
    assert set(got) == set(want)
    for doc, root in want.items():
        assert got[doc][0] == root
    # n_members consistent with the label multiplicity.
    from collections import Counter

    sizes = Counter(root for root in want.values())
    for doc, (root, n) in got.items():
        assert n == sizes[root]


def test_dedup_clusters_transitive_closure_property(cluster_rows):
    # Every cluster_id is itself a member of the cluster, and is the min.
    rows = cluster_rows
    if not rows:
        pytest.skip("no near-dup pairs at this sf")
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        assert cid == min(members)


def test_repetition_stats_bounds(spark):
    rows = LT.text_repetition_stats(spark, SF).collect()
    assert rows
    total_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == total_docs
    for r in rows:
        assert 0 <= r.n_flagged <= r.n_docs
        assert 0.0 < r.top_token_rate <= 1.0
        assert 0.0 < r.distinct_rate <= 1.0
        if r.top_bigram_rate is not None:
            assert 0.0 < r.top_bigram_rate <= 1.0


def test_tfidf_topk_shape(spark):
    rows = LT.tfidf_top_terms(spark, SF).collect()
    assert rows
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        ranks = [r.rank for r in sorted(rs, key=lambda r: r.rank)]
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= LT.TFIDF_TOP_K
        scores = [r.tfidf for r in sorted(rs, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)
        # Stopwords never surface as top terms.
        assert not {r.term for r in rs} & set(
            __import__(
                "myserver_datawarehouse_spark.operators.text",
                fromlist=["STOPWORDS"],
            ).STOPWORDS
        )


def test_value_band_join_covers_all_events(spark):
    rows = R.events_value_band_join(spark, SF).collect()
    n_total = load_table(spark, SF, "events").count()
    assert sum(r.n_events for r in rows) == n_total  # bands partition values
    assert {r.band for r in rows} <= {b for b, _, _ in R.VALUE_BANDS}


def test_multires_rollup_grain_consistency(spark):
    rows = R.events_multires_rollup(spark, SF).collect()
    n_total = load_table(spark, SF, "events").count()
    by_grain = {}
    for r in rows:
        by_grain.setdefault(r.grain, []).append(r)
    assert set(by_grain) == {0, 1, 3, 7}
    for grain, rs in by_grain.items():
        assert sum(r.n_events for r in rs) == n_total
    assert len(by_grain[7]) == 1  # single grand-total row
    # Hierarchy: #minute rows >= #hour rows >= #day rows.
    assert len(by_grain[0]) >= len(by_grain[1]) >= len(by_grain[3])


def test_corpus_build_funnel_monotone(spark):
    rows = LT.corpus_build_pipeline(spark, SF).collect()
    assert rows
    total_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n_raw for r in rows) == total_docs
    for r in rows:
        assert r.n_final <= r.n_curated <= r.n_raw
        assert r.tokens_final >= 0
    # Curation stage agrees with the standalone curation rollup.
    cur = LT.corpus_curation_pipeline(spark, SF).collect()
    kept_by_lang = {}
    for c in cur:
        kept_by_lang[c.lang] = kept_by_lang.get(c.lang, 0) + c.n_kept
    for r in rows:
        assert r.n_curated == kept_by_lang.get(r.lang, 0)


def test_reliable_checkpoint_profile_equivalence(spark, tmp_path):
    """The cluster materialization profile (reliable checkpoint() into a
    checkpoint dir, session.materialize) must produce the same
    dedup_clusters result as the default localCheckpoint profile — the
    flag changes fault tolerance, never values. Also asserts the
    checkpoint dir was actually used (files appear), so the flag isn't
    silently ignored."""
    import os

    from myserver_datawarehouse_spark.session import (
        RELIABLE_CHECKPOINT_CONF,
    )

    base = {tuple(r) for r in LT.dedup_clusters(spark, SF).collect()}
    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "true")
    try:
        reliable = {tuple(r) for r in LT.dedup_clusters(spark, SF).collect()}
    finally:
        spark.conf.set(RELIABLE_CHECKPOINT_CONF, "false")
    assert reliable == base
    assert any(files for _, _, files in os.walk(ckpt))  # dir was used
