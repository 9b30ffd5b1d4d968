"""Round-8 operators: zone-map file skipping, adjudicated PCA,
incremental LSH ingest. The driver's oracle gate covers output
equality; these tests pin the CLAIMS the oracles can't see — actual
file pruning, eigendecomposition internals, index/batch disjointness."""

import numpy as np
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.plans import embeddings as EM
from myserver_datawarehouse_spark.plans import llm_text as LT
from myserver_datawarehouse_spark.plans import relational as R
from myserver_datawarehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_file_skipping_prunes_and_matches_full_scan(spark):
    out = R.file_skipping_scan_audit(spark, SF)
    rows = {r["event_type"]: r for r in out.collect()}
    # The flag reflects the ACTUAL kept/total counts — clustered layout
    # plus a narrow band must skip at least one file.
    assert all(r["files_skipped"] for r in rows.values())
    # Pruned scan == unpruned filter (zone maps change I/O, never rows).
    full = (
        load_table(spark, SF, "events")
        .filter(F.col("value").between(R.ZONEMAP_LO, R.ZONEMAP_HI))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
    for r in full.collect():
        got = rows[r["event_type"]]
        assert got["n_rows"] == r["n_rows"]
        assert got["sum_value"] == r["sum_value"]


def test_pca_audit_flags_and_trace(spark):
    row = EM.embedding_pca_audit(spark, SF).collect()[0]
    assert row["trace_conserved"]
    assert row["components_orthonormal"]
    assert row["eigenvalues_monotone"]
    assert row["projection_variance_matches"]
    # Trace against a direct local recompute (small SF fits in memory).
    X = np.array(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in load_table(spark, SF, "embeddings")
            .select("embedding")
            .collect()
        ]
    )
    assert row["n_vectors"] == len(X)
    assert row["dim"] == X.shape[1]
    total = float(X.var(axis=0).sum())  # population variance per dim
    assert abs(row["total_variance"] - total) < 5e-6  # rounded to 6 dp


def test_incremental_lsh_sides_disjoint_and_verified(spark):
    pairs = LT.near_dup_incremental_lsh(spark, SF).collect()
    assert pairs, "fixture corpus contains cross-side near-dups"
    for p in pairs:
        # Left side is always the new batch, right side always the index
        # — no batch-internal or index-internal pairs.
        assert p["doc_new"] % LT.INCR_MOD == 0
        assert p["doc_indexed"] % LT.INCR_MOD != 0
        assert p["jaccard"] >= LT.JACCARD_TAU
    # Every emitted pair must also appear in the full-corpus pair set
    # (incremental ingest is a restriction of the global dedup, never
    # a different similarity).
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in LT.near_dup_minhash_lsh(spark, SF).collect()
    }
    for p in pairs:
        key = (
            min(p["doc_new"], p["doc_indexed"]),
            max(p["doc_new"], p["doc_indexed"]),
        )
        assert key in full
        assert abs(full[key] - p["jaccard"]) < 1e-9


def test_cli_table_stats_zone_map(spark, tmp_path, capsys):
    from myserver_datawarehouse_spark.__main__ import main
    from myserver_datawarehouse_spark.sources.files import file_stats

    p = str(tmp_path / "zm")
    (
        load_table(spark, SF, "events")
        .select("event_id", "value")
        .repartitionByRange(4, F.col("value"))
        .write.parquet(p)
    )
    stats = file_stats(spark, p, "value").collect()
    assert len(stats) == 4
    assert sum(r["n_rows"] for r in stats) == load_table(
        spark, SF, "events"
    ).count()
    # Range-clustered layout: files ordered by lo don't interleave.
    ordered = sorted(stats, key=lambda r: r["lo"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["hi"] <= b["lo"]
    assert main(["table", "stats", p, "--column", "value"]) == 0
    assert "lo" in capsys.readouterr().out
    assert main(["table", "stats", p]) == 1  # --column required


def test_bloom_file_skip_prunes_without_false_negatives(spark):
    out = {r["event_id"]: r for r in R.bloom_file_skip_audit(spark, SF).collect()}
    # No false negatives: every probe id present in the source appears.
    src = (
        load_table(spark, SF, "events")
        .filter(F.col("event_id").isin(*R.BLOOM_PROBE_IDS))
        .collect()
    )
    assert {r["event_id"] for r in src} == set(out)
    for r in src:
        assert out[r["event_id"]]["n_rows"] == 1
        assert out[r["event_id"]]["files_skipped"]


def test_table_changes_classifies_all_types(spark, tmp_path):
    from myserver_datawarehouse_spark.operators import merge as M

    root = str(tmp_path / "cdf")
    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", None), (4, "w", 4.0)],
        "id long, s string, v double",
    )
    b = spark.createDataFrame(
        [
            (1, "x", 1.0),      # unchanged
            (2, "y", 9.0),      # update (value change)
            (3, "z", 3.0),      # update (NULL -> value is an update)
            (5, "n", 5.0),      # insert
        ],                       # id 4 absent -> delete
        "id long, s string, v double",
    )
    v1 = M.publish_overwrite(spark, root, a)
    v2 = M.publish_overwrite(spark, root, b)
    got = {
        r["id"]: r["change_type"]
        for r in M.table_changes(spark, root, v1, v2, keys=["id"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "update",
        3: "update",
        4: "delete",
        5: "insert",
    }


def test_theta_sketch_two_stage_topk_matches_plain_window(spark):
    """The salted two-stage top-k-smallest (the 100 TB skew-safe
    construction) must select EXACTLY the K smallest hashes per source
    — byte-identical to the naive single window it replaces."""
    from pyspark.sql import Window

    df = (
        spark.range(0, 5000)
        .select(
            (F.col("id") % 3).cast("string").alias("source"),
            F.xxhash64(F.col("id")).alias("h"),
        )
        .distinct()
    )
    k, salt = LT.THETA_K, LT.THETA_SALT
    w1 = Window.partitionBy(
        "source", F.pmod(F.col("h"), F.lit(salt))
    ).orderBy("h")
    w2 = Window.partitionBy("source").orderBy("h")
    staged = (
        df.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    plain = (
        df.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    assert set(map(tuple, staged.collect())) == set(
        map(tuple, plain.collect())
    )


def test_theta_sketch_exact_mode_for_tiny_universe(spark, monkeypatch):
    """When the pairwise union holds fewer than K hashes the sketch IS
    the exact set: estimates must collapse to exact counts."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    # unigram domain: the fixture corpus has a 31-word vocabulary, far
    # below K=128, so every pair runs the exact-mode branch
    sql = LT.THETA_SKETCH_OVERLAP_SQL.replace(
        "unnest([array_to_string(tks[i:i+2], ' ') "
        "FOR i IN generate_series(1, len(tks) - 2)])",
        "unnest(tks)",
    )
    rows = con.sql(
        "SELECT COUNT(*) FROM (" + sql + ") "
        "WHERE inter_est <> n_shared OR NOT within_tol"
    ).fetchone()
    assert rows[0] == 0


def test_phrase_search_keeps_zero_match_skeleton(spark):
    """sf0.001 genuinely has a zero-occurrence phrase: the skeleton row
    must survive with count 0 and -1 sentinels (no dropped query, no
    NULL-typed bigints)."""
    out = {
        r["query_id"]: r
        for r in LT.phrase_search_positional(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(out) == set(LT.SEARCH_PHRASES)
    zero = out["p_sort_table_window"]
    assert zero["n_matched"] == 0
    assert zero["doc_checksum"] == 0
    assert zero["first_doc"] == -1 and zero["last_doc"] == -1


def test_keyword_search_matches_array_scan(spark):
    """Posting-list intersection must agree with the naive
    array-contains full scan (different plan, same answer)."""
    from myserver_datawarehouse_spark.operators import text as TX

    sf = "/root/testdata/sf0.001"
    d = LT._docs(spark, sf).withColumn("tks", TX.tokenize("text"))
    got = {
        r["query_id"]: (r["n_matched"], r["doc_checksum"])
        for r in LT.keyword_search_conjunctive(spark, sf).collect()
    }
    for qid, ts in LT.SEARCH_QUERIES.items():
        cond = F.lit(True)
        for t in ts:
            cond = cond & F.array_contains("tks", t)
        ref = d.filter(cond).agg(
            F.count(F.lit(1)), F.coalesce(F.sum("doc_id"), F.lit(0))
        ).collect()[0]
        assert got[qid] == (ref[0], ref[1]), qid


def test_phrase_search_counts_overlapping_docs_once(spark):
    """A phrase occurring twice in one doc contributes ONE matched doc
    (hits are doc-distinct)."""
    out = {
        r["query_id"]: r["n_matched"]
        for r in LT.phrase_search_positional(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    # oracle-checked counts at sf0.01 (distinct docs, not occurrences)
    assert out == {
        "p_row_fast_merge": 2,
        "p_sort_table_window": 1,
        "p_query_big_table": 2,
    }


def test_pq_adc_audit_shape_and_honest_recall(spark):
    """PQ/ADC audit returns one row per probe with finite positive ADC
    error and recall in [0, 1]; compression constant matches the
    4-subspace one-byte-code layout."""
    rows = EM.embedding_pq_adc_audit(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == EM.N_PROBES
    for r in rows:
        assert r["k"] == EM.PQ_TOPK
        assert 0 <= r["n_hit"] <= EM.PQ_TOPK
        assert abs(r["recall"] - r["n_hit"] / EM.PQ_TOPK) < 1e-9
        assert r["avg_adc_err"] > 0.0
        assert r["compression_x"] == 64.0


def test_ivm_join_quadrants_all_populated_and_consistent(spark):
    """The two-sided IVM scenario must exercise every delta quadrant
    (dA x B0, A0 x dB, dA x dB all non-empty) and the maintained view
    must equal the full recompute on every group."""
    sf = "/root/testdata/sf0.001"
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    oc = F.lit(R.IVM_ORDERS_CUTOFF).cast("timestamp")
    sc = F.lit(R.IVM_SHIP_CUTOFF).cast("timestamp")
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        (o["o_orderdate"] >= oc).alias("na"),
        (li["l_shipdate"] >= sc).alias("nb"),
    )
    quads = {
        (r["na"], r["nb"]): r["cnt"]
        for r in j.groupBy("na", "nb")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert all(
        quads.get(q, 0) > 0
        for q in [(False, False), (True, False), (False, True), (True, True)]
    ), quads
    rows = R.incremental_join_maintenance(spark, sf).collect()
    assert rows and all(r["ivm_consistent"] for r in rows)
