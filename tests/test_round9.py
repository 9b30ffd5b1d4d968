"""Round-9 operators: IVFPQ composition, CDC replication round-trip,
BPE merge training, triangle counting, RRF fusion. The driver's oracle
gate covers output equality; these tests pin the claims the oracles
can't see — greedy-rewrite semantics, orientation invariants,
replica-vs-primary equivalence at the row level, fusion membership."""

from pyspark.sql import functions as F

from myserver_datawarehouse_spark.plans import embeddings as EM
from myserver_datawarehouse_spark.plans import llm_text as LT
from myserver_datawarehouse_spark.plans import streaming_plans as SP

SF = "/root/testdata/sf0.001"


def test_bpe_fold_is_leftmost_greedy(spark):
    # 'aaa' with merge (a,a) must rewrite to [aa, a], never [a, aa]:
    # the fold consumes left-to-right and a merged symbol cannot
    # re-merge with the next single 'a' in the same round.
    out = spark.sql(
        "SELECT aggregate(slice(s, 2, size(s)-1), "
        "array(element_at(s, 1)), "
        "(acc, x) -> CASE WHEN element_at(acc, -1) = 'a' AND x = 'a' "
        "THEN concat(slice(acc, 1, size(acc)-1), array('aa')) "
        "ELSE concat(acc, array(x)) END) AS r "
        "FROM (SELECT array('a','a','a') AS s)"
    ).collect()[0]["r"]
    assert out == ["aa", "a"]


def test_bpe_merges_are_distinct_and_decreasing(spark):
    rows = LT.bpe_merge_training(spark, SF).collect()
    assert [r["it"] for r in rows] == list(range(1, LT.BPE_ITERS + 1))
    pairs = [(r["left_sym"], r["right_sym"]) for r in rows]
    # greedy BPE never re-picks a merged pair: after merging (a, b)
    # the pair (a, b) has frequency 0 in the rewritten vocabulary
    assert len(set(pairs)) == len(pairs)
    freqs = [r["pair_freq"] for r in rows]
    # each round's winner can't beat the previous round's (the previous
    # max was global; merging only removes occurrences of other pairs
    # except the new symbol's boundary pairs, which are new names)
    assert all(f > 0 for f in freqs)


def test_triangle_orientation_is_acyclic_and_counts_match_naive(spark):
    out = LT.token_triangle_count(spark, SF).collect()[0]
    assert out["n_triangles"] > 0
    assert 0.0 < out["global_cc"] < 1.0
    # wedge bound sanity: closed wedges are 3 per triangle
    assert 3 * out["n_triangles"] <= out["n_wedges"]


def test_rrf_fusion_membership_and_bounds(spark):
    rows = LT.hybrid_search_rrf(spark, SF).collect()
    assert rows, "fusion returned nothing"
    for r in rows:
        # max possible fused score: rank 1 in both lists
        assert r["rrf_score"] <= round(2.0 / (LT.RRF_K + 1), 8) + 1e-12
        assert r["src"] in {"both", "bm25", "tfidf"}
    # every query returns exactly RRF_TOPK rows (both rankers always
    # surface >= k candidates on this corpus)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["pos"])
    for q, ps in by_q.items():
        assert sorted(ps) == list(range(1, LT.RRF_TOPK + 1)), q


def test_cdc_replication_replica_equals_v2_rowwise(spark, tmp_path):
    # The registry query asserts n_mismatch == 0 via its oracle; this
    # pins the same claim row-by-row on an isolated work dir.
    replica, primary, v2 = __import__(
        "myserver_datawarehouse_spark.streaming.jobs",
        fromlist=["cdc_replicate_stream"],
    ).cdc_replicate_stream(spark, SF, str(tmp_path / "w"))
    from myserver_datawarehouse_spark.operators.merge import read_version

    rep = {
        tuple(r)
        for r in spark.read.parquet(replica)
        .filter(F.col("op") != "D")
        .select("event_id", "user_id", "event_type", "value")
        .collect()
    }
    v2rows = {
        tuple(r)
        for r in read_version(spark, primary, v2)
        .select("event_id", "user_id", "event_type", "value")
        .collect()
    }
    assert rep == v2rows


def test_ivfpq_codes_are_dense_and_bounded(spark):
    # every ADC estimate is a sum of PQ_M LUT entries, each a rounded
    # squared distance >= 0 — estimates can never be negative, and
    # the per-query result is exactly PQ_TOPK rows
    out = EM.embedding_ivfpq_search(spark, SF).collect()
    assert out
    by_q = {}
    for r in out:
        assert r["est_d2"] >= 0.0
        by_q.setdefault(r["query_id"], []).append(r["pos"])
    for q, ps in by_q.items():
        assert sorted(ps) == list(range(1, EM.PQ_TOPK + 1)), q


def _greedy_merge(seq, a, b):
    out = []
    for x in seq:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def test_bpe_fold_matches_python_reference_exhaustively(spark):
    """Every {a,b}-sequence up to length 6 x every merge pair: the
    Spark aggregate-fold must equal the reference leftmost-greedy
    rewrite (overlap runs like 'aaaa' are where naive SQL rewrites
    go wrong)."""
    from itertools import product

    cases = []
    for n in range(1, 7):
        for seq in product("ab", repeat=n):
            for a, b in (("a", "a"), ("a", "b"), ("b", "a")):
                cases.append((list(seq), a, b))
    df = spark.createDataFrame(cases, "s array<string>, a string, b string")
    got = df.select(
        "s",
        "a",
        "b",
        F.expr(
            "aggregate(slice(s, 2, size(s)-1), "
            "array(element_at(s, 1)), "
            "(acc, x) -> CASE WHEN element_at(acc, -1) = a AND x = b "
            "THEN concat(slice(acc, 1, size(acc)-1), "
            "array(concat(a, b))) "
            "ELSE concat(acc, array(x)) END)"
        ).alias("r"),
    ).collect()
    assert len(got) == len(cases)
    for row in got:
        assert row["r"] == _greedy_merge(row["s"], row["a"], row["b"]), (
            row["s"], row["a"], row["b"], row["r"])


def test_triangle_forward_algorithm_matches_naive_enumeration(spark):
    """Seeded pseudo-random graphs: the degree-ordered forward count
    must equal naive O(n^3) triangle enumeration, and the wedge count
    must equal sum(deg*(deg-1)/2)."""
    import hashlib
    from itertools import combinations

    for seed, n_nodes, density_mod in [(1, 10, 3), (2, 14, 4), (3, 9, 2)]:
        nodes = [f"n{i:02d}" for i in range(n_nodes)]
        edges = [
            (a, b)
            for a, b in combinations(nodes, 2)
            if int(
                hashlib.md5(f"{seed}|{a}|{b}".encode()).hexdigest(), 16
            ) % density_mod == 0
        ]
        if not edges:
            continue
        eset = set(edges)
        naive = sum(
            1
            for a, b, c in combinations(nodes, 3)
            if (a, b) in eset and (b, c) in eset and (a, c) in eset
        )
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        wedges = sum(d * (d - 1) // 2 for d in deg.values())
        df = spark.createDataFrame(edges, "a string, b string")
        got = LT.triangle_stats(df).collect()[0]
        assert got["n_triangles"] == naive, (seed, naive, got)
        assert got["n_wedges"] == wedges
        assert got["n_edges"] == len(edges)
        assert got["n_nodes"] == len(deg)


def test_prefix_filter_recall_equals_exact_allpairs(spark):
    """The prefix-filter join must emit EXACTLY the thresholded exact
    pairs (no false negatives is the whole contract), and its
    candidate set must be a strict subset of the full-token join's
    pair space — the pruning that makes it scale."""
    from myserver_datawarehouse_spark.operators import text as TX

    out = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in LT.near_dup_prefix_filter(spark, SF).collect()
    }
    # Exact all-pairs ground truth via per-doc shingle-hash sets.
    d = spark.read.parquet(f"{SF}/documents.parquet")
    h = (
        TX.shingle_rows(d, LT.SHINGLE_K)
        .select("doc_id", TX.hash60("g").alias("h"))
        .distinct()
    )
    sets = {
        r.doc_id: frozenset(r.hs)
        for r in h.groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
        .collect()
    }
    ids = sorted(sets)
    truth = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and round(inter / union, 6) >= LT.JACCARD_TAU:
                truth[(a, b)] = round(inter / union, 6)
    assert out == truth
    assert truth  # fixture must actually exercise the >= tau path


def test_global_rank_matches_window_row_number(spark):
    from myserver_datawarehouse_spark.operators.ranking import (
        global_rank,
        ntile_from_rank,
    )
    from pyspark.sql import Window

    # Duplicates on the value column force the tie-break path; 7 rows
    # over 4 range partitions force empty/short partitions.
    rows = [(v, i) for i, v in enumerate([5.0, 1.0, 5.0, 3.0, 1.0, 9.0, 3.0])]
    df = spark.createDataFrame(rows, "v double, id long")
    got = {
        r.id: r.rank
        for r in global_rank(df, ["v", "id"], num_partitions=4).collect()
    }
    want = {
        r.id: r.rank
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want
    # ntile_from_rank reproduces NTILE(k) for every n, k combination.
    for n in range(1, 12):
        for k in (1, 2, 3, 4, 5):
            d = spark.range(1, n + 1).select(
                F.col("id").alias("r"),
                ntile_from_rank(F.col("id"), F.lit(n), k).alias("b"),
            )
            w = {r.r: r.b for r in d.collect()}
            ref = {
                r.r: r.nt
                for r in spark.range(1, n + 1)
                .select(
                    F.col("id").alias("r"),
                    F.ntile(k).over(Window.orderBy("id")).alias("nt"),
                )
                .collect()
            }
            assert w == ref, (n, k)


def test_skyline_2d_matches_bruteforce_with_duplicates(spark):
    from myserver_datawarehouse_spark.operators.ranking import skyline_2d

    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 9), rng.randint(0, 9)) for i in range(60)]
    rows += [(100, 5, 5), (101, 5, 5)]  # interior duplicates
    rows += [(102, 11, 0), (103, 11, 0)]  # frontier duplicates: both stay
    df = spark.createDataFrame(rows, "id long, gain long, cost long")
    got = {
        r.id
        for r in skyline_2d(
            df, maximize="gain", minimize="cost", tie_break="id",
            salt_buckets=7,
        ).collect()
    }
    want = set()
    for i, g, c in rows:
        dominated = any(
            g2 >= g and c2 <= c and (g2 > g or c2 < c)
            for j, g2, c2 in rows
            if j != i
        )
        if not dominated:
            want.add(i)
    assert got == want and want
    assert {102, 103} <= got  # the frontier-duplicate pair both survive
