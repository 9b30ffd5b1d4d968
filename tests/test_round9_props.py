"""Seeded randomized property tests for the round-9b/9c operators:
global_rank vs the window oracle, the prefix-filter lemma under
adversarial token-frequency skew, and evolved_merge vs a batch fold
oracle under random update interleavings."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.operators import evolution as EV
from myserver_datawarehouse_spark.operators import merge as M
from myserver_datawarehouse_spark.operators.ranking import global_rank


def test_global_rank_property_random_frames(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = rng.randint(50, 200)
        # Heavy duplication on the value column stresses the
        # equal-keys-co-locate guarantee of the range exchange.
        rows = [(rng.randint(0, 9) * 1.0, i) for i in range(n)]
        df = spark.createDataFrame(rows, "v double, id long")
        parts = rng.choice([2, 5, 16])
        got = {
            r.id: r.rank
            for r in global_rank(
                df, ["v", "id"], num_partitions=parts
            ).collect()
        }
        want = {
            r.id: r.rank
            for r in df.withColumn(
                "rank", F.row_number().over(Window.orderBy("v", "id"))
            ).collect()
        }
        assert got == want, (trial, parts)


def test_prefix_filter_lemma_under_skew(spark):
    """The candidate rule must have PERFECT recall even when one token
    is in every set (worst-case df skew: the hot token ranks last, so
    it should never be needed as a join key for recall)."""
    from myserver_datawarehouse_spark.plans.llm_text import JACCARD_TAU

    rng = random.Random(7)
    universe = list(range(30))
    sets = {}
    for i in range(40):
        k = rng.randint(3, 12)
        s = set(rng.sample(universe, k))
        s.add(0)  # the hot token: df == n_sets
        sets[i] = frozenset(s)
    rows = [(i, h) for i, s in sets.items() for h in s]
    h = spark.createDataFrame(rows, "doc_id long, h long")
    sizes = h.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    df_tok = h.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    pos = F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "h"))
    pref = (
        h.join(df_tok, "h")
        .select("doc_id", "h", "df", pos.alias("pos"))
        .join(sizes, "doc_id")
        .filter(
            F.col("pos")
            <= F.col("n") - F.ceil(F.lit(JACCARD_TAU) * F.col("n")) + 1
        )
        .select("doc_id", "h")
    )
    cand = {
        (r.a, r.b)
        for r in pref.alias("x")
        .join(
            pref.alias("y"),
            (F.col("x.h") == F.col("y.h"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
        .collect()
    }
    ids = sorted(sets)
    missed = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter / union >= JACCARD_TAU and (a, b) not in cand:
                missed.append((a, b))
    assert not missed  # the lemma: zero false negatives, always


def test_evolved_merge_random_interleavings_match_batch_fold(
    spark, tmp_path
):
    """Random sequence of evolved merges (updates + inserts, order_by
    precedence) must equal the one-shot batch fold over all rows —
    associativity across layouts and commits."""
    rng = random.Random(13)
    schema = "id long, typ string, day int, seq long, v double"
    all_rows = []
    seq = 0

    def batch(n):
        nonlocal seq
        out = []
        for _ in range(n):
            seq += 1
            rid = rng.randint(1, 12)
            # Partition values are FUNCTIONS of the key (the merge
            # contract: a key's partition must be stable per spec).
            out.append(
                (
                    rid,
                    "abc"[rid % 3],
                    10 + rid % 3,
                    seq if rng.random() < 0.8 else rng.randint(1, seq),
                    float(seq),
                )
            )
        all_rows.extend(out)
        return spark.createDataFrame(out, schema)

    root = str(tmp_path / "fuzz")
    seed_df = M.dedup_latest(batch(6), ["id"], order_by=["seq", "v"])
    M.publish_overwrite(spark, root, seed_df, partition_by=["day"])
    EV.evolve_partition_spec(spark, root, ["typ"])
    for _ in range(4):
        EV.evolved_merge(
            spark, root, batch(rng.randint(1, 5)), keys=["id"],
            order_by=["seq", "v"],
        )
    got = {
        r.id: (r.seq, r.v)
        for r in EV.read_evolved(spark, root).collect()
    }
    want = {}
    for rid, typ, day, s, v in all_rows:
        if rid not in want or (s, v) > (want[rid][0], want[rid][1]):
            want[rid] = (s, v)
    assert got == want
