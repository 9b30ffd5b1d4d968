"""Round-10 operators: perceptual-hash image near-dup, duplicate-span
removal, IVFPQ exact refine, and the manifest-root merge fast path the
compaction-race stream routes to."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.operators import merge as M
from myserver_datawarehouse_spark.operators import multimodal as MM

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- image pHash kernel


def _ref_phash(payload: bytes) -> int:
    """Pure-Python reference of the kernel's block-histogram aHash."""
    w, bits = MM.PHASH_WINDOW, MM.PHASH_BITS
    n = len(payload) - w + 1
    cnt = [0] * bits
    for j in range(max(n, 0)):
        b = int(
            hashlib.md5(payload[j : j + w]).hexdigest()[:15], 16
        ) % bits
        cnt[b] += 1
    h = 0
    for i in range(bits):
        if bits * cnt[i] > n:
            h |= 1 << i
    return h


def test_phash_kernel_matches_reference(spark):
    rows = [
        (1, "image", bytearray(b"the quick brown fox jumps over dogs")),
        (2, "image", bytearray(b"the quick brown fox jumps over cats")),
        (3, "audio", bytearray(b"not an image, must be filtered out")),
        (4, "image", bytearray(b"short")),  # < window: zero blocks
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    got = {
        r.doc_id: r.phash
        for r in MM.image_phash(media).collect()
    }
    assert set(got) == {1, 2, 4}  # audio row filtered
    for doc_id, _mt, payload in rows:
        if doc_id in got:
            assert got[doc_id] == _ref_phash(bytes(payload))


def test_phash_near_identical_payloads_are_hamming_close(spark):
    base = (b"merge group part scan row value column batch table " * 6)
    edit = base[:-10] + b"customerXY"  # one local edit
    far = bytes(reversed(base))
    media = spark.createDataFrame(
        [(1, "image", bytearray(base)), (2, "image", bytearray(edit)),
         (3, "image", bytearray(far))],
        "doc_id long, media_type string, payload binary",
    )
    hs = {r.doc_id: r.phash for r in MM.image_phash(media).collect()}
    near = bin(hs[1] ^ hs[2]).count("1")
    rand = bin(hs[1] ^ hs[3]).count("1")
    # A local edit perturbs only the overlapping blocks; a reversal
    # reshuffles every block. The fingerprint must separate the two.
    assert near < rand


# ------------------------------------------------- dup-span removal


def test_dup_span_removal_surgery_converges(spark):
    from myserver_datawarehouse_spark.plans import llm_text as LT

    out = LT.dup_span_removal(spark, SF).collect()
    assert len(out) == 500
    # (a) the surgery converges: no duplicated 8-gram survives.
    assert sum(r.residual_dup_grams for r in out) == 0
    # (b) unique text is preserved byte-identically: unchanged docs'
    # cleaned_md5 equals the md5 of their normalized token join.
    docs = dict(
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text")
        .collect()
    )
    unchanged = [r for r in out if r.unchanged == 1]
    assert unchanged  # the corpus has non-duplicated docs
    for r in unchanged[:20]:
        norm = " ".join(docs[r.doc_id].strip().lower().split())
        assert r.cleaned_md5 == hashlib.md5(norm.encode()).hexdigest()
        assert r.n_removed == 0
    # Removal happened somewhere (the corpus has planted duplicates).
    assert any(r.n_removed > 0 for r in out)


# ------------------------------------------------- IVFPQ refine


def test_refined_recall_dominates_unrefined(spark):
    from myserver_datawarehouse_spark.plans import embeddings as EM

    rec = (
        EM.ann_recall_audit(spark, SF)
        .groupBy("method")
        .agg(F.avg("recall").alias("r"))
        .collect()
    )
    r = {row.method: row.r for row in rec}
    assert set(r) >= {
        "ivf", "ivfpq", "ivfpq_np1", "ivfpq_np4", "ivfpq_refined",
        "bucket", "multiprobe",
    }
    # The verdict's "done" bar: exact re-ranking strictly improves on
    # the raw ADC ordering (compression loss bought back).
    assert r["ivfpq_refined"] > r["ivfpq"]
    # The sweep is monotone in nprobe (more probes never lose recall).
    assert r["ivfpq_np1"] <= r["ivfpq"] <= r["ivfpq_np4"]


def test_refined_topk_is_exact_over_shortlist(spark):
    from myserver_datawarehouse_spark.plans import embeddings as EM

    ref = EM.embedding_ivfpq_refined(spark, SF)
    rows = ref.collect()
    # exact_d2 is non-decreasing within each query's ranking.
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.pos, r.exact_d2))
    for q, lst in by_q.items():
        lst.sort()
        ds = [d for _, d in lst]
        assert ds == sorted(ds), f"query {q} not ranked by exact d2"


# ------------------------------------------- manifest-root merge path


def test_merge_upsert_published_contract(spark, tmp_path):
    root = str(tmp_path / "mtbl")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, part string, v double"
    )
    M.publish_overwrite(spark, root, df, partition_by=["part"])
    upd = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", 30.0)], "id long, part string, v double"
    )
    M.merge_upsert_published(
        spark, root, upd, keys=["id"], partition_by=["part"]
    )
    got = {
        r.id: (r.part, r.v)
        for r in M.read_published(spark, root).collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b", 25.0), 3: ("c", 30.0)}
    # Untouched partition 'a' carried by hardlink (same inode).
    M.merge_upsert_published(
        spark, root, upd, keys=["id"], partition_by=["part"]
    )  # idempotent replay
    got2 = {
        r.id: (r.part, r.v)
        for r in M.read_published(spark, root).collect()
    }
    assert got2 == got


def test_merge_upsert_published_untouched_partition_is_hardlinked(
    spark, tmp_path
):
    root = str(tmp_path / "mtbl2")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, part string, v double"
    )
    M.publish_overwrite(spark, root, df, partition_by=["part"])
    v1 = os.path.join(root, M._published_version(root))
    before = {
        f: os.stat(os.path.join(r, f)).st_ino
        for r, _d, fs in os.walk(os.path.join(v1, "part=a"))
        for f in fs
        if f.endswith(".parquet")
    }
    upd = spark.createDataFrame(
        [(2, "b", 9.0)], "id long, part string, v double"
    )
    M.merge_upsert_published(
        spark, root, upd, keys=["id"], partition_by=["part"]
    )
    v2 = os.path.join(root, M._published_version(root))
    after = {
        f: os.stat(os.path.join(r, f)).st_ino
        for r, _d, fs in os.walk(os.path.join(v2, "part=a"))
        for f in fs
        if f.endswith(".parquet")
    }
    assert before and after == before
