"""Round-11 operators: video frame-set near-dup, cross-modal joint
curation, sampled BPE training, the clustered nprobe sweep, and the LSH
recall audit's subset invariant."""

import hashlib

import pytest
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.operators import multimodal as MM
from myserver_datawarehouse_spark.plans import embeddings as EM
from myserver_datawarehouse_spark.plans import llm_text as LT
from myserver_datawarehouse_spark.plans import multimodal as MMQ

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ frame pHash kernel


def _ref_phash(payload: bytes) -> int:
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


def test_frame_phash_fixed_stride_segmentation(spark):
    payload = bytes(
        b"alpha beta gamma delta epsilon zeta eta theta iota kappa "
        b"lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
        b"psi omega " * 3
    )
    rows = [
        (1, "video", bytearray(payload)),
        (2, "image", bytearray(payload)),  # filtered: not a video
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    got = MM.frame_phash(media).collect()
    assert {r.doc_id for r in got} == {1}
    S = MM.FRAME_STRIDE
    expect_frames = (len(payload) + S - 1) // S
    assert sorted(r.frame_idx for r in got) == list(range(expect_frames))
    for r in got:
        seg = payload[r.frame_idx * S : (r.frame_idx + 1) * S]
        assert r.fhash == _ref_phash(seg)


def test_frame_phash_shift_tolerance():
    """A small insertion shifts later frame content; the content-aligned
    sliding blocks keep the shifted frame's hash Hamming-close — the
    property the near-dup banding relies on."""
    base = bytes(
        b"the merge writer stages a snapshot and links untouched "
        b"partitions before the manifest swap commits atomically " * 2
    )
    edited = b"XXXX" + base  # 4-byte insertion shifts everything
    S = MM.FRAME_STRIDE
    # Compare frame 1 of base with frame 1 of edited (content shifted
    # by 4 bytes within the same fixed-byte window).
    h_base = _ref_phash(base[S : 2 * S])
    h_edit = _ref_phash(edited[S : 2 * S])
    assert bin(h_base ^ h_edit).count("1") <= 12  # far pairs sit ~30


def test_near_dup_video_frames_pairs_and_survivors(spark):
    out = MMQ.near_dup_video_frames(spark, SF).collect()
    for r in out:
        # threshold: matched frames cover >= half of the larger set
        assert 2 * r.matched >= max(r.n_frames_a, r.n_frames_b)
        assert r.doc_a < r.doc_b
        assert r.survivor <= r.doc_a
        assert r.doc_a % 3 == 2 and r.doc_b % 3 == 2  # videos only


# ------------------------------------------------ cross-modal curation


def test_cross_modal_curation_contract(spark):
    rows = MMQ.cross_modal_curation(spark, SF).collect()
    assert rows, "fixture has image near-dups; the cluster set is nonempty"
    modalities = ("text", "image", "audio", "video")
    by_cluster = {}
    kinds = set()
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
        kinds.add(r.doc_id % 3)
    assert kinds == {0, 1, 2}, "all three media populations must appear"
    for cid, members in by_cluster.items():
        ids = sorted(m.doc_id for m in members)
        assert cid == ids[0]  # survivor is the min doc_id
        for m in members:
            assert m.n_members == len(members)
            if m.doc_id == cid:
                assert m.verdict == "keep" and m.retired_by == "none"
            else:
                assert m.verdict == "drop"
                parts = m.retired_by.split("+")
                assert parts and all(p in modalities for p in parts)
                # '+'-join preserves the canonical modality order
                assert parts == [p for p in modalities if p in parts]
    # the video arm contributes evidence somewhere in the graph
    assert any(
        "video" in m.retired_by for ms in by_cluster.values() for m in ms
    )


# ------------------------------------------------ sampled BPE training


def test_bpe_sampled_training_rows(spark):
    out = LT.bpe_sampled_training(spark, SF).collect()
    assert [r.it for r in out] == list(range(1, LT.BPE_ITERS + 1))
    for r in out:
        assert r.agree == (
            1 if (r.full_left, r.full_right)
            == (r.sample_left, r.sample_right) else 0
        )
        assert 0 < r.sample_freq <= r.full_freq  # sample is a subset


# ------------------------------------------------ clustered nprobe sweep


def test_ann_nprobe_clustered_monotone(spark):
    out = EM.ann_nprobe_clustered(spark, SF).collect()
    mean = {}
    per_q = {}
    for r in out:
        mean.setdefault(r.nprobe, []).append(r.recall)
        per_q[(r.nprobe, r.query_id)] = r.n_hit
    curves = {n: sum(v) / len(v) for n, v in mean.items()}
    # Monotone by construction: candidates at nprobe n are a superset
    # of nprobe n-1 under exact ranking — per query, not just on mean.
    sweep = sorted(curves)
    for lo, hi in zip(sweep, sweep[1:]):
        for q in {q for (_n, q) in per_q}:
            assert per_q[(hi, q)] >= per_q[(lo, q)]
    assert curves[sweep[-1]] > curves[sweep[0]], (
        "clustered fixture must make the curve informative, not flat"
    )


# ------------------------------------------------ LSH recall audit


def test_lsh_recall_audit_subset_invariant(spark):
    out = LT.lsh_recall_audit(spark, SF).collect()
    assert out
    for r in out:
        assert 0 <= r.n_lsh <= r.n_exact  # LSH pairs ⊆ exact pairs
        assert r.recall == pytest.approx(r.n_lsh / r.n_exact, abs=1e-4)
        assert 5 <= r.j_band <= 10  # only >= tau pairs enter


# ------------------------------------------------ fertility


def test_bpe_fertility_weighted_mean(spark):
    out = LT.bpe_fertility_by_lang(spark, SF).collect()
    assert out
    for r in out:
        assert r.n_tokens >= r.n_words  # >= 1 segment per word
        assert r.fertility == pytest.approx(
            r.n_tokens / r.n_words, abs=1e-6
        )


# ------------------------------------------- incremental IVF ingest


def test_ivf_incremental_ingest_invariants(spark):
    out = EM.ivf_incremental_ingest_audit(spark, SF).collect()
    assert out
    for r in out:
        assert r.n_total == r.n_base + r.n_batch
        assert 0 <= r.n_would_move <= r.n_total
        assert r.cell < EM.IVF_CENTS and r.cell % 10 < 8  # base-trained
