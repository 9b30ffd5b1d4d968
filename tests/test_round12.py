"""Round-12 operators: audio fingerprint near-dup (the modality
matrix's third arm), bloom sidecar carry through evolved merges, the
low-J LSH recall deciles, the streaming IVF ingest variant, and the
three-modality cross-modal curation."""

import hashlib

import pytest
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.operators import multimodal as MM
from myserver_datawarehouse_spark.plans import multimodal as MMQ

SF = "/root/testdata/sf0.001"


# ------------------------------------------- audio fingerprint kernel


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


def test_audio_fingerprint_overlapped_windows(spark):
    payload = (
        b"do re mi fa sol la ti do octave up and down again forever "
        * 7
    )
    media = spark.createDataFrame(
        [(1, "audio", bytearray(payload)), (2, "video", bytearray(payload))],
        "doc_id long, media_type string, payload binary",
    )
    got = MM.audio_fingerprint(media).collect()
    assert {r.doc_id for r in got} == {1}  # non-audio filtered
    hop, win = MM.AUDIO_HOP, MM.AUDIO_WINDOW
    n_segs = max(-(-len(payload) // hop) - 1, 1)
    assert sorted(r.seg_idx for r in got) == list(range(n_segs))
    for r in got:
        seg = payload[r.seg_idx * hop : r.seg_idx * hop + win]
        assert r.ahash == _ref_phash(seg)


def test_audio_fingerprint_short_payload_single_window(spark):
    media = spark.createDataFrame(
        [(9, "audio", bytearray(b"tiny"))],
        "doc_id long, media_type string, payload binary",
    )
    got = MM.audio_fingerprint(media).collect()
    assert len(got) == 1 and got[0].seg_idx == 0
    assert got[0].ahash == _ref_phash(b"tiny")


def test_audio_clip_containment_min_rule(spark):
    """A hop-aligned clip of a longer track must be caught by the
    min-side containment rule even though it covers a minority of the
    track (the video arm's max rule would clear it)."""
    out = MMQ.near_dup_audio_fingerprint(spark, SF).collect()
    assert out, "clip fixture must produce pairs at sf0.001"
    planted = [
        r for r in out if r.doc_b - r.doc_a == MMQ.CLIP_ID_OFFSET
    ]
    assert planted, "planted clip pairs must survive the verify"
    # survivor must be the RECOMPUTED min doc_a among each doc_b's
    # matches (not merely <= doc_a, which the window guarantees)
    min_partner = {}
    for r in out:
        min_partner[r.doc_b] = min(
            min_partner.get(r.doc_b, r.doc_a), r.doc_a
        )
    for r in out:
        assert r.survivor == min_partner[r.doc_b]
    for r in planted:
        # containment: matched covers >= half the clip's windows
        assert 2 * r.matched >= min(r.n_segs_a, r.n_segs_b)
    # at least one planted pair must FAIL the video-style max rule,
    # proving the audio semantics differ (tracks longer than 2x clip)
    assert any(
        2 * r.matched < max(r.n_segs_a, r.n_segs_b) for r in planted
    )


def test_audio_clip_ids_do_not_collide(spark):
    from myserver_datawarehouse_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    assert (
        docs.agg(F.max("doc_id")).first()[0] < MMQ.CLIP_ID_OFFSET
    ), "clip id namespace must sit above every real doc_id"
    assert MMQ.CLIP_ID_OFFSET % 3 == 0, "clip must keep audio class"


# ------------------------------------------------ LSH S-curve bend


def test_lsh_recall_audit_low_j_mass_and_theory(spark):
    """VERDICT r11 #4: the audit corpus's truncation variants must put
    pair mass in the 0.5-0.8 deciles, and measured candidate recall
    there must track the banding theory 1-(1-J^r)^b (r=2, b=8) within
    a disclosed tolerance (binomial noise at per-decile counts)."""
    from myserver_datawarehouse_spark.plans import llm_text as LT

    rows = {
        r.j_band: r
        for r in LT.lsh_recall_audit(spark, SF).collect()
    }
    low = [b for b in rows if 5 <= b <= 7]
    assert len(low) >= 2, f"low-J deciles must carry pairs, got {rows}"
    TOL = 0.15  # ~3 binomial sd at the fixture's per-decile counts
    for b in low:
        j_mid = (b + 0.5) / 10.0
        theory = 1.0 - (1.0 - j_mid**LT.LSH_ROWS) ** LT.LSH_BANDS
        assert abs(rows[b].recall - theory) <= TOL, (
            f"decile {b}: measured {rows[b].recall} vs theory "
            f"{theory:.4f} beyond tolerance {TOL}"
        )
    # the top deciles keep perfect recall (S-curve saturation)
    for b in (9, 10):
        if b in rows:
            assert rows[b].recall == 1.0


def test_lsh_audit_variants_are_deterministic(spark):
    from myserver_datawarehouse_spark.plans import llm_text as LT
    from myserver_datawarehouse_spark.sources.tables import load_table

    d = load_table(spark, SF, "documents")
    a = LT._lsh_audit_docs(d).orderBy("doc_id").collect()
    b = LT._lsh_audit_docs(d).orderBy("doc_id").collect()
    assert a == b
    n_base = d.count()
    variants = [r for r in a if r.doc_id >= LT.LSH_VARIANT_OFFSET]
    assert variants, "eligible docs must produce variants"
    base_text = {r.doc_id: r.text for r in a if r.doc_id < LT.LSH_VARIANT_OFFSET}
    for v in variants:
        src = base_text[v.doc_id - LT.LSH_VARIANT_OFFSET]
        assert src.startswith(v.text) and 0 < len(v.text) < len(src)
    assert len(a) == n_base + len(variants)


# --------------------------------------------- streaming IVF ingest


def test_streaming_ivf_ingest_matches_batch_audit(spark):
    """The streamed ledger folded over batch_no must reproduce the
    batch audit's per-cell census exactly (assignment is a pure
    per-vector function — the stream changes WHEN work happens, never
    WHAT is computed)."""
    from myserver_datawarehouse_spark.plans import embeddings as EM
    from myserver_datawarehouse_spark.plans import streaming_plans as SP

    led = SP.streaming_ivf_ingest(spark, SF).collect()
    audit = {
        r.cell: r
        for r in EM.ivf_incremental_ingest_audit(spark, SF).collect()
    }
    base = {}
    batch_tot = {}
    move_tot = {}
    batches = set()
    for r in led:
        if r.batch_no == -1:
            base[r.cell] = r.n_arrivals
        else:
            batches.add(r.batch_no)
            batch_tot[r.cell] = batch_tot.get(r.cell, 0) + r.n_arrivals
        move_tot[r.cell] = move_tot.get(r.cell, 0) + (r.n_would_move or 0)
    assert len(batches) >= 2, "arrivals must span multiple micro-batches"
    for cell, a in audit.items():
        assert base.get(cell, 0) == a.n_base
        assert batch_tot.get(cell, 0) == a.n_batch
        assert move_tot.get(cell, 0) == a.n_would_move
