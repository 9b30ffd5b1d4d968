"""Round-14 additions: scale-safe threshold-scan twins for the two
global/per-lang ranking selections (the round-13 verdict's one `weak`),
asserted set-equal to their exact-spec originals — the same differential
discipline `share_of_total`/`share_of_total_broadcast` established."""

from myserver_datawarehouse_spark.plans import llm_text as LT

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ------------------------------------- DSIR threshold-scan twin


def test_dsir_threshold_twin_equals_exact_spec(spark):
    """The histogram-cut selection must reproduce the global
    (logw desc, doc_id) ranking's per-source budget EXACTLY — the
    boundary-bucket tie-scan is what makes the twin exact rather than
    approximate at the cut."""
    exact = _rows(LT.dsir_importance_weights(spark, SF))
    twin = _rows(LT.dsir_importance_weights_threshold(spark, SF))
    assert twin == exact


def test_dsir_threshold_tie_scan_input_is_tiny(spark):
    """The scale argument: the only frame the twin ranks without a
    partition key is ONE boundary bucket, not the corpus. On the
    fixture every 6-dp bucket holds a single doc (the histogram is as
    wide as it can get), so the tie-scan input is exactly 1 row — and
    even the worst bucket must stay far below the corpus size."""
    docw = LT._dsir_docw(spark, SF)
    from pyspark.sql import functions as F

    n_docs = docw.count()
    max_bucket = (
        docw.groupBy(F.round(F.col("logw"), 6))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_bucket <= max(1, n_docs // 100)


# ----------------------- quality percentile threshold-scan twin


def test_quality_threshold_twin_equals_exact_spec(spark):
    exact = _rows(LT.quality_percentile_filter(spark, SF))
    twin = _rows(LT.quality_percentile_filter_threshold(spark, SF))
    assert twin == exact


def test_quality_threshold_keeps_exact_quartile_count(spark):
    """n_kept must be ceil(n_docs/4) per language — the tie-scan fills
    the boundary exactly, never over- or under-selecting."""
    for row in LT.quality_percentile_filter_threshold(spark, SF).collect():
        q = LT.QUALITY_KEEP_QUARTER
        assert row.n_kept == (row.n_docs + q - 1) // q


# --------------------------------------- IVF batch re-cluster audit


def test_ivf_recluster_retrain_buys_error_not_regression(spark):
    """The retrain must actually move the index: reassignments > 0,
    and the full-retrained quantizer's mean assignment d2 over the full
    corpus must not be WORSE than the stale seed-trained one's (Lloyd
    on the true distribution vs Lloyd on a subset)."""
    from myserver_datawarehouse_spark.plans import embeddings as EM

    rows = {r.phase: r for r in EM.ivf_recluster_audit(spark, SF).collect()}
    assert set(rows) == {"before", "after"}
    b, a = rows["before"], rows["after"]
    assert b.n_vecs == a.n_vecs
    assert b.n_reassigned == 0
    assert 0 < a.n_reassigned < a.n_vecs
    assert a.avg_d2 <= b.avg_d2
    for r in (b, a):
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_cells_used <= EM.KMEANS_K
        assert r.max_cell <= r.n_vecs


# ----------------------------- S11/S12 sink data-side query surfaces


def test_chart_clock_payload_wedge_geometry(spark):
    """Per ranking: slices start at matplotlib's startangle 90, end at
    450 (= 90 + 360), are contiguous (each wedge starts where the
    previous ended), and fractions sum to ~1 — the invariants the
    renderer silently assumes."""
    from myserver_datawarehouse_spark.plans import report as RP

    rows = RP.chart_clock_payload(spark, SF).collect()
    by_ranking = {}
    for r in rows:
        by_ranking.setdefault(r.ranking, []).append(r)
    assert set(by_ranking) == {"cheap", "expensive"}
    for slices in by_ranking.values():
        slices.sort(key=lambda r: r.slice_order)
        assert slices[0].theta1 == 90.0
        assert slices[-1].theta2 == 450.0
        for a, b in zip(slices, slices[1:]):
            assert a.theta2 == b.theta1
        assert abs(sum(r.frac for r in slices) - 1.0) < 1e-4
        assert all("(" in r.label and r.label.endswith(")") for r in slices)


def test_pipeline_status_alerts_message_assembly(spark):
    """The DAG row's message must re-assemble from the task rows by the
    reference's exact rule (telegram_alert.py:181-207): ✅ + 'Completed
    successfully' when every check passed, else ❌ + the failed check
    names in check order. sf0.001's closed hour fails two checks, so
    the ❌ branch is live here, and the caps hold on every row."""
    from myserver_datawarehouse_spark.plans import flagship as FL

    rows = FL.pipeline_status_alerts(spark, SF).collect()
    tasks = [r for r in rows if r.scope == "task"]
    dag = [r for r in rows if r.scope == "dag"]
    assert len(tasks) == 4 and len(dag) == 1
    dag = dag[0]
    failed = [t.name for t in sorted(tasks, key=lambda t: t.alert_order)
              if not t.passed]
    if not failed:
        expected = f"✅ {FL.ALERT_PIPE_NAME} - Completed successfully"
    else:
        expected = (
            f"❌ {FL.ALERT_PIPE_NAME} - Failed "
            f"(Failed tasks: {', '.join(failed)})"
        )
    assert dag.message == expected
    assert dag.passed == (not failed)
    assert failed == ["completeness", "interpolation_bounded"]  # sf0.001
    for r in rows:
        assert r.caption == r.message[:1024]
        assert r.msg_len == len(r.message)
        assert r.n_chunks == (len(r.message) + 4095) // 4096


# --------------------------------------- SimHash estimator audit


def test_simhash_theory_covers_all_bands_including_exact_dup():
    rows = LT._simhash_agree_theory_rows()
    assert [cb for cb, _, _ in rows] == list(range(LT.C_BAND_W + 1))
    # exact-duplicate band: agreement deterministic, se exactly 0
    assert rows[-1][1] == 1.0 and rows[-1][2] == 0.0


def test_simhash_audit_signatures_match_near_dup_simhash(spark):
    """Drift detector: the audit computes SimHash votes from the
    COUNT-weighted (doc_id, token-hash, n) frame, near_dup_simhash from
    per-occurrence explode rows — mathematically the same projection.
    Pin the signatures equal on the sampled docs so the two copies can
    never drift apart silently (the minhash_estimator_audit role)."""
    from pyspark.sql import functions as F

    from myserver_datawarehouse_spark.operators import text as TX

    d = (
        LT._docs(spark, SF)
        .filter(F.col("doc_id") % LT.SIMHASH_AUDIT_MOD == 0)
        .select("doc_id", F.explode(TX.tokenize("text")).alias("t"))
        .select("doc_id", TX.hash60("t").alias("h"))
    )
    # near_dup_simhash's per-occurrence vote form
    occ_votes = d.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(TX.SIMHASH_BITS)
        ]
    )
    # the audit's count-weighted form
    tc = d.groupBy("doc_id", "h").agg(F.count(F.lit(1)).alias("n"))
    cnt_votes = tc.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1,
                    F.col("n"),
                ).otherwise(-F.col("n"))
            ).alias(f"v{i}")
            for i in range(TX.SIMHASH_BITS)
        ]
    )
    a = sorted(map(tuple, occ_votes.collect()))
    b = sorted(map(tuple, cnt_votes.collect()))
    assert a == b


def test_round14_plan_shapes(spark):
    """Load-bearing plan properties of the round-14 queries: heavy
    kernels (explodes) live only behind the materialize() cuts — the
    FINAL plans contain none — and the provably-tiny frames ride
    broadcasts, not SortMergeJoins (checkpointed frames have no size
    stats, so without the hints Spark plans SMJ)."""
    import re

    from myserver_datawarehouse_spark.plans import embeddings as EM
    from tests.test_plan_shapes import plan_of

    p_dsir = plan_of(LT.dsir_importance_weights_threshold(spark, SF))
    assert not re.search(r"Generate (pos)?explode", p_dsir)
    assert "SortMergeJoin" not in p_dsir

    p_qpf = plan_of(LT.quality_percentile_filter_threshold(spark, SF))
    assert not re.search(r"Generate (pos)?explode", p_qpf)
    assert "SortMergeJoin" not in p_qpf

    p_sim = plan_of(LT.simhash_estimator_audit(spark, SF))
    assert not re.search(r"Generate (pos)?explode", p_sim)
    assert "SortMergeJoin" not in p_sim

    p_ivf = plan_of(EM.ivf_recluster_audit(spark, SF))
    assert not re.search(r"Generate (pos)?explode", p_ivf)
    # the corpus-sized reassignment join legs are the ONLY sort-merge
    assert p_ivf.count("SortMergeJoin") <= 2


def test_simhash_agreement_tracks_srp_theory(spark):
    """On bands with real mass, measured bit-agreement must sit within
    2 per-pair theory stderr of the 1 − θ/π rate and be monotone in the
    cosine band — the calibration the chunk-banding radius presumes.
    (The small systematic under-shoot vs Gaussian theory is the known
    Rademacher-projection bias; 2·se bounds it on this corpus.)"""
    rows = [
        r
        for r in LT.simhash_estimator_audit(spark, SF).collect()
        if r.n_pairs >= 20
    ]
    assert len(rows) >= 4  # the fixture has mid-band mass
    for r in rows:
        assert abs(r.mean_agree - r.theory_agree) <= 2 * r.theory_se, r
    agrees = [r.mean_agree for r in sorted(rows, key=lambda r: r.c_band)]
    assert agrees == sorted(agrees)


# ------------------- UniMax mixture + seed-set quality classifier


def _py_docs():
    import pyarrow.parquet as pq

    return pq.read_table(SF + "/documents.parquet").to_pylist()


def _py_norm_tokens(text):
    import re

    norm = re.sub(r"\s+", " ", text.strip().lower())
    return norm, norm.split(" ")


def test_unimax_waterfilling_matches_python_recompute(spark):
    """The closed-form water level (theta = MAX of the sorted-cumulative
    candidates) must equal a direct pure-Python waterfill over the same
    per-language token totals — allocation, cap flags, and theta all
    pinned exactly, and both branches (capped low-resource languages vs
    uncapped absorbers) must be live on the fixture."""
    import math

    totals = {}
    for r in _py_docs():
        _, tks = _py_norm_tokens(r["text"])
        totals[r["lang"]] = totals.get(r["lang"], 0) + len(tks)
    caps = {
        lang: n * LT.UNIMAX_EPOCH_CAP_NUM / LT.UNIMAX_EPOCH_CAP_DEN
        for lang, n in totals.items()
    }
    budget = float(sum(totals.values()) * LT.UNIMAX_BUDGET_MULT)
    order = sorted(caps, key=lambda lang: (caps[lang], lang))
    n = len(order)
    theta, cum = None, 0.0
    for k, lang in enumerate(order, start=1):
        cand = (budget - cum) / (n - k + 1)
        theta = cand if theta is None else max(theta, cand)
        cum += caps[lang]

    rows = {r.lang: r for r in LT.unimax_mixture_plan(spark, SF).collect()}
    assert set(rows) == set(totals)
    for lang, r in rows.items():
        alloc = min(caps[lang], theta)
        assert r.src_tokens == totals[lang]
        assert r.alloc_tokens == int(math.floor(alloc + 0.5))
        assert abs(r.theta_tokens - theta) < 1e-6
        assert abs(r.epochs_served - alloc / totals[lang]) < 1e-6
        assert r.is_capped == (caps[lang] <= theta)
        assert (
            r.epochs_served
            <= LT.UNIMAX_EPOCH_CAP_NUM / LT.UNIMAX_EPOCH_CAP_DEN + 1e-9
        )
    flags = {r.is_capped for r in rows.values()}
    assert flags == {True, False}  # both branches live on the fixture
    served = sum(min(caps[lg], theta) for lg in order)
    assert served <= budget + 1e-6  # never over-allocates the budget


def test_seedset_classifier_calibration_and_gate_pin(spark):
    """The held-out banding must cover every odd doc exactly once, the
    per-band gate counts must sum to a pure-Python recompute of the
    Gopher gate over the odd half (pinning the embedded gate expression
    to the real rule), the in-row arithmetic must hold, and the top
    band must beat the bottom band's pass rate (the classifier carries
    real signal, not noise)."""
    from myserver_datawarehouse_spark.operators.text import STOPWORDS

    n_odd, n_odd_pass = 0, 0
    for r in _py_docs():
        if r["doc_id"] % 2 == 0:
            continue
        n_odd += 1
        norm, tks = _py_norm_tokens(r["text"])
        n_tok = len(tks)
        n_chars = len(norm) - (n_tok - 1)
        n_stop = len(set(STOPWORDS).intersection(tks))
        if (
            LT.GOPHER_MIN_TOKENS <= n_tok <= LT.GOPHER_MAX_TOKENS
            and LT.GOPHER_MWL_MIN * n_tok
            <= n_chars
            <= LT.GOPHER_MWL_MAX * n_tok
            and n_stop >= LT.GOPHER_MIN_STOPWORD_HITS
        ):
            n_odd_pass += 1

    rows = sorted(
        LT.seedset_quality_classifier(spark, SF).collect(),
        key=lambda r: r.band,
    )
    assert sum(r.n_docs for r in rows) == n_odd
    assert sum(r.n_pass for r in rows) == n_odd_pass
    for r in rows:
        assert -LT.SEEDSET_BAND_CLAMP <= r.band <= LT.SEEDSET_BAND_CLAMP
        assert 0 <= r.n_pass <= r.n_docs
        assert abs(r.pass_rate - r.n_pass / r.n_docs) < 1e-6
    assert rows[-1].pass_rate > rows[0].pass_rate  # signal, not noise
    assert rows[-1].mean_score > rows[0].mean_score


# ------------------------------------------ margin-based bitext mining


def test_bitext_mining_matches_python_mirror(spark):
    """Pure-Python mirror of the whole mining pipeline (sign buckets,
    cross-lang candidates, top-k selection with the same tie-breaks,
    exact-sum margin): the mined pair set must agree with Spark up to a
    tolerance band around the threshold, and every surfaced margin must
    match the mirror's raw value closely."""
    import math

    import pyarrow.parquet as pq

    from myserver_datawarehouse_spark.plans import embeddings as EM

    docs = {
        r["doc_id"]: r["lang"]
        for r in pq.read_table(SF + "/documents.parquet").to_pylist()
    }
    emb_rows = pq.read_table(SF + "/embeddings.parquet").to_pylist()
    bits = EM._bitext_bits(len(emb_rows))  # adaptive blocking ladder
    vecs = {}
    for r in emb_rows:
        v = [float(x) for x in r["embedding"]]
        bucket = sum((1 << i) for i in range(bits) if v[i] >= 0.0)
        nrm = math.sqrt(sum(x * x for x in v))
        vecs[r["vec_id"]] = (v, bucket, nrm)

    def r6(x):  # HALF_UP at 6 dp (positive domain)
        return math.floor(x * 1e6 + 0.5) / 1e6

    cand = {}
    ids = sorted(set(docs) & set(vecs))
    by_bucket = {}
    for i in ids:
        by_bucket.setdefault(vecs[i][1], []).append(i)
    for bucket_ids in by_bucket.values():
        for x in bucket_ids:
            for y in bucket_ids:
                la, lb = docs[x], docs[y]
                if la >= lb:
                    continue
                vx, _, nx = vecs[x]
                vy, _, ny = vecs[y]
                if nx == 0 or ny == 0:
                    continue
                c = r6(
                    sum(p * q for p, q in zip(vx, vy)) / (nx * ny)
                ) if sum(p * q for p, q in zip(vx, vy)) > 0 else None
                if c is not None and c > 0:
                    cand[(x, y)] = c

    def topk_sum(anchor_is_a):
        # keyed by (anchor, OTHER language) — the knn neighborhood is
        # per target language, mirroring the (doc, lang) window keys
        out = {}
        groups = {}
        for (x, y), c in cand.items():
            key = (x, docs[y]) if anchor_is_a else (y, docs[x])
            groups.setdefault(key, []).append(
                (-c, y if anchor_is_a else x, c)
            )
        for key, lst in groups.items():
            lst.sort()
            top = lst[: EM.MARGIN_K]
            # exact decimal sums: cosines are 6-dp multiples
            out[key] = (
                round(sum(int(round(c * 1e6)) for _, _, c in top)),
                len(top),
            )
        return out

    ka, kb = topk_sum(True), topk_sum(False)
    py = {}
    for (x, y), c in cand.items():
        sa, na = ka[(x, docs[y])]
        sb, nb = kb[(y, docs[x])]
        raw = c * (2 * na * nb) / ((sa * nb + sb * na) / 1e6)
        py[(x, y)] = raw

    rows = EM.bitext_mining_pairs(spark, SF).collect()
    got = {(r.doc_a, r.doc_b): r.margin for r in rows}
    for (x, y), m in got.items():
        assert abs(py[(x, y)] - m) < 1e-5
        assert m >= EM.MARGIN_TAU
        assert docs[x] < docs[y]
    for (x, y), raw in py.items():
        if raw >= EM.MARGIN_TAU + 1e-4:
            assert (x, y) in got, (x, y, raw)
    assert len(got) > 100  # the fixture mines a real pair set


# ---------------------------------------- source duplication matrix


def test_source_dup_matrix_rolls_up_the_pair_query(spark):
    """The matrix must be EXACTLY the Python rollup of the adjudicated
    near_dup_minhash_lsh output under the documents' doc->source map:
    link counts, per-side distinct docs, and max Jaccard per unordered
    source cell."""
    import pyarrow.parquet as pq

    src_of = {
        r["doc_id"]: r["source"]
        for r in pq.read_table(SF + "/documents.parquet").to_pylist()
    }
    pairs = LT.near_dup_minhash_lsh(spark, SF).collect()
    cells = {}
    for p in pairs:
        sa, sb = src_of[p.doc_a], src_of[p.doc_b]
        lo, hi = min(sa, sb), max(sa, sb)
        c = cells.setdefault((lo, hi), {"n": 0, "lo": set(), "hi": set(), "mx": None})
        c["n"] += 1
        for s, doc in ((sa, p.doc_a), (sb, p.doc_b)):
            if s == lo:
                c["lo"].add(doc)
            if s == hi:
                c["hi"].add(doc)
        c["mx"] = p.jaccard if c["mx"] is None else max(c["mx"], p.jaccard)

    rows = LT.source_dup_matrix(spark, SF).collect()
    got = {(r.source_lo, r.source_hi): r for r in rows}
    assert set(got) == set(cells)
    for key, c in cells.items():
        r = got[key]
        assert r.n_links == c["n"]
        assert r.n_docs_lo == len(c["lo"])
        assert r.n_docs_hi == len(c["hi"])
        assert r.max_jaccard == c["mx"]
    assert sum(r.n_links for r in rows) == len(pairs)
    assert any(k[0] != k[1] for k in cells)  # cross-source dup is live
