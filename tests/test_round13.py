"""Round-13 additions: DSIR hashed n-gram importance resampling,
interpolated n-gram LM perplexity gate, streaming curation ledger —
semantics asserted against pure-Python recomputations on the sf0.001
fixture, not just oracle hashes."""

import math

import duckdb
import pytest

from myserver_datawarehouse_spark.plans import llm_text as LT

SF = "/root/testdata/sf0.001"


def _fixture_docs():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),"
        " lang, source"
        f" FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    return [
        (did, txt.split(" ") if txt else [], lang, src)
        for did, txt, lang, src in rows
    ]


def _hash60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ------------------------------------------------ DSIR importance


def _py_dsir_logw():
    """Pure-Python recompute of the per-doc DSIR log weights with the
    plan's exact rounding discipline (12-dp lambda, 12-dp terms)."""
    docs = _fixture_docs()
    per_doc = {}  # doc_id -> {bucket: n}
    meta = {}
    raw = {}
    tgt = {}
    tot_raw = 0
    tot_tgt = 0
    for did, tks, lang, src in docs:
        grams = [t for t in tks if t != ""]
        grams += [
            f"{tks[i]} {tks[i + 1]}" for i in range(len(tks) - 1)
        ]
        grams = [g for g in grams if g != ""]
        bc = {}
        for g in grams:
            b = _hash60(g) % LT.DSIR_BUCKETS
            bc[b] = bc.get(b, 0) + 1
        per_doc[did] = bc
        meta[did] = (lang, src)
        for b, n in bc.items():
            raw[b] = raw.get(b, 0) + n
            tot_raw += n
            if lang == LT.DSIR_TARGET_LANG:
                tgt[b] = tgt.get(b, 0) + n
                tot_tgt += n
    a = LT.DSIR_ALPHA
    denom = LT.DSIR_ALPHA * LT.DSIR_BUCKETS
    lam = {
        b: round(
            math.log((tgt.get(b, 0) + a) / (tot_tgt + denom))
            - math.log((raw[b] + a) / (tot_raw + denom)),
            12,
        )
        for b in raw
    }
    logw = {
        did: sum(round(n * lam[b], 12) for b, n in bc.items())
        for did, bc in per_doc.items()
    }
    return logw, meta


def test_dsir_budget_matches_python_recompute(spark):
    logw, meta = _py_dsir_logw()
    n_sel = len(logw) // LT.DSIR_SELECT_DENOM
    order = sorted(logw, key=lambda d: (-logw[d], d))
    selected = set(order[:n_sel])
    want = {}
    for did, (lang, src) in meta.items():
        n, s, tot = want.get(src, (0, 0, 0.0))
        want[src] = (
            n + 1,
            s + (1 if did in selected else 0),
            tot + logw[did],
        )
    got = {
        r.source: r
        for r in LT.dsir_importance_weights(spark, SF).collect()
    }
    assert set(got) == set(want)
    for src, (n, sel, tot) in want.items():
        assert got[src].n_docs == n
        assert got[src].n_selected == sel
        assert got[src].mean_logw == pytest.approx(
            round(tot / n, 6), abs=2e-6
        )
        assert got[src].budget_share == pytest.approx(
            round(sel / n_sel, 6), abs=1e-9
        )


def test_dsir_weights_prefer_target_language(spark):
    """The whole point of the importance weight: docs drawn from the
    target ('en') distribution must carry higher average weight than
    docs from other languages, and dominate the selected set."""
    logw, meta = _py_dsir_logw()
    en = [logw[d] for d in logw if meta[d][0] == LT.DSIR_TARGET_LANG]
    other = [logw[d] for d in logw if meta[d][0] != LT.DSIR_TARGET_LANG]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)
    n_sel = len(logw) // LT.DSIR_SELECT_DENOM
    order = sorted(logw, key=lambda d: (-logw[d], d))
    sel_langs = [meta[d][0] for d in order[:n_sel]]
    en_share_sel = sel_langs.count(LT.DSIR_TARGET_LANG) / len(sel_langs)
    en_share_all = len(en) / len(logw)
    assert en_share_sel > en_share_all


def test_dsir_budget_sums_to_selection(spark):
    df = LT.dsir_importance_weights(spark, SF).toPandas()
    n_docs = int(df.n_docs.sum())
    assert int(df.n_selected.sum()) == n_docs // LT.DSIR_SELECT_DENOM
    assert df.budget_share.sum() == pytest.approx(1.0, abs=1e-4)
