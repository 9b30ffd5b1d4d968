"""Embedding-vector kernels over `array<float>` columns: dot product,
norms, cosine, sign-bit bucketing (SURVEY.md LLM-data-pipeline addendum —
the reference has no vector ops; this is the similarity-search layer a
training-data pipeline needs).

Two tiers:
- Row-wise kernels (`dot`/`norm2`/`cosine`/`sign_bucket`) are higher-order
  array functions — JVM-side, no Python. Determinism: products are
  accumulated left-to-right in DOUBLE by `aggregate` (a fixed fold
  order), bit-identical to DuckDB's `list_dot_product` over `DOUBLE[]`.
  (Measured: the interpreted HOF fold beats an unrolled 64-term codegen
  expression ~3.5x — element_at chains don't win here; don't "optimize"
  back.)
- `gemm_probe_scores` is the Arrow-batched BLAS tier for many-pair
  scoring (mapInPandas + numpy gemm), the 100 TB path when arithmetic
  volume, not row plumbing, dominates.

Per-row math has no partition-order dependence, so results are stable
under any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right double-accumulated dot product of two float arrays."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def norm2(a: Column | str) -> Column:
    """Euclidean norm (sqrt of the double-accumulated self-dot)."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm2(a), norm2(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def gemm_probe_scores(
    corpus,
    probes_pdf,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Batch-BLAS probe scoring: cosine of every (probe, corpus vector)
    pair via one numpy gemm per Arrow batch (`mapInPandas`).

    This is the many-FLOP scale path: the interpreted `aggregate` fold
    costs ~µs per 64-dim dot, while a (batch x dim) @ (dim x probes) gemm
    amortizes to ~ns — the same plan shape (map-only corpus pass, probes
    on the small side) at 100 TB with 3 orders more arithmetic headroom.
    The probe table rides in a broadcast variable (it is the tiny side a
    JVM plan would broadcast-join; collecting it is the `fit` step, not a
    driver loop over the corpus).

    FP note: BLAS accumulation order is blocked, not left-to-right, so raw
    scores can differ from the `dot()` fold in the last ulp; outputs are
    rounded to 6 dp, where both paths agree (verified empirically against
    the DuckDB oracle at sf0.01 and sf0.1 — see plans/embeddings.py).
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    Q = np.array(
        [np.asarray(v, dtype=np.float64) for v in probes_pdf[vec_col]]
    )
    qids = probes_pdf[id_col].to_numpy()
    qn = np.sqrt((Q * Q).sum(axis=1))
    bq = spark.sparkContext.broadcast((qids, Q, qn))

    def score(batches):
        b_qids, b_Q, b_qn = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            vn = np.sqrt((V * V).sum(axis=1))
            S = V @ b_Q.T
            with np.errstate(divide="ignore", invalid="ignore"):
                C = S / (vn[:, None] * b_qn[None, :])
            n, p = C.shape
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(b_qids[None, :], n, axis=0).ravel(),
                    "vec_id": np.repeat(pdf[id_col].to_numpy(), p),
                    "cosine": np.round(C.ravel(), 6),
                }
            )
            ok = (np.repeat(vn, p) > 0) & (np.tile(b_qn, n) > 0)
            yield out[ok & (out["query_id"] != out["vec_id"])]

    return corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id long, vec_id long, cosine double"
    )


def gemm_bucket_topk(
    bucketed,
    top_k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
):
    """Bucket-local top-k cosine neighbors via one BLAS gemm per bucket
    (`groupBy(bucket).applyInPandas`).

    The JVM form of this query expands the bucket self-join to |bucket|^2
    pair ROWS and folds each dot product; here the same |bucket|^2 dot
    products are a single (n x d) @ (d x n) gemm that never materializes
    pair rows outside the kernel — measured ~4x at sf0.1, and the gap is
    the FLOP throughput ratio, so it widens with bucket size. Shuffle
    shape is identical (one hash partition per bucket; a bucket fits a
    task by construction — that's what the bit count tunes).

    Tie-break parity with the join+window form: rows are ordered by id
    ascending before scoring, so a stable argsort on -cosine yields
    (cosine DESC, neighbor_id ASC) exactly. 6-dp rounding happens BEFORE
    ranking, as in the JVM/oracle form, so ranking ties agree too.
    """
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {
            id_col: pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            bucket_col: pd.Series(dtype="int64"),
            "cosine": pd.Series(dtype="float64"),
        }
    )

    def topk(key, pdf):  # no hints: applyInPandas infers eval type itself
        (bucket,) = key
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        M = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        nrm = np.sqrt((M * M).sum(axis=1))
        S = M @ M.T
        with np.errstate(divide="ignore", invalid="ignore"):
            C = np.round(S / (nrm[:, None] * nrm[None, :]), 6)
        ok = (nrm[:, None] > 0) & (nrm[None, :] > 0)
        np.fill_diagonal(ok, False)
        C = np.where(ok, C, -np.inf)
        k = min(top_k, n - 1)
        order = np.argsort(-C, axis=1, kind="stable")[:, :k]
        cos = np.take_along_axis(C, order, axis=1).ravel()
        keep = np.isfinite(cos)
        return pd.DataFrame(
            {
                id_col: np.repeat(ids, k)[keep],
                "neighbor_id": ids[order.ravel()][keep],
                bucket_col: bucket,
                "cosine": cos[keep],
            }
        )

    return bucketed.select(id_col, vec_col, bucket_col).groupBy(bucket_col).applyInPandas(
        topk, f"{id_col} long, neighbor_id long, {bucket_col} int, cosine double"
    )


def gemm_multiprobe_topk(
    bucketed,
    n_bits: int,
    top_k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
):
    """Multiprobe bucket ANN via one BLAS gemm per probed bucket: each
    query vector probes its own sign bucket plus the `n_bits` buckets at
    Hamming distance 1, and every probed bucket's (queries x corpus) dot
    products run as a single gemm instead of per-pair JVM folds — same
    candidate set and tie-breaks as the DataFrame join form
    (plans/embeddings.embedding_ann_multiprobe_join, tier-parity tested),
    measured ~10x at sf0.1 where the join form pays the interpreted fold
    on ({n_bits}+1)x the single-probe volume.

    Shape: a tagged union routes each corpus row to its own bucket and
    each query row to its (n_bits+1)-bucket probe list, one hash
    partition per probed bucket; the kernel emits per-bucket top-k
    partials (the global top-k is a subset of their union) and a final
    per-query window merges them. Rounding to 6 dp happens before
    ranking, ids ascending + stable argsort reproduce the
    (cosine DESC, neighbor_id ASC) order — oracle-exact."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    masks = F.array(F.lit(0), *[F.lit(1 << i) for i in range(n_bits)])
    base = bucketed.select(id_col, vec_col, bucket_col)
    corpus = base.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(bucket_col).alias("probe_bucket"),
        F.lit(0).alias("role"),
    )
    queries = base.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(masks).alias("mask"),
        F.col(bucket_col),
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(bucket_col).bitwiseXOR(F.col("mask")).alias("probe_bucket"),
        F.lit(1).alias("role"),
    )
    tagged = corpus.unionByName(queries)

    empty = pd.DataFrame(
        {
            id_col: pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "cosine": pd.Series(dtype="float64"),
        }
    )

    def topk(key, pdf):
        q = pdf[pdf["role"] == 1]
        c = pdf[pdf["role"] == 0].sort_values(id_col)
        if len(q) == 0 or len(c) == 0:
            return empty
        qi = q[id_col].to_numpy()
        ci = c[id_col].to_numpy()
        Qm = np.array([np.asarray(v, dtype=np.float64) for v in q[vec_col]])
        Cm = np.array([np.asarray(v, dtype=np.float64) for v in c[vec_col]])
        nq = np.sqrt((Qm * Qm).sum(axis=1))
        nc = np.sqrt((Cm * Cm).sum(axis=1))
        S = Qm @ Cm.T
        with np.errstate(divide="ignore", invalid="ignore"):
            C = np.round(S / (nq[:, None] * nc[None, :]), 6)
        ok = (
            (nq[:, None] > 0)
            & (nc[None, :] > 0)
            & (qi[:, None] != ci[None, :])
        )
        C = np.where(ok, C, -np.inf)
        k = min(top_k, C.shape[1])
        order = np.argsort(-C, axis=1, kind="stable")[:, :k]
        cos = np.take_along_axis(C, order, axis=1).ravel()
        keep = np.isfinite(cos)
        return pd.DataFrame(
            {
                id_col: np.repeat(qi, k)[keep],
                "neighbor_id": ci[order.ravel()][keep],
                "cosine": cos[keep],
            }
        )

    partials = tagged.groupBy("probe_bucket").applyInPandas(
        topk, f"{id_col} long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        partials.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_k)
        .drop("__rn")
    )


def gemm_bucket_pairs(
    bucketed,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
):
    """Bucket-local near-dup pairs (i < j, cosine >= tau) via one gemm per
    bucket — the dedup twin of `gemm_bucket_topk`. Only the upper triangle
    is emitted, and tau gates emission inside the kernel, so the output
    volume is the dup count, never |bucket|^2 rows."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {
            id_col: pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "cosine": pd.Series(dtype="float64"),
        }
    )

    def pairs(key, pdf):
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        M = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        nrm = np.sqrt((M * M).sum(axis=1))
        S = M @ M.T
        with np.errstate(divide="ignore", invalid="ignore"):
            C = np.round(S / (nrm[:, None] * nrm[None, :]), 6)
        iu, ju = np.triu_indices(n, k=1)  # ids sorted asc => i<j orientation
        ok = (nrm[iu] > 0) & (nrm[ju] > 0)
        cos = C[iu, ju]
        keep = ok & (cos >= tau)
        return pd.DataFrame(
            {
                id_col: ids[iu[keep]],
                "neighbor_id": ids[ju[keep]],
                "cosine": cos[keep],
            }
        )

    return bucketed.select(id_col, vec_col, bucket_col).groupBy(bucket_col).applyInPandas(
        pairs, f"{id_col} long, neighbor_id long, cosine double"
    )


def sign_bucket(a: Column | str, n_bits: int = 4) -> Column:
    """Sign-bit coarse quantizer: bucket id from the signs of the first
    `n_bits` dimensions (0..2^n_bits - 1).

    This is the cheapest possible IVF-style partitioner: bucket-local
    search replaces the all-pairs cross join with a join keyed on a
    small int. More bits => smaller buckets; at 100 TB you size n_bits
    so the expected bucket fits one task (bucket population ~ N/2^bits
    for roughly centered embeddings).
    """
    arr = _c(a)
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            F.element_at(arr, i + 1) >= 0,
            F.call_function("shiftleft", F.lit(1), i),
        ).otherwise(0),
    )
