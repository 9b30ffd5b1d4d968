"""Embedding-vector kernels over `array<float>` columns: dot product,
norms, cosine, sign-bit bucketing (SURVEY.md LLM-data-pipeline addendum —
the reference has no vector ops; this is the similarity-search layer a
training-data pipeline needs).

All kernels are higher-order array functions — JVM-side, codegen'd, no
Python UDFs. Determinism: products are accumulated left-to-right in
DOUBLE by `aggregate` (a fixed fold order), which is bit-identical to
DuckDB's `list_dot_product` over `DOUBLE[]` (verified on the driver's
embeddings table). Per-row math has no partition-order dependence, so
results are stable under any parallelism.
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
