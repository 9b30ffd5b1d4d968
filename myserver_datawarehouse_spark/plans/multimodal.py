"""Registry queries for the multimodal column layer: per-payload feature
extraction (mapInPandas) and a per-type rollup, both with exact DuckDB
oracles (the fake-decode fields are deterministic functions of byte
length, so the Arrow kernel and the SQL twin agree bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.operators import multimodal as MM
from myserver_datawarehouse_spark.operators import text as TX
from myserver_datawarehouse_spark.sources.tables import load_table

_MT_CASE = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> typed feature row through the real mapInPandas
    plumbing (operators/multimodal.py). The oracle recomputes every
    feature relationally: md5(text) over UTF-8 bytes equals the kernel's
    hashlib.md5(payload)."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.with_fake_payload(docs)
    feats = MM.extract_features(media)
    # Output edge: nullable ints become NaN floats through the Arrow/pandas
    # bridge the correctness harness rides on — emit -1 sentinels instead
    # (mirrored in the oracle); the operator layer keeps real NULLs.
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "payload_md5",
        *[
            F.coalesce(F.col(c), F.lit(-1)).alias(c)
            for c in ("width", "height", "sample_rate", "n_frames")
        ],
    ).orderBy("doc_id")


MULTIMODAL_FEATURES_SQL = f"""
WITH m AS (
  SELECT doc_id, {_MT_CASE} AS media_type,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS payload_md5
  FROM documents
)
SELECT doc_id, media_type, n_bytes, payload_md5,
       COALESCE(CASE WHEN media_type IN ('image', 'video')
                     THEN CAST(n_bytes % 640 + 1 AS INT) END, -1) AS width,
       COALESCE(CASE WHEN media_type IN ('image', 'video')
                     THEN CAST(n_bytes % 480 + 1 AS INT) END, -1) AS height,
       COALESCE(CASE WHEN media_type = 'audio' THEN 16000 END, -1)
         AS sample_rate,
       COALESCE(CASE WHEN media_type = 'video'
                     THEN CAST(n_bytes % 16 + 1 AS INT) END, -1) AS n_frames
FROM m
ORDER BY doc_id
"""


def multimodal_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per media type over the extracted features — the
    post-extraction aggregate a curation pipeline runs (count, byte
    volume, shape extrema)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = MM.extract_features(MM.with_fake_payload(docs))
    return (
        feats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
            F.coalesce(F.min("width"), F.lit(-1)).alias("min_width"),
            F.coalesce(F.max("height"), F.lit(-1)).alias("max_height"),
            F.countDistinct("payload_md5").alias("n_distinct_payloads"),
        )
        .orderBy("media_type")
    )


MULTIMODAL_TYPE_ROLLUP_SQL = f"""
WITH m AS (
  SELECT doc_id, {_MT_CASE} AS media_type,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS payload_md5
  FROM documents
)
SELECT media_type,
       COUNT(*) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       MAX(n_bytes) AS max_bytes,
       COALESCE(MIN(CASE WHEN media_type IN ('image', 'video')
                          THEN CAST(n_bytes % 640 + 1 AS INT) END), -1)
         AS min_width,
       COALESCE(MAX(CASE WHEN media_type IN ('image', 'video')
                          THEN CAST(n_bytes % 480 + 1 AS INT) END), -1)
         AS max_height,
       COUNT(DISTINCT payload_md5) AS n_distinct_payloads
FROM m
GROUP BY 1
ORDER BY media_type
"""


PHASH_CHUNKS = 4
PHASH_HAMMING_MAX = PHASH_CHUNKS - 1  # pigeonhole-complete radius


def near_dup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over image payloads —
    the image arm of the dedup tier (text has exact/MinHash/SimHash/
    prefix-filter; this gives binary media the same capability).

    Pipeline: binary payload -> 60-bit block-histogram aHash in the
    mapInPandas kernel (operators/multimodal.image_phash) -> 4x15-bit
    chunk banding (operators/text.simhash_chunks — the SimHash band
    machinery reused verbatim) -> equi-join on (chunk_idx, chunk_value)
    -> exact Hamming verify <= 3 (pigeonhole-complete for that radius)
    -> survivor pick (min doc_id among each retired doc's matches).

    At 100 TB: candidates come ONLY from shared 15-bit buckets
    (corpus/32768 expected fan-out per chunk), never an all-pairs or a
    payload shuffle — the payload never leaves its scan; only the
    8-byte (doc_id, phash) pairs move.
    """
    docs = load_table(spark, sf_dir, "documents")
    media = MM.with_fake_payload(docs)
    ph = MM.image_phash(media)
    chunks = ph.select(
        "doc_id",
        "phash",
        F.posexplode(TX.simhash_chunks("phash", PHASH_CHUNKS)).alias(
            "c", "cv"
        ),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            TX.hamming60(F.col("a.phash"), F.col("b.phash")).alias(
                "hamming"
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "hamming",
        F.min("doc_a").over(Window.partitionBy("doc_b")).alias("survivor"),
    ).orderBy("doc_a", "doc_b")


_PHASH_W = MM.PHASH_WINDOW
_PHASH_CHUNK_W = TX.SIMHASH_BITS // PHASH_CHUNKS
_PHASH_CHUNK_MASK = (1 << _PHASH_CHUNK_W) - 1

NEAR_DUP_IMAGE_PHASH_SQL = f"""
WITH img AS (
  SELECT doc_id, text, length(text) - {_PHASH_W} + 1 AS n
  FROM documents WHERE doc_id % 3 = 0
),
bins AS (
  SELECT doc_id, n,
         [CAST(('0x' || substring(md5(substring(text, j, {_PHASH_W})), 1, 15))::BIGINT
               % {MM.PHASH_BITS} AS INT)
          FOR j IN generate_series(1, n)] AS bs
  FROM img
),
ph AS (
  SELECT doc_id,
         CAST(list_sum(
           [CASE WHEN {MM.PHASH_BITS} * len(list_filter(bs, b -> b = i)) > n
                 THEN (1::BIGINT << i) ELSE 0::BIGINT END
            FOR i IN generate_series(0, {MM.PHASH_BITS - 1})]) AS BIGINT)
           AS phash
  FROM bins
),
chunks AS (
  SELECT doc_id, phash, c,
         CAST((phash >> (c * {_PHASH_CHUNK_W})) & {_PHASH_CHUNK_MASK} AS INT)
           AS cv
  FROM ph, LATERAL unnest(generate_series(0, {PHASH_CHUNKS - 1})) AS u(c)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.phash, b.phash)) AS hamming
  FROM chunks a
  JOIN chunks b ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming,
       MIN(doc_a) OVER (PARTITION BY doc_b) AS survivor
FROM pairs
WHERE hamming <= {PHASH_HAMMING_MAX}
ORDER BY doc_a, doc_b
"""


FRAME_K = 4


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video payloads: k={FRAME_K} evenly spaced
    indices of each fake frame count, one output row per sampled frame
    with its deterministic fingerprint (operators/multimodal.sample_frames
    — mapInPandas; the ffmpeg decode is the stubbed seam)."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.with_fake_payload(docs)
    return MM.sample_frames(media, FRAME_K).orderBy("doc_id", "frame_idx")


MULTIMODAL_FRAME_SAMPLE_SQL = f"""
WITH v AS (
  SELECT doc_id, text,
         octet_length(encode(text)) % 16 + 1 AS n_frames
  FROM documents
  WHERE {_MT_CASE} = 'video'
),
idx AS (
  SELECT DISTINCT doc_id, text,
         CASE WHEN n_frames = 1 THEN 0
              ELSE (i * (n_frames - 1)) // {FRAME_K - 1} END AS frame_idx
  FROM v, LATERAL unnest(generate_series(0, {FRAME_K - 1})) AS u(i)
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       md5(text || CAST(frame_idx AS VARCHAR)) AS frame_md5
FROM idx
ORDER BY doc_id, frame_idx
"""
