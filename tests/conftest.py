import glob
import os
import shutil

import pytest

from myserver_datawarehouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    # Tiny fixtures: shrink shuffle width so window/agg tests run in ms.
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s


# Strictly-increasing mtime source for write_single_parquet: the file
# stream source orders batches by modificationTime, and consecutive
# fixture writes are fast enough to share a coarse-granularity mtime —
# pinning every written file to a fresh monotonic second makes batch
# order deterministic on ANY filesystem, without sleeping.
_MTIME_SEQ = [1_700_000_000]


def write_single_parquet(spark, rows, dest_dir, name, stage_root):
    """Write `rows` (list of pyspark Row) as ONE parquet file
    `dest_dir/name.parquet`, staging through a directory write.

    Goes through pandas so createDataFrame takes the Arrow batch path
    (one partition, one JVM-side write task, ~0.4s). The naive
    createDataFrame(rows).coalesce(1).write costs ~5s per call: the
    list parallelizes to 32 Python-RDD partitions and the single
    coalesced write task computes each through a Python worker
    round-trip (measured; worker reuse does not amortize it).

    Every written file gets a strictly-increasing pinned mtime so
    streaming tests that rely on file-source batch order (gap-state,
    dedup, watermark) are deterministic everywhere."""
    import pandas as pd

    stage = os.path.join(str(stage_root), f"stage_{name}")
    pdf = pd.DataFrame([r.asDict() for r in rows])
    spark.createDataFrame(pdf).coalesce(1).write.parquet(stage)
    (part,) = glob.glob(f"{stage}/part-*.parquet")
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, f"{name}.parquet")
    shutil.copy(part, dest)
    _MTIME_SEQ[0] += 10
    os.utime(dest, (_MTIME_SEQ[0], _MTIME_SEQ[0]))
