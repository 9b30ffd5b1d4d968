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


def write_single_parquet(spark, rows, dest_dir, name, stage_root):
    """Write `rows` (list of pyspark Row) as ONE parquet file
    `dest_dir/name.parquet`, staging through a directory write.

    Goes through pandas so createDataFrame takes the Arrow batch path
    (one partition, one JVM-side write task, ~0.4s). The naive
    createDataFrame(rows).coalesce(1).write costs ~5s per call: the
    list parallelizes to 32 Python-RDD partitions and the single
    coalesced write task computes each through a Python worker
    round-trip (measured; worker reuse does not amortize it)."""
    import pandas as pd

    stage = os.path.join(str(stage_root), f"stage_{name}")
    pdf = pd.DataFrame([r.asDict() for r in rows])
    spark.createDataFrame(pdf).coalesce(1).write.parquet(stage)
    (part,) = glob.glob(f"{stage}/part-*.parquet")
    os.makedirs(dest_dir, exist_ok=True)
    shutil.copy(part, os.path.join(dest_dir, f"{name}.parquet"))
