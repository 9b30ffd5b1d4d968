import pytest

from myserver_datawarehouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    # Tiny fixtures: shrink shuffle width so window/agg tests run in ms.
    s.conf.set("spark.sql.shuffle.partitions", "4")
    # createDataFrame on local[32] otherwise makes 32 one-row partitions
    # per fixture, turning every non-equi self-join into a 32x32=1024-task
    # nested-loop stage (measured 13s for a 48-row brute-force join).
    s.conf.set("spark.sql.leafNodeDefaultParallelism", "4")
    yield s
