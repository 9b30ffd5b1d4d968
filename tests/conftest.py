import pytest

from myserver_datawarehouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    # Tiny fixtures: shrink shuffle width so window/agg tests run in ms.
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s
