import sys

import pytest

sys.path.insert(0, "/root/repo")

from sap_sql_engine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
