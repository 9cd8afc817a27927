import sys

import pytest

sys.path.insert(0, "/root/repo")

from sap_sql_engine_spark import cachereg
from sap_sql_engine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", shuffle_partitions=8)
    yield s


@pytest.fixture(autouse=True)
def _release_builder_caches():
    """Builder-owned caches (cachereg) are consumed within a test; drain the
    registry after each one so a 180-test session doesn't accumulate cached
    relations in executor storage."""
    yield
    cachereg.release()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
