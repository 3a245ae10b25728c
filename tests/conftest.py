import os
import sys

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running scale-evidence tests (SRTM-1 grain)"
    )

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from hgt2osm2_spark.session import get_spark

    s = get_spark(app="hgt2osm2-tests", cores=4, driver_memory="8g")
    yield s


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
