import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # fast test sessions


@pytest.fixture(scope="session")
def spark():
    from afspark.session import get_session

    s = get_session(app_name="afspark-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
