import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small local session for tests


@pytest.fixture(scope="session")
def spark():
    from light_curve_python_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8,
                  app_name="lcps-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
