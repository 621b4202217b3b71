import os

import pytest


@pytest.fixture(scope="session")
def spark():
    # Smaller parallelism for test speed; the engine config is identical.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from nominatim_spark.session import get_spark

    s = get_spark("nominatim_spark_tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
