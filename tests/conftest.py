import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sonnerie_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # small parallelism: tests run on tiny data; big jobs waste time on
    # task scheduling + python worker spin-up
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("sonnerie_spark_tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
