import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_states_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_DIR_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="spark_states_spark_tests")
    # The JVM-wide state-store maintenance task starts with the interval of
    # the FIRST stateful query and never re-reads it. Pin it fast here,
    # before any test runs a query, so retention/GC tests (which need a
    # maintenance pass within their deadline) are order-independent.
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "1s")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf_dir_small():
    return SF_DIR_SMALL
