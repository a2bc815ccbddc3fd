import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from grebi_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="grebi_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="module", autouse=True)
def _module_cache_hygiene(request):
    """Drop cached/persisted frames between test modules so the shared
    JVM doesn't accumulate 90 minutes of cache blocks (the round-1
    full-suite failure mode)."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        s.catalog.clearCache()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
