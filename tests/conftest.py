import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    session = (
        SparkSession.builder.master("local[4]")
        .appName("kairos_spark-tests")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        # 6g: the suite runs 500+ tests against ONE JVM; iterative
        # operators cache intermediates and the old 4g ceiling let a
        # long run stop the SparkContext near the end of the suite
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    yield session


@pytest.fixture(autouse=True)
def _clear_spark_cache(request):
    """Evict persisted DataFrames after every test. The iterative
    operators (kcore_peel, bfs_reach) persist intermediate snapshots
    by design — correct within one query, but across 500+ tests the
    un-evicted blocks accumulate until the shared 4g test JVM's
    SparkContext dies mid-suite (observed: everything after the
    property file failing with 'stopped SparkContext'). One cheap
    clearCache RPC per test keeps the session bounded."""
    yield
    if "spark" in request.fixturenames:
        request.getfixturevalue("spark").catalog.clearCache()
