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
    """Evict persisted DataFrames after every test. The iterative graph
    operators now unpersist their own intermediates (round-6 ADVICE
    fix), but this stays as a backstop: across 500+ tests any leaked
    block accumulates until the shared test JVM's SparkContext dies
    mid-suite (observed pre-fix: everything after the property file
    failing with 'stopped SparkContext'). One cheap clearCache RPC per
    test keeps the session bounded regardless."""
    yield
    if "spark" in request.fixturenames:
        request.getfixturevalue("spark").catalog.clearCache()
