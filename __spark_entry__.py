"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke-check at sf0.001.
``queries()`` / ``oracle_sql()`` — operator inventory from SURVEY.md §2
plus the training-data pipeline operators, each as a (Spark DataFrame
builder, DuckDB oracle SQL) pair; see kairos_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from kairos_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hourly per-stat counters
    through the full ingest → bucket → aggregate pipeline."""
    return _q.q_ts_count_series_hour(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
