"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference spark_job1's sliding-
window aggregation shape, SURVEY.md SS7.2 M0) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full operator registry from
``real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries import (  # noqa: E402
    all_oracles,
    all_queries,
)

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()["monitor_cpu_mem_alerts"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md SS2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted => rows-only check)."""
    return all_oracles()
