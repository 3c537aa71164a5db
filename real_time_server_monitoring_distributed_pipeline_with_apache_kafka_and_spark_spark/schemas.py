"""Explicit schemas for every dataset the engine touches.

The reference relies on ``inferSchema=True`` (``spark_job1.py:14-15``) which
costs an extra full scan and yields nondeterministic typing - an anti-pattern
at 100 TB (SURVEY.md SS4.3). Every scan here declares its schema.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference metric-pipeline schemas (data/dataset.csv:1, producer.py:68-71)

METRICS_WIDE = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("server_id", T.StringType(), False),
        T.StructField("cpu_pct", T.DoubleType(), True),
        T.StructField("mem_pct", T.DoubleType(), True),
        T.StructField("net_in", T.DoubleType(), True),
        T.StructField("net_out", T.DoubleType(), True),
        T.StructField("disk_io", T.DoubleType(), True),
    ]
)

# Narrow per-topic layouts as landed by the consumers
# (consumers/consumer1.py:35-36, consumer2.py:35-36).
METRICS_CPU = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("server_id", T.StringType(), False),
        T.StructField("cpu_pct", T.DoubleType(), True),
    ]
)
METRICS_MEM = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("server_id", T.StringType(), False),
        T.StructField("mem_pct", T.DoubleType(), True),
    ]
)
METRICS_NET = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("server_id", T.StringType(), False),
        T.StructField("net_in", T.DoubleType(), True),
        T.StructField("net_out", T.DoubleType(), True),
    ]
)
METRICS_DISK = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("server_id", T.StringType(), False),
        T.StructField("disk_io", T.DoubleType(), True),
    ]
)

TOPIC_SCHEMAS: dict[str, T.StructType] = {
    "cpu": METRICS_CPU,
    "mem": METRICS_MEM,
    "net": METRICS_NET,
    "disk": METRICS_DISK,
}

# --- events.props JSON payload (TESTDATA events table)
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType(), True)])
