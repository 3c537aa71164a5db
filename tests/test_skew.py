"""Skew-relief demonstration for salted_join (SURVEY.md SS4.3 hot-key row).

rel_salted_join proves result-invariance on uniform TPC-H keys; this pins
the actual MECHANISM on a pathologically skewed fixture: one hot key
holding ~96% of the left rows. Without salting, every hot-key row hashes
to ONE shuffle partition (the straggler task at scale); with salting the
hot key spreads across n_salts partitions.

AQE is disabled inside the test: its partition coalescing folds this tiny
dataset into one partition, hiding the distribution being measured (and
its skew-join splitting only engages past ~256 MB partitions — real skew
relief below that threshold is exactly what explicit salting is for).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.joins import (
    salted_join,
)

HOT_ROWS = 48_000
COLD_KEYS = 20
N_SALTS = 8


@pytest.fixture()
def no_aqe(spark):
    """Also disables auto-broadcast: a broadcast join would not shuffle the
    left side at all (the right side here is tiny), and the point is to
    measure the shuffle-partition skew of the big-side hash — the regime
    salting exists for (both sides too big to broadcast)."""
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)


def _partition_histogram(df):
    rows = (
        df.withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .count()
        .collect()
    )
    return {r["_p"]: r["count"] for r in rows}


def test_salted_join_spreads_hot_key(spark, no_aqe):
    left = (
        spark.range(HOT_ROWS)
        .select(F.lit(1).alias("k"), F.col("id").alias("lv"))
        .unionByName(
            spark.range(2, 2 + COLD_KEYS).select(
                F.col("id").alias("k"), F.lit(-1).cast("long").alias("lv")
            )
        )
        .repartition(8)
    )
    right = spark.range(1, 2 + COLD_KEYS).select(
        F.col("id").alias("k"), F.concat(F.lit("r"), F.col("id")).alias("rv")
    )
    total = HOT_ROWS + COLD_KEYS

    plain = left.join(right, on=["k"], how="inner")
    salted = salted_join(left, right, ["k"], n_salts=N_SALTS)

    # identical results first (the invariant rel_salted_join already pins)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    plain_hist = _partition_histogram(plain)
    salted_hist = _partition_histogram(salted)

    # plain: the hot key funnels into one shuffle partition
    assert max(plain_hist.values()) >= HOT_ROWS
    # salted: the hot key spreads over ~n_salts partitions; the biggest
    # task shrinks by at least 4x (expected ~n_salts x for uniform salt)
    assert max(salted_hist.values()) <= max(plain_hist.values()) / 4, (
        plain_hist,
        salted_hist,
    )
    # and no rows lost in the histograms themselves
    assert sum(plain_hist.values()) == sum(salted_hist.values()) == total
