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


def test_knn_join_hot_bucket_split_is_lossless(spark):
    """knn_join bounds hot buckets by splitting (table, bucket) groups
    with m > bucket_cap into C^2 block-matmul cells. A pathological
    corpus — 600 vectors clustered so tightly they share one LSH bucket
    in every table — must produce EXACTLY the same kNN graph with a tiny
    cap (C~10 split cells) as with an effectively-infinite cap (the old
    single-task m^2 path): each pair is still scored in exactly one
    cell and the shortlist merge is lossless by pigeonhole."""
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.similarity import (
        knn_join,
    )

    # Tight cluster: one dominant direction + small deterministic jitter
    # => identical sign pattern on every hyperplane => one hot bucket.
    dim = 16
    base = [1.0] * dim
    rows = []
    for i in range(600):
        v = list(base)
        v[i % dim] += 0.001 * ((i * 2654435761) % 97) / 97.0
        v[(i + 7) % dim] += 0.0007 * ((i * 40503) % 89) / 89.0
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    kw = dict(k=5, planes_per_table=4, n_tables=6, dim=dim)
    unsplit = sorted(
        (r.vec_id, r.neighbor_id, r.rnk)
        for r in knn_join(emb, bucket_cap=10**9, **kw).collect()
    )
    split = sorted(
        (r.vec_id, r.neighbor_id, r.rnk)
        for r in knn_join(emb, bucket_cap=64, **kw).collect()
    )
    assert split == unsplit and len(unsplit) == 600 * 5
