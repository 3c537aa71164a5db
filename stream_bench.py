#!/usr/bin/env python
"""Streaming-throughput bench: sustained rows/sec through the two
streaming legs that mirror the reference's pipeline.

The reference's only performance instrumentation is its Kafka producer's
runtime records/sec counter (producer.py:90-103, never published). This
is the engine-side answer: drive a file stream (the broker-less stand-in
the whole streaming test suite uses) through

  1. the idempotent landing leg (``ingest_store_stream`` — the
     consumer1/consumer2 analogue), and
  2. the stateful sliding-window alert leg (``streaming_window_alerts``
     — the spark-job1 shape as a continuous query),

with Trigger.AvailableNow and report sustained rows/sec. Input prefers
the K=25 scale-ladder rung (2.5M events) when /tmp/rtsm-scale/k25
exists — enough rows that trigger overhead amortizes — falling back to
sf0.1 (100k events, noted in the output).

Writes BENCH_STREAMING.json; not part of the driver's bench.py contract
(the stdout JSON line stays query-latency only).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark import (  # noqa: E402
    session,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.streaming import (  # noqa: E402
    jobs,
)

K25_EVENTS = "/tmp/rtsm-scale/k25/events.parquet"
SF01_EVENTS = os.path.join(
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), "events.parquet"
)


def main() -> None:
    spark = session.get_spark(app_name="rtsm-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    rungs = [SF01_EVENTS] + [
        r
        for r in ("/tmp/rtsm-scale/k5/events.parquet", K25_EVENTS)
        if os.path.isdir(r)
    ]
    all_results = []
    for src in rungs:
        if os.path.isfile(src):
            # The file streaming source needs a DIRECTORY; the raw
            # testdata tables are single parquet files — stage a copy.
            staged = tempfile.mkdtemp(prefix="rtsm-stream-src-")
            shutil.copy(src, os.path.join(staged, os.path.basename(src)))
            src = staged
        all_results.append(_bench_rung(spark, src))
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_STREAMING.json"
    )
    with open(out, "w") as f:
        json.dump({"rungs": all_results}, f, indent=1)
    print(json.dumps({"rungs": all_results}))
    spark.stop()


def _bench_rung(spark, src: str) -> dict:
    batch = spark.read.parquet(src)
    schema, n_rows = batch.schema, batch.count()
    n_files = len(batch.inputFiles())
    # ~8 micro-batches: enough triggers to measure steady-state, not so
    # many that per-trigger planning dominates.
    per_trigger = max(1, n_files // 8)

    def stream():
        from pyspark.sql import functions as F

        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(per_trigger))
            .parquet(src)
        )
        # Watermarks require TIMESTAMP (ltz); ladder/testdata files carry
        # NTZ — the same session-UTC cast the engine's load path applies.
        return s.withColumn("ts", F.col("ts").cast("timestamp"))

    results: dict[str, float | int | str] = {"source": src, "rows": n_rows}
    work = tempfile.mkdtemp(prefix="rtsm-stream-bench-")
    try:
        # Leg 1: idempotent landing (consumer analogue).
        t0 = time.perf_counter()
        q = (
            jobs.ingest_store_stream(
                stream(),
                os.path.join(work, "store"),
                os.path.join(work, "ckpt1"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        landed = spark.read.parquet(os.path.join(work, "store")).count()
        assert landed == n_rows, (landed, n_rows)
        results["ingest_wall_s"] = round(wall, 2)
        results["ingest_rows_per_sec"] = int(n_rows / wall)

        # Leg 2: stateful sliding-window alerts (spark-job1 shape).
        t0 = time.perf_counter()
        q = (
            jobs.streaming_window_alerts(
                stream(), value_col="value", entity_col="user_id"
            )
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(work, "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        results["window_wall_s"] = round(wall, 2)
        results["window_rows_per_sec"] = int(n_rows / wall)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return results


if __name__ == "__main__":
    main()
