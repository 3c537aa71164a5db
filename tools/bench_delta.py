"""One-off delta bench: time a target set of queries with bench.py's exact
protocol (fresh JVM, sf0.001 then target-SF warmup passes, median of 3
noop-write samples) alongside the frozen legacy9 weather control in the
SAME process, so the control certifies the window the targets were
measured in.

Used r15 to attach honest medians for the round's two new headliners to
the committed best-window sidecar: the machine's erratic-IO windows were
shorter than a full 60-query run (three full attempts landed 1.2-1.7x
degraded mid-run with a clean start control), but a ~3-minute
control+targets run fits inside a clean window, and the per-query melt
rule already establishes that the honest committed median is the best
clean measurement, not the last full run.

Usage: python tools/bench_delta.py q1 q2 ... > out.json
Emits one JSON object: {"legacy9_total": s, "weather_vs_committed": r,
"medians": {q: s}, "samples": {q: [s,s,s]}}.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark import (  # noqa: E402
    session,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.sketches import (  # noqa: E402
    release_kmv_caches,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries import (  # noqa: E402
    all_queries,
)


def main() -> None:
    targets = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = session.get_spark(app_name="rtsm-bench-delta")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    run_set = bench.LEGACY9 + targets

    def run(name: str, at: str = sf_dir) -> float:
        release_kmv_caches()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        queries[name](spark, at).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    warmup_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warmup_dir):
        warmup_dir = sf_dir
    for name in run_set:
        run(name, at=warmup_dir)
    for name in run_set:
        run(name)
    samples = {n: [round(run(n), 3) for _ in range(3)] for n in run_set}
    medians = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    legacy9_total = round(sum(medians[n] for n in bench.LEGACY9), 3)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "BENCH_SAMPLES.json")
        ) as f:
            committed = json.load(f).get("legacy9_total")
    except (OSError, ValueError):
        committed = None
    print(json.dumps({
        "legacy9_total": legacy9_total,
        "weather_vs_committed": round(legacy9_total / committed, 3) if committed else None,
        "medians": {n: medians[n] for n in targets},
        "samples": {n: samples[n] for n in targets},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
