#!/usr/bin/env python
"""Dump `.explain("formatted")` for registry queries into plans/r16/.

Usage: python tools/plan_dump.py <suffix> [q1,q2,...]
Writes plans/r16/<query>_<suffix>.txt (suffix = before|after) with the
formatted physical plan plus the plans.inspect.plan_report summary line,
so optimization claims ("2 Exchange -> 1", "SortMergeJoin ->
BroadcastHashJoin") are checkable against committed files without a
Spark install. Default query set: the bench HEADLINE list.

NOTE: queries that execute inside their builder (rel_observe_metrics,
dedup_stream_store_recheck) return a local 1-row frame; their dumped
plan is the trivial LocalTableScan — the load-bearing internal plans
are census-guarded in tests instead (ADVICE r14 #3 pattern).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark import (  # noqa: E402
    session,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.plans.inspect import (  # noqa: E402
    formatted_plan,
    plan_report,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries import (  # noqa: E402
    all_queries,
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = session.get_spark(app_name="rtsm-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        report = plan_report(df)
        text = (
            f"# {name} @ {sf_dir} — plan_report: {json.dumps(report)}\n\n"
            + formatted_plan(df)
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"{name}: {json.dumps(report)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
