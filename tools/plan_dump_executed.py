#!/usr/bin/env python
"""Dump the EXECUTED (post-AQE) plan for registry queries into plans/r16/.

`tools/plan_dump.py` dumps `.explain("formatted")` BEFORE execution — with
AQE on that is the initial plan (`isFinalPlan=false`), which cannot show
runtime artifacts like ReusedExchange, AQEShuffleRead coalescing, or
join-strategy switches (VERDICT r15 #2: the cosine_pairs_lsh exchange-reuse
claim needs the FINAL plan). This tool runs the query to completion via
`collect()` on the query's OWN QueryExecution (a noop write builds a
separate execution, which would not finalize the frame's plan), then prints
`explainString(formatted)` — now carrying `isFinalPlan=true` and every
runtime node.

Usage: python tools/plan_dump_executed.py <suffix> q1[,q2,...]
Writes plans/r16/<query>_executed_<suffix>.txt.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark import (  # noqa: E402
    session,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries import (  # noqa: E402
    all_queries,
)


def executed_plan_formatted(df) -> str:
    """Run df to completion and return the post-AQE formatted plan."""
    df.collect()
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = session.get_spark(app_name="rtsm-plan-dump-executed")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        text = (
            f"# {name} @ {sf_dir} — EXECUTED (post-AQE) plan\n\n"
            + executed_plan_formatted(df)
        )
        with open(os.path.join(out_dir, f"{name}_executed_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"{name}: executed plan dumped", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
