"""Parse `.explain("formatted")` output into checkable facts.

Works on the OPTIMIZED physical plan before execution (no job run), so
tests can assert plan shape cheaply. At 100 TB these properties are the
difference between a job that runs and one that doesn't:

- ``pushed_filters``: predicates that reached the parquet reader — rows
  never deserialized, row groups skipped via min/max stats.
- ``read_schema_columns``: column pruning — a 7-column scan for a
  2-column query pays 3.5x the I/O.
- ``count_exchanges``: every exchange is a full shuffle of its input;
  the dominant cost at scale.
- ``broadcast_join_count``: dim joins that avoid shuffling the fact side.
- ``codegen_stage_count``: fewer, wider WholeStageCodegen spans = less
  row materialization between operators.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `explain("formatted")` text (physical plan + operator details)."""
    qe = df._jdf.queryExecution()  # noqa: SLF001 — no public non-printing API
    jvm = df.sparkSession._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All predicates pushed into file scans (PushedFilters lines)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns each file scan actually reads (union over scans)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles + broadcasts) in the plan."""
    return len(re.findall(r"\bExchange\b|\(\d+\) Exchange", formatted_plan(df)))


def shuffle_exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges only (hashpartitioning/rangepartitioning/…),
    excluding broadcast exchanges which move only the small side."""
    plan = formatted_plan(df)
    total = len(re.findall(r"\(\d+\) Exchange\b", plan))
    return total


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))


def plan_report(df: DataFrame) -> dict:
    """One-call summary used by tests and by hand during tuning."""
    plan = formatted_plan(df)
    return {
        "pushed_filters": pushed_filters(df),
        "read_schema_columns": read_schema_columns(df),
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "nested_loop_joins": len(re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", plan)),
        "codegen_stages": codegen_stage_count(df),
        "python_stages": len(re.findall(r"ArrowEvalPython|BatchEvalPython|MapInPandas", plan)),
    }
