"""Pre-flight plan safety guard: fail fast on plans that won't scale.

``plan_report`` (plans.inspect) measures; this module ENFORCES. Call
:func:`assert_scale_safe` on any DataFrame before submitting it as a
production job — it inspects the physical plan (pre-execution, no job
runs) and raises :class:`ScaleSafetyError` on the anti-patterns that are
invisible at test scale and catastrophic at 100 TB:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: O(N*M) pair
  generation. Fine for a 20-row dim at sf0.001; a cluster-killer on two
  fact tables. (The engine's own intentional cross products — brute-force
  exactness anchors, 1-row scalar broadcasts — opt in explicitly.)
- missing predicate pushdown: a filter the caller EXPECTS to prune the
  scan (``require_pushed``) that never reached ``PushedFilters`` reads
  the whole table to drop most of it.
- exchange budget: more shuffles than the caller's stated budget
  (``max_exchanges``) — catches a plan regression that silently adds a
  repartition or loses a bucketed-join elision.

This is the CI/pre-deploy mirror of tests/test_plans.py: those pin the
engine's own queries; this guards user-authored plans at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .inspect import formatted_plan, plan_report


class ScaleSafetyError(RuntimeError):
    """A physical plan failed a scale-safety assertion."""


def assert_scale_safe(
    df: DataFrame,
    allow_nested_loop: bool = False,
    require_pushed: list[str] | None = None,
    max_exchanges: int | None = None,
) -> dict:
    """Validate ``df``'s physical plan; return the plan report on success.

    ``require_pushed``: column names that must each appear in some pushed
    filter at a scan. ``max_exchanges``: upper bound on Exchange nodes.
    Raises :class:`ScaleSafetyError` with the offending report (and a
    plan excerpt for nested loops) on violation.
    """
    import re

    report = plan_report(df)
    problems: list[str] = []
    if not allow_nested_loop and report["nested_loop_joins"]:
        problems.append(
            f"{report['nested_loop_joins']} CartesianProduct/BroadcastNestedLoopJoin "
            "node(s) — O(N*M) at scale; pass allow_nested_loop=True only for an "
            "intentional exactness anchor or scalar broadcast"
        )
    for col in require_pushed or []:
        # Whole-identifier match: a pushed filter on 'prev_value' must
        # NOT satisfy require_pushed=['value'].
        pat = re.compile(rf"(?<![A-Za-z0-9_]){re.escape(col)}(?![A-Za-z0-9_])")
        if not any(pat.search(f) for f in report["pushed_filters"]):
            problems.append(
                f"filter on {col!r} never reached the scan "
                f"(PushedFilters: {report['pushed_filters']}) — the whole table "
                "will be read"
            )
    if max_exchanges is not None and report["exchanges"] > max_exchanges:
        problems.append(
            f"{report['exchanges']} exchanges > budget {max_exchanges} — a shuffle "
            "crept into the plan"
        )
    if problems:
        excerpt = formatted_plan(df)[:1500]
        raise ScaleSafetyError(
            "plan fails scale-safety checks:\n- "
            + "\n- ".join(problems)
            + f"\n\nplan excerpt:\n{excerpt}"
        )
    return report
