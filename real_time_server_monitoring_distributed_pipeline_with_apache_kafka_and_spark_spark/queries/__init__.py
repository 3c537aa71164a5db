"""Named query registry: one entry per implemented operator (SURVEY.md SS2).

Each domain module exports ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI SQL over the pre-registered
testdata views). Queries without an oracle entry are non-SQL-expressible and
get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import dedup, extras, monitoring, multimodal, relational, similarity, text

# Order is load-bearing: the correctness driver verifies the first ~50
# entries in registry iteration order (round 1 stopped at exactly 50, the
# boundary before text/multimodal — leaving those 9 queries driver-unproven).
# text/multimodal therefore run right after monitoring; relational's tail
# (trivial stock-SQL scalar functions, all driver-green in round 1) is what
# now falls outside the cap. Every query keeps local pytest oracle coverage.
_MODULES = (monitoring, text, multimodal, dedup, similarity, relational, extras)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
