"""Numeric column helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def display_round(col: Column | str, scale: int = 2) -> Column:
    """Cross-engine-deterministic display rounding.

    ``F.round`` (reference F2, spark_job1.py:51-52) applies HALF_UP to the
    double's exact binary expansion; other engines (DuckDB et al.) round the
    shortest decimal representation, so values like 98.665 diverge at the
    last digit. ``floor(x * 10^s + 0.5) / 10^s`` is the same IEEE-754 op
    sequence in any engine, so results are bit-identical given identical
    inputs.

    Negative-value policy: the floor formula rounds ties toward +inf for
    negatives (-0.005 -> -0.0, not -0.01) — i.e. NOT symmetric HALF_UP.
    That asymmetry is part of this function's contract: callers that feed
    negatives (e.g. text_unigram_logprob's avg log-prob) rely on the
    oracle mirroring the EXACT op sequence ``floor(x*10^s + 0.5)/10^s``,
    which every oracle does. Do not "fix" either side to true HALF_UP for
    negatives alone — the hash checks would silently break.
    """
    factor = float(10**scale)
    return F.floor(F.col(col) * factor + F.lit(0.5)) / factor if isinstance(col, str) else (
        F.floor(col * factor + F.lit(0.5)) / factor
    )
