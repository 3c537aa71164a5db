"""Data-profiling / audit operators: per-column statistics and join-key
skew diagnostics.

These are the queries a pipeline operator runs BEFORE committing a 100 TB
job: ``profile_table`` answers "what is actually in this table" (null
fractions, cardinalities, ranges — the schema-drift / data-quality audit),
and ``key_skew_stats`` answers "is this join/groupBy key safe to shuffle
on, and if not, what salt factor do I need" (the reference pipeline's
fixed entity keys make this decision implicitly; a general engine has to
measure it — compare operators.joins.salted_join, the remedy this
diagnostic sizes).

Scale notes are inline; the common theme is that both operators reduce the
input to a tiny summary on the executors — no driver-side collection, no
global sort of anything table-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Exact lattice for profile means: 6 fractional digits covers the
# testdata's 2-decimal money doubles and integer keys exactly; 32 integer
# digits make a planet-scale sum unoverflowable (ANSI-safe).
_MEAN_DEC = "decimal(38,6)"


_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def profile_table(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str] = (),
    ts_cols: list[str] = (),
    exact_distinct: bool = True,
) -> DataFrame:
    """Column profile: one output row per profiled column with
    ``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value,
    mean_value, min_text, max_text)``.

    Plan shape — TWO wide 1-row aggregates over the same scan, stacked to
    per-column rows and joined on col_name (a 9x9 broadcast join):

    1. all NON-distinct statistics (count/min/max/decimal sum) in one
       agg: every one is a DeclarativeAggregate, so the whole pass is a
       codegen'd HashAggregate with map-side partials — ~4 buffers per
       column;
    2. all ``count(DISTINCT c)`` in a second agg: Catalyst's multi-
       distinct Expand duplicates the scan once per column, but each
       expanded row carries ONLY its own column + gid, and the partial
       aggregate dedupes (gid, value) map-side.

    Keeping the two SEPARATE is load-bearing: fused, every non-distinct
    buffer rides through the xN Expand (or, in the unpivot formulation,
    through N-columns fat struct rows) — measured 13-19 s vs ~4 s at
    sf0.1 x 9 columns for the split plan. Two parquet scans cost far
    less than one such fused aggregate; at 100 TB both passes remain
    single map-side-partial aggregations with 9-row outputs.

    Numeric means are exact decimal(38,6) sums divided by non-null counts
    (order-independent => engine-portable, per the module float policy —
    exact for integers and the testdata's 2-decimal money doubles);
    timestamps are formatted to microsecond strings (timezone-free — the
    testdata is TIMESTAMP_NTZ, so epoch conversion would smuggle a
    session timezone in). Min/max of string/timestamp columns land in
    ``min_text``/``max_text``; numeric in ``min_value``/``max_value``;
    the other pair is NULL — one stable schema for all column types.

    ``exact_distinct=False`` swaps pass 2's exact counts for HLL sketches
    (``approx_count_distinct``): no Expand at all, bounded state at
    extreme cardinalities — the same accuracy/cost policy split as
    rel_percentile vs rel_approx_percentile.
    """
    cols = (
        [(c, "num") for c in numeric_cols]
        + [(c, "ts") for c in ts_cols]
        + [(c, "str") for c in string_cols]
    )
    # Pass 1: non-distinct statistics, one codegen'd wide aggregate.
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    groups: list[str] = []
    for col, kind in cols:
        c = F.col(col)
        aggs.append(F.count(c).alias(f"{col}__c"))
        if kind == "num":
            aggs += [
                F.min(c).cast("double").alias(f"{col}__mn"),
                F.max(c).cast("double").alias(f"{col}__mx"),
                F.sum(c.cast(_MEAN_DEC)).alias(f"{col}__s"),
            ]
            mn, mx = f"`{col}__mn`", f"`{col}__mx`"
            mean = f"CAST(`{col}__s` AS DOUBLE) / `{col}__c`"
            mnt = mxt = "CAST(NULL AS STRING)"
        else:
            if kind == "ts":
                lo = F.date_format(F.min(c), _TS_FMT)
                hi = F.date_format(F.max(c), _TS_FMT)
            else:
                lo, hi = F.min(c), F.max(c)
            aggs += [lo.alias(f"{col}__mnt"), hi.alias(f"{col}__mxt")]
            mn = mx = mean = "CAST(NULL AS DOUBLE)"
            mnt, mxt = f"`{col}__mnt`", f"`{col}__mxt`"
        groups.append(
            f"'{col}', n_rows, n_rows - `{col}__c`, {mn}, {mx}, {mean}, {mnt}, {mxt}"
        )
    stack = (
        "stack({n}, {groups}) AS (col_name, n_rows, n_nulls, min_value,"
        " max_value, mean_value, min_text, max_text)"
    ).format(n=len(groups), groups=", ".join(groups))
    stats = df.agg(*aggs).selectExpr(stack)

    # Pass 2: distinct cardinalities, one multi-distinct (or HLL) aggregate.
    nd = F.count_distinct if exact_distinct else F.approx_count_distinct
    nd_wide = df.agg(*[nd(F.col(col)).alias(f"{col}__nd") for col, _ in cols])
    nd_stack = "stack({n}, {groups}) AS (col_name, n_distinct)".format(
        n=len(cols), groups=", ".join(f"'{col}', `{col}__nd`" for col, _ in cols)
    )
    distincts = nd_wide.selectExpr(nd_stack)

    return stats.join(distincts, "col_name").select(
        "col_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_value",
        "max_value",
        "mean_value",
        "min_text",
        "max_text",
    )


def profile_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str] = (),
    ts_cols: list[str] = (),
    mean_tol: float = 0.01,
    null_tol: float = 0.001,
    distinct_band: tuple[float, float] = (0.5, 2.0),
) -> DataFrame:
    """Per-column profile DRIFT between two snapshots of one table (r14,
    SURVEY §5.10.11d — the audit every scheduled 100 TB ingest runs
    before committing a refresh: :func:`profile_table` answers "what is
    in this table", this answers "did today's data move"). One row per
    profiled column: both sides' row/null/distinct counts and exact
    decimal means, the relative mean shift, and a ``drifted`` verdict.

    The verdict is a disjunction of deterministic gates — relative mean
    shift > ``mean_tol``, null-rate delta > ``null_tol``, distinct-count
    ratio outside ``distinct_band``, or a moved min/max for
    string/timestamp columns (schema-drift's usual first symptom: a new
    enum value or a time-range jump). Every input to every gate is
    exact (counts; decimal(38,6) sums cast to double at the end), so
    both engines compute IDENTICAL doubles and the boolean cannot
    flicker; gates over a NULL leg (mean on a string column, text range
    on a numeric one) coalesce to False.

    Plan: one :func:`profile_table` per snapshot — each side's filter
    pushes into its own scan (at 100 TB with date-partitioned tables
    that is partition pruning: the audit reads only the two snapshots'
    files), each profile reduces to ~N-column 1-row aggregates with
    map-side partials, and the combine is a bounded N×N broadcast join.
    No corpus-width shuffle anywhere.
    """
    keep = [
        "n_rows", "n_nulls", "n_distinct", "mean_value", "min_text", "max_text"
    ]

    def side(df: DataFrame, suffix: str) -> DataFrame:
        prof = profile_table(df, numeric_cols, string_cols, ts_cols)
        return prof.select(
            "col_name", *[F.col(c).alias(f"{c}{suffix}") for c in keep]
        )

    j = side(df_a, "_a").join(F.broadcast(side(df_b, "_b")), "col_name")
    # Every division is NULL-guarded (nullif) rather than raw: under
    # ANSI mode a zero denominator RAISES, and an empty snapshot side
    # (the failed-ingest case this audit exists for) has n_rows = 0 —
    # the NULL leg then coalesces to False like every other gate
    # (r14 review: the null-rate gate was the one gate missing both).
    null_rate_a = F.col("n_nulls_a") / F.nullif(
        F.col("n_rows_a").cast("double"), F.lit(0.0)
    )
    null_rate_b = F.col("n_nulls_b") / F.nullif(
        F.col("n_rows_b").cast("double"), F.lit(0.0)
    )
    mean_rel_shift = F.abs(F.col("mean_value_b") - F.col("mean_value_a")) / F.nullif(
        F.abs(F.col("mean_value_a")), F.lit(0.0)
    )
    distinct_ratio = F.col("n_distinct_b").cast("double") / F.nullif(
        F.col("n_distinct_a").cast("double"), F.lit(0.0)
    )
    lo, hi = distinct_band
    drifted = (
        # Exactly ONE side empty is drift by definition, gated on the
        # never-NULL row counts (follow-up review: the NULL-coalescing
        # gates all go False when the BASELINE side is the empty one —
        # an audit against a failed/missing baseline must not silently
        # pass; both sides empty = no data = no drift).
        ((F.col("n_rows_a") == 0) != (F.col("n_rows_b") == 0))
        | F.coalesce(mean_rel_shift > F.lit(mean_tol), F.lit(False))
        # mean_a == 0 makes the RELATIVE shift undefined (NULL leg), so
        # a mean moving off exactly zero — the most dramatic possible
        # drift — needs its own gate (r14 review): exact double
        # comparison, deterministic in both engines.
        | F.coalesce(
            (F.col("mean_value_a") == F.lit(0.0))
            & (F.col("mean_value_b") != F.lit(0.0)),
            F.lit(False),
        )
        | F.coalesce(
            F.abs(null_rate_b - null_rate_a) > F.lit(null_tol), F.lit(False)
        )
        | F.coalesce(
            (distinct_ratio < F.lit(lo)) | (distinct_ratio > F.lit(hi)),
            F.lit(False),
        )
        | F.coalesce(F.col("min_text_a") != F.col("min_text_b"), F.lit(False))
        | F.coalesce(F.col("max_text_a") != F.col("max_text_b"), F.lit(False))
    )
    return j.select(
        "col_name",
        "n_rows_a", "n_rows_b",
        "n_nulls_a", "n_nulls_b",
        "n_distinct_a", "n_distinct_b",
        F.col("mean_value_a").alias("mean_a"),
        F.col("mean_value_b").alias("mean_b"),
        mean_rel_shift.alias("mean_rel_shift"),
        drifted.alias("drifted"),
    )


def _hist_percentile(q: float) -> Column:
    """Exact interpolated percentile derived from a (value, cnt, cum_start,
    cum_end, n) histogram: the aggregate-expression form of the standard
    continuous-quantile definition rn = q*(n-1) (0-indexed),
    value = (crn-rn)*x[frn] + (rn-frn)*x[crn].

    Works as plain conditional aggregates over the histogram rows — this is
    what makes the percentile SCALABLE: the sort-based ``F.percentile``
    aggregate buffers every value; here the only ordered structure is the
    histogram of distinct sizes (tiny by construction)."""
    rn = F.lit(q) * (F.col("n") - 1).cast("double")
    frn, crn = F.floor(rn), F.ceil(rn)
    at_f = F.min(F.when((F.col("cum_start") <= frn) & (frn < F.col("cum_end")), F.col("value")))
    at_c = F.min(F.when((F.col("cum_start") <= crn) & (crn < F.col("cum_end")), F.col("value")))
    return F.when(frn == crn, at_f.cast("double")).otherwise(
        (crn - rn) * at_f + (rn - frn) * at_c
    )


def key_skew_stats(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew diagnostic: one row summarizing the distribution of
    rows-per-key — ``(n_keys, n_rows, max_rows_per_key, mean_rows_per_key,
    p50/p90/p99 rows-per-key, skew_ratio = max/mean)``.

    ``skew_ratio >> 1`` means a plain shuffle join/groupBy on this key
    will straggle on the hot key's task; the remedy is salting
    (operators.joins.salted_join, salt factor ~ skew_ratio / target
    imbalance) or AQE skew-join splitting. This diagnostic is how you
    pick that number from data instead of folklore.

    Plan shape (all distributed, nothing table-sized leaves executors):
      1. per-key counts: hash aggregate (map-side partial);
      2. histogram of rows-per-key: second hash aggregate — at most as
         many rows as the LARGEST key's count (hundreds, even at 100 TB);
      3. exact interpolated percentiles + max/mean from the histogram via
         window cumsum + conditional aggregates.
    Step 3's single-partition window is over the tiny histogram only —
    the scalable exact alternative to a sort-based percentile over all
    |keys| per-key counts.
    """
    per_key = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("value"))
    hist = per_key.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist = (
        hist.withColumn("cum_end", F.sum("cnt").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("cnt"))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy()))
    )
    # Group by the (constant) total n so the percentile expressions can
    # reference it as a grouping column — one output row either way.
    return hist.groupBy("n").agg(
        F.sum(F.col("value") * F.col("cnt")).alias("n_rows"),
        F.max("value").alias("max_rows_per_key"),
        _hist_percentile(0.5).alias("p50_rows_per_key"),
        _hist_percentile(0.9).alias("p90_rows_per_key"),
        _hist_percentile(0.99).alias("p99_rows_per_key"),
    ).select(
        F.col("n").alias("n_keys"),
        "n_rows",
        "max_rows_per_key",
        (F.col("n_rows").cast("double") / F.col("n")).alias("mean_rows_per_key"),
        "p50_rows_per_key",
        "p90_rows_per_key",
        "p99_rows_per_key",
        (
            F.col("max_rows_per_key") / (F.col("n_rows").cast("double") / F.col("n"))
        ).alias("skew_ratio"),
    )


def constraint_report(checks: dict[str, DataFrame]) -> DataFrame:
    """Data-expectations runner: union per-constraint violation counts
    into one ``(constraint_name, n_violations, passed)`` report — the CI gate
    a pipeline runs before promoting a landed partition (uniqueness,
    referential integrity, ranges, enum membership...).

    Each value in ``checks`` is a DataFrame of VIOLATING rows (any
    schema); the report counts them. Violation sets are usually built as
    filters or anti-joins, so each check is a scan+agg or a broadcast
    anti-join — embarrassingly scalable, and a check that passes
    aggregates to a single zero without moving data. Checks execute as
    one unioned plan: Spark runs the branches in one job, sharing
    whatever scans Catalyst can dedupe.
    """
    reports = [
        df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("constraint_name"),
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        for name, df in checks.items()
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
