"""Data-profiling / audit queries: column profiles and join-key skew
diagnostics over the TPC-H-ish testdata.

Oracle notes: every statistic is either integral (counts, cardinalities,
epoch microseconds), an exact decimal-sum mean cast to double at the end,
or a percentile whose interpolation formula is replicated op-for-op —
no order-dependent float accumulation anywhere, so both engines hash
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import profiling as ops
from ..sources import load_table

_NUM = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_STR = ["l_returnflag", "l_linestatus"]
_TS = ["l_shipdate"]


def rel_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass audit profile of 9 lineitem columns (see
    operators.profiling.profile_table for the plan-shape/scale story)."""
    li = load_table(spark, sf_dir, "lineitem")
    return ops.profile_table(li, numeric_cols=_NUM, string_cols=_STR, ts_cols=_TS)


_DRIFT_CUT = "1998-06-01"


def rel_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile drift between two lineitem snapshots (r14,
    SURVEY §5.10.11d): the early period (l_shipdate < 1998-06-01) as
    yesterday's committed snapshot, the late period as today's refresh —
    the before-commit audit of a scheduled ingest. One row per profiled
    column with both sides' counts/distincts/exact means, the relative
    mean shift, and the deterministic ``drifted`` verdict (see
    operators.profiling.profile_drift for the gate algebra and the
    partition-pruning scale story; each side's date filter pushes into
    its own scan). On this corpus the gates split genuinely: l_shipdate
    drifts by construction (disjoint ranges -> moved min/max text),
    l_quantity's mean shift crosses the 1% gate at sf0.01, the uniform
    columns hold steady."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import functions as F

    cut = F.lit(_DRIFT_CUT).cast("timestamp")
    return ops.profile_drift(
        li.filter(F.col("l_shipdate") < cut),
        li.filter(F.col("l_shipdate") >= cut),
        numeric_cols=_NUM,
        string_cols=_STR,
        ts_cols=_TS,
    )


def rel_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-per-key distribution for lineitem's join key ``l_orderkey`` —
    the measurement that sizes a salt factor (see operators.profiling)."""
    li = load_table(spark, sf_dir, "lineitem")
    return ops.key_skew_stats(li, "l_orderkey")


def rel_validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-expectations gate over the star schema: uniqueness, forward
    and reverse referential integrity, a derived-column invariant, a
    value range, and enum membership — one (constraint_name, n_violations,
    passed) row each, via operators.profiling.constraint_report.

    The reverse-coverage check ("every order has lineitems") FAILS on the
    testdata (257 childless orders at sf0.01) by design: a validator
    whose every row passes has not demonstrated it can detect anything.
    """
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")
    # Uniqueness as violating ROWS: keys seen more than once (each extra
    # occurrence is one violation), expressed as a groupBy — no self-join.
    dup_orders = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    checks = {
        "orders.o_orderkey unique": dup_orders,
        "orders.o_custkey in customer": orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
            "left_anti",
        ),
        "lineitem.l_orderkey in orders": li.join(
            orders, li.l_orderkey == orders.o_orderkey, "left_anti"
        ),
        "every order has lineitems": orders.join(
            li, orders.o_orderkey == li.l_orderkey, "left_anti"
        ),
        "documents.n_chars == length(text)": docs.filter(
            F.col("n_chars") != F.length("text")
        ),
        "lineitem.l_quantity in [1, 50]": li.filter(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
        ),
        "lineitem.l_returnflag in (A, N, R)": li.filter(
            ~F.col("l_returnflag").isin("A", "N", "R")
        ),
    }
    return ops.constraint_report(checks)


def rel_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure (GDPR-style) cascade audit: given a deletion set
    of customers (here: the BUILDING market segment), count what a
    cascading purge removes from each dependent table — the dry-run
    report a warehouse emits before destructive compliance jobs.

    Plan: each cascade level LEFT-joins the previous level's (unique)
    key set and counts matches as a conditional aggregate — one pass and
    ONE 4-column row per table, no scalar cross-joins (1-row crossJoins
    plan as BroadcastNestedLoopJoin and trip the blanket nested-loop
    guard for nothing). Deletion keys are primary keys, so the left
    joins cannot multiply rows; customer keys broadcast, the
    orders->lineitem level is AQE's choice. Nothing is rewritten here —
    pair with CDC tombstones (rel_cdc_merge) for the actual delete at
    scale.
    """
    from pyspark.sql import functions as F

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def level(name: str, flagged: DataFrame, flag) -> DataFrame:
        return flagged.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(flag).alias("n_purged"),
            (F.count(F.lit(1)) - F.count(flag)).alias("n_remaining"),
        )

    del_cust_keys = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("_dk")
    )
    orders_flagged = orders.join(
        F.broadcast(del_cust_keys), orders.o_custkey == F.col("_dk"), "left"
    )
    del_order_keys = orders_flagged.filter(F.col("_dk").isNotNull()).select(
        F.col("o_orderkey").alias("_ok")
    )
    li_flagged = li.join(del_order_keys, li.l_orderkey == F.col("_ok"), "left")
    return (
        level(
            "customer",
            customer,
            F.when(F.col("c_mktsegment") == "BUILDING", F.lit(1)),
        )
        .unionByName(level("orders", orders_flagged, F.col("_dk")))
        .unionByName(level("lineitem", li_flagged, F.col("_ok")))
    )


_CASCADE_SQL = """
WITH dc AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
do_ AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM dc)),
dl AS (SELECT 1 AS x FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM do_))
SELECT 'customer' AS table_name, (SELECT count(*) FROM customer) AS n_rows,
       (SELECT count(*) FROM dc) AS n_purged,
       (SELECT count(*) FROM customer) - (SELECT count(*) FROM dc) AS n_remaining
UNION ALL
SELECT 'orders', (SELECT count(*) FROM orders), (SELECT count(*) FROM do_),
       (SELECT count(*) FROM orders) - (SELECT count(*) FROM do_)
UNION ALL
SELECT 'lineitem', (SELECT count(*) FROM lineitem), (SELECT count(*) FROM dl),
       (SELECT count(*) FROM lineitem) - (SELECT count(*) FROM dl)
"""


def rel_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit over order totals — the
    classic fabricated-data smell test (organic multiplicative data
    follows log10(1+1/d); manufactured numbers usually don't). One
    scan + a 9-group aggregate; per-digit observed fraction is exact
    int/int division, the expected fraction and the chi-square
    contribution are floor-rounded to 9 decimals (JVM-vs-libm log10
    last-ulp policy, the text_tfidf precedent).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.numeric import display_round

    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(F.col("o_totalprice").cast("string"), 1, 1).cast("int")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    total = Window.partitionBy()
    frac = F.col("n_obs").cast("double") / F.sum("n_obs").over(total)
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    dev = frac - expected
    return counts.select(
        "digit",
        "n_obs",
        frac.alias("frac_obs"),
        display_round(expected, 9).alias("expected_frac"),
        display_round(dev * dev / expected, 9).alias("chi2_term"),
    )


_VALIDATE_SQL = """
SELECT 'orders.o_orderkey unique' AS constraint_name,
       CAST(count(*) AS BIGINT) AS n_violations, count(*) = 0 AS passed
FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
UNION ALL
SELECT 'orders.o_custkey in customer', CAST(count(*) AS BIGINT), count(*) = 0
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem.l_orderkey in orders', CAST(count(*) AS BIGINT), count(*) = 0
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'every order has lineitems', CAST(count(*) AS BIGINT), count(*) = 0
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
UNION ALL
SELECT 'documents.n_chars == length(text)', CAST(count(*) AS BIGINT), count(*) = 0
FROM documents WHERE n_chars <> length(text)
UNION ALL
SELECT 'lineitem.l_quantity in [1, 50]', CAST(count(*) AS BIGINT), count(*) = 0
FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
UNION ALL
SELECT 'lineitem.l_returnflag in (A, N, R)', CAST(count(*) AS BIGINT), count(*) = 0
FROM lineitem WHERE l_returnflag NOT IN ('A', 'N', 'R')
"""


def _profile_col_sql(col: str, kind: str) -> str:
    nn = f"count(*) - count({col})"
    nd = f"count(DISTINCT {col})"
    if kind == "num":
        mean = f"CAST(sum(CAST({col} AS DECIMAL(38,6))) AS DOUBLE) / count({col})"
        mn, mx = f"CAST(min({col}) AS DOUBLE)", f"CAST(max({col}) AS DOUBLE)"
        mnt = mxt = "CAST(NULL AS VARCHAR)"
    elif kind == "ts":
        mn = mx = mean = "CAST(NULL AS DOUBLE)"
        mnt = f"strftime(min({col}), '%Y-%m-%d %H:%M:%S.%f')"
        mxt = f"strftime(max({col}), '%Y-%m-%d %H:%M:%S.%f')"
    else:
        mn = mx = mean = "CAST(NULL AS DOUBLE)"
        mnt, mxt = f"min({col})", f"max({col})"
    return (
        f"SELECT '{col}' AS col_name, count(*) AS n_rows, {nn} AS n_nulls,"
        f" {nd} AS n_distinct, {mn} AS min_value, {mx} AS max_value,"
        f" {mean} AS mean_value, {mnt} AS min_text, {mxt} AS max_text FROM lineitem"
    )


_PROFILE_SQL = "\nUNION ALL\n".join(
    [_profile_col_sql(c, "num") for c in _NUM]
    + [_profile_col_sql(c, "ts") for c in _TS]
    + [_profile_col_sql(c, "str") for c in _STR]
)


def _drift_side_sql(col: str, kind: str, where: str) -> str:
    """One snapshot side of the drift oracle — the _profile_col_sql
    shape restricted to the drift-relevant stats, with the snapshot
    filter (both engines push it into their scan)."""
    nn = f"count(*) - count({col})"
    nd = f"count(DISTINCT {col})"
    if kind == "num":
        mean = f"CAST(sum(CAST({col} AS DECIMAL(38,6))) AS DOUBLE) / count({col})"
        mnt = mxt = "CAST(NULL AS VARCHAR)"
    elif kind == "ts":
        mean = "CAST(NULL AS DOUBLE)"
        mnt = f"strftime(min({col}), '%Y-%m-%d %H:%M:%S.%f')"
        mxt = f"strftime(max({col}), '%Y-%m-%d %H:%M:%S.%f')"
    else:
        mean = "CAST(NULL AS DOUBLE)"
        mnt, mxt = f"min({col})", f"max({col})"
    return (
        f"SELECT '{col}' AS col_name, count(*) AS n_rows, {nn} AS n_nulls,"
        f" {nd} AS n_distinct, {mean} AS mean_value, {mnt} AS min_text,"
        f" {mxt} AS max_text FROM lineitem WHERE {where}"
    )


def _drift_sql() -> str:
    cols = [(c, "num") for c in _NUM] + [(c, "ts") for c in _TS] + [(c, "str") for c in _STR]
    where_a = f"l_shipdate < TIMESTAMP '{_DRIFT_CUT}'"
    where_b = f"l_shipdate >= TIMESTAMP '{_DRIFT_CUT}'"
    a = "\nUNION ALL\n".join(_drift_side_sql(c, k, where_a) for c, k in cols)
    b = "\nUNION ALL\n".join(_drift_side_sql(c, k, where_b) for c, k in cols)
    shift = "abs(b.mean_value - a.mean_value) / nullif(abs(a.mean_value), 0)"
    dratio = "CAST(b.n_distinct AS DOUBLE) / nullif(CAST(a.n_distinct AS DOUBLE), 0)"
    return f"""
WITH a AS (
{a}
),
b AS (
{b}
)
SELECT a.col_name,
  a.n_rows AS n_rows_a, b.n_rows AS n_rows_b,
  a.n_nulls AS n_nulls_a, b.n_nulls AS n_nulls_b,
  a.n_distinct AS n_distinct_a, b.n_distinct AS n_distinct_b,
  a.mean_value AS mean_a, b.mean_value AS mean_b,
  {shift} AS mean_rel_shift,
  (a.n_rows = 0) <> (b.n_rows = 0)
    OR coalesce({shift} > 0.01, FALSE)
    OR coalesce(a.mean_value = 0 AND b.mean_value <> 0, FALSE)
    OR coalesce(abs(CAST(b.n_nulls AS DOUBLE) / nullif(b.n_rows, 0)
                    - CAST(a.n_nulls AS DOUBLE) / nullif(a.n_rows, 0)) > 0.001, FALSE)
    OR coalesce({dratio} < 0.5 OR {dratio} > 2.0, FALSE)
    OR coalesce(a.min_text <> b.min_text, FALSE)
    OR coalesce(a.max_text <> b.max_text, FALSE) AS drifted
FROM a JOIN b USING (col_name)
"""

# The histogram-derived interpolated percentile matches quantile_cont's
# definition; the oracle replays the IDENTICAL op sequence
# (rn = q*(n-1); (crn-rn)*x[frn] + (rn-frn)*x[crn]) over the same
# histogram rather than calling quantile_cont, so the doubles agree
# bit-for-bit by construction, not by coincidence of two implementations.
_SKEW_SQL = """
WITH per_key AS (
  SELECT l_orderkey, count(*) AS value FROM lineitem GROUP BY l_orderkey
),
hist AS (
  SELECT value, count(*) AS cnt FROM per_key GROUP BY value
),
cum AS (
  SELECT value, cnt,
         sum(cnt) OVER (ORDER BY value) AS cum_end,
         sum(cnt) OVER (ORDER BY value) - cnt AS cum_start,
         sum(cnt) OVER () AS n
  FROM hist
),
q AS (
  SELECT n AS n_keys,
         sum(value * cnt) AS n_rows,
         max(value) AS max_rows_per_key,
         {p50} AS p50_rows_per_key,
         {p90} AS p90_rows_per_key,
         {p99} AS p99_rows_per_key
  FROM cum GROUP BY n
)
SELECT CAST(n_keys AS BIGINT) AS n_keys, CAST(n_rows AS BIGINT) AS n_rows,
       max_rows_per_key,
       CAST(n_rows AS DOUBLE) / n_keys AS mean_rows_per_key,
       p50_rows_per_key, p90_rows_per_key, p99_rows_per_key,
       max_rows_per_key / (CAST(n_rows AS DOUBLE) / n_keys) AS skew_ratio
FROM q
"""


def _skew_pct_sql(q: float) -> str:
    rn = f"({q} * CAST(n - 1 AS DOUBLE))"
    at = "min(CASE WHEN cum_start <= {i} AND {i} < cum_end THEN value END)"
    at_f, at_c = at.format(i=f"floor({rn})"), at.format(i=f"ceil({rn})")
    return (
        f"CASE WHEN floor({rn}) = ceil({rn}) THEN CAST({at_f} AS DOUBLE)"
        f" ELSE (ceil({rn}) - {rn}) * {at_f} + ({rn} - floor({rn})) * {at_c} END"
    )


QUERIES = {
    "rel_profile_columns": rel_profile_columns,
    "rel_key_skew_stats": rel_key_skew_stats,
    "rel_validate_constraints": rel_validate_constraints,
    "rel_cascade_delete": rel_cascade_delete,
    "rel_benford_check": rel_benford_check,
}

_BENFORD_SQL = """
WITH d AS (
  SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
),
c AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit)
SELECT digit, n_obs,
       CAST(n_obs AS DOUBLE) / sum(n_obs) OVER () AS frac_obs,
       floor(log10(1.0 + 1.0 / digit) * 1e9 + 0.5) / 1e9 AS expected_frac,
       floor((CAST(n_obs AS DOUBLE) / sum(n_obs) OVER () - log10(1.0 + 1.0 / digit))
             * (CAST(n_obs AS DOUBLE) / sum(n_obs) OVER () - log10(1.0 + 1.0 / digit))
             / log10(1.0 + 1.0 / digit) * 1e9 + 0.5) / 1e9 AS chi2_term
FROM c
"""

QUERIES["rel_profile_drift"] = rel_profile_drift

ORACLES = {
    "rel_profile_columns": _PROFILE_SQL,
    "rel_profile_drift": _drift_sql(),
    "rel_benford_check": _BENFORD_SQL,
    "rel_validate_constraints": _VALIDATE_SQL,
    "rel_cascade_delete": _CASCADE_SQL,
    "rel_key_skew_stats": _SKEW_SQL.format(
        p50=_skew_pct_sql(0.5), p90=_skew_pct_sql(0.9), p99=_skew_pct_sql(0.99)
    ),
}
