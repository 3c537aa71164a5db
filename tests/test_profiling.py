"""Unit tests for the audit/profiling operators (column profiles,
join-key skew diagnostics). Oracle parity at sf0.01 is covered by
test_oracle_parity; these pin operator-level invariants on controlled
inputs — null accounting, the HLL scale path, and the histogram-derived
percentile math against Spark's own sort-based aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.profiling import (
    key_skew_stats,
    profile_table,
)


def _profile_rows(df, **kw):
    return {r.col_name: r for r in profile_table(df, **kw).collect()}


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 4.0, None), (4, 4.0, "b")],
        "k long, x double, s string",
    )
    rows = _profile_rows(df, numeric_cols=["k", "x"], string_cols=["s"])
    k, x, s = rows["k"], rows["x"], rows["s"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (4, 0, 4)
    assert (k.min_value, k.max_value, k.mean_value) == (1.0, 4.0, 2.5)
    assert k.min_text is None and k.max_text is None
    # Nulls excluded from distinct/mean; counted in n_nulls.
    assert (x.n_nulls, x.n_distinct) == (1, 2)
    assert x.mean_value == (2.0 + 4.0 + 4.0) / 3
    assert (s.n_nulls, s.n_distinct, s.min_text, s.max_text) == (1, 2, "a", "b")
    assert s.min_value is None and s.mean_value is None


def test_profile_approx_distinct_scale_path(spark):
    """exact_distinct=False swaps count(DISTINCT) for HLL sketches: same
    schema, no Expand in the plan, cardinalities within HLL tolerance."""
    df = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") % 100).cast("double").alias("x")
    )
    prof = profile_table(df, numeric_cols=["k", "x"], exact_distinct=False)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    rows = {r.col_name: r for r in prof.collect()}
    assert abs(rows["k"].n_distinct - 5000) / 5000 < 0.1
    assert abs(rows["x"].n_distinct - 100) / 100 < 0.1
    # Exact statistics are unaffected by the sketch swap.
    assert rows["k"].n_nulls == 0 and rows["k"].mean_value == 2499.5


def test_profile_exact_plan_has_two_scans(spark, tmp_path):
    """Two aggregation passes (non-distinct stats; distinct counts) =
    exactly two file scans, regardless of how many columns are
    profiled — never a per-column pass."""
    p = str(tmp_path / "t.parquet")
    spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b"), F.lit("x").alias("s")
    ).write.parquet(p)
    df = spark.read.parquet(p)
    plan = (
        profile_table(df, numeric_cols=["a", "b"], string_cols=["s"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 2


def test_key_skew_percentiles_match_sort_based_aggregate(spark):
    """The histogram-derived interpolated percentile must equal Spark's
    own sort-based F.percentile over the per-key counts — same continuous
    quantile definition, different (scalable) evaluation strategy."""
    # Skewed key space: key 0 hot, long tail.
    df = spark.range(20000).select(
        F.when(F.col("id") < 5000, 0).otherwise((F.col("id") % 997)).alias("k")
    )
    got = key_skew_stats(df, "k").collect()[0]
    per_key = df.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    want = per_key.agg(
        F.percentile("c", 0.5).alias("p50"),
        F.percentile("c", 0.9).alias("p90"),
        F.percentile("c", 0.99).alias("p99"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("mx"),
    ).collect()[0]
    assert got.n_keys == want.n_keys
    assert got.max_rows_per_key == want.mx
    assert got.p50_rows_per_key == want.p50
    assert got.p90_rows_per_key == want.p90
    assert got.p99_rows_per_key == want.p99
    assert got.n_rows == 20000
    # The hot key dominates: diagnostic flags heavy skew.
    assert got.skew_ratio > 100


def test_key_skew_uniform_ratio_near_one(spark):
    df = spark.range(10000).select((F.col("id") % 100).alias("k"))
    got = key_skew_stats(df, "k").collect()[0]
    assert got.n_keys == 100 and got.max_rows_per_key == 100
    assert got.skew_ratio == 1.0
    assert got.p50_rows_per_key == 100.0


def test_constraint_report_counts_and_verdicts(spark):
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.profiling import (
        constraint_report,
    )

    df = spark.createDataFrame([(1, 10), (2, 10), (3, -1)], "k long, v long")
    rep = {
        r.constraint_name: r
        for r in constraint_report(
            {
                "v non-negative": df.filter(F.col("v") < 0),
                "k unique": df.groupBy("k").count().filter(F.col("count") > 1),
            }
        ).collect()
    }
    assert rep["v non-negative"].n_violations == 1
    assert rep["v non-negative"].passed is False
    assert rep["k unique"].n_violations == 0
    assert rep["k unique"].passed is True


def test_observe_metrics_query_rides_one_pass(spark):
    """r14 (VERDICT r13 #2b): rel_observe_metrics exercises Dataset
    .observe as a registry query. Pins: (1) the builder's observed plan
    carries a CollectMetrics node (the accumulator path, not a second
    scan), (2) every observed value equals independent re-aggregation,
    (3) the report's revenue/n_orders sections reconcile with the
    observed totals (sum of per-status == observed corpus-wide)."""
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries.relational import (
        rel_observe_metrics,
    )
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.sources import (
        load_table,
    )
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.streaming.metrics import (
        observed,
    )

    sf = "/root/testdata/sf0.001"
    out = rel_observe_metrics(spark, sf).collect()
    got = {(r.section, r.key): r.value for r in out}

    orders = load_table(spark, sf, "orders")
    n = orders.count()
    assert got[("observed", "n_rows")] == float(n)
    assert got[("observed", "n_urgent")] == float(
        orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    )
    assert got[("observed", "n_null_custkey")] == float(
        orders.filter(F.col("o_custkey").isNull()).count()
    )
    assert got[("observed", "n_bad_status")] == float(
        orders.filter(~F.col("o_orderstatus").isin("O", "F", "P")).count()
    )
    # Per-status sections reconcile with the corpus-wide observed rows.
    assert sum(v for (s, _), v in got.items() if s == "n_orders") == float(n)
    rev_sum = sum(v for (s, _), v in got.items() if s == "revenue")
    assert abs(rev_sum - got[("observed", "sum_total")]) < 1e-6

    # The accumulator path: the observed frame's plan carries
    # CollectMetrics — the metrics ride the query's own pass.
    src, obs = observed(orders, "dq", {"n_rows": F.count(F.lit(1))})
    plan = src._jdf.queryExecution().analyzed().toString()
    assert "CollectMetrics" in plan
    src.count()
    assert dict(obs.get)["n_rows"] == n

    # ADVICE r14 #3: the registry-visible frame is the bounded local
    # report, so the registry-wide guard sweep only ever inspects a
    # trivial plan. Run the shipped guard against the REAL observed agg
    # the builder executes — a nested loop or a Python stage creeping
    # into the corpus-width pass must fail HERE, not stay invisible.
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.plans.guard import (
        assert_scale_safe,
    )
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries.relational import (
        observe_metrics_plan,
    )

    agg, _ = observe_metrics_plan(spark, sf)
    report = assert_scale_safe(agg, max_exchanges=1)
    assert report["exchanges"] == 1, report  # the one groupBy shuffle
    assert report["python_stages"] == 0, report


def test_profile_drift_gates_and_symmetry(spark):
    """r14 (SURVEY 5.10.11d): the snapshot-drift audit. Pins: (1) a
    hand-built pair of frames trips each gate exactly where designed —
    mean shift, distinct-ratio blowout, moved text range — and nowhere
    else; (2) identical snapshots drift nowhere; (3) the registry query
    at sf0.001 flags l_shipdate (disjoint ranges by construction) and
    leaves the uniform enum columns steady."""
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.profiling import (
        profile_drift,
    )
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries.profiling import (
        rel_profile_drift,
    )

    a = spark.createDataFrame(
        [(float(i % 10), i % 5, "x") for i in range(100)],
        "m double, d long, s string",
    )
    # m: mean 4.5 -> 5.4 (20% shift, trips the 1% gate); d: 5 -> 20
    # distinct values (ratio 4.0, outside [0.5, 2]); s: 'x' -> 'x'
    # everywhere except max moves to 'y' (text-range gate).
    b = spark.createDataFrame(
        [(float(i % 10) + 0.9, i % 20, "y" if i == 0 else "x") for i in range(100)],
        "m double, d long, s string",
    )
    got = {
        r.col_name: r
        for r in profile_drift(a, b, numeric_cols=["m", "d"], string_cols=["s"]).collect()
    }
    assert got["m"].drifted is True and abs(got["m"].mean_rel_shift - 0.2) < 1e-12
    assert got["d"].drifted is True  # distinct 5 -> 20
    assert got["s"].drifted is True  # max_text x -> y
    same = {
        r.col_name: r.drifted
        for r in profile_drift(a, a, numeric_cols=["m", "d"], string_cols=["s"]).collect()
    }
    assert same == {"m": False, "d": False, "s": False}

    # r14 review edges: (a) a mean moving off exactly zero is drift even
    # though the RELATIVE shift is undefined; (b) an empty refresh side
    # (the failed-ingest case) must not raise under ANSI division and
    # must come back drifted=False booleans, never NULL.
    za = spark.createDataFrame([(0.0, 1), (0.0, 2)], "m double, d long")
    zb = spark.createDataFrame([(5.0, 1), (45.0, 2)], "m double, d long")
    zg = {r.col_name: r for r in profile_drift(za, zb, numeric_cols=["m", "d"]).collect()}
    assert zg["m"].drifted is True and zg["m"].mean_rel_shift is None
    empty = spark.createDataFrame([], "m double, d long, s string")
    eg = {
        r.col_name: r.drifted
        for r in profile_drift(a, empty, numeric_cols=["m", "d"], string_cols=["s"]).collect()
    }
    # An empty refresh IS drift (every distinct count collapses to 0,
    # outside the band) — the point is it must be a real True boolean,
    # reached without an ANSI divide-by-zero raise, never a NULL verdict.
    assert eg == {"m": True, "d": True, "s": True}
    # ... and so is an empty BASELINE (follow-up review: every
    # NULL-coalescing gate goes False in that direction — the explicit
    # one-side-empty gate is what flags it), while two empty sides are
    # no data, not drift.
    rg = {
        r.col_name: r.drifted
        for r in profile_drift(empty, a, numeric_cols=["m", "d"], string_cols=["s"]).collect()
    }
    assert rg == {"m": True, "d": True, "s": True}
    bg = {
        r.col_name: r.drifted
        for r in profile_drift(empty, empty, numeric_cols=["m", "d"], string_cols=["s"]).collect()
    }
    assert bg == {"m": False, "d": False, "s": False}

    reg = {r.col_name: r for r in rel_profile_drift(spark, "/root/testdata/sf0.001").collect()}
    assert len(reg) == 9
    assert reg["l_shipdate"].drifted is True
    assert reg["l_returnflag"].drifted is False and reg["l_linestatus"].drifted is False
    assert reg["l_tax"].drifted is False
    # both snapshots are non-trivial
    assert all(r.n_rows_a > 0 and r.n_rows_b > 0 for r in reg.values())
