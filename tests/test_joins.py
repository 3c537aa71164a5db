"""Unit tests for the as-of and salted join operators."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.joins import (
    asof_join,
    salted_join,
)


def _ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


def md5_h60(key: str) -> int:
    """Pure-Python twin of operators.sketches.kmv_hash (first 15 md5 hex
    nibbles = 60 bits) — the load-bearing width contract shared by every
    KMV replay test; keep ONE copy (follow-up review: three verbatim
    copies had accumulated)."""
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts(10), 1.0),   # matches right@10 (<= includes equal ts)
            ("a", _ts(15), 2.0),   # matches right@10 (latest <= 15)
            ("a", _ts(30), 3.0),   # matches right@25
            ("b", _ts(5), 4.0),    # no right row at or before => NULL
            ("c", _ts(50), 5.0),   # key absent on right => NULL
        ],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [("a", _ts(10), 100.0), ("a", _ts(25), 200.0), ("b", _ts(8), 300.0)],
        ["k", "ts", "rv"],
    )
    out = {
        (r.k, r.ts.second): (r.lv, r.rv_right, r.ts_right.second if r.ts_right else None)
        for r in asof_join(left, right, key_cols=["k"]).collect()
    }
    assert out == {
        ("a", 10): (1.0, 100.0, 10),
        ("a", 15): (2.0, 100.0, 10),
        ("a", 30): (3.0, 200.0, 25),
        ("b", 5): (4.0, None, None),
        ("c", 50): (5.0, None, None),
    }


def test_asof_join_null_right_value_stays_consistent(spark):
    """Right columns are carried as one struct: a NULL value column in the
    matched right row must surface as NULL (from THAT row), never stitched
    from an earlier right row."""
    left = spark.createDataFrame([("a", _ts(30), 1.0)], ["k", "ts", "lv"])
    right = spark.createDataFrame(
        [("a", _ts(10), 100.0, 7.0), ("a", _ts(20), None, 9.0)],
        ["k", "ts", "rv", "rw"],
    )
    row = asof_join(left, right, key_cols=["k"]).collect()[0]
    # latest right row <= 30 is ts=20 => rv NULL (not 100.0 from ts=10)
    assert row.ts_right.second == 20
    assert row.rv_right is None
    assert row.rw_right == 9.0


def test_bucketed_range_join_rejects_outer(spark):
    import pytest

    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.joins import (
        bucketed_range_join,
    )

    probe = spark.createDataFrame([(1.0,)], ["x"])
    build = spark.createDataFrame([(0.0, 2.0)], ["lo", "hi"])
    with pytest.raises(ValueError, match="inner"):
        bucketed_range_join(probe, build, "x", "lo", "hi", 1.0, how="left_outer")


def test_salted_join_rejects_right_and_full_outer(spark):
    import pytest

    left = spark.createDataFrame([(1, 1.0)], ["k", "lv"])
    right = spark.createDataFrame([(1, "r")], ["k", "rv"])
    for bad in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="left-oriented"):
            salted_join(left, right, ["k"], how=bad)


def test_salted_join_left_outer_matches_plain(spark):
    left = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (99, 3.0)], ["k", "lv"]  # 99 unmatched
    )
    right = spark.createDataFrame([(1, "r1"), (2, "r2")], ["k", "rv"])
    plain = left.join(right, on=["k"], how="left_outer")
    salted = salted_join(left, right, ["k"], n_salts=4, how="left_outer")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain_join(spark):
    # skewed left: one hot key with most of the rows
    left = spark.createDataFrame(
        [(1, i * 1.0) for i in range(500)] + [(k, k * 10.0) for k in range(2, 20)],
        ["k", "lv"],
    )
    right = spark.createDataFrame([(k, f"r{k}") for k in range(0, 15)], ["k", "rv"])
    plain = left.join(right, on=["k"], how="inner")
    salted = salted_join(left, right, ["k"], n_salts=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # salt column must not leak
    assert salted.columns == plain.columns


def test_approx_distinct_error_bound(spark):
    """HLL++ estimate within 15% of exact at default rsd=0.05 (3x sigma —
    ~9.7% observed on the sf0.01 groups), the same band the r10
    accuracy-report query hash-checks in-query via hll_within_band. Also
    asserts the report's band booleans and exact leg."""
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries.relational import (
        rel_approx_distinct,
    )
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.sources import (
        load_table,
    )

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    approx = {
        r.o_orderpriority: r.est
        for r in orders.groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey").alias("est"))
        .collect()
    }
    report = {
        r.o_orderpriority: r
        for r in rel_approx_distinct(spark, "/root/testdata/sf0.01").collect()
    }
    assert set(approx) == set(report)
    for k, est in approx.items():
        exact = report[k].exact_customers
        assert abs(est - exact) / exact < 0.15, (k, est, exact)
        assert report[k].hll_within_band is True


def test_approx_percentile_error_bound(spark):
    """Sketch percentiles within 1% relative of the exact sort-based ones
    at accuracy=10000 (bound is 1/accuracy on rank, looser on value) —
    the tight empirical pin behind the r10 rank-contract report query,
    whose in-query rank_ok_* booleans are asserted too."""
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries.relational import (
        _APPROX_PCT_ACC,
        _APPROX_PCT_QS,
        rel_approx_percentile,
        rel_percentile,
    )
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.sources import (
        load_table,
    )

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    approx = {
        r.o_orderpriority: (r.p25, r.p50, r.p75)
        for r in orders.groupBy("o_orderpriority")
        .agg(
            *[
                F.approx_percentile(
                    "o_totalprice", F.lit(q), F.lit(_APPROX_PCT_ACC)
                ).alias(f"p{int(q*100)}")
                for q in _APPROX_PCT_QS
            ]
        )
        .collect()
    }
    exact = {
        r.o_orderpriority: (r.p25, r.p50, r.p75)
        for r in rel_percentile(spark, "/root/testdata/sf0.01").collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / abs(e) < 0.01, (k, a, e)
    for r in rel_approx_percentile(spark, "/root/testdata/sf0.01").collect():
        assert r.rank_ok_p25 and r.rank_ok_p50 and r.rank_ok_p75, r


def test_interval_event_join_boundaries_and_bucket_crossing(spark):
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.joins import (
        interval_event_join,
    )

    base = datetime(2024, 1, 1, 0, 0, 0)

    def ts(sec):
        return datetime.fromtimestamp(base.timestamp() + sec)

    left = spark.createDataFrame(
        [(1, 100, ts(0)), (1, 101, ts(3599)), (2, 102, ts(0))],
        "user_id long, click_id long, click_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 200, ts(0)),      # == click_ts: excluded (strict lower bound)
            (1, 201, ts(1)),      # in window of 100
            (1, 202, ts(3600)),   # == 100 + 1h exactly: included (closed upper);
                                  # also in 101's window, CROSSES 101's hour bucket
            (1, 203, ts(7199)),   # == 101(3599) + 1h exactly: included, and
                                  # TWO buckets away from 101's (hour 0 vs hour 1)
                                  # is impossible — it sits in hour bucket 1,
                                  # adjacent to 101's bucket 0
            (2, 204, ts(10)),     # other key
            (3, 205, ts(10)),     # unmatched key
        ],
        "user_id long, error_id long, error_ts timestamp",
    )
    got = sorted(
        (r.click_id, r.error_id)
        for r in interval_event_join(
            left, right, ["user_id"], "click_ts", "error_ts", 3600
        ).collect()
    )
    assert got == [(100, 201), (100, 202), (101, 202), (101, 203), (102, 204)]


def test_interval_event_join_matches_naive_theta(spark):
    """Bucketing must be a pure optimization: pair set identical to the
    naive key-join + range-filter on dense random-ish data."""
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.joins import (
        interval_event_join,
    )

    left = spark.range(300).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").alias("lid"),
        F.timestamp_seconds(F.lit(1704067200) + (F.col("id") * 37) % 5000).alias("lts"),
    )
    right = spark.range(400).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").alias("rid"),
        F.timestamp_seconds(F.lit(1704067200) + (F.col("id") * 53) % 5000).alias("rts"),
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_event_join(left, right, ["k"], "lts", "rts", 600).collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in left.join(right, "k")
        .filter(
            (F.col("rts") > F.col("lts"))
            & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 600 SECOND"))
        )
        .collect()
    )
    assert got == naive and len(got) > 1000


def test_hll_daily_sketch_union_accuracy(spark):
    """Mergeable HLL sketches: per-day estimates and the unioned 'ALL'
    estimate must sit within the default-lgK HLL error band of the exact
    counts, and the union must never exceed the sum of its parts."""
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries.relational import (
        rel_hll_daily_users,
    )
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.sources import (
        load_table,
    )

    sf = "/root/testdata/sf0.01"
    events = load_table(spark, sf, "events")
    daily = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    got = {
        r.day: r.est
        for r in daily.select(
            "day", F.hll_sketch_estimate("sk").alias("est")
        ).collect()
    }
    got["ALL"] = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0].est
    exact_all = events.select("user_id").distinct().count()
    exact_daily = {
        r.day: r.n
        for r in events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert abs(got["ALL"] - exact_all) / exact_all < 0.05
    for day, n in exact_daily.items():
        assert abs(got[day] - n) / n < 0.05, (day, got[day], n)
    assert got["ALL"] <= sum(v for d, v in got.items() if d != "ALL")
    # the r10 accuracy-report query's own surface: exact legs + band flags
    report = {r.day: r for r in rel_hll_daily_users(spark, sf).collect()}
    assert report["ALL"].exact_users == exact_all
    for day, n in exact_daily.items():
        assert report[day].exact_users == n
    assert all(r.hll_within_band for r in report.values())


def test_kmv_theta_sketch_setops_accuracy_and_exactness(spark):
    """r12: theta/KMV set algebra. On a synthetic pair of sets SMALLER
    than k, every estimate must be EXACT (the sketch is the set); on the
    real query at sf0.01 the estimates must sit inside generous KMV
    bands (rse ≈ 1/sqrt(k-2) ≈ 6.3% at k=256; intersection inherits
    union + Jaccard variance, checked at ~4x) and the exact companions
    must equal independently-computed truths."""
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.sketches import (
        kmv_setops,
    )
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries.relational import (
        rel_theta_sketch_setops,
    )

    a = spark.createDataFrame([(f"k{i}",) for i in range(40)], ["key"])
    b = spark.createDataFrame([(f"k{i}",) for i in range(25, 85)], ["key"])
    rep = {r.measure: r for r in kmv_setops(a, b, k=256, a_name="A", b_name="B").collect()}
    assert (rep["A"].est_distinct, rep["A"].exact_distinct) == (40.0, 40)
    assert (rep["B"].est_distinct, rep["B"].exact_distinct) == (60.0, 60)
    assert (rep["union"].est_distinct, rep["union"].exact_distinct) == (85.0, 85)
    # intersect est = (15/85)*85 — two IEEE ops, off by one ulp from 15.0
    # (identically in both engines; the oracle replays the same ops)
    assert abs(rep["intersect"].est_distinct - 15.0) < 1e-9
    assert rep["intersect"].exact_distinct == 15

    sf = "/root/testdata/sf0.01"
    got = {r.measure: r for r in rel_theta_sketch_setops(spark, sf).collect()}
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.sources import (
        load_table,
    )

    ev = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    key = F.concat(
        F.col("user_id").cast("string"),
        F.lit("_"),
        F.date_trunc("day", F.col("ts")).cast("long").cast("string"),
    )
    flags = ev.select("event_type", key.alias("key")).groupBy("key").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("a"),
        F.max((F.col("event_type") == "view").cast("int")).alias("b"),
    )
    truth = flags.agg(
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
        F.count(F.lit(1)).alias("nu"),
        F.sum(F.col("a") * F.col("b")).alias("ni"),
    ).collect()[0]
    assert got["click"].exact_distinct == truth.na
    assert got["view"].exact_distinct == truth.nb
    assert got["union"].exact_distinct == truth.nu
    assert got["intersect"].exact_distinct == truth.ni
    for m, band in [("click", 0.2), ("view", 0.2), ("union", 0.2), ("intersect", 0.3)]:
        r = got[m]
        assert abs(r.est_distinct - r.exact_distinct) <= band * r.exact_distinct, (
            m, r.est_distinct, r.exact_distinct)


def test_bloom_semi_join_has_no_false_negatives(spark):
    """The Bloom pre-filter may pass extra rows (false positives — the
    report counts them) but must NEVER drop a true match: the report's
    n_matched must equal the direct exact semi-join count computed with
    no filter in the plan. This is the property the one-row report
    cannot show about itself."""
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries.relational import (
        rel_bloom_semi_join,
    )
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.sources import (
        load_table,
    )

    sf = "/root/testdata/sf0.01"
    rep = rel_bloom_semi_join(spark, sf).collect()[0]
    dim = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    direct = load_table(spark, sf, "orders").join(dim, "o_custkey", "semi").count()
    assert rep.n_matched == direct
    assert rep.n_bloom_pass == rep.n_matched + rep.n_false_positives
    assert rep.n_bloom_pass <= rep.n_orders


def test_kmv_rollup_merge_equals_direct_and_mixes_branches(spark):
    """r13 (VERDICT r12 #3a): the mergeable-KMV rollup. Three pins:

    1. MERGE PROPERTY — the total-level estimate, built by merging leaf
       sketches twice (leaf -> group -> total), must EQUAL the sketch
       built directly from the distinct key set (independent Python md5
       replay): top-k over child sketch unions IS the parent sketch.
    2. Sub-k groups degrade to exact (est == exact, double == long).
    3. On the registry query at sf0.01 BOTH estimator branches fire
       (some leaves sub-k exact, others k-th-minimum estimates), exact
       companions equal independent count-distincts, and estimates sit
       inside generous KMV bands.
    """
    import hashlib

    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.sketches import (
        kmv_rollup,
    )
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries.relational import (
        _KMV_ROLLUP_K,
        rel_sketch_rollup,
    )

    # Synthetic: 3 groups x 2 subgroups over 50 distinct keys, keys
    # shared across groups (non-additive rollup), k=8 so every level
    # estimates from the k-th minimum.
    rows = []
    for g in range(3):
        for sub in range(2):
            for i in range(30):
                rows.append((f"g{g}", f"s{sub}", f"key{i + 10 * g}"))
    df = spark.createDataFrame(rows, "g string, s string, key string")
    out = kmv_rollup(df, key_col="key", seg_cols=["g", "s"], k=8)
    got = {(r.level, r.g, r.s): r for r in out.collect()}

    # Exact legs against plain distinct counts.
    for (lvl, gv, sv), r in got.items():
        if lvl == "g,s":
            truth = df.filter((F.col("g") == gv) & (F.col("s") == sv))
        elif lvl == "g":
            truth = df.filter(F.col("g") == gv)
        else:
            truth = df
        assert r.exact_distinct == truth.select("key").distinct().count()

    # Merge property: total est == direct top-8 over the distinct key
    # set, replayed in pure Python md5 (independent of Spark).
    hs = sorted(md5_h60(key) for key in {r[2] for r in rows})
    expect_total = float(7 * (1 << 60)) / float(hs[7])
    assert got[("total", None, None)].est_distinct == expect_total

    # Sub-k degrade: make one leaf smaller than k and re-run.
    small = df.filter((F.col("g") == "g0") & (F.col("key").isin("key0", "key1")))
    out2 = {
        (r.level, r.g, r.s): r
        for r in kmv_rollup(small, "key", ["g", "s"], k=8).collect()
    }
    assert out2[("g,s", "g0", "s0")].est_distinct == 2.0
    assert out2[("g,s", "g0", "s0")].exact_distinct == 2

    # NULL-seg regression (ADVICE r13 #2): (NULL,'x') and ('x',NULL) are
    # DIFFERENT leaf groups — concat_ws skips NULLs, so before the \x00
    # rendering both collapsed to one join key and the est⋈exact combine
    # fanned out. Pin: one output row per group per level, each exact
    # count correct.
    nulled = spark.createDataFrame(
        [(None, "x", "a"), (None, "x", "b"), ("x", None, "a"), ("x", None, "c"), ("x", None, "d")],
        "g string, s string, key string",
    )
    out3 = kmv_rollup(nulled, "key", ["g", "s"], k=8)
    rows3 = out3.collect()
    assert len(rows3) == 2 + 2 + 1  # 2 leaves, 2 g-level groups, 1 total
    got3 = {(r.level, r.g, r.s): r for r in rows3}
    assert got3[("g,s", None, "x")].exact_distinct == 2
    assert got3[("g,s", "x", None)].exact_distinct == 3
    assert got3[("total", None, None)].exact_distinct == 4

    # NULL-KEY symmetry (ADVICE r15 #2): the est legs admit the NULL-key
    # sketch row (kmv_hash(NULL) = NULL ranks first under NULLS FIRST),
    # so the exact legs must count a NULL key as one distinct value too —
    # countDistinct alone would silently drop it and the two legs would
    # disagree on a nullable key_col. Pin est == exact on a sub-k group
    # holding {a, b, NULL}.
    nullkey = spark.createDataFrame(
        [("g0", "s0", "a"), ("g0", "s0", "b"), ("g0", "s0", None)],
        "g string, s string, key string",
    )
    out4 = {
        (r.level, r.g, r.s): r
        for r in kmv_rollup(nullkey, "key", ["g", "s"], k=8).collect()
    }
    assert out4[("g,s", "g0", "s0")].exact_distinct == 3
    assert out4[("g,s", "g0", "s0")].est_distinct == 3.0
    assert out4[("total", None, None)].exact_distinct == 3

    # Registry query: branch mix + band sanity at sf0.01.
    sf = "/root/testdata/sf0.01"
    reg = rel_sketch_rollup(spark, sf).collect()
    leaves = [r for r in reg if r.level == "event_type,day"]
    assert len(leaves) == 150 and sum(r.level == "event_type" for r in reg) == 5
    exact_path = [r for r in leaves if r.est_distinct == float(r.exact_distinct)]
    est_path = [r for r in leaves if r.est_distinct != float(r.exact_distinct)]
    assert exact_path and est_path, (
        "k=48 must split sf0.01 leaves (42-67 distinct users) across "
        "both estimator branches"
    )
    assert all(r.exact_distinct < _KMV_ROLLUP_K for r in exact_path)
    # Generous bands: rse ~ 1/sqrt(k-2) ~ 15%; 5x for leaf-sized sets.
    for r in reg:
        assert abs(r.est_distinct / r.exact_distinct - 1.0) < 0.75, (
            r.level, r.event_type, r.day, r.est_distinct, r.exact_distinct
        )


def test_kmv_setops_estimating_branch_matches_pure_python_replay(spark):
    """r14 hardening (the shared-construction standard): the r12 setops
    test pins sub-k exactness and band membership, but the ESTIMATING
    branch was only band-checked — and the DuckDB oracle replays the
    same formula, so a shared estimator bug would hash-agree. Replay
    the full k=16 sketch algebra in pure Python (hashlib md5, sorted
    heaps, the (k-1)*2^60/h_k estimator, Jaccard-over-union-sketch
    intersection) over sets well above k and demand BIT-EQUAL doubles
    for all four measures."""
    import hashlib

    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.sketches import (
        kmv_setops,
    )

    a_keys = {f"user{i}" for i in range(200)}
    b_keys = {f"user{i}" for i in range(125, 275)}  # 75-key overlap
    k = 16

    a = spark.createDataFrame([(x,) for x in a_keys], ["key"])
    b = spark.createDataFrame([(x,) for x in b_keys], ["key"])
    rep = {
        r.measure: r for r in kmv_setops(a, b, k=k, a_name="A", b_name="B").collect()
    }

    def sketch_est(keys: set[str]) -> float:
        heap = sorted((md5_h60(x), x) for x in keys)[:k]
        if len(heap) < k:
            return float(len(heap))
        return float((k - 1) * (1 << 60)) / float(heap[-1][0])

    union = a_keys | b_keys
    u_heap = sorted((md5_h60(x), x) for x in union)[:k]
    n_common = sum(1 for _, x in u_heap if x in a_keys and x in b_keys)
    est_union = sketch_est(union)
    est_intersect = (n_common / len(u_heap)) * est_union

    assert rep["A"].est_distinct == sketch_est(a_keys)
    assert rep["B"].est_distinct == sketch_est(b_keys)
    assert rep["union"].est_distinct == est_union
    assert rep["intersect"].est_distinct == est_intersect
    # exact companions against set arithmetic
    assert rep["A"].exact_distinct == 200
    assert rep["B"].exact_distinct == 150
    assert rep["union"].exact_distinct == len(union)
    assert rep["intersect"].exact_distinct == 75
    # the estimating branch genuinely fired (est != exact on every row)
    assert all(
        rep[m].est_distinct != float(rep[m].exact_distinct)
        for m in ("A", "B", "union")
    )
