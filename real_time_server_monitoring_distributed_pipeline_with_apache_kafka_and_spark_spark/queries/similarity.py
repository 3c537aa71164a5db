"""Similarity-search queries over the ``embeddings`` table.

Output contract is rank-only (query_id, neighbor_id, rank) - cosine scores
stay internal, so last-ulp float differences can only matter where two
neighbors tie to ~1e-15, which the deterministic id tiebreak makes
unobservable in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as ops
from ..sources import load_table

N_QUERIES = 20
TOP_K = 5

# LSH oracle building blocks: the same seeded hyperplanes the operator
# ships as plan literals (seed 7, 12 tables x 6 planes, dim 64), inlined
# as SQL double literals (repr() round-trips float64 exactly). Sign-bit
# agreement between numpy and list_dot_product holds unless |dot| is at
# the ~1e-16 boundary, which the seeded testdata never hits (verified).
_LSH_TABLES, _LSH_PLANES_PER = 12, 6
_PLANES = ops._hyperplanes(_LSH_TABLES * _LSH_PLANES_PER, 64, seed=7)


def _bucket_sql(t: int) -> str:
    terms = []
    for j in range(_LSH_PLANES_PER):
        lit = "[" + ", ".join(repr(x) for x in _PLANES[t * _LSH_PLANES_PER + j]) + "]"
        terms.append(f"(CASE WHEN list_dot_product(v, {lit}) >= 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


_LSH_BANDS_SQL = "\n  UNION ALL ".join(
    f"SELECT vec_id, {t} AS table_idx, ({_bucket_sql(t)}) AS bucket FROM e"
    for t in range(_LSH_TABLES)
)

# IVF oracle building blocks: the deterministic Lloyd-step integer sums
# (floor(x*1e9 + 0.5) per dim) and the sum-vector reconstruction.
_IVF_CELLS, _IVF_PROBE, _IVF_SEED = 16, 4, 7
_IVF_SUMS = ",\n    ".join(
    f"sum(CAST(floor(c.v[{d + 1}] * 1e9 + 0.5) AS BIGINT)) AS d{d}" for d in range(64)
)
_IVF_SUM_VEC = "[" + ", ".join(f"CAST(m.d{d} AS DOUBLE)" for d in range(64)) + "]"


def _split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    return corpus, queries


def sim_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the first 20 vectors (brute force,
    broadcast query side, single corpus pass)."""
    corpus, queries = _split(spark, sf_dir)
    return ops.ann_topk(corpus, queries, k=TOP_K)


def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via multi-table random-hyperplane LSH (12 tables
    x 6 planes). Seeded-constant hyperplanes live in the plan as literals
    — and the SAME literals are inlined into the DuckDB oracle, which
    replays bucket assignment (sign bits), the per-table collision join,
    and the exact-cosine rank, so this approximate operator is still
    hash-checked end-to-end. Recall vs brute force additionally pinned in
    tests."""
    corpus, queries = _split(spark, sf_dir)
    return ops.ann_lsh_topk(corpus, queries, k=TOP_K)


def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via IVF coarse quantization (16 cells, probe 4,
    1 Lloyd refinement). The index build is bit-deterministic (md5-ordered
    init, integer-scaled Lloyd sums as unnormalized centroid directions),
    so the DuckDB oracle replays it: init sample, both assignment rounds,
    cell probing, and exact-cosine rerank — hash-checked. Recall vs brute
    force additionally pinned in tests."""
    corpus, queries = _split(spark, sf_dir)
    return ops.ann_ivf_topk(corpus, queries, k=TOP_K)


def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via IVF-PQ (16 coarse cells probe 4, 16x16
    seeded product-quantization codebooks, ADC scoring, exact re-rank of
    the ADC top-15) — the compressed ANN tier where candidates move as
    (id, cell, 16 codes) instead of 64 floats and ADC scoring is 16
    table lookups per pair. The full build + encode + probe + ADC rank +
    refine is bit-deterministic (shared IVF machinery + pinned-fold PQ
    distances + integer-micro ranking), so the DuckDB oracle replays it
    end-to-end — hash-checked like the other ANN tiers. Recall vs brute
    force additionally pinned in tests."""
    corpus, queries = _split(spark, sf_dir)
    return ops.ann_ivfpq_topk(corpus, queries, k=TOP_K)


def sim_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered ANN top-5: each query vector searches only the
    corpus vectors sharing its ``label`` (the vector-DB filtered-search
    primitive — tenant/language/category-scoped retrieval). PRE-filter
    strategy: label joins the LSH bucket keys, so the top-k ranks over
    the eligible set and selective filters shrink the candidate join
    rather than growing a post-filter miss rate. Same seeded hyperplanes
    as sim_ann_lsh, replayed by the oracle with the label equality added
    to the collision join — hash-checked end-to-end."""
    corpus, queries = _split(spark, sf_dir)
    return ops.ann_lsh_topk_filtered(corpus, queries, k=TOP_K, filter_keys=("label",))


_CENT_DIM = 64


def sim_source_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal curation query: join each document's metadata to its
    embedding (doc_id == vec_id), build per-SOURCE mean-vector centroids,
    and surface the 3 documents per source farthest (lowest cosine) from
    their own source's centroid — the embedding-space outliers that flag
    mislabeled/contaminated domain content before training.

    One metadata⋈vector equi-join, then TWO hash aggs' worth of work in
    one: the centroid is 64 per-dim sums on a floor(x*1e9+0.5) integer
    lattice (exact + order-independent at any parallelism, the
    sim_embedding_drift trick) collapsing map-side to |sources| rows;
    the centroid table joins back on source (NOT broadcast-forced —
    sources are a Heaps-like dimension at 100 TB, the r07 audit rule)
    and the fold-cosine + per-source rank window finish. Rank-only
    output per the module's float contract; every centroid component is
    (lattice_sum / n) / 1e9 in fixed op order, so the oracle replays
    the whole pipeline and the outlier sets hash-match."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    de = docs.join(emb, "doc_id")
    # One SQL parse per aggregate / one for the centroid array (r09
    # construction-cost fix, the drift_sum_exprs pattern): identical
    # lattice-sum and division ops, so the hash-pinned rows are unchanged.
    lat = [
        F.expr(
            f"sum(cast(floor(cast(embedding[{d}] as double) * 1e9 + 0.5) as bigint))"
        ).alias(f"s{d}")
        for d in range(_CENT_DIM)
    ]
    cent_arr = ", ".join(
        f"(cast(s{d} as double) / cast(n as double)) / 1e9" for d in range(_CENT_DIM)
    )
    cent = (
        de.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), *lat)
        .select("source", F.expr(f"array({cent_arr})").alias("centroid"))
    )
    scored = de.join(cent, "source").withColumn(
        "cos", ops.cosine(F.col("embedding"), F.col("centroid"))
    )
    w = Window.partitionBy("source").orderBy(F.col("cos").asc(), F.col("doc_id"))
    return (
        scored.withColumn("outlier_rank", F.row_number().over(w))
        .filter(F.col("outlier_rank") <= 3)
        .select("source", "doc_id", "outlier_rank")
    )


def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self kNN join over the whole embeddings table (top-5 neighbors per
    vector via LSH bucket candidates + exact fold-cosine ranking — see
    operators.similarity.knn_join). Rank-only output; the oracle replays
    the same seeded buckets, so the approximate neighbor set is still
    hash-checked exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    # occupancy-held bit width (resolves to the same 5 planes at every
    # oracle-checked SF; grows with log N beyond — the r08 ladder's
    # slope-0.69 fix, recall trade documented in the operator)
    return ops.knn_join(emb, k=TOP_K, hold_occupancy=True)


# k-means assignment-step building blocks: seeded centroid literals shared
# verbatim between the Spark plan and the SQL oracle (repr() round-trips
# float64 exactly, so both engines fold the same doubles).
_KMEANS_K, _KMEANS_SEED = 8, 23


def _kmeans_centroids(k: int = _KMEANS_K) -> list[list[float]]:
    """First ``k`` seeded centroids. Draws are SEQUENTIAL from one RNG,
    so _kmeans_centroids(k)[:8] == _kmeans_centroids(8) for any k >= 8 —
    callers that grow k with the corpus (dedup_semdedup) keep the exact
    oracle-pinned centroids at every gate SF where k resolves to 8."""
    import math
    import random

    rng = random.Random(_KMEANS_SEED)
    out = []
    for _ in range(k):
        v = [rng.gauss(0.0, 1.0) for _ in range(64)]
        # Unit-normalize before rounding: embeddings are ~unit-norm, so a
        # raw gauss centroid (norm ~8) would make ||c||^2 dominate the
        # argmin and collapse most clusters onto the smallest centroid.
        n = math.sqrt(sum(x * x for x in v))
        out.append([round(x / n, 3) for x in v])
    return out


def _kmeans_dists_col(vcol) -> F.Column:
    """Array of 8 squared-L2 distances to the seeded centroids, as pinned
    left-to-right Catalyst folds (see sim_kmeans_iter's float policy)."""
    dists = []
    for cent in _kmeans_centroids():
        carr = F.array(*[F.lit(x) for x in cent])
        dists.append(
            F.aggregate(
                F.zip_with(vcol, carr, lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda acc, e: acc + e,
            )
        )
    return F.array(*dists)


def _kmeans_dists_expr(vec_sql: str, centroids: list[list[float]]) -> F.Column:
    """SQL-parsed twin of _kmeans_dists_col — the SAME aggregate/zip_with
    folds, built as one parsed string instead of stacked Column calls
    (identical analyzed plan; the operators.similarity._pq_subdists_sql
    precedent, oracle-hash-proven there). Used where the centroid count
    is DATA-DERIVED: at k in the hundreds, k x 64 F.lit calls cost
    seconds of py4j round-trips per query construction."""
    dists = []
    for cent in centroids:
        # ops._double_sql asserts finiteness — a non-finite centroid
        # would otherwise emit 'infD'/'nanD' and fail the SQL parse far
        # from its source (ADVICE r08 #4)
        carr = "array(" + ", ".join(ops._double_sql(x) for x in cent) + ")"
        dists.append(
            f"aggregate(zip_with({vec_sql}, {carr}, (x, c) -> (x - c) * (x - c)),"
            " 0.0D, (acc, e) -> acc + e)"
        )
    return F.expr("array(" + ", ".join(dists) + ")")


def sim_kmeans_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means Lloyd ASSIGNMENT step over the embeddings: every
    vector assigned to its nearest of 8 fixed seeded centroids, reduced
    to per-cluster membership counts and within-cluster distance mass —
    the training iteration under every IVF index (sim_ann_ivf consumes
    exactly this step's output) and the partitioner under
    cluster-balanced corpus sampling.

    Plan: ZERO joins — the centroid matrix rides along as plan literals
    (the broadcast-variable analogue), each row evaluates 8 Catalyst
    zip_with/aggregate squared-L2 folds, and one 8-group hash agg
    finishes. Pure scan shape: at 100 TB this runs at full codegen scan
    speed with an 8-row exchange. Float policy: fold order is pinned
    left-to-right on both engines (identical per-row doubles), the
    argmin tie breaks to the lowest cluster, per-row distances are
    floor-lattice'd to integer micros and SUMMED AS INTEGERS, so the
    cross-row aggregation is order-independent and hash-exact.
    """
    from ..functions.numeric import display_round

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    darr = emb.select("vec_id", _kmeans_dists_col(F.col("v")).alias("_dists"))
    assigned = darr.select(
        "vec_id",
        (F.array_position(F.col("_dists"), F.array_min(F.col("_dists"))) - 1).alias(
            "cluster_id"
        ),
        F.floor(F.array_min(F.col("_dists")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("_micro"),
    )
    agg = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("_micro").alias("sum_dist_micro"),
    )
    return agg.select(
        "cluster_id",
        "n_members",
        "sum_dist_micro",
        display_round(
            F.col("sum_dist_micro").cast("double") / 1e6 / F.col("n_members"), 6
        ).alias("avg_dist"),
    )


_POWER_SEED, _POWER_ITERS, _DIM = 7, 3, 64


def _power_v0() -> list[float]:
    """Seeded start vector for the power iteration, unit-normalized and
    3-dec rounded so the literals round-trip exactly through repr()/SQL
    (same portability contract as _kmeans_centroids)."""
    import math
    import random

    rng = random.Random(_POWER_SEED)
    v = [rng.gauss(0.0, 1.0) for _ in range(_DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [round(x / n, 3) for x in v]


def sim_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POWER-ITERATION steps toward the corpus's top principal direction
    — the update inside the 'all-but-the-top' embedding post-processing
    [Mu & Viswanath 2018], which subtracts the dominant common direction
    of an embedding set to improve downstream similarity. Like
    sim_kmeans_iter (one Lloyd step) and text_bpe_train (three merges),
    the CONTRACT here is the unrolled iteration operator — three steps of
    v <- normalize(X'(X v)) — not a converged eigenvector: iterations to
    convergence scale with the spectral gap (log(eps)/log(l1/l2)), a data
    property, while this corpus is deliberately near-isotropic. Running
    more steps is the same plan repeated.

    An ITERATIVE algorithm as ONE declarative plan: each step = a full
    codegen scan computing s_i = <x_i, v> (pinned left-fold) + one
    64-column hash agg, with the 1-row result broadcast back via a cross
    join (the text_bpe_train pattern) — no driver round-trips, no
    .collect(), the whole thing optimizes and schedules as a single job.
    At 100 TB each iteration is a map-side-combined agg over 64 longs
    per partition, so step cost is one scan regardless of row count.
    (At toy SF, wall time is dominated by the three sequential broadcast
    barriers between steps — fixed driver latency, measured ~1.5 s/step
    against ~0.1 s of actual scan+agg; at scale the scans dominate and
    the barrier count stays constant.)

    Float policy: per-row contributions floor-latticed to integer MICROS
    and summed as int64 (order-independent, partition-invariant); the
    normalization runs on the exact integer sums in a pinned fold order,
    so every iterate — and the final loadings — is the identical double
    on any engine. Output: (dim, loading) x64, 6-dec display lattice.
    """
    from ..functions.numeric import display_round

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    w_df = spark.range(1).select(
        F.array(*[F.lit(x) for x in _power_v0()]).alias("w")
    )
    # Each iteration's 64 lattice aggregates and the iterate array
    # compile via one SQL parse apiece (r09 construction-cost fix, the
    # drift_sum_exprs pattern — the stacked-Column form built ~600 py4j
    # calls per step): operation-identical exprs, hash-pinned rows
    # unchanged.
    for _ in range(_POWER_ITERS):
        joined = emb.crossJoin(F.broadcast(w_df))
        s = F.aggregate(
            F.zip_with("v", "w", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )
        u_row = joined.select(s.alias("_s"), "v").agg(
            *[
                F.expr(
                    f"sum(cast(floor(element_at(v, {d + 1}) * _s * 1e6 + 0.5)"
                    " as bigint))"
                ).alias(f"u{d}")
                for d in range(_DIM)
            ]
        )
        all_u = ", ".join(f"u{d}" for d in range(_DIM))
        raw = F.expr(f"transform(array({all_u}), x -> cast(x as double) / 1e6)")
        w_df = u_row.select(raw.alias("_raw")).select(
            F.transform(
                "_raw",
                lambda x: x
                / F.sqrt(
                    F.aggregate(
                        F.transform("_raw", lambda y: y * y),
                        F.lit(0.0),
                        lambda acc, e: acc + e,
                    )
                ),
            ).alias("w")
        )
    return w_df.select(F.posexplode("w").alias("dim", "_loading")).select(
        F.col("dim").cast("int").alias("dim"),
        display_round(F.col("_loading"), 6).alias("loading"),
    )


def _recall_report(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """THE recall@k contract, defined once for every quality query
    (sim_ann_recall, sim_matryoshka_recall): mark the approximate leg's
    pairs, left-join onto the exact ground truth, count hits per query.
    A contract change (rounding scale, denominator, hit marking) lands
    in every recall report — and must land in the oracles' shared
    finishing SQL too (see _RECALL_FINISH_SQL)."""
    from ..functions.numeric import display_round

    marked = approx.select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    j = exact.join(marked, ["query_id", "neighbor_id"], "left")
    n_hits = F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
    return j.groupBy("query_id").agg(
        n_hits.alias("n_hits"),
        display_round(
            n_hits.cast("double") / F.lit(float(TOP_K)), 9
        ).alias("recall_at_k"),
    )


def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality as a first-class query: per-query recall@5 of the LSH
    tier against the exact brute-force neighbors — the measurement that
    decides whether an approximate index is allowed to serve (and the
    one every recall-vs-cost tuning loop reads). Output: one row per
    query vector with its hit count and recall fraction.

    Both legs reuse the proven operators (ann_topk / ann_lsh_topk); the
    oracle composes their two already-hash-checked SQL pipelines and
    intersects, so even the QUALITY REPORT is engine-reproducible —
    recall here is a fact, not a sample. Scale: both legs are bounded by
    the query-set size; the intersection join touches k rows per query.
    """
    corpus, queries = _split(spark, sf_dir)
    return _recall_report(
        ops.ann_topk(corpus, queries, k=TOP_K),
        ops.ann_lsh_topk(corpus, queries, k=TOP_K),
    )


def sim_ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of the COMPRESSED tier (IVF-PQ + refine)
    against exact brute force — the quality report that closes the ANN
    family: sim_ann_recall measures the LSH tier, this measures the
    16x-shuffle-width PQ tier, so the cost/recall frontier (LSH vs IVF
    vs IVF-PQ) is entirely hash-checked facts rather than samples. The
    measurement every FAISS-style rollout makes before swapping a
    serving index to compressed codes: refine=3 on this
    uniform-random corpus (the no-cluster adversarial case) sits near
    the documented ~0.6 band; clustered production embeddings sit far
    higher.

    Both legs reuse proven operators (ann_topk / ann_ivfpq_topk) and the
    shared _recall_report contract; the oracle composes the exact
    brute-force SQL with the IVF-PQ pipeline CTEs VERBATIM
    (_IVFPQ_CTES_SQL), so a drift in either leg is a hash mismatch.
    Scale: both legs bounded by the query-set size; the recall join
    touches k rows per query."""
    corpus, queries = _split(spark, sf_dir)
    return _recall_report(
        ops.ann_topk(corpus, queries, k=TOP_K),
        ops.ann_ivfpq_topk(corpus, queries, k=TOP_K),
    )


_MRL_DIM = 16


def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation quality [Kusupati et al. 2022]: per-query
    recall@5 of EXACT search over only the first 16 embedding dimensions
    against exact search over all 64 — the measurement behind the MRL
    serving trade (store/score a prefix of each vector, cut index bytes
    and FLOPs 4x, keep most of the quality). For MRL-trained embeddings
    the prefix recall stays high; for conventional embeddings (like this
    corpus's) it degrades — WHICH ONE you have is exactly what this
    query tells you before a truncation rollout.

    Both legs are the proven exact brute-force operator (ann_topk), the
    truncated leg over F.slice'd vectors — so the quality report is
    engine-reproducible, a fact not a sample (same design as
    sim_ann_recall: the oracle composes two already-hash-checked
    pipelines and intersects). Scale: both legs bounded by the query-set
    size; the truncated leg's pair scoring is dim/4 the FLOPs.
    """
    corpus, queries = _split(spark, sf_dir)

    def trunc(df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id", F.slice("embedding", 1, _MRL_DIM).alias("embedding")
        )

    return _recall_report(
        ops.ann_topk(corpus, queries, k=TOP_K),
        ops.ann_topk(trunc(corpus), trunc(queries), k=TOP_K),
    )


def sim_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift report between two corpus halves: split the
    vectors by deterministic md5 bucket (the stand-in for "last month's
    embeddings vs this month's"), compute each half's mean vector, and
    report cosine similarity, L2 distance, and max per-dimension drift of
    the two means — the cheap monitoring signal that an embedding model
    rev or a corpus-mix shift moved the space before retraining on it.

    Plan: ONE hash agg over the scan — 2 counts + 128 conditional
    per-dimension sums collapse map-side to a single row; the 64-dim
    mean/cosine/L2 arithmetic then runs once on that row. No joins, no
    window, no collect: at 100 TB this is a pure scan plus a 1-row
    exchange. Float policy (same lattice as sim_kmeans_iter): each
    component quantizes to integer tenth-micros BEFORE the cross-row
    sum, so accumulation is order-independent long addition; the
    per-dimension means and every downstream double op (left-assoc
    sums, IEEE sqrt) are the identical op sequence in the oracle.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return drift_report_from_sums(emb.agg(*drift_sum_exprs()))


_DRIFT_DIM = 64


def drift_sum_exprs(dim: int = _DRIFT_DIM) -> list:
    """The drift report's partial-aggregate stage: 2 half counts + 2*dim
    conditional per-dimension component sums, each lattice-quantized to
    integer tenth-micros BEFORE summing. All outputs are longs — a
    commutative monoid — so partials merge across partitions AND across
    micro-batches by plain addition (the streaming twin's contract,
    streaming/jobs.py::drift_ingest_stream).

    Each aggregate compiles via ONE SQL parse (r09): the stacked-Column
    form built ~900 py4j calls and measured 4.2 s of pure query
    CONSTRUCTION per run — the sim_ann_ivfpq lesson, third instance.
    The parsed expressions are operation-identical (md5-bucket
    predicate, floor-lattice, conditional long sums), so every value —
    and the streaming twin's stream==batch pin — is unchanged.
    """
    # hash_bucket_100's SQL twin (operators/text.py:227)
    ref = (
        "pmod(cast(conv(substring(md5(cast(vec_id as string)), 1, 8), 16, 10)"
        " as bigint), 100) < 50"
    )
    aggs = [
        F.expr(f"sum(cast(({ref}) as bigint))").alias("n_ref"),
        F.expr(f"sum(cast((not ({ref})) as bigint))").alias("n_cur"),
    ]
    for i in range(dim):
        qi = f"cast(floor(cast(embedding[{i}] as double) * 1e7 + 0.5) as bigint)"
        aggs.append(
            F.expr(f"sum(case when {ref} then {qi} else 0 end)").alias(f"r{i}")
        )
        aggs.append(
            F.expr(f"sum(case when not ({ref}) then {qi} else 0 end)").alias(f"c{i}")
        )
    return aggs


def drift_report_from_sums(s: DataFrame, dim: int = _DRIFT_DIM) -> DataFrame:
    """Finish the drift report from a 1-row sums frame (the output of
    ``df.agg(*drift_sum_exprs())`` or the merged streaming store): the
    64-dim mean/cosine/L2 arithmetic, every double op in a pinned
    left-assoc order so the SQL oracle replays it bitwise. Compiled via
    three SQL parses instead of ~1,000 stacked Column calls (r09, same
    construction-cost fix as drift_sum_exprs; SQL ``+`` chains are
    left-associative, so the fold order — and every bit — is unchanged).
    """
    from ..functions.numeric import display_round

    mr = [f"((cast(r{i} as double) / 1e7) / n_ref)" for i in range(dim)]
    mc = [f"((cast(c{i} as double) / 1e7) / n_cur)" for i in range(dim)]
    dot = " + ".join(f"{mr[i]} * {mc[i]}" for i in range(dim))
    nr = " + ".join(f"{mr[i]} * {mr[i]}" for i in range(dim))
    nc = " + ".join(f"{mc[i]} * {mc[i]}" for i in range(dim))
    l2 = " + ".join(f"({mr[i]} - {mc[i]}) * ({mr[i]} - {mc[i]})" for i in range(dim))
    mx = ", ".join(f"abs({mr[i]} - {mc[i]})" for i in range(dim))
    return s.select(
        "n_ref",
        "n_cur",
        display_round(F.expr(f"({dot}) / (sqrt({nr}) * sqrt({nc}))"), 9).alias(
            "mean_cosine"
        ),
        display_round(F.expr(f"sqrt({l2})"), 9).alias("mean_l2"),
        display_round(F.expr(f"greatest({mx})"), 9).alias("max_dim_drift"),
    )


def _drift_oracle() -> str:
    dim = 64
    parts = [
        "sum(CASE WHEN half THEN 1 ELSE 0 END) AS n_ref",
        "sum(CASE WHEN NOT half THEN 1 ELSE 0 END) AS n_cur",
    ]
    for i in range(dim):
        qi = f"CAST(floor(CAST(e[{i + 1}] AS DOUBLE) * 1e7 + 0.5) AS BIGINT)"
        parts.append(f"sum(CASE WHEN half THEN {qi} ELSE 0 END) AS r{i}")
        parts.append(f"sum(CASE WHEN NOT half THEN {qi} ELSE 0 END) AS c{i}")
    mr = [f"((CAST(r{i} AS DOUBLE) / 1e7) / n_ref)" for i in range(dim)]
    mc = [f"((CAST(c{i} AS DOUBLE) / 1e7) / n_cur)" for i in range(dim)]
    dot = " + ".join(f"{mr[i]} * {mc[i]}" for i in range(dim))
    nr = " + ".join(f"{mr[i]} * {mr[i]}" for i in range(dim))
    nc = " + ".join(f"{mc[i]} * {mc[i]}" for i in range(dim))
    l2 = " + ".join(f"({mr[i]} - {mc[i]}) * ({mr[i]} - {mc[i]})" for i in range(dim))
    mx = ", ".join(f"abs({mr[i]} - {mc[i]})" for i in range(dim))
    return f"""
WITH h AS (
  SELECT (CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 100) < 50 AS half,
         embedding AS e
  FROM embeddings
),
s AS (SELECT {", ".join(parts)} FROM h)
SELECT CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
  floor(({dot}) / (sqrt({nr}) * sqrt({nc})) * 1e9 + 0.5) / 1e9 AS mean_cosine,
  floor(sqrt({l2}) * 1e9 + 0.5) / 1e9 AS mean_l2,
  floor(greatest({mx}) * 1e9 + 0.5) / 1e9 AS max_dim_drift
FROM s
"""


def pipeline_embedding_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-side training prep as ONE query — the vector mirror of
    queries.dedup.pipeline_training_prep, four chained curation
    decisions under a single oracle: SemDeDup semantic dedup (LSH cosine
    pair graph closed by connected components, keep the min-id
    representative per cluster) -> k-means cluster assignment (the 8
    seeded centroids) -> cluster-balanced cap (at most 40 vectors per
    cluster by salted md5 rank — the diversity-preserving downsample) ->
    deterministic train/val/test hash split. Output: (split, cluster_id,
    n_vectors) — the shard manifest a contrastive/embedding training run
    starts from.

    Scale shape: the LSH band equi-join + exact verify for candidates
    (never all-pairs), pointer-doubling components, zero-join centroid
    literals, one ranking window per cluster, md5 split — every stage is
    hash-exact, so the composite hash-checks end-to-end.
    """
    from pyspark.sql.window import Window

    from ..operators.dedup import connected_components
    from ..operators.similarity import cosine_pairs_lsh
    from ..operators.text import hash_bucket_100
    from .dedup import COSINE_LSH_THRESHOLD

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_pairs_lsh(
        emb,
        threshold=COSINE_LSH_THRESHOLD,
        planes_per_table=3,
        n_tables=16,
        # occupancy-held bit width: resolves to 3 planes at every
        # oracle-checked SF (hash-pinned results unchanged); grows with
        # log(N) beyond so the candidate join stays bucket-bounded (the
        # r08 ladder's slope-1.16 finding) — recall trade documented in
        # the operator
        hold_occupancy=True,
        # Bounded-output mode (VERDICT r10 #1): the r08/r10 guardrail now
        # ACTS. The 0.45 threshold sits ~3.6 sigma above this corpus's
        # random-cosine floor, so beyond ~the K=5 ladder rung the pair
        # graph — and the SemDeDup keep-list built from it — would be
        # dominated by chance crossings, growing N^2 in any engine. Once
        # expected chance pairs exceed 0.5/doc the threshold auto-raises
        # to the deterministic 6-sigma point (0.75 here) and buckets
        # tighten, returning output and cost to ~linear. Inert (and
        # warning-only) at every oracle-checked SF: sf0.01 carries
        # ~0.04 and sf0.1 ~0.16 expected chance pairs per doc — the
        # hash-pinned manifest is unchanged.
        bound_noise_floor=True,
    )
    clusters = connected_components(
        pairs.select("a_id", "b_id"), emb.select("vec_id"), id_col="vec_id"
    )
    keepers = clusters.filter(F.col("cluster_id") == F.col("vec_id")).select("vec_id")
    kept = emb.join(keepers, "vec_id").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    darr = kept.select("vec_id", _kmeans_dists_col(F.col("v")).alias("_dists"))
    assigned = darr.select(
        "vec_id",
        (F.array_position(F.col("_dists"), F.array_min(F.col("_dists"))) - 1).alias(
            "cluster_id"
        ),
    )
    h = F.md5(F.concat(F.col("vec_id").cast("string"), F.lit("#embprep")))
    w = Window.partitionBy("cluster_id").orderBy(h, "vec_id")
    capped = assigned.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= 40
    )
    bucket = hash_bucket_100(F.col("vec_id"))
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        capped.select(split.alias("split"), "cluster_id")
        .groupBy("split", "cluster_id")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def _kmeans_dist_sql(cent: list[float]) -> str:
    clit = "[" + ", ".join(repr(x) for x in cent) + "]"
    return (
        f"list_reduce(list_transform(range(1, 65), i -> (v[i] - {clit}[i]) * (v[i] - {clit}[i])), "
        "(a, b) -> a + b)"
    )


_KMEANS_DISTS_SQL = "[" + ",\n    ".join(
    _kmeans_dist_sql(c) for c in _kmeans_centroids()
) + "]"


# IVF-PQ oracle building blocks: the seeded codebooks inlined as SQL
# literals, per-subspace pinned-fold distance lists, argmin codes, and
# the per-query ADC lookup table — the same op sequences the Spark plan
# folds, so every double agrees bitwise.
_PQ_M, _PQ_CODES, _PQ_SUB, _PQ_SEED, _PQ_REFINE = 16, 16, 4, 11, 3
_PQ_BOOKS = ops.pq_codebooks(_PQ_M, _PQ_CODES, 64, seed=_PQ_SEED)


def _pq_dists_sql(m: int) -> str:
    """SQL list of squared-L2 dists from subspace m's sub-vector to each
    sub-centroid (list_reduce left-fold == the Spark 0.0-init fold)."""
    o = m * _PQ_SUB
    items = []
    for cent in _PQ_BOOKS[m]:
        clit = "[" + ", ".join(repr(x) for x in cent) + "]"
        items.append(
            f"list_reduce(list_transform(range(1, {_PQ_SUB + 1}), "
            f"i -> (v[{o} + i] - {clit}[i]) * (v[{o} + i] - {clit}[i])), (a, b) -> a + b)"
        )
    return "[" + ",\n      ".join(items) + "]"


_PQ_CODES_SQL = "[" + ", ".join(
    f"CAST(list_position(pd{m}, list_aggregate(pd{m}, 'min')) - 1 AS INTEGER)"
    for m in range(_PQ_M)
) + "]"
_PQ_DLISTS_SQL = ",\n    ".join(f"{_pq_dists_sql(m)} AS pd{m}" for m in range(_PQ_M))
_PQ_LUT_SQL = "[" + ", ".join(f"pd{m}" for m in range(_PQ_M)) + "]"



def sim_cosine_noise_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-pair cosine noise floor — the measurement to run BEFORE
    choosing a near-dup threshold. The r08 scale ladder proved why it
    matters: at dim=64 the random cosine has sd ~ 1/sqrt(64) = 0.125, so
    a 0.45 threshold sits only ~3.6 sigma out and C(N,2)*tail pairs
    cross it BY CHANCE — dedup output (and therefore cost, in any
    engine) goes quadratic (measured: 143/3,256/49,474 verified pairs at
    N = 2k/10k/50k, SCALING.md). This query estimates the floor from a
    fixed-size deterministic pair sample: md5-bucket every vector into
    1024 buckets and pair each bucket's min-id with its max-id — ~1024
    pairs at ANY corpus size, so the estimator costs one O(N) scan +
    one 1024-group agg + two broadcast-pair lookups, never a pair join.

    Output (one row): n_pairs, mean_cos, sd_cos, sigma_gap (how many
    sigmas the 0.45 near-dup threshold clears the floor), and
    n_above_threshold in the sample. Float policy: per-pair fold cosine
    is floor-latticed to integer tenth-micros; all stats derive from
    exact integer sums through a fixed double op sequence, so the row
    hash-checks."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(1024),
    )
    pairs = (
        emb.select(bucket.alias("bk"), "vec_id")
        .groupBy("bk")
        .agg(F.min("vec_id").alias("a_id"), F.max("vec_id").alias("b_id"))
        .filter(F.col("a_id") < F.col("b_id"))
    )
    va = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"))
    vb = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"))
    cos = ops.dot_product(F.col("va"), F.col("vb")) / (
        ops.norm2(F.col("va")) * ops.norm2(F.col("vb"))
    )
    scored = (
        pairs.join(va, "a_id")
        .join(vb, "b_id")
        .select(F.floor(cos * 1e7 + F.lit(0.5)).cast("long").alias("c7"))
    )
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c7").alias("s1"),
        F.sum(F.col("c7") * F.col("c7")).alias("s2"),
        F.sum(F.when(F.col("c7") >= 4500000, 1).otherwise(0)).alias("n_above"),
    )
    nd = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    mean = s1d / (nd * F.lit(1e7))
    sd = F.sqrt((nd * s2d - s1d * s1d) / (nd * nd * F.lit(1e14)))
    return agg.select(
        F.col("n").alias("n_pairs"),
        mean.alias("mean_cos"),
        sd.alias("sd_cos"),
        # sd is exactly 0 when every sampled pair lattices to the same
        # c7 (degenerate/tiny corpus with few multi-member buckets):
        # nullif turns the would-be NaN/Inf into NULL, mirrored in the
        # DuckDB oracle (ADVICE r08 #3)
        ((F.lit(0.45) - mean) / F.nullif(sd, F.lit(0.0))).alias("sigma_gap"),
        F.col("n_above").alias("n_above_threshold"),
    )


_MMR_CANDS, _MMR_K, _MMR_WREL, _MMR_WDIV = 25, 5, 3, 2


def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 for the first 20 query vectors: 25 exact
    candidates per query, then the Carbonell-Goldstein greedy with
    integer weights 3/2 (lambda = 0.6) on latticed cosines — the
    retrieval-diversification stage the ANN family lacked (every prior
    sim query returns raw nearest neighbors; RAG serving dedups them).
    See operators.similarity.mmr_rerank for the two-stage shape, the
    100 TB posture (per-group work is bounded; candidate fetch is the
    ANN tier's), and the integer-lattice determinism contract the
    unrolled DuckDB oracle replays."""
    corpus, queries = _split(spark, sf_dir)
    return ops.mmr_rerank(
        corpus,
        queries,
        n_candidates=_MMR_CANDS,
        k=_MMR_K,
        w_rel=_MMR_WREL,
        w_div=_MMR_WDIV,
    )


def sim_mmr_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInArrow`` twin of sim_mmr_rerank (r13, SURVEY §5.10a —
    the last census-visible-but-unexercised Python-stage node): the
    identical broadcast candidate scan and the identical k-round integer
    greedy, but the grouped tail runs as FlatMapGroupsInArrow over raw
    ``pyarrow.Table``s instead of FlatMapGroupsInPandas — no pandas
    materialization on either side of the exchange, the grouped analogue
    of the ``mm_ahash_arrow``/``mapInArrow`` twin. Both legs call the
    shared ``_mmr_greedy_core`` (operators.similarity), are pinned
    output-identical by test, and replay the SAME unrolled DuckDB
    oracle; the applyInPandas leg stays the production default."""
    corpus, queries = _split(spark, sf_dir)
    return ops.mmr_rerank(
        corpus,
        queries,
        n_candidates=_MMR_CANDS,
        k=_MMR_K,
        w_rel=_MMR_WREL,
        w_div=_MMR_WDIV,
        arrow_tail=True,
    )


def _mmr_oracle(
    n_cands: int = _MMR_CANDS,
    k: int = _MMR_K,
    w_rel: int = _MMR_WREL,
    w_div: int = _MMR_WDIV,
    scored_ctes: list[str] | None = None,
) -> str:
    """Unrolled MMR greedy in DuckDB SQL. p_t = round-t picks (one row
    per query), sel_t = accumulated picks. Chain CTEs MATERIALIZED (the
    _kcenter_oracle lesson: inlined, sel_t re-executes per reference).

    ``scored_ctes`` swaps the candidate-scoring stage (must end in a
    CTE named ``scored`` with columns query_id, cand_id, latq): default
    is the brute-force cross scan; the ANN variant passes the LSH
    collision join instead. Everything downstream — lattice rank, pair
    cosines, the unrolled greedy — is shared verbatim, mirroring the
    Spark side's shared ``_mmr_greedy_tail``."""
    lat = (
        "CAST(floor(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
        " * 1e9 + 0.5) AS BIGINT)"
    )
    if scored_ctes is None:
        scored_ctes = [
            "scored AS MATERIALIZED (SELECT q.query_id, c.cand_id, "
            + lat.format(a="c.cv", b="q.qv")
            + " AS latq FROM c, q)"
        ]
    ctes = [
        # Candidate-universe clamp mirroring the Spark side (ADVICE r12
        # #1): mmr_rerank/mmr_rerank_ann filter zero-norm vectors with
        # _nonzero_vec BEFORE any cosine (ANSI div-by-zero raises) and
        # NULL-element vectors via the tail's latq IS NOT NULL filter. A
        # dropped vector affects only its own candidacy (bucketing is
        # per-vector, the collision join pairwise), so filtering the
        # shared e CTE is output-equivalent — and keeps the oracle from
        # ranking (or div-by-zero-ing on) a vector Spark drops, should a
        # future testdata SF ever ship one. Both predicates go through
        # list_filter, which never raises — list_dot_product RAISES on
        # NULL-element lists (found by the degenerate-corpus pytest when
        # the clamp's first draft used it), and AND gives no evaluation-
        # order guarantee in a vectorized engine.
        "e AS MATERIALIZED (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings"
        " WHERE len(list_filter(embedding, x -> x IS NULL)) = 0"
        " AND len(list_filter(embedding, x -> x <> 0)) > 0)",
        f"q AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv FROM e"
        f" WHERE vec_id < {N_QUERIES})",
        f"c AS MATERIALIZED (SELECT vec_id AS cand_id, v AS cv FROM e"
        f" WHERE vec_id >= {N_QUERIES})",
        *scored_ctes,
        "cand AS MATERIALIZED (SELECT query_id, cand_id, latq FROM ("
        "SELECT query_id, cand_id, latq, row_number() OVER ("
        "PARTITION BY query_id ORDER BY latq DESC, cand_id) AS rn FROM scored"
        f") WHERE rn <= {n_cands})",
        "pairs AS MATERIALIZED (SELECT a.query_id, a.cand_id AS a_id, "
        "b.cand_id AS b_id, "
        + lat.format(a="ca.cv", b="cb.cv")
        + " AS latp FROM cand a JOIN cand b ON a.query_id = b.query_id"
        " AND a.cand_id <> b.cand_id"
        " JOIN c ca ON ca.cand_id = a.cand_id"
        " JOIN c cb ON cb.cand_id = b.cand_id)",
        "p1 AS MATERIALIZED (SELECT query_id, cand_id AS neighbor_id, "
        "1 AS round FROM (SELECT query_id, cand_id, row_number() OVER ("
        "PARTITION BY query_id ORDER BY latq DESC, cand_id) AS rn FROM cand"
        ") WHERE rn = 1)",
        "sel1 AS MATERIALIZED (SELECT * FROM p1)",
    ]
    for t in range(2, k + 1):
        prev = f"sel{t - 1}"
        ctes.append(
            f"p{t} AS MATERIALIZED (SELECT query_id, cand_id AS neighbor_id,"
            f" {t} AS round FROM (SELECT query_id, cand_id, row_number()"
            " OVER (PARTITION BY query_id ORDER BY score DESC, cand_id)"
            " AS rn FROM ("
            f"SELECT cd.query_id, cd.cand_id,"
            f" {w_rel} * cd.latq - {w_div} * max(ps.latp) AS score"
            f" FROM cand cd"
            f" JOIN {prev} sl ON sl.query_id = cd.query_id"
            f" JOIN pairs ps ON ps.query_id = cd.query_id"
            f" AND ps.a_id = cd.cand_id AND ps.b_id = sl.neighbor_id"
            f" WHERE NOT EXISTS (SELECT 1 FROM {prev} x"
            f" WHERE x.query_id = cd.query_id AND x.neighbor_id = cd.cand_id)"
            f" GROUP BY cd.query_id, cd.cand_id, cd.latq"
            ")) WHERE rn = 1)"
        )
        ctes.append(
            f"sel{t} AS MATERIALIZED (SELECT * FROM {prev}"
            f" UNION ALL SELECT * FROM p{t})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, neighbor_id, round FROM sel{k}"
    )


def sim_mmr_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 with candidates from the LSH ANN tier — the
    production composition of the rerank (sim_mmr_rerank's candidate
    stage is the brute-force exactness anchor; this one probes the same
    12x6 seeded-hyperplane index as sim_ann_lsh and reranks the
    collision set). Same integer-greedy tail, same rank-only output
    contract; recall < 1 by design, yet still hash-checked end-to-end —
    the oracle replays bucket assignment, the collision join, the
    lattice rank, and the unrolled greedy rounds."""
    corpus, queries = _split(spark, sf_dir)
    return ops.mmr_rerank_ann(
        corpus,
        queries,
        n_candidates=_MMR_CANDS,
        k=_MMR_K,
        w_rel=_MMR_WREL,
        w_div=_MMR_WDIV,
        planes_per_table=_LSH_PLANES_PER,
        n_tables=_LSH_TABLES,
        dim=64,
        seed=7,
    )


def _mmr_ann_scored_ctes() -> list[str]:
    """LSH candidate-stage CTEs for the ANN-composed MMR oracle: the
    same seeded hyperplane sign-bit bucketing `sim_ann_lsh`'s oracle
    inlines (`_LSH_BANDS_SQL` over the shared `e` CTE), the per-table
    collision join deduped to (query, candidate), then the latticed
    fold cosine — producing the `scored` contract `_mmr_oracle`'s
    shared tail consumes."""
    lat = (
        "CAST(floor(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
        " * 1e9 + 0.5) AS BIGINT)"
    )
    return [
        f"bt AS MATERIALIZED ({_LSH_BANDS_SQL})",
        "coll AS MATERIALIZED (SELECT DISTINCT bq.vec_id AS query_id, "
        "bc.vec_id AS cand_id FROM bt bq JOIN bt bc"
        " ON bq.table_idx = bc.table_idx AND bq.bucket = bc.bucket"
        f" WHERE bq.vec_id < {N_QUERIES} AND bc.vec_id >= {N_QUERIES})",
        "scored AS MATERIALIZED (SELECT coll.query_id, coll.cand_id, "
        + lat.format(a="c.cv", b="q.qv")
        + " AS latq FROM coll"
        " JOIN q ON q.query_id = coll.query_id"
        " JOIN c ON c.cand_id = coll.cand_id)",
    ]


_KCENTER_K = 8


def sim_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection + full-corpus assignment: the
    diversity-based data-selection class (DSIR/quality/mixture select by
    importance or quality; nothing before this selects for COVERAGE) —
    farthest-point traversal [Gonzalez 1985], the coreset strategy of
    active-learning / data-pruning pipelines [Sener & Savarese 2018].

    Two legs. SELECTION runs at query construction (the data-derived-
    literals pattern of the IVF build, memoized in the same cache):
    k-1 corpus scans, each one codegen pass ending in
    TakeOrderedAndProject(1). ASSIGNMENT is the returned plan: ONE scan
    computing 8 latticed squared-L2 folds per row against the selected
    centers as plan literals (zero joins, the sim_kmeans_iter shape),
    argmin with first-occurrence = earliest-round tie-break, then an
    8-group hash agg — at 100 TB this is full scan speed with an 8-row
    exchange. Output per center: selection round, center id, members
    assigned, and the coverage radius (max member distance, the k-center
    objective) as exact integer nanos plus a display double.

    Float policy: every cross-engine comparison happens on floor-latticed
    integer NANOS (selection argmax, assignment argmin, radius max), so
    the greedy trajectory and the output replay exactly in the unrolled
    DuckDB oracle.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    sel = ops.kcenter_select(emb, k=_KCENTER_K)
    dists = F.expr(
        "array("
        + ", ".join(ops._lat_sqdist_sql("v", vec) for _, _, vec in sel)
        + ")"
    )
    assigned = (
        emb.select(
            F.transform("embedding", lambda x: x.cast("double")).alias("v")
        )
        .select(dists.alias("_d"))
        .select(
            F.array_position(F.col("_d"), F.array_min(F.col("_d")))
            .cast("int")
            .alias("round"),
            F.array_min(F.col("_d")).alias("_dmin"),
        )
    )
    cent_ids = F.array(*[F.lit(int(cid)).cast("long") for _, cid, _ in sel])
    return (
        assigned.groupBy("round")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            F.max("_dmin").alias("radius_nanos"),
        )
        .select(
            "round",
            F.element_at(cent_ids, F.col("round")).alias("center_id"),
            "n_assigned",
            "radius_nanos",
            (F.col("radius_nanos").cast("double") / F.lit(1e9)).alias(
                "coverage_radius"
            ),
        )
    )


def _kcenter_oracle(k: int = _KCENTER_K) -> str:
    """Unrolled greedy k-center in DuckDB SQL: s_t = round-t pick
    (1-row CTE), d_t = running latticed nearest-center distance. The
    lattice/least/tie-break pins mirror kcenter_select exactly — see its
    docstring for why the trajectory is integer-determined.

    Every chain CTE is MATERIALIZED: each d_t is referenced twice (by
    s_{t+1} and d_{t+1}) and each s_t by up to k+2 consumers — inlined,
    the optimizer replays the chain per reference and the plan tree
    grows 2^k (the exact live-plan-double-execution failure the Spark
    side's connected_components checkpoint fixed this round, in SQL
    form; the un-materialized oracle hung at k=8 on 500 rows)."""

    def lat(v: str, c: str) -> str:
        return (
            "CAST(floor(list_reduce(list_transform(range(1, 65), "
            f"i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])), "
            "(a, b) -> a + b) * 1e9 + 0.5) AS BIGINT)"
        )

    ctes = [
        "e AS MATERIALIZED (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        "s1 AS MATERIALIZED (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)",
        f"d1 AS MATERIALIZED (SELECT e.vec_id, e.v, {lat('e.v', 's1.v')}"
        " AS dmin FROM e, s1)",
    ]
    for t in range(2, k + 1):
        prev = f"d{t - 1}"
        sel_union = " UNION ALL ".join(
            f"SELECT vec_id FROM s{j}" for j in range(1, t)
        )
        ctes.append(
            f"s{t} AS MATERIALIZED (SELECT vec_id, v FROM {prev} "
            f"WHERE vec_id NOT IN ({sel_union}) "
            f"ORDER BY dmin DESC, vec_id LIMIT 1)"
        )
        if t < k:
            step = lat(f"{prev}.v", f"s{t}.v")
            ctes.append(
                f"d{t} AS MATERIALIZED (SELECT {prev}.vec_id, {prev}.v, "
                f"CASE WHEN {step} < {prev}.dmin THEN {step} "
                f"ELSE {prev}.dmin END AS dmin FROM {prev}, s{t})"
            )
    dlist = "[" + ", ".join(lat("e.v", f"s{t}.v") for t in range(1, k + 1)) + "]"
    froms = "e, " + ", ".join(f"s{t}" for t in range(1, k + 1))
    ctes.append(f"fin AS (SELECT e.vec_id, {dlist} AS dists FROM {froms})")
    ctes.append(
        "a AS (SELECT vec_id, "
        "CAST(list_position(dists, list_aggregate(dists, 'min')) AS INTEGER)"
        " AS round, list_aggregate(dists, 'min') AS dmin FROM fin)"
    )
    cents = " UNION ALL ".join(
        f"SELECT {t} AS rnd, vec_id AS center_id FROM s{t}" for t in range(1, k + 1)
    )
    ctes.append(f"cents AS ({cents})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT a.round, c.center_id, count(*) AS n_assigned, "
        "max(a.dmin) AS radius_nanos, "
        "CAST(max(a.dmin) AS DOUBLE) / 1e9 AS coverage_radius "
        "FROM a JOIN cents c ON c.rnd = a.round "
        "GROUP BY a.round, c.center_id"
    )


QUERIES = {
    "sim_ann_ivfpq": sim_ann_ivfpq,
    "sim_coreset_kcenter": sim_coreset_kcenter,
    "sim_mmr_rerank": sim_mmr_rerank,
    "sim_mmr_ann": sim_mmr_ann,
    "sim_mmr_arrow": sim_mmr_arrow,
    "sim_knn_join": sim_knn_join,
    "sim_kmeans_iter": sim_kmeans_iter,
    "sim_top_pc": sim_top_pc,
    "sim_embedding_drift": sim_embedding_drift,
    "sim_ann_recall": sim_ann_recall,
    "sim_ann_ivfpq_recall": sim_ann_ivfpq_recall,
    "sim_matryoshka_recall": sim_matryoshka_recall,
    "pipeline_embedding_prep": pipeline_embedding_prep,
    "sim_ann_bruteforce": sim_ann_bruteforce,
    "sim_ann_lsh": sim_ann_lsh,
    "sim_ann_ivf": sim_ann_ivf,
    "sim_ann_filtered": sim_ann_filtered,
    "sim_source_centroid_outliers": sim_source_centroid_outliers,
    "sim_cosine_noise_floor": sim_cosine_noise_floor,
}


def _embedding_prep_oracle() -> str:
    # Deferred import: reuses queries.dedup's LSH band SQL + threshold so
    # the composite's candidate stage is literally the cluster oracle's.
    from .dedup import _EMB_BANDS_SQL, COSINE_LSH_THRESHOLD

    return f"""
WITH RECURSIVE e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
bt AS (
  {_EMB_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM bt a JOIN bt b
    ON a.table_idx = b.table_idx AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
sim AS (
  SELECT a_id, b_id
  FROM cand
  JOIN e ea ON ea.vec_id = a_id
  JOIN e eb ON eb.vec_id = b_id
  WHERE list_dot_product(ea.v, eb.v)
        / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))
        >= {COSINE_LSH_THRESHOLD}
),
edges AS (SELECT a_id AS u, b_id AS v FROM sim
          UNION ALL SELECT b_id AS u, a_id AS v FROM sim),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u
),
clus AS (
  SELECT emb.vec_id,
         CAST(COALESCE(least(m.mn, emb.vec_id), emb.vec_id) AS BIGINT) AS cid
  FROM embeddings emb
  LEFT JOIN (SELECT u, min(v) AS mn FROM reach GROUP BY u) m ON emb.vec_id = m.u
),
kept AS (
  SELECT e.vec_id, e.v FROM e JOIN clus ON clus.vec_id = e.vec_id
  WHERE clus.cid = e.vec_id
),
d AS (
  SELECT vec_id, {_KMEANS_DISTS_SQL} AS dists FROM kept
),
a AS (
  SELECT vec_id,
         CAST(list_position(dists, list_aggregate(dists, 'min')) - 1 AS BIGINT)
           AS cluster_id
  FROM d
),
r AS (
  SELECT vec_id, cluster_id,
         row_number() OVER (
           PARTITION BY cluster_id
           ORDER BY md5(CAST(vec_id AS VARCHAR) || '#embprep'), vec_id) AS rk
  FROM a
),
s AS (
  SELECT cluster_id,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT vec_id, cluster_id,
           CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 100 AS b
    FROM r WHERE rk <= 40
  )
)
SELECT split, cluster_id, count(*) AS n_vectors FROM s GROUP BY split, cluster_id
"""

# IVF-PQ oracle pipeline (corpus/init/Lloyd/probe/encode/ADC/refine) as a
# reusable CTE chain ending in `rer` (query_id, neighbor_id, cos) —
# shared verbatim by the sim_ann_ivfpq oracle and the
# sim_ann_ivfpq_recall composition so the two cannot drift. Expects an
# `e` CTE (vec_id, v) in scope.
_IVFPQ_CTES_SQL = f"""corpus AS (SELECT * FROM e WHERE vec_id >= {N_QUERIES}),
qs AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
init AS (
  SELECT vec_id, v, CAST(rn - 1 AS INTEGER) AS cell FROM (
    SELECT vec_id, v,
           row_number() OVER (ORDER BY md5(concat(CAST(vec_id AS VARCHAR), '_{_IVF_SEED}'))) AS rn
    FROM corpus
  ) WHERE rn <= {_IVF_CELLS}
),
a1 AS (
  SELECT vec_id, cell FROM (
    SELECT c.vec_id, i.cell,
           row_number() OVER (PARTITION BY c.vec_id ORDER BY
             list_dot_product(c.v, i.v) / sqrt(list_dot_product(i.v, i.v)) DESC, i.cell) AS rn
    FROM corpus c CROSS JOIN init i
  ) WHERE rn = 1
),
sums AS (
  SELECT a1.cell,
    {_IVF_SUMS}
  FROM corpus c JOIN a1 USING (vec_id)
  GROUP BY a1.cell
),
cent AS (
  SELECT i.cell,
         CASE WHEN m.cell IS NULL THEN i.v ELSE {_IVF_SUM_VEC} END AS cv
  FROM init i LEFT JOIN sums m ON i.cell = m.cell
),
a2 AS (
  SELECT vec_id, cell FROM (
    SELECT c.vec_id, cent.cell,
           row_number() OVER (PARTITION BY c.vec_id ORDER BY
             list_dot_product(c.v, cv) / sqrt(list_dot_product(cv, cv)) DESC, cent.cell) AS rn
    FROM corpus c CROSS JOIN cent
  ) WHERE rn = 1
),
probe AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT q.vec_id, cent.cell,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             list_dot_product(q.v, cv) / sqrt(list_dot_product(cv, cv)) DESC, cent.cell) AS rn
    FROM qs q CROSS JOIN cent
  ) WHERE rn <= {_IVF_PROBE}
),
cpd AS (
  SELECT c.vec_id, a2.cell,
    {_PQ_DLISTS_SQL}
  FROM corpus c JOIN a2 USING (vec_id)
),
codes AS (
  SELECT vec_id AS neighbor_id, cell, {_PQ_CODES_SQL} AS codes FROM cpd
),
qpd AS (
  SELECT q.vec_id AS query_id,
    {_PQ_DLISTS_SQL}
  FROM qs q
),
luts AS (
  SELECT query_id, {_PQ_LUT_SQL} AS lut FROM qpd
),
scored AS (
  SELECT p.query_id, c.neighbor_id,
         CAST(floor(list_reduce(
                list_transform(range(1, {_PQ_M + 1}), m -> lut[m][codes[m] + 1]),
                (a, b) -> a + b) * 1e6 + 0.5) AS BIGINT) AS adc_micro
  FROM probe p
  JOIN codes c USING (cell)
  JOIN luts l ON l.query_id = p.query_id
),
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY adc_micro, neighbor_id) AS srk
    FROM scored
  ) WHERE srk <= {TOP_K * _PQ_REFINE}
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         list_dot_product(c.v, q.v)
         / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))) AS cos
  FROM shortlist s
  JOIN e c ON c.vec_id = s.neighbor_id
  JOIN e q ON q.vec_id = s.query_id
)"""

ORACLES = {
    "sim_ann_ivfpq": f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
{_IVFPQ_CTES_SQL}
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM rer
) WHERE rank <= {TOP_K}
""",
    "sim_kmeans_iter": f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
d AS (
  SELECT vec_id, {_KMEANS_DISTS_SQL} AS dists FROM e
),
a AS (
  SELECT vec_id,
         CAST(list_position(dists, list_aggregate(dists, 'min')) - 1 AS BIGINT) AS cluster_id,
         list_aggregate(dists, 'min') AS dmin
  FROM d
)
SELECT cluster_id, count(*) AS n_members,
       CAST(sum(CAST(floor(dmin * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sum_dist_micro,
       floor(CAST(sum(CAST(floor(dmin * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6
             / count(*) * 1e6 + 0.5) / 1e6 AS avg_dist
FROM a GROUP BY cluster_id
""",
    "sim_knn_join": f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
bt AS (
  {{bands}}
),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM bt a JOIN bt b
    ON a.table_idx = b.table_idx AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
scored AS (
  SELECT a_id, b_id,
         list_dot_product(ea.v, eb.v)
           / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cos
  FROM cand
  JOIN e ea ON ea.vec_id = a_id
  JOIN e eb ON eb.vec_id = b_id
)
SELECT a_id AS vec_id, b_id AS neighbor_id, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT a_id, b_id,
         row_number() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id) AS rnk
  FROM scored
)
WHERE rnk <= {TOP_K}
""",
    "sim_ann_bruteforce": f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(c.v, q.v)
         / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))) AS cos
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""",
    "sim_source_centroid_outliers": """
WITH de AS (
  SELECT d.source, d.doc_id, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
sums AS (
  SELECT source, count(*) AS n,
         CAST(sum(CAST(floor(v[1] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s0,
         CAST(sum(CAST(floor(v[2] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(CAST(floor(v[3] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s2,
         CAST(sum(CAST(floor(v[4] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s3,
         CAST(sum(CAST(floor(v[5] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s4,
         CAST(sum(CAST(floor(v[6] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s5,
         CAST(sum(CAST(floor(v[7] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s6,
         CAST(sum(CAST(floor(v[8] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s7,
         CAST(sum(CAST(floor(v[9] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s8,
         CAST(sum(CAST(floor(v[10] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s9,
         CAST(sum(CAST(floor(v[11] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s10,
         CAST(sum(CAST(floor(v[12] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s11,
         CAST(sum(CAST(floor(v[13] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s12,
         CAST(sum(CAST(floor(v[14] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s13,
         CAST(sum(CAST(floor(v[15] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s14,
         CAST(sum(CAST(floor(v[16] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s15,
         CAST(sum(CAST(floor(v[17] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s16,
         CAST(sum(CAST(floor(v[18] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s17,
         CAST(sum(CAST(floor(v[19] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s18,
         CAST(sum(CAST(floor(v[20] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s19,
         CAST(sum(CAST(floor(v[21] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s20,
         CAST(sum(CAST(floor(v[22] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s21,
         CAST(sum(CAST(floor(v[23] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s22,
         CAST(sum(CAST(floor(v[24] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s23,
         CAST(sum(CAST(floor(v[25] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s24,
         CAST(sum(CAST(floor(v[26] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s25,
         CAST(sum(CAST(floor(v[27] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s26,
         CAST(sum(CAST(floor(v[28] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s27,
         CAST(sum(CAST(floor(v[29] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s28,
         CAST(sum(CAST(floor(v[30] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s29,
         CAST(sum(CAST(floor(v[31] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s30,
         CAST(sum(CAST(floor(v[32] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s31,
         CAST(sum(CAST(floor(v[33] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s32,
         CAST(sum(CAST(floor(v[34] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s33,
         CAST(sum(CAST(floor(v[35] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s34,
         CAST(sum(CAST(floor(v[36] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s35,
         CAST(sum(CAST(floor(v[37] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s36,
         CAST(sum(CAST(floor(v[38] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s37,
         CAST(sum(CAST(floor(v[39] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s38,
         CAST(sum(CAST(floor(v[40] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s39,
         CAST(sum(CAST(floor(v[41] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s40,
         CAST(sum(CAST(floor(v[42] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s41,
         CAST(sum(CAST(floor(v[43] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s42,
         CAST(sum(CAST(floor(v[44] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s43,
         CAST(sum(CAST(floor(v[45] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s44,
         CAST(sum(CAST(floor(v[46] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s45,
         CAST(sum(CAST(floor(v[47] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s46,
         CAST(sum(CAST(floor(v[48] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s47,
         CAST(sum(CAST(floor(v[49] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s48,
         CAST(sum(CAST(floor(v[50] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s49,
         CAST(sum(CAST(floor(v[51] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s50,
         CAST(sum(CAST(floor(v[52] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s51,
         CAST(sum(CAST(floor(v[53] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s52,
         CAST(sum(CAST(floor(v[54] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s53,
         CAST(sum(CAST(floor(v[55] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s54,
         CAST(sum(CAST(floor(v[56] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s55,
         CAST(sum(CAST(floor(v[57] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s56,
         CAST(sum(CAST(floor(v[58] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s57,
         CAST(sum(CAST(floor(v[59] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s58,
         CAST(sum(CAST(floor(v[60] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s59,
         CAST(sum(CAST(floor(v[61] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s60,
         CAST(sum(CAST(floor(v[62] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s61,
         CAST(sum(CAST(floor(v[63] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s62,
         CAST(sum(CAST(floor(v[64] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s63
  FROM de GROUP BY source
),
cent AS (SELECT source, [(CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s5 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s6 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s7 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s8 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s9 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s10 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s11 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s12 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s13 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s14 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s15 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s16 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s17 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s18 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s19 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s20 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s21 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s22 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s23 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s24 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s25 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s26 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s27 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s28 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s29 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s30 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s31 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s32 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s33 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s34 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s35 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s36 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s37 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s38 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s39 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s40 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s41 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s42 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s43 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s44 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s45 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s46 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s47 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s48 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s49 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s50 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s51 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s52 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s53 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s54 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s55 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s56 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s57 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s58 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s59 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s60 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s61 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s62 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9, (CAST(s63 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e9] AS c FROM sums),
scored AS (
  SELECT de.source, de.doc_id,
         list_dot_product(de.v, cent.c)
         / (sqrt(list_dot_product(de.v, de.v)) * sqrt(list_dot_product(cent.c, cent.c))) AS cos
  FROM de JOIN cent ON de.source = cent.source
)
SELECT source, doc_id, outlier_rank FROM (
  SELECT source, doc_id,
         CAST(row_number() OVER (PARTITION BY source ORDER BY cos ASC, doc_id) AS INTEGER) AS outlier_rank
  FROM scored
) WHERE outlier_rank <= 3
""",
    "sim_ann_filtered": f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
bt AS (
  {_LSH_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bt q
  JOIN bt c ON q.table_idx = c.table_idx AND q.bucket = c.bucket
  JOIN embeddings eq ON eq.vec_id = q.vec_id
  JOIN embeddings ec ON ec.vec_id = c.vec_id
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
    AND eq.label = ec.label
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_dot_product(c.v, q.v)
         / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))) AS cos
  FROM cand
  JOIN e q ON q.vec_id = cand.query_id
  JOIN e c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""",
    "sim_ann_lsh": f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
bt AS (
  {_LSH_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bt q JOIN bt c ON q.table_idx = c.table_idx AND q.bucket = c.bucket
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_dot_product(c.v, q.v)
         / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))) AS cos
  FROM cand
  JOIN e q ON q.vec_id = cand.query_id
  JOIN e c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""",
    "sim_ann_ivf": f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
corpus AS (SELECT * FROM e WHERE vec_id >= {N_QUERIES}),
qs AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
init AS (
  SELECT vec_id, v, CAST(rn - 1 AS INTEGER) AS cell FROM (
    SELECT vec_id, v,
           row_number() OVER (ORDER BY md5(concat(CAST(vec_id AS VARCHAR), '_{_IVF_SEED}'))) AS rn
    FROM corpus
  ) WHERE rn <= {_IVF_CELLS}
),
a1 AS (
  SELECT vec_id, cell FROM (
    SELECT c.vec_id, i.cell,
           row_number() OVER (PARTITION BY c.vec_id ORDER BY
             list_dot_product(c.v, i.v) / sqrt(list_dot_product(i.v, i.v)) DESC, i.cell) AS rn
    FROM corpus c CROSS JOIN init i
  ) WHERE rn = 1
),
sums AS (
  SELECT a1.cell,
    {_IVF_SUMS}
  FROM corpus c JOIN a1 USING (vec_id)
  GROUP BY a1.cell
),
cent AS (
  SELECT i.cell,
         CASE WHEN m.cell IS NULL THEN i.v ELSE {_IVF_SUM_VEC} END AS cv
  FROM init i LEFT JOIN sums m ON i.cell = m.cell
),
a2 AS (
  SELECT vec_id, cell FROM (
    SELECT c.vec_id, cent.cell,
           row_number() OVER (PARTITION BY c.vec_id ORDER BY
             list_dot_product(c.v, cv) / sqrt(list_dot_product(cv, cv)) DESC, cent.cell) AS rn
    FROM corpus c CROSS JOIN cent
  ) WHERE rn = 1
),
probe AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT q.vec_id, cent.cell,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             list_dot_product(q.v, cv) / sqrt(list_dot_product(cv, cv)) DESC, cent.cell) AS rn
    FROM qs q CROSS JOIN cent
  ) WHERE rn <= {_IVF_PROBE}
),
cand AS (
  SELECT DISTINCT probe.query_id, a2.vec_id AS neighbor_id
  FROM probe JOIN a2 USING (cell)
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_dot_product(c.v, q.v)
         / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))) AS cos
  FROM cand
  JOIN e q ON q.vec_id = cand.query_id
  JOIN e c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""",
}

# The kNN-join oracle replays the knn_join operator's own bucket layout
# (20 tables x 5 planes, seed 7 — coarser/wider than the ANN queries'
# 12x6; see the operator's knob guidance). Same RNG stream, so the first
# planes coincide with _PLANES where the counts overlap.
_KNN_TABLES, _KNN_PLANES_PER = 20, 5
_KNN_PLANES = ops._hyperplanes(_KNN_TABLES * _KNN_PLANES_PER, 64, seed=7)


def _knn_bucket_sql(t: int) -> str:
    terms = []
    for j in range(_KNN_PLANES_PER):
        lit = "[" + ", ".join(repr(x) for x in _KNN_PLANES[t * _KNN_PLANES_PER + j]) + "]"
        terms.append(f"(CASE WHEN list_dot_product(v, {lit}) >= 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


_KNN_BANDS_SQL = "\n  UNION ALL ".join(
    f"SELECT vec_id, {t} AS table_idx, ({_knn_bucket_sql(t)}) AS bucket FROM e"
    for t in range(_KNN_TABLES)
)
ORACLES["sim_knn_join"] = ORACLES["sim_knn_join"].format(bands=_KNN_BANDS_SQL)
ORACLES["pipeline_embedding_prep"] = _embedding_prep_oracle()

def _power_iter_oracle() -> str:
    """Replay the 3 unrolled power iterations: per-iteration CTE triple
    (dot fold -> 64 integer-micro sums -> pinned-fold normalize), the
    identical op sequence the Spark plan folds."""
    v0 = "[" + ", ".join(repr(x) for x in _power_v0()) + "]"
    parts = ["e AS (\n  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n  FROM embeddings\n)"]
    prev_w = f"(SELECT {v0} AS w)"
    for t in range(1, _POWER_ITERS + 1):
        sums = ", ".join(
            f"sum(CAST(floor(v[{d}] * s * 1e6 + 0.5) AS BIGINT))" for d in range(1, _DIM + 1)
        )
        parts.append(
            f"r{t} AS (\n  SELECT v,\n    list_reduce(list_transform(range(1, {_DIM + 1}), i -> v[i] * wp.w[i]), (a, b) -> a + b) AS s\n  FROM e, {prev_w} wp\n)"
        )
        parts.append(f"u{t} AS (SELECT [{sums}] AS u FROM r{t})")
        parts.append(
            f"raw{t} AS (SELECT list_transform(u, x -> CAST(x AS DOUBLE) / 1e6) AS raw FROM u{t})"
        )
        parts.append(
            f"w{t} AS (\n  SELECT list_transform(raw, x -> x / sqrt(list_reduce(list_transform(raw, y -> y * y), (a, b) -> a + b))) AS w\n  FROM raw{t}\n)"
        )
        prev_w = f"w{t}"
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT CAST(i - 1 AS INTEGER) AS dim,
       floor(w[i] * 1000000.0 + 0.5) / 1000000.0 AS loading
FROM {prev_w}, UNNEST(range(1, {_DIM + 1})) AS t(i)
"""
    )


ORACLES["sim_top_pc"] = _power_iter_oracle()
# SemDeDup (query lives in queries/dedup.py — see the note there): the
# sim_kmeans_iter assignment SQL + the exact-cosine pair SQL, composed —
# both already hash-verified on their own.
from .dedup import COSINE_THRESHOLD as _SEMDEDUP_TAU  # noqa: E402

ORACLES["dedup_semdedup"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
d AS (
  SELECT vec_id, v, {_KMEANS_DISTS_SQL} AS dists FROM e
),
a AS (
  SELECT vec_id, v,
         CAST(list_position(dists, list_aggregate(dists, 'min')) - 1 AS BIGINT)
           AS cluster_id
  FROM d
),
p AS (
  SELECT x.vec_id AS a_id, y.vec_id AS b_id
  FROM a x JOIN a y ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
  WHERE list_dot_product(x.v, y.v)
        / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        >= {_SEMDEDUP_TAU}
),
dr AS (SELECT DISTINCT b_id FROM p)
SELECT cluster_id,
       count(*) AS n_members,
       CAST(sum(CASE WHEN dr.b_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       count(*) - CAST(sum(CASE WHEN dr.b_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM a LEFT JOIN dr ON a.vec_id = dr.b_id
GROUP BY cluster_id
"""
# Shared recall-oracle fragments: the exact brute-force leg (bfs/bf CTEs)
# and the hit-count finishing SELECT, written once so the two recall
# oracles (sim_ann_recall, sim_matryoshka_recall) cannot drift from each
# other — the SQL mirror of _recall_report.
_BF_EXACT_SQL = f"""bfs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(c.v, q.v)
         / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))) AS cos
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM bfs
  ) WHERE rank <= {TOP_K}
)"""
_RECALL_FINISH_SQL = f"""SELECT bf.query_id,
       CAST(sum(coalesce(hit, 0)) AS BIGINT) AS n_hits,
       floor(CAST(sum(coalesce(hit, 0)) AS DOUBLE) / {TOP_K}.0 * 1e9 + 0.5) / 1e9
         AS recall_at_k
FROM bf LEFT JOIN approx USING (query_id, neighbor_id)
GROUP BY bf.query_id"""

ORACLES["sim_matryoshka_recall"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         list_transform(embedding[1:{_MRL_DIM}], x -> CAST(x AS DOUBLE)) AS vt
  FROM embeddings
),
{_BF_EXACT_SQL},
tfs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(c.vt, q.vt)
         / (sqrt(list_dot_product(c.vt, c.vt)) * sqrt(list_dot_product(q.vt, q.vt))) AS cos
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
),
approx AS (
  SELECT query_id, neighbor_id, 1 AS hit FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM tfs
  ) WHERE rank <= {TOP_K}
)
{_RECALL_FINISH_SQL}
"""
ORACLES["sim_ann_recall"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
{_BF_EXACT_SQL},
bt AS (
  {_LSH_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bt q JOIN bt c ON q.table_idx = c.table_idx AND q.bucket = c.bucket
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
),
lscored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_dot_product(c.v, q.v)
         / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))) AS cos
  FROM cand
  JOIN e q ON q.vec_id = cand.query_id
  JOIN e c ON c.vec_id = cand.neighbor_id
),
approx AS (
  SELECT query_id, neighbor_id, 1 AS hit FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM lscored
  ) WHERE rank <= {TOP_K}
)
{_RECALL_FINISH_SQL}
"""
ORACLES["sim_ann_ivfpq_recall"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
{_IVFPQ_CTES_SQL},
{_BF_EXACT_SQL},
approx AS (
  SELECT query_id, neighbor_id, 1 AS hit FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM rer
  ) WHERE rank <= {TOP_K}
)
{_RECALL_FINISH_SQL}
"""
ORACLES["sim_embedding_drift"] = _drift_oracle()
ORACLES["sim_coreset_kcenter"] = _kcenter_oracle()
ORACLES["sim_mmr_rerank"] = _mmr_oracle()
ORACLES["sim_mmr_ann"] = _mmr_oracle(scored_ctes=_mmr_ann_scored_ctes())
# The arrow twin replays the SAME oracle — the twin contract: only the
# grouped stage's batch transport differs, never the math.
ORACLES["sim_mmr_arrow"] = _mmr_oracle()

ORACLES["sim_cosine_noise_floor"] = """
WITH b AS (
  SELECT (CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 1024) AS bk, vec_id
  FROM embeddings
),
p AS (
  SELECT bk, min(vec_id) AS a_id, max(vec_id) AS b_id
  FROM b GROUP BY bk HAVING min(vec_id) < max(vec_id)
),
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c AS (
  SELECT CAST(floor(
           list_dot_product(ea.v, eb.v)
           / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))
           * 1e7 + 0.5) AS BIGINT) AS c7
  FROM p JOIN e ea ON ea.vec_id = p.a_id JOIN e eb ON eb.vec_id = p.b_id
)
SELECT
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(c7) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e7) AS mean_cos,
  sqrt((CAST(count(*) AS DOUBLE) * CAST(sum(c7 * c7) AS DOUBLE)
        - CAST(sum(c7) AS DOUBLE) * CAST(sum(c7) AS DOUBLE))
       / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE) * 1e14)) AS sd_cos,
  (0.45 - CAST(sum(c7) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e7))
    / nullif(sqrt((CAST(count(*) AS DOUBLE) * CAST(sum(c7 * c7) AS DOUBLE)
            - CAST(sum(c7) AS DOUBLE) * CAST(sum(c7) AS DOUBLE))
           / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE) * 1e14)), 0) AS sigma_gap,
  CAST(sum(CASE WHEN c7 >= 4500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_threshold
FROM c
"""

