"""Vector similarity search over embedding columns (array<float>).

Cosine is pure built-in higher-order functions (F.zip_with + F.aggregate):
JVM-side, codegen'd, no Python UDF in the hot path (SURVEY.md SS7.3).

Scale design (100 TB / billions of vectors):
- Brute force is the exactness baseline: broadcast the (small) query set,
  one pass over the corpus, per-partition top-k via ranking window. Cost is
  O(|corpus| * |queries| * dim) FLOPs but only ONE corpus scan and no
  corpus shuffle (the window shuffles |corpus x queries| scored rows on
  query_id - bounded by pushing the rank filter below, see ann_topk).
- The LSH path buckets vectors by random-hyperplane sign bits so each query
  only scores its bucket: recall trades against the number of hyperplanes /
  probe multiplicity. Hyperplanes are seeded constants broadcast in the
  plan (literal arrays), not state.
"""

from __future__ import annotations

import math
import random
import weakref

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Memoized corpus counts for occupancy-held bit-width derivation
# (ADVICE r08 #2): ``hold_occupancy`` needs |corpus| at query
# CONSTRUCTION time, which costs one Spark count job. Composites that
# build two bucketed operators over the SAME DataFrame (and plan-census
# tests that construct repeatedly) would otherwise pay the scan each
# time. Keyed weakly by DataFrame identity, so distinct reads of the
# same table never cross-contaminate and entries die with their frame.
_CORPUS_COUNTS: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def corpus_count(vectors: DataFrame, id_col: str) -> int:
    """Row count of ``vectors``, memoized per (DataFrame object, id_col)."""
    try:
        per_df = _CORPUS_COUNTS.setdefault(vectors, {})
    except TypeError:  # non-weakref-able stand-in (tests)
        return vectors.select(id_col).count()
    if id_col not in per_df:
        per_df[id_col] = vectors.select(id_col).count()
    return per_df[id_col]


def dot_product(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns in double precision.

    Left-to-right fold => deterministic accumulation order (bit-reproducible
    across engines, unlike a shuffled SUM of exploded elements).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    """Euclidean norm of an array<numeric> column, double precision."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (norm2(a) * norm2(b))


def _derive_n_blocks(n_rows: int, target_block_rows: int) -> int:
    """Blocks needed so the expected block holds <= target_block_rows."""
    return max(1, -(-n_rows // max(1, target_block_rows)))


class NoiseFloorWarning(UserWarning):
    """A near-dup cosine threshold sits inside the random-pair noise floor
    — dedup output (and cost) will grow ~quadratically with the corpus."""


_NOISE_FLOOR_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def estimate_noise_floor(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 256,
) -> tuple[float, float]:
    """(mean, sd) of the random-pair cosine, from a bounded sample.

    The r08 scale ladder's lesson made operational: at dim=64 the random
    cosine has sd ~ 1/sqrt(64) = 0.125, so a 0.45 threshold sits only
    ~3.6 sigma out and C(N,2) * tail pairs cross it BY CHANCE — dedup
    output goes Theta(N^2) in ANY engine. This estimator is the cheap
    pre-flight twin of the hash-checked ``sim_cosine_noise_floor`` query:
    one TakeOrdered job collects the md5-order-first ``sample`` vectors
    (a deterministic pseudo-random draw, the ivf_centroids init pattern;
    O(N) scan, O(sample x dim) driver bytes at ANY corpus size) and the
    ~sample^2/2 pair cosines are one driver-side numpy matmul. Monitoring
    math, not a hash-checked output — the oracle-replayed estimator
    remains the registry query.
    """
    rows = (
        vectors.orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    if len(rows) < 2:  # empty/1-row corpus: no pairs, nothing to estimate
        return 0.0, 0.0
    m = np.asarray([r[0] for r in rows], dtype=np.float64)
    nrm = np.sqrt((m * m).sum(axis=1))
    nrm[nrm == 0.0] = 1.0
    u = m / nrm[:, None]
    cos = u @ u.T
    iu = np.triu_indices(len(u), k=1)
    pair_cos = cos[iu]
    if pair_cos.size == 0:
        return 0.0, 0.0
    return float(pair_cos.mean()), float(pair_cos.std())


def _noise_floor_cached(
    vectors: DataFrame, id_col: str, vec_col: str, sample: int
) -> tuple[float, float]:
    """Memoized :func:`estimate_noise_floor` — one sample job per
    (DataFrame object, vec_col, id_col, sample), shared by the warning
    guardrail and the load-bearing bounded-mode resolution."""
    try:
        per_df = _NOISE_FLOOR_CACHE.setdefault(vectors, {})
    except TypeError:  # non-weakref-able stand-in
        per_df = {}
    key = (vec_col, id_col, sample)
    if key not in per_df:
        per_df[key] = estimate_noise_floor(vectors, id_col, vec_col, sample)
    return per_df[key]


def resolve_noise_floor_bound(
    vectors: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chance_budget_per_doc: float = 0.5,
    sigmas: float = 6.0,
    sample: int = 256,
    n_rows: int | None = None,
) -> tuple[float, bool]:
    """Bounded-output resolution for near-dup thresholds inside the
    random-pair noise floor (VERDICT r10 #1 — the guardrail that ACTS
    instead of only warning).

    The failure regime, measured by the scale ladder: a threshold only
    ~3.5 sigma above the random-cosine mean admits ~C(N,2)*Phi(-gap)
    CHANCE pairs, so the verified pair graph — and with it the verify
    cost, the component structure, and the keep-list itself — grows
    quadratically with the corpus in ANY engine. Beyond the size where
    chance pairs would dominate, a threshold-graph keep-list is not a
    smaller answer computed cheaper; it is noise. So once the expected
    chance-pair count exceeds ``chance_budget_per_doc`` per document,
    the threshold auto-raises to the ``sigmas``-sigma point (ceil'd to
    2 decimals so the effective threshold is a stable literal), where
    chance crossings are negligible and output returns to tracking the
    corpus's true near-dup structure (~linear).

    Deterministic end to end: N is an exact count and (mean, sd) come
    from :func:`estimate_noise_floor`'s fixed md5-ordered sample, so a
    given corpus always resolves to the same (threshold, fired) — the
    keep-list stays replayable. At the oracle-checked SFs the expected
    chance load sits well under the budget (sf0.01: ~0.04 pairs/doc,
    sf0.1: ~0.16 vs the 0.5 default), so resolution is INERT there and
    every hash-pinned result is unchanged; the K>=5 ladder rungs
    (~0.77 and ~3.9 pairs/doc) are where it fires. Same design as
    ``hold_occupancy``: the configured value is the floor, the derived
    value takes over exactly where the configured one stops scaling.

    Returns (effective_threshold, fired). Not gated by
    ``SPARK_GRAFT_PREFLIGHT`` — when a caller opts in, this is
    load-bearing plan derivation, not an advisory warning.
    """
    if n_rows is None:
        n_rows = corpus_count(vectors, id_col)
    if n_rows < 2:
        return threshold, False
    mean, sd = _noise_floor_cached(vectors, id_col, vec_col, sample)
    if sd == 0.0:
        return threshold, False
    gap = (threshold - mean) / sd
    # Phi(-gap), the standard-normal tail above the threshold
    tail = 0.5 * math.erfc(gap / math.sqrt(2.0))
    expected_chance_pairs = n_rows * (n_rows - 1) / 2.0 * tail
    if expected_chance_pairs <= chance_budget_per_doc * n_rows:
        return threshold, False
    raised = mean + sigmas * sd
    # ceil to 2 decimals: the guarantee is ">= sigmas sigma", so round UP
    effective = math.ceil(raised * 100.0 - 1e-9) / 100.0
    return max(threshold, effective), True


def warn_if_threshold_in_noise_floor(
    vectors: DataFrame,
    threshold: float,
    sigmas: float = 6.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 256,
) -> float:
    """Pre-flight guardrail for near-dup composites (VERDICT r08 #5):
    estimate the random-pair cosine floor and emit a ``NoiseFloorWarning``
    when ``threshold`` clears it by fewer than ``sigmas`` standard
    deviations. Returns the sigma gap (inf when sd is 0 — degenerate or
    constant corpus, nothing to warn about). Memoized per (DataFrame
    object, vec_col, id_col, sample) so a composite that gates twice on
    the SAME frame pays the sample job once; a fresh load_table frame is
    a fresh key (by design — file listings must not be cached away).

    Six sigma is deliberately conservative: the expected number of
    random pairs past the threshold is ~C(N,2) * Phi(-gap), and at
    N = 1e9 (100 TB of documents) C(N,2) ~ 5e17 needs Phi(-gap) << 2e-18
    — i.e. gap >~ 8.6 — for chance crossings to stay subdominant; gap < 6
    is firmly in the quadratic-output regime the ladder measured. At
    dim=768 (production text embeddings) sd ~ 0.036 and a 0.45 threshold
    clears ~12 sigma, so real corpora pass silently.

    Skipped (returns inf, no Spark job) when ``SPARK_GRAFT_PREFLIGHT=0``
    — explain-only / dry-run flows must not execute work at query
    construction time (ADVICE r10 #2). Warning-only: gating never
    changes a plan or output.
    """
    from ..config import preflights_enabled

    if not preflights_enabled():
        return math.inf
    mean, sd = _noise_floor_cached(vectors, id_col, vec_col, sample)
    if sd == 0.0:
        return math.inf
    gap = (threshold - mean) / sd
    if gap < sigmas:
        import warnings

        warnings.warn(
            f"near-dup threshold {threshold} clears the random-pair cosine "
            f"noise floor (mean {mean:.4f}, sd {sd:.4f}) by only {gap:.1f} "
            f"sigma (< {sigmas:g}): expect ~C(N,2)*tail chance pairs — "
            "dedup output and cost will grow quadratically with the corpus. "
            "Raise the threshold, use higher-dimensional embeddings, or "
            "run the sim_cosine_noise_floor query to calibrate.",
            NoiseFloorWarning,
            stacklevel=2,
        )
    return gap


def cosine_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_blocks: int | None = None,
    target_block_rows: int = 2048,
    partition_col: str | None = None,
) -> DataFrame:
    """All-pairs cosine >= threshold (embedding near-dup detection), exact.

    Blocked all-pairs: vectors are hashed into blocks, each unordered
    block pair is scored ONCE with a numpy matmul (Arrow-batched
    mapInPandas — measured ~10x faster than 2M interpreted zip_with folds),
    keeping candidates above ``threshold - 1e-6``. Candidates are then
    re-scored with the exact fold arithmetic (dot/(na*nb), same expression
    tree as the SQL oracle), so the OUTPUT is bit-identical to the naive
    cross join — the margin only guards against numpy-vs-fold summation
    order, which differs by ~1e-13 relative.

    ``n_blocks`` defaults to ceil(count / target_block_rows) — one cheap
    narrow count — so a block row (one ``collect_list`` struct list) stays
    bounded at ~target_block_rows x dim doubles regardless of corpus size,
    and the 2048^2 per-task score matrix is ~32 MB. Blocking is
    score-invariant, so any block count yields identical output. The pair
    grid still grows as O((N/target)^2) — this operator is the EXACT
    anchor; for billions of vectors prune with cosine_pairs_lsh /
    ann_lsh_topk bucketing instead.

    ``partition_col`` scopes the pair search: only rows sharing the
    partition value are compared (the SemDeDup shape — exact all-pairs
    WITHIN each k-means cluster, never across). The block-pair grid then
    becomes an EQUI-join on the partition key instead of a cross join,
    so per-task work is bounded by the largest partition's block count
    and the scale-killer cartesian disappears from the plan entirely.
    Output: (a_id, b_id) with a_id < b_id.
    """
    from collections.abc import Iterator

    if n_blocks is None:
        n_blocks = _derive_n_blocks(
            vectors.select(id_col).count(), target_block_rows
        )

    part = (
        F.col(partition_col) if partition_col is not None else F.lit(0)
    )
    blocked = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        part.alias("p"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("b"),
    )
    blocks = blocked.groupBy("p", "b").agg(
        F.collect_list(F.struct("id", "v")).alias("items")
    )
    if partition_col is None:
        grid = (
            blocks.alias("A")
            .crossJoin(blocks.alias("B"))
            .filter(F.col("A.b") <= F.col("B.b"))
        )
    else:
        # Null-safe partition equality: rows with a NULL partition value
        # form their own comparison group (a plain == would silently
        # exclude them from EVERY pair, letting NULL-cluster near-dups
        # through). <=> is still an equi-join key for Catalyst — hash
        # join, not a nested loop.
        grid = blocks.alias("A").join(
            blocks.alias("B"),
            F.col("A.p").eqNullSafe(F.col("B.p")) & (F.col("A.b") <= F.col("B.b")),
        )
    pairs = grid.select(
        (F.col("A.b") == F.col("B.b")).alias("same_block"),
        F.col("A.items").alias("items_a"),
        F.col("B.items").alias("items_b"),
    )
    margin = threshold - 1e-6

    def score_blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_a: list = []
            out_b: list = []
            for same, items_a, items_b in zip(
                pdf["same_block"], pdf["items_a"], pdf["items_b"]
            ):
                ids_a = np.asarray([x["id"] for x in items_a])
                ids_b = np.asarray([x["id"] for x in items_b])
                ma = np.stack([np.asarray(x["v"], dtype=np.float64) for x in items_a])
                mb = np.stack([np.asarray(x["v"], dtype=np.float64) for x in items_b])
                ma /= np.linalg.norm(ma, axis=1, keepdims=True)
                mb /= np.linalg.norm(mb, axis=1, keepdims=True)
                ii, jj = np.nonzero(ma @ mb.T >= margin)
                if same:
                    # Symmetric matrix: (i,j) and (j,i) both fire; keep the
                    # upper triangle so each unordered pair survives once.
                    tri = ii < jj
                    ii, jj = ii[tri], jj[tri]
                lo = np.minimum(ids_a[ii], ids_b[jj])
                hi = np.maximum(ids_a[ii], ids_b[jj])
                out_a.extend(lo.tolist())
                out_b.extend(hi.tolist())
            yield pd.DataFrame({"a_id": out_a, "b_id": out_b})

    id_type = vectors.schema[id_col].dataType.simpleString()
    cand = pairs.mapInPandas(score_blocks, f"a_id {id_type}, b_id {id_type}")

    withn = vectors.select(
        F.col(id_col), F.col(vec_col), norm2(F.col(vec_col)).alias("nrm")
    )
    return (
        cand.join(
            withn.select(
                F.col(id_col).alias("a_id"),
                F.col(vec_col).alias("vec_a"),
                F.col("nrm").alias("nrm_a"),
            ),
            "a_id",
        )
        .join(
            withn.select(
                F.col(id_col).alias("b_id"),
                F.col(vec_col).alias("vec_b"),
                F.col("nrm").alias("nrm_b"),
            ),
            "b_id",
        )
        .withColumn(
            "cos",
            dot_product(F.col("vec_a"), F.col("vec_b")) / (F.col("nrm_a") * F.col("nrm_b")),
        )
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id")
    )


def cosine_pairs_lsh(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    planes_per_table: int = 8,
    n_tables: int = 16,
    dim: int = 64,
    seed: int = 7,
    hold_occupancy: bool = False,
    target_bucket_rows: int = 256,
    n_rows: int | None = None,
    bound_noise_floor: bool = False,
    bounded_target_bucket_rows: int = 32,
) -> DataFrame:
    """Bucketed embedding near-dup: LSH candidates + exact cosine verify.

    The scale path for :func:`cosine_pairs`: instead of scoring every block
    pair (O(N^2) FLOPs), vectors are bucketed by random-hyperplane sign
    bits in ``n_tables`` independent tables; candidate pairs are the
    self-equi-join on (table_idx, bucket) — shuffle-hash on the bucket id,
    never all-pairs. Survivors are re-scored with the exact fold cosine
    (same expression tree as cosine_pairs / the SQL oracle), so precision
    is exactly 1; recall < 1 is the only approximation
    (P(candidate) = 1-(1-(1-theta/pi)^k)^L for angle theta).

    Regime guidance: hyperplane LSH separates well when the threshold is
    high (near-dup regime, cos >= ~0.8: k=8, L=16 gives ~99.6% recall while
    scoring ~6% of pairs). At low thresholds the qualifying angle
    (e.g. cos 0.4 => 66 deg) is too close to the random-pair background
    (90 deg) for ANY sign-bit family to prune losslessly — which is why
    cosine_pairs keeps the exact quadratic formulation as the oracle
    anchor and this operator takes over wherever a recall target, not
    bit-exactness, is the contract (the standard corpus-dedup trade).

    Output: (a_id, b_id) with a_id < b_id, exact-verified >= threshold.

    ``hold_occupancy``: derive the per-table bit width from the corpus
    size so expected bucket occupancy stays ~``target_bucket_rows``:
    k = max(planes_per_table, ceil(log2(N / target_bucket_rows))).
    Candidate pairs per bucket grow with occupancy² — at FIXED k the
    candidate join is Θ(L·N²/2^k), which the r08 scale ladder measured
    as slope 1.16 on the embedding-prep composite. Holding occupancy
    caps per-bucket work; ``planes_per_table`` becomes the FLOOR, so at
    every oracle-checked SF (where N/2^k ≤ target) the resolved k — and
    therefore every hash-pinned result — is unchanged. The open trade,
    stated rather than hidden: each extra plane multiplies per-table
    recall by p1 = 1 - θ/π; holding recall too requires growing
    n_tables like N^ρ (ρ = ln p1 / ln ½ ≈ 0.66 at threshold 0.45, ≈0.28
    at 0.85) — the classic LSH similarity-join law. Near-dup thresholds
    (≥0.8) are where the bucketed path earns its keep at 100 TB; the
    0.45-threshold pipelines accept the recall decay or raise n_tables.

    ``bound_noise_floor``: the bounded-OUTPUT mode for thresholds inside
    the random-pair noise floor (VERDICT r10 #1) — see
    :func:`resolve_noise_floor_bound` for the regime and the
    determinism/inertness contract. When the chance-pair budget is
    exceeded the threshold auto-raises to the 6-sigma point AND the
    occupancy target tightens to ``bounded_target_bucket_rows`` (the
    raised threshold is in the regime where sign-bit LSH actually
    separates, so narrower buckets buy their candidate cut at tolerable
    recall: at the 0.75 point p1 = 1 - theta/pi ~ 0.77/plane, ~0.6-0.8
    recall at the ladder's resolved widths — the stated trade for
    returning output and cost to ~linear). Below the budget the mode is
    a no-op except the advisory warning. At every oracle-checked SF the
    budget is not exceeded, so hash-pinned results are unchanged.
    """
    if bound_noise_floor:
        if n_rows is None:
            n_rows = corpus_count(vectors, id_col)
        threshold, fired = resolve_noise_floor_bound(
            vectors, threshold, id_col=id_col, vec_col=vec_col, n_rows=n_rows
        )
        if fired:
            hold_occupancy = True
            target_bucket_rows = bounded_target_bucket_rows
        else:
            # sub-critical: output may still carry some chance pairs —
            # surface the advisory (no extra job; the estimate is memoized)
            warn_if_threshold_in_noise_floor(
                vectors, threshold, id_col=id_col, vec_col=vec_col
            )
    if hold_occupancy:
        if n_rows is None:
            n_rows = corpus_count(vectors, id_col)
        planes_per_table = max(
            planes_per_table,
            math.ceil(math.log2(max(1.0, n_rows / target_bucket_rows))),
        )
    planes = _hyperplanes(planes_per_table * n_tables, dim, seed)
    buckets = _bucket_udf(planes, planes_per_table, n_tables)
    tagged = vectors.select(
        F.col(id_col).alias("id"),
        F.posexplode(buckets(F.col(vec_col))).alias("table_idx", "bucket"),
    )
    # The candidate join's parallelism is the PROBE side's partitioning
    # when the build side broadcasts (the single-file test regime): a
    # one-file corpus would run the whole fan-out + verify on ONE task.
    # Round-robin respread only when narrow — a no-op at real scale,
    # where the shuffle join sets its own parallelism. Applied to
    # ``tagged`` BEFORE the a/b split (r15 optimization): with the
    # respread on the a side only, the two join-side subtrees no longer
    # canonicalize equal, so ReusedExchange cannot dedup them and the
    # hyperplane-bucket Arrow stage runs TWICE; respreading the shared
    # frame keeps both sides identical (one Python pass, one exchange
    # reused).
    from ..sources.readers import parallelize_if_narrow

    tagged = parallelize_if_narrow(tagged)
    a = tagged.select(F.col("id").alias("a_id"), "table_idx", "bucket")
    b = tagged.select(F.col("id").alias("b_id"), "table_idx", "bucket")
    candidates = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    withn = vectors.select(
        F.col(id_col), F.col(vec_col), norm2(F.col(vec_col)).alias("nrm")
    )
    paired = candidates.join(
        withn.select(
            F.col(id_col).alias("a_id"),
            F.col(vec_col).alias("vec_a"),
            F.col("nrm").alias("nrm_a"),
        ),
        "a_id",
    ).join(
        withn.select(
            F.col(id_col).alias("b_id"),
            F.col(vec_col).alias("vec_b"),
            F.col("nrm").alias("nrm_b"),
        ),
        "b_id",
    )
    # Two-stage verify, same design as cosine_pairs: a vectorized numpy
    # dot prunes the (large) candidate set with a 1e-6 margin — the
    # interpreted fold over every candidate was the dominant cost (LSH at
    # a low threshold admits most pairs as candidates) — then the exact
    # fold arithmetic makes the FINAL filter, so the output stays
    # bit-identical to the exact path's scores and the subset-of-exact
    # precision guarantee holds.
    margin = threshold - 1e-6

    @F.pandas_udf("double")
    def _np_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        return pd.Series(np.einsum("ij,ij->i", ma, mb))

    # EVALUATION-ORDER GUARD: the exact fold must be gated on the numpy
    # prefilter's OUTPUT column, not written as an independent filter.
    # Both predicates are deterministic from Catalyst's viewpoint, so two
    # chained .filter()s let the optimizer push the (interpreted,
    # per-element) fold predicate down INTO the candidate join condition
    # — running it on every candidate and demoting the vectorized numpy
    # pass to a no-op afterthought (observed: the fold landed in the
    # BroadcastHashJoin condition and the ArrowEvalPython ran after it).
    # Referencing the UDF column inside F.when pins the fold above the
    # Python stage: prefilter failures short-circuit to NULL (>= is then
    # false), and survivors get the same exact fold score as before, so
    # the output is bit-identical.
    pre = _np_dot(F.col("vec_a"), F.col("vec_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    exact = dot_product(F.col("vec_a"), F.col("vec_b")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    return (
        paired.withColumn("_pre", pre)
        .withColumn("cos", F.when(F.col("_pre") >= margin, exact))
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id")
    )


def quantize_int8(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: 4x smaller embedding
    storage/shuffle at corpus scale.

    scale = max|x| / 127 per vector; q_i = sign(x) * floor(|x|/scale + 0.5)
    in [-127, 127] — the floor formulation (not F.round) because it is
    engine-portable, which lets the SQL oracle replay quantization
    exactly. Pure built-in higher-order functions (no Python).
    Dequantization is q_i * scale; the worst-case per-element error is
    scale/2, so dot-product relative error stays ~1e-2 for unit-norm
    64-dim vectors — rerank survivors against the float column when
    exact scores matter (the standard two-tier layout: int8 for the
    scan/candidate tier, float32 for the rerank tier).

    Output: (id, qvec array<tinyint>, scale double). An all-zero vector
    has scale 0; the division is guarded with greatest(scale, 1e-30) so
    it quantizes to a zero qvec (which dequantizes correctly to zeros)
    instead of 0/0 -> NULL/NaN (or an ANSI-mode error). The oracle uses
    the same epsilon, keeping the operator engine-portable and total.
    """
    v = F.col(vec_col)
    scale = (
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))) / F.lit(127.0)
    )
    # scale materialized as a column first: agg expressions get no common-
    # subexpression elimination, so inlining it would recompute the
    # array_max once per element inside the transform lambda.
    return vectors.withColumn("_scale", scale).select(
        F.col(id_col),
        F.transform(
            v,
            lambda x: (
                F.signum(x.cast("double"))
                * F.floor(
                    F.abs(x.cast("double"))
                    / F.greatest(F.col("_scale"), F.lit(1e-30))
                    + F.lit(0.5)
                )
            ).cast("tinyint"),
        ).alias("qvec"),
        F.col("_scale").alias("scale"),
    )


def ann_quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k over int8-quantized vectors: the scan tier of a
    two-tier ANN layout. Scores are dequantized dot products (integer
    dot x scale_a x scale_b — one multiply per pair after the int
    accumulation); ranking quality is pinned vs the float path in
    tests (recall; rows-only driver check since half-up rounding at
    quantization boundaries is not portable across engines).
    """
    from pyspark.sql import Window

    qc = quantize_int8(corpus, id_col, vec_col)
    qq = quantize_int8(queries, id_col, vec_col)
    # int accumulation in long (64*127*127 < 2^20, no overflow), then one
    # float multiply by the two scales
    int_dot = F.aggregate(
        F.zip_with(F.col("qvec_c"), F.col("qvec_q"), lambda a, b: a.cast("long") * b.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    c = qc.select(
        F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("qvec_c"), F.col("scale").alias("scale_c")
    )
    q = qq.select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("qvec_q"), F.col("scale").alias("scale_q")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "score", int_dot.cast("double") * F.col("scale_c") * F.col("scale_q")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (brute force).

    Broadcast the query side (queries << corpus), score in one corpus pass,
    rank per query. Deterministic tiebreak: (score desc, neighbor id asc).
    Output: (query_id, neighbor_id, rank).
    """
    from pyspark.sql import Window

    # Norms are per-vector, not per-pair: compute them below the join so the
    # N*Q pair score is one dot product, not a dot plus two sqrt-folds.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm2(F.col(vec_col)).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("corpus_vec"),
        norm2(F.col(vec_col)).alias("c_nrm"),
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cos",
        dot_product(F.col("corpus_vec"), F.col("query_vec"))
        / (F.col("c_nrm") * F.col("q_nrm")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    n_candidates: int = 25,
    k: int = 5,
    w_rel: int = 3,
    w_div: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow_tail: bool = False,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k [Carbonell &
    Goldstein, SIGIR 1998]: fetch ``n_candidates`` per query by cosine,
    then greedily pick ``k`` — round 1 the most relevant, each later
    round the candidate maximizing w_rel*sim(q,c) − w_div*max sim(c,
    selected) — the standard retrieval-diversification rerank (RAG
    context dedup, "don't return 5 near-identical neighbors").

    Two stages, both bounded. CANDIDATES: the broadcast-query exact scan
    (the ann_topk shape — an opted-in exactness anchor; production
    composes the same rerank onto the LSH/IVF tier's output instead),
    ranked per query on the floor-latticed integer-nanos cosine (tie →
    lowest id). RERANK: one Arrow-batched ``applyInPandas`` (or, with
    ``arrow_tail=True``, raw-``pyarrow.Table`` ``applyInArrow`` — the
    r13 FlatMapGroupsInArrow twin, output-identical via the shared
    :func:`_mmr_greedy_core`) per
    query_id group — n_candidates² pair cosines + the k-round greedy,
    O(n²·dim + k·n²) work on a ≤n_candidates-row group, distributed on
    the query dimension; at 100 TB of corpus the per-group work never
    grows (only the candidate fetch does, and that's the ANN tier's
    problem).

    Determinism / oracle replay: sim(q,c) is the JVM pinned-fold lattice
    computed BEFORE the Python stage; the pair cosines inside the stage
    accumulate dim-at-a-time (one vectorized add per dim = the same
    left fold), lattice to integer nanos, and all MMR scores are pure
    int64 arithmetic (w_rel/w_div integer weights — ordering-equivalent
    to lambda = w_rel/(w_rel+w_div)); ties break to the lowest id. The
    DuckDB oracle unrolls the identical k rounds (MATERIALIZED chain
    CTEs, the _kcenter_oracle lesson). Output: (query_id, neighbor_id,
    round) — rank-only, scores stay internal.

    NUMPY PRE-RANK SHORTLIST (r16, VERDICT r15 #7 — guide §2.3/§4.2):
    the candidate stage no longer evaluates the interpreted fold cosine
    on every corpus×query pair, nor ships the 64-double ``cv`` payload
    of EVERY corpus row through the ranking exchange. One ``mapInArrow``
    pass over the corpus computes approximate cosines to the (bounded,
    driver-collected — the centroid/codebook collect class) query matrix
    in a single matmul and emits NARROW (cand_id, query_id, alat) rows;
    a window keeps the approx-top-``n_candidates + slack`` per query
    (slack = n_candidates); only those ≤ 2·n_candidates rows per query
    re-attach vectors (broadcast of the bounded shortlist — the corpus
    side is never shuffled) and pay the EXACT pinned-fold lattice, which
    alone decides the final rank. Output is bit-identical to the
    fold-everything scan iff the true top-n_candidates (by exact latq,
    id tiebreak) survives the approx cut — a true member can only fall
    below approx-rank-2n if > n_candidates DISTINCT-valued candidates
    sit within 2·err of its cosine, where err = max |numpy matmul −
    left-fold| (exact-duplicate vectors produce bit-equal approx values
    and fall to the same id tiebreak in both rankings, so they cannot
    displace). MEASURED MARGIN at every driver SF (tools-free replay,
    2026-08-18): err = 2.8e-16; min over queries of the rank-25→rank-50
    exact-cosine gap = 3.55e-2 (sf0.001), 3.55e-2 (sf0.01), 2.43e-2
    (sf0.1) — a ≥ 8.8e13× safety factor. Vectors with NULL elements are
    excluded identically in both forms (NaN approx here, NULL fold latq
    there); a corpus where the margin could bind (adversarial
    near-duplicate clouds at the rank boundary) should raise the slack.
    """
    from pyspark.sql import Window

    q = queries.filter(_nonzero_vec(vec_col)).select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qv"),
    )
    c = corpus.filter(_nonzero_vec(vec_col)).select(
        F.col(id_col).alias("cand_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("cv"),
    )
    q_rows = [
        r
        for r in q.collect()
        if r.qv is not None and all(x is not None for x in r.qv)
    ]
    qids_np = np.asarray([r.query_id for r in q_rows], dtype=np.int64)
    Q = (
        np.asarray([r.qv for r in q_rows], dtype=np.float64)
        if q_rows
        else np.zeros((0, dim), dtype=np.float64)
    )
    Qn = np.sqrt((Q * Q).sum(axis=1))
    shortlist_n = 2 * n_candidates

    def _approx(batches):
        for b in batches:
            ids_ = b.column(0).to_numpy(zero_copy_only=False)
            cv = b.column(1)
            C = (
                cv.flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(len(ids_), -1)
                .astype(np.float64)
            )
            dots = C @ Q.T
            cn = np.sqrt((C * C).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / cn[:, None] / Qn[None, :]
            alat = np.floor(cos * 1e9 + 0.5)
            ridx, qidx = np.nonzero(np.isfinite(alat))
            yield pa.record_batch(
                {
                    "cand_id": pa.array(ids_[ridx], pa.int64()),
                    "query_id": pa.array(qids_np[qidx], pa.int64()),
                    "alat": pa.array(alat[ridx, qidx].astype(np.int64), pa.int64()),
                }
            )

    approx = c.select("cand_id", "cv").mapInArrow(
        _approx, "cand_id long, query_id long, alat long"
    )
    w_a = Window.partitionBy("query_id").orderBy(F.col("alat").desc(), "cand_id")
    short = (
        approx.withColumn("_ar", F.row_number().over(w_a))
        .filter(F.col("_ar") <= shortlist_n)
        .select("query_id", "cand_id")
    )
    scored = (
        c.join(F.broadcast(short), "cand_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "cand_id",
            "cv",
            F.floor(cosine(F.col("cv"), F.col("qv")) * 1e9 + F.lit(0.5))
            .cast("long")
            .alias("latq"),
        )
    )
    return _mmr_greedy_tail(
        scored, n_candidates, k, w_rel, w_div, arrow=arrow_tail
    )


def _nonzero_vec(vec_col: str):
    """True iff the vector has at least one nonzero element — the
    zero-norm clamp for the MMR cosine stages (ADVICE r11 #2). Under
    ANSI mode (Spark 4 default) a zero-norm vector's cosine is a
    DIVIDE_BY_ZERO *raise*, not a NULL, so the guard must run BEFORE
    the division; NULL-element vectors pass here (their norm folds to
    NULL, the division yields NULL, and the tail's latq filter drops
    them — NULL divisors don't trip ANSI)."""
    return F.exists(F.col(vec_col), lambda x: x != F.lit(0.0))


def _mmr_greedy_core(
    ids: "np.ndarray",
    latq: "np.ndarray",
    V: "np.ndarray",
    k: int,
    w_rel: int,
    w_div: int,
) -> tuple["np.ndarray", "np.ndarray"]:
    """The MMR k-round integer greedy over ONE query's candidate block,
    shared verbatim by the applyInPandas and applyInArrow tails (the
    twin contract: only the batch format differs, never the math).
    Inputs are PRE-SORTED by (latq desc, id asc); returns (neighbor_ids,
    rounds). All cross-engine comparisons happen on floor-latticed
    integer nanos — see :func:`mmr_rerank` for the determinism pins."""
    n = len(ids)
    dot = np.zeros((n, n), dtype=np.float64)
    sq = np.zeros(n, dtype=np.float64)
    for d in range(V.shape[1]):  # engine's left fold: one add per dim
        col = V[:, d]
        dot = dot + np.outer(col, col)
        sq = sq + col * col
    nrm = np.sqrt(sq)
    latp = np.floor(dot / np.outer(nrm, nrm) * 1e9 + 0.5).astype(np.int64)
    sel = [0]  # row 0 = rank 1 (latq desc, id asc)
    rounds = [1]
    for t in range(2, min(k, n) + 1):
        best_i, best_key = -1, None
        for i in range(n):
            if i in sel:
                continue
            score = w_rel * latq[i] - w_div * max(latp[i, j] for j in sel)
            key = (score, -ids[i])
            if best_key is None or key > best_key:
                best_i, best_key = i, key
        sel.append(best_i)
        rounds.append(t)
    return ids[sel], np.asarray(rounds, dtype=np.int32)


_MMR_TAIL_SCHEMA = "query_id long, neighbor_id long, round int"


def _mmr_greedy_tail(
    scored: DataFrame,
    n_candidates: int,
    k: int,
    w_rel: int,
    w_div: int,
    arrow: bool = False,
) -> DataFrame:
    """Shared MMR tail over a scored candidate frame (query_id, cand_id,
    cv: array<double>, latq: bigint — the floor-latticed integer-nanos
    query cosine): rank per query (latq desc, id asc), keep the top
    ``n_candidates``, then run the k-round integer-arithmetic greedy in
    one grouped Python stage per query group. The candidate STAGE is the
    caller's — exact broadcast scan (:func:`mmr_rerank`) or the LSH
    collision tier (:func:`mmr_rerank_ann`); the tail's per-group work
    is bounded by n_candidates regardless of corpus size.

    ``arrow`` picks the batch transport for the grouped stage:
    ``applyInPandas`` (FlatMapGroupsInPandas, the production leg) or
    ``applyInArrow`` (FlatMapGroupsInArrow, r13 — the raw
    ``pyarrow.Table`` surface, which skips the pandas materialization
    on either side of the exchange exactly as the ``mapInArrow`` twin
    does for the 1:1 map shape). Both legs sort, lattice, and greedy
    through the SAME :func:`_mmr_greedy_core` — output-identical by
    construction, pinned by test and by the shared DuckDB oracle."""
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("latq").desc(), F.col("cand_id")
    )
    cand = (
        # Zero-norm (or NULL-element) vectors lattice to NULL (0/0 → NULL
        # cosine on the JVM side); drop them BEFORE the Arrow stage, where
        # the same vector would otherwise be NaN/inf in the numpy pair
        # cosines and a raise in the int64 cast (ADVICE r11 #2). Mirrors
        # the candidate-stage contract: a NULL cosine never ranks.
        scored.filter(F.col("latq").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_candidates)
        .drop("_rn")
    )

    if arrow:

        def _greedy_arrow(table: "pa.Table") -> "pa.Table":
            table = table.sort_by(
                [("latq", "descending"), ("cand_id", "ascending")]
            )
            ids = table.column("cand_id").to_numpy(zero_copy_only=False)
            latq = table.column("latq").to_numpy(zero_copy_only=False)
            cv = table.column("cv").combine_chunks()
            # Fixed-dim list column: flatten() honors offsets, so the
            # values buffer reshapes to (n, dim) without a Python loop.
            V = cv.flatten().to_numpy(zero_copy_only=False).reshape(len(table), -1)
            sel_ids, rounds = _mmr_greedy_core(
                ids.astype(np.int64), latq.astype(np.int64), V, k, w_rel, w_div
            )
            qid = table.column("query_id")[0].as_py()
            return pa.table(
                {
                    "query_id": pa.array([qid] * len(sel_ids), pa.int64()),
                    "neighbor_id": pa.array(sel_ids, pa.int64()),
                    "round": pa.array(rounds, pa.int32()),
                }
            )

        return cand.groupBy("query_id").applyInArrow(
            _greedy_arrow, schema=_MMR_TAIL_SCHEMA
        )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["latq", "cand_id"], ascending=[False, True]
        ).reset_index(drop=True)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
        sel_ids, rounds = _mmr_greedy_core(
            pdf["cand_id"].to_numpy(dtype=np.int64),
            pdf["latq"].to_numpy(dtype=np.int64),
            V,
            k,
            w_rel,
            w_div,
        )
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "neighbor_id": sel_ids,
                "round": rounds,
            }
        )

    return cand.groupBy("query_id").applyInPandas(
        _greedy, schema=_MMR_TAIL_SCHEMA
    )


def mmr_rerank_ann(
    corpus: DataFrame,
    queries: DataFrame,
    n_candidates: int = 25,
    k: int = 5,
    w_rel: int = 3,
    w_div: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes_per_table: int = 6,
    n_tables: int = 12,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """MMR rerank composed onto the LSH ANN candidate tier — the
    PRODUCTION composition (:func:`mmr_rerank`'s docstring names its
    broadcast scan an opted-in exactness anchor; this variant replaces
    it, VERDICT r10/r11 #1): candidates per query are the multi-table
    random-hyperplane collision set (the :func:`ann_lsh_topk` index/probe
    shape — same seeded planes, same Arrow matmul bucketing, same
    bucket equi-join), scored with the latticed fold cosine, ranked to
    the top ``n_candidates``, then the identical integer-greedy tail.

    At 100 TB the corpus is touched only by the bucket tagging scan and
    the collision equi-join (bucket-pruned, never all-pairs); the greedy
    stays bounded per query group. Recall < 1 by design — exactly the
    trade the ANN tier documents; the DuckDB oracle replays bucket
    assignment, the collision join, the lattice rank, and the unrolled
    greedy rounds end-to-end, so the approximate pipeline is still
    hash-checked."""
    planes = _hyperplanes(planes_per_table * n_tables, dim, seed)
    buckets = _bucket_udf(planes, planes_per_table, n_tables)
    q = queries.filter(_nonzero_vec(vec_col)).select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qv"),
        F.posexplode(buckets(F.col(vec_col))).alias("table_idx", "bucket"),
    )
    c = corpus.filter(_nonzero_vec(vec_col)).select(
        F.col(id_col).alias("cand_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("cv"),
        F.posexplode(buckets(F.col(vec_col))).alias("table_idx", "bucket"),
    )
    collided = c.join(F.broadcast(q), ["table_idx", "bucket"]).dropDuplicates(
        ["query_id", "cand_id"]
    )
    scored = collided.select(
        "query_id",
        "cand_id",
        "cv",
        F.floor(cosine(F.col("cv"), F.col("qv")) * 1e9 + F.lit(0.5))
        .cast("long")
        .alias("latq"),
    )
    return _mmr_greedy_tail(scored, n_candidates, k, w_rel, w_div)


def _centroid_udf(centroids: "np.ndarray", n_probe: int):
    """Arrow-batched coarse-quantizer assignment: one numpy matmul per
    batch against the (normalized) centroid matrix, returning the
    ``n_probe`` nearest centroid ids per vector. The centroid matrix is a
    task-local constant shipped in the serialized UDF (broadcast-like)."""
    from pyspark.sql.types import ArrayType, IntegerType

    cm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(ArrayType(IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        scores = m @ cm.T  # norm of v is constant per row — argmax safe
        top = np.argsort(-scores, axis=1)[:, :n_probe]
        return pd.Series(list(top.astype(np.int32)))

    return assign


# Deterministic-build memo (VERDICT r09 #2): the IVF centroid build is a
# pure function of (corpus BYTES, params), and within one session the ANN
# family re-derives the exact same k x dim matrix for every tier that
# shares the index (sim_ann_ivf, sim_ann_ivfpq, sim_ann_ivfpq_recall) —
# two corpus passes apiece. Entries key on DataFrame.sameSemantics (the
# canonicalized plan, so a FRESH load_table frame over the same path HITS)
# plus the build params; values are driver-side k x dim numpy copies, a
# few KB each. Contract: inputs are immutable for the life of a session
# (the bench/driver shape); after overwriting an input path in-session,
# call clear_ivf_build_cache(). Bounded FIFO so held DataFrame handles
# can't accumulate. r11: the k-center selection (kcenter_select) shares
# the same cache under a "kcenter"-tagged params key — same purity
# argument, same lifecycle.
_IVF_BUILD_CACHE: list = []
_IVF_BUILD_CACHE_MAX = 32


def clear_ivf_build_cache() -> None:
    """Drop memoized deterministic builds (IVF centroids, k-center
    selections) after in-session input mutation."""
    _IVF_BUILD_CACHE.clear()


def _build_cache_get(corpus: DataFrame, params: tuple):
    """Cached build value for (semantic plan, params), or None. Evicts
    entries whose sameSemantics check raises (stale session / Connect:
    the frame can never hit again, so don't let dead entries occupy —
    and with the FIFO cap, eventually fill — the 32 slots, re-raising
    on every lookup until displaced; ADVICE r10 #1)."""
    dead: list = []
    hit = None
    for entry in _IVF_BUILD_CACHE:
        cached_df, cached_params, cached_value = entry
        if cached_params != params:
            continue
        try:
            if corpus.sameSemantics(cached_df):
                hit = cached_value
                break
        except Exception:
            dead.append(entry)
    for entry in dead:
        _IVF_BUILD_CACHE.remove(entry)
    return hit


def _build_cache_put(corpus: DataFrame, params: tuple, value) -> None:
    if len(_IVF_BUILD_CACHE) >= _IVF_BUILD_CACHE_MAX:
        _IVF_BUILD_CACHE.pop(0)
    _IVF_BUILD_CACHE.append((corpus, params, value))


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    kmeans_iters: int = 1,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Bit-deterministic IVF coarse-centroid build shared by
    :func:`ann_ivf_topk` and :func:`ann_ivfpq_topk`: md5-hash-ordered
    init sample + ``kmeans_iters`` Lloyd steps whose per-(cell, dim)
    sums are floor(x*1e9 + 0.5)-scaled LONGS (exact, order-independent)
    used UNNORMALIZED as centroid directions. Only the k x dim matrix
    visits the driver. Memoized per (semantic plan, params) — see
    ``_IVF_BUILD_CACHE`` — so the ANN family builds the index once per
    session instead of once per tier."""
    params = (n_centroids, kmeans_iters, seed, id_col, vec_col)
    hit = _build_cache_get(corpus, params)
    if hit is not None:
        return hit.copy()
    init = [
        np.asarray(r[0], dtype=np.float64)
        for r in corpus.select(vec_col)
        .orderBy(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"_{seed}"))))
        .limit(n_centroids)
        .collect()
    ]
    centroids = np.stack(init)

    for _ in range(kmeans_iters):
        assign1 = _centroid_udf(centroids, 1)
        dim = centroids.shape[1]
        sums = (
            corpus.select(assign1(F.col(vec_col)).getItem(0).alias("cell"), vec_col)
            .groupBy("cell")
            .agg(
                *[
                    F.sum(
                        F.floor(F.col(vec_col).getItem(d).cast("double") * 1e9 + F.lit(0.5))
                    ).alias(f"d{d}")
                    for d in range(dim)
                ]
            )
            .collect()
        )
        for row in sums:
            # exact: |sum| < ~6e12 << 2^53, representable in float64
            centroids[row["cell"]] = np.asarray(
                [row[f"d{d}"] for d in range(dim)], dtype=np.float64
            )
    _build_cache_put(corpus, params, centroids.copy())
    return centroids


def _lat_sqdist_sql(vec_sql: str, cent: list[float]) -> str:
    """Spark SQL expression: squared L2 distance from ``vec_sql`` (an
    array<double> column reference) to the literal center ``cent``,
    folded left-to-right and floor-latticed to integer NANOS (BIGINT).
    Parsed-string form for construction speed (the _pq_subdists_sql
    precedent: k x 64 stacked F.lit calls cost seconds of py4j
    round-trips); operation-identical to the Column-API fold."""
    carr = "array(" + ", ".join(_double_sql(x) for x in cent) + ")"
    return (
        f"cast(floor(aggregate(zip_with({vec_sql}, {carr}, "
        "(x, c) -> (x - c) * (x - c)), 0.0D, (acc, e) -> acc + e)"
        " * 1e9 + 0.5D) as bigint)"
    )


def kcenter_select(
    corpus: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, int, list[float]]]:
    """Greedy k-center selection (farthest-point traversal, Gonzalez
    1985) over an embedding column — the diversity-based coreset
    selection used for training-data pruning and active learning
    [Sener & Savarese, ICLR 2018]: seed with the lowest id, then k-1
    rounds of "select the point whose distance to its NEAREST already-
    selected center is largest". Returns ``[(round, id, vector)]`` with
    round 1-based and vectors as driver-side float64 lists (k x dim,
    bounded — the only rows that ever visit the driver).

    Determinism / oracle replay: per-center squared-L2 distances are
    pinned left-to-right folds floor-latticed to integer NANOS, the
    per-point nearest-center distance is an integer ``least``, the
    argmax breaks ties to the lowest id, and already-selected ids are
    excluded explicitly (so exact-duplicate vectors — all remaining
    distances 0 — still select k distinct points). The greedy
    trajectory is therefore integer-determined end to end, and the
    DuckDB oracle unrolls the identical k rounds in SQL.

    Scale: round t is ONE codegen corpus scan computing t latticed
    folds per row and ending in TakeOrderedAndProject(1) — per-partition
    top-1, a partition-count-row driver merge, no shuffle of the corpus.
    Total work is Theta(k^2/2 * N * dim) FLOPs across k-1 scans; exact
    greedy k-center cannot do fewer than k passes (each round's input
    depends on the previous pick). At 100 TB you run this over the IVF
    cell summary or a uniform sample and assign the full corpus to the
    returned centers in one extra scan (the sim_coreset_kcenter query's
    assignment leg IS that scan). Selection happens at query-construction
    time (the data-derived-literals pattern of ivf_centroids) and is
    memoized in the shared build cache under a "kcenter"-tagged key.
    """
    params = ("kcenter", k, id_col, vec_col)
    hit = _build_cache_get(corpus, params)
    if hit is not None:
        # Fresh vector lists per caller (ADVICE r11 #1): list(hit) alone
        # would share the cached mutable vectors, so a caller mutating a
        # returned vector would corrupt the memoized selection — the same
        # isolation ivf_centroids gets from hit.copy().
        return [(r, cid, list(v)) for r, cid, v in hit]

    vecs = corpus.select(
        F.col(id_col).alias("_kc_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_kc_v"),
    )
    seed_rows = vecs.orderBy("_kc_id").limit(1).collect()
    if not seed_rows:
        raise ValueError("kcenter_select: empty corpus")
    selected: list[tuple[int, int, list[float]]] = [
        (1, seed_rows[0]["_kc_id"], [float(x) for x in seed_rows[0]["_kc_v"]])
    ]
    for t in range(2, k + 1):
        dmin_terms = [_lat_sqdist_sql("_kc_v", vec) for _, _, vec in selected]
        dmin = (
            F.expr(f"least({', '.join(dmin_terms)})")
            if len(dmin_terms) > 1
            else F.expr(dmin_terms[0])
        )
        picked = (
            vecs.filter(~F.col("_kc_id").isin([cid for _, cid, _ in selected]))
            .select("_kc_id", "_kc_v", dmin.alias("_kc_dmin"))
            .orderBy(F.col("_kc_dmin").desc(), F.col("_kc_id"))
            .limit(1)
            .collect()
        )
        if not picked:
            raise ValueError(
                f"kcenter_select: corpus has fewer than k={k} distinct ids"
            )
        selected.append(
            (t, picked[0]["_kc_id"], [float(x) for x in picked[0]["_kc_v"]])
        )
    # Deep-copy on put as well: the first caller's return value must not
    # alias the cached vectors (ADVICE r11 #1).
    _build_cache_put(
        corpus, params, tuple((r, cid, tuple(v)) for r, cid, v in selected)
    )
    return selected


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 1,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    Standard two-level ANN: k-means-ish centroids partition the corpus
    into cells; each query probes only its ``n_probe`` nearest cells and
    reranks those candidates with the exact fold cosine. Centroids are
    initialized from a deterministic hash-ordered sample (md5 — portable
    to the SQL oracle) and refined with ``kmeans_iters`` Lloyd steps
    computed as DataFrame aggregations — only the k x dim centroid matrix
    ever visits the driver (same contract as distributed k-means;
    O(k*dim), independent of corpus size).

    Determinism: the Lloyd step sums floor(x*1e9 + 0.5)-scaled LONGS per
    (cell, dim) — integer addition is exact and order-independent, unlike
    a float avg whose value depends on partition merge order. The sums
    are used UNNORMALIZED as centroid directions (cosine assignment is
    scale-invariant, so dividing by the count — or by 1e9 — changes
    nothing), which makes the whole index build bit-reproducible and
    DuckDB-replayable. Corpus cell assignment is one Arrow-batched matmul
    pass; candidate generation is an equi-join on cell id. Recall < 1 by
    design; same output contract as ann_topk.
    """
    from pyspark.sql import Window

    centroids = ivf_centroids(
        corpus, n_centroids, kmeans_iters, seed, id_col=id_col, vec_col=vec_col
    )

    c_assign = _centroid_udf(centroids, 1)
    q_assign = _centroid_udf(centroids, n_probe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("corpus_vec"),
        norm2(F.col(vec_col)).alias("c_nrm"),
        c_assign(F.col(vec_col)).getItem(0).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm2(F.col(vec_col)).alias("q_nrm"),
        F.explode(q_assign(F.col(vec_col))).alias("cell"),
    )
    scored = c.join(F.broadcast(q), "cell").withColumn(
        "cos",
        dot_product(F.col("corpus_vec"), F.col("query_vec"))
        / (F.col("c_nrm") * F.col("q_nrm")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def pq_codebooks(
    m_subspaces: int = 16, n_codes: int = 16, dim: int = 64, seed: int = 11
) -> list[list[list[float]]]:
    """Seeded product-quantization codebooks: ``m_subspaces`` codebooks
    of ``n_codes`` sub-centroids over ``dim // m_subspaces`` dims each,
    scaled to the typical sub-vector norm of ~unit-norm embeddings
    (1/sqrt(m)) and rounded to 3 decimals so the literals round-trip
    exactly into SQL. Fixed seeded codebooks are the plumbing-honest
    baseline; training them on corpus residuals (the FAISS upgrade)
    changes only these constants, not the encode/ADC plan shape.
    """
    import math
    import random

    sub = dim // m_subspaces
    rng = random.Random(seed)
    books = []
    scale = 1.0 / math.sqrt(m_subspaces)
    for _ in range(m_subspaces):
        book = []
        for _ in range(n_codes):
            v = [rng.gauss(0.0, 1.0) for _ in range(sub)]
            n = math.sqrt(sum(x * x for x in v)) or 1.0
            book.append([round(x / n * scale, 3) for x in v])
        books.append(book)
    return books


def _double_sql(x: float) -> str:
    """Spark SQL double literal with the exact value of ``F.lit(x)``:
    Python ``repr`` round-trips the nearest double by construction and
    the ``D`` suffix parses it as DOUBLE, so the literal in the parsed
    plan is bit-identical to the Column-API one.

    Non-finite values would emit ``infD``/``nanD`` — a parse failure (or
    silent semantic divergence from F.lit) far from the bad centroid
    that produced them, so fail loudly here instead (ADVICE r08 #4).
    """
    x = float(x)
    if not math.isfinite(x):
        raise ValueError(f"non-finite codebook/centroid value {x!r} cannot be inlined")
    return repr(x) + "D"


def _pq_subdists_sql(vec_col: str, book: list[list[float]], offset: int, sub: int) -> str:
    """SQL text for the array of squared-L2 distances from
    ``vec[offset : offset+sub]`` to each sub-centroid, as pinned
    left-to-right Catalyst folds (the sim_kmeans_iter float policy —
    identical doubles in any engine).

    Generated as TEXT rather than stacked Column calls on purpose: the
    16x16-codebook tree is ~500 fold expressions, and building it
    through the Python Column API costs ~14 s of py4j round-trips PER
    QUERY CONSTRUCTION (sf-independent — the flat ~18 s rung in
    SCALING.md). One ``F.expr`` parse of the same operators is
    milliseconds and yields the identical analyzed plan, so every
    hash-pinned result is unchanged.

    The folds stay higher-order-function folds DELIBERATELY: expanding
    them into straight-line ``(((0.0 + (x1-c1)^2) + ...)`` arithmetic
    was measured and REJECTED — the ~4k inlined double constants blow
    janino's 64 KB method limit, and Spark then re-attempts the failed
    whole-stage compile on EVERY execution before falling back to
    interpreted eval (9.5-11 s/run vs 4 s for the fold form, which skips
    codegen cleanly since HOFs are never codegen-compiled)."""
    subvec = f"slice(transform(`{vec_col}`, x -> cast(x as double)), {offset + 1}, {sub})"
    dists = []
    for cent in book:
        carr = "array(" + ", ".join(_double_sql(x) for x in cent) + ")"
        dists.append(
            f"aggregate(zip_with({subvec}, {carr}, (x, c) -> (x - c) * (x - c)),"
            " 0.0D, (acc, e) -> acc + e)"
        )
    return "array(" + ", ".join(dists) + ")"


def pq_encode_col(vec_col: str, books: list[list[list[float]]], dim: int) -> F.Column:
    """PQ code array (one argmin sub-centroid index per subspace) as a
    pure Catalyst expression — the codebooks ride in the plan as
    literals, so encoding is a codegen scan with zero joins. Ties break
    to the lowest code (array_position returns the FIRST minimum).
    Takes the vector COLUMN NAME (float array; cast to double inside)
    and compiles via one SQL parse — see :func:`_pq_subdists_sql`."""
    sub = dim // len(books)
    codes = []
    for m, book in enumerate(books):
        d = _pq_subdists_sql(vec_col, book, m * sub, sub)
        codes.append(f"cast(array_position({d}, array_min({d})) - 1 as int)")
    return F.expr("array(" + ", ".join(codes) + ")")


def pq_encode_udf(books: list[list[list[float]]], dim: int):
    """Arrow-batched numpy PQ encode — the measured fast path of
    :func:`pq_encode_col`, bit-identical by construction.

    The fold form is ~1024 interpreted HOF ops per corpus row (16 books x
    16 codes x 4-term fold; HOFs never enter whole-stage codegen), which
    made the corpus encode the dominant execution cost of the IVF-PQ
    tier (~3.7 s of the 8.2 s sf0.1 query, VERDICT r08 #6). This UDF
    does the same arithmetic as ONE numpy broadcast per Arrow batch.

    Bit-exactness argument (the semdedup adaptive-k lesson applied in
    reverse — here we PROVE order instead of softening the claim):
    - each term is (x - c) * (x - c) on float64, the identical IEEE ops
      as the fold's zip_with lambda (float->double cast included);
    - the accumulator is built by an explicit python loop over the sub
      dimension: acc = (((0+t0)+t1)+t2)+t3 — the fold's exact op order,
      NOT np.sum (whose pairwise blocking changes association at larger
      sub sizes);
    - np.argmin returns the FIRST minimum, matching
      array_position(d, array_min(d)) tie behavior on bit-equal inputs.
    Equality to the fold path is pinned per-element in
    tests/test_dedup_similarity.py and the oracle hash-check replays the
    fold arithmetic end-to-end.

    Caveat: Spark's array_min IGNORES NaN-free ordering differences only
    when inputs are NaN-free; a NaN distance (impossible for finite
    vectors and the finite-asserted codebooks) would diverge — finite
    inputs are the operator's contract.
    """
    barr = np.asarray(books, dtype=np.float64)  # (m, codes, sub)
    m_books, _n_codes, sub = barr.shape
    if m_books * sub != dim:
        raise ValueError(f"books {barr.shape} do not tile dim={dim}")

    @F.pandas_udf("array<int>")
    def _encode(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.float64)  # (N, dim)
        v = v.reshape(len(v), m_books, 1, sub)
        t = v - barr[None, :, :, :]
        t = t * t  # (N, m, codes, sub)
        acc = np.zeros(t.shape[:3], dtype=np.float64)
        for i in range(sub):  # the fold's exact left-to-right order
            acc = acc + t[..., i]
        codes = acc.argmin(axis=2).astype(np.int32)
        return pd.Series(list(codes))

    return _encode


def pq_lut_col(vec_col: str, books: list[list[list[float]]], dim: int) -> F.Column:
    """Per-query ADC lookup table: array of ``m`` arrays of ``n_codes``
    squared-L2 distances between the query's sub-vectors and every
    sub-centroid. Computed ONCE per query row; candidate scoring then
    costs m array lookups per pair instead of a dim-length fold.
    Takes the vector COLUMN NAME and compiles via one SQL parse — see
    :func:`_pq_subdists_sql`."""
    sub = dim // len(books)
    return F.expr(
        "array("
        + ", ".join(
            _pq_subdists_sql(vec_col, book, m * sub, sub)
            for m, book in enumerate(books)
        )
        + ")"
    )


def ann_ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    m_subspaces: int = 16,
    n_codes: int = 16,
    dim: int = 64,
    refine: int = 3,
    kmeans_iters: int = 1,
    seed: int = 7,
    pq_seed: int = 11,
) -> DataFrame:
    """IVF-PQ with refine: the FAISS-style compressed ANN tier — IVF
    coarse cells prune the candidate set (equi-join on cell id, never
    all-pairs), product-quantization ADC ranks the candidates from
    ``m_subspaces`` byte codes + a per-query lookup table, and only the
    ADC top ``k * refine`` shortlist touches full vectors again for an
    exact cosine re-rank (the FAISS ``refine`` stage).

    Why this tier exists at 100 TB: the IVF tier re-reads full vectors
    for EVERY candidate (dim floats/row through the probe join); here a
    candidate moves as (id, cell, m codes) — a 16x shuffle-width
    reduction at dim=64/m=16 — per-candidate scoring is m table lookups
    instead of a dim-length fold, and full vectors are fetched for only
    k*refine rows per query. Recall trades against ``refine`` (measured
    on the uniform-random testdata, the no-cluster adversarial case:
    ADC-only ~0.36, refine=3 ~0.63, refine=8 ~0.82 before the IVF
    probe cap); the exact tiers sit beside it, recall pinned in tests.

    Determinism (hash-checkable end to end): the IVF build is the shared
    bit-reproducible :func:`ivf_centroids`; PQ codebooks are seeded
    3-decimal literals; encode/LUT distances are pinned left-to-right
    Catalyst folds; the ADC sum folds m terms left-to-right; shortlist
    ranking floor-lattices the ADC distance to integer micros with an id
    tiebreak, and the final exact rank uses the same fold cosine as the
    other tiers. The DuckDB oracle replays every step from the same
    literals.
    """
    from pyspark.sql import Window

    centroids = ivf_centroids(
        corpus, n_centroids, kmeans_iters, seed, id_col=id_col, vec_col=vec_col
    )
    books = pq_codebooks(m_subspaces, n_codes, dim, seed=pq_seed)
    encoded = ivfpq_encode_corpus(
        corpus, centroids, books, id_col=id_col, vec_col=vec_col, dim=dim
    )
    return ivfpq_probe_encoded(
        encoded,
        queries,
        centroids,
        books,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        n_probe=n_probe,
        dim=dim,
        refine=refine,
    )


def ivfpq_encode_corpus(
    corpus: DataFrame,
    centroids,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Encode vectors against a FIXED IVF-PQ index: (id, cell, codes)
    plus the original vector (kept for the refine stage). This is the
    shared encode half of :func:`ann_ivfpq_topk` and the per-micro-batch
    transform of the streaming ingest leg
    (``streaming.jobs.ivfpq_ingest_stream``) — the index (centroids +
    codebooks) is built offline, arrival encodes against it, so a store
    built incrementally is row-identical to a single batch encode."""
    c_assign = _centroid_udf(centroids, 1)
    # numpy encode (bit-identical to the pq_encode_col folds — see
    # pq_encode_udf): the interpreted-HOF encode was the tier's dominant
    # execution cost; both pandas UDFs fuse into one ArrowEval stage.
    encode = pq_encode_udf(books, dim)
    return corpus.select(
        F.col(id_col),
        c_assign(F.col(vec_col)).getItem(0).alias("cell"),
        encode(F.col(vec_col)).alias("codes"),
        F.col(vec_col),
    )


def ivfpq_probe_encoded(
    encoded: DataFrame,
    queries: DataFrame,
    centroids,
    books: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    dim: int = 64,
    refine: int = 3,
) -> DataFrame:
    """Probe an IVF-PQ-encoded corpus (``ivfpq_encode_corpus`` output —
    batch-built or accreted by the streaming store): probed-cell
    candidate join, ADC ranking from the codes, exact cosine refine of
    the top ``k * refine``. Shared by :func:`ann_ivfpq_topk` and the
    store probe, so stream-built == batch-built by construction."""
    from pyspark.sql import Window

    m_subspaces = len(books)
    q_assign = _centroid_udf(centroids, n_probe)
    corpus = encoded.select(F.col(id_col), F.col(vec_col))
    c = encoded.select(
        F.col(id_col).alias("neighbor_id"), "cell", "codes"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(q_assign(F.col(vec_col))).alias("cell"),
        pq_lut_col(vec_col, books, dim).alias("lut"),
    )
    adc = F.aggregate(
        F.expr(
            f"transform(sequence(1, {m_subspaces}),"
            " m -> element_at(element_at(lut, m), element_at(codes, m) + 1))"
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    scored = c.join(F.broadcast(q), "cell").withColumn(
        "adc_micro", F.floor(adc * 1e6 + F.lit(0.5)).cast("long")
    )
    w_adc = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    shortlist = (
        scored.withColumn("_srk", F.row_number().over(w_adc))
        .filter(F.col("_srk") <= k * refine)
        .select("query_id", "neighbor_id")
    )
    # Refine: exact fold-cosine on the tiny shortlist only (k*refine
    # vector fetches per query, not one per candidate).
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("corpus_vec"),
        norm2(F.col(vec_col)).alias("c_nrm"),
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm2(F.col(vec_col)).alias("q_nrm"),
    )
    rer = (
        shortlist.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn(
            "cos",
            dot_product(F.col("corpus_vec"), F.col("query_vec"))
            / (F.col("c_nrm") * F.col("q_nrm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / s for x in v])
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        plane_lit = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot_product(vec_col, plane_lit) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def _lsh_tables(vec_col: Column, planes: list[list[float]], k: int, tables: int) -> Column:
    """Array of (table_idx, bucket) structs - one entry per hash table.

    Built-in-expression formulation; kept for environments without Arrow.
    ann_lsh_topk uses the vectorized ``_bucket_udf`` instead: k*tables
    interpreted dot-folds per vector is the dominant cost of the LSH path
    (measured 5x slower than brute force at 2k vectors, inverting the
    whole point of bucketing).
    """
    entries = []
    for t in range(tables):
        bucket = lsh_bucket(vec_col, planes[t * k : (t + 1) * k])
        entries.append(
            F.struct(F.lit(t).alias("table_idx"), bucket.alias("bucket"))
        )
    return F.array(*entries)


def _bucket_udf(planes: list[list[float]], k: int, tables: int):
    """Arrow-batched bucket computation: one numpy matmul per batch.

    Returns a pandas_udf mapping an array<float> column to array<long> of
    ``tables`` bucket ids (bit j of table t = sign of dot with plane
    t*k+j). The plane matrix is a task-local constant (shipped in the
    serialized UDF, analogous to a broadcast variable).
    """
    from pyspark.sql.types import ArrayType, LongType

    pm = np.asarray(planes, dtype=np.float64)  # (k*tables) x dim
    weights = 1 << np.arange(k, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)  # batch x dim
        bits = (m @ pm.T >= 0).astype(np.int64)  # batch x (k*tables)
        per_table = np.stack(
            [bits[:, t * k : (t + 1) * k] @ weights for t in range(tables)], axis=1
        )  # batch x tables
        return pd.Series(list(per_table))

    return buckets


def lsh_tag_corpus(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes_per_table: int = 6,
    n_tables: int = 12,
    dim: int = 64,
    seed: int = 7,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Index side of the LSH ANN: explode a corpus into one row per
    (vector, hash table) with its bucket id and precomputed norm.

    Shared by :func:`ann_lsh_topk` (inline) and the streaming ingest leg
    (``streaming.jobs.vector_ingest_stream`` tags each micro-batch and
    appends to a persistent candidate store). The hyperplanes are derived
    from ``seed`` alone, so any two invocations — batch or per
    micro-batch — assign identical buckets, which is what makes an
    incrementally-built store interchangeable with a one-shot build.

    ``extra_keys`` columns are carried through the tag for the filtered
    tier (:func:`ann_lsh_topk_filtered`): they join the bucket key, so
    the physical layout IS a per-key partitioned index.

    Output: (neighbor_id, corpus_vec, c_nrm, *extra_keys, table_idx, bucket).
    """
    planes = _hyperplanes(planes_per_table * n_tables, dim, seed)
    buckets = _bucket_udf(planes, planes_per_table, n_tables)
    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("corpus_vec"),
        norm2(F.col(vec_col)).alias("c_nrm"),
        *[F.col(c) for c in extra_keys],
        F.posexplode(buckets(F.col(vec_col))).alias("table_idx", "bucket"),
    )


def ann_lsh_topk_tagged(
    tagged_corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes_per_table: int = 6,
    n_tables: int = 12,
    dim: int = 64,
    seed: int = 7,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Probe side of the LSH ANN over an already-tagged corpus (the
    :func:`lsh_tag_corpus` layout — inline or read back from the
    streaming ingest store). LSH params must match the tagging call so
    the query side hashes into the same buckets.

    ``extra_keys`` (matching the tagging call) join the bucket key:
    a corpus vector is a candidate only if it collides in a table AND
    agrees on every extra key — the pre-filter strategy for filtered
    vector search (filtering BEFORE ranking, so top-k is computed over
    the eligible set; post-filtering an unfiltered top-k would silently
    return < k rows whenever neighbors fail the predicate).
    """
    from pyspark.sql import Window

    planes = _hyperplanes(planes_per_table * n_tables, dim, seed)
    buckets = _bucket_udf(planes, planes_per_table, n_tables)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm2(F.col(vec_col)).alias("q_nrm"),
        *[F.col(c) for c in extra_keys],
        F.posexplode(buckets(F.col(vec_col))).alias("table_idx", "bucket"),
    )
    candidates = (
        tagged_corpus.join(F.broadcast(q), ["table_idx", "bucket", *extra_keys])
        .select("query_id", "query_vec", "q_nrm", "neighbor_id", "corpus_vec", "c_nrm")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.withColumn(
        "cos",
        dot_product(F.col("corpus_vec"), F.col("query_vec"))
        / (F.col("c_nrm") * F.col("q_nrm")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes_per_table: int = 6,
    n_tables: int = 12,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    OR-amplification: L tables of k sign bits each; a corpus vector is a
    candidate if it collides with the query in ANY table
    (P = 1-(1-(1-theta/pi)^k)^L). Single-table LSH is useless for cosine
    top-k on near-uniform vectors (measured 1% recall at 8 planes); the
    multi-table trade recovers recall while still pruning the pair space
    ~5x on uniform data (far more on clustered real-world embeddings).

    Composition of :func:`lsh_tag_corpus` (index side) and
    :func:`ann_lsh_topk_tagged` (probe side); the streaming ingest leg
    reuses the same halves over a persistent store.

    Same output contract as ann_topk; recall < 1 by design.
    """
    lsh_params = dict(
        planes_per_table=planes_per_table, n_tables=n_tables, dim=dim, seed=seed
    )
    tagged = lsh_tag_corpus(corpus, id_col=id_col, vec_col=vec_col, **lsh_params)
    return ann_lsh_topk_tagged(
        tagged, queries, k=k, id_col=id_col, vec_col=vec_col, **lsh_params
    )


def ann_lsh_topk_filtered(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_keys: tuple[str, ...] = ("label",),
    planes_per_table: int = 6,
    n_tables: int = 12,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Metadata-filtered ANN (the vector-DB "filtered search" primitive):
    each query's top-k is restricted to corpus vectors agreeing with the
    query on every ``filter_keys`` column (e.g. tenant id, language,
    label) — semantically a per-key partitioned index probed with the
    query's own key values.

    Strategy is PRE-filter, not post-filter: the filter columns join the
    LSH bucket keys, so ineligible vectors never become candidates and
    the top-k ranks over the eligible set. Post-filtering an unfiltered
    top-k under-returns whenever the true neighbors fail the predicate —
    the classic filtered-ANN correctness trap. At scale the extra equi-
    join keys also SHRINK every bucket (a bucket is per (table, bucket,
    key), not per (table, bucket)), so selective filters make the probe
    cheaper, not slower. Same rank-only output contract as ann_topk.
    """
    lsh_params = dict(
        planes_per_table=planes_per_table, n_tables=n_tables, dim=dim, seed=seed
    )
    tagged = lsh_tag_corpus(
        corpus, id_col=id_col, vec_col=vec_col, extra_keys=filter_keys, **lsh_params
    )
    return ann_lsh_topk_tagged(
        tagged,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        extra_keys=filter_keys,
        **lsh_params,
    )


def knn_join(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes_per_table: int = 5,
    n_tables: int = 20,
    dim: int = 64,
    seed: int = 7,
    bucket_cap: int = 2048,
    hold_occupancy: bool = False,
    target_bucket_rows: int = 64,
    n_rows: int | None = None,
) -> DataFrame:
    """Self kNN join: for every vector, its top-k most-cosine-similar
    OTHER vectors — the kNN-graph primitive under SemDeDup-style semantic
    clustering, kNN-LM retrieval, and label propagation. Distinct from
    :func:`ann_topk` (there a small QUERY set probes the corpus and
    broadcasts; here every corpus row is a query, so broadcasting the
    query side is the corpus itself — the LSH bucket join is the only
    formulation that scales).

    Plan shape — per-BUCKET matmul top-k, then a global merge:
    1. tag vectors into (table_idx, bucket) via seeded hyperplane sign
       bits (same family as :func:`cosine_pairs_lsh`);
    2. ``applyInPandas`` over each bucket group: one normalized matmul
       scores all pairs INSIDE the bucket and emits only each member's
       local top-(k+8) — m*k skinny rows per bucket instead of the m^2
       materialized candidate pairs of the join formulation (which
       dragged two 64-dim vectors through shuffles for every candidate;
       measured 4.2 s vs ~1.5 s at sf0.1);
    3. global per-query shortlist over the per-bucket winners — LOSSLESS
       wrt the full candidate ranking: if n is in q's candidate top-k,
       then in any bucket containing both, fewer than k candidates beat
       n, so n is in that bucket's local top-k (pigeonhole on ranks);
    4. exact fold-cosine re-score of the shortlist makes the FINAL
       ranks (the engine's cross-engine-deterministic arithmetic; the
       numpy matmul is only a pre-ranking). Final output could differ
       from fold-everything only if a true top-k neighbor sits below
       pre-rank k+8 — >= 9 candidates inside the ~1e-15-relative
       matmul-vs-fold error band, unobservable on real embeddings and
       hash-pinned by the oracle parity suite.

    Output is rank-only ``(id, neighbor_id, rnk)`` per the module's
    float-hash contract; ties break on neighbor id. Recall vs brute
    force is the LSH trade (more tables => higher recall); the SQL
    oracle replays the same buckets, so correctness-checking is exact
    even though the neighbor set is approximate.

    Hot buckets are BOUNDED, not knob-guidance: one O(buckets) size
    aggregation dispatches between the balanced fast path (whole-bucket
    matmul groups, zero split overhead) and the split path — a
    (table, bucket) group with m > ``bucket_cap`` members splits into
    C = ceil(m/cap) hash chunks and every (query-chunk, candidate-chunk)
    cell becomes its own ``applyInPandas`` group, a distributed block
    matmul. Per-task work
    and memory drop from m^2 to cap^2 and the bucket's C^2 cells spread
    across executors, so one skewed bucket can no longer pin a single
    task (the same reason salted joins beat raise-the-knob advice). The
    RESULT is unchanged: each in-bucket pair is scored in exactly one
    cell (the (chunk(a), chunk(b)) cell), and the union of per-cell
    top-(k+8)s is a superset of the per-bucket top-(k+8) (pigeonhole on
    ranks), so the global shortlist — the top-(k+8) of that union — is
    the candidate-set top-(k+8) either way. Pinned by the skewed fixture
    in tests/test_skew.py. ``planes_per_table`` remains the knob for the
    TOTAL candidate volume (L * N / 2^planes per query), which the split
    distributes but cannot shrink.

    Knob guidance: kNN neighbors are FARTHER than near-dup pairs (60-80
    degrees in typical embedding corpora vs <40 for dups), so this uses
    coarser buckets and more tables than cosine_pairs_lsh (5 planes x 20
    tables ~ 0.94/0.75 single-neighbor recall at 60/75 degrees).
    Candidates per query scale as L * N / 2^planes — raise
    planes_per_table as the corpus grows to hold the per-query candidate
    budget, spending the recall back via n_tables. ``hold_occupancy``
    automates exactly that knob (the cosine_pairs_lsh r08 pattern):
    k = max(planes_per_table, ceil(log2(N / target_bucket_rows))) from a
    cheap count, so per-query candidate volume stays ~L·target instead
    of growing with the corpus (measured slope 0.69 on the K=25 ladder
    at fixed width). The floor equals the explicit width, so every
    oracle-checked SF resolves to the same plan and the hash-pinned
    results are unchanged; the open recall trade (each extra plane
    multiplies per-table single-neighbor collision by p1) is the same
    documented LSH law — spend it back via n_tables when recall targets
    bind.
    """
    from pyspark.sql.window import Window

    if hold_occupancy:
        if n_rows is None:
            n_rows = corpus_count(vectors, id_col)
        planes_per_table = max(
            planes_per_table,
            math.ceil(math.log2(max(1.0, n_rows / target_bucket_rows))),
        )
    planes = _hyperplanes(planes_per_table * n_tables, dim, seed)
    buckets = _bucket_udf(planes, planes_per_table, n_tables)
    # Persisted: the bucket UDF pass is the dominant per-row cost, and
    # both the dispatch probe and the main path read the tagged corpus
    # (the split path a third time) — recomputing instead of caching
    # measured +0.5 s on the balanced query at sf0.1.
    tagged = vectors.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("vec"),
        F.posexplode(buckets(F.col(vec_col))).alias("table_idx", "bucket"),
    ).persist()
    kk = k + 8

    # Measured dispatch: one O(buckets) aggregation decides whether any
    # bucket actually exceeds the cap (an O(1) driver value, the
    # ann_ivf_topk centroid-collect precedent). The common balanced case
    # then skips the split machinery entirely — its sizes join + cell
    # explode + 4-key grouping measured ~35% on the whole query at sf0.1
    # where every bucket is far under the cap. The probe job doubles as
    # the cache materialization the main job reuses; its ~0.4 s is the
    # price of the at-scale guarantee and shrinks relatively with corpus
    # size (int-pair shuffle vs the main job's vector shuffles).
    sizes = tagged.groupBy("table_idx", "bucket").agg(F.count(F.lit(1)).alias("_m"))
    max_m = (sizes.agg(F.max("_m")).collect()[0][0]) or 0
    if max_m <= bucket_cap:

        def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
            ids = pdf["a_id"].to_numpy()
            if len(ids) < 2:
                return pd.DataFrame({"a_id": [], "b_id": [], "cos_np": []})
            m = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            nm = m / np.linalg.norm(m, axis=1, keepdims=True)
            g = nm @ nm.T
            np.fill_diagonal(g, -np.inf)
            take = min(kk, len(ids) - 1)
            out_a, out_b, out_c = [], [], []
            for i in range(len(ids)):
                # Deterministic local order: cos desc, neighbor id asc.
                order = np.lexsort((ids, -g[i]))[:take]
                out_a.extend([ids[i]] * take)
                out_b.extend(ids[order])
                out_c.extend(g[i][order])
            return pd.DataFrame({"a_id": out_a, "b_id": out_b, "cos_np": out_c})

        return _knn_rank(
            vectors,
            tagged.groupBy("table_idx", "bucket").applyInPandas(
                bucket_topk, "a_id long, b_id long, cos_np double"
            ),
            id_col,
            vec_col,
            k,
            kk,
        )

    # Hot-bucket split: C = ceil(m / bucket_cap) hash chunks per bucket;
    # a member is a QUERY in the C cells (its-chunk, *) and a CANDIDATE in
    # the C cells (*, its-chunk) — each in-bucket ordered pair lands in
    # exactly one cell. Bucket sizes are one tiny hash-agg, broadcast back.
    nchunks = F.ceil(F.col("_m") / F.lit(bucket_cap)).cast("int")
    base = (
        tagged.join(F.broadcast(sizes), ["table_idx", "bucket"])
        .withColumn("_nc", nchunks)
        .withColumn(
            "_ck", F.pmod(F.xxhash64("a_id", F.lit(seed)), F.col("_nc")).cast("int")
        )
    )
    # Both roles in ONE pass: build the row's full cell-membership list
    # (C query cells + C-1 candidate-only cells) as an array of structs
    # and explode once — two separate query-side/candidate-side scans
    # would re-evaluate the tagged corpus (and its bucket UDF) twice.
    seq = F.sequence(F.lit(0), F.col("_nc") - 1)
    ck = F.col("_ck")
    q_structs = F.transform(
        seq,
        lambda j: F.struct(
            ck.alias("qc"),
            j.alias("cc"),
            F.lit(True).alias("is_q"),
            (j == ck).alias("is_c"),
        ),
    )
    c_structs = F.filter(
        F.transform(
            seq,
            lambda j: F.struct(
                j.alias("qc"),
                ck.alias("cc"),
                F.lit(False).alias("is_q"),
                F.lit(True).alias("is_c"),
            ),
        ),
        lambda s: s["qc"] != ck,
    )
    roles = base.select(
        "table_idx",
        "bucket",
        "a_id",
        "vec",
        F.explode(F.concat(q_structs, c_structs)).alias("_r"),
    ).select(
        "table_idx",
        "bucket",
        "a_id",
        "vec",
        F.col("_r.qc").alias("qc"),
        F.col("_r.cc").alias("cc"),
        F.col("_r.is_q").alias("is_q"),
        F.col("_r.is_c").alias("is_c"),
    )

    def cell_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a_id": [], "b_id": [], "cos_np": []})
        q = pdf[pdf["is_q"]]
        c = pdf[pdf["is_c"]]
        if not len(q) or not len(c):
            return empty
        q_ids = q["a_id"].to_numpy()
        c_ids = c["a_id"].to_numpy()
        qm = np.stack(q["vec"].to_numpy()).astype(np.float64)
        cm = np.stack(c["vec"].to_numpy()).astype(np.float64)
        qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
        g = qn @ cn.T
        # Self never scores itself (a member is both roles iff qc == cc).
        col_of = {cid: j for j, cid in enumerate(c_ids)}
        out_a, out_b, out_c = [], [], []
        for i, qid in enumerate(q_ids):
            row = g[i]
            j = col_of.get(qid)
            if j is not None:
                row = row.copy()
                row[j] = -np.inf
            # Deterministic local order: cos desc, neighbor id asc.
            order = np.lexsort((c_ids, -row))
            take = min(kk, len(c_ids) - (0 if j is None else 1))
            order = order[:take]
            out_a.extend([qid] * take)
            out_b.extend(c_ids[order])
            out_c.extend(row[order])
        if not out_a:
            return empty
        return pd.DataFrame({"a_id": out_a, "b_id": out_b, "cos_np": out_c})

    local = roles.groupBy("table_idx", "bucket", "qc", "cc").applyInPandas(
        cell_topk, "a_id long, b_id long, cos_np double"
    )
    return _knn_rank(vectors, local, id_col, vec_col, k, kk)


def _knn_rank(
    vectors: DataFrame, local: DataFrame, id_col: str, vec_col: str, k: int, kk: int
) -> DataFrame:
    """knn_join's shared tail: global shortlist over the per-group
    winners (a pair found in several groups carries the same pre-score,
    so any copy survives the dedup; the shortlist is lossless wrt the
    candidate ranking by rank pigeonhole), then the exact fold-cosine
    re-score that makes the FINAL ranks."""
    from pyspark.sql.window import Window

    w_pre = Window.partitionBy("a_id").orderBy(F.col("cos_np").desc(), F.col("b_id"))
    shortlist = (
        local.dropDuplicates(["a_id", "b_id"])
        .withColumn("_r0", F.row_number().over(w_pre))
        .filter(F.col("_r0") <= kk)
    )
    withn = vectors.select(
        F.col(id_col), F.col(vec_col), norm2(F.col(vec_col)).alias("nrm")
    )
    rescored = (
        shortlist.join(
            withn.select(
                F.col(id_col).alias("a_id"),
                F.col(vec_col).alias("vec_a"),
                F.col("nrm").alias("nrm_a"),
            ),
            "a_id",
        )
        .join(
            withn.select(
                F.col(id_col).alias("b_id"),
                F.col(vec_col).alias("vec_b"),
                F.col("nrm").alias("nrm_b"),
            ),
            "b_id",
        )
        .withColumn(
            "cos",
            dot_product(F.col("vec_a"), F.col("vec_b"))
            / (F.col("nrm_a") * F.col("nrm_b")),
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.col("cos").desc(), F.col("b_id"))
    return (
        rescored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("a_id").alias(id_col), F.col("b_id").alias("neighbor_id"), "rnk")
    )
