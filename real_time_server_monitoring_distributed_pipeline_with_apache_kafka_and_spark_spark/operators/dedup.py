"""Deduplication operators for large-scale corpus curation.

Beyond the reference's surface (its only dedup-adjacent invariant is the
unique ``(ts, server_id)`` key, SURVEY.md SS1.1): exact dedup, n-gram
Jaccard near-dup via an inverted shingle index, MinHash-LSH, and SimHash.

Scale design (100 TB corpus):
- Everything is joins + aggregations on hashed keys - no driver-side state,
  no collect. The inverted-index join shuffles on the shingle hash; hot
  shingles (stopword runs) can be dropped via ``max_shingle_freq`` to bound
  the quadratic blowup inside a bucket, the standard trade at corpus scale.
- MinHash signatures are computed in ONE hash-aggregate pass (wide min()
  columns, whole-stage codegen) rather than per-permutation passes; LSH
  banding turns all-pairs into an equi-join on (band, band_hash). Hashes
  are md5-derived (engine-portable) so the SQL oracles replay every
  pipeline exactly.
- Candidate pairs are verified with exact Jaccard, so LSH/SimHash recall
  tuning only affects which pairs are *found*, never their reported scores.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: universal-hash modulus small enough that
# a_i * base < 2^62 never overflows int64 (Spark 4 ANSI mode makes long
# overflow an error, not a wrap).
_MERSENNE = (1 << 31) - 1


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: one representative (min id) per duplicate group.

    Deterministic counterpart of ``dropDuplicates`` (whose surviving row is
    arbitrary): group on the content key, keep the smallest id. A single
    hash-aggregate; at scale this is the cheapest dedup and the baseline for
    everything fancier.
    """
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
    )


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle) rows.

    Tokenization = lowercase + whitespace split. Documents with fewer than
    ``n`` tokens produce no shingles (consistent with the SQL oracle).

    The token array is materialized as its own projection BEFORE the
    shingle lambda: higher-order functions are interpreted (no codegen /
    subexpression elimination), so referencing the split() expression
    inside the lambda re-tokenizes the document once per shingle position
    — measured 13x slower on the testdata corpus.
    """
    toks = df.select(
        F.col(id_col), F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_toks")
    ).filter(F.size("_toks") >= n)
    tc = F.col("_toks")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(tc) - n),
        lambda i: F.concat_ws(" ", F.slice(tc, i + 1, n)),
    )
    return toks.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def jaccard_pairs(
    shingled: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity >= threshold via prefix filtering.

    PPJoin-style set-similarity join: rank each doc's shingles by global
    document frequency (rarest first, ties broken by shingle string — one
    total order for all docs), keep only the ``n - ceil(t*n) + 1`` rarest
    as the doc's *prefix*; any pair with Jaccard >= t must share a prefix
    shingle, so the inverted-index join runs over prefixes only. Hot
    boilerplate shingles rank last and never enter a prefix, which removes
    the df^2 blowup that makes the naive self-join quadratic at corpus
    scale. A size-ratio filter (t*|A| <= |B| <= |A|/t) prunes candidates
    before exact verification via set intersection, so the OUTPUT is
    identical to the naive all-pairs join — lossless, not approximate.
    ``max_shingle_freq`` optionally drops ultra-hot shingles entirely
    (approximation knob; None = exact).
    Output: (a_id, b_id, common, jaccard) with a_id < b_id.

    Caching contract: the shingle table is ``persist()``-ed (it feeds ~6
    plan branches) and stays cached after the returned plan materializes.
    Long-lived sessions must release it — ``spark.catalog.clearCache()``
    between queries, or ``unpersist()`` on the input after consuming the
    result.
    """
    from pyspark.sql import Window

    # The plan below references the shingle table from ~6 branches
    # (ranking, both join sides, both verification sides); persist it
    # so shingling runs once, not per branch (MEMORY_AND_DISK: spills
    # instead of OOM at corpus scale — the standard reuse pattern).
    shingled = shingled.persist()
    # Shingle document frequency and per-doc shingle count as WINDOW
    # aggregates instead of groupBy+join-back (r15 optimization, guide
    # §2.3/§2.4): the old freq agg + sh⋈freq equi-join shuffled the full
    # shingle table TWICE on `shingle` (agg input + join probe side) and
    # the sizes agg + join added a third full-table pass on `id_col`;
    # count() OVER (PARTITION BY shingle) computes the identical df with
    # ONE exchange, and the n_shingles count rides the rank window's
    # existing id_col exchange as a second Window pass (same partitioning,
    # no new shuffle). Measured at sf0.1: 8 exchanges -> 6, 14 joins -> 6,
    # pair output bit-identical (df per surviving shingle is unchanged by
    # the freq cap: the cap drops whole shingle GROUPS, never group rows).
    # REGIME-SPLIT r16 (ADVICE r15 #1): the shingle key is unbounded-hot
    # when no freq cap is set (stopword runs), and a window partition
    # cannot be skew-split — above the hot-key input threshold the
    # freq-agg + join-back returns (map-side hot-key collapse,
    # AQE-splittable probe). Same df values; pinned by test. The id_col
    # windows below are NOT split: a per-doc partition is bounded by
    # document length at any corpus size.
    from ..functions.scale import hot_key_agg_mode

    if hot_key_agg_mode(shingled) == "window":
        sh = shingled.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
    else:
        freq = shingled.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = shingled.join(freq, "shingle")
    if max_shingle_freq is not None:
        sh = sh.filter(F.col("df") <= max_shingle_freq)
    ranked = sh.withColumn(
        "rk",
        F.row_number().over(Window.partitionBy(id_col).orderBy("df", "shingle")),
    ).withColumn("n_shingles", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    prefix = ranked.filter(
        F.col("rk") <= F.col("n_shingles") - F.ceil(F.lit(threshold) * F.col("n_shingles")) + 1
    ).select(id_col, "shingle", "n_shingles")

    a = prefix.select(F.col(id_col).alias("a_id"), "shingle", F.col("n_shingles").alias("n_a"))
    b = prefix.select(F.col(id_col).alias("b_id"), "shingle", F.col("n_shingles").alias("n_b"))
    candidates = (
        a.join(b, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.col("n_b") >= F.lit(threshold) * F.col("n_a"))
        .filter(F.col("n_a") >= F.lit(threshold) * F.col("n_b"))
        .select("a_id", "b_id")
        .distinct()
    )

    # Exact-verify sets come from the CACHED shingle table directly when
    # no freq cap filters rows — reading `sh` would re-run the df window
    # for a column the set aggregate never uses.
    sets_src = shingled if max_shingle_freq is None else sh
    doc_sets = sets_src.groupBy(id_col).agg(F.collect_set("shingle").alias("sh_set"))
    return (
        candidates.join(
            doc_sets.select(F.col(id_col).alias("a_id"), F.col("sh_set").alias("sh_a")), "a_id"
        )
        .join(doc_sets.select(F.col(id_col).alias("b_id"), F.col("sh_set").alias("sh_b")), "b_id")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("common") / (F.size("sh_a") + F.size("sh_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "common", "jaccard")
    )


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
    small_edge_limit: int = 200_000,
) -> DataFrame:
    """Connected components over an undirected pair graph via iterative
    min-label propagation with pointer doubling: every vertex's cluster
    id converges to the minimum id reachable from it.

    This is the transitive piece a dedup pipeline needs on top of a
    pair join: near-dup similarity is not transitive, but the KEEP/DROP
    decision must be (if A~B and B~C, dropping B and C against separate
    representatives double-counts) — so production dedup clusters the
    pair graph and keeps one representative (the min id) per component.

    Each round does two label-table joins, both plain shuffle joins —
    data never reaches the driver (the only driver-side value is the
    per-iteration convergence flag):
    1. neighbor propagation: label(u) <- min(label(u), min over
       neighbors v of label(v)) — one hop along edges;
    2. pointer doubling: label(u) <- label(label(u)) — labels are
       themselves vertex ids, so following the label's label halves the
       remaining distance to the component minimum every round
       [shortcutting, as in Kiveris et al., "Connected Components in
       MapReduce and Beyond"]. A path graph converges in O(log diameter)
       rounds instead of O(diameter) — max_iter=20 covers components of
       diameter ~2^19, far beyond any real near-dup graph.

    ``localCheckpoint`` cuts lineage each round so plans stay flat.
    If the loop exhausts ``max_iter`` without converging the function
    RAISES rather than returning partially propagated (silently wrong)
    labels.

    ``edges``: (a_id, b_id) pairs. ``vertices``: all ids (isolated
    vertices become singleton clusters). Output: (id_col, cluster_id).
    """
    # Materialize the edge list ONCE, then symmetrize FROM the
    # checkpoint: ``edges`` is usually a live plan (e.g. the whole
    # shingle->prefix->verify pair pipeline), and without the checkpoint
    # every iteration would re-execute it from scratch — measured 10.1s
    # -> ~3s for dedup_clusters at sf0.1. Checkpointing BEFORE the union
    # matters too: a union of two references to the live plan executes
    # the pair pipeline once per branch (ReusedExchange recovers only
    # the exchange-rooted subtrees) — measured 159s vs 129s + 0.8s on
    # an 88M-candidate LSH pipeline at ladder rung K=25 (r11).
    one_dir = edges.select(
        F.col("a_id").alias("u"), F.col("b_id").alias("v")
    ).localCheckpoint()
    sym = one_dir.unionByName(
        one_dir.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # The loop runs on the edge-TOUCHED subgraph only: a vertex with no
    # edges is its own singleton cluster and can never change, so carrying
    # the full corpus through every per-round join is pure waste — in a
    # real dedup corpus near-dup endpoints are a small fraction of all
    # documents, so this bounds every iterative shuffle by the pair count
    # instead of the corpus size. Isolated vertices rejoin at the end via
    # one left join + coalesce(label, own id).
    #
    # Init folds the FIRST propagation round in: label(u) = min(u, N(u))
    # is exactly what round 0 computes from identity labels, and the
    # groupBy doubles as the distinct() over touched vertices — one round
    # (two joins + a convergence check) saved for the same shuffle count.
    # SMALL-GRAPH FAST PATH: each distributed round costs ~4 scheduled
    # jobs (two joins, a checkpoint, a convergence probe) — pure fixed
    # overhead when the edge-touched subgraph fits in driver memory. A
    # bounded collect (same class as the k x dim centroid/codebook
    # collects elsewhere) + union-find produces the IDENTICAL min-label
    # result in one pass; the distributed loop remains the path for
    # graphs above the threshold. At 100 TB a near-dup edge set small
    # enough to trip this gate is common (edges ~ duplicates, not
    # corpus), and when it isn't, nothing changes. Measured: the
    # isolated CC stage drops ~2s -> ~0.2s at sf0.1 (256-pair graph);
    # end-to-end query time barely moves there because the pair
    # PIPELINE dominates — the win is the removed per-round job
    # overhead, which scales with rounds, not data.
    # (``small_edge_limit=0`` forces the distributed path — used by the
    # non-convergence contract test, and the valve if driver memory is
    # ever tighter than the default gate assumes.)
    n_sym = sym.count()
    if n_sym <= small_edge_limit:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in sym.collect():
            u, v = row[0], row[1]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        comp_min: dict = {}
        for x in parent:
            r = find(x)
            m = comp_min.get(r)
            if m is None or x < m:
                comp_min[r] = x
        rows = [(x, comp_min[find(x)]) for x in parent]
        spark = vertices.sparkSession
        labels = spark.createDataFrame(rows, f"u {_id_sql_type(vertices, id_col)}, cluster_id {_id_sql_type(vertices, id_col)}")
        return vertices.select(F.col(id_col)).join(
            F.broadcast(labels.select(F.col("u").alias(id_col), "cluster_id")),
            id_col,
            "left",
        ).select(
            id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")
        )
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_nbr_min"))
        .select("u", F.least(F.col("u"), F.col("_nbr_min")).alias("cluster_id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("u").alias("v"), F.col("cluster_id").alias("nbr_label")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("nbr_label").alias("nbr_min"))
        )
        # The pre-round label rides along as _old so the convergence
        # check is a filter on the (already materialized) checkpoint
        # instead of an extra join against the previous label table.
        propagated = labels.join(nbr_min, "u", "left").select(
            "u",
            F.col("cluster_id").alias("_old"),
            F.least(
                F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
            ).alias("cluster_id"),
        )
        # Pointer doubling: a label is a vertex id, so every vertex can
        # jump to its label's label. Labels only decrease, so the inner
        # join on the (complete) vertex set is total and least() keeps
        # monotonicity explicit.
        new_labels = (
            propagated.join(
                propagated.select(
                    F.col("u").alias("cluster_id"),
                    F.col("cluster_id").alias("_jump"),
                ),
                "cluster_id",
            )
            .select("u", "_old", F.least("cluster_id", "_jump").alias("cluster_id"))
            .localCheckpoint()
        )
        changed = (
            new_labels.filter(F.col("cluster_id") != F.col("_old")).limit(1).count()
        )
        labels = new_labels.drop("_old")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; the graph has an extreme-diameter component — raise "
            "max_iter (rounds needed ~ log2(diameter) + a few)"
        )
    # Re-attach isolated vertices as singletons. The converged label table
    # is pair-graph-sized (small), so AQE broadcasts it against the full
    # vertex set — the corpus-sized side never shuffles.
    return vertices.select(F.col(id_col)).join(
        labels.select(F.col("u").alias(id_col), "cluster_id"), id_col, "left"
    ).select(
        id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")
    )


def _id_sql_type(vertices: DataFrame, id_col: str) -> str:
    """SQL type name of the vertex id column, so the small-graph label
    frame round-trips ids (long today, string-capable) without casts."""
    return dict(vertices.dtypes)[id_col]


def _perm_coeffs(num_perm: int, seed: int = 42) -> tuple[list[int], list[int]]:
    rng = random.Random(seed)
    return (
        [rng.randrange(1, _MERSENNE) for _ in range(num_perm)],
        [rng.randrange(0, _MERSENNE) for _ in range(num_perm)],
    )


def minhash_signatures(
    shingled: DataFrame, id_col: str = "doc_id", num_perm: int = 64, seed: int = 42
) -> DataFrame:
    """MinHash signature per document, one hash-aggregate pass.

    base = pmod(xxhash64(shingle), 2^31-1); the Mersenne modulus must stay
    2^31-1 (NOT 2^61-1): a_i * base must fit int64, and Spark 4 ANSI mode
    turns long overflow into a runtime error. h_i = (a_i*base + b_i) mod p as
    ``num_perm`` wide min() aggregates (codegen'd, map-side partial agg) -
    no per-permutation shuffle. Output: (id, h0..h{P-1}).
    """
    a_co, b_co = _perm_coeffs(num_perm, seed)
    # Base hash: md5-derived 32-bit value (NOT xxhash64) — md5 is
    # implemented identically in every engine, which is what makes the
    # whole MinHash-LSH pipeline oracle-checkable in DuckDB (the reason
    # text.rolling_hash made the same choice). Projected ONCE below the
    # aggregate: declarative agg expressions get no common-subexpression
    # elimination, so inlining would hash every shingle num_perm times.
    based = shingled.select(
        F.col(id_col),
        F.pmod(
            F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long"),
            F.lit(_MERSENNE),
        ).alias("_h64"),
    )
    # One SQL parse per permutation aggregate (r09 construction-cost
    # fix, the drift_sum_exprs pattern): integer min/pmod arithmetic is
    # form-independent, signatures unchanged.
    mins = [
        F.expr(f"min(pmod(_h64 * {a_co[i]} + {b_co[i]}, {_MERSENNE}))").alias(f"h{i}")
        for i in range(num_perm)
    ]
    return based.groupBy(id_col).agg(*mins)


def minhash_lsh_pairs(
    shingled: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 48,
    bands: int = 12,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH banding, verified with exact Jaccard.

    12 bands x 4 rows: P(candidate) = 1-(1-s^4)^12 (~99.8% at s=0.8,
    higher above; r02 ran 16x4 at ~99.98% — the extra third of signature
    work bought 0.2pp of boundary recall, and the pinned recall bound
    (>=95%, tests/test_dedup_similarity.py) holds with margin at 12).
    Candidates = equi-join on the band's raw signature tuple; each
    surviving pair is re-scored with exact Jaccard so the output contains
    no LSH approximation error, only (probabilistically bounded) missed
    pairs.

    Caching contract: same as :func:`jaccard_pairs` — the shingle table
    stays ``persist()``-ed after materialization; long-lived sessions call
    ``spark.catalog.clearCache()`` (as bench.py does) or ``unpersist()``.

    The signature aggregate and the exact-verify ``collect_set`` aggregate
    stay SEPARATE on purpose: fusing them into one groupBy was measured
    SLOWER (cold 4.5s vs 3.5s at sf0.1) because ``collect_set`` forces the
    whole aggregate onto ObjectHashAggregateExec, which has no whole-stage
    codegen — the ``num_perm`` min() expressions then evaluate interpreted.
    Split, the signature pass stays a codegen'd HashAggregate and only the
    set-building pays the object-aggregate path.
    """
    # Referenced by the signature pass and the verification branch.
    shingled = shingled.persist()
    sig = minhash_signatures(shingled, id_col, num_perm, seed)
    candidates = _minhash_band_candidates(sig, id_col, num_perm, bands)
    # word_shingles emits distinct shingles per doc, so count == |set| and
    # collect_set is lossless.
    doc_sets = shingled.groupBy(id_col).agg(
        F.collect_set("shingle").alias("sh"),
        F.count(F.lit(1)).alias("n"),
    )
    return _jaccard_verify_candidates(candidates, doc_sets, id_col, threshold)


def _minhash_band_candidates(
    sig: DataFrame, id_col: str, num_perm: int, bands: int
) -> DataFrame:
    """Banded LSH candidate generation over a signature table: explode
    each signature into (band_idx, k0..k{r-1}) rows and self-equi-join on
    the band tuple. Shared by the inline batch pipeline and the
    streaming-store probe — identical candidates by construction.

    Band key = the raw row values (band_idx, k0..k{r-1}); joining on the
    tuple is candidate-identical to an md5(concat_ws(...)) band hash
    (equality of the tuple <=> equality of the hash) and skips the
    hashing entirely. Integer keys also hash/compare faster than 16-char
    hex strings did.
    """
    band_rows, key = _band_rows(sig, id_col, num_perm, bands)
    a = band_rows.select(F.col(id_col).alias("a_id"), *key)
    b = band_rows.select(F.col(id_col).alias("b_id"), *key)
    return (
        a.join(b, key)
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def _band_rows(sig: DataFrame, id_col: str, num_perm: int, bands: int):
    """Explode a signature table into (id, band_idx, k0..k{r-1}) rows;
    returns (band_rows, join_key_columns)."""
    rows_per_band = num_perm // bands
    band_rows = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        *[
                            F.col(f"h{bi * rows_per_band + r}").alias(f"k{r}")
                            for r in range(rows_per_band)
                        ],
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.*")
    return band_rows, ["band_idx"] + [f"k{r}" for r in range(rows_per_band)]


def minhash_lsh_pairs_cross(
    shingled_new: DataFrame,
    shingled_ref: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 48,
    bands: int = 12,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """CROSS-corpus MinHash near-dup: new documents vs an existing
    reference corpus — "dedup this crawl against the training set we
    already have", the decontamination-shaped workflow where dropping
    happens only on the NEW side.

    Same banding as :func:`minhash_lsh_pairs`, but the band equi-join is
    new x ref ONLY (no a<b self-join, no within-side candidates — with a
    small incremental crawl against a huge reference corpus the
    within-side pairs would dominate a union self-join for nothing).
    Shingle ids must be disjoint across the two inputs. Output:
    (new_id, ref_id, jaccard), exact-verified >= threshold.

    Caching contract: both shingle tables stay persist()-ed (each feeds
    signature + verification branches); clearCache()/unpersist() after.
    """
    shingled_new = shingled_new.persist()
    shingled_ref = shingled_ref.persist()
    sig_n = minhash_signatures(shingled_new, id_col, num_perm, seed)
    sig_r = minhash_signatures(shingled_ref, id_col, num_perm, seed)
    bn, key = _band_rows(sig_n, id_col, num_perm, bands)
    br, _ = _band_rows(sig_r, id_col, num_perm, bands)
    candidates = (
        bn.select(F.col(id_col).alias("new_id"), *key)
        .join(br.select(F.col(id_col).alias("ref_id"), *key), key)
        .select("new_id", "ref_id")
        .distinct()
    )

    def sets(df: DataFrame, out_id: str) -> DataFrame:
        return df.groupBy(id_col).agg(
            F.collect_set("shingle").alias(f"sh_{out_id}"),
            F.count(F.lit(1)).alias(f"n_{out_id}"),
        ).withColumnRenamed(id_col, out_id)

    return (
        candidates.join(sets(shingled_new, "new_id"), "new_id")
        .join(sets(shingled_ref, "ref_id"), "ref_id")
        .withColumn("common", F.size(F.array_intersect("sh_new_id", "sh_ref_id")))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_new_id") + F.col("n_ref_id") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "ref_id", "jaccard")
    )


def _jaccard_verify_candidates(
    candidates: DataFrame, doc_sets: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against per-doc
    shingle sets (columns ``id_col, sh, n``). Verifies ONLY the candidate
    pairs (cost O(|candidates| * set size)) — never the inverted-index
    all-pairs join, which is exactly the quadratic blowup LSH exists to
    avoid. Output: (a_id, b_id, jaccard >= threshold)."""
    return (
        candidates.join(
            doc_sets.select(
                F.col(id_col).alias("a_id"), F.col("sh").alias("sh_a"), F.col("n").alias("n_a")
            ),
            "a_id",
        )
        .join(
            doc_sets.select(
                F.col(id_col).alias("b_id"), F.col("sh").alias("sh_b"), F.col("n").alias("n_b")
            ),
            "b_id",
        )
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard", F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def minhash_profiles(
    shingled: DataFrame, id_col: str = "doc_id", num_perm: int = 48, seed: int = 42
) -> DataFrame:
    """Per-document MinHash PROFILE: signature columns h0..h{P-1} plus the
    exact shingle set (``sh``) and its size (``n``) in one row — everything
    a later near-dup probe needs, with no re-scan of the raw text.

    This is the persistable unit of incremental MinHash dedup: the
    streaming ingest leg (``streaming.jobs.minhash_ingest_stream``) writes
    one profile row per document per micro-batch, and
    :func:`minhash_lsh_pairs_from_profiles` probes the accumulated store.
    Because signatures are seed-derived and the shingle set is exact, a
    store built incrementally is row-identical to one built in a single
    batch pass over the union corpus.

    The signature aggregate and the shingle-set aggregate stay SEPARATE
    (joined on ``id_col`` afterwards) for the codegen reason documented in
    :func:`minhash_lsh_pairs` — fusing them forces the whole aggregate
    onto ObjectHashAggregateExec.
    """
    shingled = shingled.persist()
    sig = minhash_signatures(shingled, id_col, num_perm, seed)
    doc_sets = shingled.groupBy(id_col).agg(
        F.collect_set("shingle").alias("sh"),
        F.count(F.lit(1)).alias("n"),
    )
    return sig.join(doc_sets, id_col)


def minhash_lsh_pairs_from_profiles(
    profiles: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 48,
    bands: int = 12,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs over an already-profiled corpus (the
    :func:`minhash_profiles` layout — inline or read back from the
    streaming ingest store): banded candidate join on the stored
    signatures + exact-Jaccard verify on the stored shingle sets.

    Pair-identical to :func:`minhash_lsh_pairs` on the same corpus
    (pinned by tests/test_streaming.py::test_minhash_ingest_stream_
    matches_batch): both run the same candidate generation and the same
    verification, just from persisted columns instead of a live shingle
    scan. ``num_perm``/``bands`` must match the profiling call.

    Caching contract: same as :func:`minhash_lsh_pairs` — the profile
    table stays ``persist()``-ed after materialization (it feeds the
    banding and verification branches); long-lived sessions release it
    via ``spark.catalog.clearCache()`` or ``unpersist()``.
    """
    profiles = profiles.persist()
    sig = profiles.select(id_col, *[f"h{i}" for i in range(num_perm)])
    candidates = _minhash_band_candidates(sig, id_col, num_perm, bands)
    doc_sets = profiles.select(id_col, "sh", "n")
    return _jaccard_verify_candidates(candidates, doc_sets, id_col, threshold)


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document as TWO md5-derived 32-bit halves.

    Word features are the two 32-bit halves of md5(word) — the
    engine-portable hash family (see minhash_signatures) that lets the
    DuckDB oracle replay the pipeline bit-for-bit; keeping the halves as
    separate positive longs also avoids int64 sign games (bit 63) in
    BOTH engines. bit_j(sig) = sign(sum over words of +-1 on feature bit
    j), computed as 64 wide sum() aggregates in one aggregation pass.

    Output: (id, sig_lo, sig_hi) — bits 0..31 and 32..63.
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"),
    )
    digest = F.md5("word")
    based = words.select(
        F.col(id_col),
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long").alias("hlo"),
        F.conv(F.substring(digest, 9, 8), 16, 10).cast("long").alias("hhi"),
    )
    # Each bit-sum aggregate and each 32-term signature fold compiles via
    # one SQL parse (r09 construction-cost fix, the drift_sum_exprs
    # pattern — the stacked-Column form was ~770 py4j round-trips per
    # query construction). Integer CASE/sum arithmetic is
    # form-independent, so signatures — and every hash-pinned pair — are
    # unchanged.
    bit_sums = [
        F.expr(
            f"sum(case when (shiftright({col}, {j}) & 1) = 1 then 1 else -1 end)"
        ).alias(f"{pre}{j}")
        for col, pre in (("hlo", "lo"), ("hhi", "hi"))
        for j in range(32)
    ]
    agg = based.groupBy(id_col).agg(*bit_sums)

    def fold(prefix: str):
        terms = " + ".join(
            f"(case when {prefix}{j} > 0 then cast({1 << j} as bigint)"
            " else cast(0 as bigint) end)"
            for j in range(32)
        )
        return F.expr(terms)

    return agg.select(F.col(id_col), fold("lo").alias("sig_lo"), fold("hi").alias("sig_hi"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    n_chunks: int = 8,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= max_hamming, via
    :func:`hamming64_pairs` over :func:`simhash_signatures`."""
    return hamming64_pairs(
        simhash_signatures(df, id_col, text_col), id_col, max_hamming, n_chunks
    )


def hamming64_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 6,
    n_chunks: int = 8,
    group_signatures: bool = False,
) -> DataFrame:
    """Pairs within hamming distance <= max_hamming over ANY 64-bit
    signature table ``(id_col, sig_lo, sig_hi)`` — shared by SimHash text
    near-dup and the multimodal image aHash (operators.multimodal
    .image_ahash): the signature family differs, the banding math
    doesn't.

    Candidate generation: split the 64-bit signature (two 32-bit halves)
    into ``n_chunks`` equal chunks; a pair within hamming distance <
    n_chunks shares at least one exact chunk (pigeonhole), so candidates
    = equi-join per chunk - no all-pairs scan. Hamming distance is the
    sum of the two halves' popcounts of XOR — all arithmetic on positive
    longs, portable to the SQL oracle.

    ``group_signatures`` — SIGNATURE-GROUPED banding (r12, VERDICT r11
    #4, the occupancy-held treatment): the band join runs over the
    DISTINCT signature table, then qualifying signature pairs expand
    back to member pairs through two equi-joins. This is a REGIME
    choice, declared by the caller, measured both ways at the K=25
    ladder rung:

    - SATURATING signature space (the a-hash family: 125k docs collapse
      to ~8.3k distinct sigs) → grouped wins big: the id-level join
      churned 8×256 buckets × C(488,2) ≈ 244M duplicate-signature
      candidates to emit 3.6M true pairs (25.6 s); grouped banding is
      bounded by the frozen distinct-sig count and the expansion
      materializes exactly the true pair mass (5.1 s, ~flat per rung).
    - HIGH-ENTROPY signatures (md5-derived SimHash: distinct sigs ≈ N)
      → grouped LOSES ~3×: the distinct table is the id table, so the
      band join shrinks not at all while the extra distinct agg, the
      persist materialization, and two expansion joins are pure
      overhead (measured 4.5 → 13 s at K=5).

    Output is identical either way (same (a_id < b_id, hamming) set),
    so callers' oracles replay unchanged whichever path they pick.
    """
    assert max_hamming < n_chunks, "pigeonhole guarantee needs max_hamming < n_chunks"
    assert n_chunks % 2 == 0, "chunks split evenly across the two halves"
    per_half = n_chunks // 2
    chunk_bits = 32 // per_half
    mask = (1 << chunk_bits) - 1

    def chunk_expr(c: int):
        src = F.col("sig_lo") if c < per_half else F.col("sig_hi")
        off = (c if c < per_half else c - per_half) * chunk_bits
        return F.struct(
            F.lit(c).alias("chunk_idx"),
            F.shiftright(src, off).bitwiseAND(F.lit(mask)).alias("chunk"),
        )

    if not group_signatures:
        # id-level banding: one pass over (id, sig) × n_chunks, per-chunk
        # self equi-join, dedup, popcount filter. Right when duplicate-
        # signature mass is low (distinct sigs ≈ N).
        chunks = sig.select(
            F.col(id_col),
            F.col("sig_lo"),
            F.col("sig_hi"),
            F.explode(F.array(*[chunk_expr(c) for c in range(n_chunks)])).alias("ch"),
        ).select(id_col, "sig_lo", "sig_hi", "ch.chunk_idx", "ch.chunk")
        a = chunks.select(
            F.col(id_col).alias("a_id"),
            F.col("sig_lo").alias("alo"),
            F.col("sig_hi").alias("ahi"),
            "chunk_idx",
            "chunk",
        )
        b = chunks.select(
            F.col(id_col).alias("b_id"),
            F.col("sig_lo").alias("blo"),
            F.col("sig_hi").alias("bhi"),
            "chunk_idx",
            "chunk",
        )
        return (
            a.join(b, ["chunk_idx", "chunk"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", "alo", "ahi", "blo", "bhi")
            .distinct()
            .withColumn(
                "hamming",
                F.bit_count(F.col("alo").bitwiseXOR(F.col("blo")))
                + F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi"))),
            )
            .filter(F.col("hamming") <= max_hamming)
            .select("a_id", "b_id", "hamming")
        )

    # The signature table is read by THREE branches below (distinct-sig
    # band join + both member-expansion sides); unpersisted, each branch
    # re-executes the upstream signature computation — a (real) image
    # decode (the connected_components live-plan lesson). Multi-branch
    # persist convention; release via caching.released().
    sig = sig.persist()

    distinct_sigs = sig.select("sig_lo", "sig_hi").distinct()
    chunks = distinct_sigs.select(
        "sig_lo",
        "sig_hi",
        F.explode(F.array(*[chunk_expr(c) for c in range(n_chunks)])).alias("ch"),
    ).select("sig_lo", "sig_hi", "ch.chunk_idx", "ch.chunk")
    a = chunks.select(
        F.col("sig_lo").alias("alo"),
        F.col("sig_hi").alias("ahi"),
        "chunk_idx",
        "chunk",
    )
    b = chunks.select(
        F.col("sig_lo").alias("blo"),
        F.col("sig_hi").alias("bhi"),
        "chunk_idx",
        "chunk",
    )
    # Canonical unordered signature pairs, INCLUDING the identity pair —
    # it carries the hamming-0 mass of duplicate signatures.
    sig_pairs = (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(
            (F.col("alo") < F.col("blo"))
            | ((F.col("alo") == F.col("blo")) & (F.col("ahi") <= F.col("bhi")))
        )
        .withColumn(
            "hamming",
            F.bit_count(F.col("alo").bitwiseXOR(F.col("blo")))
            + F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi"))),
        )
        # hamming filter BEFORE the dedup shuffle: bit math is free,
        # shuffled rows are not.
        .filter(F.col("hamming") <= max_hamming)
        .select("alo", "ahi", "blo", "bhi", "hamming")
        .distinct()
    )
    ma = sig.select(
        F.col(id_col).alias("_ma_id"),
        F.col("sig_lo").alias("alo"),
        F.col("sig_hi").alias("ahi"),
    )
    mb = sig.select(
        F.col(id_col).alias("_mb_id"),
        F.col("sig_lo").alias("blo"),
        F.col("sig_hi").alias("bhi"),
    )
    same_sig = (F.col("alo") == F.col("blo")) & (F.col("ahi") == F.col("bhi"))
    return (
        sig_pairs.join(ma, ["alo", "ahi"])
        .join(mb, ["blo", "bhi"])
        # identity signature pair: each unordered member pair appears as
        # both (x,y) and (y,x) plus the diagonal — keep x < y once.
        .filter(~same_sig | (F.col("_ma_id") < F.col("_mb_id")))
        .select(
            F.least("_ma_id", "_mb_id").alias("a_id"),
            F.greatest("_ma_id", "_mb_id").alias("b_id"),
            "hamming",
        )
    )


class SignatureSaturationWarning(UserWarning):
    """A 64-bit signature space is saturating on this corpus — the
    hamming<=t pair output (and cost) will grow ~quadratically with the
    corpus, in ANY engine."""


def estimate_signature_collision_rate(
    sig: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 6,
    sample: int = 1024,
) -> float:
    """p-hat = P(two random signatures from this corpus land within
    hamming <= max_hamming), from a bounded sample.

    The r09 scale ladder's a-hash lesson (SCALING.md, slopes 0.94/1.12)
    made operational: on a low-entropy corpus the 64-bit perceptual-hash
    space SATURATES (6,015 distinct signatures at 25k docs on the
    synthetic byte stream), so hamming<=t collision mass — and therefore
    pair output — grows ~C(N,2)*p-hat = Theta(N^2) no matter how the
    join is banded. This is the perceptual-hash twin of
    similarity.estimate_noise_floor: one TakeOrdered job collects the
    md5-order-first ``sample`` signatures (deterministic pseudo-random
    draw; O(rows-of-sig) scan, O(sample) driver bytes) and the
    ~sample^2/2 pair hamming distances are one driver-side numpy XOR +
    byte-LUT popcount. When computing a signature is expensive (the
    Arrow image-decode path), pass ``sig`` built over an ALREADY
    md5-sampled slice of the corpus so the decode stays bounded — the
    in-function orderBy is then a no-op reorder and determinism holds.
    """
    import numpy as np

    rows = (
        sig.orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(sample)
        .select("sig_lo", "sig_hi")
        .collect()
    )
    m = len(rows)
    if m < 2:  # empty/1-row corpus: no pairs, nothing to estimate
        return 0.0
    # sig_lo / sig_hi are 32-bit halves carried in longs (hamming64_pairs
    # contract), so uint64 holds them exactly.
    lo = np.asarray([r[0] for r in rows], dtype=np.uint64)
    hi = np.asarray([r[1] for r in rows], dtype=np.uint64)
    lut = np.asarray(
        [bin(i).count("1") for i in range(256)], dtype=np.uint16
    )
    iu = np.triu_indices(m, k=1)
    ham = np.zeros(iu[0].shape[0], dtype=np.uint16)
    for half in (lo, hi):
        xor = (half[iu[0]] ^ half[iu[1]]).view(np.uint8).reshape(-1, 8)
        ham += lut[xor].sum(axis=1, dtype=np.uint16)
    within = int((ham <= max_hamming).sum())
    return within / (m * (m - 1) / 2)


def warn_if_signature_space_saturated(
    sig: DataFrame,
    corpus_count: int,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    sample: int = 1024,
    warn_pairs_per_row: float = 1.0,
) -> float:
    """Pre-flight guardrail for hamming64_pairs callers (VERDICT r09 #1,
    the image twin of similarity.warn_if_threshold_in_noise_floor):
    estimate the signature collision rate from a bounded sample and emit
    a ``SignatureSaturationWarning`` when the expected hamming<=t pairs
    PER ROW at ``corpus_count`` rows exceeds ``warn_pairs_per_row`` —
    i.e. when pair output is already super-linear at the current corpus.
    Returns the expected pairs-per-row estimate: p-hat * (N-1)/2, where
    p-hat comes from :func:`estimate_signature_collision_rate`.

    On a HIGH-entropy 64-bit signature distribution p-hat ~ |hamming<=6
    ball| / 2^64 ~ 8.7e7 / 1.8e19 ~ 5e-12, so even N = 1e9 (100 TB of
    documents) expects only ~0.002 pairs/row — real perceptual hashes
    over real images pass silently at any scale. The synthetic stub-pixel
    corpus saturates at a few thousand distinct signatures, crossing the
    1-pair/row line at the bench/ladder corpus sizes — exactly the regime
    SCALING.md measured. Unmemoized by design: every shipped caller gates
    exactly once per construction on a fresh bounded probe (no composite
    gates twice on the same frame, unlike the noise-floor twin).
    """
    p_hat = estimate_signature_collision_rate(sig, id_col, max_hamming, sample)
    expected_per_row = p_hat * max(0, corpus_count - 1) / 2.0
    if expected_per_row > warn_pairs_per_row:
        import warnings

        warnings.warn(
            f"64-bit signature space is saturating on this corpus: sampled "
            f"hamming<={max_hamming} collision rate {p_hat:.2e} implies "
            f"~{expected_per_row:.1f} pairs per row at N={corpus_count} "
            f"(> {warn_pairs_per_row:g}) — near-dup pair output and cost "
            "will grow quadratically with the corpus. Use a wider/higher-"
            "entropy signature (e.g. pHash/dHash over real pixels, or more "
            "grid cells), lower max_hamming, or pre-shard by an exact key.",
            SignatureSaturationWarning,
            stacklevel=2,
        )
    return expected_per_row


def containment_pairs(
    shingled: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Directed near-CONTAINMENT pairs: |A ∩ B| / |A| >= threshold — "A's
    shingles are (almost) all inside B". The asymmetric complement of
    :func:`jaccard_pairs`: a snippet quoted inside a long page has low
    Jaccard (union is page-sized) but containment ~1, which is why corpus
    dedup checks both [Broder's resemblance vs containment distinction].

    Prefix filtering carries over with one asymmetry: A's prefix is its
    ``n_a - ceil(t*n_a) + 1`` globally-rarest shingles (any pair with
    common >= t*n_a must share one of them), but the B side indexes ALL
    its shingles — the shared prefix shingle can sit anywhere in B, and
    the Jaccard size-ratio prune is invalid here (a tiny doc CAN be
    contained in a huge one; only ``n_b >= t*n_a`` survives). Exact
    verification on candidates keeps the output identical to the naive
    all-pairs join.

    Output: (a_id, b_id, common, containment), DIRECTED (a contained in
    b; exact duplicates appear in both directions).

    Caching contract: same as :func:`jaccard_pairs` — the shingle table
    stays persist()-ed; long-lived sessions clearCache()/unpersist().
    """
    from pyspark.sql import Window

    shingled = shingled.persist()
    # df and n_shingles as WINDOW aggregates instead of groupBy +
    # join-back (r15 optimization, same rewrite as jaccard_pairs, guide
    # §2.3/§2.4): the freq agg + join shuffled the full shingle table
    # twice on `shingle`, and the sizes agg joined back once per side;
    # each window computes the identical value on ONE exchange (the
    # n_shingles count rides the rank window's id_col exchange).
    # REGIME-SPLIT r16 on the unbounded shingle key only (ADVICE r15 #1,
    # jaccard_pairs note): per-doc windows stay — bounded partitions.
    from ..functions.scale import hot_key_agg_mode

    w_doc_n = Window.partitionBy(id_col)
    if hot_key_agg_mode(shingled) == "window":
        with_df = shingled.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
    else:
        freq = shingled.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        with_df = shingled.join(freq, "shingle")
    ranked = (
        with_df.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy(id_col).orderBy("df", "shingle")),
        )
        .withColumn("n_shingles", F.count(F.lit(1)).over(w_doc_n))
    )
    prefix = ranked.filter(
        F.col("rk")
        <= F.col("n_shingles") - F.ceil(F.lit(threshold) * F.col("n_shingles")) + 1
    ).select(id_col, "shingle", "n_shingles")

    a = prefix.select(
        F.col(id_col).alias("a_id"), "shingle", F.col("n_shingles").alias("n_a")
    )
    # The B side indexes ALL its shingles (see docstring) — it needs only
    # n_shingles, so it takes the one-window form straight off the cache.
    b = shingled.withColumn("n_shingles", F.count(F.lit(1)).over(w_doc_n)).select(
        F.col(id_col).alias("b_id"), "shingle", F.col("n_shingles").alias("n_b")
    )
    candidates = (
        a.join(b, "shingle")
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(F.col("n_b") >= F.lit(threshold) * F.col("n_a"))
        .select("a_id", "b_id")
        .distinct()
    )
    doc_sets = shingled.groupBy(id_col).agg(F.collect_set("shingle").alias("sh_set"))
    return (
        candidates.join(
            doc_sets.select(F.col(id_col).alias("a_id"), F.col("sh_set").alias("sh_a")),
            "a_id",
        )
        .join(
            doc_sets.select(F.col(id_col).alias("b_id"), F.col("sh_set").alias("sh_b")),
            "b_id",
        )
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("containment", F.col("common") / F.size("sh_a"))
        .filter(F.col("containment") >= threshold)
        .select("a_id", "b_id", "common", "containment")
    )
