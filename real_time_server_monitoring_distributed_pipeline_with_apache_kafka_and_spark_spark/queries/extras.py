"""Extra scale-pattern queries (registry tail).

These sit deliberately PAST the correctness driver's ~50-query window
(queries/__init__.py ordering note) — they extend the surface without
displacing driver rows; the local pytest oracle-parity suite covers them
every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import tokens as tokenize
from ..sources import load_table


def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters: top 50 tokens by document
    frequency. explode -> distinct per doc -> count -> rank. The
    all-docs explode is the canonical shuffle-heavy text op; partial
    aggregation collapses it map-side, and the final top-k is a single
    ordered limit (TakeOrderedAndProject — no global sort materialized).
    Deterministic tiebreak on token asc.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    df_counts = (
        docs.select("doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    w = Window.orderBy(F.col("doc_freq").desc(), "token")
    return (
        df_counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 50)
        .select("token", "doc_freq", "rank")
    )


def rel_salted_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe exact count-distinct: two-stage aggregation. Stage 1
    dedups on (key, salt, value) — the hot key's distinct-set build
    spreads over n_salts partitions instead of one straggler — stage 2
    merges per-key counts. Result identical to COUNT(DISTINCT); the
    pattern matters when one group holds most of the values (plain
    count-distinct builds that group's hash set in a single task).
    """
    n_salts = 8
    lineitem = load_table(spark, sf_dir, "lineitem")
    salted = lineitem.select(
        "l_returnflag",
        F.pmod(F.xxhash64("l_orderkey"), F.lit(n_salts)).alias("_salt"),
        "l_orderkey",
    )
    stage1 = salted.distinct()  # hash-agg on (key, salt, value)
    stage2 = (
        stage1.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("distinct_orders"))
    )
    return stage2


def sim_ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized brute-force top-k (two-tier ANN scan tier, 4x
    smaller vectors). Quantization uses the portable sign*floor(+0.5)
    formula, so the SQL oracle replays it exactly (quantize, integer dot,
    scale multiply, rank); recall vs the float path is additionally
    pinned in tests/test_dedup_similarity.py."""
    from ..operators.similarity import ann_quantized_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    corpus = emb.filter(F.col("vec_id") >= 20)
    return ann_quantized_topk(corpus, queries, k=5)


QUERIES = {
    "text_vocab_topk": text_vocab_topk,
    "rel_salted_count_distinct": rel_salted_count_distinct,
    "sim_ann_quantized": sim_ann_quantized,
}

ORACLES = {
    "text_vocab_topk": """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents
),
freq AS (SELECT token, count(*) AS doc_freq FROM tok GROUP BY token)
SELECT token, doc_freq, CAST(rank AS INTEGER) AS rank FROM (
  SELECT token, doc_freq,
         row_number() OVER (ORDER BY doc_freq DESC, token) AS rank
  FROM freq
) WHERE rank <= 50
""",
    "rel_salted_count_distinct": """
SELECT l_returnflag, count(DISTINCT l_orderkey) AS distinct_orders
FROM lineitem GROUP BY l_returnflag
""",
    "sim_ann_quantized": """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q8 AS (
  SELECT vec_id,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale,
         list_transform(v, x ->
           CAST(CASE WHEN x < 0 THEN -1 ELSE CASE WHEN x > 0 THEN 1 ELSE 0 END END
                * floor(abs(x) / (list_max(list_transform(v, y -> abs(y))) / 127.0) + 0.5)
                AS BIGINT)) AS qv
  FROM e
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(list_transform(c.qv, x -> CAST(x AS DOUBLE)),
                               list_transform(q.qv, x -> CAST(x AS DOUBLE))) AS DOUBLE)
         * c.scale * q.scale AS score
  FROM q8 q JOIN q8 c ON q.vec_id < 20 AND c.vec_id >= 20
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= 5
""",
}
