"""Text-analysis queries over the ``documents`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import text as ops
from ..sources import load_table

# DuckDB tokenization mirroring operators.text.tokens
_TOKENS = "string_split_regex(lower(trim(text)), '\\s+')"
_STOP_EN = "('the','a','of','and','to','in','is')"
_STOP_DE = "('der','die','und','das','ist','nicht','ein')"
_STOP_ES = "('el','la','de','que','los','una','es')"
_STOP_FR = "('le','la','les','des','est','une','dans')"


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.token_stats(docs).select(
        "doc_id", "n_tokens", "n_chars_measured", "n_distinct_tokens", "avg_token_len"
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.quality_score(docs).select(
        "doc_id", "stopword_ratio", "punct_ratio", "lexical_diversity",
        "length_factor", "quality",
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.lang_id(docs).select("doc_id", "lang", "lang_pred")


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.fingerprint(docs).select("doc_id", "fingerprint")


QUERIES = {
    "text_token_stats": text_token_stats,
    "text_quality_score": text_quality_score,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
}

ORACLES = {
    "text_token_stats": f"""
WITH t AS (SELECT doc_id, text, {_TOKENS} AS toks FROM documents)
SELECT doc_id,
  CAST(len(toks) AS INTEGER) AS n_tokens,
  CAST(length(text) AS INTEGER) AS n_chars_measured,
  CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS avg_token_len
FROM t
""",
    "text_quality_score": f"""
WITH t AS (SELECT doc_id, text, {_TOKENS} AS toks FROM documents),
r AS (
  SELECT doc_id,
    CAST(len(list_filter(toks, x -> x IN {_STOP_EN})) AS DOUBLE) / len(toks) AS stopword_ratio,
    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
      / length(text) AS punct_ratio,
    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS lexical_diversity,
    least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS length_factor
  FROM t
)
SELECT doc_id, stopword_ratio, punct_ratio, lexical_diversity, length_factor,
  0.3*stopword_ratio + 0.3*lexical_diversity + 0.3*length_factor - 0.1*punct_ratio AS quality
FROM r
""",
    "text_langid": f"""
WITH t AS (SELECT doc_id, lang, text, {_TOKENS} AS toks FROM documents),
h AS (
  SELECT doc_id, lang, text,
    len(list_filter(toks, x -> x IN {_STOP_EN})) AS en_hits,
    len(list_filter(toks, x -> x IN {_STOP_DE})) AS de_hits,
    len(list_filter(toks, x -> x IN {_STOP_ES})) AS es_hits,
    len(list_filter(toks, x -> x IN {_STOP_FR})) AS fr_hits
  FROM t
)
SELECT doc_id, lang,
  CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
       WHEN de_hits >= greatest(es_hits, fr_hits) AND de_hits > en_hits THEN 'de'
       WHEN es_hits >= greatest(fr_hits, en_hits) AND es_hits > 0 THEN 'es'
       WHEN fr_hits >= en_hits AND fr_hits > 0 THEN 'fr'
       WHEN en_hits > 0 THEN 'en'
       ELSE 'und' END AS lang_pred
FROM h
""",
    "text_fingerprint": f"""
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct({_TOKENS})), ' ')) AS fingerprint
FROM documents
""",
}
