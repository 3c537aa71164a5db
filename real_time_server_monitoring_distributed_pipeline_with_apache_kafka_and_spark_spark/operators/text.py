"""Text-analysis operators for training-data curation.

All built-in Catalyst expressions (split/filter/aggregate higher-order
functions) - no Python in the hot path, so these run at full scan speed
over a 100 TB corpus with column pruning (only ``text`` is read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is")
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "es": ("el", "la", "de", "que", "los", "una", "es"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans"),
}
_CJK_PATTERN = r"[\x{4e00}-\x{9fff}]"


# GPT-2-style pre-tokenizer pattern, simplified to the lookahead-free
# subset shared by Java regex (Spark) and RE2 (DuckDB oracle):
# contraction suffixes | space?-letters | space?-digits | space?-other.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"

# Rolling-hash constants: acc < MOD=2^31-1 and token hashes < 2^32, so
# acc*BASE + h < 2.2e15 — safe under int64 even with ANSI overflow checks.
_FP_BASE = 1000003
_FP_MOD = (1 << 31) - 1


def tokens(text_col: Column) -> Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def bpe_token_count(text_col: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2-style word/number/punct
    regex (the pre-merge segmentation; real BPE merges only split further,
    so this is the standard cheap proxy for LLM token budgeting)."""
    return F.size(F.regexp_extract_all(text_col, F.lit(BPE_PATTERN), 0))


def rolling_hash(text_col: Column) -> Column:
    """Order-SENSITIVE polynomial rolling hash over the token stream
    (Rabin-Karp fold): h = fold(acc * B + md5_32(token) mod P). Unlike the
    bag-of-words md5 fingerprint, token reordering changes this hash.
    Engine-portable: md5 is standard everywhere (vs xxhash64), and the
    fold is exact int64 arithmetic."""
    toks = tokens(text_col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * F.lit(_FP_BASE)
            + F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        )
        % F.lit(_FP_MOD),
    )


def _hit_count(toks: Column, words: tuple[str, ...]) -> Column:
    """Non-distinct count of tokens contained in a marker set."""
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, regex words, chars, mean length."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    total_token_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "n_bpe_tokens": bpe_token_count(F.col(text_col)),
            "n_chars_measured": F.length(text_col),
            "n_distinct_tokens": F.size(F.array_distinct(toks)),
            "avg_token_len": total_token_chars.cast("double") / n_tokens,
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: stopword ratio, punctuation density,
    lexical diversity, length factor -> blended [0,1] score.

    Every ratio is an int/int division => bit-identical across engines.
    Zero denominators (empty text; the tokenizer never yields an empty
    array, but the guard keeps the expression total) are NULLIF'd so the
    ratios — and therefore ``quality`` — come back NULL instead of
    raising DIVIDE_BY_ZERO under ANSI mode. That matters in streaming:
    an unguarded division would kill ``curation_stream`` and checkpoint
    restart would replay the same poison record forever. NULL quality
    fails any ``quality >= t`` filter, so empty docs are simply dropped.
    """
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    denom_tokens = F.nullif(n_tokens, F.lit(0))
    stop_ratio = _hit_count(toks, STOPWORDS_EN).cast("double") / denom_tokens
    n_punct = F.length(text_col) - F.length(
        F.regexp_replace(F.col(text_col), r"[.,!?;:]", "")
    )
    punct_ratio = n_punct.cast("double") / F.nullif(F.length(text_col), F.lit(0))
    diversity = F.size(F.array_distinct(toks)).cast("double") / denom_tokens
    length_factor = F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.3) * stop_ratio
        + F.lit(0.3) * diversity
        + F.lit(0.3) * length_factor
        - F.lit(0.1) * punct_ratio
    )
    return df.withColumns(
        {
            "stopword_ratio": stop_ratio,
            "punct_ratio": punct_ratio,
            "lexical_diversity": diversity,
            "length_factor": length_factor,
            "quality": score,
        }
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/marker-word language ID heuristic.

    CJK codepoints => zh; otherwise argmax of per-language marker-word hit
    counts with a fixed priority ladder (de > es > fr > en) for ties;
    no hits at all => 'und' (undetermined).
    """
    toks = tokens(F.col(text_col))
    hits = {lang: _hit_count(toks, words) for lang, words in _LANG_MARKERS.items()}
    best_non_en = F.greatest(hits["de"], hits["es"], hits["fr"])
    pred = (
        F.when(F.col(text_col).rlike(_CJK_PATTERN), "zh")
        .when((hits["de"] >= best_non_en) & (hits["de"] > hits["en"]), "de")
        .when((hits["es"] >= F.greatest(hits["fr"], hits["en"])) & (hits["es"] > 0), "es")
        .when((hits["fr"] >= hits["en"]) & (hits["fr"] > 0), "fr")
        .when(hits["en"] > 0, "en")
        .otherwise("und")
    )
    return df.withColumn("lang_pred", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set (bag-of-words identity; catches shuffled near-identical docs).
    """
    toks = tokens(F.col(text_col))
    normalized = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    return df.withColumns(
        {
            "fingerprint": F.md5(normalized),
            "rolling_fp": rolling_hash(F.col(text_col)),
        }
    )
