"""Per-document text analysis: language-ID, quality scoring, token
counting, fingerprinting. Pure column expressions over the documents
table — embarrassingly parallel, no shuffle at all (narrow plans that
scale linearly with input splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uber_data_pipeline_spark.functions.text import (
    DIGITS_ONLY_SPARK,
    PUNCT_STRIPPED_SPARK,
    REGEX_TOKEN_COUNT_SPARK,
    TOKENS_SPARK,
    langid_case,
    rolling_hash_spark,
    shingles_spark,
    stopword_count_spark,
)


def language_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword-marker
    counts, fixed tie order. (Synthetic corpus is one script, so this
    demonstrates the operator shape; real marker lists drop in.)"""
    scored = docs.selectExpr(
        "doc_id",
        "lang AS labeled_lang",
        f"{TOKENS_SPARK} AS tokens",
    ).selectExpr(
        "doc_id",
        "labeled_lang",
        *[f"{stopword_count_spark(lg)} AS s_{lg}" for lg in ("en", "de", "fr", "es")],
    )
    pred = langid_case({lg: f"s_{lg}" for lg in ("en", "de", "fr", "es")})
    return scored.selectExpr(
        "doc_id",
        "labeled_lang",
        f"{pred} AS pred_lang",
        f"CAST({pred} = labeled_lang AS boolean) AS agree",
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length/stopword/punctuation-based quality score in [0,1]."""
    base = docs.selectExpr(
        "doc_id",
        "n_chars",
        f"{TOKENS_SPARK} AS tokens",
        f"{PUNCT_STRIPPED_SPARK} AS n_punct",
        f"{DIGITS_ONLY_SPARK} AS n_digits",
    ).selectExpr(
        "doc_id",
        "n_chars",
        "size(tokens) AS n_tokens",
        f"round({stopword_count_spark('en')} / size(tokens), 6) AS stopword_ratio",
        "round(n_punct / n_chars, 6) AS punct_ratio",
        "round(n_digits / n_chars, 6) AS digit_ratio",
    )
    return base.selectExpr(
        "doc_id",
        "n_tokens",
        "stopword_ratio",
        "punct_ratio",
        "digit_ratio",
        # exact decimal arithmetic: the weighted sum of 6-decimal ratios
        # lands exactly on .5 rounding ties, where Spark and DuckDB double
        # rounding disagree — decimals make the tie rule itself identical
        "CAST(round(CAST(least(n_tokens, 100) AS decimal(12,6)) * 0.004 "
        "+ (1.0 - CAST(stopword_ratio AS decimal(12,6))) * 0.3 "
        "+ (1.0 - CAST(punct_ratio AS decimal(12,6))) * 0.3, 6) AS double) AS quality_score",
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count, BPE-ish regex token count, average
    token length."""
    return docs.selectExpr(
        "doc_id",
        f"{TOKENS_SPARK} AS tokens",
        f"{REGEX_TOKEN_COUNT_SPARK} AS n_regex_tokens",
        "text",
    ).selectExpr(
        "doc_id",
        "size(tokens) AS n_ws_tokens",
        "n_regex_tokens",
        "round(length(replace(text, ' ', '')) / size(tokens), 6) AS avg_token_len",
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: rolling polynomial hash of the full
    text + min shingle hash (1-perm minhash) — the pair used for
    cheap pre-clustering before pairwise dedup."""
    return docs.selectExpr(
        "doc_id",
        f"{rolling_hash_spark('text')} AS rolling_hash",
        f"{TOKENS_SPARK} AS tokens",
    ).selectExpr(
        "doc_id",
        "rolling_hash",
        f"array_min(transform({shingles_spark('tokens')}, s -> md5(s))) AS min_shingle_hash",
    )
