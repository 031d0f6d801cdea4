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


def token_frequencies(docs: DataFrame, k: int = 50) -> DataFrame:
    """Global top-k tokens by occurrence count, with document
    frequency — the vocabulary/stopword-mining step of a corpus
    pipeline.

    Shuffle shape at scale: the explode inflates rows ~100x, but the
    token groupBy partial-aggregates map-side, so the shuffle carries
    one row per (split, token) — hot tokens ('the') are naturally
    combined before they concentrate on one reducer; count(distinct
    doc_id) is expanded by Spark into a two-phase aggregate over
    (token, doc_id), bucket-local the same way. Final top-k is a
    TakeOrdered over the (already tiny) token counts."""
    toks = docs.selectExpr("doc_id", f"explode({TOKENS_SPARK}) AS token")
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("occurrences"), F.asc("token"))
        .limit(k)
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


def training_data_prep(
    docs: DataFrame,
    min_quality: float = 0.55,
    min_tokens: int = 5,
) -> DataFrame:
    """The composed keep/drop decision of a training-data pipeline:
    exact-dedup (keep only each text's canonical doc), then quality
    and length gates — one narrow quality pass plus one hash groupBy,
    ending in a broadcast-able semi-join of survivors.

    Returns kept docs with the features the decision used."""
    q = quality_scores(docs)
    canonical = (
        docs.selectExpr("doc_id", "md5(lower(trim(text))) AS text_hash")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        q.join(canonical, "doc_id", "left_semi")
        .filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("n_tokens") >= min_tokens)
        )
        .select("doc_id", "n_tokens", "quality_score")
    )
