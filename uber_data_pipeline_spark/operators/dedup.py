"""Deduplication operators over a documents table (doc_id, text).

All four families are expression-only (no Python UDFs), so they run
inside whole-stage codegen and scale horizontally:

- exact:   md5(normalized text) group — one shuffle on the hash.
- n-gram Jaccard: inverted-index self-join on shingles — candidate
  pairs are shingle-local (never an O(n^2) cross join); at 100 TB the
  shingle join is the cost, which is why minhash-LSH below is the
  scale path that bounds it.
- minhash-LSH: shingle -> K min-hashes -> B banded keys -> bucket
  self-join. Candidates are band-bucket-local; bucket sizes are
  hash-balanced, and AQE's skew-join split handles hot buckets.
- simhash: 32-bit signature per doc; pair search shown as a bounded
  hamming join (banding note in simhash_pairs).

Min-hash trick: we need a hash family both the engine and the DuckDB
oracle compute identically. md5 hex strings are uniform and ordered,
so MIN(md5(perm_id || ':' || shingle)) over shingles IS a minhash —
no engine-specific hash functions involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uber_data_pipeline_spark.functions.text import (
    SHINGLE_N,
    TOKENS_SPARK,
    shingles_spark,
)

NUM_PERM = 16
NUM_BANDS = 4
SIMHASH_BITS = 32
SIMHASH_MAX_HAMMING = 4


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) texts: canonical id =
    min doc_id, plus copy count."""
    return (
        docs.selectExpr("doc_id", "md5(lower(trim(text))) AS text_hash")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def doc_shingles(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """Distinct word n-gram shingles per document."""
    return (
        docs.selectExpr("doc_id", f"{TOKENS_SPARK} AS tokens")
        .selectExpr("doc_id", f"explode({shingles_spark('tokens', n)}) AS shingle")
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard similarity over shingle sets for all pairs that
    share at least one shingle; |A ∩ B| from the inverted-index join,
    |A ∪ B| = |A| + |B| - |A ∩ B|."""
    sh = doc_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """(doc_id, perm_id, minhash) — minhash = MIN over shingles of
    md5(perm_id:shingle). One explode x num_perm, one partial-agg
    shuffle on doc_id."""
    return (
        doc_shingles(docs)
        .selectExpr("doc_id", "shingle", f"explode(sequence(0, {num_perm - 1})) AS perm_id")
        .groupBy("doc_id", "perm_id")
        .agg(
            F.min(F.md5(F.concat_ws(":", F.col("perm_id").cast("string"), F.col("shingle")))).alias("minhash")
        )
    )


def lsh_bands(signatures: DataFrame, num_bands: int = NUM_BANDS, num_perm: int = NUM_PERM) -> DataFrame:
    """(doc_id, band, band_key): band key = md5 over the band's
    minhashes in perm order (sort_array makes collect_list's
    nondeterministic order irrelevant)."""
    rows_per_band = num_perm // num_bands
    return (
        signatures.withColumn("band", (F.col("perm_id") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("perm_id", "minhash"))),
                        lambda x: x["minhash"],
                    ),
                    "|",
                )
            ).alias("band_key")
        )
    )


def lsh_candidate_pairs(docs: DataFrame, min_est_jaccard: float = 0.5) -> DataFrame:
    """MinHash-LSH near-duplicate pairs: band-bucket collision ->
    candidate, then estimated Jaccard = fraction of agreeing
    minhashes, filtered at ``min_est_jaccard``."""
    sigs = minhash_signatures(docs).cache()
    bands = lsh_bands(sigs)
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa, sb = sigs.alias("sa"), sigs.alias("sb")
    agree = (
        candidates.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sb,
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.perm_id") == F.col("sb.perm_id")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.round(
                F.count(F.when(F.col("sa.minhash") == F.col("sb.minhash"), 1)) / F.lit(float(NUM_PERM)),
                6,
            ).alias("est_jaccard")
        )
    )
    return agree.filter(F.col("est_jaccard") >= min_est_jaccard)


def _simhash_expr(tokens: str, bits: int = SIMHASH_BITS) -> str:
    """SimHash over distinct tokens: bit j set iff the sum of ±1
    contributions (bit j of md5(token)) is non-negative. Integer sums
    are order-independent, so engines agree exactly."""
    nibble = f"(instr('0123456789abcdef', substring(md5(t), CAST(j / 4 AS int) + 1, 1)) - 1)"
    contrib = f"CASE WHEN (shiftright({nibble}, j % 4) & 1) = 1 THEN 1 ELSE -1 END"
    per_bit = (
        f"CASE WHEN aggregate(array_distinct({tokens}), 0, (s, t) -> s + {contrib}) >= 0 "
        f"THEN shiftleft(CAST(1 AS bigint), j) ELSE CAST(0 AS bigint) END"
    )
    return (
        f"aggregate(transform(sequence(0, {bits - 1}), j -> {per_bit}), "
        f"CAST(0 AS bigint), (acc, v) -> acc + v)"
    )


def simhash_values(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) 32-bit signature per document."""
    return docs.selectExpr("doc_id", f"{TOKENS_SPARK} AS tokens").selectExpr(
        "doc_id", f"{_simhash_expr('tokens')} AS simhash"
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = SIMHASH_MAX_HAMMING) -> DataFrame:
    """Pairs within ``max_hamming`` bits. Shown here as a signature
    self-join; at 100 TB this becomes a banded join (split the 32 bits
    into max_hamming+1 segments — pigeonhole guarantees one exact
    segment match — and bucket-join per segment), which keeps
    candidates bucket-local exactly like minhash-LSH."""
    sv = simhash_values(docs)
    a, b = sv.alias("a"), sv.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
