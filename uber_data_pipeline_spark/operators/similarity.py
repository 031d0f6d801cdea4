"""Similarity search over an embedding column (array<float>).

Brute-force exact cosine top-k is the correctness baseline (O(n^2)
pairs — fine for a reranking set, documented as NOT the scale path).
The scale path is signed-random-projection LSH: deterministic
hyperplanes derived from md5 parity (no stored model), bucket join,
exact rerank inside buckets. Both are pure expressions (array
higher-order functions), so the whole thing stays JVM-side.

Determinism: cosine folds index-ascending in both engines and is
rounded to 6 decimals BEFORE ranking, with vec_id as the final
tie-breaker — rank boundaries cannot flip on float noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uber_data_pipeline_spark.functions.vectors import cosine_spark, srp_bucket_spark

LSH_BITS = 8


def cosine_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup)."""
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.expr(cosine_spark("ea", "eb")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def brute_force_topk(emb: DataFrame, k: int) -> DataFrame:
    """Exact cosine top-k neighbors per vector."""
    a = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("eb"))
    scored = (
        a.join(b, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.expr(cosine_spark("ea", "eb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_topk(emb: DataFrame, k: int, n_bits: int = LSH_BITS) -> DataFrame:
    """Approximate top-k: candidates share an SRP bucket (expected
    n/2^bits per bucket), exact cosine rerank within the bucket.
    Recall trades off with bits; multi-probe = union over rotated
    bucket ids (not needed at this scale)."""
    with_bucket = emb.withColumn("bucket", F.expr(srp_bucket_spark("embedding", n_bits)))
    a = with_bucket.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("ea"), "bucket"
    )
    b = with_bucket.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("eb"),
        F.col("bucket").alias("bucket_b"),
    )
    scored = (
        a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn("cosine", F.expr(cosine_spark("ea", "eb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "rank", "cosine")
    )
