"""Validate the documented 100 TB swap-in paths.

Several queries note their bounded-memory replacement for when exact
operators stop fitting (events_distinct_users -> HyperLogLog++,
orders_price_quantiles -> t-digest). These tests pin that the
swap-ins actually produce answers within their advertised error on
our data — so the claim in the docstring is tested, not folklore.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from uber_data_pipeline_spark.catalog import load_table


def test_approx_count_distinct_within_tolerance(spark):
    """HLL++ at rsd=0.01 must land within ±5% of the exact per-day
    distinct user counts (generous vs the 1% rsd, immune to flakes)."""
    ev = load_table(spark, SF_DIR, "events")
    both = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", 0.01).alias("approx"),
        )
        .collect()
    )
    assert both
    for row in both:
        assert abs(row.approx - row.exact) <= max(1, 0.05 * row.exact), row


def test_approx_percentile_within_tolerance(spark):
    """approx_percentile must land within 1% relative error of the
    exact interpolated percentile per order status."""
    orders = load_table(spark, SF_DIR, "orders")
    rows = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
            F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx_p50"),
        )
        .collect()
    )
    assert rows
    for row in rows:
        assert abs(row.approx_p50 - row.exact_p50) <= 0.01 * row.exact_p50, row


def test_connected_components_paths_agree(spark):
    """The single-task union-find fast path and the distributed
    min-label loop must produce identical clusters on a graph with a
    long chain (worst case for propagation), a triangle, a pair, and
    two disjoint stars."""
    pairs = [(i, i + 1) for i in range(0, 40)]          # chain 0..40
    pairs += [(100, 101), (101, 102), (100, 102)]       # triangle
    pairs += [(200, 201)]                               # pair
    pairs += [(300, 300 + j) for j in range(1, 5)]      # star @300
    pairs += [(400, 400 + j) for j in range(1, 5)]      # star @400
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")

    from uber_data_pipeline_spark.operators.dedup import connected_components

    fast = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in connected_components(df).collect()
    }
    loop = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in connected_components(df, local_edge_limit=0).collect()
    }
    assert fast == loop
    assert {(0, 0, 41), (100, 100, 3), (200, 200, 2)} <= fast


def test_prefix_filter_jaccard_is_lossless(spark):
    """The PPJoin prefix-filtered exact Jaccard must equal the naive
    all-pairs inverted-index join on the real documents table."""
    from uber_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    docs = load_table(spark, SF_DIR, "documents")
    prefix = {tuple(r) for r in ngram_jaccard_pairs_prefix(docs, 0.5).collect()}
    naive = {tuple(r) for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    assert prefix == naive
    assert prefix  # non-trivial on this corpus
