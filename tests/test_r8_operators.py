"""Round-8 operators: CC-Net LM-fit tiers and the epoch-seeded
data-loader shuffle (registry growth beyond the r7 verdict queue)."""

import pytest
from pyspark.sql import functions as F

from uber_data_pipeline_spark.catalog import load_table
from uber_data_pipeline_spark.operators.sampling import (
    EPOCH_SHARDS,
    epoch_shuffle,
)
from uber_data_pipeline_spark.operators.textops import lm_fit_tiers

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from uber_data_pipeline_spark.session import get_spark

    return get_spark()


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


def test_lm_fit_tiers_are_ordered_and_tertile_sized(docs):
    """Cutoff-threshold tiers (CC-Net §4.3's sampled-cutoff procedure;
    at this SF the in-plan modulus is 1, so cutoffs are exact tertile
    ranks of the full distribution): tiers must cut the fit ORDER
    (min(head) >= max(middle) >= min(middle) >= max(tail)), and in
    strata whose fits are all distinct the sizes must equal the
    ceil-rank tertiles — which coincide with NTILE(3); boundary TIES
    (promoted to the better tier) are the only permitted deviation."""
    rows = lm_fit_tiers(docs).collect()
    by_stratum: dict = {}
    for r in rows:
        by_stratum.setdefault((r.lang, r.source), []).append(r)
    assert len(by_stratum) > 1
    checked_sizes = 0
    for (lang, source), grp in by_stratum.items():
        fits = {
            t: [r.lm_fit for r in grp if r.tier == t]
            for t in ("head", "middle", "tail")
        }
        if fits["head"] and fits["middle"]:
            assert min(fits["head"]) >= max(fits["middle"]), (lang, source)
        if fits["middle"] and fits["tail"]:
            assert min(fits["middle"]) >= max(fits["tail"]), (lang, source)
        if fits["head"] and fits["tail"]:
            assert min(fits["head"]) >= max(fits["tail"]), (lang, source)
        all_fits = [r.lm_fit for r in grp]
        if len(set(all_fits)) == len(all_fits):
            n = len(grp)
            r1, r2 = (n + 2) // 3, (2 * n + 2) // 3
            sizes = {t: len(v) for t, v in fits.items()}
            assert sizes == {
                "head": r1,
                "middle": r2 - r1,
                "tail": n - r2,
            }, (lang, source, sizes)
            checked_sizes += 1
    assert checked_sizes > 0  # distinct-fit strata exist at this SF


def test_fit_sample_modulus_bounds_cutoff_sample():
    """The in-plan 1-in-m sampling keeps the EXPECTED cutoff-fit
    sample at <= FIT_SAMPLE_TARGET rows for any corpus size (the
    100 TB guarantee that no (lang, source) stratum window can exceed
    the target), and m == 1 below the target so test SFs fit cutoffs
    on the full distribution."""
    from uber_data_pipeline_spark.operators.textops import (
        FIT_SAMPLE_TARGET,
        fit_sample_modulus,
    )

    assert fit_sample_modulus(0) == 1
    assert fit_sample_modulus(FIT_SAMPLE_TARGET) == 1
    assert fit_sample_modulus(FIT_SAMPLE_TARGET + 1) == 2
    for n in (10**6, 10**9, 10**12, 7 * 10**11 + 13):
        m = fit_sample_modulus(n)
        assert n / m <= FIT_SAMPLE_TARGET
        # and never oversamples by more than 2x under the cap
        assert n / m > FIT_SAMPLE_TARGET / 2


def test_lm_fit_tiers_sampled_mode_matches_oracle(docs, duck):
    """SAMPLED cutoff mode (the 100 TB path, forced here by a tiny
    sample_target at sf0.001: 500 docs / target 100 -> modulus 5):
    every document still gets a tier, and the DuckDB twin replays the
    sampled evaluation bit-for-bit."""
    from uber_data_pipeline_spark.operators.textops import sql_lm_fit_tiers
    from uber_data_pipeline_spark.testing import compare

    target = 100
    sdf = lm_fit_tiers(docs, sample_target=target).toPandas()
    odf = duck.execute(sql_lm_fit_tiers(sample_target=target)).df()
    assert compare("lm_fit_tiers_sampled", sdf, odf) == []
    assert len(sdf) == docs.count()
    assert sdf["tier"].notna().all()
    assert len(set(sdf["tier"])) == 3  # sampled cutoffs still split


def test_lm_fit_is_in_language_probability_mean(docs):
    """A doc's lm_fit must equal the mean per-token in-LANGUAGE
    unigram probability — recomputed naively for one document."""
    out = {r.doc_id: r for r in lm_fit_tiers(docs).collect()}
    sample = docs.limit(1).collect()[0]
    toks = sample.text.split(" ")
    same_lang = docs.filter(F.col("lang") == sample.lang)
    corpus = [
        t
        for row in same_lang.select("text").collect()
        for t in row.text.split(" ")
    ]
    total = len(corpus)
    from collections import Counter

    cnt = Counter(corpus)
    expect = sum(cnt[t] for t in toks) / (len(toks) * total)
    got = out[sample.doc_id]
    assert got.n_tokens == len(toks)
    assert abs(got.lm_fit - expect) < 1e-9


def test_epoch_shuffle_is_a_permutation_per_shard(docs):
    """positions within a shard are exactly 1..shard_size and every
    doc appears exactly once across the manifest."""
    rows = epoch_shuffle(docs, epoch=1).collect()
    n_docs = docs.count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_shard: dict = {}
    for r in rows:
        assert 0 <= r.shard < EPOCH_SHARDS
        by_shard.setdefault(r.shard, []).append(r.position)
    for shard, pos in by_shard.items():
        assert sorted(pos) == list(range(1, len(pos) + 1)), shard


def test_epoch_shuffle_reorders_between_epochs(docs):
    """Different epochs must produce genuinely different orders (the
    whole point of reshuffling) while staying individually
    deterministic across reruns."""
    e1 = {
        (r.shard, r.position): r.doc_id
        for r in epoch_shuffle(docs, epoch=1).collect()
    }
    e1_again = {
        (r.shard, r.position): r.doc_id
        for r in epoch_shuffle(docs, epoch=1).collect()
    }
    e2 = {
        (r.shard, r.position): r.doc_id
        for r in epoch_shuffle(docs, epoch=2).collect()
    }
    assert e1 == e1_again
    assert e1 != e2
    # same corpus both epochs, just reordered
    assert sorted(e1.values()) == sorted(e2.values())


def test_matryoshka_recall_is_meaningful(spark):
    """Half-dim truncation must keep a real fraction of the true
    neighborhood (the Matryoshka premise) without being trivially
    perfect — i.e. the gate discriminates: 0 < mean recall < 1 on
    this corpus, every per-query recall in [0, 1]."""
    from uber_data_pipeline_spark.operators.similarity import (
        matryoshka_recall,
    )
    from uber_data_pipeline_spark.queries.training import ANN_K, _emb

    rows = matryoshka_recall(_emb(spark, SF), ANN_K).collect()
    assert all(0.0 <= r.recall_at_k <= 1.0 for r in rows)
    assert all(0 <= r.n_hits <= ANN_K for r in rows)
    mean = sum(r.recall_at_k for r in rows) / len(rows)
    assert 0.05 < mean < 1.0, mean


def test_epoch_shuffle_shards_are_balanced(docs):
    """The affine hash mod n_shards must spread docs near-uniformly —
    the property that makes the per-shard window sort parallel."""
    rows = epoch_shuffle(docs, epoch=3).collect()
    sizes = {}
    for r in rows:
        sizes[r.shard] = sizes.get(r.shard, 0) + 1
    n = len(rows)
    expected = n / EPOCH_SHARDS
    assert len(sizes) == EPOCH_SHARDS
    for shard, size in sizes.items():
        assert abs(size - expected) < 0.5 * expected, (shard, size)


def test_auto_epoch_shards_bounds_shard_rows():
    """Shard sizing at scale (VERDICT r8 item 4): expected rows per
    shard never exceed the target for any corpus size (no 6 TB window
    partition at 100 TB), with a floor of EPOCH_SHARDS_MIN so small
    corpora keep the historical 16-shard manifest."""
    from uber_data_pipeline_spark.operators.sampling import (
        EPOCH_SHARD_TARGET_ROWS,
        EPOCH_SHARDS_MIN,
        auto_epoch_shards,
    )

    assert auto_epoch_shards(0) == EPOCH_SHARDS_MIN
    assert auto_epoch_shards(500) == EPOCH_SHARDS_MIN
    assert (
        auto_epoch_shards(EPOCH_SHARDS_MIN * EPOCH_SHARD_TARGET_ROWS)
        == EPOCH_SHARDS_MIN
    )
    for n in (10**7, 10**9, 10**11, 3 * 10**12 + 7):
        m = auto_epoch_shards(n)
        assert n / m <= EPOCH_SHARD_TARGET_ROWS
        assert m >= EPOCH_SHARDS_MIN


def test_epoch_shuffle_derived_shards_match_explicit_16(docs):
    """At any corpus under EPOCH_SHARDS_MIN * target rows the in-plan
    derivation must reproduce the historical explicit-16 manifest
    bit-for-bit (oracle continuity across the r9 sizing change)."""
    derived = {
        (r.shard, r.position): r.doc_id
        for r in epoch_shuffle(docs, epoch=1).collect()
    }
    explicit = {
        (r.shard, r.position): r.doc_id
        for r in epoch_shuffle(docs, epoch=1, n_shards=16).collect()
    }
    assert derived == explicit


def test_recall_gate_query_sampling_matches_oracle(spark, duck):
    """SAMPLED recall-gate mode (VERDICT r8 item 5 — the 100 TB path,
    forced here with target=100 on 500 vectors -> in-plan modulus 5):
    the DuckDB twin replays the identical sample, AND every sampled
    row equals the corresponding row of the FULL gate (per-query
    recalls are independent, so sampling drops rows without changing
    any)."""
    from uber_data_pipeline_spark.operators import similarity
    from uber_data_pipeline_spark.queries.training import (
        LSH_ANN_K,
        _emb,
        _sql_ann_exact,
        _sql_ann_lsh,
    )
    from uber_data_pipeline_spark.testing import compare

    target = 100
    emb = _emb(spark, SF)
    sdf = similarity.lsh_recall(
        emb, LSH_ANN_K, query_sample_target=target
    ).toPandas()
    pred_a = similarity.sql_query_sample_pred("a.vec_id", target=target)
    sql = f"""
        WITH exact AS ({_sql_ann_exact(LSH_ANN_K, query_pred=pred_a)}),
        approx AS ({_sql_ann_lsh(LSH_ANN_K, query_pred=pred_a)}),
        hits AS (
            SELECT a.query_id, COUNT(*) AS n_hits
            FROM approx a JOIN exact e
              ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
            GROUP BY 1
        )
        SELECT v.vec_id AS query_id,
               CAST(COALESCE(h.n_hits, 0) AS INT) AS n_hits,
               ROUND(COALESCE(h.n_hits, 0) / CAST({LSH_ANN_K} AS DOUBLE), 6)
                   AS recall_at_k
        FROM embeddings v LEFT JOIN hits h ON h.query_id = v.vec_id
        WHERE {similarity.sql_query_sample_pred("v.vec_id", target=target)}
    """
    odf = duck.execute(sql).df()
    assert compare("lsh_recall_sampled", sdf, odf) == []
    # the SHIPPED oracle form (r9): gate CTE + equality joins — the
    # NL-join-safe composition that keeps DuckDB off the pathological
    # per-probe scalar-subquery plan at big SFs. Must equal both the
    # engine and the pred-form twin above.
    sql_cte = f"""
        WITH {similarity.sql_query_sample_cte(target=target)},
        exact AS ({_sql_ann_exact(LSH_ANN_K, query_gate="qgate")}),
        approx AS ({_sql_ann_lsh(LSH_ANN_K, query_gate="qgate")}),
        hits AS (
            SELECT a.query_id, COUNT(*) AS n_hits
            FROM approx a JOIN exact e
              ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
            GROUP BY 1
        )
        SELECT v.vec_id AS query_id,
               CAST(COALESCE(h.n_hits, 0) AS INT) AS n_hits,
               ROUND(COALESCE(h.n_hits, 0) / CAST({LSH_ANN_K} AS DOUBLE), 6)
                   AS recall_at_k
        FROM qgate v LEFT JOIN hits h ON h.query_id = v.vec_id
    """
    odf_cte = duck.execute(sql_cte).df()
    assert compare("lsh_recall_sampled_cte", sdf, odf_cte) == []
    n = emb.count()
    assert 0 < len(sdf) < n  # the sample actually pruned queries
    # sampled rows == the same rows of the full gate
    full = (
        similarity.lsh_recall(emb, LSH_ANN_K, query_sample_target=None)
        .toPandas()
        .set_index("query_id")
    )
    assert len(full) == n
    for r in sdf.itertuples():
        assert full.loc[r.query_id].n_hits == r.n_hits


def test_lsh_tuning_report_s_curve_shape(docs):
    """The S-curve tradeoff must hold: at fixed b*r, MORE rows per
    band means LOWER expected recall and LOWER sub-threshold FP mass
    — (16,1) is the loosest banding (max recall, max pollution),
    (1,16) the strictest."""
    from uber_data_pipeline_spark.operators.dedup import (
        lsh_tuning_report,
    )

    rows = {
        (r.n_bands, r.rows_per_band): r
        for r in lsh_tuning_report(docs).collect()
    }
    assert set(rows) == {(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)}
    order = [(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)]
    recalls = [rows[c].expected_recall for c in order]
    fps = [rows[c].expected_fp_pairs for c in order]
    assert all(a >= b for a, b in zip(recalls, recalls[1:])), recalls
    assert all(a >= b for a, b in zip(fps, fps[1:])), fps
    # every config sees the SAME pair population
    assert len({(r.n_true_pairs, r.n_sub_pairs) for r in rows.values()}) == 1
    # recall is a probability over true pairs
    assert all(0.0 <= x <= 1.0 for x in recalls)


def test_lsh_tuning_probability_matches_python(docs):
    """One config's expected recall recomputed naively in Python from
    the exact pair Jaccards (same 6-dp rounding, same chain order)."""
    from uber_data_pipeline_spark.operators.dedup import (
        LSH_TUNING_TAU,
        lsh_tuning_report,
        ngram_jaccard_pairs,
    )

    got = {
        (r.n_bands, r.rows_per_band): r.expected_recall
        for r in lsh_tuning_report(docs).collect()
    }
    sims = [
        r.jaccard
        for r in ngram_jaccard_pairs(docs, 0.0).collect()
        if r.jaccard >= LSH_TUNING_TAU
    ]
    b, r = 8, 2
    ps = [1.0 - (1.0 - s * s) ** b for s in sims]
    expect = sum(ps) / len(ps)
    assert abs(got[(b, r)] - expect) < 1e-6
