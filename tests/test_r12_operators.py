"""r12 operators: paragraph-grain two-level dedup, model-based
quality filter, the rolling-WAU hand fixture (completing the r11
numeric-fixture set), and the spread_rowlocal gate."""

from __future__ import annotations

import datetime


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_rolling_wau_hand(spark, tmp_path):
    """Hand-computed trailing 7-day WAU: users {1,2} on day 0, user 2
    again on day 2, user 3 alone on day 9 (outside every earlier
    window)."""
    from uber_data_pipeline_spark.queries.events import events_rolling_wau

    d = lambda day, hour=1: datetime.datetime(2024, 1, day, hour)  # noqa: E731
    rows = [
        (0, d(1), 1, "view", 1.0, "{}"),
        (1, d(1), 2, "view", 1.0, "{}"),
        (2, d(1, 5), 1, "click", 1.0, "{}"),  # same user+day: no new DAU
        (3, d(3), 2, "view", 1.0, "{}"),
        (4, d(10), 3, "view", 1.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {str(r["day"]): r for r in events_rolling_wau(spark, sf).collect()}
    assert set(out) == {"2024-01-01", "2024-01-03", "2024-01-10"}
    # day 1: dau {1,2}; trailing window [Dec 26, Jan 1] has {1,2}
    assert (out["2024-01-01"]["dau"], out["2024-01-01"]["wau"]) == (2, 2)
    assert out["2024-01-01"]["stickiness"] == 1.0
    # day 3: dau {2}; window [Dec 28, Jan 3] has {1,2}
    assert (out["2024-01-03"]["dau"], out["2024-01-03"]["wau"]) == (1, 2)
    assert out["2024-01-03"]["stickiness"] == 0.5
    # day 10: window [Jan 4, Jan 10] has {3} only
    assert (out["2024-01-10"]["dau"], out["2024-01-10"]["wau"]) == (1, 1)
    assert out["2024-01-10"]["stickiness"] == 1.0


PARA = " ".join(f"a{i}" for i in range(1, 17))        # 16 unique tokens
PARA_NEAR = " ".join(f"a{i}" for i in range(1, 16)) + " zz"  # last token swapped
FILLER = " ".join(f"f{i}" for i in range(1, 17))      # 16 more unique tokens


def test_paragraph_twolevel_hand(spark):
    """Hand-verified two-level census. Segment grain is 16 tokens, so
    each string above is exactly one paragraph. Level 1: doc 1 repeats
    doc 0's paragraph verbatim (keep-first -> doc 1's copy is the
    exact dup). Level 2: doc 2's paragraph shares 13 of its 14
    3-shingles with PARA (Jaccard 13/15 = 0.867 >= 0.5; the 16-perm
    4x4 banding catches it — deterministic for these fixed strings,
    verified by running the pinned hash family). Doc 3 = dup + fresh
    filler exercises the 'trim' band; doc 4 is untouched."""
    from uber_data_pipeline_spark.operators.dedup import (
        paragraph_twolevel_census,
    )

    rows = [
        (0, PARA),                  # canonical: survives everything
        (1, PARA),                  # exact dup -> kept 0/16 -> drop
        (2, PARA_NEAR),             # near dup -> kept 0/16 -> drop
        (3, PARA + " " + FILLER),   # 2 segments: dup + fresh -> trim
        (4, FILLER),                # segment seen in doc 3? NO: doc 3's
        #   second segment IS the filler -> (3,1) is first, doc 4 dups it
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in paragraph_twolevel_census(docs).collect()
    }
    assert len(out) == 5

    a = out[0]  # first occurrence of PARA: fully kept
    assert (a["n_paras"], a["n_exact_dup"], a["n_near_dup"]) == (1, 0, 0)
    assert (a["total_tokens"], a["kept_tokens"]) == (16, 16)
    assert a["surviving_micro"] == 1_000_000 and a["decision"] == "keep"

    b = out[1]  # verbatim copy: exact dup, nothing survives
    assert (b["n_exact_dup"], b["kept_tokens"]) == (1, 0)
    assert b["decision"] == "drop"

    c = out[2]  # near dup at Jaccard 13/15
    assert (c["n_exact_dup"], c["n_near_dup"]) == (0, 1)
    assert c["decision"] == "drop"

    d_ = out[3]  # PARA (exact dup of doc 0's) + fresh filler
    assert (d_["n_paras"], d_["n_exact_dup"], d_["n_near_dup"]) == (2, 1, 0)
    assert (d_["total_tokens"], d_["kept_tokens"]) == (32, 16)
    assert d_["surviving_micro"] == 500_000 and d_["decision"] == "trim"

    e = out[4]  # FILLER: doc 3's second segment (3,1) sorts first
    assert (e["n_exact_dup"], e["kept_tokens"]) == (1, 0)
    assert e["decision"] == "drop"


def test_paragraph_twolevel_subthreshold_not_removed(spark):
    """A pair sharing fewer than half its shingles must survive level
    2 even when a band buckets them together: the integer-micro
    Jaccard verify is the gate, not the banding."""
    from uber_data_pipeline_spark.operators.dedup import (
        paragraph_twolevel_census,
    )

    # 8 shared tokens then 8 distinct ones: shingle overlap well under
    # Jaccard 0.5
    base = " ".join(f"s{i}" for i in range(1, 9))
    rows = [
        (0, base + " " + " ".join(f"x{i}" for i in range(1, 9))),
        (1, base + " " + " ".join(f"y{i}" for i in range(1, 9))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in paragraph_twolevel_census(docs).collect()
    }
    assert out[0]["decision"] == "keep" and out[1]["decision"] == "keep"
    assert out[1]["n_near_dup"] == 0


def test_quality_model_directional(spark):
    """The in-plan-trained scorer must rank target-language documents
    above off-target ones: en docs reuse a tight shared vocabulary
    (their hashed buckets dominate the target counts), the de docs a
    disjoint one."""
    from uber_data_pipeline_spark.operators.textops import (
        quality_model_scores,
    )

    en = "good clean prose with careful structure and clear meaning"
    de = "vollkommen anderes vokabular ohne gemeinsame token hier"
    rows = [(i, en, "en") for i in range(4)] + [
        (10 + i, de, "de") for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in quality_model_scores(docs).collect()}
    # n_feats = tokens + bigrams = 9 + 8
    assert out[0]["n_feats"] == 17
    en_scores = [out[i]["score_micro"] for i in range(4)]
    de_scores = [out[10 + i]["score_micro"] for i in range(4)]
    assert min(en_scores) > max(de_scores)
    assert all(out[i]["is_target"] for i in range(4))
    assert not any(out[10 + i]["is_target"] for i in range(4))


def test_quality_model_scoring_plan_rowlocal(spark):
    """The SCORING plan must be row-local: weights enter as a
    broadcast literal, so no Join, no Window, no keyed Exchange —
    only spread_rowlocal's gated round-robin is permitted."""
    from uber_data_pipeline_spark.queries import all_queries

    df = all_queries()["documents_quality_model"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("Join", "Window", "hashpartitioning", "rangepartitioning"):
        assert marker not in plan, f"{marker} in plan:\n{plan[:2000]}"
    assert plan.count("Exchange") <= 1
    if "Exchange" in plan:
        assert "RoundRobinPartitioning" in plan


def test_paragraph_twolevel_no_cartesian(spark):
    """Every join in the two-level plan is an equi-join (band/bucket
    or key equality) — no nested-loop or cartesian anywhere."""
    from uber_data_pipeline_spark.queries import all_queries

    df = all_queries()["dedup_paragraph_twolevel"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_spread_rowlocal_gate(spark):
    """spread_rowlocal is identity when the input already has >= core
    partitions, and repartitions round-robin when under-split."""
    from uber_data_pipeline_spark.operators.spread import spread_rowlocal

    cores = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(cores)
    assert spread_rowlocal(wide) is wide
    narrow = spark.range(1000).coalesce(1)
    out = spread_rowlocal(narrow)
    assert out.rdd.getNumPartitions() >= cores
    assert out.count() == 1000


def test_mann_kendall_hand(spark, tmp_path):
    """Hand-computed S and tie-corrected variance: 4 rising months +
    one outlier give S = 9 - 1 = 8; no ties -> var18 = 5*4*15."""
    from uber_data_pipeline_spark.queries.tpch_extra import (
        orders_mann_kendall,
    )

    rows = []
    for t, y in [(0, 100.0), (1, 110.0), (2, 120.0), (3, 999.0), (4, 140.0)]:
        rows.append((t, y, datetime.datetime(2024, 1 + t, 1)))
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = orders_mann_kendall(spark, str(tmp_path)).collect()[0]
    assert out["n_months"] == 5
    assert out["s_stat"] == 8          # 9 concordant pairs, 1 discordant
    assert out["var18"] == 5 * 4 * 15  # n(n-1)(2n+5), no ties
    assert out["trend"] == "increasing"


def test_mann_kendall_tie_correction(spark, tmp_path):
    """Two equal months form one tie group of 2: var18 = 3*2*11 -
    2*1*9 = 48; S counts only the two strict rises."""
    from uber_data_pipeline_spark.queries.tpch_extra import (
        orders_mann_kendall,
    )

    rows = [
        (0, 100.0, datetime.datetime(2024, 1, 1)),
        (1, 100.0, datetime.datetime(2024, 2, 1)),
        (2, 110.0, datetime.datetime(2024, 3, 1)),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = orders_mann_kendall(spark, str(tmp_path)).collect()[0]
    assert (out["s_stat"], out["var18"]) == (2, 48)
    assert out["trend"] == "increasing"


def test_cusum_drift_hand(spark, tmp_path):
    """Hand-run recursion: 4 days at 10 then 4 days at 20 events.
    mu = 15e6 micro, slack = 0.75e6. s+ stays 0 through the low
    regime then climbs 4.25e6/day; s- mirrors."""
    from uber_data_pipeline_spark.queries.events import events_cusum_drift

    rows = []
    eid = 0
    for day in range(1, 9):
        n = 10 if day <= 4 else 20
        for k in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 3, day, 1 + k % 20), 1,
                 "view", 1.0, "{}")
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r["day"].day: r for r in events_cusum_drift(spark, sf).collect()}
    assert len(out) == 8
    assert out[1]["mean_micro"] == 15_000_000
    # low regime: s+ floored at 0, s- accumulates 4.25e6/day
    assert [out[d]["s_pos_micro"] for d in (1, 2, 3, 4)] == [0, 0, 0, 0]
    assert [out[d]["s_neg_micro"] for d in (1, 2, 3, 4)] == [
        4_250_000, 8_500_000, 12_750_000, 17_000_000,
    ]
    # high regime: s+ climbs 4.25e6/day, s- drains 5.75e6/day to 0
    assert [out[d]["s_pos_micro"] for d in (5, 6, 7, 8)] == [
        4_250_000, 8_500_000, 12_750_000, 17_000_000,
    ]
    assert [out[d]["s_neg_micro"] for d in (5, 6, 7, 8)] == [
        11_250_000, 5_500_000, 0, 0,
    ]
    assert not any(out[d]["alarm_up"] or out[d]["alarm_down"] for d in out)


def test_quality_model_eval_hand(spark):
    """On the perfectly-separable directional corpus the eval gate
    must report a clean confusion matrix and P = R = F1 = 1.0."""
    from uber_data_pipeline_spark.operators.textops import quality_model_eval

    en = "good clean prose with careful structure and clear meaning"
    de = "vollkommen anderes vokabular ohne gemeinsame token hier"
    rows = [(i, en, "en") for i in range(4)] + [
        (10 + i, de, "de") for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = quality_model_eval(docs).collect()[0]
    assert (out["n_docs"], out["tp"], out["fp"], out["fn"], out["tn"]) == (
        8, 4, 0, 0, 4,
    )
    assert out["precision_micro"] == 1_000_000
    assert out["recall_micro"] == 1_000_000
    assert out["f1_micro"] == 1_000_000


def test_ivf_classify_separable_clusters(spark):
    """Two well-separated label clusters: the IVF-probed classifier
    and the exact-gemm baseline must both score 100% — the scale path
    may only diverge through probe misses, impossible when clusters
    are orthogonal."""
    from uber_data_pipeline_spark.operators.similarity import (
        ivf_topk,
        knn_classify,
    )

    rows = []
    for i in range(8):   # label 0: along e0, tiny distinct jitter on e1
        v = [0.0] * 64
        v[0] = 1.0
        v[1] = 0.01 * (i + 1)
        rows.append((i, v, 0))
    for i in range(8):   # label 1: along e32
        v = [0.0] * 64
        v[32] = 1.0
        v[33] = 0.01 * (i + 1)
        rows.append((100 + i, v, 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    exact = {r["label"]: r for r in knn_classify(emb, 3).collect()}
    ivf = {
        r["label"]: r
        for r in knn_classify(emb, 3, nn=ivf_topk(emb, 3)).collect()
    }
    for lbl in (0, 1):
        assert exact[lbl]["n"] == 8 and exact[lbl]["n_correct"] == 8
        assert ivf[lbl]["n"] == 8 and ivf[lbl]["n_correct"] == 8


def test_quality_model_empty_corpus(spark):
    """r12 review catch: an empty documents relation left every
    collected weight NULL and int(None) crashed plan construction
    where the oracle returned zero rows. The weights must fall back
    to the smoothed default (ratio 1.0) and the scorer return an
    empty frame."""
    from uber_data_pipeline_spark.operators.textops import (
        quality_model_scores,
    )

    docs = spark.createDataFrame([], "doc_id long, text string, lang string")
    out = quality_model_scores(docs)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_feats", "score_micro", "is_target",
    ]
