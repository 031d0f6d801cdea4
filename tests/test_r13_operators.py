"""r13 additions: REAL pure-stdlib codecs (BMP/PPM/WAV) behind the
codec registry, the paragraph-dedup oversized-bucket clip, and the
pool-aware spread conf gate."""

from __future__ import annotations

import struct

import pytest

from tests.conftest import SF_DIR
from uber_data_pipeline_spark.operators import multimodal as mm

# ----------------------------------------------------- codec fixtures


def test_bmp_roundtrip_hand():
    """Hand-computed features for 12 known bytes (one 4-px row):
    channel sums are byte positions mod 3."""
    data = bytes(range(1, 13))  # 1..12
    f = mm.decode_bmp(mm.encode_bmp(data))
    #               w    h    c0    c1    c2    max   n     sum
    assert f == [4.0, 1.0, 22.0, 26.0, 30.0, 12.0, 12.0, 78.0]


def test_bmp_zero_pads_partial_row():
    """13 bytes -> 2 rows, 24 pixel bytes; padding contributes zeros
    only. Byte 13 (value 255) lands at position 12 (channel 0)."""
    data = bytes(range(1, 13)) + b"\xff"
    f = mm.decode_bmp(mm.encode_bmp(data))
    assert f == [4.0, 2.0, 22.0 + 255.0, 26.0, 30.0, 255.0, 24.0, 78.0 + 255.0]


def test_bmp_file_layout_is_bottom_up():
    """encode_bmp must write REAL bottom-up BMP rows: the first raster
    row in the file is the LAST image row."""
    top = bytes([1] * 12)
    bottom = bytes([2] * 12)
    payload = mm.encode_bmp(top + bottom)
    assert payload[:2] == b"BM"
    offset = struct.unpack_from("<I", payload, 10)[0]
    assert offset == 54
    assert payload[54:66] == bottom  # file row 0 == image row h-1
    assert payload[66:78] == top


def test_bmp_decodes_foreign_top_down_variant():
    """The decoder is a real parser, not an inverse of encode_bmp: a
    TOP-DOWN BMP (negative height, the other legal layout) from
    another writer must decode to the same stats."""
    data = bytes(range(1, 25))
    normal = mm.decode_bmp(mm.encode_bmp(data))
    # hand-build top-down: same header but height = -2, rows in image order
    header = struct.pack("<2sIHHI", b"BM", 54 + 24, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 4, -2, 1, 24, 0, 24, 2835, 2835, 0, 0
    )
    assert mm.decode_bmp(header + data) == normal


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        mm.decode_bmp(b"not a bitmap at all")


def test_ppm_roundtrip_matches_bmp_features():
    """Identical payloads -> identical features across the two image
    codecs (the drop-in-peer contract)."""
    data = bytes(range(1, 40))
    assert mm.decode_ppm(mm.encode_ppm(data)) == mm.decode_bmp(
        mm.encode_bmp(data)
    )


def test_ppm_parses_comment_headers():
    """P6 headers may carry # comment lines — a real parser handles
    them."""
    data = bytes(range(1, 13))
    plain = mm.encode_ppm(data)
    commented = b"P6\n# made by hand\n4 1\n255\n" + plain.split(b"255\n", 1)[1]
    assert mm.decode_ppm(commented) == mm.decode_ppm(plain)


def test_wav_roundtrip_hand():
    """3 bytes -> 2 samples: 0x0201 = 513 and 0x0003 = 3 (odd tail
    zero-padded high byte)."""
    f = mm.decode_wav(mm.encode_wav(b"\x01\x02\x03"))
    assert f == [1.0, 2.0, 16000.0, 2.0, 516.0, 3.0, 513.0, 516.0]


def test_wav_negative_samples():
    """High bit of the second byte makes the sample negative —
    signed s16le decode, min/abs stats."""
    # sample = 0x8000 -> -32768
    f = mm.decode_wav(mm.encode_wav(b"\x00\x80"))
    assert f == [1.0, 2.0, 16000.0, 1.0, -32768.0, -32768.0, -32768.0, 32768.0]


def test_wav_empty_stream():
    f = mm.decode_wav(mm.encode_wav(b""))
    assert f == [1.0, 2.0, 16000.0, 0.0, 0.0, 0.0, 0.0, 0.0]


def test_register_codec_global_dispatch(spark):
    """register_codec installs a REAL decoder into the global
    registry and extract_features dispatches through it (the
    deployment path; the decode_real entry uses the scoped ``codecs``
    override instead)."""
    saved = dict(mm.CODECS)
    try:
        mm.register_codec("image", mm.decode_bmp)
        media = spark.createDataFrame(
            [(1, "image", bytearray(mm.encode_bmp(bytes(range(1, 13)))))],
            "media_id long, kind string, payload binary",
        )
        row = mm.extract_features(media).collect()[0]
        assert row["feat"] == [4.0, 1.0, 22.0, 26.0, 30.0, 12.0, 12.0, 78.0]
    finally:
        mm.CODECS.clear()
        mm.CODECS.update(saved)


def test_media_features_real_matches_oracle(spark, duck):
    """Full encode -> REAL decode -> stats roundtrip vs the closed-form
    DuckDB twin at sf0.001 (also swept by test_oracle_parity; kept
    here so a codec regression points at the codec, not the sweep)."""
    from uber_data_pipeline_spark.testing import compare

    sdf = mm.media_features_real(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ).toPandas()
    odf = duck.execute(mm.sql_media_features_real()).df()
    problems = compare("multimodal_decode_real", sdf, odf)
    assert not problems, "; ".join(problems)


# --------------------------------------- paragraph bucket-size defense


def _stress_docs(spark, n=600):
    """n one-segment docs sharing 15 of 16 tokens — near-identical but
    NOT exact (level 1 removes nothing), the template/boilerplate
    crawl shape that concentrates one band bucket."""
    base = " ".join(f"tok{i}" for i in range(15))
    rows = [(i, f"{base} unique{i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_bucket_cap_bounds_candidates(spark):
    """Uncapped, the planted bucket goes quadratic and near-dup
    removal drops ~all docs; capped at 50, only cap-prefix members
    can pair, so the damage (and the candidate volume) is bounded by
    bands * cap regardless of corpus size."""
    from uber_data_pipeline_spark.operators.dedup import (
        NUM_BANDS,
        paragraph_twolevel_census,
    )

    docs = _stress_docs(spark)
    uncapped = paragraph_twolevel_census(docs, bucket_cap=10_000).toPandas()
    spark.catalog.clearCache()
    assert (uncapped["decision"] == "drop").sum() >= 550

    cap = 50
    capped = paragraph_twolevel_census(docs, bucket_cap=cap).toPandas()
    spark.catalog.clearCache()
    dropped = (capped["decision"] == "drop").sum()
    assert dropped <= NUM_BANDS * cap
    assert dropped < (uncapped["decision"] == "drop").sum()


def test_paragraph_bucket_stats_detects_hot_bucket(spark):
    """The telemetry twin must SEE the load the clip defends against:
    on the planted boilerplate corpus, some band reports a bucket
    over a small cap and the clipped-member count matches
    max_bucket - cap at least for the hottest bucket; on the real
    sf0.001 corpus, nothing exceeds the production cap (so the capped
    census is provably un-clipped there)."""
    from uber_data_pipeline_spark.operators.dedup import (
        PARA_BUCKET_CAP,
        paragraph_bucket_stats,
    )

    stress = paragraph_bucket_stats(
        _stress_docs(spark, n=200), bucket_cap=50
    ).toPandas()
    spark.catalog.clearCache()
    assert (stress["n_over_cap"] > 0).any()
    hot = stress.loc[stress["max_bucket"].idxmax()]
    assert hot["n_clipped_members"] >= hot["max_bucket"] - 50

    real = paragraph_bucket_stats(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"),
        bucket_cap=PARA_BUCKET_CAP,
    ).toPandas()
    spark.catalog.clearCache()
    assert (real["n_over_cap"] == 0).all()
    assert (real["n_clipped_members"] == 0).all()


def test_paragraph_bucket_cap_oracle_parity_on_stress(spark, duck):
    """Both engines implement the clip identically on the corpus that
    actually exercises it (the sf corpora never hit cap=256)."""
    from uber_data_pipeline_spark.operators.dedup import (
        paragraph_twolevel_census,
        sql_paragraph_twolevel,
    )
    from uber_data_pipeline_spark.testing import compare

    docs = _stress_docs(spark, n=120)
    sdf = paragraph_twolevel_census(docs, bucket_cap=30).toPandas()
    spark.catalog.clearCache()
    duck.register("para_stress", docs.toPandas())
    try:
        odf = duck.execute(
            sql_paragraph_twolevel(table="para_stress", bucket_cap=30)
        ).df()
    finally:
        duck.unregister("para_stress")
    problems = compare("paragraph_stress", sdf, odf)
    assert not problems, "; ".join(problems)


# --------------------------------------------------- n-gram novelty


def test_ngram_novelty_hand(spark):
    """doc0 introduces both its shingles (novelty 1.0); doc1 shares
    'a b c' with doc0 so only 'b c e' is novel (0.5); doc2 is too
    short for any 3-shingle (0, with zero counts)."""
    from uber_data_pipeline_spark.operators.textops import ngram_novelty

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c e"), (2, "x y")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert out[0]["n_shingles"] == 2 and out[0]["novelty_micro"] == 1_000_000
    assert out[1]["n_shingles"] == 2 and out[1]["n_novel"] == 1
    assert out[1]["novelty_micro"] == 500_000
    assert out[2]["n_shingles"] == 0 and out[2]["novelty_micro"] == 0


def test_ngram_novelty_copy_scores_zero(spark):
    """A verbatim copy with a higher doc_id introduces nothing."""
    from uber_data_pipeline_spark.operators.textops import ngram_novelty

    docs = spark.createDataFrame(
        [(7, "p q r s t"), (9, "p q r s t")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert out[7]["novelty_micro"] == 1_000_000
    assert out[9]["novelty_micro"] == 0


# ------------------------------------------- importance resample


def test_importance_resample_hand(spark):
    """The acceptance rule replays in plain Python: draw =
    md5('rs|<doc_id>') first-12-hex mod 1e9+7 mod 1e6; kept iff
    draw * 1e6 < weight_micro * alpha. A corpus where every doc IS
    the target gives every doc weight 1.0 exactly, so kept reduces
    to draw < alpha."""
    import hashlib

    from uber_data_pipeline_spark.operators.textops import (
        RESAMPLE_ALPHA_MICRO,
        importance_resample,
    )

    docs = spark.createDataFrame(
        [(i, "en", f"w{i} x{i} y{i}") for i in range(40)],
        "doc_id long, lang string, text string",
    )
    out = {r["doc_id"]: r for r in importance_resample(docs).collect()}
    assert len(out) == 40
    for i in range(40):
        draw = (
            int(hashlib.md5(f"rs|{i}".encode()).hexdigest()[:12], 16)
            % 1000000007
            % 1_000_000
        )
        assert out[i]["draw_micro"] == draw, i
        # all-token-vocab is its own target: every ratio is exactly 1
        assert out[i]["weight_micro"] == 1_000_000, i
        assert out[i]["kept"] == (draw * 1_000_000
                                  < 1_000_000 * RESAMPLE_ALPHA_MICRO), i
    kept = sum(1 for r in out.values() if r["kept"])
    assert 0 < kept < 40  # the draw actually splits the corpus


def test_importance_resample_weightless_doc_never_kept(spark):
    """A doc that produces no token rows (NULL text: split(NULL)
    explodes to nothing) carries weight 0 and is never kept."""
    from uber_data_pipeline_spark.operators.textops import (
        importance_resample,
    )

    docs = spark.createDataFrame(
        [(1, "en", "alpha beta gamma"), (2, "de", None)],
        "doc_id long, lang string, text string",
    )
    out = {r["doc_id"]: r for r in importance_resample(docs).collect()}
    assert out[2]["weight_micro"] == 0 and not out[2]["kept"]


# ------------------------------------------- pool-aware spread gate


def test_spread_conf_disable_and_cap(spark):
    """spark.udp.spread.enabled=false -> identity;
    spark.udp.spread.maxPartitions caps the target (the pool-aware
    knob bench.py's concurrent pass sets)."""
    from uber_data_pipeline_spark.operators.spread import spread_rowlocal

    narrow = spark.range(1000).coalesce(1)
    try:
        spark.conf.set("spark.udp.spread.enabled", "false")
        assert spread_rowlocal(narrow) is narrow
        spark.conf.unset("spark.udp.spread.enabled")

        spark.conf.set("spark.udp.spread.maxPartitions", "4")
        assert spread_rowlocal(narrow).rdd.getNumPartitions() == 4
        # an input already at the cap is left alone (no churn exchange)
        at_cap = spark.range(1000).repartition(4)
        assert spread_rowlocal(at_cap) is at_cap
    finally:
        for k in ("spark.udp.spread.enabled", "spark.udp.spread.maxPartitions"):
            try:
                spark.conf.unset(k)
            except Exception:  # noqa: BLE001
                pass


def _plan_counts(spark, name):
    from uber_data_pipeline_spark.queries import all_queries

    df = all_queries()[name](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    return {
        "keyed": plan.count("hashpartitioning")
        + plan.count("rangepartitioning"),
        "roundrobin": plan.count("RoundRobinPartitioning"),
    }


@pytest.fixture(scope="module")
def _spread_entries():
    from uber_data_pipeline_spark.operators.spread import SPREAD_OPTED_ENTRIES

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    missing = [n for n in SPREAD_OPTED_ENTRIES if n not in qs]
    assert not missing, f"stale SPREAD_OPTED_ENTRIES: {missing}"
    return SPREAD_OPTED_ENTRIES


def test_spread_opted_entries_listed(_spread_entries):
    assert len(_spread_entries) >= 8


def test_spread_differential_plan_invariant(spark, _spread_entries):
    """ADVICE r12: for EVERY spread-opted entry, the spread may add
    round-robin Exchanges only — the keyed-Exchange count must be
    IDENTICAL with the spread disabled (a spread that changes keyed
    shuffle shape is a bug, whatever the bench says)."""
    for name in _spread_entries:
        on = _plan_counts(spark, name)
        try:
            spark.conf.set("spark.udp.spread.enabled", "false")
            off = _plan_counts(spark, name)
        finally:
            try:
                spark.conf.unset("spark.udp.spread.enabled")
            except Exception:  # noqa: BLE001
                pass
        assert on["keyed"] == off["keyed"], (
            f"{name}: keyed exchanges {off['keyed']} -> {on['keyed']} "
            "with spread enabled"
        )
        assert on["roundrobin"] >= off["roundrobin"], name


# ------------------------------------------------ join-view IVM (r13)


def test_ivm_join_delta_matches_full_recompute(spark):
    """Maintenance == recompute, proven inside one engine: the
    retract-and-delta-join maintained view must aggregate identically
    to the flat join rebuilt from the latest-version-wins merge."""
    from uber_data_pipeline_spark.sources.cdc import merge_latest
    from uber_data_pipeline_spark.queries.pipeline import (
        _cdc_frames,
        ivm_join_delta,
    )
    from uber_data_pipeline_spark.catalog import load_table

    import pyspark.sql.functions as F

    got = {
        r["status"]: r
        for r in ivm_join_delta(spark, SF_DIR).collect()
    }
    base, delta = _cdc_frames(spark, SF_DIR)
    merged = merge_latest(base, delta, ["o_orderkey"], "version")
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.expr(
            "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))"
        ).alias("line_rev"),
    )
    want = {
        r["status"]: r
        for r in merged.join(li, "o_orderkey")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n_lines"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.sum("line_rev").alias("rev_dec"),
        )
        .collect()
    }
    assert set(got) == set(want) and got
    delta_total = 0
    for s, w in want.items():
        g = got[s]
        assert g["n_lines"] == w["n_lines"], s
        assert g["n_orders"] == w["n_orders"], s
        assert abs(g["revenue"] - float(w["rev_dec"])) < 1e-6, s
        delta_total += g["lines_from_delta"]
    # the CDC split really exercised the delta path
    assert delta_total > 0
    # every updated order's lines come from the delta side: status U
    # exists only in the delta, so all its lines must be delta-sourced
    assert got["U"]["lines_from_delta"] == got["U"]["n_lines"]


# ---------------------------------------- bitext margin mining (r13)


def _bitext_fixture(spark):
    """8 vecs, parity split: A = {0,2,4,6}, B = {1,3,5,7}. vec 0 and
    vec 1 are the planted translation pair (identical direction);
    vec 6 is anti-correlated with every B vector (all cos < 0)."""
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    rows = [
        (0, unit(0.0)),        # A: the query with a perfect mate
        (2, unit(1.2)),        # A: ordinary
        (4, unit(1.9)),        # A: ordinary
        (6, [0.0, 0.0, 1.0, 0.0]),  # A: orthogonal/negative to all B
        (1, unit(0.0)),        # B: the mate (cos(0,1) = 1.0)
        (3, unit(1.0)),        # B: decoy
        (5, unit(2.2)),        # B: decoy
        (7, [0.0, 0.0, -1.0, 0.1]),  # B: makes vec 6's cosines < 0
    ]
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    )


def test_bitext_margin_hand(spark):
    """The planted identical pair must win with the hand-computed
    rational margin; the all-negative query must be absent."""
    from uber_data_pipeline_spark.operators.similarity import (
        bitext_margin_mining,
    )

    out = {
        r["vec_id"]: r
        for r in bitext_margin_mining(_bitext_fixture(spark)).collect()
    }
    # vec 6: every cosine vs B is <= 0 -> no valid candidate, no row
    assert 6 not in out
    assert set(out) == {0, 2, 4}
    best = out[0]
    assert best["best_id"] == 1
    assert best["cos_micro"] == 1_000_000
    # hand margin: cos(0, y) for y in B sorted desc gives the top-3
    # (k=4 but only 3 positive-capable B rows matter; vec 7 still
    # counts in the top-k by value). Replay the exact integer rule.
    import math

    import numpy as np

    def cosm(a, b):
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        c = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        return int(np.rint(np.round(c, 6) * 1_000_000))

    vecs = {
        0: [math.cos(0.0), math.sin(0.0), 0.0, 0.0],
        2: [math.cos(1.2), math.sin(1.2), 0.0, 0.0],
        4: [math.cos(1.9), math.sin(1.9), 0.0, 0.0],
        6: [0.0, 0.0, 1.0, 0.0],
        1: [math.cos(0.0), math.sin(0.0), 0.0, 0.0],
        3: [math.cos(1.0), math.sin(1.0), 0.0, 0.0],
        5: [math.cos(2.2), math.sin(2.2), 0.0, 0.0],
        7: [0.0, 0.0, -1.0, 0.1],
    }
    a_ids, b_ids = [0, 2, 4, 6], [1, 3, 5, 7]
    k = 4

    def topk_stats(qid, cands, qside_vecs):
        sims = sorted(
            ((cosm(qside_vecs[qid], vecs[c]), -c) for c in cands),
            reverse=True,
        )[:k]
        return sum(s for s, _ in sims), len(sims)

    sa, na = topk_stats(0, b_ids, vecs)
    sb, nb = topk_stats(1, a_ids, vecs)
    den = sa * nb + sb * na
    want = (2_000_000 * 1_000_000 * na * nb) // den
    assert best["margin_micro"] == want
    assert best["is_accepted"] == (want >= 1_060_000)
    # the identical pair is genuinely hub-discounted above 1.0
    assert want > 1_000_000


def test_bitext_matches_quadratic_oracle_on_fixture(spark, duck):
    """Engine-vs-engine on the fixture: register the 8-row table as
    DuckDB 'embeddings' and compare full frames."""
    import pandas as pd

    from uber_data_pipeline_spark.operators.similarity import (
        bitext_margin_mining,
        sql_bitext_margin_mining,
    )

    fix = _bitext_fixture(spark)
    got = (
        bitext_margin_mining(fix)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    duck.register("bitext_fix", fix.toPandas())
    want = (
        duck.sql(sql_bitext_margin_mining(table="bitext_fix"))
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"is_accepted": bool}),
        want.astype(
            {
                "vec_id": "int64",
                "best_id": "int64",
                "cos_micro": "int64",
                "margin_micro": "int64",
                "is_accepted": bool,
            }
        ),
    )


# ------------------------------------ Markov removal attribution (r13)


def test_markov_attribution_hand(spark):
    """Planted journeys with a hand-solvable chain: 'click' carries
    ALL converting paths (removal zeroes conversion, full credit);
    'view' only appears on a dead-end journey (zero effect)."""
    from datetime import datetime

    from uber_data_pipeline_spark.queries.events import (
        markov_attribution_frame,
    )

    def ts(i):
        return datetime(2024, 1, 1, 0, i)

    rows = [
        (1, ts(0), 10, "click", 0.0, "{}"),
        (1, ts(1), 11, "purchase", 0.0, "{}"),
        (2, ts(0), 20, "click", 0.0, "{}"),
        (2, ts(1), 21, "purchase", 0.0, "{}"),
        (3, ts(0), 30, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double, props string",
    )
    out = {
        r["channel"]: r
        for r in markov_attribution_frame(spark, ev).collect()
    }
    assert set(out) == {"click", "view"}
    # p(start->click) = 2e6 DIV 3 = 666666; p(click->conv) = 1e6;
    # fixed point: v(start) = 666666 * 1e6 // 1e6 = 666666
    assert out["click"]["base_conv_micro"] == 666666
    assert out["click"]["removed_conv_micro"] == 0
    assert out["click"]["removal_effect_micro"] == 666666
    assert out["click"]["attribution_micro"] == 1_000_000
    assert out["view"]["removal_effect_micro"] == 0
    assert out["view"]["attribution_micro"] == 0
    assert out["view"]["removed_conv_micro"] == 666666


def test_markov_attribution_resegments_at_purchase(spark):
    """An event AFTER a purchase starts a NEW journey from _start —
    its credit must not leak into the earlier converting journey."""
    from datetime import datetime

    from uber_data_pipeline_spark.queries.events import (
        _markov_transition_probs,
    )

    def ts(i):
        return datetime(2024, 1, 1, 0, i)

    rows = [
        (1, ts(0), 10, "click", 0.0, "{}"),
        (1, ts(1), 11, "purchase", 0.0, "{}"),
        (1, ts(2), 12, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double, props string",
    )
    got = {
        (r["src"], r["dst"]): r["p_micro"]
        for r in _markov_transition_probs(ev).collect()
    }
    assert got == {
        ("_start", "click"): 500_000,  # 1 of 2 _start exits
        ("_start", "view"): 500_000,
        ("click", "_conv"): 1_000_000,
        ("view", "_null"): 1_000_000,
    }


# ----------------------------------------- WordPiece encode (r13)


def test_wordpiece_greedy_hand(spark):
    """Replay greedy longest-match-first in plain Python against the
    operator's own mined vocab on a tiny corpus."""
    from uber_data_pipeline_spark.operators.textops import (
        WP_MAX_PIECE,
        wordpiece_encode,
    )

    docs = spark.createDataFrame(
        [
            (0, "unitable unit able", "en", "s", 18),
            (1, "unit unit table", "en", "s", 15),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {r["doc_id"]: r for r in wordpiece_encode(docs).collect()}
    # mine the vocab the same way and replay
    from collections import Counter

    words = Counter()
    for t in ("unitable unit able", "unit unit table"):
        words.update(t.split(" "))
    piece_n = Counter()
    for w, wc in words.items():
        for i in range(len(w)):
            for ln in range(1, min(WP_MAX_PIECE, len(w) - i) + 1):
                piece_n[(w[i : i + ln], i == 0)] += wc
    # all pieces kept (corpus is far under K per class)
    sa = {p for (p, st) in piece_n if st}
    ca = {p for (p, st) in piece_n if not st}

    def encode(w):
        pos, n = 0, 0
        while pos < len(w):
            vocab = sa if pos == 0 else ca
            for ln in range(min(WP_MAX_PIECE, len(w) - pos), 0, -1):
                if w[pos : pos + ln] in vocab:
                    pos += ln
                    n += 1
                    break
            else:
                return None  # UNK
        return n

    for doc_id, text in ((0, "unitable unit able"), (1, "unit unit table")):
        toks = text.split(" ")
        units = sum(encode(w) or 1 for w in toks)
        assert out[doc_id]["n_tokens"] == len(toks)
        assert out[doc_id]["n_wp_units"] == units, doc_id
        assert out[doc_id]["n_unk_words"] == sum(
            1 for w in toks if encode(w) is None
        )
        assert (
            out[doc_id]["fertility_micro"]
            == units * 1_000_000 // len(toks)
        )


def test_wordpiece_unk_fires_outside_topk(spark, duck):
    """With a tiny k the rare character 'z' falls outside the vocab
    and its word collapses to [UNK] — the whole-word failure rule is
    live, and the DuckDB twin agrees on the same corpus."""
    import pandas as pd

    from uber_data_pipeline_spark.operators.textops import (
        sql_wordpiece_encode,
        wordpiece_encode,
    )

    text = "aa ab aa ab aa ab aa ab zz"
    docs = spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = wordpiece_encode(docs, k=3).collect()[0]
    assert got["n_unk_words"] == 1  # 'zz' has no start piece in top-3
    assert got["n_tokens"] == 9
    duck.register("wp_docs", docs.toPandas())
    want = duck.sql(
        sql_wordpiece_encode(table="wp_docs", k=3)
    ).df().iloc[0]
    assert int(want["n_unk_words"]) == 1
    assert int(want["n_wp_units"]) == got["n_wp_units"]
    assert int(want["fertility_micro"]) == got["fertility_micro"]
