"""Event-stream analytics (batch forms; streaming variants live in
streaming/). Tumbling-window aggregation, gap sessionization, and a
staged funnel over the `events` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uber_data_pipeline_spark.catalog import load_table
from uber_data_pipeline_spark.functions.numeric import dsum, sql_dsum
from uber_data_pipeline_spark.operators import sketches
from uber_data_pipeline_spark.operators.sessions import sessionize
from uber_data_pipeline_spark.operators.temporal import (
    asof_attach,
    forward_window_counts_range,
)

SESSION_GAP_SECONDS = 1800
FORWARD_HORIZON_SECONDS = 300


def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + value sum.
    Uses F.window (the same operator the streaming path uses with a
    watermark); window start exposed as a plain timestamp column."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min) per user: session bounds + size.
    Lag-compare-cumsum over a per-user window, then a per-session
    aggregate — both JVM-side, partitioned by user_id."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    s = sessionize(ev, "user_id", "ts", SESSION_GAP_SECONDS, "session_id")
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def events_native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same 30-min gap sessions through Spark's NATIVE
    `session_window` operator — one groupBy, no lag/cumsum window
    pass; the built-in merges overlapping per-row [ts, ts+gap)
    intervals into sessions at aggregation time (and is the form
    that runs incrementally under Structured Streaming with merging
    session state). Twin of `events_sessionization` (custom
    lag-compare-cumsum): same sessions, boundaries expressed as
    (start = first ts, end = last ts + gap — the operator's interval
    semantics), which is exactly what the oracle recomputes from the
    gap-cumsum form."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_SECONDS} seconds").alias("w"),
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end_gap"),
            "n_events",
        )
    )


def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct active users per day: exact COUNT(DISTINCT) — Spark
    expands it to a two-phase (day, user) pre-aggregate, so the
    distinct set never concentrates on one node. At 100 TB, swap in
    approx_count_distinct(user_id, 0.01) (HyperLogLog++, one pass,
    fixed sketch memory) when ±1% is acceptable."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


def events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day x event_type counts pivoted to columns. The pivot values
    are DECLARED (not discovered) — an undeclared pivot runs an extra
    distinct-scan job to find the columns, a full pass at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", ["view", "click", "purchase", "signup"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["view", "click", "purchase", "signup"])
        .select(
            "day",
            F.col("view").alias("n_view"),
            F.col("click").alias("n_click"),
            F.col("purchase").alias("n_purchase"),
            F.col("signup").alias("n_signup"),
        )
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: users counted at each
    stage when their first later-stage event follows their first
    earlier-stage event. One pivot-style conditional aggregation per
    user, then a single global rollup row."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return per_user.agg(
        F.count(F.col("t_view")).alias("n_view"),
        F.count(
            F.when(F.col("t_click") > F.col("t_view"), 1)
        ).alias("n_view_then_click"),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("n_full_funnel"),
    )


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window: 1-hour windows every 30 minutes per
    event_type. F.window with a slide replicates each row into
    width/slide windows map-side (2 here) before the partial
    aggregate — the replication factor is the constant width/slide,
    independent of data volume."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, distinct
    active users per (cohort week, week offset). Two reduced
    aggregates (per-user first week; distinct user-week activity) and
    one join on the high-cardinality user key — the weekly matrix
    itself is tiny."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    )
    first_week = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = ev.distinct()
    return (
        activity.join(first_week, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


def events_asof_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the user's latest
    at-or-before 'view' event (operators/temporal.asof_attach — the
    union + single-window form: no join, one shuffle on user_id).
    Outputs the view timestamp, prior-view count, and the exact
    microsecond gap (integer, so engines agree bit-for-bit)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = asof_attach(purchases, views, "user_id", "ts", "ts")
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("asof_ts").alias("last_view_ts"),
        F.col("n_prior").alias("n_prior_views"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("micros_since_view"),
    )


def events_forward_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded forward-window count: per event, how many same-user
    events land strictly within the next 5 minutes.

    r10: ONE RANGE-frame window (operators/temporal.
    forward_window_counts_range) — Spark's sliding range-frame
    accumulator counts matches in O(n log n) total even when the
    match count itself grows quadratically with density, which is
    what made the former binned equi-join density-bound (the
    bucketed technique remains in operators/temporal.
    forward_window_counts for row-attaching joins)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = forward_window_counts_range(
        ev, "user_id", "ts", "event_id", FORWARD_HORIZON_SECONDS
    )
    return out.select(
        "event_id", "user_id", F.col("n_within_horizon").alias("n_next_5min")
    )


def events_json_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the `props` JSON column with
    a DECLARED schema (from_json — one typed parse, no per-field
    re-parse like repeated get_json_object calls) and aggregate the
    extracted metric per event_type. All-integer outputs, exact in
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").alias("n_distinct_k"),
    )


def events_variant_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events_json_kpis` through Spark 4's VARIANT type: props is
    parsed ONCE into the open-schema binary-encoded variant
    (parse_json), fields extracted with variant_get — the
    schemaless-ingest path for props whose shape drifts, vs
    from_json's declared schema. Same aggregate, same oracle as the
    declared-schema twin (DuckDB reads the JSON directly)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.selectExpr(
        "event_type",
        "variant_get(parse_json(props), '$.k', 'int') AS k",
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").alias("n_distinct_k"),
    )


ZSCORE_THRESHOLD = 2.0


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers: events with |value - mean| >
    2 std. The moments come from ONE decimal-exact aggregate (sum and
    sum-of-squares — order-independent, engine-identical), the stats
    table is event_type-cardinality (broadcast join back), and z runs
    in IEEE double on exact inputs, so the >2.0 boundary is identical
    in both engines. sqrt is correctly rounded per IEEE in both."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    stats = (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("s1"),
            F.sum((F.col("value") * F.col("value")).cast("decimal(25,6)")).alias(
                "s2"
            ),
        )
        .selectExpr(
            "event_type",
            "CAST(s1 AS double) / n AS mean",
            "sqrt(greatest(CAST(s2 AS double) / n "
            "- (CAST(s1 AS double) / n) * (CAST(s1 AS double) / n), 0.0d)) AS std",
        )
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs((F.col("value") - F.col("mean")) / F.col("std")) > ZSCORE_THRESHOLD)
        .selectExpr(
            "event_id",
            "event_type",
            "value",
            "CAST(CAST((value - mean) / std AS decimal(18,6)) AS double) AS z",
        )
    )


def events_seasonal_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal decomposition of hourly traffic — the
    diurnal-baseline anomaly detector (events_anomaly_zscore's global
    z misses that 3 AM and 3 PM have different normals): hourly
    counts reduce the stream to one row per wall-clock hour, the
    24-slot hour-of-day profile (mean + std per slot, decimal-exact
    moments) broadcasts back, and each hourly bucket is scored
    against ITS OWN slot's baseline.

    Scale shape: the hourly relation is bounded by the time span
    (never corpus-sized — counts partial-aggregate map-side); the
    profile is 24 rows; everything downstream is row-local on the
    reduced series. Output: bucket_ts, hod, n_events, expected,
    residual, z, is_anomaly."""
    ev = load_table(spark, sf_dir, "events").select("ts")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.count("*").alias("n_events"))
    prof = (
        hourly.groupBy(F.hour("bucket_ts").cast("int").alias("hod"))
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum(F.col("n_events").cast("decimal(25,6)")).alias("s1"),
            # square in DOUBLE first: a bigint product overflows long
            # before the double does (the corr_matrix recipe)
            F.sum(
                (
                    F.col("n_events").cast("double")
                    * F.col("n_events").cast("double")
                ).cast("decimal(25,6)")
            ).alias("s2"),
        )
        .selectExpr(
            "hod",
            "CAST(s1 AS DOUBLE) / n_buckets AS mean",
            "sqrt(greatest(CAST(s2 AS DOUBLE) / n_buckets"
            " - (CAST(s1 AS DOUBLE) / n_buckets)"
            " * (CAST(s1 AS DOUBLE) / n_buckets), 0.0D)) AS std",
        )
    )
    return (
        hourly.withColumn("hod", F.hour("bucket_ts").cast("int"))
        .join(F.broadcast(prof), "hod")
        .selectExpr(
            "bucket_ts",
            "hod",
            "n_events",
            "CAST(CAST(mean AS decimal(18,6)) AS DOUBLE) AS expected",
            "CAST(CAST(n_events - mean AS decimal(18,6)) AS DOUBLE)"
            " AS residual",
            "CAST(CAST(CASE WHEN std > 0.0D THEN (n_events - mean) / std"
            " ELSE 0.0D END AS decimal(18,6)) AS DOUBLE) AS z",
            "CASE WHEN std > 0.0D THEN"
            " abs((n_events - mean) / std) > 2.0D ELSE false END"
            " AS is_anomaly",
        )
    )


def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-users per event_type — the
    sketch swap-in for events_distinct_users' exact two-phase
    expansion. See operators/sketches.py for the construction and why
    the estimate is oracle-checkable bit-for-bit."""
    return sketches.hll_distinct(load_table(spark, sf_dir, "events"))


def events_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch per-user frequency estimates vs exact counts.
    The 4x512 integer grid is the only state that scales — see
    operators/sketches.py."""
    return sketches.countmin_freq(load_table(spark, sf_dir, "events"))


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive
    event_types per user: lag() over (user_id, ts, event_id) then one
    bounded-cardinality groupBy (type x type). The window partitions
    by user_id — millions of small partitions, never a global sort —
    and the tie-break on event_id makes the sequence (hence the
    counts) deterministic in both engines. Session entry points
    surface as prev_type='_start'."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .fillna({"prev_type": "_start"})
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n_transitions"))
    )


MARKOV_ITERS = 8  # fixed-point steps for the absorbing-chain solve


def _markov_transition_probs(ev: DataFrame) -> DataFrame:
    """Journey-grain Markov transitions in integer micro-probability:
    each purchase terminates a journey (dst '_conv'); the event after
    a purchase (or a user's first event) enters from '_start'; a
    user's trailing non-purchase event additionally exits to '_null'.
    One per-user window pass — every event emits exactly one incoming
    transition, so no journey materialization."""
    from pyspark.sql import Window

    ev = ev.select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_raw", F.lag("event_type").over(w)).withColumn(
        "next_raw", F.lead("event_type").over(w)
    )
    incoming = seq.selectExpr(
        "CASE WHEN prev_raw IS NULL OR prev_raw = 'purchase'"
        " THEN '_start' ELSE prev_raw END AS src",
        "CASE WHEN event_type = 'purchase' THEN '_conv'"
        " ELSE event_type END AS dst",
    )
    trailing = seq.filter(
        "next_raw IS NULL AND event_type != 'purchase'"
    ).selectExpr("event_type AS src", "'_null' AS dst")
    cnt = (
        incoming.unionByName(trailing)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )
    tot = cnt.groupBy("src").agg(F.sum("n").alias("t"))
    return cnt.join(tot, "src").selectExpr(
        "src", "dst", "CAST(n * 1000000 DIV t AS BIGINT) AS p_micro"
    )


def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2016, the
    data-driven alternative to last-touch): model journeys as a
    first-order absorbing Markov chain over channel states with CONV
    and NULL absorbers, then credit each channel by how much the
    chain's conversion probability DROPS when that channel's inbound
    transitions are redirected to NULL — the "removal effect",
    normalized into attribution shares. Extends
    `events_transition_matrix` (same per-user lag sequencing) with
    the absorbing-chain solve.

    Exactness + determinism: transition probabilities are integer
    micros (count * 1e6 DIV out-degree); the K-step fixed point
        v_{k+1}(s) = p(s,CONV) + sum_c p(s,c) * v_k(c) DIV 1e6
    floors each TERM before the integer sum, so the result is
    independent of summation order — no float path anywhere. Removal
    monotonically shrinks the transition set, so effects are >= 0 and
    the positive-operand DIV agrees across engines.

    Scale shape: the only data-sized work is the per-user window pass
    and a vocab^2-bounded groupBy; the collected matrix is a k-row
    codebook (states = event-type vocabulary + 3 sentinels), and the
    K x |vocab|^2 solve is driver-side integer arithmetic on that
    codebook. NOTE the quality-model caveat applies: building this
    DataFrame runs the transition job eagerly at plan-construction
    time (the result is a literal frame).

    Columns: channel, base_conv_micro, removed_conv_micro,
    removal_effect_micro, attribution_micro."""
    return markov_attribution_frame(
        spark, load_table(spark, sf_dir, "events")
    )


def markov_attribution_frame(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """Core of :func:`events_markov_attribution` over an explicit
    events frame (user_id, ts, event_id, event_type ...)."""
    probs = {
        (r["src"], r["dst"]): r["p_micro"]
        for r in _markov_transition_probs(ev).collect()
    }
    channels = sorted(
        {
            r["event_type"]
            for r in ev.select("event_type").distinct().collect()
            if r["event_type"] != "purchase"
        }
    )
    states = ["_start"] + channels

    def solve(removed: str | None) -> int:
        p = {
            sd: v for sd, v in probs.items() if removed is None or sd[1] != removed
        }
        v = {s: 0 for s in states}
        for _ in range(MARKOV_ITERS):
            nv = {}
            for s in states:
                acc = p.get((s, "_conv"), 0)
                for c in channels:
                    acc += p.get((s, c), 0) * v[c] // 1_000_000
                nv[s] = acc
            v = nv
        return v["_start"]

    base = solve(None)
    effects = {c: base - solve(c) for c in channels}
    total = sum(effects.values())
    rows = [
        (
            c,
            base,
            base - effects[c],
            effects[c],
            effects[c] * 1_000_000 // total if total > 0 else 0,
        )
        for c in channels
    ]
    return spark.createDataFrame(
        rows,
        "channel string, base_conv_micro long, removed_conv_micro long,"
        " removal_effect_micro long, attribution_micro long",
    )


def _markov_attribution_oracle(iters: int = MARKOV_ITERS) -> str:
    """DuckDB twin: identical window sequencing and micro-int
    probabilities; the fixed point is UNROLLED as `iters` chained
    GROUP BY CTEs (no recursive aggregate), one (scenario, state)
    vector per step, scenarios = base + one removal per channel.
    Every step CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    each step references its predecessor twice — unmaterialized,
    the chain re-evaluates the whole pipeline 2^iters times."""
    steps = []
    for k in range(1, iters + 1):
        prev = f"v{k-1}"
        steps.append(f"""
        v{k} AS MATERIALIZED (
            SELECT v.scenario, v.state,
                   COALESCE(SUM(CASE
                       WHEN t.dst = '_conv' THEN t.p_micro
                       WHEN t.dst NOT IN ('_conv', '_null')
                           THEN t.p_micro * pv.v // 1000000
                   END), 0) AS v
            FROM {prev} v
            LEFT JOIN ptrans t
              ON t.scenario = v.scenario AND t.src = v.state
            LEFT JOIN {prev} pv
              ON pv.scenario = v.scenario AND pv.state = t.dst
            GROUP BY 1, 2
        )""")
    chain = ",".join(steps)
    return f"""
        WITH seq AS (
            SELECT user_id, event_id, event_type,
                   LAG(event_type) OVER w AS prev_raw,
                   LEAD(event_type) OVER w AS next_raw
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id)
        ),
        trans_raw AS (
            SELECT CASE WHEN prev_raw IS NULL OR prev_raw = 'purchase'
                        THEN '_start' ELSE prev_raw END AS src,
                   CASE WHEN event_type = 'purchase' THEN '_conv'
                        ELSE event_type END AS dst
            FROM seq
            UNION ALL
            SELECT event_type AS src, '_null' AS dst
            FROM seq WHERE next_raw IS NULL AND event_type != 'purchase'
        ),
        cnt AS (SELECT src, dst, COUNT(*) AS n FROM trans_raw GROUP BY 1, 2),
        tot AS (SELECT src, SUM(n) AS t FROM cnt GROUP BY 1),
        p AS MATERIALIZED (
            SELECT c.src, c.dst,
                   CAST(c.n * 1000000 // t.t AS BIGINT) AS p_micro
            FROM cnt c JOIN tot t USING (src)
        ),
        channels AS (
            SELECT DISTINCT event_type AS ch FROM events
            WHERE event_type != 'purchase'
        ),
        scen AS (
            SELECT '_base' AS scenario UNION ALL SELECT ch FROM channels
        ),
        ptrans AS MATERIALIZED (
            SELECT s.scenario, p.src, p.dst, p.p_micro
            FROM scen s JOIN p ON p.dst != s.scenario
        ),
        states AS (
            SELECT '_start' AS st UNION ALL SELECT ch FROM channels
        ),
        v0 AS MATERIALIZED (
            SELECT s.scenario, st.st AS state, CAST(0 AS BIGINT) AS v
            FROM scen s CROSS JOIN states st
        ),
        {chain},
        res AS (
            SELECT scenario, v FROM v{iters} WHERE state = '_start'
        ),
        basev AS (SELECT v AS vb FROM res WHERE scenario = '_base'),
        eff AS (
            SELECT r.scenario AS channel,
                   CAST(b.vb AS BIGINT) AS base_conv_micro,
                   CAST(r.v AS BIGINT) AS removed_conv_micro,
                   CAST(b.vb - r.v AS BIGINT) AS removal_effect_micro
            FROM res r, basev b WHERE r.scenario != '_base'
        ),
        totfx AS (SELECT SUM(removal_effect_micro) AS te FROM eff)
        SELECT e.channel, e.base_conv_micro, e.removed_conv_micro,
               e.removal_effect_micro,
               CAST(CASE WHEN t.te > 0
                    THEN e.removal_effect_micro * 1000000 // t.te
                    ELSE 0 END AS BIGINT) AS attribution_micro
        FROM eff e, totfx t
    """


def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct users per day (rolling WAU) plus that
    day's DAU and the DAU/WAU stickiness ratio — the engagement
    trendline behind every product dashboard. Distinct-over-a-sliding-
    window is the one aggregate a window FRAME cannot express
    (COUNT(DISTINCT) isn't frameable), so the plan uses the
    contribution-replication form: reduce to distinct (user, day)
    FIRST, then each reduced row contributes to the 7 target days
    [day, day+6] via one row-local explode (constant x7 replication of
    the REDUCED relation, never the raw stream), and a two-phase
    countDistinct folds contributions per target day. Target days are
    restricted to days with events (broadcast semi-join on the tiny
    day dimension).

    Determinism: all integers; the ratio is ONE division of exact ints
    (both < 2^53), identical in both engines.

    Columns: day, dau, wau, stickiness (round 6)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id"), F.to_date("ts").alias("day")
    )
    ud = ev.distinct()
    days = ud.select("day").distinct()
    contrib = ud.selectExpr(
        "user_id",
        "explode(sequence(day, date_add(day, 6))) AS tday",
    )
    wau = (
        contrib.join(
            F.broadcast(days.selectExpr("day AS tday")), "tday"
        )
        .groupBy("tday")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return (
        dau.join(wau, dau.day == wau.tday)
        .selectExpr(
            "day",
            "CAST(dau AS BIGINT) AS dau",
            "CAST(wau AS BIGINT) AS wau",
            "round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness",
        )
    )


def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM changepoint monitor over the reduced daily
    event-count series (Page 1954) — the sequential drift detector
    that catches a sustained small shift the per-point z-score and
    the trailing-average burst flags both miss: s+_t = max(0,
    s+_{t-1} + x_t - mu - slack), s-_t symmetric, alarm when the
    cumulative excess tops h = 3 mean-days.

    Determinism: x_t are exact daily counts; mu is the floor-div
    micro-unit mean of the series; slack = mu/20 (5%) and h = 3*mu
    are integer derivations of it; the recursion is pure int64 —
    bit-identical in both engines (Spark runs it as a row-local fold
    over the collected span-bounded series, the oracle as a recursive
    CTE over day rank — the orders_forecast_holt twin-recursion
    pattern).

    Scale shape: corpus-sized work is ONE map-side-combined daily
    count; the recursion is span-bounded (days, control-plane sized
    at any corpus scale); the result re-explodes row-locally.

    Columns: day, x, mean_micro, s_pos_micro, s_neg_micro, alarm_up,
    alarm_down."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("day").agg(F.count("*").alias("x"))
    series = daily.agg(
        F.expr("sort_array(collect_list(struct(day, x))) AS s")
    ).selectExpr(
        "s",
        "CAST(size(s) AS BIGINT) AS n_days",
        "aggregate(s, CAST(0 AS BIGINT), (a, r) -> a + r.x) AS sx",
    ).selectExpr(
        "s",
        "CASE WHEN n_days > 0 THEN sx * 1000000 DIV n_days "
        "ELSE CAST(0 AS BIGINT) END AS mu",
    ).selectExpr("s", "mu", "mu DIV 20 AS slack")
    step_sp = "greatest(CAST(0 AS BIGINT), a.sp + r.x * 1000000 - mu - slack)"
    step_sn = "greatest(CAST(0 AS BIGINT), a.sn + mu - slack - r.x * 1000000)"
    fold = (
        "aggregate(s, named_struct('sp', CAST(0 AS BIGINT), "
        "'sn', CAST(0 AS BIGINT), 'out', CAST(array() AS "
        "array<struct<day:date,x:bigint,sp:bigint,sn:bigint>>)), "
        f"(a, r) -> named_struct('sp', {step_sp}, 'sn', {step_sn}, "
        f"'out', concat(a.out, array(struct(r.day AS day, r.x AS x, "
        f"{step_sp} AS sp, {step_sn} AS sn)))), "
        "a -> a.out)"
    )
    return series.selectExpr(
        "mu AS mean_micro", f"explode({fold}) AS r"
    ).selectExpr(
        "r.day AS day",
        "r.x AS x",
        "mean_micro",
        "r.sp AS s_pos_micro",
        "r.sn AS s_neg_micro",
        "r.sp > 3 * mean_micro AS alarm_up",
        "r.sn > 3 * mean_micro AS alarm_down",
    )


def events_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event volume — the engagement-
    inequality audit (is activity spread across users or carried by a
    whale tail?): G = 2 * sum(i * x_(i)) / (n * sum(x)) - (n + 1) / n
    over counts sorted ascending (ties broken by user_id — a total
    order, so the rank-weighted sum is identical cross-engine).

    Scale shape: the fact stream reduces to one row per user FIRST
    (map-side-combined count); the global ascending rank over that
    REDUCED relation uses the distributed-rank pattern proven by
    dedup_sorted_neighborhood — repartitionByRange clusters users by
    (count, user_id) range, row_number runs per physical range, and
    per-range offsets come from a window over the n_partitions-row
    count relation — never a corpus-sized single window partition.
    All sums are exact integers; the two final divisions are the only
    doubles.

    Columns: n_users, total_events, gini (round 6)."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("x"))
    key = [F.col("x"), F.col("user_id")]
    ranged = per_user.repartitionByRange(*key).withColumn(
        "part", F.spark_partition_id()
    )
    from pyspark.sql import Window

    local = ranged.withColumn(
        "local_rank",
        F.row_number().over(Window.partitionBy("part").orderBy(*key)),
    ).localCheckpoint()
    offsets = (
        local.groupBy("part")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("part").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("part", "offset")
    )
    return (
        local.join(F.broadcast(offsets), "part")
        .selectExpr("x", "offset + local_rank AS i")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("x").cast("long").alias("total_events"),
            F.sum(F.expr("i * x")).cast("long").alias("s1"),
        )
        .selectExpr(
            "n_users",
            "total_events",
            "round(CAST(2 * s1 AS DOUBLE) / (n_users * total_events)"
            " - CAST(n_users + 1 AS DOUBLE) / n_users, 6) AS gini",
        )
    )


def events_user_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — the engagement-ratio report
    every product-analytics warehouse ships.

    Scale shape: two COUNT(DISTINCT) aggregates (per-day and
    per-month), each expanded by Spark into a two-phase partial
    aggregate over (key, user_id); the join that combines them is on
    a ~months-cardinality key, so AQE turns it into a broadcast. The
    stickiness ratio is ONE division of exact integer sums (both
    < 2^53), so Spark and DuckDB round identically."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("ts")
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    per_month_daily = daily.groupBy(
        F.trunc("day", "month").alias("month")
    ).agg(
        F.count("*").alias("n_days"),
        F.sum("dau").alias("sum_dau"),
    )
    monthly = ev.groupBy(
        F.trunc(F.to_date("ts"), "month").alias("month")
    ).agg(F.countDistinct("user_id").alias("mau"))
    return (
        per_month_daily.join(monthly, "month")
        .select(
            "month",
            "n_days",
            "sum_dau",
            "mau",
            F.round(
                F.col("sum_dau") / (F.col("n_days") * F.col("mau")), 9
            ).alias("stickiness"),
        )
    )


PROFILE_HEAD_USERS = 50
PROFILE_MIN_COS = 0.5


def events_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search over behavioral profiles: each
    user's 24-dim hour-of-day activity histogram (exact integer
    counts), pairwise cosine over the top-`PROFILE_HEAD_USERS` most
    active users, pairs above PROFILE_MIN_COS.

    Scale shape: the profile build is ONE map-side-combined aggregate
    (24 conditional counts per user); the pairwise stage runs only on
    the head segment — a fixed-size (50-row) relation selected by a
    TakeOrdered, then broadcast for the O(n_head²) comparison, which
    is bounded by construction (the all-pairs-over-everyone version
    is what `ann_lsh_topk` / bucketed ANN is for). Cosine folds in
    index order over exact int arrays — identical in both engines."""
    from uber_data_pipeline_spark.functions.vectors import cosine_spark

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "CAST(hour(ts) AS INT) AS h"
    )
    profiles = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            *[
                F.sum(F.when(F.col("h") == h, 1).otherwise(0)).alias(f"c{h}")
                for h in range(24)
            ],
        )
        .selectExpr(
            "user_id",
            "n_events",
            f"array({', '.join(f'CAST(c{h} AS DOUBLE)' for h in range(24))}) AS prof",
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(PROFILE_HEAD_USERS)
    )
    a = profiles.selectExpr("user_id AS user_a", "prof AS pa")
    b = profiles.selectExpr("user_id AS user_b", "prof AS pb")
    return (
        a.join(F.broadcast(b), F.col("user_a") < F.col("user_b"))
        .selectExpr(
            "user_a",
            "user_b",
            f"{cosine_spark('pa', 'pb')} AS profile_cos",
        )
        .filter(F.col("profile_cos") >= PROFILE_MIN_COS)
    )


def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: per day, how many active users are
    NEW (first-ever activity that day) vs RETURNING — the
    acquisition/retention split on every growth dashboard.

    Scale shape: first-seen is one map-side-combined MIN aggregate
    per user; the classification join is user-keyed (co-partitioned
    with the distinct-activity aggregate); the final per-day rollup
    reduces to date cardinality. No windows."""
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "to_date(ts) AS day"
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    active = ev.distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.count("*").alias("active_users"),
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)).alias(
                "new_users"
            ),
        )
        .selectExpr(
            "day",
            "active_users",
            "new_users",
            "active_users - new_users AS returning_users",
        )
    )


PATHS_TOPK = 25


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the most common 3-step event-type journeys
    (A -> B -> C) across user sessions-in-order — the k-step
    generalization of the 1-step transition matrix.

    Scale shape: two lead() calls over the per-user time-ordered
    window (bounded per-user cardinality, same partitioning both
    windows — ONE shuffle + sort serves both), then a
    map-side-combined path aggregate and a TakeOrdered top-k."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.withColumn("e2", F.lead("event_type").over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
        .selectExpr("concat(event_type, '>', e2, '>', e3) AS path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_journeys"))
        .orderBy(F.desc("n_journeys"), "path")
        .limit(PATHS_TOPK)
    )


BURST_TRAIL_HOURS = 6
BURST_MIN_RATIO = 2.0
# Engine-symmetric planted burst (r8, the r7 sentinel technique): the
# denser the SF, the SMOOTHER per-hour counts get — at sf0.1 and the
# 10x soak NO real hour clears 2x its trailing average, which made the
# value-hash compare empty-vs-empty (vacuous) at exactly the scales
# the soak exists for. Both engines append the same synthetic hourly
# series at epoch hours 1-7 (1970 — disjoint from the generated 1995
# data): six 10-event hours then a 100-event spike, yielding exactly
# one always-present burst row with exact-int ratio 10.0.
_BURST_SENTINEL_ROWS = [("__burst_sentinel__", h, 10) for h in range(1, 7)] + [
    ("__burst_sentinel__", 7, 100)
]
_BURST_SENTINEL_SQL = ", ".join(
    f"('{t}', {h}, {n})" for t, h, n in _BURST_SENTINEL_ROWS
)


def _sql_burst(with_sentinel: bool) -> str:
    """Burst oracle; ``with_sentinel`` appends the planted series
    (the _audit twin — r10, ADVICE r9: the product key's oracle must
    not contain fabricated rows either)."""
    sentinel = (
        f"""UNION ALL
            SELECT t, CAST(h AS BIGINT), CAST(n AS BIGINT)
            FROM (VALUES {_BURST_SENTINEL_SQL}) AS s(t, h, n)"""
        if with_sentinel
        else ""
    )
    return f"""
        WITH hourly AS (
            SELECT event_type,
                   CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
                       AS epoch_hour,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
            {sentinel}
        ), trail AS (
            SELECT *, CAST(SUM(n_events) OVER w AS BIGINT) AS trail_n,
                   COUNT(*) OVER w AS trail_hours
            FROM hourly
            WINDOW w AS (PARTITION BY event_type ORDER BY epoch_hour
                         RANGE BETWEEN {BURST_TRAIL_HOURS} PRECEDING
                         AND 1 PRECEDING)
        )
        SELECT event_type, epoch_hour, n_events,
               ROUND(trail_n / CAST(trail_hours AS DOUBLE), 6) AS trail_avg,
               ROUND(n_events * trail_hours / CAST(trail_n AS DOUBLE), 6)
                   AS burst_ratio
        FROM trail
        WHERE trail_hours > 0
          AND ROUND(n_events * trail_hours / CAST(trail_n AS DOUBLE), 6)
              >= {BURST_MIN_RATIO}
    """


def _burst_from_hourly(hourly: DataFrame) -> DataFrame:
    """RANGE-frame burst core over a reduced (type, hour, count)
    relation — shared by the product query and the audit wrapper."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("epoch_hour")
        .rangeBetween(-BURST_TRAIL_HOURS, -1)
    )
    return (
        hourly.withColumn("trail_n", F.sum("n_events").over(w))
        .withColumn("trail_hours", F.count("*").over(w))
        .filter(F.col("trail_hours") > 0)
        .selectExpr(
            "event_type",
            "epoch_hour",
            "n_events",
            "round(trail_n / CAST(trail_hours AS DOUBLE), 6) AS trail_avg",
            "round(n_events * trail_hours / CAST(trail_n AS DOUBLE), 6)"
            " AS burst_ratio",
        )
        .filter(F.col("burst_ratio") >= BURST_MIN_RATIO)
    )


def _hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT) AS epoch_hour",
        )
        .groupBy("event_type", "epoch_hour")
        .agg(F.count("*").alias("n_events"))
    )


def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection with a RANGE-frame window: hourly event counts
    per type compared to the average over the PRECEDING
    `BURST_TRAIL_HOURS` hours (range frame on the epoch-hour key, so
    gaps in the series are handled correctly — a ROWS frame would
    silently span them). Hours at >= BURST_MIN_RATIO x trailing
    average are flagged.

    Determinism: counts are exact ints; the trailing mean and ratio
    are each ONE double division of exact ints, rounded once.

    Scale shape: the window runs over ALREADY-REDUCED (type, hour)
    rows partitioned by type — bounded rows per partition; the raw
    scan only feeds a map-side-combined count.

    This PRODUCT query returns only real bursts — the planted
    sentinel lives in :func:`events_burst_detection_audit` (ADVICE
    r8: a consumer must never receive a fabricated burst row)."""
    return _burst_from_hourly(_hourly_counts(spark, sf_dir))


def events_burst_detection_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AUDIT twin, registered under its own explicit
    ``events_burst_detection_audit`` key (r10, ADVICE r9 — the
    product key must never emit a fabricated row): unions the
    engine-symmetric planted burst series
    (_BURST_SENTINEL_ROWS, epoch hours 1-7 of 1970, disjoint from the
    generated data) into the hourly counts so the value-hash compare
    is non-vacuous at SFs where per-hour counts are too smooth for a
    real 2x burst.  Exactly one fabricated burst row (ratio 10.0)
    with event_type '__burst_sentinel__' is therefore expected in
    THIS wrapper's output only; the oracle plants the same series."""
    hourly = _hourly_counts(spark, sf_dir).unionByName(
        spark.createDataFrame(
            _BURST_SENTINEL_ROWS,
            "event_type string, epoch_hour bigint, n_events bigint",
        )
    )
    return _burst_from_hourly(hourly)



FUNNEL_WINDOW_US = 2 * 3600 * 1_000_000  # 2h between consecutive steps
FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel_timebound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUNDED ordered funnel (view -> click -> purchase, each
    step within FUNNEL_WINDOW_US of the previous match) — the hard
    funnel variant the unconstrained `events_funnel` can't answer.
    Semantics are the standard greedy scan: events in (ts, event_id)
    order advance a per-user step counter when they match the next
    step inside the window; explicitly defined so both engines replay
    it bit-for-bit.

    Scale shape: the corpus filters to the three step types FIRST
    (pushed into the scan), one groupBy collects each user's bounded
    step-event list, and the scan itself is a row-local higher-order
    aggregate() fold — no window function, no self-join, one shuffle.
    The final rollup is a 1-row conditional aggregate unpivoted to
    3 rows (step, n_users, pct_of_step1)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*FUNNEL_STEPS)
    )
    per_user = (
        ev.selectExpr(
            "user_id",
            "unix_micros(ts) AS ts_us",
            "event_id",
            "event_type AS t",
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "array_sort(collect_list(struct(ts_us, event_id, t))) AS evs"
            )
        )
    )
    w = FUNNEL_WINDOW_US
    fold = f"""aggregate(evs,
        named_struct('cur', CAST(0 AS INT), 'last', CAST(0 AS BIGINT)),
        (s, e) -> CASE
            WHEN s.cur = 0 AND e.t = '{FUNNEL_STEPS[0]}'
                THEN named_struct('cur', 1, 'last', e.ts_us)
            WHEN s.cur = 1 AND e.t = '{FUNNEL_STEPS[1]}'
                 AND e.ts_us - s.last <= {w}
                THEN named_struct('cur', 2, 'last', e.ts_us)
            WHEN s.cur = 2 AND e.t = '{FUNNEL_STEPS[2]}'
                 AND e.ts_us - s.last <= {w}
                THEN named_struct('cur', 3, 'last', e.ts_us)
            ELSE s END).cur"""
    reached = per_user.selectExpr(f"{fold} AS reached")
    agg = reached.agg(
        *[
            F.sum(F.expr(f"CAST(reached >= {k} AS BIGINT)")).alias(f"n{k}")
            for k in (1, 2, 3)
        ]
    )
    # explicit IEEE half-up (round(double, 6) ties diverge per engine)
    stack = ", ".join(
        f"'{k}_{FUNNEL_STEPS[k - 1]}', n{k}, "
        f"floor(n{k} / CAST(n1 AS DOUBLE) * 1000000 + 0.5) / 1000000"
        for k in (1, 2, 3)
    )
    return agg.selectExpr(
        f"stack(3, {stack}) AS (step, n_users, pct_of_step1)"
    )


PIVOT_TYPES = ["view", "click", "purchase", "signup"]


def events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNPIVOT (melt) surface, round-tripped: the declared-values
    day x type pivot of `events_pivot_daily` melted back to long form
    with `DataFrame.unpivot` — wide-to-long is how a pivoted report
    feeds a long-format consumer, and the round trip must reproduce
    the direct long-form aggregate exactly (the oracle). Zero-filled
    pivot cells are dropped on the way out (the direct aggregate
    never has them).

    Scale shape: unpivot is a row-local stack expansion (x4 here,
    declared width) over the already-REDUCED day-grain relation — no
    shuffle beyond the pivot's own aggregate; the melt itself adds
    none."""
    wide = events_pivot_daily(spark, sf_dir)
    return (
        wide.unpivot(
            ["day"],
            [f"n_{t}" for t in PIVOT_TYPES],
            "event_type",
            "n_events",
        )
        .withColumn("event_type", F.expr("substring(event_type, 3)"))
        .filter(F.col("n_events") > 0)
    )


def events_median_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value median through a GROUPED-AGG pandas UDF (Arrow
    UDAF, `@pandas_udf` returning a scalar per group) — the
    vectorized custom-aggregate extension point, exercised end to
    end: register, groupBy().agg(), quantize to exact micro-units so
    both engines hash-match.

    Honest placement per the repo's UDF policy: a grouped-agg pandas
    UDF gets NO partial aggregation — every raw row shuffles to its
    group — so the 100 TB path for this exact query is the built-in
    `median`/`percentile_approx` (one pass, mergeable sketch). This
    entry proves the API surface for aggregates the built-ins cannot
    express, verified against the same oracle the native form would
    use."""
    from uber_data_pipeline_spark.functions.udafs import count_udaf, median_udaf

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            median_udaf(F.col("value")).alias("m"),
            # native count(*) cannot mix with a grouped-agg pandas UDF
            # (INVALID_PANDAS_UDF_PLACEMENT) — the count rides the
            # same Arrow pass as a second UDAF
            count_udaf(F.col("value")).alias("n_events"),
        )
        .selectExpr(
            "event_type",
            "floor(m * 1000000 + 0.5) / 1000000 AS median_value",
            "n_events",
        )
    )


MOTIF_W = 24  # subsequence length (one day of hourly counts)
MOTIF_TOPK = 3


def events_subseq_motif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series subsequence motif search over the hourly
    event-count series (the matrix-profile/MASS family of distributed
    time-series similarity search, cf. EDBT 2019 "Time Series
    Similarity Search for Streaming Data in Distributed Systems"):
    per event_type, take the series' own first MOTIF_W hours as the
    query pattern and rank every stride-1 later offset past the
    query's own window by squared Euclidean distance, emitting the
    top MOTIF_TOPK matches — "when did the opening day's load shape
    recur?". Candidate windows OVERLAP EACH OTHER (standard
    matrix-profile behavior: the exclusion zone suppresses only the
    trivial self-match against the query window, not
    candidate-vs-candidate overlap).

    Determinism/scale design:
    - The series is the REDUCED (type, hour) relation gap-filled
      DENSE over each type's own [min, max] hour span
      (sequence + map lookup, missing hours = 0) — series length is
      span hours, never event count, so the array stage is
      model-sized at any corpus scale; the only corpus-sized work is
      the hourly groupBy (partial-agg shuffle).
    - The ranking key is the INTEGER SSD over int64 counts
      (zip_with + aggregate — order-free exact math, no IEEE fold
      pinning needed); ties break on the lower offset. The Pearson
      correlation rides along for interpretation: every moment sum
      is int64-exact and only the final divide is a double, rounded
      to 6 dp — one IEEE op, identical cross-engine; zero-variance
      windows yield NULL in both engines by the same CASE.
    - Offsets start past MOTIF_W (exclusion zone = the query window
      itself, stride 1 beyond it), the standard trivial-match rule."""
    hourly = _hourly_counts(spark, sf_dir)
    series = (
        hourly.groupBy("event_type")
        .agg(
            F.min("epoch_hour").alias("h0"),
            F.max("epoch_hour").alias("h1"),
            F.map_from_entries(
                F.collect_list(F.struct("epoch_hour", "n_events"))
            ).alias("m"),
        )
        .selectExpr(
            "event_type",
            "transform(sequence(h0, h1),"
            " h -> coalesce(element_at(m, h), CAST(0 AS BIGINT))) AS arr",
        )
        .selectExpr(
            "event_type",
            "arr",
            f"slice(arr, 1, {MOTIF_W}) AS q",
            "size(arr) AS L",
        )
        .filter(F.col("L") >= 2 * MOTIF_W)
    )
    cand = series.select(
        "event_type",
        "q",
        "arr",
        F.explode(
            F.sequence(F.lit(MOTIF_W + 1), F.col("L") - MOTIF_W + 1)
        ).alias("off"),
    ).selectExpr(
        "event_type",
        "q",
        "off",
        f"slice(arr, off, {MOTIF_W}) AS sub",
    )
    mm = cand.selectExpr(
        "event_type",
        "off",
        "aggregate(zip_with(q, sub, (a, b) -> (a - b) * (a - b)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS ssd",
        "aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x) AS sx",
        "aggregate(sub, CAST(0 AS BIGINT), (acc, x) -> acc + x) AS sy",
        "aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x * x) AS sxx",
        "aggregate(sub, CAST(0 AS BIGINT), (acc, x) -> acc + x * x) AS syy",
        "aggregate(zip_with(q, sub, (a, b) -> a * b),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS sxy",
    )
    w = MOTIF_W
    scored = mm.selectExpr(
        "event_type",
        "off AS offset",
        "ssd",
        f"""CASE WHEN {w} * sxx - sx * sx <= 0
                  OR {w} * syy - sy * sy <= 0 THEN NULL
            ELSE round(CAST({w} * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST({w} * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST({w} * syy - sy * sy AS DOUBLE))), 6)
            END AS corr""",
    )
    from pyspark.sql import Window

    rw = Window.partitionBy("event_type").orderBy(
        F.asc("ssd"), F.asc("offset")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= MOTIF_TOPK)
        .selectExpr("event_type", "offset", "ssd", "corr", "CAST(rank AS INT) AS rank")
    )


QUERIES = {
    "events_top_paths": events_top_paths,
    "events_subseq_motif": events_subseq_motif,
    # r10 (ADVICE r9): the product key binds the CLEAN query — a
    # registry consumer never receives a fabricated burst. The planted
    # sentinel lives under its own explicit _audit key (it guarantees
    # the value-hash gate is non-vacuous at any SF).
    "events_burst_detection": events_burst_detection,
    "events_burst_detection_audit": events_burst_detection_audit,
    "events_new_vs_returning": events_new_vs_returning,
    "events_profile_similarity": events_profile_similarity,
    "events_user_stickiness": events_user_stickiness,
    # r11: trailing 7-day distinct (rolling WAU) via contribution
    # replication of the reduced (user, day) relation
    "events_rolling_wau": events_rolling_wau,
    "events_cusum_drift": events_cusum_drift,
    # r11: engagement-inequality Gini over the reduced per-user
    # counts (distributed-rank, never a global window partition)
    "events_user_gini": events_user_gini,
    "events_json_kpis": events_json_kpis,
    "events_variant_kpis": events_variant_kpis,
    "events_hll_distinct": events_hll_distinct,
    "events_kmv_intersection": lambda spark, sf: sketches.kmv_intersection(
        load_table(spark, sf, "events")
    ),
    "events_hll_union": lambda spark, sf: sketches.hll_union(
        load_table(spark, sf, "events")
    ),
    "events_countmin_freq": events_countmin_freq,
    "events_transition_matrix": events_transition_matrix,
    "events_markov_attribution": events_markov_attribution,
    "events_anomaly_zscore": events_anomaly_zscore,
    "events_seasonal_hourly": events_seasonal_hourly,
    "events_sliding_window": events_sliding_window,
    "events_retention_cohorts": events_retention_cohorts,
    "events_asof_view_attribution": events_asof_view_attribution,
    "events_forward_window_join": events_forward_window_join,
    "events_windowed_agg": events_windowed_agg,
    "events_sessionization": events_sessionization,
    "events_native_session_window": events_native_session_window,
    "events_funnel": events_funnel,
    "events_funnel_timebound": events_funnel_timebound,
    "events_distinct_users": events_distinct_users,
    "events_pivot_daily": events_pivot_daily,
    "events_unpivot": events_unpivot,
    "events_median_udaf": events_median_udaf,
}

# Declared scalar-broadcast plans (see queries/tpch.py for the
# contract; tests/test_plans.py enforces tag set == plan scan).
SCALAR_BROADCAST = {
    # fixed 50-row head-segment broadcast for the bounded pairwise
    # profile comparison (all-pairs-over-everyone is the LSH path)
    "events_profile_similarity",
    # four 1-row aggregates (exact union, group-sum, two sketch
    # estimates) crossJoined into the single report row
    "events_hll_union",
    # seven 1-row sketch/exact aggregates crossJoined into the report
    "events_kmv_intersection",
}

def _profile_similarity_oracle() -> str:
    from uber_data_pipeline_spark.functions.vectors import cosine_duck

    sums = ", ".join(
        f"CAST(SUM(CASE WHEN h = {h} THEN 1 ELSE 0 END) AS DOUBLE)"
        for h in range(24)
    )
    cos = cosine_duck("a.prof", "b.prof")
    return f"""
        WITH ev AS (
            SELECT user_id,
                   CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS INT) AS h
            FROM events
        ), profiles AS (
            SELECT user_id, COUNT(*) AS n_events,
                   list_value({sums}) AS prof
            FROM ev GROUP BY 1
            ORDER BY n_events DESC, user_id
            LIMIT {PROFILE_HEAD_USERS}
        )
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               {cos} AS profile_cos
        FROM profiles a JOIN profiles b ON a.user_id < b.user_id
        WHERE {cos} >= {PROFILE_MIN_COS}
    """


ORACLES = {
    # NOTE: the driver's `events` view has ts as TIMESTAMP_NS; Spark
    # reads it truncated to microseconds, and DuckDB's CAST(ts AS
    # TIMESTAMP) truncates the same way — so every oracle casts first.
    "events_profile_similarity": _profile_similarity_oracle(),
    "events_subseq_motif": f"""
        WITH hourly AS (
            SELECT event_type,
                   CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
                       AS epoch_hour,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT event_type, MIN(epoch_hour) AS h0, MAX(epoch_hour) AS h1
            FROM hourly GROUP BY 1
        ), grid AS (
            -- lateral expansion isolated in its own CTE: DuckDB
            -- cannot LEFT JOIN directly against a correlated unnest
            SELECT b.event_type, gs.h AS epoch_hour
            FROM bounds b, unnest(generate_series(b.h0, b.h1)) AS gs(h)
        ), dense AS (
            SELECT g.event_type, g.epoch_hour,
                   COALESCE(hc.n_events, 0) AS n
            FROM grid g LEFT JOIN hourly hc
              USING (event_type, epoch_hour)
        ), series AS (
            SELECT event_type, list(n ORDER BY epoch_hour) AS arr
            FROM dense GROUP BY 1
        ), win AS (
            SELECT event_type, arr, arr[1:{MOTIF_W}] AS q, len(arr) AS L
            FROM series WHERE len(arr) >= 2 * {MOTIF_W}
        ), cand AS (
            SELECT event_type, q, o.off,
                   arr[o.off : o.off + {MOTIF_W} - 1] AS sub
            FROM win, unnest(range({MOTIF_W} + 1, L - {MOTIF_W} + 2))
                 AS o(off)
        ), mm AS (
            SELECT event_type, off,
                   list_sum(list_transform(range(1, {MOTIF_W} + 1),
                       j -> (q[j] - sub[j]) * (q[j] - sub[j]))) AS ssd,
                   list_sum(q) AS sx, list_sum(sub) AS sy,
                   list_sum(list_transform(q, x -> x * x)) AS sxx,
                   list_sum(list_transform(sub, x -> x * x)) AS syy,
                   list_sum(list_transform(range(1, {MOTIF_W} + 1),
                       j -> q[j] * sub[j])) AS sxy
            FROM cand
        ), scored AS (
            SELECT event_type, CAST(off AS BIGINT) AS "offset",
                   CAST(ssd AS BIGINT) AS ssd,
                   CASE WHEN {MOTIF_W} * sxx - sx * sx <= 0
                         OR {MOTIF_W} * syy - sy * sy <= 0 THEN NULL
                   ELSE round(CAST({MOTIF_W} * sxy - sx * sy AS DOUBLE)
                              / (sqrt(CAST({MOTIF_W} * sxx - sx * sx
                                      AS DOUBLE))
                                 * sqrt(CAST({MOTIF_W} * syy - sy * sy
                                        AS DOUBLE))), 6)
                   END AS corr
            FROM mm
        )
        SELECT event_type, "offset", ssd, corr, rank FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY ssd ASC, "offset" ASC) AS INT) AS rank
            FROM scored
        ) WHERE rank <= {MOTIF_TOPK}
    """,
    "events_top_paths": f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER w AS e2,
                   LEAD(event_type, 2) OVER w AS e3
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id)
        )
        SELECT event_type || '>' || e2 || '>' || e3 AS path,
               COUNT(*) AS n_journeys
        FROM seq WHERE e3 IS NOT NULL
        GROUP BY 1
        ORDER BY n_journeys DESC, path
        LIMIT {PATHS_TOPK}
    """,
    "events_burst_detection": _sql_burst(with_sentinel=False),
    "events_burst_detection_audit": _sql_burst(with_sentinel=True),
    "events_new_vs_returning": """
        WITH ev AS (
            SELECT user_id,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
            FROM events
        ), first_seen AS (
            SELECT user_id, MIN(day) AS first_day FROM ev GROUP BY 1
        ), active AS (
            SELECT DISTINCT user_id, day FROM ev
        )
        SELECT day,
               COUNT(*) AS active_users,
               CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
                   AS new_users,
               COUNT(*) - CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                   AS BIGINT) AS returning_users
        FROM active JOIN first_seen USING (user_id)
        GROUP BY 1
    """,
    "events_user_gini": """
        WITH per_user AS (
            SELECT user_id, COUNT(*) AS x FROM events GROUP BY 1
        ), ranked AS (
            SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i
            FROM per_user
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(x) AS BIGINT) AS total_events,
               round(CAST(2 * SUM(i * x) AS DOUBLE)
                     / (COUNT(*) * SUM(x))
                     - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
        FROM ranked
    """,
    "events_rolling_wau": """
        WITH ud AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day
            FROM events
        ), days AS (
            SELECT DISTINCT day FROM ud
        ), contrib AS (
            SELECT u.user_id,
                   CAST(u.day + CAST(r.i AS INT) AS DATE) AS tday
            FROM ud u, (SELECT unnest(range(0, 7)) AS i) r
        ), wau AS (
            SELECT c.tday, COUNT(DISTINCT c.user_id) AS wau
            FROM contrib c JOIN days d ON d.day = c.tday
            GROUP BY 1
        ), dau AS (
            SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY 1
        )
        SELECT d.day,
               CAST(d.dau AS BIGINT) AS dau,
               CAST(w.wau AS BIGINT) AS wau,
               round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
        FROM dau d JOIN wau w ON w.tday = d.day
    """,
    "events_user_stickiness": """
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                   COUNT(DISTINCT user_id) AS dau
            FROM events GROUP BY 1
        ), per_month_daily AS (
            SELECT CAST(date_trunc('month', day) AS DATE) AS month,
                   COUNT(*) AS n_days,
                   CAST(SUM(dau) AS BIGINT) AS sum_dau
            FROM daily GROUP BY 1
        ), monthly AS (
            SELECT CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS month,
                   COUNT(DISTINCT user_id) AS mau
            FROM events GROUP BY 1
        )
        SELECT month, n_days, sum_dau, mau,
               ROUND(sum_dau / (n_days * mau), 9) AS stickiness
        FROM per_month_daily JOIN monthly USING (month)
    """,
    "events_hll_distinct": sketches.sql_hll_distinct(),
    "events_hll_union": sketches.sql_hll_union(),
    "events_kmv_intersection": sketches.sql_kmv_intersection(),
    "events_countmin_freq": sketches.sql_countmin_freq(),
    "events_transition_matrix": """
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ) AS prev_raw
            FROM events
        )
        SELECT COALESCE(prev_raw, '_start') AS prev_type, event_type,
               COUNT(*) AS n_transitions
        FROM seq
        GROUP BY 1, 2
    """,
    "events_json_kpis": """
        WITH parsed AS (
            SELECT event_type,
                   json_extract_string(props, '$.k')::INT AS k
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(k) AS n_with_k,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               MIN(k) AS min_k,
               MAX(k) AS max_k,
               COUNT(DISTINCT k) AS n_distinct_k
        FROM parsed
        GROUP BY 1
    """,
    "events_anomaly_zscore": f"""
        WITH s AS (
            SELECT event_type, COUNT(*) AS n,
                   SUM(CAST(value AS DECIMAL(25,6))) AS s1,
                   SUM(CAST(value * value AS DECIMAL(25,6))) AS s2
            FROM events GROUP BY 1
        ), st AS (
            SELECT event_type,
                   CAST(s1 AS DOUBLE) / n AS mean,
                   sqrt(greatest(CAST(s2 AS DOUBLE) / n
                        - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                        0.0)) AS std
            FROM s
        )
        SELECT e.event_id, e.event_type, e.value,
               CAST(CAST((e.value - st.mean) / st.std AS DECIMAL(18,6)) AS DOUBLE)
                   AS z
        FROM events e JOIN st USING (event_type)
        WHERE abs((e.value - st.mean) / st.std) > {ZSCORE_THRESHOLD}
    """,
    "events_seasonal_hourly": """
        WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_ts,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1
        ), prof AS (
            SELECT CAST(hour(bucket_ts) AS INT) AS hod,
                   COUNT(*) AS n_buckets,
                   SUM(CAST(n_events AS DECIMAL(25,6))) AS s1,
                   SUM(CAST(CAST(n_events AS DOUBLE)
                            * CAST(n_events AS DOUBLE)
                            AS DECIMAL(25,6))) AS s2
            FROM hourly GROUP BY 1
        ), st AS (
            SELECT hod,
                   CAST(s1 AS DOUBLE) / n_buckets AS mean,
                   sqrt(greatest(CAST(s2 AS DOUBLE) / n_buckets
                        - (CAST(s1 AS DOUBLE) / n_buckets)
                        * (CAST(s1 AS DOUBLE) / n_buckets),
                        CAST(0.0 AS DOUBLE))) AS std
            FROM prof
        )
        SELECT h.bucket_ts, st.hod, h.n_events,
               CAST(CAST(st.mean AS DECIMAL(18,6)) AS DOUBLE) AS expected,
               CAST(CAST(h.n_events - st.mean AS DECIMAL(18,6)) AS DOUBLE)
                   AS residual,
               CAST(CAST(CASE WHEN st.std > 0.0
                    THEN (h.n_events - st.mean) / st.std
                    ELSE 0.0 END AS DECIMAL(18,6)) AS DOUBLE) AS z,
               CASE WHEN st.std > 0.0
                    THEN abs((h.n_events - st.mean) / st.std) > 2.0
                    ELSE false END AS is_anomaly
        FROM hourly h
        JOIN st ON st.hod = CAST(hour(h.bucket_ts) AS INT)
    """,
    "events_sliding_window": f"""
        WITH e AS (
            SELECT event_type, value,
                   epoch_us(CAST(ts AS TIMESTAMP))
                       - (epoch_us(CAST(ts AS TIMESTAMP)) % 1800000000)
                       AS bucket_us
            FROM events
        ), expanded AS (
            SELECT event_type, value,
                   unnest([make_timestamp(bucket_us),
                           make_timestamp(bucket_us - 1800000000)]) AS window_start
            FROM e
        )
        SELECT window_start, event_type,
               COUNT(*) AS n_events,
               {sql_dsum("value")} AS sum_value
        FROM expanded
        GROUP BY 1, 2
    """,
    "events_retention_cohorts": """
        WITH ev AS (
            SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
            FROM events
        ), first_week AS (
            SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1
        ), activity AS (
            SELECT DISTINCT user_id, week FROM ev
        )
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INT)
                   AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active_users
        FROM activity a
        JOIN first_week f USING (user_id)
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "events_asof_view_attribution": """
        WITH p AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase'
        ), v AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'view'
        ), joined AS (
            SELECT p.event_id AS purchase_id,
                   p.user_id,
                   p.ts AS purchase_ts,
                   MAX(v.ts) AS last_view_ts,
                   COUNT(v.ts) AS n_prior_views
            FROM p
            LEFT JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
            GROUP BY 1, 2, 3
        )
        SELECT purchase_id, user_id, purchase_ts, last_view_ts,
               n_prior_views,
               date_diff('microsecond', last_view_ts, purchase_ts)
                   AS micros_since_view
        FROM joined
    """,
    "events_forward_window_join": """
        WITH e AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        )
        SELECT a.event_id, a.user_id,
               COUNT(b.event_id) AS n_next_5min
        FROM e a
        LEFT JOIN e b ON b.user_id = a.user_id
                     AND b.ts > a.ts
                     AND b.ts <= a.ts + INTERVAL 5 MINUTE
        GROUP BY 1, 2
    """,
    "events_windowed_agg": f"""
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               {sql_dsum("value")} AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "events_sessionization": f"""
        WITH ev AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
        ), flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR EXTRACT(EPOCH FROM ts - LAG(ts) OVER w) > {SESSION_GAP_SECONDS}
                        THEN 1 ELSE 0 END AS new_session
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sessions AS (
            SELECT user_id, ts,
                   CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end
        FROM sessions
        GROUP BY 1, 2
    """,
    "events_distinct_users": """
        SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1
    """,
    "events_pivot_daily": """
        SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup
        FROM events
        GROUP BY 1
    """,
    "events_funnel_timebound": f"""
        WITH e AS (
            SELECT user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                   event_id,
                   event_type AS t
            FROM events
            WHERE event_type IN ('{FUNNEL_STEPS[0]}', '{FUNNEL_STEPS[1]}',
                                 '{FUNNEL_STEPS[2]}')
        ), pu AS (
            SELECT user_id,
                   list_sort(list(struct_pack(
                       ts_us := ts_us, event_id := event_id, t := t))) AS evs
            FROM e GROUP BY 1
        ), folded AS (
            SELECT user_id,
                   list_reduce(
                       list_prepend(
                           struct_pack(cur := 0, last := 0::BIGINT,
                                       ts_us := CAST(NULL AS BIGINT),
                                       t := CAST(NULL AS VARCHAR)),
                           list_transform(evs, x -> struct_pack(
                               cur := CAST(NULL AS INT),
                               last := CAST(NULL AS BIGINT),
                               ts_us := x.ts_us, t := x.t))),
                       (s, e) -> CASE
                           WHEN s.cur = 0 AND e.t = '{FUNNEL_STEPS[0]}'
                               THEN struct_pack(cur := 1, last := e.ts_us,
                                    ts_us := CAST(NULL AS BIGINT),
                                    t := CAST(NULL AS VARCHAR))
                           WHEN s.cur = 1 AND e.t = '{FUNNEL_STEPS[1]}'
                                AND e.ts_us - s.last <= {FUNNEL_WINDOW_US}
                               THEN struct_pack(cur := 2, last := e.ts_us,
                                    ts_us := CAST(NULL AS BIGINT),
                                    t := CAST(NULL AS VARCHAR))
                           WHEN s.cur = 2 AND e.t = '{FUNNEL_STEPS[2]}'
                                AND e.ts_us - s.last <= {FUNNEL_WINDOW_US}
                               THEN struct_pack(cur := 3, last := e.ts_us,
                                    ts_us := CAST(NULL AS BIGINT),
                                    t := CAST(NULL AS VARCHAR))
                           ELSE s END).cur AS reached
            FROM pu
        ), agg AS (
            SELECT CAST(SUM(CAST(reached >= 1 AS BIGINT)) AS BIGINT) AS n1,
                   CAST(SUM(CAST(reached >= 2 AS BIGINT)) AS BIGINT) AS n2,
                   CAST(SUM(CAST(reached >= 3 AS BIGINT)) AS BIGINT) AS n3
            FROM folded
        )
        SELECT '1_{FUNNEL_STEPS[0]}' AS step, n1 AS n_users,
               floor(n1 / CAST(n1 AS DOUBLE) * 1000000 + 0.5) / 1000000
                   AS pct_of_step1 FROM agg
        UNION ALL SELECT '2_{FUNNEL_STEPS[1]}', n2,
               floor(n2 / CAST(n1 AS DOUBLE) * 1000000 + 0.5) / 1000000 FROM agg
        UNION ALL SELECT '3_{FUNNEL_STEPS[2]}', n3,
               floor(n3 / CAST(n1 AS DOUBLE) * 1000000 + 0.5) / 1000000 FROM agg
    """,
    "events_funnel": """
        WITH per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
                   MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
            FROM events
            GROUP BY user_id
        )
        SELECT COUNT(t_view) AS n_view,
               COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_then_click,
               COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click
                          THEN 1 END) AS n_full_funnel
        FROM per_user
    """,
}

ORACLES["events_markov_attribution"] = _markov_attribution_oracle()

# Independent oracle for the VARIANT twin (VERDICT r3 item 8): same
# KPIs, but through DuckDB's json_transform STRUCT extraction — a
# different oracle-side parse path than events_json_kpis'
# json_extract_string, so the twin pair no longer shares one string
# (an oracle bug in either parse path now shows up as a divergence).
ORACLES["events_variant_kpis"] = """
    WITH parsed AS (
        SELECT event_type,
               (json_transform(props, '{"k": "INTEGER"}')).k AS k
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(k) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k,
           COUNT(DISTINCT k) AS n_distinct_k
    FROM parsed
    GROUP BY 1
"""

ORACLES["events_unpivot"] = """
    SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
           event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    WHERE event_type IN ('view', 'click', 'purchase', 'signup')
    GROUP BY 1, 2
"""

ORACLES["events_median_udaf"] = """
    SELECT event_type,
           floor(median(value) * 1000000 + 0.5) / 1000000
               AS median_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
"""

ORACLES["events_native_session_window"] = f"""
    WITH ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR EXTRACT(EPOCH FROM ts - LAG(ts) OVER w)
                            > {SESSION_GAP_SECONDS}
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL {SESSION_GAP_SECONDS} SECOND AS session_end_gap,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, sid
"""

ORACLES["events_cusum_drift"] = """
    WITH RECURSIVE daily AS MATERIALIZED (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), idx AS MATERIALIZED (
        SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS i FROM daily
    ), stats AS MATERIALIZED (
        SELECT CASE WHEN COUNT(*) > 0
                    THEN SUM(x) * 1000000 // COUNT(*)
                    ELSE 0 END AS mu
        FROM daily
    ), rec AS (
        SELECT i.i, i.day, i.x,
               greatest(0, i.x * 1000000 - s.mu - s.mu // 20) AS sp,
               greatest(0, s.mu - s.mu // 20 - i.x * 1000000) AS sn
        FROM idx i, stats s WHERE i.i = 1
        UNION ALL
        SELECT i.i, i.day, i.x,
               greatest(0, r.sp + i.x * 1000000 - s.mu - s.mu // 20),
               greatest(0, r.sn + s.mu - s.mu // 20 - i.x * 1000000)
        FROM rec r JOIN idx i ON i.i = r.i + 1, stats s
    )
    SELECT r.day, r.x,
           CAST(s.mu AS BIGINT) AS mean_micro,
           CAST(r.sp AS BIGINT) AS s_pos_micro,
           CAST(r.sn AS BIGINT) AS s_neg_micro,
           r.sp > 3 * s.mu AS alarm_up,
           r.sn > 3 * s.mu AS alarm_down
    FROM rec r, stats s
"""
