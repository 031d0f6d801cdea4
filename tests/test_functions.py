"""Cross-engine property tests for the twin expression builders in
functions/text.py and functions/vectors.py: for random inputs, the
Spark expression and its DuckDB twin must produce identical values —
these primitives are what every oracle comparison rests on."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from uber_data_pipeline_spark.functions import text as T
from uber_data_pipeline_spark.functions import vectors as V
from uber_data_pipeline_spark.operators.similarity import srp_hyperplanes

words = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=6), min_size=0, max_size=12
)
texts = st.text(
    alphabet="abc XYZ012,.!?", min_size=0, max_size=60
).map(lambda s: s.replace("'", ""))


def spark_eval(spark, expr: str, text_val: str):
    return (
        spark.sql(f"SELECT ({expr}) AS v FROM (SELECT '{text_val}' AS text)")
        .collect()[0]["v"]
    )


def duck_eval(expr: str, text_val: str):
    return duckdb.sql(f"SELECT ({expr}) AS v FROM (SELECT '{text_val}' AS text)").fetchone()[0]


@settings(max_examples=15, deadline=None)
@given(texts)
def test_rolling_hash_twins(spark, s):
    assert spark_eval(spark, T.rolling_hash_spark(), s) == duck_eval(
        T.rolling_hash_duck(), s
    )


@settings(max_examples=15, deadline=None)
@given(words)
def test_shingles_twins(spark, ws):
    s = " ".join(ws)
    sp = spark_eval(spark, T.shingles_spark(T.TOKENS_SPARK), s)
    du = duck_eval(T.shingles_duck(T.TOKENS_DUCK), s)
    assert list(sp) == list(du)


@settings(max_examples=15, deadline=None)
@given(texts)
def test_regex_token_count_twins(spark, s):
    assert spark_eval(spark, T.REGEX_TOKEN_COUNT_SPARK, s) == duck_eval(
        T.REGEX_TOKEN_COUNT_DUCK, s
    )


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
        min_size=2,
        max_size=8,
    )
)
def test_cosine_twins(spark, vec):
    if sum(v * v for v in vec) == 0:
        return
    arr = "array(" + ", ".join(f"CAST({v!r} AS float)" for v in vec) + ")"
    arr_duck = "[" + ", ".join(f"{v!r}::FLOAT" for v in vec) + "]"
    sp = spark.sql(f"SELECT {V.cosine_spark('a', 'a')} AS v FROM (SELECT {arr} AS a)").collect()[0]["v"]
    du = duckdb.sql(f"SELECT {V.cosine_duck('a', 'a')} AS v FROM (SELECT {arr_duck} AS a)").fetchone()[0]
    assert sp == pytest.approx(du, abs=1e-6)
    assert sp == pytest.approx(1.0, abs=1e-5)


def test_srp_hyperplanes_match_duck_derivation():
    """The numpy hyperplane matrix must reproduce the oracle's md5
    nibble-parity ±1 values position for position."""
    h = srp_hyperplanes(4, 6)
    for j in range(4):
        for d in range(6):
            duck_val = duckdb.sql(
                f"SELECT CASE WHEN (instr('0123456789abcdef', "
                f"substring(md5('{j},{d + 1}'), 1, 1))-1) % 2 = 0 "
                f"THEN 1.0 ELSE -1.0 END"
            ).fetchone()[0]
            assert h[j, d] == duck_val


def test_stopword_twins(spark):
    s = "the cat und der hund le chat"
    for lang in T.STOPWORDS:
        sp = spark_eval(
            spark, f"{T.stopword_count_spark(lang, T.TOKENS_SPARK)}", s
        )
        du = duck_eval(f"{T.stopword_count_duck(lang, T.TOKENS_DUCK)}", s)
        assert sp == du, lang


pii_texts = st.text(
    alphabet="ab @.+-0123456789", min_size=0, max_size=50
).map(lambda s: s.replace("'", ""))


@settings(max_examples=20, deadline=None)
@given(pii_texts)
def test_pii_twins_and_fixpoint(spark, s):
    """The PII count/scrub twins must agree across engines, and the
    scrubbed text must contain no further matches (redaction is a
    fixpoint — tags themselves can't retrigger the patterns)."""
    for pattern in (T.PII_EMAIL_RE, T.PII_PHONE_RE, T.PII_IPV4_RE):
        assert spark_eval(
            spark, T.pii_count_spark("text", pattern), s
        ) == duck_eval(T.pii_count_duck("text", pattern), s), (pattern, s)
    scrub_s = spark_eval(spark, T.pii_scrub_spark("text"), s)
    scrub_d = duck_eval(T.pii_scrub_duck("text"), s)
    assert scrub_s == scrub_d, s
    for pattern in (T.PII_EMAIL_RE, T.PII_PHONE_RE, T.PII_IPV4_RE):
        assert duck_eval(T.pii_count_duck("text", pattern), scrub_s or "") == 0, (
            pattern,
            scrub_s,
        )


vec_pairs = st.lists(
    st.tuples(
        st.floats(min_value=-8, max_value=8, allow_nan=False, width=32),
        st.floats(min_value=-8, max_value=8, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=16,
)


@settings(max_examples=15, deadline=None)
@given(vec_pairs)
def test_sq_l2_twins(spark, pairs):
    """The PQ squared-L2 twin fragments must fold to the IDENTICAL
    double in both engines (exact equality, not approx — the PQ code
    assignment ranks on this value)."""
    from uber_data_pipeline_spark.operators.similarity import _sq_l2_duck, _sq_l2_spark

    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    a_sp = "array(" + ", ".join(f"CAST({v!r} AS float)" for v in xs) + ")"
    b_sp = "array(" + ", ".join(f"CAST({v!r} AS float)" for v in ys) + ")"
    # literals go through ::DOUBLE first: DuckDB types a bare decimal
    # literal as DECIMAL (losing digits past scale 18) before a ::FLOAT
    # cast, which is a literal-parsing artifact the parquet-read path
    # never hits
    a_du = "[" + ", ".join(f"{v!r}::DOUBLE::FLOAT" for v in xs) + "]"
    b_du = "[" + ", ".join(f"{v!r}::DOUBLE::FLOAT" for v in ys) + "]"
    sp = spark.sql(
        f"SELECT {_sq_l2_spark('a', 'b')} AS v FROM (SELECT {a_sp} AS a, {b_sp} AS b)"
    ).collect()[0]["v"]
    du = duckdb.sql(
        f"SELECT {_sq_l2_duck('a', 'b')} AS v FROM (SELECT {a_du} AS a, {b_du} AS b)"
    ).fetchone()[0]
    assert sp == du, (sp, du, pairs)


def test_compare_flags_dtype_only_mismatch():
    """r1 regression: DuckDB SUM(int) -> HUGEINT -> float64 vs Spark
    int64 hashed differently at the driver while the old compare()
    passed (values equal cell-by-cell). compare() must now flag it."""
    import pandas as pd

    from uber_data_pipeline_spark.testing import compare

    a = pd.DataFrame({"k": ["x", "y"], "n": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"k": ["x", "y"], "n": pd.array([1.0, 2.0], dtype="float64")})
    problems = compare("dtype_case", a, b)
    assert problems and any("dtype mismatch" in p for p in problems)
    # identical frames still pass
    assert compare("same", a, a.copy()) == []


@given(st.floats(min_value=0.5, max_value=0.99))
@settings(max_examples=60, deadline=None)
def test_srp_band_plan_meets_recall_bound(tau):
    """For any threshold, the returned (bits, bands) must satisfy the
    miss bound it was derived from: (1 - p^r)^B <= target_miss with
    p = 1 - acos(tau)/pi (pairs exactly AT the threshold)."""
    import math

    from uber_data_pipeline_spark.operators.similarity import srp_band_plan

    r, b, prunes = srp_band_plan(tau)
    assert r >= 1 and b >= 1
    p = 1 - math.acos(tau) / math.pi
    assert (1 - p**r) ** b <= 1e-3 + 1e-12
    if prunes:
        assert b / 2**r < 1


def test_decimal_tie_rounding_rule(spark):
    """Scale reduction must use ROUND(decimal, k) — HALF_UP in BOTH
    engines — never a bare decimal->decimal CAST: Spark's cast rounds
    ties HALF_UP but DuckDB's does not (found via parts_pagerank_iterated,
    where systematic digit-10 ties diverged on ~50% of rows)."""
    import duckdb

    tie = "CAST(1.0617505965 AS DECIMAL(20,10))"
    # ROUND agrees (HALF_UP both):
    s_round = spark.sql(f"SELECT CAST(round({tie}, 9) AS STRING)").collect()[0][0]
    d_round = str(duckdb.sql(f"SELECT ROUND({tie}, 9)").fetchone()[0])
    assert s_round == d_round == "1.061750597"
    # bare CAST does NOT agree — this pins the hazard so nobody
    # "simplifies" a ROUND back into a CAST:
    s_cast = spark.sql(
        f"SELECT CAST(CAST({tie} AS DECIMAL(14,9)) AS STRING)"
    ).collect()[0][0]
    d_cast = str(duckdb.sql(f"SELECT CAST({tie} AS DECIMAL(14,9))").fetchone()[0])
    assert s_cast == "1.061750597" and d_cast == "1.061750596"


def test_decimal_overflow_rule(spark):
    """Decimal ops whose inferred precision exceeds 38 take
    engine-specific precision-loss paths: Spark rounds the result to
    fit (allowPrecisionLoss), DuckDB promotes/overflows differently —
    so twins must narrow operands BEFORE wide multiplies. This pins
    the hazard with a value where the two paths disagree."""
    import duckdb

    # DECIMAL(38,21) * DECIMAL(3,2): inferred precision 42 > 38.
    # Spark keeps 38 digits by cutting scale (result scale 6 here);
    # the same expression in DuckDB errors or yields another scale.
    expr = (
        "CAST(CAST(1.2345678901234567890123 AS DECIMAL(38,21))"
        " * CAST(0.85 AS DECIMAL(3,2)) AS STRING)"
    )
    s_val = spark.sql(f"SELECT {expr}").collect()[0][0]
    try:
        d_val = str(duckdb.sql(f"SELECT {expr}").fetchone()[0])
    except Exception:  # noqa: BLE001 — DuckDB may refuse outright
        d_val = "<error>"
    # the point: past precision 38 the engines are NOT interchangeable
    assert s_val != d_val or "<error>" == d_val, (s_val, d_val)
    # and the sanctioned pattern (narrow first) IS interchangeable:
    safe = (
        "CAST(ROUND(CAST(1.2345678901234567890123 AS DECIMAL(38,21)), 15)"
        " * CAST(0.85 AS DECIMAL(3,2)) AS STRING)"
    )
    assert (
        spark.sql(f"SELECT {safe}").collect()[0][0].rstrip("0")
        == str(duckdb.sql(f"SELECT {safe}").fetchone()[0]).rstrip("0")
    )
