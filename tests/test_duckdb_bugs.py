"""Regression pins for upstream DuckDB bugs the oracles work around
(VERDICT r8 item 7).  Each test is named for the defect and fails if
the workaround is removed while the bug persists in the installed
DuckDB, but tolerates an upstream fix (the workaround then becomes
removable and the pin self-retires)."""

from __future__ import annotations

import __spark_entry__ as entrymod

SLICE_PROBE = """
    WITH embtr AS {kw} (
        SELECT vec_id, embedding[1:32] AS embedding FROM embeddings
    ),
    embd AS (SELECT vec_id, CAST(embedding AS DOUBLE[32]) AS earr FROM embtr)
    SELECT COUNT(*) FROM embd
    WHERE array_inner_product(earr, earr) IS NULL
       OR array_inner_product(earr, earr) <= 0
"""


def test_duckdb_lazy_slice_to_fixed_array_cast_corruption(duck):
    """DuckDB 1.0 corrupts a LAZY list-slice CTE feeding a fixed-ARRAY
    cast: a fraction of rows get 0/NULL self inner products (observed
    250/500 at sf0.001).  The matryoshka oracle guards by MATERIALIZING
    the slice CTE before the cast.  While the installed DuckDB still
    exhibits the corruption, the registered oracle MUST keep the
    MATERIALIZED keyword; the guarded path must always be clean."""
    lazy_bad = duck.execute(SLICE_PROBE.format(kw="")).fetchone()[0]
    if lazy_bad > 0:  # bug present in this DuckDB build
        sql = entrymod.oracle_sql()["embeddings_matryoshka_recall"]
        assert "embtr AS MATERIALIZED" in sql, (
            f"DuckDB still corrupts lazy slice->ARRAY casts "
            f"({lazy_bad} rows) but the oracle dropped its "
            f"MATERIALIZED guard"
        )
    guarded_bad = duck.execute(
        SLICE_PROBE.format(kw="MATERIALIZED")
    ).fetchone()[0]
    assert guarded_bad == 0
