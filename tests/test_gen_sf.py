"""Validation of the derived-SF generator (tools/gen_sf.py): the sf1
soak is only meaningful if the derived tables preserve the source's
structure — FK integrity, modular cohorts, and linear (not
quadratic) growth of the documents near-dup structure.

DuckDB-only (no Spark session), so it stays cheap. Skipped when the
derived directory is absent."""

from __future__ import annotations

import os

import duckdb
import pytest

from tools.gen_sf import KEY_OFFSET, SRC

SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".artifacts",
    "sf1.0",
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF1_DIR),
    reason="sf1 derived tables not generated (python tools/gen_sf.py)",
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF1_DIR}/{t}.parquet')"
        )
        c.execute(
            f"CREATE VIEW src_{t} AS SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')"
        )
    yield c
    c.close()


def test_row_counts_scale_10x(con):
    for t in ("customer", "orders", "lineitem", "events", "documents",
              "embeddings", "part", "supplier"):
        n1 = con.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
        n0 = con.execute(f"SELECT COUNT(*) FROM src_{t}").fetchone()[0]
        assert n1 == 10 * n0, t
    for t in ("region", "nation"):
        n1 = con.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
        n0 = con.execute(f"SELECT COUNT(*) FROM src_{t}").fetchone()[0]
        assert n1 == n0, t


def test_fk_integrity_preserved(con):
    orphans = con.execute(
        "SELECT COUNT(*) FROM orders o LEFT JOIN customer c "
        "ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"
    ).fetchone()[0]
    assert orphans == 0
    orphans = con.execute(
        "SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o "
        "ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"
    ).fetchone()[0]
    assert orphans == 0


def test_modular_cohorts_preserved(con):
    """KEY_OFFSET is divisible by every modulus the queries use, so
    each copy reproduces the source residue distribution exactly."""
    for mod in (16, 40, 1000, 5, 3):
        assert KEY_OFFSET % mod == 0
    src = dict(
        con.execute(
            "SELECT o_orderkey % 1000, COUNT(*) FROM src_orders GROUP BY 1"
        ).fetchall()
    )
    der = dict(
        con.execute(
            "SELECT o_orderkey % 1000, COUNT(*) FROM orders GROUP BY 1"
        ).fetchall()
    )
    assert der == {k: 10 * v for k, v in src.items()}


def test_documents_not_cross_copy_duplicated(con):
    """Copies must NOT be near-dups of their originals: the word
    rotation + copy token keeps cross-copy 3-shingle Jaccard low, so
    dedup candidate volume scales linearly with copies instead of
    quadratically. Spot-check copy 1 vs copy 0 on a sample."""
    rows = con.execute(f"""
        WITH sh AS (
            SELECT doc_id, list_distinct(list_transform(
                range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                i -> string_split(text, ' ')[i] || ' ' ||
                     string_split(text, ' ')[i+1] || ' ' ||
                     string_split(text, ' ')[i+2])) AS s
            FROM documents
            WHERE doc_id % {KEY_OFFSET} < 50
              AND doc_id < 2 * {KEY_OFFSET}
        )
        SELECT a.doc_id,
               len(list_intersect(a.s, b.s)) * 1.0 /
               greatest(len(list_distinct(list_concat(a.s, b.s))), 1) AS j
        FROM sh a JOIN sh b ON b.doc_id = a.doc_id + {KEY_OFFSET}
        WHERE a.doc_id < {KEY_OFFSET}
    """).fetchall()
    assert rows, "no copy pairs sampled"
    high = [r for r in rows if r[1] > 0.5]
    assert len(high) <= len(rows) * 0.05, (
        f"{len(high)}/{len(rows)} copy pairs are near-dups"
    )


def test_embeddings_rotated_not_duplicated(con):
    """Copy i's vector is a rotation, not a verbatim duplicate."""
    dup = con.execute(f"""
        SELECT COUNT(*) FROM embeddings a JOIN embeddings b
        ON b.vec_id = a.vec_id + {KEY_OFFSET}
        WHERE a.vec_id < {KEY_OFFSET} AND a.embedding = b.embedding
    """).fetchone()[0]
    total = con.execute(
        f"SELECT COUNT(*) FROM embeddings WHERE vec_id < {KEY_OFFSET}"
    ).fetchone()[0]
    # rotation can fix a constant vector; allow a tiny fraction
    assert dup <= total * 0.02, f"{dup}/{total} vectors duplicated verbatim"


def test_bench_sf1_artifact_has_no_superlinear_flags():
    """The committed scale-soak artifact must exist and certify that
    no entry grew beyond its documented complexity class."""
    import json

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_sf1.json",
    )
    with open(path) as f:
        art = json.load(f)
    assert art["flagged_superlinear"] == []
    assert art["n_queries"] >= 160
