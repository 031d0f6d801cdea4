"""Derive a larger scale factor from the driver-generated sf0.1
tables by replication with key remapping — the scale-soak input for
BENCH_sf1.json (VERDICT r2 item 1: prove the 100x claims with data,
not just plan shape).

Design constraints (so sf1 stresses the ALGORITHMS, not a data
artifact):

- **Key offsets preserve every modular cohort.** Copy i adds
  i * KEY_OFFSET (12 * 10^6) to every synthetic key. 12e6 is
  divisible by every modulus the queries use (16, 40, 1000, 5, 3),
  so each copy reproduces the original residue structure and FK
  joins stay consistent (o_custkey, l_orderkey/l_partkey/l_suppkey
  remap with their parents).
- **Documents are perturbed, not duplicated.** A verbatim 10x copy
  would turn every near-dup cluster of size k into size 10k and grow
  candidate PAIRS ~50x — a data-property explosion, not algorithmic
  scaling. (Word ROTATION is not enough: a cyclic shift preserves
  all but ~2 linear shingles, leaving cross-copy Jaccard ~1.) Copy
  i>0 instead suffixes every third word positionally
  (word -> word~i at positions p % 3 == 1), so EVERY 3-shingle
  contains at least one copy-specific token — cross-copy Jaccard
  drops to ~0 — while aligned intra-copy near-dup pairs mutate
  identically and keep their similarity: dup pairs scale ~10x =
  linearly, the honest soak for the dedup family.
- **Embeddings rotate per copy** (list rotation by i) — preserves
  norms and the within-copy neighbor structure without creating 10
  exact copies of every vector.
- **Physical schemas are preserved exactly** (DuckDB reads/writes the
  same parquet logical types), so catalog.load_table treats the
  derived SF identically to the driver-generated ones.

Usage: python tools/gen_sf.py [out_dir] [n_copies]
Defaults: .artifacts/sf1.0 relative to the repo root, 10 copies.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
KEY_OFFSET = 12_000_000

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def q(table: str) -> str:
    return f"read_parquet('{SRC}/{table}.parquet')"


def copies_sql(n: int) -> str:
    return f"(SELECT range AS i FROM range(0, {n}))"


def gen(out_dir: str, n_copies: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    off = "i * {k}".format(k=KEY_OFFSET)

    plans = {
        # fixed dims: single copy
        "region": f"SELECT * FROM {q('region')}",
        "nation": f"SELECT * FROM {q('nation')}",
        "customer": f"""
            SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {q('customer')}, {copies_sql(n_copies)}
        """,
        "supplier": f"""
            SELECT s_suppkey + {off} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM {q('supplier')}, {copies_sql(n_copies)}
        """,
        "part": f"""
            SELECT p_partkey + {off} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {q('part')}, {copies_sql(n_copies)}
        """,
        "orders": f"""
            SELECT o_orderkey + {off} AS o_orderkey,
                   o_custkey + {off} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM {q('orders')}, {copies_sql(n_copies)}
        """,
        "lineitem": f"""
            SELECT l_orderkey + {off} AS l_orderkey,
                   l_partkey + {off} AS l_partkey,
                   l_suppkey + {off} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM {q('lineitem')}, {copies_sql(n_copies)}
        """,
        "events": f"""
            SELECT event_id + {off} AS event_id, ts,
                   user_id + {off} AS user_id,
                   event_type, value, props
            FROM {q('events')}, {copies_sql(n_copies)}
        """,
        # positional word mutation per copy (see module docstring);
        # recompute n_chars from the mutated text
        "documents": f"""
            WITH src AS (
                SELECT doc_id, text, string_split(text, ' ') AS w,
                       lang, source
                FROM {q('documents')}
            ), mut AS (
                SELECT doc_id, i, lang, source,
                       CASE WHEN i = 0 THEN text
                       ELSE array_to_string(list_transform(
                           range(1, len(w) + 1),
                           p -> CASE WHEN p % 3 = 1
                                THEN w[p] || '~' || i
                                ELSE w[p] END), ' ')
                       END AS text
                FROM src, {copies_sql(n_copies)}
            )
            SELECT doc_id + {off} AS doc_id, text, lang, source,
                   length(text) AS n_chars
            FROM mut
        """,
        # rotate the vector by i positions (norm-preserving)
        "embeddings": f"""
            SELECT vec_id + {off} AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                   ELSE list_concat(
                       list_slice(embedding, (i % len(embedding)) + 1,
                                  len(embedding)),
                       list_slice(embedding, 1, i % len(embedding)))
                   END::FLOAT[] AS embedding,
                   label
            FROM {q('embeddings')}, {copies_sql(n_copies)}
        """,
    }

    for table, sql in plans.items():
        out = os.path.join(out_dir, f"{table}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, "
            "COMPRESSION SNAPPY, ROW_GROUP_SIZE 262144)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows -> {out}", flush=True)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".artifacts", "sf1.0"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    gen(out, n)
