"""r13 optimization-round regression tests: internals that changed
for performance must keep their exact semantics."""

from __future__ import annotations

import pytest


# ------------------------------------------ basket_association_rules
#
# r13 replaced the lineitem self-join + 4.2M-row DISTINCT with one
# per-order collect_set + row-local pair expansion. The load-bearing
# subtlety: a part appearing in the SAME order on MULTIPLE lineitem
# rows must still count ONCE toward pair support, part support, and
# the corpus total — previously guaranteed by DISTINCT / COUNT
# (DISTINCT ...), now by the set semantics of collect_set.


def test_basket_rules_dedup_within_order(spark):
    from uber_data_pipeline_spark.queries import tpch_extra as tx

    rows = [
        # order 1: {1, 2} — part 1 bought on TWO lineitem rows
        (1, 1), (1, 1), (1, 2),
        # order 2: {1, 2, 3}
        (2, 1), (2, 2), (2, 3),
        # order 3: {1, 3} — part 3 duplicated too
        (3, 1), (3, 3), (3, 3),
        # order 4: {2} — no pairs
        (4, 2), (4, 2),
    ]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    orig = tx.load_table
    tx.load_table = lambda s, sf, name: li
    try:
        out = tx.basket_association_rules(spark, "ignored").collect()
    finally:
        tx.load_table = orig

    # total=4 orders; n_1=3, n_2=3, n_3=2; pair (1,2) in orders 1,2;
    # pair (1,3) in orders 2,3; pair (2,3) only in order 2 (< min 2).
    got = {(r.part_a, r.part_b): r for r in out}
    assert set(got) == {(1, 2), (1, 3)}
    r12, r13_ = got[(1, 2)], got[(1, 3)]
    assert r12.pair_n == 2 and r13_.pair_n == 2
    assert r12.support == r13_.support == round(2 / 4, 9)
    assert r12.confidence == r13_.confidence == round(2 / 3, 9)
    # lift = pair_n * total / (n_a * n_b)
    assert r12.lift == round(2 * 4 / (3 * 3), 9)
    assert r13_.lift == round(2 * 4 / (3 * 2), 9)
    # ordering: desc lift puts (1,3) first
    assert [(r.part_a, r.part_b) for r in out] == [(1, 3), (1, 2)]


# -------------------------------------------- parts_label_propagation
#
# r13 fused each LPA round's two exchanges into one via an explicit
# repartition("v") ahead of the (v, label) vote count — the per-v
# lexicographic max must still break count ties toward the MIN label
# regardless of the vote rows' physical order within a partition.


def test_lpa_tiebreak_min_label_survives_repartition(spark):
    from uber_data_pipeline_spark.queries.tpch_extra import _lpa_from_lineitem

    # ONE round on a path 20 - 10 - 30: vertex 10 sees labels 20 and
    # 30 with equal counts, so the (max count, MIN label) vote must
    # give it 20 — a pure tie-break probe with no multi-round waves.
    rows = [(100, 10), (100, 20), (200, 10), (200, 30)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    out = {
        r.part_key: r.community
        for r in _lpa_from_lineitem(li, iters=1).collect()
    }
    assert out[10] == 20  # tie broken toward min neighbor label
    assert out[20] == 10 and out[30] == 10  # sole-neighbor adoption
