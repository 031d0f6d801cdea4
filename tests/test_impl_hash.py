"""Implementation-aware rotation (VERDICT r4 item 4)."""

from uber_data_pipeline_spark.queries import (
    _last_green_round,
    _modules,
    all_oracles,
    all_queries,
    impl_hash,
)


def _registry():
    fns, sqls = {}, {}
    for mod in _modules():
        fns.update(mod.QUERIES)
        sqls.update(mod.ORACLES)
    return fns, sqls


def test_entry_hash_deterministic_and_oracle_sensitive():
    fns, sqls = _registry()
    name = "dedup_exact"
    h1 = impl_hash.entry_hash(fns[name], sqls[name])
    h2 = impl_hash.entry_hash(fns[name], sqls[name])
    assert h1 == h2
    assert impl_hash.entry_hash(fns[name], sqls[name] + " -- changed") != h1


def test_dep_functions_reach_operator_module():
    fns, _ = _registry()
    deps = impl_hash.dep_functions(fns["dedup_embedding_cosine"])
    names = {f.__qualname__ for f in deps}
    assert "cosine_pairs_banded" in names


def test_hash_mismatch_refronts_entry():
    """Every green-rowed entry whose recorded hash mismatches its
    current implementation must sort before all hash-valid entries."""
    fns, sqls = _registry()
    greens = _last_green_round()
    recorded = impl_hash.recorded_hashes()
    order = list(all_queries())
    invalid = [
        n
        for n in order
        if n in greens
        and recorded.get(n) != impl_hash.entry_hash(fns[n], sqls.get(n, ""))
    ]
    if invalid:
        cutoff = max(order.index(n) for n in invalid)
        # never-green entries (no CORRECTNESS row yet, e.g. stamped
        # mid-round with --new) legitimately front with the invalid
        # ones — only a GREEN hash-valid entry sorting before an
        # invalid one is a rotation bug
        valid_before = [
            n
            for n in order[:cutoff]
            if n in recorded and n not in invalid and n in greens
        ]
        assert not valid_before, valid_before


def test_impl_hashes_cover_registry():
    """EVERY registry entry must have a recorded implementation hash
    (VERDICT r8 'What's wrong' #1 — three straight rounds shipped new
    entries unstamped, leaving the rotation unable to detect a
    regression edit to them).  Protocol: `tools/record_impl_hashes.py`
    at round start stamps driver-green entries; `--new` stamps entries
    added mid-round (harmless — greens come from CORRECTNESS files,
    the hash only gates them).  Equality also catches stale hashes for
    deleted/renamed entries."""
    recorded = impl_hash.recorded_hashes()
    assert set(recorded) == set(all_queries())


def test_query_and_oracle_rotation_orders_agree():
    q = list(all_queries())
    o = list(all_oracles())
    pos = {n: i for i, n in enumerate(q)}
    assert o == sorted(o, key=lambda n: pos[n])


def test_rotation_tiebreak_is_insertion_order_independent(monkeypatch):
    """Regression for the r9 verdict's working-tree failure: an exact
    (last-green-round, bench-seconds) tie between two entries of the
    same module made queries() and oracles() diverge, because the old
    tertiary sort key was each map's OWN insertion order and the
    QUERIES/ORACLES dicts enumerate names differently.  Inject an exact
    tie across maps with opposite insertion orders and assert both
    rotations agree."""
    import uber_data_pipeline_spark.queries as reg

    tied = {"entry_b": 6, "entry_a": 6, "entry_c": 6}
    monkeypatch.setattr(reg, "_effective_greens", lambda: dict(tied))
    monkeypatch.setattr(
        reg, "_bench_seconds", lambda: {n: 0.44 for n in tied}
    )
    fwd = {n: object() for n in tied}  # b, a, c
    rev = {n: object() for n in reversed(list(tied))}  # c, a, b
    assert list(reg._rotated(fwd)) == list(reg._rotated(rev))
