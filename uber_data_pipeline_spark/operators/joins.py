"""Join strategies beyond what a single hint expresses.

``salted_join``: the skew-breaker for large-x-large shuffle joins.
A hot key hashes every matching row of both sides into ONE reducer;
salting splits the hot key into ``salt_mod`` sub-keys — the skewed
side tags each row with a deterministic salt, the other side is
replicated once per salt value — so the hot key's rows spread over
``salt_mod`` reducers. AQE's skew-join split handles *detected*
skew after the fact; explicit salting is the plan-level guarantee
when the skew is known (power-law user ids, null-heavy keys).

Replication multiplies the non-skewed side by ``salt_mod``: keep it
the smaller side and salt_mod modest (8-32). Results are identical
to the plain join — verified by an unsalted oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt_expr: Column,
    salt_mod: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` with ``other`` on equi-key columns ``on``,
    spreading each key over ``salt_mod`` partitions.

    ``salt_expr`` must be DETERMINISTIC per row (e.g. a line number,
    an id column — NOT rand(): retried tasks must re-salt the same
    way or shuffle retries lose/duplicate rows)."""
    salted = skewed.withColumn(_SALT, (salt_expr % salt_mod).cast("int"))
    replicated = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_mod - 1)))
    )
    out = salted.join(replicated, [*on, _SALT], how)
    return out.drop(_SALT)
