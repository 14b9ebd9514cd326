"""Skew-aware join (SURVEY §4 physical-execution posture).

AQE's skew-join handling covers sort-merge joins at runtime; explicit
salting remains the tool when a hot key must spread across reducers in a
shuffle-hash join or aggregate. Semantics are identical to the plain join —
the salted variant is oracle-checked against the unsalted SQL.

Mechanics: the big side gets a deterministic salt in [0, S) derived from a
row-identity column (never ``rand()`` — retries/speculative tasks must
agree); the small side is exploded S× so every (key, salt) bucket finds its
match. Shuffle keys become (key, salt) → hot keys fan out S ways.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    salt_source: Column | str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted S ways and the small side
    replicated S×. ``salt_source`` defaults to the key itself plus a hash of
    all big-side columns — any stable per-row expression works."""
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in big.columns])
    elif isinstance(salt_source, str):
        salt_source = F.col(salt_source)
    salted_big = big.withColumn(
        "__salt", F.pmod(salt_source, F.lit(salt_buckets)).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(salt_buckets)]))
    )
    out = salted_big.join(replicated_small, [key, "__salt"], how)
    return out.drop("__salt")


def hot_cold_split_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    weight: str,
    hot_k: int = 1024,
) -> DataFrame:
    """Inner equi-join split by key frequency: the ``hot_k`` heaviest
    small-side rows (by ``weight``) broadcast — their big-side rows never
    shuffle — while the cold tail takes the normal shuffle join, whose
    worst reducer key is now bounded by the (hot_k+1)-th weight.

    The Zipf-shaped complement to ``salted_join``: salting spreads a known
    hot key S ways; the frequency split removes the head of the
    distribution from the shuffle entirely, which is the right tool when
    the small side carries the frequencies anyway (e.g. a vocabulary with
    term counts joined back to an exploded token table — 'the' would
    otherwise pin one reducer). Semantics identical to ``big.join(small,
    key)``: hot and cold partitions of the small side are disjoint and
    cover it, so the union is exactly the inner join.
    """
    hot = small.orderBy(F.col(weight).desc(), F.col(key).asc()).limit(hot_k)
    cold = small.join(F.broadcast(hot.select(key)), key, "left_anti")
    return big.join(F.broadcast(hot), key).unionByName(big.join(cold, key))
