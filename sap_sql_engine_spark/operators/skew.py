"""Skew-mitigation utilities — the 100 TB join toolbox.

AQE's skew-join handling (on in ``session.py``) splits oversized partitions
at runtime, but only for sort-merge joins and only after a shuffle has
materialized the skew. ``salted_join`` is the *declared* alternative for the
pathological case AQE can't fix: a fact table where a handful of keys own a
double-digit percentage of all rows (the SAP analog: company code 1000 in
BSEG, or a heavy-hitter shingle in the dedup pipeline).

Mechanics: the big side scatters each key across ``n_salts`` sub-keys with a
seeded ``rand()``; the small side is replicated ``n_salts`` times via
``explode(sequence(...))`` — shuffle keys become (key, salt), so the heavy
key's rows spread over ``n_salts`` reducers instead of one. Replication cost
is |small| x n_salts, which is why this pairs with a small-but-not-
broadcastable right side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on``, salted to ``n_salts`` sub-keys.

    Result is row-identical to ``big.join(small, on, how)`` (the salt is
    dropped); only the shuffle distribution changes. ``how`` must keep the
    small side non-null-producing for correctness of the replication
    ('inner' and 'left' are safe; 'right'/'full' would multiply unmatched
    small rows and are rejected).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(SALT_COL, (F.rand(seed) * n_salts).cast("int"))
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, [*on, SALT_COL], how).drop(SALT_COL)


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Heavy-hitter report for deciding whether a join needs salting:
    (key, row_count, fraction of total)."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("row_count"))
        .withColumn("fraction", F.round(F.col("row_count") / F.lit(total), 4))
        .orderBy(F.col("row_count").desc(), F.col(key))
        .limit(n)
    )
