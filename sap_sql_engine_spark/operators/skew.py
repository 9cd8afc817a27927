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

from pyspark.sql import DataFrame, SparkSession
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


# ---------------------------------------------------------------------------
# oracle-gated salted-join query: proves the rewrite is result-identical
# to the plain join it replaces (the salt changes only the shuffle keys).


def q_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment through ``salted_join`` — the DuckDB
    oracle runs the PLAIN join, so the gate asserts the salting rewrite is
    a pure physical transformation. Broadcast is hinted OFF for the salted
    pair so the (key, salt) shuffle actually happens: with broadcast the
    salt would be inert (no shuffle to spread) and the test would prove
    nothing about the rewrite's distribution path."""
    from ..sources.loader import table
    from .relational import DEC, out2

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(orders.hint("shuffle_hash"), cust.hint("shuffle_hash"), ["o_custkey"])
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("order_count"),
        out2(F.sum(F.col("o_totalprice").cast(DEC))).alias("total_revenue"),
    )


ORACLE_SALTED_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       count(*) AS order_count,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


QUERIES = {
    "salted_segment_revenue": q_salted_segment_revenue,
}

ORACLES = {
    "salted_segment_revenue": ORACLE_SALTED_SEGMENT_REVENUE,
}
