"""Oracle-gated governance queries — the masked() lane under the
driver's correctness gate.

``plans.governance.masked`` (the ALLOW-path of the reference's PII gate,
reference ``sap_sql_engine.py:1202-1259`` / prompt rules at ``:373-401``)
is pytest-covered; this module puts its salted-pseudonym recipe under a
DuckDB oracle so the driver verifies the masking math bit-for-bit:
``sha2(concat_ws('|', salt, cast(value as string)), 256)`` must produce
the identical hex on both engines, and the pseudonyms must stay
JOINABLE — the same person under the same salt maps to the same token
across tables, which is the whole point of deterministic masking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.governance import masked
from ..sources.loader import table

MASK_SALT = "r7-masking-salt"


def q_masked_pseudonym_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two MASKED relations on their pseudonym column and aggregate.

    The customer key and name are presented under the gate's PII column
    names (PERNR/ENAME — the rename is what a governed semantic layer
    does when it maps HR identifiers onto a fact), masked with one
    salt, and the orders side is masked with the same salt — so the
    join happens entirely in pseudonym space: no raw identifier exists
    anywhere in the plan after the projection. Per market segment the
    query emits order/customer counts plus the lexicographic min
    pseudonym (a stable spot-check that the actual hash BYTES match the
    oracle, not just the cardinalities).

    Scale shape: masking is a pure projection (zero shuffles, pushdown
    transparent for non-masked columns); the join shuffles on the
    64-hex pseudonym exactly as it would on the raw key, with identical
    cardinality — determinism is what keeps masked joins
    distribution-friendly."""
    cust = masked(
        table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("pernr"),
            F.col("c_name").alias("ename"),
            "c_mktsegment",
        ),
        salt=MASK_SALT,
    )
    orders = masked(
        table(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("pernr"), "o_orderkey"
        ),
        salt=MASK_SALT,
    )
    return (
        cust.join(orders, "pernr")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("pernr").alias("n_customers"),
            F.min("ename").alias("min_ename_pseudonym"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_MASKED_PSEUDONYM_JOIN = f"""
WITH cust AS (
  SELECT sha256(concat_ws('|', '{MASK_SALT}', CAST(c_custkey AS VARCHAR)))
           AS pernr,
         sha256(concat_ws('|', '{MASK_SALT}', c_name)) AS ename,
         c_mktsegment
  FROM customer
),
ord AS (
  SELECT sha256(concat_ws('|', '{MASK_SALT}', CAST(o_custkey AS VARCHAR)))
           AS pernr,
         o_orderkey
  FROM orders
)
SELECT c_mktsegment,
       count(*) AS n_orders,
       count(DISTINCT pernr) AS n_customers,
       min(ename) AS min_ename_pseudonym
FROM cust JOIN ord USING (pernr)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


K_ANON = 5  # minimum group size before a QI group is releasable


def q_kanonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the customer quasi-identifiers.

    The governance gate blocks row-level PII; the complementary release
    question is whether the ALLOWED aggregate grain still re-identifies:
    a quasi-identifier (QI) combination shared by fewer than k rows is a
    linkage handle, and a group whose sensitive attribute is constant
    (l = 1) leaks by homogeneity even at k. QI here is
    (c_nationkey, c_mktsegment); the sensitive attribute is the account
    standing class (debt vs credit).

    Per segment: group count, row count, the smallest group, how many
    groups/rows fall below k, and the l-diversity floor — the numbers a
    data-release checklist actually wants (k-anonymity, Sweeney 2002;
    l-diversity, Machanavajjhala 2007).

    Scale shape: one groupBy over the QI columns (partial+final hash
    agg), then a ~125-row regroup to segment grain. No joins, no UDFs;
    at 100 TB this is a single shuffle keyed exactly like any other
    fact aggregation."""
    cust = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, "debt").otherwise("credit").alias(
            "standing"
        ),
    )
    groups = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("standing").alias("l"),
    )
    return (
        groups.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.min("n").cast("bigint").alias("min_group_size"),
            F.sum((F.col("n") < K_ANON).cast("bigint"))
            .cast("bigint")
            .alias("n_viol_groups"),
            F.sum(F.when(F.col("n") < K_ANON, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("n_viol_rows"),
            F.min("l").cast("bigint").alias("l_min"),
            F.sum((F.col("l") == 1).cast("bigint"))
            .cast("bigint")
            .alias("n_homogeneous_groups"),
        )
        .orderBy("segment")
    )


ORACLE_KANONYMITY = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment,
         count(*) AS n,
         count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'debt'
                             ELSE 'credit' END) AS l
  FROM customer
  GROUP BY 1, 2
)
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(min(n) AS BIGINT) AS min_group_size,
       CAST(sum(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_viol_groups,
       CAST(sum(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT)
         AS n_viol_rows,
       CAST(min(l) AS BIGINT) AS l_min,
       CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_homogeneous_groups
FROM groups
GROUP BY 1
ORDER BY 1
"""


QUERIES = {
    "governance_masked_join": q_masked_pseudonym_join,
    "kanonymity_report": q_kanonymity_report,
}
ORACLES = {
    "governance_masked_join": ORACLE_MASKED_PSEUDONYM_JOIN,
    "kanonymity_report": ORACLE_KANONYMITY,
}
