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


QUERIES = {"governance_masked_join": q_masked_pseudonym_join}
ORACLES = {"governance_masked_join": ORACLE_MASKED_PSEUDONYM_JOIN}
