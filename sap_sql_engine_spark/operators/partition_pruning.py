"""Dynamic partition pruning — the partitioned-layout twin of
``relational.q_revenue_by_region``.

At 100 TB the revenue fact does not live as one flat parquet blob; it is
laid out hive-partitioned on the dimension key analysts slice by (here:
the customer's nation — the SAP analog is BUKRS/company-code
partitioning of BSEG). A region-filtered query must then touch ONLY that
region's partition directories, and the partition list is not knowable
statically — it comes from the region→nation dim join at runtime. That
is exactly Spark's dynamic partition pruning (DPP): Catalyst injects a
``DynamicPruningExpression(InSubquery(...))`` into the fact scan's
partition filters, reusing the dim side's broadcast as the filter
source, so the scan lists 5 of 25 directories instead of all of them.

Two things make DPP actually fire (both asserted structurally in
``tests/test_dpp_aqe.py``, not assumed):

- the fact⋈dim join key must BE the partition column, and
- the dim side must be the broadcast build side
  (``reuseBroadcastOnly`` default). On production data the planner picks
  that on its own (the fact dwarfs the dim); the explicit
  ``F.broadcast`` hint pins the same shape at test scale, where a
  25-row "fact" could otherwise itself become the build side and
  silently drop the pruning filter (observed: the un-hinted plan reads
  all 25 partitions with ``DynamicPruningExpression(true)``).

Reference parity note: the reference engine has no partitioned storage
at all (single SQLite file, ``sap_sql_engine.py:1279-1287``); this
module is the at-scale layout counterpart of its region/nation revenue
templates (``sap_semantic_model.json:7211`` joins), not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.layout import write_partitioned
from ..sources.loader import table
from .relational import DEC4, money, out2

FACT_PARTITION_COL = "c_nationkey"


def build_nationkey_partitioned_fact(
    spark: SparkSession, sf_dir: str, path: str
) -> None:
    """Denormalize revenue lines (lineitem⋈orders⋈customer) and write
    them hive-partitioned by the customer's nation key.

    This is the one-time gold-layout build a 100 TB pipeline amortizes
    across every downstream regional query: the partition column rides
    in the directory name (never in the data files), so the per-file
    payload is just the two pricing columns. The write is one shuffle
    per join plus the partitioned write; dims broadcast."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    fact = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("l_extendedprice", "l_discount", FACT_PARTITION_COL)
    )
    write_partitioned(fact, path, [FACT_PARTITION_COL])


def _region_nations(spark: SparkSession, sf_dir: str, region_name: str):
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = (
        table(spark, sf_dir, "region")
        .filter(F.col("r_name") == region_name)
        .select("r_regionkey")
    )
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")


def q_region_revenue_partitioned(
    spark: SparkSession, fact_path: str, sf_dir: str, region_name: str
) -> DataFrame:
    """Per-nation revenue for ONE region over the partitioned fact.

    The region filter reaches the fact scan as a DYNAMIC partition
    filter: nation⋈region (broadcast) produces the surviving nation
    keys at runtime, and the scan prunes every other partition
    directory before listing a single data file. The test asserts the
    ``DynamicPruningExpression`` structurally AND that
    ``numPartitions`` read equals the region's nation count."""
    fact = spark.read.parquet(fact_path)
    dim = _region_nations(spark, sf_dir, region_name)
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    return (
        fact.join(
            F.broadcast(dim),
            fact[FACT_PARTITION_COL] == dim.n_nationkey,
        )
        .groupBy("n_name")
        .agg(
            out2(F.sum(money("l_extendedprice") * disc)).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("n_name")
    )


def q_region_revenue_unpartitioned(
    spark: SparkSession, sf_dir: str, region_name: str
) -> DataFrame:
    """The flat-layout twin over the driver's raw tables — the equality
    oracle for the partitioned path (same joins, no layout)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    dim = _region_nations(spark, sf_dir, region_name)
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(dim), F.col("c_nationkey") == dim.n_nationkey)
        .groupBy("n_name")
        .agg(
            out2(F.sum(money("l_extendedprice") * disc)).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("n_name")
    )
