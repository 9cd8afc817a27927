"""Relational operator suite — SURVEY.md §2 re-expressed over the testdata.

Each function here is one operator family from the reference's query surface
(58 validated NL->SQL templates in the reference's
``sap_semantic_model.json:7209-7878`` + the 29 SQL guidelines), re-expressed
as an idiomatic Spark DataFrame plan over the driver's TPC-H-ish tables.
The docstring of each query cites the reference construct it mirrors.

Determinism conventions (so results hash-match a DuckDB oracle exactly):

- Money math is done in DECIMAL (exact, order-independent across partitions)
  and only converted to DOUBLE at the output boundary via
  ``round(cast(dec as double), n)``. A double->decimal(…,2) cast can never
  hit a .005 tie (not representable in binary), so both engines round
  identically.
- Top-K queries always carry a unique tiebreaker key in the ORDER BY.
- Counts are BIGINT; dates are cast to DateType.

Scale posture (100 TB): every query is a declarative plan — filters and
projections push down to the Parquet scan, dimension joins broadcast
(region/nation/customer-at-sf are far below the 64 MB threshold), fact-fact
joins shuffle on their keys, and aggregates run partial+final. Nothing here
collects to the driver.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.loader import table

# ---------------------------------------------------------------------------
# helpers

DEC = "decimal(18,2)"  # money at rest (reference CURR(13,2), SURVEY §1.2)
DEC4 = "decimal(18,4)"  # rates/discounts


def _tmp_view(df: DataFrame, base: str) -> str:
    """Register ``df`` under a per-call unique temp-view name. Fixed names
    collide when two sessions (or two concurrent queries in one session)
    run the same operator; a uuid suffix makes each plan self-contained."""
    name = f"{base}_{uuid.uuid4().hex[:12]}"
    df.createOrReplaceTempView(name)
    return name


def money(c) -> F.Column:
    """Exact money representation — the engine's answer to the reference's
    lossy REAL/TEXT storage of CURR columns (reference
    ``build_sap_test_db.py:187-202``)."""
    return F.col(c).cast(DEC) if isinstance(c, str) else c.cast(DEC)


def out2(c) -> F.Column:
    """Output boundary: exact decimal -> double rounded to cents."""
    return F.round(c.cast("double"), 2)


def out4(c) -> F.Column:
    return F.round(c.cast("double"), 4)


# ---------------------------------------------------------------------------
# A1/A5: multi-aggregate hash aggregation (TPC-H Q1 shape).
# Mirrors the reference's GROUP BY SUM/AVG/COUNT templates (22 GROUP BYs,
# e.g. trial balance at sap_semantic_model.json:7211) — partial+final hash
# agg, 2 grouping cols, 8 aggregates, one pass over the fact table.


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: wide decimal aggregates per flag/status."""
    li = table(spark, sf_dir, "lineitem")
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    taxp = F.lit(1).cast(DEC4) + F.col("l_tax").cast(DEC4)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            out2(F.sum(money("l_quantity"))).alias("sum_qty"),
            out2(F.sum(money("l_extendedprice"))).alias("sum_base_price"),
            out2(F.sum(money("l_extendedprice") * disc)).alias("sum_disc_price"),
            out2(F.sum(money("l_extendedprice") * disc * taxp)).alias("sum_charge"),
            out4(F.sum(money("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            out4(F.sum(money("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            out4(F.sum(F.col("l_discount").cast(DEC4)) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS sum_disc_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE), 2) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# J1 + A1 + O1 + O3: dim⋈fact join, group, order, top-K — the flagship.
# Mirrors the reference's "top vendors by spend" template
# (sap_semantic_model.json:7525): LFA1 ⋈ (BSIK ∪ BSAK), SUM, ORDER BY DESC,
# LIMIT 10. customer≈LFA1 (broadcast side), orders≈BSIK (fact side).


def q_top_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: top customers by total spend (broadcast dim join + TakeOrderedAndProject)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            out2(F.sum(money("o_totalprice"))).alias("total_spend"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


ORACLE_TOP_CUSTOMERS = """
SELECT c_custkey, c_name,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_spend,
       count(*) AS order_count
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# A3: signed conditional aggregation — the SHKZG debit/credit rule
# (guideline sap_semantic_model.json:7906: CASE WHEN SHKZG='S' THEN DMBTR
# ELSE -DMBTR). l_returnflag='R' plays the credit role.


def q_signed_amount_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHKZG-style signed amount aggregation (debit/credit CASE sign)."""
    li = table(spark, sf_dir, "lineitem")
    signed = F.when(F.col("l_returnflag") == "R", -money("l_extendedprice")).otherwise(
        money("l_extendedprice")
    )
    return (
        li.groupBy("l_linestatus")
        .agg(
            out2(F.sum(signed)).alias("net_amount"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


ORACLE_SIGNED_AMOUNT = """
SELECT l_linestatus,
       round(CAST(sum(CASE WHEN l_returnflag = 'R'
                           THEN -CAST(l_extendedprice AS DECIMAL(18,2))
                           ELSE  CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS net_amount,
       count(*) AS line_count
FROM lineitem
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# U1 + A4: aggregation over UNION ALL of open∪cleared — BSIK ∪ BSAK
# (sap_semantic_model.json:7525, guideline :7894). Open orders ('O') vs
# fulfilled ('F'), tagged then aggregated; unionByName keeps schemas aligned.


def q_union_open_cleared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over UNION ALL of open and cleared item relations."""
    orders = table(spark, sf_dir, "orders")
    open_items = orders.filter(F.col("o_orderstatus") == "O").withColumn(
        "item_state", F.lit("open")
    )
    cleared = orders.filter(F.col("o_orderstatus") == "F").withColumn(
        "item_state", F.lit("cleared")
    )
    return (
        open_items.unionByName(cleared)
        .groupBy("item_state")
        .agg(
            out2(F.sum(money("o_totalprice"))).alias("total_amount"),
            F.count(F.lit(1)).alias("item_count"),
        )
    )


ORACLE_UNION_OPEN_CLEARED = """
SELECT item_state,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_amount,
       count(*) AS item_count
FROM (
  SELECT o_totalprice, 'open' AS item_state FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT o_totalprice, 'cleared' AS item_state FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY item_state
"""


# ---------------------------------------------------------------------------
# A6 + O2: bucketed aging aggregation with CASE-expression ordering —
# the AP/AR aging template (sap_semantic_model.json:7624,:7635): CASE
# buckets on day deltas, GROUP BY bucket, ORDER BY a CASE sort key.

_AGING_REF_DATE = "2002-01-01"


def q_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging buckets with CASE-expression ordering (the AR aging report shape)."""
    orders = table(spark, sf_dir, "orders")
    age = F.datediff(F.lit(_AGING_REF_DATE).cast("date"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(age <= 365, "0-1y")
        .when(age <= 1095, "1-3y")
        .when(age <= 1825, "3-5y")
        .otherwise("5y+")
    )
    sort_key = (
        F.when(bucket == "0-1y", 1)
        .when(bucket == "1-3y", 2)
        .when(bucket == "3-5y", 3)
        .otherwise(4)
    )
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .withColumn("age_bucket", bucket)
        .groupBy("age_bucket")
        .agg(
            out2(F.sum(money("o_totalprice"))).alias("open_amount"),
            F.count(F.lit(1)).alias("open_count"),
        )
        .withColumn(
            "bucket_order",
            F.when(F.col("age_bucket") == "0-1y", 1)
            .when(F.col("age_bucket") == "1-3y", 2)
            .when(F.col("age_bucket") == "3-5y", 3)
            .otherwise(4),
        )
        .orderBy("bucket_order")
    )


ORACLE_AGING_BUCKETS = """
SELECT age_bucket,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS open_amount,
       count(*) AS open_count,
       CASE age_bucket WHEN '0-1y' THEN 1 WHEN '1-3y' THEN 2 WHEN '3-5y' THEN 3 ELSE 4 END AS bucket_order
FROM (
  SELECT o_totalprice,
         CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') <= 365 THEN '0-1y'
              WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') <= 1095 THEN '1-3y'
              WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') <= 1825 THEN '3-5y'
              ELSE '5y+' END AS age_bucket
  FROM orders WHERE o_orderstatus = 'O'
)
GROUP BY age_bucket
ORDER BY bucket_order
"""


# ---------------------------------------------------------------------------
# A2: COUNT(DISTINCT) — reference uses COUNT(DISTINCT b.BELNR)
# (sap_semantic_model.json:7635,:7841). Spark plans this as a two-phase
# distinct aggregate; at 100 TB the approx_count_distinct variant in
# functions.approx is the scale path.


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT DISTINCT of customer segments per nation."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.count(F.lit(1)).alias("line_count"),
    )


ORACLE_COUNT_DISTINCT = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS distinct_parts,
       count(DISTINCT l_suppkey) AS distinct_suppliers,
       count(*) AS line_count
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# A8: HAVING — post-aggregation filter, reference "purchase orders over
# threshold" (sap_semantic_model.json:7522, guideline :8029).


def q_having_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY with a HAVING threshold over aggregated order totals."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(money("o_totalprice")).alias("_total"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .filter(F.col("_total") > 1_500_000)
        .select(
            "o_custkey",
            out2(F.col("_total")).alias("total_value"),
            "order_count",
        )
    )


ORACLE_HAVING = """
SELECT o_custkey,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value,
       count(*) AS order_count
FROM orders
GROUP BY o_custkey
HAVING sum(CAST(o_totalprice AS DECIMAL(18,2))) > 1500000
"""


# ---------------------------------------------------------------------------
# J7/J6: anti-join — "open requisitions" LEFT JOIN … IS NULL
# (sap_semantic_model.json:7814) and NOT IN pipelines (:7774). Expressed as
# LEFT ANTI (the NULL-safe rewrite SURVEY §4.4 requires — Spark's NOT IN
# with a nullable subquery silently returns zero rows).


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    cust = table(spark, sf_dir, "customer")
    big_urgent = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 200000)
    )
    return (
        cust.join(big_urgent, cust.c_custkey == big_urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ORACLE_ANTI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_totalprice > 200000)
"""


# ---------------------------------------------------------------------------
# J5: semi-join via EXISTS — reference billing-linkage EXISTS subquery
# (sap_semantic_model.json:7787). LEFT SEMI is Catalyst's decorrelated form.


def q_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi-join: customers holding at least one urgent-priority order."""
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


ORACLE_SEMI_JOIN = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


# ---------------------------------------------------------------------------
# J8: multi-hop chain join — the document-flow chains (O2C
# VBAK→LIKP→VBRK→BSID, sap_semantic_model.json:7760; PM chain :7725).
# region→nation→customer→orders→lineitem is the same 5-hop shape; the two
# dim hops broadcast, the fact hop shuffles on the join key.


def q_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table join chain to regional revenue (broadcast dims)."""
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            out2(F.sum(money("l_extendedprice") * disc)).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy(F.col("revenue").desc())
    )


ORACLE_REVENUE_BY_REGION = """
SELECT r_name,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue,
       count(*) AS line_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY revenue DESC
"""


# ---------------------------------------------------------------------------
# TPC-H Q7/Q8 shapes: bilateral trade volume and market share — the classic
# cross-nation analytics the engine should express verbatim.

VS_NATION_A = "NATION_3"  # synthetic corpus names (TESTDATA.md)
VS_NATION_B = "NATION_7"
MS_NATION = "NATION_5"
MS_REGION = "AMERICA"


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade revenue between two nations by
    ship year — supplier nation on one side, customer nation on the
    other, disjunctive pair predicate.

    Scale shape: the disjunction pushes into the two broadcast nation
    dims BEFORE the fact joins (each side filtered to the 2-row nation
    subset), so lineitem ⋈ orders stays the only fact-fact co-shuffle
    and the pair predicate prunes everything else map-side."""
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(VS_NATION_A, VS_NATION_B))
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(VS_NATION_A, VS_NATION_B))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(out2(F.sum(money("l_extendedprice") * disc)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_VOLUME_SHIPPING = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('{VS_NATION_A}', '{VS_NATION_B}')
  AND n2.n_name IN ('{VS_NATION_A}', '{VS_NATION_B}')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per nation, the DORMANT high-value customers —
    account balance above the average positive balance, engagement
    (order count) strictly below the per-customer average. Two
    scalar-aggregate thresholds + a count-attach, the "who should sales
    call" query. (Q22's literal no-orders anti-join is already gated as
    ``customers_without_orders`` and is an empty relation on this dense
    synthetic corpus; the below-average-engagement form keeps the shape
    productive.)

    Exactness: balances land as DOUBLE in parquet, so they are cast once
    to integer CENTS (exact DECIMAL(18,2) -> x100) and both thresholds
    are integral-division averages — every compare is integer vs integer
    on both engines, no float averaging (FLOATS.md class A).

    Scale shape: the order counts are one customer-keyed aggregation
    attached by co-keyed left join (0 for never-ordered); both
    thresholds are 1-row scalar attaches; one nation-keyed aggregation
    emits the report."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "bal_cents"
        ),
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ord_counts = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    with_orders = cust.join(
        ord_counts, cust.c_custkey == ord_counts.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_nationkey",
        "bal_cents",
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
    )
    thresh = with_orders.agg(
        F.expr(
            "CAST(CAST(sum(CASE WHEN bal_cents > 0 THEN bal_cents ELSE 0 END) AS DECIMAL(38,0)) "
            "div sum(CASE WHEN bal_cents > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("avg_cents"),
        F.expr("CAST(sum(n_orders) div count(1) AS BIGINT)").alias("avg_orders"),
    )
    return (
        with_orders.crossJoin(F.broadcast(thresh))
        .filter(
            (F.col("bal_cents") > F.col("avg_cents"))
            & (F.col("n_orders") < F.col("avg_orders"))
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("bal_cents") / F.lit(100.0), 2).alias("total_balance"),
        )
        .orderBy("n_name")
    )


ORACLE_SALES_OPPORTUNITY = """
WITH cust AS (
  SELECT c_custkey, c_nationkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
  FROM customer
),
with_orders AS (
  SELECT c.c_custkey, c.c_nationkey, c.bal_cents,
         CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders
  FROM cust c LEFT JOIN (
    SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
  ) o ON c.c_custkey = o.o_custkey
),
thresh AS (
  SELECT CAST(CAST(sum(CASE WHEN bal_cents > 0 THEN bal_cents ELSE 0 END) AS HUGEINT)
              // sum(CASE WHEN bal_cents > 0 THEN 1 ELSE 0 END) AS BIGINT) AS avg_cents,
         CAST(CAST(sum(n_orders) AS HUGEINT) // count(*) AS BIGINT) AS avg_orders
  FROM with_orders
)
SELECT n_name,
       count(*) AS n_customers,
       round(sum(bal_cents) / 100.0, 2) AS total_balance
FROM with_orders, thresh
JOIN nation ON c_nationkey = n_nationkey
WHERE bal_cents > avg_cents AND n_orders < avg_orders
GROUP BY n_name
ORDER BY n_name
"""


LV_QTY_THRESHOLD = 250  # Q18's "large volume" order-quantity cutoff


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers holding orders whose TOTAL line
    quantity exceeds a threshold — the grouped-HAVING-IN-subquery
    pattern, expressed as an aggregate-then-semi-join.

    Scale shape: the qualifying order set comes from ONE map-side-
    combined aggregation of lineitem (integer quantity sums), and the
    order/lineitem re-join consumes that (small, threshold-pruned) set —
    AQE broadcasts it when small, shuffles when the threshold admits
    many orders. Quantities are integer-valued DECIMALs, so the sum and
    the threshold compare are exact."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty"))
        .filter(F.col("total_qty") > LV_QTY_THRESHOLD)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            out2(F.col("o_totalprice").cast(DEC)).alias("totalprice"),
            out2(F.col("total_qty")).alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), "orderkey")
    )


ORACLE_LARGE_VOLUME = f"""
SELECT c_name,
       o_orderkey AS orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS totalprice,
       round(CAST(tq.total_qty AS DOUBLE), 2) AS total_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {LV_QTY_THRESHOLD}
) tq ON o_orderkey = tq.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, orderkey
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's supplier share of a region's customer
    market by order year, emitted as integral basis points — both the
    numerator and denominator are exact DECIMAL cent sums, converted to
    integer cents before one integral division (FLOATS.md class A; no
    double division in the emitted cell)."""
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == MS_REGION)
    n_c = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_nk"), F.col("n_regionkey").alias("cn_rk")
    )
    n_s = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nk"), F.col("n_name").alias("supp_nation")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    vol = F.sum(money("l_extendedprice") * disc)
    nat_vol = F.sum(
        F.when(
            F.col("supp_nation") == MS_NATION, money("l_extendedprice") * disc
        ).otherwise(F.lit(0).cast(DEC))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cn_nk"))
        .join(
            F.broadcast(region.select("r_regionkey")),
            F.col("cn_rk") == F.col("r_regionkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(vol.alias("tot"), nat_vol.alias("nat"))
        .select(
            "o_year",
            out2(F.col("nat")).alias("nation_revenue"),
            out2(F.col("tot")).alias("market_revenue"),
            # DECIMAL scale-6 sums shifted to exact integers, then one
            # integral division — Spark `div` ≡ DuckDB `//`
            F.expr(
                "CAST((CAST(nat * 1000000 AS DECIMAL(38,0)) * 10000) "
                "div CAST(tot * 1000000 AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("share_bp"),
        )
        .orderBy("o_year")
    )


ORACLE_MARKET_SHARE = f"""
WITH vols AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS tot,
         sum(CASE WHEN ns.n_name = '{MS_NATION}'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS nat
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region   ON nc.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE r_name = '{MS_REGION}'
  GROUP BY 1
)
SELECT o_year,
       round(CAST(nat AS DOUBLE), 2) AS nation_revenue,
       round(CAST(tot AS DOUBLE), 2) AS market_revenue,
       CAST((CAST(nat * 1000000 AS HUGEINT) * 10000) // CAST(tot * 1000000 AS HUGEINT) AS BIGINT) AS share_bp
FROM vols
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# J3: left outer join + COALESCE — reference LEFT JOIN SKAT text lookups
# with COALESCE defaults (sap_semantic_model.json:7211; 27 LEFT JOINs).
# Nations with zero customers must appear with 0.


def q_nation_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + COALESCE: customer counts for every nation including empty ones."""
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    per_nation = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(money("c_acctbal")).alias("_bal"),
    )
    return (
        nation.join(per_nation, nation.n_nationkey == per_nation.c_nationkey, "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(F.col("_n"), F.lit(0)).alias("customer_count"),
            out2(F.coalesce(F.col("_bal"), F.lit(0).cast(DEC))).alias("total_acctbal"),
        )
    )


ORACLE_NATION_CUSTOMER_COUNTS = """
SELECT n_nationkey, n_name,
       coalesce(cnt, 0) AS customer_count,
       round(CAST(coalesce(bal, CAST(0 AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_acctbal
FROM nation
LEFT JOIN (
  SELECT c_nationkey, count(*) AS cnt, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
  FROM customer GROUP BY c_nationkey
) ON n_nationkey = c_nationkey
"""


# ---------------------------------------------------------------------------
# A7: correlated scalar subquery — GL total inside the select list
# (sap_semantic_model.json:7868). Catalyst decorrelates this into an
# aggregate + join; expressed in SQL because that's the reference's form.


def q_above_nation_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose account balance exceeds their nation's average (correlated scalar subquery shape)."""
    v = _tmp_view(table(spark, sf_dir, "customer"), "sap_rel_customer")
    return spark.sql(
        f"""
        SELECT c_custkey, c_name, c_nationkey
        FROM {v} c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal)
                           FROM {v} c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


ORACLE_ABOVE_NATION_AVG = """
SELECT c_custkey, c_name, c_nationkey
FROM customer c
WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
"""


# ---------------------------------------------------------------------------
# W1: window functions — absent from the reference (zero OVER( in all 58
# templates; ranking done via ORDER BY+LIMIT), provided as the idiomatic
# Spark upgrade: top-K *per group* needs a window, not a global LIMIT.


def q_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N orders per market segment via ranked window."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("rank_in_segment", F.row_number().over(w))
        .filter(F.col("rank_in_segment") <= 3)
        .select(
            "c_mktsegment",
            "rank_in_segment",
            "o_orderkey",
            out2(money("o_totalprice")).alias("order_value"),
        )
    )


ORACLE_TOP_PER_SEGMENT = """
SELECT c_mktsegment, rank_in_segment, o_orderkey, order_value
FROM (
  SELECT c_mktsegment,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_segment,
         o_orderkey,
         round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS order_value
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rank_in_segment <= 3
"""


# ---------------------------------------------------------------------------
# §2.6 scalar/date function surface: EXTRACT, ADD_DAYS/ADD_MONTHS, DATEDIFF,
# TRUNC — the dialect-translation layer's function inventory
# (reference sap_sql_engine.py:1093-1157,:1182-1195), evaluated natively.


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function surface: datediff/add_months/trunc over order dates."""
    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    iso = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731 — ISO strings
    # compare engine-neutrally (reference stores dates as ISO strings anyway,
    # FIXTURES.md "Dates" convention)
    return (
        orders.filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            iso(d).alias("order_date"),
            F.year(d).alias("order_year"),
            F.month(d).alias("order_month"),
            F.quarter(d).alias("order_quarter"),
            iso(F.date_add(d, 30)).alias("due_date"),
            iso(F.add_months(d, 3)).alias("quarter_later"),
            iso(F.trunc(d, "MM")).alias("month_start"),
            F.datediff(F.lit(_AGING_REF_DATE).cast("date"), d).alias("age_days"),
        )
    )


ORACLE_DATE_FUNCTIONS = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter,
       strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS due_date,
       strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS quarter_later,
       strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS age_days
FROM orders
WHERE o_orderkey <= 1000
"""


# ---------------------------------------------------------------------------
# P2 + §2.6 strings: UPPER/LIKE/SUBSTR/CONCAT/LPAD — fuzzy-match guideline
# UPPER(NAME1) LIKE '%X%' (sap_semantic_model.json:8008) and the NUMC
# zero-padding convention (LPAD, reference build_sap_test_db.py:50-68).


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: substring/upper/trim/concat/LIKE over customer data."""
    part = table(spark, sf_dir, "part")
    return (
        part.filter(F.upper(F.col("p_name")).like("%BOLT%"))
        .select(
            "p_partkey",
            F.upper(F.col("p_name")).alias("name_upper"),
            F.substring(F.col("p_name"), 1, 10).alias("name_prefix"),
            F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
            F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("numc_key"),
            F.length(F.col("p_name")).alias("name_len"),
        )
    )


ORACLE_STRING_FUNCTIONS = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substr(p_name, 1, 10) AS name_prefix,
       p_brand || '/' || p_type AS brand_type,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS numc_key,
       CAST(length(p_name) AS INT) AS name_len
FROM part
WHERE upper(p_name) LIKE '%BOLT%'
"""


# ---------------------------------------------------------------------------
# A3 manual pivot: SUM(CASE WHEN …) per category — actual-vs-plan pivot
# (sap_semantic_model.json:7537: WRTTP '04' actual vs '01' plan).


def q_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot via conditional aggregation per order status."""
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")

    def status_sum(s: str) -> F.Column:
        return out2(
            F.sum(F.when(F.col("o_orderstatus") == s, money("o_totalprice")).otherwise(F.lit(0).cast(DEC)))
        )

    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            status_sum("O").alias("open_value"),
            status_sum("F").alias("fulfilled_value"),
            status_sum("P").alias("partial_value"),
        )
    )


ORACLE_STATUS_PIVOT = """
SELECT n_name,
       round(CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS open_value,
       round(CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS fulfilled_value,
       round(CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS partial_value
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# A9: STDDEV/VARIANCE — the reference *strips* these because SQLite lacks
# them (sap_sql_engine.py:1160-1162); Spark has them natively. Computed from
# exact integer sums so the result is bit-deterministic vs any oracle.


def q_quantity_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev from exact integer sums.

    Bit-stability contract (the driver hashes full-precision values): the
    sums n/s/ss are exact BIGINTs, the variance numerator ``n*ss - s*s``
    and denominator ``n*(n-1)`` are exact BIGINTs (< 2^53 at test scales,
    so the casts to double are exact), and every subsequent op — IEEE
    division, sqrt, multiply by 1e4, floor, divide by 1e4 — is
    correctly-rounded and therefore bit-identical across engines. `round`
    is deliberately avoided: Spark (BigDecimal HALF_UP) and DuckDB
    (scaled-multiply) disagree at the last ulp.

    Scale headroom: the per-group sums s/ss are BIGINT-safe essentially
    forever, but the PRODUCTS n*ss and s*s grow as ~2500*n^2 and wrap
    BIGINT past ~sf1000 (non-ANSI Spark wraps silently; DuckDB promotes to
    HUGEINT — a silent cross-engine divergence). Both products therefore
    compute in DECIMAL — operands cast to DECIMAL(19,0) so the product is
    an exact DECIMAL(38,0) on BOTH engines (DuckDB's decimal multiply
    requires operand widths to sum <= 38) — same recipe as
    ``q_quantity_price_corr``. Good to ~10^16 rows per group.
    """
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s"),
        F.sum(q * q).alias("ss"),
    )
    d19 = "decimal(19,0)"
    n19, s19, ss19 = (F.col(c).cast(d19) for c in ("n", "s", "ss"))
    num = (n19 * ss19 - s19 * s19).cast("double")
    den = (n19 * (n19 - F.lit(1))).cast("double")
    var = num / den

    def trunc4(c):
        return F.floor(c * F.lit(10000.0)) / F.lit(10000.0)

    return agg.select(
        "l_returnflag",
        F.col("n").alias("line_count"),
        trunc4(var).alias("qty_variance"),
        trunc4(F.sqrt(var)).alias("qty_stddev"),
    )


ORACLE_DISPERSION = """
SELECT l_returnflag,
       n AS line_count,
       floor((CAST(n19*ss19 - s19*s19 AS DOUBLE) / CAST(n19*(n19-1) AS DOUBLE)) * 10000) / 10000 AS qty_variance,
       floor(sqrt(CAST(n19*ss19 - s19*s19 AS DOUBLE) / CAST(n19*(n19-1) AS DOUBLE)) * 10000) / 10000 AS qty_stddev
FROM (
  SELECT l_returnflag,
         n,
         CAST(n AS DECIMAL(19,0)) AS n19,
         CAST(s AS DECIMAL(19,0)) AS s19,
         CAST(ss AS DECIMAL(19,0)) AS ss19
  FROM (
    SELECT l_returnflag,
           count(*) AS n,
           sum(CAST(l_quantity AS BIGINT)) AS s,
           sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS ss
    FROM lineitem GROUP BY l_returnflag
  )
)
"""


# ---------------------------------------------------------------------------
# A9-adjacent: exact linear-interpolation percentiles (percentile_cont
# semantics — identical interpolation a + (b-a)*frac at rank (n-1)*q in
# Spark's `percentile` and DuckDB's `quantile_cont`). The reference strips
# percentile requests down to MIN/MAX/AVG (SQLite has no percentile);
# kept native here as an upgrade. Exact percentile is a sort-based
# aggregate — at 100 TB swap in `approx_percentile` (t-digest, mergeable,
# one pass) and accept the documented error bound.


def q_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-value percentiles (percentile_disc semantics on both engines)."""
    orders = table(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile(CAST(o_totalprice AS DOUBLE), array(0.25D, 0.5D, 0.75D))"
        ).alias("p")
    )
    return g.select(
        "o_orderpriority",
        F.round(F.element_at(F.col("p"), 1), 2).alias("p25"),
        F.round(F.element_at(F.col("p"), 2), 2).alias("p50"),
        F.round(F.element_at(F.col("p"), 3), 2).alias("p75"),
    ).orderBy("o_orderpriority")


ORACLE_PERCENTILES = """
SELECT o_orderpriority,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25), 2) AS p25,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.50), 2) AS p50,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75), 2) AS p75
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# J9: three-way match with mismatch predicate — EKPO⋈EKBE⋈RSEG quantity
# match (sap_semantic_model.json:7304, guideline :7984): chained equi-joins
# + a value-comparison filter surfacing discrepancies.


def q_three_way_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key three-way quantity match across order/lineitem/part."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .filter(money("l_extendedprice") > money("p_retailprice") * F.lit(45).cast(DEC))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("mismatch_count"),
            out2(F.sum(money("l_extendedprice"))).alias("mismatch_value"),
        )
        .orderBy(F.col("p_brand").asc())
    )


ORACLE_THREE_WAY_MATCH = """
SELECT p_brand,
       count(*) AS mismatch_count,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS mismatch_value
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part   ON l_partkey = p_partkey
WHERE CAST(l_extendedprice AS DECIMAL(18,2)) > CAST(p_retailprice AS DECIMAL(18,2)) * CAST(45 AS DECIMAL(18,2))
GROUP BY p_brand
ORDER BY p_brand ASC
"""


# ---------------------------------------------------------------------------
# J6 + §4.4: NOT IN with a filtered subquery, rewritten NULL-safe as
# LEFT ANTI (reference pipeline stages at sap_semantic_model.json:7774 use
# NOT IN; Spark returns empty on NULL-bearing subqueries, so the engine
# always rewrites — SURVEY §4 item 4).


def q_orders_outside_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN anti-join with the null-safe NOT EXISTS rewrite."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    auto = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    return (
        orders.join(auto, orders.o_custkey == auto.c_custkey, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_NOT_IN_REWRITE = """
SELECT o_orderstatus, count(*) AS order_count
FROM orders
WHERE NOT EXISTS (
  SELECT 1 FROM customer
  WHERE c_mktsegment = 'AUTOMOBILE' AND c_custkey = o_custkey
)
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# D1: DISTINCT projection (30 uses in reference templates, e.g. inside
# pipeline-stage subqueries sap_semantic_model.json:7774).


def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT market segments."""
    cust = table(spark, sf_dir, "customer")
    return cust.select("c_mktsegment", "c_nationkey").distinct()


ORACLE_DISTINCT = """
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
"""


# U2: INTERSECT / EXCEPT (SURVEY §2.5 — SQLite supports them; the reference
# never emits them but its dialect surface admits them). Distinct set
# semantics on both engines; the brand filters reach the parquet scan, and
# each set op is one hash-partitioned shuffle on the compared column.
def q_brand_size_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT over part brand/size combinations (set-operator coverage)."""
    part = table(spark, sf_dir, "part")
    a = part.filter(F.col("p_brand") == "Brand#12").select("p_size")
    b = part.filter(F.col("p_brand") == "Brand#34").select("p_size")
    both = a.intersect(b).withColumn("tag", F.lit("both"))
    only = a.subtract(b).withColumn("tag", F.lit("brand12_only"))
    return both.unionByName(only).select("tag", "p_size").orderBy("tag", "p_size")


ORACLE_SETOPS = """
SELECT 'both' AS tag, p_size
FROM (SELECT p_size FROM part WHERE p_brand = 'Brand#12'
      INTERSECT
      SELECT p_size FROM part WHERE p_brand = 'Brand#34')
UNION ALL
SELECT 'brand12_only' AS tag, p_size
FROM (SELECT p_size FROM part WHERE p_brand = 'Brand#12'
      EXCEPT
      SELECT p_size FROM part WHERE p_brand = 'Brand#34')
ORDER BY tag, p_size
"""


# ---------------------------------------------------------------------------
# U2-upgrade: ROLLUP — absent in the reference (SQLite lacks it; SURVEY
# §2.4 "free in Spark"); subtotal rows carry NULL group keys in both engines.


def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals over region/nation revenue."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    cust = table(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            out2(F.sum(money("c_acctbal"))).alias("total_balance"),
        )
    )


ORACLE_ROLLUP = """
SELECT r_name, n_name,
       count(*) AS customer_count,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


# GROUPING SETS with grouping() disambiguation markers — generalizes the
# ROLLUP above (SQLite lacks all of these; kept native as an upgrade, same
# single-pass Expand+partial/final-aggregate plan shape as ROLLUP/CUBE).
# grouping(col) distinguishes a NULL group key from a subtotal row.

_GROUPING_SETS_SQL = """
SELECT r_name, c_mktsegment,
       CAST(grouping(r_name) AS INT) AS g_region,
       CAST(grouping(c_mktsegment) AS INT) AS g_segment,
       count(*) AS customer_count,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_balance
FROM {c} JOIN {n} ON c_nationkey = n_nationkey
         JOIN {r} ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (c_mktsegment), (r_name, c_mktsegment), ())
"""


def q_grouping_sets_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS aggregation with grouping-id disambiguation."""
    views = {
        t[0]: _tmp_view(table(spark, sf_dir, t), f"gs_{t}")
        for t in ("customer", "nation", "region")
    }
    return spark.sql(_GROUPING_SETS_SQL.format(c=views["c"], n=views["n"], r=views["r"]))


ORACLE_GROUPING_SETS = _GROUPING_SETS_SQL.format(c="customer", n="nation", r="region")


# ---------------------------------------------------------------------------
# J4: join with constant predicate in the ON clause — HRP1000 triple join
# ON pos.OTYPE='S' AND … AND pos.LANGU='E' (sap_semantic_model.json:7374).


def q_join_constant_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join with a compound ON clause that embeds a constant predicate."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    cond = (
        (orders.o_custkey == cust.c_custkey)
        & (cust.c_mktsegment == F.lit("BUILDING"))
    )
    return (
        orders.join(F.broadcast(cust), cond, "left")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.count(F.col("c_custkey")).alias("building_matches"),
        )
    )


ORACLE_JOIN_CONSTANT = """
SELECT o_orderstatus,
       count(*) AS order_count,
       count(c_custkey) AS building_matches
FROM orders
LEFT JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# W1: window functions. The reference has zero OVER() clauses (SURVEY §2.5 —
# ranking is done via ORDER BY + LIMIT), but running balances and
# period-over-period deltas are the first things a GL analyst asks for, so
# the rebuild carries them as first-class operators. Running total mirrors
# the "cumulative account balance" shape over BKPF/BSEG; the lag query is
# month-over-month revenue delta.


def q_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total — cumulative window with a unique
    tiebreaker (o_orderkey) so the frame is deterministic. One shuffle on
    the partition key; the window never leaves the partition."""
    od = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1995-03-31")
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return od.select(
        "o_custkey",
        F.col("o_orderdate").cast("string").alias("order_date"),
        "o_orderkey",
        out2(F.sum(money("o_totalprice")).over(w)).alias("running_total"),
    )


ORACLE_RUNNING_BALANCE = """
SELECT o_custkey,
       CAST(o_orderdate AS VARCHAR) AS order_date,
       o_orderkey,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS running_total
FROM orders
WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
"""


def q_revenue_mom_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue delta: aggregate to one row per month, then
    lag over the (tiny) series — the window input is post-aggregation, so
    the sort cost is negligible at any scale."""
    od = table(spark, sf_dir, "orders")
    monthly = (
        od.filter(F.col("o_orderdate").between("1996-01-01", "1996-12-31"))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.sum(money("o_totalprice")).alias("rev"))
    )
    w = W.orderBy("month")
    return monthly.select(
        "month",
        out2(F.col("rev")).alias("revenue"),
        out2(F.col("rev") - F.lag("rev").over(w)).alias("mom_delta"),
    ).orderBy("month")


ORACLE_REVENUE_MOM = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
  GROUP BY 1
)
SELECT month,
       round(CAST(rev AS DOUBLE), 2) AS revenue,
       round(CAST(rev - lag(rev) OVER (ORDER BY month) AS DOUBLE), 2) AS mom_delta
FROM monthly
ORDER BY month
"""


# ---------------------------------------------------------------------------
# Recursive CTE (SURVEY §4 item 5). The reference's guideline catalog
# advertises WITH RECURSIVE for cost-center hierarchies
# (sap_semantic_model.json:7948) but ships no template using it. Spark 4
# supports recursive CTEs natively (``_RECURSIVE_SQL`` runs verbatim via
# ``spark.sql`` — covered by tests), but executing a *linear* recursion
# literally costs one self-join per level: 7 sequential shuffle joins over
# the full fact table here, and at 100 TB each one rescans/reshuffles
# petabyte-scale intermediates.
#
# A linear chain recursion whose step joins on a monotone counter
# (depth -> depth+1) folds instead: per (order, line) aggregate the row
# count c and quantity sum s, keep the contiguous line prefix 1..k, then
# the recurrence  P_n = P_{n-1}*c_n  (paths),  T_n = T_{n-1}*c_n + s_n*P_{n-1}
# (sum of path-cumulative quantities) reproduces the recursion EXACTLY —
# including the path fan-out on duplicate (order, line) pairs — in a single
# aggregation pass + a per-order fold over <= 7 elements. Two narrow
# shuffles total, no iteration, exact decimal math. The DuckDB oracle
# still runs the literal WITH RECURSIVE, so the equivalence is
# hash-verified on every run.

_RECURSIVE_SQL = """
WITH RECURSIVE chain AS (
  SELECT l_orderkey AS okey, l_linenumber AS depth,
         CAST(l_quantity AS DECIMAL(18,2)) AS cum_qty
  FROM {src} WHERE l_linenumber = 1
  UNION ALL
  SELECT l.l_orderkey, l.l_linenumber,
         CAST(c.cum_qty + CAST(l.l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,2))
  FROM {src} l
  JOIN chain c ON l.l_orderkey = c.okey AND l.l_linenumber = c.depth + 1
)
SELECT depth,
       COUNT(*) AS n_orders,
       round(CAST(SUM(cum_qty) AS DOUBLE), 2) AS sum_cum_qty
FROM chain
GROUP BY depth
ORDER BY depth
"""

_RECURSIVE_FOLD_SQL = """
WITH per_line AS (
  -- clustering the scan on l_orderkey alone satisfies the
  -- ClusteredDistribution of BOTH this (orderkey, line) aggregate and the
  -- per-order collect_list below (subset rule): ONE full-volume exchange
  -- feeds the whole fold instead of two
  SELECT l_orderkey, l_linenumber AS line, COUNT(*) AS c,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s
  FROM (SELECT /*+ REPARTITION(l_orderkey) */ l_orderkey, l_linenumber, l_quantity FROM {src})
  GROUP BY 1, 2
),
per_order AS (
  SELECT l_orderkey, array_sort(collect_list(struct(line, c, s))) AS ls
  FROM per_line GROUP BY l_orderkey
),
folded AS (
  SELECT aggregate(
    -- for sorted distinct positive ints, (x.line = i + 1) keeps exactly
    -- the contiguous prefix 1..k the recursion can reach
    filter(ls, (x, i) -> x.line = i + 1),
    struct(CAST(1 AS BIGINT) AS P, CAST(0 AS DECIMAL(38,2)) AS T,
           CAST(array() AS ARRAY<STRUCT<depth INT, P BIGINT, T DECIMAL(38,2)>>) AS rows),
    (acc, x) -> struct(
      acc.P * x.c AS P,
      CAST(acc.T * x.c + x.s * acc.P AS DECIMAL(38,2)) AS T,
      acc.rows || array(struct(CAST(x.line AS INT) AS depth,
                               acc.P * x.c AS P,
                               CAST(acc.T * x.c + x.s * acc.P AS DECIMAL(38,2)) AS T)) AS rows),
    acc -> acc.rows) AS rows
  FROM per_order
)
SELECT r.depth,
       SUM(r.P) AS n_orders,
       round(CAST(SUM(r.T) AS DOUBLE), 2) AS sum_cum_qty
FROM folded LATERAL VIEW explode(rows) AS r
GROUP BY r.depth
ORDER BY r.depth
"""


def q_recursive_line_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear recursive CTE collapsed to one aggregation pass, hash-matched vs WITH RECURSIVE."""
    v = _tmp_view(table(spark, sf_dir, "lineitem"), "lineitem_chain_src")
    return spark.sql(_RECURSIVE_FOLD_SQL.format(src=v))


def q_recursive_line_chain_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The literal ``WITH RECURSIVE`` executed by Spark 4's native
    recursion — the SQL-surface twin of :func:`q_recursive_line_chain`'s
    algebraic fold (SURVEY §4.5). Registered as its own gated query so the
    driver hashes Spark's native recursive-CTE execution against the same
    DuckDB recursion the fold is checked against; the fold remains the
    scale path (the native plan is one sequential self-join per recursion
    level). Equality fold==native is additionally asserted in
    ``test_recursive_fold_matches_native_recursion``."""
    v = _tmp_view(table(spark, sf_dir, "lineitem"), "lineitem_chain_native_src")
    return spark.sql(_RECURSIVE_SQL.format(src=v))


ORACLE_RECURSIVE = _RECURSIVE_SQL.format(src="lineitem")  # identical statement


# ---------------------------------------------------------------------------
# multiset set operations — EXCEPT ALL / INTERSECT ALL keep duplicates
# (U2's set-semantics forms are in q_brand_size_setops above); same
# hash-partition-both-sides shape, bag semantics via per-row counting.


def q_size_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL bag semantics over part sizes."""
    part = table(spark, sf_dir, "part")
    a = part.filter(F.col("p_size") < 25).select("p_brand")
    b = part.filter(F.col("p_type").contains("BRASS")).select("p_brand")
    return a.exceptAll(b).withColumn("tag", F.lit("except_all")).unionByName(
        a.intersectAll(b).withColumn("tag", F.lit("intersect_all"))
    )


ORACLE_MULTISET_OPS = """
SELECT p_brand, 'except_all' AS tag FROM (
  SELECT p_brand FROM part WHERE p_size < 25
  EXCEPT ALL
  SELECT p_brand FROM part WHERE p_type LIKE '%BRASS%'
)
UNION ALL
SELECT p_brand, 'intersect_all' AS tag FROM (
  SELECT p_brand FROM part WHERE p_size < 25
  INTERSECT ALL
  SELECT p_brand FROM part WHERE p_type LIKE '%BRASS%'
)
"""


# ---------------------------------------------------------------------------
# exact Pearson correlation — the bit-stable recipe from
# q_quantity_dispersion extended with DECIMAL(38,0) headroom (the ADVICE
# scale-bound fix): all five sufficient statistics are EXACT integer/decimal
# sums (order-independent on any partitioning), and the final r is one
# double expression over them, identical on both engines. The built-in
# corr() is deliberately avoided: its streaming accumulation is
# float-order-dependent and can differ across engines/partitionings.


def q_quantity_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation via DECIMAL(38,0) sufficient statistics."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    # cents EXACTLY: multiply in decimal first (scale stays 2, value x.00),
    # then the decimal(38,0) cast drops a zero fraction — no rounding ever
    yc = (F.col("l_extendedprice").cast(DEC) * 100).cast("decimal(38,0)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(yc * yc).alias("syy"),
        F.sum(yc * x).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    return agg.select(
        "l_returnflag",
        F.col("n").alias("n_lines"),
        F.round(num / den, 6).alias("qty_price_corr"),
    )


ORACLE_QTY_PRICE_CORR = """
WITH stats AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(l_quantity AS BIGINT)) AS sx,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS sy,
         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))
             * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS syy,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))
             * CAST(l_quantity AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       n AS n_lines,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS qty_price_corr
FROM stats
"""


# ---------------------------------------------------------------------------
# CUBE (all 2^n grouping combinations), native pivot, and unpivot/stack —
# the reshape trio rounding out the GROUP BY family (ROLLUP and GROUPING
# SETS above). Same physical shape as any grouped aggregate: Spark expands
# the grouping sets map-side, one exchange on the grouping columns.


def q_cube_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation over return flag x line status."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            out2(F.sum(money("l_quantity"))).alias("total_qty"),
        )
    )


ORACLE_CUBE = """
SELECT l_returnflag, l_linestatus,
       count(*) AS line_count,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def q_pivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``pivot()`` (vs the manual CASE pivot in q_status_pivot):
    explicit value list so the plan needs no distinct-values pre-pass —
    the form to use at scale, where an implicit pivot first scans the
    column for its domain."""
    orders = table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


ORACLE_PIVOT = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
FROM orders
GROUP BY o_orderpriority
"""


def q_unpivot_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long via ``stack()`` — zero extra shuffles: the unpivot is a
    per-row Generate over the already-aggregated wide relation."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        out2(F.sum(money("l_quantity"))).alias("sum_qty"),
        out2(F.sum(money("l_extendedprice"))).alias("sum_price"),
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            "stack(2, 'sum_qty', sum_qty, 'sum_price', sum_price) AS (measure, value)"
        ),
    )


ORACLE_UNPIVOT = """
WITH wide AS (
  SELECT l_returnflag,
         round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
         round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM wide
"""


# ---------------------------------------------------------------------------
# bucketed range join: shipments into promotion windows
#
# Spark has no native range-join optimization, so a raw interval predicate
# between two large relations plans as a BroadcastNestedLoopJoin (or worse,
# a cartesian) — the classic scale-killer. The standard fix is BUCKETING:
# assign both sides a coarse bucket such that every window lies within one
# bucket (here: windows are 10 days inside a calendar month, bucket =
# month), equi-join on the bucket, and apply the interval predicate as a
# cheap residual filter. The join is then an ordinary shuffled/broadcast
# hash join that AQE can size. Windows spanning buckets generalize by
# exploding the window into one row per covered bucket.


def q_ship_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped inside each 1995 promo window (first 10 days of each
    order month). Windows derive from `orders` (distinct months, a few dozen
    rows — broadcast); lineitem joins on the month bucket with the BETWEEN
    as residual, so the plan is a broadcast hash join, not a BNLJ."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    w = (
        orders.filter(F.year("o_orderdate") == 1995)
        .select(F.date_trunc("month", F.col("o_orderdate")).alias("w_start"))
        .distinct()
        .withColumn("w_end", F.expr("w_start + INTERVAL 9 DAYS"))
    )
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    bucketed = li.withColumn("bucket", F.date_trunc("month", F.col("l_shipdate")))
    return (
        bucketed.join(
            F.broadcast(w),
            (F.col("bucket") == F.col("w_start"))
            & F.col("l_shipdate").between(F.col("w_start"), F.col("w_end")),
        )
        .groupBy("w_start")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            out2(F.sum(money("l_extendedprice") * disc)).alias("revenue"),
        )
        .select(
            F.date_format("w_start", "yyyy-MM-dd").alias("window_start"),
            "n_lines",
            "revenue",
        )
    )


ORACLE_SHIP_PROMO = """
WITH w AS (
  SELECT DISTINCT date_trunc('month', o_orderdate) AS w_start,
         date_trunc('month', o_orderdate) + INTERVAL 9 DAY AS w_end
  FROM orders WHERE year(o_orderdate) = 1995
)
SELECT strftime(w_start, '%Y-%m-%d') AS window_start,
       count(*) AS n_lines,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN w ON date_trunc('month', l_shipdate) = w.w_start
      AND l_shipdate BETWEEN w.w_start AND w.w_end
GROUP BY w.w_start
"""


# ---------------------------------------------------------------------------
# market-basket pair mining (frequent co-occurring parts within orders)

BASKET_MIN_SUPPORT = 2


def q_parts_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs across order baskets with support and lift —
    the pairwise core of frequent-itemset mining (the A-Priori L2 step),
    run directly as a self-join because TPC-H baskets are tiny.

    Scale shape: the within-basket self-join is keyed on the order (an
    equi-join, never cartesian) and its output is bounded by
    sum(basket_size^2)/2 — with baskets <= 7 items that is < 21 rows per
    order, linear in orders. The (p1, p2) support aggregation is the one
    vocabulary-scale shuffle; per-part order counts broadcast back for
    the lift denominator. For web-scale baskets (thousands of items) the
    same plan gets an A-Priori frequent-singleton prefilter before the
    self-join — a broadcast semi-join, same skeleton as the df-cap in
    ``jaccard_pairs``."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.select("l_orderkey").distinct().count()
    part_counts = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= BASKET_MIN_SUPPORT)
    )
    c1 = part_counts.select(F.col("l_partkey").alias("p1"), F.col("cnt").alias("c1"))
    c2 = part_counts.select(F.col("l_partkey").alias("p2"), F.col("cnt").alias("c2"))
    lift = (F.col("support") * F.lit(n_orders)) / (F.col("c1") * F.col("c2"))
    return (
        pairs.join(F.broadcast(c1), "p1")
        .join(F.broadcast(c2), "p2")
        .select("p1", "p2", "support", F.round(lift, 4).alias("lift"))
    )


ORACLE_PARTS_COPURCHASE = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
pc AS (SELECT l_partkey, count(*) AS cnt FROM items GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS support
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {BASKET_MIN_SUPPORT}
)
SELECT p1, p2, support,
       round(support * 1.0 * (SELECT n_orders FROM n) / (c1.cnt * c2.cnt), 4) AS lift
FROM pairs
JOIN pc c1 ON c1.l_partkey = p1
JOIN pc c2 ON c2.l_partkey = p2
"""


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quartiles)


def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer with orders scored 1-4 on
    Recency (last order date), Frequency (order count), and Monetary
    (total spend), grouped into the 64 R-F-M segment codes with size and
    average spend — the classic marketing segmentation, done
    deterministically.

    Quartile assignment is integer arithmetic over global ranks
    (``(rank-1)*4 DIV n + 1`` with ``with_global_rank`` — NOT ntile,
    whose remainder distribution differs between engines, and no global
    window). Ranks ascend, so quartile 4 = most recent / most frequent /
    highest spend; ties break by custkey on both engines. Average spend
    floors to the cent in integer math (the ``customer_cohort_ltv``
    lesson: double division + round() diverges at half-cent boundaries).

    Scale shape: one customer-keyed aggregation over orders, then three
    range exchanges over the customer-level relation (orders of
    magnitude smaller than the fact table), one 64-group regroup."""
    from .ranks import with_global_rank

    orders = table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))).alias("last_day"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("spend"),
    )
    n = per_cust.count()

    def quartile(df, order_col, out_col):
        ranked = with_global_rank(df, order_col, "o_custkey", rank_col="__r")
        return ranked.withColumn(
            out_col, F.expr(f"(__r - 1) * 4 DIV {n} + 1").cast("int")
        ).drop("__r")

    scored = quartile(per_cust, "last_day", "r_score")
    scored = quartile(scored, "n_orders", "f_score")
    scored = quartile(scored, "spend", "m_score")
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("spend").alias("seg_spend"),
        )
        .select(
            F.concat_ws("-", "r_score", "f_score", "m_score").alias("segment"),
            "r_score",
            "f_score",
            "m_score",
            "n_customers",
            (
                F.floor((F.col("seg_spend") * 100).cast("bigint") / F.col("n_customers"))
                .cast("bigint")
                / F.lit(100.0)
            ).alias("avg_spend"),
        )
    )


ORACLE_CUSTOMER_RFM = """
WITH per_cust AS (
  SELECT o_custkey,
         max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS last_day,
         count(*) AS n_orders,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY o_custkey
),
n AS (SELECT count(*) AS n FROM per_cust),
scored AS (
  SELECT o_custkey, spend,
         CAST((row_number() OVER (ORDER BY last_day, o_custkey) - 1) * 4
              // (SELECT n FROM n) + 1 AS INT) AS r_score,
         CAST((row_number() OVER (ORDER BY n_orders, o_custkey) - 1) * 4
              // (SELECT n FROM n) + 1 AS INT) AS f_score,
         CAST((row_number() OVER (ORDER BY spend, o_custkey) - 1) * 4
              // (SELECT n FROM n) + 1 AS INT) AS m_score
  FROM per_cust
)
SELECT CAST(r_score AS VARCHAR) || '-' || CAST(f_score AS VARCHAR) || '-' || CAST(m_score AS VARCHAR) AS segment,
       r_score, f_score, m_score,
       count(*) AS n_customers,
       CAST(floor(CAST(sum(spend) * 100 AS BIGINT) / count(*)) AS BIGINT) / 100.0 AS avg_spend
FROM scored
GROUP BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# RFM migration: how customers MOVE between monetary quartiles across two
# halves of the history — the segment-transition matrix marketing reads
# next to the static RFM snapshot (who upgraded, who lapsed, who is new).
# Quartile 0 is the absent-from-period sentinel (new in the second half /
# churned after the first).

RFM_MIGRATION_SPLIT = "1995-06-17"  # TPC-H order dates span 1992..1998


def q_customer_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monetary-quartile transition matrix between the pre- and
    post-RFM_MIGRATION_SPLIT halves of the order history: per
    (m_before, m_after) cell, the customer count. Quartiles use the
    customer_rfm_segments recipe ((rank-1)*4 DIV n + 1 over
    with_global_rank — no ntile, no global window); 0 = not active in
    that half.

    Scale shape: ONE conditional aggregation over orders yields both
    halves' spends per customer; each half's quartile is a range
    exchange over the customer-level relation; the matrix is a <=25-row
    regroup."""
    from ..cachereg import cache_eager
    from .ranks import with_global_rank

    orders = table(spark, sf_dir, "orders")
    split = F.lit(RFM_MIGRATION_SPLIT).cast("date")
    od = F.col("o_orderdate").cast("date")
    per_cust = cache_eager(
        orders.groupBy("o_custkey").agg(
            F.sum(
                F.when(od < split, F.col("o_totalprice").cast(DEC))
            ).alias("spend1"),
            F.sum(
                F.when(od >= split, F.col("o_totalprice").cast(DEC))
            ).alias("spend2"),
        )
    )

    def mscore(col: str, out: str) -> DataFrame:
        side = per_cust.filter(F.col(col).isNotNull()).select("o_custkey", col)
        ranked = with_global_rank(
            side, col, "o_custkey", rank_col="__r", total_col="__n"
        )
        return ranked.selectExpr(
            "o_custkey", f"CAST((__r - 1) * 4 DIV __n + 1 AS BIGINT) AS {out}"
        )

    return (
        per_cust.select("o_custkey")
        .join(mscore("spend1", "m_before"), "o_custkey", "left")
        .join(mscore("spend2", "m_after"), "o_custkey", "left")
        .selectExpr(
            "coalesce(m_before, 0) AS m_before",
            "coalesce(m_after, 0) AS m_after",
        )
        .groupBy("m_before", "m_after")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("m_before", "m_after")
    )


ORACLE_CUSTOMER_RFM_MIGRATION = f"""
WITH per_cust AS (
  SELECT o_custkey,
         sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '{RFM_MIGRATION_SPLIT}'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS spend1,
         sum(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '{RFM_MIGRATION_SPLIT}'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS spend2
  FROM orders GROUP BY 1
),
n1 AS (SELECT count(*) AS n FROM per_cust WHERE spend1 IS NOT NULL),
n2 AS (SELECT count(*) AS n FROM per_cust WHERE spend2 IS NOT NULL),
m1 AS (
  SELECT o_custkey,
         CAST((row_number() OVER (ORDER BY spend1, o_custkey) - 1) * 4
              // (SELECT n FROM n1) + 1 AS BIGINT) AS m_before
  FROM per_cust WHERE spend1 IS NOT NULL
),
m2 AS (
  SELECT o_custkey,
         CAST((row_number() OVER (ORDER BY spend2, o_custkey) - 1) * 4
              // (SELECT n FROM n2) + 1 AS BIGINT) AS m_after
  FROM per_cust WHERE spend2 IS NOT NULL
)
SELECT coalesce(m_before, 0) AS m_before,
       coalesce(m_after, 0) AS m_after,
       CAST(count(*) AS BIGINT) AS n_customers
FROM per_cust p
LEFT JOIN m1 USING (o_custkey)
LEFT JOIN m2 USING (o_custkey)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# customer cohort lifetime value (the revenue twin of events retention)


def q_customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV matrix: customers grouped by first-order month, revenue
    accumulated per months-since-first-order offset — cumulative
    lifetime value per cohort in exact decimal, divided per customer
    only at the output boundary. The finance-side twin of
    ``events_retention_cohorts`` (which counts activity; this sums
    money).

    Month arithmetic is an integer key (year*12 + month - 1) on both
    engines — no calendar-function drift. Scale shape: first-order is
    one customer-keyed aggregation; the (customer -> cohort) relation
    broadcasts back onto orders (customer-count-sized); the matrix is a
    (cohort, offset) regroup; the cumulative sum is a window over the
    tiny aggregated matrix, DECIMAL-exact (associativity is not enough
    for money — the window is ordered, so it is deterministic too)."""
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("mk"),
        F.col("o_totalprice").cast(DEC).alias("price"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("mk").alias("cm"))
    sizes = first.groupBy("cm").agg(F.count(F.lit(1)).alias("n_customers"))
    mat = (
        orders.join(F.broadcast(first), "o_custkey")
        .groupBy("cm", (F.col("mk") - F.col("cm")).alias("month_offset"))
        .agg(F.sum("price").alias("rev"))
    )
    w = W.partitionBy("cm").orderBy("month_offset")
    cum = F.sum("rev").over(w)
    cohort_month = F.format_string("%04d-%02d", F.expr("cm DIV 12"), F.col("cm") % 12 + 1)
    return (
        mat.join(F.broadcast(sizes), "cm")
        .select(
            cohort_month.alias("cohort_month"),
            "month_offset",
            "n_customers",
            out2(F.col("rev")).alias("revenue"),
            out2(cum).alias("cum_revenue"),
            # per-customer division floors to the CENT in integer math —
            # double division + round() disagrees between engines exactly
            # at half-cent boundaries (observed at sf0.01)
            (
                F.floor(
                    (cum * 100).cast("bigint") / F.col("n_customers")
                ).cast("bigint")
                / F.lit(100.0)
            ).alias("ltv_per_customer"),
        )
    )


ORACLE_CUSTOMER_COHORT_LTV = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mk,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
first AS (SELECT o_custkey, min(mk) AS cm FROM o GROUP BY 1),
sizes AS (SELECT cm, count(*) AS n_customers FROM first GROUP BY 1),
mat AS (
  SELECT f.cm, o.mk - f.cm AS month_offset, sum(price) AS rev
  FROM o JOIN first f USING (o_custkey)
  GROUP BY 1, 2
),
cum AS (
  SELECT cm, month_offset, rev,
         sum(rev) OVER (PARTITION BY cm ORDER BY month_offset) AS cum_rev
  FROM mat
)
SELECT printf('%04d-%02d', cm // 12, cm % 12 + 1) AS cohort_month,
       CAST(month_offset AS BIGINT) AS month_offset,
       n_customers,
       round(CAST(rev AS DOUBLE), 2) AS revenue,
       round(CAST(cum_rev AS DOUBLE), 2) AS cum_revenue,
       CAST(floor(CAST(cum_rev * 100 AS BIGINT) / n_customers) AS BIGINT) / 100.0 AS ltv_per_customer
FROM cum JOIN sizes USING (cm)
"""


# ---------------------------------------------------------------------------
# declarative data-quality constraint suite (the Deequ/dbt-test shape)


def q_dq_orders_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraints over ``orders`` evaluated in
    ONE pass where possible — the Deequ/dbt-test shape: each check is a
    named predicate whose violation count and pass flag come back as a
    row, so a pipeline gates ingestion on ``WHERE passed = 0``.

    Checks: primary-key uniqueness, FK integrity to ``customer`` (the
    only check needing a second relation — an anti-join on the broadcast
    dim), non-negative totals, date-domain bounds, enum membership, and
    null rates. Scale shape: the row-level checks fold into a single
    aggregation over one scan (each violation count is a conditional
    sum); uniqueness is one groupBy on the key; FK is one broadcast
    anti-join. No check rescans the table row-by-row."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey")

    row_checks = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("o_totalprice") <= 0).cast("bigint")).alias("nonpos_total"),
        F.sum(
            (
                ~F.col("o_orderdate").cast("date").between("1992-01-01", "1998-12-31")
            ).cast("bigint")
        ).alias("date_out_of_domain"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("bigint")
        ).alias("bad_status_enum"),
        F.sum(F.col("o_custkey").isNull().cast("bigint")).alias("null_custkey"),
    )
    dup_keys = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("v"))
    )
    orphans = (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left_anti"
        ).agg(F.count(F.lit(1)).alias("v"))
    )

    def row(name: str, src: DataFrame, col: str) -> DataFrame:
        return src.select(
            F.lit(name).alias("check"),
            F.col(col).cast("bigint").alias("violations"),
            (F.col(col) == 0).cast("int").alias("passed"),
        )

    # the four row-level counts unpivot from the ONE single-pass aggregate
    # row (stack, not four union legs re-running the scan)
    row_stacked = row_checks.select(
        F.expr(
            "stack(4, "
            "'totalprice_positive', nonpos_total, "
            "'orderdate_in_domain', date_out_of_domain, "
            "'orderstatus_enum', bad_status_enum, "
            "'custkey_not_null', null_custkey) AS (check, v)"
        )
    ).select(
        "check",
        F.col("v").cast("bigint").alias("violations"),
        (F.col("v") == 0).cast("int").alias("passed"),
    )
    return (
        row("orderkey_unique", dup_keys, "v")
        .unionByName(row("custkey_fk_integrity", orphans, "v"))
        .unionByName(row_stacked)
    )


ORACLE_DQ_ORDERS = """
WITH dup AS (
  SELECT COALESCE(sum(c), 0) AS v FROM (
    SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1
  )
),
orphan AS (
  SELECT count(*) AS v FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
),
rowc AS (
  SELECT
    sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpos_total,
    sum(CASE WHEN CAST(o_orderdate AS DATE) NOT BETWEEN DATE '1992-01-01' AND DATE '1998-12-31' THEN 1 ELSE 0 END) AS date_out_of_domain,
    sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS bad_status_enum,
    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_custkey
  FROM orders
)
SELECT "check", CAST(violations AS BIGINT) AS violations,
       CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
FROM (
  SELECT 'orderkey_unique' AS "check", (SELECT v FROM dup) AS violations
  UNION ALL SELECT 'custkey_fk_integrity', (SELECT v FROM orphan)
  UNION ALL SELECT 'totalprice_positive', (SELECT nonpos_total FROM rowc)
  UNION ALL SELECT 'orderdate_in_domain', (SELECT date_out_of_domain FROM rowc)
  UNION ALL SELECT 'orderstatus_enum', (SELECT bad_status_enum FROM rowc)
  UNION ALL SELECT 'custkey_not_null', (SELECT null_custkey FROM rowc)
)
"""


# ---------------------------------------------------------------------------
# registry

# ---------------------------------------------------------------------------
# TPC-H Q20/Q21 shapes — the two hardest decorrelation patterns in the
# benchmark, completing the Q7/Q8/Q18/Q22 series. The reference's template
# surface stops at single-level EXISTS (sap_semantic_model.json templates);
# these extend it the way its own SQL guidelines describe nested subqueries.

PP_PREFIX = "large"  # Q20's p_name LIKE prefix
PP_YEAR = 1997  # Q20's one-year availability window


def q_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers concentrated on promo parts — the
    nested semi-join chain (supplier ⋉ pairs ⋉ part-filter) whose inner
    predicate is a CORRELATED aggregate threshold (Q20's
    ``ps_availqty > 0.5 * sum(l_quantity WHERE same part+supp)``,
    adapted to this schema: a (supplier, part) pair qualifies when its
    {year} shipped quantity exceeds half its all-time shipped quantity).

    Decorrelation: the correlated scalar subquery collapses into ONE
    map-side-combined aggregation computing the window sum and the
    all-time sum together as conditional aggregates — one lineitem pass,
    no per-row subquery. The part name filter broadcasts (dim-sized),
    qualifying pairs regroup to supplier grain, and the supplier dim
    broadcasts onto the (tiny) qualifying set. Both quantity sums stay
    DECIMAL-exact so the 2x threshold compare cannot drift; counts are
    BIGINT on both engines (FLOATS.md classes A and D).

    Scale shape: filter-pushed part scan → broadcast semi-join →
    one (suppkey, partkey) shuffle → supplier-grain regroup. No
    correlated execution, no cartesian expansion."""
    parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(PP_PREFIX))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    in_window = F.year("l_shipdate") == PP_YEAR
    pairs = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(in_window, money("l_quantity")).otherwise(
                    F.lit(0).cast(DEC)
                )
            ).alias("promo_qty"),
            F.sum(money("l_quantity")).alias("total_qty"),
        )
        .filter(
            (F.col("promo_qty") * 2 > F.col("total_qty"))
            & (F.col("promo_qty") > 0)
        )
    )
    return (
        pairs.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("qualifying_parts"),
            F.sum("promo_qty").alias("promo_qty_sum"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            "s_name",
            F.col("n_name").alias("supp_nation"),
            "qualifying_parts",
            out2(F.col("promo_qty_sum")).alias("promo_qty"),
        )
        .orderBy("s_name")
    )


ORACLE_PROMO_PART_SUPPLIERS = f"""
SELECT s_name,
       n_name AS supp_nation,
       count(*) AS qualifying_parts,
       round(CAST(sum(pq.promo_qty) AS DOUBLE), 2) AS promo_qty
FROM (
  SELECT l_suppkey, l_partkey,
         sum(CASE WHEN year(l_shipdate) = {PP_YEAR}
                  THEN CAST(l_quantity AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo_qty,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '{PP_PREFIX}%')
  GROUP BY 1, 2
) pq
JOIN supplier ON s_suppkey = pq.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE pq.promo_qty * 2 > pq.total_qty AND pq.promo_qty > 0
GROUP BY s_name, n_name
ORDER BY s_name
"""


def q_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely to blame in multi-supplier
    orders — the double-correlated EXISTS / NOT EXISTS pattern (adapted:
    'late' = a returned line, ``l_returnflag = 'R'``, on a finalized
    order; the schema has no commit/receipt dates). A supplier is
    counted for an order when it shipped a returned line, ANOTHER
    supplier participated (EXISTS), and NO other supplier's line was
    returned (NOT EXISTS).

    Decorrelation: both correlated subqueries collapse into window
    aggregates over the (orderkey, suppkey) pair grain — n_suppliers
    and n_late_suppliers per order — so the plan is one pair-grain
    aggregation (map-side combined) + one orderkey-partitioned window
    + one supplier-grain regroup: two shuffles total, versus the
    re-scan-per-row a literal EXISTS pair would cost. The DuckDB oracle
    keeps the textual EXISTS/NOT-EXISTS form over the same pair CTE,
    pinning that the rewrite IS the subquery semantics.

    numwait counts DISTINCT waiting orders per supplier (pair grain,
    not line grain), BIGINT on both engines."""
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(0)
            ).alias("late")
        )
    )
    w = W.partitionBy("l_orderkey")
    flagged = pairs.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late"),
    ).filter(
        (F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    )
    return (
        flagged.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_name", F.col("n_name").alias("supp_nation"), "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
    )


ORACLE_SUPPLIERS_KEPT_WAITING = """
WITH pairs AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS late
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
)
SELECT s_name, n_name AS supp_nation, count(*) AS numwait
FROM pairs p1
JOIN supplier ON s_suppkey = p1.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p1.late = 1
  AND EXISTS (
    SELECT 1 FROM pairs p2
    WHERE p2.l_orderkey = p1.l_orderkey AND p2.l_suppkey <> p1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM pairs p3
    WHERE p3.l_orderkey = p1.l_orderkey AND p3.l_suppkey <> p1.l_suppkey
      AND p3.late = 1
  )
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
"""


SQ_REV_DIVISOR = 7  # Q17's "average yearly" divisor


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — lines
    whose quantity is below 20% of their part's average order quantity,
    generalized from one brand to a per-brand report.

    Decorrelation: Q17's correlated scalar subquery
    ``l_quantity < 0.2 * (SELECT avg(l_quantity) WHERE same part)``
    becomes ONE per-part aggregation joined back to lineitem; the avg
    compare is cross-multiplied to stay exact —
    ``qty * 5 * cnt < sum_qty`` over DECIMAL/BIGINT (no float avg, no
    rounding at the predicate; FLOATS.md class A), which is algebraically
    identical to qty < 0.2 * sum/cnt since cnt > 0.

    Scale shape: two passes over the pruned 3-column lineitem scan (one
    to build part averages, one to filter) joined on partkey — AQE picks
    shuffle vs broadcast by the part-aggregate's actual size; the brand
    regroup is dim-bounded. The per-part relation is |parts|-sized, far
    smaller than lineitem, exactly Q17's planner-intended shape."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pa = li.groupBy("l_partkey").agg(
        F.sum(money("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    small = (
        li.join(pa.withColumnRenamed("l_partkey", "pa_partkey"),
                F.col("l_partkey") == F.col("pa_partkey"))
        .filter(money("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
    )
    return (
        small.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            F.sum(money("l_extendedprice")).alias("rev"),
        )
        .select(
            "p_brand",
            "n_small_lines",
            # divide in DOUBLE on both engines (one IEEE op on the exact
            # DECIMAL sum) — DECIMAL-division rounding rules differ across
            # engines, the double lane does not
            F.round(F.col("rev").cast("double") / F.lit(float(SQ_REV_DIVISOR)), 2).alias("avg_yearly"),
        )
        .orderBy("p_brand")
    )


ORACLE_SMALL_QUANTITY = f"""
WITH pa AS (
  SELECT l_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         count(*) AS cnt
  FROM lineitem GROUP BY 1
)
SELECT p_brand,
       count(*) AS n_small_lines,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                  / {SQ_REV_DIVISOR}.0, 2) AS avg_yearly
FROM lineitem li
JOIN pa ON li.l_partkey = pa.l_partkey
JOIN part ON li.l_partkey = p_partkey
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
GROUP BY p_brand
ORDER BY p_brand
"""


TS_START = "1998-01-01"  # Q15's 3-month revenue window
TS_END = "1998-04-01"


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a
    quarter — the view-plus-scalar-max pattern
    (``WHERE total_revenue = (SELECT max(total_revenue) FROM view)``).

    Decorrelation: the revenue view is one map-side-combined supplier
    aggregation; the scalar max is a 1-row aggregate broadcast back as
    a cross join (the admissible scalar-attach class in SCALE.md's
    policy) and compared in DECIMAL — exact, so 'ties return all
    suppliers' (Q15's stated semantics) holds bit-for-bit instead of
    hinging on float equality.

    Scale shape: date-pushed lineitem scan → one suppkey shuffle →
    1-row max probe → broadcast supplier dim onto the (usually 1-row)
    winner set."""
    from ..cachereg import cache_eager

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= TS_START) & (F.col("l_shipdate") < TS_END)
    )
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    # the revenue view is supplier-sized; cache it so the scalar-max
    # probe reads the cached relation instead of re-scanning lineitem
    # (2x the heaviest input otherwise)
    rev = cache_eager(
        li.groupBy("l_suppkey")
        .agg(F.sum(money("l_extendedprice") * disc).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            out2(F.col("total_revenue")).alias("total_revenue"),
        )
        .orderBy("suppkey")
    )


ORACLE_TOP_SUPPLIER = f"""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
         AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '{TS_START}' AND l_shipdate < DATE '{TS_END}'
  GROUP BY 1
)
SELECT s_suppkey AS suppkey, s_name,
       round(CAST(total_revenue AS DOUBLE), 2) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY suppkey
"""


CS_TYPE = "PROMO"  # Q2's part filter, adapted to this schema's p_type


def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part of one type, the supplier offering
    it cheapest — the correlated-min subquery
    (``ps_supplycost = (SELECT min(ps_supplycost) WHERE same part)``),
    adapted to this schema (no partsupp): a supplier's offer price for a
    part is its observed average unit sell price, computed as an exact
    integral micro-quotient ``(sum_price_cents * 10000) div
    qty_hundredths`` so the min compare never touches a float
    (FLOATS.md class A).

    Decorrelation: the correlated min collapses into a row_number()
    window over the (part, supplier) offer relation ordered by
    (unit_price_micro, suppkey) — rank 1 IS the min row, with the
    supplier key as total tie-break (Q2 breaks ties too). One
    (part, supplier) aggregation + one part-partitioned window; the
    offer relation is |parts x suppliers|-bounded, dims broadcast."""
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == CS_TYPE)
        .select("p_partkey", "p_name")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    offers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(money("l_extendedprice")).alias("sum_price"),
            F.sum(money("l_quantity")).alias("sum_qty"),
        )
        .select(
            "l_partkey",
            "l_suppkey",
            F.expr(
                "CAST((CAST(sum_price * 100 AS DECIMAL(38,0)) * 1000000) "
                "div CAST(sum_qty * 100 AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("unit_price_micro"),
        )
    )
    rn = F.row_number().over(
        W.partitionBy("l_partkey").orderBy("unit_price_micro", "l_suppkey")
    )
    return (
        offers.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            "p_name",
            "s_name",
            "unit_price_micro",
        )
        .orderBy("partkey")
    )


ORACLE_CHEAPEST_SUPPLIER = f"""
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         CAST((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS HUGEINT) * 1000000)
              // CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS HUGEINT) AS BIGINT)
         AS unit_price_micro
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = '{CS_TYPE}')
  GROUP BY 1, 2
),
ranked AS (
  SELECT l_partkey, l_suppkey, unit_price_micro,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY unit_price_micro, l_suppkey) AS rn
  FROM offers
)
SELECT r.l_partkey AS partkey, p_name, s_name, unit_price_micro
FROM ranked r
JOIN part ON r.l_partkey = p_partkey
JOIN supplier ON r.l_suppkey = s_suppkey
WHERE rn = 1
ORDER BY partkey
"""


def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer INCLUDING
    zero-order customers — the left-join-then-histogram pattern whose
    trap is that an inner join silently drops the zero bucket (the
    largest one in practice).

    Scale shape: one left join customer→orders on the customer key (AQE
    picks the strategy), one per-customer count, one tiny regroup onto
    the count value — the second aggregation's input is |customers|
    rows, its output at most the max order count. Excluding one priority
    class ('1-URGENT', Q13's comment-filter analogue) pushes to the
    orders scan. All counts, BIGINT both engines."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE_CUSTOMER_ORDER_DIST = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# Q19's OR-of-ANDs clauses, adapted to this schema's brands/sizes
DISC_CLAUSES = (
    ("Brand#11", 1, 15, 1, 15),
    ("Brand#22", 1, 30, 10, 25),
    ("Brand#33", 1, 50, 20, 35),
)


def q_discounted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from an OR of conjunctive
    (brand, size-range, quantity-range) clauses — the disjunctive-
    predicate plan test. Expressed as ONE join with the disjunction in
    the filter, not three unioned scans: Catalyst derives the pushable
    parts (brand IN (...) and the size hull reach the part scan, the
    quantity hull reaches the lineitem scan — visible as PushedFilters
    in SCALE.md) and evaluates the exact disjunction as the join
    residual. Revenue stays DECIMAL until the output boundary."""
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    clause = None
    for brand, s_lo, s_hi, q_lo, q_hi in DISC_CLAUSES:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        clause = c if clause is None else (clause | c)
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(clause)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            out2(F.sum(money("l_extendedprice") * disc)).alias("revenue"),
        )
    )


def _oracle_discounted() -> str:
    ors = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in DISC_CLAUSES
    )
    return f"""
SELECT count(*) AS n_lines,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
             AS DOUBLE), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {ors}
"""


ORACLE_DISCOUNTED_BRAND = _oracle_discounted()


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: order-priority check — the EXISTS-per-order semi-join
# whose correlated predicate compares columns from BOTH tables
# (reference's EXISTS templates, sap_semantic_model.json guideline 14).

OPC_START = "1996-07-01"  # Q4's one-quarter order window
OPC_END = "1996-10-01"
OPC_LATE_DAYS = 60  # "late" = shipped >60 days after order placement


def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority, in a one-quarter window,
    where EXISTS a line shipped more than ``OPC_LATE_DAYS`` days after
    the order date (the schema's stand-in for Q4's
    ``l_commitdate < l_receiptdate`` lateness test — the correlated
    predicate still references BOTH relations, which is the point).

    Plan: LEFT SEMI join on the orderkey equi-pair with the cross-table
    date inequality as the join residual — one hash semi-join, never a
    per-order re-scan, and each qualifying order counts ONCE no matter
    how many of its lines are late (semi-join semantics; the oracle
    keeps the literal EXISTS form to pin that equivalence). The quarter
    filter pushes to the orders scan; counts are BIGINT."""
    orders = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(OPC_START))
            & (F.col("o_orderdate") < F.lit(OPC_END))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_exists = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate.cast("date")
            > F.date_add(orders.o_orderdate.cast("date"), OPC_LATE_DAYS)
        ),
        "left_semi",
    )
    return (
        late_exists.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_ORDER_PRIORITY_CHECK = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= '{OPC_START}' AND o_orderdate < '{OPC_END}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND CAST(l.l_shipdate AS DATE)
          > CAST(o.o_orderdate AS DATE) + {OPC_LATE_DAYS}
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: two-level conditional aggregation after a fact-fact
# join (Q12 groups by l_shipmode, absent from this schema — l_returnflag
# plays the lineitem-attribute role; the priority-class CASE split is
# Q12's verbatim structure).

SPC_YEAR = 1997


def q_ship_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per lineitem class (returnflag standing in for
    the absent shipmode), how many lines belong to high-priority orders
    (1-URGENT / 2-HIGH) vs low — the join-then-conditional-count
    pattern.

    Plan: the year filter pushes to the lineitem scan BEFORE the
    orderkey join (only one year of the fact shuffles); the priority
    CASE evaluates map-side inside a partial+final hash aggregate on
    the 3-value class key. Counts are BIGINT on both engines."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate") == SPC_YEAR)
        .select("l_orderkey", "l_returnflag")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("ship_class")
    )


ORACLE_SHIP_PRIORITY_CLASSES = f"""
SELECT l_returnflag AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE year(l_shipdate) = {SPC_YEAR}
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share — a conditional/total ratio
# computed in ONE aggregation pass (never two scans), widened from Q14's
# single month to a per-month report over a year.

PRS_YEAR = 1997


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: per ship month, revenue from PROMO-type parts
    next to total revenue and the promo share — the conditional-sum /
    total-sum ratio evaluated in one partial+final aggregate over a
    single lineitem⋈part pass (Q14's plan intent: the CASE carries the
    numerator, so no second scan and no self-join).

    The part dim broadcasts; the year filter pushes to the lineitem
    scan. Revenue math stays DECIMAL to the output boundary; the share
    is emitted as integral basis points via the exact
    DECIMAL(38,0)-shift-then-div recipe (FLOATS.md class A — Spark
    ``div`` ≡ DuckDB ``//``), so no float division exists anywhere."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate") == PRS_YEAR)
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    rev = money("l_extendedprice") * disc
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(promo.alias("pr"), F.sum(rev).alias("tr"))
        .select(
            "ship_month",
            out2(F.col("pr")).alias("promo_revenue"),
            out2(F.col("tr")).alias("total_revenue"),
            F.expr(
                "CAST((CAST(pr * 1000000 AS DECIMAL(38,0)) * 10000) "
                "div CAST(tr * 1000000 AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("promo_share_bp"),
        )
        .orderBy("ship_month")
    )


ORACLE_PROMO_REVENUE_SHARE = f"""
WITH m AS (
  SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
         sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,4))
                          - CAST(l_discount AS DECIMAL(18,4)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS pr,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,4))
                - CAST(l_discount AS DECIMAL(18,4)))) AS tr
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = {PRS_YEAR}
  GROUP BY 1
)
SELECT ship_month,
       round(CAST(pr AS DOUBLE), 2) AS promo_revenue,
       round(CAST(tr AS DOUBLE), 2) AS total_revenue,
       CAST((CAST(pr * 1000000 AS HUGEINT) * 10000)
            // CAST(tr * 1000000 AS HUGEINT) AS BIGINT) AS promo_share_bp
FROM m
ORDER BY ship_month
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier concentration per part descriptor — COUNT
# DISTINCT over a pair relation with NOT-IN supplier exclusion and
# negated dim predicates (no partsupp in this schema; the observed
# distinct (l_partkey, l_suppkey) pairs ARE the supply relation, and
# "complaint" suppliers are the negative-balance ones).

PSC_EXCL_BRAND = "Brand#45"  # Q16's excluded brand
PSC_SIZES = (1, 9, 17, 25, 33, 41, 49)  # Q16's size IN-list


def q_part_supplier_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    (brand, type, size) part descriptor, excluding one brand, the PROMO
    type, and "complaint" suppliers (NOT IN subquery — negative account
    balance stands in for Q16's comment scan).

    Plan: the supply pairs come from ONE distinct over the 2-column
    pruned lineitem scan (pair grain, far below line grain); the
    filtered part dim broadcasts onto it (negated predicates still push
    to the part scan); the exclusion set is a LEFT ANTI join against a
    metadata-sized broadcast — the NOT-IN rewrite is safe here because
    s_suppkey is structurally non-null, and the oracle keeps the
    literal NOT IN to pin that equivalence. COUNT DISTINCT runs as the
    standard two-level expand aggregate; BIGINT on both engines."""
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != PSC_EXCL_BRAND)
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(*PSC_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    complaints = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .join(
            F.broadcast(complaints),
            pairs.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


ORACLE_PART_SUPPLIER_CONCENTRATION = f"""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{PSC_EXCL_BRAND}'
  AND p_type <> 'PROMO'
  AND p_size IN {PSC_SIZES}
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# TPC-H Q3/Q5/Q6/Q9/Q10/Q11 shapes — added r7 to complete the full
# 22-shape TPC-H sweep (every query form now has a gated counterpart).

SP_SEGMENT = "BUILDING"  # Q3's market segment
SP_DATE = "1996-07-01"  # Q3's cutoff date


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: the 10 highest-revenue orders taken before the
    cutoff but (partly) shipped after it, for one market segment — the
    classic sel-join-agg-topk. Both date filters push to their own
    scans BEFORE the join (only unshipped-window lines and pre-cutoff
    orders shuffle); the segment-filtered customer dim broadcasts; the
    top-k is a TakeOrderedAndProject, never a global sort. Revenue is
    DECIMAL to the boundary; the order date is emitted as an ISO string
    (engine conventions at module top); l_orderkey breaks revenue
    ties."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == SP_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit(SP_DATE))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit(SP_DATE))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(money("l_extendedprice") * disc).alias("rev"))
        .select(
            "l_orderkey",
            out2(F.col("rev")).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


ORACLE_SHIPPING_PRIORITY = f"""
SELECT l_orderkey,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
             AS DOUBLE), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{SP_SEGMENT}'
  AND o_orderdate < '{SP_DATE}'
  AND l_shipdate > '{SP_DATE}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


LSV_REGION = "ASIA"  # Q5's region
LSV_YEAR = 1997  # Q5's order year


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the CUSTOMER and the
    SUPPLIER share that nation, within one region and order year — the
    six-table join whose distinguishing predicate
    (``c_nationkey = s_nationkey``) is a join of two different dims'
    keys, not a dim filter.

    Plan: the year filter pushes to the orders scan; customer/supplier/
    nation/region all broadcast; the nation-equality predicate rides as
    a join residual so no extra shuffle exists for it. Revenue stays
    DECIMAL to the boundary; n_name breaks revenue ties."""
    region = (
        table(spark, sf_dir, "region")
        .filter(F.col("r_name") == LSV_REGION)
        .select("r_regionkey")
    )
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == LSV_YEAR)
        .select("o_orderkey", "o_custkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(out2(F.sum(money("l_extendedprice") * disc)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


ORACLE_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
             AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{LSV_REGION}' AND year(o_orderdate) = {LSV_YEAR}
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


FRC_YEAR = 1997  # Q6's ship year
FRC_DISC_LO, FRC_DISC_HI = 0.05, 0.07
FRC_QTY = 24


def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the would-be revenue gain from eliminating small
    discounts — a single-scan filter-and-sum whose ENTIRE predicate set
    (year range, discount band, quantity cap) must reach the parquet
    scan as pushed filters; any post-scan filtering here is a plan bug
    at 100 TB. One partial+final aggregate, no shuffle beyond it."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.year("l_shipdate") == FRC_YEAR)
        & (F.col("l_discount").between(FRC_DISC_LO, FRC_DISC_HI))
        & (F.col("l_quantity") < FRC_QTY)
    )
    return li.agg(
        F.count(F.lit(1)).alias("n_lines"),
        out2(
            F.sum(money("l_extendedprice") * F.col("l_discount").cast(DEC4))
        ).alias("revenue_change"),
    )


ORACLE_FORECAST_REVENUE_CHANGE = f"""
SELECT count(*) AS n_lines,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS revenue_change
FROM lineitem
WHERE year(l_shipdate) = {FRC_YEAR}
  AND l_discount BETWEEN {FRC_DISC_LO} AND {FRC_DISC_HI}
  AND l_quantity < {FRC_QTY}
"""


PTP_TOKEN = "widget"  # Q9's p_name LIKE token
PTP_COST_FACTOR = "0.6"  # stand-in unit-cost fraction of retail price


def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year for parts
    matching a name token. The schema has no partsupp, so Q9's
    ``ps_supplycost`` becomes a retail-price-derived unit cost
    (``0.6 * p_retailprice`` — the shape is the point: profit is a
    PER-LINE expression mixing lineitem and part columns, aggregated
    across a 4-table join).

    Plan: the name filter pushes to the part scan and that dim
    broadcasts (the pre-filtered part set drives the join, Q9's
    planner-intended direction); supplier and nation broadcast; one
    fact shuffle to the (nation, year) grain. All money math DECIMAL;
    the cost factor is an exact DECIMAL(18,4) literal so both engines
    compute identical cents."""
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(PTP_TOKEN))
        .select("p_partkey", "p_retailprice")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    amount = money("l_extendedprice") * disc - money("p_retailprice") * money(
        "l_quantity"
    ) * F.lit(PTP_COST_FACTOR).cast(DEC4)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(out2(F.sum(amount)).alias("profit"))
        .orderBy("supp_nation", F.col("o_year").desc())
    )


ORACLE_PRODUCT_TYPE_PROFIT = f"""
SELECT n_name AS supp_nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(sum(
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
         - CAST(p_retailprice AS DECIMAL(18,2))
           * CAST(l_quantity AS DECIMAL(18,2))
           * CAST({PTP_COST_FACTOR} AS DECIMAL(18,4))
       ) AS DOUBLE), 2) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{PTP_TOKEN}%'
GROUP BY n_name, year(o_orderdate)
ORDER BY supp_nation, o_year DESC
"""


RIR_START = "1996-10-01"  # Q10's one-quarter window
RIR_END = "1997-01-01"
RIR_TOP = 20


def q_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the top-20 customers by revenue LOST to returns
    in one quarter — sel-join-agg over customer grain with a top-k.
    The return-flag filter pushes to the lineitem scan and the quarter
    filter to the orders scan; customer/nation broadcast; the k-cap is
    a TakeOrderedAndProject on (revenue desc, custkey) so ties are
    deterministic."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(RIR_START))
            & (F.col("o_orderdate") < F.lit(RIR_END))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(money("l_extendedprice") * disc).alias("rev"))
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("cust_nation"),
            out2(F.col("rev")).alias("lost_revenue"),
        )
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(RIR_TOP)
    )


ORACLE_RETURNED_ITEM_REPORT = f"""
SELECT c_custkey, c_name, n_name AS cust_nation,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
             AS DOUBLE), 2) AS lost_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= '{RIR_START}' AND o_orderdate < '{RIR_END}'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT {RIR_TOP}
"""


IPV_NATION = "NATION_3"  # Q11's supplier nation
IPV_MEAN_MULT = 2  # keep parts whose value exceeds 2x the mean part value


def q_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: the parts carrying an outsized share of one
    nation's supplied value — a grouped sum filtered by a SCALAR
    subquery over the same relation (Q11's HAVING
    ``> fraction * sum(...)``), adapted to observed line value since
    the schema has no partsupp.

    Decorrelation: the per-part aggregation runs ONCE, the global
    (total, n_parts) pair is a 1-row aggregate of that same relation
    attached by broadcast cross-join (a bounded 1-row attach, per
    SCALE.md's bnlj policy), and the threshold is SCALE-INVARIANT —
    parts above ``IPV_MEAN_MULT``x the MEAN part value, compared
    cross-multiplied (``val * n_parts > mult * total``) over exact
    DECIMAL/BIGINT — no quotient, no float drift, no second lineitem
    scan, and the selectivity survives any corpus scale (a fixed share
    threshold degenerates to 0 rows as the part count grows)."""
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == IPV_NATION
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    vals = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(money("l_extendedprice")).alias("val"))
    )
    total = vals.agg(
        F.sum("val").alias("total"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(
            F.col("val") * F.col("n_parts")
            > F.lit(IPV_MEAN_MULT) * F.col("total")
        )
        .select("l_partkey", out2(F.col("val")).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


ORACLE_IMPORTANT_PART_VALUES = f"""
WITH vals AS (
  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{IPV_NATION}'
  GROUP BY l_partkey
)
SELECT l_partkey, round(CAST(val AS DOUBLE), 2) AS part_value
FROM vals, (SELECT sum(val) AS total, count(*) AS n_parts FROM vals) t
WHERE val * n_parts > {IPV_MEAN_MULT} * total
ORDER BY part_value DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# Benford first-digit screen: the statistical data-quality test auditors
# run on amount columns — organically-grown magnitudes follow
# P(d) = log10(1 + 1/d); fabricated or truncated data deviates. Companion
# to dq_orders_checks' rule-based constraints.


def q_dq_benford_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution of o_totalprice against the Benford
    expectation, per digit: observed count, observed share and expected
    share in integral basis points, and the signed deviation.

    Determinism (FLOATS.md classes A+C): the digit extraction is string
    arithmetic on the DECIMAL(18,2) cast (no float formatting); observed
    shares are integral divisions; the expected share takes ONE
    ln(1+1/d)/ln(10) per DIGIT row (9 of them), floor-quantized to bp.

    Scale shape: one pushed two-column scan, one 9-group aggregation with
    map-side combine; everything after runs on 9 rows."""
    od = table(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast(DEC).cast("string"), 1, 1
    ).cast("bigint")
    counts = (
        od.select(digit.alias("digit"))
        .filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_all = W.partitionBy()
    expected_bp = F.floor(
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
        / F.log(F.lit(10.0))
        * 10000
    ).cast("bigint")
    return (
        counts.withColumn("total", F.sum("n").over(w_all))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.expr("CAST(n * 10000 DIV total AS BIGINT)").alias("observed_bp"),
            expected_bp.alias("expected_bp"),
            (
                F.expr("CAST(n * 10000 DIV total AS BIGINT)") - expected_bp
            ).cast("bigint").alias("delta_bp"),
        )
        .orderBy("digit")
    )


ORACLE_DQ_BENFORD = """
WITH counts AS (
  SELECT digit, count(*) AS n FROM (
    SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM orders
  ) WHERE digit BETWEEN 1 AND 9
  GROUP BY 1
)
SELECT digit,
       CAST(n AS BIGINT) AS n,
       CAST(n * 10000 // sum(n) OVER () AS BIGINT) AS observed_bp,
       CAST(floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 10000) AS BIGINT) AS expected_bp,
       CAST(n * 10000 // sum(n) OVER ()
            - floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 10000) AS BIGINT) AS delta_bp
FROM counts
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# revenue concentration (Pareto): how much of total revenue the top spend
# deciles carry — the whale-curve counterpart of events_power_users' Gini,
# on the relational side.


def q_customer_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile revenue concentration: customers ranked by total spend
    (decile 1 = biggest spenders), with customer counts, revenue in
    integer cents, and exact integral-bp share and cumulative share.

    Decile assignment is the RFM recipe — ``(rank-1)*10 DIV n + 1`` over
    ``with_global_rank`` (range-partitioned, no global window, ties
    broken by custkey) — and every downstream cell is integer arithmetic
    over the 10-row decile relation (the share windows run there, not
    over customers).

    Scale shape: one customer-keyed aggregation over orders, one range
    exchange over the customer-grain relation, a 10-group regroup."""
    from .ranks import with_global_rank

    orders = table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("spend"),
    ).select(
        "o_custkey",
        (F.col("spend") * -1).alias("neg_spend"),
        F.expr("CAST(spend * 100 AS BIGINT)").alias("cents"),
    )
    ranked = with_global_rank(
        per_cust, "neg_spend", "o_custkey", rank_col="__r", total_col="__n"
    )  # N rides the rank pass's metadata collect — no second count() job
    deciles = (
        ranked.withColumn(
            "decile", F.expr("CAST((__r - 1) * 10 DIV __n + 1 AS BIGINT)")
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )
    w_all = W.partitionBy()
    w_cum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    return (
        deciles.withColumn("total", F.sum("revenue_cents").over(w_all))
        .withColumn("cum", F.sum("revenue_cents").over(w_cum))
        .selectExpr(
            "decile",
            "n_customers",
            "revenue_cents",
            "CAST(revenue_cents * 10000 DIV total AS BIGINT) AS share_bp",
            "CAST(cum * 10000 DIV total AS BIGINT) AS cum_share_bp",
        )
        .orderBy("decile")
    )


ORACLE_REVENUE_PARETO = """
WITH per_cust AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT o_custkey, CAST(spend * 100 AS BIGINT) AS cents,
         row_number() OVER (ORDER BY spend DESC, o_custkey) AS r,
         count(*) OVER () AS n
  FROM per_cust
),
deciles AS (
  SELECT CAST((r - 1) * 10 // n + 1 AS BIGINT) AS decile,
         count(*) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS revenue_cents
  FROM ranked GROUP BY 1
)
SELECT decile,
       CAST(n_customers AS BIGINT) AS n_customers,
       revenue_cents,
       CAST(revenue_cents * 10000 // sum(revenue_cents) OVER () AS BIGINT) AS share_bp,
       CAST(sum(revenue_cents) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) * 10000
            // sum(revenue_cents) OVER () AS BIGINT) AS cum_share_bp
FROM deciles
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# supplier delivery-reliability ranking: which suppliers are ERRATIC, not
# just slow. nation_delivery_performance reports SLA means per nation;
# procurement escalates on per-supplier VARIANCE — a supplier with a fine
# mean but a huge spread is the one that breaks planning.

DELIVERY_TOP_N = 10


def q_supplier_delivery_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-DELIVERY_TOP_N most-erratic suppliers by population variance
    of order-to-ship latency (exact integer days; variance in milli
    day^2 via the closed form (n*ssq - s^2) * 1000 DIV n^2 — BIGINT
    sufficient statistics, closed form accumulated in DECIMAL(38,0) /
    HUGEINT so it cannot wrap at large SF — the z_score/moments recipe),
    with line count and mean latency (milli days) alongside.

    Scale shape: one lineitem-orders key join (fact-fact, shuffles on
    orderkey), one supplier-keyed aggregation to sufficient statistics,
    TakeOrderedAndProject for the top-N."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lat = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).selectExpr(
        "l_suppkey",
        "(unix_micros(CAST(l_shipdate AS TIMESTAMP))"
        " - unix_micros(CAST(o_orderdate AS TIMESTAMP)))"
        " DIV 86400000000 AS lat_days",
    )
    return (
        lat.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("lat_days").cast("bigint").alias("s"),
            F.expr("sum(lat_days * lat_days)").cast("bigint").alias("ssq"),
        )
        .selectExpr(
            "l_suppkey",
            "n_lines",
            "CAST(s * 1000 DIV n_lines AS BIGINT) AS mean_lat_milli_days",
            # closed form accumulated in DECIMAL(38,0) (oracle: HUGEINT):
            # n*ssq and s*s pass ~9e18 once a supplier has ~8e5+ lines
            # (large SF), where non-ANSI BIGINT would wrap silently while
            # DuckDB errors — the classifier's gradient convention
            "CAST((CAST(n_lines AS DECIMAL(38,0)) * ssq"
            " - CAST(s AS DECIMAL(38,0)) * s) * 1000"
            " DIV (CAST(n_lines AS DECIMAL(38,0)) * n_lines)"
            " AS BIGINT) AS var_milli_days2",
        )
        .orderBy(F.col("var_milli_days2").desc(), F.col("l_suppkey").asc())
        .limit(DELIVERY_TOP_N)
    )


ORACLE_DELIVERY_VARIANCE = f"""
WITH lat AS (
  SELECT l_suppkey,
         (epoch_us(l_shipdate) - epoch_us(o_orderdate)) // 86400000000 AS lat_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
stats AS (
  SELECT l_suppkey,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(lat_days) AS BIGINT) AS s,
         CAST(sum(lat_days * lat_days) AS BIGINT) AS ssq
  FROM lat GROUP BY 1
)
SELECT l_suppkey, n_lines,
       CAST(s * 1000 // n_lines AS BIGINT) AS mean_lat_milli_days,
       CAST((CAST(n_lines AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s) * 1000
            // (CAST(n_lines AS HUGEINT) * n_lines) AS BIGINT)
         AS var_milli_days2
FROM stats
ORDER BY var_milli_days2 DESC, l_suppkey ASC
LIMIT {DELIVERY_TOP_N}
"""


# ---------------------------------------------------------------------------
# priority ship-latency percentiles: the logistics SLA table — does an
# URGENT order actually ship faster, and by how much at the tail? Same
# exact-integer-days + interpolating-percentile recipe as
# events_interarrival_percentiles, keyed on the 5-priority dimension
# (the synthetic lineitem carries no shipmode/receiptdate — see
# q_ship_priority_classes' stand-in note).


def q_priority_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order priority: line count and p50/p90/p99 order-to-ship
    latency days (interpolated percentile over exact integer days,
    2 dp).

    Scale shape: one orderkey join (the fact-fact shuffle every latency
    metric pays), one map-side day derivation, one 5-group percentile
    aggregation."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).selectExpr(
        "o_orderpriority",
        "CAST((unix_micros(CAST(l_shipdate AS TIMESTAMP))"
        " - unix_micros(CAST(o_orderdate AS TIMESTAMP)))"
        " DIV 86400000000 AS DOUBLE) AS d",
    )
    agg = lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.expr("percentile(d, array(0.5D, 0.9D, 0.99D))").alias("p"),
    )
    return agg.select(
        "o_orderpriority",
        "n_lines",
        F.round(F.element_at(F.col("p"), 1), 2).alias("p50_days"),
        F.round(F.element_at(F.col("p"), 2), 2).alias("p90_days"),
        F.round(F.element_at(F.col("p"), 3), 2).alias("p99_days"),
    ).orderBy("o_orderpriority")


ORACLE_PRIORITY_SHIP_LATENCY = """
WITH lat AS (
  SELECT o_orderpriority,
         CAST((epoch_us(l_shipdate) - epoch_us(o_orderdate))
              // 86400000000 AS DOUBLE) AS d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(quantile_cont(d, 0.5), 2) AS p50_days,
       round(quantile_cont(d, 0.9), 2) AS p90_days,
       round(quantile_cont(d, 0.99), 2) AS p99_days
FROM lat
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# order-size histogram: the lines-per-order distribution — the shape the
# order-processing capacity model and every per-order cost estimate start
# from (TPC-H orders carry 1..7 lines; a real marketplace's long tail is
# exactly what this surfaces).


def q_order_line_count_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per lines-per-order class: order count and corpus share (bp).

    Scale shape: one orderkey-keyed count with map-side combine, one
    bounded regroup; the share window runs on the <=|max lines| class
    relation."""
    li = table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    w_all = W.partitionBy()  # bounded class relation (1..7 at TPC-H)
    return (
        per_order.groupBy("n_lines")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .withColumn("tot", F.sum("n_orders").over(w_all))
        .selectExpr(
            "CAST(n_lines AS BIGINT) AS n_lines",
            "n_orders",
            "CAST(n_orders * 10000 DIV tot AS BIGINT) AS share_bp",
        )
        .orderBy("n_lines")
    )


ORACLE_ORDER_LINE_COUNT_HIST = """
WITH per_order AS (
  SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1
),
hist AS (
  SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
  FROM per_order GROUP BY 1
)
SELECT CAST(n_lines AS BIGINT) AS n_lines,
       n_orders,
       CAST(n_orders * 10000 // sum(n_orders) OVER () AS BIGINT) AS share_bp
FROM hist
ORDER BY n_lines
"""


# ---------------------------------------------------------------------------
# brand return rates: which brands come back — the supplier-quality signal
# behind returned_item_report's revenue view (that one ranks customers on
# returned revenue; this one ranks the product dimension on return share).


def q_brand_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part brand: shipped lines, returned lines (l_returnflag 'R'),
    and the return rate in basis points.

    Scale shape: one fact-dim join (part broadcasts at any realistic
    dimension size), one 25-group conditional aggregation — return
    counting rides the same pass as line counting."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.expr("sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)")
            .cast("bigint")
            .alias("n_returned"),
        )
        .selectExpr(
            "p_brand",
            "n_lines",
            "n_returned",
            "CAST(n_returned * 10000 DIV n_lines AS BIGINT) AS return_bp",
        )
        .orderBy("p_brand")
    )


ORACLE_BRAND_RETURN_RATES = """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS return_bp
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# account-balance risk profile per market segment: how much of each
# segment is in arrears (negative balance) and what the typical balance
# is — the receivables-risk slice of the customer dimension (Q22 uses the
# global positive average; this is the full per-segment ledger view).


def q_customer_acctbal_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per market segment: customers, negative-balance customers and
    their share (bp), and the mean/min/max balance in exact cents.

    Scale shape: one map-side cents derivation, one 5-group aggregation
    with map-side combine."""
    cust = table(spark, sf_dir, "customer")
    per = cust.selectExpr(
        "c_mktsegment",
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
    )
    return (
        per.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.expr("sum(CASE WHEN cents < 0 THEN 1 ELSE 0 END)")
            .cast("bigint")
            .alias("n_negative"),
            F.sum("cents").cast("bigint").alias("sc"),
            F.min("cents").cast("bigint").alias("min_cents"),
            F.max("cents").cast("bigint").alias("max_cents"),
        )
        .selectExpr(
            "c_mktsegment",
            "n_customers",
            "n_negative",
            "CAST(n_negative * 10000 DIV n_customers AS BIGINT)"
            " AS negative_bp",
            "CAST(sc DIV n_customers AS BIGINT) AS mean_cents",
            "min_cents",
            "max_cents",
        )
        .orderBy("c_mktsegment")
    )


ORACLE_ACCTBAL_BY_SEGMENT = """
WITH per AS (
  SELECT c_mktsegment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN cents < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative,
       CAST(sum(CASE WHEN cents < 0 THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS negative_bp,
       CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents
FROM per
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# supplier balance extremes per nation: the treasury view of the supplier
# dimension — who holds the largest credit and the deepest arrears in each
# nation, with deterministic (cents, suppkey) tie-breaks on both engines.


def q_supplier_acctbal_extremes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per nation: supplier count, the richest and poorest suppliers by
    account balance (exact cents; ties to the lower suppkey), and the
    spread.

    Scale shape: one broadcast dim join, two nation-keyed windows over
    the supplier relation (each partition = one nation's suppliers),
    one bounded regroup."""
    sup = table(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey",
        "s_nationkey",
        "CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
    )
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
    w_top = W.partitionBy("n_name").orderBy(
        F.col("cents").desc(), F.col("s_suppkey").asc()
    )
    w_bot = W.partitionBy("n_name").orderBy(
        F.col("cents").asc(), F.col("s_suppkey").asc()
    )
    ranked = j.select(
        "n_name",
        "s_suppkey",
        "cents",
        F.row_number().over(w_top).alias("rt"),
        F.row_number().over(w_bot).alias("rb"),
    )
    return (
        ranked.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.expr("max(CASE WHEN rt = 1 THEN s_suppkey END)")
            .cast("bigint")
            .alias("richest_suppkey"),
            F.expr("max(CASE WHEN rt = 1 THEN cents END)")
            .cast("bigint")
            .alias("richest_cents"),
            F.expr("max(CASE WHEN rb = 1 THEN s_suppkey END)")
            .cast("bigint")
            .alias("poorest_suppkey"),
            F.expr("max(CASE WHEN rb = 1 THEN cents END)")
            .cast("bigint")
            .alias("poorest_cents"),
        )
        .selectExpr(
            "n_name",
            "n_suppliers",
            "richest_suppkey",
            "richest_cents",
            "poorest_suppkey",
            "poorest_cents",
            "CAST(richest_cents - poorest_cents AS BIGINT) AS spread_cents",
        )
        .orderBy("n_name")
    )


ORACLE_SUPPLIER_ACCTBAL_EXTREMES = """
WITH j AS (
  SELECT n_name, s_suppkey,
         CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
ranked AS (
  SELECT n_name, s_suppkey, cents,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY cents DESC, s_suppkey) AS rt,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY cents ASC, s_suppkey) AS rb
  FROM j
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(max(CASE WHEN rt = 1 THEN s_suppkey END) AS BIGINT)
         AS richest_suppkey,
       CAST(max(CASE WHEN rt = 1 THEN cents END) AS BIGINT) AS richest_cents,
       CAST(max(CASE WHEN rb = 1 THEN s_suppkey END) AS BIGINT)
         AS poorest_suppkey,
       CAST(max(CASE WHEN rb = 1 THEN cents END) AS BIGINT) AS poorest_cents,
       CAST(max(CASE WHEN rt = 1 THEN cents END)
            - max(CASE WHEN rb = 1 THEN cents END) AS BIGINT) AS spread_cents
FROM ranked
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# retail-price vs size curve: does a bigger part cost more — the product
# dimension's pricing-structure profile (catalog QA: a size class whose
# price band collapses is a data or listing error).


def q_part_price_size_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part size: part count and mean/min/max retail price in exact
    cents. One map-side cents derivation, one |sizes|-group aggregation."""
    part = table(spark, sf_dir, "part").selectExpr(
        "p_size",
        "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
    )
    return (
        part.groupBy("p_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("sc"),
            F.min("cents").cast("bigint").alias("min_cents"),
            F.max("cents").cast("bigint").alias("max_cents"),
        )
        .selectExpr(
            "CAST(p_size AS BIGINT) AS p_size",
            "n_parts",
            "CAST(sc DIV n_parts AS BIGINT) AS mean_cents",
            "min_cents",
            "max_cents",
        )
        .orderBy("p_size")
    )


ORACLE_PART_PRICE_SIZE_CURVE = """
WITH per AS (
  SELECT p_size,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM part
)
SELECT CAST(p_size AS BIGINT) AS p_size,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents
FROM per
GROUP BY p_size
ORDER BY p_size
"""


# ---------------------------------------------------------------------------
# per-customer spend trend: least-squares slope of order value over the
# order-month index — the expansion/contraction signal account teams rank
# by. The per-entity regression at scale is ONE aggregation to sufficient
# statistics (n, Σx, Σy, Σxy, Σx²) and a closed-form slope per key — no
# windows, no per-entity iteration; the z_score/variance family's recipe
# applied to regression.

TREND_TOP_N = 10
TREND_MIN_ORDERS = 3


def q_customer_spend_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TREND_TOP_N fastest-growing customers by exact least-squares
    slope of order value (milli-cents per month) over the order-month
    index. Customers need TREND_MIN_ORDERS+ orders in 2+ distinct months
    (the slope denominator is 0 otherwise). Closed form accumulates in
    DECIMAL(38,0) (oracle: HUGEINT) — the supplier_delivery_variance
    convention.

    Scale shape: one customer-keyed aggregation over orders to the five
    sufficient statistics, TakeOrderedAndProject for the top-N."""
    orders = table(spark, sf_dir, "orders")
    pts = orders.selectExpr(
        "o_custkey",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS x",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0)) AS y",
    )
    agg = pts.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").alias("sy"),
        F.expr("sum(x * x)").cast("bigint").alias("sxx"),
        F.expr("sum(y * x)").alias("sxy"),
    )
    return (
        agg.selectExpr(
            "o_custkey",
            "n AS n_orders",
            "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"
            " AS num",
            "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"
            " AS den",
        )
        .filter(f"n_orders >= {TREND_MIN_ORDERS} AND den != 0")
        .selectExpr(
            "o_custkey",
            "n_orders",
            "CAST(num * 1000 DIV den AS BIGINT) AS slope_milli_cents",
        )
        .orderBy(F.col("slope_milli_cents").desc(), F.col("o_custkey").asc())
        .limit(TREND_TOP_N)
    )


ORACLE_CUSTOMER_SPEND_TREND = f"""
WITH pts AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS x,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS y
  FROM orders
),
agg AS (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         sum(y) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         sum(y * x) AS sxy
  FROM pts GROUP BY 1
)
SELECT o_custkey,
       n AS n_orders,
       CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000
            // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
            AS BIGINT) AS slope_milli_cents
FROM agg
WHERE n >= {TREND_MIN_ORDERS}
  AND CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx != 0
ORDER BY slope_milli_cents DESC, o_custkey ASC
LIMIT {TREND_TOP_N}
"""


# ---------------------------------------------------------------------------
# ranking under uncertainty: sorting suppliers by raw return-free rate
# lets a 3-line supplier at 3/3 outrank a 500-line supplier at 99% —
# the small-sample fallacy every naive leaderboard commits. The Wilson
# score interval's LOWER bound (Wilson 1927; the canonical "how not to
# sort by average rating" fix) discounts thin evidence: rank by what the
# rate is AT LEAST, at 95% confidence. The bound is a closed form of
# + - * / sqrt over exact integer counts and shared literals, evaluated
# with the identical expression tree on both engines (FLOATS.md class B),
# rounded to 1e-6 at the output boundary.

WILSON_Z = "1.959964"  # two-sided 95%; same literal in both engines
WILSON_MIN_LINES = 20
WILSON_TOP_N = 20


def q_supplier_reliability_ranking(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-WILSON_TOP_N suppliers by the Wilson lower bound of their
    return-free line rate (l_returnflag != 'R'), with the raw permille
    alongside so the small-sample discount is visible. Suppliers need
    WILSON_MIN_LINES+ lines; ties break to the lower suppkey.

    Scale shape: one lineitem scan, one suppkey-keyed count aggregation
    (map-side combined), the closed form on the per-supplier row,
    TakeOrderedAndProject for the top-N."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (F.col("l_returnflag") != "R").cast("bigint").alias("ok"),
    )
    agg = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ok").cast("bigint").alias("k"),
    )
    # {z}D: Spark parses a bare decimal literal as DECIMAL, not DOUBLE —
    # the D suffix keeps every op in the tree a pure-double IEEE op,
    # matching DuckDB's double evaluation bit-for-bit
    z = WILSON_Z + "D"
    wilson = (
        f"((CAST(k AS DOUBLE) / n + {z} * {z} / (2D * n) "
        f"- {z} * sqrt((CAST(k AS DOUBLE) / n) * (1D - CAST(k AS DOUBLE) / n) / n "
        f"+ {z} * {z} / (4D * n * n))) / (1D + {z} * {z} / n))"
    )
    return (
        agg.filter(F.col("n") >= WILSON_MIN_LINES)
        .selectExpr(
            "l_suppkey",
            "n AS n_lines",
            "CAST(k * 1000 DIV n AS BIGINT) AS ok_permille",
            f"round({wilson}, 6) AS wilson_lb",
        )
        .orderBy(F.col("wilson_lb").desc(), F.col("l_suppkey").asc())
        .limit(WILSON_TOP_N)
    )


# _ZD: a bare decimal literal parses as DECIMAL in DuckDB too (z*z would
# be exact-decimal there vs double*double in Spark) — the explicit DOUBLE
# cast makes both engines run the SAME pure-double expression tree, so
# the class-B invariant is structural, not a coincidence of this z value.
_ZD = f"CAST({WILSON_Z} AS DOUBLE)"

ORACLE_SUPPLIER_RELIABILITY = f"""
WITH agg AS (
  SELECT l_suppkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_returnflag != 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM lineitem GROUP BY 1
)
SELECT l_suppkey,
       n AS n_lines,
       CAST(k * 1000 // n AS BIGINT) AS ok_permille,
       round(((CAST(k AS DOUBLE) / n + {_ZD} * {_ZD} / (2 * n)
         - {_ZD} * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n
         + {_ZD} * {_ZD} / (4 * n * n)))
         / (1 + {_ZD} * {_ZD} / n)), 6) AS wilson_lb
FROM agg
WHERE n >= {WILSON_MIN_LINES}
ORDER BY wilson_lb DESC, l_suppkey ASC
LIMIT {WILSON_TOP_N}
"""


# ---------------------------------------------------------------------------
# ship-latency survival curve: the complement-of-CDF at a fixed day grid.
# priority_ship_latency answers "how long do the p50/p90/p99 lines take";
# the survival form answers the SLA question "what fraction of lines is
# STILL unshipped after 7/30/60/90/120 days" — the curve an operations
# dashboard plots and the discrete-time survival-analysis primitive
# (S(d) = P[latency > d]), exact integer permille per grid point.

SURV_GRID = (7, 30, 60, 90, 120)


def q_orders_ship_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order priority: line count, max latency days, and the
    survival permille (lines with order-to-ship latency > d, per
    thousand) at each SURV_GRID day mark. All-integer: counts and
    integer DIV against the positive line count (FLOATS.md class D).

    Scale shape: ONE orderkey fact-fact join (the same shuffle
    priority_ship_latency pays), then one 5-group conditional
    aggregation — the whole survival curve is map-side-combinable
    conditional counts, no window, no percentile sort."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).selectExpr(
        "o_orderpriority",
        "CAST((unix_micros(CAST(l_shipdate AS TIMESTAMP))"
        " - unix_micros(CAST(o_orderdate AS TIMESTAMP)))"
        " DIV 86400000000 AS BIGINT) AS d",
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.max("d").cast("bigint").alias("max_days"),
    ] + [
        F.expr(
            f"CAST(sum(CASE WHEN d > {g} THEN 1 ELSE 0 END) * 1000 "
            f"DIV count(*) AS BIGINT)"
        ).alias(f"surv{g}_permille")
        for g in SURV_GRID
    ]
    return lat.groupBy("o_orderpriority").agg(*aggs).orderBy("o_orderpriority")


ORACLE_ORDERS_SHIP_SURVIVAL = """
WITH lat AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(max(d) AS BIGINT) AS max_days,
""" + ",\n".join(
    f"       CAST(sum(CASE WHEN d > {g} THEN 1 ELSE 0 END) * 1000"
    f" // count(*) AS BIGINT) AS surv{g}_permille"
    for g in SURV_GRID
) + """
FROM lat
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# purchase cadence: percentiles of the gap between a customer's
# consecutive orders — the replenishment-cycle distribution inventory and
# win-back campaigns are timed against (the commerce twin of
# events_interarrival_percentiles).


def q_reorder_interval_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-row report: customers with 2+ orders, gap count, and
    p50/p90/p99 days between consecutive orders of the same customer
    (interpolated percentile over exact integer days, 2 dp).

    Scale shape: one customer-keyed sort window for the lag (the
    sessionize exchange on the much-smaller orders fact), one global
    percentile aggregation over the gap relation."""
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.withColumn(
            "gap_days",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ),
        )
        .filter(F.col("gap_days").isNotNull())
        .select(
            "o_custkey", F.col("gap_days").cast("double").alias("g")
        )
    )
    return gaps.agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_repeat_customers"),
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(F.expr("percentile(g, 0.5D)"), 2).alias("p50_days"),
        F.round(F.expr("percentile(g, 0.9D)"), 2).alias("p90_days"),
        F.round(F.expr("percentile(g, 0.99D)"), 2).alias("p99_days"),
    )


ORACLE_REORDER_INTERVAL = """
WITH gaps AS (
  SELECT o_custkey,
         CAST(CAST(o_orderdate AS DATE)
              - lag(CAST(o_orderdate AS DATE))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
              AS DOUBLE) AS g
  FROM orders
)
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_repeat_customers,
       CAST(count(*) AS BIGINT) AS n_gaps,
       round(quantile_cont(g, 0.5), 2) AS p50_days,
       round(quantile_cont(g, 0.9), 2) AS p90_days,
       round(quantile_cont(g, 0.99), 2) AS p99_days
FROM gaps
WHERE g IS NOT NULL
"""


# ---------------------------------------------------------------------------
# repeat-purchase cohort rate: per first-order-month cohort, how many
# customers ever came back — the retention KPI on the commerce fact (the
# revenue-free sibling of customer_cohort_ltv, and the relational twin of
# events_retention_cohorts).


def q_customer_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per first-order-month cohort: customers, repeat customers (2+
    lifetime orders), repeat rate (bp), and mean lifetime orders
    (milli). All-integer; cohort month as an ISO yyyy-MM string.

    Scale shape: one customer-keyed aggregation over orders (first
    month + lifetime count in the same pass), one bounded regroup by
    cohort month."""
    orders = table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM").alias("cohort_month"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    return (
        per_cust.groupBy("cohort_month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.expr("sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)")
            .cast("bigint")
            .alias("n_repeat"),
            F.sum("n_orders").cast("bigint").alias("orders_total"),
        )
        .selectExpr(
            "cohort_month",
            "n_customers",
            "n_repeat",
            "CAST(n_repeat * 10000 DIV n_customers AS BIGINT) AS repeat_bp",
            "CAST(orders_total * 1000 DIV n_customers AS BIGINT)"
            " AS mean_orders_milli",
        )
        .orderBy("cohort_month")
    )


ORACLE_REPEAT_RATE = """
WITH per_cust AS (
  SELECT o_custkey,
         strftime(min(o_orderdate), '%Y-%m') AS cohort_month,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT cohort_month,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
       CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS repeat_bp,
       CAST(sum(n_orders) * 1000 // count(*) AS BIGINT) AS mean_orders_milli
FROM per_cust
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# supply-chain sourcing risk: how much revenue rides on single-sourced
# parts. The SCM counterpart of the HHI concentration report — HHI says
# a market is concentrated; this says WHICH exposure class the money
# sits in (1 supplier = no failover).


def q_parts_sourcing_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier-count class (distinct suppliers that ever shipped the
    part): part count, exact cent revenue, and each class's share of all
    revenue (bp). The n_suppliers = 1 row is the single-source exposure
    a procurement team works down.

    Scale shape: one (part)-keyed aggregation over lineitem (COUNT
    DISTINCT supplier collapses map-side per part), one bounded regroup
    by supplier-count class; the share window runs there."""
    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("bigint").alias("n_suppliers"),
        F.expr(
            f"CAST(sum(CAST(l_extendedprice AS {DEC}) * 100) AS BIGINT)"
        ).alias("cents"),
    )
    w_all = W.partitionBy()  # bounded class relation
    return (
        per_part.groupBy("n_suppliers")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .withColumn("tot", F.sum("revenue_cents").over(w_all))
        .selectExpr(
            "n_suppliers",
            "n_parts",
            "revenue_cents",
            "CAST(revenue_cents * 10000 DIV tot AS BIGINT) AS revenue_share_bp",
        )
        .orderBy("n_suppliers")
    )


ORACLE_SOURCING_RISK = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
),
classes AS (
  SELECT n_suppliers,
         CAST(count(*) AS BIGINT) AS n_parts,
         CAST(sum(cents) AS BIGINT) AS revenue_cents
  FROM per_part GROUP BY 1
)
SELECT n_suppliers, n_parts, revenue_cents,
       CAST(revenue_cents * 10000 // sum(revenue_cents) OVER () AS BIGINT)
         AS revenue_share_bp
FROM classes
ORDER BY n_suppliers
"""


# ---------------------------------------------------------------------------
# gaps-and-islands on the relational side: customer purchase sprees —
# runs of orders each within SPREE_GAP_DAYS of the previous one. The
# events table has the sessionize/SCD2 island machinery; this is the
# same recipe on the commerce fact, where the island SIZE distribution
# (how bursty is purchasing) drives campaign timing and CLV models.

SPREE_GAP_DAYS = 30
_SPREE_GAP_US = SPREE_GAP_DAYS * 86_400 * 1_000_000


def q_customer_order_sprees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spree-size histogram: per island size (orders in a spree), the
    spree count and total revenue in exact cents. Gap math is integer
    microseconds (the sessionize convention); equal timestamps always
    extend the running island regardless of tie order, so the histogram
    is permutation-stable.

    Scale shape: ONE customer-keyed sort window serves both the island
    flag and the island id (the SCD2 exchange-reuse pattern), one
    (customer, island) aggregation, then a bounded regroup by island
    size."""
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # o_orderdate arrives TIMESTAMP_NTZ; session tz is UTC so the LTZ cast
    # is instant-preserving (the events._normalize_ts convention)
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    flagged = orders.withColumn(
        "new_spree",
        F.when(gap.isNull() | (gap > _SPREE_GAP_US), 1).otherwise(0),
    )
    per_spree = (
        flagged.withColumn(
            "sid", F.sum("new_spree").over(w.rowsBetween(W.unboundedPreceding, 0))
        )
        .groupBy("o_custkey", "sid")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                f"CAST(sum(CAST(o_totalprice AS {DEC}) * 100) AS BIGINT)"
            ).alias("cents"),
        )
    )
    return (
        per_spree.groupBy(F.col("n_orders").cast("bigint").alias("spree_orders"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sprees"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("spree_orders")
    )


ORACLE_ORDER_SPREES = f"""
WITH flagged AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         epoch_us(o_orderdate) AS us,
         CASE WHEN lag(epoch_us(o_orderdate)) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   IS NULL
              OR epoch_us(o_orderdate)
                 - lag(epoch_us(o_orderdate)) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                 > {_SPREE_GAP_US}
              THEN 1 ELSE 0 END AS new_spree
  FROM orders
),
sid AS (
  SELECT o_custkey, o_totalprice,
         sum(new_spree) OVER (PARTITION BY o_custkey ORDER BY us, o_orderkey
                              ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
per AS (
  SELECT o_custkey, sid, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
  FROM sid GROUP BY 1, 2
)
SELECT CAST(n_orders AS BIGINT) AS spree_orders,
       CAST(count(*) AS BIGINT) AS n_sprees,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM per
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# calendar-spine gap fill: the generated-dimension pattern every reporting
# layer needs — a month x region spine built from literals (no scan), left-
# joined by the sparse fact so empty cells surface as explicit zeros
# instead of missing rows (a missing row and a zero month are different
# answers to "how did March look").


SHIP_SLA_DAYS = 30


def q_nation_delivery_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier nation: share of lineitems shipped within the
    SHIP_SLA_DAYS order-to-ship SLA (basis points) and the mean overrun
    of SLA-missing lines in milli-days — the OTIF-style SCM KPI next to
    suppliers_kept_waiting's Q21 blame query. (This corpus carries no
    commit/receipt dates — Q4/Q12/Q21 use the same stand-in convention —
    so the SLA is order-date-to-ship-date.)

    All-integer: datediff is exact days, shares and means are integral
    bp/milli quotients with nullif for a nation with zero late lines.

    Scale shape: one lineitem scan joined to orders on the order key
    (fact-to-fact, AQE decides) and to the broadcast supplier/nation
    dims, aggregated to 25 groups with map-side combine."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    lag = F.datediff("l_shipdate", "o_orderdate")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum((lag <= SHIP_SLA_DAYS).cast("bigint"))
            .cast("bigint")
            .alias("n_on_time"),
            F.sum(
                F.when(lag > SHIP_SLA_DAYS, lag - SHIP_SLA_DAYS).otherwise(0)
            )
            .cast("bigint")
            .alias("overrun_days_total"),
        )
        .selectExpr(
            "nation",
            "n_lines",
            "n_on_time",
            "CAST(n_on_time * 10000 DIV n_lines AS BIGINT) AS on_time_bp",
            "CAST(overrun_days_total * 1000"
            " DIV nullif(n_lines - n_on_time, 0) AS BIGINT)"
            " AS avg_overrun_days_milli",
        )
        .orderBy("nation")
    )


ORACLE_NATION_DELIVERY = f"""
SELECT n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                          <= {SHIP_SLA_DAYS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_on_time,
       CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                          <= {SHIP_SLA_DAYS} THEN 1 ELSE 0 END)
            * 10000 // count(*) AS BIGINT) AS on_time_bp,
       CAST(CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                               > {SHIP_SLA_DAYS}
                     THEN datediff('day', o_orderdate, l_shipdate)
                          - {SHIP_SLA_DAYS}
                     ELSE 0 END) AS BIGINT) * 1000
            // nullif(count(*)
                      - sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                                      <= {SHIP_SLA_DAYS} THEN 1 ELSE 0 END), 0)
        AS BIGINT) AS avg_overrun_days_milli
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY nation
"""


def q_monthly_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-of-month open-order backlog as a DELTA STREAM: each order
    contributes +1 at its order month and -1 at its last-shipment month;
    the cumulative sum over months IS the count of orders started on or
    before M and fully shipped after M. This is the scale-correct form
    of interval counting — a point-in-interval join (orders x months)
    grows as facts x spine, while the delta stream is two rows per order
    aggregated to the bounded calendar grain before any window.

    Scale shape: one per-order max-shipdate aggregation (order-keyed,
    map-side combined), a 2-row-per-order delta explode collapsed to
    <= |months| groups, and the cumulative window on the ~84-row
    calendar relation (bounded, the seasonality adjudication)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    spans = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("ship_end"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    deltas = spans.selectExpr(
        "explode(array("
        "struct(date_format(o_orderdate, 'yyyy-MM') AS ym,"
        " 1 AS started, 0 AS shipped),"
        "struct(date_format(ship_end, 'yyyy-MM') AS ym,"
        " 0 AS started, 1 AS shipped))) AS d"
    ).select("d.ym", "d.started", "d.shipped")
    monthly = deltas.groupBy("ym").agg(
        F.sum("started").cast("bigint").alias("n_started"),
        F.sum("shipped").cast("bigint").alias("n_shipped"),
    )
    w_cum = W.orderBy("ym").rowsBetween(W.unboundedPreceding, 0)
    return (
        monthly.withColumn(
            "backlog_eom",
            F.sum(F.col("n_started") - F.col("n_shipped")).over(w_cum),
        )
        .selectExpr(
            "ym AS month",
            "n_started",
            "n_shipped",
            "CAST(backlog_eom AS BIGINT) AS backlog_eom",
        )
        .orderBy("month")
    )


ORACLE_MONTHLY_BACKLOG = """
WITH spans AS (
  SELECT o.o_orderkey, o.o_orderdate, max(l.l_shipdate) AS ship_end
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
deltas AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym, 1 AS started, 0 AS shipped
  FROM spans
  UNION ALL
  SELECT strftime(ship_end, '%Y-%m') AS ym, 0 AS started, 1 AS shipped
  FROM spans
),
monthly AS (
  SELECT ym,
         CAST(sum(started) AS BIGINT) AS n_started,
         CAST(sum(shipped) AS BIGINT) AS n_shipped
  FROM deltas GROUP BY 1
)
SELECT ym AS month, n_started, n_shipped,
       CAST(sum(n_started - n_shipped)
            OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS backlog_eom
FROM monthly
ORDER BY month
"""


def q_monthly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of monthly order revenue: per
    calendar month (1..12), the mean ratio-to-trend across years, where
    trend is the 12-month moving average (5 preceding .. 6 following,
    partial at the series edges — both engines window the identical
    frame). A month with index > 1000 milli sells above its local trend
    — the seasonality read every demand forecast starts from.

    Exactness: revenue sums in exact cents; trend = window sum DIV
    window count (integral); ratio and the cross-year mean are integral
    milli quotients — no float anywhere.

    Scale shape: ONE order-date aggregation over the pruned orders scan
    (map-side combined to <= |months| groups); all window/ratio math
    runs on the bounded month relation (~84 rows at any sf — the
    calendar does not grow with the corpus, an adjudicated bounded
    window)."""
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym")
    ).agg(
        F.expr(
            "sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))"
        ).alias("cents")
    )
    w = W.orderBy("ym").rowsBetween(-5, 6)  # bounded calendar relation
    ratios = (
        monthly.withColumn("tsum", F.sum("cents").over(w))
        .withColumn("tcnt", F.count(F.lit(1)).over(w))
        .selectExpr(
            "CAST(substring(ym, 6, 2) AS INT) AS month",
            "CAST(cents * 1000 DIV (tsum DIV tcnt) AS BIGINT) AS ratio_milli",
        )
    )
    return (
        ratios.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_years"),
            F.expr("CAST(sum(ratio_milli) DIV count(1) AS BIGINT)").alias(
                "seasonal_index_milli"
            ),
        )
        .orderBy("month")
    )


ORACLE_MONTHLY_SEASONALITY = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
ratios AS (
  SELECT CAST(substr(ym, 6, 2) AS INT) AS month,
         CAST(cents * 1000 // (CAST(sum(cents) OVER w AS BIGINT)
              // count(*) OVER w) AS BIGINT) AS ratio_milli
  FROM monthly
  WINDOW w AS (ORDER BY ym ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_years,
       CAST(CAST(sum(ratio_milli) AS BIGINT) // count(*) AS BIGINT)
         AS seasonal_index_milli
FROM ratios
GROUP BY month
ORDER BY month
"""


def q_monthly_revenue_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled 1995 monthly revenue of urgent high-value orders per
    region. The 12-month spine is generated from date literals
    (``sequence`` + explode over a 1-row relation — no table scan) and
    crossed with the 5-row region dim (bnlj-allowlisted metadata cross);
    the sparse aggregated fact left-joins onto it, so months with no
    qualifying orders appear with n_orders = 0 / revenue = 0.00.

    Scale shape: the fact side is one filtered orders⋈customer join
    (both filters pushed to the orders scan) aggregated to at most
    |regions| x 12 rows BEFORE touching the spine; the spine join is a
    60-row broadcast. The spine itself is O(months x regions) whatever
    the corpus size."""
    od = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").between("1995-01-01", "1995-12-31"))
        & (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 350000)
    )
    cu = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    re = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    actual = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("o_totalprice")).alias("rev"),
        )
    )
    months = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(DATE'1995-01-01', DATE'1995-12-01', interval 1 month)"
            )
        ).alias("m")
    ).select(F.date_format("m", "yyyy-MM").alias("month"))
    spine = months.crossJoin(re.select(F.col("r_name").alias("region_name")))
    return (
        spine.join(F.broadcast(actual), ["region_name", "month"], "left")
        .select(
            "region_name",
            "month",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
            out2(F.coalesce(F.col("rev"), F.lit(0))).alias("revenue"),
        )
        .orderBy("region_name", "month")
    )


ORACLE_MONTHLY_SPINE = """
WITH actual AS (
  SELECT r.r_name AS region_name,
         strftime(o.o_orderdate, '%Y-%m') AS month,
         count(*) AS n,
         sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
    AND o.o_orderpriority = '1-URGENT'
    AND o.o_totalprice > 350000
  GROUP BY 1, 2
),
spine AS (
  SELECT r.r_name AS region_name,
         strftime(m.m, '%Y-%m') AS month
  FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-01',
                                      INTERVAL 1 MONTH)) AS m) m
  CROSS JOIN region r
)
SELECT s.region_name, s.month,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_orders,
       round(CAST(coalesce(a.rev, 0) AS DOUBLE), 2) AS revenue
FROM spine s LEFT JOIN actual a
  ON s.region_name = a.region_name AND s.month = a.month
ORDER BY s.region_name, s.month
"""


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier): the multi-objective "best tradeoffs" operator
# (cheapest part for its size class). The naive formulation is a quadratic
# NOT-EXISTS self-join; in 2-D it collapses to ONE sort + two window minima:
# a point survives iff no strictly-cheaper point is at most its size and it
# holds the size minimum among its own price tie-group. Mirrors the
# reference's ranked "best value" templates (sap_semantic_model.json GROUP BY
# + ORDER BY price families) generalized to two objectives.


def q_part_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto frontier over (retailprice, size), both minimized.

    Window recipe (no self-join): sort each brand by price cents; a part is
    dominated iff min(size) over strictly-cheaper rows <= its size (the
    cheaper row is already strictly better on price), or a same-price row
    has a strictly smaller size. Exact integer math (price in cents), so the
    quadratic NOT EXISTS oracle and this O(n log n) plan hash-match.

    Scale shape: one range exchange per brand partition; each partition is
    scanned once with two running minima — at 100 TB this is sort-partition
    work, not the all-pairs dominance join the textbook formulation implies."""
    part = table(spark, sf_dir, "part")
    pts = part.select(
        F.col("p_brand").alias("brand"),
        (money("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    w_cheaper = (
        W.partitionBy("brand")
        .orderBy("price_cents")
        .rangeBetween(W.unboundedPreceding, -1)
    )
    w_tie = W.partitionBy("brand", "price_cents")
    return (
        pts.withColumn("min_size_cheaper", F.min("size").over(w_cheaper))
        .withColumn("min_size_tie", F.min("size").over(w_tie))
        .filter(
            (
                F.col("min_size_cheaper").isNull()
                | (F.col("min_size_cheaper") > F.col("size"))
            )
            & (F.col("size") == F.col("min_size_tie"))
        )
        .groupBy("brand", "price_cents", "size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("brand", "price_cents", "size")
    )


ORACLE_PART_SKYLINE = """
WITH pts AS (
  SELECT p_brand AS brand,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
)
SELECT brand, price_cents, size, CAST(count(*) AS BIGINT) AS n_parts
FROM pts a
WHERE NOT EXISTS (
  SELECT 1 FROM pts b
  WHERE b.brand = a.brand
    AND b.price_cents <= a.price_cents AND b.size <= a.size
    AND (b.price_cents < a.price_cents OR b.size < a.size))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# FIFO allocation via cumulative-interval join: match a supply stream to a
# demand stream first-in-first-out WITHOUT an iterative loop. Each side gets
# a running-sum interval [cum - qty, cum); FIFO matched quantity between a
# supply row and a demand row is exactly the overlap of their intervals, so
# the whole allocation is one window pass per side plus one equi-join on the
# key with an interval-overlap residual. The classic imperative formulation
# is a per-key loop; this one is a declarative plan that shuffles once.


def q_fifo_return_reallocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand FIFO reallocation of returned stock to outstanding demand.

    Supply = returned lines (l_returnflag = 'R'), demand = regular lines
    ('N'), both per part in shipdate order (orderkey/linenumber tiebreak).
    Cumulative-quantity intervals turn FIFO matching into an interval
    overlap: matched = least(hi,hi) - greatest(lo,lo) when positive. All
    integer quantities — exact on both engines.

    Scale shape: two window passes partitioned by partkey, one partkey
    equi-join with the overlap as residual (NOT a BNLJ — the equi key
    carries the join), aggregate to part then brand grain. FIFO pair count
    per part is O(supply + demand), not O(supply x demand): consecutive
    cumulative intervals overlap only in a band."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_returnflag",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    w = W.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    ).rowsBetween(W.unboundedPreceding, 0)

    def intervals(flag: str, lo: str, hi: str) -> DataFrame:
        side = li.filter(F.col("l_returnflag") == flag)
        return side.withColumn(hi, F.sum("qty").over(w)).select(
            "l_partkey",
            (F.col(hi) - F.col("qty")).alias(lo),
            hi,
        )

    supply = intervals("R", "s_lo", "s_hi")
    demand = intervals("N", "d_lo", "d_hi").withColumnRenamed(
        "l_partkey", "d_partkey"
    )
    matched = (
        supply.join(
            demand,
            (F.col("l_partkey") == F.col("d_partkey"))
            & (F.col("s_lo") < F.col("d_hi"))
            & (F.col("d_lo") < F.col("s_hi")),
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo")
            ).alias("matched_qty")
        )
    )
    totals = (
        li.filter(F.col("l_returnflag").isin("R", "N"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", F.col("qty")).otherwise(0)).alias("supply_qty"),
            F.sum(F.when(F.col("l_returnflag") == "N", F.col("qty")).otherwise(0)).alias("demand_qty"),
        )
    )
    part = table(spark, sf_dir, "part").select(
        F.col("p_partkey"), F.col("p_brand").alias("brand")
    )
    per_part = totals.join(matched, "l_partkey", "left").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    return (
        per_part.groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("supply_qty").cast("bigint").alias("supply_qty"),
            F.sum("demand_qty").cast("bigint").alias("demand_qty"),
            F.sum(F.coalesce(F.col("matched_qty"), F.lit(0)))
            .cast("bigint")
            .alias("matched_qty"),
        )
        .withColumn(
            "fill_bp",
            F.expr(
                "CAST(matched_qty * 10000 DIV (CASE WHEN demand_qty = 0 THEN NULL ELSE demand_qty END) AS BIGINT)"
            ),
        )
        .orderBy("brand")
    )


ORACLE_FIFO_REALLOCATION = """
WITH base AS (
  SELECT l_partkey, l_returnflag, l_shipdate, l_orderkey, l_linenumber,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
),
supply AS (
  SELECT l_partkey,
         sum(qty) OVER w - qty AS s_lo, sum(qty) OVER w AS s_hi
  FROM base WHERE l_returnflag = 'R'
  WINDOW w AS (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING)
),
demand AS (
  SELECT l_partkey,
         sum(qty) OVER w - qty AS d_lo, sum(qty) OVER w AS d_hi
  FROM base WHERE l_returnflag = 'N'
  WINDOW w AS (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING)
),
matched AS (
  SELECT s.l_partkey,
         sum(least(s.s_hi, d.d_hi) - greatest(s.s_lo, d.d_lo)) AS matched_qty
  FROM supply s JOIN demand d
    ON s.l_partkey = d.l_partkey AND s.s_lo < d.d_hi AND d.d_lo < s.s_hi
  GROUP BY 1
),
totals AS (
  SELECT l_partkey,
         sum(CASE WHEN l_returnflag = 'R' THEN qty ELSE 0 END) AS supply_qty,
         sum(CASE WHEN l_returnflag = 'N' THEN qty ELSE 0 END) AS demand_qty
  FROM base GROUP BY 1
)
SELECT p.p_brand AS brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(t.supply_qty) AS BIGINT) AS supply_qty,
       CAST(sum(t.demand_qty) AS BIGINT) AS demand_qty,
       CAST(sum(coalesce(m.matched_qty, 0)) AS BIGINT) AS matched_qty,
       CAST(sum(coalesce(m.matched_qty, 0)) * 10000
            // nullif(sum(t.demand_qty), 0) AS BIGINT) AS fill_bp
FROM totals t
LEFT JOIN matched m ON t.l_partkey = m.l_partkey
JOIN part p ON t.l_partkey = p.p_partkey
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# blocked fuzzy similarity join: near-duplicate part names by edit distance.
# The all-pairs formulation is O(n^2) string comparisons; blocking on the
# brand plus a cheap length-band residual BEFORE the levenshtein call is the
# standard record-linkage shape (compare only within blocks, and let an O(1)
# length filter discard most of the block before the O(len^2) distance).


def q_part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate part-name pairs per brand (levenshtein <= 4),
    frequency-collapsed.

    Row-pair semantics (every ordered part pair a.pk < b.pk within a
    brand) — but the string comparisons run over DISTINCT (brand, name)
    groups and the counts multiply back: a cross-name match contributes
    cnt_a * cnt_b pairs, an exact-duplicate name contributes
    C(cnt, 2) = cnt*(cnt-1)/2 zero-distance pairs. The corpus has few
    distinct names per brand, so the quadratic work runs on the distinct
    grain (the raw-grain formulation was measured 13.7 s at sf0.1; this
    one is ~0.3 s for the identical result).

    Blocking: brand equi-key carries the join; the length band
    |len(a) - len(b)| <= 4 prunes before levenshtein — the band equals
    the distance threshold, and |len(a)-len(b)| is a LOWER bound on edit
    distance, so the pruning is exact (zero recall loss); name-order
    a.name < b.name replaces pk-order on the distinct grain.

    Scale shape at 100 TB: distinct-grain collapse IS the scale lever —
    fuzzy joins over natural-language fields always run on the
    deduplicated value domain with multiplicity weights, never the row
    stream (same trick as dedup_exact -> weighted rollup)."""
    part = table(spark, sf_dir, "part")
    names = (
        part.select(
            F.col("p_brand").alias("brand"),
            F.lower(F.col("p_name")).alias("name"),
        )
        .groupBy("brand", "name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("len", F.length("name"))
    )
    a, b = names.alias("a"), names.alias("b")
    cross = (
        a.join(
            b,
            (F.col("a.brand") == F.col("b.brand"))
            & (F.col("a.name") < F.col("b.name"))
            & (F.abs(F.col("a.len") - F.col("b.len")) <= 4),
        )
        .withColumn("dist", F.levenshtein(F.col("a.name"), F.col("b.name")))
        .filter(F.col("dist") <= 4)
        .select(
            F.col("a.brand").alias("brand"),
            "dist",
            (F.col("a.cnt") * F.col("b.cnt")).cast("bigint").alias("weight"),
        )
    )
    exact = names.filter(F.col("cnt") >= 2).select(
        "brand",
        F.lit(0).alias("dist"),
        (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("bigint").alias("weight"),
    )
    return (
        cross.unionByName(exact)
        .groupBy("brand")
        .agg(
            F.sum("weight").cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("dist") == 0, F.col("weight")).otherwise(0))
            .cast("bigint")
            .alias("n_exact"),
            F.min("dist").cast("bigint").alias("min_dist"),
            F.max("dist").cast("bigint").alias("max_dist"),
        )
        .orderBy("brand")
    )


ORACLE_PART_FUZZY = """
WITH names AS (
  SELECT p_brand AS brand, lower(p_name) AS name,
         count(*) AS cnt, length(lower(p_name)) AS len
  FROM part
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.brand, levenshtein(a.name, b.name) AS dist,
         a.cnt * b.cnt AS weight
  FROM names a JOIN names b
    ON a.brand = b.brand AND a.name < b.name AND abs(a.len - b.len) <= 4
  WHERE levenshtein(a.name, b.name) <= 4
  UNION ALL
  SELECT brand, 0 AS dist, cnt * (cnt - 1) // 2 AS weight
  FROM names WHERE cnt >= 2
)
SELECT brand,
       CAST(sum(weight) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN dist = 0 THEN weight ELSE 0 END) AS BIGINT)
         AS n_exact,
       CAST(min(dist) AS BIGINT) AS min_dist,
       CAST(max(dist) AS BIGINT) AS max_dist
FROM pairs
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration index: THE market-concentration
# statistic (sum of squared supplier shares). Exact in integer basis
# points: each share is quantized to bp by integral division first, so
# the squared sum is BIGINT arithmetic both engines reproduce bit-for-bit.


def q_supplier_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region supplier revenue concentration (HHI in bp^2 units).

    Supplier revenue = sum(extendedprice * (1 - discount)) in exact
    cents; share_bp = rev_cents * 10000 DIV region_total_cents; the HHI
    is sum(share_bp^2) plus the leader's share and supplier count — the
    antitrust-style concentration readout per market.

    Scale shape: one supplier-keyed aggregation over lineitem (the only
    corpus-sized shuffle), two broadcast dim hops to region, a 5-row
    regroup. The share window runs on the supplier-grain relation."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    re = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    disc = F.lit(1).cast(DEC4) - F.col("l_discount").cast(DEC4)
    per_sup = (
        li.groupBy("l_suppkey")
        .agg(
            # the 6-dp decimal sum scaled to integral micro-dollars —
            # *1e6 is exact (scale 6), so the BIGINT cast can never hit
            # an engine-specific fractional rounding rule
            F.expr(
                "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
                "* (CAST(1 AS DECIMAL(18,4)) "
                "- CAST(l_discount AS DECIMAL(18,4)))) * 1000000 AS BIGINT) "
                "DIV 1000"  # integral milli-dollars: *10000 headroom at any sf
            ).alias("milli")
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("r_name").alias("region"), "l_suppkey", "milli")
    )
    shares = per_sup.withColumn(
        "share_bp",
        F.expr("CAST(milli * 10000 DIV sum(milli) OVER "
               "(PARTITION BY region) AS BIGINT)"),
    )
    return (
        shares.groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum(F.col("share_bp") * F.col("share_bp"))
            .cast("bigint")
            .alias("hhi_bp2"),
            F.max("share_bp").cast("bigint").alias("top_share_bp"),
        )
        .orderBy("region")
    )


ORACLE_SUPPLIER_HHI = """
WITH per_sup AS (
  SELECT r.r_name AS region, l.l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,4))
                     - CAST(l_discount AS DECIMAL(18,4)))) * 1000000
              AS BIGINT) // 1000 AS milli
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
shares AS (
  SELECT region,
         CAST(milli * 10000 // sum(milli) OVER (PARTITION BY region)
              AS BIGINT) AS share_bp
  FROM per_sup
)
SELECT region,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(share_bp * share_bp) AS BIGINT) AS hhi_bp2,
       CAST(max(share_bp) AS BIGINT) AS top_share_bp
FROM shares
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# ABC (Pareto) inventory classification: parts bucketed A/B/C by cumulative
# revenue share (A <= 80%, B <= 95%, C rest). Same scale discipline as the
# customer Pareto: rank via the range-partitioned global rank (no global
# window over the part grain), then ALL cumulative math on a fixed
# 1000-bucket relation — class boundaries land at bucket resolution, which
# is what makes the plan identical at 2k parts and 2B parts.


def q_parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B/C revenue classes over parts (bucketed cumulative shares).

    Revenue per part in exact integral micro-dollars; parts ranked by
    (revenue desc, partkey); rank quantized to 1000 buckets; cumulative
    share computed over the 1000-row bucket relation; class assigned on
    the bucket's cumulative bp (A <= 8000, B <= 9500, C rest).

    Scale shape: one part-keyed aggregation over lineitem, one range
    exchange for the global rank, then constant-size bucket math."""
    from .ranks import with_global_rank

    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.expr(
            "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
            "* (CAST(1 AS DECIMAL(18,4)) "
            "- CAST(l_discount AS DECIMAL(18,4)))) * 1000000 AS BIGINT) "
            "DIV 1000"  # exact micro cast first, then integral milli —
            # keeps every downstream *10000 product under 2^63 at any sf
        ).alias("milli")
    ).select(
        "l_partkey", (F.col("milli") * -1).alias("neg_milli"), "milli"
    )
    # N rides out of the rank pass's own metadata collect (total_col) —
    # no second count() job over the ranked relation (r8 verdict nit)
    ranked = with_global_rank(
        per_part, "neg_milli", "l_partkey", rank_col="__r", total_col="__n"
    )
    buckets = (
        ranked.withColumn(
            "bucket", F.expr("CAST((__r - 1) * 1000 DIV __n + 1 AS BIGINT)")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("milli").cast("bigint").alias("milli"),
        )
    )
    w_all = W.partitionBy()
    w_cum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    classed = (
        buckets.withColumn("total", F.sum("milli").over(w_all))
        .withColumn("cum", F.sum("milli").over(w_cum))
        .withColumn("cum_bp", F.expr("CAST(cum * 10000 DIV total AS BIGINT)"))
        .withColumn(
            "abc_class",
            F.when(F.col("cum_bp") <= 8000, "A")
            .when(F.col("cum_bp") <= 9500, "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.sum("n_parts").cast("bigint").alias("n_parts"),
            F.sum("milli").alias("m"),
            F.max("total").alias("t"),
        )
        .selectExpr(
            "abc_class",
            "n_parts",
            "CAST(m * 10000 DIV t AS BIGINT) AS revenue_share_bp",
        )
        .orderBy("abc_class")
    )


ORACLE_PARTS_ABC = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,4))
                     - CAST(l_discount AS DECIMAL(18,4)))) * 1000000
              AS BIGINT) // 1000 AS milli
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT milli,
         row_number() OVER (ORDER BY milli DESC, l_partkey) AS r,
         count(*) OVER () AS n
  FROM per_part
),
buckets AS (
  SELECT CAST((r - 1) * 1000 // n + 1 AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_parts,
         CAST(sum(milli) AS BIGINT) AS milli
  FROM ranked GROUP BY 1
),
classed AS (
  SELECT n_parts, milli,
         CAST(sum(milli) OVER () AS BIGINT) AS total,
         CAST(sum(milli) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
              * 10000 // sum(milli) OVER () AS BIGINT) AS cum_bp
  FROM buckets
)
SELECT CASE WHEN cum_bp <= 8000 THEN 'A'
            WHEN cum_bp <= 9500 THEN 'B' ELSE 'C' END AS abc_class,
       CAST(sum(n_parts) AS BIGINT) AS n_parts,
       CAST(CAST(sum(milli) AS BIGINT) * 10000 // max(total) AS BIGINT)
         AS revenue_share_bp
FROM classed
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# customer spend Gini: how unequal is revenue across the customer base?
# The single-number companion to customer_revenue_pareto's curve — the
# Gini coefficient over per-customer lifetime spend, computed from the
# rank form G = (2 sum(i*x_i) - (n+1) sum(x)) / (n sum(x)) with x
# ascending. Spend is exact integer CENTS (the money() DECIMAL lane *
# 100), the rank comes from the range-exchange global-rank primitive
# (no single-partition window), and the coefficient is one integral
# quotient — plan-independent end to end.


def q_customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: customer count, total spend in cents, and the Gini
    coefficient of per-customer spend in permille (0 = equal, ->1000 =
    one customer is the book).

    Scale shape: one orders aggregation to the per-customer relation,
    the with_global_rank range exchange over it (each task ranks its
    range slice), one final integer aggregation. Ties order by
    (spend, custkey) on both engines."""
    from .ranks import with_global_rank

    orders = table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(money("o_totalprice") * 100).cast("decimal(38,0)")
        .cast("bigint")
        .alias("spend_cents")
    )
    ranked = with_global_rank(spend, "spend_cents", "o_custkey")
    return (
        ranked.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.expr("CAST(sum(CAST(spend_cents AS DECIMAL(38,0)))"
                   " AS DECIMAL(38,0))").alias("sx"),
            F.expr(
                "CAST(sum(CAST(rn AS DECIMAL(38,0)) * spend_cents)"
                " AS DECIMAL(38,0))"
            ).alias("six"),
        )
        .selectExpr(
            "n_customers",
            "CAST(sx AS BIGINT) AS total_spend_cents",
            "CAST((2 * six - (n_customers + 1) * sx) * 1000"
            " DIV nullif(n_customers * sx, 0) AS BIGINT) AS gini_permille",
        )
    )


ORACLE_CUSTOMER_SPEND_GINI = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
              AS BIGINT) AS spend_cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT spend_cents,
         CAST(row_number() OVER (ORDER BY spend_cents, o_custkey)
              AS BIGINT) AS rn
  FROM spend
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(spend_cents AS HUGEINT)) AS BIGINT)
         AS total_spend_cents,
       CAST((2 * sum(CAST(rn AS HUGEINT) * spend_cents)
             - (count(*) + 1) * sum(CAST(spend_cents AS HUGEINT))) * 1000
            // nullif(count(*) * sum(CAST(spend_cents AS HUGEINT)), 0)
            AS BIGINT) AS gini_permille
FROM ranked
"""


# ---------------------------------------------------------------------------
# ship-latency-on-quantity OLS: do BIG lines ship slower? The slope of
# order->ship latency (days) on line quantity, per order priority — the
# fulfillment question behind priority_ship_latency's percentiles. Same
# integer sufficient-statistics discipline as zipf_slope_fit (FLOATS.md
# class D here — both variables are already integers, so not even the
# ln quantization is needed): five DECIMAL(38,0) sums and one integral
# quotient, associative on any plan.


def q_ship_latency_qty_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per o_orderpriority: line count, mean latency in milli-days, and
    the OLS slope of latency on quantity in micro-days per unit.

    Scale shape: the one lineitem-orders key shuffle every fulfillment
    report pays, map-side-combined sufficient statistics, arithmetic on
    the |priorities|-row relation."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(l_quantity AS BIGINT)").alias("x"),
        F.col("l_shipdate").cast("date").alias("ship_d"),
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("order_d"),
    )
    pts = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        "o_orderpriority",
        "x",
        F.datediff(F.col("ship_d"), F.col("order_d"))
        .cast("bigint")
        .alias("y"),
    )
    stats = pts.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))")
        .alias("sx"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))")
        .alias("sy"),
        F.expr(
            "CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))"
        ).alias("sxy"),
        F.expr(
            "CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))"
        ).alias("sxx"),
    )
    return stats.selectExpr(
        "o_orderpriority",
        "CAST(n AS BIGINT) AS n_lines",
        "CAST(sy * 1000 DIV n AS BIGINT) AS mean_latency_milli_days",
        "CAST((n * sxy - sx * sy) * 1000000"
        " DIV nullif(n * sxx - sx * sx, 0) AS BIGINT)"
        " AS slope_micro_days_per_unit",
    ).orderBy("o_orderpriority")


ORACLE_SHIP_LATENCY_QTY_OLS = """
WITH pts AS (
  SELECT o_orderpriority,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) AS BIGINT) AS y
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
stats AS (
  SELECT o_orderpriority,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM pts GROUP BY 1
)
SELECT o_orderpriority,
       CAST(n AS BIGINT) AS n_lines,
       CAST(sy * 1000 // n AS BIGINT) AS mean_latency_milli_days,
       CAST((n * sxy - sx * sy) * 1000000
            // nullif(n * sxx - sx * sx, 0) AS BIGINT)
         AS slope_micro_days_per_unit
FROM stats
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# discount-quantity elasticity: does a deeper discount MOVE more units,
# per brand? The OLS slope of line quantity on the discount rate (basis
# points, the DEC4 rates lane made integer) — the pricing-team
# counterpart of ship_latency_qty_ols, same FLOATS.md class-D
# sufficient-statistics discipline: exact DECIMAL(38,0) sums, one
# integral quotient, associative on any plan.


def q_discount_qty_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per p_brand: line count, mean discount in basis points, mean
    quantity in milli-units, and the OLS slope of quantity on discount
    in micro-units per basis point.

    Scale shape: the lineitem-part key join (part broadcasts at dim
    scale; at fact-fact scale it shuffles on the key), map-side-combined
    sufficient statistics, arithmetic on the |brands|-row relation."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)")
        .alias("x"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("y"),
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).select("p_brand", "x", "y")
    stats = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))")
        .alias("sx"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))")
        .alias("sy"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))")
        .alias("sxy"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))")
        .alias("sxx"),
    )
    return stats.selectExpr(
        "p_brand",
        "CAST(n AS BIGINT) AS n_lines",
        "CAST(sx DIV n AS BIGINT) AS mean_discount_bp",
        "CAST(sy * 1000 DIV n AS BIGINT) AS mean_qty_milli",
        "CAST((n * sxy - sx * sy) * 1000000"
        " DIV nullif(n * sxx - sx * sx, 0) AS BIGINT)"
        " AS slope_micro_units_per_bp",
    ).orderBy("p_brand")


ORACLE_DISCOUNT_QTY_ELASTICITY = """
WITH pts AS (
  SELECT p_brand,
         CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
stats AS (
  SELECT p_brand,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM pts GROUP BY 1
)
SELECT p_brand,
       CAST(n AS BIGINT) AS n_lines,
       CAST(sx // n AS BIGINT) AS mean_discount_bp,
       CAST(sy * 1000 // n AS BIGINT) AS mean_qty_milli,
       CAST((n * sxy - sx * sy) * 1000000
            // nullif(n * sxx - sx * sx, 0) AS BIGINT)
         AS slope_micro_units_per_bp
FROM stats
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# weekday order profile: the operational heartbeat — order volume and
# revenue by ISO weekday (1 = Monday), the orders-side twin of
# events_weekday_hour_profile. Revenue stays in the exact DECIMAL cents
# lane until the integer output grid.


def q_orders_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per ISO weekday: order count, revenue cents, mean order cents,
    and the day's share of all orders in permille.

    Scale shape: one orders aggregation onto a 7-row relation (map-side
    combined); the share denominator is a constant-key window on those
    7 rows only."""
    orders = table(spark, sf_dir, "orders")
    agg = (
        orders.groupBy(
            (F.weekday(F.col("o_orderdate").cast("date")) + F.lit(1))
            .cast("bigint")
            .alias("weekday_iso")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(money("o_totalprice") * 100)
            .cast("decimal(38,0)")
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )
    return agg.selectExpr(
        "weekday_iso",
        "n_orders",
        "revenue_cents",
        "CAST(revenue_cents DIV n_orders AS BIGINT) AS mean_order_cents",
        "CAST(n_orders * 1000 DIV sum(n_orders) OVER () AS BIGINT)"
        " AS order_share_permille",
    ).orderBy("weekday_iso")


ORACLE_ORDERS_WEEKDAY_PROFILE = """
WITH agg AS (
  SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS weekday_iso,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1
)
SELECT weekday_iso, n_orders, revenue_cents,
       CAST(revenue_cents // n_orders AS BIGINT) AS mean_order_cents,
       CAST(n_orders * 1000 // sum(n_orders) OVER () AS BIGINT)
         AS order_share_permille
FROM agg
ORDER BY weekday_iso
"""


# ---------------------------------------------------------------------------
# same-day repeat orders: the duplicate-payment screen. Multiple orders
# by one customer on one date are the classic AP double-entry candidate
# (the reference's open-item hygiene templates ask exactly this class of
# question of BSEG/BKPF); the report lists each (customer, day) group
# with its order count, total cents, and the orderkey span so an
# auditor can pull the documents.


def q_orders_same_day_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, order day, n_orders, total_cents, min/max orderkey)
    for every customer-day with more than one order, busiest first.

    Scale shape: ONE orders aggregation on the (custkey, day) grain
    (map-side combined), HAVING on the aggregate — no join, no window;
    output is the anomaly set only."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            "o_custkey",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")
            .alias("order_day"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(money("o_totalprice") * 100)
            .cast("decimal(38,0)")
            .cast("bigint")
            .alias("total_cents"),
            F.min("o_orderkey").cast("bigint").alias("min_orderkey"),
            F.max("o_orderkey").cast("bigint").alias("max_orderkey"),
        )
        .filter(F.col("n_orders") > 1)
        .orderBy(
            F.col("n_orders").desc(), "o_custkey", "order_day"
        )
    )


ORACLE_ORDERS_SAME_DAY_REPEATS = """
SELECT o_custkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_day,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
         AS total_cents,
       CAST(min(o_orderkey) AS BIGINT) AS min_orderkey,
       CAST(max(o_orderkey) AS BIGINT) AS max_orderkey
FROM orders
GROUP BY 1, 2
HAVING count(*) > 1
ORDER BY n_orders DESC, o_custkey, order_day
"""


# ---------------------------------------------------------------------------
# priority x order-size chi-square: are big orders more urgent? The
# contingency-table independence test between o_orderpriority and the
# order-size bucket (total cents in decimal bands), with the chi-square
# contribution per cell in milli: chi2_cell = (O*N - R*C)^2 * 1000 DIV
# (N * R * C) — an exact integral quotient per cell (quantization at
# the cell boundary, the class-A/D recipe), summed over the bounded
# |priorities| x |buckets| grid. A large statistic reads "priority is
# not assigned independently of size" — the kind of schema-semantics
# probe the reference's NL layer answers qualitatively, here as data.

CHISQ_BUCKET_CENTS = 10_000_00  # 10k-dollar order-size bands, capped below

CHISQ_MAX_BUCKET = 4


def q_order_size_priority_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (priority, size bucket) cell: observed count, the
    independence-expected count in milli, and the cell's chi-square
    contribution in milli; the grid total (the statistic) and N repeat
    on every row so the relation is self-contained.

    Scale shape: one orders aggregation onto the bounded grid, then the
    margins and the statistic as constant-key windows on that grid."""
    orders = table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        "o_orderpriority",
        F.expr(
            f"least(CAST(CAST(o_totalprice AS {DEC}) * 100 AS BIGINT)"
            f" DIV {CHISQ_BUCKET_CENTS}, {CHISQ_MAX_BUCKET})"
        )
        .cast("bigint")
        .alias("size_bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    wp = W.partitionBy("o_orderpriority")
    wb = W.partitionBy("size_bucket")
    wall = W.partitionBy()
    grid = cells.select(
        "o_orderpriority",
        "size_bucket",
        "observed",
        F.sum("observed").over(wp).cast("bigint").alias("r"),
        F.sum("observed").over(wb).cast("bigint").alias("c"),
        F.sum("observed").over(wall).cast("bigint").alias("n"),
    )
    # cast observed/r to DECIMAL(38,0) BEFORE the n-scale multiply (the
    # class-A cast-before-multiply convention): observed*n is n^2-scale,
    # which overflows BIGINT past ~3e9 orders if multiplied first.
    # Residual headroom (r13 ADVICE): diff is n^2-scale, so diff^2*1000
    # is n^4*1e3-scale — DECIMAL(38,0) holds to worst-case-skew
    # n ~ 1e9 orders (38 digits / 4 ≈ 9.6 - log10(1000)/4). Past that
    # the non-ANSI Spark session NULLs silently where DuckDB HUGEINT
    # (~1e38) errors; the oracle gate's mismatch is the loud failure.
    diff = (
        "(CAST(observed AS DECIMAL(38,0)) * n"
        " - CAST(r AS DECIMAL(38,0)) * c)"
    )
    contrib = (
        f"{diff} * {diff} * 1000"
        " DIV (CAST(n AS DECIMAL(38,0)) * r * c)"
    )
    return (
        grid.selectExpr(
            "o_orderpriority",
            "size_bucket",
            "observed",
            "CAST(CAST(r AS DECIMAL(38,0)) * c * 1000 DIV n AS BIGINT)"
            " AS expected_milli",
            f"CAST({contrib} AS BIGINT) AS chi2_cell_milli",
            "n AS n_orders",
        )
        .withColumn(
            "chi2_total_milli",
            F.sum("chi2_cell_milli").over(wall).cast("bigint"),
        )
        .orderBy("o_orderpriority", "size_bucket")
    )


ORACLE_ORDER_SIZE_PRIORITY_CHISQ = f"""
WITH cells AS (
  SELECT o_orderpriority,
         CAST(least(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              // {CHISQ_BUCKET_CENTS}, {CHISQ_MAX_BUCKET}) AS BIGINT)
           AS size_bucket,
         CAST(count(*) AS BIGINT) AS observed
  FROM orders GROUP BY 1, 2
),
grid AS (
  SELECT o_orderpriority, size_bucket, observed,
         CAST(sum(observed) OVER (PARTITION BY o_orderpriority) AS BIGINT)
           AS r,
         CAST(sum(observed) OVER (PARTITION BY size_bucket) AS BIGINT) AS c,
         CAST(sum(observed) OVER () AS BIGINT) AS n
  FROM cells
)
SELECT o_orderpriority, size_bucket, observed,
       CAST(CAST(r AS HUGEINT) * c * 1000 // n AS BIGINT) AS expected_milli,
       CAST((CAST(observed AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
            * (CAST(observed AS HUGEINT) * n - CAST(r AS HUGEINT) * c) * 1000
            // (CAST(n AS HUGEINT) * r * c) AS BIGINT) AS chi2_cell_milli,
       n AS n_orders,
       CAST(sum(CAST((CAST(observed AS HUGEINT) * n
                      - CAST(r AS HUGEINT) * c)
                     * (CAST(observed AS HUGEINT) * n
                        - CAST(r AS HUGEINT) * c) * 1000
                     // (CAST(n AS HUGEINT) * r * c) AS BIGINT))
            OVER () AS BIGINT) AS chi2_total_milli
FROM grid
ORDER BY o_orderpriority, size_bucket
"""


# ---------------------------------------------------------------------------
# part-supplier bipartite degrees: how concentrated is the sourcing
# graph? The degree histogram of BOTH sides of the observed
# part-supplier relationship (distinct pairs from lineitem — the
# testdata has no partsupp table, so the traded graph IS the sourcing
# surface): single-sourced parts are supply risks
# (parts_sourcing_risk's aggregate view, here as the full spectrum),
# one-part suppliers are integration long-tail.


def q_part_supplier_degree_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(side, degree, n_keys): for side 'suppliers_per_part' how many
    parts have exactly `degree` distinct suppliers, and symmetrically
    for 'parts_per_supplier'.

    Scale shape: one distinct-pair aggregation of lineitem (the edge
    list, map-side combined), then two tiny regroups of the edge
    relation — the histogram relation is bounded by the max degree."""
    li = table(spark, sf_dir, "lineitem")
    edges = li.select("l_partkey", "l_suppkey").distinct()
    per_part = (
        edges.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
        .selectExpr(
            "'suppliers_per_part' AS side", "degree", "n_keys"
        )
    )
    per_supp = (
        edges.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
        .selectExpr(
            "'parts_per_supplier' AS side", "degree", "n_keys"
        )
    )
    return per_part.unionByName(per_supp).orderBy("side", "degree")


ORACLE_PART_SUPPLIER_DEGREE_HISTOGRAM = """
WITH edges AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
pp AS (
  SELECT 'suppliers_per_part' AS side, degree,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM (SELECT l_partkey, CAST(count(*) AS BIGINT) AS degree
        FROM edges GROUP BY 1)
  GROUP BY 2
),
ps AS (
  SELECT 'parts_per_supplier' AS side, degree,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS degree
        FROM edges GROUP BY 1)
  GROUP BY 2
)
SELECT * FROM pp UNION ALL SELECT * FROM ps
ORDER BY side, degree
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit: fraud/synthetic-data screens compare the
# first-significant-digit distribution of a monetary column against
# Benford's law, P(d) = log10(1 + 1/d). The expected permille values
# are MATHEMATICAL CONSTANTS folded as integer literals (floor of
# 1000*log10(1+1/d) — the frozen-artifact convention applied to a
# closed form, so no engine ever evaluates a transcendental): on this
# synthetic corpus prices are uniform-ish, so the deviations are LARGE
# — the honest answer, hashed as-is (the flat-marker-density
# convention).

BENFORD_PERMILLE = (301, 176, 124, 96, 79, 66, 57, 51, 45)


def q_lineitem_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(digit, observed, n_items, observed_permille, benford_permille,
    abs_dev_permille) for first digits 1..9 of l_extendedprice in cents.
    First digit via the STRING head of the BIGINT cents — identical,
    locale-free rendering on both engines (no float log10).

    Scale shape: one pushed-down single-column scan, a 9-row hash
    aggregation with map-side combine, then window totals over the
    9-row relation. Nothing after the map phase scales with data."""
    li = table(spark, sf_dir, "lineitem")
    bexpr = " ".join(
        f"WHEN {d + 1} THEN {p}" for d, p in enumerate(BENFORD_PERMILLE)
    )
    digits = li.selectExpr(
        "CAST(substr(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * 100 AS BIGINT) AS STRING), 1, 1) AS BIGINT) AS digit"
    ).groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    return (
        digits.withColumn(
            "n_items",
            F.sum("observed").over(W.partitionBy()).cast("bigint"),
        )
        .selectExpr(
            "digit",
            "observed",
            "n_items",
            "CAST(observed * 1000 DIV n_items AS BIGINT)"
            " AS observed_permille",
            f"CAST(CASE digit {bexpr} END AS BIGINT) AS benford_permille",
            f"CAST(abs(observed * 1000 DIV n_items"
            f" - CASE digit {bexpr} END) AS BIGINT) AS abs_dev_permille",
        )
        .orderBy("digit")
    )


def _oracle_benford() -> str:
    bexpr = " ".join(
        f"WHEN {d + 1} THEN {p}" for d, p in enumerate(BENFORD_PERMILLE)
    )
    return f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS observed
  FROM lineitem GROUP BY 1
),
tot AS (
  SELECT digit, observed, CAST(sum(observed) OVER () AS BIGINT) AS n_items
  FROM digits
)
SELECT digit, observed, n_items,
       CAST(observed * 1000 // n_items AS BIGINT) AS observed_permille,
       CAST(CASE digit {bexpr} END AS BIGINT) AS benford_permille,
       CAST(abs(observed * 1000 // n_items
                - CASE digit {bexpr} END) AS BIGINT) AS abs_dev_permille
FROM tot
ORDER BY digit
"""


ORACLE_LINEITEM_BENFORD_DIGITS = _oracle_benford()


# ---------------------------------------------------------------------------
# One-way ANOVA across brands: does brand explain retail price? The
# F-statistic from the sum-of-squares identity SST = SSB + SSW with
# every term an exact integer in cents² (SSB = sum_g S_g²/n_g - S²/n,
# computed with one truncating DIV per term, identical on both
# engines) — the chi-square report's continuous-response sibling.

ANOVA_SCALE = 1000  # milli grid for the F statistic


def q_part_brand_price_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (k_brands, n_parts, ssb_cents2, ssw_cents2, f_milli) for
    p_retailprice (cents) grouped by p_brand. All sums accumulate in
    DECIMAL(38,0) (cents² at 1e10 scale per part; cast-before-multiply
    throughout), divisions truncate identically on both engines.

    Scale shape: one pushed-down two-column scan of part, a per-brand
    aggregation (25 groups, map-side combined), then a single-row
    reduce of the 25-row relation. Nothing post-map scales with data."""
    part = table(spark, sf_dir, "part")
    per_brand = (
        part.selectExpr(
            "p_brand",
            "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS cents",
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ng"),
            F.expr("sum(CAST(cents AS DECIMAL(38,0)))").alias("sg"),
            F.expr(
                "sum(CAST(cents AS DECIMAL(38,0)) * cents)"
            ).alias("sq"),
        )
    )
    return per_brand.selectExpr(
        "CAST(count(*) AS BIGINT) AS k",
        "CAST(sum(ng) AS BIGINT) AS n",
        "sum(sg * sg DIV ng) AS between_raw",
        "sum(sg) AS s_all",
        "sum(sq) AS sq_all",
    ).selectExpr(
        "k AS k_brands",
        "n AS n_parts",
        "CAST(between_raw - s_all * s_all DIV n AS BIGINT) AS ssb_cents2",
        "CAST(sq_all - between_raw AS BIGINT) AS ssw_cents2",
        f"CAST((between_raw - s_all * s_all DIV n) DIV (k - 1)"
        f" * {ANOVA_SCALE} DIV ((sq_all - between_raw) DIV (n - k))"
        " AS BIGINT) AS f_milli",
    )


ORACLE_PART_BRAND_PRICE_ANOVA = f"""
WITH per_brand AS (
  SELECT p_brand,
         CAST(count(*) AS BIGINT) AS ng,
         sum(CAST(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS HUGEINT)) AS sg,
         sum(CAST(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS HUGEINT)
             * CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS sq
  FROM part GROUP BY 1
),
red AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(ng) AS BIGINT) AS n,
         sum(sg * sg // ng) AS between_raw,
         sum(sg) AS s_all,
         sum(sq) AS sq_all
  FROM per_brand
)
SELECT k AS k_brands,
       n AS n_parts,
       CAST(between_raw - s_all * s_all // n AS BIGINT) AS ssb_cents2,
       CAST(sq_all - between_raw AS BIGINT) AS ssw_cents2,
       CAST((between_raw - s_all * s_all // n) // (k - 1)
            * {ANOVA_SCALE} // ((sq_all - between_raw) // (n - k))
        AS BIGINT) AS f_milli
FROM red
"""


# ---------------------------------------------------------------------------
# Customer re-order cadence: the distribution of gaps between a
# customer's consecutive orders, bucketed by week and capped — the
# retention planner's histogram (repeat_rate's time-axis complement).

GAP_BUCKET_DAYS = 7
GAP_MAX_BUCKET = 52


def q_customer_order_gap_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(gap_weeks, n_gaps, n_customers): how many consecutive-order
    gaps land in each capped week bucket, and how many distinct
    customers contribute one.

    Scale shape: ONE shuffle by custkey for the lag window (date +
    orderkey tiebreak, deterministic), then a bounded-bucket hash
    aggregation — the histogram relation is <= 53 rows."""
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
        .selectExpr(
            "o_custkey",
            f"least(CAST(datediff(o_orderdate, prev_date) AS BIGINT)"
            f" DIV {GAP_BUCKET_DAYS}, {GAP_MAX_BUCKET}) AS gap_weeks",
        )
    )
    return (
        gaps.groupBy("gap_weeks")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        )
        .orderBy("gap_weeks")
    )


ORACLE_CUSTOMER_ORDER_GAP_HISTOGRAM = f"""
WITH raw AS (
  SELECT o_custkey,
         CAST(date_diff('day',
              lag(o_orderdate) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey),
              o_orderdate) AS BIGINT) AS g
  FROM orders
),
-- NULL g (a customer's first order) must drop BEFORE least():
-- DuckDB's least() ignores NULL arguments instead of propagating
gaps AS (
  SELECT o_custkey, least(g // {GAP_BUCKET_DAYS}, {GAP_MAX_BUCKET})
           AS gap_weeks
  FROM raw WHERE g IS NOT NULL
)
SELECT gap_weeks, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM gaps
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Mann-Whitney U: do high-priority orders have a different price
# distribution than the rest? The rank-sum test computed EXACTLY from a
# pre-aggregated value histogram — never from per-row global ranks.

MW_GROUP_A = ("1-URGENT", "2-HIGH")


def q_orders_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: group sizes, the DOUBLED U statistic for group A
    (doubling keeps tie-averaged ranks integral), the rank-biserial
    AUC in permille, and the tie-corrected z^2 in milli.

    Exactness: prices collapse to an exact cents histogram first; the
    doubled average rank of a value is 2*cum_before + cnt + 1 (an
    integer even for tied ranks), so R2A = sum(na * that) and
    u2_a = R2A - n_a*(n_a+1) are exact integers, as is the tie term
    sum(t^3 - t). auc_permille = u2_a*500 DIV (n_a*n_b) (dividend
    nonneg; matched truncation per FLOATS.md rule 6). z^2 alone is
    class B: one closed-form double chain over those exact integers,
    identical expression tree on both engines, floored at milli.

    Scale shape: ONE corpus-sized shuffle (the cents histogram), then
    the global cumulative count runs through with_global_prefix_sum
    (range exchange + per-partition windows — NO single-task global
    window even with billions of distinct prices), and the final
    reduce is a 1-row aggregate."""
    from .ranks import with_global_prefix_sum

    orders = table(spark, sf_dir, "orders")
    grp_a = ", ".join(f"'{g}'" for g in MW_GROUP_A)
    hist = (
        orders.selectExpr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
            f"CASE WHEN o_orderpriority IN ({grp_a}) THEN 1 ELSE 0 END AS in_a",
        )
        .groupBy("cents")
        .agg(
            F.sum("in_a").cast("bigint").alias("na"),
            F.sum(F.expr("1 - in_a")).cast("bigint").alias("nb"),
        )
        .withColumn("cnt", (F.col("na") + F.col("nb")).cast("bigint"))
    )
    ranked = with_global_prefix_sum(hist, "cnt", "cents", sum_col="cum")
    agg = ranked.selectExpr(
        "na",
        "nb",
        # doubled tie-averaged rank sum contribution of this value
        "CAST(na AS DECIMAL(38,0)) * (2 * (cum - cnt) + cnt + 1) AS r2a_term",
        "CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt AS tie_term",
    ).agg(
        F.sum("na").cast("bigint").alias("n_a"),
        F.sum("nb").cast("bigint").alias("n_b"),
        F.sum("r2a_term").alias("r2a"),
        F.sum("tie_term").alias("ties"),
    )
    return agg.selectExpr(
        "n_a",
        "n_b",
        "CAST(r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1) AS BIGINT) AS u2_a",
        "CAST((r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)) * 500"
        " DIV nullif(CAST(n_a AS DECIMAL(38,0)) * n_b, 0) AS BIGINT)"
        " AS auc_permille",
        # class-B double chain: n^6-scale intermediates would burst the
        # 38-digit grid past n ~ 2e6, so z^2 runs in IEEE doubles over
        # the exact integer aggregates — the SAME expression tree on
        # both engines (the cos_micro/z_score precedent, FLOATS.md)
        "CAST(floor(3000.0"
        " * CAST(r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)"
        "        - CAST(n_a AS DECIMAL(38,0)) * n_b AS DOUBLE)"
        " * CAST(r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)"
        "        - CAST(n_a AS DECIMAL(38,0)) * n_b AS DOUBLE)"
        " * CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE)"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
        "    * nullif(CAST(CAST(n_a + n_b + 1 AS DECIMAL(38,0))"
        "             * (n_a + n_b) * (n_a + n_b - 1) - ties AS DOUBLE), 0.0))"
        ") AS BIGINT) AS z2_milli",
    )


ORACLE_ORDERS_MANNWHITNEY_U = f"""
WITH hist AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(sum(CASE WHEN o_orderpriority IN
                  ({", ".join(f"'{g}'" for g in MW_GROUP_A)}) THEN 1 ELSE 0 END)
              AS BIGINT) AS na,
         CAST(sum(CASE WHEN o_orderpriority IN
                  ({", ".join(f"'{g}'" for g in MW_GROUP_A)}) THEN 0 ELSE 1 END)
              AS BIGINT) AS nb
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT na, nb, na + nb AS cnt,
         sum(na + nb) OVER (ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
agg AS (
  SELECT CAST(sum(na) AS BIGINT) AS n_a,
         CAST(sum(nb) AS BIGINT) AS n_b,
         sum(CAST(na AS HUGEINT) * (2 * (cum - cnt) + cnt + 1)) AS r2a,
         sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS ties
  FROM ranked
)
SELECT n_a, n_b,
       CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a,
       CAST((r2a - CAST(n_a AS HUGEINT) * (n_a + 1)) * 500
            // nullif(CAST(n_a AS HUGEINT) * n_b, 0) AS BIGINT)
         AS auc_permille,
       CAST(floor(3000.0
         * CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1)
                - CAST(n_a AS HUGEINT) * n_b AS DOUBLE)
         * CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1)
                - CAST(n_a AS HUGEINT) * n_b AS DOUBLE)
         * CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE)
         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
            * nullif(CAST(CAST(n_a + n_b + 1 AS HUGEINT)
                     * (n_a + n_b) * (n_a + n_b - 1) - ties AS DOUBLE), 0.0))
       ) AS BIGINT) AS z2_milli
FROM agg
"""


# ---------------------------------------------------------------------------
# Bowley (quartile) skewness of account balances per market segment —
# a robust asymmetry readout over a SIGNED money column (balances go
# negative), from exact type-1 quartiles on the cents histogram.


def q_customer_acctbal_bowley_skew(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(segment, n_customers, q1/q2/q3 cents, iqr_cents, skew_permille):
    Bowley skewness (q3 + q1 - 2*q2) * 1000 / (q3 - q1) from exact
    type-1 lower quartiles (smallest value whose cumulative count
    reaches the k/4 mark, compared cross-multiplied as cum*4 >= k*n).

    The skew dividend is SIGNED (balances are); both engines use plain
    truncating division (Spark DIV == DuckDB BIGINT //), the matched
    convention of FLOATS.md rule 6.

    Scale shape: the per-customer scan collapses to a (segment, cents)
    HISTOGRAM first; the cumulative window is segment-partitioned over
    that compact relation (the docs_length_outliers recipe); quartile
    extraction is three filtered mins regrouped per segment."""
    cust = table(spark, sf_dir, "customer")
    hist = (
        cust.selectExpr(
            "c_mktsegment AS segment",
            "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
        )
        .groupBy("segment", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w_seg = (
        W.partitionBy("segment")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    n = hist.groupBy("segment").agg(F.sum("c").cast("bigint").alias("n"))
    cum = hist.withColumn("cum", F.sum("c").over(w_seg)).join(
        F.broadcast(n), "segment"
    )
    qs = (
        cum.groupBy("segment")
        .agg(
            F.max("n").alias("n_customers"),
            F.min(F.when(F.col("cum") * 4 >= F.col("n"), F.col("cents")))
            .alias("q1_cents"),
            F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("cents")))
            .alias("q2_cents"),
            F.min(F.when(F.col("cum") * 4 >= 3 * F.col("n"), F.col("cents")))
            .alias("q3_cents"),
        )
    )
    return qs.selectExpr(
        "segment",
        "n_customers",
        "q1_cents",
        "q2_cents",
        "q3_cents",
        "q3_cents - q1_cents AS iqr_cents",
        "CAST((q3_cents + q1_cents - 2 * q2_cents) * 1000"
        " DIV nullif(q3_cents - q1_cents, 0) AS BIGINT) AS skew_permille",
    ).orderBy("segment")


ORACLE_CUSTOMER_ACCTBAL_BOWLEY_SKEW = """
WITH hist AS (
  SELECT c_mktsegment AS segment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS c
  FROM customer GROUP BY 1, 2
),
cum AS (
  SELECT segment, cents, c,
         sum(c) OVER (PARTITION BY segment ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY segment) AS n
  FROM hist
),
qs AS (
  SELECT segment,
         CAST(max(n) AS BIGINT) AS n_customers,
         min(CASE WHEN cum * 4 >= n THEN cents END) AS q1_cents,
         min(CASE WHEN cum * 2 >= n THEN cents END) AS q2_cents,
         min(CASE WHEN cum * 4 >= 3 * n THEN cents END) AS q3_cents
  FROM cum GROUP BY 1
)
SELECT segment, n_customers, q1_cents, q2_cents, q3_cents,
       q3_cents - q1_cents AS iqr_cents,
       CAST((q3_cents + q1_cents - 2 * q2_cents) * 1000
            // nullif(q3_cents - q1_cents, 0) AS BIGINT) AS skew_permille
FROM qs
ORDER BY segment
"""


# ---------------------------------------------------------------------------
# Theil T inequality index of supplier revenues, with the between-nation
# component — "how concentrated is supply, and how much of that is
# geography?" in one exact readout.


def q_supplier_revenue_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: supplier/nation counts and Theil T total + between-nation
    component, both in integer micro-nats.

    T = sum_i (x_i/X) ln(x_i * n / X); between = sum_g (X_g/X) ln((X_g/X)
    / (n_g/n)). Determinism (FLOATS.md class C): ONE ln per supplier row
    (and one per nation row) on the exact milli-revenue rational,
    floor-quantized to micro-nats; weighted sums accumulate in
    DECIMAL(38,0)/HUGEINT; the final division uses the SPELLED-OUT FLOOR
    IDENTITY on both engines — T >= 0 by Jensen but per-term
    quantization can dip the numerator a few micro below zero when the
    distribution is near-uniform, exactly the signed-dividend case of
    FLOATS.md rule 6.

    Scale shape: one supplier-keyed aggregation over lineitem (the only
    corpus-sized shuffle), a broadcast dim hop to nation, a |nations|
    regroup; the 1-row (n, X) totals attach is a broadcast scalar
    (BNLJ-allowlisted class)."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    per_sup = (
        li.groupBy("l_suppkey")
        .agg(
            F.expr(
                "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
                "* (CAST(1 AS DECIMAL(18,4)) "
                "- CAST(l_discount AS DECIMAL(18,4)))) * 1000000 AS BIGINT) "
                "DIV 1000"
            ).alias("milli")
        )
        .filter(F.col("milli") > 0)
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_suppkey", "s_nationkey", "milli")
    )
    tot = per_sup.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("milli").cast("decimal(38,0)").alias("x_total"),
    )
    sup_terms = per_sup.crossJoin(F.broadcast(tot)).selectExpr(
        "n",
        "x_total",
        "CAST(milli AS DECIMAL(38,0))"
        " * CAST(floor(ln(CAST(milli AS DOUBLE) * CAST(n AS DOUBLE)"
        "               / CAST(x_total AS DOUBLE)) * 1000000) AS BIGINT)"
        " AS w",
    )
    total_row = sup_terms.groupBy().agg(
        F.max("n").alias("n_suppliers"),
        F.max("x_total").alias("x_total"),
        F.sum("w").alias("num"),
    )
    per_nation = per_sup.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("milli").cast("decimal(38,0)").alias("x_g"),
    )
    nation_terms = per_nation.crossJoin(F.broadcast(tot)).selectExpr(
        "x_g"
        " * CAST(floor(ln((CAST(x_g AS DOUBLE) * CAST(n AS DOUBLE))"
        "               / (CAST(x_total AS DOUBLE) * CAST(n_g AS DOUBLE)))"
        "         * 1000000) AS BIGINT) AS wb",
    )
    between_row = nation_terms.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nations"),
        F.sum("wb").alias("numb"),
    )
    return total_row.crossJoin(F.broadcast(between_row)).selectExpr(
        "n_suppliers",
        "n_nations",
        # floor identity on BOTH engines (rule 6): num can dip negative
        "CAST((num - ((num % x_total + x_total) % x_total)) DIV x_total"
        " AS BIGINT) AS theil_total_micro",
        "CAST((numb - ((numb % x_total + x_total) % x_total)) DIV x_total"
        " AS BIGINT) AS theil_between_micro",
    )


ORACLE_SUPPLIER_REVENUE_THEIL = """
WITH per_sup AS (
  SELECT l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,4))
                     - CAST(l_discount AS DECIMAL(18,4)))) * 1000000
              AS BIGINT) // 1000 AS milli
  FROM lineitem GROUP BY 1
),
pos AS (
  SELECT p.l_suppkey, s.s_nationkey, p.milli
  FROM per_sup p JOIN supplier s ON p.l_suppkey = s.s_suppkey
  WHERE p.milli > 0
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(milli) AS HUGEINT) AS x_total
  FROM pos
),
sup_terms AS (
  SELECT t.n, t.x_total,
         CAST(p.milli AS HUGEINT)
           * CAST(floor(ln(CAST(p.milli AS DOUBLE) * CAST(t.n AS DOUBLE)
                           / CAST(t.x_total AS DOUBLE)) * 1000000)
                  AS BIGINT) AS w
  FROM pos p, tot t
),
total_row AS (
  SELECT max(n) AS n_suppliers, max(x_total) AS x_total,
         CAST(sum(w) AS HUGEINT) AS num
  FROM sup_terms
),
per_nation AS (
  SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(milli) AS HUGEINT) AS x_g
  FROM pos GROUP BY 1
),
between_row AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nations,
         CAST(sum(p.x_g
           * CAST(floor(ln((CAST(p.x_g AS DOUBLE) * CAST(t.n AS DOUBLE))
                           / (CAST(t.x_total AS DOUBLE)
                              * CAST(p.n_g AS DOUBLE))) * 1000000)
                  AS BIGINT)) AS HUGEINT) AS numb
  FROM per_nation p, tot t
)
SELECT CAST(t.n_suppliers AS BIGINT) AS n_suppliers,
       CAST(b.n_nations AS BIGINT) AS n_nations,
       CAST((t.num - ((t.num % t.x_total + t.x_total) % t.x_total))
            // t.x_total AS BIGINT) AS theil_total_micro,
       CAST((b.numb - ((b.numb % t.x_total + t.x_total) % t.x_total))
            // t.x_total AS BIGINT) AS theil_between_micro
FROM total_row t, between_row b
"""


# ---------------------------------------------------------------------------
# Kendall tau-b between part size and retail-price bucket, exactly, from
# the bounded (size, bucket) contingency grid — the ordinal-association
# question ("do bigger parts cost more?") that Pearson-style moments
# answer badly on ordinal scales.


def q_part_size_price_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: part/cell counts, exact concordant/discordant pair
    counts, and Kendall tau-b in milli.

    The contingency cells are GRID-BOUNDED (p_size x $10 price buckets
    — data-independent cardinality), so the cell-pair inequality join
    is a metadata-sized nested loop (BNLJ-allowlisted class). C and D
    are exact DECIMAL(38,0) sums of n1*n2 over strictly-ordered cell
    pairs; tie terms come from the marginals. tau_b alone is class B:
    one sqrt over the exact integers, identical tree both engines,
    floored at milli.

    Scale shape: ONE corpus-sized aggregation (part -> cells), then
    everything runs on the bounded grid."""
    from ..cachereg import cache_eager

    part = table(spark, sf_dir, "part")
    cells = (
        part.selectExpr(
            "p_size AS s",
            "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 1000 AS b",
        )
        .groupBy("s", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    cells = cache_eager(cells)
    a = cells.selectExpr("s AS s1", "b AS b1", "n AS n1")
    bb = cells.selectExpr("s AS s2", "b AS b2", "n AS n2")
    pairs = a.join(F.broadcast(bb), F.expr("s1 < s2")).selectExpr(
        "CASE WHEN b1 < b2 THEN CAST(n1 AS DECIMAL(38,0)) * n2 ELSE 0 END AS c_term",
        "CASE WHEN b1 > b2 THEN CAST(n1 AS DECIMAL(38,0)) * n2 ELSE 0 END AS d_term",
    )
    # coalesce: a single-cell grid has NO strictly-ordered pairs, and a
    # sum over the empty relation is NULL on both engines — the counts
    # are genuinely zero
    cd = pairs.groupBy().agg(
        F.coalesce(F.sum("c_term"), F.lit(0).cast("decimal(38,0)"))
        .alias("concordant_d"),
        F.coalesce(F.sum("d_term"), F.lit(0).cast("decimal(38,0)"))
        .alias("discordant_d"),
    )
    marg = cells.crossJoin(
        F.broadcast(
            cells.groupBy().agg(F.sum("n").cast("decimal(38,0)").alias("n_parts"))
        )
    )
    ties = marg.groupBy().agg(
        F.max("n_parts").alias("n_parts"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    tr = (
        cells.groupBy("s")
        .agg(F.sum("n").cast("decimal(38,0)").alias("nr"))
        .selectExpr("nr * (nr - 1) AS t2")
        .groupBy()
        .agg(F.sum("t2").alias("tr2"))
    )
    tc = (
        cells.groupBy("b")
        .agg(F.sum("n").cast("decimal(38,0)").alias("nc"))
        .selectExpr("nc * (nc - 1) AS t2")
        .groupBy()
        .agg(F.sum("t2").alias("tc2"))
    )
    return (
        ties.crossJoin(F.broadcast(cd))
        .crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(tc))
        .selectExpr(
            "CAST(n_parts AS BIGINT) AS n_parts",
            "n_cells",
            "CAST(concordant_d AS BIGINT) AS concordant",
            "CAST(discordant_d AS BIGINT) AS discordant",
            # doubled pair counts keep everything integral: N0*2 =
            # n(n-1), tie terms tr2/tc2 are already doubled
            "CAST(floor((CAST(concordant_d AS DOUBLE)"
            " - CAST(discordant_d AS DOUBLE)) * 1000"
            " / sqrt((CAST(n_parts * (n_parts - 1) - tr2 AS DOUBLE) / 2.0)"
            "        * (CAST(n_parts * (n_parts - 1) - tc2 AS DOUBLE) / 2.0)))"
            " AS BIGINT) AS tau_b_milli",
        )
    )


ORACLE_PART_SIZE_PRICE_KENDALL = """
WITH cells AS (
  SELECT p_size AS s,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 1000
           AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY 1, 2
),
cd AS (
  SELECT CAST(coalesce(sum(CASE WHEN a.b < c.b THEN CAST(a.n AS HUGEINT) * c.n
                       ELSE 0 END), 0) AS HUGEINT) AS concordant_d,
         CAST(coalesce(sum(CASE WHEN a.b > c.b THEN CAST(a.n AS HUGEINT) * c.n
                       ELSE 0 END), 0) AS HUGEINT) AS discordant_d
  FROM cells a JOIN cells c ON a.s < c.s
),
ties AS (
  SELECT CAST(sum(n) AS HUGEINT) AS n_parts,
         CAST(count(*) AS BIGINT) AS n_cells
  FROM cells
),
tr AS (
  SELECT CAST(sum(nr * (nr - 1)) AS HUGEINT) AS tr2
  FROM (SELECT CAST(sum(n) AS HUGEINT) AS nr FROM cells GROUP BY s)
),
tc AS (
  SELECT CAST(sum(nc * (nc - 1)) AS HUGEINT) AS tc2
  FROM (SELECT CAST(sum(n) AS HUGEINT) AS nc FROM cells GROUP BY b)
)
SELECT CAST(t.n_parts AS BIGINT) AS n_parts,
       t.n_cells,
       CAST(cd.concordant_d AS BIGINT) AS concordant,
       CAST(cd.discordant_d AS BIGINT) AS discordant,
       CAST(floor((CAST(cd.concordant_d AS DOUBLE)
         - CAST(cd.discordant_d AS DOUBLE)) * 1000
         / sqrt((CAST(t.n_parts * (t.n_parts - 1) - tr.tr2 AS DOUBLE) / 2.0)
                * (CAST(t.n_parts * (t.n_parts - 1) - tc.tc2 AS DOUBLE) / 2.0)))
       AS BIGINT) AS tau_b_milli
FROM ties t, cd, tr, tc
"""


# ---------------------------------------------------------------------------
# Tukey-fence ship-latency outliers per supplier nation: the robust
# (quartile) counterpart of the moment-based supplier_delivery_variance —
# "which geographies have fat delay tails?" without a stddev anywhere.


def q_supplier_latency_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, n_lines, q1/q3/iqr days, n_low, n_high,
    outlier_permille): per supplier nation, exact type-1 quartiles of
    the order→ship latency and the line counts outside the Tukey
    fences q1 - 1.5*iqr / q3 + 1.5*iqr. The half-step fences stay
    integer by comparing DOUBLED days: 2*d < 2*q1 - 3*iqr.

    All-integer (FLOATS.md class A): day diffs, histogram counts,
    cross-multiplied quartile marks, and one nonneg integral quotient
    under matched truncation.

    Scale shape: ONE orderkey fact-fact join (the same shuffle
    orders_ship_survival pays) collapses to a (nation, day) HISTOGRAM
    (<= 25 nations x a few hundred distinct latencies); the cumulative
    window is nation-partitioned over that compact relation and the
    fences re-attach by broadcast, so the corpus pays the join + one
    bounded-grid aggregation — no global window, no per-row rank."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    hist = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .selectExpr(
            "s_nationkey",
            "CAST(datediff(l_shipdate, o_orderdate) AS BIGINT) AS d",
        )
        .groupBy("s_nationkey", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    from ..cachereg import cache_eager

    hist = cache_eager(hist)
    w_n = (
        W.partitionBy("s_nationkey")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    n = hist.groupBy("s_nationkey").agg(F.sum("c").cast("bigint").alias("n"))
    cum = hist.withColumn("cum", F.sum("c").over(w_n)).join(
        F.broadcast(n), "s_nationkey"
    )
    fences = (
        cum.groupBy("s_nationkey")
        .agg(
            F.max("n").alias("n_lines"),
            F.min(F.when(F.col("cum") * 4 >= F.col("n"), F.col("d"))).alias(
                "q1_days"
            ),
            F.min(
                F.when(F.col("cum") * 4 >= 3 * F.col("n"), F.col("d"))
            ).alias("q3_days"),
        )
        .selectExpr(
            "s_nationkey",
            "n_lines",
            "q1_days",
            "q3_days",
            "q3_days - q1_days AS iqr_days",
            "2 * q1_days - 3 * (q3_days - q1_days) AS lo2",
            "2 * q3_days + 3 * (q3_days - q1_days) AS hi2",
        )
    )
    counts = (
        hist.join(F.broadcast(fences), "s_nationkey")
        .groupBy("s_nationkey")
        .agg(
            F.sum(F.when(2 * F.col("d") < F.col("lo2"), F.col("c")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_low"),
            F.sum(F.when(2 * F.col("d") > F.col("hi2"), F.col("c")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_high"),
        )
    )
    return (
        fences.join(counts, "s_nationkey")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .selectExpr(
            "n_name AS nation",
            "n_lines",
            "q1_days",
            "q3_days",
            "iqr_days",
            "n_low",
            "n_high",
            "CAST((n_low + n_high) * 1000 DIV n_lines AS BIGINT)"
            " AS outlier_permille",
        )
        .orderBy("nation")
    )


ORACLE_SUPPLIER_LATENCY_TUKEY = """
WITH hist AS (
  SELECT s.s_nationkey,
         CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
cum AS (
  SELECT s_nationkey, d, c,
         sum(c) OVER (PARTITION BY s_nationkey ORDER BY d
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY s_nationkey) AS n
  FROM hist
),
fences AS (
  SELECT s_nationkey, CAST(max(n) AS BIGINT) AS n_lines,
         min(CASE WHEN cum * 4 >= n THEN d END) AS q1_days,
         min(CASE WHEN cum * 4 >= 3 * n THEN d END) AS q3_days
  FROM cum GROUP BY 1
),
f2 AS (
  SELECT s_nationkey, n_lines, q1_days, q3_days,
         q3_days - q1_days AS iqr_days,
         2 * q1_days - 3 * (q3_days - q1_days) AS lo2,
         2 * q3_days + 3 * (q3_days - q1_days) AS hi2
  FROM fences
),
counts AS (
  SELECT h.s_nationkey,
         CAST(sum(CASE WHEN 2 * h.d < f.lo2 THEN h.c ELSE 0 END) AS BIGINT)
           AS n_low,
         CAST(sum(CASE WHEN 2 * h.d > f.hi2 THEN h.c ELSE 0 END) AS BIGINT)
           AS n_high
  FROM hist h JOIN f2 f USING (s_nationkey)
  GROUP BY 1
)
SELECT n.n_name AS nation, f.n_lines, f.q1_days, f.q3_days, f.iqr_days,
       c.n_low, c.n_high,
       CAST((c.n_low + c.n_high) * 1000 // f.n_lines AS BIGINT)
         AS outlier_permille
FROM f2 f JOIN counts c USING (s_nationkey)
JOIN nation n ON f.s_nationkey = n.n_nationkey
ORDER BY nation
"""


# ---------------------------------------------------------------------------
# Mutual information between quantity and price bucket — the
# information-theoretic dependence readout next to the Pearson
# (quantity_price_corr) and Kendall (part_size_price_kendall) lanes.

MI_PRICE_BUCKET_CENTS = 1_000_000  # $10,000 price buckets (~11 buckets)


def q_quantity_price_mutual_info(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One row: n_lines, n_cells, marginal entropies H(qty) / H(price
    bucket), their mutual information (all integer micro-nats), and the
    normalized MI in permille of min(H_q, H_p).

    Determinism (FLOATS.md class C): ONE ln per cell/marginal row on an
    exact-integer-derived double (BIGINT→DOUBLE casts and the * / chain
    are correctly rounded, so the libm input is bit-identical on both
    engines), floor-quantized to micro-nats; weighted sums accumulate in
    DECIMAL(38,0)/HUGEINT. The MI numerator is SIGNED (per-term
    quantization can dip it below zero near independence), so its
    divisions use the SPELLED-OUT FLOOR IDENTITY on both engines
    (FLOATS.md rule 6); the entropy numerators use ln(N/n_x) >= 0 and
    plain matched truncation. Headroom: |term| <= n_cell * 50e6 <
    DECIMAL(38,0) for any n_cell < 1e30 — no sf bound.

    Scale shape: the corpus pays ONE bounded-grid aggregation (50
    quantities x ~11 price buckets = <= 550 cells); marginals, totals,
    and every ln/divide run on broadcast-sized relations."""
    from ..cachereg import cache_eager

    li = table(spark, sf_dir, "lineitem")
    cells = cache_eager(
        li.selectExpr(
            "CAST(l_quantity AS BIGINT) AS q",
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            f" DIV {MI_PRICE_BUCKET_CENTS} AS b",
        )
        .groupBy("q", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_qb"))
    )
    mq = cells.groupBy("q").agg(F.sum("n_qb").cast("bigint").alias("n_q"))
    mb = cells.groupBy("b").agg(F.sum("n_qb").cast("bigint").alias("n_b"))
    tot = cells.agg(
        F.sum("n_qb").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    mi_row = (
        cells.join(F.broadcast(mq), "q")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "n",
            "n_cells",
            "CAST(n_qb AS DECIMAL(38,0))"
            " * CAST(floor(ln((CAST(n_qb AS DOUBLE) * CAST(n AS DOUBLE))"
            "               / (CAST(n_q AS DOUBLE) * CAST(n_b AS DOUBLE)))"
            "         * 1000000) AS BIGINT) AS w",
        )
        .groupBy()
        .agg(
            F.max("n").alias("n"),
            F.max("n_cells").alias("n_cells"),
            F.sum("w").alias("num"),
        )
    )
    hq = (
        mq.crossJoin(F.broadcast(tot))
        .selectExpr(
            "CAST(n_q AS DECIMAL(38,0))"
            " * CAST(floor(ln(CAST(n AS DOUBLE) / CAST(n_q AS DOUBLE))"
            "         * 1000000) AS BIGINT) AS wq"
        )
        .groupBy()
        .agg(F.sum("wq").alias("numq"))
    )
    hb = (
        mb.crossJoin(F.broadcast(tot))
        .selectExpr(
            "CAST(n_b AS DECIMAL(38,0))"
            " * CAST(floor(ln(CAST(n AS DOUBLE) / CAST(n_b AS DOUBLE))"
            "         * 1000000) AS BIGINT) AS wb"
        )
        .groupBy()
        .agg(F.sum("wb").alias("numb"))
    )
    return (
        mi_row.crossJoin(F.broadcast(hq))
        .crossJoin(F.broadcast(hb))
        .selectExpr(
            "n AS n_lines",
            "n_cells",
            # entropies: nonneg dividends, matched truncation
            "CAST(numq DIV CAST(n AS DECIMAL(38,0)) AS BIGINT)"
            " AS h_qty_micro",
            "CAST(numb DIV CAST(n AS DECIMAL(38,0)) AS BIGINT)"
            " AS h_price_micro",
            # MI: signed dividend -> floor identity on BOTH engines
            "CAST((num - ((num % CAST(n AS DECIMAL(38,0))"
            " + CAST(n AS DECIMAL(38,0))) % CAST(n AS DECIMAL(38,0))))"
            " DIV CAST(n AS DECIMAL(38,0)) AS BIGINT) AS mi_micro",
        )
        .selectExpr(
            "n_lines",
            "n_cells",
            "h_qty_micro",
            "h_price_micro",
            "mi_micro",
            # signed dividend (mi_micro can be < 0) -> floor identity
            "CAST((mi_micro * 1000 - ((mi_micro * 1000"
            " % nullif(least(h_qty_micro, h_price_micro), 0)"
            " + nullif(least(h_qty_micro, h_price_micro), 0))"
            " % nullif(least(h_qty_micro, h_price_micro), 0)))"
            " DIV nullif(least(h_qty_micro, h_price_micro), 0) AS BIGINT)"
            " AS nmi_permille",
        )
    )


ORACLE_QUANTITY_PRICE_MUTUAL_INFO = f"""
WITH cells AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           // {MI_PRICE_BUCKET_CENTS} AS b,
         CAST(count(*) AS BIGINT) AS n_qb
  FROM lineitem GROUP BY 1, 2
),
mq AS (SELECT q, CAST(sum(n_qb) AS BIGINT) AS n_q FROM cells GROUP BY 1),
mb AS (SELECT b, CAST(sum(n_qb) AS BIGINT) AS n_b FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(sum(n_qb) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_cells
  FROM cells
),
mi_row AS (
  SELECT max(t.n) AS n, max(t.n_cells) AS n_cells,
         CAST(sum(CAST(c.n_qb AS HUGEINT)
           * CAST(floor(ln((CAST(c.n_qb AS DOUBLE) * CAST(t.n AS DOUBLE))
                           / (CAST(q.n_q AS DOUBLE) * CAST(b.n_b AS DOUBLE)))
                   * 1000000) AS BIGINT)) AS HUGEINT) AS num
  FROM cells c JOIN mq q USING (q) JOIN mb b USING (b), tot t
),
hq AS (
  SELECT CAST(sum(CAST(n_q AS HUGEINT)
           * CAST(floor(ln(CAST(t.n AS DOUBLE) / CAST(n_q AS DOUBLE))
                   * 1000000) AS BIGINT)) AS HUGEINT) AS numq
  FROM mq, tot t
),
hb AS (
  SELECT CAST(sum(CAST(n_b AS HUGEINT)
           * CAST(floor(ln(CAST(t.n AS DOUBLE) / CAST(n_b AS DOUBLE))
                   * 1000000) AS BIGINT)) AS HUGEINT) AS numb
  FROM mb, tot t
),
base AS (
  SELECT m.n AS n_lines, m.n_cells,
         CAST(hq.numq // CAST(m.n AS HUGEINT) AS BIGINT) AS h_qty_micro,
         CAST(hb.numb // CAST(m.n AS HUGEINT) AS BIGINT) AS h_price_micro,
         CAST((m.num - ((m.num % CAST(m.n AS HUGEINT)
           + CAST(m.n AS HUGEINT)) % CAST(m.n AS HUGEINT)))
           // CAST(m.n AS HUGEINT) AS BIGINT) AS mi_micro
  FROM mi_row m, hq, hb
)
SELECT n_lines, n_cells, h_qty_micro, h_price_micro, mi_micro,
       CAST((mi_micro * 1000 - ((mi_micro * 1000
         % nullif(least(h_qty_micro, h_price_micro), 0)
         + nullif(least(h_qty_micro, h_price_micro), 0))
         % nullif(least(h_qty_micro, h_price_micro), 0)))
         // nullif(least(h_qty_micro, h_price_micro), 0) AS BIGINT)
         AS nmi_permille
FROM base
"""


# ---------------------------------------------------------------------------
# Interpurchase life table with right-censoring: Kaplan-Meier survival of
# the "time to next order" process. Distinct from orders_ship_survival
# (a plain exceedance curve, no censoring) and customer_order_gap_histogram
# (event gaps only): here every customer's LAST order contributes a
# censored interval to the dataset end, so the at-risk denominators are
# the classic life-table ones.

LT_BUCKET_DAYS = 30
LT_MAX_BUCKET = 24


def q_customer_interpurchase_lifetable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(bucket, n_at_risk, n_events, n_censored, hazard_permille,
    km_ln_micro): discrete life table over 30-day buckets (capped at
    24). hazard = d_t/n_t per thousand; the Kaplan-Meier survivor
    S(t) = prod (1 - d_s/n_s) is emitted in LN-DOMAIN integer
    micro-nats (sum of floor-quantized ln((n_s-d_s)/n_s) terms — the
    kn_bigram/theil discipline: one ln per bucket row, never exp'd), and
    goes NULL from the first bucket where survival hits zero.

    Determinism: day diffs and counts are exact; each ln input is a
    quotient of exact BIGINTs cast once to DOUBLE (correctly rounded,
    bit-identical), floor-quantized to micro-nats (FLOATS.md class C);
    hazard is a nonneg integral quotient under matched truncation.

    Scale shape: ONE shuffle by custkey for the lead window (date +
    orderkey tiebreak, deterministic), a broadcast 1-row max-date
    attach, then a bounded-bucket hash aggregation; the cumulative
    at-risk/KM windows run over the <= 25-row life-table relation
    (bounded by construction — the revenue_mom_delta precedent)."""
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    maxd = orders.agg(F.max("o_orderdate").alias("max_date"))
    intervals = (
        orders.withColumn("next_date", F.lead("o_orderdate").over(w))
        .crossJoin(F.broadcast(maxd))
        .selectExpr(
            "CASE WHEN next_date IS NOT NULL THEN 1 ELSE 0 END AS ev",
            "least(CAST(datediff(coalesce(next_date, max_date), o_orderdate)"
            f" AS BIGINT) DIV {LT_BUCKET_DAYS}, {LT_MAX_BUCKET}) AS bucket",
        )
    )
    lt = intervals.groupBy("bucket").agg(
        F.sum("ev").cast("bigint").alias("n_events"),
        F.sum(F.expr("1 - ev")).cast("bigint").alias("n_censored"),
    )
    tot = intervals.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    w_prior = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    w_cum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    lt2 = (
        lt.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_at_risk",
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(w_prior),
                F.lit(0),
            ),
        )
        .withColumn(
            "alive",
            F.expr("CASE WHEN n_at_risk > n_events THEN 1 ELSE 0 END"),
        )
        .withColumn(
            "term",
            F.expr(
                "CASE WHEN n_at_risk > n_events THEN"
                " CAST(floor(ln(CAST(n_at_risk - n_events AS DOUBLE)"
                " / CAST(n_at_risk AS DOUBLE)) * 1000000) AS BIGINT) END"
            ),
        )
    )
    return (
        lt2.select(
            "bucket",
            "n_at_risk",
            "n_events",
            "n_censored",
            F.expr(
                "CAST(n_events * 1000 DIV n_at_risk AS BIGINT)"
            ).alias("hazard_permille"),
            F.when(
                F.min("alive").over(w_cum) == 1,
                F.sum("term").over(w_cum),
            )
            .cast("bigint")
            .alias("km_ln_micro"),
        )
        .orderBy("bucket")
    )


ORACLE_CUSTOMER_INTERPURCHASE_LIFETABLE = f"""
WITH maxd AS (SELECT max(o_orderdate) AS max_date FROM orders),
intervals AS (
  SELECT CASE WHEN next_date IS NOT NULL THEN 1 ELSE 0 END AS ev,
         least(CAST(date_diff('day', o_orderdate,
                    coalesce(next_date, max_date)) AS BIGINT)
               // {LT_BUCKET_DAYS}, {LT_MAX_BUCKET}) AS bucket
  FROM (
    SELECT o_custkey, o_orderdate,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS next_date
    FROM orders
  ), maxd
),
lt AS (
  SELECT bucket, CAST(sum(ev) AS BIGINT) AS n_events,
         CAST(sum(1 - ev) AS BIGINT) AS n_censored
  FROM intervals GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM intervals),
lt2 AS (
  SELECT bucket, n_events, n_censored,
         n_total - coalesce(sum(n_events + n_censored) OVER (
             ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS n_at_risk
  FROM lt, tot
),
lt3 AS (
  SELECT bucket, n_at_risk, n_events, n_censored,
         CASE WHEN n_at_risk > n_events THEN 1 ELSE 0 END AS alive,
         CASE WHEN n_at_risk > n_events THEN
           CAST(floor(ln(CAST(n_at_risk - n_events AS DOUBLE)
                / CAST(n_at_risk AS DOUBLE)) * 1000000) AS BIGINT)
         END AS term
  FROM lt2
)
SELECT bucket, CAST(n_at_risk AS BIGINT) AS n_at_risk, n_events,
       n_censored,
       CAST(n_events * 1000 // n_at_risk AS BIGINT) AS hazard_permille,
       CAST(CASE WHEN min(alive) OVER (ORDER BY bucket
                ROWS UNBOUNDED PRECEDING) = 1
            THEN sum(term) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
            END AS BIGINT) AS km_ln_micro
FROM lt3
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test: does the return rate TREND with quantity?
# The ordered-categories member of the categorical-association lane
# (chi-square tests independence; this tests monotone dose-response).


def q_returns_quantity_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: line/return totals, bucket count, the trend direction,
    the Cochran-Armitage z^2 in milli, and the return rate (basis
    points) at the lowest/highest quantity bucket.

    With score s = quantity DIV 5 (buckets 0..10), T = N*sum(s*r) -
    R*sum(s*n) and Var*N = R*(N-R)*(N*sum(s^2*n) - sum(s*n)^2); z^2 =
    T^2*N / VarNum. T is exact DECIMAL(38,0)/HUGEINT (|T| <= 10*N^2 —
    exact past 1e18 lines); z^2 would need ~T^2*N ~ 1e60 digits, so it
    is a CLOSED-FORM double chain on the exact aggregates (one CAST per
    factor, identical association order both engines — the
    part_size_price_kendall tau_b_milli / events_anomaly_hours z_score
    precedent, FLOATS.md class A), guarded NULL by the INTEGER-exact
    degenerate conditions (R=0, R=N, or zero score variance).

    Scale shape: one bounded-grid aggregation (11 score buckets,
    map-side combinable) carries the whole corpus; everything after is
    arithmetic on a broadcast-sized relation."""
    li = table(spark, sf_dir, "lineitem")
    g = (
        li.selectExpr(
            "CAST(l_quantity AS BIGINT) DIV 5 AS s",
            "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret",
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.sum("ret").cast("bigint").alias("r_i"),
        )
    )
    ext = g.crossJoin(
        F.broadcast(
            g.agg(F.min("s").alias("s_lo"), F.max("s").alias("s_hi"))
        )
    )
    sums = ext.groupBy().agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_buckets"),
        F.expr("CAST(sum(n_i) AS BIGINT)").alias("n"),
        F.expr("CAST(sum(r_i) AS BIGINT)").alias("r"),
        F.expr("CAST(sum(s * n_i) AS BIGINT)").alias("s1"),
        F.expr("CAST(sum(s * s * n_i) AS BIGINT)").alias("s2"),
        F.expr("CAST(sum(s * r_i) AS BIGINT)").alias("st"),
        F.expr(
            "CAST(sum(CASE WHEN s = s_lo THEN r_i ELSE 0 END) * 10000"
            " DIV sum(CASE WHEN s = s_lo THEN n_i ELSE 0 END) AS BIGINT)"
        ).alias("rate_lo_bp"),
        F.expr(
            "CAST(sum(CASE WHEN s = s_hi THEN r_i ELSE 0 END) * 10000"
            " DIV sum(CASE WHEN s = s_hi THEN n_i ELSE 0 END) AS BIGINT)"
        ).alias("rate_hi_bp"),
    )
    return sums.selectExpr(
        "n AS n_lines",
        "r AS n_returned",
        "n_buckets",
        "CASE WHEN CAST(n AS DECIMAL(38,0)) * st"
        " > CAST(r AS DECIMAL(38,0)) * s1 THEN 1"
        " WHEN CAST(n AS DECIMAL(38,0)) * st"
        " < CAST(r AS DECIMAL(38,0)) * s1 THEN -1 ELSE 0 END AS trend_sign",
        "CASE WHEN r > 0 AND r < n"
        " AND CAST(n AS DECIMAL(38,0)) * s2 <> CAST(s1 AS DECIMAL(38,0)) * s1"
        " THEN CAST(floor(1000 * (((CAST(CAST(n AS DECIMAL(38,0)) * st"
        " - CAST(r AS DECIMAL(38,0)) * s1 AS DOUBLE)"
        " * CAST(CAST(n AS DECIMAL(38,0)) * st"
        " - CAST(r AS DECIMAL(38,0)) * s1 AS DOUBLE)) * CAST(n AS DOUBLE))"
        " / ((CAST(r AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(r AS DOUBLE)))"
        " * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)"
        " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))))) AS BIGINT)"
        " END AS z2_milli",
        "rate_lo_bp",
        "rate_hi_bp",
    )


ORACLE_RETURNS_QUANTITY_TREND = """
WITH g AS (
  SELECT CAST(l_quantity AS BIGINT) // 5 AS s,
         CAST(count(*) AS BIGINT) AS n_i,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS r_i
  FROM lineitem GROUP BY 1
),
ext AS (SELECT g.*, e.s_lo, e.s_hi
        FROM g, (SELECT min(s) AS s_lo, max(s) AS s_hi FROM g) e),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(n_i) AS BIGINT) AS n,
         CAST(sum(r_i) AS BIGINT) AS r,
         CAST(sum(s * n_i) AS BIGINT) AS s1,
         CAST(sum(s * s * n_i) AS BIGINT) AS s2,
         CAST(sum(s * r_i) AS BIGINT) AS st,
         CAST(sum(CASE WHEN s = s_lo THEN r_i ELSE 0 END) * 10000
              // sum(CASE WHEN s = s_lo THEN n_i ELSE 0 END) AS BIGINT)
           AS rate_lo_bp,
         CAST(sum(CASE WHEN s = s_hi THEN r_i ELSE 0 END) * 10000
              // sum(CASE WHEN s = s_hi THEN n_i ELSE 0 END) AS BIGINT)
           AS rate_hi_bp
  FROM ext
)
SELECT n AS n_lines, r AS n_returned, n_buckets,
       CASE WHEN CAST(n AS HUGEINT) * st > CAST(r AS HUGEINT) * s1 THEN 1
            WHEN CAST(n AS HUGEINT) * st < CAST(r AS HUGEINT) * s1 THEN -1
            ELSE 0 END AS trend_sign,
       CASE WHEN r > 0 AND r < n
            AND CAST(n AS HUGEINT) * s2 <> CAST(s1 AS HUGEINT) * s1
       THEN CAST(floor(1000 * (((CAST(CAST(n AS HUGEINT) * st
         - CAST(r AS HUGEINT) * s1 AS DOUBLE)
         * CAST(CAST(n AS HUGEINT) * st
         - CAST(r AS HUGEINT) * s1 AS DOUBLE)) * CAST(n AS DOUBLE))
         / ((CAST(r AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(r AS DOUBLE)))
         * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))))) AS BIGINT)
       END AS z2_milli,
       rate_lo_bp, rate_hi_bp
FROM sums
"""


# ---------------------------------------------------------------------------
# Per-month chi-square drift of the order-priority mix against the
# all-time mix: the categorical-drift monitor (which months' priority
# composition deviates, and by how much?) — the time-sliced sibling of
# order_priority_cramers_v's single global association readout.


def q_orders_priority_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(month, n_orders, dof, chi2_micro) per order month: the
    chi-square of that month's priority counts against expectations
    from the GLOBAL priority shares.

    Exactness: the (month x priority) grid is bounded (~84 x 5), spine-
    DENSIFIED so a priority absent in a month still contributes its
    expected mass (the cramers_v precedent); each cell's contribution
    is the exact integer (obs*N - n_m*r_p)^2 * 1e6 DIV (N*n_m*r_p)
    (nonneg dividend, matched truncation, floor-then-sum — the chisq
    recipe). Headroom: the squared term is N^4*1e6-scale, DECIMAL(38,0)
    holds to ~1e8 orders worst-case; past that non-ANSI Spark NULLs
    where DuckDB HUGEINT errors, the oracle gate being the loud
    failure.

    Scale shape: one orders aggregation onto the bounded grid; margins
    are constant-key windows on it; everything after runs on <= 420
    rows."""
    from ..cachereg import cache_eager

    orders = table(spark, sf_dir, "orders")
    sparse = cache_eager(
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_orderpriority",
        ).agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    )
    spine = (
        sparse.select("month")
        .distinct()
        .crossJoin(F.broadcast(sparse.select("o_orderpriority").distinct()))
    )
    cells = spine.join(
        F.broadcast(sparse), ["month", "o_orderpriority"], "left"
    ).selectExpr(
        "month",
        "o_orderpriority",
        "coalesce(obs, CAST(0 AS BIGINT)) AS observed",
    )
    wm = W.partitionBy("month")
    wp = W.partitionBy("o_orderpriority")
    wall = W.partitionBy()
    grid = cells.select(
        "month",
        "o_orderpriority",
        "observed",
        F.sum("observed").over(wm).cast("bigint").alias("n_m"),
        F.sum("observed").over(wp).cast("bigint").alias("r_p"),
        F.sum("observed").over(wall).cast("bigint").alias("n"),
    )
    diff = (
        "(CAST(observed AS DECIMAL(38,0)) * n"
        " - CAST(n_m AS DECIMAL(38,0)) * r_p)"
    )
    return (
        grid.selectExpr(
            "month",
            "n_m",
            "o_orderpriority",
            f"CAST({diff} * {diff} * 1000000"
            " DIV (CAST(n AS DECIMAL(38,0)) * n_m * r_p) AS BIGINT)"
            " AS contrib_micro",
        )
        .groupBy("month")
        .agg(
            F.max("n_m").alias("n_orders"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("dof"),
            F.sum("contrib_micro").cast("bigint").alias("chi2_micro"),
        )
        .orderBy("month")
    )


ORACLE_ORDERS_PRIORITY_MIX_DRIFT = """
WITH sparse AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
         CAST(count(*) AS BIGINT) AS obs
  FROM orders GROUP BY 1, 2
),
cells AS (
  SELECT m.month, p.o_orderpriority,
         coalesce(s.obs, CAST(0 AS BIGINT)) AS observed
  FROM (SELECT DISTINCT month FROM sparse) m
  CROSS JOIN (SELECT DISTINCT o_orderpriority FROM sparse) p
  LEFT JOIN sparse s
    ON s.month = m.month AND s.o_orderpriority = p.o_orderpriority
),
grid AS (
  SELECT month, o_orderpriority, observed,
         CAST(sum(observed) OVER (PARTITION BY month) AS BIGINT) AS n_m,
         CAST(sum(observed) OVER (PARTITION BY o_orderpriority) AS BIGINT)
           AS r_p,
         CAST(sum(observed) OVER () AS BIGINT) AS n
  FROM cells
)
SELECT month,
       CAST(max(n_m) AS BIGINT) AS n_orders,
       CAST(count(*) - 1 AS BIGINT) AS dof,
       CAST(sum((CAST(observed AS HUGEINT) * n
                 - CAST(n_m AS HUGEINT) * r_p)
                * (CAST(observed AS HUGEINT) * n
                   - CAST(n_m AS HUGEINT) * r_p)
                * 1000000
                // (CAST(n AS HUGEINT) * n_m * r_p)) AS BIGINT)
         AS chi2_micro
FROM grid
GROUP BY month
ORDER BY month
"""


# ---------------------------------------------------------------------------
# Mean log deviation (Theil L / GE(0)) of customer spend with the
# between-segment component: completes the inequality family — gini
# (customer_spend_gini) ranks, Theil T (supplier_revenue_theil) weights
# by share, MLD weights every customer equally, and its decomposition
# says how much spend inequality is BETWEEN market segments.


def q_customer_spend_mld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: customer/segment counts and MLD total + between-segment
    component, both in integer micro-nats.

    MLD = ln(mean) - mean(ln x); between = ln(mean) - sum_g (n_g/n)
    ln(mean_g). Determinism (FLOATS.md class C, the revenue_theil
    discipline): ONE ln per customer row on the exact cents value,
    floor-quantized to micro-nats; sums accumulate in
    DECIMAL(38,0)/HUGEINT; ln(mean) is one ln on the 1-row aggregate;
    the per-n divisions have provably NONNEG dividends (cents >= 1 so
    every ln >= 0) under matched truncation, and the emitted cells are
    SUBTRACTIONS of those integers (quantization can dip them a hair
    negative near perfect equality — no signed division anywhere).

    Scale shape: one custkey aggregation over orders (THE shuffle), a
    custkey equi-join to customer for the segment (co-partitioned
    under AQE), then a cached compact (segment, cents) relation feeds
    the 1-row total and the |segments|-row regroup."""
    from ..cachereg import cache_eager

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    per = (
        orders.groupBy("o_custkey")
        .agg(F.sum(money("o_totalprice")).alias("spend"))
        .selectExpr("o_custkey", "CAST(spend * 100 AS BIGINT) AS cents")
    )
    seg = (
        per.join(cust, per["o_custkey"] == cust["c_custkey"])
        .selectExpr(
            "c_mktsegment AS segment",
            "cents",
            "CAST(floor(ln(CAST(cents AS DOUBLE)) * 1000000) AS BIGINT)"
            " AS lnx",
        )
    )
    seg = cache_eager(seg)
    tot = seg.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("lnx").cast("decimal(38,0)")).alias("sln"),
    )
    btw = (
        seg.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("s_g"),
        )
        .selectExpr(
            "CAST(n_g AS DECIMAL(38,0))"
            " * floor(ln(CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))"
            "         * 1000000) AS term"
        )
        .groupBy()
        .agg(
            F.sum("term").alias("bnum"),
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        )
    )
    return tot.crossJoin(F.broadcast(btw)).selectExpr(
        "n AS n_customers",
        "n_segments",
        "CAST(floor(ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000)"
        " - sln DIV n AS BIGINT) AS mld_total_micro",
        "CAST(floor(ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000)"
        " - bnum DIV n AS BIGINT) AS mld_between_micro",
    )


ORACLE_CUSTOMER_SPEND_MLD = """
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
seg AS (
  SELECT c.c_mktsegment AS segment, p.cents,
         CAST(floor(ln(CAST(p.cents AS DOUBLE)) * 1000000) AS BIGINT)
           AS lnx
  FROM per p JOIN customer c ON p.o_custkey = c.c_custkey
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(lnx AS HUGEINT)) AS HUGEINT) AS sln
  FROM seg
),
btw AS (
  SELECT CAST(sum(CAST(n_g AS HUGEINT)
           * CAST(floor(ln(CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))
                        * 1000000) AS BIGINT)) AS HUGEINT) AS bnum,
         CAST(count(*) AS BIGINT) AS n_segments
  FROM (
    SELECT CAST(count(*) AS BIGINT) AS n_g,
           CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS s_g
    FROM seg GROUP BY segment
  )
)
SELECT t.n AS n_customers,
       b.n_segments,
       CAST(CAST(floor(ln(CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                       * 1000000) AS BIGINT)
            - t.sln // t.n AS BIGINT) AS mld_total_micro,
       CAST(CAST(floor(ln(CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                       * 1000000) AS BIGINT)
            - b.bnum // t.n AS BIGINT) AS mld_between_micro
FROM tot t, btw b
"""


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov over order prices: the DISTRIBUTION-SHAPE
# companion of orders_mannwhitney_u (which only sees location) — "do
# urgent orders follow a different price distribution at all, and where
# do the CDFs split?"


def q_orders_price_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: group sizes, the exact two-sample KS distance D in
    basis points, the asymptotic z^2 in milli, and the price (cents) at
    which the empirical CDFs are furthest apart.

    Exactness: prices collapse to an exact cents histogram with
    per-group counts; the CDF gap at each value is the exact integer
    |cum_a*n_b - cum_b*n_a| (DECIMAL(38,0)/HUGEINT — n_a*n_b-scale),
    so D = max_gap / (n_a*n_b) emits via nonneg matched-truncation
    division (FLOATS.md rule 6) and z^2 = D^2 * n_a*n_b/(n_a+n_b) is
    ONE class-B double chain over the exact integers, identical tree
    both engines, floored at milli. split_cents is the SMALLEST cents
    achieving the max gap (deterministic under ties).

    Scale shape: ONE corpus-sized shuffle (the cents histogram); both
    groups' global cumulative counts ride a single range exchange
    through with_global_prefix_sums (NO single-task global window at
    any distinct-price cardinality); the argmax re-attach is an
    equi-join against the 1-row max (BroadcastHashJoin) and the final
    assembly is a 1-row x 1-row attach."""
    from .ranks import with_global_prefix_sums

    orders = table(spark, sf_dir, "orders")
    grp_a = ", ".join(f"'{g}'" for g in MW_GROUP_A)
    hist = (
        orders.selectExpr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS cents",
            f"CASE WHEN o_orderpriority IN ({grp_a}) THEN 1 ELSE 0 END"
            " AS in_a",
        )
        .groupBy("cents")
        .agg(
            F.sum("in_a").cast("bigint").alias("na"),
            F.sum(F.expr("1 - in_a")).cast("bigint").alias("nb"),
        )
    )
    ranked = with_global_prefix_sums(
        hist,
        {"na": "cum_a", "nb": "cum_b"},
        "cents",
        total_cols={"na": "n_a", "nb": "n_b"},
    )
    gaps = ranked.selectExpr(
        "cents",
        "n_a",
        "n_b",
        "abs(CAST(cum_a AS DECIMAL(38,0)) * n_b"
        " - CAST(cum_b AS DECIMAL(38,0)) * n_a) AS gap",
    )
    agg = gaps.groupBy().agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.coalesce(F.max("gap"), F.lit(0).cast("decimal(38,0)")).alias("m"),
    )
    split = (
        gaps.join(F.broadcast(agg.select("m")), F.expr("gap = m"))
        .groupBy()
        .agg(F.min("cents").cast("bigint").alias("split_cents"))
    )
    return agg.crossJoin(F.broadcast(split)).selectExpr(
        "n_a",
        "n_b",
        # dividend is an abs() — provably nonneg; matched truncation
        "CAST(m * 10000 DIV nullif(CAST(n_a AS DECIMAL(38,0)) * n_b, 0)"
        " AS BIGINT) AS d_bp",
        # class-B: z^2 = m^2 / (n_a*n_b*(n_a+n_b)) — m^2 is
        # (n_a*n_b)^2-scale, past DECIMAL(38,0) at n ~ 3e9, so the
        # chain runs in IEEE doubles over the exact integers (the
        # mannwhitney z2 precedent), identical tree both engines
        "CAST(floor(1000.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)"
        " / nullif(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
        "          * CAST(n_a + n_b AS DOUBLE), 0.0)) AS BIGINT)"
        " AS z2_milli",
        "split_cents",
    )


ORACLE_ORDERS_PRICE_KS_TEST = f"""
WITH hist AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(sum(CASE WHEN o_orderpriority IN
                  ({", ".join(f"'{g}'" for g in MW_GROUP_A)}) THEN 1 ELSE 0 END)
              AS BIGINT) AS na,
         CAST(sum(CASE WHEN o_orderpriority IN
                  ({", ".join(f"'{g}'" for g in MW_GROUP_A)}) THEN 0 ELSE 1 END)
              AS BIGINT) AS nb
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT cents,
         sum(na) OVER w AS cum_a, sum(nb) OVER w AS cum_b,
         sum(na) OVER () AS n_a, sum(nb) OVER () AS n_b
  FROM hist
  WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)
),
gaps AS (
  SELECT cents, n_a, n_b,
         abs(CAST(cum_a AS HUGEINT) * n_b - CAST(cum_b AS HUGEINT) * n_a)
           AS gap
  FROM ranked
),
agg AS (
  SELECT CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
         coalesce(max(gap), 0) AS m
  FROM gaps
),
split AS (
  SELECT CAST(min(g.cents) AS BIGINT) AS split_cents
  FROM gaps g, agg a WHERE g.gap = a.m
)
SELECT a.n_a, a.n_b,
       CAST(a.m * 10000 // nullif(CAST(a.n_a AS HUGEINT) * a.n_b, 0)
            AS BIGINT) AS d_bp,
       CAST(floor(1000.0 * CAST(a.m AS DOUBLE) * CAST(a.m AS DOUBLE)
         / nullif(CAST(a.n_a AS DOUBLE) * CAST(a.n_b AS DOUBLE)
                  * CAST(a.n_a + a.n_b AS DOUBLE), 0.0)) AS BIGINT)
         AS z2_milli,
       s.split_cents
FROM agg a, split s
"""


# ---------------------------------------------------------------------------
# Two-sample Anderson-Darling over order prices: the TAIL-SENSITIVE
# companion of orders_price_ks_test — KS sees only the single largest
# CDF gap (usually near the median); AD integrates the squared gap
# with 1/(F(1-F)) weights, so tail-only distribution shifts that KS
# misses move this statistic.


def q_orders_price_anderson_darling(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One row: group sizes and the exact two-sample Anderson-Darling
    A^2 in micro (Scholz-Stephens k=2 discrete/tie form, no
    continuity correction).

    Exactness: off the cents histogram, each distinct value's
    contribution is the exact integer quotient
    h*(N*M - n_a*B)^2 * 1e6 DIV (n_a*n_b*B*(N-B)) (h = count at the
    value, M/B = cumulative group-A/total counts, the B=N last value
    excluded), floor-then-summed identically on both engines (the
    chisq recipe). Headroom: the squared term is N^4*1e6-scale —
    DECIMAL(38,0) holds to ~1e8 orders worst-case; past that the
    non-ANSI session NULLs where DuckDB HUGEINT errors, the oracle
    gate being the loud failure.

    Scale shape: ONE corpus-sized shuffle (the cents histogram); both
    cumulative series ride the single with_global_prefix_sums range
    exchange (NO single-task global window); the final reduce is a
    1-row aggregate."""
    from .ranks import with_global_prefix_sums

    orders = table(spark, sf_dir, "orders")
    grp_a = ", ".join(f"'{g}'" for g in MW_GROUP_A)
    hist = (
        orders.selectExpr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS cents",
            f"CASE WHEN o_orderpriority IN ({grp_a}) THEN 1 ELSE 0 END"
            " AS in_a",
        )
        .groupBy("cents")
        .agg(
            F.sum("in_a").cast("bigint").alias("na"),
            F.sum(F.expr("1 - in_a")).cast("bigint").alias("nb"),
        )
        .withColumn("h", (F.col("na") + F.col("nb")).cast("bigint"))
    )
    ranked = with_global_prefix_sums(
        hist,
        {"na": "m_cum", "h": "b_cum"},
        "cents",
        total_cols={"na": "n_a", "h": "nn"},
    ).withColumn("n_b", F.expr("nn - n_a"))
    # totals from the UNFILTERED relation: a single-distinct-value
    # histogram filters every row out (its only value is the excluded
    # B = N point), and the group sizes must still emit
    tot = ranked.groupBy().agg(
        F.coalesce(F.max("n_a"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.max("n_b"), F.lit(0)).cast("bigint").alias("n_b"),
    )
    contrib = (
        ranked.filter(F.col("b_cum") < F.col("n_a") + F.col("n_b"))
        .selectExpr(
            "CAST(h AS DECIMAL(38,0))"
            " * (CAST(m_cum AS DECIMAL(38,0)) * (n_a + n_b)"
            "    - CAST(n_a AS DECIMAL(38,0)) * b_cum)"
            " * (CAST(m_cum AS DECIMAL(38,0)) * (n_a + n_b)"
            "    - CAST(n_a AS DECIMAL(38,0)) * b_cum)"
            " * 1000000"
            " DIV nullif(CAST(n_a AS DECIMAL(38,0)) * n_b * b_cum"
            "            * (n_a + n_b - b_cum), 0) AS contrib_micro",
        )
        .groupBy()
        .agg(
            F.coalesce(F.sum("contrib_micro"), F.lit(0).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("a2_micro"),
        )
    )
    return tot.crossJoin(F.broadcast(contrib))


ORACLE_ORDERS_PRICE_ANDERSON_DARLING = f"""
WITH hist AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(sum(CASE WHEN o_orderpriority IN
                  ({", ".join(f"'{g}'" for g in MW_GROUP_A)}) THEN 1 ELSE 0 END)
              AS BIGINT) AS na,
         CAST(sum(CASE WHEN o_orderpriority IN
                  ({", ".join(f"'{g}'" for g in MW_GROUP_A)}) THEN 0 ELSE 1 END)
              AS BIGINT) AS nb
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT na + nb AS h,
         sum(na) OVER w AS m_cum, sum(na + nb) OVER w AS b_cum,
         sum(na) OVER () AS n_a, sum(nb) OVER () AS n_b
  FROM hist
  WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)
)
, tot AS (
  SELECT CAST(coalesce(max(n_a), 0) AS BIGINT) AS n_a,
         CAST(coalesce(max(n_b), 0) AS BIGINT) AS n_b
  FROM ranked
),
contrib AS (
  SELECT CAST(coalesce(sum(CAST(h AS HUGEINT)
    * (CAST(m_cum AS HUGEINT) * (n_a + n_b)
       - CAST(n_a AS HUGEINT) * b_cum)
    * (CAST(m_cum AS HUGEINT) * (n_a + n_b)
       - CAST(n_a AS HUGEINT) * b_cum)
    * 1000000
    // nullif(CAST(n_a AS HUGEINT) * n_b * b_cum
              * (n_a + n_b - b_cum), 0)), 0) AS BIGINT) AS a2_micro
  FROM ranked
  WHERE b_cum < n_a + n_b
)
SELECT t.n_a, t.n_b, c.a2_micro FROM tot t, contrib c
"""


# ---------------------------------------------------------------------------
# Mood's median test across ALL priority levels: k-sample location —
# does ANY priority's price distribution sit above/below the global
# median? The k-sample companion of the two-sample Mann-Whitney, with
# only a median and a bounded k x 2 chi-square behind it (robust to
# tails by construction).


def q_orders_price_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(priority, n_orders, n_above_median, above_permille,
    chi2_total_micro): per priority, the count of orders strictly above
    the GLOBAL type-1 median price, and the k x 2 chi-square of the
    above/at-or-below split against independence (the statistic
    repeats on every row — the chisq-grid self-contained convention).

    Exactness: the global median is the exact type-1 order statistic
    off the cents histogram (cum*2 >= N cross-multiplied, the
    bowley/theil_sen convention, via with_global_prefix_sum — no
    global window); the split counts are exact BIGINTs; each k x 2
    cell's chi-square contribution is the floored integer
    (obs*N - r*c)^2 * 1e6 DIV (N*r*c) summed identically on both
    engines; above_permille is a nonneg matched-truncation quotient.

    Scale shape: ONE (priority, cents) histogram aggregation (THE
    shuffle); the global-median derivation regroups that compact
    relation; the 1-row median broadcast re-attaches to the SAME
    cached histogram; everything after runs on <= 2k rows."""
    from ..cachereg import cache_eager
    from .ranks import with_global_prefix_sum

    orders = table(spark, sf_dir, "orders")
    hist = (
        orders.selectExpr(
            "o_orderpriority",
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS cents",
        )
        .groupBy("o_orderpriority", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    hist = cache_eager(hist)
    all_h = hist.groupBy("cents").agg(F.sum("c").cast("bigint").alias("ch"))
    ranked = with_global_prefix_sum(
        all_h, "ch", "cents", sum_col="cum", total_col="nn"
    )
    med = ranked.groupBy().agg(
        F.min(
            F.when(F.col("cum") * 2 >= F.col("nn"), F.col("cents"))
        ).alias("med_cents")
    )
    cells = (
        hist.crossJoin(F.broadcast(med))
        .selectExpr(
            "o_orderpriority",
            "CASE WHEN cents > med_cents THEN 1 ELSE 0 END AS above",
            "c",
        )
        .groupBy("o_orderpriority", "above")
        .agg(F.sum("c").cast("bigint").alias("observed"))
    )
    # densify the k x 2 grid (a priority entirely on one side of the
    # median still contributes expected mass on the other)
    spine = cells.select("o_orderpriority").distinct().crossJoin(
        F.broadcast(
            cells.sparkSession.range(2).selectExpr("CAST(id AS INT) AS above")
        )
    )
    dense = spine.join(cells, ["o_orderpriority", "above"], "left").selectExpr(
        "o_orderpriority",
        "above",
        "coalesce(observed, CAST(0 AS BIGINT)) AS observed",
    )
    wp = W.partitionBy("o_orderpriority")
    wa = W.partitionBy("above")
    wall = W.partitionBy()
    grid = dense.select(
        "o_orderpriority",
        "above",
        "observed",
        F.sum("observed").over(wp).cast("bigint").alias("r"),
        F.sum("observed").over(wa).cast("bigint").alias("col_t"),
        F.sum("observed").over(wall).cast("bigint").alias("n"),
    )
    diff = (
        "(CAST(observed AS DECIMAL(38,0)) * n"
        " - CAST(r AS DECIMAL(38,0)) * col_t)"
    )
    contrib = grid.selectExpr(
        "o_orderpriority",
        "above",
        "observed",
        "r",
        "n",
        f"CAST({diff} * {diff} * 1000000"
        " DIV nullif(CAST(n AS DECIMAL(38,0)) * r * col_t, 0) AS BIGINT)"
        " AS cell_micro",
    ).withColumn(
        "chi2_total_micro",
        F.sum("cell_micro").over(W.partitionBy()).cast("bigint"),
    )
    return (
        contrib.groupBy("o_orderpriority")
        .agg(
            F.max("r").alias("n_orders"),
            F.sum(F.when(F.col("above") == 1, F.col("observed")))
            .cast("bigint")
            .alias("n_above_median"),
            F.max("chi2_total_micro").alias("chi2_total_micro"),
        )
        .selectExpr(
            "o_orderpriority",
            "n_orders",
            "n_above_median",
            "CAST(n_above_median * 1000 DIV nullif(n_orders, 0) AS BIGINT)"
            " AS above_permille",
            "chi2_total_micro",
        )
        .orderBy("o_orderpriority")
    )


ORACLE_ORDERS_PRICE_MOOD_MEDIAN = """
WITH hist AS (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT cents,
         sum(ch) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum,
         sum(ch) OVER () AS nn
  FROM (SELECT cents, CAST(sum(c) AS BIGINT) AS ch FROM hist GROUP BY 1)
),
med AS (
  SELECT min(CASE WHEN cum * 2 >= nn THEN cents END) AS med_cents
  FROM ranked
),
cells AS (
  SELECT h.o_orderpriority,
         CASE WHEN h.cents > m.med_cents THEN 1 ELSE 0 END AS above,
         CAST(sum(h.c) AS BIGINT) AS observed
  FROM hist h, med m
  GROUP BY 1, 2
),
dense AS (
  SELECT p.o_orderpriority, a.above,
         coalesce(c.observed, CAST(0 AS BIGINT)) AS observed
  FROM (SELECT DISTINCT o_orderpriority FROM cells) p
  CROSS JOIN (SELECT 0 AS above UNION ALL SELECT 1) a
  LEFT JOIN cells c
    ON c.o_orderpriority = p.o_orderpriority AND c.above = a.above
),
grid AS (
  SELECT o_orderpriority, above, observed,
         CAST(sum(observed) OVER (PARTITION BY o_orderpriority) AS BIGINT)
           AS r,
         CAST(sum(observed) OVER (PARTITION BY above) AS BIGINT) AS col_t,
         CAST(sum(observed) OVER () AS BIGINT) AS n
  FROM dense
),
contrib AS (
  SELECT o_orderpriority, above, observed, r,
         CAST((CAST(observed AS HUGEINT) * n - CAST(r AS HUGEINT) * col_t)
              * (CAST(observed AS HUGEINT) * n - CAST(r AS HUGEINT) * col_t)
              * 1000000
              // nullif(CAST(n AS HUGEINT) * r * col_t, 0) AS BIGINT)
           AS cell_micro
  FROM grid
),
tot AS (
  SELECT CAST(sum(cell_micro) AS BIGINT) AS chi2_total_micro FROM contrib
)
SELECT c.o_orderpriority,
       CAST(max(c.r) AS BIGINT) AS n_orders,
       CAST(coalesce(sum(CASE WHEN c.above = 1 THEN c.observed END), 0)
            AS BIGINT) AS n_above_median,
       CAST(coalesce(sum(CASE WHEN c.above = 1 THEN c.observed END), 0)
            * 1000 // nullif(max(c.r), 0) AS BIGINT) AS above_permille,
       CAST(max(t.chi2_total_micro) AS BIGINT) AS chi2_total_micro
FROM contrib c, tot t
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Cramer's V between order priority and order status: the EFFECT-SIZE
# companion of order_size_priority_chisq (chi2 grows with n even for a
# fixed association; V is the 0..1 normalization analysts compare
# across tables).


def q_order_priority_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: n, level counts, degrees of freedom, the chi-square
    statistic in micro, and Cramer's V in milli.

    Exactness: the (priority x status) contingency grid is bounded
    (5 x 3), so margins are constant-key windows on the grid; each
    cell's chi2 contribution is the exact integer quotient
    (obs*n - r*c)^2 * 1e6 DIV (n*r*c) (nonneg dividend, matched
    truncation) and the statistic is the sum of those floored micro
    cells — identical floor-then-sum on both engines (the chisq
    precedent). Headroom: diff^2*1e6 is n^4*1e6-scale — DECIMAL(38,0)
    holds to worst-case-skew n ~ 1e8 orders; past that the non-ANSI
    session NULLs where DuckDB HUGEINT errors, and the oracle gate is
    the loud failure. V alone is class B: one sqrt over the exact
    integers, identical tree, floored at milli.

    Scale shape: one orders aggregation onto the bounded grid; the
    grid is DENSIFIED by a distinct-level spine cross (r x c <= 15,
    metadata-sized, BNLJ-allowlisted — an unobserved cell still
    contributes its expected mass (r*c)^2/(n*r*c), without which a
    perfectly-associated 2x2 would report V < 1); all statistic math
    runs on <= 15 rows."""
    from ..cachereg import cache_eager

    orders = table(spark, sf_dir, "orders")
    # cached: the spine's two distinct-level relations and the left
    # join all derive from this <=15-row grid — without the cache
    # Catalyst expands each branch into its own corpus scan
    sparse = cache_eager(
        orders.groupBy("o_orderpriority", "o_orderstatus").agg(
            F.count(F.lit(1)).cast("bigint").alias("obs")
        )
    )
    pr = sparse.select("o_orderpriority").distinct()
    st = sparse.select("o_orderstatus").distinct()
    cells = (
        pr.crossJoin(F.broadcast(st))
        .join(F.broadcast(sparse), ["o_orderpriority", "o_orderstatus"], "left")
        .selectExpr(
            "o_orderpriority",
            "o_orderstatus",
            "coalesce(obs, CAST(0 AS BIGINT)) AS observed",
        )
    )
    wp = W.partitionBy("o_orderpriority")
    ws = W.partitionBy("o_orderstatus")
    wall = W.partitionBy()
    grid = cells.select(
        "o_orderpriority",
        "o_orderstatus",
        "observed",
        F.sum("observed").over(wp).cast("bigint").alias("r"),
        F.sum("observed").over(ws).cast("bigint").alias("c"),
        F.sum("observed").over(wall).cast("bigint").alias("n"),
    )
    diff = (
        "(CAST(observed AS DECIMAL(38,0)) * n"
        " - CAST(r AS DECIMAL(38,0)) * c)"
    )
    per_cell = grid.selectExpr(
        "o_orderpriority",
        "o_orderstatus",
        "n",
        f"CAST({diff} * {diff} * 1000000"
        " DIV (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"
        " AS chi2_cell_micro",
    )
    agg = per_cell.groupBy().agg(
        F.max("n").alias("n_orders"),
        F.countDistinct("o_orderpriority").cast("bigint").alias("r_levels"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("c_levels"),
        F.sum("chi2_cell_micro").cast("bigint").alias("chi2_micro"),
    )
    return agg.selectExpr(
        "n_orders",
        "r_levels",
        "c_levels",
        "(r_levels - 1) * (c_levels - 1) AS dof",
        "chi2_micro",
        # class-B sqrt over the exact integers (kendall tau_b precedent)
        "CAST(floor(1000.0 * sqrt((CAST(chi2_micro AS DOUBLE) / 1000000.0)"
        " / nullif(CAST(n_orders AS DOUBLE)"
        "          * CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE),"
        " 0.0))) AS BIGINT) AS v_milli",
    )


ORACLE_ORDER_PRIORITY_CRAMERS_V = """
WITH sparse AS (
  SELECT o_orderpriority, o_orderstatus,
         CAST(count(*) AS BIGINT) AS obs
  FROM orders GROUP BY 1, 2
),
cells AS (
  SELECT p.o_orderpriority, s.o_orderstatus,
         coalesce(sp.obs, CAST(0 AS BIGINT)) AS observed
  FROM (SELECT DISTINCT o_orderpriority FROM sparse) p
  CROSS JOIN (SELECT DISTINCT o_orderstatus FROM sparse) s
  LEFT JOIN sparse sp
    ON sp.o_orderpriority = p.o_orderpriority
   AND sp.o_orderstatus = s.o_orderstatus
),
grid AS (
  SELECT o_orderpriority, o_orderstatus, observed,
         CAST(sum(observed) OVER (PARTITION BY o_orderpriority) AS BIGINT)
           AS r,
         CAST(sum(observed) OVER (PARTITION BY o_orderstatus) AS BIGINT)
           AS c,
         CAST(sum(observed) OVER () AS BIGINT) AS n
  FROM cells
),
per_cell AS (
  SELECT n,
         o_orderpriority, o_orderstatus,
         CAST((CAST(observed AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
              * (CAST(observed AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
              * 1000000
              // (CAST(n AS HUGEINT) * r * c) AS BIGINT)
           AS chi2_cell_micro
  FROM grid
),
agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n_orders,
         CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS r_levels,
         CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS c_levels,
         CAST(sum(chi2_cell_micro) AS BIGINT) AS chi2_micro
  FROM per_cell
)
SELECT n_orders, r_levels, c_levels,
       (r_levels - 1) * (c_levels - 1) AS dof,
       chi2_micro,
       CAST(floor(1000.0 * sqrt((CAST(chi2_micro AS DOUBLE) / 1000000.0)
         / nullif(CAST(n_orders AS DOUBLE)
                  * CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE),
           0.0))) AS BIGINT) AS v_milli
FROM agg
"""


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-alternative trend across priority levels:
# the ORDERED counterpart of part_brand_price_anova — "does line
# quantity shift monotonically as order priority rises?" — strictly
# more powerful than chi-square/ANOVA when the alternative is a trend.


def q_lineitem_qty_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: line/group/cell counts, the DOUBLED JT statistic and
    its doubled null mean (doubling keeps the tie convention's half
    counts integral), the trend sign, and the null z^2 in milli.

    Exactness: the (priority rank x quantity) contingency grid is
    GRID-BOUNDED (5 x 50 data-independent cells), so the cell-pair
    inequality join is a metadata-sized nested loop
    (BNLJ-allowlisted class). JT2 = sum over g1<g2 cell pairs of
    n1*n2*(2*[q1<q2] + [q1=q2]) and E2 = sum_{j<k} n_j*n_k =
    (N^2 - sum n_g^2) DIV 2 (always even, nonneg) are exact
    DECIMAL(38,0)/HUGEINT. z^2 alone is class B: 18*(JT2-E2)^2 /
    (N^2*(2N+3) - sum n_g^2*(2n_g+3)), the classic no-tie-correction
    null variance scaled to the doubled statistic — one double chain
    over exact integers, identical tree, floored at milli; the signed
    difference is only ever squared. Variance headroom: N^3-scale —
    DECIMAL(38,0) holds to N ~ 2e12 lines.

    Scale shape: ONE orderkey fact-fact join collapses to the bounded
    grid; everything after runs on <= 250 rows."""
    from ..cachereg import cache_eager

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    cells = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .selectExpr(
            "CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g",
            "CAST(l_quantity AS BIGINT) AS q",
        )
        .groupBy("g", "q")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    cells = cache_eager(cells)
    a = cells.selectExpr("g AS g1", "q AS q1", "n AS n1")
    b = cells.selectExpr("g AS g2", "q AS q2", "n AS n2")
    jt = (
        a.join(F.broadcast(b), F.expr("g1 < g2"))
        .selectExpr(
            "CAST(n1 AS DECIMAL(38,0)) * n2"
            " * (CASE WHEN q1 < q2 THEN 2 WHEN q1 = q2 THEN 1 ELSE 0 END)"
            " AS jt_term"
        )
        .groupBy()
        .agg(
            F.coalesce(F.sum("jt_term"), F.lit(0).cast("decimal(38,0)"))
            .alias("jt2")
        )
    )
    marg = cells.groupBy("g").agg(
        F.sum("n").cast("decimal(38,0)").alias("n_g")
    )
    tot = marg.groupBy().agg(
        F.sum("n_g").alias("nn"),
        F.sum(F.expr("n_g * n_g")).alias("sum_sq"),
        F.sum(F.expr("n_g * n_g * (2 * n_g + 3)")).alias("sum_v"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    )
    ncells = cells.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells")
    )
    return (
        jt.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ncells))
        .selectExpr(
            "CAST(nn AS BIGINT) AS n_lines",
            "n_groups",
            "n_cells",
            "CAST(jt2 AS BIGINT) AS jt2",
            # N^2 - sum n_g^2 = 2 * sum_{j<k} n_j n_k: even, nonneg
            "CAST((nn * nn - sum_sq) DIV 2 AS BIGINT) AS e2",
            "CASE WHEN jt2 > (nn * nn - sum_sq) DIV 2 THEN 1"
            " WHEN jt2 < (nn * nn - sum_sq) DIV 2 THEN -1 ELSE 0 END"
            " AS trend_sign",
            "CAST(floor(18000.0"
            " * CAST(jt2 - (nn * nn - sum_sq) DIV 2 AS DOUBLE)"
            " * CAST(jt2 - (nn * nn - sum_sq) DIV 2 AS DOUBLE)"
            " / nullif(CAST(nn * nn * (2 * nn + 3) - sum_v AS DOUBLE),"
            " 0.0)) AS BIGINT) AS z2_milli",
        )
    )


ORACLE_LINEITEM_QTY_JONCKHEERE = """
WITH cells AS (
  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
jt AS (
  SELECT CAST(coalesce(sum(CAST(a.n AS HUGEINT) * b.n
           * (CASE WHEN a.q < b.q THEN 2 WHEN a.q = b.q THEN 1 ELSE 0 END)),
           0) AS HUGEINT) AS jt2
  FROM cells a JOIN cells b ON a.g < b.g
),
marg AS (
  SELECT CAST(sum(n) AS HUGEINT) AS n_g FROM cells GROUP BY g
),
tot AS (
  SELECT CAST(sum(n_g) AS HUGEINT) AS nn,
         CAST(sum(n_g * n_g) AS HUGEINT) AS sum_sq,
         CAST(sum(n_g * n_g * (2 * n_g + 3)) AS HUGEINT) AS sum_v,
         CAST(count(*) AS BIGINT) AS n_groups
  FROM marg
),
nc AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells FROM cells
)
SELECT CAST(t.nn AS BIGINT) AS n_lines,
       t.n_groups,
       nc.n_cells,
       CAST(j.jt2 AS BIGINT) AS jt2,
       CAST((t.nn * t.nn - t.sum_sq) // 2 AS BIGINT) AS e2,
       CASE WHEN j.jt2 > (t.nn * t.nn - t.sum_sq) // 2 THEN 1
            WHEN j.jt2 < (t.nn * t.nn - t.sum_sq) // 2 THEN -1
            ELSE 0 END AS trend_sign,
       CAST(floor(18000.0
         * CAST(j.jt2 - (t.nn * t.nn - t.sum_sq) // 2 AS DOUBLE)
         * CAST(j.jt2 - (t.nn * t.nn - t.sum_sq) // 2 AS DOUBLE)
         / nullif(CAST(t.nn * t.nn * (2 * t.nn + 3) - t.sum_v AS DOUBLE),
           0.0)) AS BIGINT) AS z2_milli
FROM jt j, tot t, nc
"""


# ---------------------------------------------------------------------------
# Brown-Forsythe (median-based Levene) homogeneity-of-variance test
# across customer segments: the SPREAD counterpart of
# customer_acctbal_bowley_skew — "do segments differ in balance
# DISPERSION, not just location?" — the gate statistic one checks
# before trusting a pooled-variance ANOVA.


def q_customer_acctbal_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: customer/group counts, the between/within
    sums-of-squares of the absolute deviations from group MEDIANS
    (milli-scaled), and the Brown-Forsythe F in milli.

    Exactness: per-segment type-1 medians come exactly off the
    (segment, cents) histogram (the bowley_skew recipe); each
    deviation |cents - med| is an exact nonneg integer, so the group
    aggregates n_g, S_g = sum dev, Q_g = sum dev^2 are exact
    DECIMAL(38,0). The SS decomposition keeps one floored-integer
    quotient per group (S_g^2 * 1000 DIV n_g, nonneg matched
    truncation — the chisq floor-then-sum precedent) so ssb/ssw are
    identical integers on both engines; quantization can dip ssb a few
    milli negative near perfect homogeneity (signed, but only ever a
    double numerator). F alone is class B: one double chain over the
    exact integers, floored at milli. Headroom: S_g^2*1000 is
    (N*dev)^2*1e3-scale — DECIMAL(38,0) holds to N ~ 1e11 customers at
    the 1e6-cent deviation bound.

    Scale shape: one (segment, cents) histogram aggregation (THE
    shuffle); medians via segment-partitioned windows on that compact
    relation; deviations re-aggregate the SAME histogram against the
    <=5-row broadcast median relation — the corpus is scanned once."""
    from ..cachereg import cache_eager

    cust = table(spark, sf_dir, "customer")
    hist = (
        cust.selectExpr(
            "c_mktsegment AS segment",
            "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS cents",
        )
        .groupBy("segment", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    hist = cache_eager(hist)
    w_seg = (
        W.partitionBy("segment")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    n = hist.groupBy("segment").agg(F.sum("c").cast("bigint").alias("n"))
    meds = (
        hist.withColumn("cum", F.sum("c").over(w_seg))
        .join(F.broadcast(n), "segment")
        .groupBy("segment")
        .agg(
            F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("cents")))
            .alias("med_cents")
        )
    )
    groups = (
        hist.join(F.broadcast(meds), "segment")
        .selectExpr("segment", "c", "abs(cents - med_cents) AS dev")
        .groupBy("segment")
        .agg(
            F.sum("c").cast("decimal(38,0)").alias("n_g"),
            F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * dev")).alias("s_g"),
            F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * dev * dev"))
            .alias("q_g"),
        )
    )
    tot = groups.selectExpr(
        "n_g",
        "s_g",
        "q_g",
        # per-group floored milli quotient (nonneg) — summed identically
        "s_g * s_g * 1000 DIV n_g AS b_g_milli",
    ).groupBy().agg(
        F.sum("n_g").alias("nn"),
        F.sum("s_g").alias("ss"),
        F.sum("q_g").alias("qq"),
        F.sum("b_g_milli").alias("b_milli"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    )
    return tot.selectExpr(
        "CAST(nn AS BIGINT) AS n_customers",
        "n_groups",
        "CAST(b_milli - ss * ss * 1000 DIV nn AS BIGINT) AS ssb_milli",
        "CAST(qq * 1000 - b_milli AS BIGINT) AS ssw_milli",
        "CAST(floor(1000.0"
        " * CAST(b_milli - ss * ss * 1000 DIV nn AS DOUBLE)"
        " * CAST(nn - n_groups AS DOUBLE)"
        " / nullif(CAST(qq * 1000 - b_milli AS DOUBLE)"
        "          * CAST(n_groups - 1 AS DOUBLE), 0.0)) AS BIGINT)"
        " AS f_milli",
    )


ORACLE_CUSTOMER_ACCTBAL_LEVENE = """
WITH hist AS (
  SELECT c_mktsegment AS segment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS c
  FROM customer GROUP BY 1, 2
),
cum AS (
  SELECT segment, cents, c,
         sum(c) OVER (PARTITION BY segment ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY segment) AS n
  FROM hist
),
meds AS (
  SELECT segment,
         min(CASE WHEN cum * 2 >= n THEN cents END) AS med_cents
  FROM cum GROUP BY 1
),
groups AS (
  SELECT h.segment,
         CAST(sum(h.c) AS HUGEINT) AS n_g,
         CAST(sum(CAST(h.c AS HUGEINT) * abs(h.cents - m.med_cents))
              AS HUGEINT) AS s_g,
         CAST(sum(CAST(h.c AS HUGEINT) * abs(h.cents - m.med_cents)
                  * abs(h.cents - m.med_cents)) AS HUGEINT) AS q_g
  FROM hist h JOIN meds m ON h.segment = m.segment
  GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_g) AS HUGEINT) AS nn,
         CAST(sum(s_g) AS HUGEINT) AS ss,
         CAST(sum(q_g) AS HUGEINT) AS qq,
         CAST(sum(s_g * s_g * 1000 // n_g) AS HUGEINT) AS b_milli,
         CAST(count(*) AS BIGINT) AS n_groups
  FROM groups
)
SELECT CAST(nn AS BIGINT) AS n_customers,
       n_groups,
       CAST(b_milli - ss * ss * 1000 // nn AS BIGINT) AS ssb_milli,
       CAST(qq * 1000 - b_milli AS BIGINT) AS ssw_milli,
       CAST(floor(1000.0
         * CAST(b_milli - ss * ss * 1000 // nn AS DOUBLE)
         * CAST(nn - n_groups AS DOUBLE)
         / nullif(CAST(qq * 1000 - b_milli AS DOUBLE)
                  * CAST(n_groups - 1 AS DOUBLE), 0.0)) AS BIGINT)
         AS f_milli
FROM tot
"""


QUERIES = {
    "orders_price_mood_median": q_orders_price_mood_median,
    "orders_price_anderson_darling": q_orders_price_anderson_darling,
    "orders_priority_mix_drift": q_orders_priority_mix_drift,
    "customer_spend_mld": q_customer_spend_mld,
    "orders_price_ks_test": q_orders_price_ks_test,
    "order_priority_cramers_v": q_order_priority_cramers_v,
    "lineitem_qty_jonckheere": q_lineitem_qty_jonckheere,
    "customer_acctbal_levene": q_customer_acctbal_levene,
    "supplier_latency_tukey": q_supplier_latency_tukey,
    "quantity_price_mutual_info": q_quantity_price_mutual_info,
    "customer_interpurchase_lifetable": q_customer_interpurchase_lifetable,
    "returns_quantity_trend": q_returns_quantity_trend,
    "orders_mannwhitney_u": q_orders_mannwhitney_u,
    "supplier_revenue_theil": q_supplier_revenue_theil,
    "part_size_price_kendall": q_part_size_price_kendall,
    "customer_acctbal_bowley_skew": q_customer_acctbal_bowley_skew,
    "lineitem_benford_digits": q_lineitem_benford_digits,
    "part_brand_price_anova": q_part_brand_price_anova,
    "customer_order_gap_histogram": q_customer_order_gap_histogram,
    "customer_spend_gini": q_customer_spend_gini,
    "ship_latency_qty_ols": q_ship_latency_qty_ols,
    "discount_qty_elasticity": q_discount_qty_elasticity,
    "orders_weekday_profile": q_orders_weekday_profile,
    "order_size_priority_chisq": q_order_size_priority_chisq,
    "orders_same_day_repeats": q_orders_same_day_repeats,
    "part_supplier_degree_histogram": q_part_supplier_degree_histogram,
    "parts_abc_classification": q_parts_abc_classification,
    "supplier_herfindahl": q_supplier_herfindahl,
    "pricing_summary": q_pricing_summary,
    "top_customers_by_spend": q_top_customers_by_spend,
    "signed_amount_sum": q_signed_amount_sum,
    "union_open_cleared": q_union_open_cleared,
    "aging_buckets": q_aging_buckets,
    "count_distinct": q_count_distinct,
    "having_threshold": q_having_threshold,
    "customers_without_orders": q_customers_without_orders,
    "customers_with_urgent_orders": q_customers_with_urgent_orders,
    "revenue_by_region": q_revenue_by_region,
    "volume_shipping_pairs": q_volume_shipping,
    "nation_market_share": q_market_share,
    "large_volume_customers": q_large_volume_customers,
    "sales_opportunity": q_sales_opportunity,
    "nation_customer_counts": q_nation_customer_counts,
    "above_nation_average": q_above_nation_average,
    "top_orders_per_segment": q_top_orders_per_segment,
    "date_functions": q_date_functions,
    "string_functions": q_string_functions,
    "status_pivot": q_status_pivot,
    "quantity_dispersion": q_quantity_dispersion,
    "order_value_percentiles": q_order_value_percentiles,
    "three_way_match": q_three_way_match,
    "orders_outside_segment": q_orders_outside_segment,
    "distinct_segments": q_distinct_segments,
    "brand_size_setops": q_brand_size_setops,
    "rollup_region_nation": q_rollup_region_nation,
    "grouping_sets_balance": q_grouping_sets_balance,
    "join_constant_predicate": q_join_constant_predicate,
    "recursive_line_chain": q_recursive_line_chain,
    "ship_promo_windows": q_ship_promo_windows,
    "cube_lineitem_status": q_cube_lineitem_status,
    "pivot_priority_status": q_pivot_priority_status,
    "unpivot_pricing": q_unpivot_pricing,
    "size_multiset_ops": q_size_multiset_ops,
    "quantity_price_corr": q_quantity_price_corr,
    "running_balance": q_running_balance,
    "revenue_mom_delta": q_revenue_mom_delta,
    "monthly_revenue_spine": q_monthly_revenue_spine,
    "monthly_seasonality": q_monthly_seasonality,
    "monthly_order_backlog": q_monthly_order_backlog,
    "nation_delivery_performance": q_nation_delivery_performance,
    "part_skyline_frontier": q_part_skyline_frontier,
    "fifo_return_reallocation": q_fifo_return_reallocation,
    "part_name_fuzzy_pairs": q_part_name_fuzzy_pairs,
    "customer_revenue_pareto": q_customer_revenue_pareto,
    "customer_order_sprees": q_customer_order_sprees,
    "parts_sourcing_risk": q_parts_sourcing_risk,
    "customer_repeat_rate": q_customer_repeat_rate,
    "supplier_delivery_variance": q_supplier_delivery_variance,
    "dq_benford_amounts": q_dq_benford_amounts,
    "recursive_line_chain_native": q_recursive_line_chain_native,
    "parts_copurchase": q_parts_copurchase,
    "dq_orders_checks": q_dq_orders_checks,
    "customer_cohort_ltv": q_customer_cohort_ltv,
    "customer_rfm_segments": q_customer_rfm_segments,
    "customer_rfm_migration": q_customer_rfm_migration,
    "priority_ship_latency": q_priority_ship_latency,
    "orders_ship_survival": q_orders_ship_survival,
    "supplier_reliability_ranking": q_supplier_reliability_ranking,
    "reorder_interval_percentiles": q_reorder_interval_percentiles,
    "customer_spend_trend": q_customer_spend_trend,
    "customer_acctbal_by_segment": q_customer_acctbal_by_segment,
    "supplier_acctbal_extremes": q_supplier_acctbal_extremes,
    "part_price_size_curve": q_part_price_size_curve,
    "order_line_count_histogram": q_order_line_count_histogram,
    "brand_return_rates": q_brand_return_rates,
    "promo_part_suppliers": q_promo_part_suppliers,
    "suppliers_kept_waiting": q_suppliers_kept_waiting,
    "small_quantity_revenue": q_small_quantity_revenue,
    "top_supplier_revenue": q_top_supplier_revenue,
    "cheapest_supplier_per_part": q_cheapest_supplier_per_part,
    "customer_order_distribution": q_customer_order_distribution,
    "discounted_brand_revenue": q_discounted_brand_revenue,
    "order_priority_check": q_order_priority_check,
    "ship_priority_classes": q_ship_priority_classes,
    "promo_revenue_share": q_promo_revenue_share,
    "part_supplier_concentration": q_part_supplier_concentration,
    "shipping_priority": q_shipping_priority,
    "local_supplier_volume": q_local_supplier_volume,
    "forecast_revenue_change": q_forecast_revenue_change,
    "product_type_profit": q_product_type_profit,
    "returned_item_report": q_returned_item_report,
    "important_part_values": q_important_part_values,
}

ORACLES = {
    "orders_price_mood_median": ORACLE_ORDERS_PRICE_MOOD_MEDIAN,
    "orders_price_anderson_darling": ORACLE_ORDERS_PRICE_ANDERSON_DARLING,
    "orders_priority_mix_drift": ORACLE_ORDERS_PRIORITY_MIX_DRIFT,
    "customer_spend_mld": ORACLE_CUSTOMER_SPEND_MLD,
    "orders_price_ks_test": ORACLE_ORDERS_PRICE_KS_TEST,
    "order_priority_cramers_v": ORACLE_ORDER_PRIORITY_CRAMERS_V,
    "lineitem_qty_jonckheere": ORACLE_LINEITEM_QTY_JONCKHEERE,
    "customer_acctbal_levene": ORACLE_CUSTOMER_ACCTBAL_LEVENE,
    "supplier_latency_tukey": ORACLE_SUPPLIER_LATENCY_TUKEY,
    "quantity_price_mutual_info": ORACLE_QUANTITY_PRICE_MUTUAL_INFO,
    "customer_interpurchase_lifetable": (
        ORACLE_CUSTOMER_INTERPURCHASE_LIFETABLE
    ),
    "returns_quantity_trend": ORACLE_RETURNS_QUANTITY_TREND,
    "lineitem_benford_digits": ORACLE_LINEITEM_BENFORD_DIGITS,
    "part_brand_price_anova": ORACLE_PART_BRAND_PRICE_ANOVA,
    "customer_order_gap_histogram": ORACLE_CUSTOMER_ORDER_GAP_HISTOGRAM,
    "orders_mannwhitney_u": ORACLE_ORDERS_MANNWHITNEY_U,
    "customer_acctbal_bowley_skew": ORACLE_CUSTOMER_ACCTBAL_BOWLEY_SKEW,
    "supplier_revenue_theil": ORACLE_SUPPLIER_REVENUE_THEIL,
    "part_size_price_kendall": ORACLE_PART_SIZE_PRICE_KENDALL,
    "customer_spend_gini": ORACLE_CUSTOMER_SPEND_GINI,
    "ship_latency_qty_ols": ORACLE_SHIP_LATENCY_QTY_OLS,
    "discount_qty_elasticity": ORACLE_DISCOUNT_QTY_ELASTICITY,
    "orders_weekday_profile": ORACLE_ORDERS_WEEKDAY_PROFILE,
    "order_size_priority_chisq": ORACLE_ORDER_SIZE_PRIORITY_CHISQ,
    "orders_same_day_repeats": ORACLE_ORDERS_SAME_DAY_REPEATS,
    "part_supplier_degree_histogram": ORACLE_PART_SUPPLIER_DEGREE_HISTOGRAM,
    "parts_abc_classification": ORACLE_PARTS_ABC,
    "supplier_herfindahl": ORACLE_SUPPLIER_HHI,
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "top_customers_by_spend": ORACLE_TOP_CUSTOMERS,
    "signed_amount_sum": ORACLE_SIGNED_AMOUNT,
    "union_open_cleared": ORACLE_UNION_OPEN_CLEARED,
    "aging_buckets": ORACLE_AGING_BUCKETS,
    "count_distinct": ORACLE_COUNT_DISTINCT,
    "having_threshold": ORACLE_HAVING,
    "customers_without_orders": ORACLE_ANTI_JOIN,
    "customers_with_urgent_orders": ORACLE_SEMI_JOIN,
    "revenue_by_region": ORACLE_REVENUE_BY_REGION,
    "volume_shipping_pairs": ORACLE_VOLUME_SHIPPING,
    "nation_market_share": ORACLE_MARKET_SHARE,
    "large_volume_customers": ORACLE_LARGE_VOLUME,
    "sales_opportunity": ORACLE_SALES_OPPORTUNITY,
    "nation_customer_counts": ORACLE_NATION_CUSTOMER_COUNTS,
    "above_nation_average": ORACLE_ABOVE_NATION_AVG,
    "top_orders_per_segment": ORACLE_TOP_PER_SEGMENT,
    "date_functions": ORACLE_DATE_FUNCTIONS,
    "string_functions": ORACLE_STRING_FUNCTIONS,
    "status_pivot": ORACLE_STATUS_PIVOT,
    "quantity_dispersion": ORACLE_DISPERSION,
    "order_value_percentiles": ORACLE_PERCENTILES,
    "three_way_match": ORACLE_THREE_WAY_MATCH,
    "orders_outside_segment": ORACLE_NOT_IN_REWRITE,
    "distinct_segments": ORACLE_DISTINCT,
    "brand_size_setops": ORACLE_SETOPS,
    "rollup_region_nation": ORACLE_ROLLUP,
    "grouping_sets_balance": ORACLE_GROUPING_SETS,
    "join_constant_predicate": ORACLE_JOIN_CONSTANT,
    "recursive_line_chain": ORACLE_RECURSIVE,
    "ship_promo_windows": ORACLE_SHIP_PROMO,
    "cube_lineitem_status": ORACLE_CUBE,
    "pivot_priority_status": ORACLE_PIVOT,
    "unpivot_pricing": ORACLE_UNPIVOT,
    "size_multiset_ops": ORACLE_MULTISET_OPS,
    "quantity_price_corr": ORACLE_QTY_PRICE_CORR,
    "running_balance": ORACLE_RUNNING_BALANCE,
    "revenue_mom_delta": ORACLE_REVENUE_MOM,
    "monthly_revenue_spine": ORACLE_MONTHLY_SPINE,
    "monthly_seasonality": ORACLE_MONTHLY_SEASONALITY,
    "monthly_order_backlog": ORACLE_MONTHLY_BACKLOG,
    "nation_delivery_performance": ORACLE_NATION_DELIVERY,
    "part_skyline_frontier": ORACLE_PART_SKYLINE,
    "fifo_return_reallocation": ORACLE_FIFO_REALLOCATION,
    "part_name_fuzzy_pairs": ORACLE_PART_FUZZY,
    "customer_revenue_pareto": ORACLE_REVENUE_PARETO,
    "customer_order_sprees": ORACLE_ORDER_SPREES,
    "parts_sourcing_risk": ORACLE_SOURCING_RISK,
    "customer_repeat_rate": ORACLE_REPEAT_RATE,
    "supplier_delivery_variance": ORACLE_DELIVERY_VARIANCE,
    "dq_benford_amounts": ORACLE_DQ_BENFORD,
    "recursive_line_chain_native": ORACLE_RECURSIVE,
    "parts_copurchase": ORACLE_PARTS_COPURCHASE,
    "dq_orders_checks": ORACLE_DQ_ORDERS,
    "customer_cohort_ltv": ORACLE_CUSTOMER_COHORT_LTV,
    "customer_rfm_segments": ORACLE_CUSTOMER_RFM,
    "customer_rfm_migration": ORACLE_CUSTOMER_RFM_MIGRATION,
    "priority_ship_latency": ORACLE_PRIORITY_SHIP_LATENCY,
    "orders_ship_survival": ORACLE_ORDERS_SHIP_SURVIVAL,
    "supplier_reliability_ranking": ORACLE_SUPPLIER_RELIABILITY,
    "reorder_interval_percentiles": ORACLE_REORDER_INTERVAL,
    "customer_spend_trend": ORACLE_CUSTOMER_SPEND_TREND,
    "customer_acctbal_by_segment": ORACLE_ACCTBAL_BY_SEGMENT,
    "supplier_acctbal_extremes": ORACLE_SUPPLIER_ACCTBAL_EXTREMES,
    "part_price_size_curve": ORACLE_PART_PRICE_SIZE_CURVE,
    "order_line_count_histogram": ORACLE_ORDER_LINE_COUNT_HIST,
    "brand_return_rates": ORACLE_BRAND_RETURN_RATES,
    "promo_part_suppliers": ORACLE_PROMO_PART_SUPPLIERS,
    "suppliers_kept_waiting": ORACLE_SUPPLIERS_KEPT_WAITING,
    "small_quantity_revenue": ORACLE_SMALL_QUANTITY,
    "top_supplier_revenue": ORACLE_TOP_SUPPLIER,
    "cheapest_supplier_per_part": ORACLE_CHEAPEST_SUPPLIER,
    "customer_order_distribution": ORACLE_CUSTOMER_ORDER_DIST,
    "discounted_brand_revenue": ORACLE_DISCOUNTED_BRAND,
    "order_priority_check": ORACLE_ORDER_PRIORITY_CHECK,
    "ship_priority_classes": ORACLE_SHIP_PRIORITY_CLASSES,
    "promo_revenue_share": ORACLE_PROMO_REVENUE_SHARE,
    "part_supplier_concentration": ORACLE_PART_SUPPLIER_CONCENTRATION,
    "shipping_priority": ORACLE_SHIPPING_PRIORITY,
    "local_supplier_volume": ORACLE_LOCAL_SUPPLIER_VOLUME,
    "forecast_revenue_change": ORACLE_FORECAST_REVENUE_CHANGE,
    "product_type_profit": ORACLE_PRODUCT_TYPE_PROFIT,
    "returned_item_report": ORACLE_RETURNED_ITEM_REPORT,
    "important_part_values": ORACLE_IMPORTANT_PART_VALUES,
}
