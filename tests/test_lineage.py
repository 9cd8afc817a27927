"""Column-level lineage: structural analyzed-plan walk (plans/lineage.py)."""

import pytest

from sap_sql_engine_spark.plans.lineage import column_lineage
from sap_sql_engine_spark.sources.loader import load_tables


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    load_tables(spark, "/root/testdata/sf0.001")


def test_lineage_projection_and_rename(spark):
    lin = column_lineage(
        spark.sql("SELECT o_orderkey AS okey, o_totalprice * 2 AS dp FROM orders")
    )
    assert lin == {"okey": ["orders.o_orderkey"], "dp": ["orders.o_totalprice"]}


def test_lineage_multi_join_aggregate(spark):
    lin = column_lineage(
        spark.sql(
            """SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               GROUP BY n_name"""
        )
    )
    assert lin["n_name"] == ["nation.n_name"]
    assert lin["revenue"] == ["lineitem.l_discount", "lineitem.l_extendedprice"]


def test_lineage_constant_is_empty(spark):
    lin = column_lineage(spark.sql("SELECT 42 AS const, upper(c_name) AS cn FROM customer"))
    assert lin == {"const": [], "cn": ["customer.c_name"]}


def test_lineage_resolves_through_cte(spark):
    lin = column_lineage(
        spark.sql(
            """WITH big AS (
                 SELECT o_custkey, sum(o_totalprice) AS spend FROM orders GROUP BY 1
               )
               SELECT c_name, spend FROM big JOIN customer ON o_custkey = c_custkey"""
        )
    )
    # spend resolves to the BASE column, not the CTE alias
    assert lin == {"c_name": ["customer.c_name"], "spend": ["orders.o_totalprice"]}


def test_lineage_window_function(spark):
    lin = column_lineage(
        spark.sql(
            """SELECT o_orderpriority,
                      row_number() OVER (PARTITION BY o_orderpriority
                                         ORDER BY o_totalprice DESC) AS rn
               FROM orders"""
        )
    )
    assert lin["rn"] == ["orders.o_orderpriority", "orders.o_totalprice"]


def test_lineage_dataframe_api_parquet_leaf(spark):
    # DataFrame built straight off parquet (no view): source falls back to
    # the file basename
    from pyspark.sql import functions as F

    from sap_sql_engine_spark.sources.loader import table

    df = table(spark, "/root/testdata/sf0.001", "orders").select(
        F.col("o_orderkey"), (F.col("o_totalprice") * 2).alias("dp")
    )
    lin = column_lineage(df)
    assert lin == {"o_orderkey": ["orders.o_orderkey"], "dp": ["orders.o_totalprice"]}


def test_lineage_runs_no_job(spark):
    # plan metadata only: lineage of a huge cross join must return instantly
    # (analysis happens; no job is submitted)
    big = spark.sql(
        "SELECT a.o_orderkey AS k1, b.o_orderkey AS k2 FROM orders a CROSS JOIN orders b"
    )
    lin = column_lineage(big)
    assert lin == {"k1": ["orders.o_orderkey"], "k2": ["orders.o_orderkey"]}


def test_lineage_survives_exotic_plan_shapes(spark):
    # the walker must not crash on any plan shape the engine produces —
    # exercised here on the exotic ones: Python UDTF lateral join,
    # mapInPandas, native session_window, native recursive CTE, cached
    # range-partitioned windows, grouping sets, pivot. (A full 92-query
    # sweep is run ad hoc; this pins the shapes that differ structurally.)
    import __spark_entry__ as e

    from sap_sql_engine_spark import cachereg
    from sap_sql_engine_spark.plans.lineage import column_lineage

    qs = e.queries()
    shapes = [
        "text_head_tokens",          # UDTF lateral join
        "multimodal_byte_features",  # mapInPandas
        "events_session_native",     # session_window aggregation
        "recursive_line_chain_native",  # UnionLoop native recursion
        "dedup_sorted_neighborhood",    # cached range-partition + offsets
        "grouping_sets_balance",
        "pivot_priority_status",
        "label_agreement_kappa",     # full-outer + cross join of scalars
    ]
    try:
        for name in shapes:
            lin = column_lineage(qs[name](spark, "/root/testdata/sf0.001"))
            assert isinstance(lin, dict) and lin, name
    finally:
        cachereg.release()
