"""Scale utilities: salted joins, partitioned layout pruning, bucketed
co-located joins. Assertions are on plan properties, not just results."""

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from sap_sql_engine_spark.operators.skew import salted_join, top_keys
from sap_sql_engine_spark.sources import layout
from sap_sql_engine_spark.sources.loader import table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    plain = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(
            li.withColumnRenamed("l_orderkey", "k"),
            od.withColumnRenamed("o_orderkey", "k"),
            on=["k"],
            n_salts=8,
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], ["k", "v"])
    small = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "w"])
    out = salted_join(big, small, on=["k"], how="left", n_salts=4).collect()
    assert len(out) == 3
    assert {r.k: r.w for r in out}[99] is None


def test_salted_join_rejects_right(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, on=["id"], how="right")


def test_top_keys_fractions(spark):
    df = spark.createDataFrame([("a",)] * 8 + [("b",)] * 2, ["k"])
    rows = top_keys(df, "k").collect()
    assert rows[0].k == "a" and abs(rows[0].fraction - 0.8) < 1e-9


def test_partitioned_write_prunes(spark, sf_dir):
    od = table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("string")
    )
    tmp = tempfile.mkdtemp(prefix="layout_part_")
    try:
        layout.write_partitioned(od, tmp, ["order_year"], sort_cols=["o_orderdate"])
        back = spark.read.parquet(tmp).filter(F.col("order_year") == "1995")
        pf = layout.partition_filters_of(back)
        assert "order_year" in pf  # filter landed on partition dirs, not data
        assert back.count() == od.filter(F.year("o_orderdate") == 1995).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_no_shuffle(spark, sf_dir):
    od = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    layout.write_bucketed(od, "b_orders", ["o_orderkey"], n_buckets=4)
    layout.write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a shuffle-based join so the zero-exchange assertion proves
        # bucketing (a broadcast join would have zero exchanges trivially)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        # co-located buckets: the join needs no hash-partitioning exchange
        assert layout.exchange_count(joined) == 0
        assert joined.count() == li.count()
        # same join on raw parquet DOES shuffle — the contrast case
        raw = od.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        assert layout.exchange_count(raw) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_global_rank_matches_window_row_number(spark):
    # property: the offset-stitch rank over MANY range partitions equals
    # row_number() over a single global window (run at a size that spans
    # several range partitions; keys deliberately skewed + duplicated so
    # partition boundaries land inside key runs, tiebroken by id)
    from pyspark.sql import Window

    from sap_sql_engine_spark import cachereg
    from sap_sql_engine_spark.operators.ranks import with_global_rank

    df = (
        spark.range(0, 5000)
        .withColumn("k", (F.col("id") * 37 % 101).cast("string"))
        .repartition(16)
    )
    got = {
        (r.id): r.rn for r in with_global_rank(df, "k", "id").collect()
    }
    want = {
        r.id: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k", "id")).cast("bigint")
        ).collect()
    }
    cachereg.release()
    assert got == want


def test_global_prefix_sum_matches_window_cumsum(spark):
    # property: the offset-stitch running sum over MANY range partitions
    # equals sum() OVER (ORDER BY ...) on a single global window — same
    # skewed/duplicated key regime as the rank property above
    from pyspark.sql import Window

    from sap_sql_engine_spark import cachereg
    from sap_sql_engine_spark.operators.ranks import with_global_prefix_sum

    df = (
        spark.range(0, 5000)
        .withColumn("k", (F.col("id") * 37 % 101).cast("string"))
        .withColumn("v", (F.col("id") % 13 + 1).cast("bigint"))
        .repartition(16)
    )
    got = {
        r.id: (r.cum, r.tot)
        for r in with_global_prefix_sum(
            df, "v", "k", "id", sum_col="cum", total_col="tot"
        ).collect()
    }
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    total = df.agg(F.sum("v")).first()[0]
    want = {
        r.id: (r.cum, total)
        for r in df.withColumn("cum", F.sum("v").over(w).cast("bigint")).collect()
    }
    cachereg.release()
    assert got == want
