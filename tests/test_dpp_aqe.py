"""Structural proofs for the two mechanisms a 100 TB join lives or dies
by: dynamic partition pruning (a dim-side filter pruning the fact's
partition DIRECTORIES at runtime) and AQE skew-join splitting (the hot
reducer partition sliced into bounded partial-reducer tasks).

Both are asserted from the executed physical plan — expression/spec
CLASSES and runtime metrics, never plan-text grep — and both prove
result equality against the mechanism-free twin, so the optimization is
shown to be an optimization, not a semantics change.
"""

import pytest
from pyspark.sql import functions as F

from sap_sql_engine_spark.operators import partition_pruning as pp
from sap_sql_engine_spark.sources.layout import dpp_scan_stats, skew_join_stats

REGION = "ASIA"


@pytest.fixture(scope="module")
def fact_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dpp") / "fact_by_nation")
    pp.build_nationkey_partitioned_fact(spark, sf_dir, path)
    return path


def test_dpp_prunes_partitions_and_matches_flat_layout(
    spark, sf_dir, fact_path
):
    q = pp.q_region_revenue_partitioned(spark, fact_path, sf_dir, REGION)
    got = q.collect()

    # result equality vs the unpartitioned twin — layout must not change
    # a single cell
    want = pp.q_region_revenue_unpartitioned(spark, sf_dir, REGION).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    assert len(got) > 0

    # structural: the fact scan carries a DynamicPruningExpression and
    # the runtime read EXACTLY the region's nation partitions
    n_region_nations = (
        pp._region_nations(spark, sf_dir, REGION).count()
    )
    fact_scans = [
        s for s in dpp_scan_stats(q) if s["static_num_files"] is not None
    ]
    assert len(fact_scans) == 1, f"expected one partitioned fact scan: {fact_scans}"
    scan = fact_scans[0]
    assert scan["dynamic_pruning"], scan
    assert scan["num_partitions"] == n_region_nations, scan
    assert scan["static_num_files"] > n_region_nations, scan


def test_dpp_drops_without_partition_column_join(spark, sf_dir, fact_path):
    """Negative control: the same query joined on a NON-partition column
    must carry no DynamicPruningExpression — pins that the positive test
    is detecting DPP, not some always-present filter class."""
    fact = spark.read.parquet(fact_path)
    dim = pp._region_nations(spark, sf_dir, REGION)
    q = (
        fact.join(
            F.broadcast(dim),
            # l_extendedprice is a data column; no partition directory
            # can be derived from this predicate
            fact.l_extendedprice > dim.n_nationkey,
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    q.collect()
    assert all(not s["dynamic_pruning"] for s in dpp_scan_stats(q))


SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
}


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _planted_skew(spark):
    """400k-row relation where key 7 owns half of all rows — the
    heavy-hitter profile AQE's skew split exists for."""
    big = spark.range(0, 400_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return big, small


def test_aqe_splits_planted_skew_join(spark, skew_confs):
    big, small = _planted_skew(spark)
    j = big.join(small, "k")
    # execute THIS DataFrame's plan (a derived .count() would build its
    # own query execution and leave j's un-executed → empty stats)
    got_rows = j.collect()
    stats = skew_join_stats(j)
    assert stats["skew_smj_count"] >= 1, stats
    assert stats["partial_reducer_specs"] >= 2, stats

    # result equality: the skew-split join returns exactly what the
    # broadcast (mechanism-free) join returns
    got = (len(got_rows), sum(r.v + r.w for r in got_rows))
    b2, s2 = _planted_skew(spark)
    want_row = (
        b2.join(F.broadcast(s2), "k")
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") + F.col("w")).alias("s"),
        )
        .collect()[0]
    )
    assert got == (want_row.n, want_row.s)


def test_no_skew_split_on_uniform_keys(spark, skew_confs):
    """Negative control: a uniform key distribution under the same
    aggressive thresholds must not trigger partial-reducer splitting of
    a hot partition (factor-based detection needs an outlier)."""
    big = spark.range(0, 100_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    j = big.join(small, "k")
    j.collect()
    assert skew_join_stats(j)["skew_smj_count"] == 0


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """The third AQE mechanism (after skew-split and DPP's broadcast
    reuse): post-shuffle partition coalescing. A static
    spark.sql.shuffle.partitions sized for 100 TB produces thousands of
    near-empty reducers on a small stage; AQE merges them to the
    advisory size at runtime, so the same job config serves every data
    scale. Structural: the shuffle read shows CoalescedPartitionSpec
    slices covering fewer partitions than the static setting."""
    n_static = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert n_static >= 4  # conftest pins 8; the assertion needs headroom
    df = (
        spark.range(0, 1000)
        .select((F.col("id") % 10).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    rows = df.collect()
    assert len(rows) == 10
    from sap_sql_engine_spark.sources.layout import _exec_nodes

    coalesced = []
    for node in _exec_nodes(df):
        if node.getClass().getSimpleName().startswith("AQEShuffleRead"):
            specs = node.partitionSpecs()
            kinds = [
                specs.apply(i).getClass().getSimpleName()
                for i in range(specs.size())
            ]
            coalesced.append(kinds)
    assert coalesced, "no AQE shuffle read in the executed plan"
    final = coalesced[-1]
    assert all(k == "CoalescedPartitionSpec" for k in final)
    assert len(final) < n_static, (len(final), n_static)


# ---------------------------------------------------------------------------
# runtime bloom filter (row-level runtime filtering) — the third join
# mechanism a 100 TB fact join leans on: a selective dim predicate turns
# into a bloom filter applied to the fact BEFORE its shuffle.

BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # the default application-side threshold is 10GB — local test data
    # never reaches it, so drop it to 0 for the structural proof
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
}


@pytest.fixture()
def bloom_confs(spark):
    old = {k: spark.conf.get(k, None) for k in BLOOM_CONFS}
    for k, v in BLOOM_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _bloom_join(spark, sf_dir):
    from sap_sql_engine_spark.sources.loader import table

    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_orderpriority")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
    )


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir, bloom_confs):
    from sap_sql_engine_spark.sources.layout import runtime_bloom_stats

    q = _bloom_join(spark, sf_dir)
    got = {(r.o_orderpriority, r.n, float(r.qty)) for r in q.collect()}

    stats = runtime_bloom_stats(q)
    assert stats["might_contain_filters"] >= 1, stats
    # the filter must have actually discarded fact rows before the join:
    # its output is far below the full lineitem row count
    li_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert stats["filter_output_rows"], stats
    assert min(r for r in stats["filter_output_rows"] if r is not None) < li_rows / 2

    # result equality vs the mechanism-free twin (bloom disabled)
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    want = {(r.o_orderpriority, r.n, float(r.qty)) for r in _bloom_join(spark, sf_dir).collect()}
    assert got == want and got


def test_no_bloom_filter_without_selective_build_side(spark, sf_dir, bloom_confs):
    """Negative control: joining the UNFILTERED orders table injects no
    bloom filter (no selective predicate on the creation side), pinning
    that the positive test detects the runtime filter, not an artifact."""
    from sap_sql_engine_spark.sources.layout import runtime_bloom_stats
    from sap_sql_engine_spark.sources.loader import table

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    q = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )
    q.collect()
    assert runtime_bloom_stats(q)["might_contain_filters"] == 0
