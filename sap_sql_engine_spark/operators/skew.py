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


# ---------------------------------------------------------------------------
# Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter rule)

from contextlib import contextmanager

_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # local demo sizing: the rule's production defaults only fire when the
    # application side scans >= 10 GB (exactly the 100 TB regime where a
    # semi-join bloom filter pays for itself); at test scale we lower the
    # floor so the injected plan shape itself is assertable
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def runtime_bloom_filters(spark: SparkSession):
    """Enable Spark's runtime row-level bloom-filter injection for the
    block: a selective (filtered) join side gets aggregated into a bloom
    filter that is pushed into the OTHER side's scan stage as a
    ``BloomFilterMightContain`` pre-filter — rows that cannot join are
    dropped BEFORE the shuffle. This is the engine-native version of the
    manual build-semijoin-then-join pattern, and at 100 TB it is the
    single biggest shuffle-byte saver on selective fact-fact joins.
    False positives only — the exact join still runs, so results are
    identical (the test asserts both the plan shape and the equality).

    Restores every touched conf on exit, so sessions shared across tests
    and the server keep their defaults."""
    old = {}
    for k, v in _BLOOM_CONFS.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def expression_class_present(df: DataFrame, simple_name: str) -> bool:
    """Structurally search every executed-plan node's expression trees for
    a Catalyst expression class (e.g. ``BloomFilterMightContain``) — py4j
    object walk, no plan-text parsing."""
    from ..sources.layout import _exec_nodes

    def expr_walk(e) -> bool:
        if e.getClass().getSimpleName() == simple_name:
            return True
        kids = e.children()
        return any(expr_walk(kids.apply(i)) for i in range(kids.size()))

    for node in _exec_nodes(df):
        exprs = node.expressions()
        for i in range(exprs.size()):
            if expr_walk(exprs.apply(i)):
                return True
    return False


# ---------------------------------------------------------------------------
# Z-order layout: interleaved-bit clustering for 2-D data skipping

ZORDER_BITS = 16  # per-dimension resolution of the curve
ZORDER_BUCKETS = 16  # "files" the layout is split into


def _zvalue(u1, u2):
    """Interleave the low ZORDER_BITS bits of two normalized dims — u1 in
    the odd positions, u2 in the even — as a sum of shift terms (branchless,
    codegen-friendly; same arithmetic the oracle states)."""
    z = F.lit(0).cast("bigint")
    for b in range(ZORDER_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(u1, b).bitwiseAND(F.lit(1)).cast("bigint"), 2 * b + 1)
            + F.shiftleft(F.shiftright(u2, b).bitwiseAND(F.lit(1)).cast("bigint"), 2 * b)
        )
    return z


def q_zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file min/max statistics of ``orders`` laid out along a Z-order
    (Morton) curve over (o_custkey, o_orderdate) — the layout decision that
    makes 2-D predicate skipping work at 100 TB.

    A single-dimension sort gives tight file stats on that dimension and
    useless ones on every other; interleaving the bits of both normalized
    keys gives every file a small bounding BOX, so scans filtering on
    EITHER dimension (or both) prune files. This query computes the layout
    and REPORTS the per-file evidence (row count + both dims' lo/hi) the
    skipping argument rests on; the planted test asserts z-order's summed
    box area beats both single-dim sorts.

    Scale shape: dim normalization folds driver-probed min/max scalars
    into literals (parquet footer metadata at scale); the z-value is a
    pure map; file assignment is ``with_global_rank`` (range-partitioned
    exchange — NO single-partition window); the stats aggregate is one
    narrow regroup. A real writer would follow with
    ``repartitionByRange(z).sortWithinPartitions(z)`` + per-file write —
    the same exchange this plan already demonstrates."""
    from ..sources.loader import table
    from .ranks import with_global_rank

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    lo = orders.select(
        F.min("o_custkey").alias("c0"),
        F.max("o_custkey").alias("c1"),
        F.min(F.datediff("o_orderdate", F.lit("1970-01-01"))).alias("d0"),
        F.max(F.datediff("o_orderdate", F.lit("1970-01-01"))).alias("d1"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    c0, c1, d0, d1, n = (int(lo[k]) for k in ("c0", "c1", "d0", "d1", "n"))
    scale = (1 << ZORDER_BITS) - 1
    u1 = F.expr(f"(o_custkey - {c0}) * {scale} DIV {max(c1 - c0, 1)}").cast("int")
    u2 = F.expr(
        f"(datediff(o_orderdate, DATE '1970-01-01') - {d0}) * {scale} "
        f"DIV {max(d1 - d0, 1)}"
    ).cast("int")
    z = orders.withColumn("z", _zvalue(u1, u2))
    ranked = with_global_rank(z, "z", "o_orderkey")
    # integer DIV, not `/`: double division truncated can land one file off
    # at exact boundaries; the oracle's `//` is integer floor division
    bucket = F.expr(f"((rn - 1) * {ZORDER_BUCKETS}) DIV {n}").cast("bigint")
    return (
        ranked.withColumn("file_id", bucket)
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("custkey_lo"),
            F.max("o_custkey").alias("custkey_hi"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("date_lo"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("date_hi"),
        )
    )


ORACLE_ZORDER_LAYOUT = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS days
  FROM orders
),
bounds AS (
  SELECT min(o_custkey) AS c0, max(o_custkey) AS c1,
         min(days) AS d0, max(days) AS d1, count(*) AS n
  FROM base
),
norm AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         (o_custkey - c0) * {(1 << ZORDER_BITS) - 1} // greatest(c1 - c0, 1) AS u1,
         (days - d0) * {(1 << ZORDER_BITS) - 1} // greatest(d1 - d0, 1) AS u2,
         n
  FROM base, bounds
),
zv AS (
  SELECT o_orderkey, o_custkey, o_orderdate, n,
         {" + ".join(f"(((u1 >> {b}) & 1) << {2 * b + 1}) + (((u2 >> {b}) & 1) << {2 * b})" for b in range(ZORDER_BITS))} AS z
  FROM norm
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY z, o_orderkey) AS rn FROM zv
)
SELECT CAST((rn - 1) * {ZORDER_BUCKETS} // n AS BIGINT) AS file_id,
       count(*) AS n_rows,
       min(o_custkey) AS custkey_lo,
       max(o_custkey) AS custkey_hi,
       strftime(min(o_orderdate), '%Y-%m-%d') AS date_lo,
       strftime(max(o_orderdate), '%Y-%m-%d') AS date_hi
FROM ranked
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# join-key skew report: the diagnostic you read BEFORE reaching for
# salted_join or trusting AQE — how concentrated is the fact table on its
# join key? skew_ratio = max-key rows / mean-key rows (milli): ~1000 means
# uniform; double digits x 1000 means one reducer owns the join.


def q_partkey_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row skew profile of lineitem's part-side join key: key count,
    total rows, mean rows/key (milli), p99 and max rows/key, the
    heaviest key (ties to the lowest key), and the max/mean skew ratio
    (milli).

    Scale shape: one key-keyed count with map-side combine (the same
    aggregation any stats collector runs), then two passes over the
    cached key-count relation — a 1-row global aggregate and the
    max-key tie-break filter joined back broadcast."""
    from ..cachereg import cache_eager
    from ..sources.loader import table

    li = table(spark, sf_dir, "lineitem").select("l_partkey")
    per_key = cache_eager(
        li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    glob = per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.expr("percentile(CAST(cnt AS DOUBLE), 0.99D)").alias("p99d"),
    )
    heavy = (
        per_key.join(
            F.broadcast(glob.select("max_cnt")),
            per_key["cnt"] == F.col("max_cnt"),
        )
        .agg(F.min("l_partkey").cast("bigint").alias("heaviest_key"))
    )
    return (
        glob.crossJoin(F.broadcast(heavy))  # 1-row x 1-row scalar attach
        .selectExpr(
            "n_keys",
            "n_rows",
            "CAST(n_rows * 1000 DIV n_keys AS BIGINT) AS mean_cnt_milli",
            "CAST(round(p99d, 2) AS DOUBLE) AS p99_cnt",
            "max_cnt",
            "heaviest_key",
            "CAST(max_cnt * n_keys * 1000 DIV n_rows AS BIGINT)"
            " AS skew_ratio_milli",
        )
    )


ORACLE_PARTKEY_SKEW = """
WITH per_key AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
),
gstats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(max(cnt) AS BIGINT) AS max_cnt,
         quantile_cont(CAST(cnt AS DOUBLE), 0.99) AS p99d
  FROM per_key
),
heavy AS (
  SELECT CAST(min(l_partkey) AS BIGINT) AS heaviest_key
  FROM per_key, gstats WHERE cnt = max_cnt
)
SELECT n_keys,
       n_rows,
       CAST(n_rows * 1000 // n_keys AS BIGINT) AS mean_cnt_milli,
       CAST(round(p99d, 2) AS DOUBLE) AS p99_cnt,
       max_cnt,
       heaviest_key,
       CAST(max_cnt * n_keys * 1000 // n_rows AS BIGINT) AS skew_ratio_milli
FROM gstats, heavy
"""


QUERIES = {
    "salted_segment_revenue": q_salted_segment_revenue,
    "zorder_layout_stats": q_zorder_layout_stats,
    "partkey_skew_report": q_partkey_skew_report,
}

ORACLES = {
    "salted_segment_revenue": ORACLE_SALTED_SEGMENT_REVENUE,
    "zorder_layout_stats": ORACLE_ZORDER_LAYOUT,
    "partkey_skew_report": ORACLE_PARTKEY_SKEW,
}
