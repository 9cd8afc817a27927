"""Global dense ranks without a global window — the DataFrame analogue of
``zipWithIndex``, extracted from the sorted-neighborhood dedup rewrite so
any operator needing "position in the global sort order" can use it.

A ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY executes by
moving the ENTIRE relation into one task — the classic scale cliff. This
helper assigns the identical ranks with no global window:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the rank keys —
   one range-partitioned exchange (Spark sorts 100 TB routinely);
2. per-row within-partition positions fall out of
   ``monotonically_increasing_id`` (partition-local counter in the low 33
   bits — a pure map, no exchange);
3. a metadata-sized per-partition row-count collect (one row per
   partition, the same bookkeeping ``zipWithIndex`` does) turns local
   positions into global ranks through a literal offset map. Range
   partition i holds keys strictly below partition i+1's, so
   offset[pid] + local position IS the global rank.

The partitioned relation is cached eagerly (registered with
``cachereg``): RangePartitioner samples split bounds per materialization,
so an uncached plan could hand two consumers different pid/mid
assignments for the same row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cachereg import cache_eager


def with_global_prefix_sum(
    df: DataFrame,
    value_col: str,
    *order_cols: str,
    sum_col: str = "cum",
    total_col: str | None = None,
) -> DataFrame:
    """Return ``df`` (cached, range-partitioned by ``order_cols``) with a
    BIGINT ``sum_col`` equal to the INCLUSIVE running sum of
    ``value_col`` over the global ``order_cols`` order — with no global
    window. Same machinery as :func:`with_global_rank`: one range
    exchange, a PER-PARTITION window (each range slice cumsums in
    parallel), and a metadata-sized per-partition total collect turned
    into a literal offset map. Range partition i holds keys strictly
    below partition i+1's, so offset[pid] + local running sum IS the
    global prefix sum.

    ``total_col``: optionally attach the global value total (known
    driver-side from the same metadata collect) as a literal column."""
    return with_global_prefix_sums(
        df,
        {value_col: sum_col},
        *order_cols,
        total_cols={value_col: total_col} if total_col is not None else None,
    )


def with_global_prefix_sums(
    df: DataFrame,
    value_cols: dict[str, str],
    *order_cols: str,
    total_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Multi-column form of :func:`with_global_prefix_sum`:
    ``value_cols`` maps each value column to its output prefix-sum
    column, and ALL of them share the single range exchange + one
    metadata-sized per-partition collect (one row per partition carrying
    every column's partition total). A two-sample statistic needing both
    groups' cumulative counts along one sort order (the KS-test shape)
    pays the same one exchange the single-column form does.

    ``total_cols``: optional {value_col: literal_total_col} attaches —
    the global totals are already known driver-side from the same
    collect."""
    part = cache_eager(
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .select("*", F.spark_partition_id().alias("__pid"))
    )
    rows = (
        part.groupBy("__pid")
        .agg(
            *[
                F.sum(F.col(v).cast("bigint")).alias(v)
                for v in value_cols
            ]
        )
        .collect()
    )  # one row per partition — metadata, not data
    per_pid = {row["__pid"]: row for row in rows}
    from pyspark.sql import Window

    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = part
    totals: dict[str, int] = {}
    for value_col, sum_col in value_cols.items():
        offsets: dict[int, int] = {}
        acc = 0
        for pid in sorted(per_pid):
            offsets[pid] = acc
            acc += int(per_pid[pid][value_col] or 0)
        totals[value_col] = acc
        offset_map = F.create_map(
            *[F.lit(v) for kv in offsets.items() for v in kv]
        )
        out = out.withColumn(
            sum_col,
            (
                offset_map[F.col("__pid")]
                + F.sum(F.col(value_col).cast("bigint")).over(w_local)
            ).cast("bigint"),
        )
    out = out.drop("__pid")
    if total_cols:
        for value_col, total_col in total_cols.items():
            out = out.withColumn(
                total_col, F.lit(totals[value_col]).cast("bigint")
            )
    return out


def with_global_rank(
    df: DataFrame,
    *order_cols: str,
    rank_col: str = "rn",
    total_col: str | None = None,
) -> DataFrame:
    """Return ``df`` (cached, range-partitioned by ``order_cols``) with a
    1-based BIGINT ``rank_col`` equal to ``row_number() OVER (ORDER BY
    order_cols)`` — assuming ``order_cols`` are a total order (include a
    unique tiebreaker column). No single task ever holds more than its
    range slice.

    ``total_col``: optionally attach the relation's total row count as a
    literal BIGINT column — the count is already known driver-side from
    the per-partition metadata collect, so callers needing N (e.g. rank
    quantization) get it for free instead of running a second job."""
    part = cache_eager(
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .select(
            "*",
            F.spark_partition_id().alias("__pid"),
            F.monotonically_increasing_id().alias("__mid"),
        )
    )
    counts = {
        row["__pid"]: row["cnt"]
        for row in part.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }  # one row per partition — metadata, not data
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv])
    # mid = pid * 2^33 + within-partition counter (consecutive from 0 in
    # sorted iterator order); strip the partition component, add the offset
    local = F.col("__mid") - F.shiftleft(F.col("__pid").cast("bigint"), 33)
    out = part.withColumn(
        rank_col, (offset_map[F.col("__pid")] + local + F.lit(1)).cast("bigint")
    ).drop("__pid", "__mid")
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(acc).cast("bigint"))
    return out
