"""Physical layout writers — partitioning and bucketing for the 100 TB tier.

The reference stores everything in one SQLite file; at Spark scale the
layout IS the optimization:

- ``write_partitioned``: hive-style directory partitioning (the SAP-shaped
  choice: BUKRS/GJAHR — company code + fiscal year; the TPC-H-shaped
  choice: a date-derived column). Partition pruning turns
  ``WHERE gjahr = '2026'`` into "don't even list the other directories".
- ``write_bucketed``: pre-shuffled, co-located storage on the join key.
  Two tables bucketed the same way join with ZERO exchange — the shuffle
  was paid once at write time instead of per-query.

Both are write-side mirrors of what the reading plans in ``operators/``
assume. Tests assert the plan effects (PartitionFilters pruning; no
Exchange under a bucketed join), not just the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet write partitioned by ``partition_cols``; optional
    sort-within-partitions gives min/max rowgroup stats their bite."""
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed managed table (bucketing requires the catalog —
    plain parquet paths carry no bucket metadata)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_expr,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered along a Z-order curve: range-partition on the
    precomputed z-value into ``n_files`` slices, sort within each, drop the
    helper column, write — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` shape
    in plain parquet. Every file then carries a tight min/max bounding BOX
    over ALL interleaved dimensions in its parquet footer, so 2-D
    predicates prune files (the read-side evidence ``zorder_layout_stats``
    reports from the same curve; the test verifies against the ACTUAL
    written footers via parquet metadata).

    ``zorder_expr`` is the interleaved-bit column (see
    ``operators/skew._zvalue``); one range exchange total."""
    (
        df.withColumn("__z", zorder_expr)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    ndv: int = 100_000,
    mode: str = "overwrite",
    force_plain_encoding: bool = False,
) -> None:
    """Parquet write with per-column BLOOM FILTERS in the file footers —
    the point-lookup complement to min/max stats: range predicates prune
    by min/max (see ``write_zordered``), equality probes on high-cardinality
    columns (keys, ids, hashes) prune by bloom membership even when the
    file's value range is wide. At 100 TB this is what makes needle
    queries (one order id out of billions) touch a handful of files.

    ``ndv`` sizes the filter (expected distinct values per file).
    Parquet deliberately SKIPS the bloom for column chunks that stay
    fully dictionary-encoded (the dictionary is already an exact
    membership structure) — at production scale a key column overflows
    the dictionary page and gets its bloom automatically;
    ``force_plain_encoding`` disables the dictionary per column so the
    bloom path is exercisable on small test data. Reader side is
    automatic: Parquet readers consult footer blooms for `=`/`IN`."""
    w = df.write.mode(mode)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(ndv)
        )
        if force_plain_encoding:
            w = w.option(f"parquet.enable.dictionary#{c}", "false")
    w.parquet(path)


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 256,
) -> int:
    """Small-file compaction: rewrite ``src_path`` into files sized at
    ``target_file_mb``. Streaming sinks and incremental ingests litter a
    table with thousands of KB-scale files; every scan then pays one task
    + one footer-read per file, and the NameNode/listing cost grows
    unbounded. Compaction is the standard maintenance op (Delta/Iceberg
    OPTIMIZE's core): the file count comes from the ACTUAL byte size, not
    a row-count guess, and the rewrite is a single coalesce — a narrow
    dependency (no shuffle; a round-robin repartition would shuffle the
    full table for marginally better balance).

    Returns the number of files written."""
    import os

    size_b = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_path)
        for f in files
        if f.endswith(".parquet")
    ) if os.path.isdir(src_path) else os.path.getsize(src_path)
    n_files = max(1, -(-size_b // (target_file_mb * 1024 * 1024)))  # ceil
    spark.read.parquet(src_path).coalesce(int(n_files)).write.mode(
        "overwrite"
    ).parquet(dst_path)
    import glob

    return len(glob.glob(os.path.join(dst_path, "*.parquet")))


def _exec_nodes(df: DataFrame):
    """Iterate the physical plan's nodes structurally via py4j — the
    executed-plan twin of ``plans/governance.py``'s analyzed-plan walk.
    Descends through the AQE wrapper (``AdaptiveSparkPlanExec`` is a leaf
    whose real tree hangs off ``executedPlan()``); no plan-printer
    ``toString()`` parsing, so Spark changing its text format can't
    silently break these assertions."""

    def walk(node):
        yield node
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            yield from walk(node.executedPlan())
        # After execution AQE splits the tree into leaf QueryStageExec
        # nodes (children() is empty; the materialized subtree hangs off
        # .plan()) and dedups via ReusedExchangeExec (.child()) — descend
        # both, or every post-collect walk stops above the scans.
        elif name.endswith("QueryStageExec"):
            yield from walk(node.plan())
        elif name == "ReusedExchangeExec":
            yield from walk(node.child())
        kids = node.children()
        for i in range(kids.size()):
            yield from walk(kids.apply(i))

    yield from walk(df._jdf.queryExecution().executedPlan())


def partition_filters_of(df: DataFrame) -> str:
    """The scan's partition filters (rendered per-expression via the
    structural ``sql()`` on each Catalyst expression) — test/debug helper
    to prove pruning happened."""
    parts: list[str] = []
    for node in _exec_nodes(df):
        if node.getClass().getSimpleName() == "FileSourceScanExec":
            flt = node.partitionFilters()
            parts.extend(flt.apply(i).sql() for i in range(flt.size()))
    return ", ".join(parts)


def exchange_count(df: DataFrame) -> int:
    """Number of hash-partitioning shuffle Exchange nodes in the executed
    plan — 0 for a co-located bucketed join."""
    return sum(
        1
        for node in _exec_nodes(df)
        if node.getClass().getSimpleName() == "ShuffleExchangeExec"
        and node.outputPartitioning().getClass().getSimpleName() == "HashPartitioning"
    )


def mounted_tables(spark: SparkSession) -> list[str]:
    return [t.name for t in spark.catalog.listTables()]


def _scala_map_to_dict(m) -> dict:
    it = m.keys().iterator()
    out = {}
    while it.hasNext():
        k = it.next()
        out[k] = m.apply(k).value()
    return out


def dpp_scan_stats(df: DataFrame) -> list[dict]:
    """Per-FileSourceScanExec evidence that dynamic partition pruning
    planned AND executed — one dict per scan with:

    - ``dynamic_pruning``: a ``DynamicPruningExpression`` sits in the
      scan's partition filters (structural class check, no text parse)
    - ``num_partitions`` / ``static_num_files`` / ``files_read``: the
      runtime metrics — after execution, a pruned scan shows
      ``num_partitions < static_num_files`` (the static count is what a
      non-pruned listing would have touched)

    Call AFTER an action so the metrics carry real values. A scan with
    ``dynamic_pruning`` True but ``num_partitions`` == the full
    partition count means DPP was planned then dropped at runtime (e.g.
    the dim side lost the broadcast-build role) — the failure mode the
    structural test exists to catch."""
    stats = []
    for node in _exec_nodes(df):
        if node.getClass().getSimpleName() != "FileSourceScanExec":
            continue
        flt = node.partitionFilters()
        classes = [
            flt.apply(i).getClass().getSimpleName() for i in range(flt.size())
        ]
        m = _scala_map_to_dict(node.metrics())
        stats.append(
            {
                "dynamic_pruning": "DynamicPruningExpression" in classes,
                "partition_filter_classes": classes,
                "num_partitions": m.get("numPartitions"),
                "static_num_files": m.get("staticFilesNum"),
                "files_read": m.get("numFiles"),
                "rows_read": m.get("numOutputRows"),
            }
        )
    return stats


def runtime_bloom_stats(df: DataFrame) -> dict:
    """Structural evidence that Spark injected a RUNTIME BLOOM FILTER
    (row-level runtime filtering, the third 100 TB join mechanism next
    to DPP and AQE skew-split): the probe side's Filter carries a
    ``BloomFilterMightContain`` expression fed by a ``bloom_filter_agg``
    subquery over the selective build side.

    Returns the count of such filters plus the probe Filter's output
    rows metric — after an action, ``filter_output_rows`` well below the
    scan's row count is the filter actually discarding non-matching rows
    BEFORE the shuffle. Class-based expression-tree walk, no plan-text
    parsing."""

    def expr_classes(root):
        stack = [root]
        while stack:
            e = stack.pop()
            yield e.getClass().getSimpleName()
            kids = e.children()
            for i in range(kids.size()):
                stack.append(kids.apply(i))

    n_filters = 0
    out_rows = []
    for node in _exec_nodes(df):
        if node.getClass().getSimpleName() != "FilterExec":
            continue
        if "BloomFilterMightContain" in set(expr_classes(node.condition())):
            n_filters += 1
            m = _scala_map_to_dict(node.metrics())
            out_rows.append(m.get("numOutputRows"))
    return {"might_contain_filters": n_filters, "filter_output_rows": out_rows}


def skew_join_stats(df: DataFrame) -> dict:
    """Structural evidence that AQE split a skewed join at runtime:

    - ``skew_smj_count``: sort-merge joins whose ``isSkewJoin`` flag the
      runtime set (OptimizeSkewedJoin rewrote the join)
    - ``partial_reducer_specs``: shuffle-read partition specs of class
      ``PartialReducerPartitionSpec`` — each one is a SLICE of the hot
      reducer partition, the mechanism that turns one straggler task
      into many bounded ones

    Call AFTER an action (AQE decides from materialized shuffle stats)."""
    skew_smj = 0
    partial_specs = 0
    for node in _exec_nodes(df):
        name = node.getClass().getSimpleName()
        if name == "SortMergeJoinExec" and bool(node.isSkewJoin()):
            skew_smj += 1
        elif name.startswith("AQEShuffleRead"):
            specs = node.partitionSpecs()
            for i in range(specs.size()):
                if (
                    specs.apply(i).getClass().getSimpleName()
                    == "PartialReducerPartitionSpec"
                ):
                    partial_specs += 1
    return {
        "skew_smj_count": skew_smj,
        "partial_reducer_specs": partial_specs,
    }
