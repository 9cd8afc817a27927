"""Parquet table loading + view registration.

Reference parity: the reference's only scan operator is a SQLite table scan
(reference ``sap_sql_engine.py:1279-1282``); here every table is a columnar
Parquet scan registered as a temp view, so ``spark.sql`` queries hit
Catalyst's predicate pushdown / column pruning / partition pruning for free.

At 100 TB the same API points at a partitioned Parquet/Iceberg layout; the
loader deliberately never calls an action, so registering the full catalog is
metadata-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Tables the driver synthesizes (TESTDATA.md). TPC-H-ish star schema plus
# events (stream-shaped), documents and embeddings (LLM-pipeline tables).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one table; no action triggered."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame) -> DataFrame:
    """Ensure ``df`` has at least defaultParallelism partitions before
    CPU-heavy per-row work (md5 shingling, token hashing, vector math).

    A small table stored as one parquet file scans as ONE input split, so
    every downstream map stage — however wide the cluster — runs in a
    single task (measured: the whole simhash/minhash token+md5 pipeline
    single-threaded at sf0.1). Gated on the actual scan partition count:
    at 100 TB the table is thousands of splits and this is a no-op; the
    repartition only fires when the scan itself can't feed the cores, and
    then it moves only the small table it round-robins."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TESTDATA_TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load every table under ``sf_dir`` and (optionally) register temp views.

    Missing files are skipped so callers can use the same entry point for a
    partial directory (e.g. only the SAP-shaped fixtures in unit tests).
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
