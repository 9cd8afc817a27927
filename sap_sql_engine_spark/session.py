"""SparkSession factory with scale-aware defaults.

The reference executes everything on a single-threaded SQLite connection
(``sap_sql_engine.py:1279-1287`` in the reference tree); this engine replaces
that with a SparkSession tuned so the same logical queries distribute across
executors. Local-mode settings mirror what a 1000-executor cluster profile
would set per-executor: AQE on (runtime coalesce + skew-join handling),
shuffle partitions sized to cores, Arrow enabled for the Pandas-UDF paths,
UTC session time so results compare bit-for-bit against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "sap_sql_engine_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults.

    In local mode there is one JVM; on a real cluster the same config set
    applies unchanged — nothing here assumes local execution. AQE handles
    runtime partition coalescing and skew joins, which is the 100 TB-scale
    posture: declared plans stay static, the runtime adapts.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the driver's events.parquet carries TIMESTAMP(NANOS), which Spark 4
        # rejects by default; read as long, normalized in streaming/events.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
