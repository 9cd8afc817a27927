"""Multi-format ingestion: JSONL and CSV readers with EXPLICIT schemas —
the raw-drop formats a corpus pipeline receives before anything is
parquet. Counterpart to the reference's single-source load (it reads one
SQLite file, reference ``sap_sql_engine.py:131-150``); at 100 TB the same
two entry points matter because crawl/vendor drops arrive as compressed
JSONL or CSV and the FIRST job is a schema-pinned conversion to parquet.

Design rules (all scale-motivated):
- **Schema is always explicit.** ``inferSchema``/sampling reads the data
  twice and lets a malformed row silently retype a column for the whole
  load; a pinned StructType makes bad rows land in the corrupt-record
  column instead of corrupting the schema.
- **PERMISSIVE + corrupt-record capture, never DROPMALFORMED.** Dropped
  rows are silent data loss; the ``_corrupt_record`` column makes loss
  measurable (``bad_row_count`` is the ingest gate).
- **multiLine stays OFF for JSONL** (one JSON doc per line keeps the
  file splittable — a multiLine JSON file is ONE task no matter its
  size); CSV quoting/escaping is configured so embedded newlines still
  split correctly only when ``multiLine`` is explicitly requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Line-delimited JSON with a pinned schema; malformed lines are
    captured, not dropped (and not allowed to retype columns)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    multi_line: bool = False,
) -> DataFrame:
    """CSV with a pinned schema and RFC-4180 quoting (quote-doubling
    escape, so embedded commas/quotes round-trip); ``multi_line`` only
    when values genuinely contain newlines — it costs file splittability."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", str(multi_line).lower())
        .csv(path)
    )


def stream_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Streaming twin of :func:`read_jsonl` — the drop-folder pattern: a
    file-source stream over the same pinned schema, so new JSONL drops
    ingest incrementally with exactly the batch reader's parse semantics
    (drive with ``trigger(availableNow=True)`` for catch-up-then-stop,
    or continuously for a live folder). ``maxFilesPerTrigger`` bounds
    per-micro-batch work at scale."""
    return (
        spark.readStream.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("maxFilesPerTrigger", 64)
        .json(path)
    )


def stream_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
) -> DataFrame:
    """Streaming twin of :func:`read_csv` — the same drop-folder pattern
    as :func:`stream_jsonl` for vendor CSV drops: a file-source stream
    with the batch reader's exact parse semantics (pinned schema,
    PERMISSIVE corrupt-record capture, RFC-4180 quote-doubling).
    ``multiLine`` is deliberately NOT offered on the streaming path: an
    unsplittable multi-line file makes one micro-batch task arbitrarily
    large, which is exactly the latency hazard a drop-folder stream
    exists to bound. ``maxFilesPerTrigger`` caps per-micro-batch work."""
    return (
        spark.readStream.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
        .option("maxFilesPerTrigger", 64)
        .csv(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC writer — the second columnar format a 100 TB pipeline actually
    meets (Hive-lineage warehouses hand over ORC the way vendors hand
    over CSV). Spark's ORC support is built in and zero-dependency;
    footer statistics and predicate pushdown work like parquet's."""
    df.write.mode(mode).orc(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema=None,
    ignore_corrupt_files: bool = False,
) -> DataFrame:
    """ORC reader with an optionally pinned schema.

    ORC is self-describing, so the JSONL/CSV corrupt-RECORD column does
    not apply — a malformed row cannot exist inside a valid stripe; the
    failure unit is the corrupt FILE. Default posture is fail-loud (a
    truncated/garbage file aborts the read); ``ignore_corrupt_files``
    opts into skip-and-continue per file, which is measurable loss at
    file granularity (count files before/after), mirroring the
    measurable-loss contract of :func:`split_corrupt`."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if ignore_corrupt_files:
        r = r.option("ignoreCorruptFiles", "true")
    return r.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """Whether the spark-avro module is on the classpath. Avro has been
    an EXTERNAL module since Spark 2.4 (``org.apache.spark:spark-avro``
    must ship with the job); this container does not bundle it, so the
    Avro lane is availability-gated rather than faked."""
    try:
        # the registry lookup Spark itself performs — a bare
        # Class.forName is NOT sufficient (this container ships some
        # avro classes without the DataSourceRegister service entry, so
        # forName succeeds while reads/writes still fail)
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def _require_avro(spark: SparkSession) -> None:
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro is not on the classpath (external module since "
            "Spark 2.4); deploy org.apache.spark:spark-avro_2.13 with the "
            "job to enable the Avro ingest lane"
        )


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro writer (row-oriented interchange format — the Kafka/schema-
    registry lineage twin of the ORC lane). Availability-gated: raises
    with deployment instructions when spark-avro is absent."""
    _require_avro(df.sparkSession)
    df.write.mode(mode).format("avro").save(path)


def read_avro(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Avro reader with an optionally pinned schema; availability-gated
    like :func:`write_avro`."""
    _require_avro(spark)
    r = spark.read.format("avro")
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad): rows that parsed cleanly vs captured raw records —
    the measurable-loss contract of the ingest gate.

    The parsed frame is cached first: Spark refuses queries that
    reference ONLY the internal corrupt-record column of a raw
    JSON/CSV scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    — caching materializes the parse once, which an ingest job wants
    anyway (the same parse feeds the good-row write AND the bad-row
    quarantine). Lifetime is owned by the caller's surface via
    cachereg.release()."""
    from ..cachereg import track

    cached = track(df.cache())
    bad = cached.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    good = cached.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return good, bad


# ---------------------------------------------------------------------------
# schema evolution: a long-lived parquet dataset accretes columns as the
# producer evolves (v1 drops lack the columns v2 added). Spark's default
# read picks ONE footer's schema — whichever file it samples — so v2
# columns can silently vanish from a mixed directory depending on file
# order. The evolution-safe read merges every footer's schema; the fill
# report then makes the evolution VISIBLE (which columns are sparse and
# since-when is the first question a pipeline owner asks).


def read_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with footer-schema merging — the only correct way to
    scan a directory whose files were written under different schema
    versions. Columns absent from a file surface as NULL for its rows
    (never dropped, never misaligned: parquet matches by column NAME).

    At 100 TB, mergeSchema's cost is a metadata pass over footers (one
    driver-side merge), not a data pass — cheap insurance against the
    silent-column-loss failure mode. Type CONFLICTS (same name, widened
    type) still fail loudly, which is correct: widening needs an explicit
    migration, not a guess."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def schema_fill_report(df: DataFrame) -> DataFrame:
    """Per-column fill rate of an evolved dataset: (column, n_rows,
    n_filled, fill_permille), ordered by column name. One aggregation
    pass (every count is map-side combinable); the report relation is
    bounded by the column count."""
    cols = sorted(df.columns)
    # typed Column expressions throughout (backtick-escaped input refs,
    # positional __f_{i} aliases, F.lit for the stacked labels): column
    # names with spaces, quotes, dots, or backticks survive intact
    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        *[
            F.count(F.col("`" + c.replace("`", "``") + "`"))
            .cast("bigint")
            .alias(f"__f_{i}")
            for i, c in enumerate(cols)
        ],
    )
    pairs: list = []
    for i, c in enumerate(cols):
        pairs += [F.lit(c), F.col(f"__f_{i}")]
    stacked = agg.select(
        F.col("__n"),
        F.stack(F.lit(len(cols)), *pairs).alias("column_name", "n_filled"),
    )
    return stacked.selectExpr(
        "column_name",
        "__n AS n_rows",
        "n_filled",
        "CAST(n_filled * 1000 DIV __n AS BIGINT) AS fill_permille",
    ).orderBy("column_name")
