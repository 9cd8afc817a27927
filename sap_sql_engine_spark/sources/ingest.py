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
