"""Execution API — the engine's ``/api/execute`` equivalent.

Result contract mirrors the reference's JSON shape (reference
``sap_sql_engine.py:1329-1336``)::

    {columns, column_types, rows, row_count, has_more, spark_sql}

- the incoming SQL goes through the dialect front-end first (plans.dialect),
- the governance gate runs on the *analyzed plan* before any execution
  (reference gates on SQL text at ``:1271-1273``),
- the 200-row cap + has_more probe uses ``limit(max_rows + 1)`` — one extra
  row instead of the reference's ``fetchmany`` + ``fetchone`` probe
  (``:1284-1287``); on a cluster this plans a CollectLimit, so a SELECT *
  over 100 TB still ships only max_rows+1 rows to the driver,
- column types come from the DataFrame schema statically, not sampled from
  fetched rows (``:1291-1310`` infers per-row and promotes int->float).
"""

from __future__ import annotations

import datetime
import decimal
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from . import dialect, governance

DEFAULT_MAX_ROWS = 200


def column_type_of(dt: T.DataType) -> str:
    """Spark type -> reference's {str,int,float} reporting vocabulary."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    return "str"


def _to_jsonable(v: Any) -> Any:
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, bytearray):
        return bytes(v).hex()
    if isinstance(v, bytes):
        return v.hex()
    return v


def execute(
    spark: SparkSession,
    sql: str,
    max_rows: int = DEFAULT_MAX_ROWS,
    transpile: bool = True,
) -> dict:
    """Run a query through dialect -> governance -> capped collect."""
    spark_sql = dialect.transpile(sql) if transpile else sql
    try:
        df = spark.sql(spark_sql)
    except Exception as e:  # parse/analysis error — same error contract
        return {
            "error": str(e).split("\n")[0],
            "spark_sql": spark_sql,
        }

    block = governance.check(df)
    if block is not None:
        return {
            "governance_block": True,
            "type": block.type,
            "message": block.message,
            "spark_sql": spark_sql,
        }

    try:
        out = collect_result(df, max_rows)
    except Exception as e:  # late analysis/runtime failure — same contract
        return {
            "error": str(e).split("\n")[0],
            "spark_sql": spark_sql,
        }
    out["spark_sql"] = spark_sql
    return out


def collect_result(df, max_rows: int = DEFAULT_MAX_ROWS) -> dict:
    """Capped collect of any DataFrame into the result-table contract —
    shared by ``execute`` and the CLI's ``--pipeline`` runner."""
    rows = df.limit(max_rows + 1).collect()
    has_more = len(rows) > max_rows
    rows = rows[:max_rows]
    return {
        "columns": df.schema.names,
        "column_types": [column_type_of(f.dataType) for f in df.schema.fields],
        "rows": [[_to_jsonable(v) for v in row] for row in rows],
        "row_count": len(rows),
        "has_more": has_more,
    }
