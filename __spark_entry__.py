"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (top customers by spend — the
Spark re-expression of the reference's top-vendors-by-spend template,
reference ``sap_semantic_model.json:7525``) on sf0.001.

``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB-oracle SQL; names and output column aliases
match exactly between the Spark plan and the oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sap_sql_engine_spark.operators import (
    bpe,
    dedup,
    govqueries,
    graph,
    multimodal,
    relational,
    search,
    similarity,
    skew,
    textanalysis,
)
from sap_sql_engine_spark.streaming import events as streaming_events

SF0001_DIR = "/root/testdata/sf0.001"

# Registration order drives the correctness gate's 50-entry window: the
# dedup/similarity/search/multimodal/skew/events surface goes first so
# every extension operator receives a gate row; the relational/
# textanalysis queries that follow already hold green rows from earlier
# rounds (CORRECTNESS_r01..r03).
_MODULES = (
    dedup,
    graph,
    bpe,
    similarity,
    search,
    multimodal,
    skew,
    govqueries,
    streaming_events,
    relational,
    textanalysis,
)

def _driver_gated() -> set[str]:
    """Query names that already hold a green row in any driver
    CORRECTNESS_r*.json — used to push never-gated queries to the FRONT
    of the registration order so the gate's 50-entry window always spends
    its slots on queries with no row on record. Self-maintaining: each
    round's new file shrinks the priority set automatically."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    gated: set[str] = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            record = json.load(open(path))
        except Exception:
            continue  # a malformed record never breaks registration
        if not isinstance(record, dict):
            continue  # e.g. a list-shaped legacy file: valid JSON, no rows
        for name, row in record.items():
            # Only a GREEN row counts as gated: a red row (hash/schema/
            # rows mismatch or an error) must re-enter the window so the
            # driver can re-verify the fix next round.
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                gated.add(name)
    return gated


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q_top_customers_by_spend(spark, SF0001_DIR)


def _ordered(attr: str) -> dict:
    full: dict = {}
    for mod in _MODULES:
        full.update(getattr(mod, attr))
    gated = _driver_gated()
    out = {k: full[k] for k in full if k not in gated}  # never-gated first
    out.update(full)  # existing keys keep their (front) position
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered("QUERIES")


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key (same column aliases)."""
    return _ordered("ORACLES")
