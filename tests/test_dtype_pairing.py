"""Dtype-pairing contract: the driver's hash canonicalization
distinguishes a DuckDB column pandas renders as float64 (``70.0``) from
a Spark BIGINT (``70``) even when every value is integral — the r4/r5
`embedding_rp_reduce` / `label_agreement_kappa` hash-red mechanism
(FLOATS.md class D). This test runs EVERY registered oracle on DuckDB
and every registered query's SCHEMA on Spark at sf0.001 and asserts the
column classes pair: bigint↔int64, double/decimal↔float64,
string↔object. An un-cast HUGEINT sum or an asymmetric NULL→float64
promotion fails here at build time instead of at the driver.
"""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from tools.check_correctness import (
    TABLES,
    dtype_class,
    dtype_pairing_errors,
    spark_dtype_class,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_seeded_hugeint_violation_is_caught(spark, con):
    """The exact r5 failure shape: DuckDB sum() → HUGEINT → float64 vs
    Spark bigint must be flagged."""
    odf = con.execute(
        "SELECT sum(n_nationkey) AS total FROM nation"
    ).fetchdf()
    assert str(odf["total"].dtype).startswith("float"), (
        "precondition: un-cast DuckDB sum should come back float64 "
        f"(got {odf['total'].dtype}) — if this ever changes, the class-D "
        "hazard model needs re-validation"
    )
    sdf = spark.sql("SELECT CAST(42 AS BIGINT) AS total")
    errs = dtype_pairing_errors(sdf, odf)
    assert errs and "total" in errs[0]


def test_cast_to_bigint_passes(spark, con):
    odf = con.execute(
        "SELECT CAST(sum(n_nationkey) AS BIGINT) AS total FROM nation"
    ).fetchdf()
    sdf = spark.sql("SELECT CAST(42 AS BIGINT) AS total")
    assert dtype_pairing_errors(sdf, odf) == []


def test_dtype_class_collapse():
    assert dtype_class("float64") == "float"
    assert dtype_class("int64") == "int"
    assert spark_dtype_class("bigint") == "int"
    assert spark_dtype_class("decimal(38,0)") == "float"
    assert spark_dtype_class("double") == "float"


def test_all_oracles_pair_with_spark_schemas(spark, con):
    """Every (query, oracle) pair at sf0.001: no int↔float class mismatch.

    Spark side reads only the analyzed schema of the returned DataFrame
    (what toPandas()/collect() will emit) — but BUILDING some queries
    does execute jobs: builders that call cache_eager() materialize
    their cached intermediates during construction, so this sweep runs
    real (sf0.001-sized) Spark work, not a pure schema walk. Oracles
    execute too (dtypes depend on values via fetchdf).
    """
    qs, oracles = entry.queries(), entry.oracle_sql()
    from sap_sql_engine_spark import cachereg

    failures = {}
    for name, fn in qs.items():
        if name not in oracles:
            continue  # rows-only queries have no oracle to pair against
        try:
            sdf = fn(spark, SF_DIR)
            odf = con.execute(oracles[name]).fetchdf()
        finally:
            cachereg.release()
        errs = dtype_pairing_errors(sdf, odf)
        if errs:
            failures[name] = errs
    assert not failures, f"dtype-pairing hazards (FLOATS.md class D): {failures}"
