"""Governance block/allow matrix (reference sap_sql_engine.py:1202-1259)
+ executor result contract (:1262-1338)."""

import pytest

from sap_sql_engine_spark.plans import executor, governance


@pytest.fixture(scope="module", autouse=True)
def hr_views(spark):
    spark.sql(
        "SELECT * FROM VALUES "
        "('00100001', '2020-01-01', '9999-12-31', '1000', 'ORG1', 'S001'), "
        "('00100002', '2021-06-01', '9999-12-31', '1000', 'ORG1', 'S002'), "
        "('00100003', '2019-03-01', '9999-12-31', '2000', 'ORG2', 'S001') "
        "AS t(PERNR, BEGDA, ENDDA, BUKRS, ORGEH, STELL)"
    ).createOrReplaceTempView("PA0001")
    spark.sql(
        "SELECT * FROM VALUES "
        "('00100001', 'Smith', 'Alex', '1990-05-01'), "
        "('00100002', 'Jones', 'Sam', '1985-11-12') "
        "AS t(PERNR, NACHN, VORNA, GBDAT)"
    ).createOrReplaceTempView("PA0002")
    spark.sql(
        "SELECT * FROM VALUES ('V1', 100.0), ('V2', 200.0) AS t(LIFNR, DMBTR)"
    ).createOrReplaceTempView("NONPII")
    yield
    for v in ("PA0001", "PA0002", "NONPII"):
        spark.catalog.dropTempView(v)


def gov(spark, sql):
    return governance.check(spark.sql(sql))


# --- block matrix ---------------------------------------------------------


def test_row_level_select_blocked(spark):
    b = gov(spark, "SELECT * FROM PA0001")
    assert b is not None and b.type == "missing_group_by"


def test_group_by_without_agg_blocked(spark):
    b = gov(spark, "SELECT ORGEH FROM PA0001 GROUP BY ORGEH")
    assert b is not None and b.type == "missing_aggregate_function"


def test_pii_grouping_column_blocked(spark):
    b = gov(spark, "SELECT PERNR, COUNT(*) AS n FROM PA0001 GROUP BY PERNR")
    assert b is not None and b.type == "pii_column_exposed"


def test_join_with_pii_blocked(spark):
    b = gov(spark, "SELECT n.LIFNR FROM NONPII n JOIN PA0001 p ON n.LIFNR = p.BUKRS")
    assert b is not None and b.type == "missing_group_by"


def test_view_indirection_still_blocked(spark):
    # the reference's substring scan would PASS a query through a renamed
    # view; the plan walk resolves views and still sees PA0002 underneath
    spark.sql("SELECT * FROM PA0002").createOrReplaceTempView("innocent_name")
    try:
        b = gov(spark, "SELECT * FROM innocent_name")
        assert b is not None and b.type == "missing_group_by"
    finally:
        spark.catalog.dropTempView("innocent_name")


# --- allow matrix ---------------------------------------------------------


def test_headcount_by_org_allowed(spark):
    assert gov(spark, "SELECT ORGEH, COUNT(*) AS headcount FROM PA0001 GROUP BY ORGEH") is None


def test_agg_over_pii_column_allowed(spark):
    assert (
        gov(
            spark,
            "SELECT ORGEH, COUNT(PERNR) AS n FROM PA0001 GROUP BY ORGEH",
        )
        is None
    )


def test_non_pii_row_level_allowed(spark):
    assert gov(spark, "SELECT * FROM NONPII") is None


def test_pii_table_name_in_string_literal_allowed(spark):
    # substring scanning (the reference approach) would false-positive here
    assert gov(spark, "SELECT 'PA0001 report' AS title, LIFNR FROM NONPII") is None


# --- executor contract ----------------------------------------------------


def test_execute_shape_and_types(spark):
    res = executor.execute(spark, "SELECT LIFNR, DMBTR FROM NONPII ORDER BY LIFNR")
    assert res["columns"] == ["LIFNR", "DMBTR"]
    assert res["column_types"] == ["str", "float"]
    assert res["rows"] == [["V1", 100.0], ["V2", 200.0]]
    assert res["row_count"] == 2
    assert res["has_more"] is False
    assert "spark_sql" in res


def test_execute_row_cap_and_has_more(spark):
    res = executor.execute(spark, "SELECT id FROM RANGE(500)", max_rows=200)
    assert res["row_count"] == 200
    assert res["has_more"] is True


def test_execute_governance_block_contract(spark):
    res = executor.execute(spark, "SELECT * FROM PA0001")
    assert res["governance_block"] is True
    assert res["type"] == "missing_group_by"
    assert "PII Protection" in res["message"]
    assert "rows" not in res


def test_execute_dialect_integration(spark):
    # HANA-ish input goes through the transpiler before hitting Spark
    res = executor.execute(
        spark, "SELECT TOP 1 LIFNR, TO_VARCHAR(DMBTR) AS amt FROM NONPII ORDER BY DMBTR DESC"
    )
    assert res["rows"] == [["V2", "200.0"]]
    assert res["spark_sql"].endswith("LIMIT 1")


def test_execute_error_contract(spark):
    res = executor.execute(spark, "SELECT nonexistent_col FROM NONPII")
    assert "error" in res


def test_aliased_pii_grouping_blocked(spark):
    # aliasing hides PERNR from the output-name check; the structural
    # grouping-expression walk still catches it
    b = gov(
        spark,
        "SELECT ORGEH, PERNR AS eid, COUNT(*) AS n FROM PA0001 GROUP BY ORGEH, PERNR",
    )
    assert b is not None and b.type == "pii_column_exposed"
    assert "PERNR" in b.message


def test_derived_pii_grouping_blocked(spark):
    # expressions OVER an identifier still group per-individual
    b = gov(
        spark,
        "SELECT substr(PERNR, 1, 8) AS k, COUNT(*) AS n FROM PA0001 GROUP BY substr(PERNR, 1, 8)",
    )
    assert b is not None and b.type == "pii_column_exposed"


def test_non_pii_grouping_with_agg_still_allowed(spark):
    assert (
        gov(
            spark,
            "SELECT p.ORGEH, COUNT(*) AS n FROM PA0001 p JOIN NONPII v ON v.LIFNR = p.BUKRS GROUP BY p.ORGEH",
        )
        is None
    )


def test_masked_view_pseudonymizes_pii(spark):
    from sap_sql_engine_spark.plans import governance

    df = spark.createDataFrame(
        [(1001, "DOE", 5000.0), (1002, "ROE", 6000.0), (1001, "DOE", 5500.0)],
        ["PERNR", "ENAME", "amount"],
    )
    m1 = governance.masked(df, salt="s1").collect()
    # PII columns become 64-hex pseudonyms; non-PII passes through
    for r in m1:
        assert len(r.PERNR) == 64 and set(r.PERNR) <= set("0123456789abcdef")
        assert len(r.ENAME) == 64
        assert isinstance(r.amount, float)
    # joinability: same person under one salt -> same token
    tokens = {r.PERNR for r in m1 if r.amount in (5000.0, 5500.0)}
    assert len(tokens) == 1
    # irreversibility across salts: a different salt yields different tokens
    m2 = governance.masked(df, salt="s2").collect()
    assert {r.PERNR for r in m1} != {r.PERNR for r in m2}
    # the masked view passes the aggregate-only gate where raw access would
    # not expose identifiers: identifiers are no longer PII-typed values but
    # the schema names remain, so check() still treats them as identifiers —
    # masking is the allow-path BEFORE the gate, not a bypass of it
    assert governance.check(df.groupBy().count()) is None
