"""Dialect transpiler tests — each §2.6 rewrite rule, string- and
execution-level (transpiled SQL must actually run on Spark)."""

import pytest

from sap_sql_engine_spark.plans import dialect

T = dialect.transpile


# ---------------------------------------------------------------------------
# lexical layer


def test_strip_line_comments():
    assert "SELECT 1" in T("-- header comment\nSELECT 1 -- trailing")


def test_strip_block_comments():
    assert T("/* hi */ SELECT /* mid */ 1") == "SELECT 1"


def test_comment_chars_inside_strings_preserved():
    out = T("SELECT 'a--b' AS x")
    assert "'a--b'" in out


def test_multi_statement_keeps_last_select():
    out = T("SET foo=1; SELECT 1 AS a; SELECT 2 AS b")
    assert out == "SELECT 2 AS b"


def test_with_statement_selected():
    out = T("SELECT 1; WITH t AS (SELECT 2 AS x) SELECT x FROM t")
    assert out.startswith("WITH t AS")


# ---------------------------------------------------------------------------
# function rules


def test_to_varchar():
    assert T("SELECT TO_VARCHAR(x) FROM t") == "SELECT CAST(x AS STRING) FROM t"


def test_to_char_with_format():
    assert "date_format(d, 'yyyy-MM-dd')" in T("SELECT TO_CHAR(d, 'YYYY-MM-DD') FROM t")


def test_to_date_formats():
    assert "to_date(s, 'yyyyMMdd')" in T("SELECT TO_DATE(s, 'YYYYMMDD') FROM t")
    assert "to_date(s)" in T("SELECT TO_DATE(s) FROM t")


def test_to_number_int():
    assert "CAST(x AS DOUBLE)" in T("SELECT TO_NUMBER(x) FROM t")
    assert "CAST(x AS INT)" in T("SELECT TO_INTEGER(x) FROM t")


def test_add_days_and_months():
    assert "date_add(d, 5)" in T("SELECT ADD_DAYS(d, 5) FROM t")
    # ADD_MONTHS is already Spark-native and must pass through
    assert "ADD_MONTHS(d, 2)" in T("SELECT ADD_MONTHS(d, 2) FROM t")


def test_days_between_direction():
    # HANA DAYS_BETWEEN(a, b) = days from a to b = Spark datediff(b, a)
    assert "datediff(b, a)" in T("SELECT DAYS_BETWEEN(a, b) FROM t")


def test_datediff_three_arg():
    assert "datediff(b, a)" in T("SELECT DATEDIFF(DAY, a, b) FROM t")
    assert "months_between(b, a)" in T("SELECT DATEDIFF(MONTH, a, b) FROM t")


def test_datediff_two_arg_passthrough():
    assert "datediff(a, b)" in T("SELECT DATEDIFF(a, b) FROM t")


def test_trunc():
    assert "trunc(d, 'MM')" in T("SELECT TRUNC(d, 'MONTH') FROM t")
    assert "trunc(d, 'YYYY')" in T("SELECT TRUNC(d, 'YEAR') FROM t")


def test_ifnull_nvl():
    assert "coalesce(a, 0)" in T("SELECT IFNULL(a, 0) FROM t")
    assert "coalesce(b, 1)" in T("SELECT NVL(b, 1) FROM t")


def test_sysdate():
    assert "current_timestamp()" in T("SELECT SYSDATE FROM t")


def test_nested_function_rewrite():
    out = T("SELECT TO_CHAR(ADD_DAYS(d, 1), 'YYYY') FROM t")
    assert "date_format(date_add(d, 1), 'yyyy')" in out


# ---------------------------------------------------------------------------
# SQLite-isms from the reference templates


def test_julianday_difference():
    out = T("SELECT julianday(a) - julianday(b) FROM t")
    assert "datediff(a, b)" in out


def test_julianday_with_date_now():
    out = T("SELECT julianday(date('now')) - julianday(d) FROM t")
    assert "datediff(current_date(), d)" in out


def test_strftime_year():
    assert "date_format(d, 'yyyy')" in T("SELECT strftime('%Y', d) FROM t")


def test_strftime_now():
    assert "date_format(current_date(), 'yyyy')" in T("SELECT strftime('%Y','now') FROM t")


def test_date_now_modifiers():
    assert "date_add(current_date(), -30)" in T("SELECT date('now', '-30 days') FROM t")
    assert "trunc(current_date(), 'MM')" in T("SELECT date('now', 'start of month') FROM t")
    assert "add_months(current_date(), 3)" in T("SELECT date('now', '+3 months') FROM t")


def test_date_literal_untouched():
    out = T("SELECT * FROM t WHERE d >= DATE '2024-01-01'")
    assert "DATE '2024-01-01'" in out


def test_printf_to_format_string():
    assert "format_string('%010d', x)" in T("SELECT printf('%010d', x) FROM t")


# ---------------------------------------------------------------------------
# statement-level rewrites


def test_top_n():
    out = T("SELECT TOP 5 a FROM t ORDER BY a")
    assert out.endswith("LIMIT 5")
    assert "TOP" not in out


def test_fetch_first():
    out = T("SELECT a FROM t ORDER BY a FETCH FIRST 7 ROWS ONLY")
    assert out.endswith("LIMIT 7")


def test_rownum():
    out = T("SELECT a FROM t WHERE ROWNUM <= 3")
    assert out.endswith("LIMIT 3")
    assert "ROWNUM" not in out


def test_not_in_subquery_rewritten():
    out = T("SELECT a FROM t WHERE a NOT IN (SELECT b FROM u)")
    assert "NOT EXISTS" in out
    assert "__anti_key = a" in out


def test_not_in_subquery_with_where():
    out = T("SELECT a FROM t WHERE a NOT IN (SELECT DISTINCT b FROM u WHERE c = 1)")
    assert "NOT EXISTS" in out
    assert "WHERE c = 1" in out
    assert "__anti_key = a" in out


def test_not_in_value_list_untouched():
    out = T("SELECT a FROM t WHERE a NOT IN ('x', 'y')")
    assert "NOT IN ('x', 'y')" in out


def test_open_item_sentinel_normalization():
    out = T("SELECT * FROM BSIK WHERE AUGDT IS NULL")
    assert "(AUGDT IS NULL OR AUGDT = '')" in out
    out2 = T("SELECT * FROM BSAK WHERE b.AUGDT IS NOT NULL")
    assert "(b.AUGDT IS NOT NULL AND b.AUGDT <> '')" in out2


# ---------------------------------------------------------------------------
# execution: the transpiled SQL must run on Spark and produce correct values


@pytest.fixture(scope="module")
def exec_views(spark):
    spark.sql(
        "SELECT * FROM VALUES "
        "('1000','0001000001','D1','2024-01-10','S', 100.00, ''), "
        "('1000','0001000001','D2','2024-02-15','H',  40.00, ''), "
        "('1000','0001000002','D3','2024-01-20','S', 250.00, '2024-03-01') "
        "AS t(BUKRS, LIFNR, BELNR, BUDAT, SHKZG, DMBTR, AUGDT)"
    ).createOrReplaceTempView("BSIK")
    yield
    spark.catalog.dropTempView("BSIK")


def test_exec_open_items_signed_sum(spark, exec_views):
    sql = T(
        """
        SELECT LIFNR,
               SUM(CASE WHEN SHKZG = 'S' THEN DMBTR ELSE -DMBTR END) AS balance
        FROM BSIK WHERE AUGDT IS NULL
        GROUP BY LIFNR
        """
    )
    rows = {r.LIFNR: r.balance for r in spark.sql(sql).collect()}
    assert rows == {"0001000001": 60.0}


def test_exec_aging_with_julianday(spark, exec_views):
    sql = T(
        """
        SELECT BELNR, julianday(DATE '2024-03-06') - julianday(BUDAT) AS age
        FROM BSIK WHERE AUGDT IS NULL
        """
    )
    rows = {r.BELNR: r.age for r in spark.sql(sql).collect()}
    assert rows == {"D1": 56, "D2": 20}


def test_exec_top_rewrite(spark, exec_views):
    sql = T("SELECT TOP 1 BELNR FROM BSIK ORDER BY DMBTR DESC")
    assert [r.BELNR for r in spark.sql(sql).collect()] == ["D3"]


def test_exec_strftime_group(spark, exec_views):
    sql = T(
        "SELECT strftime('%Y-%m', BUDAT) AS ym, COUNT(*) AS n "
        "FROM BSIK GROUP BY strftime('%Y-%m', BUDAT) ORDER BY ym"
    )
    assert [(r.ym, r.n) for r in spark.sql(sql).collect()] == [
        ("2024-01", 2),
        ("2024-02", 1),
    ]


def test_exec_not_in_null_safety(spark, exec_views):
    # a NULL in the subquery result must not wipe out the anti-join result
    spark.sql(
        "SELECT * FROM VALUES ('0001000001'), (CAST(NULL AS STRING)) AS u(LIFNR)"
    ).createOrReplaceTempView("cleared_vendors")
    sql = T("SELECT LIFNR FROM BSIK WHERE LIFNR NOT IN (SELECT LIFNR FROM cleared_vendors)")
    got = sorted(r.LIFNR for r in spark.sql(sql).collect())
    assert got == ["0001000002"]
    spark.catalog.dropTempView("cleared_vendors")


def test_exists_join_rewrite():
    from sap_sql_engine_spark.plans.dialect import _rewrite_exists_join

    sql = (
        "SELECT 1 FROM A x "
        "LEFT JOIN B b ON EXISTS (SELECT 1 FROM L f WHERE f.c1 = x.k AND f.c2 = b.k)"
    )
    out = _rewrite_exists_join(sql)
    assert "EXISTS" not in out
    assert "SELECT DISTINCT __t.*, f.c1 AS __lnk0 FROM B __t JOIN L f ON f.c2 = __t.k" in out
    assert "ON b.__lnk0 = x.k" in out


def test_exists_join_rewrite_with_or_precondition():
    from sap_sql_engine_spark.plans.dialect import _rewrite_exists_join

    sql = (
        "SELECT 1 FROM A v "
        "LEFT JOIN B l ON v.k = l.k OR EXISTS "
        "(SELECT 1 FROM L f WHERE f.c1 = v.k AND f.c2 = l.k)"
    )
    out = _rewrite_exists_join(sql)
    assert "EXISTS" not in out
    assert "ON v.k = l.k OR l.__lnk0 = v.k" in out


def test_where_level_exists_untouched():
    from sap_sql_engine_spark.plans.dialect import _rewrite_exists_join

    sql = (
        "SELECT 1 FROM A x JOIN B b ON x.k = b.k "
        "WHERE EXISTS (SELECT 1 FROM L f WHERE f.c1 = x.k AND f.c2 = b.k)"
    )
    assert _rewrite_exists_join(sql) == sql
