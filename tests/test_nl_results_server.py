"""NL orchestration + result utilities + HTTP API tests.

Uses the same inline mini-model as test_semantic_layer (hermetic); the
server is driven over a real socket on an ephemeral port."""

import http.client
import json

import pytest

from sap_sql_engine_spark import nl, results, server
from sap_sql_engine_spark.sources.registry import SemanticModel

from test_semantic_layer import MINI_MODEL


@pytest.fixture(scope="module")
def mini():
    return SemanticModel.from_dict(MINI_MODEL)


@pytest.fixture(scope="module")
def mini_data(spark, mini):
    """Mini-model views with a few rows so template SQL executes."""
    spark.createDataFrame(
        [("V1", "Acme Industrial"), ("V2", "Globex")], ["LIFNR", "NAME1"]
    ).createOrReplaceTempView("LFA1")
    spark.createDataFrame(
        [
            ("1000", "V1", "D1", "2026", "001", 100.0, "S", None, "2026-01-05"),
            ("1000", "V1", "D2", "2026", "001", 40.0, "H", None, "2026-01-06"),
            ("1000", "V2", "D3", "2026", "001", 75.0, "S", None, "2026-01-07"),
            ("1000", "V2", "D4", "2026", "001", 75.0, "S", "2026-02-01", "2026-01-08"),
        ],
        ["BUKRS", "LIFNR", "BELNR", "GJAHR", "BUZEI", "DMBTR", "SHKZG", "AUGDT", "BUDAT"],
    ).createOrReplaceTempView("BSIK")
    # PII table for governance-over-HTTP test
    spark.createDataFrame(
        [("P1", "Jordan", "O1"), ("P2", "Casey", "O1")], ["PERNR", "ENAME", "ORGEH"]
    ).createOrReplaceTempView("PA0001")


# ---------------------------------------------------------------------------
# nl.py


def test_detect_modules_ranks_ap_first():
    mods = nl.detect_modules("top vendors by open invoice amount")
    assert mods[0] == "FI_AP"


def test_detect_modules_word_boundaries():
    # "map" must not hit the "ap" keyword; fallback returns all modules
    assert len(nl.detect_modules("show me the map")) == len(nl.MODULE_KEYWORDS)


def test_classify_contract(mini):
    cls = nl.classify("Who are our top vendors by total spend in 2024?", mini)
    assert cls["confidence"] in ("high", "medium", "low")
    assert cls["modules"][0] == "FI_AP"
    assert cls["slots"]["metric"]["status"] == "filled"
    assert cls["slots"]["time_period"]["status"] == "filled"
    assert cls["slots"]["entity"]["value"].startswith("vendor")
    assert isinstance(cls["suggestions"], list) and cls["suggestions"]
    assert cls["suggestions"][0]["prompt"] == "Who are our top vendors?"


def test_classify_missing_slots_asks_questions(mini):
    cls = nl.classify("show me some numbers", mini)
    assert cls["disambiguation_needed"] is True
    assert {sq["slot"] for sq in cls["slot_questions"]} == {"metric", "entity"}


def test_build_system_prompt_filters_modules(mini):
    ap = nl.build_system_prompt(mini, ["FI_AP"])
    assert "LFA1" in ap and "BSIK" in ap
    assert "TABLE BKPF" not in ap
    full = nl.build_system_prompt(mini)
    assert "TABLE BKPF" in full
    assert len(full) > len(ap)


def test_extract_main_sql_last_block():
    md = "draft:\n```sql\nSELECT 1\n```\nfinal:\n```sql\nSELECT 2\n```\n"
    assert nl.extract_main_sql(md) == "SELECT 2"


def test_extract_main_sql_unlabeled_fallback():
    md = "```\nSELECT x FROM t\n```"
    assert nl.extract_main_sql(md) == "SELECT x FROM t"
    assert nl.extract_main_sql("no sql here") is None


def test_answer_template_path(spark, mini, mini_data):
    out = nl.answer(spark, "open vendor balance", mini)
    assert out["template"] == "vendor_balance"
    res = out["result"]
    assert res["columns"] == ["vendor_name", "balance"]
    # V2 has one open 75 (cleared row excluded); V1 nets 100-40=60
    rows = {r[0]: r[1] for r in res["rows"]}
    assert rows == {"Globex": 75.0, "Acme Industrial": 60.0}


def test_answer_no_match_gives_suggestions(spark, mini):
    out = nl.answer(spark, "completely unrelated astrophysics question", mini)
    assert out.get("clarification_needed") is True
    assert "result" not in out


def test_answer_llm_path(spark, mini, mini_data):
    def fake_llm(system_prompt, user):
        if system_prompt.startswith("Classify"):
            return "not json"  # force the deterministic classification path
        assert "TABLE LFA1" in system_prompt  # filtered schema present
        return "Here you go\n```sql\nSELECT COUNT(*) AS n FROM LFA1\n```"

    out = nl.answer(spark, "how many suppliers exist in the master data", mini, llm=fake_llm)
    if "template" not in out:  # question shouldn't match the template
        assert out["result"]["rows"] == [[2]]


# ---------------------------------------------------------------------------
# results.py


def test_detect_col_format():
    assert results.detect_col_format("total_spend") == "currency"
    assert results.detect_col_format("DMBTR") == "currency"
    assert results.detect_col_format("order_count") == "count"
    assert results.detect_col_format("BUDAT") == "date"
    assert results.detect_col_format("cost_center") == "none"  # non-currency token wins
    assert results.detect_col_format("LIFNR") == "none"  # id column


def test_format_cell():
    assert results.format_cell(1234.5, "currency") == "$1,234.50"
    assert results.format_cell(1234, "count") == "1,234"
    assert results.format_cell(None, "currency") == "NULL"
    assert results.format_cell("x", "none") == "x"


def test_infer_chart_pie_for_few_categories():
    res = {
        "columns": ["region", "revenue"],
        "rows": [["EU", 10.0], ["NA", 20.0], ["APAC", 5.0]],
    }
    chart = results.infer_chart(res)
    assert chart["label_col"] == "region"
    assert chart["value_cols"] == ["revenue"]
    assert chart["default_type"] == "bar"
    assert "pie" in chart["suggested_types"]


def test_infer_chart_line_for_time_series():
    res = {
        "columns": ["month", "amount"],
        "rows": [[f"2026-{m:02d}", float(m)] for m in range(1, 13)],
    }
    chart = results.infer_chart(res)
    assert chart["default_type"] == "line"


def test_infer_chart_none_without_numbers():
    assert results.infer_chart({"columns": ["a"], "rows": [["x"]]}) is None


def test_exports():
    res = {"columns": ["a", "b"], "rows": [[1, "x"], [2, None]]}
    assert results.to_csv(res) == "a,b\n1,x\n2,\n"
    assert results.to_tsv(res).splitlines()[0] == "a\tb"
    xls = results.to_excel_html(res)
    assert "<table>" in xls and "<th>a</th>" in xls


# ---------------------------------------------------------------------------
# server.py


@pytest.fixture(scope="module")
def api(spark, mini, mini_data):
    srv = server.create_server(spark, mini, port=0)
    server.start_background(srv)
    host, port = srv.server_address
    yield host, port
    srv.shutdown()


def _req(api, method, path, payload=None):
    conn = http.client.HTTPConnection(*api, timeout=60)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body, headers={"Content-Type": "application/json"})
    r = conn.getresponse()
    raw = r.read()
    conn.close()
    try:
        return r.status, json.loads(raw)
    except json.JSONDecodeError:
        return r.status, raw.decode()


def test_api_status(api):
    status, out = _req(api, "GET", "/api/status")
    assert status == 200 and out["status"] == "ok" and out["tables"] >= 3


def test_api_kg_endpoints(api):
    status, stats = _req(api, "GET", "/api/kg/stats")
    assert status == 200 and stats["nodes"] > 0
    status, table = _req(api, "GET", "/api/kg/table/LFA1")
    assert status == 200 and table["module"] == "FI_AP"
    status, _ = _req(api, "GET", "/api/kg/table/NOPE")
    assert status == 404
    status, path = _req(
        api, "POST", "/api/kg/join_path", {"table1": "BSIK", "table2": "LFA1"}
    )
    assert status == 200 and path["shortest"] == ["BSIK", "LFA1"]


def test_api_classify_and_generate(api):
    status, out = _req(api, "POST", "/api/classify", {"question": "top vendors"})
    assert status == 200 and out["classification"]["modules"][0] == "FI_AP"
    status, out = _req(
        api, "POST", "/api/generate", {"question": "open vendor balance"}
    )
    assert status == 200 and out["result"]["row_count"] == 2


def test_api_execute_and_cap(api):
    status, out = _req(
        api,
        "POST",
        "/api/execute",
        {"sql": "SELECT NAME1 FROM LFA1 ORDER BY NAME1", "max_rows": 1},
    )
    assert status == 200
    assert out["row_count"] == 1 and out["has_more"] is True
    assert out["column_types"] == ["str"]


def test_api_execute_governance_block(api):
    status, out = _req(
        api, "POST", "/api/execute", {"sql": "SELECT PERNR, ENAME FROM PA0001"}
    )
    assert status == 403 and out["governance_block"] is True


def test_api_execute_error_contract(api):
    status, out = _req(api, "POST", "/api/execute", {"sql": "SELECT FROM nothing"})
    assert status == 400 and "error" in out


def test_api_export_csv(api):
    status, text = _req(
        api,
        "POST",
        "/api/export",
        {"sql": "SELECT NAME1 AS name FROM LFA1 ORDER BY NAME1", "format": "csv"},
    )
    assert status == 200
    assert text.splitlines()[0] == "name"
    assert "Acme Industrial" in text


def test_api_chart(api):
    status, out = _req(
        api,
        "POST",
        "/api/chart",
        {"sql": "SELECT NAME1 AS vendor, COUNT(*) AS cnt FROM LFA1 GROUP BY NAME1"},
    )
    assert status == 200 and out["chart"]["value_cols"] == ["cnt"]


# ---------------------------------------------------------------------------
# config.py


def test_config_roundtrip(tmp_path):
    from sap_sql_engine_spark import config

    p = str(tmp_path / "config.json")
    cfg = config.load_config(p)  # missing -> defaults
    assert cfg["max_rows"] == 200
    cfg["max_rows"] = 50
    cfg["unknown_key"] = "dropped"
    config.save_config(cfg, p)
    back = config.load_config(p)
    assert back["max_rows"] == 50
    assert "unknown_key" not in back
    (tmp_path / "config.json").write_text("{corrupt")
    assert config.load_config(p)["max_rows"] == 200


def test_api_lineage(api):
    status, out = _req(
        api, "POST", "/api/lineage", {"sql": "SELECT NAME1 AS vendor FROM LFA1"}
    )
    assert status == 200
    [src] = out["columns"]["vendor"]
    assert src.lower().endswith("lfa1.name1")
    status, out = _req(api, "POST", "/api/lineage", {"sql": "SELECT FROM nope"})
    assert status == 400 and "error" in out


def test_api_explain(api):
    status, out = _req(
        api,
        "POST",
        "/api/explain",
        {"sql": "SELECT NAME1 FROM LFA1 WHERE LIFNR = 'V001'"},
    )
    assert status == 200 and "Scan" in out["plan"] and out["mode"] == "formatted"
    status, out = _req(api, "POST", "/api/explain", {"sql": "SELECT 1", "mode": "nope"})
    assert status == 400


def test_api_pipeline_runner(api):
    status, out = _req(api, "POST", "/api/pipeline", {"name": "list"})
    assert status == 200 and "dedup_exact" in out["queries"]
    status, out = _req(
        api,
        "POST",
        "/api/pipeline",
        {"name": "dedup_exact", "sf_dir": "/root/testdata/sf0.001"},
    )
    assert status == 200
    assert out["query"] == "dedup_exact"
    assert "doc_count" in out["columns"] and out["row_count"] > 0
    status, out = _req(api, "POST", "/api/pipeline", {"name": "nope"})
    assert status == 400 and "unknown pipeline query" in out["error"]
