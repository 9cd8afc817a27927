"""LLM client (retry/backoff/caching/usage), key-management endpoints, and
the web UI page (reference ``sap_sql_engine.py:365-455,837-898,1529-1585``;
``sap_sql_ui.html`` served at ``:1375``)."""

import http.client
import json

import pytest

from sap_sql_engine_spark import llmclient, nl, server
from sap_sql_engine_spark.sources.registry import SemanticModel

from test_semantic_layer import MINI_MODEL
from test_nl_results_server import mini_data  # noqa: F401 (fixture reuse)


@pytest.fixture(scope="module")
def mini():
    return SemanticModel.from_dict(MINI_MODEL)


def _response(text="OK", usage=None):
    return {
        "content": [{"type": "text", "text": text}],
        "usage": usage
        or {
            "input_tokens": 100,
            "output_tokens": 20,
            "cache_creation_input_tokens": 0,
            "cache_read_input_tokens": 50,
        },
    }


# ---------------------------------------------------------------------------
# LLMClient core


def test_complete_text_and_usage():
    sent = []

    def transport(payload):
        sent.append(payload)
        return _response("hello")

    c = llmclient.LLMClient(transport=transport, sleep=lambda s: None)
    out = c.complete("sys prompt", [{"role": "user", "content": "hi"}])
    assert out["text"] == "hello"
    assert out["usage"]["input_tokens"] == 100
    assert c.last_usage["cache_read_input_tokens"] == 50
    # prompt-caching contract: system is a block list with ephemeral cache
    sys_block = sent[0]["system"][0]
    assert sys_block["text"] == "sys prompt"
    assert sys_block["cache_control"] == {"type": "ephemeral"}
    assert sent[0]["model"] == llmclient.DEFAULT_MODEL
    assert sent[0]["messages"] == [{"role": "user", "content": "hi"}]


def test_callable_interface_accumulates_session_usage():
    c = llmclient.LLMClient(transport=lambda p: _response("x"), sleep=lambda s: None)
    assert c("s", "u") == "x"
    assert c("s", "u2") == "x"
    assert c.session_usage["queries"] == 2
    assert c.session_usage["input_tokens"] == 200
    assert c.session_usage["cache_read_input_tokens"] == 100
    # pricing: 200 in + 40 out + 100 cache-read at sonnet rates
    expect = 200 / 1e6 * 3.0 + 40 / 1e6 * 15.0 + 100 / 1e6 * 0.30
    assert c.session_cost_usd() == pytest.approx(expect)


def test_retry_backoff_on_transient_statuses():
    calls, sleeps = [], []

    def transport(payload):
        calls.append(1)
        if len(calls) < 3:
            raise llmclient.LLMError("overloaded", 529)
        return _response("finally")

    c = llmclient.LLMClient(transport=transport, sleep=sleeps.append)
    assert c("s", "u") == "finally"
    assert len(calls) == 3
    assert sleeps == [1, 2]  # exponential, reference :887-898


def test_no_retry_on_auth_error():
    calls = []

    def transport(payload):
        calls.append(1)
        raise llmclient.LLMError("authentication_error: invalid x-api-key", 401)

    c = llmclient.LLMClient(transport=transport, sleep=lambda s: None)
    with pytest.raises(llmclient.LLMError) as ei:
        c("s", "u")
    assert ei.value.status_code == 401
    assert len(calls) == 1


def test_retries_exhausted_raises_last_error():
    calls, sleeps = [], []

    def transport(payload):
        calls.append(1)
        raise llmclient.LLMError("unavailable", 503)

    c = llmclient.LLMClient(transport=transport, sleep=sleeps.append)
    with pytest.raises(llmclient.LLMError) as ei:
        c("s", "u")
    assert ei.value.status_code == 503
    assert len(calls) == 3 and sleeps == [1, 2]


def test_key_format_and_cost_table():
    assert llmclient.valid_key_format("sk-ant-abc123")
    assert not llmclient.valid_key_format("sk-proj-nope")
    assert llmclient.key_preview("sk-ant-xyz-abcdef") == "...abcdef"
    haiku = llmclient.cost_usd(
        {"input_tokens": 1_000_000, "output_tokens": 0}, "claude-haiku-4-20250414"
    )
    assert haiku == pytest.approx(0.80)
    # unknown model falls back to sonnet pricing
    assert llmclient.cost_usd({"input_tokens": 1_000_000}, "nope") == pytest.approx(3.0)


def test_probe_uses_tiny_budget():
    sent = []
    c = llmclient.LLMClient(transport=lambda p: sent.append(p) or _response("OK"))
    c.probe()
    assert sent[0]["max_tokens"] == 10


# ---------------------------------------------------------------------------
# nl usage propagation (C6 plumbing)


class _FakeLLM:
    """Callable with an LLMClient-style last_usage attribute."""

    def __init__(self, reply):
        self.reply = reply
        self.last_usage = {}

    def __call__(self, system, user):
        self.last_usage = {
            "input_tokens": 11,
            "output_tokens": 7,
            "cache_creation_input_tokens": 0,
            "cache_read_input_tokens": 3,
        }
        return self.reply


def test_classify_attaches_usage(mini):
    llm = _FakeLLM(json.dumps({"confidence": "high", "modules": ["FI_AP"]}))
    cls = nl.classify("top vendors", mini, llm=llm)
    assert cls["_usage"]["input_tokens"] == 11


def test_answer_attaches_usage(spark, mini, mini_data):  # noqa: F811
    llm = _FakeLLM("```sql\nSELECT COUNT(*) AS n FROM LFA1\n```")
    out = nl.answer(spark, "zzz unmatched question qqq", mini, llm=llm)
    assert out["usage"]["output_tokens"] == 7
    assert out["result"]["rows"] == [[2]]


# ---------------------------------------------------------------------------
# server: key endpoints + UI page


@pytest.fixture(scope="module")
def api(spark, mini, mini_data, tmp_path_factory):  # noqa: F811
    """Server with a tmp config path and a fake Anthropic transport."""
    cfg_path = str(tmp_path_factory.mktemp("cfg") / "config.json")

    def transport_factory(key):
        def send(payload):
            if key.endswith("badkey"):
                raise llmclient.LLMError("authentication_error: invalid api key", 401)
            if payload["max_tokens"] == 10:  # the save-key probe
                return _response("OK")
            return _response("```sql\nSELECT COUNT(*) AS n FROM LFA1\n```")

        return send

    srv = server.create_server(
        spark, mini, port=0,
        config_path=cfg_path, transport_factory=transport_factory,
    )
    server.start_background(srv)
    yield srv.server_address, cfg_path
    srv.shutdown()


def _req(api, method, path, payload=None):
    conn = http.client.HTTPConnection(*api[0], timeout=60)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body, headers={"Content-Type": "application/json"})
    r = conn.getresponse()
    raw = r.read()
    ctype = r.getheader("Content-Type", "")
    conn.close()
    if "json" in ctype:
        return r.status, json.loads(raw)
    return r.status, raw.decode()


def test_get_root_serves_ui(api):
    status, html = _req(api, "GET", "/")
    assert status == 200
    # feature markers: ask flow, history (C5), token cost (C6), dev mode
    # (C7), catalog (C8), governance shield, KG explorer, exports, charts
    for marker in (
        "id=\"question\"", "/api/generate", "sse_history", "PRICING",
        "devRun", "/api/catalog", "Governance block", "/api/kg/graph",
        "/api/export", "drawChart", "/api/save-key",
    ):
        assert marker in html, marker


def test_api_examples(api):
    status, out = _req(api, "GET", "/api/examples")
    assert status == 200 and len(out["examples"]) == 10


def test_save_key_rejects_bad_format(api):
    status, out = _req(api, "POST", "/api/save-key", {"key": "not-a-key"})
    assert status == 200 and out["status"] == "error"
    assert "sk-ant-" in out["error"]


def test_save_key_rejects_failed_probe(api):
    status, out = _req(api, "POST", "/api/save-key", {"key": "sk-ant-badkey"})
    assert out["status"] == "error"
    assert "validation failed" in out["error"]


def test_save_key_roundtrip_enables_llm_generation(api):
    status, out = _req(api, "POST", "/api/save-key", {"key": "sk-ant-goodkey123"})
    assert out == {"status": "ok", "key_preview": "...key123"}
    # persisted to the injected config path, not the repo tree
    with open(api[1]) as f:
        assert json.load(f)["anthropic_api_key"] == "sk-ant-goodkey123"

    status, st = _req(api, "GET", "/api/status")
    assert st["has_api_key"] is True and st["key_preview"] == "...key123"

    # an uncatalogued question now goes through the fake LLM -> SQL -> result
    status, gen = _req(
        api, "POST", "/api/generate", {"question": "zzz unmatched question qqq"}
    )
    assert gen["result"]["rows"] == [[2]]
    assert gen["usage"]["input_tokens"] == 100
    assert gen["sql"].startswith("SELECT COUNT(*)")

    # session usage surfaced for the UI token counter
    status, st = _req(api, "GET", "/api/status")
    assert st["session_usage"]["queries"] >= 1
    assert st["session_cost_usd"] > 0


def test_save_model_validation(api):
    status, out = _req(api, "POST", "/api/save-model", {"model": "gpt-99"})
    assert out["status"] == "error"
    status, out = _req(
        api, "POST", "/api/save-model", {"model": "claude-haiku-4-20250414"}
    )
    assert out == {"status": "ok", "model": "claude-haiku-4-20250414"}


def test_remove_key(api):
    status, out = _req(api, "POST", "/api/remove-key")
    assert out == {"status": "ok"}
    status, st = _req(api, "GET", "/api/status")
    assert st["has_api_key"] is False
    with open(api[1]) as f:
        assert json.load(f)["anthropic_api_key"] == ""
