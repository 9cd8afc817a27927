"""Interactive REPL parity (reference ``sap_sql_engine.py:1757-1833``):
examples / key / export / web commands, numeric example selection, sql
execution, template answering — driven with a scripted input function."""

import json

import pytest

from sap_sql_engine_spark import cli
from sap_sql_engine_spark.sources.registry import SemanticModel

from test_semantic_layer import MINI_MODEL
from test_nl_results_server import mini_data  # noqa: F401 (fixture reuse)


@pytest.fixture(scope="module")
def mini():
    return SemanticModel.from_dict(MINI_MODEL)


def run_repl(spark, mini, tmp_path, lines, capsys):
    seq = iter(lines)

    def fake_input(prompt):
        try:
            return next(seq)
        except StopIteration:
            raise EOFError

    rc = cli.repl(
        spark, mini, input_fn=fake_input, config_path=str(tmp_path / "config.json")
    )
    assert rc == 0
    return capsys.readouterr().out


def test_examples_and_quit(spark, mini, tmp_path, capsys):
    out = run_repl(spark, mini, tmp_path, ["examples", "quit"], capsys)
    assert "1. Who are our top vendors by total spend?" in out
    assert "10. Headcount by organizational unit" in out
    assert "mode: deterministic templates" in out


def test_numeric_selection_expands_example(spark, mini, tmp_path, capsys, mini_data):  # noqa: F811
    out = run_repl(spark, mini, tmp_path, ["1"], capsys)
    assert "-> Who are our top vendors by total spend?" in out


def test_key_command_validates_and_persists(spark, mini, tmp_path, capsys):
    out = run_repl(
        spark, mini, tmp_path, ["key nope", "key sk-ant-test123", "quit"], capsys
    )
    assert "Invalid key format" in out
    assert "API key saved (...est123)" in out
    cfg = json.loads((tmp_path / "config.json").read_text())
    assert cfg["anthropic_api_key"] == "sk-ant-test123"


def test_export_writes_system_prompt(spark, mini, tmp_path, capsys):
    out = run_repl(spark, mini, tmp_path, ["export", "quit"], capsys)
    assert "Exported to:" in out
    exported = (tmp_path / "sap_system_prompt.txt").read_text()
    assert "TABLE LFA1" in exported and "VALIDATED PATTERNS" in exported


def test_sql_command_executes(spark, mini, tmp_path, capsys, mini_data):  # noqa: F811
    out = run_repl(
        spark, mini, tmp_path,
        ["sql SELECT NAME1 FROM LFA1 ORDER BY NAME1", "quit"], capsys,
    )
    assert "Acme Industrial" in out and "Globex" in out


def test_template_answer_path(spark, mini, tmp_path, capsys, mini_data):  # noqa: F811
    out = run_repl(spark, mini, tmp_path, ["open vendor balance"], capsys)
    assert "[template: vendor_balance]" in out
    assert "Globex" in out


def test_web_command_starts_server(spark, mini, tmp_path, capsys, monkeypatch):
    started = {}

    def fake_serve(sp, model, port):
        started["port"] = port

    monkeypatch.setattr("sap_sql_engine_spark.server.serve", fake_serve)
    out = run_repl(spark, mini, tmp_path, ["web"], capsys)
    assert started["port"] == 8080
    assert "serving on http://127.0.0.1:8080" in out


def test_cli_pipeline_runner(capsys):
    from sap_sql_engine_spark import cli

    rc = cli.main(["--pipeline", "list"])
    out = capsys.readouterr().out
    assert rc == 0 and "dedup_exact" in out and "corpus_release_funnel" in out

    rc = cli.main(["--pipeline", "dedup_exact", "--sf-dir", "/root/testdata/sf0.001"])
    out = capsys.readouterr().out
    assert rc == 0 and "doc_count" in out

    rc = cli.main(["--pipeline", "no_such_query"])
    out = capsys.readouterr().out
    assert rc == 2 and "unknown pipeline query" in out
