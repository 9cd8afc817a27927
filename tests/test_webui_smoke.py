"""End-to-end web-UI smoke: serves the real page from the real server and
executes its JavaScript under node with a minimal DOM shim
(``tools/ui_smoke.mjs``), driving the user flows the reference UI offers:
status load, ask -> rendered table + history, client-side formats, dev-mode
SQL run, chart draw, governance shield, export, KG explorer.

Skipped (not faked) when node is unavailable."""

import shutil
import subprocess

import pytest

from sap_sql_engine_spark import server
from sap_sql_engine_spark.sources.loader import load_tables
from sap_sql_engine_spark.sources.registry import SemanticModel

NODE = shutil.which("node")


@pytest.fixture(scope="module")
def full_api(spark, tmp_path_factory):
    """Server over the real vendored model + sf0.001 testdata (the same
    wiring the CLI's --serve path builds)."""
    load_tables(spark, "/root/testdata/sf0.001")
    model = SemanticModel.load()
    model.register_empty_views(spark)
    cfg_path = str(tmp_path_factory.mktemp("cfg") / "config.json")
    srv = server.create_server(spark, model, port=0, config_path=cfg_path)
    server.start_background(srv)
    host, port = srv.server_address
    yield f"http://{host}:{port}"
    srv.shutdown()


@pytest.mark.skipif(NODE is None, reason="node not installed")
def test_ui_smoke_headless(full_api):
    proc = subprocess.run(
        [NODE, "tools/ui_smoke.mjs", full_api],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "UI SMOKE PASS" in proc.stdout
    # every stage reported, none silently skipped
    for stage in (
        "status+examples+catalog", "ask->render+history", "client-side formats",
        "dev-mode execute", "chart draw", "governance shield", "export",
        "kg explorer",
    ):
        assert f"ok {stage}" in proc.stdout, proc.stdout
