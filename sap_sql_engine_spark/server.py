"""HTTP API — endpoint-for-endpoint parity with the reference server
(reference ``sap_sql_engine.py:1344-1752``), backed by Spark.

Differences that are upgrades, not divergences:

- ``ThreadingHTTPServer`` instead of the reference's single-threaded
  ``HTTPServer.serve_forever`` (``:1724,1748``) — Spark's driver is
  thread-safe for concurrent ``spark.sql`` calls, so concurrency is free.
- ``/api/execute`` runs dialect → governance-on-analyzed-plan → capped
  collect (the reference string-matches SQL text for governance and
  fetches from SQLite).
- ``/api/generate`` is LLM-optional: with no callable configured it
  answers from the validated-template catalog (deterministic), mirroring
  the reference's template-memoization recommendation (design doc §8.5).
- ``/api/export`` serves CSV/TSV/Excel-HTML server-side (the reference
  builds these in the browser, ``sap_sql_ui.html:2590-2663``).

Start with ``serve(spark, model, port=8080)`` or embed via
``create_server`` (port 0 → ephemeral, used by the tests).
"""

from __future__ import annotations

import json
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from . import config as config_mod
from . import llmclient, nl, results, webui
from .cli import EXAMPLES
from .kg import KnowledgeGraph
from .plans import dialect, executor, lineage
from .sources.registry import SemanticModel


class EngineContext:
    """Shared state handed to every request handler."""

    def __init__(
        self,
        spark: SparkSession,
        model: SemanticModel,
        llm: Callable[[str, str], str] | None = None,
        config: dict | None = None,
        config_path: str | None = None,
        transport_factory: Callable[[str], Callable[[dict], dict]] | None = None,
    ):
        self.spark = spark
        self.model = model
        self.config_path = config_path or config_mod.CONFIG_PATH
        self.config = config if config is not None else config_mod.load_config(self.config_path)
        # tests inject a fake transport factory; production uses urllib
        self.transport_factory = transport_factory or llmclient.http_transport
        if llm is None and self.config.get("anthropic_api_key"):
            llm = self.make_client(self.config["anthropic_api_key"])
        self.llm = llm
        self.kg = KnowledgeGraph(model)
        self.catalog = nl.extract_catalog(model)

    def make_client(self, key: str) -> llmclient.LLMClient:
        return llmclient.LLMClient(
            api_key=key,
            model=self.config.get("model") or llmclient.DEFAULT_MODEL,
            transport=self.transport_factory(key),
        )


class _Handler(BaseHTTPRequestHandler):
    ctx: EngineContext  # set on the subclass by create_server

    # -- plumbing -----------------------------------------------------------

    def log_message(self, *a):  # quiet
        pass

    def _json(self, payload: dict, status: int = 200) -> None:
        body = json.dumps(payload, default=str).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _text(self, body: str, content_type: str, filename: str) -> None:
        raw = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Disposition", f'attachment; filename="{filename}"')
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        if not n:
            return {}
        try:
            return json.loads(self.rfile.read(n))
        except json.JSONDecodeError:
            return {}

    # -- GET ----------------------------------------------------------------

    def do_GET(self):  # noqa: N802 (http.server contract)
        ctx = self.ctx
        if self.path in ("/", "/index.html"):
            body = webui.PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/api/status":
            usage = getattr(ctx.llm, "session_usage", None)
            self._json(
                {
                    "status": "ok",
                    "engine": "spark",
                    "spark_version": ctx.spark.version,
                    "tables": len(ctx.model.tables),
                    "modules": ctx.model.modules(),
                    "has_api_key": bool(ctx.config.get("anthropic_api_key")),
                    "model": ctx.config.get("model") or llmclient.DEFAULT_MODEL,
                    "key_preview": (
                        llmclient.key_preview(ctx.config["anthropic_api_key"])
                        if ctx.config.get("anthropic_api_key")
                        else ""
                    ),
                    "session_usage": usage,
                    "session_cost_usd": (
                        ctx.llm.session_cost_usd()
                        if isinstance(ctx.llm, llmclient.LLMClient)
                        else 0.0
                    ),
                }
            )
        elif self.path == "/api/examples":
            self._json({"examples": EXAMPLES})
        elif self.path == "/api/kg/stats":
            self._json(ctx.kg.stats())
        elif self.path == "/api/kg/graph":
            self._json(ctx.kg.to_d3())
        elif self.path.startswith("/api/kg/concept/"):
            name = self.path.rsplit("/", 1)[1]
            obj = ctx.model.objects.get(name)
            self._json(obj or {"error": f"unknown concept {name}"}, 200 if obj else 404)
        elif self.path.startswith("/api/kg/table/"):
            name = self.path.rsplit("/", 1)[1].upper()
            t = ctx.model.tables.get(name)
            if t is None:
                self._json({"error": f"unknown table {name}"}, 404)
            else:
                self._json(
                    {
                        "table": t.name,
                        "module": t.module,
                        "object": t.business_object,
                        "description": t.description,
                        "primary_key": t.primary_key,
                        "columns": t.columns,
                    }
                )
        elif self.path.startswith("/api/kg/module/"):
            mod = self.path.rsplit("/", 1)[1].upper()
            tables = ctx.model.tables_in_module(mod)
            if not tables:
                self._json({"error": f"unknown module {mod}"}, 404)
            else:
                self._json({"module": mod, "tables": tables})
        else:
            self._json({"error": "not found"}, 404)

    # -- POST ---------------------------------------------------------------

    def do_POST(self):  # noqa: N802
        ctx = self.ctx
        body = self._body()
        if self.path == "/api/classify":
            cls = nl.classify(
                body.get("question", ""),
                ctx.model,
                history=body.get("history"),
                llm=ctx.llm,
            )
            self._json({"classification": cls})
        elif self.path == "/api/generate":
            out = nl.answer(
                ctx.spark, body.get("question", ""), ctx.model, llm=ctx.llm
            )
            if "result" in out and "rows" in out["result"]:
                # chart spec computed here (pure, on the capped result) so the
                # UI never re-executes the query just to chart it
                out["chart"] = results.infer_chart(out["result"])
            self._json(out)
        elif self.path == "/api/execute":
            res = executor.execute(
                ctx.spark,
                body.get("sql", ""),
                max_rows=int(body.get("max_rows") or executor.DEFAULT_MAX_ROWS),
            )
            status = 200
            if res.get("governance_block"):
                status = 403
            elif "error" in res:
                status = 400
            elif "rows" in res:
                res["chart"] = results.infer_chart(res)
            self._json(res, status)
        elif self.path == "/api/explain":
            # plan display (formatted/simple/cost/extended) — analysis only,
            # no job; the structural checks stay in governance/lineage, this
            # is the human-facing EXPLAIN surface
            sql = body.get("sql", "")
            mode = body.get("mode", "formatted")
            if mode not in ("simple", "extended", "formatted", "cost", "codegen"):
                self._json({"error": f"unknown explain mode: {mode}"}, 400)
                return
            spark_sql = dialect.transpile(sql)
            try:
                df = ctx.spark.sql(spark_sql)
                jmode = ctx.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    mode
                )
                self._json(
                    {
                        "plan": df._jdf.queryExecution().explainString(jmode),
                        "mode": mode,
                        "spark_sql": spark_sql,
                    }
                )
            except Exception as e:
                self._json(
                    {"error": str(e).split("\n")[0], "spark_sql": spark_sql}, 400
                )
        elif self.path == "/api/pipeline":
            # dev-mode runner for the EXTENSION surface (dedup/ANN/search/
            # events/...): runs a registered __spark_entry__ query on a
            # testdata dir — the HTTP twin of `--pipeline` in the CLI
            name = body.get("name", "")
            sf_dir = body.get("sf_dir") or "/root/testdata/sf0.001"
            try:
                import os
                import sys

                root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                if root not in sys.path:
                    sys.path.insert(0, root)
                import __spark_entry__ as entrymod

                qs = entrymod.queries()
            except Exception as e:  # driver contract not importable here
                self._json({"error": str(e).split("\n")[0]}, 500)
                return
            if name == "list":
                self._json({"queries": sorted(qs)})
            elif name not in qs:
                self._json({"error": f"unknown pipeline query: {name}"}, 400)
            else:
                try:
                    res = executor.collect_result(qs[name](ctx.spark, sf_dir))
                    res["query"] = name
                    res["chart"] = results.infer_chart(res)
                    self._json(res)
                except Exception as e:
                    self._json({"error": str(e).split("\n")[0]}, 400)
        elif self.path == "/api/lineage":
            # plan-metadata only: analyzes the query, runs NO job — safe to
            # call on arbitrarily large queries
            sql = body.get("sql", "")
            spark_sql = dialect.transpile(sql)
            try:
                df = ctx.spark.sql(spark_sql)
                self._json(
                    {
                        "columns": lineage.column_lineage(df),
                        "spark_sql": spark_sql,
                    }
                )
            except Exception as e:
                self._json(
                    {"error": str(e).split("\n")[0], "spark_sql": spark_sql}, 400
                )
        elif self.path == "/api/catalog":
            self._json(ctx.catalog)
        elif self.path == "/api/kg/resolve":
            term = body.get("term", "")
            self._json(
                {
                    "term": term,
                    "resolutions": [r.__dict__ for r in ctx.kg.resolve_term(term)],
                }
            )
        elif self.path == "/api/kg/resolve_question":
            self._json(ctx.kg.resolve_question(body.get("question", "")))
        elif self.path == "/api/kg/join_path":
            t1, t2 = body.get("table1", ""), body.get("table2", "")
            self._json(
                {
                    "shortest": ctx.kg.find_join_path(t1, t2),
                    "all_paths": ctx.kg.all_join_paths(t1, t2),
                }
            )
        elif self.path == "/api/export":
            res = executor.execute(ctx.spark, body.get("sql", ""))
            if "rows" not in res:
                self._json(res, 403 if res.get("governance_block") else 400)
                return
            fmt = (body.get("format") or "csv").lower()
            if fmt == "tsv":
                self._text(results.to_tsv(res), "text/tab-separated-values", "results.tsv")
            elif fmt in ("xls", "excel"):
                self._text(
                    results.to_excel_html(res), "application/vnd.ms-excel", "results.xls"
                )
            else:
                self._text(results.to_csv(res), "text/csv", "results.csv")
        elif self.path == "/api/save-key":
            # format gate -> live probe -> persist; mirrors the reference's
            # endpoint (sap_sql_engine.py:1529-1563): clearly-bad keys are
            # rejected, transient probe failures (network down) still save.
            key = (body.get("key") or "").strip()
            if not llmclient.valid_key_format(key):
                self._json(
                    {"status": "error", "error": "Invalid key format. Should start with sk-ant-"}
                )
                return
            client = ctx.make_client(key)
            try:
                client.probe()
            except llmclient.LLMError as e:
                err = str(e).lower()
                if "authentication" in err or "invalid" in err or "api key" in err:
                    self._json(
                        {
                            "status": "error",
                            "error": "API key validation failed. Check that the key "
                            "is correct and has credits.",
                        }
                    )
                    return
                if "credit" in err or "balance" in err:
                    self._json(
                        {
                            "status": "error",
                            "error": "API key has insufficient credits.",
                        }
                    )
                    return
            ctx.llm = client
            ctx.config["anthropic_api_key"] = key
            config_mod.save_config(ctx.config, ctx.config_path)
            self._json({"status": "ok", "key_preview": llmclient.key_preview(key)})
        elif self.path == "/api/remove-key":
            ctx.config["anthropic_api_key"] = ""
            ctx.llm = None
            config_mod.save_config(ctx.config, ctx.config_path)
            self._json({"status": "ok"})
        elif self.path == "/api/save-model":
            model_name = (body.get("model") or "").strip()
            if model_name not in llmclient.ALLOWED_MODELS:
                self._json({"status": "error", "error": f"Unknown model: {model_name}"})
                return
            ctx.config["model"] = model_name
            if isinstance(ctx.llm, llmclient.LLMClient):
                ctx.llm.model = model_name
            config_mod.save_config(ctx.config, ctx.config_path)
            self._json({"status": "ok", "model": model_name})
        elif self.path == "/api/chart":
            res = executor.execute(ctx.spark, body.get("sql", ""))
            if "rows" not in res:
                self._json(res, 403 if res.get("governance_block") else 400)
                return
            self._json({"chart": results.infer_chart(res), "result": res})
        else:
            self._json({"error": "not found"}, 404)


def create_server(
    spark: SparkSession,
    model: SemanticModel,
    port: int = 0,
    llm: Callable[[str, str], str] | None = None,
    **ctx_kwargs,
) -> ThreadingHTTPServer:
    ctx = EngineContext(spark, model, llm, **ctx_kwargs)
    handler = type("BoundHandler", (_Handler,), {"ctx": ctx})
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def serve(spark: SparkSession, model: SemanticModel, port: int = 8080) -> None:
    srv = create_server(spark, model, port)
    try:
        srv.serve_forever()
    finally:
        srv.shutdown()


def start_background(srv: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return t
