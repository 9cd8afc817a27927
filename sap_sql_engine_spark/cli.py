"""CLI — one-shot and interactive entry points (SURVEY §3.2).

The reference CLI generates SQL but never executes it (execution is
web-UI-only, reference ``sap_sql_engine.py:1757-1833``); this CLI adds
``--sql`` / in-REPL execution — the "parity plus obvious fix" SURVEY calls
for. Without an LLM configured, NL questions are answered through the
deterministic validated-template path in ``nl.answer``.

REPL commands match the reference's interactive loop (``:1757-1833``):
``examples`` (numbered; a bare number re-asks that example), ``key <k>``
(persist an API key and switch to LLM generation), ``export`` (write the
system prompt to a file), ``web`` (hand off to the HTTP server + UI),
``sql <query>``, ``quit``.

Usage::

    python -m sap_sql_engine_spark --sql "SELECT ..." [--sf-dir DIR]
    python -m sap_sql_engine_spark -q "open vendor balance"
    python -m sap_sql_engine_spark --serve 8080
    python -m sap_sql_engine_spark              # REPL
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from . import config as config_mod
from . import llmclient, nl, results
from .plans import executor
from .sources.loader import load_tables
from .sources.registry import SemanticModel

EXAMPLES = [
    "Who are our top vendors by total spend?",
    "Show open vendor balances by company code",
    "Accounts receivable aging buckets",
    "Trial balance by account for 2026",
    "Cost center actual vs plan variance",
    "Purchase orders over 50000",
    "Three-way match exceptions",
    "Sales order backlog by customer",
    "Maintenance work orders by equipment",
    "Headcount by organizational unit",
]


def format_result(res: dict) -> str:
    """Plain-text table with C2 formatting applied; mirrors what the
    reference UI renders client-side."""
    if res.get("governance_block"):
        return f"[governance:{res['type']}] {res['message']}"
    if "error" in res:
        return f"[error] {res['error']}"
    cols = res["columns"]
    fmts = [results.detect_col_format(c) for c in cols]
    rendered = [
        [results.format_cell(v, f) for v, f in zip(row, fmts)] for row in res["rows"]
    ]
    widths = [
        max(len(c), *(len(r[i]) for r in rendered)) if rendered else len(c)
        for i, c in enumerate(cols)
    ]
    lines = [
        "  ".join(c.ljust(w) for c, w in zip(cols, widths)),
        "  ".join("-" * w for w in widths),
    ]
    lines += ["  ".join(v.ljust(w) for v, w in zip(row, widths)) for row in rendered]
    if res.get("has_more"):
        lines.append(f"... capped at {res['row_count']} rows (more available)")
    return "\n".join(lines)


def _build(sf_dir: str):
    from .session import get_spark

    spark = get_spark("cli")
    load_tables(spark, sf_dir)
    model = SemanticModel.load()  # vendored in-package model assembly
    # schema-true empty views for every model table: validated templates
    # execute (returning empty) wherever no physical data is mounted;
    # SAP names are uppercase so they never clash with testdata views
    model.register_empty_views(spark)
    return spark, model


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sap_sql_engine_spark")
    p.add_argument("-q", "--question", help="one-shot NL question")
    p.add_argument("--sql", help="one-shot SQL (dialect-transpiled, governed)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--serve", type=int, metavar="PORT", help="start the HTTP API")
    p.add_argument("--json", action="store_true", help="emit raw JSON result")
    p.add_argument(
        "--pipeline",
        metavar="QUERY",
        help="run a registered pipeline operator by name on --sf-dir "
        "(use '--pipeline list' to enumerate)",
    )
    args = p.parse_args(argv)

    if args.pipeline:
        # the extension surface (dedup/ANN/search/events/...) — every entry
        # the driver contract registers, runnable from the shell
        import __spark_entry__ as entrymod

        from .session import get_spark

        qs = entrymod.queries()
        if args.pipeline == "list":
            for name in sorted(qs):
                print(name)
            return 0
        if args.pipeline not in qs:
            print(f"unknown pipeline query: {args.pipeline!r} (try '--pipeline list')")
            return 2
        df = qs[args.pipeline](get_spark("cli-pipeline"), args.sf_dir)
        res = executor.collect_result(df)
        print(json.dumps(res, default=str) if args.json else format_result(res))
        return 0

    spark, model = _build(args.sf_dir)

    def show(res: dict) -> None:
        print(json.dumps(res, default=str) if args.json else format_result(res))

    if args.sql:
        show(executor.execute(spark, args.sql))
        return 0
    if args.question:
        out = nl.answer(spark, args.question, model)
        if "result" in out:
            if not args.json and out.get("template"):
                print(f"[template: {out['template']}]")
            show(out["result"])
        else:
            print("Need clarification. Try one of:")
            for s in out.get("suggestions", [])[:5]:
                print(f"  - {s['prompt']}")
        return 0
    if args.serve is not None:
        from . import server

        print(f"serving on http://127.0.0.1:{args.serve}")
        server.serve(spark, model, args.serve)
        return 0

    # REPL
    return repl(spark, model)


def repl(spark, model, input_fn=input, config_path: str | None = None) -> int:
    """Interactive loop; ``input_fn`` injectable for tests."""
    cfg_path = config_path or config_mod.CONFIG_PATH
    cfg = config_mod.load_config(cfg_path)
    llm = None
    if cfg.get("anthropic_api_key"):
        llm = llmclient.LLMClient(
            cfg["anthropic_api_key"], cfg.get("model") or llmclient.DEFAULT_MODEL
        )
    mode = f"API ({llm.model})" if llm else "deterministic templates (no API key)"
    print(f"sap-sql-engine-spark — mode: {mode}")
    print("commands: 'examples', 'key <api-key>', 'export', 'web', 'sql <query>', 'quit'")
    while True:
        try:
            line = input_fn("> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        if line.lower() in ("quit", "exit"):
            break
        if line.lower() == "examples":
            for i, ex in enumerate(EXAMPLES, 1):
                print(f"  {i}. {ex}")
            continue
        if line.lower().startswith("key "):
            new_key = line[4:].strip()
            if not llmclient.valid_key_format(new_key):
                print("  Invalid key format. Should start with sk-ant-")
                continue
            cfg["anthropic_api_key"] = new_key
            config_mod.save_config(cfg, cfg_path)
            llm = llmclient.LLMClient(
                new_key, cfg.get("model") or llmclient.DEFAULT_MODEL
            )
            print(f"  API key saved ({llmclient.key_preview(new_key)})")
            continue
        if line.lower() == "export":
            out_path = os.path.join(
                os.path.dirname(cfg_path), "sap_system_prompt.txt"
            )
            with open(out_path, "w") as f:
                f.write(nl.build_system_prompt(model))
            print(f"  Exported to: {out_path}")
            continue
        if line.lower() == "web":
            from . import server

            port = int(cfg.get("server_port") or 8080)
            print(f"  serving on http://127.0.0.1:{port}")
            server.serve(spark, model, port)
            break
        if line.startswith("sql "):
            print(format_result(executor.execute(spark, line[4:])))
            continue
        if line.isdigit() and 1 <= int(line) <= len(EXAMPLES):
            line = EXAMPLES[int(line) - 1]
            print(f"  -> {line}")
        out = nl.answer(spark, line, model, llm=llm)
        if "result" in out:
            if out.get("template"):
                print(f"[template: {out['template']}]")
            print(format_result(out["result"]))
            if out.get("usage"):
                u = out["usage"]
                print(
                    f"  Tokens: {u['input_tokens']} input, {u['output_tokens']} output"
                )
        else:
            print("Need clarification. Try one of:")
            for s in out.get("suggestions", [])[:5]:
                print(f"  - {s['prompt']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
