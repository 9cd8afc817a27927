"""CLI — one-shot and interactive entry points (SURVEY §3.2).

The reference CLI generates SQL but never executes it (execution is
web-UI-only, reference ``sap_sql_engine.py:1757-1833``); this CLI adds
``--sql`` / in-REPL execution — the "parity plus obvious fix" SURVEY calls
for. Without an LLM configured, NL questions are answered through the
deterministic validated-template path in ``nl.answer``.

Usage::

    python -m sap_sql_engine_spark --sql "SELECT ..." [--sf-dir DIR]
    python -m sap_sql_engine_spark -q "open vendor balance"
    python -m sap_sql_engine_spark --serve 8080
    python -m sap_sql_engine_spark              # REPL
"""

from __future__ import annotations

import argparse
import json
import sys

from . import nl, results
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
    args = p.parse_args(argv)

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
    print("sap-sql-engine-spark — 'examples', 'sql <query>', 'quit'")
    while True:
        try:
            line = input("> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        if line in ("quit", "exit"):
            break
        if line == "examples":
            for i, ex in enumerate(EXAMPLES, 1):
                print(f"  {i}. {ex}")
            continue
        if line.startswith("sql "):
            print(format_result(executor.execute(spark, line[4:])))
            continue
        out = nl.answer(spark, line, model)
        if "result" in out:
            print(format_result(out["result"]))
        else:
            print("Need clarification. Try one of:")
            for s in out.get("suggestions", [])[:5]:
                print(f"  - {s['prompt']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
