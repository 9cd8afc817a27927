"""Generate OPERATORS.md: one row per registered query — name, home
module, oracle presence, first docstring line. Usage::

    python tools/gen_operators_md.py > OPERATORS.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return ""
    line = doc.split("\n")[0].strip()
    return line if len(line) < 120 else line[:117] + "..."


def main() -> int:
    qs = entry.queries()
    oracles = entry.oracle_sql()
    print("# OPERATORS — every gated query, generated from the registry")
    print()
    print("Regenerate with `python tools/gen_operators_md.py > OPERATORS.md`.")
    print(f"Total: {len(qs)} queries, {len(oracles)} with DuckDB oracles.")
    print()
    print("Verification cadence: the driver's per-round gate records the")
    print("FIRST 50 registered queries (never-gated queries self-order to")
    print("the front — `__spark_entry__._driver_gated`); the remainder is")
    print("re-verified locally each round by the round-robin sweep")
    print("`python tools/check_correctness.py --outside-window [--ansi]`")
    print("(both ANSI legs; results recorded in PROGRESS.jsonl), so every")
    print("query is re-checked every round on one lane or the other.")
    print()
    print("| query | module | oracle | summary |")
    print("|---|---|---|---|")
    for name in sorted(qs):
        fn = qs[name]
        mod = fn.__module__.replace("sap_sql_engine_spark.", "")
        has_oracle = "yes" if name in oracles else "rows-only"
        print(f"| `{name}` | `{mod}` | {has_oracle} | {first_line(fn)} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
