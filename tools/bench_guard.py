"""Per-query bench regression guard.

    python tools/bench_guard.py NEW.json OLD.json [--max-ratio 1.2]
    python tools/bench_guard.py NEW.json OLD.json [--max-ratio=1.2]

(argparse: both the space and the ``=`` flag forms work; arg order is
NEW then OLD — reversing them silently inverts every ratio.)

Compares two bench JSON lines (``BENCH_r{N}.json`` shape) query by
query and fails when any query shared by both runs slowed past the
ratio. New queries (absent from OLD) are listed informationally — they
have no baseline yet. Sub-half-second queries get a 100 ms absolute
floor before the ratio applies: at that scale tens of milliseconds are
scheduler noise, not plan regressions (the r6 verdict's reading of the
1.18-1.19x flutter on 0.15 s queries, made explicit).
"""

from __future__ import annotations

import argparse
import json
import re

ABS_FLOOR_SEC = 0.1


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        description="Per-query bench regression guard (NEW vs OLD)."
    )
    p.add_argument("new_json", help="newer BENCH json (the run under test)")
    p.add_argument("old_json", help="older BENCH json (the baseline)")
    p.add_argument("--max-ratio", type=float, default=1.2)
    ns = p.parse_args(argv)
    ratio = ns.max_ratio
    args = [ns.new_json, ns.old_json]

    def load_queries(path: str) -> dict:
        d = json.load(open(path))
        # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
        if "parsed" in d and isinstance(d["parsed"], dict):
            d = d["parsed"]
        if "queries" in d:
            return d["queries"]
        # salvage path: BENCH_r07.json has parsed:null because the bench
        # line overflowed the driver's 2000-char tail capture (fixed in
        # bench.py by moving raw passes to a side file). Recover whatever
        # scalar "name": sec pairs survive in the truncated tail —
        # passes arrays don't match the scalar regex, meta keys excluded.
        tail = d.get("tail", "")
        meta = {"value", "sf", "n", "rc", "cpus", "scale_up", "time_ratio",
                "pair_ratio", "linear_bound"}
        pairs = {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9]+\.?[0-9]*)[,}]', tail)
            if m.group(1) not in meta
        }
        if not pairs:
            raise SystemExit(f"{path}: no queries dict and nothing salvageable")
        print(f"(salvaged {len(pairs)} per-query timings from {path}'s "
              f"truncated tail — front-truncated queries are absent)")
        return pairs

    new = load_queries(args[0])
    old = load_queries(args[1])

    regressions, improved, added = [], [], []
    for name, t_new in new.items():
        if name not in old:
            added.append((name, t_new))
            continue
        t_old = old[name]
        if t_new > max(t_old * ratio, t_old + ABS_FLOOR_SEC):
            regressions.append((name, t_old, t_new, round(t_new / t_old, 2)))
        elif t_new < t_old * 0.9:
            improved.append((name, t_old, t_new, round(t_new / t_old, 2)))

    for name, t in sorted(added):
        print(f"new   {name}: {t}s (no baseline)")
    for name, o, n, r in sorted(improved):
        print(f"fast  {name}: {o}s -> {n}s ({r}x)")
    for name, o, n, r in sorted(regressions):
        print(f"SLOW  {name}: {o}s -> {n}s ({r}x > {ratio}x guard)")
    shared = [k for k in new if k in old]
    t_new_sum = round(sum(new[k] for k in shared), 3)
    t_old_sum = round(sum(old[k] for k in shared), 3)
    print(
        f"\nshared-query total: {t_old_sum}s -> {t_new_sum}s; "
        f"{len(regressions)} regression(s), {len(added)} new"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
