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

Calibration normalization (r14, verdict item #3): when BOTH files
carry the ``calibration`` canary (a fixed codegen-only query, recorded
since r13), per-query ratios are DIVIDED by the canary's NEW/OLD ratio
before the guard applies — a uniformly slow host window (the r12
adjudication) then cancels out mechanically instead of needing a judge
re-run. Raw and normalized ratios are both printed. Host-drift
normalization is CAPPED to [0.5, 2.0]: a canary moving more than 2x is
itself suspicious and the guard falls back to raw ratios (with a
warning) rather than silently absorbing it.
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

    def load_parsed(path: str) -> dict:
        d = json.load(open(path))
        # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
        if "parsed" in d and isinstance(d["parsed"], dict):
            d = d["parsed"]
        return d

    def load_queries(path: str) -> dict:
        d = load_parsed(path)
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

    # host-drift normalization from the calibration canary
    cal_new = load_parsed(args[0]).get("calibration")
    cal_old = load_parsed(args[1]).get("calibration")
    cal_ratio = 1.0
    if cal_new and cal_old:
        r = cal_new / cal_old
        if 0.5 <= r <= 2.0:
            cal_ratio = r
            print(f"calibration: {cal_old}s -> {cal_new}s "
                  f"(host-drift factor {r:.3f}; normalized ratios = raw / {r:.3f})")
        else:
            print(f"calibration moved {r:.2f}x ({cal_old}s -> {cal_new}s) — "
                  f"outside [0.5, 2.0], falling back to RAW ratios")
    else:
        print("calibration absent from one side — raw ratios only")

    regressions, improved, added = [], [], []
    for name, t_new in new.items():
        if name == "calibration":
            continue
        if name not in old:
            added.append((name, t_new))
            continue
        t_old = old[name]
        raw = t_new / t_old
        norm = raw / cal_ratio
        # guard applies to the NORMALIZED time (raw time divided by the
        # host-drift factor), with the same absolute noise floor
        t_norm = t_new / cal_ratio
        if t_norm > max(t_old * ratio, t_old + ABS_FLOOR_SEC):
            regressions.append((name, t_old, t_new, round(raw, 2), round(norm, 2)))
        elif t_norm < t_old * 0.9:
            improved.append((name, t_old, t_new, round(raw, 2), round(norm, 2)))

    for name, t in sorted(added):
        print(f"new   {name}: {t}s (no baseline)")
    for name, o, n, r, nr in sorted(improved):
        print(f"fast  {name}: {o}s -> {n}s (raw {r}x, norm {nr}x)")
    for name, o, n, r, nr in sorted(regressions):
        print(f"SLOW  {name}: {o}s -> {n}s (raw {r}x, norm {nr}x > {ratio}x guard)")
    shared = [k for k in new if k in old and k != "calibration"]
    t_new_sum = round(sum(new[k] for k in shared), 3)
    t_old_sum = round(sum(old[k] for k in shared), 3)
    norm_sum = round(t_new_sum / cal_ratio, 3)
    print(
        f"\nshared-query total: {t_old_sum}s -> {t_new_sum}s raw "
        f"({norm_sum}s normalized); "
        f"{len(regressions)} regression(s), {len(added)} new"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
