"""Time individual registered queries at a given SF dir — the bench's
methodology (warm pass, then N timed passes, per-query min, caches
cleared between passes) applied to an arbitrary query subset, for
before/after A/B runs during optimization. Also prints the bench's
calibration number so cross-window comparisons can normalize host drift.

    python tools/time_queries.py [--passes N] [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sap_sql_engine_spark import cachereg
from sap_sql_engine_spark.session import get_spark
import __spark_entry__ as entry


def main() -> None:
    # Flag parsing (ADVICE r14): the space-separated `--passes N` form used
    # to leak its value into the positional list; consume the value token.
    argv = sys.argv[1:]
    passes = 2
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--passes"):
            if "=" in a:
                passes = int(a.split("=", 1)[1])
            else:
                if i + 1 >= len(argv):
                    raise SystemExit("--passes requires a value")
                passes = int(argv[i + 1])
                i += 1
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    registry = entry.queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("time_queries")

    cal = []
    for _ in range(3):
        t0 = time.time()
        spark.range(100_000_000).selectExpr("sum(id)").collect()
        cal.append(round(time.time() - t0, 3))

    # warm pass (untimed), then clear
    for n in names:
        registry[n](spark, sf_dir).count()
    cachereg.release()
    spark.catalog.clearCache()

    out: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for n in names:
            t0 = time.time()
            registry[n](spark, sf_dir).count()
            out[n].append(round(time.time() - t0, 3))
        cachereg.release()
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "calibration": min(cal),
                "queries": {n: min(v) for n, v in out.items()},
                "passes": out,
            }
        )
    )


if __name__ == "__main__":
    main()
