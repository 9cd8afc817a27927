"""Dump ``explain("formatted")`` for named registered queries.

Usage::

    python tools/dump_plan.py <out_dir> <suffix> <query> [<query> ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` per query — the optimization
rounds' before/after plan evidence (``plans/r14/*_before.txt`` etc.).
Building a query may trigger its builder's eager cache jobs; the plan
captured is the final consumer plan the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from sap_sql_engine_spark import cachereg
from sap_sql_engine_spark.session import get_spark


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plan")
    qs = entry.queries()
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        cachereg.release()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
