"""Relational-core growth stress — measures how the headline TPC-H-shaped
queries scale when the FACT tables grow past the bench scale.

    python tools/tpch_growth.py [factor ...]     # default: 1 5 10

For each factor k the sf0.1 ``orders`` and ``lineitem`` tables are
replicated k times with a per-replica orderkey offset (order/line
structure preserved, every replica joins the SAME dimension rows), so
fact volume grows k× while dimensions stay fixed — exactly the shape of
real warehouse growth. A plan whose joins broadcast the dims and whose
aggregations combine map-side should show ~linear (or better, given
fixed JVM/stage overheads) time growth.

Prints one JSON line per (query, factor): fact rows in, result rows, sec
(min of 2 passes). Numbers land in SCALE.md's growth section (rendered
from tools/tpch_growth_results.json by tools/explain_audit.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sap_sql_engine_spark import cachereg
from sap_sql_engine_spark.operators import graph, relational
from sap_sql_engine_spark.session import get_spark
from sap_sql_engine_spark.streaming import events as streaming_events

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM_TABLES = ("region", "nation", "customer", "supplier", "part")
FACT_OFFSET_COLS = {"orders": ("o_orderkey",), "lineitem": ("l_orderkey",)}
KEY_STRIDE = 1_000_000_000  # far above any base orderkey at bench scale

QUERIES = {
    "pricing_summary": relational.QUERIES["pricing_summary"],
    "top_customers_by_spend": relational.QUERIES["top_customers_by_spend"],
    "three_way_match": relational.QUERIES["three_way_match"],
    "suppliers_kept_waiting": relational.QUERIES["suppliers_kept_waiting"],
    # r8 heavyweights (r8 verdict item 5): ABC's rank pass must stay range-
    # partitioned and FIFO's cumulative-interval join must grow with
    # supply+demand pairs, not quadratically
    "parts_abc_classification": relational.QUERIES["parts_abc_classification"],
    "fifo_return_reallocation": relational.QUERIES["fifo_return_reallocation"],
    # r9 heavyweight (r9 verdict item 6): LPA's corpus-sized work is the
    # one edge aggregation over lineitem x orders; the 5 label rounds run
    # on the bounded <=|nations|^2 cached edge relation, so k× facts
    # should cost ~k× on the edge build and nothing on the rounds
    "trade_lpa_communities": graph.QUERIES["trade_lpa_communities"],
    # r11 additions: the survival curve pays the same fact-fact orderkey
    # join as the latency percentiles; the IVM reconcile pays three
    # events scans (base/delta/full) whose rollup joins stay bounded at
    # days x types; CUSUM compacts the fact table to the bounded daily
    # relation in one aggregation, so k× facts should cost ~k× on that
    # single pass and nothing on the windowed tail
    "orders_ship_survival": relational.QUERIES["orders_ship_survival"],
    "rollup_incremental_merge": streaming_events.QUERIES[
        "rollup_incremental_merge"
    ],
    "events_cusum_changepoint": streaming_events.QUERIES[
        "events_cusum_changepoint"
    ],
    # r12 additions: the two sufficient-statistics OLS joins (one
    # fact-fact / one fact-dim key join + map-side-combined integer
    # sums — kx facts should cost ~kx on the join, nothing downstream)
    # and the rank-form Gini over the with_global_rank range exchange
    "ship_latency_qty_ols": relational.QUERIES["ship_latency_qty_ols"],
    "discount_qty_elasticity": relational.QUERIES["discount_qty_elasticity"],
    "customer_spend_gini": relational.QUERIES["customer_spend_gini"],
}


def build_scaled_warehouse(spark, factor: int, dst_dir: str) -> int:
    """orders/lineitem replicated ``factor``× with consistent orderkey
    offsets; dimensions copied once. Returns total fact rows."""
    for t in DIM_TABLES:
        spark.read.parquet(f"{BASE_SF_DIR}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst_dir}/{t}.parquet")
    n_facts = 0
    for t, key_cols in FACT_OFFSET_COLS.items():
        base = spark.read.parquet(f"{BASE_SF_DIR}/{t}.parquet")
        parts = []
        for k in range(factor):
            parts.append(
                base.select(
                    *[
                        (F.col(c) + F.lit(k * KEY_STRIDE)).alias(c)
                        if c in key_cols
                        else F.col(c)
                        for c in base.columns
                    ]
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{dst_dir}/{t}.parquet")
        n_facts += spark.read.parquet(f"{dst_dir}/{t}.parquet").count()
    # events: replicate with event_id offsets; ts normalized to plain
    # TIMESTAMP micros on read (the queries' _normalize_ts passes it
    # through unchanged), user/type columns kept so per-user and
    # per-type densities grow k× — the real ingest-growth shape
    base_ev = streaming_events._events(spark, BASE_SF_DIR)
    ev_parts = []
    for k in range(factor):
        ev_parts.append(
            base_ev.select(
                (F.col("event_id") + F.lit(k * KEY_STRIDE)).alias("event_id"),
                "ts", "user_id", "event_type", "value", "props",
            )
        )
    ev = ev_parts[0]
    for p in ev_parts[1:]:
        ev = ev.unionByName(p)
    ev.write.mode("overwrite").parquet(f"{dst_dir}/events.parquet")
    n_facts += spark.read.parquet(f"{dst_dir}/events.parquet").count()
    return n_facts


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("tpch-growth")
    results = []
    for factor in factors:
        tmp = tempfile.mkdtemp(prefix=f"tpch_growth_{factor}x_")
        try:
            n_rows = build_scaled_warehouse(spark, factor, tmp)
            for name, fn in QUERIES.items():
                times, out_rows = [], None
                for _ in range(2):
                    t0 = time.time()
                    out_rows = fn(spark, tmp).count()
                    times.append(round(time.time() - t0, 3))
                    cachereg.release()
                    spark.catalog.clearCache()
                rec = {
                    "query": name,
                    "factor": factor,
                    "fact_rows": n_rows,
                    "result_rows": out_rows,
                    "sec": min(times),
                    "passes": times,
                }
                results.append(rec)
                print(json.dumps(rec), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    base = {r["query"]: r for r in results if r["factor"] == factors[0]}
    summaries = []
    for r in results:
        b = base[r["query"]]
        if r is b:
            continue
        kx = r["factor"] / b["factor"]
        s = {
            "summary": r["query"],
            "scale_up": kx,
            "time_ratio": round(r["sec"] / b["sec"], 2),
            "linear_bound": kx,
        }
        summaries.append(s)
        print(json.dumps(s), flush=True)
    out = {
        "base_sf_dir": BASE_SF_DIR,
        "harness": "tools/tpch_growth.py " + " ".join(str(f) for f in factors),
        "rows": results,
        "summaries": summaries,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tpch_growth_results.json"
    )
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
