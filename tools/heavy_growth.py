"""Growth stress for the bounded-iteration heavies (r11 verdict item 3).

    python tools/heavy_growth.py [factor ...]     # default: 1 5 10

Covers the round-11 additions whose scale posture was adjudicated from
plan shape but not yet MEASURED:

- ``bpe_shard_assignment``      (documents; BPE train + apply + range deal)
- ``adaboost_stump_report``     (documents; 3 boosted grid rounds)
- ``docs_greedy_coverage``      (documents; K=5 submodular anti-join rounds)
- ``logreg_cv_report``          (documents; 6 grouped-by-fold gradient steps
                                 — the r12 one-agg-per-step rewrite)
- ``events_markov_stationary``  (events; 6 renormalized power steps)

Document corpora replicate with the dedup harness's VOCABULARY-shift
mutation (disjoint token spaces per replica — size grows k×, per-replica
structure is preserved, cross-replica relations are never created).
Event streams replicate with a USER-ID shift: each replica is the same
user population under new ids, so sessions/transitions grow k× while the
event-type state space — the bounded relation every markov step lives on
— stays fixed, which is exactly the 100 TB shape (more traffic, same
schema of behavior).

Prints one JSON line per (query, factor) and persists to
tools/heavy_growth_results.json ({base_sf_dir, harness, rows, summaries},
the growth_results.json shape) — tools/explain_audit.py renders SCALE.md
growth sections from these files, so SCALE.md reflects what was measured.
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
from sap_sql_engine_spark.operators import bpe, classifier, dedup, graph
from sap_sql_engine_spark.session import get_spark
from sap_sql_engine_spark.streaming import events as streaming_events
from tools.dedup_growth import BASE_SF_DIR, build_scaled_corpus

DOC_QUERIES = {
    "bpe_shard_assignment": bpe.QUERIES["bpe_shard_assignment"],
    "adaboost_stump_report": classifier.QUERIES["adaboost_stump_report"],
    "docs_greedy_coverage": dedup.QUERIES["docs_greedy_coverage"],
    "logreg_cv_report": classifier.QUERIES["logreg_cv_report"],
}
EVENT_QUERIES = {
    "events_markov_stationary": streaming_events.QUERIES[
        "events_markov_stationary"
    ],
}
# r13: the sixth bounded-iteration heavy — synchronous k-core peeling
# (KCORE_ROUNDS degree/filter rounds over the shrinking edge cache)
LINEITEM_QUERIES = {
    "copurchase_kcore_profile": graph.QUERIES["copurchase_kcore_profile"],
}


def build_scaled_events(spark, factor: int, dst_dir: str) -> int:
    """events.parquet replicated ``factor``× with per-replica user_id and
    event_id offsets (timestamps unchanged): k× transitions over the
    same event-type state space. Returns the row count."""
    base = spark.read.parquet(f"{BASE_SF_DIR}/events.parquet")
    parts = []
    for k in range(factor):
        parts.append(
            base.select(
                (F.col("event_id") + F.lit(k * 100_000_000)).alias(
                    "event_id"
                ),
                "ts",
                (F.col("user_id") + F.lit(k * 10_000_000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(f"{dst_dir}/events.parquet")
    return spark.read.parquet(f"{dst_dir}/events.parquet").count()


def build_scaled_lineitem(spark, factor: int, dst_dir: str) -> int:
    """lineitem.parquet (the two columns the co-purchase graph reads)
    replicated ``factor``x with per-replica ORDER and PART key offsets —
    disjoint baskets AND disjoint part spaces, so each replica
    contributes its own isomorphic co-purchase graph (k x nodes and
    edges, per-replica degree structure preserved, no cross-replica
    edges — the vocabulary-shift convention on the graph domain)."""
    base = spark.read.parquet(f"{BASE_SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    parts = []
    for k in range(factor):
        parts.append(
            base.select(
                (F.col("l_orderkey") + F.lit(k * 1_000_000_000)).alias(
                    "l_orderkey"
                ),
                (F.col("l_partkey") + F.lit(k * 100_000_000)).alias(
                    "l_partkey"
                ),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(f"{dst_dir}/lineitem.parquet")
    return spark.read.parquet(f"{dst_dir}/lineitem.parquet").count()


def run_queries(spark, queries, tmp, n_rows, factor, results) -> None:
    for name, fn in queries.items():
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
            "rows": n_rows,
            "pairs": out_rows,
            "sec": min(times),
            "passes": times,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("heavy-growth")
    results = []
    for factor in factors:
        tmp = tempfile.mkdtemp(prefix=f"heavy_growth_{factor}x_")
        try:
            n_docs = build_scaled_corpus(spark, factor, tmp)
            run_queries(spark, DOC_QUERIES, tmp, n_docs, factor, results)
            n_ev = build_scaled_events(spark, factor, tmp)
            run_queries(spark, EVENT_QUERIES, tmp, n_ev, factor, results)
            n_li = build_scaled_lineitem(spark, factor, tmp)
            run_queries(
                spark, LINEITEM_QUERIES, tmp, n_li, factor, results
            )
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
            "pair_ratio": round(r["pairs"] / max(1, b["pairs"]), 2),
            "linear_bound": kx,
        }
        summaries.append(s)
        print(json.dumps(s), flush=True)
    out = {
        "base_sf_dir": BASE_SF_DIR,
        "harness": "tools/heavy_growth.py "
        + " ".join(str(f) for f in factors),
        "rows": results,
        "summaries": summaries,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "heavy_growth_results.json",
    )
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
