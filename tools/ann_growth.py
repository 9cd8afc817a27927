"""ANN/serving-surface growth stress — measures how the embedding- and
document-corpus serving queries scale when the corpus grows past the
bench scale.

    python tools/ann_growth.py [factor ...]     # default: 1 5 10

For each factor k the sf0.1 embeddings AND documents tables are
replicated k times with a per-replica id offset — the SAME offset for
both, preserving the vec_id == doc_id convention the hybrid fusion joins
on (replica 0 keeps the original ids, so the fixed probe set and the
kmeans seed vectors exist at every factor). Row VALUES are kept as-is:
what this harness times is the corpus-sized work — featurization,
assignment, per-probe candidate scans, the Lloyd rounds, the BM25
postings residue, the classifier's gradient aggregations — all of which
scale with row count regardless of content; result contents shift with
the corpus (k co-located copies of each row) and "result_rows" records
them for reference, the growth signal is sec.

Prints one JSON line per (query, factor) and persists the run to
tools/ann_growth_results.json (same shape as tpch_growth_results.json) —
tools/explain_audit.py renders SCALE.md's ANN growth section from it.
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
from sap_sql_engine_spark.operators import classifier, search, similarity
from sap_sql_engine_spark.session import get_spark

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = {
    # r9 suite max (r9 verdict items 1+6): ONE featurize pass, ONE Lloyd
    # fit, ONE cached assignment, cached per-probe exact top-K — k× vectors
    # should cost ~k× on those passes and nothing extra per leg
    "ann_staleness_report": similarity.QUERIES["ann_staleness_report"],
    "ann_recall_report": similarity.QUERIES["ann_recall_report"],
    # r10 heavies (r10 verdict item 2): the probe sweep re-uses one fit +
    # the batched serve per setting; the hybrid runs each leg's gated plan
    # once; the classifier is one cached featurize + 6 bounded
    # aggregations — all should track corpus size linearly
    "ann_ivf_probe_sweep": similarity.QUERIES["ann_ivf_probe_sweep"],
    "hybrid_search_rrf": search.QUERIES["hybrid_search_rrf"],
    "logreg_quality_report": classifier.QUERIES["logreg_quality_report"],
    # r11: the CV report is 3 fold-chains off ONE cached featurize pass
    # (the heaviest classifier entry); the separation report is one
    # per-label centroid aggregation + a |labels|^2 metadata cross; the
    # batched OOC serve pays one assignment map for the whole batch —
    # all should track corpus size linearly
    "logreg_cv_report": classifier.QUERIES["logreg_cv_report"],
    "embedding_separation_report": similarity.QUERIES[
        "embedding_separation_report"
    ],
    "ann_query_vector_batch_topk": similarity.QUERIES[
        "ann_query_vector_batch_topk"
    ],
}

ID_OFFSET = 10_000_000


def build_scaled_corpus(spark, factor: int, dst_dir: str) -> dict[str, int]:
    """Replicate embeddings AND documents k times with the SAME
    per-replica id offset (vec_id == doc_id convention preserved for the
    hybrid fusion's id join)."""
    counts = {}
    for tbl, id_col in (("embeddings", "vec_id"), ("documents", "doc_id")):
        base = spark.read.parquet(f"{BASE_SF_DIR}/{tbl}.parquet")
        others = [c for c in base.columns if c != id_col]
        parts = [
            base.select(
                (F.col(id_col) + F.lit(k * ID_OFFSET)).alias(id_col), *others
            )
            for k in range(factor)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{dst_dir}/{tbl}.parquet")
        counts[tbl] = spark.read.parquet(f"{dst_dir}/{tbl}.parquet").count()
    return counts


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("ann-growth")
    results = []
    for factor in factors:
        tmp = tempfile.mkdtemp(prefix=f"ann_growth_{factor}x_")
        try:
            counts = build_scaled_corpus(spark, factor, tmp)
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
                    "fact_rows": counts["embeddings"],
                    "doc_rows": counts["documents"],
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
        "harness": "tools/ann_growth.py " + " ".join(str(f) for f in factors),
        "rows": results,
        "summaries": summaries,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ann_growth_results.json"
    )
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
