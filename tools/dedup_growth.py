"""Dedup-ladder growth stress — measures how the banded/df-capped dedup
queries scale when the corpus grows past the bench scale.

    python tools/dedup_growth.py [factor ...]     # default: 1 5 10

For each factor k the sf0.1 documents table is replicated k times with a
per-replica VOCABULARY shift (every token prefixed ``{k}x``), so each
replica block keeps the original's internal near-dup rate while sharing
no shingles across blocks — corpus size grows k×, true-pair count grows
~k×, and a sub-quadratic algorithm should show ~linear time and
candidate growth. (Replicating without mutation would instead grow
k-cliques of near-identical docs — pair OUTPUT is quadratic in clique
size by definition, which measures the data, not the algorithm.)

Prints one JSON line per (query, factor): rows in, result pairs, sec
(min of 2 passes), and persists the run to tools/growth_results.json
(same {base_sf_dir, harness, rows, summaries} shape tpch_growth.py
writes) — tools/explain_audit.py renders SCALE.md's dedup growth
section from that file, so regenerating SCALE.md always reflects what
the harness last MEASURED, not hand-copied numbers.
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
from sap_sql_engine_spark.operators import dedup, multimodal, textanalysis
from sap_sql_engine_spark.session import get_spark

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = {
    "dedup_ngram_jaccard": dedup.QUERIES["dedup_ngram_jaccard"],
    "dedup_minhash_lsh": dedup.QUERIES["dedup_minhash_lsh"],
    # r8: the two new corpus-heavy text ops ride the same harness — for
    # these, "pairs" records the (constant-grain) result rows; the growth
    # signal is sec vs the kx corpus (winnowing is map-side + one rollup,
    # KN is two bigram aggregations — both should track the linear bound)
    "text_winnowing": textanalysis.QUERIES["text_winnowing"],
    "kn_bigram_smoothing": textanalysis.QUERIES["kn_bigram_smoothing"],
    # r9/r10 perceptual lanes (r9 verdict item 6): the hash pass is one
    # exploded-position aggregation (linear); the banded candidate join is
    # the part to watch — 16-bit dHash bands keep buckets ~corpus/65536,
    # the 8-bit audio bands ~corpus/256 (the documented widen-the-print
    # knob; "pairs" records candidate classes, the growth signal is sec)
    "media_dhash_report": multimodal.QUERIES["media_dhash_report"],
    "media_audio_fp_report": multimodal.QUERIES["media_audio_fp_report"],
    # r11: the serving probe (corpus signs once, the 1-row literal probe
    # is constant work — should track the signing pass linearly) and the
    # occupancy report (one signature pass + one (band, sig) aggregation)
    "dedup_query_text_probe": dedup.QUERIES["dedup_query_text_probe"],
    "dedup_band_occupancy": dedup.QUERIES["dedup_band_occupancy"],
    # r11 second wave: the dedup x quality interaction — one banded
    # membership pass + the quality featurize, joined on the doc key;
    # output stays 10 decile rows, so "pairs" is constant and the
    # growth signal is sec against the kx corpus
    "dup_rate_by_quality_decile": dedup.QUERIES["dup_rate_by_quality_decile"],
    # r12: the exact prefix-filter join — the vocabulary-shift mutation
    # is precisely its stress (replicas share NO tokens, so true pairs
    # grow kx within replicas and the prefix join must not cross); the
    # reported relation is top-100 so "pairs" is constant and the growth
    # signal is sec
    "dedup_prefix_filter_pairs": dedup.QUERIES["dedup_prefix_filter_pairs"],
}


PERCEPTUAL = ("media_dhash_report", "media_audio_fp_report")


def build_decorrelated_corpus(spark, factor: int, dst_dir: str) -> int:
    """The decorrelating variant for the PERCEPTUAL lanes (r11 verdict
    item 5): same vocabulary-shift replication, plus each k>0 replica
    doc gets a VARIABLE-length md5-derived jitter prefix (11..63 chars,
    length keyed on (doc_id, k)). The envelope/dHash frames are fixed
    char windows, so a non-4-multiple shift misaligns every downstream
    frame — replicas of one base doc stop being perceptual
    near-candidates of each other, modeling real 10× growth (new audio
    is NOT a re-encoding of the old). A FIXED-length prefix would not
    do it: all replicas would shift by the same frame count and keep
    colliding with each other in the shifted bands."""
    base = spark.read.parquet(f"{BASE_SF_DIR}/documents.parquet")
    parts = []
    for k in range(factor):
        shifted = (
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.concat(F.lit(f"{k}x"), t),
                ),
                " ",
            )
            if k > 0
            else F.col("text")
        )
        jitter = F.expr(
            f"substr(repeat(md5(concat(CAST(doc_id AS STRING), '_', "
            f"'{k}')), 2), 1, "
            f"11 + CAST(conv(substr(md5(concat('jl', CAST(doc_id AS "
            f"STRING), '_', '{k}')), 1, 4), 16, 10) % 53 AS INT))"
        )
        rep = base.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            (
                F.concat(jitter, F.lit(" "), shifted) if k > 0 else shifted
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        parts.append(rep)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(f"{dst_dir}/documents.parquet")
    return spark.read.parquet(f"{dst_dir}/documents.parquet").count()


def build_scaled_corpus(spark, factor: int, dst_dir: str) -> int:
    """documents.parquet replicated ``factor``× with disjoint vocabularies
    (token prefix + doc_id offset per replica). Returns the row count."""
    base = spark.read.parquet(f"{BASE_SF_DIR}/documents.parquet")
    parts = []
    for k in range(factor):
        rep = base.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            (
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda t: F.concat(F.lit(f"{k}x"), t),
                    ),
                    " ",
                )
                if k > 0
                else F.col("text")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        parts.append(rep)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(f"{dst_dir}/documents.parquet")
    return spark.read.parquet(f"{dst_dir}/documents.parquet").count()


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("dedup-growth")
    results = []
    for factor in factors:
        tmp = tempfile.mkdtemp(prefix=f"dedup_growth_{factor}x_")
        try:
            n_rows = build_scaled_corpus(spark, factor, tmp)
            for name, fn in QUERIES.items():
                times, pairs = [], None
                for _ in range(2):
                    t0 = time.time()
                    pairs = fn(spark, tmp).count()
                    times.append(round(time.time() - t0, 3))
                    cachereg.release()
                    spark.catalog.clearCache()
                rec = {
                    "query": name,
                    "factor": factor,
                    "rows": n_rows,
                    "pairs": pairs,
                    "sec": min(times),
                    "passes": times,
                }
                results.append(rec)
                print(json.dumps(rec), flush=True)
            # decorrelated perceptual curve: same factor, jittered corpus
            n_rows_d = build_decorrelated_corpus(spark, factor, tmp)
            for name in PERCEPTUAL:
                fn = QUERIES[name]
                times, pairs = [], None
                for _ in range(2):
                    t0 = time.time()
                    pairs = fn(spark, tmp).count()
                    times.append(round(time.time() - t0, 3))
                    cachereg.release()
                    spark.catalog.clearCache()
                rec = {
                    "query": f"{name}[decorrelated]",
                    "factor": factor,
                    "rows": n_rows_d,
                    "pairs": pairs,
                    "sec": min(times),
                    "passes": times,
                }
                results.append(rec)
                print(json.dumps(rec), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    # growth summary relative to the smallest factor
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
        "harness": "tools/dedup_growth.py " + " ".join(str(f) for f in factors),
        "rows": results,
        "summaries": summaries,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "growth_results.json"
    )
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
