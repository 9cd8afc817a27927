"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Runs on local[$SPARK_GRAFT_CPUS] (default 32). Each query is timed to
completion of its action (count of the materialized result — the driver's
``collect`` shape without driver-side row transfer dominating the number).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sap_sql_engine_spark import cachereg
from sap_sql_engine_spark.operators import (
    bpe,
    classifier,
    dedup,
    govqueries,
    graph,
    multimodal,
    relational,
    search,
    similarity,
    skew,
    textanalysis,
)
from sap_sql_engine_spark.session import get_spark
from sap_sql_engine_spark.streaming import events

# every registry module the driver contract aggregates — keeps HEADLINE
# free to reference any gated query (contract test pins resolvability)
_REGISTRY: dict = {}
for mod in (
    relational,
    textanalysis,
    dedup,
    similarity,
    events,
    multimodal,
    bpe,
    graph,
    govqueries,
    skew,
    search,
    classifier,
):
    _REGISTRY.update(mod.QUERIES)

HEADLINE = [
    # relational core
    "pricing_summary",
    "top_customers_by_spend",
    "revenue_by_region",
    "top_orders_per_segment",
    "three_way_match",
    "above_nation_average",
    "rollup_region_nation",
    # running_balance + count_distinct dropped r11 for the line budget:
    # sub-0.4s queries whose window/distinct-agg shapes recur in the
    # remaining entries (vocab_oov_report, order-histogram distinct)
    "recursive_line_chain",
    # TPC-H breadth (added r7 so regressions in these plans are visible;
    # the four r5/r6 shapes with nontrivial plans + the four r7 shapes)
    "cheapest_supplier_per_part",  # Q2
    "small_quantity_revenue",  # Q17
    "promo_part_suppliers",  # Q20
    "suppliers_kept_waiting",  # Q21
    "order_priority_check",  # Q4
    "ship_priority_classes",  # Q12
    "promo_revenue_share",  # Q14
    "part_supplier_concentration",  # Q16
    # r8 additions: skyline window recipe, FIFO interval join, collapsed
    # fuzzy join, SQ8 audit — the new nontrivial plans under the guard
    "part_skyline_frontier",
    "fifo_return_reallocation",
    "part_name_fuzzy_pairs",
    "embedding_sq8_error",
    "kn_bigram_smoothing",
    "text_winnowing",
    "events_transition_matrix",
    "events_state_drift",
    # supplier_herfindahl dropped r11 (line budget): its share-of-total
    # concentration shape recurs in part_supplier_concentration
    "vocab_coverage_curve",
    "embedding_matryoshka_report",
    "parts_abc_classification",
    "events_interarrival_percentiles",
    # r9 additions: the new nontrivial plans under the guard — relational
    # dhash banding, the two-phase top-K rewrites, trained-tokenizer
    # composition, power iteration
    "media_dhash_report",
    "vocab_oov_report",
    "bpe_shard_assignment",
    "embedding_top_eigen",
    "dedup_normalization_ladder",
    "ann_staleness_report",
    "trade_lpa_communities",
    # monthly_seasonality dropped r11 (line budget): a sub-0.3s
    # month-bucket aggregation whose shape recurs in revenue_by_region's
    # grouped-agg plan and the spine entries that already left
    "events_funnel_latency",
    # r10 additions: hybrid fusion (two gated rankers composed), the
    # on-engine trainer, the audio fingerprint lane, the probe sweep
    "hybrid_search_rrf",
    "logreg_quality_report",
    "media_audio_fp_report",
    "ann_ivf_probe_sweep",
    # r11 additions: the out-of-corpus serving paths (corpus signing +
    # literal probe; the two-leg novel-query fusion) and the index-health
    # occupancy report (signature pass + band aggregation).
    # embedding_quantization_sweep stays out only for the 1900-char line
    # budget (its explode-pass shape is already covered by
    # embedding_sq8_error); 57 names measured 1910 chars worst-case.
    "dedup_query_text_probe",
    "hybrid_query_search",
    # dedup_band_occupancy dropped r14 (line budget: copurchase_kcore_profile
    # joined the line): its signature-pass + band-aggregation shape stays
    # covered by dedup_query_text_probe (same signing trunk) and
    # media_dhash_report's banded join
    # r11 third wave: the IVM reconcile (three rollup legs + two bounded
    # merge joins) and the filtered serving probe (predicate-pushed
    # prefilter + over-fetched postfilter off one assignment map)
    "rollup_incremental_merge",
    "ann_filtered_query_topk",
    # pipeline operators
    "dedup_ngram_jaccard",
    "dsir_importance",
    "token_pmi_pairs",
    "dedup_minhash_lsh",
    # dedup_simhash dropped r13 (line budget: the calibration key +
    # dedup_prefix_filter_pairs joined the line): its banded-hamming
    # join shape stays covered by media_dhash_report (the identical
    # _banded_hamming_distances join) and dedup_band_occupancy
    # text_quality_score dropped r10: a pure-map plan with no shuffle —
    # zero regression surface — and the 54-name line overflowed the
    # driver's 2000-char capture (the r7 lesson, caught by the contract)
    # ann_bruteforce_topk + ann_lsh_bucketed dropped r11 (line budget):
    # the exact-top-k and LSH shapes are embedded in ann_staleness_report
    # / ann_recall-class entries that stay
    "events_sessionize",
    # events_hourly_rollup dropped r12 (line budget): its grouped
    # time-bucket agg shape recurs in events_transition_matrix and the
    # daily compactions inside the r11 time-series entries
    # r12 addition: the grouped-fold CV rewrite (regression guard for
    # the one-agg-per-step shape). customer_spend_gini stays out for the
    # line budget — its range-exchange rank primitive is already
    # exercised by bpe_shard_assignment's with_global_rank plan
    "logreg_cv_report",
    # r13 addition: the exact set-similarity join — r12's only weak mark
    # was that its 27.8s cost lived ONLY in the growth sidecar, invisible
    # to the per-round bench; now its number is machine-recorded here
    # every round (r13 rewrite: PPJoin filters + duplicate-set grouping)
    "dedup_prefix_filter_pairs",
    # r14 addition (verdict item #7): the bounded-iteration heavy-harness
    # max (9.45s at sf0.1 facts) gets a machine-compared per-round number
    # instead of living only in heavy_growth_results.json — the
    # prefix-filter precedent applied to the k-core peeling lane
    "copurchase_kcore_profile",
]


def _prev_round_times() -> dict[str, float]:
    """Per-query timings from the newest driver ``BENCH_r*.json`` — the
    round-over-round base for the >1.3x third-pass rule. The driver file
    wraps the bench line inside its captured stdout tail; extract the
    last contract-shaped JSON line from it. Empty dict when no prior
    round exists or the tail is unparseable (r07's overflow)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, str] | None = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), path)
    if best is None:
        return {}
    try:
        tail = json.load(open(best[1])).get("tail", "")
        start = tail.rfind('{"metric": "headline_suite_total"')
        if start < 0:
            return {}
        obj, _ = json.JSONDecoder().raw_decode(tail[start:])
        return obj.get("queries", {})
    except Exception:
        return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")

    # Calibration canary (r12 verdict item 5): r12's recorded +19% was
    # pure host drift, only provable by a judge re-run. One fixed,
    # data-independent query — sum over a 100M-row range, pure
    # whole-stage-codegen arithmetic, no I/O — timed min-of-3 at bench
    # start and recorded in the JSON line, so cross-round totals can be
    # normalized mechanically: if `calibration` moved 1.2x, a 1.2x suite
    # move is the host, not the plans.
    cal_passes = []
    for _ in range(3):
        t0 = time.time()
        spark.range(100_000_000).selectExpr("sum(id)").collect()
        cal_passes.append(round(time.time() - t0, 3))
    calibration = min(cal_passes)

    # Warm pass: run the whole suite once untimed so the timed pass measures
    # steady-state throughput (JIT-compiled codegen, parquet footers read)
    # rather than first-touch JVM compilation, which otherwise dominates and
    # adds multi-second run-to-run variance. Data caches populated by the
    # warm pass are CLEARED so no timed query reads a pre-materialized
    # result — only code/metadata warmth carries over.
    for name in HEADLINE:
        _REGISTRY[name](spark, sf_dir).count()
    cachereg.release()  # drain the builder-cache registry alongside clearCache
    spark.catalog.clearCache()

    # Two timed passes, per-query MIN: the host shows transient CPU steal
    # (shared-tenancy bursts measured inflating identical plans 2-4x run to
    # run), and min-of-2 recovers the steady-state number a quiet machine
    # would give. Caches are cleared between passes so each timing still
    # builds its own caches from the parquet scans. Both raw passes are
    # recorded under "passes" so cross-round comparisons can account for the
    # methodology (r01/r02 were single-pass; min-of-2 started in r03).
    passes: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(2):
        for name in HEADLINE:
            fn = _REGISTRY[name]
            t0 = time.time()
            fn(spark, sf_dir).count()
            passes[name].append(round(time.time() - t0, 3))
        cachereg.release()
        spark.catalog.clearCache()

    # Third pass for round-over-round movers (r10 verdict item 7): a
    # min-of-2 that still moved >1.3x vs the previous round's number is
    # either a real regression or host steal that hit BOTH passes; one
    # more pass separates them mechanically, and the sidecar records all
    # raw passes + which queries were flagged so the next verdict can
    # tell the two apart without guessing.
    prev = _prev_round_times()
    flagged = sorted(
        name
        for name in HEADLINE
        if name in prev
        and prev[name] > 0
        and min(passes[name]) > 0
        and max(min(passes[name]) / prev[name], prev[name] / min(passes[name]))
        > 1.3
    )
    for name in flagged:
        fn = _REGISTRY[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        passes[name].append(round(time.time() - t0, 3))
    if flagged:
        cachereg.release()
        spark.catalog.clearCache()

    times = {name: min(ts) for name, ts in passes.items()}
    total = round(sum(times.values()), 3)
    # Raw per-pass timings + methodology go to a SIDE FILE: the driver
    # captures only the last 2000 chars of stdout, and r07's line (28
    # queries + passes) overflowed that window, leaving BENCH_r07.json
    # unparseable (parsed: null). The final stdout line stays the slim
    # contract shape and must fit the capture window.
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "bench_passes.json"
    )
    with open(sidecar, "w") as f:
        json.dump(
            {
                "passes": passes,
                "methodology": (
                    "per-query min of 2 timed passes (single-pass in "
                    "r01/r02); since r11, a 3rd pass for any query whose "
                    "min-of-2 moved >1.3x vs the previous round's BENCH "
                    "file (host-steal discriminator); since r13, a fixed "
                    "calibration canary (min-of-3 sum over range(1e8), "
                    "pure codegen, no I/O) recorded as 'calibration' in "
                    "the JSON line normalizes cross-round host drift"
                ),
                "third_pass_flagged": flagged,
                "prev_round_base": {n: prev[n] for n in flagged},
                "calibration_passes": cal_passes,
                "sf": sf,
            },
            f,
            indent=1,
        )
    line = json.dumps(
        {
            "metric": "headline_suite_total",
            "value": total,
            "unit": "sec",
            "queries": times,
            "calibration": calibration,
            "sf": sf,
        }
    )
    assert len(line) < 1900, f"bench line {len(line)} chars would overflow the driver's 2000-char tail capture"
    print(line)


if __name__ == "__main__":
    main()
