"""SCALE.md's BroadcastNestedLoopJoin policy, enforced as a gate.

The audit doc states: the ONLY admissible nested loops are bounded
broadcast probes (a 1-row query vector, a fixed eval sample, a K-row
codebook/centroid relation) and 1-row global-scalar attaches. Until now
that was a per-round manual audit of SCALE.md; this test pins it — a new
query (or an edit to an old one) that introduces a nested-loop join over
anything corpus-sized fails CI the moment it is written, instead of
surfacing as a 100 TB cartesian blowup.

Every allowlisted entry documents WHY its nested loop is bounded. The
allowlist is exact-match: a query gaining a bnlj it never had must be
justified here explicitly.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from tools.explain_audit import audit_plan

SF_DIR = "/root/testdata/sf0.001"

# query -> why its BroadcastNestedLoopJoin count is bounded (audited in
# SCALE.md; every probe side is O(1) or O(K) in the corpus size)
BNLJ_ALLOWED = {
    "important_part_values": "1-row global-total attach (Q11 scalar subquery)",
    "split_leakage_report": "1-row split-fraction scalar attaches",
    "source_overlap_minhash": "per-source signature cross (|sources|^2, metadata-sized)",
    "copurchase_triangles": "1-row edge/wedge totals attached to the coefficient",
    "ann_bruteforce_topk": "1-row query-vector broadcast probe",
    # kmeans_embedding_fit pruned from the allowlist (opt r15): the
    # driver-side centroid recurrence feeds each Lloyd round's assignment
    # a LITERAL centroid array (no broadcast relation at all), and the
    # final plan reads the collected K-row local relation — zero nested
    # loops, so the entry became stale documentation (the logreg_cv_report
    # precedent).
    "ann_ivf_fitted": "K-row trained-codebook broadcast probes",
    "ann_ivf": "K-row frozen-codebook broadcast probe",
    "ann_pq_adc": "codebook (K x subspaces) broadcast probe",
    "embedding_rp_reduce": "1-row distortion-calibration attach",
    "ann_recall_report": "fixed 3-query eval sample probed against each index",
    "ann_staleness_report": "fixed 3-query eval sample probed against the "
    "stale and refit codebooks (K-row centroid broadcasts + 1-row query "
    "probes, the recall_report class)",
    "ann_lsh_multiprobe": "1-row query-vector probe (hamming-1 bucket fanout)",
    "ann_ivf_probe_sweep": "fixed 3-query eval sample probed at each probe "
    "count (1-row query probes, the recall_report class)",
    "ann_recall_at_k_curve": "the same batched 3-query eval probes "
    "(exact truth cross + one ivf_probe_batch)",
    "embedding_knn_accuracy": "fixed leave-one-out eval sample broadcast",
    "quantile_histogram_check": "1-row total/estimate attaches on ~100-bin relation",
    "hll_merge_check": "1-row merged-vs-direct register comparison",
    "sales_opportunity": "1-row global-average threshold attach (Q22)",
    "nb_language_report": "|langs|-row totals crossed onto the vocabulary "
    "(model-table build; langs are a handful)",
    "label_agreement_kappa": "1-row n/pe scalar attach",
    "token_pmi_pairs": "1-row Nu/Np totals attach onto the count-floored "
    "pair relation (heavy-co-occurrence bounded)",
    "monthly_revenue_spine": "12-month literal spine crossed with the "
    "|regions| dim (metadata-sized calendar cross)",
    "source_kl_divergence": "per-source distribution cross (|sources|^2, metadata-sized)",
    "source_unigram_tv_matrix": "per-source totals pair spine "
    "(|sources|^2, metadata-sized — lets disjoint-support pairs report "
    "tv=1000)",
    "hll_intersection_estimate": "1-row pivoted-estimates x 1-row exact-twin "
    "attach (both sides are single-row aggregates of 256-register sketches)",
    "corpus_saturation_curve": "1-row doc_id-bounds attach for decile "
    "range-bucketing (replaced the eager collect, r9)",
    "vocab_coverage_curve": "1-row corpus-token-total attach onto the "
    "3-row K relation (replaced the full-vocabulary total window, r9)",
    "logreg_quality_report": "1-row weight-vector broadcast per bounded "
    "gradient step + the final scoring attach (the Lloyd-round class)",
    "logreg_threshold_sweep": "the same 1-row weight-vector broadcasts "
    "(shared _fit trunk) + the scoring attach",
    "logreg_ablation_report": "4 ablation fits x the same bounded 1-row "
    "weight-vector broadcasts off one shared featurize pass",
    "logreg_calibration_curve": "the shared _fit trunk's 1-row "
    "weight-vector broadcasts + the scoring attach",
    "hybrid_search_rrf": "inherits ann_ivf_fitted's K-row trained-codebook "
    "broadcast probes (the semantic leg, composed unchanged)",
    "hybrid_rrf_k_sweep": "the same inherited semantic-leg probes + a "
    "<=30-row default-list broadcast onto the bounded fused relation",
    "ann_query_vector_topk": "1-row literal out-of-corpus query probe "
    "(array_contains cell-membership join, the ann_ivf class)",
    # logreg_cv_report pruned from the allowlist (opt r14): the per-step
    # CV_FOLDS-row weight broadcasts still execute, but inside the
    # materialize_cut checkpoint jobs of the fold-weight state — the
    # FINAL plan (what this audit sees) reads a LogicalRDD and carries
    # zero nested loops, so the entry became stale documentation.
    "embedding_separation_report": "per-label centroid cross "
    "(|labels|^2, metadata-sized — the source_overlap_minhash class)",
    "hybrid_query_search": "inherits ann_query_vector_topk's 1-row "
    "literal probe (the semantic leg, composed unchanged)",
    "partkey_skew_report": "1-row global-stats x 1-row heaviest-key "
    "scalar attach (both sides single-row aggregates of the cached "
    "key-count relation)",
    "ann_filtered_query_topk": "the same 1-row literal out-of-corpus "
    "probe as ann_query_vector_topk, attached to both the prefiltered "
    "scan and the IVF candidate join",
    "ann_query_vector_batch_topk": "OOC_BATCH-row (3) literal probe "
    "relation broadcast onto the shared assignment map (the "
    "ann_query_vector_topk class, batched)",
    "ann_filter_selectivity_curve": "the same 1-row literal probe "
    "attached to the shared candidate join",
    "events_cusum_changepoint": "1-row ref/n-days attach + 1-row "
    "changepoint attach, both onto the BOUNDED daily relation "
    "(|days| rows; the partkey_skew_report scalar-attach class)",
    "adaboost_stump_report": "54-row candidate-grid broadcast per "
    "bounded boosting round (the Lloyd/logreg bounded-probe class) + "
    "the 1-row ensemble-accuracy attach onto the 3-row rounds relation",
    "events_markov_stationary": "1-row stationary-total + 1-row "
    "transition-total attaches onto the <=|types| vector relation",
    "events_session_archetypes": "1-row session-total attach onto the "
    "bounded signature relation",
    "token_good_turing": "1-row corpus-totals attach onto the "
    "frequency-of-frequencies relation (<= GT_MAX_R rows emitted)",
    "events_mann_kendall": "non-equi day-pair self-cross of the BOUNDED "
    "|days| daily relation (metadata-sized, constant in the corpus) + "
    "the 1-row n_days attach",
    "token_bigram_novelty": "two 1-row scalar attaches (corpus and "
    "shared bigram counts) onto the 1-row incoming-count aggregate",
    "classifier_query_frozen_probe": "1-row frozen-weight attach onto the "
    "2-row literal probe relation (zero corpus scans)",
    "classifier_query_text_probe": "the _fit trunk's 1-row weight-vector "
    "broadcasts (Lloyd class) + the same 1-row weights attached to the "
    "2-row probe featurize",
    # --- round 14 ---
    "supplier_revenue_theil": "1-row (n, x_total) scalar attaches onto "
    "the supplier- and nation-grain term relations + the final 1-row x "
    "1-row combine (total/between)",
    "part_size_price_kendall": "strictly-ordered cell-pair cross of the "
    "GRID-BOUNDED (p_size x $10-bucket) contingency relation "
    "(data-independent cardinality) + 1-row tie/total attaches",
    "embedding_intrinsic_dim": "deterministic vec_id%5 eval sample "
    "broadcast against the corpus for exact 2-NN ground truth (the "
    "ann_bruteforce/knn_accuracy eval class)",
    "quantity_price_mutual_info": "1-row total/entropy attaches onto the "
    "GRID-BOUNDED (50 qty x price-bucket) contingency relation "
    "(the kendall class)",
    "customer_interpurchase_lifetable": "1-row max-date censoring attach "
    "+ 1-row total attaches onto the bounded bucket relation",
    "returns_quantity_trend": "1-row total attach onto the bounded "
    "11-score-bucket relation",
    "supplier_part_assortativity": "1-row node-count attaches onto the "
    "1-row sufficient-statistics aggregate",
    "customer_spend_mld": "1-row between-component attach onto the "
    "1-row total aggregate",
    "docs_quality_ks_by_source": "source x quality-bp spine cross "
    "(|sources| x a DATA-INDEPENDENT <=10001-bp grid, metadata-sized — "
    "dense CDFs so every source's cum is defined at each global grid "
    "point) + the bounded cum_all/n_s attaches",
    "orders_priority_mix_drift": "month x priority spine cross "
    "(~84 x 5, metadata-sized — the cramers_v densification class)",
    "order_priority_cramers_v": "distinct-level spine cross "
    "(r x c <= 15, metadata-sized — lets unobserved cells contribute "
    "their expected mass, the source_unigram_tv_matrix spine class)",
    "orders_price_anderson_darling": "1-row contribution-sum attach "
    "onto the 1-row totals (the ks_test assembly class)",
    "orders_price_mood_median": "1-row global-median broadcast onto the "
    "cached histogram + the k x 2 spine cross (both metadata-sized)",
    "orders_price_ks_test": "1-row max-gap and split-point attaches "
    "(the final assembly is 1-row x 1-row; the argmax probe itself is "
    "an equi-join)",
    "lineitem_qty_jonckheere": "cell-pair inequality cross of the "
    "GRID-BOUNDED (5 priority x 50 qty) contingency relation "
    "(data-independent cardinality, the kendall class) + 1-row "
    "marginal/total attaches",
    "events_theil_sen_slope": "non-equi day-pair self-cross of the "
    "BOUNDED daily spine (|days|^2, the mann_kendall class) + the "
    "1-row day-count attach",
}


@pytest.fixture(scope="module")
def plans(spark):
    """explain('formatted') text for every registered query — plan build
    only (cache_eager builders do materialize their sf0.001-sized
    caches, same caveat as the dtype-pairing sweep)."""
    from sap_sql_engine_spark import cachereg

    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = {}
    try:
        for name, fn in entry.queries().items():
            df = fn(spark, SF_DIR)
            out[name] = df._jdf.queryExecution().explainString(mode)
    finally:
        cachereg.release()
    return out


def test_no_unbounded_nested_loop_joins(plans):
    violations = {}
    for name, plan in plans.items():
        n = audit_plan(plan)["nested_loop_joins"]
        if n > 0 and name not in BNLJ_ALLOWED:
            violations[name] = n
    assert not violations, (
        "BroadcastNestedLoopJoin outside the bounded-probe allowlist "
        f"(SCALE.md policy): {violations} — either the plan regressed or "
        "the new nested loop needs an explicit bounded-probe justification "
        "in BNLJ_ALLOWED"
    )


def test_allowlist_entries_still_have_bnlj(plans):
    """Reverse direction: an allowlist entry whose query no longer plans
    any nested loop is stale documentation — prune it so the allowlist
    stays an exact statement of the audited surface."""
    stale = [
        name
        for name in BNLJ_ALLOWED
        if name in plans and audit_plan(plans[name])["nested_loop_joins"] == 0
    ]
    assert not stale, f"stale BNLJ_ALLOWED entries (no bnlj in plan): {stale}"


def test_every_shuffling_query_plans_adaptively(plans):
    """AQE must wrap every query that shuffles — it is the runtime half
    of the scale posture (partition coalescing, skew splits, join
    re-planning). Shuffle-free plans are exempt: Spark only inserts
    AdaptiveSparkPlan when an exchange/subquery exists to adapt, and a
    single-stage map plan is itself the strongest scale shape (those
    queries are the pure-projection/sample lanes)."""
    missing = [
        n
        for n, p in plans.items()
        if audit_plan(p)["shuffles"] > 0 and "AdaptiveSparkPlan" not in p
    ]
    assert not missing, f"shuffling queries planning without AQE: {missing}"
