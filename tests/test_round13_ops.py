"""Planted-fixture tests for the round-13 changes.

Covers the frozen-weights serving twin (equality with the
train-and-serve probe at the freeze scale), the re-ingested-asset twin
leg of the perceptual near-dup gate, and the PPJoin filter/grouping
rewrite's planted shape (the hypothesis property test in
test_round13_properties / test_round12_properties carries the
completeness theorem; these pin concrete values).
"""

import pytest

from sap_sql_engine_spark.operators import classifier as cl
from sap_sql_engine_spark.operators import dedup
from sap_sql_engine_spark.operators import multimodal as mm


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_frozen_probe_matches_train_and_serve_at_freeze_scale(spark):
    """The frozen-weights probe must score the SAME query text to the
    SAME margin as the train-and-serve probe when run at the scale the
    weights were frozen from — the artifact IS that training run."""
    from sap_sql_engine_spark.operators.logreg_weights import (
        FROZEN_SF_DIR,
        FROZEN_W,
    )

    frozen = {
        r.probe_id: (r.z_micro, r.pred)
        for r in cl.q_classifier_query_frozen_probe(
            spark, FROZEN_SF_DIR
        ).collect()
    }
    trained = {
        r.probe_id: (r.z_micro, r.pred)
        for r in cl.q_classifier_query_text_probe(
            spark, FROZEN_SF_DIR
        ).collect()
    }
    # trained probe_id 2 is the SAME literal query text the frozen lane
    # scores as probe_id 1
    assert frozen[1] == trained[2]
    # and the frozen weights are the fit's exact integers
    w = cl._fit(
        __import__(
            "sap_sql_engine_spark.sources.loader", fromlist=["table"]
        ).table(spark, FROZEN_SF_DIR, "documents")
    )[1].collect()[0]
    assert (w.w0, w.w1, w.w2, w.w3) == FROZEN_W


def test_frozen_probe_is_corpus_free(spark, tmp_path):
    """The frozen probe must not scan the corpus: identical output for
    ANY sf_dir, including an empty directory with no parquet at all."""
    a = [tuple(r) for r in
         cl.q_classifier_query_frozen_probe(spark, str(tmp_path)).collect()]
    b = [tuple(r) for r in
         cl.q_classifier_query_frozen_probe(
             spark, "/root/testdata/sf0.001").collect()]
    assert a == b and len(a) == 2
    assert a[0][0] == 1 and a[1][0] == 2
    assert a[0][1:] != a[1][1:]  # the two probes score differently


def test_media_dhash_neardup_twin_surfaces_at_distance_zero(spark, tmp_path):
    """The re-ingested asset (first hashable doc under media_id -1) must
    pair with its original at hamming 0 even when the corpus itself has
    no perceptual near-dups."""
    base = "the quick brown fox jumps over the lazy dog " * 3  # >= 65 chars
    other = "completely different signal content with other words " * 3
    _write_docs(
        spark,
        tmp_path,
        [
            (10, base, "en", "s", len(base)),
            (20, other, "en", "s", len(other)),
        ],
    )
    got = {
        (r.media_id_a, r.media_id_b): r.hamming_dist
        for r in mm.q_media_dhash_neardup_pairs(spark, str(tmp_path)).collect()
    }
    assert got[(-1, 10)] == 0  # twin of doc 10 at distance 0
    assert all(a == -1 or d <= mm.DHASH_THRESHOLD for (a, _), d in got.items())


def test_prefix_filter_grouped_plan_planted(spark, tmp_path):
    """Planted duplicate-set structure: docs 1/2/3 share one token SET
    (order shuffled — token-level Jaccard 1000 where the shingle ladder
    breaks), doc 4 is disjoint. Expected pairs: exactly the three
    intra-group ones."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "alpha beta gamma delta", "en", "s", 22),
            (2, "delta gamma beta alpha", "en", "s", 22),
            (3, "beta alpha delta gamma", "en", "s", 22),
            (4, "epsilon zeta eta theta", "en", "s", 22),
        ],
    )
    got = {
        (r.doc1, r.doc2): (r.n1, r.n2, r.shared, r.jaccard_permille)
        for r in dedup.q_dedup_prefix_filter_pairs(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        (1, 2): (4, 4, 4, 1000),
        (1, 3): (4, 4, 4, 1000),
        (2, 3): (4, 4, 4, 1000),
    }


def test_lineitem_benford_digits_planted(spark, tmp_path):
    """prices 1.00/2.50/19.99/0.55 -> cents 100/250/1999/55 -> digits
    1,2,1,5; n=4: observed_permille 500/250/250, benford 301/176/79."""
    spark.createDataFrame(
        [(1, 1.00), (2, 2.50), (3, 19.99), (4, 0.55)],
        "l_orderkey long, l_extendedprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from sap_sql_engine_spark.operators import relational as rel

    got = [
        tuple(r)
        for r in rel.q_lineitem_benford_digits(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (1, 2, 4, 500, 301, 199),
        (2, 1, 4, 250, 176, 74),
        (5, 1, 4, 250, 79, 171),
    ]


def test_part_brand_price_anova_planted(spark, tmp_path):
    """brand A cents (100,200,300), brand B (400,500,600): ssb=135000,
    ssw=40000, F = (135000/1)*1000 // (40000/4) = 13500 milli."""
    spark.createDataFrame(
        [
            (1, "A", 1.00),
            (2, "A", 2.00),
            (3, "A", 3.00),
            (4, "B", 4.00),
            (5, "B", 5.00),
            (6, "B", 6.00),
        ],
        "p_partkey long, p_brand string, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    from sap_sql_engine_spark.operators import relational as rel

    got = [
        tuple(r)
        for r in rel.q_part_brand_price_anova(spark, str(tmp_path)).collect()
    ]
    assert got == [(2, 6, 135000, 40000, 13500)]


def test_customer_order_gap_histogram_planted(spark, tmp_path):
    """cust 1: gaps 3d (bucket 0) and 7d (bucket 1); cust 2: one order,
    no gap; cust 3: 400d gap -> capped bucket 52."""
    import datetime as dt

    d = dt.datetime(2024, 1, 1)

    def ts(days):
        return d + dt.timedelta(days=days)

    spark.createDataFrame(
        [
            (1, 1, ts(0)),
            (2, 1, ts(3)),
            (3, 1, ts(10)),
            (4, 2, ts(5)),
            (5, 3, ts(0)),
            (6, 3, ts(400)),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from sap_sql_engine_spark.operators import relational as rel

    got = [
        tuple(r)
        for r in rel.q_customer_order_gap_histogram(
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == [(0, 1, 1), (1, 1, 1), (52, 1, 1)]


def test_text_yule_k_planted(spark, tmp_path):
    """'a a a b': N=4, V=2, S2=10, K_milli=(10-4)*1e7//16=3750000."""
    _write_docs(spark, tmp_path, [(1, "a a a b", "en", "s", 7)])
    from sap_sql_engine_spark.operators import textanalysis as ta

    got = [
        tuple(r) for r in ta.q_text_yule_k(spark, str(tmp_path)).collect()
    ]
    assert got == [("s", 4, 2, 10, 3750000)]


def test_dedup_set_signature_report_planted(spark, tmp_path):
    """docs 1/2 share the token SET {a,b} (order+multiplicity differ),
    doc 3 unique: one size-2 group (1 intra pair), one size-1 group."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b b", "en", "s", 5),
            (2, "b a", "en", "s", 3),
            (3, "c d", "en", "s", 3),
        ],
    )
    got = [
        tuple(r)
        for r in dedup.q_dedup_set_signature_report(
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == [(1, 1, 1, 0), (2, 1, 2, 1)]


def test_source_unigram_tv_matrix_planted(spark, tmp_path):
    """srcA 'a a b' vs srcB 'a c': sum|p-q| = 1/6 + 1/3 + 1/2 = 1 ->
    tv = 500 permille, 1 shared type. srcC disjoint 'z z' -> tv=1000
    against both (the spine leg)."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a a b", "en", "srcA", 5),
            (2, "a c", "en", "srcB", 3),
            (3, "z z", "en", "srcC", 3),
        ],
    )
    from sap_sql_engine_spark.operators import textanalysis as ta

    got = {
        (r.source_a, r.source_b): (
            r.n_tokens_a, r.n_tokens_b, r.shared_types, r.tv_permille
        )
        for r in ta.q_source_unigram_tv_matrix(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("srcA", "srcB"): (3, 2, 1, 500),
        ("srcA", "srcC"): (3, 2, 0, 1000),
        ("srcB", "srcC"): (2, 2, 0, 1000),
    }


def test_kcore_profile_kernel_planted(spark):
    """Triangle 1-2-3 plus pendant 3-4 at k=2: round 1 peels node 4
    (degree 1), the triangle is the stable 2-core thereafter."""
    from sap_sql_engine_spark.cachereg import cache_eager
    from sap_sql_engine_spark.operators import graph as g

    edges = cache_eager(
        spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (3, 4)], "p1 long, p2 long"
        )
    )
    got = [tuple(r) for r in g.kcore_profile(edges, 2, 4).collect()]
    assert got == [
        (0, 4, 4),
        (1, 3, 3),
        (2, 3, 3),
        (3, 3, 3),
        (4, 3, 3),
    ]


def test_kcore_full_query_collapses_sparse_fixture(spark, tmp_path):
    """One 3-part basket: every co-purchase degree is 2 < KCORE_K=90, so
    round 1 peels everything and the zero rows are honest (the
    empty-edge-set global-aggregate path)."""
    from sap_sql_engine_spark.operators import graph as g

    spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12)], "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = [
        tuple(r)
        for r in g.q_copurchase_kcore_profile(spark, str(tmp_path)).collect()
    ]
    assert got == [(0, 3, 3)] + [(r, 0, 0) for r in range(1, 5)]


def test_gapped_triple_patterns_planted(spark, tmp_path):
    """user 1 session [a,b,a,c]: contained ordered triples are
    (a,b,a),(a,b,c),(a,a,c),(b,a,c); user 2 has TWO sessions each
    [a,b,c] (separated by > the session gap), so (a,b,c) totals 3."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as se

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = []
    for i, t in enumerate(["a", "b", "a", "c"]):
        rows.append((i, base + dt.timedelta(seconds=30 * i), 1, t, 1.0, "{}"))
    for s in range(2):
        for i, t in enumerate(["a", "b", "c"]):
            rows.append(
                (
                    100 + 10 * s + i,
                    base + dt.timedelta(hours=2 * s, seconds=30 * i),
                    2,
                    t,
                    1.0,
                    "{}",
                )
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.t1, r.t2, r.t3): r.n_sessions
        for r in se.q_events_gapped_triple_patterns(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        ("a", "b", "a"): 1,
        ("a", "b", "c"): 3,
        ("a", "a", "c"): 1,
        ("b", "a", "c"): 1,
    }
