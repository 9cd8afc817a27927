"""Planted-scenario tests for the round-6 operators: tiny hand-built
parquet fixtures where the right answer is computable by eye, pinning the
SEMANTICS (sole-blame logic, threshold algebra, tie handling, boilerplate
document-frequency cutoff) independently of the DuckDB oracle gate.
"""

import datetime as dt
import sys

sys.path.insert(0, "/root/repo")

from sap_sql_engine_spark.operators import relational, textanalysis


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def _std_dims(spark, tmp_path):
    _write(
        spark,
        tmp_path,
        "supplier",
        [(1, "S1", 0), (2, "S2", 0), (3, "S3", 0)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    _write(
        spark,
        tmp_path,
        "nation",
        [(0, "NATION_0", 0)],
        "n_nationkey long, n_name string, n_regionkey long",
    )


def test_suppliers_kept_waiting_sole_blame_semantics(spark, tmp_path):
    # order 10 (F): supp 1 returned, supps 2/3 clean -> supp 1 counted
    # order 20 (F): supps 1 AND 2 returned -> nobody sole-blame
    # order 30 (F): supp 1 returned but alone -> no other supplier, skip
    # order 40 (O): supp 1 returned, supp 2 clean -> not finalized, skip
    _std_dims(spark, tmp_path)
    _write(
        spark,
        tmp_path,
        "orders",
        [(10, "F"), (20, "F"), (30, "F"), (40, "O")],
        "o_orderkey long, o_orderstatus string",
    )
    _write(
        spark,
        tmp_path,
        "lineitem",
        [
            (10, 1, "R"), (10, 2, "N"), (10, 3, "N"),
            (20, 1, "R"), (20, 2, "R"),
            (30, 1, "R"),
            (40, 1, "R"), (40, 2, "N"),
        ],
        "l_orderkey long, l_suppkey long, l_returnflag string",
    )
    rows = relational.q_suppliers_kept_waiting(spark, str(tmp_path)).collect()
    assert [(r.s_name, r.numwait) for r in rows] == [("S1", 1)]


def test_promo_part_suppliers_threshold_algebra(spark, tmp_path):
    # part 1 matches the prefix; supp 1 ships 6 of it in-window vs 10
    # all-time (6*2 > 10: qualifies); supp 2 ships 4 in-window vs 10
    # (4*2 < 10: out). part 2 doesn't match the prefix at all.
    _std_dims(spark, tmp_path)
    _write(
        spark,
        tmp_path,
        "part",
        [(1, f"{relational.PP_PREFIX} bolt"), (2, "small widget")],
        "p_partkey long, p_name string",
    )
    inw = dt.datetime(relational.PP_YEAR, 6, 1)
    out = dt.datetime(relational.PP_YEAR - 1, 6, 1)
    _write(
        spark,
        tmp_path,
        "lineitem",
        [
            (1, 1, 6.0, inw), (1, 1, 4.0, out),
            (1, 2, 4.0, inw), (1, 2, 6.0, out),
            (2, 1, 100.0, inw),
        ],
        "l_partkey long, l_suppkey long, l_quantity double, l_shipdate timestamp",
    )
    rows = relational.q_promo_part_suppliers(spark, str(tmp_path)).collect()
    assert [(r.s_name, r.qualifying_parts, r.promo_qty) for r in rows] == [
        ("S1", 1, 6.0)
    ]


def test_top_supplier_revenue_ties_return_all(spark, tmp_path):
    # supps 1 and 2 hit the exact same DECIMAL revenue inside the window;
    # supp 3 is below. Q15 semantics: ties return all winners.
    _std_dims(spark, tmp_path)
    inw = dt.datetime(1998, 2, 1)
    out = dt.datetime(1997, 2, 1)
    _write(
        spark,
        tmp_path,
        "lineitem",
        [
            (1, 100.0, 0.0, inw),
            (2, 40.0, 0.0, inw), (2, 60.0, 0.0, inw),
            (3, 99.0, 0.0, inw),
            (3, 500.0, 0.0, out),
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    )
    rows = relational.q_top_supplier_revenue(spark, str(tmp_path)).collect()
    assert [(r.suppkey, r.total_revenue) for r in rows] == [
        (1, 100.0),
        (2, 100.0),
    ]


def test_cheapest_supplier_per_part_min_and_tiebreak(spark, tmp_path):
    # part 1: supp 2 cheaper (1.00/unit vs 2.00) -> supp 2 wins.
    # part 2: supps 1 and 2 identical unit price -> lower suppkey wins.
    _std_dims(spark, tmp_path)
    _write(
        spark,
        tmp_path,
        "part",
        [(1, "a", relational.CS_TYPE), (2, "b", relational.CS_TYPE)],
        "p_partkey long, p_name string, p_type string",
    )
    _write(
        spark,
        tmp_path,
        "lineitem",
        [
            (1, 1, 10.0, 20.0), (1, 2, 10.0, 10.0),
            (2, 1, 4.0, 12.0), (2, 2, 2.0, 6.0),
        ],
        "l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double",
    )
    rows = relational.q_cheapest_supplier_per_part(spark, str(tmp_path)).collect()
    got = [(r.partkey, r.s_name, r.unit_price_micro) for r in rows]
    assert got == [(1, "S2", 1_000_000), (2, "S1", 3_000_000)]


def test_small_quantity_revenue_cross_multiplied_compare(spark, tmp_path):
    # part 1: quantities 1, 1, 28 -> avg 10, cutoff 0.2*10 = 2; the two
    # qty-1 lines qualify (1*5*3 = 15 < 30), qty-28 doesn't.
    # Exactly-at-cutoff must NOT qualify (strict <): part 2 has
    # quantities 2, 2, 26 -> avg 10, qty 2: 2*5*3 = 30 == 30.
    _write(
        spark,
        tmp_path,
        "part",
        [(1, "BrandA"), (2, "BrandB")],
        "p_partkey long, p_brand string",
    )
    _write(
        spark,
        tmp_path,
        "lineitem",
        [
            (1, 1.0, 70.0), (1, 1.0, 70.0), (1, 28.0, 10.0),
            (2, 2.0, 50.0), (2, 2.0, 50.0), (2, 26.0, 10.0),
        ],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    rows = relational.q_small_quantity_revenue(spark, str(tmp_path)).collect()
    got = {r.p_brand: (r.n_small_lines, r.avg_yearly) for r in rows}
    assert got == {"BrandA": (2, 20.0)}  # (70+70)/7


def test_boilerplate_phrases_df_cutoff(spark, tmp_path):
    # 30 docs in one source; the phrase "aa bb cc" planted in 3 of them
    # (10% >= 5% cutoff -> boilerplate); every other 3-gram is unique to
    # its doc (df 1, 1*20 < 30 -> not boilerplate).
    docs = []
    for i in range(30):
        filler = f"u{i}x u{i}y u{i}z u{i}w"
        text = f"aa bb cc {filler}" if i < 3 else filler
        docs.append((i, text, "en", "srcA", len(text)))
    _write(
        spark,
        tmp_path,
        "documents",
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from sap_sql_engine_spark import cachereg

    try:
        rows = textanalysis.q_boilerplate_phrases(spark, str(tmp_path)).collect()
    finally:
        cachereg.release()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_docs == 30
    # planted phrase contributes 2 boilerplate grams ("aa bb cc" and
    # "bb cc u{i}x" has i-specific token -> only "aa bb cc" is shared;
    # "bb cc u0x" etc are unique). So exactly 1 boilerplate gram.
    assert r.n_boilerplate_grams == 1
    assert r.top_gram == "aa bb cc" and r.top_gram_df == 3
    assert r.boilerplate_doc_frac_bp == 1000  # 3/30 in bp


def test_label_centroid_sim_python_mirror(spark, tmp_path):
    # tiny planted embedding set mirrored by an exact pure-Python fold of
    # the same quantized recipe (floor(v*1e6) -> integral mean -> cosine)
    import math

    from sap_sql_engine_spark.operators import similarity

    vecs = {
        0: [[1.0, 0.0, 0.0, 0.25], [0.5, 0.1, 0.0, 0.25]],
        1: [[0.0, 1.0, 0.0, -0.5], [0.0, 0.8, 0.2, -0.5]],
        2: [[1.0, 0.1, 0.0, 0.0]],
    }
    dim = 4
    rows = []
    vid = 0
    for lab, vs in vecs.items():
        for v in vs:
            rows.append((vid, v + [0.0] * (similarity.DIM - dim), lab))
            vid += 1
    _write(
        spark,
        tmp_path,
        "embeddings",
        rows,
        "vec_id long, embedding array<float>, label int",
    )

    import numpy as np

    def centroid(vs):
        n = len(vs)
        comps = []
        for i in range(similarity.DIM):
            q = sum(
                math.floor(float(np.float32(v[i] if i < dim else 0.0)) * similarity.CC_Q)
                for v in vs
            )
            # Spark `div` truncates toward zero (Python // floors)
            comps.append((abs(q) // n) * (1 if q >= 0 else -1))
        return comps

    cents = {lab: centroid(vs) for lab, vs in vecs.items()}

    def cos_micro(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        n1 = sum(x * x for x in a)
        n2 = sum(y * y for y in b)
        return float(math.floor(dot * 1e6 / (math.sqrt(n1) * math.sqrt(n2))))

    expect = {
        (a, b): cos_micro(cents[a], cents[b])
        for a in cents
        for b in cents
        if a < b
    }
    got = {
        (r.label_a, r.label_b): r.cos_micro
        for r in similarity.q_embedding_label_centroid_sim(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == expect
    # sanity: label 2 is near label 0's direction, far from label 1
    assert got[(0, 2)] > got[(1, 2)]


def test_vocab_oov_report_planted_ranking(spark, tmp_path):
    # 12 distinct tokens with counts 12..1 (rank == alphabetical order
    # here); K=10 leaves t11 (2 occurrences) + t12 (1) OOV; K>=20 covers
    # everything. total = 78, so oov_bp(10) = 3*10000 div 78 = 384.
    docs = []
    did = 0
    for i in range(1, 13):
        for _ in range(13 - i):
            docs.append((did, f"t{i:02d}", "en", "srcA", 4))
            did += 1
    _write(
        spark,
        tmp_path,
        "documents",
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from sap_sql_engine_spark import cachereg

    try:
        rows = textanalysis.q_vocab_oov_report(spark, str(tmp_path)).collect()
    finally:
        cachereg.release()
    got = {r.k: (r.total_tokens, r.oov_tokens, r.oov_bp) for r in rows}
    assert got == {10: (78, 3, 384), 20: (78, 0, 0), 40: (78, 0, 0)}


def test_leakage_free_split_never_straddles(spark, sf_dir):
    # property over the real corpus: no jaccard near-dup pair may cross
    # the cluster-keyed split boundary (the defect split_leakage_report
    # measures for the naive per-doc split)
    from pyspark.sql import functions as F

    from sap_sql_engine_spark import cachereg
    from sap_sql_engine_spark.operators import dedup
    from sap_sql_engine_spark.sources.loader import table

    try:
        split = dedup.q_docs_leakage_free_split(spark, sf_dir)
        pairs = dedup.jaccard_pairs(
            table(spark, sf_dir, "documents")
        ).select("doc1", "doc2")
        s1 = split.select(
            F.col("doc_id").alias("doc1"), F.col("is_eval").alias("e1")
        )
        s2 = split.select(
            F.col("doc_id").alias("doc2"), F.col("is_eval").alias("e2")
        )
        cross = pairs.join(s1, "doc1").join(s2, "doc2").filter("e1 <> e2")
        assert cross.count() == 0
        # and the split is non-degenerate: both sides populated
        sides = {r.is_eval for r in split.select("is_eval").distinct().collect()}
        assert sides == {0, 1}
    finally:
        cachereg.release()


def test_leakage_free_split_planted_cluster(spark, tmp_path):
    # two identical docs (near-dup cluster) + singletons: the cluster
    # members MUST share a flag keyed on the min doc_id; singletons keep
    # the naive per-doc coin
    import hashlib

    from sap_sql_engine_spark import cachereg
    from sap_sql_engine_spark.operators import dedup

    dup = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [(1, dup, "en", "s", 1), (2, dup, "en", "s", 1)]
    for i in range(3, 9):
        docs.append((i, f"w{i}a w{i}b w{i}c w{i}d w{i}e", "en", "s", 1))
    _write(
        spark,
        tmp_path,
        "documents",
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def coin(key: int) -> int:
        h = hashlib.md5(f"split|{key}".encode()).hexdigest()[:8]
        return int(int(h, 16) % 100 < dedup.SPLIT_EVAL_PCT)

    try:
        rows = {
            r.doc_id: (r.cluster_id, r.is_eval)
            for r in dedup.q_docs_leakage_free_split(spark, str(tmp_path)).collect()
        }
    finally:
        cachereg.release()
    assert rows[1] == (1, coin(1)) and rows[2] == (1, coin(1))
    for i in range(3, 9):
        assert rows[i] == (i, coin(i))


def test_stream_stream_attribution_join_matches_batch(spark, sf_dir):
    # the watermarked stream-stream interval join must produce EXACTLY the
    # batch join's pair multiset (grouped to per-purchase counts)
    from sap_sql_engine_spark.streaming import events as ev

    batch = {
        (r.purchase_id, r.user_id): r.n_attr_clicks
        for r in ev.q_events_attribution_window(spark, sf_dir).collect()
    }
    q = ev.streaming_attribution_join(spark, sf_dir)
    try:
        q.processAllAvailable()
        pairs = spark.sql(
            "SELECT purchase_id, user_id, count(*) AS n FROM events_attr_stream "
            "GROUP BY 1, 2"
        ).collect()
    finally:
        q.stop()
    stream = {(r.purchase_id, r.user_id): r.n for r in pairs}
    assert stream == batch and len(batch) > 0


def test_quantile_histogram_invariants(spark, sf_dir):
    from sap_sql_engine_spark import cachereg
    from sap_sql_engine_spark.operators import search

    try:
        r = search.q_quantile_histogram_check(spark, sf_dir).collect()[0]
    finally:
        cachereg.release()
    assert r.shard_merge_mismatch == 0  # merge = vector add, any shard layout
    for p in search.QH_PCTS:
        est, ex = r[f"p{p}_est_hi_cents"], r[f"p{p}_exact_cents"]
        # histogram read-off is wrong by at most one bin width, on the
        # high side (est is the qualifying bin's exclusive upper bound)
        assert 0 <= est - ex <= search.QH_BIN_CENTS
