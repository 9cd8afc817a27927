"""Round-11 operator tests: out-of-corpus serving probes (the literal
query vector through the IVF index, the raw query string through the BM25
leg, and their RRF fusion) — the serving paths, as opposed to the
corpus-member probes that only EVALUATE the indexes."""

import pytest

from sap_sql_engine_spark.operators import search as sr
from sap_sql_engine_spark.operators import similarity as sim


def test_ooc_query_vector_is_genuinely_novel(spark, sf_dir):
    """The literal probe is NOT a corpus row, and its serving result is
    not any corpus-member probe's result: the top-K neighbor set differs
    from q_ann_ivf's for every gated corpus probe id (QUERY_VEC_ID and
    both recall probes). This is the difference between using an index
    and evaluating one — a corpus-member probe can only ever re-find
    what the index already contains."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    assert all(
        [float(x) for x in r.embedding] != sim.OOC_QUERY_VEC for r in emb
    )
    ooc = {r.vec_id for r in sim.q_ann_query_vector_topk(spark, sf_dir).collect()}
    assert len(ooc) == sim.TOPK
    for qid in (sim.QUERY_VEC_ID, *sim.ANN_RECALL_PROBES):
        member = {r.vec_id for r in sim.q_ann_ivf(spark, sf_dir, qid=qid).collect()}
        assert member != ooc, f"novel probe's neighbors equal probe {qid}'s"


def test_ooc_query_vector_components_are_exact_binary_fractions():
    """Cross-engine determinism precondition: every component is k/1024,
    so the decimal literal both engines parse is the exact double and no
    rounding can diverge between the Spark and DuckDB legs."""
    for v in sim.OOC_QUERY_VEC:
        assert v * 1024 == int(v * 1024)
        assert -1.0 <= v <= 1.0
    # and it is not the zero vector / not degenerate
    assert sum(abs(v) for v in sim.OOC_QUERY_VEC) > 1.0


def test_bm25_raw_query_planted_corpus(spark, tmp_path):
    """The raw string is tokenized ON-ENGINE with the corpus tokenizer:
    matched_terms counts exactly the query terms present in each doc,
    an out-of-vocabulary query term ('beats' here) matches nothing, a
    stopword-ish single-char term ('a') matches like any other token,
    and a doc sharing no term is absent."""
    rows = [
        (1, "fast hash join x", "en", "srcA", 16),
        (2, "slow sort merge merge y", "en", "srcA", 23),
        (3, "nothing here indeed", "en", "srcA", 19),
        (4, "a a a", "en", "srcA", 5),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r.doc_id: (r.matched_terms, r.bm25)
        for r in sr.q_bm25_raw_query(spark, str(tmp_path)).collect()
    }
    assert set(got) == {1, 2, 4}  # doc 3 shares no term -> absent
    assert got[1][0] == 3  # fast, hash, join
    assert got[2][0] == 3  # slow, sort, merge (merge tf=2, counted once)
    assert got[4][0] == 1  # the raw query's 'a'
    assert all(score > 0 for (_, score) in got.values())


def test_hybrid_query_search_fuses_the_two_serving_legs(spark, sf_dir):
    """The novel-query fusion differs from the corpus-member fusion (a
    different query must retrieve differently), and its rank columns are
    exactly the two serving legs' rank lists: every fused row's lex_rank
    matches the raw-BM25 top list and its sem_rank matches the literal-
    vector ANN list (0 = the absent-from-leg sentinel)."""
    fused = sr.q_hybrid_query_search(spark, sf_dir).collect()
    assert [r.hybrid_rank for r in fused] == list(range(1, sr.HYBRID_TOPN + 1))
    member = [r.doc_id for r in sr.q_hybrid_search_rrf(spark, sf_dir).collect()]
    assert [r.doc_id for r in fused] != member

    lex_rows = (
        sr.q_bm25_raw_query(spark, sf_dir)
        .orderBy("bm25", ascending=False)
        .collect()
    )
    lex_sorted = sorted(lex_rows, key=lambda r: (-r.bm25, r.doc_id))
    lex_rank = {r.doc_id: i + 1 for i, r in enumerate(lex_sorted[: sr.HYBRID_LEX_K])}
    sem_rows = sim.q_ann_query_vector_topk(spark, sf_dir).collect()
    sem_sorted = sorted(sem_rows, key=lambda r: (-r.cosine, r.vec_id))
    sem_rank = {r.vec_id: i + 1 for i, r in enumerate(sem_sorted)}
    for r in fused:
        assert r.lex_rank == lex_rank.get(r.doc_id, 0)
        assert r.sem_rank == sem_rank.get(r.doc_id, 0)
        assert r.lex_rank > 0 or r.sem_rank > 0  # came from at least one leg


def test_dedup_query_text_probe_planted(spark, tmp_path):
    """Both probe legs on a planted corpus: the resubmission probe
    (probe_id 1 = the lowest-doc_id text, re-signed from the string)
    band-matches its own corpus row at est_jaccard 1.0; the novel
    literal (probe_id 2, unrelated to every planted doc) matches
    nothing — exactly one result row."""
    from sap_sql_engine_spark.operators import dedup

    a = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely unrelated words about nothing shared at all here"
    rows = [
        (10, a, "en", "srcA", len(a)),
        (11, other, "en", "srcA", len(other)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = [
        (r.probe_id, r.corpus_doc, r.est_jaccard)
        for r in dedup.q_dedup_query_text_probe(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 10, 1.0)]


def test_dedup_query_text_is_genuinely_novel(spark, sf_dir):
    """The literal probe text is not a corpus row (the serving premise):
    the novel leg (probe_id 2) yields no banded match on the gate
    corpus, while the resubmission leg (probe_id 1) proves the match
    path by re-finding the lowest-doc_id document from its string at
    est_jaccard 1.0."""
    from pyspark.sql import functions as F

    from sap_sql_engine_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = {r.text for r in docs.collect()}
    assert dedup.DEDUP_QUERY_TEXT not in texts
    min_doc = docs.agg(F.min("doc_id")).first()[0]
    res = dedup.q_dedup_query_text_probe(spark, sf_dir).collect()
    assert [r for r in res if r.probe_id == 2] == []
    assert (min_doc, 1.0) in {
        (r.corpus_doc, r.est_jaccard) for r in res if r.probe_id == 1
    }


def test_dedup_band_occupancy_planted(spark, tmp_path):
    """Three identical docs collapse into one size-3 bucket per band
    (candidate_pairs = 3 = 3*2/2), the distinct doc sits alone — the
    occupancy report prices the candidate join exactly."""
    from sap_sql_engine_spark.operators import dedup

    twin = "the quick brown fox jumps over the lazy dog again and again"
    other = "entirely different content with no shared shingles anywhere listed"
    rows = [(i, twin, "en", "srcA", len(twin)) for i in range(3)]
    rows.append((9, other, "en", "srcA", len(other)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r.band: (r.n_buckets, r.max_bucket_size, r.candidate_pairs)
        for r in dedup.q_dedup_band_occupancy(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    for band, (n_buckets, max_size, pairs) in got.items():
        assert n_buckets == 2
        assert max_size == 3
        assert pairs == 3  # sum s*(s-1)/2 = 3 + 0


def test_customer_rfm_migration_planted(spark, tmp_path):
    """Hand-checked 4-customer matrix: one churned (0 after), one new
    (0 before), one low-low, one top-top."""
    from sap_sql_engine_spark.operators import relational

    split = relational.RFM_MIGRATION_SPLIT
    rows = [
        (1, 1, "O", 100.0, "1994-01-01", "3-MEDIUM"),   # before only
        (2, 2, "O", 80.0, "1996-01-01", "3-MEDIUM"),    # after only
        (3, 3, "O", 50.0, "1994-02-01", "3-MEDIUM"),    # both, low
        (4, 3, "O", 60.0, "1996-02-01", "3-MEDIUM"),
        (5, 4, "O", 200.0, "1994-03-01", "3-MEDIUM"),   # both, top
        (6, 4, "O", 300.0, "1996-03-01", "3-MEDIUM"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS DATE) AS o_orderdate", "o_orderpriority",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        (r.m_before, r.m_after): r.n_customers
        for r in relational.q_customer_rfm_migration(spark, str(tmp_path)).collect()
    }
    # before ranks (asc spend 50,100,200 -> q 1,2,3); after (60,80,300 -> 1,2,3)
    assert got == {(2, 0): 1, (0, 2): 1, (1, 1): 1, (3, 3): 1}


def test_events_user_lifecycle_accounting_identity(spark, sf_dir):
    """Every user is new exactly once and churned exactly once; actives
    bound both; the first active week's actives are all new."""
    from sap_sql_engine_spark.streaming import events as se

    rows = se.q_events_user_lifecycle(spark, sf_dir).collect()
    total_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_new for r in rows) == total_users
    assert sum(r.n_churned for r in rows) == total_users
    assert all(r.n_active >= max(r.n_new, r.n_churned) for r in rows)
    assert rows[0].n_active == rows[0].n_new  # week 1: everyone is new


def test_events_dau_wau_stickiness_bounds(spark, sf_dir):
    """DAU <= WAU per week, so stickiness lands in (0, 10000]; the
    milli-average reconciles with the bound."""
    from sap_sql_engine_spark.streaming import events as se

    rows = se.q_events_dau_wau_stickiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.stickiness_bp <= 10000
        assert r.avg_dau_milli <= r.wau * 1000
        assert 1 <= r.active_days <= 7


def test_priority_ship_latency_monotone_tail(spark, sf_dir):
    from sap_sql_engine_spark.operators import relational

    rows = relational.q_priority_ship_latency(spark, sf_dir).collect()
    li_count = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r.n_lines for r in rows) == li_count
    for r in rows:
        assert r.p50_days <= r.p90_days <= r.p99_days


def test_order_line_count_histogram_reconciles(spark, sf_dir):
    from sap_sql_engine_spark.operators import relational

    rows = relational.q_order_line_count_histogram(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert sum(r.n_lines * r.n_orders for r in rows) == li.count()
    assert sum(r.n_orders for r in rows) == li.select("l_orderkey").distinct().count()
    assert sum(r.share_bp for r in rows) <= 10000  # floor division


def test_brand_return_rates_bounds(spark, sf_dir):
    from sap_sql_engine_spark.operators import relational

    rows = relational.q_brand_return_rates(spark, sf_dir).collect()
    li_count = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r.n_lines for r in rows) == li_count
    for r in rows:
        assert 0 <= r.n_returned <= r.n_lines
        assert 0 <= r.return_bp <= 10000


def test_docs_charclass_profile_planted(spark, tmp_path):
    """Hand-checked permille split: 'ab 12!' = 2 letters, 2 digits,
    1 space, 1 other over 6 chars."""
    from sap_sql_engine_spark.operators import textanalysis as ta

    rows = [(1, "ab 12!", "en", "srcA", 6)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = ta.q_docs_charclass_profile(spark, str(tmp_path)).collect()[0]
    assert (r.source, r.n_chars) == ("srcA", 6)
    assert (r.letters_pm, r.digits_pm, r.space_pm, r.other_pm) == (
        333, 333, 166, 166
    )


def test_embedding_quantization_sweep_error_monotone(spark, sf_dir):
    """More bits, strictly less error; every setting sees every value."""
    from sap_sql_engine_spark.operators import similarity as sim2

    rows = sim2.q_embedding_quantization_sweep(spark, sf_dir).collect()
    assert [r.bits for r in rows] == [4, 6, 8]
    assert len({r.n_vals for r in rows}) == 1
    assert rows[0].sse_e12 > rows[1].sse_e12 > rows[2].sse_e12 > 0


def test_docs_prefix_dup_clusters_planted(spark, tmp_path):
    """Exact dups share prefix AND full hash (n_distinct 1); boilerplate
    headers share only the prefix (n_distinct = cluster size); unique
    openers never appear."""
    from sap_sql_engine_spark.operators import dedup

    head = "x" * dedup.PREFIX_DUP_LEN
    rows = [
        (1, head + " tail one", "en", "srcA", 40),
        (2, head + " tail two", "en", "srcA", 40),
        (3, "y" * dedup.PREFIX_DUP_LEN + " same", "en", "srcA", 40),
        (4, "y" * dedup.PREFIX_DUP_LEN + " same", "en", "srcA", 40),
        (5, "unique opener here that is long enough", "en", "srcA", 39),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        (r.cluster_size, r.n_distinct_texts)
        for r in dedup.q_docs_prefix_dup_clusters(spark, str(tmp_path)).collect()
    )
    assert got == [(2, 1), (2, 2)]  # exact-dup pair and prefix-only pair


def test_reorder_interval_percentiles_planted(spark, tmp_path):
    """Hand-checked gaps: one customer ordering on days 0/10/30 yields
    gaps (10, 20); a single-order customer contributes nothing."""
    from sap_sql_engine_spark.operators import relational

    rows = [
        (1, 1, "O", 10.0, "1994-01-01", "3-MEDIUM"),
        (2, 1, "O", 10.0, "1994-01-11", "3-MEDIUM"),
        (3, 1, "O", 10.0, "1994-01-31", "3-MEDIUM"),
        (4, 2, "O", 10.0, "1994-06-01", "3-MEDIUM"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS DATE) AS o_orderdate", "o_orderpriority",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = relational.q_reorder_interval_percentiles(spark, str(tmp_path)).collect()[0]
    assert (r.n_repeat_customers, r.n_gaps) == (1, 2)
    assert (r.p50_days, r.p90_days, r.p99_days) == (15.0, 19.0, 19.9)


def test_docs_sample_inspection_pack_planted(spark, tmp_path):
    """Every hygiene class yields its md5-smallest picks; a class with
    more docs than INSPECTION_PER_CLASS is cut to exactly K, and the
    two-phase (salted) top-K equals the direct python ranking."""
    import hashlib

    from sap_sql_engine_spark.operators import textanalysis as ta

    clean = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "", "en", "srcA", 0),                  # empty
        (2, "   ", "en", "srcA", 3),               # whitespace_only
        (3, "word", "en", "srcA", 4),              # single_token
        (4, "a b c", "en", "srcA", 5),             # short
        (5, "1 2 3 4 5 6 7 8 9 0 1 2", "en", "srcA", 23),  # low_alpha
    ] + [(10 + i, clean, "en", "srcA", len(clean)) for i in range(8)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {}
    for r in ta.q_docs_sample_inspection_pack(spark, str(tmp_path)).collect():
        got.setdefault(r.hygiene_class, []).append((r.pick, r.doc_id))
    assert set(got) == {
        "empty", "whitespace_only", "single_token", "short", "low_alpha",
        "clean",
    }
    for cls in ("empty", "whitespace_only", "single_token", "short", "low_alpha"):
        assert len(got[cls]) == 1
    assert len(got["clean"]) == ta.INSPECTION_PER_CLASS
    want_clean = sorted(
        range(10, 18), key=lambda d: hashlib.md5(str(d).encode()).hexdigest()
    )[: ta.INSPECTION_PER_CLASS]
    assert [d for (_, d) in sorted(got["clean"])] == want_clean


def test_logreg_cv_report_planted_separable(spark):
    """On the linearly separable corpus every fold's model learns the
    signal from the other folds: all folds at 10000 bp, spread 0, and
    the folds partition the corpus exactly."""
    from sap_sql_engine_spark.operators import classifier

    rows = []
    for i in range(42):
        if i % 2 == 0:
            rows.append((i, "the of to in is it and a", "en"))
        else:
            rows.append((i, "xxq yyq zzq wwq vvq uuq ttq ssq", "de"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = classifier.logreg_cv_report(docs).collect()
    assert [r.fold for r in out] == [0, 1, 2]
    assert sum(r.n_eval for r in out) == 42
    for r in out:
        assert r.fold_acc_bp == 10000
        assert r.mean_acc_bp == 10000
        assert r.spread_bp == 0


def test_dedup_band_width_sweep_monotone(spark, sf_dir):
    """Wider bands are strictly stricter: candidate pairs shrink (or at
    worst hold) as rows-per-band doubles, bucket counts grow with band
    splits, and the 4-rows-per-band row reconciles exactly with the
    single-geometry occupancy report."""
    from sap_sql_engine_spark.operators import dedup

    rows = {r.rows_per_band: r for r in
            dedup.q_dedup_band_width_sweep(spark, sf_dir).collect()}
    assert set(rows) == {2, 4, 8}
    assert rows[2].n_bands == 8 and rows[4].n_bands == 4 and rows[8].n_bands == 2
    assert (
        rows[2].candidate_pairs
        >= rows[4].candidate_pairs
        >= rows[8].candidate_pairs
    )
    occ = dedup.q_dedup_band_occupancy(spark, sf_dir).collect()
    assert rows[4].candidate_pairs == sum(r.candidate_pairs for r in occ)
    assert rows[4].n_buckets == sum(r.n_buckets for r in occ)


def test_customer_spend_trend_planted(spark, tmp_path):
    """Hand-checked slope: 100/200/300 over consecutive months is
    exactly 10000 cents/month (1e7 milli-cents); a flat customer slopes
    0; 1-2-order and single-month customers are excluded."""
    from sap_sql_engine_spark.operators import relational

    rows = [
        (1, 1, "O", 100.0, "1994-01-15", "3-MEDIUM"),
        (2, 1, "O", 200.0, "1994-02-15", "3-MEDIUM"),
        (3, 1, "O", 300.0, "1994-03-15", "3-MEDIUM"),
        (4, 2, "O", 50.0, "1994-01-01", "3-MEDIUM"),
        (5, 2, "O", 50.0, "1994-02-01", "3-MEDIUM"),
        (6, 2, "O", 50.0, "1994-03-01", "3-MEDIUM"),
        (7, 3, "O", 10.0, "1994-01-01", "3-MEDIUM"),  # only 1 order
        (8, 4, "O", 10.0, "1994-01-01", "3-MEDIUM"),  # same-month pair
        (9, 4, "O", 20.0, "1994-01-02", "3-MEDIUM"),
        (10, 4, "O", 30.0, "1994-01-03", "3-MEDIUM"),  # den = 0
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS DATE) AS o_orderdate", "o_orderpriority",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = [
        (r.o_custkey, r.n_orders, r.slope_milli_cents)
        for r in relational.q_customer_spend_trend(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 3, 10_000_000), (2, 3, 0)]


def test_events_hourly_autocorrelation_planted(spark, tmp_path):
    """A perfectly alternating hourly load (1, 2, 1, 2, ...) has
    autocorrelation -1 at lag 1 (odd) and +1 at lags 24 and 168
    (even)."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as se

    rows = []
    eid = 0
    base = dt.datetime(2024, 3, 1)
    for h in range(200):
        for k in range((h % 2) + 1):
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=k), 7, "click",
                 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.lag_hours: (r.n_pairs, r.autocorr)
        for r in se.q_events_hourly_autocorrelation(spark, str(tmp_path)).collect()
    }
    assert got[1] == (199, -1.0)
    assert got[24] == (176, 1.0)
    assert got[168] == (32, 1.0)


def test_dimension_profile_queries_reconcile(spark, sf_dir):
    """The four dimension/value profiles reconcile with their base
    tables and keep their internal orderings (min <= mean <= max,
    monotone percentiles, extremes ordered)."""
    from sap_sql_engine_spark.operators import relational
    from sap_sql_engine_spark.streaming import events as se

    seg = relational.q_customer_acctbal_by_segment(spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r.n_customers for r in seg) == n_cust
    for r in seg:
        assert 0 <= r.negative_bp <= 10000
        assert r.min_cents <= r.mean_cents <= r.max_cents

    ext = relational.q_supplier_acctbal_extremes(spark, sf_dir).collect()
    n_sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").count()
    assert sum(r.n_suppliers for r in ext) == n_sup
    for r in ext:
        assert r.richest_cents >= r.poorest_cents
        assert r.spread_cents == r.richest_cents - r.poorest_cents

    curve = relational.q_part_price_size_curve(spark, sf_dir).collect()
    n_parts = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    assert sum(r.n_parts for r in curve) == n_parts
    for r in curve:
        assert r.min_cents <= r.mean_cents <= r.max_cents

    vp = se.q_events_value_percentiles(spark, sf_dir).collect()
    n_ev = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_events for r in vp) == n_ev
    for r in vp:
        assert r.p50_cents <= r.p90_cents <= r.p99_cents


def test_partkey_skew_report_identities(spark, sf_dir):
    """The skew profile reconciles with the fact table: keys x mean =
    rows (floor), the heaviest key really has max_cnt rows, and the
    synthetic uniform corpus shows a modest ratio."""
    from sap_sql_engine_spark.operators import skew
    from pyspark.sql import functions as F

    r = skew.q_partkey_skew_report(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert r.n_rows == li.count()
    assert r.n_keys == li.select("l_partkey").distinct().count()
    actual_max = (
        li.groupBy("l_partkey").count().agg(F.max("count")).first()[0]
    )
    assert r.max_cnt == actual_max
    heavy_cnt = li.filter(F.col("l_partkey") == r.heaviest_key).count()
    assert heavy_cnt == r.max_cnt
    assert r.skew_ratio_milli >= 1000  # max >= mean always


def test_dup_rate_by_quality_decile_partitions_corpus(spark, sf_dir):
    """Deciles partition the corpus; dup membership never exceeds the
    decile size; total membership equals the distinct doc set of the
    gated MinHash pair relation."""
    from sap_sql_engine_spark.operators import dedup

    rows = dedup.q_dup_rate_by_quality_decile(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert [r.decile for r in rows] == sorted(r.decile for r in rows)
    for r in rows:
        assert 0 <= r.n_dup <= r.n_docs
        assert 0 <= r.dup_bp <= 10000
    pairs = dedup.q_dedup_minhash_lsh(spark, sf_dir).collect()
    members = {p.doc1 for p in pairs} | {p.doc2 for p in pairs}
    assert sum(r.n_dup for r in rows) == len(members)


def test_embedding_separation_report_planted(spark, tmp_path):
    """Two tight, well-separated planted clusters: within-mean ~0 (all
    members at the centroid), nearest label is the other one both ways,
    and separation is enormous. A third spread-out label has nonzero
    within-mean."""
    import pyspark.sql.types as T

    from sap_sql_engine_spark.operators import similarity as sim2

    def vec(base, jitter=0.0):
        return [float(base + (jitter if i == 0 else 0.0)) for i in range(sim2.DIM)]

    rows = (
        [(i, vec(0.0), "a") for i in range(4)]
        + [(10 + i, vec(1.0), "b") for i in range(4)]
        + [(20, vec(5.0, -0.5), "c"), (21, vec(5.0, 0.5), "c")]
    )
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.StringType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    got = {
        r.label: r
        for r in sim2.q_embedding_separation_report(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"a", "b", "c"}
    assert got["a"].within_mean_micro == 0
    assert got["a"].nearest_label == "b"
    assert got["b"].nearest_label == "a"
    # |a-b| centroid distance = 1 in every dim -> sqrt(64) = 8
    assert got["a"].between_min_micro == 8_000_000
    assert got["c"].within_mean_micro == 500_000  # each member 0.5 off dim 0


def test_rollup_incremental_merge_planted(spark, tmp_path):
    """Hand-built IVM reconcile: a base-only day, a day SPLIT by the
    mid-day IVM_CUT (so the merge folds overlapping keys, not just
    disjoint unions), and a delta-only day — merged == full exactly,
    mismatch_days 0, and the day-coverage columns land as computed."""
    from sap_sql_engine_spark.streaming import events as se

    rows = [
        # click: base-only day (Jan 17)
        (0, "2024-01-17 10:00:00", 1, "click", 1.00, "{}"),
        (1, "2024-01-17 11:00:00", 2, "click", 2.00, "{}"),
        # click: Jan 21 split by the 12:00 cut -> in base AND delta
        (2, "2024-01-21 10:00:00", 3, "click", 3.00, "{}"),
        (3, "2024-01-21 13:00:00", 4, "click", 4.00, "{}"),
        # click: delta-only day (Jan 22)
        (4, "2024-01-22 09:00:00", 5, "click", 5.00, "{}"),
        # view: delta-only day
        (5, "2024-01-21 14:00:00", 6, "view", 1.50, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_type: r
        for r in se.q_rollup_incremental_merge(spark, str(tmp_path)).collect()
    }
    click = got["click"]
    assert (
        click.n_days, click.days_base_only, click.days_delta_only,
        click.days_both,
    ) == (3, 1, 1, 1)
    assert (click.events_merged, click.events_full) == (5, 5)
    assert (click.cents_merged, click.cents_full) == (1500, 1500)
    assert click.mismatch_days == 0
    view = got["view"]
    assert (
        view.n_days, view.days_base_only, view.days_delta_only,
        view.days_both, view.events_merged, view.cents_merged,
        view.mismatch_days,
    ) == (1, 0, 1, 0, 1, 150, 0)


def test_events_cusum_changepoint_planted(spark, tmp_path):
    """A clean level shift (2 events/day for 10 days, then 5/day for
    10 days) peaks |CUSUM| exactly at the last pre-shift day: global
    mean 3.5/day, cusum day 10 = 20*1000 - 10*3500 = -15000, and the
    pre/post means recover the two planted levels exactly."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as se

    rows = []
    eid = 0
    base = dt.datetime(2024, 3, 1, 6, 0, 0)
    for day in range(20):
        for k in range(2 if day < 10 else 5):
            rows.append(
                (eid, base + dt.timedelta(days=day, minutes=k), 7,
                 "click", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    row = se.q_events_cusum_changepoint(spark, str(tmp_path)).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_days == 20
    assert r.ref_milli == 3500
    assert r.changepoint_day == "2024-03-10"
    assert r.max_abs_cusum_milli == 15000
    assert r.pre_mean_milli == 2000
    assert r.post_mean_milli == 5000


def test_orders_ship_survival_planted(spark, tmp_path):
    """Hand-computed survival grid: latencies 5/40/100 days give
    666/666/333/333/0 permille at the 7/30/60/90/120 marks (integer
    DIV), and a single d=8 line survives only the 7-day mark."""
    from sap_sql_engine_spark.operators import relational

    orders = [
        (1, "1-URGENT", "2024-01-01"),
        (2, "2-HIGH", "2024-02-01"),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderpriority string, o_orderdate string"
    ).selectExpr(
        "o_orderkey", "o_orderpriority",
        "CAST(o_orderdate AS DATE) AS o_orderdate",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    lines = [
        (1, "2024-01-06"),   # d = 5
        (1, "2024-02-10"),   # d = 40
        (1, "2024-04-10"),   # d = 100
        (2, "2024-02-09"),   # d = 8
    ]
    spark.createDataFrame(
        lines, "l_orderkey long, l_shipdate string"
    ).selectExpr(
        "l_orderkey", "CAST(l_shipdate AS DATE) AS l_shipdate"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r.o_orderpriority: r
        for r in relational.q_orders_ship_survival(spark, str(tmp_path)).collect()
    }
    u = got["1-URGENT"]
    assert (u.n_lines, u.max_days) == (3, 100)
    assert (
        u.surv7_permille, u.surv30_permille, u.surv60_permille,
        u.surv90_permille, u.surv120_permille,
    ) == (666, 666, 333, 333, 0)
    h = got["2-HIGH"]
    assert (h.n_lines, h.max_days) == (1, 8)
    assert (h.surv7_permille, h.surv30_permille) == (1000, 0)


def test_orders_ship_survival_monotone(spark, sf_dir):
    """On the real corpus the survival curve is non-increasing across
    the day grid and bounded by [0, 1000] permille."""
    from sap_sql_engine_spark.operators import relational

    for r in relational.q_orders_ship_survival(spark, sf_dir).collect():
        curve = [
            r.surv7_permille, r.surv30_permille, r.surv60_permille,
            r.surv90_permille, r.surv120_permille,
        ]
        assert all(1000 >= a >= b >= 0 for a, b in zip(curve, curve[1:]))


def test_streaming_ivm_daily_rollup_matches_batch(spark, tmp_path):
    """The update-mode IVM twin: (a) converges to the batch daily rollup
    over all dropped rows, (b) rewrites ONLY the partitions whose keys
    changed in the batch (untouched day/type partitions keep their file
    mtimes — the surgical-merge property that makes the shape viable at
    100 TB), and (c) absorbs a crash-replayed epoch without drifting
    (checkpointed state re-emits the same running totals; re-overwriting
    a partition with identical rows is idempotent)."""
    import datetime as dt
    import glob as g
    import os

    from pyspark.sql import functions as F

    from sap_sql_engine_spark.streaming import events as ev

    drop_dir = str(tmp_path / "drops")
    out_dir = str(tmp_path / "ivm")

    def drop(rows):
        spark.createDataFrame(
            [
                (u, et, dt.datetime(2024, 3, d, h), float(v))
                for (u, et, d, h, v) in rows
            ],
            "user_id long, event_type string, ts timestamp, value double",
        ).write.mode("append").json(drop_dir)

    d1 = [
        (1, "click", 1, 10, 1.00), (2, "click", 1, 11, 2.00),
        (3, "view", 2, 9, 5.25),
    ]
    # second delta touches day 2 (existing key view + new key click)
    # and a brand-new day 3 — day 1's partitions must NOT rewrite
    d2 = [
        (4, "view", 2, 15, 0.75), (5, "click", 2, 16, 3.00),
        (6, "click", 3, 8, 10.00),
    ]
    d3 = [(7, "view", 3, 12, 1.00)]

    drop(d1)
    q = ev.streaming_ivm_daily_rollup(spark, drop_dir, out_dir)
    try:
        q.processAllAvailable()
        day1_files = {
            p: os.path.getmtime(p)
            for p in g.glob(os.path.join(out_dir, "day=2024-03-01", "**", "*.parquet"),
                            recursive=True)
        }
        assert day1_files
        drop(d2)
        q.processAllAvailable()
    finally:
        q.stop()
    # surgical merge: day 1 partition files untouched by the day-2/3 batch
    for p, mtime in day1_files.items():
        assert os.path.getmtime(p) == mtime, f"partition rewritten: {p}"

    # crash-replay: delete the last commit marker so the epoch replays
    ckpt = out_dir + "_ckpt"
    last = max(
        int(f) for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    )
    for marker in (str(last), f".{last}.crc"):
        path = os.path.join(ckpt, "commits", marker)
        if os.path.exists(path):
            os.remove(path)
    drop(d3)
    q = ev.streaming_ivm_daily_rollup(spark, drop_dir, out_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.day, r.event_type): (r.n_events, r.cents)
        # partition-column type inference reads day= back as DATE;
        # normalize to the ISO string the sink was keyed with
        for r in spark.read.parquet(out_dir)
        .selectExpr("CAST(day AS STRING) AS day", "event_type",
                    "n_events", "cents")
        .collect()
    }
    allrows = d1 + d2 + d3
    batch = spark.createDataFrame(
        [
            (u, et, dt.datetime(2024, 3, d, h), float(v))
            for (u, et, d, h, v) in allrows
        ],
        "user_id long, event_type string, ts timestamp, value double",
    )
    want = {
        (r.day, r.event_type): (r.n_events, r.cents)
        for r in batch.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            ).cast("bigint").alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_ann_filtered_query_topk_strategies(spark, sf_dir):
    """The prefilter leg IS the filtered exact truth (pinned against a
    Python recompute with the same rounding and tie-break), the
    postfilter leg only ever emits label-matching rows drawn from the
    probed cells, agrees with the truth on every id it does return, and
    never ranks ids in a different relative cosine order."""
    rows = sim.q_ann_filtered_query_topk(spark, sf_dir).collect()
    pre = [r for r in rows if r.strategy == "prefilter_exact"]
    post = [r for r in rows if r.strategy == "postfilter_ivf"]
    assert [r.rank for r in pre] == list(range(1, len(pre) + 1))
    assert [r.rank for r in post] == list(range(1, len(post) + 1))
    assert all(r.label == sim.FILT_LABEL for r in rows)
    assert len(post) <= sim.TOPK

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    qv = sim.OOC_QUERY_VEC

    def cos(v):
        dot = sum(float(x) * y for x, y in zip(v, qv))
        na = sum(float(x) * float(x) for x in v) ** 0.5
        nb = sum(y * y for y in qv) ** 0.5
        return round(dot / (na * nb), 6)

    truth = sorted(
        ((cos(r.embedding), r.vec_id) for r in emb if r.label == sim.FILT_LABEL),
        key=lambda t: (-t[0], t[1]),
    )[: sim.TOPK]
    assert [(r.vec_id, r.cosine) for r in pre] == [
        (vid, c) for (c, vid) in truth
    ]
    # every postfilter hit agrees with the exact cosine, and the
    # postfilter ranking is a cosine-consistent subsequence
    true_cos = {vid: c for (c, vid) in truth}
    all_cos = {r.vec_id: cos(r.embedding) for r in emb}
    for r in post:
        assert r.cosine == all_cos[r.vec_id]
    assert [
        (-r.cosine, r.vec_id) for r in post
    ] == sorted((-r.cosine, r.vec_id) for r in post)


def test_pq_code_balance_planted(spark, tmp_path):
    """Vectors planted ON codebook centroids encode with distance 0 to
    known codes: two copies of every subspace's row-0 centroid and one
    of row 1 give loads {code0: 2, code1: 1} in every subspace —
    codes_used 2, top_code 0, skew 2*16*1000 DIV 3 = 10666."""
    v_row0 = [w for book in sim.CODEBOOKS for w in book[0]]
    v_row1 = [w for book in sim.CODEBOOKS for w in book[1]]
    rows = [(1, v_row0, 0), (2, v_row0, 0), (3, v_row1, 1)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    got = sim.q_pq_code_balance(spark, str(tmp_path)).collect()
    assert len(got) == sim.PQ_M
    for r in got:
        assert (
            r.codes_used, r.n_vecs, r.min_load, r.max_load, r.top_code,
            r.skew_vs_uniform_milli,
        ) == (2, 3, 1, 2, 0, 10666)


def test_pq_code_balance_identities(spark, sf_dir):
    """Corpus invariants: one row per subspace, every row accounts for
    every vector, codes_used <= PQ_K, and the skew ratio is >= 1000
    (max load can never undercut the uniform load)."""
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = sim.q_pq_code_balance(spark, sf_dir).collect()
    assert [r.subspace for r in rows] == list(range(sim.PQ_M))
    for r in rows:
        assert r.n_vecs == n
        assert 1 <= r.codes_used <= sim.PQ_K
        assert r.min_load <= r.max_load
        assert 0 <= r.top_code < sim.PQ_K
        assert r.skew_vs_uniform_milli >= 1000


def test_events_ab_lift_report_planted(spark, tmp_path):
    """Hand-computed two-proportion readout: arm A (even user_ids)
    converts 2/2, arm B 0/2 — one B user's purchase PRECEDES its first
    click (ordering matters), a purchase-only user is never exposed.
    z^2 = (2*2-0*2)^2 * 4 * 1000 / (2*2*2*(4-2)) = 4000 milli (z = 2)."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as se

    t = lambda h: dt.datetime(2024, 3, 1, h)
    rows = [
        # arm A converters
        (0, t(1), 2, "click", 1.0, "{}"), (1, t(2), 2, "purchase", 9.0, "{}"),
        (2, t(1), 4, "click", 1.0, "{}"), (3, t(3), 4, "purchase", 9.0, "{}"),
        # arm B: purchase BEFORE the first click -> not a conversion
        (4, t(2), 1, "click", 1.0, "{}"), (5, t(1), 1, "purchase", 9.0, "{}"),
        # arm B: click only
        (6, t(1), 3, "click", 1.0, "{}"),
        # never clicked -> not exposed, excluded from both arms
        (7, t(1), 6, "purchase", 9.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = se.q_events_ab_lift_report(spark, str(tmp_path)).collect()[0]
    assert (r.exposed_a, r.converted_a, r.exposed_b, r.converted_b) == (2, 2, 2, 0)
    assert (r.conv_a_permille, r.conv_b_permille, r.lift_permille) == (1000, 0, 1000)
    assert r.z2_milli == 4000


def test_events_holt_forecast_planted(spark, tmp_path):
    """Hand-run recurrence: daily counts [10, 12, 20] -> init l=12 b=2;
    step: pred 14, err 6 (sse 36), l'=17, b'=3.5 -> report 17000/3500/
    20500/36000 milli. A perfectly linear series in a second fixture
    tracks with zero error."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as se

    def write(counts, path):
        rows = []
        eid = 0
        for d, c in enumerate(counts):
            for k in range(c):
                rows.append(
                    (eid, dt.datetime(2024, 3, 1 + d, 6, k), 1, "click",
                     1.0, "{}")
                )
                eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(str(path / "events.parquet"))

    write([10, 12, 20], tmp_path)
    r = se.q_events_holt_forecast(spark, str(tmp_path)).collect()[0]
    assert (
        r.n_days, r.level_milli, r.trend_milli, r.forecast_next_milli,
        r.sse_milli,
    ) == (3, 17000, 3500, 20500, 36000)

    lin = tmp_path / "lin"
    lin.mkdir()
    write([10, 12, 14, 16], lin)
    r = se.q_events_holt_forecast(spark, str(lin)).collect()[0]
    assert (
        r.n_days, r.level_milli, r.trend_milli, r.forecast_next_milli,
        r.sse_milli,
    ) == (4, 16000, 2000, 18000, 0)


def test_ann_query_vector_batch_matches_single_and_diverges(spark, sf_dir):
    """Query 0 of the batch IS the single-query literal (same md5
    stream), so the shared-scan batch plan must reproduce
    q_ann_query_vector_topk's list exactly; the other two queries are
    distinct streams and must retrieve differently (otherwise the batch
    proves nothing). Allowlist hygiene: every batch vector stays on the
    exact k/1024 binary-fraction grid."""
    batch = sim.q_ann_query_vector_batch_topk(spark, sf_dir).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r.query_no, []).append((r.rank, r.vec_id, r.cosine))
    assert set(by_q) == set(range(sim.OOC_BATCH))
    single = [
        (i + 1, r.vec_id, r.cosine)
        for i, r in enumerate(
            sim.q_ann_query_vector_topk(spark, sf_dir).collect()
        )
    ]
    assert sorted(by_q[0]) == sorted(single)
    ids = [tuple(v for (_, v, _) in sorted(by_q[q])) for q in range(sim.OOC_BATCH)]
    assert len(set(ids)) > 1
    for q in range(sim.OOC_BATCH):
        for v in sim._ooc_batch_vec(q):
            assert v * 1024 == int(v * 1024)
    assert sim._ooc_batch_vec(0) == sim.OOC_QUERY_VEC


def test_supplier_reliability_wilson_discounts_thin_evidence(spark, tmp_path):
    """The leaderboard fix the query exists for: a 25/25 perfect-record
    supplier ranks BELOW a 392/400 supplier once the Wilson lower bound
    discounts the thin evidence (raw permille says the opposite); a
    5-line supplier is excluded by the floor. Values match a Python
    recompute of the identical closed form."""
    import math

    from sap_sql_engine_spark.operators import relational as rel

    rows = (
        [(1, "N")] * 25
        + [(2, "N")] * 392 + [(2, "R")] * 8
        + [(3, "N")] * 5
    )
    spark.createDataFrame(
        rows, "l_suppkey long, l_returnflag string"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = rel.q_supplier_reliability_ranking(spark, str(tmp_path)).collect()
    assert [r.l_suppkey for r in got] == [2, 1]  # Wilson flips the raw order
    assert got[0].ok_permille == 980 and got[1].ok_permille == 1000

    z = float(rel.WILSON_Z)

    def wilson(k, n):
        p = k / n
        return (p + z * z / (2 * n)
                - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) \
            / (1 + z * z / n)

    assert abs(got[0].wilson_lb - wilson(392, 400)) < 5e-7
    assert abs(got[1].wilson_lb - wilson(25, 25)) < 5e-7


def test_ann_filter_selectivity_curve_reconciles(spark, sf_dir):
    """The curve reconciles with its parts: cand_hits sums to the
    candidate-list size (TOPK*EXPAND when the corpus has enough probed
    rows), label sizes sum to the corpus, the FILT_LABEL row agrees
    with q_ann_filtered_query_topk's postfilter leg, and served/
    shortfall obey their clamps."""
    rows = {r.label: r for r in
            sim.q_ann_filter_selectivity_curve(spark, sf_dir).collect()}
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_label for r in rows.values()) == n
    total_hits = sum(r.cand_hits for r in rows.values())
    assert total_hits <= sim.TOPK * sim.FILT_EXPAND
    post = [
        r for r in sim.q_ann_filtered_query_topk(spark, sf_dir).collect()
        if r.strategy == "postfilter_ivf"
    ]
    flt = rows[sim.FILT_LABEL]
    assert flt.served == min(len(post), sim.TOPK) == len(post)
    for r in rows.values():
        assert r.served == min(r.cand_hits, sim.TOPK)
        assert r.shortfall == sim.TOPK - r.served


def test_adaboost_stump_report_planted_separable(spark, tmp_path):
    """On a separable corpus (en docs all stopwords -> x1 = 1e6, others
    x1 = 0) every round picks the lexicographically-first zero-error
    stump (feature 1, threshold 100000, polarity 1; the e=0 guard makes
    the weight update a no-op so the pick repeats), and the uniform
    vote scores 10000 bp on both splits."""
    from sap_sql_engine_spark.operators import classifier as cl

    rows = []
    for i in range(40):
        rows.append((2 * i, "the and of to the and of to", "en", "srcA", 28))
        rows.append((2 * i + 1, "zz qq ww rr zz qq ww rr", "fr", "srcA", 23))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = cl.q_adaboost_stump_report(spark, str(tmp_path)).collect()
    assert len(got) == cl.ADA_ROUNDS
    for r in got:
        assert (r.feature, r.threshold_micro, r.polarity) == (1, 100000, 1)
        assert r.werr_micro == 0
        assert r.ensemble_train_bp == 10000
        assert r.ensemble_held_bp == 10000


def test_adaboost_reweighting_noise_floor(spark, tmp_path):
    """Hand-run reweighting orbit on a noisy corpus (6 clean + 2
    mislabeled train docs): round 1 picks the x1 stump at weighted
    error 2/8 (250000 micro) and multiplies correct weights by 2,
    misclassified by 6; rounds 2-3 then sit exactly at the 12/24 noise
    floor (500000 micro) where the lexicographic tie-break flips
    polarity — the uniform vote lands at the hand-computed 2500 bp
    train / 0 bp held. Every number is the exact integer orbit, so
    this pins the reweighting path end-to-end."""
    from sap_sql_engine_spark.operators import classifier as cl

    A = "the the the the"   # x1 = 1e6 (all stopwords)
    B = "zz zz zz zz"       # x1 = 0
    rows = [
        (1, A, "en", "s", 15), (2, A, "en", "s", 15), (3, A, "en", "s", 15),
        (6, B, "fr", "s", 11), (7, B, "fr", "s", 11), (8, B, "fr", "s", 11),
        (4, B, "en", "s", 11),   # noise: label en, B text
        (9, A, "fr", "s", 15),   # noise: label fr, A text
        (5, A, "en", "s", 15),   # held (doc_id % 5 == 0)
        (10, B, "fr", "s", 11),  # held
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = cl.q_adaboost_stump_report(spark, str(tmp_path)).collect()
    assert [
        (r.round, r.feature, r.threshold_micro, r.polarity, r.werr_micro)
        for r in got
    ] == [
        (1, 1, 100000, 1, 250000),
        (2, 1, 100000, 0, 500000),
        (3, 1, 100000, 0, 500000),
    ]
    assert got[0].ensemble_train_bp == 2500
    assert got[0].ensemble_held_bp == 0


def test_token_good_turing_planted(spark, tmp_path):
    """Hand-counted frequency-of-frequencies: tokens x(1) y(1) z(2)
    w(3) give N1=2, N2=1, N3=1, total 7 -> r*(1) = 2*1*1000//2 = 1000,
    r*(2) = 3*1*1000//1 = 3000, r*(3) = 0 (no N4), unseen mass
    2000//7 = 285 permille."""
    from sap_sql_engine_spark.operators import textanalysis as ta

    rows = [
        (1, "x z w", "en", "s", 5),
        (2, "y z w", "en", "s", 5),
        (3, "w", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = [tuple(r) for r in ta.q_token_good_turing(spark, str(tmp_path)).collect()]
    assert got == [
        (1, 2, 1, 1000, 7, 285),
        (2, 1, 1, 3000, 7, 285),
        (3, 1, 0, 0, 7, 285),
    ]


def test_dedup_containment_pairs_planted(spark, tmp_path):
    """A doc pasted verbatim at the head of a longer doc: containment of
    the smaller shingle set is exactly 1000 permille while symmetric
    Jaccard is only 500 — the subset-duplication case jaccard-threshold
    dedup (>= 0.5... just at the edge here, generally below) under-ranks.
    An unrelated doc never pairs."""
    from sap_sql_engine_spark.operators import dedup

    a = "w1 w2 w3 w4 w5 w6"                      # 4 distinct 3-grams
    b = a + " w7 w8 w9 w10"                      # 8 3-grams, contains a's 4
    other = "q1 q2 q3 q4 q5 q6 q7"
    rows = [(1, a, "en", "s", len(a)), (2, b, "en", "s", len(b)),
            (3, other, "en", "s", len(other))]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = [tuple(r) for r in
           dedup.q_dedup_containment_pairs(spark, str(tmp_path)).collect()]
    assert got == [(1, 2, 4, 8, 4, 1000, 500)]


def test_events_markov_stationary_planted(spark, tmp_path):
    """Hand-run 6-step renormalized power iteration on the 2-state chain
    built by the sequence click,view,view,click,view (A->B x2, B->B,
    B->A). With per-step renormalization to 1e12 (r12) the orbit in
    basis units walks click = 250e9 -> 375e9 -> 312.5e9 -> 343.75e9 ->
    328.125e9 -> 335.9375e9 (raw step totals divide exactly here, so
    no truncation fires) -> stationary 335/664 permille, identical to
    the unnormalized r11 orbit (43/85 of 128); incoming shares 250/750
    over the 4 transitions."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as se

    seq = ["click", "view", "view", "click", "view"]
    rows = [
        (i, dt.datetime(2024, 3, 1, 10, i), 7, t, 1.0, "{}")
        for i, t in enumerate(seq)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = [tuple(r) for r in
           se.q_events_markov_stationary(spark, str(tmp_path)).collect()]
    assert got == [
        ("click", 335, 250, 1),
        ("view", 664, 750, 3),
    ]


def test_events_session_archetypes_planted(spark, tmp_path):
    """Three hand-built sessions: two identical 'click,view' sessions
    (one split from the first by a > gap pause) and one 10-event bot
    session whose signature truncates at ARCHETYPE_MAX_LEN with the
    ',...' marker. Shares and mean lengths are exact integer grids."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as se

    base = dt.datetime(2024, 3, 1, 8, 0, 0)
    rows = []
    # user 1: session A (click, view), 40-min pause, session B (click, view)
    for j, (off, t) in enumerate(
        [(0, "click"), (1, "view"), (41, "click"), (42, "view")]
    ):
        rows.append((j, base + dt.timedelta(minutes=off), 1, t, 1.0, "{}"))
    # user 2: one 10-event view-only bot session
    for k in range(10):
        rows.append(
            (100 + k, base + dt.timedelta(minutes=k), 2, "view", 1.0, "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = [tuple(r) for r in
           se.q_events_session_archetypes(spark, str(tmp_path)).collect()]
    trunc = ",".join(["view"] * se.ARCHETYPE_MAX_LEN) + ",..."
    assert got == [
        ("click,view", 2, 666, 2000),
        (trunc, 1, 333, 10000),
    ]


def test_docs_greedy_coverage_planted(spark, tmp_path):
    """Hand-run greedy max-coverage: doc 1 has 4 distinct 3-grams,
    doc 2 shares 2 of them and adds 2 new, doc 3 is a pure subset of
    doc 1. Greedy picks doc 1 (gain 4, 666 permille of the 6-gram
    universe), then doc 2 (marginal gain 2, full coverage); doc 3 has
    zero marginal gain so the pack ends early at 2 rows — the
    early-stop contract, identical on both engines."""
    from sap_sql_engine_spark.operators import dedup

    d1 = "w1 w2 w3 w4 w5 w6"            # grams: 123,234,345,456
    d2 = "w3 w4 w5 w6 w7 w8"            # grams: 345,456,567,678 (2 new)
    d3 = "w1 w2 w3 w4"                  # grams: 123,234 (subset of d1)
    rows = [(1, d1, "en", "s", 17), (2, d2, "en", "s", 17),
            (3, d3, "en", "s", 11)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = [tuple(r) for r in
           dedup.q_docs_greedy_coverage(spark, str(tmp_path)).collect()]
    assert got == [
        (1, 1, 4, 4, 666),
        (2, 2, 2, 6, 1000),
    ]


def test_docs_weighted_topk_sample_properties(spark, sf_dir):
    """E-S sample invariants: exactly K rows, ranks 1..K, keys
    non-increasing with the doc_id tie-break, every key within 1 micro
    of a Python recompute of ln(u)/w (libm-tolerance — the class-C
    margin), and the sample agrees with the Python top-K up to at most
    one boundary doc."""
    import math

    from sap_sql_engine_spark.operators import textanalysis as ta

    got = ta.q_docs_weighted_topk_sample(spark, sf_dir).collect()
    assert [r.rank for r in got] == list(range(1, ta.AES_TOP_K + 1))
    keys = [(r.key_micro, -r.doc_id) for r in got]
    assert keys == sorted(keys, reverse=True)
    assert all(r.quality_score > 0 for r in got)

    q = {
        r.doc_id: r.quality_score
        for r in ta.q_quality_score(spark, sf_dir).collect()
        if r.quality_score > 0
    }
    import hashlib

    def key(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        return math.floor(
            math.log((h + 1) / 4294967296.0) / q[doc_id] * 1_000_000
        )

    for r in got:
        assert abs(r.key_micro - key(r.doc_id)) <= 1
    py_top = sorted(q, key=lambda d: (-key(d), d))[: ta.AES_TOP_K]
    assert len(set(py_top) ^ {r.doc_id for r in got}) <= 2


def test_events_lorenz_deciles_planted(spark, tmp_path):
    """Hand-built 10-user corpus with counts 1..10 (user k fires k
    events): each decile holds exactly one user, events k, and the
    cumulative share is the exact triangular prefix k(k+1)/2 over 55
    permille-floored. Curve invariants: convexity of cumulative shares
    and a 1000-permille close."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as se

    rows = []
    eid = 0
    for u in range(1, 11):
        for j in range(u):
            rows.append(
                (eid, dt.datetime(2024, 3, 1, 6, j), u, "click", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = [tuple(r) for r in
           se.q_events_lorenz_deciles(spark, str(tmp_path)).collect()]
    want = [
        (d, 1, d + 1, ((d + 1) * (d + 2) // 2) * 1000 // 55)
        for d in range(10)
    ]
    assert got == want
    shares = [g[3] for g in got]
    assert shares == sorted(shares) and shares[-1] == 1000
