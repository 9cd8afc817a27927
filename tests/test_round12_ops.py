"""Planted-fixture tests for the round-12 operators.

Each test hand-computes the expected integer grid on a corpus small
enough to verify by eye, so a regression in any engine-side expression
(not just a Spark/DuckDB disagreement) fails loudly.
"""

import datetime as dt

import pytest

from sap_sql_engine_spark.operators import relational as rel
from sap_sql_engine_spark.operators import textanalysis as ta
from sap_sql_engine_spark.streaming import events as se


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_text_simpson_diversity_planted(spark, tmp_path):
    """srcA = 'a a a b' (N=4, V=2, sum c(c-1) = 6, lambda = 6/12 = 500
    permille, top share 750); srcB = 'x y z' (all singletons, lambda 0,
    top share 333)."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a a a b", "en", "srcA", 7),
            (2, "x y z", "en", "srcB", 5),
        ],
    )
    got = [
        tuple(r)
        for r in ta.q_text_simpson_diversity(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("srcA", 4, 2, 500, 750),
        ("srcB", 3, 3, 0, 333),
    ]


def test_docs_chao1_richness_planted(spark, tmp_path):
    """srcA: counts a:1 b:1 c:2 -> V=3, n1=2, n2=1, chao1 = 3 + 4/2 = 5
    (5000 milli). srcB: counts x:3 -> V=1, n1=0, n2=0, fallback term 0,
    chao1 = 1000 milli."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b c c", "en", "srcA", 7),
            (2, "x x x", "en", "srcB", 5),
        ],
    )
    got = [
        tuple(r)
        for r in ta.q_docs_chao1_richness(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("srcA", 3, 2, 1, 5000),
        ("srcB", 1, 0, 0, 1000),
    ]


def test_token_bigram_novelty_planted(spark, tmp_path):
    """Incoming src19 doc 'a b c d' has bigrams {ab, bc, cd}; the corpus
    doc 'a b c x' holds {ab, bc, cx} -> shared 2 of 3 incoming =
    666 permille containment."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b c x", "en", "src0", 7),
            (2, "a b c d", "en", ta.NOVELTY_INCOMING_SOURCE, 7),
        ],
    )
    got = [
        tuple(r)
        for r in ta.q_token_bigram_novelty(spark, str(tmp_path)).collect()
    ]
    assert got == [(3, 3, 2, 666)]


def test_events_mann_kendall_planted(spark, tmp_path):
    """Three days with counts 1, 2, 3 (one event day one, two day two,
    three day three): all 3 pairs rise -> S = 3, trend 1000 permille,
    direction rising."""
    rows = []
    eid = 0
    for day, n in ((1, 1), (2, 2), (3, 3)):
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2024, 3, day, 10, eid % 60), 7, "click",
                 1.0, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    got = [tuple(r) for r in se.q_events_mann_kendall(spark, str(tmp_path)).collect()]
    assert got == [(3, 3, 3, 1000, "rising")]


def test_events_runs_test_planted(spark, tmp_path):
    """Daily counts 1,3,2,4 -> direction sequence +,-,+ = 3 runs; n_up=2,
    n_down=1, expected = 2*2*1*1000/3 + 1000 = 2333 milli, gap = 667."""
    rows = []
    eid = 0
    for day, n in ((1, 1), (2, 3), (3, 2), (4, 4)):
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2024, 3, day, 9, eid % 60), 7, "view",
                 1.0, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    got = [tuple(r) for r in se.q_events_runs_test(spark, str(tmp_path)).collect()]
    assert got == [(2, 1, 3, 2333, 667)]


def test_events_transition_entropy_planted(spark, tmp_path):
    """One user, sequence a,b,a,c within one session: transitions
    a->b, b->a, a->c. From 'a': counts {b:1, c:1}, T=2, H = ln(2) -
    (1*0 + 1*0)/2 = 693147 micro-nats. From 'b': deterministic ->
    entropy 0."""
    seq = ["a", "b", "a", "c"]
    rows = [
        (i, dt.datetime(2024, 3, 1, 10, 0) + dt.timedelta(seconds=30 * i),
         7, t, 1.0, "{}")
        for i, t in enumerate(seq)
    ]
    _write_events(spark, tmp_path, rows)
    got = [
        tuple(r)
        for r in se.q_events_transition_entropy(spark, str(tmp_path)).collect()
    ]
    assert got == [("a", 2, 2, 693147), ("b", 1, 1, 0)]


def test_customer_spend_gini_planted(spark, tmp_path):
    """Two customers, spends 100.00 and 300.00 (cents 10000 / 30000):
    rank form G = (2*(1*10000 + 2*30000) - 3*40000) / (2*40000) =
    20000/80000 = 250 permille. Perfect equality sanity-checked too."""
    rows = [
        (1, 10, "O", 100.0, dt.datetime(2024, 1, 1), "1-URGENT"),
        (2, 20, "O", 300.0, dt.datetime(2024, 1, 2), "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = [
        tuple(r)
        for r in rel.q_customer_spend_gini(spark, str(tmp_path)).collect()
    ]
    assert got == [(2, 40000, 250)]


def test_ship_latency_qty_ols_planted(spark, tmp_path):
    """One priority, three lines: (qty, latency) = (1,2), (2,4), (3,6) —
    a perfect slope of 2 days/unit = 2_000_000 micro; mean latency 4000
    milli."""
    orders = [
        (k, 10, "O", 100.0, dt.datetime(2024, 1, 1), "1-URGENT")
        for k in (1, 2, 3)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    lines = [
        (k, 100 + k, 200 + k, 1, float(k), 10.0, 0.0, 0.0, "N", "O",
         dt.datetime(2024, 1, 1) + dt.timedelta(days=2 * k))
        for k in (1, 2, 3)
    ]
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = [
        tuple(r)
        for r in rel.q_ship_latency_qty_ols(spark, str(tmp_path)).collect()
    ]
    assert got == [("1-URGENT", 3, 4000, 2_000_000)]


def test_orders_same_day_repeats_planted(spark, tmp_path):
    """Customer 10 places two orders on 2024-01-05 (the flagged group);
    customer 20's single order never surfaces."""
    rows = [
        (1, 10, "O", 100.0, dt.datetime(2024, 1, 5), "1-URGENT"),
        (2, 10, "O", 50.5, dt.datetime(2024, 1, 5), "2-HIGH"),
        (3, 20, "O", 70.0, dt.datetime(2024, 1, 5), "3-MEDIUM"),
        (4, 10, "O", 10.0, dt.datetime(2024, 1, 6), "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = [
        tuple(r)
        for r in rel.q_orders_same_day_repeats(spark, str(tmp_path)).collect()
    ]
    assert got == [(10, "2024-01-05", 2, 15050, 1, 2)]


def test_part_supplier_degree_histogram_planted(spark, tmp_path):
    """Edges: part 1 from suppliers {7, 8}, part 2 from {7} (duplicate
    lines collapse). Degrees: parts with 1 supplier = 1, with 2 = 1;
    suppliers with 1 part = 1 (supp 8), with 2 parts = 1 (supp 7)."""
    lines = [
        (1, 1, 7), (2, 1, 7), (3, 1, 8), (4, 2, 7),
    ]
    spark.createDataFrame(
        [
            (k, p, s, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 2))
            for k, p, s in lines
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = [
        tuple(r)
        for r in rel.q_part_supplier_degree_histogram(
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == [
        ("parts_per_supplier", 1, 1),
        ("parts_per_supplier", 2, 1),
        ("suppliers_per_part", 1, 1),
        ("suppliers_per_part", 2, 1),
    ]


def test_dedup_prefix_filter_pairs_planted(spark, tmp_path):
    """Docs 1/2 share 19 of 20 distinct tokens (J = 19/21 = 904 — below
    tau), docs 1/3 are an exact token-set permutation (J = 1000, found
    via the shared rare-token prefix); doc 4 is disjoint and never
    pairs. Completeness: the 1-3 pair MUST surface (prefix theorem),
    planted so the prefix is the rarest token."""
    from sap_sql_engine_spark.operators import dedup

    base = " ".join(f"w{i}" for i in range(20))
    perm = " ".join(f"w{i}" for i in reversed(range(20)))
    near = " ".join(f"w{i}" for i in range(19)) + " odd1 odd2"
    other = " ".join(f"q{i}" for i in range(20))
    rows = [
        (1, base, "en", "s", len(base)),
        (2, near, "en", "s", len(near)),
        (3, perm, "en", "s", len(perm)),
        (4, other, "en", "s", len(other)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = [
        tuple(r)
        for r in dedup.q_dedup_prefix_filter_pairs(
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == [(1, 3, 20, 20, 20, 1000)]


def test_discount_qty_elasticity_planted(spark, tmp_path):
    """One brand, three lines: (discount bp, qty) = (0,1), (500,2),
    (1000,3) — perfect slope 2 units per 1000bp = 2000 micro-units/bp;
    mean discount 500 bp, mean qty 2000 milli."""
    import datetime as dt

    from sap_sql_engine_spark.operators import relational as rel

    spark.createDataFrame(
        [(1, "Brand#1", "T", 5, 10.0)],
        "p_partkey long, p_brand string, p_type string, p_size int,"
        " p_retailprice double",
    ).selectExpr("p_partkey", "concat('P', p_partkey) AS p_name", "p_brand",
                 "p_type", "p_size", "p_retailprice"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    lines = [
        (k, 1, 7, 1, float(q), 10.0, d, 0.0, "N", "O",
         dt.datetime(2024, 1, 2))
        for k, (d, q) in enumerate([(0.0, 1), (0.05, 2), (0.10, 3)])
    ]
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = [
        tuple(r)
        for r in rel.q_discount_qty_elasticity(spark, str(tmp_path)).collect()
    ]
    assert got == [("Brand#1", 3, 500, 2000, 2000)]


def test_orders_weekday_profile_planted(spark, tmp_path):
    """2024-01-01 was a Monday: two Monday orders (100.00 + 50.00) and
    one Tuesday order (70.00) land on iso weekdays 1 and 2 with exact
    cents and shares 666/333."""
    import datetime as dt

    from sap_sql_engine_spark.operators import relational as rel

    rows = [
        (1, 10, "O", 100.0, dt.datetime(2024, 1, 1), "1-URGENT"),
        (2, 11, "O", 50.0, dt.datetime(2024, 1, 1), "2-HIGH"),
        (3, 12, "O", 70.0, dt.datetime(2024, 1, 2), "3-MEDIUM"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = [
        tuple(r)
        for r in rel.q_orders_weekday_profile(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (1, 2, 15000, 7500, 666),
        (2, 1, 7000, 7000, 333),
    ]


def test_novelty_query_text_probe_planted(spark, tmp_path):
    """Probe 1 (resubmission of the lowest-doc_id text 'a b c d':
    bigrams ab,bc,cd) reads containment 1000; probe 2 (the novel
    literal) shares nothing with the planted corpus -> 0."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b c d", "en", "src0", 7),
            (2, "a b x y", "en", "src1", 7),
        ],
    )
    got = [
        tuple(r)
        for r in ta.q_novelty_query_text_probe(spark, str(tmp_path)).collect()
    ]
    n_novel = len(ta.NOVELTY_QUERY_TEXT.split()) - 1
    assert got == [(1, 3, 3, 1000), (2, n_novel, 0, 0)]


def test_novelty_query_text_is_genuinely_novel(spark, sf_dir):
    """The literal is not a corpus row, and its containment on the gate
    corpus is honestly below the resubmission leg's 1000."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = {r.text for r in docs.collect()}
    assert ta.NOVELTY_QUERY_TEXT not in texts
    got = {r.probe_id: r for r in
           ta.q_novelty_query_text_probe(spark, sf_dir).collect()}
    assert got[1].containment_permille == 1000
    assert got[2].containment_permille < 1000


def test_classifier_query_text_probe_planted(spark, tmp_path):
    """Serving == batch: probe 1 (the lowest-doc_id text re-scored from
    its STRING) must reproduce the batch scorer's decision for that
    row bit-for-bit; probe 2 (the novel literal) gets a row with a
    defined z and pred in {0, 1}. Corpus is the separable planted shape
    so training moves the weights."""
    from sap_sql_engine_spark.operators import classifier as cl

    rows = []
    for i in range(20):
        if i % 2 == 0:
            text = "the cat and the dog sat in the sun to rest a bit"
            lang = "en"
        else:
            text = "zzz qqq 123 456 789 000 !!! ### $$$ %%%"
            lang = "xx"
        rows.append((i, text, lang, "s", len(text)))
    _write_docs(spark, tmp_path, rows)
    got = {r.probe_id: r for r in
           cl.q_classifier_query_text_probe(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2}
    # batch scorer decision for doc 0 (the lowest doc_id)
    feats, w = cl._fit(
        spark.read.parquet(str(tmp_path / "documents.parquet"))
    )
    from pyspark.sql import functions as F

    batch = (
        feats.filter("doc_id = 0")
        .crossJoin(F.broadcast(w))
        .selectExpr(f"CAST({cl._Z_EXPR} AS BIGINT) AS z")
        .first()
    )
    assert got[1].z_micro == batch.z
    assert got[1].pred == int(batch.z > 0)
    assert got[2].pred in (0, 1)


def test_events_poisson_dispersion_planted(spark, tmp_path):
    """Daily counts 1,2,3: n=3, S1=6, S2=14, mean 2000 milli, sample
    variance (3*14-36)/(3*2)=1 -> 1000 milli, VMR (3*14-36)*1000/(2*6)
    = 500 milli (underdispersed — a rising staircase is regular)."""
    rows = []
    eid = 0
    for day, n in ((1, 1), (2, 2), (3, 3)):
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2024, 3, day, 10, eid % 60), 7, "click",
                 1.0, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    got = [tuple(r) for r in
           se.q_events_poisson_dispersion(spark, str(tmp_path)).collect()]
    assert got == [(3, 6, 2000, 1000, 500)]


def test_order_size_priority_chisq_planted(spark, tmp_path):
    """A perfectly dependent 2x2 grid (priority A only small orders,
    B only large): every cell's expected is half its margin product and
    the statistic equals N*1000 milli (chi2 = N for perfect association
    in a 2x2)."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = []
    k = 0
    for pr, price, cnt in (
        ("1-URGENT", 100.0, 2),      # bucket 0
        ("2-HIGH", 20000.0, 2),      # bucket 2
    ):
        for _ in range(cnt):
            rows.append((k, 10 + k, "O", price,
                         dt.datetime(2024, 1, 1 + k), pr))
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = [tuple(r) for r in
           rel.q_order_size_priority_chisq(spark, str(tmp_path)).collect()]
    # each observed cell: O=2, r=2, c=2, n=4 -> expected 1000 milli,
    # contribution (2*4-4)^2*1000/(4*2*2) = 1000 milli; total 2000
    assert got == [
        ("1-URGENT", 0, 2, 1000, 1000, 4, 2000),
        ("2-HIGH", 2, 2, 1000, 1000, 4, 2000),
    ]


def test_embedding_dim_variance_planted(spark, tmp_path):
    """Two 2-dim vectors (0.0, 1.0) and (0.0, 3.0): dim 1 is dead
    (variance 0), dim 2 has mean 2e6 micro and sample variance
    (2*1e13 - (4e6)^2)/(2*1) = 2e12 micro^2."""
    from sap_sql_engine_spark.operators import similarity as sim

    spark.createDataFrame(
        [(1, [0.0, 1.0], 0), (2, [0.0, 3.0], 1)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    got = [tuple(r) for r in
           sim.q_embedding_dim_variance_report(spark, str(tmp_path)).collect()]
    assert got == [
        (2, 2, 2_000_000, 2_000_000_000_000, 1_000_000, 3_000_000),
        (1, 2, 0, 0, 0, 0),
    ]


def test_streaming_daily_counts_matches_batch(spark, tmp_path):
    """Stream == batch for the daily-trend family: day counts arrive as
    FINALIZED watermarked 1-day windows in the parquet sink;
    trend_from_daily over the sink equals the identical statistic over
    a batch daily aggregation of the same dropped rows. A crash is
    simulated between the drops (commit marker deleted -> epoch 0
    REPLAYS on restart): the file-sink metadata log must skip the
    already-committed epoch, never double-counting a day."""
    import os

    from pyspark.sql import functions as F

    drop_dir = str(tmp_path / "drops")
    out_dir = str(tmp_path / "daily")

    def drop(rows):
        spark.createDataFrame(
            [
                (u, "click", dt.datetime(2024, 3, d, h), 1.0)
                for (u, d, h) in rows
            ],
            "user_id long, event_type string, ts timestamp, value double",
        ).write.mode("append").json(drop_dir)

    # daily counts 1, 3, 2 over March 1-3 (pairs +1 +1 -1 -> S = +1)
    d1 = [(1, 1, 9), (1, 2, 9), (2, 2, 10), (3, 2, 11)]
    d2 = [(1, 3, 9), (2, 3, 15)]
    # sentinel: pushes the watermark (2 day delay) past every real day;
    # its OWN window stays open and must not reach the sink
    flush = [(99, 20, 0)]

    drop(d1)
    q = se.streaming_daily_counts(spark, drop_dir, out_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    for marker in ("0", ".0.crc"):
        os.remove(os.path.join(out_dir + "_ckpt", "commits", marker))
    drop(d2 + flush)
    q = se.streaming_daily_counts(spark, drop_dir, out_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    sink = spark.read.parquet(out_dir)
    days = {r.day: r.c for r in sink.collect()}
    assert days == {"2024-03-01": 1, "2024-03-02": 3, "2024-03-03": 2}

    got = [tuple(r) for r in se.trend_from_daily(sink).collect()]
    batch_daily = (
        spark.createDataFrame(
            [(dt.datetime(2024, 3, d, h),) for (_, d, h) in d1 + d2],
            "ts timestamp",
        )
        .groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
            .alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    want = [tuple(r) for r in se.trend_from_daily(batch_daily).collect()]
    assert got == want
    assert got == [(3, 3, 1, 333, "rising")]
