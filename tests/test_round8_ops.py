"""Planted-scenario tests for the round-8 operators: tiny hand-built
parquet fixtures where the right answer is computable by eye, pinning the
SEMANTICS (skyline dominance incl. ties and duplicates, FIFO interval
overlap algebra, fuzzy-join blocking tradeoffs) independently of the
DuckDB oracle gate.
"""

import datetime as dt
import sys

sys.path.insert(0, "/root/repo")

from sap_sql_engine_spark.operators import govqueries, relational


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


PART_SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_size int, "
    "p_retailprice double"
)


def test_part_skyline_planted_dominance(spark, tmp_path):
    # brand B1 (price_cents, size):
    #   (100, 5)  dominated by (100, 3): same price, smaller size
    #   (100, 3)  frontier (size min of its price tie-group)
    #   (150, 4)  dominated by (100, 3): cheaper AND smaller
    #   (200, 2) x2  frontier DUPLICATE point -> one row, n_parts = 2
    #   (250, 3)  dominated by (200, 2)
    #   (300, 1)  frontier
    rows = [
        (1, "a", "B1", 5, 1.00),
        (2, "b", "B1", 3, 1.00),
        (3, "c", "B1", 4, 1.50),
        (4, "d", "B1", 2, 2.00),
        (5, "e", "B1", 2, 2.00),
        (6, "f", "B1", 3, 2.50),
        (7, "g", "B1", 1, 3.00),
        # second brand: single point is trivially its own frontier
        (8, "h", "B2", 9, 9.00),
    ]
    _write(spark, tmp_path, "part", rows, PART_SCHEMA)
    out = [
        (r.brand, r.price_cents, r.size, r.n_parts)
        for r in relational.q_part_skyline_frontier(
            spark, str(tmp_path)
        ).collect()
    ]
    assert out == [
        ("B1", 100, 3, 1),
        ("B1", 200, 2, 2),
        ("B1", 300, 1, 1),
        ("B2", 900, 9, 1),
    ]


LI_SCHEMA = (
    "l_orderkey long, l_linenumber int, l_partkey long, l_returnflag string, "
    "l_shipdate date, l_quantity double"
)


def test_fifo_reallocation_planted_interval_overlap(spark, tmp_path):
    d = dt.date
    rows = [
        # part 1 (brand A): supply [0,5),[5,8); demand [0,4),[4,10)
        #   matched = 4 (s1xd1) + 1 (s1xd2) + 3 (s2xd2) = 8 = min(8, 10)
        #   s2xd1 must NOT pair: s_lo=5 < d_hi=4 fails the overlap join
        (1, 1, 1, "R", d(2024, 1, 1), 5.0),
        (2, 1, 1, "R", d(2024, 1, 2), 3.0),
        (3, 1, 1, "N", d(2024, 1, 1), 4.0),
        (4, 1, 1, "N", d(2024, 1, 3), 6.0),
        # part 2 (brand B): supply only -> demand 0, fill_bp NULL
        (5, 1, 2, "R", d(2024, 1, 1), 2.0),
        # part 3 (brand C): demand only -> matched 0, fill_bp 0
        (6, 1, 3, "N", d(2024, 1, 1), 7.0),
        # an 'A' row never enters either side
        (7, 1, 1, "A", d(2024, 1, 1), 99.0),
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    _write(
        spark,
        tmp_path,
        "part",
        [(1, "p1", "A", 1, 1.0), (2, "p2", "B", 1, 1.0), (3, "p3", "C", 1, 1.0)],
        PART_SCHEMA,
    )
    out = [
        (r.brand, r.n_parts, r.supply_qty, r.demand_qty, r.matched_qty, r.fill_bp)
        for r in relational.q_fifo_return_reallocation(
            spark, str(tmp_path)
        ).collect()
    ]
    assert out == [
        ("A", 1, 8, 10, 8, 8000),
        ("B", 1, 2, 0, 0, None),
        ("C", 1, 0, 7, 0, 0),
    ]


def test_part_fuzzy_pairs_planted_blocking(spark, tmp_path):
    rows = [
        # brand X: (1,2) dist 1 -> pair; (4,5) exact dup -> pair
        (1, "alpha widget", "X", 1, 1.0),
        (2, "alphq widget", "X", 1, 1.0),
        # same length as 1/2 but distance >> 4 -> evaluated, rejected
        (3, "qqqqqqqqqqqq", "X", 1, 1.0),
        (4, "beta bolt", "X", 1, 1.0),
        (5, "beta bolt", "X", 1, 1.0),
        # length diff 3, true distance 3: the r9 exact band (band ==
        # threshold == 4; |len diff| is a lower bound on edit distance)
        # must KEEP this pair — the r8 band of 2 lost it (ADVICE fix).
        # Pairs with 1 (dist 3) and with 2 (dist 4).
        (6, "alpha widgetxxx", "X", 1, 1.0),
        # length diff 5 vs row 3: pruned WITHOUT levenshtein, and the
        # pruning is exact (true distance >= |len diff| = 5 > 4)
        (8, "qqqqqqqqqqqqqqqqq", "X", 1, 1.0),
        # brand Y: cross-brand near-dup of 1 must NOT pair (block key)
        (7, "alpha widget", "Y", 1, 1.0),
    ]
    _write(spark, tmp_path, "part", rows, PART_SCHEMA)
    out = [
        (r.brand, r.n_pairs, r.n_exact, r.min_dist, r.max_dist)
        for r in relational.q_part_name_fuzzy_pairs(
            spark, str(tmp_path)
        ).collect()
    ]
    assert out == [("X", 4, 1, 0, 4)]


def test_embedding_sq8_planted_reconstruction(spark, tmp_path):
    import math

    from sap_sql_engine_spark.operators import similarity

    # dim 0: values {0, 0.5, 1} -> calibration [0, 1]; the 0.5 value maps
    # to code floor(127.5 + 0.5) = 128 -> dequantizes to 128/255, a known
    # reconstruction error. dim 1 is CONSTANT -> zero range, zero error.
    rows = [
        (0, [0.0, 7.0], 0),
        (1, [0.5, 7.0], 0),
        (2, [1.0, 7.0], 1),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r.pos: (r.n_vals, r.vmin_e6, r.vmax_e6, r.sum_qerr_e12)
        for r in similarity.q_embedding_sq8_error(spark, str(tmp_path)).collect()
    }
    err_mid = (0.5 - 128.0 / 255.0) ** 2
    expect_e12 = math.floor(err_mid * 1e12 + 0.5)
    assert out[0] == (3, 0, 1000000, expect_e12)
    assert out[1] == (3, 7000000, 7000000, 0)


def _winnow_reference(text, k=3, w=4):
    """Plain-python winnowing (Schleimer et al. rightmost-min rule) used
    to pin the Spark array-program implementation."""
    import hashlib

    toks = text.strip().split()
    hs = [
        int(hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:8], 16)
        for i in range(len(toks) - k + 1)
    ]
    sel = set()
    for s in range(len(hs) - w + 1):
        best, bp = None, None
        for p in range(s, s + w):
            if best is None or hs[p] <= best:
                best, bp = hs[p], p
        sel.add((bp, hs[bp]))
    return hs, sel


def test_text_winnowing_matches_python_reference(spark, tmp_path):
    from sap_sql_engine_spark.operators import textanalysis

    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "pad pad pad the quick brown fox jumps over the end",  # shared 6+ run
        "one two",  # too short for any gram window
        "a a a a a a a a",  # all-equal hashes: rightmost-tie stress
    ]
    rows = [
        (i, t, "en", f"src{i}", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r.source: (r.n_grams, r.n_windows, r.n_fingerprints, r.fp_hash_sum)
        for r in textanalysis.q_text_winnowing(spark, str(tmp_path)).collect()
    }
    sels = []
    for i, t in enumerate(texts):
        hs, sel = _winnow_reference(t)
        n_grams = max(len(t.split()) - 2, 0)
        assert out[f"src{i}"] == (
            n_grams,
            max(n_grams - 3, 0),
            len(sel),
            sum(h for _, h in sel),
        ), f"doc {i}"
        sels.append({h for _, h in sel})
    # the guaranteed-overlap property: docs 0 and 1 share a >= k+w-1
    # token run, so winnowing MUST give them a common fingerprint
    assert sels[0] & sels[1]


def test_kn_bigram_planted_all_coverage_classes(spark, tmp_path):
    import math

    from sap_sql_engine_spark.operators import textanalysis

    rows = [
        # train: c2 = {(a,b):2, (b,c):1, (b,b):1}; c1 = {a:2, b:2};
        # dw1 = {a:1, b:2}; npre = {b:2, c:1}; T = 3 bigram types
        (1, "a b c", "en", "train", 5),
        (2, "a b b", "en", "train", 5),
        # eval (src0): (a,b) seen c2=2; (b,a) oov_cont (a never a
        # continuation); (a,c) backoff; (c,x) + (x,a) oov_w1
        (3, "a b a c x a", "en", "src0", 11),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = [
        (r.category, r.count_band, r.n_bigrams, r.sum_lnq, r.avg_lnq)
        for r in textanalysis.q_kn_bigram_smoothing(spark, str(tmp_path)).collect()
    ]
    # exact rationals: backoff (a,c) = 3*dw1(a)*npre(c) / (4*c1(a)*T)
    # = 3/24; seen (a,b) = ((4*2-3)*3 + 3*1*2) / 24 = 21/24
    lnq_backoff = math.floor(math.log(3 / 24) * 1_000_000)
    lnq_seen = math.floor(math.log(21 / 24) * 1_000_000)
    assert out == [
        ("backoff", "-", 1, lnq_backoff, lnq_backoff),
        ("oov_cont", "-", 1, 0, None),
        ("oov_w1", "-", 2, 0, None),
        ("seen", "2-3", 1, lnq_seen, lnq_seen),
    ]


def test_simhash_bit_balance_consistent_with_signatures(spark, tmp_path):
    from sap_sql_engine_spark.operators import dedup

    rows = [
        (1, "alpha beta gamma delta", "en", "web", 22),
        (2, "epsilon zeta eta theta iota", "en", "web", 27),
        (3, "alpha alpha alpha", "en", "web", 17),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = dedup.q_simhash_bit_balance(spark, str(tmp_path)).collect()
    assert [r.bit for r in out] == list(range(dedup.SIMHASH_BITS))
    # cross-check n_set per bit against the raw signatures
    sigs = [r.simhash for r in dedup._simhash(spark, str(tmp_path)).collect()]
    for r in out:
        expect = sum((s >> r.bit) & 1 for s in sigs)
        assert r.n_set == expect
        assert r.set_permille == expect * 1000 // len(sigs)
        assert r.dev_permille == abs(r.set_permille - 500)


def test_events_transition_matrix_planted_gap_break(spark, tmp_path):
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as ev

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta
    rows = [
        # user 1: view -> click counts; the 49:50 gap to purchase breaks
        # the chain; purchase -> view (5 min) counts again
        (1, t0, 1, "view", 1.0, None),
        (2, t0 + s(seconds=10), 1, "click", 1.0, None),
        (3, t0 + s(minutes=50), 1, "purchase", 1.0, None),
        (4, t0 + s(minutes=55), 1, "view", 1.0, None),
        # user 2: exactly at the 30-min gap boundary -> still a transition
        (5, t0, 2, "click", 1.0, None),
        (6, t0 + s(minutes=30), 2, "click", 1.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = [
        (r.from_type, r.to_type, r.n, r.p_permille)
        for r in ev.q_events_transition_matrix(spark, str(tmp_path)).collect()
    ]
    assert out == [
        ("click", "click", 1, 1000),
        ("purchase", "view", 1, 1000),
        ("view", "click", 1, 1000),
    ]


def test_events_state_drift_planted_classes(spark, tmp_path):
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as ev

    rows = [
        # user 1: latest at T1 = click, latest at T2 = view -> changed
        (1, dt.datetime(2024, 1, 5), 1, "click", 1.0, None),
        (2, dt.datetime(2024, 1, 15), 1, "view", 1.0, None),
        # user 2: only after T1 -> added
        (3, dt.datetime(2024, 1, 12), 2, "signup", 1.0, None),
        # user 3: same latest type in both snapshots -> unchanged
        (4, dt.datetime(2024, 1, 3), 3, "view", 1.0, None),
        (5, dt.datetime(2024, 1, 4), 3, "view", 1.0, None),
        # user 4: events only AFTER T2 -> outside both snapshots entirely
        (6, dt.datetime(2024, 1, 25), 4, "error", 1.0, None),
        # user 5: T1-latest ties on ts -> higher event_id (purchase) wins
        (7, dt.datetime(2024, 1, 2), 5, "click", 1.0, None),
        (8, dt.datetime(2024, 1, 2), 5, "purchase", 1.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = [
        (r.drift_class, r.n_users, r.min_user_id, r.max_user_id)
        for r in ev.q_events_state_drift(spark, str(tmp_path)).collect()
    ]
    assert out == [
        ("added", 1, 2, 2),
        ("changed", 1, 1, 1),
        ("unchanged", 2, 3, 5),
    ]


def test_supplier_herfindahl_planted_monopoly_vs_duopoly(spark, tmp_path):
    d = __import__("datetime").date
    # region M: one supplier -> share 10000 bp, HHI = 1e8
    # region D: two suppliers with equal revenue -> 2 * 5000^2 = 5e7
    _write(
        spark, tmp_path, "region",
        [(0, "M"), (1, "D")], "r_regionkey long, r_name string",
    )
    _write(
        spark, tmp_path, "nation",
        [(0, "N0", 0), (1, "N1", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    _write(
        spark, tmp_path, "supplier",
        [(1, "S1", 0), (2, "S2", 1), (3, "S3", 1)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    li = [
        (1, 1, 1, 1, "N", d(2024, 1, 1), 100.0, 0.0),
        (2, 1, 1, 2, "N", d(2024, 1, 1), 40.0, 0.5),  # -> 20.0
        (3, 1, 1, 3, "N", d(2024, 1, 1), 20.0, 0.0),
    ]
    _write(
        spark, tmp_path, "lineitem", li,
        "l_orderkey long, l_linenumber int, l_partkey long, l_suppkey long, "
        "l_returnflag string, l_shipdate date, l_extendedprice double, "
        "l_discount double",
    )
    out = [
        (r.region, r.n_suppliers, r.hhi_bp2, r.top_share_bp)
        for r in relational.q_supplier_herfindahl(spark, str(tmp_path)).collect()
    ]
    assert out == [
        ("D", 2, 50_000_000, 5000),
        ("M", 1, 100_000_000, 10000),
    ]


def test_vocab_coverage_curve_planted(spark, tmp_path):
    # 12 distinct tokens: 'a' x10, 'b' x5, then c..l once each -> total 25.
    # top-10 = a,b + 8 singletons = 23 tokens -> 920 permille; K>=12 -> 1000.
    text = " ".join(["a"] * 10 + ["b"] * 5 + list("cdefghijkl"))
    _write(
        spark, tmp_path, "documents",
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from sap_sql_engine_spark.operators import textanalysis

    out = [
        (r.k, r.tokens_covered, r.tokens_total, r.coverage_permille)
        for r in textanalysis.q_vocab_coverage_curve(spark, str(tmp_path)).collect()
    ]
    assert out == [(10, 23, 25, 920), (100, 25, 25, 1000), (1000, 25, 25, 1000)]


def test_source_psi_drift_planted_zero_and_shift(spark, tmp_path):
    import hashlib
    import math

    from sap_sql_engine_spark.operators import textanalysis

    def ref_side(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 2 == 0

    ids = list(range(1, 200))
    refs = [i for i in ids if ref_side(i)][:4]
    curs = [i for i in ids if not ref_side(i)][:4]
    rows = []
    # source 'same': identical length profile on both halves -> PSI 0
    for i in refs[:2]:
        rows.append((i, "x", "en", "same", 100))
    for i in curs[:2]:
        rows.append((i, "x", "en", "same", 100))
    # source 'shift': ref in bucket 0 (n_chars 100), cur in bucket 2 (500)
    # -> both buckets one-sided -> skipped -> psi contribution 0 BUT
    # n_skipped_buckets = 2; add one shared bucket with 2:1 imbalance
    for i in refs[2:4]:
        rows.append((i, "x", "en", "shift", 100))
    rows.append((curs[2], "x", "en", "shift", 100))
    rows.append((curs[3], "x", "en", "shift", 500))
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r.source: (r.n_ref, r.n_cur, r.n_buckets, r.n_skipped_buckets, r.psi_micro)
        for r in textanalysis.q_source_psi_drift(spark, str(tmp_path)).collect()
    }
    assert out["same"] == (2, 2, 1, 0, 0)
    # shift: shared bucket 0 has cr=2, cc=1; nr=2, nc=2; the 500-char doc
    # is bucket 2 cur-only (skipped). term = (2*2 - 1*2) * floor(ln(4/2)*1e6)
    # = 2 * 693147; psi = floor(1386294 / 4) = 346573
    lnq = math.floor(math.log(2) * 1_000_000)
    assert out["shift"] == (2, 2, 2, 1, (2 * lnq) // 4)


def test_events_hour_uniformity_planted(spark, tmp_path):
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as ev

    # uniform: one event in each of the 24 hours -> chi2 = 0
    rows = [
        (h, dt.datetime(2024, 1, 1, h), 1, "view", 1.0, None) for h in range(24)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = ev.q_events_hour_uniformity(spark, str(tmp_path)).collect()[0]
    assert (r.n_events, r.df, r.chi2_micro, r.verdict) == (24, 23, 0, "uniform")

    # all 24 events in hour 0 -> chi2 = 23 * T = 552 -> nonuniform
    rows = [
        (h, dt.datetime(2024, 1, 1, 0, h % 60), 1, "view", 1.0, None)
        for h in range(24)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = ev.q_events_hour_uniformity(spark, str(tmp_path)).collect()[0]
    assert (r.n_events, r.chi2_micro, r.verdict) == (24, 552_000_000, "nonuniform")


def test_embedding_matryoshka_planted_flip_and_delta(spark, tmp_path):
    import math

    from sap_sql_engine_spark.operators import similarity

    def vec(**at):
        v = [0.0] * 64
        for pos, val in at.items():
            v[int(pos[1:])] = float(val)
        return v

    # pair (0,1): prefix-8 cosine 1.0, full cosine 1/sqrt(2) -> known delta
    # pair (1,2): prefix-8 cosine 1.0 but FULL cosine negative -> sign flip
    rows = [
        (0, vec(d0=1.0), 0),
        (1, vec(d0=1.0, d33=1.0), 0),
        (2, vec(d0=1.0, d33=-3.0), 1),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = {
        r.k: (r.n_pairs, r.avg_abs_delta_micro, r.max_abs_delta_micro, r.n_sign_flips)
        for r in similarity.q_embedding_matryoshka_report(
            spark, str(tmp_path)
        ).collect()
    }

    def q(x):
        return math.floor(abs(x) * 1_000_000 + 0.5)

    cf_01 = 1.0 / math.sqrt(2.0)
    cf_12 = (1.0 - 3.0) / (math.sqrt(2.0) * math.sqrt(10.0))
    d01, d12 = q(1.0 - cf_01), q(1.0 - cf_12)
    assert out[8] == (2, (d01 + d12) // 2, max(d01, d12), 1)
    assert out[64] == (2, 0, 0, 0)


def test_streaming_transition_matrix_matches_batch(spark, sf_dir):
    from sap_sql_engine_spark.streaming import events as ev

    batch = {
        (r.from_type, r.to_type): r.n
        for r in ev.q_events_transition_matrix(spark, sf_dir).collect()
    }
    q = ev.streaming_transition_matrix(spark, sf_dir)
    try:
        q.processAllAvailable()
        stream_rows = spark.sql(
            "SELECT from_type, to_type, CAST(sum(n) AS BIGINT) AS n "
            "FROM events_transition_stream GROUP BY 1, 2"
        ).collect()
        stream = {(r.from_type, r.to_type): r.n for r in stream_rows}
    finally:
        q.stop()
    assert stream == batch and batch


def test_moments_merge_check_planted(spark, tmp_path):
    from sap_sql_engine_spark.operators import textanalysis

    # lengths 10, 20, 30: mean 20, population variance 200/3 -> floor
    # micro 66666666... staged division: ((3*1400 - 60^2) DIV 3)*1e6 DIV 3
    rows = [
        (i, "x", "en", "s", n) for i, n in ((1, 10), (2, 20), (3, 30))
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = textanalysis.q_moments_merge_check(spark, str(tmp_path)).collect()[0]
    expect_var = ((3 * 1400 - 60 * 60) // 3) * 1_000_000 // 3
    assert (r.source, r.n_docs, r.merge_mismatch, r.mean_micro, r.var_micro) == (
        "s", 3, 0, 20_000_000, expect_var,
    )


def test_parts_abc_planted_class_boundaries(spark, tmp_path):
    d = __import__("datetime").date
    # four parts with revenue 80/15/4/1 dollars -> cumulative bp exactly
    # 8000 (A boundary inclusive), 9500 (B boundary inclusive), 9900, 10000
    li = [
        (i, 1, pk, 1, "N", d(2024, 1, 1), float(rev), 0.0)
        for i, (pk, rev) in enumerate([(1, 80), (2, 15), (3, 4), (4, 1)], 1)
    ]
    _write(
        spark, tmp_path, "lineitem", li,
        "l_orderkey long, l_linenumber int, l_partkey long, l_suppkey long, "
        "l_returnflag string, l_shipdate date, l_extendedprice double, "
        "l_discount double",
    )
    out = [
        (r.abc_class, r.n_parts, r.revenue_share_bp)
        for r in relational.q_parts_abc_classification(
            spark, str(tmp_path)
        ).collect()
    ]
    assert out == [("A", 1, 8000), ("B", 1, 1500), ("C", 2, 500)]


def test_dedup_hamming_histogram_consistent_with_pair_query(spark, sf_dir):
    from sap_sql_engine_spark.operators import dedup

    hist = {
        r.dist_class: (r.n_pairs, r.share_permille)
        for r in dedup.q_dedup_hamming_histogram(spark, sf_dir).collect()
    }
    # the pigeonhole guarantee: the banded candidate set contains EVERY
    # pair within the threshold, so the <=1 classes must equal the gated
    # pair query's per-distance counts exactly
    from collections import Counter

    pair_counts = Counter(
        r.hamming for r in dedup.q_dedup_simhash(spark, sf_dir).collect()
    )
    assert hist.get("00", (0, 0))[0] == pair_counts.get(0, 0)
    assert hist.get("01", (0, 0))[0] == pair_counts.get(1, 0)
    total = sum(n for n, _ in hist.values())
    assert total >= sum(pair_counts.values())
    assert sum(p for _, p in hist.values()) <= 1000  # integral floor shares


def test_events_interarrival_percentiles_planted(spark, tmp_path):
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as ev

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta
    rows = [
        (1, t0, 1, "view", 1.0, None),
        (2, t0 + s(seconds=10), 1, "view", 1.0, None),   # gap 10
        (3, t0 + s(seconds=30), 1, "view", 1.0, None),   # gap 20
        (4, t0 + s(seconds=60), 1, "view", 1.0, None),   # gap 30
        (5, t0, 2, "click", 1.0, None),                   # first event: no gap
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: (r.n_gaps, r.p50_s, r.p90_s, r.p99_s)
        for r in ev.q_events_interarrival_percentiles(
            spark, str(tmp_path)
        ).collect()
    }
    # gaps [10, 20, 30]: p50 = 20, p90 = 28 (linear interp), p99 = 29.8
    assert out == {"view": (3, 20.0, 28.0, 29.8)}


def test_corpus_saturation_planted_decile_novelty(spark, tmp_path):
    from sap_sql_engine_spark.operators import textanalysis

    # doc_ids 0..9 over a span of 10 -> decile == doc_id. Docs 0-4 repeat
    # one gram (new only in decile 0); docs 5-9 each introduce a new gram.
    rows = [(i, "a b c", "en", "s", 5) for i in range(5)] + [
        (i, f"w{i} x{i} y{i}", "en", "s", 8) for i in range(5, 10)
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = [
        (r.decile, r.n_occurrences, r.n_new_types, r.novelty_permille)
        for r in textanalysis.q_corpus_saturation_curve(
            spark, str(tmp_path)
        ).collect()
    ]
    expect = [(0, 1, 1, 1000)] + [(d, 1, 0, 0) for d in range(1, 5)] + [
        (d, 1, 1, 1000) for d in range(5, 10)
    ]
    assert out == expect


def test_dedup_cluster_histogram_planted(spark, tmp_path):
    from sap_sql_engine_spark.operators import dedup

    texts = ["copy a"] * 3 + ["copy b"] * 2 + ["unique c"]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = [
        (r.size_class, r.n_clusters, r.n_docs, r.doc_share_permille)
        for r in dedup.q_dedup_cluster_histogram(spark, str(tmp_path)).collect()
    ]
    assert out == [("1", 1, 1, 166), ("2", 1, 2, 333), ("3-4", 1, 3, 500)]


def test_spearman_planted_perfect_monotone(spark, tmp_path):
    from sap_sql_engine_spark.operators import textanalysis

    rows = []
    # source 'up': quality rises with length (more stopwords, higher word
    # term) -> spearman exactly +1; source 'down': longer docs are mostly
    # digits (alpha ratio collapses) -> spearman exactly -1
    for i, k in enumerate((10, 20, 30, 40), 1):
        t = ("the " * k).strip()
        rows.append((i, t, "en", "up", len(t)))
    for i, k in enumerate((1, 3, 5, 7), 10):
        t = "the " + ("1 " * k).strip()
        rows.append((i, t, "en", "down", len(t)))
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r.source: (r.n_docs, r.spearman)
        for r in textanalysis.q_docs_length_quality_spearman(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {"up": (4, 1.0), "down": (4, -1.0)}


def test_token_burstiness_planted(spark, tmp_path):
    from sap_sql_engine_spark.operators import textanalysis

    rows = [
        (1, "x x x x y", "en", "s", 9),
        (2, "y z", "en", "s", 3),
        (3, "y", "en", "s", 1),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r.token: (r.cf, r.df, r.df_per_1000_occ, r.occ_ppm)
        for r in textanalysis.q_token_burstiness_report(
            spark, str(tmp_path)
        ).collect()
    }
    # 8 tokens total: x bursty (df 1 / cf 4), y spread (df 3 / cf 3)
    assert out["x"] == (4, 1, 250, 500_000)
    assert out["y"] == (3, 3, 1000, 375_000)
    assert out["z"] == (1, 1, 1000, 125_000)


def test_hll_intersection_planted_overlap(spark, tmp_path):
    from sap_sql_engine_spark.operators import search

    # side A (src0): tokens t0..t9; side B (src1): t5..t14 -> exact
    # union 15, intersection 5. Estimates carry the 256-bucket envelope.
    a = " ".join(f"t{i}" for i in range(10))
    b = " ".join(f"t{i}" for i in range(5, 15))
    rows = [(1, a, "en", "src0", len(a)), (2, b, "en", "src1", len(b))]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = search.q_hll_intersection_estimate(spark, str(tmp_path)).collect()[0]
    assert (r.exact_union, r.exact_intersection) == (15, 5)
    # small-range-corrected estimates: linear counting at this scale is
    # tight — allow the same generous envelope the HLL property test uses
    assert 0 < r.est_a <= 20 and 0 < r.est_b <= 20
    assert 10 <= r.est_union <= 25
    assert r.est_intersection >= 0
    assert r.err_bp is not None


def test_kanonymity_planted_violations(spark, tmp_path):
    # segment S: QI group (nation 1) has 5 rows mixed standing -> safe;
    #            QI group (nation 2) has 2 rows, both credit -> k-violating
    #            AND homogeneous (l = 1)
    # segment T: one group of 6, all debt -> k-safe but homogeneous
    rows = (
        [(i, 1, "S", 10.0 if i % 2 else -10.0) for i in range(5)]
        + [(10, 2, "S", 1.0), (11, 2, "S", 2.0)]
        + [(20 + i, 3, "T", -5.0) for i in range(6)]
    )
    _write(
        spark,
        tmp_path,
        "customer",
        rows,
        "c_custkey long, c_nationkey long, c_mktsegment string, c_acctbal double",
    )
    out = [
        (
            r.segment,
            r.n_groups,
            r.n_rows,
            r.min_group_size,
            r.n_viol_groups,
            r.n_viol_rows,
            r.l_min,
            r.n_homogeneous_groups,
        )
        for r in govqueries.q_kanonymity_report(spark, str(tmp_path)).collect()
    ]
    assert out == [
        ("S", 2, 7, 2, 1, 2, 1, 1),
        ("T", 1, 6, 6, 0, 0, 1, 1),
    ]
