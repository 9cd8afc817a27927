"""Invariants for the scale-pattern operators: PQ/ADC ranking, bucketed
range join plan shape, multi-resolution rollup partial-reuse equality."""

from pyspark.sql import functions as F

from sap_sql_engine_spark.operators import similarity
from sap_sql_engine_spark.sources.loader import table
from sap_sql_engine_spark.streaming import events as ev
from sap_sql_engine_spark.operators.relational import q_ship_promo_windows


def test_pq_adc_topk_contract(spark, sf_dir):
    rows = similarity.q_ann_pq_adc(spark, sf_dir).collect()
    assert 0 < len(rows) <= similarity.TOPK
    dists = [r.adc_dist for r in rows]
    assert dists == sorted(dists)
    for r in rows:
        codes = [int(c) for c in r.pq_code.split(",")]
        assert len(codes) == similarity.PQ_M
        assert all(0 <= c < similarity.PQ_K for c in codes)
    # ADC distances approximate true L2: the quantization error is bounded
    # by the per-subspace k-means residual, so top ADC neighbors should be
    # genuinely close — sanity: best ADC distance under the corpus median
    emb = table(spark, sf_dir, "embeddings")
    assert rows[0].adc_dist < 64.0  # unit-ish synthetic vectors, d=64


def test_ship_promo_windows_is_hash_join_not_bnlj(spark, sf_dir):
    df = q_ship_promo_windows(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.window_start.endswith("-01")  # windows start at month start
        assert r.n_lines > 0 and r.revenue > 0


def test_daily_rollup_equals_direct_daily(spark, sf_dir):
    via_partials = {
        (r.window_start, r.event_type): (r.event_count, r.value_sum)
        for r in ev.q_events_daily_rollup(spark, sf_dir).collect()
    }
    direct = {
        (r.window_start, r.event_type): (r.event_count, r.value_sum)
        for r in ev._events(spark, sf_dir)
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("value_sum"),
        )
        .collect()
    }
    assert via_partials == direct


def test_salted_join_equals_plain_join(spark, sf_dir):
    from sap_sql_engine_spark.operators import skew

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    salted = skew.salted_join(orders, cust, ["o_custkey"])
    plain = orders.join(cust, "o_custkey")
    assert salted.count() == plain.count()
    a = {tuple(r) for r in salted.groupBy("c_mktsegment").count().collect()}
    b = {tuple(r) for r in plain.groupBy("c_mktsegment").count().collect()}
    assert a == b


def test_events_user_rolling_counts_self_and_window(spark, sf_dir):
    rows = ev.q_events_user_rolling(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_trailing_hour >= 1  # RANGE frame includes the current row


def test_sorted_neighborhood_pairs_contract(spark, sf_dir):
    from sap_sql_engine_spark.operators import dedup

    rows = dedup.q_dedup_sorted_neighborhood(spark, sf_dir).collect()
    assert rows, "planted dups share normalized prefixes at sf0.001"
    for r in rows:
        assert r.doc1 < r.doc2
        assert dedup.SNM_THRESHOLD <= r.jaccard <= 1.0
    # SNM finds planted exact-ish dups that LSH also finds: the two methods
    # must agree on pairs whose blocking keys sort adjacently
    lsh = {(r.doc1, r.doc2) for r in dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()}
    snm = {(r.doc1, r.doc2) for r in rows}
    assert snm & lsh, "no overlap between SNM and shingle-Jaccard pairs"


def test_incremental_dedup_batch_side_only(spark, sf_dir):
    from sap_sql_engine_spark.operators import dedup

    docs = table(spark, sf_dir, "documents")
    batch_ids = {
        r.doc_id
        for r in docs.filter(F.col("source") == dedup.INCR_BATCH_SOURCE)
        .select("doc_id")
        .collect()
    }
    rows = dedup.q_dedup_incremental(spark, sf_dir).collect()
    for r in rows:
        assert r.new_doc in batch_ids
        assert r.corpus_doc not in batch_ids
        assert 0.0 <= r.est_jaccard <= 1.0


def test_streaming_daily_matches_batch(spark, sf_dir):
    q = ev.streaming_daily_rollup(spark, sf_dir)
    try:
        q.processAllAvailable()
        stream = {
            (r.window_start, r.event_type): (r.event_count, r.value_sum)
            for r in spark.sql("SELECT * FROM events_daily_stream").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.window_start, r.event_type): (r.event_count, r.value_sum)
        for r in ev.q_events_daily_rollup(spark, sf_dir).collect()
    }
    assert stream == batch


def test_compact_sizes_by_bytes(spark, tmp_path):
    from sap_sql_engine_spark.sources import layout

    # write a deliberately fragmented table (32 shuffle files)
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compacted")
    spark.range(0, 200_000).repartition(32).write.parquet(src)
    import glob

    assert len(glob.glob(src + "/*.parquet")) > 8
    n = layout.compact(spark, src, dst, target_file_mb=256)
    assert n == 1  # well under one 256MB target -> single file
    assert spark.read.parquet(dst).count() == 200_000


def test_generic_asof_join_matches_naive(spark):
    from sap_sql_engine_spark.operators.asof import asof_join

    trades = spark.createDataFrame(
        [(1, 10, "t1"), (1, 20, "t2"), (1, 5, "t0"), (2, 15, "t3"), (3, 9, "t4")],
        ["acct", "ts", "trade_id"],
    )
    quotes = spark.createDataFrame(
        [(1, 8, 100.0), (1, 10, 101.0), (1, 19, 102.0), (2, 15, 200.0), (2, 16, 201.0)],
        ["acct", "ts", "price"],
    )
    out = {
        r.trade_id: r.price
        for r in asof_join(trades, quotes, by="acct", ts="ts", right_cols=["price"]).collect()
    }
    # t0 (ts=5): no prior quote; t1 (ts=10): equal-ts quote counts -> 101;
    # t2 (ts=20): latest prior is 102; t3 (ts=15): equal-ts -> 200;
    # t4: account 3 has no quotes at all
    assert out == {"t0": None, "t1": 101.0, "t2": 102.0, "t3": 200.0, "t4": None}


def test_generic_asof_join_null_payload_not_skipped(spark):
    # a genuinely-NULL payload on the most recent right row must surface as
    # NULL — not silently fall back to an older non-null value (the struct
    # presence-carry fix; a bare last(ignorenulls) on the payload column
    # cannot tell "no prior right row" from "prior right row, NULL value")
    from sap_sql_engine_spark.operators.asof import asof_join

    trades = spark.createDataFrame([(1, 20, "t1")], ["acct", "ts", "trade_id"])
    quotes = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, None)],
        "acct INT, ts INT, price DOUBLE",
    )
    [row] = asof_join(trades, quotes, by="acct", ts="ts", right_cols=["price"]).collect()
    assert row.price is None


def test_generic_asof_matches_event_query_shape(spark, sf_dir):
    # the generic operator reproduces the specialized events as-of query
    from sap_sql_engine_spark.operators.asof import asof_join

    evd = ev._events(spark, sf_dir).withColumn("ts_us", F.expr("unix_micros(ts)"))
    purchases = evd.filter(F.col("event_type") == ev.ASOF_LEFT).select(
        "user_id", F.col("ts_us").alias("tsu"), F.col("event_id")
    )
    clicks = evd.filter(F.col("event_type") == ev.ASOF_RIGHT).select(
        "user_id", F.col("ts_us").alias("tsu"), F.col("event_id").alias("click_id")
    )
    generic = {
        (r.event_id): r.click_id
        for r in asof_join(
            purchases, clicks, by="user_id", ts="tsu",
            right_cols=["click_id"], tiebreak="event_id",
        ).collect()
        if r.click_id is not None
    }
    specialized = {
        r.event_id: r.prior_click_id
        for r in ev.q_events_asof_prior_click(spark, sf_dir).collect()
    }
    assert generic == specialized


def test_streaming_foreachbatch_table_matches_batch(spark, sf_dir, tmp_path):
    out = str(tmp_path / "hourly_table")
    q = ev.streaming_rollup_to_table(spark, sf_dir, out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    written = {
        (r.window_start, r.event_type): (r.event_count, r.value_sum)
        for r in spark.read.parquet(out)
        .select("window_start", "event_type", "event_count", "value_sum")
        .collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.event_count, r.value_sum)
        for r in ev.q_events_hourly_rollup(spark, sf_dir).collect()
    }
    assert written == batch
    # idempotence: re-running the stream over the same data converges to the
    # same table (partition overwrite, not append)
    q2 = ev.streaming_rollup_to_table(spark, sf_dir, out)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    again = {
        (r.window_start, r.event_type): (r.event_count, r.value_sum)
        for r in spark.read.parquet(out)
        .select("window_start", "event_type", "event_count", "value_sum")
        .collect()
    }
    assert again == written


def test_streaming_sessionize_tws_matches_batch(spark, sf_dir):
    # the modern stateful API (transformWithStateInPandas + RocksDB state
    # store) produces the same sessionization as the batch window fold.
    # The TWS state-server protocol needs google.protobuf, which this
    # container lacks — SKIP (never fake) when it is genuinely absent,
    # same policy as the Pillow-gated image decode.
    #
    # WONTFIX in-container (r4 adjudication): no protobuf runtime exists
    # anywhere in the environment (only typeshed stubs), installs are
    # prohibited, and vendoring is not viable — pyspark's generated
    # StateMessage_pb2 drives the full descriptor-pool/builder/message
    # runtime, so a stub shim would amount to reimplementing protobuf.
    # The twin runs green on any standard cluster image (protobuf ships
    # with pyspark[connect] / every Databricks/EMR runtime); the
    # applyInPandasWithState sessionize twin covers the stream==batch
    # equivalence in this container.
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("transformWithStateInPandas needs google.protobuf (absent here)")
    q = ev.streaming_sessionize_tws(spark, sf_dir)
    try:
        q.processAllAvailable()
        stream = {
            r.user_id: (r.session_count, r.total_events, r.max_session_events)
            for r in spark.sql("SELECT * FROM events_sessionize_tws").collect()
        }
    finally:
        q.stop()
    batch = {
        r.user_id: (r.session_count, r.total_events, r.max_session_events)
        for r in ev.q_events_sessionize(spark, sf_dir).collect()
    }
    assert stream == batch


def test_session_native_equals_laggap_at_exact_boundary(spark):
    # an inter-event gap of EXACTLY the session gap must merge in BOTH the
    # lag-gap form (gap > threshold starts new) and the native
    # session_window twin (Spark's session-end bound is INCLUSIVE:
    # next_ts <= prev_ts + gap merges); one microsecond more must split in
    # both
    import datetime

    from pyspark.sql import functions as F

    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    us = datetime.timedelta(microseconds=1)
    gap = datetime.timedelta(seconds=ev.SESSION_GAP_SECONDS)
    rows = [
        (1, 1, t0), (2, 1, t0 + gap),            # exactly 1800 s -> one session
        (3, 2, t0), (4, 2, t0 + gap + us),       # 1800 s + 1 us -> two sessions
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    laggap = {r.user_id: r.session_count for r in ev.sessionize_from(df).collect()}
    sw = F.session_window(F.col("ts"), f"{ev.SESSION_GAP_SECONDS} seconds")
    native = {
        r.user_id: r.n
        for r in df.groupBy("user_id", sw).count()
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert laggap == native == {1: 1, 2: 2}


def test_streaming_session_native_matches_batch(spark, sf_dir):
    # the built-in session_window streaming aggregation reproduces the batch
    # twin: fold the update-mode emissions per user and compare
    q = ev.streaming_session_native(spark, sf_dir)
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM events_session_native_stream").collect()
    finally:
        q.stop()
    per = {}
    for r in rows:  # last-writer-wins per (user, session start)
        per[(r.user_id, r.session_start)] = r.events_in_session
    stream_summary = {}
    for (u, _), n in per.items():
        sc, te, mx = stream_summary.get(u, (0, 0, 0))
        stream_summary[u] = (sc + 1, te + n, max(mx, n))
    batch = {
        r.user_id: (r.session_count, r.total_events, r.max_session_events)
        for r in ev.q_events_session_native(spark, sf_dir).collect()
    }
    assert stream_summary == batch


def test_streaming_latest_state_matches_batch(spark, sf_dir):
    q = ev.streaming_latest_state(spark, sf_dir)
    try:
        q.processAllAvailable()
        stream = {}
        for r in spark.sql("SELECT * FROM events_latest_state_stream").collect():
            stream[r.user_id] = (r.last_event_id, r.last_event_type, r.last_ts, r.n_events)
    finally:
        q.stop()
    batch = {
        r.user_id: (r.last_event_id, r.last_event_type, r.last_ts, r.n_events)
        for r in ev.q_events_latest_state(spark, sf_dir).collect()
    }
    assert stream == batch


def test_scd2_history_invariants(spark, sf_dir):
    rows = ev.q_events_scd2(spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    total = 0
    for u, hist in by_user.items():
        hist.sort(key=lambda r: r.version)
        # versions are 1..n dense; exactly one open (current) interval
        assert [h.version for h in hist] == list(range(1, len(hist) + 1))
        assert sum(h.is_current for h in hist) == 1 and hist[-1].is_current == 1
        for a, b in zip(hist, hist[1:]):
            # intervals chain: valid_to == next valid_from, history is
            # compressed (adjacent runs differ), time strictly advances
            assert a.valid_to == b.valid_from
            assert a.event_type != b.event_type
            assert a.valid_from < b.valid_from
        assert hist[-1].valid_to is None
        total += sum(h.n_events for h in hist)
    # every event is in exactly one interval
    assert total == ev._events(spark, sf_dir).count()
    # SCD2 collapses to SCD1: the open interval agrees with latest-state
    latest = {
        r.user_id: r.last_event_type
        for r in ev.q_events_latest_state(spark, sf_dir).collect()
    }
    current = {u: h[-1].event_type for u, h in by_user.items()}
    assert current == latest


def test_zorder_beats_single_dim_sorts(spark, sf_dir):
    # data-skipping payoff, measured as expected files touched by a random
    # single-value predicate on each dimension (sum over files of that
    # file's span fraction of the dimension's range). A linear sort is ~1
    # on its own dimension and ~ALL files on the other; z-order bounds
    # BOTH near sqrt(n_files). Assert the worst-dimension cost under
    # z-order beats both linear sorts' worst dimension by >= 2x.
    import datetime as dt

    from sap_sql_engine_spark.operators import skew
    from sap_sql_engine_spark.operators.ranks import with_global_rank

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    n = orders.count()
    b = orders.select(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_orderdate").cast("date"), F.max("o_orderdate").cast("date"),
    ).first()
    c_range = b[1] - b[0] + 1
    d_range = (b[3] - b[2]).days + 1

    def worst_dim_cost(stats_rows):
        ck = dd = 0.0
        for r in stats_rows:
            d0 = dt.date.fromisoformat(r.date_lo)
            d1 = dt.date.fromisoformat(r.date_hi)
            ck += (r.custkey_hi - r.custkey_lo + 1) / c_range
            dd += ((d1 - d0).days + 1) / d_range
        return max(ck, dd)

    z_cost = worst_dim_cost(skew.q_zorder_layout_stats(spark, sf_dir).collect())

    def single_dim_cost(*order_cols):
        ranked = with_global_rank(orders, *order_cols, "o_orderkey")
        bucket = F.expr(f"((rn - 1) * {skew.ZORDER_BUCKETS}) DIV {n}")
        rows = (
            ranked.withColumn("file_id", bucket)
            .groupBy("file_id")
            .agg(
                F.min("o_custkey").alias("custkey_lo"),
                F.max("o_custkey").alias("custkey_hi"),
                F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("date_lo"),
                F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("date_hi"),
            )
            .collect()
        )
        return worst_dim_cost(rows)

    by_custkey = single_dim_cost("o_custkey")
    by_date = single_dim_cost("o_orderdate")
    assert z_cost * 2 <= min(by_custkey, by_date), (z_cost, by_custkey, by_date)


def test_zorder_files_balanced_and_cover_all_rows(spark, sf_dir):
    from sap_sql_engine_spark.operators import skew

    rows = skew.q_zorder_layout_stats(spark, sf_dir).collect()
    assert len(rows) == skew.ZORDER_BUCKETS
    n = table(spark, sf_dir, "orders").count()
    assert sum(r.n_rows for r in rows) == n
    for r in rows:  # equal-count split: every file within 1 row of n/buckets
        assert abs(r.n_rows - n / skew.ZORDER_BUCKETS) <= 1


def test_rp_reduce_matches_jl_theory(spark, sf_dir):
    # the calibration report must look like Johnson-Lindenstrauss says it
    # should: errors concentrate at sigma = 1/sqrt(RP_DIM) (Gaussian-ish:
    # ~68%/95% within 1/2 sigma, loosened for a 500-vector sample)
    import math

    r = similarity.q_embedding_rp_reduce(spark, sf_dir).collect()[0]
    sig_micro = 1_000_000 / math.sqrt(similarity.RP_DIM)
    assert r.n_vecs > 0
    assert 0 < r.mean_abs_err_micro < 1.5 * sig_micro
    assert r.within_1sig / r.n_vecs > 0.45
    assert r.within_2sig / r.n_vecs > 0.85
    assert r.within_1sig <= r.within_2sig <= r.n_vecs
    assert r.max_abs_err_micro <= 2_000_000  # cosine difference is bounded


def test_runtime_bloom_filter_injects_and_preserves_results(spark, sf_dir):
    # the engine-native semi-join prefilter: with runtime bloom filters on,
    # the selective orders side is sketched and pushed into lineitem's scan
    # stage as BloomFilterMightContain; results must equal the plain join
    from sap_sql_engine_spark.operators import skew

    def q():
        li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        o = table(spark, sf_dir, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        ).select("o_orderkey")
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
            )
        )

    plain = q().collect()[0]
    with skew.runtime_bloom_filters(spark):
        df = q()
        assert skew.expression_class_present(df, "BloomFilterMightContain")
        bloomed = df.collect()[0]
    assert (plain.n, plain.qty) == (bloomed.n, bloomed.qty)
    # and the session is back to defaults afterwards
    assert not skew.expression_class_present(q(), "BloomFilterMightContain")


def test_streaming_scd2_matches_batch(spark, sf_dir):
    q = ev.streaming_scd2(spark, sf_dir)
    try:
        q.processAllAvailable()
        stream = {}
        for r in spark.sql("SELECT * FROM events_scd2_stream").collect():
            stream[(r.user_id, r.version)] = (
                r.event_type, r.valid_from, r.valid_to, r.is_current, r.n_events
            )
    finally:
        q.stop()
    batch = {
        (r.user_id, r.version): (
            r.event_type, r.valid_from, r.valid_to, r.is_current, r.n_events
        )
        for r in ev.q_events_scd2(spark, sf_dir).collect()
    }
    assert stream == batch


def test_write_zordered_real_footer_stats(spark, sf_dir, tmp_path):
    # the write-side proof: actual parquet footers of a z-ordered write
    # carry tight bounding boxes on BOTH dimensions, beating a date-sorted
    # write's worst dimension by >= 2x (same metric as the read-side test,
    # but measured from the files a scan would actually prune with)
    import duckdb

    from sap_sql_engine_spark.operators import skew
    from sap_sql_engine_spark.sources import layout

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    b = orders.select(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))),
        F.max(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))),
    ).first()
    c0, c1, d0, d1 = (int(x) for x in b)
    scale = (1 << skew.ZORDER_BITS) - 1
    u1 = F.expr(f"(o_custkey - {c0}) * {scale} DIV {max(c1 - c0, 1)}").cast("int")
    u2 = F.expr(
        f"(datediff(o_orderdate, DATE '1970-01-01') - {d0}) * {scale} DIV {max(d1 - d0, 1)}"
    ).cast("int")

    zpath = str(tmp_path / "orders_z")
    dpath = str(tmp_path / "orders_d")
    layout.write_zordered(orders, zpath, skew._zvalue(u1, u2), n_files=16)
    (
        orders.repartitionByRange(16, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(dpath)
    )

    def worst_dim_cost(path):
        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT file_name, path_in_schema,
                   min(stats_min_value) AS lo, max(stats_max_value) AS hi
            FROM parquet_metadata('{path}/*.parquet')
            WHERE path_in_schema IN ('o_custkey', 'o_orderdate')
            GROUP BY 1, 2
            """
        ).fetchall()
        import datetime as dt

        boxes: dict[str, dict[str, tuple]] = {}
        for fn, col, lo, hi in rows:
            boxes.setdefault(fn, {})[col] = (lo, hi)
        ck = dd = 0.0
        for cols in boxes.values():
            klo, khi = (int(v) for v in cols["o_custkey"])
            ck += (khi - klo + 1) / (c1 - c0 + 1)
            tlo, thi = (
                dt.datetime.fromisoformat(v).date() for v in cols["o_orderdate"]
            )
            dd += ((thi - tlo).days + 1) / (d1 - d0 + 1)
        assert len(boxes) == 16
        return max(ck, dd)

    z_cost = worst_dim_cost(zpath)
    d_cost = worst_dim_cost(dpath)
    assert z_cost * 2 <= d_cost, (z_cost, d_cost)


def test_retention_cohorts_invariants(spark, sf_dir):
    rows = ev.q_events_retention_cohorts(spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_day, []).append(r)
    total_users = 0
    for day, rs in by_cohort.items():
        offs = {r.day_offset: r for r in rs}
        # offset 0 is full retention by construction (first-seen day)
        assert offs[0].active_users == offs[0].cohort_users
        assert offs[0].retention == 1.0
        for r in rs:
            assert 0 <= r.active_users <= r.cohort_users
            assert abs(r.retention - r.active_users / r.cohort_users) <= 5e-5  # round(.,4)
            assert r.day_offset >= 0
        total_users += offs[0].cohort_users
    # cohorts partition the user base
    n_users = ev._events(spark, sf_dir).select("user_id").distinct().count()
    assert total_users == n_users


def test_parts_copurchase_invariants(spark, sf_dir):
    from sap_sql_engine_spark.operators import relational

    rows = relational.q_parts_copurchase(spark, sf_dir).collect()
    assert rows
    items = (
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    # spot-check the highest-support pair against a direct count
    best = max(rows, key=lambda r: (r.support, r.p1, r.p2))
    direct = (
        items.filter(F.col("l_partkey").isin([best.p1, best.p2]))
        .groupBy("l_orderkey")
        .count()
        .filter("count = 2")
        .count()
    )
    assert best.support == direct
    for r in rows[:50]:
        assert r.p1 < r.p2
        assert r.support >= relational.BASKET_MIN_SUPPORT
        assert r.lift > 0


def test_ann_recall_report_cross_checks(spark, sf_dir):
    rows = {r["index"]: r for r in similarity.q_ann_recall_report(spark, sf_dir).collect()}
    assert set(rows) == {"lsh_bucketed", "lsh_multiprobe", "ivf", "pq_adc"}
    # recompute every (index, probe) leg directly and compare the totals
    fns = {
        "lsh_bucketed": similarity.q_ann_lsh_bucketed,
        "lsh_multiprobe": similarity.q_ann_lsh_multiprobe,
        "ivf": similarity.q_ann_ivf,
        "pq_adc": similarity.q_ann_pq_adc,
    }
    expect = {name: 0 for name in fns}
    for qid in similarity.ANN_RECALL_PROBES:
        exact = {
            r.vec_id
            for r in similarity.q_ann_bruteforce_topk(spark, sf_dir, qid=qid).collect()
        }
        for name, fn in fns.items():
            got = {r.vec_id for r in fn(spark, sf_dir, qid=qid).collect()}
            expect[name] += len(exact & got)
    n = len(similarity.ANN_RECALL_PROBES)
    for name, r in rows.items():
        assert r.hits_total == expect[name], name
        assert r.n_probes == n
        assert abs(r.mean_recall_at_k - r.hits_total / (r.k * n)) <= 5e-5
    # the ladder's documented ordering on this corpus: probing beats
    # single-probe LSH
    assert rows["ivf"].hits_total > rows["lsh_bucketed"].hits_total
    assert rows["lsh_multiprobe"].hits_total > rows["lsh_bucketed"].hits_total


def test_active_users_window_properties(spark, sf_dir):
    rows = {r.day: r for r in ev.q_events_active_users(spark, sf_dir).collect()}
    assert rows
    days = sorted(rows)
    for d in days:
        r = rows[d]
        col = f"wau_{ev.ACTIVE_WINDOW_DAYS}d"
        assert r.dau <= r[col]  # window includes the day itself
    # wau on the first observed day equals dau (no history before it)
    first = rows[days[0]]
    assert first[f"wau_{ev.ACTIVE_WINDOW_DAYS}d"] == first.dau


def test_shard_assignment_balanced(spark, sf_dir):
    from sap_sql_engine_spark.operators import textanalysis as ta

    rows = ta.q_docs_shard_assignment(spark, sf_dir).collect()
    assert len(rows) == ta.N_SHARDS
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    sums = [r.token_sum for r in rows]
    # the LPT-style round-robin deal: every shard within one max-doc of
    # the heaviest shard
    assert max(sums) - min(sums) <= max(r.max_doc_tokens for r in rows)
    assert max(r.n_docs for r in rows) - min(r.n_docs for r in rows) <= 1


def test_write_with_bloom_grows_footer_and_roundtrips(spark, sf_dir, tmp_path):
    # duckdb/pyarrow in this container don't expose bloom offsets, so the
    # evidence is behavioral: the bloom-enabled write must carry extra
    # footer bytes (~ndv*10 bits per file) and read back identically
    import glob
    import os

    from sap_sql_engine_spark.sources import layout

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    orders.coalesce(1).write.mode("overwrite").parquet(plain)
    layout.write_with_bloom(
        orders.coalesce(1), bloomed, ["o_custkey"], ndv=10_000,
        force_plain_encoding=True,  # tiny data stays dictionary-encoded otherwise
    )

    def nbytes(path):
        return sum(os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet")))

    assert nbytes(bloomed) > nbytes(plain) + 4096, (nbytes(bloomed), nbytes(plain))
    back = spark.read.parquet(bloomed)
    assert back.count() == orders.count()
    assert back.selectExpr("sum(o_custkey)").first()[0] == orders.selectExpr(
        "sum(o_custkey)"
    ).first()[0]


def test_heavy_hitters_candidate_pass_is_shuffle_free(spark, sf_dir):
    # pin the scale claim structurally: no shuffle exchange exists BELOW
    # the mapInPandas candidate stage — pass 1 reads the scan directly
    from sap_sql_engine_spark.operators import search
    from sap_sql_engine_spark.sources.layout import _exec_nodes

    df = search.q_token_heavy_hitters(spark, sf_dir)

    def subtree_has_shuffle(node):
        # spread()'s round-robin fan-out of a single-file scan is a local
        # parallelism fix (a no-op at scale), not a keyed shuffle — only
        # HASH-partitioned exchanges violate the shuffle-free claim
        if (
            node.getClass().getSimpleName() == "ShuffleExchangeExec"
            and node.outputPartitioning().getClass().getSimpleName()
            == "HashPartitioning"
        ):
            return True
        kids = node.children()
        return any(subtree_has_shuffle(kids.apply(i)) for i in range(kids.size()))

    map_nodes = [
        n for n in _exec_nodes(df)
        if n.getClass().getSimpleName() == "MapInPandasExec"
    ]
    assert map_nodes, "candidate stage missing from plan"
    for n in map_nodes:
        kids = n.children()
        assert not any(
            subtree_has_shuffle(kids.apply(i)) for i in range(kids.size())
        ), "pass-1 candidate generation must stay shuffle-free"


def test_dq_checks_planted_violations(spark, tmp_path):
    # a tiny orders/customer pair with one planted violation per check
    from sap_sql_engine_spark.operators import relational

    import datetime as dt

    rows = [
        # (orderkey, custkey, totalprice, orderdate, status)
        (1, 10, 100.0, dt.datetime(1995, 1, 1), "O"),   # clean
        (1, 10, 100.0, dt.datetime(1995, 1, 2), "F"),   # dup orderkey (2 rows)
        (2, 99, 50.0, dt.datetime(1995, 2, 1), "O"),    # orphan custkey
        (3, 10, -5.0, dt.datetime(1995, 3, 1), "P"),    # non-positive total
        (4, 10, 10.0, dt.datetime(2001, 1, 1), "O"),    # date out of domain
        (5, 10, 10.0, dt.datetime(1995, 4, 1), "X"),    # bad enum
        (6, None, 10.0, dt.datetime(1995, 5, 1), "O"),  # null custkey
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, "
              "o_orderdate timestamp, o_orderstatus string"
    )
    cust = spark.createDataFrame([(10,)], "c_custkey long")
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    cust.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    got = {
        r["check"]: (r.violations, r.passed)
        for r in relational.q_dq_orders_checks(spark, str(tmp_path)).collect()
    }
    assert got == {
        "orderkey_unique": (2, 0),        # both rows of the dup key count
        "custkey_fk_integrity": (2, 0),   # orphan 99 + NULL custkey never matches
        "totalprice_positive": (1, 0),
        "orderdate_in_domain": (1, 0),
        "orderstatus_enum": (1, 0),
        "custkey_not_null": (1, 0),
    }


def test_knn_accuracy_planted_clusters(spark, tmp_path):
    # 4 labels x 10 vectors, each label clustered around an orthogonal
    # axis with tiny deterministic jitter: leave-one-out 5-NN must score
    # accuracy 1.0 for every label
    import math

    rows = []
    vid = 0
    for lbl in range(4):
        for j in range(10):
            v = [0.0] * 64
            v[lbl * 16] = 1.0
            v[lbl * 16 + 1 + (j % 8)] = 0.05 + 0.001 * j  # jitter within cluster
            rows.append((vid, v, lbl))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    from sap_sql_engine_spark.operators import similarity

    out = similarity.q_embedding_knn_accuracy(spark, str(tmp_path)).collect()
    assert out
    for r in out:
        assert r.accuracy == 1.0, (r.label, r.accuracy)
        assert r.correct == r.n


def test_knn_accuracy_real_corpus_consistency(spark, sf_dir):
    rows = similarity.q_embedding_knn_accuracy(spark, sf_dir).collect()
    assert rows
    n_eval = sum(r.n for r in rows)
    for r in rows:
        assert 0 <= r.correct <= r.n
        assert abs(r.accuracy - r.correct / r.n) <= 5e-5
        assert abs(r.label_prior - r.n / n_eval) <= 5e-5


def test_anomaly_hours_planted_spike(spark, tmp_path):
    # flat 10-events-per-hour baseline with one 100-event spike: only the
    # spike hour may flag, and early hours with no baseline emit NULL z
    import datetime as dt

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for h in range(48):
        n = 100 if h == 30 else 10
        for i in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, seconds=i), 1))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r.hour: r for r in ev.q_events_anomaly_hours(spark, str(tmp_path)).collect()}
    assert len(out) == 48
    spike = out["2024-01-02 06:00:00"]
    assert spike.event_count == 100 and spike.is_anomaly == 1
    assert sum(r.is_anomaly for r in out.values()) == 1
    first = out["2024-01-01 00:00:00"]
    assert first.z_score is None and first.is_anomaly == 0  # no baseline yet
    # flat hours before the spike have zero variance -> NULL z, no flag
    assert out["2024-01-01 05:00:00"].z_score is None


def test_cohort_ltv_invariants(spark, sf_dir):
    from decimal import Decimal

    from sap_sql_engine_spark.operators import relational

    rows = relational.q_customer_cohort_ltv(spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_month, []).append(r)
    for cm, rs in by_cohort.items():
        rs.sort(key=lambda r: r.month_offset)
        assert rs[0].month_offset == 0  # a cohort exists because of its first order
        cum = 0.0
        for r in rs:
            cum = round(cum + r.revenue, 2)
            assert abs(r.cum_revenue - cum) < 0.02  # double re-accumulation slack
            assert r.ltv_per_customer <= r.cum_revenue / r.n_customers + 0.01
            assert r.n_customers == rs[0].n_customers  # constant per cohort
    # total matrix revenue equals total order revenue
    total = sum(r.revenue for r in rows)
    expect = float(
        table(spark, sf_dir, "orders")
        .selectExpr("sum(cast(o_totalprice as decimal(18,2)))")
        .first()[0]
    )
    assert abs(total - expect) < 1.0  # per-cell cent rounding accumulates


def test_power_users_gini_matches_python(spark, sf_dir):
    import math

    r = ev.q_events_power_users(spark, sf_dir).collect()[0]
    counts = sorted(
        c for (c,) in ev._events(spark, sf_dir)
        .groupBy("user_id").count().select("count").collect()
    )
    n, total = len(counts), sum(counts)
    wsum = sum((2 * (i + 1) - 1) * c for i, c in enumerate(counts))
    gini = math.floor((wsum - n * total) / (n * total) * 1e6) / 1e6
    assert r.n_users == n and r.n_events == total
    assert abs(r.gini - gini) < 1e-9
    assert 0 <= r.gini < 1
    assert r.top1pct_share <= r.top10pct_share <= 1.0
    # the k largest users hold at least k/n of events (their mean >= global
    # mean) — the exact bound, valid even when n//10 rounds down to 1 user
    top10_n = max(1, n // 10)
    assert r.top10pct_share >= top10_n / n - 1e-4


def test_vocab_growth_monotone_and_consistent(spark, sf_dir):
    from sap_sql_engine_spark.operators import textanalysis as ta

    rows = ta.q_docs_vocab_growth(spark, sf_dir).collect()
    assert rows
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        rs.sort(key=lambda r: r.doc_id)
        assert rs[0].cum_tokens == rs[0].token_count
        assert rs[0].cum_vocab == rs[0].new_types
        for a, b in zip(rs, rs[1:]):
            assert b.cum_tokens == a.cum_tokens + b.token_count
            assert b.cum_vocab == a.cum_vocab + b.new_types
            assert b.new_types <= b.token_count
        # final vocab equals the source's distinct-token count
        distinct = (
            ta.spread(table(spark, sf_dir, "documents"))
            .filter(F.col("source") == src)
            .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"))
            .distinct()
            .count()
        )
        assert rs[-1].cum_vocab == distinct


def test_rfm_segments_quartiles_balanced(spark, sf_dir):
    from sap_sql_engine_spark.operators import relational

    rows = relational.q_customer_rfm_segments(spark, sf_dir).collect()
    assert rows
    n_custs = sum(r.n_customers for r in rows)
    expect = (
        table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert n_custs == expect  # every ordering customer lands in a segment
    # each dimension's quartiles are balanced within 1 (rank formula)
    for dim in ("r_score", "f_score", "m_score"):
        per_q = {}
        for r in rows:
            per_q[r[dim]] = per_q.get(r[dim], 0) + r.n_customers
        assert set(per_q) == {1, 2, 3, 4}
        assert max(per_q.values()) - min(per_q.values()) <= 1
    for r in rows:
        assert r.segment == f"{r.r_score}-{r.f_score}-{r.m_score}"
        assert r.avg_spend > 0
    # monetary quartile 4 has strictly higher average spend than quartile 1
    m4 = sum(r.avg_spend * r.n_customers for r in rows if r.m_score == 4)
    m4n = sum(r.n_customers for r in rows if r.m_score == 4)
    m1 = sum(r.avg_spend * r.n_customers for r in rows if r.m_score == 1)
    m1n = sum(r.n_customers for r in rows if r.m_score == 1)
    assert m4 / m4n > m1 / m1n


def test_streaming_anomaly_table_matches_batch(spark, sf_dir, tmp_path):
    out = str(tmp_path / "anomaly_table")
    q = ev.streaming_anomaly_to_table(spark, sf_dir, out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream = {
        r.hour: (r.event_count, r.baseline_hours, r.z_score, r.is_anomaly)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r.hour: (r.event_count, r.baseline_hours, r.z_score, r.is_anomaly)
        for r in ev.q_events_anomaly_hours(spark, sf_dir).collect()
    }
    assert stream == batch


def test_streaming_incremental_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Drop-folder incremental dedup: two JSONL drops of the incoming
    batch probe the standing corpus signatures per micro-batch; the
    accumulated matches equal the batch query exactly (stream == batch),
    and ingest work stays batch-sized (the corpus signs once). A crash
    is simulated between the drops (the checkpoint's last commit marker
    is deleted, so the restart REPLAYS epoch 0) — the epoch-keyed
    overwrite sink must absorb the replay without double-appending."""
    import os

    from sap_sql_engine_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.filter(F.col("source") == dedup.INCR_BATCH_SOURCE)
    drop_dir = str(tmp_path / "drops")
    out_dir = str(tmp_path / "matches")

    # first drop arrives before the stream starts, second mid-stream —
    # exercises multi-micro-batch accumulation
    batch.filter(F.col("doc_id") % 2 == 0).write.mode("append").json(drop_dir)
    q = dedup.streaming_incremental_dedup(spark, sf_dir, drop_dir, out_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # crash-replay: offsets/0 survives, commits/0 doesn't -> the restart
    # re-executes epoch 0 against the already-written output
    for marker in ("0", ".0.crc"):  # the crc sidecar must go too, or
        # the replayed commit write fails its rename onto the stale crc
        os.remove(os.path.join(out_dir + "_ckpt", "commits", marker))
    batch.filter(F.col("doc_id") % 2 == 1).write.mode("append").json(drop_dir)
    q = dedup.streaming_incremental_dedup(spark, sf_dir, drop_dir, out_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r.new_doc, r.corpus_doc, r.est_jaccard)
        for r in spark.read.parquet(out_dir).collect()
    )
    want = sorted(
        (r.new_doc, r.corpus_doc, r.est_jaccard)
        for r in dedup.q_dedup_incremental(spark, sf_dir).collect()
    )
    assert got == want
    assert len(got) > 0  # the planted batch has real near-dups to find


def test_streaming_ann_probe_matches_batch(spark, sf_dir, tmp_path):
    """Drop-folder IVF serving: query vectors streamed in two JSONL
    drops probe the standing indexed corpus per micro-batch; accumulated
    top-k equals the batch probe exactly, and the single-query slice
    equals q_ann_ivf's gated result."""
    from sap_sql_engine_spark.operators import similarity as sim
    from sap_sql_engine_spark.sources.loader import spread

    emb = spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    qids = [0, 5, 9]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        "vec_id", "embedding"
    )
    drop_dir = str(tmp_path / "qdrops")
    out_dir = str(tmp_path / "topk")

    queries.filter(F.col("vec_id") == 0).write.mode("append").json(drop_dir)
    q = sim.streaming_ann_probe(spark, sf_dir, drop_dir, out_dir)
    try:
        q.processAllAvailable()
        queries.filter(F.col("vec_id") != 0).write.mode("append").json(
            drop_dir
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r.query_id, r.vec_id, r.list_id, r.cosine)
        for r in spark.read.parquet(out_dir).collect()
    )

    assigned = emb.withColumn("d", F.expr(sim._ivf_dist_expr())).withColumn(
        "list_id", F.expr("array_position(d, array_min(d))")
    )
    want = sorted(
        (r.query_id, r.vec_id, r.list_id, r.cosine)
        for r in sim.ivf_probe_batch(assigned, queries).collect()
    )
    assert got == want
    assert len(got) == 3 * sim.TOPK

    # the query_id=0 slice must be exactly the gated q_ann_ivf result
    gated = sorted(
        (r.vec_id, r.list_id, r.cosine)
        for r in sim.q_ann_ivf(spark, sf_dir).collect()
    )
    slice0 = sorted((v, l, c) for (qid_, v, l, c) in got if qid_ == 0)
    assert slice0 == gated


def test_streaming_admission_funnel(spark, sf_dir, tmp_path):
    """Continuous corpus admission, every gate exercised across two
    drops: a corpus duplicate never admits, a cross-drop duplicate
    admits exactly once (first arrival), an unknown-lang row stops at
    the language gate, a digits-only row stops at the quality gate, and
    a near-copy of a benchmark doc stops at decontamination. The final
    admitted-fingerprint state equals corpus ∪ the two admitted docs.
    A crash is simulated between the drops (commit marker deleted ->
    epoch 0 REPLAYS on restart): the epoch-keyed overwrite sinks and the
    exclude-own-epoch state read must reproduce the same funnel row and
    state, not double them."""
    import os

    from sap_sql_engine_spark.operators import dedup
    from sap_sql_engine_spark.operators.textanalysis import (
        QUALITY_KEEP,
        fingerprint_col,
        quality_expr,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    good = (
        docs.filter(
            (F.col("lang") != "unknown") & (quality_expr() >= QUALITY_KEEP)
        )
        .orderBy("doc_id")
    )
    corpus_text = good.first().text  # passes lang+quality, fp already seen
    bench_text = (
        good.filter(F.col("source") == dedup.CONTAM_BENCH_SOURCE).first().text
    )
    fresh1 = "the cat and the dog sat on the mat near the old door"
    fresh2 = "the red fox and the blue owl met in the old barn today"

    drop_dir = str(tmp_path / "drops")
    out_dir = str(tmp_path / "funnel")
    state_dir = str(tmp_path / "seen_fps")

    def drop(rows):
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("append").json(drop_dir)

    drop(
        [
            (1000001, corpus_text, "en", "feed", len(corpus_text)),
            (1000002, fresh1, "en", "feed", len(fresh1)),
            (1000003, "words here", "unknown", "feed", 10),
            (1000004, "zz the " + bench_text, "en", "feed", 7 + len(bench_text)),
        ]
    )
    q = dedup.streaming_admission_funnel(
        spark, sf_dir, drop_dir, out_dir, state_dir
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # crash-replay: drop the last commit marker so the restart
    # re-executes epoch 0 with its state/funnel partitions already written
    for marker in ("0", ".0.crc"):  # the crc sidecar must go too, or
        # the replayed commit write fails its rename onto the stale crc
        os.remove(os.path.join(out_dir + "_ckpt", "commits", marker))
    drop(
        [
            (1000005, fresh1, "en", "feed", len(fresh1)),  # cross-drop dup
            (1000006, fresh2, "en", "feed", len(fresh2)),
            (1000007, "0 1 2 3 4 5", "en", "feed", 11),  # quality fail
        ]
    )
    q = dedup.streaming_admission_funnel(
        spark, sf_dir, drop_dir, out_dir, state_dir
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = sorted(
        (
            (r.n_arrived, r.n_lang_pass, r.n_quality_pass,
             r.n_new_fingerprint, r.n_admitted)
            for r in spark.read.parquet(out_dir).collect()
        ),
    )
    assert sorted(rows) == sorted([(4, 3, 3, 2, 1), (3, 3, 2, 1, 1)])

    # state = corpus fingerprints ∪ exactly the two admitted docs
    seen = {r.fp for r in spark.read.parquet(state_dir).collect()}
    corpus_fps = {
        r.fp for r in docs.select(fingerprint_col().alias("fp")).collect()
    }
    extra = seen - corpus_fps
    admitted_fps = {
        r.fp
        for r in spark.createDataFrame(
            [(fresh1,), (fresh2,)], "text string"
        ).select(fingerprint_col().alias("fp")).collect()
    }
    assert extra == admitted_fps


def test_dsir_scoring_plan_single_scan_no_bnlj(spark, sf_dir):
    """Pins the DSIR plan shape the optimization bought: the scoring side
    pays exactly ONE corpus scan (the bucket model is served from the
    cached B-row relation, visible as an InMemoryTableScan), and the
    1-row totals ride windows — no nested-loop join anywhere."""
    from sap_sql_engine_spark.operators import textanalysis as ta
    from sap_sql_engine_spark.sources.layout import _exec_nodes

    df = ta.q_dsir_importance(spark, sf_dir)
    df.collect()
    names = [n.getClass().getSimpleName() for n in _exec_nodes(df)]
    assert names.count("FileSourceScanExec") == 1, names
    assert "BroadcastNestedLoopJoinExec" not in names
    assert "InMemoryTableScanExec" in names


def test_streaming_burst_minutes_matches_batch(spark, tmp_path):
    """Stream == batch for the burst/abuse report: per-minute counts
    arrive as FINALIZED watermarked 1-minute windows in the parquet sink
    (each window emits exactly once when the watermark passes its end);
    burst_from_minutes over the sink equals the identical regroup over a
    batch per-minute aggregation of the same dropped rows. A crash is
    simulated between the drops (commit marker deleted -> epoch 0
    REPLAYS on restart): the file-sink metadata log must skip the
    already-committed epoch, never double-counting a minute."""
    import datetime as dt
    import os

    drop_dir = str(tmp_path / "drops")
    out_dir = str(tmp_path / "minutes")

    def drop(rows):
        spark.createDataFrame(
            [
                (u, "click", dt.datetime(2024, 3, 1, h, m, s), 1.0)
                for (u, h, m, s) in rows
            ],
            "user_id long, event_type string, ts timestamp, value double",
        ).write.mode("append").json(drop_dir)

    # user 1 bursts (4 events inside minute 10:00), users 2/3 are spread
    d1 = [(1, 10, 0, 1), (1, 10, 0, 20), (1, 10, 0, 40), (1, 10, 0, 59),
          (2, 10, 0, 30), (2, 10, 2, 0)]
    d2 = [(2, 10, 4, 0), (1, 10, 5, 0), (3, 10, 5, 30), (3, 10, 5, 45)]
    # sentinel: pushes the watermark (2 min delay) past every real
    # minute so all 6 real windows finalize; its OWN 11:00 window stays
    # open forever and must not reach the sink
    flush = [(99, 11, 0, 0)]

    drop(d1)
    q = ev.streaming_burst_minutes(spark, drop_dir, out_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # crash-replay: offsets/0 survives, commits/0 doesn't -> the restart
    # re-executes epoch 0 against the sink's already-written metadata log
    for marker in ("0", ".0.crc"):
        os.remove(os.path.join(out_dir + "_ckpt", "commits", marker))
    drop(d2 + flush)
    q = ev.streaming_burst_minutes(spark, drop_dir, out_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    sink = spark.read.parquet(out_dir)
    # exactly the 6 real (user, minute) windows, 10 events total — the
    # sentinel's open window absent, the replayed epoch not double-counted
    minutes = {(r.user_id, r.minute): r.c for r in sink.collect()}
    assert len(minutes) == 6
    assert sum(minutes.values()) == 10
    assert 99 not in {u for (u, _) in minutes}

    got = [tuple(r) for r in ev.burst_from_minutes(sink).collect()]
    batch_ev = spark.createDataFrame(
        [
            (u, dt.datetime(2024, 3, 1, h, m, s))
            for (u, h, m, s) in d1 + d2
        ],
        "user_id long, ts timestamp",
    )
    per_min = (
        batch_ev.selectExpr(
            "user_id", "unix_micros(ts) DIV 60000000 AS minute"
        )
        .groupBy("user_id", "minute")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    want = [tuple(r) for r in ev.burst_from_minutes(per_min).collect()]
    assert got == want
    # the planted burst ranks first: peak 4 of its 5 events in one
    # minute, share 8000 bp
    assert got[0] == (1, 4, 5, 8000)
