"""Pipeline-operator tests: dedup/similarity/text invariants at sf0.001,
streaming twin equivalence, multimodal mapInPandas plumbing."""

import pytest

from pyspark.sql import functions as F

from sap_sql_engine_spark.operators import dedup, multimodal, similarity, textanalysis
from sap_sql_engine_spark.streaming import events as ev


def test_fingerprint_stable_under_whitespace(spark, sf_dir):
    # normalization means fingerprints are insensitive to case/whitespace
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        ["doc_id", "text"],
    )
    fps = {r.doc_id: r.fp for r in df.select("doc_id", textanalysis.fingerprint_col().alias("fp")).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_jaccard_pairs_ordered_and_bounded(spark, sf_dir):
    rows = dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()
    assert rows, "expected planted near-duplicates at sf0.001"
    for r in rows:
        assert r.doc1 < r.doc2
        assert dedup.JACCARD_THRESHOLD <= r.jaccard <= 1.0


def test_jaccard_hot_shingle_cap_bounds_candidates(spark, sf_dir):
    # 50 docs: each pair of docs shares ONLY one boilerplate 3-gram that
    # appears in every doc (df=50 > max(20, ceil(50*0.05))). Without the
    # df-cap the shingle-keyed join would emit C(50,2)=1225 candidate pairs
    # off that single hot key; with the cap the boilerplate carries no
    # signal and only the two planted true dups pair up.
    boiler = "terms of service apply"
    rows = [(i, f"{boiler} unique{i}a unique{i}b unique{i}c unique{i}d") for i in range(48)]
    rows += [(100, f"{boiler} same body here again today"),
             (101, f"{boiler} same body here again today")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.jaccard_pairs(docs).collect()
    assert {(r.doc1, r.doc2) for r in pairs} == {(100, 101)}
    # and the cap is inert when nothing is hot: distinct docs -> no pairs
    cold = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}") for i in range(10)],
        ["doc_id", "text"],
    )
    assert dedup.jaccard_pairs(cold).collect() == []


def test_minhash_estimates_track_true_jaccard(spark, sf_dir):
    true_pairs = {
        (r.doc1, r.doc2): r.jaccard
        for r in dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    est_pairs = {
        (r.doc1, r.doc2): r.est_jaccard
        for r in dedup.q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    # every true near-dup pair (jaccard ~0.98) must be found by LSH
    found = set(true_pairs) & set(est_pairs)
    assert len(found) >= len(true_pairs) * 0.9
    for pair in found:
        assert est_pairs[pair] >= 0.5


def test_simhash_finds_neardups(spark, sf_dir):
    true_pairs = {
        (r.doc1, r.doc2) for r in dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    sim_pairs = {
        (r.doc1, r.doc2) for r in dedup.q_dedup_simhash(spark, sf_dir).collect()
    }
    assert true_pairs & sim_pairs, "simhash should overlap true near-dups"


def test_ann_topk_is_sorted_and_complete(spark, sf_dir):
    rows = similarity.q_ann_bruteforce_topk(spark, sf_dir).collect()
    assert len(rows) == similarity.TOPK
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_lsh_bucket_recall_within_bucket(spark, sf_dir):
    # every LSH candidate's exact cosine must match the brute-force value
    brute = {
        r.vec_id: r.cosine
        for r in similarity.q_ann_bruteforce_topk(spark, sf_dir).collect()
    }
    for r in similarity.q_ann_lsh_bucketed(spark, sf_dir).collect():
        if r.vec_id in brute:
            assert abs(r.cosine - brute[r.vec_id]) < 1e-9


def test_neardup_banded_no_nested_loop_join(spark, sf_dir):
    # the scale contract: candidates come from a shuffled band-key equi-join,
    # never an all-pairs BroadcastNestedLoopJoin / CartesianProduct
    df = similarity.q_embedding_neardup_pairs(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_full_probe_equals_bruteforce(spark, sf_dir):
    # probing every list degenerates IVF to exact search — results must
    # match brute force row-for-row
    brute = [
        (r.vec_id, r.cosine)
        for r in similarity.q_ann_bruteforce_topk(spark, sf_dir).collect()
    ]
    ivf = [
        (r.vec_id, r.cosine)
        for r in similarity.q_ann_ivf(spark, sf_dir, n_probe=similarity.N_LISTS).collect()
    ]
    assert ivf == brute


def test_ivf_default_probe_shape(spark, sf_dir):
    rows = similarity.q_ann_ivf(spark, sf_dir).collect()
    assert len(rows) == similarity.TOPK
    # probed-list ids are a strict subset of the lists (1-based cell ids)
    assert {r.list_id for r in rows} <= set(range(1, similarity.N_LISTS + 1))
    # cosines are exact: every returned value matches brute force when the
    # same vec_id appears there
    brute = {
        r.vec_id: r.cosine
        for r in similarity.q_ann_bruteforce_topk(spark, sf_dir).collect()
    }
    for r in rows:
        if r.vec_id in brute:
            assert abs(r.cosine - brute[r.vec_id]) < 1e-9


def test_streaming_hourly_matches_batch(spark, sf_dir):
    batch = {
        (r.window_start, r.event_type): (r.event_count, r.value_sum)
        for r in ev.q_events_hourly_rollup(spark, sf_dir).collect()
    }
    q = ev.streaming_hourly_rollup(spark, sf_dir)
    try:
        q.processAllAvailable()
        stream = {
            (r.window_start, r.event_type): (r.event_count, r.value_sum)
            for r in spark.sql("SELECT * FROM events_hourly_stream").collect()
        }
    finally:
        q.stop()
    assert stream == batch


def test_streaming_sessionize_matches_batch(spark, sf_dir):
    batch = {
        r.user_id: (r.session_count, r.total_events, r.max_session_events)
        for r in ev.q_events_sessionize(spark, sf_dir).collect()
    }
    q = ev.streaming_sessionize(spark, sf_dir)
    try:
        q.processAllAvailable()
        # update-mode memory sink appends one row per key per micro-batch;
        # the last row per user is the final state
        stream = {}
        for r in spark.sql("SELECT * FROM events_sessionize_stream").collect():
            stream[r.user_id] = (r.session_count, r.total_events, r.max_session_events)
    finally:
        q.stop()
    assert stream == batch


def test_multimodal_fake_decode_shape(spark, sf_dir):
    media = multimodal.documents_as_media(spark, sf_dir).limit(20)
    feats = multimodal.decode_features(media, deterministic_fake=True).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r.features) == multimodal.FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 1e-3  # normalized histogram
        assert r.byte_len > 0


def test_multimodal_unknown_codec_is_stubbed(spark, sf_dir):
    # text payloads match no codec magic -> declared stub, never silently faked
    media = multimodal.documents_as_media(spark, sf_dir).limit(1)
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_features(media, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def _wav_bytes(samples, sampwidth=2, framerate=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def _media_df(spark, payloads):
    rows = [
        (i, bytearray(p), ("audio/wav", None, None, None))
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_wav_decode_is_real(spark):
    """WAV decodes with the stdlib — no fake: alternating +/-8192 16-bit PCM
    lands in exactly two known amplitude-histogram bins, 50/50."""
    wav = _wav_bytes([8192, -8192] * 200)
    out = multimodal.decode_features(_media_df(spark, [wav])).collect()
    assert len(out) == 1
    feats = out[0].features
    assert out[0].byte_len == len(wav)
    # (8192/32768+1)/2*16 = bin 10; (-8192/32768+1)/2*16 = bin 6
    assert feats[10] == pytest.approx(0.5)
    assert feats[6] == pytest.approx(0.5)
    assert sum(feats) == pytest.approx(1.0)


def _png_encode(w, h, color, rows, filters, palette=None):
    """Minimal test-side PNG encoder: 8-bit, non-interlaced, with a chosen
    filter type per scanline (forward-filters the raw rows, so the decoder
    under test must invert every filter to recover them)."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    stride = w * ch
    out = bytearray()
    prev = bytearray(stride)
    for row, ft in zip(rows, filters):
        line = bytearray(row)
        assert len(line) == stride
        filtered = bytearray([ft])
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = (line[i] - a) & 0xFF
            elif ft == 2:
                v = (line[i] - b) & 0xFF
            elif ft == 3:
                v = (line[i] - ((a + b) >> 1)) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (line[i] - pred) & 0xFF
            filtered.append(v)
        out += filtered
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    data = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        data += chunk(b"PLTE", bytes(palette))
    return data + chunk(b"IDAT", zlib.compress(bytes(out))) + chunk(b"IEND", b"")


def test_png_decode_is_real_stdlib(spark):
    """Non-interlaced 8-bit PNG decodes with the stdlib — runs (not skipped)
    in this Pillow-less container: an all-white grayscale PNG whose rows use
    every filter type lands entirely in the top luminance bin."""
    rows = [bytes([255] * 8)] * 8
    png = _png_encode(8, 8, 0, rows, filters=[0, 1, 2, 3, 4, 0, 2, 4])
    out = multimodal.decode_features(_media_df(spark, [png])).collect()
    assert out[0].byte_len == len(png)
    assert out[0].features[multimodal.FEATURE_DIM - 1] == pytest.approx(1.0)


def test_png_unfilter_all_color_types():
    """The scanline unfilter inverts every forward filter exactly, for RGB,
    RGBA, gray+alpha, and palette color types."""
    from sap_sql_engine_spark.operators.multimodal import _png_decode_gray

    def luma(r, g, b):
        return (19595 * r + 38470 * g + 7471 * b) >> 16

    # RGB 3x4, deterministic-but-varied pixels, all four non-None filters
    pix = [[(x * 37 + y * 91) % 256 for x in range(9)] for y in range(4)]
    png = _png_encode(3, 4, 2, [bytes(r) for r in pix], filters=[1, 2, 3, 4])
    want = [luma(r[i], r[i + 1], r[i + 2]) for r in pix for i in range(0, 9, 3)]
    assert _png_decode_gray(png) == want

    # RGBA: alpha ignored; gray+alpha: value channel only
    rgba = [bytes([10, 200, 30, 77] * 2)] * 2
    assert _png_decode_gray(_png_encode(2, 2, 6, rgba, [4, 4])) == [
        luma(10, 200, 30)
    ] * 4
    ga = [bytes([99, 5, 200, 5])] * 2
    assert _png_decode_gray(_png_encode(2, 2, 4, ga, [2, 2])) == [99, 200] * 2

    # palette: indices resolve through PLTE before the luma reduction
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = [bytes([0, 1, 2])]
    assert _png_decode_gray(_png_encode(3, 1, 3, idx, [1], palette=pal)) == [
        luma(255, 0, 0), luma(0, 255, 0), luma(0, 0, 255)
    ]


def test_image_decode_honest_beyond_stdlib(spark):
    """Payloads the stdlib path can't decode stay honest: JPEG (and corrupt
    PNG) raise rather than silently faking, when Pillow is absent."""
    if multimodal.HAS_PIL:
        pytest.skip("Pillow present: JPEG decodes for real via Pillow")
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_features(_media_df(spark, [jpeg])).collect()
    assert "Pillow" in str(exc_info.value)
    corrupt = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_features(_media_df(spark, [corrupt])).collect()
    assert "corrupt PNG" in str(exc_info.value)


def test_frame_sample_chunks(spark, sf_dir):
    media = multimodal.documents_as_media(spark, sf_dir).limit(5)
    frames = multimodal.frame_sample(media, n_frames=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    assert len(by_media) == 5
    for rows in by_media.values():
        assert [r.frame_no for r in sorted(rows, key=lambda x: x.frame_no)] == list(
            range(len(rows))
        )
        assert all(len(bytes(r.chunk)) > 0 for r in rows)


def test_dedup_exact_consistency(spark, sf_dir):
    rows = dedup.q_dedup_exact(spark, sf_dir).collect()
    for r in rows:
        assert r.doc_count == r.distinct_count + r.duplicate_count


def test_recursive_fold_matches_native_recursion(spark, sf_dir):
    """The fold rewrite of the linear recursive CTE must agree with Spark's
    native WITH RECURSIVE execution of the literal statement (the rewrite's
    correctness proof, run at sf0.001; the DuckDB oracle re-checks it at
    sf0.01 on every correctness run)."""
    from sap_sql_engine_spark.operators import relational as rel
    from sap_sql_engine_spark.sources.loader import table

    fold = rel.q_recursive_line_chain(spark, sf_dir)
    v = rel._tmp_view(table(spark, sf_dir, "lineitem"), "lineitem_chain_native")
    native = spark.sql(rel._RECURSIVE_SQL.format(src=v))
    assert [tuple(r) for r in native.collect()] == [tuple(r) for r in fold.collect()]


def test_temp_view_queries_isolated_across_calls(spark):
    """Per-call unique temp-view names: a lazily-evaluated DataFrame from an
    earlier call must NOT see data from a later call against a different
    scale factor (fixed view names made the second call clobber the first's
    source relation)."""
    from sap_sql_engine_spark.operators import relational as rel

    small = rel.q_above_nation_average(spark, "/root/testdata/sf0.001")
    large = rel.q_above_nation_average(spark, "/root/testdata/sf0.01")
    n_small, n_large = small.count(), large.count()
    assert n_small < n_large  # evaluated AFTER both registrations
    assert n_small == rel.q_above_nation_average(spark, "/root/testdata/sf0.001").count()


def test_banding_recall_bound_and_derivation():
    """ADVICE (r2): (r,b) must carry an explicit recall bound at the
    configured threshold, and be derivable rather than hand-tuned."""
    rec = similarity.banding_recall(
        similarity.NEARDUP_COS, similarity.NEARDUP_BAND_BITS, similarity.NEARDUP_BANDS
    )
    assert rec >= similarity.NEARDUP_TARGET_RECALL
    # derivation returns params meeting the bound, with the most selective
    # band width that fits — and monotonicity: tighter thresholds allow
    # wider (more selective) bands
    r_low, b_low = similarity.derive_band_params(0.40)
    r_hi, b_hi = similarity.derive_band_params(0.85)
    assert similarity.banding_recall(0.40, r_low, b_low) >= 0.999
    assert similarity.banding_recall(0.85, r_hi, b_hi) >= 0.999
    assert r_hi > r_low
    assert b_low <= 64 and b_hi <= 64


def test_connected_components_hand_graph(spark):
    """Chain 1-2-3, triangle 10-11-12 (+ 11-12 redundant edge), isolated
    pair 20-21: labels must converge to the component minimum."""
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc1", "doc2"],
    )
    comp = {r.node: r.label for r in dedup.connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_neardup_clusters_keep_one(spark, sf_dir):
    rows = dedup.q_dedup_neardup_clusters(spark, sf_dir).collect()
    assert rows, "expected planted near-dup clusters at sf0.001"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        # cluster id is the min member; exactly one representative per cluster
        assert cid == min(m.doc_id for m in members)
        assert sum(m.is_representative for m in members) == 1
        assert all(m.cluster_size == len(members) for m in members)


def test_stratified_sample_deterministic_and_unshuffled(spark, sf_dir):
    df = textanalysis.q_stratified_sample(spark, sf_dir)
    a = sorted(r.doc_id for r in df.collect())
    b = sorted(r.doc_id for r in textanalysis.q_stratified_sample(spark, sf_dir).collect())
    assert a == b  # deterministic across runs (no rand())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter+project: zero shuffles
    for r in df.collect():
        assert r.bucket < r.sample_rate
        assert r.sample_rate == (
            textanalysis.SAMPLE_RATE_EN if r.lang == "en" else textanalysis.SAMPLE_RATE_OTHER
        )


def test_corpus_clean_funnel_monotone(spark, sf_dir):
    rows = textanalysis.q_corpus_clean_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.total_docs >= r.filtered_docs >= r.kept_docs
    df = textanalysis.q_corpus_clean_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one aggregation shuffle (count-distinct expands it, but no joins)
    assert "Join" not in plan


def test_repetition_score_map_side_and_values(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a a"), (2, "w x y z q r s t")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in textanalysis.repetition_score_from(docs).collect()}
    # "a a a a a": 4 2-grams all "a a" -> dup frac 0.75; top token 5/5
    assert rows[1].dup_2gram_frac == 0.75
    assert rows[1].top_token_frac == 1.0
    assert rows[1].repetitive
    # all-distinct text: no duplicate 2-grams, every token unique
    assert rows[2].dup_2gram_frac == 0.0
    assert rows[2].top_token_frac == 0.125
    assert not rows[2].repetitive
    # per-row projection only: zero shuffles at any scale
    df = textanalysis.q_repetition_score(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pii_scan_planted_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    texts = [
        (1, "contact me at alice.smith+work@example.co.uk or 555-123-4567 now"),
        (2, "no pii here just words"),
        (3, "two mails a@b.io c@d.org and phone 123.456.7890"),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r.doc_id: r for r in textanalysis.pii_scan_from(docs).collect()}
    assert got[1].email_count == 1 and got[1].phone_count == 1 and got[1].has_pii
    assert "[EMAIL]" in got[1].redacted_text and "[PHONE]" in got[1].redacted_text
    assert got[2].pii_count == 0 and not got[2].has_pii
    assert got[3].email_count == 2 and got[3].phone_count == 1

    # the same rows through the oracle SQL must agree cell-for-cell
    documents = pd.DataFrame(texts, columns=["doc_id", "text"])  # noqa: F841
    con = duckdb.connect()
    con.register("documents", documents)
    oracle = {
        r[0]: r
        for r in con.execute(textanalysis.ORACLE_PII_SCAN).fetchall()
    }
    for did, row in got.items():
        assert oracle[did][1] == row.email_count
        assert oracle[did][2] == row.phone_count
        assert oracle[did][5] == row.redacted_text


def test_contamination_broadcast_and_bounds(spark, sf_dir):
    df = dedup.q_corpus_contamination(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # benchmark membership probe must be a broadcast, never a shuffled join
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 < r.n_shingles
        assert 0 <= r.overlap <= r.n_shingles
        assert 0.0 <= r.contam_frac <= 1.0
        assert r.contaminated == (r.contam_frac >= dedup.CONTAM_FLAG)
    # benchmark docs themselves are excluded from the scored corpus
    bench_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(f"source = '{dedup.CONTAM_BENCH_SOURCE}'")
        .select("doc_id")
        .collect()
    }
    assert bench_ids.isdisjoint({r.doc_id for r in rows})


def test_embedding_outlier_broadcast_and_positive(spark, sf_dir):
    df = similarity.q_embedding_outlier(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # centroids broadcast; corpus unshuffled
    rows = df.collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n_vecs
    assert all(r.dist_to_centroid >= 0 for r in rows)
    # distances are exact+deterministic: a second run is bit-identical
    again = {r.vec_id: r.dist_to_centroid for r in similarity.q_embedding_outlier(spark, sf_dir).collect()}
    assert all(again[r.vec_id] == r.dist_to_centroid for r in rows)


def test_asof_join_no_join_operator(spark, sf_dir):
    df = ev.q_events_asof_prior_click(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the as-of is re-expressed as a windowed carry-forward: ONE shuffle on
    # user_id and NO join operator anywhere in the plan
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.gap_us >= 0  # prior means prior
    # semantics spot-check against a hand fold on one user
    uid = rows[0].user_id
    evs = sorted(
        ev._events(spark, sf_dir)
        .filter(f"user_id = {uid} AND event_type IN ('click','purchase')")
        .select("event_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect(),
        key=lambda r: (r.us, r.event_id),
    )
    expect = {}
    last_click = None
    for r in evs:
        if r.event_type == "click":
            last_click = r
        elif last_click is not None:
            expect[r.event_id] = (last_click.event_id, r.us - last_click.us)
    got = {r.event_id: (r.prior_click_id, r.gap_us) for r in rows if r.user_id == uid}
    assert got == expect


def test_funnel_monotone_and_single_user_shuffle(spark, sf_dir):
    df = ev.q_events_funnel(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # one data shuffle on user_id; the only other exchange is the 1-row final
    assert plan.count("Exchange hashpartitioning") == 1
    row = df.collect()[0]
    assert row.n_signup >= row.n_click_after_signup >= row.n_purchase_after_click
    assert row.n_purchase_after_click > 0  # synthetic corpus has full funnels


def test_streaming_dedup_collapses_redelivery(spark, sf_dir):
    batch = {
        r.event_type: r.n_events
        for r in ev.q_events_dedup_counts(spark, sf_dir).collect()
    }
    q = ev.streaming_dedup_counts(spark, sf_dir, copies=2)
    try:
        q.processAllAvailable()
        stream = {
            r.event_type: r.n_events
            for r in spark.sql("SELECT * FROM events_dedup_stream").collect()
        }
    finally:
        q.stop()
    # the stream saw 2x deliveries but counts each event exactly once
    assert stream == batch


def test_semantic_verify_composes_minhash_and_cosine(spark, sf_dir):
    rows = dedup.q_dedup_semantic_verify(spark, sf_dir).collect()
    assert rows, "minhash candidates exist at sf0.001"
    base = {
        (r.doc1, r.doc2): r.est_jaccard
        for r in dedup.q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    for r in rows:
        # exactly the minhash candidate set, enriched — no pairs invented/lost
        assert base.pop((r.doc1, r.doc2)) == r.est_jaccard
        assert -1.0 <= r.cosine <= 1.0
        assert r.embedding_confirmed == (r.cosine >= dedup.SEMANTIC_COS)
    assert not base


def test_pack_sequences_contiguous_within_bucket(spark, sf_dir):
    rows = textanalysis.q_docs_pack_sequences(spark, sf_dir).collect()
    assert rows
    by_bucket = {}
    for r in rows:
        assert 0 <= r.pack_offset < textanalysis.CONTEXT_TOKENS
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket_rows in by_bucket.values():
        bucket_rows.sort(key=lambda r: r.doc_id)
        # packs are a contiguous concat-then-split: each doc starts exactly
        # where the previous one ended
        pos = 0
        for r in bucket_rows:
            assert r.pack_id * textanalysis.CONTEXT_TOKENS + r.pack_offset == pos
            pos += r.token_count


def test_target_mix_downsamples_majority_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    orig = {r.lang: r.cnt for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    target = sum(orig.values()) / len(orig)
    kept = textanalysis.q_docs_target_mix_sample(spark, sf_dir).collect()
    got = {}
    for r in kept:
        got[r.lang] = got.get(r.lang, 0) + 1
        assert 0 < r.keep_pct <= 100
    for lang, n in orig.items():
        if n <= target:
            # under-target languages are kept whole
            assert got.get(lang, 0) == n
        else:
            assert got.get(lang, 0) < n
    # deterministic: rerun yields the identical doc set
    again = sorted(r.doc_id for r in textanalysis.q_docs_target_mix_sample(spark, sf_dir).collect())
    assert again == sorted(r.doc_id for r in kept)


def _png_bytes(w, h):
    import struct as _s
    import zlib
    ihdr = _s.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + _s.pack(">I", len(ihdr)) + chunk + _s.pack(">I", zlib.crc32(chunk))
    )


def _jpeg_bytes(w, h):
    import struct as _s
    app0 = b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00" + b"\x01\x02\x00" + b"\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + _s.pack(">H", 11) + b"\x08" + _s.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_probe_media_meta_real_headers(spark):
    payloads = [
        _wav_bytes([0, 1000, -1000, 500] * 2000),   # 8000 frames @ 8kHz = 1000ms
        _png_bytes(640, 480),
        _jpeg_bytes(1920, 1080),
        b"not a media file at all",
        b"RIFF....WAVEgarbage",                      # corrupt wav container
    ]
    media = _media_df(spark, payloads)
    got = {r.media_id: r for r in multimodal.probe_media_meta(media).collect()}
    assert got[0].format == "audio/wav" and got[0].duration_ms == 1000
    assert got[1].format == "image/png" and (got[1].width, got[1].height) == (640, 480)
    assert got[2].format == "image/jpeg" and (got[2].width, got[2].height) == (1920, 1080)
    assert got[3].format == "unknown" and got[3].width is None
    assert got[4].format == "corrupt"
    for mid, buf in enumerate(payloads):
        assert got[mid].byte_len == len(buf)


def test_empty_text_docs_agree_with_oracle(spark, tmp_path):
    # ADVICE r3: the gate corpus has no empty docs, so the head-tokens and
    # byte-features oracles could diverge from the Python lanes on
    # empty/whitespace-only text unnoticed. Plant exactly those docs in a
    # tiny corpus and run BOTH engines.
    import duckdb
    import pandas as pd

    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["alpha beta gamma delta epsilon zeta", "", "   ", "solo"],
            "lang": ["en"] * 4,
            "source": ["s0"] * 4,
            "n_chars": [35, 0, 3, 4],
        }
    )
    sf_dir = str(tmp_path)
    corpus.to_parquet(f"{sf_dir}/documents.parquet", index=False)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )

    # head tokens: empty-trim docs yield NO rows on either engine
    got = sorted(
        (r.doc_id, r.pos, r.token)
        for r in textanalysis.q_text_head_tokens(spark, sf_dir).collect()
    )
    want = sorted(
        (int(d), int(p), t)
        for d, p, t in con.execute(textanalysis.ORACLE_HEAD_TOKENS).fetchall()
    )
    assert got == want
    assert {d for d, _, _ in got} == {1, 4}, "empty/ws-only docs must emit nothing"

    # byte features: empty docs yield a ZEROS row on both engines
    got_bf = sorted(
        tuple(r) for r in multimodal.q_multimodal_byte_features(spark, sf_dir).collect()
    )
    want_bf = sorted(
        tuple(int(v) for v in row)
        for row in con.execute(multimodal.ORACLE_MULTIMODAL_BYTE_FEATURES).fetchall()
    )
    assert got_bf == want_bf
    by_id = {row[0]: row for row in got_bf}
    assert by_id[2][1] == 0 and set(by_id[2][2:]) == {0}, "empty doc -> zeros row"


def test_label_agreement_kappa_bounds_and_consistency(spark, sf_dir):
    rows = textanalysis.q_label_agreement(spark, sf_dir).collect()
    assert rows, "expected per-language agreement rows"
    kappas = {r.kappa_micro for r in rows}
    assert len(kappas) == 1, "kappa is a global statistic, identical on every row"
    k = kappas.pop()
    assert -1_000_000 <= k <= 1_000_000  # kappa in micro-units
    for r in rows:
        assert 0 <= r.n_correct <= r.n_docs
        assert 0 <= r.accuracy_bp <= 10_000  # accuracy in basis points


def test_label_confusion_report_margins_consistent(spark, sf_dir):
    rows = textanalysis.q_label_confusion(spark, sf_dir).collect()
    assert rows
    # both margins count every document exactly once
    assert sum(r.n_actual for r in rows) == sum(r.n_predicted for r in rows)
    agg = {r.lang: r for r in textanalysis.q_label_agreement(spark, sf_dir).collect()}
    for r in rows:
        assert 0 <= r.tp <= min(r.n_actual, r.n_predicted) or r.n_predicted == 0
        for bp in (r.precision_bp, r.recall_bp, r.f1_bp):
            assert bp is None or 0 <= bp <= 10_000
        if r.klass in agg:  # diagonal matches the kappa query's n_correct
            assert r.tp == agg[r.klass].n_correct
            assert r.n_actual == agg[r.klass].n_docs


def test_zipf_slope_matches_python_ols_on_planted_zipfian(spark, tmp_path):
    # planted corpus: token w_r appears floor(120/r) times -> ln-ln slope
    # should land near -1; the assertion is EXACT vs a pure-Python mirror
    # of the quantized integer OLS, plus the ~-1 window
    import math

    import pandas as pd

    counts = {f"w{r:02d}": 120 // r for r in range(1, 21)}
    words = [w for w, c in counts.items() for _ in range(c)]
    corpus = pd.DataFrame(
        {
            "doc_id": [1],
            "text": [" ".join(words)],
            "lang": ["en"],
            "source": ["s0"],
            "n_chars": [0],
        }
    )
    sf_dir = str(tmp_path)
    corpus.to_parquet(f"{sf_dir}/documents.parquet", index=False)
    row = textanalysis.q_zipf_slope(spark, sf_dir).collect()[0]

    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (math.floor(math.log(r) * 1e6), math.floor(math.log(c) * 1e6))
        for r, (_, c) in enumerate(ranked, start=1)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    num, den = (n * sxy - sx * sy) * 1_000_000, n * sxx - sx * sx
    # exact integer division truncating toward zero (Spark div ≡ DuckDB //)
    expect = abs(num) // abs(den)
    if (num < 0) != (den < 0):
        expect = -expect
    assert row.n_types == n
    assert row.zipf_slope_micro == expect
    assert -1_200_000 < row.zipf_slope_micro < -800_000  # ~Zipfian


def test_dataset_card_consistent_with_components(spark, sf_dir):
    # the card's cells must equal the heads of the gated component queries
    card = {r.source: r for r in textanalysis.q_dataset_card(spark, sf_dir).collect()}
    exact = {r.source: r for r in dedup.q_dedup_exact(spark, sf_dir).collect()}
    zipf = {
        r.source: r.zipf_slope_micro
        for r in textanalysis.q_zipf_slope(spark, sf_dir).collect()
    }
    assert set(card) == set(exact) == set(zipf)
    for s, row in card.items():
        assert row.n_docs == exact[s].doc_count
        assert row.exact_dup_docs == exact[s].duplicate_count
        assert row.zipf_slope_micro == zipf[s]
        assert 0 < row.majority_lang_bp <= 10_000
        assert row.mean_doc_tokens * row.n_docs <= row.n_tokens


def test_source_overlap_minhash_planted(spark, tmp_path):
    # identical-content sources -> identical union MinHash -> est 1.0;
    # disjoint-vocabulary source -> 0 agreement with either twin
    import pandas as pd

    same = "alpha beta gamma delta epsilon zeta eta theta iota"
    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [same, "prefix words " + same, same,
                     "zebra yak xylo walrus vulture unau tapir seal rhea"],
            "lang": ["en"] * 4,
            "source": ["twin_a", "twin_a", "twin_b", "other"],
            "n_chars": [0] * 4,
        }
    )
    sf_dir = str(tmp_path)
    corpus.to_parquet(f"{sf_dir}/documents.parquet", index=False)
    got = {
        (r.source1, r.source2): (r.agree, r.est_jaccard)
        for r in dedup.q_source_overlap_minhash(spark, sf_dir).collect()
    }
    assert len(got) == 3
    # twin_b's shingle set is a SUBSET of twin_a's (extra prefix doc adds
    # shingles) — union-MinHash agreement stays high but bounded below 1
    agree_ab, est_ab = got[("twin_a", "twin_b")]
    assert est_ab > 0.5
    assert got[("other", "twin_a")][0] == 0
    assert got[("other", "twin_b")][0] == 0


def test_source_kl_divergence_planted(spark, tmp_path):
    # twin sources (identical text) must sit near 0 (add-1 smoothing keeps
    # it slightly positive); a disjoint-vocabulary source must dominate
    import pandas as pd

    same = "alpha beta gamma delta alpha beta alpha"
    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [same, same, "zebra yak xylo walrus zebra yak zebra"],
            "lang": ["en"] * 3,
            "source": ["twin_a", "twin_b", "other"],
            "n_chars": [0, 0, 0],
        }
    )
    sf_dir = str(tmp_path)
    corpus.to_parquet(f"{sf_dir}/documents.parquet", index=False)
    kl = {
        (r.s1, r.s2): r.kl_micro_nats
        for r in textanalysis.q_source_kl_divergence(spark, sf_dir).collect()
    }
    assert len(kl) == 6  # 3 sources, ordered pairs
    twin = kl[("twin_a", "twin_b")]
    cross = kl[("twin_a", "other")]
    assert 0 <= twin < 600_000  # ~0 up to smoothing
    assert cross > twin + 1_000_000  # disjoint vocab >> twins
    assert kl[("twin_a", "twin_b")] == kl[("twin_b", "twin_a")]  # symmetric corpus


def test_weighted_sample_deterministic_and_weighted(spark, sf_dir):
    a = {r.doc_id for r in textanalysis.q_docs_weighted_sample(spark, sf_dir).collect()}
    b = {r.doc_id for r in textanalysis.q_docs_weighted_sample(spark, sf_dir).collect()}
    assert a == b, "md5-coin sampling must be run-to-run deterministic"
    total = textanalysis.q_quality_score(spark, sf_dir).count()
    assert 0 < len(a) < total, "Bernoulli(quality) keeps a strict subset"


def test_substring_spans_exact_length_on_planted_passage(spark, tmp_path):
    # two otherwise-unrelated docs share one literal 10-token passage; the
    # operator must report exactly that pair with span_tokens == 10 (jaccard
    # would score this pair LOW — the span detector is what catches it)
    import pandas as pd

    passage = "one two three four five six seven eight nine ten"
    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                f"alpha beta gamma {passage} delta epsilon",
                f"zeta eta theta iota kappa {passage} lam mu nu xi",
                "completely unrelated words only here nothing shared at all",
            ],
            "lang": ["en"] * 3,
            "source": ["s0"] * 3,
            "n_chars": [0, 0, 0],
        }
    )
    sf_dir = str(tmp_path)
    corpus.to_parquet(f"{sf_dir}/documents.parquet", index=False)
    rows = dedup.q_dedup_substring_spans(spark, sf_dir).collect()
    assert [(r.doc1, r.doc2, r.span_tokens) for r in rows] == [(1, 2, 10)]


def test_short_docs_do_not_crash_token_operators(spark, tmp_path):
    # regression for the descending-sequence trap: Spark's sequence(1, 0)
    # yields [1, 0] (or throws with an explicit step) and element_at(x, 0)
    # always throws — so 1- and 2-token docs used to crash every shingle/
    # bigram operator. The gate corpus never has short docs; this pins the
    # guard (short docs contribute NOTHING, but must not fail the job).
    import pandas as pd

    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["solo", "two tokens", "three tokens here plus more"],
            "lang": ["en"] * 3,
            "source": ["s0", "s0", "s1"],
            "n_chars": [4, 10, 27],
        }
    )
    sf_dir = str(tmp_path)
    corpus.to_parquet(f"{sf_dir}/documents.parquet", index=False)
    # bigram LM: only the 2+-token docs produce rows
    lm = textanalysis.q_text_lm_score(spark, sf_dir).collect()
    assert {r.doc_id for r in lm} == {2, 3}
    # 3-gram shinglers: doc 3 is the only one with any shingle
    sh = dedup._shingles_raw(spark, sf_dir).collect()
    assert {r.doc_id for r in sh} == {3}
    spans = dedup.q_dedup_substring_spans(spark, sf_dir).collect()
    assert spans == []
    # s0 has no shingles at all -> no signature row -> no pair emitted
    # (identical on the oracle: its sigs CTE has no s0 group either)
    overlap = dedup.q_source_overlap_minhash(spark, sf_dir).collect()
    assert overlap == []


def test_doc_provenance_reconciles_with_funnel(spark, sf_dir):
    # per-doc removal reasons must sum exactly to the funnel's stage deltas
    from collections import Counter

    funnel = {
        r.stage_name: r.docs
        for r in dedup.q_corpus_release_funnel(spark, sf_dir).collect()
    }
    prov = Counter(
        r.outcome for r in dedup.q_corpus_doc_provenance(spark, sf_dir).collect()
    )
    assert sum(prov.values()) == funnel["total"]
    assert prov["survived"] == funnel["decontaminated"]
    assert prov["lang_filter"] == funnel["total"] - funnel["lang_filter"]
    assert prov["quality_filter"] == funnel["lang_filter"] - funnel["quality_filter"]
    assert prov["exact_dup"] == funnel["quality_filter"] - funnel["exact_dedup"]
    assert prov["neardup_dup"] == funnel["exact_dedup"] - funnel["neardup_dedup"]
    assert (
        prov["contaminated"] + prov["benchmark_holdout"]
        == funnel["neardup_dedup"] - funnel["decontaminated"]
    )


def test_neardup_survivors_accounting(spark, sf_dir):
    rows = dedup.q_dedup_neardup_survivors(spark, sf_dir).collect()
    assert rows
    total_removed = sum(r.n_removed for r in rows)
    for r in rows:
        assert r.n_docs == r.n_removed + r.n_surviving
    # removal count == clustered docs minus one representative per cluster
    clusters = dedup.q_dedup_neardup_clusters(spark, sf_dir).collect()
    assert total_removed == sum(1 for c in clusters if c.is_representative == 0)
    assert total_removed > 0, "planted near-dups must remove something"


def test_keep_best_picks_highest_quality_member(spark, sf_dir):
    best = {r.cluster_id: (r.kept_doc, r.kept_quality) for r in
            dedup.q_dedup_keep_best(spark, sf_dir).collect()}
    assert best
    clusters = {}
    for r in dedup.q_dedup_neardup_clusters(spark, sf_dir).collect():
        clusters.setdefault(r.cluster_id, []).append(r.doc_id)
    quality = {r.doc_id: r.quality_score for r in
               textanalysis.q_quality_score(spark, sf_dir).collect()}
    assert set(best) == set(clusters)
    for cid, members in clusters.items():
        want = min(members, key=lambda d: (-quality[d], d))
        assert best[cid] == (want, quality[want])


def test_split_leakage_report_consistency(spark, sf_dir):
    from sap_sql_engine_spark.sources.loader import table

    r = dedup.q_split_leakage_report(spark, sf_dir).collect()[0]
    n_docs = table(spark, sf_dir, "documents").count()
    assert r.n_train + r.n_eval == n_docs
    # md5 coin: eval share lands near SPLIT_EVAL_PCT
    assert 0.5 * dedup.SPLIT_EVAL_PCT <= 100 * r.n_eval / n_docs <= 2 * dedup.SPLIT_EVAL_PCT
    assert 0 <= r.cross_pairs <= r.neardup_pairs
    assert r.eval_docs_contaminated <= min(r.cross_pairs, r.n_eval)
    # the synthetic corpus plants near-dups; a 10% split must catch some
    assert r.cross_pairs > 0 and r.eval_docs_contaminated > 0
    # cross pairs must match reclassifying the pair list directly
    pairs = {
        (p.doc1, p.doc2)
        for p in dedup.q_dedup_minhash_lsh(spark, sf_dir)
        .filter("est_jaccard >= 0.5")
        .collect()
    }
    flags = {
        d.doc_id: d.is_eval
        for d in table(spark, sf_dir, "documents")
        .select("doc_id", dedup._split_flag_spark().alias("is_eval"))
        .collect()
    }
    assert r.neardup_pairs == len(pairs)
    assert r.cross_pairs == sum(1 for a, b in pairs if flags[a] != flags[b])


def test_corpus_release_funnel_monotone(spark, sf_dir):
    rows = sorted(
        dedup.q_corpus_release_funnel(spark, sf_dir).collect(), key=lambda r: r.stage
    )
    assert [r.stage_name for r in rows] == [
        "total", "lang_filter", "quality_filter",
        "exact_dedup", "neardup_dedup", "decontaminated",
    ]
    counts = [r.docs for r in rows]
    assert counts == sorted(counts, reverse=True)  # stages only shrink
    assert counts[-1] > 0
    # the release must have dropped the whole benchmark slice
    from sap_sql_engine_spark.sources.loader import table

    bench = (
        table(spark, sf_dir, "documents")
        .filter(f"source = '{dedup.CONTAM_BENCH_SOURCE}'")
        .count()
    )
    assert bench > 0 and counts[-1] <= counts[-2] - 0  # and strictly dropped:
    assert counts[-1] < counts[-2]


def test_lm_score_matches_python_model(spark, sf_dir):
    import math

    from sap_sql_engine_spark.sources.loader import table

    rows = textanalysis.q_text_lm_score(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text.strip().split()
        for r in table(spark, sf_dir, "documents").collect()
    }
    # train the same bigram MLE in Python
    c2: dict[tuple, int] = {}
    c1: dict[str, int] = {}
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    expect = {}
    for did, toks in docs.items():
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            continue
        qs = [math.floor(math.log(c2[bg] / c1[bg[0]]) * textanalysis.LM_Q) for bg in bgs]
        expect[did] = (len(bgs), sum(qs) / (textanalysis.LM_Q * len(bgs)), min(qs) / textanalysis.LM_Q)
    assert {r.doc_id for r in rows} == set(expect)
    for r in rows:
        n, avg, mn = expect[r.doc_id]
        assert r.n_bigrams == n
        # libm vs JVM ln can differ in the last ulp at floor boundaries;
        # allow a couple of quantization steps of slack
        assert abs(r.avg_logprob - avg) < 3e-6
        assert abs(r.min_logprob - mn) < 3e-6
        assert r.min_logprob <= r.avg_logprob <= 0.0


def test_text_clean_normalize_unicode_planted(spark, tmp_path):
    # planted unicode: combining accents (NFC-composable), control chars,
    # CRLF runs, NBSP (must NOT be collapsed — explicit ASCII class).
    # Cross-checks the Python/unicodedata path against DuckDB's utf8proc
    # NFC on the same file — two independent Unicode implementations.
    import duckdb

    rows = [
        (1, "éclair"),              # e + combining acute -> é (NFC)
        (2, "a\x01b\x7fc"),               # control chars stripped
        (3, "x\r\n\t  y"),                # whitespace run collapses to one space
        (4, "a b"),                  # NBSP preserved
        (5, "  already clean  "),         # trim only
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(path)

    got = {
        r.doc_id: (r.clean_len, r.was_changed, r.clean_fingerprint)
        for r in textanalysis.q_text_clean_normalize(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(textanalysis.ORACLE_TEXT_CLEAN).fetchall()
    }
    assert got == oracle
    # semantic spot checks
    assert got[1][0] == len("éclair") and got[1][1] == 1
    assert got[2][0] == 3 and got[2][1] == 1
    assert got[3][0] == 3 and got[3][1] == 1   # "x y"
    assert got[4][0] == 3 and got[4][1] == 0   # NBSP untouched
    assert got[5][1] == 1


def test_pack_efficiency_accounting(spark, sf_dir):
    from sap_sql_engine_spark.sources.loader import table

    rows = {r.bucket: r for r in textanalysis.q_docs_pack_efficiency(spark, sf_dir).collect()}
    assert len(rows) == textanalysis.PACK_BUCKETS
    C = textanalysis.CONTEXT_TOKENS
    packed = textanalysis.q_docs_pack_sequences(spark, sf_dir).collect()
    import collections

    by_bucket = collections.defaultdict(list)
    for p in packed:
        by_bucket[p.bucket].append(p)
    total_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows.values()) == total_docs
    for b, r in rows.items():
        toks = sum(p.token_count for p in by_bucket[b])
        assert r.tokens == toks
        assert r.packs == -(-toks // C)
        assert r.padding_tokens == r.packs * C - toks
        assert 0 < r.fill_ratio <= 1.0
        spanning = sum(1 for p in by_bucket[b] if p.pack_offset + p.token_count > C)
        assert r.spanning_docs == spanning


def test_streaming_dedup_watermarked_bounded_state_matches_batch(spark, sf_dir):
    """The bounded-state dedup twin (dropDuplicatesWithinWatermark):
    redeliveries inside the watermark window collapse exactly like the
    unbounded form — same counts as the batch distinct — while per-key
    state is evicted once the watermark passes (the unbounded form's
    memory failure mode on infinite streams)."""
    batch = {
        r.event_type: r.n_events
        for r in ev.q_events_dedup_counts(spark, sf_dir).collect()
    }
    q = ev.streaming_dedup_counts_watermarked(spark, sf_dir, copies=2)
    try:
        q.processAllAvailable()
        stream = {
            r.event_type: r.n_events
            for r in spark.sql("SELECT * FROM events_dedup_wm_stream").collect()
        }
    finally:
        q.stop()
    assert stream == batch


def test_nb_language_planted_separable_vocab(spark, tmp_path):
    """Disjoint per-language vocabularies: Naive Bayes must re-identify
    every document's language (accuracy 10000 bp per lang) — pins that
    the honest ~13% on the synthetic corpus reflects the data, not the
    math."""
    rows = []
    did = 0
    for li, lang in enumerate(["de", "en", "fr"]):
        for j in range(8):
            words = [f"{lang}tok{k}" for k in range(j % 3 + 2)]
            text = " ".join(words * 3)
            rows.append((did, text, lang, f"src{li}", len(text)))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from sap_sql_engine_spark.operators import textanalysis as ta

    out = ta.q_nb_language_report(spark, str(tmp_path)).collect()
    assert len(out) == 3
    for r in out:
        assert r.n_docs == 8
        assert r.n_correct == 8, (r.lang, r.n_correct)
        assert r.accuracy_bp == 10000


def test_dsir_importance_planted_disjoint_vocab(spark, tmp_path):
    """Disjoint target/raw vocabularies: every `en` (target-slice) doc
    must score a strictly positive DSIR weight and rank above every `de`
    doc (strictly negative weight). Token names are chosen so the two
    vocabularies occupy disjoint md5 hash buckets (verified: entok0-2 ->
    {1, 60, 36}, detok0-2 -> {4, 6, 54})."""
    rows = []
    did = 0
    for lang, stem in (("en", "entok"), ("de", "detok")):
        for j in range(10):
            words = [f"{stem}{k}" for k in range(3)]
            text = " ".join(words * (j % 2 + 2))
            rows.append((did, text, lang, "srcX", len(text)))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from sap_sql_engine_spark.operators import textanalysis as ta

    out = ta.q_dsir_importance(spark, str(tmp_path)).collect()
    assert len(out) == 20
    top10, bottom10 = out[:10], out[10:]
    assert all(r.lang == "en" and r.weight_micro_nats > 0 for r in top10), top10
    assert all(r.lang == "de" and r.weight_micro_nats < 0 for r in bottom10), bottom10


def test_lm_perplexity_buckets_planted_terciles(spark, tmp_path):
    """Three planted score groups of 3 docs each must land in exactly the
    head/middle/tail buckets in mean-log-prob order; a second language
    with 4 docs in 2 score groups pins the score-grain rule (ties never
    split: 2 docs at cum_hi=2 -> head, 2 at cum_hi=4 -> tail, no middle
    bucket exists)."""
    rows = []
    did = 0
    # lang 'en': group scores (exact bigram MLE means over the 9-doc slice):
    #   "a a a a"  -> ln(9/9) = 0 per bigram         (head)
    #   "h i h j"  -> (2 ln(3/6) + ln(3/3)) / 3 ~ -0.462  (middle)
    #   "b b b c"  -> (2 ln(6/9) + ln(3/9)) / 3 ~ -0.636  (tail)
    for text in ("a a a a", "h i h j", "b b b c"):
        for _ in range(3):
            rows.append((did, text, "en", "srcX", len(text)))
            did += 1
    # lang 'fr': 2 score groups x 2 docs
    for text in ("p p p p", "q r q s"):
        for _ in range(2):
            rows.append((did, text, "fr", "srcX", len(text)))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from sap_sql_engine_spark.operators import textanalysis as ta

    out = ta.q_lm_perplexity_buckets(spark, str(tmp_path)).collect()
    en = [r for r in out if r.lang == "en"]
    fr = [r for r in out if r.lang == "fr"]
    assert [(r.bucket, r.bucket_label, r.n_docs) for r in en] == [
        (1, "head", 3), (2, "middle", 3), (3, "tail", 3)
    ]
    assert en[0].lo_micro_nats == en[0].hi_micro_nats == 0
    assert en[0].hi_micro_nats > en[1].hi_micro_nats > en[2].hi_micro_nats
    # score-grain tercile rule: ties share a bucket, middle may be empty
    assert [(r.bucket, r.bucket_label, r.n_docs) for r in fr] == [
        (1, "head", 2), (3, "tail", 2)
    ]


def test_streaming_late_data_watermark_semantics(spark, tmp_path):
    """Append-mode watermark contract, both sides: a row older than the
    watermark is DROPPED (its already-emitted window stays at its closed
    count, and numRowsDroppedByWatermark records it), while a late row
    still within the watermark updates its open window. Delay = 30 min,
    1-hour tumbling windows."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as se

    drop_dir = str(tmp_path / "drops")
    out_dir = str(tmp_path / "rollup")

    def drop(*hhmm):
        rows = [
            (1, "click", dt.datetime(2024, 3, 1, h, m), 1.0) for h, m in hhmm
        ]
        spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp, value double"
        ).write.mode("append").json(drop_dir)

    # b1: two rows in window 10:00, plus 12:00 -> watermark = 11:30 > 11:00
    drop((10, 0), (10, 10), (12, 0))
    q = se.streaming_late_rollup(spark, drop_dir, out_dir)
    try:
        q.processAllAvailable()
        # b2: 10:20 is BELOW the 11:30 watermark -> dropped; 12:10 joins
        # the open 12:00 window. Window 10:00 emits here (closed by b1's
        # watermark) with count 2, NOT 3.
        drop((10, 20), (12, 10))
        q.processAllAvailable()
        # b3: 12:20 is late (behind 14:00 in the same drop) but window
        # 12:00 is still open (watermark was 11:40) -> counted; 14:00
        # pushes the watermark to 13:30, closing window 12:00.
        drop((12, 20), (14, 0))
        q.processAllAvailable()
        # b4: flush trigger so the closed 12:00 window's emission lands
        drop((16, 0))
        q.processAllAvailable()
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
    finally:
        q.stop()

    got = {
        r.window_start: r.event_count
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got["2024-03-01 10:00:00"] == 2  # late 10:20 row NOT counted
    assert got["2024-03-01 12:00:00"] == 3  # within-watermark 12:20 counted
    assert dropped == 1  # the state operator recorded exactly the one drop


def test_token_pmi_pairs_planted_collocation(spark, tmp_path):
    """One planted collocation survives the count floor; its PMI equals
    the Python mirror of the exact quantized formula. Filler docs use
    doc-unique tokens so every filler pair stays below PMI_MIN_COUNT."""
    import math

    rows = [(d, "alpha beta", "en", "srcX", 10) for d in range(10)]
    rows += [
        (10 + d, " ".join(f"f{d}_{i}" for i in range(6)), "en", "srcX", 20)
        for d in range(10)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from sap_sql_engine_spark.operators import textanalysis as ta

    out = ta.q_token_pmi_pairs(spark, str(tmp_path)).collect()
    # Nu = 10*2 + 10*6 = 80; Np = 10*1 + 10*(5+4) = 100; c(alpha)=c(beta)=10
    expected = math.floor(
        math.log((10.0 * 80.0 * 80.0) / (100.0 * 10.0 * 10.0)) * 1_000_000
    )
    assert [(r.x, r.y, r.c_pair, r.pmi_micro_nats) for r in out] == [
        ("alpha", "beta", 10, expected)
    ]


def test_source_token_entropy_planted_uniform_and_degenerate(spark, tmp_path):
    """Uniform 4-token source scores exactly the quantized ln(4); a
    single-token source scores exactly 0."""
    rows = [(d, "a b c d", "en", "uniform", 8) for d in range(5)]
    rows += [(5 + d, "z z z", "en", "single", 5) for d in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from sap_sql_engine_spark.operators import textanalysis as ta

    out = {
        r.source: (r.n_tokens, r.vocab_size, r.entropy_micro_nats)
        for r in ta.q_source_token_entropy(spark, str(tmp_path)).collect()
    }
    import math

    lnq = math.floor(math.log(5.0 / 20.0) * 1_000_000)  # each p = 1/4
    assert out["uniform"] == (20, 4, -(4 * 5 * lnq) // 20)
    assert out["single"] == (9, 1, 0)


def test_docs_length_outliers_planted(spark, tmp_path):
    """Planted length profiles: a source of nine 10-token docs plus one
    100-token doc has median 10, MAD 0, exactly one outlier; a spread
    source (8..12 tokens) has MAD 1 and no outliers."""
    rows = []
    did = 0
    for _ in range(9):
        rows.append((did, " ".join(["w"] * 10), "en", "spiky", 10)); did += 1
    rows.append((did, " ".join(["w"] * 100), "en", "spiky", 100)); did += 1
    for ln in (8, 9, 10, 11, 12):
        rows.append((did, " ".join(["w"] * ln), "en", "spread", ln)); did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from sap_sql_engine_spark.operators import textanalysis as ta

    out = {
        r.source: (r.n_docs, r.median_len, r.mad, r.n_outliers, r.min_len, r.max_len)
        for r in ta.q_docs_length_outliers(spark, str(tmp_path)).collect()
    }
    assert out["spiky"] == (10, 10, 0, 1, 10, 100)
    assert out["spread"] == (5, 10, 1, 0, 8, 12)


def test_events_json_props_variant_total_on_malformed(spark, tmp_path):
    """The VARIANT lane must stay total: malformed props, null props, AND
    valid-JSON rows whose $.k has the wrong type (array, non-numeric
    string) all contribute null (excluded from sum/min/max, counted in
    event_count), exactly like the string lane — pins try_parse_json +
    try_variant_get semantics (strict variant_get would THROW on the
    type-mismatch rows)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1, "click", 1.0, '{"k": 3}'),
        (2, dt.datetime(2024, 1, 1, 0, 1), 1, "click", 1.0, '{k:'),
        (3, dt.datetime(2024, 1, 1, 0, 2), 1, "click", 1.0, None),
        (4, dt.datetime(2024, 1, 1, 0, 3), 1, "click", 1.0, '{"k": 7}'),
        (5, dt.datetime(2024, 1, 1, 0, 4), 1, "click", 1.0, '{"k": [1, 2]}'),
        (6, dt.datetime(2024, 1, 1, 0, 5), 1, "click", 1.0, '{"k": "abc"}'),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    from sap_sql_engine_spark.streaming import events as se

    out = se.q_events_json_props_variant(spark, str(tmp_path)).collect()
    assert [(r.event_type, r.event_count, r.k_sum, r.k_min, r.k_max) for r in out] == [
        ("click", 6, 10, 3, 7)
    ]
    # and the string lane agrees on the same mixed-type corpus
    out_s = se.q_events_json_props(spark, str(tmp_path)).collect()
    assert [(r.event_type, r.event_count, r.k_sum, r.k_min, r.k_max) for r in out_s] == [
        ("click", 6, 10, 3, 7)
    ]


def test_dedup_lsh_recall_report_invariants(spark, sf_dir):
    """The recall report's counters must be mutually consistent: the
    overlap can exceed neither side, and both bp ratios are exact
    integral divisions of the counters."""
    from sap_sql_engine_spark.operators import dedup

    r = dedup.q_dedup_lsh_recall_report(spark, sf_dir).collect()[0]
    assert r.n_hit <= min(r.n_exact, r.n_candidates)
    assert r.recall_bp == (r.n_hit * 10000 // r.n_exact if r.n_exact else 0)
    assert r.precision_bp == (
        r.n_hit * 10000 // r.n_candidates if r.n_candidates else 0
    )
    assert r.n_exact > 0  # the corpus plants real near-dups


def test_embedding_threshold_sweep_monotone(spark, sf_dir):
    """The sweep must thin monotonically as the cutoff tightens, and its
    operating-point row must agree exactly with the gated pair query."""
    from sap_sql_engine_spark.operators import similarity as sim

    rows = sim.q_embedding_threshold_sweep(spark, sf_dir).collect()
    assert [r.thr_permille for r in rows] == [400, 430, 460, 490, 520]
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs and a.n_vecs >= b.n_vecs
    n_pairs_op = sim.q_embedding_neardup_pairs(spark, sf_dir).count()
    assert rows[0].n_pairs == n_pairs_op
