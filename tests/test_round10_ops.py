"""Planted-scenario tests for the round-10 operators: the hard-sigmoid
logistic trainer learns a linearly separable corpus to 10000 bp, hybrid
RRF ranks the jointly-supported document above each single ranker's
winner, 8-bit WAV decodes as unsigned offset-binary (the ADVICE r9 fix),
and the audio envelope fingerprint survives re-encoding (16-bit -> 8-bit
requantization) while distinct waveforms separate."""

import io
import struct
import sys
import wave

import pytest

sys.path.insert(0, "/root/repo")

from sap_sql_engine_spark.operators import classifier, dedup, multimodal, similarity
from sap_sql_engine_spark.operators.multimodal import (
    AFP_MIN_LEN,
    AFP_THRESHOLD,
    audio_envelope_bands,
    sql_audio_envelope_bands,
)
from sap_sql_engine_spark.operators.search import rrf_fuse
from test_pipeline_operators import _media_df


# ---------------------------------------------------------------------------
# logistic trainer: planted linearly-separable corpus


def test_logreg_planted_separable_scores_10000bp(spark):
    """A corpus where the label IS the stopword-density feature (en docs
    all stopwords, de docs none) must train to perfect accuracy on BOTH
    splits within the bounded LOGREG_ITERS steps — the proof the
    integer-quantized recurrence learns when signal exists (the gated
    corpus honestly cannot be learned; see the module docstring)."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "the of to in is it and a", "en"))
        else:
            rows.append((i, "xxq yyq zzq wwq vvq uuq ttq ssq", "de"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = classifier.logreg_fit_report(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_train == 32 and r.n_heldout == 8
    assert r.train_acc_bp == 10000
    assert r.heldout_acc_bp == 10000
    assert r.w_stop > 0  # the separating feature carries positive weight


def test_logreg_threshold_sweep_planted(spark):
    """On the separable corpus the tau=0 operating point is perfect
    (precision = recall = 10000 bp); an absurdly high tau predicts
    nothing and reports the -1 precision sentinel with recall 0."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "the of to in is it and a", "en"))
        else:
            rows.append((i, "xxq yyq zzq wwq vvq uuq ttq ssq", "de"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.thr_micro: r for r in classifier.logreg_threshold_sweep(docs).collect()}
    assert out[0].precision_bp == 10000 and out[0].recall_bp == 10000
    hi = out[max(out)]
    if hi.n_pred_pos == 0:  # the planted margin may still clear 100k micro
        assert hi.precision_bp == -1 and hi.recall_bp == 0


# ---------------------------------------------------------------------------
# hybrid RRF: the fused list beats each single ranker


def test_hybrid_rrf_beats_single_rankers(spark):
    """The RRF property the fusion exists for: a document ranked 3rd
    lexically and 2nd semantically outranks both single-ranker winners
    (each supported by only one list) in the fused order."""
    lex = spark.createDataFrame(
        [(1, 1), (3, 2), (100, 3), (4, 4)], "doc_id long, lr int"
    )
    sem = spark.createDataFrame(
        [(2, 1), (100, 2), (5, 3), (6, 4)], "vec_id long, sr int"
    )
    out = {r.doc_id: r for r in rrf_fuse(lex, sem).collect()}
    top = out[100]
    assert top.hybrid_rank == 1  # beats lex winner (doc 1) and sem winner (doc 2)
    assert top.lex_rank == 3 and top.sem_rank == 2
    # RRF_Q DIV (RRF_K + r): 1e6//63 + 1e6//62
    assert top.rrf_micro == 1_000_000 // 63 + 1_000_000 // 62
    # single-list docs carry the rank-0 sentinel on the missing side and
    # tie at 1e6//61, broken by doc_id
    assert out[1].sem_rank == 0 and out[2].lex_rank == 0
    assert out[1].hybrid_rank == 2 and out[2].hybrid_rank == 3


# ---------------------------------------------------------------------------
# 8-bit WAV: unsigned offset-binary decode (ADVICE r9)


def _wav_bytes_8bit(samples_unsigned, framerate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{len(samples_unsigned)}B", *samples_unsigned))
    return buf.getvalue()


def test_wav_8bit_decodes_unsigned_offset_binary(spark):
    """8-bit WAV samples are unsigned offset-binary (0..255, silence at
    128): byte 224 must decode to +96 (bin 14 of the amplitude
    histogram), byte 32 to -96 (bin 2). Under the old signed-'b' decode,
    224 wrapped to -32 (bin 6) — the ADVICE r9 distortion."""
    samples, width = multimodal._wav_samples(
        _wav_bytes_8bit([224] * 4 + [32] * 4)
    )
    assert width == 1
    assert samples == [96] * 4 + [-96] * 4
    wav = _wav_bytes_8bit([224] * 200 + [32] * 200)
    out = multimodal.decode_features(_media_df(spark, [wav])).collect()
    feats = out[0].features
    # (96/128+1)/2*16 = 14; (-96/128+1)/2*16 = 2
    assert feats[14] == pytest.approx(0.5)
    assert feats[2] == pytest.approx(0.5)
    assert feats[6] == 0.0  # where the signed-wrap bug used to land byte 224


# ---------------------------------------------------------------------------
# audio envelope fingerprint: re-encode collides, distinct separates,
# lanes agree


def _envelope_waveform(loud_on_even, n_frames=70, frame=4):
    """Alternating loud/quiet frames — a distinctive energy envelope.
    Returns centered sample amplitudes in [-100, 100]."""
    samples = []
    for f in range(n_frames):
        loud = (f % 2 == 0) == loud_on_even
        amp = 100 if loud else 30
        for i in range(frame):
            samples.append(amp if i % 2 == 0 else -amp)
    return samples


def _wav_bytes_16bit(samples, framerate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_audio_reencode_neardup_collides(spark):
    """THE fingerprint property: the same waveform re-encoded 16-bit ->
    8-bit (different bytes, different scale — exact dedup misses it)
    produces IDENTICAL envelope bands (hamming 0 <= threshold); the
    inverted envelope lands far beyond the threshold."""
    base = _envelope_waveform(loud_on_even=True)
    wav16 = _wav_bytes_16bit([s * 256 for s in base])
    wav8 = _wav_bytes_8bit([128 + s for s in base])
    wav_other = _wav_bytes_16bit(
        [s * 256 for s in _envelope_waveform(loud_on_even=False)]
    )
    out = {
        r.media_id: [r.b0, r.b1, r.b2, r.b3]
        for r in multimodal.media_audio_fingerprint(
            _media_df(spark, [wav16, wav8, wav_other])
        ).collect()
    }
    assert out[0] == out[1], "re-encoded duplicate must fingerprint identically"
    dist = sum(bin(a ^ b).count("1") for a, b in zip(out[0], out[2]))
    assert dist > AFP_THRESHOLD, f"distinct waveform too close (hamming {dist})"


def test_logreg_ablation_planted(spark):
    """Drop-one ablation on the separable corpus: removing the stopword
    feature (the ONLY signal) collapses held-out accuracy to ~chance,
    while removing the non-informative features leaves it perfect."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "the of to in is it and a", "en"))
        else:
            rows.append((i, "xxq yyq zzq wwq vvq uuq ttq ssq", "de"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.ablation: r for r in classifier.logreg_ablation_report(docs).collect()}
    assert out["full"].heldout_acc_bp == 10000 and out["full"].delta_bp == 0
    assert out["no_alpha"].heldout_acc_bp == 10000
    assert out["no_len"].heldout_acc_bp == 10000
    assert out["no_stop"].heldout_acc_bp <= 6000  # signal gone -> ~chance
    assert out["no_stop"].delta_bp <= -4000


def test_rrf_k_sweep_consistent_with_hybrid(spark, sf_dir):
    """The default-k row must be self-consistent: overlap with itself is
    the full top-N and its winner is exactly hybrid_search_rrf's rank-1."""
    from sap_sql_engine_spark.operators import search

    rows = {r.rrf_k: r for r in search.q_hybrid_rrf_k_sweep(spark, sf_dir).collect()}
    default = rows[search.RRF_K]
    assert getattr(default, f"overlap_with_default_top{search.HYBRID_TOPN}") == search.HYBRID_TOPN
    hybrid_top1 = (
        search.q_hybrid_search_rrf(spark, sf_dir)
        .filter("hybrid_rank = 1")
        .collect()[0]
        .doc_id
    )
    assert default.top1_doc_id == hybrid_top1


def test_logreg_calibration_planted(spark):
    """On the separable corpus the model saturates: held-out rows land
    only in the extreme bins, each perfectly calibrated (positives in
    the top bin at pos_rate 10000, negatives in the bottom at 0)."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "the of to in is it and a", "en"))
        else:
            rows.append((i, "xxq yyq zzq wwq vvq uuq ttq ssq", "de"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.bin: r for r in classifier.logreg_calibration_curve(docs).collect()}
    assert set(out) == {0, classifier.CALIB_BINS - 1}
    lo, hi = out[0], out[classifier.CALIB_BINS - 1]
    assert lo.pos_rate_bp == 0 and hi.pos_rate_bp == 10000
    assert lo.n + hi.n == 8  # the whole held-out split, nothing dropped


def test_streaming_logreg_score_matches_batch(spark, sf_dir, tmp_path):
    """Train-offline/serve-online twin: docs streamed in two JSONL drops
    are scored per micro-batch with the batch-trained weights; the
    accumulated (doc_id, z_micro, pred) rows equal the batch scorer
    exactly on the same rows."""
    from pyspark.sql import functions as F

    from sap_sql_engine_spark.sources.loader import spread, table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    sample = docs.filter(F.col("doc_id") < 20)
    drop_dir = str(tmp_path / "docdrops")
    out_dir = str(tmp_path / "scores")

    sample.filter(F.col("doc_id") < 10).write.mode("append").json(drop_dir)
    q = classifier.streaming_logreg_score(spark, sf_dir, drop_dir, out_dir)
    try:
        q.processAllAvailable()
        sample.filter(F.col("doc_id") >= 10).write.mode("append").json(drop_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r.doc_id, r.z_micro, r.pred)
        for r in spark.read.parquet(out_dir).collect()
    )
    _feats, w = classifier._fit(spread(docs))
    want = sorted(
        (r.doc_id, r.z_micro, r.pred)
        for r in classifier.batch_scores(sample, w).collect()
    )
    assert got == want
    assert len(got) == 20


def test_order_sprees_planted(spark, tmp_path):
    """Planted islands: customer 1 places 3 orders within the gap, then
    one far later (one 3-spree + one singleton); customer 2 places one
    order — histogram: two 1-sprees, one 3-spree, exact cents."""
    from datetime import datetime

    from sap_sql_engine_spark.operators import relational

    rows = [
        (1, 1, "O", 10.00, datetime(1995, 1, 1), "1-URGENT"),
        (2, 1, "O", 20.00, datetime(1995, 1, 15), "1-URGENT"),
        (3, 1, "O", 30.00, datetime(1995, 2, 10), "1-URGENT"),
        (4, 1, "O", 40.00, datetime(1999, 1, 1), "1-URGENT"),
        (5, 2, "O", 50.00, datetime(1995, 1, 1), "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r.spree_orders: r for r in relational.q_customer_order_sprees(
        spark, str(tmp_path)
    ).collect()}
    assert out[1].n_sprees == 2 and out[1].revenue_cents == 9000
    assert out[3].n_sprees == 1 and out[3].revenue_cents == 6000


def test_dedup_soft_weights_planted(spark, tmp_path):
    """A 3-clique of identical docs plus a singleton: the clique carries
    3 x (1e6 DIV 3) micro, the singleton a full 1e6 — mass retained =
    1999999/4000000 = 4999 bp (the truncating-division remainder is the
    documented sub-unit loss)."""
    text_dup = " ".join(f"tok{i}" for i in range(20))
    text_uniq = " ".join(f"other{i}" for i in range(20))
    rows = [
        (1, text_dup, "en", "s", len(text_dup)),
        (2, text_dup, "en", "s", len(text_dup)),
        (3, text_dup, "en", "s", len(text_dup)),
        (4, text_uniq, "en", "s", len(text_uniq)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = dedup.q_dedup_soft_weights(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 4 and r.n_clustered == 3
    assert r.effective_mass_micro == 3 * (1_000_000 // 3) + 1_000_000
    assert r.mass_retained_bp == r.effective_mass_micro // 400


def test_ivf_probe_sweep_monotone(spark, sf_dir):
    """Recall must be non-decreasing in n_probe (each setting's probed
    cells are a superset of the previous), and the scanned-lists share is
    the exact n_probe/N_LISTS quotient."""
    rows = {r.n_probe: r for r in similarity.q_ann_ivf_probe_sweep(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(similarity.IVF_PROBE_SWEEP)
    recalls = [rows[p].recall_bp for p in sorted(rows)]
    assert recalls == sorted(recalls)
    for p, r in rows.items():
        assert r.scanned_lists_bp == p * 10000 // similarity.N_LISTS


def test_session_gap_sweep_consistent_with_sessionize(spark, sf_dir):
    """The sweep's SESSION_GAP_SECONDS row must count exactly the
    sessions q_events_sessionize builds, and session counts must be
    monotonically non-increasing in the gap (a bigger gap can only
    merge sessions)."""
    from sap_sql_engine_spark.streaming import events as ev

    rows = {r.gap_s: r for r in ev.q_events_session_gap_sweep(spark, sf_dir).collect()}
    counts = [rows[g].n_sessions for g in sorted(rows)]
    assert counts == sorted(counts, reverse=True)
    sess_total = sum(
        r.session_count for r in ev.q_events_sessionize(spark, sf_dir).collect()
    )
    assert rows[ev.SESSION_GAP_SECONDS].n_sessions == sess_total


def test_seasonal_naive_error_planted(spark, tmp_path):
    """Two identical days score WAPE 0; a third day with hour 0 doubled
    (4 vs 2 events) scores exactly |4-2|*10000 DIV (4+3) over its two
    scored hours."""
    from datetime import datetime

    from sap_sql_engine_spark.streaming import events as ev

    rows = []
    # day 1 and day 2: hours 0 and 1 with 2 and 3 events each
    for day in (1, 2):
        for hour, n in ((0, 2), (1, 3)):
            for i in range(n):
                rows.append((len(rows), datetime(2024, 1, day, hour, i),))
    spark.createDataFrame(rows, "event_id long, ts timestamp").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    r = ev.q_events_seasonal_naive_error(spark, str(tmp_path)).collect()[0]
    assert r.n_hours_scored == 2 and r.wape_bp == 0

    for i in range(4):  # day 3: hour 0 doubles, hour 1 holds
        rows.append((len(rows), datetime(2024, 1, 3, 0, i)))
    for i in range(3):
        rows.append((len(rows), datetime(2024, 1, 3, 1, i)))
    spark.createDataFrame(rows, "event_id long, ts timestamp").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    r = ev.q_events_seasonal_naive_error(spark, str(tmp_path)).collect()[0]
    assert r.n_hours_scored == 4
    assert r.abs_err_total == 2 and r.actual_total == 12
    assert r.wape_bp == 2 * 10000 // 12


def test_ann_index_delta_accounting(spark, sf_dir):
    """The delta report's accounting must close: standing + new counts
    cover the whole corpus, batch shares are a (truncating) partition of
    10000 bp, and post-ingest load factors average 1000 milli."""
    rows = similarity.q_ann_index_delta_report(spark, sf_dir).collect()
    n_corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_standing + r.n_new for r in rows) == n_corpus
    tot_new = sum(r.n_new for r in rows)
    assert 0 < tot_new < n_corpus  # the md5 split genuinely splits
    share_sum = sum(r.batch_share_bp for r in rows)
    assert 10000 - len(rows) <= share_sum <= 10000  # truncation only
    wsum = sum((r.n_standing + r.n_new) * r.load_after_milli for r in rows)
    # weighted mean of load factors is ~1000 milli by construction
    assert abs(wsum / n_corpus - 1000) < 100


def test_hygiene_report_partitions_corpus(spark, sf_dir):
    """The hygiene classes are mutually exclusive by construction, so
    their counts must sum to the corpus size and shares to ~10000 bp."""
    from sap_sql_engine_spark.operators import textanalysis as ta
    from sap_sql_engine_spark.sources.loader import table

    rows = ta.q_docs_hygiene_report(spark, sf_dir).collect()
    n = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n
    share = sum(r.share_bp for r in rows)
    assert 10000 - len(rows) <= share <= 10000


def test_burst_report_ordering_and_bounds(spark, sf_dir):
    """Peak <= total per user; rows ranked by peak desc with user-id
    ties resolved ascending; the peak share is an exact bp quotient."""
    from sap_sql_engine_spark.streaming import events as ev

    rows = ev.q_events_burst_report(spark, sf_dir).collect()
    assert 0 < len(rows) <= ev.BURST_TOP_N
    keys = [(-r.peak_minute_events, r.user_id) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r.peak_minute_events <= r.total_events
        assert r.peak_share_bp == r.peak_minute_events * 10000 // r.total_events


def test_bpe_compression_curve_invariants(spark, sf_dir):
    """Checkpoint 0 is the character baseline (every symbol 1 char =>
    tokens == chars, ratio exactly 1000 milli, saved 0 bp); merges can
    only shrink the token total, never the char total."""
    from sap_sql_engine_spark.operators import bpe

    rows = {r.merge_rank: r for r in bpe.q_bpe_compression_curve(
        spark, sf_dir
    ).collect()}
    base = rows[0]
    assert base.corpus_tokens == base.corpus_chars
    assert base.chars_per_token_milli == 1000 and base.tokens_saved_bp == 0
    toks = [rows[k].corpus_tokens for k in sorted(rows)]
    assert toks == sorted(toks, reverse=True)
    assert len({rows[k].corpus_chars for k in rows}) == 1  # chars invariant
    assert rows[bpe.N_MERGES].tokens_saved_bp > 0  # merges genuinely save


def test_embedding_centroid_drift_planted(spark, tmp_path):
    """Planted exchangeable halves: every vector of a label identical =>
    both half centroids coincide => drift exactly 0; a label whose two
    halves sit at different constants drifts by exactly |a-b|*sqrt(D)
    micro (all components differ equally)."""
    import math

    rows = []
    # label 0: all vectors identical (need both md5 halves populated)
    for i in range(20):
        rows.append((i, [0.5] * 64, 0))
    # label 1: value depends on the SAME md5 half split the query uses
    for i in range(20, 40):
        h = int(hashlib_bucket(i) < 50)
        rows.append((i, [0.25 if h else 0.75] * 64, 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {r.label: r for r in similarity.q_embedding_centroid_drift(
        spark, str(tmp_path)
    ).collect()}
    assert out[0].centroid_drift_micro == 0
    want = int(math.floor(math.sqrt(64 * 500_000**2)))
    assert abs(out[1].centroid_drift_micro - want) <= 64  # per-pos floor slack


def hashlib_bucket(vec_id: int) -> int:
    import hashlib

    return int(hashlib.md5(str(vec_id).encode()).hexdigest()[:8], 16) % 100


def test_parts_sourcing_risk_accounting(spark, sf_dir):
    """Risk classes partition the part population and the revenue."""
    from sap_sql_engine_spark.operators import relational
    from sap_sql_engine_spark.sources.loader import table

    rows = relational.q_parts_sourcing_risk(spark, sf_dir).collect()
    li = table(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r.n_parts for r in rows) == n_parts
    share = sum(r.revenue_share_bp for r in rows)
    assert 10000 - len(rows) <= share <= 10000  # truncation only


def test_token_length_histogram_consistent(spark, sf_dir):
    """Types and occurrences must reconcile with the raw token stream."""
    from sap_sql_engine_spark.operators import textanalysis as ta
    from sap_sql_engine_spark.sources.loader import table

    rows = ta.q_token_length_histogram(spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents")
    toks = docs.selectExpr(
        r"explode(split(trim(text), '\\s+')) AS token"
    ).filter("token != ''")
    assert sum(r.n_occurrences for r in rows) == toks.count()
    assert sum(r.n_types for r in rows) == toks.distinct().count()
    assert all(r.token_len > 0 for r in rows)


def test_read_media_dir_binary_file_source(spark, tmp_path):
    """Real ingestion on-ramp: WAV/PNG/junk files on disk read through
    Spark's binaryFile source into MEDIA_SCHEMA with JVM-side magic-byte
    sniffing, then flow through the decode operators end-to-end."""
    from test_pipeline_operators import _png_encode, _wav_bytes

    media_dir = tmp_path / "media"
    media_dir.mkdir()
    (media_dir / "a.wav").write_bytes(_wav_bytes([8192, -8192] * 200))
    rows16 = [bytes(bytearray([(x * 7) % 256] * 48)) for x in range(16)]
    (media_dir / "b.png").write_bytes(
        _png_encode(16, 16, 2, rows16, filters=[0] * 16)
    )
    (media_dir / "c.bin").write_bytes(b"not media at all")
    got = {
        r.meta.format: r
        for r in multimodal.read_media_dir(spark, str(media_dir)).collect()
    }
    assert set(got) == {"audio/wav", "image/png", "application/octet-stream"}
    assert len({r.media_id for r in got.values()}) == 3  # distinct ids
    # the ingested WAV decodes through the same feature operator
    feats = multimodal.decode_features(
        multimodal.read_media_dir(spark, str(media_dir), glob="*.wav")
    ).collect()
    assert len(feats) == 1 and feats[0].features[10] == pytest.approx(0.5)


def test_audio_sql_lane_matches_python_lane(spark, sf_dir):
    """Lane-agreement pin (the dHash pattern): the gated SQL lane and the
    Python decode lane share ONE fingerprint definition, so the driver's
    oracle gate transitively covers the Python lane. Compared band-for-
    band over the real corpus docs long enough to fingerprint."""
    from sap_sql_engine_spark.sources.loader import table

    # deterministic sample: LIMIT without ORDER BY may pick different rows
    # in the two jobs below (ADVICE r10) — a key-range filter picks the
    # same 50 docs in both
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter("doc_id < 50")
    )
    sql_bands = {}
    for r in sql_audio_envelope_bands(docs).collect():
        sql_bands.setdefault(r.media_id, {})[r.band_no] = r.band_val
    rows = docs.collect()
    checked = 0
    for row in rows:
        py = audio_envelope_bands([ord(c) for c in row.text])
        if py is None:
            assert row.doc_id not in sql_bands  # both lanes drop short docs
            continue
        got = [sql_bands[row.doc_id][k] for k in range(4)]
        assert got == py, f"doc {row.doc_id}: SQL {got} != python {py}"
        checked += 1
    assert checked >= 10  # the corpus genuinely exercises the lane pin
    assert len(rows) - checked >= 1  # and the short-doc drop path
