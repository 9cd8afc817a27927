"""Planted-scenario tests for the round-9 operators: perceptual dHash
near-dup over real decoded media (re-encoded PNG collides, distinct image
does not), and the lane-agreement pin that makes the driver's SQL gate
transitively cover the Python decode lane (both lanes share ONE hash
definition — dhash_bands)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from sap_sql_engine_spark.operators import multimodal
from sap_sql_engine_spark.operators.multimodal import (
    DHASH_THRESHOLD,
    dhash_bands,
    sql_dhash_bands,
)
from test_pipeline_operators import _media_df, _png_encode

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def _hamming(a, b):
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def _gradient_rows(w, h, flip=False):
    """RGB gradient: luminance rises left->right, top->bottom (or the
    reverse) — a smooth signal with a distinctive dHash."""
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            v = (x * 7 + y * 11) % 256
            if flip:
                v = 255 - v
            row += bytes([v, v, v])
        rows.append(bytes(row))
    return rows


def test_media_dhash_png_reencode_collides(spark):
    """THE perceptual property: the same pixels re-encoded with different
    scanline filters (different bytes, different md5 — an exact-hash dedup
    misses it) produce the IDENTICAL dHash; a different image lands far
    beyond the near-dup threshold."""
    rows = _gradient_rows(16, 16)
    png_a = _png_encode(16, 16, 2, rows, filters=[0] * 16)
    png_a2 = _png_encode(16, 16, 2, rows, filters=[1, 2, 3, 4] * 4)
    png_b = _png_encode(16, 16, 2, _gradient_rows(16, 16, flip=True),
                        filters=[0] * 16)
    assert png_a != png_a2  # genuinely different byte streams
    out = {
        r.media_id: (r.b0, r.b1, r.b2, r.b3)
        for r in multimodal.media_dhash(
            _media_df(spark, [png_a, png_a2, png_b])
        ).collect()
    }
    assert out[0] == out[1], "re-encoded duplicate must collide at dist 0"
    assert _hamming(out[0], out[2]) > DHASH_THRESHOLD, (
        "distinct image must not be a near-dup"
    )


def test_media_dhash_sql_lane_matches_python_lane(spark, tmp_path):
    """Lane agreement: the JVM-side SQL lane the driver gate verifies and
    the mapInPandas decode lane compute the SAME bands for the same
    code-point signal — so the DuckDB gate transitively pins the decode
    lane's hash definition."""
    texts = [
        "the quick brown fox jumps over the lazy dog " * 3,
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaZ",
    ]
    rows = [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    sql_lane = {
        (r.media_id, r.band_no): r.band_val
        for r in sql_dhash_bands(docs.select("doc_id", "text")).collect()
    }
    for i, t in enumerate(texts):
        expected = dhash_bands([ord(c) for c in t])
        got = [sql_lane[(i, k)] for k in range(4)]
        assert got == expected, f"lane mismatch on doc {i}"


def test_media_dhash_short_signal_dropped(spark):
    """A payload shorter than DHASH_CELLS carries no 64-bit structure:
    both lanes drop it rather than hash garbage."""
    assert dhash_bands([1, 2, 3]) is None
    out = multimodal.media_dhash(
        _media_df(spark, [b"tiny payload"])
    ).collect()
    assert out == []


def test_events_lateness_histogram_planted(spark, tmp_path):
    """Out-of-order classes pin: per-user running max over ARRIVAL order
    (event_id), exact boundary inclusion (lateness == class bound stays
    in the class), cross-user isolation."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as ev

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta
    rows = [
        # user 1 arrival order: 12:00, then 11:59:59.5 (0.5s late ->
        # late_1s), then 11:59:00 (exactly 60s behind the running max ->
        # late_60s boundary), then 12:01 (in order again)
        (1, t0, 1, "view", 1.0, None),
        (2, t0 - s(seconds=0.5), 1, "view", 1.0, None),
        (3, t0 - s(seconds=60), 1, "view", 1.0, None),
        (4, t0 + s(minutes=1), 1, "view", 1.0, None),
        # user 2: strictly increasing -> all in order (no cross-user max)
        (5, t0 - s(hours=1), 2, "click", 1.0, None),
        (6, t0 - s(minutes=30), 2, "click", 1.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.lateness_class: (r.class_order, r.n_events, r.share_bp)
        for r in ev.q_events_lateness_histogram(spark, str(tmp_path)).collect()
    }
    assert out == {
        "in_order": (0, 4, 6666),
        "late_1s": (1, 1, 1666),
        "late_60s": (3, 1, 1666),
    }


def test_monthly_order_backlog_planted(spark, tmp_path):
    """Delta-stream interval counting pins: an order shipped in its own
    start month nets zero end-of-month backlog; a spanning order counts
    in every intervening month; the last shipment (not the first)
    closes the order."""
    import datetime as dt

    from sap_sql_engine_spark.operators import relational

    d = dt.date
    orders = [
        (1, d(2024, 1, 10)),  # ships across Jan..Mar (last ship Mar)
        (2, d(2024, 1, 5)),   # ships within Jan -> net 0 at Jan EOM
        (3, d(2024, 2, 1)),   # ships in Apr
    ]
    lines = [
        (1, d(2024, 1, 20)),
        (1, d(2024, 3, 15)),  # LAST shipment closes order 1 in Mar
        (2, d(2024, 1, 25)),
        (3, d(2024, 4, 2)),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderdate date"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_shipdate date"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        r.month: (r.n_started, r.n_shipped, r.backlog_eom)
        for r in relational.q_monthly_order_backlog(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        "2024-01": (2, 1, 1),  # order 1 open, order 2 net zero
        "2024-02": (1, 0, 2),  # orders 1 and 3 open
        "2024-03": (0, 1, 1),  # order 1 closes on its LAST shipment
        "2024-04": (0, 1, 0),  # order 3 closes
    }


def test_lpa_planted_two_cliques_and_bridge(spark):
    """Weighted LPA pins: two weight-10 triangles joined by a weight-1
    bridge resolve to two communities (the bridge never outweighs the
    clique), ties break to the smallest label, and an isolated node
    keeps its own label."""
    from sap_sql_engine_spark.operators.graph import LPA_ITERS, lpa_loop

    und = [
        (1, 2, 10), (1, 3, 10), (2, 3, 10),
        (4, 5, 10), (4, 6, 10), (5, 6, 10),
        (3, 4, 1),
    ]
    sym = spark.createDataFrame(
        und + [(b, a, w) for a, b, w in und], "src long, dst long, w long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "node long")
    labels = {
        r.node: r.lab for r in lpa_loop(nodes, sym, LPA_ITERS).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4, 7: 7}


def test_events_props_key_inventory_planted(spark, tmp_path):
    """Key inventory is TOTAL: objects inventory their keys, while
    malformed JSON, arrays, and scalar JSON all land under '<malformed>'
    (valid JSON that is not an object has no keys to promote)."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as ev

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a", 1.0, '{"k": 1}'),
        (2, t0, 1, "a", 1.0, '{"k": 2, "v": 3}'),
        (3, t0, 1, "a", 1.0, "{not json"),
        (4, t0, 1, "a", 1.0, "[1, 2]"),
        (5, t0, 1, "b", 1.0, '"scalar"'),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r.event_type, r.prop_key): (r.n_rows, r.share_bp)
        for r in ev.q_events_props_key_inventory(spark, str(tmp_path)).collect()
    }
    assert out == {
        ("a", "k"): (2, 4000),
        ("a", "v"): (1, 2000),
        ("a", "<malformed>"): (2, 4000),
        ("b", "<malformed>"): (1, 10000),
    }


def test_streaming_hll_registers_match_batch(spark, sf_dir):
    """Mergeable summaries in motion: the HLL register relation
    maintained as a streaming max-aggregate equals the batch registers
    over the same events — register-for-register, not just the final
    estimate."""
    from pyspark.sql import functions as F

    from sap_sql_engine_spark.operators.search import hll_registers
    from sap_sql_engine_spark.streaming import events as se

    q = se.streaming_hll_registers(spark, sf_dir)
    try:
        q.processAllAvailable()
        stream_regs = {
            (r.source, r.bucket): r.r
            for r in spark.table("events_hll_stream").collect()
        }
    finally:
        q.stop()
    batch_toks = se.table(spark, sf_dir, "events").select(
        F.col("event_type").alias("source"),
        F.col("user_id").cast("string").alias("token"),
    )
    batch_regs = {
        (r.source, r.bucket): r.r for r in hll_registers(batch_toks).collect()
    }
    assert stream_regs == batch_regs
    assert len(batch_regs) > 0


def test_dedup_normalization_ladder_planted(spark, tmp_path):
    """Each ladder stage reveals exactly its own duplicate class: an
    exact dup at stage 0, a case-only twin at stage 1, a whitespace-only
    twin at stage 2, a punctuation-only twin at stage 3."""
    from sap_sql_engine_spark.operators import dedup

    rows = [
        (1, "hello world one", "en", "s", 15),
        (2, "hello world one", "en", "s", 15),      # exact dup (stage 0)
        (3, "Hello World ONE", "en", "s", 15),      # case twin (stage 1)
        (4, "hello   world \t one", "en", "s", 19), # whitespace twin (2)
        (5, "hello, world: one!", "en", "s", 18),   # punct twin (stage 3)
        (6, "completely different text", "en", "s", 25),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.stage: (r.stage_name, r.n_distinct, r.n_dups, r.new_dups_vs_prev)
        for r in dedup.q_dedup_normalization_ladder(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[0] == ("raw", 5, 1, 1)
    assert out[1] == ("casefold", 4, 2, 1)
    assert out[2] == ("whitespace", 3, 3, 1)
    assert out[3] == ("alnum", 2, 4, 1)


def test_embedding_top_eigen_planted_axis(spark, tmp_path):
    """A corpus whose vectors all lie on ONE axis is perfectly
    anisotropic: the power iteration must lock onto that component with
    a 100% top-component share and a 100% eigen share."""
    from sap_sql_engine_spark.operators import similarity

    rows = [
        (0, [0.0, 0.5, 0.0, 0.0], 0),
        (1, [0.0, 1.0, 0.0, 0.0], 0),
        (2, [0.0, -0.25, 0.0, 0.0], 1),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = [
        tuple(r)
        for r in similarity.q_embedding_top_eigen(spark, str(tmp_path)).collect()
    ]
    assert out == [(3, similarity.EIG_ITERS, 1, 10000, 10000)]


def test_media_dhash_planted_neardup_pair(spark, tmp_path):
    """End-to-end pairs query on a planted corpus: a one-character edit
    of a long text is a near-dup (tiny signal perturbation), a reversed
    text is not, and the report histogram agrees with the pairs."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    edited = base.replace("lazy", "hazy", 1)  # one char, one cell nudged
    rows = [
        (1, base, "en", "src", len(base)),
        (2, edited, "en", "src", len(edited)),
        (3, base[::-1], "en", "src", len(base)),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    exp_dist = _hamming(
        dhash_bands([ord(c) for c in base]),
        dhash_bands([ord(c) for c in edited]),
    )
    assert exp_dist <= DHASH_THRESHOLD, "fixture must be a true near-dup"
    pairs = [
        (r.media_id_a, r.media_id_b, r.hamming_dist)
        for r in multimodal.q_media_dhash_neardup_pairs(
            spark, str(tmp_path)
        ).collect()
    ]
    # r13: the query also serves the re-ingested asset (twin of doc 1
    # under media_id -1), which pairs at distance 0 with everything doc
    # 1 near-dups with — the corpus's own near-dup pair is unchanged
    assert (1, 2, exp_dist) in pairs
    assert (-1, 1, 0) in pairs  # the twin surfaces with its original
    assert all(
        a == -1 or (a, b, d) == (1, 2, exp_dist) for a, b, d in pairs
    )
    report = {
        r.hamming_dist: (r.n_pairs, r.is_neardup)
        for r in multimodal.q_media_dhash_report(spark, str(tmp_path)).collect()
    }
    assert report.get(exp_dist, (0, 0))[0] >= 1
    assert report[exp_dist][1] == 1
    under = sum(n for d, (n, flag) in report.items() if flag == 1)
    # the report stays corpus-only; compare against the non-twin pairs
    assert under == len([p for p in pairs if p[0] != -1])
