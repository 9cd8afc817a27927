"""Property-based tests for the search operators: chunk geometry and BM25
against pure-Python oracles on random corpora (hypothesis, derandomized —
same conventions as tests/test_properties.py)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sap_sql_engine_spark.operators import search

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

VOCAB = ["spark", "join", "window", "scan", "agg", "sort", "hash", "row"]

corpus_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=50),
    values=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=200).map(" ".join),
    min_size=1,
    max_size=12,
)


def _chunk_starts(n_toks: int) -> list[int]:
    starts = []
    s = 1
    stop = max(n_toks - search.CHUNK_OVERLAP, 1)
    while s <= stop:
        starts.append(s)
        s += search.CHUNK_STRIDE
    return starts


@settings(**SETTINGS)
@given(corpus_strategy)
def test_chunking_covers_every_token_exactly(spark, texts):
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    # run the operator's body over the in-memory relation via its helpers:
    # q_doc_chunks reads a table; replicate by temp-subbing the pipeline
    from pyspark.sql import functions as F

    toks = docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
    starts = F.expr(
        f"sequence(1, greatest(size(toks) - {search.CHUNK_OVERLAP}, 1), {search.CHUNK_STRIDE})"
    )
    chunks = (
        toks.select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            "start",
            F.size(F.expr(f"slice(toks, start, {search.CHUNK_SIZE})")).alias("n"),
        )
        .collect()
    )
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    for did, text in texts.items():
        n_toks = len(text.split())
        got = sorted((c.start, c.n) for c in by_doc[did])
        expected_starts = _chunk_starts(n_toks)
        assert [s for s, _ in got] == expected_starts
        # full coverage, correct tail size
        assert got[-1][0] + got[-1][1] - 1 == n_toks
        for s, n in got:
            assert 1 <= n <= search.CHUNK_SIZE


def _py_bm25(texts: dict[int, str]) -> dict[int, float]:
    n = len(texts)
    dls = {d: len(t.split()) for d, t in texts.items()}
    avgdl = sum(dls.values()) / n
    tfs = {
        d: {q: t.split().count(q) for q in search.BM25_QUERY if q in t.split()}
        for d, t in texts.items()
    }
    dfs = {
        q: sum(1 for d in texts if q in tfs[d]) for q in search.BM25_QUERY
    }
    out = {}
    for d in texts:
        total = 0
        for q, tf in tfs[d].items():
            idf = math.log(1.0 + (n - dfs[q] + 0.5) / (dfs[q] + 0.5))
            tfp = (tf * (search.BM25_K1 + 1)) / (
                tf
                + search.BM25_K1
                * (1 - search.BM25_B + search.BM25_B * dls[d] / avgdl)
            )
            total += math.floor(idf * tfp * search.BM25_Q)
        if total:
            out[d] = round(total / search.BM25_Q, 6)
    return out


@settings(**SETTINGS)
@given(corpus_strategy)
def test_bm25_matches_python_oracle(spark, tmp_path_factory, texts):
    import os

    d = str(tmp_path_factory.mktemp("bm25"))
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    docs.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r.doc_id: r.bm25 for r in search.q_bm25_search(spark, d).collect()}
    assert got == _py_bm25(texts)


def test_hll_daily_active_users_within_error(spark, sf_dir):
    """The HLL sketch generalizes off the token domain: per-day distinct
    USER estimates (the approximate-DAU rollup a 100 TB event stream
    would keep instead of exact distinct state) land within the sketch's
    error envelope of the exact counts on every day."""
    from pyspark.sql import functions as F

    from sap_sql_engine_spark.operators import search

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("source"),
        F.col("user_id").cast("string").alias("token"),
    )
    est = {
        r.source: search.hll_corrected(r.hll_raw_estimate, r.n_empty_regs)
        for r in search.hll_estimate_from(
            search.hll_registers(stream)
        ).collect()
    }
    exact = {
        r.source: r.exact
        for r in stream.groupBy("source")
        .agg(F.countDistinct("token").alias("exact"))
        .collect()
    }
    assert set(est) == set(exact) and len(exact) > 5
    for day, ex in exact.items():
        # 256 buckets -> sigma ~6.5%; 3 sigma + small-range slack
        assert abs(est[day] - ex) <= max(0.2 * ex, 8), (day, est[day], ex)
