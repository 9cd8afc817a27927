"""Property-based tests for the round-12 operators: the distributed
implementations against pure-Python oracles over randomly generated
inputs (derandomized, few examples — every example is a full Spark
job). The DuckDB gate pins one corpus; these pin the ALGORITHMS over
skew, ties, singletons, and degenerate shapes.
"""

from __future__ import annotations

import datetime as dt
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sap_sql_engine_spark.operators import dedup
from sap_sql_engine_spark.operators import relational as rel
from sap_sql_engine_spark.operators import textanalysis as ta
from sap_sql_engine_spark.streaming import events as se

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _write_daily_events(spark, tmpdir, counts):
    rows = []
    eid = 0
    base = dt.datetime(2024, 3, 1, 6, 0, 0)
    for day, c in enumerate(counts):
        for k in range(c):
            rows.append(
                (eid, base + dt.timedelta(days=day, minutes=k), 1, "click",
                 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmpdir / "events.parquet"))


@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=9), min_size=2, max_size=12
    )
)
@settings(**SETTINGS)
def test_mann_kendall_matches_python_pairs(spark, tmp_path_factory, counts):
    """S, the pair count, and the direction label reproduce a direct
    O(n^2) Python sweep over arbitrary daily-count vectors including
    all-equal (flat) and monotone shapes."""
    tmp = tmp_path_factory.mktemp("mk")
    _write_daily_events(spark, tmp, counts)
    got = [tuple(r) for r in se.q_events_mann_kendall(spark, str(tmp)).collect()]

    n = len(counts)
    s = sum(
        (counts[j] > counts[i]) - (counts[j] < counts[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    n_pairs = n * (n - 1) // 2
    # DIV truncates toward zero on both engines; Python // floors
    trend = (
        int(abs(s) * 1000 // n_pairs) * (1 if s >= 0 else -1)
        if n_pairs
        else None
    )
    direction = "rising" if s > 0 else ("falling" if s < 0 else "flat")
    assert got == [(n, n_pairs, s, trend, direction)]


@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=6), min_size=2, max_size=12
    )
)
@settings(**SETTINGS)
def test_runs_test_matches_python_fold(spark, tmp_path_factory, counts):
    """Up/down/runs counts and the expected-runs grid reproduce a direct
    Python fold, with ties dropped exactly as the operator drops them."""
    tmp = tmp_path_factory.mktemp("runs")
    _write_daily_events(spark, tmp, counts)
    got = [tuple(r) for r in se.q_events_runs_test(spark, str(tmp)).collect()]

    dirs = [
        1 if b > a else -1
        for a, b in zip(counts, counts[1:])
        if a != b
    ]
    n_up = sum(1 for d in dirs if d == 1)
    n_down = sum(1 for d in dirs if d == -1)
    n_runs = 0
    prev = None
    for d in dirs:
        if prev is None or d != prev:
            n_runs += 1
        prev = d
    if n_up + n_down:
        exp = 2 * n_up * n_down * 1000 // (n_up + n_down) + 1000
    else:
        exp = None
    gap = n_runs * 1000 - exp if exp is not None else None
    assert got == [(n_up, n_down, n_runs, exp, gap)]


@given(
    spends=st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=12
    )
)
@settings(**SETTINGS)
def test_spend_gini_matches_python_rank_form(spark, tmp_path_factory, spends):
    """The Gini permille reproduces the Python rank-form computation on
    arbitrary spend vectors (zeros, ties, single customer). Spends are
    whole dollars so the cents grid is exact."""
    tmp = tmp_path_factory.mktemp("gini")
    rows = [
        (i, 100 + i, "O", float(s), dt.datetime(2024, 1, 1 + i % 27),
         "1-URGENT")
        for i, s in enumerate(spends)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))
    got = [tuple(r) for r in rel.q_customer_spend_gini(spark, str(tmp)).collect()]

    cents = sorted(s * 100 for s in spends)
    n = len(cents)
    sx = sum(cents)
    six = sum((i + 1) * x for i, x in enumerate(cents))
    gini = (
        (2 * six - (n + 1) * sx) * 1000 // (n * sx) if n * sx else None
    )
    assert got == [(n, sx, gini)]


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(**SETTINGS)
def test_simpson_and_chao1_match_python_counts(
    spark, tmp_path_factory, docs
):
    """Simpson concentration / top-share and the Chao1 estimate (both
    branches of the n2 fallback) reproduce direct Python counting over
    arbitrary single-source token multisets."""
    tmp = tmp_path_factory.mktemp("simp")
    rows = [
        (i, " ".join(toks), "en", "s0", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    freq = Counter(t for toks in docs for t in toks)
    n_tok = sum(freq.values())
    v = len(freq)
    same2 = sum(c * (c - 1) for c in freq.values())
    simpson = (
        same2 * 1000 // (n_tok * (n_tok - 1)) if n_tok > 1 else None
    )
    top = max(freq.values()) * 1000 // n_tok

    got_s = [
        tuple(r)
        for r in ta.q_text_simpson_diversity(spark, str(tmp)).collect()
    ]
    assert got_s == [("s0", n_tok, v, simpson, top)]

    n1 = sum(1 for c in freq.values() if c == 1)
    n2 = sum(1 for c in freq.values() if c == 2)
    if n2 > 0:
        chao1 = v * 1000 + n1 * n1 * 1000 // (2 * n2)
    else:
        chao1 = v * 1000 + n1 * (n1 - 1) * 1000 // 2
    got_c = [
        tuple(r)
        for r in ta.q_docs_chao1_richness(spark, str(tmp)).collect()
    ]
    assert got_c == [("s0", v, n1, n2, chao1)]


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["w1", "w2", "w3", "w4", "w5", "w6"]),
            min_size=1,
            max_size=6,
        ),
        min_size=2,
        max_size=5,
    )
)
@settings(**SETTINGS)
def test_prefix_filter_matches_python_allpairs(
    spark, tmp_path_factory, docs
):
    """COMPLETENESS of the prefix filter: the banded candidate join plus
    exact verify returns exactly the pairs a brute-force all-pairs
    Python sweep finds at the same integer threshold — the prefix
    theorem exercised over random small vocabularies with heavy
    overlap, duplicates, and singleton docs."""
    tmp = tmp_path_factory.mktemp("ppj")
    rows = [
        (i + 1, " ".join(toks), "en", "s", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    got = {
        (r.doc1, r.doc2): (r.n1, r.n2, r.shared, r.jaccard_permille)
        for r in dedup.q_dedup_prefix_filter_pairs(spark, str(tmp)).collect()
    }

    sets = {i + 1: set(toks) for i, toks in enumerate(docs)}
    want = {}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter and inter * 1000 // union >= dedup.PPJ_TAU_PERMILLE:
                want[(a, b)] = (
                    len(sets[a]),
                    len(sets[b]),
                    inter,
                    inter * 1000 // union,
                )
    assert got == want


@given(
    seq=st.lists(
        st.sampled_from(["click", "view", "purchase"]), min_size=2,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_transition_entropy_matches_python_counts(
    spark, tmp_path_factory, seq
):
    """Per-state conditional entropy reproduces a direct Python count
    with the identical single-ln micro-nat quantization (floor once per
    count value, integer arithmetic after)."""
    import math

    tmp = tmp_path_factory.mktemp("tent")
    rows = [
        (i, dt.datetime(2024, 3, 1, 10, 0)
         + dt.timedelta(seconds=30 * i), 7, t, 1.0, "{}")
        for i, t in enumerate(seq)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))
    got = {r.from_type: r for r in
           se.q_events_transition_entropy(spark, str(tmp)).collect()}

    trans: dict[tuple[str, str], int] = {}
    for a, b in zip(seq, seq[1:]):
        trans[(a, b)] = trans.get((a, b), 0) + 1
    froms = sorted({a for a, _ in trans})
    assert set(got) == set(froms)
    for f in froms:
        cells = {b: c for (a, b), c in trans.items() if a == f}
        t_f = sum(cells.values())
        clnc = sum(
            c * math.floor(math.log(c) * 1_000_000)
            for c in cells.values()
        )
        want_h = math.floor(math.log(t_f) * 1_000_000) - clnc // t_f
        assert got[f].n_transitions == t_f
        assert got[f].n_next_types == len(cells)
        assert got[f].entropy_micro_nats == want_h
