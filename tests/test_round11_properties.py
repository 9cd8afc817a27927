"""Property-based tests for the round-11 continuation operators: the
distributed implementations against pure-Python oracles over randomly
generated inputs (derandomized, few examples — every example is a full
Spark job). The DuckDB gate pins one corpus; these pin the ALGORITHMS
over skew, ties, singletons, and degenerate shapes.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sap_sql_engine_spark.operators import dedup
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


@given(counts=st.lists(st.integers(min_value=1, max_value=9), min_size=3, max_size=14))
@settings(**SETTINGS)
def test_cusum_changepoint_matches_python_fold(spark, tmp_path_factory, counts):
    """The CUSUM report equals a direct Python evaluation of its own
    definition: global-mean milli reference (truncating DIV), exact
    integer cumulative sums, argmax |cusum| with the earliest-day tie
    break over days with a non-empty post segment, and truncating-DIV
    pre/post means."""
    tmp = tmp_path_factory.mktemp("cusum")
    _write_daily_events(spark, tmp, counts)
    r = se.q_events_cusum_changepoint(spark, str(tmp)).collect()[0]

    n = len(counts)
    total = sum(counts)
    ref = total * 1000 // n
    cum = 0
    best = None  # (abs_cusum, day_index)
    cums = []
    for i, c in enumerate(counts):
        cum += c
        a = abs(cum * 1000 - (i + 1) * ref)
        cums.append(a)
        if i + 1 < n and (best is None or a > best[0]):
            best = (a, i)
    cp = best[1]
    pre = counts[: cp + 1]
    post = counts[cp + 1:]
    assert r.n_days == n
    assert r.ref_milli == ref
    assert r.changepoint_day == (
        dt.date(2024, 3, 1) + dt.timedelta(days=cp)
    ).isoformat()
    assert r.max_abs_cusum_milli == best[0]
    assert r.pre_mean_milli == sum(pre) * 1000 // len(pre)
    assert r.post_mean_milli == sum(post) * 1000 // len(post)


@given(
    toks=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_good_turing_matches_python_counts(spark, tmp_path_factory, toks):
    """Frequency-of-frequencies, adjusted counts, and the unseen-mass
    estimate all reproduce a direct Python count over an arbitrary
    token multiset (emitted as one doc per token so doc structure
    cannot matter)."""
    tmp = tmp_path_factory.mktemp("gt")
    rows = [
        (i, t, "en", "s", len(t)) for i, t in enumerate(toks)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    got = {r.r: r for r in ta.q_token_good_turing(spark, str(tmp)).collect()}

    from collections import Counter

    freq = Counter(toks)
    fof = Counter(freq.values())
    total = sum(toks.count(t) for t in set(toks))
    n1 = fof.get(1, 0)
    # r12: the query reports the GT_MAX_R LOWEST bands PRESENT, not a
    # fixed r <= GT_MAX_R cut (which is empty on corpora whose rarest
    # token is still frequent)
    low = sorted(fof)[: ta.GT_MAX_R]
    for r in low:
        n_r = fof[r]
        row = got[r]
        n_r1 = fof.get(r + 1, 0)
        assert row.n_r == n_r
        assert row.n_r_plus_1 == n_r1
        assert row.r_star_milli == (r + 1) * n_r1 * 1000 // n_r
        assert row.total_tokens == total
        assert row.unseen_mass_permille == n1 * 1000 // total
    assert set(got) == set(low)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8"]),
            min_size=3,
            max_size=10,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_greedy_coverage_matches_python_greedy(spark, tmp_path_factory, docs):
    """The K-round greedy pack equals a pure-Python greedy with the
    identical tie rule (max gain, then lowest doc_id) and the identical
    early stop (no positive-gain doc left)."""
    tmp = tmp_path_factory.mktemp("cov")
    rows = [
        (i, " ".join(words), "en", "s", len(" ".join(words)))
        for i, words in enumerate(docs)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    got = [tuple(r) for r in
           dedup.q_docs_greedy_coverage(spark, str(tmp)).collect()]

    sh = {
        i: {" ".join(words[j:j + 3]) for j in range(max(len(words) - 2, 0))}
        for i, words in enumerate(docs)
    }
    universe = set().union(*sh.values()) if sh else set()
    covered: set = set()
    want = []
    cum = 0
    for rank in range(1, dedup.COVERAGE_PACK_K + 1):
        gains = {
            d: len(s - covered) for d, s in sh.items() if len(s - covered) > 0
        }
        if not gains:
            break
        pick = min(gains, key=lambda d: (-gains[d], d))
        g = gains[pick]
        cum += g
        covered |= sh[pick]
        want.append(
            (rank, pick, g, cum, cum * 1000 // max(len(universe), 1))
        )
    assert got == want


@given(
    seq=st.lists(
        st.sampled_from(["click", "view", "purchase"]), min_size=2, max_size=25
    )
)
@settings(**SETTINGS)
def test_markov_stationary_matches_python_power(spark, tmp_path_factory, seq):
    """The 6-step exact power orbit over an arbitrary single-user type
    sequence equals a direct Python integer matrix iteration with the
    same left-join-zero semantics for states without incoming mass and
    the same per-step truncating renormalization to the fixed basis
    (r12: the implemented overflow knob)."""
    tmp = tmp_path_factory.mktemp("markov")
    rows = [
        (i, dt.datetime(2024, 3, 1, 10, 0, 0) + dt.timedelta(seconds=30 * i),
         7, t, 1.0, "{}")
        for i, t in enumerate(seq)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))
    got = {r.event_type: r for r in
           se.q_events_markov_stationary(spark, str(tmp)).collect()}

    trans: dict[tuple[str, str], int] = {}
    for a, b in zip(seq, seq[1:]):
        trans[(a, b)] = trans.get((a, b), 0) + 1
    states = sorted({s for ab in trans for s in ab})
    v = {s: 1 for s in states}
    for _ in range(se.MARKOV_POWER_STEPS):
        nxt = {s: 0 for s in states}
        for (a, b), c in trans.items():
            nxt[b] += v[a] * c
        st = sum(nxt.values())
        v = {
            s: nxt[s] * se.MARKOV_RENORM_BASIS // max(st, 1) for s in states
        }
    tot = sum(v.values())
    tt = sum(trans.values())
    nin = {s: sum(c for (a, b), c in trans.items() if b == s) for s in states}
    assert set(got) == set(states)
    for s in states:
        assert got[s].stationary_permille == v[s] * 1000 // max(tot, 1)
        assert got[s].incoming_share_permille == nin[s] * 1000 // max(tt, 1)
        assert got[s].n_incoming == nin[s]


@given(
    lines=st.lists(
        st.tuples(
            st.sampled_from(["1-URGENT", "2-HIGH"]),
            st.integers(min_value=0, max_value=130),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_ship_survival_matches_python(spark, tmp_path_factory, lines):
    """The survival grid equals the direct Python complement-of-CDF with
    truncating DIV, per priority, for arbitrary latency multisets
    including boundary values exactly ON grid days."""
    from sap_sql_engine_spark.operators import relational as rel

    tmp = tmp_path_factory.mktemp("surv")
    orders, items = [], []
    for i, (prio, lat) in enumerate(lines):
        orders.append((i, prio, "2024-01-01"))
        items.append((i, (dt.date(2024, 1, 1) + dt.timedelta(days=lat)).isoformat()))
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderpriority string, o_orderdate string"
    ).selectExpr(
        "o_orderkey", "o_orderpriority",
        "CAST(o_orderdate AS DATE) AS o_orderdate",
    ).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))
    spark.createDataFrame(
        items, "l_orderkey long, l_shipdate string"
    ).selectExpr(
        "l_orderkey", "CAST(l_shipdate AS DATE) AS l_shipdate"
    ).write.mode("overwrite").parquet(str(tmp / "lineitem.parquet"))
    got = {r.o_orderpriority: r for r in
           rel.q_orders_ship_survival(spark, str(tmp)).collect()}
    by_prio: dict[str, list[int]] = {}
    for prio, lat in lines:
        by_prio.setdefault(prio, []).append(lat)
    assert set(got) == set(by_prio)
    for prio, lats in by_prio.items():
        r = got[prio]
        assert r.n_lines == len(lats)
        assert r.max_days == max(lats)
        for g in rel.SURV_GRID:
            want = sum(1 for x in lats if x > g) * 1000 // len(lats)
            assert getattr(r, f"surv{g}_permille") == want
