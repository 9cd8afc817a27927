"""Property-based tests for the round-13 operators: the distributed
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

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    cents=st.lists(
        st.integers(min_value=1, max_value=99999), min_size=1, max_size=30
    )
)
@settings(**SETTINGS)
def test_benford_digits_match_python(spark, tmp_path_factory, cents):
    """Digit histogram + permille grid reproduce a direct Python count
    with identical truncating division."""
    tmp = tmp_path_factory.mktemp("benford")
    spark.createDataFrame(
        [(i, c / 100.0) for i, c in enumerate(cents)],
        "l_orderkey long, l_extendedprice double",
    ).write.mode("overwrite").parquet(str(tmp / "lineitem.parquet"))
    got = {
        r.digit: (r.observed, r.n_items, r.observed_permille,
                  r.benford_permille, r.abs_dev_permille)
        for r in rel.q_lineitem_benford_digits(spark, str(tmp)).collect()
    }
    counts = Counter(int(str(c)[0]) for c in cents)
    n = len(cents)
    want = {}
    for d, obs in counts.items():
        op = obs * 1000 // n
        bp = rel.BENFORD_PERMILLE[d - 1]
        want[d] = (obs, n, op, bp, abs(op - bp))
    assert got == want


@given(
    groups=st.lists(
        st.lists(
            st.integers(min_value=1, max_value=10000),
            min_size=1,
            max_size=8,
        ),
        min_size=2,
        max_size=5,
    )
)
@settings(**SETTINGS)
def test_anova_matches_python(spark, tmp_path_factory, groups):
    """SSB/SSW/F reproduce the integer sum-of-squares identity computed
    directly in Python (same truncation points)."""
    # degenerate guard: F needs n > k and SSW > 0 after truncation
    rows, key = [], 0
    for gi, vals in enumerate(groups):
        for v in vals:
            rows.append((key, f"B{gi}", v / 100.0))
            key += 1
    tmp = tmp_path_factory.mktemp("anova")
    spark.createDataFrame(
        rows, "p_partkey long, p_brand string, p_retailprice double"
    ).write.mode("overwrite").parquet(str(tmp / "part.parquet"))

    k = len(groups)
    n = sum(len(g) for g in groups)
    if n <= k:
        return
    between_raw = sum(sum(g) ** 2 // len(g) for g in groups)
    s_all = sum(sum(g) for g in groups)
    sq_all = sum(v * v for g in groups for v in g)
    ssb = between_raw - s_all * s_all // n
    ssw = sq_all - between_raw
    if ssw // (n - k) == 0:
        return  # truncated within-variance of 0 -> division by zero
    f_milli = ssb // (k - 1) * rel.ANOVA_SCALE // (ssw // (n - k))
    got = [
        tuple(r)
        for r in rel.q_part_brand_price_anova(spark, str(tmp)).collect()
    ]
    assert got == [(k, n, ssb, ssw, f_milli)]


@given(
    gaps_per_cust=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=500), min_size=0, max_size=6
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(**SETTINGS)
def test_order_gap_histogram_matches_python(
    spark, tmp_path_factory, gaps_per_cust
):
    """Bucketed gap histogram reproduces a direct Python lag over
    per-customer order dates (including same-day zero gaps)."""
    base = dt.datetime(2024, 1, 1)
    rows, okey = [], 0
    for ci, gaps in enumerate(gaps_per_cust):
        day = 0
        rows.append((okey, ci, base))
        okey += 1
        for g in gaps:
            day += g
            rows.append((okey, ci, base + dt.timedelta(days=day)))
            okey += 1
    tmp = tmp_path_factory.mktemp("gaps")
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))

    want: dict[int, list] = {}
    for ci, gaps in enumerate(gaps_per_cust):
        for g in gaps:
            b = min(g // rel.GAP_BUCKET_DAYS, rel.GAP_MAX_BUCKET)
            want.setdefault(b, []).append(ci)
    expected = {
        b: (len(cs), len(set(cs))) for b, cs in want.items()
    }
    got = {
        r.gap_weeks: (r.n_gaps, r.n_customers)
        for r in rel.q_customer_order_gap_histogram(
            spark, str(tmp)
        ).collect()
    }
    assert got == expected


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["u", "v", "w", "x", "y"]),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_yule_k_matches_python(spark, tmp_path_factory, docs):
    """Yule's K milli value reproduces the direct frequency-spectrum
    computation (single truncating division)."""
    tmp = tmp_path_factory.mktemp("yule")
    rows = [
        (i + 1, " ".join(toks), "en", "s0", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    counts = Counter(t for toks in docs for t in toks)
    n = sum(counts.values())
    v = len(counts)
    s2 = sum(c * c for c in counts.values())
    k_milli = (s2 - n) * 10_000_000 // (n * n)
    got = [tuple(r) for r in ta.q_text_yule_k(spark, str(tmp)).collect()]
    assert got == [("s0", n, v, s2, k_milli)]


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=1, max_size=4
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_set_signature_report_matches_python(
    spark, tmp_path_factory, docs
):
    """Group-size histogram reproduces a direct Python grouping by
    frozen token set (multiplicity and order insensitive)."""
    tmp = tmp_path_factory.mktemp("setsig")
    rows = [
        (i + 1, " ".join(toks), "en", "s", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    sizes = Counter(
        Counter(frozenset(toks) for toks in docs).values()
    )  # group_size -> n_groups
    expected = {
        gs: (ng, gs * ng, ng * (gs * (gs - 1) // 2))
        for gs, ng in sizes.items()
    }
    got = {
        r.group_size: (r.n_groups, r.n_docs, r.intra_pairs)
        for r in dedup.q_dedup_set_signature_report(
            spark, str(tmp)
        ).collect()
    }
    assert got == expected


@given(
    corp=st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2"]),
            st.lists(
                st.sampled_from(["a", "b", "c", "d"]),
                min_size=1,
                max_size=6,
            ),
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_tv_matrix_matches_python(spark, tmp_path_factory, corp):
    """TV permille reproduces the direct 1/2 sum |p - q| over the union
    support computed in exact fractions then floor-quantized the same
    way (multiply through by 2*Na*Nb before the single division)."""
    tmp = tmp_path_factory.mktemp("tv")
    rows = [
        (i + 1, " ".join(toks), "en", src, len(" ".join(toks)))
        for i, (src, toks) in enumerate(corp)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    per_src: dict[str, Counter] = {}
    for src, toks in corp:
        per_src.setdefault(src, Counter()).update(toks)
    srcs = sorted(per_src)
    expected = {}
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = per_src[srcs[i]], per_src[srcs[j]]
            na, nb = sum(a.values()), sum(b.values())
            num = sum(
                abs(a.get(t, 0) * nb - b.get(t, 0) * na)
                for t in set(a) | set(b)
            )
            expected[(srcs[i], srcs[j])] = (
                na,
                nb,
                len(set(a) & set(b)),
                num * 1000 // (2 * na * nb),
            )
    from sap_sql_engine_spark.operators import textanalysis as ta2

    got = {
        (r.source_a, r.source_b): (
            r.n_tokens_a, r.n_tokens_b, r.shared_types, r.tv_permille
        )
        for r in ta2.q_source_unigram_tv_matrix(spark, str(tmp)).collect()
    }
    assert got == expected


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["p", "q", "r"]), min_size=1, max_size=10
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_bigram_entropy_rate_matches_python(
    spark, tmp_path_factory, docs
):
    """Conditional bigram entropy reproduces a direct Python count with
    the identical single-ln micro-nat quantization (floor once per
    count value, exact integer arithmetic after)."""
    import math

    tmp = tmp_path_factory.mktemp("bgent")
    rows = [
        (i + 1, " ".join(toks), "en", "s0", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    c2: Counter = Counter()
    for toks in docs:
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
    got = [
        tuple(r)
        for r in ta.q_text_bigram_entropy_rate(spark, str(tmp)).collect()
    ]
    if not c2:
        assert got == []
        return
    lnq = lambda c: math.floor(math.log(c) * 1_000_000)
    per_w1: dict = {}
    for (a, b), c in c2.items():
        cf, types, clnc = per_w1.get(a, (0, 0, 0))
        per_w1[a] = (cf + c, types + 1, clnc + c * lnq(c))
    n = sum(cf for cf, _, _ in per_w1.values())
    ntypes = sum(t for _, t, _ in per_w1.values())
    num = sum(cf * lnq(cf) - clnc for cf, _, clnc in per_w1.values())
    assert got == [("s0", n, ntypes, num // n)]


@given(
    sessions=st.lists(
        st.lists(
            st.sampled_from(["x", "y", "z"]), min_size=1, max_size=6
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(**SETTINGS)
def test_gapped_triples_match_python_bruteforce(
    spark, tmp_path_factory, sessions
):
    """Distinct-session triple support reproduces a brute-force Python
    sweep over all i<j<k index triples (one user per list, events 30s
    apart => one session each)."""
    from sap_sql_engine_spark.streaming import events as se

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows, eid = [], 0
    for u, types in enumerate(sessions):
        for i, t in enumerate(types):
            rows.append(
                (eid, base + dt.timedelta(seconds=30 * i), u, t, 1.0, "{}")
            )
            eid += 1
    tmp = tmp_path_factory.mktemp("gtp")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))

    support: Counter = Counter()
    for types in sessions:
        trips = set()
        n = len(types)
        for i in range(n):
            for j in range(i + 1, n):
                for k in range(j + 1, n):
                    trips.add((types[i], types[j], types[k]))
        support.update(trips)
    expected = dict(
        sorted(support.items(), key=lambda kv: (-kv[1], kv[0]))[
            : se.GTP_TOP
        ]
    )
    got = {
        (r.t1, r.t2, r.t3): r.n_sessions
        for r in se.q_events_gapped_triple_patterns(spark, str(tmp)).collect()
    }
    # compare as dicts: the limit can cut ties differently only when
    # there are more than GTP_TOP patterns, which these sizes cannot
    # produce (3 types -> at most 27 patterns > GTP_TOP=20 is possible;
    # guard by comparing the full support map when under the cap)
    if len(support) <= se.GTP_TOP:
        assert got == dict(support)
    else:
        assert all(support[k] == v for k, v in got.items())
        assert len(got) == se.GTP_TOP
