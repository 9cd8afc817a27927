"""Hypothesis property tests for round-14 operators: brute-force
oracles over tiny generated inputs (the r13 property-test shape)."""

from __future__ import annotations

import datetime as dt
from collections import Counter
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)


@given(
    sessions=st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=7),
        min_size=1,
        max_size=4,
    )
)
@settings(**SETTINGS)
def test_gapped_patterns_by_k_match_python_bruteforce(
    spark, tmp_path_factory, sessions
):
    """Per-k distinct-session support reproduces a brute-force Python
    sweep over ALL index k-subsequences, and the per-k top-j with the
    deterministic (support desc, pattern lexicographic) tie-break
    reproduces the exact ranked prefix."""
    from sap_sql_engine_spark.streaming import events as se

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows, eid = [], 0
    for u, types in enumerate(sessions):
        for i, t in enumerate(types):
            rows.append(
                (eid, base + dt.timedelta(seconds=30 * i), u, t, 1.0, "{}")
            )
            eid += 1
    tmp = tmp_path_factory.mktemp("gpk")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))

    expected = []
    for k in se.GPK_KS:
        support: Counter = Counter()
        for types in sessions:
            pats = {
                tuple(types[i] for i in idx)
                for idx in combinations(range(len(types)), k)
            }
            support.update(pats)
        ranked = sorted(support.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (pat, n) in enumerate(ranked[: se.GPK_TOP], start=1):
            padded = tuple(pat) + ("",) * (4 - k)
            expected.append((k, rank) + padded + (n,))

    got = [
        (r.k, r.rank, r.p1, r.p2, r.p3, r.p4, r.n_sessions)
        for r in se.q_events_gapped_patterns_by_k(spark, str(tmp)).collect()
    ]
    assert got == expected


def _trunc_div(a: int, b: int) -> int:
    """C-style truncation toward zero (Spark DIV / DuckDB int //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


@given(
    prices=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),  # cents grid -> ties common
            st.booleans(),
        ),
        min_size=2,
        max_size=12,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mannwhitney_matches_python_bruteforce(spark, tmp_path_factory, prices):
    """Doubled U, AUC permille, and the tie-corrected z^2 milli all
    reproduce a brute-force pair sweep + the textbook formulas computed
    in exact Python arithmetic."""
    import math

    from sap_sql_engine_spark.operators import relational as rel
    from sap_sql_engine_spark.operators.relational import MW_GROUP_A

    if not any(g for _, g in prices) or all(g for _, g in prices):
        return  # both groups must be non-empty for the statistic
    rows = [
        (
            i,
            MW_GROUP_A[0] if in_a else "5-LOW",
            cents / 100.0,
        )
        for i, (cents, in_a) in enumerate(prices)
    ]
    tmp = tmp_path_factory.mktemp("mw")
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))

    a = sorted(c for c, g in prices if g)
    b = sorted(c for c, g in prices if not g)
    u2 = sum(2 if x > y else (1 if x == y else 0) for x in a for y in b)
    na, nb, n = len(a), len(b), len(prices)
    from collections import Counter

    tie = sum(t**3 - t for t in Counter(c for c, _ in prices).values())
    auc = _trunc_div(u2 * 500, na * nb)
    d = u2 - na * nb
    denom = na * nb * ((n + 1) * n * (n - 1) - tie)
    z2 = (
        None
        if denom == 0
        else math.floor(3000.0 * d * d * n * (n - 1) / denom)
    )
    r = rel.q_orders_mannwhitney_u(spark, str(tmp)).collect()[0]
    assert (r.n_a, r.n_b, r.u2_a, r.auc_permille) == (na, nb, u2, auc)
    assert r.z2_milli == z2


@given(
    parts=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # p_size
            st.sampled_from([905.0, 915.0, 925.0, 935.0]),  # bucket grid
        ),
        min_size=2,
        max_size=14,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kendall_matches_python_bruteforce(spark, tmp_path_factory, parts):
    """Concordant/discordant counts and tau_b milli reproduce the
    brute-force sweep over all part pairs."""
    import math

    from sap_sql_engine_spark.operators import relational as rel

    tmp = tmp_path_factory.mktemp("kt")
    spark.createDataFrame(
        [(i, s, p) for i, (s, p) in enumerate(parts)],
        "p_partkey long, p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp / "part.parquet"))

    pts = [(s, int(p * 100) // 1000) for s, p in parts]
    conc = disc = 0
    for i in range(len(pts)):
        for j in range(len(pts)):
            if pts[i][0] < pts[j][0]:
                if pts[i][1] < pts[j][1]:
                    conc += 1
                elif pts[i][1] > pts[j][1]:
                    disc += 1
    n = len(pts)
    from collections import Counter

    tr2 = sum(v * (v - 1) for v in Counter(s for s, _ in pts).values())
    tc2 = sum(v * (v - 1) for v in Counter(b for _, b in pts).values())
    den = math.sqrt(((n * (n - 1) - tr2) / 2.0) * ((n * (n - 1) - tc2) / 2.0))
    tau = None if den == 0.0 else math.floor((conc - disc) * 1000 / den)
    r = rel.q_part_size_price_kendall(spark, str(tmp)).collect()[0]
    assert (r.n_parts, r.concordant, r.discordant) == (n, conc, disc)
    assert r.tau_b_milli == tau


@given(
    bals=st.lists(
        st.integers(min_value=-999, max_value=999),  # cents
        min_size=1,
        max_size=15,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bowley_matches_python_quartiles(spark, tmp_path_factory, bals):
    """Type-1 quartiles and the truncating skew division reproduce the
    Python recompute, including negative balances and negative-remainder
    skew dividends."""
    from sap_sql_engine_spark.operators import relational as rel

    tmp = tmp_path_factory.mktemp("bw")
    spark.createDataFrame(
        [("SEG", c / 100.0) for c in bals],
        "c_mktsegment string, c_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp / "customer.parquet"))

    s = sorted(bals)
    n = len(s)

    def q(k4: int) -> int:  # smallest value whose cum*4 >= k4*n
        cum = 0
        for i, v in enumerate(s):
            cum += 1
            if cum * 4 >= k4 * n:
                return v
        return s[-1]

    q1, q3 = q(1), q(3)
    cum = 0
    q2 = None
    for v in s:
        cum += 1
        if cum * 2 >= n:
            q2 = v
            break
    iqr = q3 - q1
    skew = None if iqr == 0 else _trunc_div((q3 + q1 - 2 * q2) * 1000, iqr)
    r = rel.q_customer_acctbal_bowley_skew(spark, str(tmp)).collect()[0]
    assert (r.q1_cents, r.q2_cents, r.q3_cents) == (q1, q2, q3)
    assert r.skew_permille == skew


@given(
    revs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=500),  # whole-dollar revenue
            st.integers(min_value=0, max_value=2),  # nation
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_theil_matches_python_recompute(spark, tmp_path_factory, revs):
    """Theil total + between-nation micro-nats reproduce the Python
    recompute with the same ln quantization and floor-identity final
    division."""
    import math

    from sap_sql_engine_spark.operators import relational as rel

    tmp = tmp_path_factory.mktemp("th")
    spark.createDataFrame(
        [(i, n) for i, (_, n) in enumerate(revs)],
        "s_suppkey long, s_nationkey long",
    ).write.mode("overwrite").parquet(str(tmp / "supplier.parquet"))
    spark.createDataFrame(
        [(i, float(r), 0.0) for i, (r, _) in enumerate(revs)],
        "l_suppkey long, l_extendedprice double, l_discount double",
    ).write.mode("overwrite").parquet(str(tmp / "lineitem.parquet"))

    milli = [r * 1000 for r, _ in revs]  # r dollars -> exact milli
    n = len(milli)
    x_total = sum(milli)
    num = sum(
        m * math.floor(math.log(m * n / x_total) * 1_000_000) for m in milli
    )
    from collections import defaultdict

    g: dict = defaultdict(lambda: [0, 0])
    for (r_, nat) in revs:
        g[nat][0] += r_ * 1000
        g[nat][1] += 1
    numb = sum(
        xg * math.floor(math.log((xg * n) / (x_total * ng)) * 1_000_000)
        for xg, ng in g.values()
    )
    r = rel.q_supplier_revenue_theil(spark, str(tmp)).collect()[0]
    assert r.n_suppliers == n and r.n_nations == len(g)
    assert r.theil_total_micro == num // x_total  # Python // floors
    assert r.theil_between_micro == numb // x_total


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=5),
        min_size=2,
        max_size=6,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_heaps_exponent_matches_python_recompute(
    spark, tmp_path_factory, docs
):
    """The fitted Heaps beta/lnk reproduce a Python recompute of the
    cumulative curve, the micro-nat quantization, and the truncating
    integer OLS quotients."""
    import math

    from sap_sql_engine_spark.operators import textanalysis as ta

    tmp = tmp_path_factory.mktemp("heaps")
    spark.createDataFrame(
        [
            (i, " ".join(toks), "xx", "s0", len(" ".join(toks)))
            for i, toks in enumerate(docs)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    seen: set = set()
    cumtok = cumvoc = 0
    xs, ys = [], []
    for toks in docs:  # doc_id order == list order
        cumtok += len(toks)
        for t in toks:
            if t not in seen:
                seen.add(t)
                cumvoc += 1
        xs.append(math.floor(math.log(cumtok) * 1_000_000))
        ys.append(math.floor(math.log(cumvoc) * 1_000_000))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    beta = None if den == 0 else _trunc_div((n * sxy - sx * sy) * 1_000_000, den)
    lnk = None if den == 0 else _trunc_div(sy * sxx - sx * sxy, den)
    r = ta.q_text_heaps_exponent(spark, str(tmp)).collect()[0]
    assert r.source == "s0" and r.n_points == n
    assert r.heaps_beta_micro == beta
    assert r.heaps_lnk_micro == lnk


@given(
    vecs=st.lists(
        st.tuples(
            st.lists(
                st.integers(min_value=-8, max_value=8),  # x/8 float32-exact
                min_size=4,
                max_size=4,
            ),
            st.integers(min_value=0, max_value=1),  # label
        ),
        min_size=3,
        max_size=8,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_intrinsic_dim_matches_python_bruteforce(
    spark, tmp_path_factory, vecs
):
    """Per-label TwoNN aggregates reproduce a Python brute force with
    the same integer grid distances, top-2 (d2, nb_id) ordering,
    duplicate exclusion, and truncating final division. Values are
    eighths, exact in float32, so the quantizer sees identical inputs."""
    import math

    from sap_sql_engine_spark.operators import similarity as sim

    tmp = tmp_path_factory.mktemp("twonn")
    rows = [
        (i, [v / 8.0 for v in emb], lab) for i, (emb, lab) in enumerate(vecs)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp / "embeddings.parquet"))

    q = [[math.floor(v / 8.0 * 1_000_000) for v in emb] for emb, _ in vecs]
    per_label: dict = {}
    for i, (emb, lab) in enumerate(vecs):
        if i % 5 != 0:
            continue
        ds = sorted(
            (sum((a - b) ** 2 for a, b in zip(q[i], q[j])), j)
            for j in range(len(vecs))
            if j != i
        )
        r1, r2 = ds[0][0], ds[1][0]
        st_ = per_label.setdefault(lab, [0, 0, 0])  # n_eval, n_deg, sum_mu
        if r1 > 0:
            st_[0] += 1
            st_[2] += math.floor(math.log(r2 / r1) * 500_000)
        else:
            st_[1] += 1
    got = {
        r.label: (r.n_eval, r.n_degenerate, r.sum_mu_micro, r.id_milli)
        for r in sim.q_embedding_intrinsic_dim(spark, str(tmp)).collect()
    }
    expected = {
        lab: (
            ne,
            nd,
            mu if ne else None,
            _trunc_div(ne * 1_000_000_000, mu) if mu else None,
        )
        for lab, (ne, nd, mu) in per_label.items()
    }
    assert got == expected


@given(
    prices=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),  # cents grid (tie-rich)
            st.booleans(),
        ),
        min_size=2,
        max_size=14,
    )
)
@settings(**SETTINGS)
def test_ks_test_matches_python_bruteforce(spark, tmp_path_factory, prices):
    """D (bp), z^2 milli, and the split point all reproduce a
    brute-force CDF sweep over the distinct values in exact Python
    arithmetic; one-empty-group inputs pin the NULL guards."""
    import math

    from sap_sql_engine_spark.operators import relational as rel
    from sap_sql_engine_spark.operators.relational import MW_GROUP_A

    rows = [
        (i, MW_GROUP_A[0] if in_a else "5-LOW", cents / 100.0)
        for i, (cents, in_a) in enumerate(prices)
    ]
    tmp = tmp_path_factory.mktemp("ks")
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))

    a = sorted(c for c, g in prices if g)
    b = sorted(c for c, g in prices if not g)
    na, nb = len(a), len(b)
    gaps = {}
    for v in sorted({c for c, _ in prices}):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        gaps[v] = abs(ca * nb - cb * na)
    m = max(gaps.values())
    split = min(v for v, g in gaps.items() if g == m)
    d_bp = None if na * nb == 0 else _trunc_div(m * 10000, na * nb)
    z2 = (
        None
        if na * nb == 0
        else math.floor(1000.0 * m * m / (na * nb * (na + nb)))
    )
    r = rel.q_orders_price_ks_test(spark, str(tmp)).collect()[0]
    assert (r.n_a, r.n_b) == (na, nb)
    assert (r.d_bp, r.z2_milli) == (d_bp, z2)
    assert r.split_cents == split


@given(
    lines=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # priority rank
            st.integers(min_value=1, max_value=4),  # quantity
        ),
        min_size=1,
        max_size=14,
    )
)
@settings(**SETTINGS)
def test_jonckheere_matches_python_bruteforce(
    spark, tmp_path_factory, lines
):
    """Doubled JT, its null mean, and z^2 milli reproduce a brute-force
    cross-group pair sweep + the textbook null variance in exact
    Python arithmetic."""
    import math

    from sap_sql_engine_spark.operators import relational as rel

    prio = {1: "1-URGENT", 2: "2-HIGH", 3: "3-MEDIUM"}
    # one order per line so each line gets its own priority
    tmp = tmp_path_factory.mktemp("jt")
    spark.createDataFrame(
        [(i, prio[g]) for i, (g, _) in enumerate(lines)],
        "o_orderkey long, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))
    spark.createDataFrame(
        [(i, float(q)) for i, (_, q) in enumerate(lines)],
        "l_orderkey long, l_quantity double",
    ).write.mode("overwrite").parquet(str(tmp / "lineitem.parquet"))

    jt2 = sum(
        2 if qx < qy else (1 if qx == qy else 0)
        for gx, qx in lines
        for gy, qy in lines
        if gx < gy
    )
    n = len(lines)
    sizes = Counter(g for g, _ in lines)
    sum_sq = sum(c * c for c in sizes.values())
    sum_v = sum(c * c * (2 * c + 3) for c in sizes.values())
    e2 = (n * n - sum_sq) // 2
    varnum = n * n * (2 * n + 3) - sum_v
    z2 = (
        None
        if varnum == 0
        else math.floor(18000.0 * (jt2 - e2) * (jt2 - e2) / varnum)
    )
    r = rel.q_lineitem_qty_jonckheere(spark, str(tmp)).collect()[0]
    assert (r.n_lines, r.n_groups) == (n, len(sizes))
    assert (r.jt2, r.e2) == (jt2, e2)
    assert r.trend_sign == (jt2 > e2) - (jt2 < e2)
    assert r.z2_milli == z2


@given(
    bals=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(min_value=-5, max_value=5),  # cents
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_levene_matches_python_recompute(spark, tmp_path_factory, bals):
    """Brown-Forsythe milli SS decomposition and F reproduce exact
    Python: type-1 medians, integer deviation aggregates, the same
    per-group floored milli quotients."""
    import math

    from sap_sql_engine_spark.operators import relational as rel

    tmp = tmp_path_factory.mktemp("lev")
    spark.createDataFrame(
        [(i, seg, c / 100.0) for i, (seg, c) in enumerate(bals)],
        "c_custkey long, c_mktsegment string, c_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp / "customer.parquet"))

    groups = {}
    for seg, c in bals:
        groups.setdefault(seg, []).append(c)
    nn = ss = qq = b_milli = 0
    for vals in groups.values():
        vals.sort()
        ng = len(vals)
        # type-1 median: smallest value with cum*2 >= n
        cum = 0
        for v in vals:
            cum += 1
            if cum * 2 >= ng:
                med = v
                break
        devs = [abs(v - med) for v in vals]
        sg, qg = sum(devs), sum(d * d for d in devs)
        nn += ng
        ss += sg
        qq += qg
        b_milli += (sg * sg * 1000) // ng
    k = len(groups)
    ssb = b_milli - (ss * ss * 1000) // nn
    ssw = qq * 1000 - b_milli
    f = (
        None
        if ssw * (k - 1) == 0
        else math.floor(1000.0 * ssb * (nn - k) / (ssw * (k - 1)))
    )
    r = rel.q_customer_acctbal_levene(spark, str(tmp)).collect()[0]
    assert (r.n_customers, r.n_groups) == (nn, k)
    assert (r.ssb_milli, r.ssw_milli) == (ssb, ssw)
    assert r.f_milli == f


@given(
    counts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # day offset
            st.integers(min_value=1, max_value=5),  # events that day
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    )
)
@settings(**SETTINGS)
def test_theil_sen_matches_python_recompute(spark, tmp_path_factory, counts):
    """Pair slopes (floor-quantized milli — Python // IS the floor
    identity), the type-1 median, and the sign split all reproduce a
    brute-force pair sweep."""
    from sap_sql_engine_spark.streaming import events as sev

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows, eid = [], 0
    for day, c in counts:
        for i in range(c):
            rows.append(
                (eid, base + dt.timedelta(days=day, seconds=i), 1, "t",
                 1.0, "{}")
            )
            eid += 1
    tmp = tmp_path_factory.mktemp("ts")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))

    pts = sorted(counts)
    slopes = sorted(
        ((cy - cx) * 1000) // (dy - dx)  # Python // == floor identity
        for (dx, cx), (dy, cy) in combinations(pts, 2)
    )
    np_ = len(slopes)
    med = None
    cum = 0
    for s in slopes:
        cum += 1
        if cum * 2 >= np_:
            med = s
            break
    r = sev.q_events_theil_sen_slope(spark, str(tmp)).collect()[0]
    assert (r.n_days, r.n_pairs) == (len(pts), np_)
    assert r.pos_pairs == sum(1 for s in slopes if s > 0)
    assert r.neg_pairs == sum(1 for s in slopes if s < 0)
    assert r.sen_slope_milli == med


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # suppkey
            st.integers(min_value=1, max_value=4),  # partkey
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_assortativity_matches_python_bruteforce(
    spark, tmp_path_factory, edges
):
    """Degree sufficient statistics and the milli correlation reproduce
    a brute-force recompute over the deduplicated edge set (duplicate
    lineitem rows must not inflate degrees)."""
    import math

    from sap_sql_engine_spark.operators import graph as gr

    tmp = tmp_path_factory.mktemp("ast")
    spark.createDataFrame(
        edges, "l_suppkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp / "lineitem.parquet"))

    es = sorted(set(edges))
    ds = Counter(s for s, _ in es)
    dp = Counter(p for _, p in es)
    n = len(es)
    xs = [ds[s] for s, _ in es]
    ys = [dp[p] for _, p in es]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sx2, sy2 = sum(x * x for x in xs), sum(y * y for y in ys)
    varp = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
    corr = (
        None
        if varp == 0
        else math.floor(1000.0 * (n * sxy - sx * sy) / math.sqrt(varp))
    )
    r = gr.q_supplier_part_assortativity(spark, str(tmp)).collect()[0]
    assert (r.n_edges, r.n_suppliers, r.n_parts) == (n, len(ds), len(dp))
    assert r.mean_supplier_degree_milli == (n * 1000) // len(ds)
    assert r.mean_part_degree_milli == (n * 1000) // len(dp)
    assert r.assortativity_milli == corr


@given(
    spends=st.lists(
        st.tuples(
            st.sampled_from(["S1", "S2"]),
            st.integers(min_value=1, max_value=500),  # cents
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_spend_mld_matches_python_recompute(spark, tmp_path_factory, spends):
    """Both MLD components reproduce the quantized-ln Python recompute
    (floor-quantized micro-nats per customer, truncating per-n
    divisions on nonneg sums, integer subtraction at the end)."""
    import math

    from sap_sql_engine_spark.operators import relational as rel

    tmp = tmp_path_factory.mktemp("mld")
    spark.createDataFrame(
        [(i, seg) for i, (seg, _) in enumerate(spends)],
        "c_custkey long, c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp / "customer.parquet"))
    spark.createDataFrame(
        [(100 + i, i, c / 100.0) for i, (_, c) in enumerate(spends)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))

    n = len(spends)
    s = sum(c for _, c in spends)
    t1 = math.floor(math.log(s / n) * 1_000_000)
    sln = sum(math.floor(math.log(c) * 1_000_000) for _, c in spends)
    groups = {}
    for seg, c in spends:
        groups.setdefault(seg, []).append(c)
    bnum = sum(
        len(v) * math.floor(math.log(sum(v) / len(v)) * 1_000_000)
        for v in groups.values()
    )
    r = rel.q_customer_spend_mld(spark, str(tmp)).collect()[0]
    assert (r.n_customers, r.n_segments) == (n, len(groups))
    assert r.mld_total_micro == t1 - sln // n
    assert r.mld_between_micro == t1 - bnum // n


@given(
    prices=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),  # cents grid (tie-rich)
            st.booleans(),
        ),
        min_size=2,
        max_size=14,
    )
)
@settings(**SETTINGS)
def test_anderson_darling_matches_python_bruteforce(
    spark, tmp_path_factory, prices
):
    """A^2 micro reproduces the Scholz-Stephens discrete form computed
    with exact Python integer arithmetic (per-value floored micro
    contributions summed, B = N value excluded)."""
    from sap_sql_engine_spark.operators import relational as rel
    from sap_sql_engine_spark.operators.relational import MW_GROUP_A

    rows = [
        (i, MW_GROUP_A[0] if in_a else "5-LOW", cents / 100.0)
        for i, (cents, in_a) in enumerate(prices)
    ]
    tmp = tmp_path_factory.mktemp("ad")
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))

    na = sum(1 for _, g in prices if g)
    nb = len(prices) - na
    nn = len(prices)
    a2 = 0
    m = b = 0
    for v in sorted({c for c, _ in prices}):
        h = sum(1 for c, _ in prices if c == v)
        m += sum(1 for c, g in prices if c == v and g)
        b += h
        if b < nn and na * nb > 0:
            d = m * nn - na * b
            a2 += (h * d * d * 1_000_000) // (na * nb * b * (nn - b))
    r = rel.q_orders_price_anderson_darling(spark, str(tmp)).collect()[0]
    assert (r.n_a, r.n_b, r.a2_micro) == (na, nb, a2)


@given(
    prices=st.lists(
        st.tuples(
            st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
            st.integers(min_value=1, max_value=5),  # cents (tie-rich)
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_mood_median_matches_python_bruteforce(
    spark, tmp_path_factory, prices
):
    """Global type-1 median, per-priority above-median splits, and the
    densified k x 2 floor-then-sum chi-square all reproduce exact
    Python arithmetic."""
    from sap_sql_engine_spark.operators import relational as rel

    tmp = tmp_path_factory.mktemp("mood")
    spark.createDataFrame(
        [(i, p, c / 100.0) for i, (p, c) in enumerate(prices)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))

    s = sorted(c for _, c in prices)
    n = len(s)
    cum = 0
    for v in s:
        cum += 1
        if cum * 2 >= n:
            med = v
            break
    prios = sorted({p for p, _ in prices})
    obs = {
        (p, a): sum(
            1 for q, c in prices if q == p and (1 if c > med else 0) == a
        )
        for p in prios
        for a in (0, 1)
    }
    col = {a: sum(obs[(p, a)] for p in prios) for a in (0, 1)}
    row = {p: obs[(p, 0)] + obs[(p, 1)] for p in prios}
    chi2 = 0
    for p in prios:
        for a in (0, 1):
            den = n * row[p] * col[a]
            if den:
                d = obs[(p, a)] * n - row[p] * col[a]
                chi2 += (d * d * 1_000_000) // den
    got = {
        r.o_orderpriority: (
            r.n_orders, r.n_above_median, r.above_permille,
            r.chi2_total_micro,
        )
        for r in rel.q_orders_price_mood_median(spark, str(tmp)).collect()
    }
    want = {
        p: (row[p], obs[(p, 1)], obs[(p, 1)] * 1000 // row[p], chi2)
        for p in prios
    }
    assert got == want
