"""Planted-outcome tests for the round-14 operators."""

from __future__ import annotations

import datetime as dt

import pytest

from sap_sql_engine_spark.streaming import events as se


def _write_events(spark, tmp_path, sessions):
    """One user per session list; events 30s apart => one session each."""
    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows, eid = [], 0
    for u, types in enumerate(sessions):
        for i, t in enumerate(types):
            rows.append(
                (eid, base + dt.timedelta(seconds=30 * i), u, t, 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_gapped_patterns_by_k_planted(spark, tmp_path):
    """Two hand-built sessions with known subsequence structure.

    session A: x y x z   session B: y x z
    k=2 supports: (x,y)=1 A; (x,z)=2; (y,x)=2 (A: y@2<x@3; B: y@1<x@2);
                  (y,z)=2; (x,x)=1 A; (z anything)=0 forward
    k=3: A has triples {xyx, xyz, xxz, yxz, xzz? no}; B: {yxz}
         => (y,x,z)=2; (x,y,x)=1; (x,y,z)=1; (x,x,z)=1
    k=4: only A (len 4): (x,y,x,z)=1
    """
    _write_events(spark, tmp_path, [["x", "y", "x", "z"], ["y", "x", "z"]])
    got = {
        (r.k, r.p1, r.p2, r.p3, r.p4): r.n_sessions
        for r in se.q_events_gapped_patterns_by_k(spark, str(tmp_path)).collect()
    }
    expected = {
        (2, "x", "y", "", ""): 1,
        (2, "x", "z", "", ""): 2,
        (2, "y", "x", "", ""): 2,
        (2, "y", "z", "", ""): 2,
        (2, "x", "x", "", ""): 1,
        (3, "y", "x", "z", ""): 2,
        (3, "x", "y", "x", ""): 1,
        (3, "x", "y", "z", ""): 1,
        (3, "x", "x", "z", ""): 1,
        (4, "x", "y", "x", "z"): 1,
    }
    assert got == expected


def test_gapped_patterns_by_k_rank_and_cap(spark, tmp_path):
    """Ranks are 1..GPK_TOP per k, dense from 1, ordered by support then
    pattern; a long varied session exceeds the k=4 cap so the limit
    actually binds."""
    sessions = [list("abcdeabcde"), list("abcde"), list("edcba")]
    _write_events(spark, tmp_path, sessions)
    rows = se.q_events_gapped_patterns_by_k(spark, str(tmp_path)).collect()
    for k in (2, 3, 4):
        ranks = [r.rank for r in rows if r.k == k]
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= se.GPK_TOP
        sup = [r.n_sessions for r in rows if r.k == k]
        assert sup == sorted(sup, reverse=True)
    # the 10-event session alone has far more than GPK_TOP quads
    assert len([r for r in rows if r.k == 4]) == se.GPK_TOP


def test_streaming_order_gaps_matches_batch(spark, tmp_path):
    """Stream == batch for the order-gap family: the stateful
    per-customer gap extraction over a 2-drop JSONL orders folder,
    folded to the histogram, equals q_customer_order_gap_histogram on
    the identical rows written as an orders.parquet. The date split
    across drops forces state to bridge the micro-batch boundary."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sap_sql_engine_spark.operators import relational as rel

    drop_dir = str(tmp_path / "orders_drops")
    rows = [
        # custkey 1: gaps 7d, 400d (caps at 52), 1d
        (101, 1, dt.date(2024, 1, 1)),
        (102, 1, dt.date(2024, 1, 8)),
        (103, 1, dt.date(2025, 2, 11)),
        (104, 1, dt.date(2025, 2, 12)),
        # custkey 2: same-day tie broken by orderkey, then 13d
        (201, 2, dt.date(2024, 5, 1)),
        (202, 2, dt.date(2024, 5, 1)),
        (203, 2, dt.date(2024, 5, 14)),
        # custkey 3: single order, no gap
        (301, 3, dt.date(2024, 6, 1)),
    ]
    schema = "o_orderkey long, o_custkey long, o_orderdate date"
    cut = dt.date(2024, 7, 1)
    d1 = [r for r in rows if r[2] < cut]
    d2 = [r for r in rows if r[2] >= cut]
    spark.createDataFrame(d1, schema).write.mode("append").json(drop_dir)
    q = se.streaming_order_gaps(spark, drop_dir)
    try:
        q.processAllAvailable()
        spark.createDataFrame(d2, schema).write.mode("append").json(drop_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    stream_hist = {
        (r.gap_weeks, r.n_gaps, r.n_customers)
        for r in spark.table("order_gaps_stream")
        .groupBy("gap_weeks")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        )
        .collect()
    }
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    batch_hist = {
        (r.gap_weeks, r.n_gaps, r.n_customers)
        for r in rel.q_customer_order_gap_histogram(
            spark, str(tmp_path)
        ).collect()
    }
    assert stream_hist == batch_hist
    assert (1, 2, 2) in stream_hist  # 7d gap (cust 1) + 13d gap (cust 2)
    assert (52, 1, 1) in stream_hist  # the 400d gap caps at 52
    assert (0, 2, 2) in stream_hist  # 1d gap (cust 1) + 0d tie (cust 2)


# ---------------------------------------------------------------------------
# round-14 statistics queries: planted fixtures with hand-checked values


def test_orders_mannwhitney_u_planted(spark, tmp_path):
    """A = {10.00, 20.00} urgent, B = {10.00, 30.00}: U_A = 1.5 (one
    win + one half-tie), so the doubled statistic is 3; AUC = 1.5/4;
    ties term = 2^3 - 2 = 6; z^2 = 1/6 -> 166 milli (hand-derived)."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [
        (1, "1-URGENT", 10.00),
        (2, "2-HIGH", 20.00),
        (3, "3-MEDIUM", 10.00),
        (4, "5-LOW", 30.00),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = rel.q_orders_mannwhitney_u(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b, r.u2_a) == (2, 2, 3)
    assert r.auc_permille == 375  # 3*500 // 4
    assert r.z2_milli == 166  # floor(3000*1*4*3 / (2*2*54))


def test_customer_acctbal_bowley_skew_planted(spark, tmp_path):
    """Quartiles 100/500/601 cents: the skew dividend is negative with a
    nonzero remainder (-299000 // 501), so this PLANTS the truncation
    convention — matched Spark DIV gives -596 (floor would be -597)."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [
        ("AUTO", 0.00),
        ("AUTO", 1.00),
        ("AUTO", 5.00),
        ("AUTO", 6.01),
        ("AUTO", 9.00),
        ("RAIL", 2.00),
        ("RAIL", 4.00),
    ]
    spark.createDataFrame(
        rows, "c_mktsegment string, c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    got = {
        r.segment: (r.q1_cents, r.q2_cents, r.q3_cents, r.skew_permille)
        for r in rel.q_customer_acctbal_bowley_skew(
            spark, str(tmp_path)
        ).collect()
    }
    assert got["AUTO"] == (100, 500, 601, -596)
    # RAIL: q1 = q2 = 200, q3 = 400 -> skew (400+200-400)*1000/200 = 1000
    assert got["RAIL"] == (200, 200, 400, 1000)


def _write_trade_fixture(spark, tmp_path, lines):
    """lines: (custnation, suppnation) pairs -> one lineitem each.
    Builds the 4 tables the trade-edge plan needs."""
    cust_n = sorted({c for c, _ in lines})
    supp_n = sorted({s for _, s in lines})
    spark.createDataFrame(
        [(100 + i, n) for i, n in enumerate(cust_n)],
        "c_custkey long, c_nationkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(200 + i, n) for i, n in enumerate(supp_n)],
        "s_suppkey long, s_nationkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    cust_key = {n: 100 + i for i, n in enumerate(cust_n)}
    supp_key = {n: 200 + i for i, n in enumerate(supp_n)}
    orders, items = [], []
    for oid, (cn, sn) in enumerate(lines):
        orders.append((oid, cust_key[cn]))
        items.append((oid, supp_key[sn]))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        items, "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def test_nation_trade_reciprocity_planted(spark, tmp_path):
    """Edges 0->1 (w=2), 1->0 (w=1), 0->2 (w=1): two of three edges
    reciprocated (666 permille), weighted min-sum 2/4 (500 permille)."""
    from sap_sql_engine_spark.operators import graph

    _write_trade_fixture(
        spark, tmp_path, [(0, 1), (0, 1), (1, 0), (0, 2)]
    )
    r = graph.q_nation_trade_reciprocity(spark, str(tmp_path)).collect()[0]
    assert (r.n_edges, r.n_reciprocated, r.total_weight) == (3, 2, 4)
    assert r.reciprocity_permille == 666
    assert r.weighted_reciprocity_permille == 500


def test_events_weekly_retention_planted(spark, tmp_path):
    """u1 active weeks 0+1, u2 week 0 only, u3 weeks 1+2: cohort W0 has
    2 users (1000, then 500 permille at offset 1), cohort W1 has 1
    (1000 at offsets 0 and 1)."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as se

    w0, w1, w2 = (
        dt.datetime(2024, 3, 4, 12),
        dt.datetime(2024, 3, 11, 12),
        dt.datetime(2024, 3, 18, 12),
    )
    rows = [
        (0, w0, 1, "click", 1.0, "{}"),
        (1, w1, 1, "click", 1.0, "{}"),
        (2, w0, 2, "click", 1.0, "{}"),
        (3, w1, 3, "click", 1.0, "{}"),
        (4, w2, 3, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.cohort_week, r.offset_weeks): (
            r.cohort_users,
            r.retained_users,
            r.retained_permille,
        )
        for r in se.q_events_weekly_retention(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("2024-03-04", 0): (2, 2, 1000),
        ("2024-03-04", 1): (2, 1, 500),
        ("2024-03-11", 0): (1, 1, 1000),
        ("2024-03-11", 1): (1, 1, 1000),
    }


def test_part_size_price_kendall_planted(spark, tmp_path):
    """Perfectly monotone size->price grid: tau_b = +1000 milli with
    zero discordant pairs."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [(1, 1, 900.00), (2, 2, 910.00), (3, 3, 920.00)]
    spark.createDataFrame(
        rows, "p_partkey long, p_size int, p_retailprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    r = rel.q_part_size_price_kendall(spark, str(tmp_path)).collect()[0]
    assert (r.n_parts, r.n_cells, r.concordant, r.discordant) == (3, 3, 3, 0)
    assert r.tau_b_milli == 1000


def test_supplier_revenue_theil_planted(spark, tmp_path):
    """Two suppliers with identical revenue in two nations: perfectly
    equal distribution -> Theil total and between-nation both 0."""
    from sap_sql_engine_spark.operators import relational as rel

    spark.createDataFrame(
        [(1, 0), (2, 1)], "s_suppkey long, s_nationkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(
        [(1, 100.00, 0.0), (2, 100.00, 0.0)],
        "l_suppkey long, l_extendedprice double, l_discount double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = rel.q_supplier_revenue_theil(spark, str(tmp_path)).collect()[0]
    assert (r.n_suppliers, r.n_nations) == (2, 2)
    assert r.theil_total_micro == 0
    assert r.theil_between_micro == 0


def test_supplier_latency_tukey_planted(spark, tmp_path):
    """One nation, latencies {0,10,20,30,100}: q1=10 (cum*4>=5 at the
    2nd value), q3=30, iqr=20, fences [-20,60] -> only 100 is an
    outlier (200 permille)."""
    from sap_sql_engine_spark.operators import relational as rel

    spark.createDataFrame(
        [(0, "ALGERIA")], "n_nationkey long, n_name string"
    ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(7, 0)], "s_suppkey long, s_nationkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    base = dt.date(2024, 1, 1)
    lats = [0, 10, 20, 30, 100]
    spark.createDataFrame(
        [(i, base) for i in range(len(lats))],
        "o_orderkey long, o_orderdate date",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(i, 7, base + dt.timedelta(days=d)) for i, d in enumerate(lats)],
        "l_orderkey long, l_suppkey long, l_shipdate date",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = rel.q_supplier_latency_tukey(spark, str(tmp_path)).collect()[0]
    assert (r.nation, r.n_lines) == ("ALGERIA", 5)
    assert (r.q1_days, r.q3_days, r.iqr_days) == (10, 30, 20)
    assert (r.n_low, r.n_high, r.outlier_permille) == (0, 1, 200)


def test_quantity_price_mutual_info_planted(spark, tmp_path):
    """Perfect 2x2 dependence (qty determines price bucket): MI equals
    both marginal entropies (ln 2 = 693147 micro-nats), NMI = 1000."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [
        (1.0, 5000.00),
        (1.0, 5000.00),
        (2.0, 15000.00),
        (2.0, 15000.00),
    ]
    spark.createDataFrame(
        rows, "l_quantity double, l_extendedprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = rel.q_quantity_price_mutual_info(spark, str(tmp_path)).collect()[0]
    assert (r.n_lines, r.n_cells) == (4, 2)
    assert r.h_qty_micro == 693147
    assert r.h_price_micro == 693147
    assert r.mi_micro == 693147
    assert r.nmi_permille == 1000


def test_customer_interpurchase_lifetable_planted(spark, tmp_path):
    """cust 1 orders at days 0/10/40, cust 2 at day 0 only; max date =
    day 40. Intervals: events 10d (b0) + 30d (b1), censored 0d (b0) +
    40d (b1). Hand-derived life table:
      b0: at-risk 4, d=1, c=1, hazard 250, km = floor(ln(3/4)*1e6)
      b1: at-risk 2, d=1, c=1, hazard 500, km += floor(ln(1/2)*1e6)"""
    from sap_sql_engine_spark.operators import relational as rel

    base = dt.date(2024, 1, 1)
    rows = [
        (1, base, 10),
        (1, base + dt.timedelta(days=10), 11),
        (1, base + dt.timedelta(days=40), 12),
        (2, base, 20),
    ]
    spark.createDataFrame(
        [(c, d, k) for c, d, k in rows],
        "o_custkey long, o_orderdate date, o_orderkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r.bucket: (
            r.n_at_risk,
            r.n_events,
            r.n_censored,
            r.hazard_permille,
            r.km_ln_micro,
        )
        for r in rel.q_customer_interpurchase_lifetable(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        0: (4, 1, 1, 250, -287683),
        1: (2, 1, 1, 500, -287683 - 693148),
    }


def test_customer_interpurchase_lifetable_death(spark, tmp_path):
    """When the at-risk set is exhausted by events (n_at_risk ==
    n_events), survival hits zero: km_ln_micro is NULL from that bucket
    on. cust A: orders day 0 + day 100 (event b3, censored 0d b0);
    cust B: single order day 100 (censored 0d b0)."""
    from sap_sql_engine_spark.operators import relational as rel

    base = dt.date(2024, 1, 1)
    rows = [(1, base, 10), (1, base + dt.timedelta(days=100), 11),
            (2, base + dt.timedelta(days=100), 20)]
    spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_orderkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r.bucket: (r.n_at_risk, r.n_events, r.n_censored,
                   r.hazard_permille, r.km_ln_micro)
        for r in rel.q_customer_interpurchase_lifetable(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {0: (3, 0, 2, 0, 0), 3: (1, 1, 0, 1000, None)}


def test_returns_quantity_trend_planted(spark, tmp_path):
    """s=0 bucket: 4 lines 1 return; s=2 bucket: 4 lines 3 returns.
    T = 8*6 - 4*8 = 16, VarNum = 4*4*(8*16 - 64) = 1024,
    z^2 = 256*8/1024 = 2.0 exactly -> 2000 milli, rising trend."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [(1.0, "R")] + [(1.0, "N")] * 3 + [(10.0, "R")] * 3 + [(10.0, "N")]
    spark.createDataFrame(
        rows, "l_quantity double, l_returnflag string"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = rel.q_returns_quantity_trend(spark, str(tmp_path)).collect()[0]
    assert (r.n_lines, r.n_returned, r.n_buckets) == (8, 4, 2)
    assert r.trend_sign == 1
    assert r.z2_milli == 2000
    assert (r.rate_lo_bp, r.rate_hi_bp) == (2500, 7500)


def test_returns_quantity_trend_degenerate(spark, tmp_path):
    """A single score bucket has zero score variance: z2_milli is NULL
    (the integer-exact guard), sign 0."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [(1.0, "R"), (1.0, "N"), (2.0, "R"), (2.0, "N")]
    spark.createDataFrame(
        rows, "l_quantity double, l_returnflag string"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = rel.q_returns_quantity_trend(spark, str(tmp_path)).collect()[0]
    assert (r.n_buckets, r.trend_sign, r.z2_milli) == (1, 0, None)


def test_streaming_weekly_retention_matches_batch(spark, tmp_path):
    """Stream == batch for the weekly-retention family: per-user keyed
    state (cohort Monday + offset bitmask) over a 2-drop JSONL events
    folder, folded to the retention triangle, equals
    q_events_weekly_retention on the identical rows written as an
    events.parquet. The drop split lands mid-history so cohort state
    must bridge the micro-batch boundary, and one user re-appears in an
    already-emitted week (the bitmask dedupe path)."""
    import datetime as dt

    from pyspark.sql import functions as F

    ts = lambda d, h=12: dt.datetime(2024, 1, d, h, 0, 0)  # noqa: E731
    rows = [
        # user 1: cohort wk of Jan 1 (Mon), back in wk+1 and wk+2;
        # two events in wk+1 -> dedupe
        (ts(1), 1),
        (ts(8), 1),
        (ts(9), 1),
        (ts(17), 1),
        # user 2: cohort wk of Jan 1, never returns
        (ts(3), 2),
        # user 3: cohort wk of Jan 8, back in wk+1
        (ts(10), 3),
        (ts(16), 3),
    ]
    schema = "ts timestamp, user_id long"
    drop_dir = str(tmp_path / "events_drops")
    cut = ts(9, 0)
    d1 = [r for r in rows if r[0] < cut]
    d2 = [r for r in rows if r[0] >= cut]
    spark.createDataFrame(d1, schema).write.mode("append").json(drop_dir)
    q = se.streaming_weekly_retention(spark, drop_dir)
    try:
        q.processAllAvailable()
        spark.createDataFrame(d2, schema).write.mode("append").json(drop_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    cells = (
        spark.table("weekly_retention_stream")
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.count(F.lit(1)).cast("bigint").alias("retained_users"))
    )
    # renamed join key: both derivations share the memory sink's fixed
    # attribute ids, so a same-name join trips self-join resolution
    sizes = (
        spark.table("weekly_retention_stream")
        .filter(F.col("offset_weeks") == 0)
        .groupBy(F.col("cohort_week").alias("cw"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cohort_users"))
    )
    stream_tri = {
        (r.cohort_week, r.offset_weeks, r.cohort_users, r.retained_users,
         r.retained_permille)
        for r in cells.join(
            F.broadcast(sizes), cells["cohort_week"] == sizes["cw"]
        )
        .selectExpr(
            "cohort_week", "offset_weeks", "cohort_users", "retained_users",
            "CAST(retained_users * 1000 DIV cohort_users AS BIGINT)"
            " AS retained_permille",
        )
        .collect()
    }
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    batch_tri = {
        (r.cohort_week, r.offset_weeks, r.cohort_users, r.retained_users,
         r.retained_permille)
        for r in se.q_events_weekly_retention(spark, str(tmp_path)).collect()
    }
    assert stream_tri == batch_tri
    # hand-checked: Jan-1 cohort = users {1,2}; user 1 retained wk1+wk2
    assert ("2024-01-01", 0, 2, 2, 1000) in stream_tri
    assert ("2024-01-01", 1, 2, 1, 500) in stream_tri
    assert ("2024-01-01", 2, 2, 1, 500) in stream_tri
    assert ("2024-01-08", 1, 1, 1, 1000) in stream_tri


def test_orders_price_ks_test_planted(spark, tmp_path):
    """A = {10.00, 20.00} urgent, B = {10.00, 30.00}: CDF gap peaks at
    2000 cents where cum_a=2, cum_b=1 -> |2*2 - 1*2| = 2 over
    n_a*n_b = 4, so D = 0.5 (5000 bp) and z^2 = 4/(2*2*4) = 250 milli."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [
        (1, "1-URGENT", 10.00),
        (2, "2-HIGH", 20.00),
        (3, "3-MEDIUM", 10.00),
        (4, "5-LOW", 30.00),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = rel.q_orders_price_ks_test(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b) == (2, 2)
    assert r.d_bp == 5000
    assert r.z2_milli == 250
    assert r.split_cents == 2000


def test_orders_price_ks_test_empty_group(spark, tmp_path):
    """No urgent orders at all: every gap is 0, D and z^2 are NULL
    (nullif-guarded zero denominator), split lands on the smallest
    cents value."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [(1, "5-LOW", 10.00), (2, "5-LOW", 20.00)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = rel.q_orders_price_ks_test(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b) == (0, 2)
    assert r.d_bp is None and r.z2_milli is None
    assert r.split_cents == 1000


def test_order_priority_cramers_v_planted(spark, tmp_path):
    """Perfectly-associated 2x2 (P1 always O, P2 always F): with the
    DENSIFIED grid the two unobserved cells contribute their expected
    mass, chi2 = n = 5 exactly and V = 1. Sparse-grid chi2 would be
    2.6 — this pins the spine-cross densification."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = (
        [(i, "1-URGENT", "O") for i in range(2)]
        + [(10 + i, "2-HIGH", "F") for i in range(3)]
    )
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_orderstatus string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = rel.q_order_priority_cramers_v(spark, str(tmp_path)).collect()[0]
    assert (r.n_orders, r.r_levels, r.c_levels, r.dof) == (5, 2, 2, 1)
    # cells micro: (P1,O) 36e6//20 + (P1,F) 36e6//30 + (P2,O) 36e6//30
    # + (P2,F) 36e6//45 = 1.8e6 + 1.2e6 + 1.2e6 + 0.8e6
    assert r.chi2_micro == 5_000_000
    assert r.v_milli == 1000


def test_order_priority_cramers_v_single_level(spark, tmp_path):
    """One priority level: min(r-1, c-1) = 0, V is NULL (nullif guard);
    chi2 of a 1 x c table is 0 (every cell IS its margin product)."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [(1, "1-URGENT", "O"), (2, "1-URGENT", "F")]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_orderstatus string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = rel.q_order_priority_cramers_v(spark, str(tmp_path)).collect()[0]
    assert (r.r_levels, r.c_levels, r.chi2_micro) == (1, 2, 0)
    assert r.v_milli is None


def test_lineitem_qty_jonckheere_planted(spark, tmp_path):
    """g1 quantities {1,2}, g2 {2,3}: 3 wins + 1 tie -> JT = 3.5,
    JT2 = 7; E2 = (16-8)/2 = 4; varnum = 16*11 - 4*7*2 = 120;
    z^2 = 72*(3.5-2)^2/120... doubled form: 18000*9/120 = 1350 milli
    (matches the classic (JT-E)^2/var = 2.25/(120/72) = 1.35)."""
    from sap_sql_engine_spark.operators import relational as rel

    spark.createDataFrame(
        [(1, "1-URGENT"), (2, "2-HIGH")],
        "o_orderkey long, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 2.0), (2, 3.0)],
        "l_orderkey long, l_quantity double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = rel.q_lineitem_qty_jonckheere(spark, str(tmp_path)).collect()[0]
    assert (r.n_lines, r.n_groups, r.n_cells) == (4, 2, 4)
    assert (r.jt2, r.e2, r.trend_sign) == (7, 4, 1)
    assert r.z2_milli == 1350


def test_lineitem_qty_jonckheere_single_group(spark, tmp_path):
    """One priority level: no g1<g2 pairs, JT2 coalesces to 0, E2 = 0,
    varnum = N^2(2N+3) - N^2(2N+3) = 0 -> z^2 NULL; trend flat."""
    from sap_sql_engine_spark.operators import relational as rel

    spark.createDataFrame(
        [(1, "3-MEDIUM")], "o_orderkey long, o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 5.0), (1, 7.0)], "l_orderkey long, l_quantity double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = rel.q_lineitem_qty_jonckheere(spark, str(tmp_path)).collect()[0]
    assert (r.jt2, r.e2, r.trend_sign) == (0, 0, 0)
    assert r.z2_milli is None


def test_customer_acctbal_levene_planted(spark, tmp_path):
    """A = {0, 200, 1000} cents (median 200, devs {200,0,800}),
    B = {500, 500} (devs {0,0}): S_A=1000, Q_A=680000;
    b_milli = 1000^2*1000//3 = 333333333;
    ssb = 333333333 - 10^9//5 = 133333333 milli;
    ssw = 680000000 - 333333333 = 346666667 milli;
    F = (SSB/1)/(SSW/3) = 1.15384.. -> 1153 milli (hand-derived)."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [
        (1, "A", 0.00),
        (2, "A", 2.00),
        (3, "A", 10.00),
        (4, "B", 5.00),
        (5, "B", 5.00),
    ]
    spark.createDataFrame(
        rows, "c_custkey long, c_mktsegment string, c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    r = rel.q_customer_acctbal_levene(spark, str(tmp_path)).collect()[0]
    assert (r.n_customers, r.n_groups) == (5, 2)
    assert r.ssb_milli == 133333333
    assert r.ssw_milli == 346666667
    assert r.f_milli == 1153


def test_customer_acctbal_levene_homogeneous(spark, tmp_path):
    """All deviations zero (every group is a point mass): ssb = ssw = 0
    and F is NULL (nullif-guarded zero denominator)."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [(1, "A", 3.00), (2, "A", 3.00), (3, "B", 7.00)]
    spark.createDataFrame(
        rows, "c_custkey long, c_mktsegment string, c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    r = rel.q_customer_acctbal_levene(spark, str(tmp_path)).collect()[0]
    assert (r.ssb_milli, r.ssw_milli) == (0, 0)
    assert r.f_milli is None


def test_events_theil_sen_slope_planted(spark, tmp_path):
    """Days {0,1,3} with counts {10,12,9}: pair slopes milli are
    {2000, floor(-1000/3) = -334, -1500} — the middle pair PLANTS a
    negative dividend with nonzero remainder (truncation would give
    -333), pinning the rule-6 floor identity. Median (type-1, 3 pairs)
    is the 2nd sorted slope: -334."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as sev

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    counts = {0: 10, 1: 12, 3: 9}
    rows, eid = [], 0
    for day, c in counts.items():
        for i in range(c):
            rows.append(
                (eid, base + dt.timedelta(days=day, seconds=i), 1, "t",
                 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = sev.q_events_theil_sen_slope(spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n_pairs) == (3, 3)
    assert (r.pos_pairs, r.neg_pairs) == (1, 2)
    assert r.sen_slope_milli == -334


def test_events_theil_sen_slope_single_day(spark, tmp_path):
    """One day: no pairs; counts coalesce to 0 and the median is NULL."""
    import datetime as dt

    from sap_sql_engine_spark.streaming import events as sev

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    spark.createDataFrame(
        [(0, base, 1, "t", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = sev.q_events_theil_sen_slope(spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n_pairs, r.pos_pairs, r.neg_pairs) == (1, 0, 0, 0)
    assert r.sen_slope_milli is None


def test_supplier_part_assortativity_planted(spark, tmp_path):
    """Edges s1-p10, s1-p11, s2-p10 (with a duplicate lineitem row to
    pin the DISTINCT): degree pairs (2,2),(2,1),(1,2) give
    n*Sxy - SxSy = 24 - 25 = -1 over sqrt(2*2) -> -500 milli."""
    from sap_sql_engine_spark.operators import graph as gr

    rows = [(1, 10), (1, 10), (1, 11), (2, 10)]
    spark.createDataFrame(
        rows, "l_suppkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = gr.q_supplier_part_assortativity(spark, str(tmp_path)).collect()[0]
    assert (r.n_edges, r.n_suppliers, r.n_parts) == (3, 2, 2)
    assert r.mean_supplier_degree_milli == 1500
    assert r.mean_part_degree_milli == 1500
    assert r.assortativity_milli == -500


def test_supplier_part_assortativity_degenerate(spark, tmp_path):
    """A single edge has zero degree variance on both sides: the
    correlation is NULL (nullif-guarded)."""
    from sap_sql_engine_spark.operators import graph as gr

    spark.createDataFrame(
        [(1, 10)], "l_suppkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = gr.q_supplier_part_assortativity(spark, str(tmp_path)).collect()[0]
    assert (r.n_edges, r.n_suppliers, r.n_parts) == (1, 1, 1)
    assert r.assortativity_milli is None


def test_customer_spend_mld_planted(spark, tmp_path):
    """Equal spends -> MLD exactly 0 (both components); a 100x spread
    in one segment reproduces the quantized ln recompute, with the
    between component 0 (one segment = no between-group inequality)."""
    import math

    from sap_sql_engine_spark.operators import relational as rel

    spark.createDataFrame(
        [(1, "S1"), (2, "S1"), (3, "S2")],
        "c_custkey long, c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(10, 1, 1.00), (11, 2, 1.00), (12, 3, 1.00)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = rel.q_customer_spend_mld(spark, str(tmp_path)).collect()[0]
    assert (r.n_customers, r.n_segments) == (3, 2)
    assert (r.mld_total_micro, r.mld_between_micro) == (0, 0)

    spark.createDataFrame(
        [(1, "S1"), (2, "S1")], "c_custkey long, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(10, 1, 1.00), (11, 2, 100.00)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = rel.q_customer_spend_mld(spark, str(tmp_path)).collect()[0]
    t1 = math.floor(math.log(10100 / 2) * 1_000_000)
    t2 = (
        math.floor(math.log(100) * 1_000_000)
        + math.floor(math.log(10000) * 1_000_000)
    ) // 2
    assert r.mld_total_micro == t1 - t2
    assert r.mld_between_micro == 0


def test_docs_quality_ks_by_source_planted(spark, tmp_path):
    """Identical texts across sources -> every per-source D is 0;
    two sources with disjoint quality values -> both report the full
    D = 10000 bp (each source's CDF is disjoint from its rest)."""
    from sap_sql_engine_spark.operators import textanalysis as ta

    same = "the cat sat on the mat and it is a fine day in town."
    rows = [
        (i, same, "en", src, len(same))
        for i, src in enumerate(["srcA", "srcA", "srcB", "srcB"])
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: r
        for r in ta.q_docs_quality_ks_by_source(spark, str(tmp_path))
        .collect()
    }
    assert out["srcA"].d_bp == 0 and out["srcB"].d_bp == 0
    assert out["srcA"].n_docs == 2 and out["srcA"].n_rest == 2

    lo = "zzzz qqqq 12345 !!!! xxxx"
    rows = [
        (0, same, "en", "srcA", len(same)),
        (1, same, "en", "srcA", len(same)),
        (2, lo, "xx", "srcB", len(lo)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: r
        for r in ta.q_docs_quality_ks_by_source(spark, str(tmp_path))
        .collect()
    }
    assert out["srcA"].d_bp == 10000
    assert out["srcB"].d_bp == 10000
    assert (out["srcB"].n_docs, out["srcB"].n_rest) == (1, 2)


def test_theil_sen_over_streaming_daily_sink(spark, tmp_path):
    """Production split for the Theil-Sen lane: streaming_daily_counts
    maintains the watermarked daily sink, and theil_sen_from_days over
    the sink (day string -> integer day index) equals the batch query
    on the identical rows written as events.parquet. Daily counts
    1, 3, 2 give pair slopes {2000, 500, -1000} milli -> median 500."""
    import datetime as dt

    drop_dir = str(tmp_path / "drops")
    out_dir = str(tmp_path / "daily")
    rows = [(1, 1, 9), (1, 2, 9), (2, 2, 10), (3, 2, 11), (1, 3, 9), (2, 3, 15)]
    # sentinel: pushes the 2-day watermark past every real day; its own
    # open window never reaches the sink
    flush = [(99, 20, 0)]
    spark.createDataFrame(
        [
            (u, "click", dt.datetime(2024, 3, d, h), 1.0)
            for (u, d, h) in rows + flush
        ],
        "user_id long, event_type string, ts timestamp, value double",
    ).write.mode("append").json(drop_dir)
    q = se.streaming_daily_counts(spark, drop_dir, out_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    sink_days = spark.read.parquet(out_dir).selectExpr(
        "CAST(datediff(CAST(day AS DATE), DATE '1970-01-01') AS BIGINT)"
        " AS d",
        "c",
    )
    got = [tuple(r) for r in se.theil_sen_from_days(sink_days).collect()]

    spark.createDataFrame(
        [
            (i, dt.datetime(2024, 3, d, h), u, "click", 1.0, "{}")
            for i, (u, d, h) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    want = [
        tuple(r)
        for r in se.q_events_theil_sen_slope(spark, str(tmp_path)).collect()
    ]
    assert got == want
    assert got == [(3, 3, 2, 1, 500)]


def test_orders_priority_mix_drift_planted(spark, tmp_path):
    """Three months against a global P1:P2 = 6:4 mix; month C has NO P2
    orders, pinning the spine densification (its empty cell contributes
    the full expected mass 0.8 -> 800000 micro). All contributions
    hand-derived via (obs*N - n_m*r_p)^2 * 1e6 // (N*n_m*r_p)."""
    import datetime as dt

    from sap_sql_engine_spark.operators import relational as rel

    rows = (
        [(i, "1-URGENT", dt.date(2024, 1, 5)) for i in range(3)]
        + [(3, "5-LOW", dt.date(2024, 1, 9))]
        + [(4, "1-URGENT", dt.date(2024, 2, 5))]
        + [(5 + i, "5-LOW", dt.date(2024, 2, 9)) for i in range(3)]
        + [(8 + i, "1-URGENT", dt.date(2024, 3, 5)) for i in range(2)]
    )
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_orderdate date"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r.month: (r.n_orders, r.dof, r.chi2_micro)
        for r in rel.q_orders_priority_mix_drift(spark, str(tmp_path))
        .collect()
    }
    assert got == {
        "2024-01": (4, 1, 150000 + 225000),
        "2024-02": (4, 1, 816666 + 1225000),
        "2024-03": (2, 1, 533333 + 800000),
    }


def test_orders_price_anderson_darling_planted(spark, tmp_path):
    """Same 4-order dataset as the KS planted test: at 1000 cents the
    gap term is 0 (M*N - n_a*B = 4 - 4); at 2000 it is 2, contributing
    4e6 // 12 = 333333 micro; 3000 is the excluded B = N value. Checks
    A^2 = 1/3 exactly."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [
        (1, "1-URGENT", 10.00),
        (2, "2-HIGH", 20.00),
        (3, "3-MEDIUM", 10.00),
        (4, "5-LOW", 30.00),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = rel.q_orders_price_anderson_darling(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b) == (2, 2)
    assert r.a2_micro == 333333


def test_orders_price_anderson_darling_empty_group(spark, tmp_path):
    """One empty group: every contribution's denominator nullifs, the
    sum coalesces to 0."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [(1, "5-LOW", 10.00), (2, "5-LOW", 20.00)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = rel.q_orders_price_anderson_darling(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b, r.a2_micro) == (0, 2, 0)


def test_orders_price_mood_median_planted(spark, tmp_path):
    """P1 = {100, 300} cents, P2 = {100, 100}: global type-1 median is
    100, so only P1's 300 sits above; the densified 2x2 grid gives
    chi2 = 500000+166666+500000+166666 = 1333332 micro (true 4/3)."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [
        (1, "1-URGENT", 1.00),
        (2, "1-URGENT", 3.00),
        (3, "5-LOW", 1.00),
        (4, "5-LOW", 1.00),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r.o_orderpriority: (
            r.n_orders, r.n_above_median, r.above_permille,
            r.chi2_total_micro,
        )
        for r in rel.q_orders_price_mood_median(spark, str(tmp_path))
        .collect()
    }
    assert got == {
        "1-URGENT": (2, 1, 500, 1333332),
        "5-LOW": (2, 0, 0, 1333332),
    }


def test_orders_price_mood_median_degenerate(spark, tmp_path):
    """All orders at one price: the median IS the max, nothing is
    above, the above column total is 0 and its cells nullif out —
    chi2 is the sum of the surviving zero-diff cells (0)."""
    from sap_sql_engine_spark.operators import relational as rel

    rows = [(1, "1-URGENT", 2.00), (2, "5-LOW", 2.00)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r.o_orderpriority: (r.n_above_median, r.chi2_total_micro)
        for r in rel.q_orders_price_mood_median(spark, str(tmp_path))
        .collect()
    }
    assert got == {"1-URGENT": (0, 0), "5-LOW": (0, 0)}
