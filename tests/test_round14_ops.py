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
