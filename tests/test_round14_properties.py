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
