"""Property-based tests (hypothesis) for the round-8 operators: the
window-recipe skyline against a brute-force dominance oracle, the FIFO
interval join's conservation law, and winnowing's guaranteed-coverage
property — arbitrary inputs, ties, duplicates, empties included.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sap_sql_engine_spark.operators import relational, textanalysis

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

PART_SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_size int, "
    "p_retailprice double"
)


# ---------------------------------------------------------------------------
# skyline: O(n log n) window recipe == quadratic dominance oracle


def _py_skyline(points):
    """Brute-force NOT-EXISTS dominance over (cents, size) pairs."""
    out = {}
    for a in points:
        if not any(
            b[0] <= a[0] and b[1] <= a[1] and (b[0] < a[0] or b[1] < a[1])
            for b in points
        ):
            out[a] = out.get(a, 0) + 1
    return out


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.integers(1, 6)),
        min_size=1,
        max_size=12,
    )
)
def test_skyline_window_recipe_matches_bruteforce(spark, tmp_path_factory, pts):
    tmp = tmp_path_factory.mktemp("sky")
    rows = [
        (i, f"p{i}", "B", size, cents / 100.0)
        for i, (cents, size) in enumerate(pts)
    ]
    spark.createDataFrame(rows, PART_SCHEMA).write.mode("overwrite").parquet(
        str(tmp / "part.parquet")
    )
    got = {
        (r.price_cents, r.size): r.n_parts
        for r in relational.q_part_skyline_frontier(spark, str(tmp)).collect()
    }
    assert got == _py_skyline(pts)


# ---------------------------------------------------------------------------
# FIFO conservation: matched quantity per key == min(total supply, demand)
# whenever both streams exist (cumulative intervals tile [0, total) on
# each side, so their overlap is exactly the shared prefix)

LI_SCHEMA = (
    "l_orderkey long, l_linenumber int, l_partkey long, l_returnflag string, "
    "l_shipdate date, l_quantity double"
)


@settings(**SETTINGS)
@given(
    st.lists(st.integers(1, 9), min_size=0, max_size=5),
    st.lists(st.integers(1, 9), min_size=0, max_size=5),
)
def test_fifo_matched_equals_min_of_totals(
    spark, tmp_path_factory, supply, demand
):
    import datetime as dt

    tmp = tmp_path_factory.mktemp("fifo")
    d0 = dt.date(2024, 1, 1)
    rows = [
        (i, 1, 1, "R", d0 + dt.timedelta(days=i), float(q))
        for i, q in enumerate(supply)
    ] + [
        (100 + i, 1, 1, "N", d0 + dt.timedelta(days=i), float(q))
        for i, q in enumerate(demand)
    ]
    if not rows:
        return
    spark.createDataFrame(rows, LI_SCHEMA).write.mode("overwrite").parquet(
        str(tmp / "lineitem.parquet")
    )
    spark.createDataFrame(
        [(1, "p1", "A", 1, 1.0)], PART_SCHEMA
    ).write.mode("overwrite").parquet(str(tmp / "part.parquet"))
    r = relational.q_fifo_return_reallocation(spark, str(tmp)).collect()[0]
    assert r.supply_qty == sum(supply)
    assert r.demand_qty == sum(demand)
    assert r.matched_qty == min(sum(supply), sum(demand))


# ---------------------------------------------------------------------------
# winnowing guaranteed coverage: every full window of w consecutive gram
# positions contains at least one selected fingerprint position (the
# local-sampling property the algorithm exists for)


@settings(**SETTINGS)
@given(st.lists(st.sampled_from("abcd"), min_size=6, max_size=24))
def test_winnowing_covers_every_window(spark, tmp_path_factory, letters):
    tmp = tmp_path_factory.mktemp("win")
    text = " ".join(letters)
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    # python reference selection (rightmost-min, same md5 recipe)
    k, w = textanalysis.WINNOW_K, textanalysis.WINNOW_W
    toks = text.split()
    hs = [
        int(
            hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:8], 16
        )
        for i in range(len(toks) - k + 1)
    ]
    sel = set()
    for s in range(len(hs) - w + 1):
        best, bp = None, None
        for p in range(s, s + w):
            if best is None or hs[p] <= best:
                best, bp = hs[p], p
        sel.add(bp)
    # coverage: every window [s, s+w-1] holds a selected position
    for s in range(len(hs) - w + 1):
        assert any(s <= p <= s + w - 1 for p in sel)

    # and the engine agrees with the reference on count + hash sum
    r = textanalysis.q_text_winnowing(spark, str(tmp)).collect()[0]
    assert r.n_fingerprints == len(sel)
    assert r.fp_hash_sum == sum(hs[p] for p in sel)
