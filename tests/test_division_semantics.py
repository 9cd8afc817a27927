"""Pin the cross-engine integer-division semantics the oracle suite
relies on, with PLANTED negative-remainder cases (r14 verdict item #1:
the `kn_bigram_smoothing` class — a truncate-vs-floor divergence hid
for 5 rounds because sf0.01 happened to land remainder 0; hypothesis
here FORCES negative dividends not divisible by the divisor so the
divergence surface can never again depend on what the test data
happens to produce).

The contracts being pinned (see tools/division_audit.py header):

  1. Spark `a DIV n`  ==  DuckDB BIGINT `a // n`  ==  C-style
     truncation toward zero — for ALL signs of a.
  2. The spelled-out floor identity `(a - ((a % n + n) % n)) DIV n`
     (Spark) == same text with `//` (DuckDB) == Python's floor `a // n`
     — for ALL signs of a. This is the form every signed-dividend
     site that needs FLOOR semantics must use on BOTH engines
     (lm_perplexity_buckets, kn_bigram_smoothing, source_psi_drift).
  3. Hazard B: DuckDB `//` on a DECIMAL operand is PLAIN DIVISION, not
     integer division (pinned so a DuckDB upgrade that changes this is
     caught by CI, not by a red driver row).
  4. `%` takes the dividend's sign on both engines (the identity in
     contract 2 depends on it).

Spark evaluation is BATCHED: hypothesis generates a list of (a, n)
pairs, one DataFrame evaluates them all — per-example Spark jobs would
make the property test minutes-slow.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _trunc(a: int, n: int) -> int:
    """C-style truncation toward zero (what Spark DIV / DuckDB int //
    implement), vs Python's // which floors."""
    q = abs(a) // abs(n)
    return q if (a >= 0) == (n > 0) else -q


# dividends: force the signed + nonzero-remainder region to be COMMON
# (plain st.integers would hit it, but the planted strategy guarantees
# every run exercises it, which is the point of the audit item)
_dividends = st.one_of(
    st.integers(min_value=-(10**12), max_value=10**12),
    # planted: a = -(k*n + r) shapes get built in the test body below
    st.integers(min_value=-(10**6), max_value=-1),
)
_divisors = st.integers(min_value=1, max_value=10**6)


@given(pairs=st.lists(st.tuples(_dividends, _divisors), min_size=1, max_size=40))
@settings(**SETTINGS)
def test_trunc_and_floor_identities_cross_engine(spark, pairs):
    # PLANT guaranteed negative-remainder cases alongside the generated
    # ones: for each generated (a, n) with n > 1 also test
    # (-(abs(a) * n + 1), n) — a negative dividend with remainder
    # forced nonzero (|a|*n + 1 is never divisible by n when n > 1).
    planted = [(-(abs(a) * n + 1), n) for a, n in pairs if n > 1]
    cases = pairs + planted
    con = duckdb.connect()
    rows_sql = ", ".join(f"({a}, {n})" for a, n in cases)
    q = (
        "SELECT a // n AS trunc_div,"
        " (a - ((a % n + n) % n)) // n AS floor_div,"
        " a % n AS mod_sign"
        f" FROM (VALUES {rows_sql}) t(a, n)"
    )
    duck = con.execute(q).fetchall()
    sdf = spark.sql(
        "SELECT a DIV n AS trunc_div,"
        " (a - ((a % n + n) % n)) DIV n AS floor_div,"
        " a % n AS mod_sign"
        f" FROM (VALUES {rows_sql}) AS t(a, n)"
    ).collect()
    for (a, n), drow, srow in zip(cases, duck, sdf):
        py_floor = a // n  # Python floors
        py_trunc = _trunc(a, n)
        # contract 1: both engines truncate on plain int division
        assert drow[0] == py_trunc, (a, n, "duckdb // != trunc")
        assert srow[0] == py_trunc, (a, n, "spark DIV != trunc")
        # contract 2: the spelled-out identity floors on both engines
        assert drow[1] == py_floor, (a, n, "duckdb floor-identity")
        assert srow[1] == py_floor, (a, n, "spark floor-identity")
        # contract 4: % takes the dividend's sign on both engines
        assert drow[2] == srow[2], (a, n, "% mismatch across engines")
        assert drow[2] == a - py_trunc * n, (a, n, "% not trunc-paired")
        # the divergence the audit hunts: trunc != floor whenever the
        # planted case has a negative dividend with nonzero remainder
        if a < 0 and a % n != 0:
            assert py_trunc != py_floor, (a, n, "plant failed")


def test_decimal_double_slash_is_plain_division_in_duckdb():
    """Hazard B pin: DuckDB 1.x `//` on DECIMAL/DOUBLE operands is
    PLAIN division. Every oracle integer-division site must therefore
    keep integer/HUGEINT effective operand types (tools/
    division_audit.py flags violations). If a DuckDB upgrade changes
    this semantics, this test fails loudly and the audit tool's
    classification rules must be revisited."""
    con = duckdb.connect()
    assert con.execute("SELECT CAST(-7 AS DECIMAL(38,0)) // 2").fetchone()[0] == pytest.approx(-3.5)
    assert con.execute("SELECT -7.0 // 2").fetchone()[0] == pytest.approx(-3.5)
    # while integer and HUGEINT `//` truncate toward zero
    assert con.execute("SELECT -7 // 2").fetchone()[0] == -3
    assert con.execute("SELECT CAST(-7 AS HUGEINT) // CAST(2 AS HUGEINT)").fetchone()[0] == -3


def test_spark_div_truncates_on_decimal(spark):
    """Spark DIV truncates toward zero on DECIMAL(38,0) too — the
    DECIMAL-accumulator lanes (FLOATS.md) rely on DIV == HUGEINT-//."""
    row = spark.sql(
        "SELECT CAST(-7 AS DECIMAL(38,0)) DIV 2 AS a,"
        " CAST(-7 AS DECIMAL(38,0)) DIV CAST(2 AS DECIMAL(38,0)) AS b,"
        " -7 DIV 2 AS c, 7 DIV -2 AS d"
    ).collect()[0]
    assert (row.a, row.b, row.c, row.d) == (-3, -3, -3, -3)


def test_division_audit_fully_dispositioned():
    """tools/division_audit.py must exit 0: every oracle `//` site is
    provably non-negative, auto-cleared as matched truncation, or
    hand-noted in AUDIT_NOTES. A new oracle that introduces a signed
    dividend next to a Spark-side floor form (or a DECIMAL-typed
    operand) fails HERE the round it is written, instead of hiding
    until some sf produces a negative remainder."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/division_audit.py"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        "undispositioned division sites:\n" + proc.stdout[-2000:]
    )
