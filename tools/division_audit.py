"""Audit every DuckDB-oracle integer-division site for the
`kn_bigram_smoothing` divergence class (r13 verdict item #1; the fix
was commit 74730ca).

Engine semantics, pinned empirically (and by the property test in
``tests/test_division_semantics.py``):

  Spark  `a DIV b`                   -> truncate toward zero (-7 DIV 2 = -3)
         on BIGINT, DECIMAL(38,0), everything.
  Spark  `FLOOR(a / b)` / pmod form  -> floor (-7 -> -4).
  DuckDB `a // b` INT / HUGEINT      -> truncate toward zero (-7 // 2 = -3).
  DuckDB `a // b` DECIMAL / DOUBLE   -> PLAIN DIVISION (-7.0 // 2 = -3.5) —
                                        not integer division at all.
  Both   `a % b`                     -> sign of the dividend.

Therefore a site diverges only when (hazard A) the dividend can be
negative with a nonzero remainder AND the two engines use different
rounding — oracle ``//`` (truncate) against a Spark-side floor form, or
a spelled-out floor identity on one side only — or when (hazard B) the
oracle ``//``'s effective operand type is DECIMAL/DOUBLE, silently
turning integer division into plain division.

Classification per ``//`` site (operand reconstructed by a
balanced-paren backward/forward scan, effective type read through the
OUTERMOST cast):

  - ``decimal``: effective operand type is DECIMAL/DOUBLE -> hazard B,
    always flagged for a hand disposition.
  - ``nonneg``: dividend provably non-negative — no binary minus and no
    known-signed atom, or the minus matches a whitelisted nonneg
    algebraic form (rank/row_number/perm minus a smaller literal;
    pair counts x*(x-1)//2; ceil-adjust (k*m + c-1)//c). Safe under
    EITHER rounding convention.
  - ``signed``: dividend can plausibly be negative. Safe IFF the Spark
    counterpart truncates too. The tool AUTOMATES that pairing check:
    it reads the Spark query function's source (inspect.getsource of
    ``queries()[name]``) and hunts for floor-division forms — `floor(`
    over an expression containing a true division, or the pmod floor
    identity. No floor form -> the Spark side can only be `DIV`-shaped
    (truncation; matched) -> auto-disposition ``matched-truncation``.
    A floor form found -> FLAG for a hand disposition in AUDIT_NOTES.

Run:  python tools/division_audit.py [--verbose]
Exit 1 if any flagged site lacks an AUDIT_NOTES disposition.
The disposition list (this file + the printed report) is the r14
"recorded audit list"; summary also in FLOATS.md §integer-division.
"""

from __future__ import annotations

import inspect
import re
import sys

sys.path.insert(0, "/root/repo")

_SIGNED_ATOMS = re.compile(
    r"\b(lnq?\b|ln_|log|nats?\b|micro_?nat|err\b|diff|delta|dev\b|"
    r"resid|slope|cov\b|corr|beta|z_?score|cusum|trend|drift|lift|"
    r"acctbal|balance|mk_s\b|signed|s_pos|sxy|score)",
    re.IGNORECASE,
)

# Whitelisted minus shapes that keep a dividend non-negative:
#   rank/row_number/perm/merge_rank minus a literal (rank >= 1),
#   pair counts x * (x - 1), ceil-adjust (k*x + c-1), hi - lo ranges
#   guarded by greatest(), cnt - shared (containment: cnt >= shared).
_NONNEG_MINUS = [
    re.compile(r"\(\s*(row_number\(\)[^)]*\)|perm|rank|merge_rank|r)\s*-\s*1\s*\)", re.I),
    re.compile(r"\w+\s*\*\s*\(\s*\w+\s*-\s*1\s*\)", re.I),  # x*(x-1) pairs
    re.compile(r"\+\s*\d+\s*-\s*1\s*\)\s*//", re.I),  # ceil-adjust (.. + c - 1) //
    re.compile(r"greatest\s*\(", re.I),  # range guarded by greatest(lo,1)
    re.compile(r"n1\s*\+\s*n2\s*-\s*shared", re.I),  # |A∪B| >= 0
    re.compile(r"\(\s*n\s*-\s*k\s*\)|\(\s*k\s*-\s*1\s*\)", re.I),  # dof divisors
]

_FLOOR_DIV_FORMS = [
    # floor( ... / ... ) with a real division inside the call
    re.compile(r"floor\s*\([^)]*(/|DIV\b)", re.I),
    # the spelled-out pmod floor identity on the Spark side
    re.compile(r"%\s*\w+\s*\+\s*\w+\s*\)\s*%", re.I),
    re.compile(r"%\s*count\(\*\)\s*\+\s*count\(\*\)\)", re.I),
]

_CAST_OUTER = re.compile(r"^\s*CAST\s*\(.*\bAS\s+([A-Za-z0-9_() ,]+?)\s*\)\s*$",
                         re.I | re.S)


def _operand_left(sql: str, op_start: int) -> str:
    """Backward scan for the `//` dividend. `//` binds tighter than
    binary +/- so the scan stops at a TOP-LEVEL + or - (a `-` preceded
    by emptiness/another operator/`(` is unary: keep it, it signs the
    dividend)."""
    i = op_start - 1
    depth = 0
    while i >= 0:
        c = sql[i]
        if c == ")":
            depth += 1
        elif c == "(":
            if depth == 0:
                break
            depth -= 1
        elif depth == 0 and c in ",;<>=":
            break
        elif depth == 0 and c in "+-":
            j = i - 1
            while j >= 0 and sql[j] in " \n\t":
                j -= 1
            if c == "-" and (j < 0 or sql[j] in "(+-*/%,<>="):
                pass  # unary minus: part of the dividend, keep scanning
            else:
                break
        i -= 1
    return sql[i + 1 : op_start].strip()


def _operand_right(sql: str, op_end: int) -> str:
    """Forward scan for the divisor: stops at top-level + - * % , ; and
    comparison chars (all lower-or-equal precedence / expression ends)."""
    i = op_end
    depth = 0
    seen = False  # skip a leading unary sign / whitespace
    while i < len(sql):
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                break
            depth -= 1
        elif depth == 0 and c in ",;<>=":
            break
        elif depth == 0 and c in "+-*%" and seen:
            break
        if c not in " \n\t":
            seen = True
        i += 1
    return sql[op_end:i].strip()


def _effective_decimal(operand: str) -> bool:
    """True if the operand's OUTERMOST type is DECIMAL/DOUBLE/FLOAT.

    `CAST(x AS BIGINT)` is integer even if x mentions DECIMAL inside;
    a bare expression mentioning a DECIMAL cast without an outer
    integer cast keeps the DECIMAL promotion (DuckDB: plain division).
    Trailing AS-alias text and comparison tails are stripped first."""
    op = operand.strip()
    # cut at the first top-level keyword that ends the arithmetic expr
    op = re.split(r"\bAS\s+\w+\s*$", op, flags=re.I)[0].strip()
    m = _CAST_OUTER.match(op)
    if m:
        t = m.group(1).upper()
        return bool(re.search(r"\b(DECIMAL|DOUBLE|FLOAT|REAL)\b", t))
    up = op.upper()
    if re.search(r"\b(DECIMAL|DOUBLE)\b|::FLOAT", up):
        # an inner DECIMAL cast with no outer integer cast promotes
        # the whole arithmetic chain unless a later CAST(.. AS BIGINT/
        # HUGEINT) wraps it — look for integer casts that wrap the
        # decimal mention
        int_cast = re.search(r"CAST\s*\(.*DECIMAL.*AS\s+(BIGINT|HUGEINT|INT\w*)",
                             op, re.I | re.S)
        return not int_cast
    return False


def classify_dividend(lhs: str) -> str:
    if _SIGNED_ATOMS.search(lhs):
        return "signed"
    if "-" in lhs:
        for pat in _NONNEG_MINUS:
            if pat.search(lhs):
                return "nonneg"
        return "signed"
    return "nonneg"


def spark_has_floor_div(name: str, qfn) -> bool:
    try:
        src = inspect.getsource(qfn)
    except (OSError, TypeError):
        return True  # can't read -> conservative flag
    # The Spark expression may live in a module-level string constant
    # (the repo's shared-selectExpr convention): pull in every module
    # global whose NAME appears in the function source and whose value
    # is a string, so a floor form hiding in a shared constant can't
    # produce a false auto-clear.
    mod = inspect.getmodule(qfn)
    blob = [src]
    if mod is not None:
        for gname, gval in vars(mod).items():
            if isinstance(gval, str) and re.search(rf"\b{re.escape(gname)}\b", src):
                blob.append(gval)
    text = "\n".join(blob)
    return any(p.search(text) for p in _FLOOR_DIV_FORMS)


# Hand dispositions for sites the automated check cannot clear.
# Format: query -> why the site is convention-matched (or fixed).
AUDIT_NOTES: dict[str, str] = {
    # The two spelled-out floor-identity sites: the SAME identity text
    # runs on both engines ((s - ((s%n + n)%n)) DIV n on Spark ==
    # ... // n on DuckDB over INT/HUGEINT operands) — floor on both.
    "lm_perplexity_buckets": (
        "floor identity spelled out on BOTH engines over BIGINT "
        "(textanalysis.py:2886 vs oracle :2946) — matched floor"
    ),
    "kn_bigram_smoothing": (
        "the r13 fix (74730ca): floor identity on both engines; "
        "re-gated green r13 both legs"
    ),
    "events_theil_sen_slope": (
        "floor identity spelled out on BOTH engines over BIGINT "
        "(events.py q_events_theil_sen_slope vs ORACLE_EVENTS_THEIL_SEN) "
        "— the pair slope (cb-ca)*1000 is genuinely SIGNED, exactly the "
        "rule-6 case the identity exists for; planted test pins a "
        "negative-remainder slope"
    ),
    # floor() here is over a DOUBLE product/quotient of NON-NEGATIVE
    # quantities (jaccard in [0,1], HLL registers > 0, sqrt >= 0), or
    # floor(x*K + 0.5) rounding of a nonneg double — never a signed
    # integer division; the // sites in the oracle divide count-like
    # dividends (auto-classified signed only via loose atom matches).
    "dedup_minhash_calibration": "floor over nonneg jaccard doubles; // sites divide bp sums (nonneg)",
    "dedup_lsh_recall_report": "floor over nonneg jaccard; // over CASE-1/0 sums (nonneg)",
    "hll_intersection_estimate": "floor(HLL_CONST/positive register sum); // dividend abs(...) (nonneg)",
    "events_ab_lift_report": (
        "lift_bp = ca*1000//na - cb*1000//nb: each quotient nonneg "
        "(counts); the z-like ratio divides a SIGNED numerator by a "
        "GREATEST(...,1)-guarded positive denominator with plain // on "
        "HUGEINT (truncate) — Spark side uses DIV on DECIMAL(38,0) "
        "(truncate): matched truncation (verified in source)"
    ),
    # THE r14 AUDIT'S FIND — the kn_bigram sibling the verdict
    # predicted: Spark used the spelled-out FLOOR identity while the
    # oracle used plain // (truncate). num is provably >= 0 (each PSI
    # term is d * floor(ln(ratio)*1e6) with d and the floored ln
    # sharing a sign, so every term >= 0 — the Spark comment claiming
    # transient negatives was wrong), so values agreed — but the
    # convention mismatch was guarded only by that unproven comment.
    # Fixed r14: oracle now carries the SAME floor identity
    # (textanalysis.py ORACLE_PSI_DRIFT agg CTE); re-gated via
    # _MODIFIED_QUERIES on principle.
    "source_psi_drift": (
        "r14 FIX: oracle aligned to the Spark side's spelled-out floor "
        "identity; num provably >= 0 so values unchanged; re-gated"
    ),
    # Dividend is -sum(c * lnq) with lnq = floor(ln(c/t)*1e6) <= 0
    # (c <= t always), so the dividend is >= 0; Spark DIV and DuckDB
    # BIGINT/HUGEINT // both truncate — matched AND nonneg. The floor
    # form the auto-check sees is floor(ln(double ratio)*1e6), the
    # both-engine IEEE quantization, not a floor-division.
    "source_token_entropy": (
        "dividend -sum(c*lnq) >= 0 (lnq <= 0 termwise); DIV vs // both "
        "truncate on BIGINT/HUGEINT — matched; floor() in source is the "
        "both-engine double ln quantization, not floor-division"
    ),
    # r14 new query, written under rule 6 from the start: Theil's
    # numerator is >= 0 by Jensen but per-term ln quantization can dip
    # it a few micro below zero near uniformity, so BOTH engines carry
    # the identical spelled-out floor identity (the kn_bigram/psi_drift
    # convention); the milli-revenue `// 1000` site divides a
    # nonneg money sum.
    "supplier_revenue_theil": (
        "floor identity spelled out on BOTH engines over "
        "DECIMAL(38,0)/HUGEINT (relational.py q_supplier_revenue_theil "
        "vs ORACLE_SUPPLIER_REVENUE_THEIL) — matched floor; property "
        "test re-proves vs Python floor recompute"
    ),
}


def main() -> int:
    verbose = "--verbose" in sys.argv
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    qs = e.queries()
    rows = []  # (query, class, lhs, rhs)
    for name, sql in oracles.items():
        for m in re.finditer(r"//", sql):
            lhs = _operand_left(sql, m.start())
            rhs = _operand_right(sql, m.end())
            if _effective_decimal(lhs) or _effective_decimal(rhs):
                cls = "decimal"
            else:
                cls = classify_dividend(lhs)
            rows.append((name, cls, lhs, rhs))

    by_q: dict[str, list] = {}
    for name, cls, lhs, rhs in rows:
        by_q.setdefault(name, []).append((cls, lhs, rhs))

    n_flag = 0
    n_auto = 0
    flagged_q = []
    for name in sorted(by_q):
        classes = {c for c, _, _ in by_q[name]}
        if classes <= {"nonneg"}:
            continue
        if "decimal" in classes:
            disp = AUDIT_NOTES.get(name)
            if disp:
                print(f"OK   (decimal, noted) {name}: {disp}")
            else:
                n_flag += 1
                flagged_q.append(name)
                print(f"FLAG (decimal) {name}")
                for c, lhs, rhs in by_q[name]:
                    if c == "decimal":
                        print(f"       {lhs[-90:]} // {rhs[:50]}")
            continue
        # signed sites: automated pairing check against the Spark source
        if name in AUDIT_NOTES:
            print(f"OK   (noted) {name}: {AUDIT_NOTES[name]}")
            continue
        if not spark_has_floor_div(name, qs[name]):
            n_auto += 1
            if verbose:
                print(f"ok   (matched-truncation) {name}: Spark source has no "
                      f"floor-division form; oracle // truncates on int/HUGEINT")
            continue
        n_flag += 1
        flagged_q.append(name)
        print(f"FLAG (signed + Spark floor form present) {name}")
        for c, lhs, rhs in by_q[name]:
            if c == "signed":
                print(f"       {lhs[-90:]} // {rhs[:50]}")

    n_nonneg_q = sum(1 for q, v in by_q.items() if {c for c, _, _ in v} <= {"nonneg"})
    print(
        f"\n{len(rows)} sites / {len(by_q)} queries: "
        f"{n_nonneg_q} all-nonneg, {n_auto} matched-truncation (auto), "
        f"{len(AUDIT_NOTES)} hand-noted, {n_flag} UNDISPOSITIONED"
    )
    return 1 if n_flag else 0


if __name__ == "__main__":
    raise SystemExit(main())
