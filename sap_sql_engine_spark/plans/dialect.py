"""Dialect front-end: SAP-HANA / Oracle / SQLite-flavored SQL -> Spark SQL.

The reference accepts LLM-generated SQL in a HANA-ish dialect and rewrites it
to SQLite with ~25 regex rules (reference ``sap_sql_engine.py:961-1199``, the
balanced-paren helper at ``:907-958``). This module is the same *front-end
contract* pointed the other way: accept that dialect (plus the SQLite-isms
the reference's own 58 templates emit, e.g. ``julianday``/``strftime``/
``printf``/``date('now',...)``) and emit Spark SQL, where Catalyst parses it.

Implementation is a quote-aware scanner + a rules table (function name ->
argument rewriter), not a chain of blind regexes: rewrites respect string
literals and nested parentheses, and unknown functions pass through for
Spark's analyzer to accept or reject.

SURVEY §2.6 is the rule inventory; SURVEY §4 items 1/3/4 are the semantic
fixes (NOT IN null-safety, ''/NULL open-item normalization) applied here so
every downstream consumer gets them.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

# ---------------------------------------------------------------------------
# lexical helpers: comment stripping, statement selection, quote-aware scans


def strip_comments(sql: str) -> str:
    """Remove ``--`` line comments and ``/* */`` block comments, preserving
    string literals (a ``--`` inside quotes is data, not a comment)."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                i += 1
        elif ch == "/" and i + 1 < n and sql[i + 1] == "*":
            i += 2
            while i + 1 < n and not (sql[i] == "*" and sql[i + 1] == "/"):
                i += 1
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def split_statements(sql: str) -> list[str]:
    """Split on top-level ``;`` (outside string literals)."""
    parts: list[str] = []
    cur: list[str] = []
    in_str = False
    for ch in sql:
        if ch == "'":
            in_str = not in_str
        if ch == ";" and not in_str:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def last_query_statement(sql: str) -> str:
    """Multi-statement guard: keep the last SELECT/WITH statement.

    Mirrors the reference's behavior (``sap_sql_engine.py:966-999``) where an
    LLM may emit several statements; only the final query runs. Non-query
    statements (SET, DDL) are dropped.
    """
    stmts = split_statements(strip_comments(sql))
    queries = [s for s in stmts if re.match(r"(?is)^\s*(SELECT|WITH)\b", s)]
    if queries:
        return queries[-1]
    return stmts[-1] if stmts else sql.strip()


def _scan_balanced(sql: str, open_idx: int) -> int:
    """Given index of ``(``, return index just past its matching ``)``."""
    depth = 0
    in_str = False
    i = open_idx
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return i + 1
        i += 1
    raise ValueError(f"unbalanced parentheses at {open_idx}: {sql[open_idx:open_idx+40]!r}")


def _split_args(argstr: str) -> list[str]:
    """Split a function argument string on top-level commas."""
    args: list[str] = []
    cur: list[str] = []
    depth = 0
    in_str = False
    for ch in argstr:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                args.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    tail = "".join(cur).strip()
    if tail or args:
        args.append(tail)
    return args


def rewrite_calls(sql: str, func: str, fn: Callable[[Sequence[str]], str]) -> str:
    """Replace every ``func(args...)`` call via ``fn(args) -> replacement``.

    Case-insensitive on the function name; arguments are recursively
    transpiled before the rule sees them (inner-out rewriting), so nested
    dialect calls like ``TO_CHAR(ADD_DAYS(d, 1))`` resolve fully.
    """
    pat = re.compile(rf"(?i)(?<![\w.]){re.escape(func)}\s*\(")
    out = sql
    pos = 0
    while True:
        m = pat.search(out, pos)
        if not m:
            return out
        open_idx = out.index("(", m.end() - 1)
        end = _scan_balanced(out, open_idx)
        args = _split_args(out[open_idx + 1 : end - 1])
        args = [rewrite_calls(a, func, fn) for a in args]
        replacement = fn(args)
        out = out[: m.start()] + replacement + out[end:]
        pos = m.start() + len(replacement)


# ---------------------------------------------------------------------------
# format-token translation (Oracle/HANA and strftime -> java.time patterns)

_ORACLE_FMT = [
    ("YYYY", "yyyy"),
    ("YY", "yy"),
    ("MON", "MMM"),
    ("MM", "MM"),
    ("DD", "dd"),
    ("HH24", "HH"),
    ("HH12", "hh"),
    ("HH", "HH"),
    ("MI", "mm"),
    ("SS", "ss"),
]

_STRFTIME_FMT = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%j": "DDD",
    "%w": "e",
}


def oracle_fmt_to_spark(fmt: str) -> str:
    out = fmt
    for src, dst in _ORACLE_FMT:
        out = re.sub(src, dst, out, flags=re.IGNORECASE)
    return out


def strftime_fmt_to_spark(fmt: str) -> str:
    out = fmt
    for src, dst in _STRFTIME_FMT.items():
        out = out.replace(src, dst)
    return out


# ---------------------------------------------------------------------------
# per-function rules (SURVEY §2.6 rows)


def _to_char(args: Sequence[str]) -> str:
    if len(args) == 1:
        return f"CAST({args[0]} AS STRING)"
    fmt = oracle_fmt_to_spark(args[1].strip().strip("'"))
    return f"date_format({args[0]}, '{fmt}')"


def _to_date(args: Sequence[str]) -> str:
    if len(args) == 1:
        return f"to_date({args[0]})"
    fmt = oracle_fmt_to_spark(args[1].strip().strip("'"))
    return f"to_date({args[0]}, '{fmt}')"


def _strftime(args: Sequence[str]) -> str:
    fmt = strftime_fmt_to_spark(args[0].strip().strip("'"))
    expr = args[1] if len(args) > 1 else "current_date()"
    if expr.strip().strip("'").lower() == "now":
        expr = "current_date()"
    return f"date_format({expr}, '{fmt}')"


_SQLITE_DATE_MOD = re.compile(r"(?i)^'\s*([+-]?\d+)\s+(day|days|month|months|year|years)\s*'$")


def _sqlite_date(args: Sequence[str]) -> str:
    """SQLite ``date(expr[, modifier…])`` — emitted by reference templates
    (``date('now')``, ``date('now','-30 days')``, ``'start of month'``)."""
    expr = args[0].strip()
    if expr.strip("'").lower() == "now":
        expr = "current_date()"
    else:
        expr = f"CAST({expr} AS DATE)"
    for mod in args[1:]:
        mod_s = mod.strip()
        m = _SQLITE_DATE_MOD.match(mod_s)
        if m:
            n, unit = int(m.group(1)), m.group(2).lower()
            if unit.startswith("day"):
                expr = f"date_add({expr}, {n})"
            elif unit.startswith("month"):
                expr = f"add_months({expr}, {n})"
            else:
                expr = f"add_months({expr}, {12 * n})"
        elif mod_s.strip("'").lower() == "start of month":
            expr = f"trunc({expr}, 'MM')"
        elif mod_s.strip("'").lower() == "start of year":
            expr = f"trunc({expr}, 'YYYY')"
        else:
            raise ValueError(f"unsupported date() modifier: {mod_s}")
    return expr


def _datediff(args: Sequence[str]) -> str:
    if len(args) == 3:
        part = args[0].strip().strip("'").lower()
        start, end = args[1], args[2]
        if part in ("day", "dd", "d"):
            return f"datediff({end}, {start})"
        if part in ("month", "mm", "m"):
            return f"CAST(months_between({end}, {start}) AS INT)"
        if part in ("year", "yyyy", "yy"):
            return f"(year({end}) - year({start}))"
        raise ValueError(f"unsupported DATEDIFF part: {part}")
    return f"datediff({args[0]}, {args[1]})"


def _trunc(args: Sequence[str]) -> str:
    if len(args) == 1:
        return f"trunc({args[0]}, 'DD')"
    fmt = args[1].strip().strip("'").upper()
    fmt = {"MONTH": "MM", "MON": "MM", "YEAR": "YYYY", "YY": "YYYY"}.get(fmt, fmt)
    return f"trunc({args[0]}, '{fmt}')"


FUNCTION_RULES: dict[str, Callable[[Sequence[str]], str]] = {
    # HANA / Oracle scalar functions (reference rewrite rules :1022-1157)
    "TO_VARCHAR": _to_char,
    "TO_CHAR": _to_char,
    "TO_DATE": _to_date,
    "TO_NUMBER": lambda a: f"CAST({a[0]} AS DOUBLE)",
    "TO_DECIMAL": lambda a: f"CAST({a[0]} AS DECIMAL(18,2))" if len(a) == 1
    else f"CAST({a[0]} AS DECIMAL({a[1]},{a[2] if len(a) > 2 else 0}))",
    "TO_INTEGER": lambda a: f"CAST({a[0]} AS INT)",
    "TO_INT": lambda a: f"CAST({a[0]} AS INT)",
    "ADD_DAYS": lambda a: f"date_add({a[0]}, {a[1]})",
    "DAYS_BETWEEN": lambda a: f"datediff({a[1]}, {a[0]})",
    "MONTHS_BETWEEN": lambda a: f"months_between({a[1]}, {a[0]})",
    "SECONDS_BETWEEN": lambda a: f"(unix_timestamp({a[1]}) - unix_timestamp({a[0]}))",
    "DATEDIFF": _datediff,
    "TRUNC": _trunc,
    # SQLite-isms emitted by the reference's own templates (SURVEY §2.6)
    "STRFTIME": _strftime,
    "DATE": _sqlite_date,
    "DATETIME": lambda a: "current_timestamp()"
    if a and a[0].strip().strip("'").lower() == "now"
    else f"CAST({a[0]} AS TIMESTAMP)",
    "PRINTF": lambda a: f"format_string({', '.join(a)})",
    "IFNULL": lambda a: f"coalesce({', '.join(a)})",
    "NVL": lambda a: f"coalesce({', '.join(a)})",
}

# DATE '2024-01-01' literals must not be treated as a DATE( call; protect them
_DATE_LITERAL = re.compile(r"(?i)\b(DATE|TIMESTAMP)\s+'")


# ---------------------------------------------------------------------------
# statement-level rewrites


def _rewrite_top(sql: str) -> str:
    """``SELECT TOP n …`` -> ``SELECT … LIMIT n`` (reference :1165-1171)."""
    m = re.match(r"(?is)^(\s*SELECT\s+)TOP\s+(\d+)\s+(.*)$", sql)
    if not m:
        return sql
    body = f"{m.group(1)}{m.group(3)}"
    return f"{body.rstrip()} LIMIT {m.group(2)}"


def _rewrite_fetch_first(sql: str) -> str:
    return re.sub(
        r"(?is)\bFETCH\s+FIRST\s+(\d+)\s+ROWS?\s+ONLY\b", r"LIMIT \1", sql
    )


def _rewrite_rownum(sql: str) -> str:
    """``WHERE ROWNUM <= n`` -> trailing LIMIT (reference :1178-1179)."""
    m = re.search(r"(?is)\bROWNUM\s*<=?\s*(\d+)", sql)
    if not m:
        return sql
    n = m.group(1)
    sql = re.sub(r"(?is)\s+(AND|WHERE)\s+ROWNUM\s*<=?\s*\d+", "", sql)
    sql = re.sub(r"(?is)\bROWNUM\s*<=?\s*\d+\s+(AND)\s+", "", sql)
    return f"{sql.rstrip()} LIMIT {n}"


def _rewrite_julianday(sql: str) -> str:
    """``julianday(a) - julianday(b)`` -> ``datediff(a, b)`` (36 template uses)."""
    pat = re.compile(r"(?i)\bjulianday\s*\(")
    while True:
        m = pat.search(sql)
        if not m:
            return sql
        open1 = sql.index("(", m.start())
        end1 = _scan_balanced(sql, open1)
        a = sql[open1 + 1 : end1 - 1]
        rest = sql[end1:]
        m2 = re.match(r"(?is)\s*-\s*julianday\s*\(", rest)
        if m2:
            open2 = end1 + rest.index("(")
            end2 = _scan_balanced(sql, open2)
            b = sql[open2 + 1 : end2 - 1]
            sql = f"{sql[:m.start()]}datediff({a}, {b}){sql[end2:]}"
        else:
            # lone julianday(x): days since epoch as a comparable number
            sql = f"{sql[:m.start()]}(datediff({a}, DATE '1970-01-01') + 2440587.5){sql[end1:]}"


def _rewrite_not_in_subquery(sql: str) -> str:
    """NULL-safe ``X NOT IN (SELECT col FROM …)`` -> ``NOT EXISTS`` —
    SURVEY §4 item 4: Spark's NOT IN yields empty results when the subquery
    produces a NULL; the reference's pipeline templates (:7774) rely on the
    SQLite behavior, so the engine rewrites rather than documents."""
    pat = re.compile(r"(?i)([A-Za-z_][\w.]*)\s+NOT\s+IN\s*\(\s*(SELECT\b)", re.S)
    while True:
        m = pat.search(sql)
        if not m:
            return sql
        lhs = m.group(1)
        open_idx = sql.index("(", m.end(1))
        end = _scan_balanced(sql, open_idx)
        sub = sql[open_idx + 1 : end - 1].strip()
        sm = re.match(r"(?is)^SELECT\s+(?:DISTINCT\s+)?(.+?)\s+FROM\s+(.+)$", sub)
        if not sm:
            return sql  # exotic shape: leave for Spark to reject loudly
        col, tail = sm.group(1).strip(), sm.group(2).strip()
        # Wrap the subquery and rename its output to a reserved name so the
        # correlation predicate can never self-resolve inside the subquery
        # (e.g. ``LIFNR NOT IN (SELECT LIFNR FROM u)`` must correlate the
        # OUTER LIFNR, not u.LIFNR = u.LIFNR).
        new_sub = (
            f"SELECT 1 FROM (SELECT {col} AS __anti_key FROM {tail}) __anti_sq "
            f"WHERE __anti_sq.__anti_key = {lhs}"
        )
        sql = f"{sql[:m.start()]}NOT EXISTS ({new_sub}){sql[end:]}"


_EXISTS_JOIN = re.compile(
    r"(?i)\b(LEFT\s+(?:OUTER\s+)?JOIN|INNER\s+JOIN|JOIN)\s+"
    r"([A-Za-z_]\w*)\s+([A-Za-z_]\w*)\s+ON\s+"
    r"(?:([^()]*?)\s+OR\s+)?EXISTS\s*\("
)
_EXISTS_BODY = re.compile(
    r"(?is)^\s*SELECT\s+1\s+FROM\s+([A-Za-z_]\w*)\s+([A-Za-z_]\w*)\s+WHERE\s+"
    r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s+AND\s+"
    r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$"
)


def _rewrite_exists_join(sql: str) -> str:
    """``JOIN T b ON [pre OR] EXISTS (SELECT 1 FROM L f WHERE f.c1 = x.cX
    AND f.c2 = b.cB)`` — SQLite executes correlated EXISTS in a join
    predicate referencing both join inputs; Spark rejects it
    (UNSUPPORTED_CORRELATED_EXPRESSION_IN_JOIN_CONDITION). The reference's
    document-flow templates (sap_semantic_model.json:7787) use exactly this
    idiom via the VBFA link table. Relational rewrite: pre-join the link
    table into the right side and equi-join on the surfaced link column::

        JOIN (SELECT DISTINCT __t.*, f.c1 AS __lnkN FROM T __t
              JOIN L f ON f.c2 = __t.cB) b
          ON [pre OR] b.__lnkN = x.cX

    DISTINCT keeps multiplicity identical to EXISTS (one joined row per
    (b-row, link-value) pair)."""
    n = 0
    pos = 0
    while True:
        m = _EXISTS_JOIN.search(sql, pos)
        if m is None:
            return sql
        join_kw, tbl, alias, pre = m.group(1), m.group(2), m.group(3), m.group(4)
        # the optional pre-condition must stay inside the ON clause — if the
        # lazy match swallowed a clause keyword, this is WHERE-level EXISTS
        if pre and re.search(r"(?i)\b(WHERE|GROUP|ORDER|HAVING|UNION|JOIN)\b", pre):
            # false match (pre spilled over a clause boundary) — retry from
            # just past this JOIN keyword so a later-starting true match on
            # the same EXISTS is still found
            pos = m.start() + 1
            continue
        open_idx = sql.rindex("(", 0, m.end())
        end = _scan_balanced(sql, open_idx)
        body = sql[open_idx + 1 : end - 1]
        bm = _EXISTS_BODY.match(body)
        if bm is None:
            return sql  # exotic shape — let Spark report it
        link_tbl, f = bm.group(1), bm.group(2)
        eqs = [
            (bm.group(3), bm.group(4), bm.group(5), bm.group(6)),
            (bm.group(7), bm.group(8), bm.group(9), bm.group(10)),
        ]
        # each equality is f.<fc> = <other>.<oc> in either order
        def norm(eq):
            a, ac, b, bc = eq
            if a == f:
                return ac, b, bc
            if b == f:
                return bc, a, ac
            return None
        sides = [norm(e) for e in eqs]
        if None in sides:
            return sql
        alias_side = next((s for s in sides if s[1] == alias), None)
        outer_side = next((s for s in sides if s[1] != alias), None)
        if alias_side is None or outer_side is None:
            return sql
        fc_alias, _, alias_col = alias_side
        fc_outer, outer_tbl, outer_col = outer_side
        lnk = f"__lnk{n}"
        n += 1
        sub = (
            f"(SELECT DISTINCT __t.*, {f}.{fc_outer} AS {lnk} "
            f"FROM {tbl} __t JOIN {link_tbl} {f} ON {f}.{fc_alias} = __t.{alias_col})"
        )
        cond = f"{alias}.{lnk} = {outer_tbl}.{outer_col}"
        if pre:
            cond = f"{pre} OR {cond}"
        sql = f"{sql[:m.start()]}{join_kw} {sub} {alias} ON {cond}{sql[end:]}"


# Columns where the reference's data uses '' and NULL interchangeably as the
# "open item" sentinel (SURVEY §1.3; reference expand_sap_test_db.py:162,:764).
EMPTY_AS_NULL_COLUMNS = ("AUGDT", "AUGBL")


def _rewrite_open_item_sentinels(sql: str, columns: Sequence[str]) -> str:
    for col in columns:
        sql = re.sub(
            rf"(?i)((?:[A-Za-z_][\w]*\.)?{col})\s+IS\s+NOT\s+NULL",
            rf"(\1 IS NOT NULL AND \1 <> '')",
            sql,
        )
        sql = re.sub(
            rf"(?i)((?:[A-Za-z_][\w]*\.)?{col})\s+IS\s+NULL",
            rf"(\1 IS NULL OR \1 = '')",
            sql,
        )
    return sql


# ---------------------------------------------------------------------------
# entry point


def transpile(sql: str, empty_as_null: Sequence[str] = EMPTY_AS_NULL_COLUMNS) -> str:
    """Full pipeline: sanitize -> statement-level rewrites -> function rules.

    The output is Spark SQL; anything unknown passes through so Spark's
    parser/analyzer produces the error (log-and-extend posture, SURVEY §7
    risk list).
    """
    out = last_query_statement(sql)
    out = re.sub(r"(?i)\bSYSDATE\b", "current_timestamp()", out)
    out = _rewrite_top(out)
    out = _rewrite_fetch_first(out)
    out = _rewrite_rownum(out)
    out = _rewrite_julianday(out)
    out = _rewrite_exists_join(out)
    out = _rewrite_not_in_subquery(out)
    out = _rewrite_open_item_sentinels(out, empty_as_null)

    # protect DATE/TIMESTAMP literals from the DATE() function rule
    literals: list[str] = []

    def protect(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00LIT{len(literals) - 1}\x00"

    out = re.sub(r"(?i)\b(DATE|TIMESTAMP)\s+'[^']*'", protect, out)
    for func, rule in FUNCTION_RULES.items():
        out = rewrite_calls(out, func, rule)
    out = re.sub(r"\x00LIT(\d+)\x00", lambda m: literals[int(m.group(1))], out)
    return re.sub(r"\s+", " ", out).strip()
