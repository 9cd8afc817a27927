"""Result post-processing — the reference UI's client-side operators as
engine utilities (SURVEY §2.11 C2-C4, §2.1 S5-S8).

All functions operate on the executor's result contract
``{columns, column_types, rows, ...}`` — i.e. on the row-capped,
driver-side result, exactly like the reference does client-side
(``sap_sql_ui.html:2405`` format detection, ``:2708`` chart inference,
``:2590/:2621/:2663`` CSV/Excel/TSV export). For full-table exports at
scale, ``write_csv`` writes distributed from the DataFrame instead of
funnelling 100 TB through the driver.
"""

from __future__ import annotations

import csv
import html
import io
import re

from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# C2: column format detection (name-token heuristics)
# ---------------------------------------------------------------------------

# columns that look numeric but are identifiers/codes — never currency
ID_COLUMNS = frozenset(
    """belnr bukrs gjahr buzei lifnr kunnr matnr ebeln ebelp vbeln sakn r
    saknr kostl aufnr pernr objnr werks lgort spras waers banfn bnfpo
    doc_id event_id user_id session_id l_orderkey o_orderkey c_custkey
    s_suppkey p_partkey n_nationkey r_regionkey""".split()
)
CURRENCY_TOKENS = frozenset(
    """amount amt dmbtr wrbtr netwr brtwr hsl wkg spend revenue price
    balance payroll salary wage value total_value total_spend""".split()
)
NON_CURRENCY_TOKENS = frozenset(
    """center element count cnt qty quantity num number id key code flag
    date year month period pct percent ratio rate score""".split()
)
COUNT_TOKENS = frozenset("count cnt num qty quantity headcount".split())
_DATE_NAME_RX = re.compile(r"(?i)date|_dt$|budat|augdt|bldat|cpudt")


def _col_tokens(name: str) -> list[str]:
    return re.split(r"[^a-z0-9]+", name.lower())


def detect_col_format(name: str) -> str:
    """'currency' | 'count' | 'date' | 'none' from the column name alone
    (same signal set as the reference; value sampling happens in
    ``infer_chart``)."""
    if name.lower() in ID_COLUMNS:
        return "none"
    toks = _col_tokens(name)
    if _DATE_NAME_RX.search(name):
        return "date"
    if any(t in COUNT_TOKENS for t in toks):
        return "count"
    if any(t in NON_CURRENCY_TOKENS for t in toks):
        return "none"
    if any(t in CURRENCY_TOKENS for t in toks):
        return "currency"
    return "none"


def format_cell(v, fmt: str) -> str:
    """Display formatting per detected format (reference ``:2419``)."""
    if v is None:
        return "NULL"
    if fmt == "currency":
        try:
            return f"${float(v):,.2f}"
        except (TypeError, ValueError):
            pass
    if fmt == "count":
        try:
            return f"{int(v):,}"
        except (TypeError, ValueError):
            pass
    return str(v)


# ---------------------------------------------------------------------------
# C4: chart-type inference
# ---------------------------------------------------------------------------

_DATEISH_RX = re.compile(
    r"^\d{4}[-/]\d{1,2}([-/]\d{1,2})?$|^\d{1,2}[-/]\d{1,2}[-/]\d{2,4}$"
    r"|Q[1-4]\s*\d{4}|^\d{4}\s*Q[1-4]"
    r"|^(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)",
    re.IGNORECASE,
)
_TIME_NAME_RX = re.compile(r"(?i)year|month|quarter|week|date|period|day|time|fiscal")


def infer_chart(result: dict) -> dict | None:
    """Suggest chart types for a result set (reference ``:2708-2800``):
    time-like label → line; ≤8 categories + one measure → bar/pie; many
    categories or multiple measures → bar/line. None when nothing numeric."""
    columns, rows = result.get("columns") or [], result.get("rows") or []
    if not columns or not rows:
        return None
    n = len(rows)
    info = []
    for ci, name in enumerate(columns):
        numeric = dateish = 0
        uniq = set()
        for row in rows:
            v = row[ci]
            if v is None:
                continue
            sv = str(v).strip()
            uniq.add(sv)
            if _DATEISH_RX.search(sv):
                dateish += 1
            elif isinstance(v, (int, float)) or re.fullmatch(r"[\d,.+$-]+", sv):
                numeric += 1
        kind = (
            "numeric"
            if numeric > n * 0.7
            else ("date" if dateish > n * 0.5 else "string")
        )
        info.append({"name": name, "index": ci, "type": kind, "unique": len(uniq)})

    value_cols = [c for c in info if c["type"] == "numeric"]
    label_cols = [c for c in info if c["type"] != "numeric"]
    if not value_cols:
        return None

    label = None
    if label_cols:
        dated = [c for c in label_cols if c["type"] == "date"]
        named = [c for c in label_cols if _TIME_NAME_RX.search(c["name"])]
        label = (dated or named or [max(label_cols, key=lambda c: c["unique"])])[0]

    time_axis = label is not None and (
        label["type"] == "date" or _TIME_NAME_RX.search(label["name"])
    )
    if time_axis:
        types = ["line", "bar"]
    elif label and label["unique"] <= 8 and len(value_cols) == 1:
        types = ["bar", "pie"]
    elif label and label["unique"] > 15:
        types = ["bar", "line"]
    else:
        types = ["bar", "line", "pie"]
    if len(value_cols) > 1:
        types = ["bar", "line"]
    elif 2 <= n <= 10 and "pie" not in types:
        types.append("pie")

    return {
        "label_col": label["name"] if label else None,
        "value_cols": [c["name"] for c in value_cols],
        "suggested_types": types,
        "default_type": types[0],
    }


# ---------------------------------------------------------------------------
# S5-S8: result sinks
# ---------------------------------------------------------------------------


def to_csv(result: dict, sep: str = ",") -> str:
    """CSV/TSV text of a capped result (reference client-side writers
    ``sap_sql_ui.html:2590/:2663``)."""
    buf = io.StringIO()
    w = csv.writer(buf, delimiter=sep, lineterminator="\n")
    w.writerow(result["columns"])
    w.writerows(result["rows"])
    return buf.getvalue()


def to_tsv(result: dict) -> str:
    return to_csv(result, sep="\t")


def to_excel_html(result: dict, title: str = "results") -> str:
    """Excel-compatible HTML table — the reference's .xls export is an HTML
    table with an Excel content hint (``sap_sql_ui.html:2621``)."""
    head = "".join(f"<th>{html.escape(str(c))}</th>" for c in result["columns"])
    body = "".join(
        "<tr>"
        + "".join(
            f"<td>{'' if v is None else html.escape(str(v))}</td>" for v in row
        )
        + "</tr>"
        for row in result["rows"]
    )
    return (
        f"<html><head><meta charset='utf-8'><title>{html.escape(title)}</title>"
        f"</head><body><table><thead><tr>{head}</tr></thead>"
        f"<tbody>{body}</tbody></table></body></html>"
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """Distributed full-result export — the scale path the reference lacks
    (its export funnels everything through the browser)."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)
