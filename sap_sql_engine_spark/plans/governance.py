"""PII governance gate — plan-level enforcement.

Reproduces the block/allow matrix of the reference's hard-coded gate
(reference ``sap_sql_engine.py:1202-1259``):

1. queries touching HR/Payroll/Benefits tables must aggregate (GROUP BY),
2. must use at least one aggregate function (COUNT/SUM/AVG/MIN/MAX),
3. must not expose PII identifier columns outside aggregate functions.

Unlike the reference (substring scan over SQL text — a table name inside a
string literal or a view indirection defeats it), this gate walks the
*analyzed logical plan*: relations are found as SubqueryAlias/relation nodes
after view resolution, the GROUP BY requirement is "every PII relation sits
under an Aggregate with non-empty grouping", and identifier exposure is
checked against the plan's output attributes. SURVEY §2.8 G1-G5.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

PII_TABLES = frozenset(
    {
        "PA0001", "PA0002", "PA0006", "PA0008", "PA0014",
        "PA0167", "PA0168", "PA0169",
        "HRPY_RGDIR", "T511", "T512T",
    }
)

PII_COLUMNS = frozenset({"PERNR", "ENAME", "NACHN", "VORNA", "GBDAT", "PERID"})

# the reference's allowed aggregate vocabulary (sap_sql_engine.py:1202-1259);
# anything else (collect_list, first, ...) can reconstruct row-level data and
# therefore does NOT satisfy the "must aggregate" requirement
_ALLOWED_AGG_FNS = frozenset({"count", "sum", "avg", "min", "max"})


def _has_allowed_agg(expr) -> bool:
    """Walk a Catalyst *expression* tree (py4j TreeNode) looking for an
    ``AggregateExpression`` whose function is one of the allowed five.
    Structural — no plan-printer ``toString()`` parsing, so Spark changing
    its plan text format can't silently disable the gate."""
    if expr.getClass().getSimpleName() == "AggregateExpression":
        try:
            return expr.aggregateFunction().prettyName().lower() in _ALLOWED_AGG_FNS
        except Exception:
            # unknown shape: it IS an aggregate — err on the permissive side
            # for this sub-check (column exposure is checked separately)
            return True
    kids = expr.children()
    return any(_has_allowed_agg(kids.apply(i)) for i in range(kids.size()))


@dataclass
class GovernanceBlock:
    """Typed block result — the server surfaces this as
    ``{governance_block: true, type, message}`` (reference
    ``sap_sql_engine.py:1592-1604``)."""

    type: str
    message: str


def _pii_attrs_in(expr) -> set[str]:
    """PII identifier columns referenced anywhere in an expression tree."""
    found: set[str] = set()
    if expr.getClass().getSimpleName() == "AttributeReference":
        if expr.name().upper() in PII_COLUMNS:
            found.add(expr.name().upper())
    kids = expr.children()
    for i in range(kids.size()):
        found |= _pii_attrs_in(kids.apply(i))
    return found


def _walk(node, under_grouped_agg: bool, state: dict) -> bool:
    """Returns True when the subtree contains a PII relation."""
    name = node.nodeName()
    grouped = False
    if name == "Aggregate":
        try:
            grouped = node.groupingExpressions().size() > 0
        except Exception:
            grouped = False
        if grouped:
            under_grouped_agg = True
        if not state["has_agg_function"]:
            aggs = node.aggregateExpressions()
            if any(_has_allowed_agg(aggs.apply(i)) for i in range(aggs.size())):
                state["has_agg_function"] = True
    if name == "SubqueryAlias":
        try:
            alias = node.alias().upper()
        except Exception:
            alias = ""
        if alias in PII_TABLES:
            state["touched"].add(alias)
            if not under_grouped_agg:
                state["unaggregated"].add(alias)
            return True  # leaf-ish: relation subtree below carries no more info
    has_pii = False
    children = node.children()
    for i in range(children.size()):
        has_pii |= _walk(children.apply(i), under_grouped_agg, state)
    # subquery expressions (scalar subqueries, EXISTS) hang off expressions,
    # not children; innerChildren covers them in Catalyst's tree API
    inner = node.innerChildren()
    for i in range(inner.size()):
        has_pii |= _walk(inner.apply(i), under_grouped_agg, state)
    if name == "Aggregate" and grouped and has_pii:
        # grouping BY an identifier makes every group one individual — that
        # defeats aggregation even when the output is aliased (`PERNR AS
        # eid`), which the output-name check below can't see. Structural:
        # walk the grouping expression trees for PII attribute references.
        ges = node.groupingExpressions()
        for i in range(ges.size()):
            state["pii_grouped"] |= _pii_attrs_in(ges.apply(i))
    return has_pii


def masked(df: DataFrame, salt: str = "") -> DataFrame:
    """The ALLOW-path complement to :func:`check`: a view of ``df`` with
    every PII identifier column replaced by a salted SHA-256 pseudonym
    (joinable — the same person maps to the same token across tables under
    one salt — but not reversible without it). Row-level analytics that
    :func:`check` would block become possible on the masked view: the gate
    blocks raw access, this grants de-identified access, the standard
    two-tier governance posture.

    Columns are matched case-insensitively against ``PII_COLUMNS``; non-PII
    columns pass through untouched. Masking is a pure projection — zero
    shuffles, pushdown-transparent for every non-masked column."""
    from pyspark.sql import functions as F

    cols = []
    for c in df.schema.names:
        if c.upper() in PII_COLUMNS:
            cols.append(
                F.sha2(F.concat_ws("|", F.lit(salt), F.col(c).cast("string")), 256)
                .alias(c)
            )
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def check(df: DataFrame) -> GovernanceBlock | None:
    """Gate a DataFrame before execution. Returns None when safe."""
    plan = df._jdf.queryExecution().analyzed()
    state: dict = {
        "touched": set(),
        "unaggregated": set(),
        "has_agg_function": False,
        "pii_grouped": set(),
    }
    _walk(plan, False, state)

    touched = sorted(state["touched"])
    if not touched:
        return None

    if state["unaggregated"]:
        return GovernanceBlock(
            type="missing_group_by",
            message=(
                "PII Protection: queries against HR / Payroll / Benefits tables "
                f"({', '.join(touched)}) must aggregate results with GROUP BY. "
                "Individual employee data cannot be returned. Try an aggregate "
                "query such as headcount by org unit or average salary by "
                "department."
            ),
        )

    if not state["has_agg_function"]:
        return GovernanceBlock(
            type="missing_aggregate_function",
            message=(
                "PII Protection: queries against HR / Payroll / Benefits tables "
                f"({', '.join(touched)}) must use aggregate functions "
                "(COUNT, SUM, AVG, MIN, MAX) in the SELECT clause. "
                "Individual employee data cannot be returned."
            ),
        )

    exposed = sorted(
        set(c.upper() for c in df.schema.names if c.upper() in PII_COLUMNS)
        | state["pii_grouped"]
    )
    if exposed:
        return GovernanceBlock(
            type="pii_column_exposed",
            message=(
                "PII Protection: the SELECT clause includes personally "
                f"identifiable columns ({', '.join(exposed)}). Queries against "
                "HR / Payroll / Benefits tables must not return individual "
                "employee identifiers. Use GROUP BY on organizational "
                "attributes and aggregate functions instead."
            ),
        )

    return None
