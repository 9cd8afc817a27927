"""Column-level lineage from the ANALYZED logical plan.

For every output column of a query, the set of base-relation columns that
feed it — the metadata the catalog/KG surface serves next to join-path
discovery (reference parity: the reference's KG answers "which tables
join"; lineage answers "which stored columns produced this result
column", the audit/impact-analysis question).

Implementation is a structural py4j walk of the analyzed plan — the same
zero-``toString()`` policy as ``plans/governance.py``: attribute identity
flows through Catalyst ``exprId``s, Project/Aggregate nodes map their
named expressions to the union of the base columns their attribute
references resolve to, and relation leaves seed the environment with
``(source, column)`` pairs. Pure plan metadata: no job runs, so lineage
of a petabyte query costs milliseconds.

Known limit (documented, tested): expressions fed ONLY by a subquery
expression (scalar subquery / EXISTS) report the outer references they
also touch; the subquery's internal columns are not attributed. Join,
filter, window, set-op, and CTE lineage resolve fully.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _attr_refs(expr) -> list:
    """Every AttributeReference in an expression tree (py4j TreeNode)."""
    out = []
    if expr.getClass().getSimpleName() == "AttributeReference":
        out.append(expr)
    kids = expr.children()
    for i in range(kids.size()):
        out.extend(_attr_refs(kids.apply(i)))
    return out


def _leaf_source_name(node) -> str:
    """Best-effort base-relation name for a leaf node: parquet path basename
    for file relations, the node name otherwise."""
    try:
        paths = node.relation().location().rootPaths()
        if paths.size() > 0:
            base = os.path.basename(paths.apply(0).toString().rstrip("/"))
            return base[:-8] if base.endswith(".parquet") else base
    except Exception:
        pass
    return node.nodeName().lower()


def _walk(node, env: dict, named: set) -> None:
    """Post-order: populate env[exprId] = set[(source, column)]. ``named``
    tracks exprIds already christened by their INNERMOST SubqueryAlias (the
    view/relation name) so outer table aliases (``FROM orders a``) don't
    re-name them."""
    name = node.nodeName()
    kids = node.children()
    for i in range(kids.size()):
        _walk(kids.apply(i), env, named)
    if name in ("Project", "Aggregate", "Window"):
        exprs = (
            node.projectList()
            if name == "Project"
            else node.aggregateExpressions()
            if name == "Aggregate"
            else node.windowExpressions()
        )
        for i in range(exprs.size()):
            ne = exprs.apply(i)
            try:
                eid = ne.exprId().id()
            except Exception:
                continue  # not a NamedExpression (defensive)
            srcs: set = set()
            for ref in _attr_refs(ne):
                srcs |= env.get(ref.exprId().id(), set())
            # a pass-through AttributeReference keeps its existing mapping
            if ne.getClass().getSimpleName() != "AttributeReference" or eid not in env:
                env[eid] = srcs
    elif name == "SubqueryAlias":
        alias = node.alias()
        outs = node.output()
        for i in range(outs.size()):
            a = outs.apply(i)
            eid = a.exprId().id()
            cur = env.get(eid)
            if eid in named:
                continue  # innermost alias already named this column
            # prefer the view/alias name over a file-path leaf name, but only
            # for pass-through columns (a computed subquery keeps its real
            # base lineage — the alias is a derivation, not a source)
            if cur is not None and len(cur) == 1:
                (src, col) = next(iter(cur))
                if col == a.name() and "." not in src:
                    env[eid] = {(alias, a.name())}
                    named.add(eid)
            elif cur is None:
                env[eid] = {(alias, a.name())}
                named.add(eid)
    elif kids.size() == 0:
        src = _leaf_source_name(node)
        outs = node.output()
        for i in range(outs.size()):
            a = outs.apply(i)
            env.setdefault(a.exprId().id(), {(src, a.name())})


def column_lineage(df: DataFrame) -> dict[str, list[str]]:
    """Map each output column of ``df`` to the sorted base columns feeding
    it, rendered ``source.column``. Empty list = constant/derived-only."""
    plan = df._jdf.queryExecution().analyzed()
    env: dict = {}
    _walk(plan, env, set())
    out: dict[str, list[str]] = {}
    outs = plan.output()
    for i in range(outs.size()):
        a = outs.apply(i)
        srcs = env.get(a.exprId().id(), set())
        out[a.name()] = sorted(f"{s}.{c}" for s, c in srcs)
    return out
