"""NL orchestration layer — the shell around ``spark.sql``.

Re-expresses the reference's NL→SQL control flow (SURVEY §2.9 K6/K7, §2.11
C1, §3.1 lifecycle) as a deterministic, LLM-optional pipeline:

- ``detect_modules``      keyword-RAG module filtering (reference
                          ``sap_sql_engine.py:105-190``) — context pruning so
                          the generation prompt only carries relevant schemas.
- ``extract_catalog``     BOKG catalog of business questions + patterns
                          (reference ``sap_sql_engine.py:199-242``).
- ``classify``            intent classification returning the reference's
                          JSON contract (schema per ``sap_sql_engine.py:
                          262-292``). An LLM callable is pluggable; without
                          one, a deterministic scorer over the BOKG catalog
                          fills the same fields.
- ``build_system_prompt`` schema → prompt text, filtered per module
                          (reference ``sap_sql_engine.py:556-831``).
- ``extract_main_sql``    last ```sql fenced block from a markdown answer
                          (reference UI ``sap_sql_ui.html:2228``).
- ``answer``              end-to-end: classify → resolve a validated template
                          (template memoization, reference design doc §8.5)
                          → dialect transpile → governance → capped execute.

The reference needs two Anthropic round-trips per question; here the
validated-template path is fully deterministic and the LLM is only consulted
for questions outside the catalog (``llm=None`` surfaces suggestions
instead). Everything below is driver-side metadata work — the data plane
stays in Spark.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable

from pyspark.sql import SparkSession

from .plans import executor
from .sources.registry import SemanticModel

# ---------------------------------------------------------------------------
# K7: module keyword retrieval (RAG-lite context pruning)
# ---------------------------------------------------------------------------
# Scored with word-boundary regexes (the reference substring-matches, which
# needs hacks like "ap " with a trailing space and still false-positives
# inside words). Phrases may list alternatives separated by "|".

MODULE_KEYWORDS: dict[str, list[str]] = {
    "FI_GL": [
        "general ledger", "gl|g/l", "journal", "posting", "trial balance",
        "account balance", "chart of accounts", "fiscal year", "ledger",
        "period balance", "financial statement", "reconciliation",
        "depreciation", "asset", "bkpf", "bseg", "glt0", "ska1", "skat",
        "skb1", "anla", "faglflext",
    ],
    "FI_AP": [
        "accounts payable", "payable", "ap|a/p", "vendor", "supplier",
        "invoice", "payment", "aging", "overdue", "procure to pay",
        "vendor master", "lfa1", "bsik", "bsak", "rbkp", "rseg",
    ],
    "FI_AR": [
        "accounts receivable", "receivable", "ar|a/r", "customer",
        "collections", "credit memo", "customer balance", "customer master",
        "contact person", "kna1", "knb1", "knvk", "bsid", "bsad",
    ],
    "CO": [
        "controlling", "cost center", "cost element", "internal order",
        "actual vs plan", "plan vs actual", "budget", "variance", "overhead",
        "profit center", "csks", "cosp", "coss", "coep", "cobk", "aufk",
        "cepc",
    ],
    "MM": [
        "material", "purchase order", "purchase requisition", "requisition",
        "procurement", "inventory", "stock", "goods receipt", "warehouse",
        "storage location", "bill of material", "bom",
        "three way match|three-way match|3-way match", "mara", "makt", "marc",
        "mard", "mbew", "ekko", "ekpo", "eban", "ekbe",
    ],
    "SD": [
        "sales", "sales order", "delivery", "deliveries", "billing",
        "revenue", "backlog", "order to cash", "shipping", "vbak", "vbap",
        "likp", "lips", "vbrk", "vbrp", "vbfa",
    ],
    "PM": [
        "maintenance", "equipment", "work order", "breakdown", "preventive",
        "functional location", "notification", "afih", "afko", "afvc",
        "afru", "equi", "eqkt",
    ],
    "HR": [
        "human resources", "employee", "employees", "headcount", "personnel",
        "organizational unit", "org unit", "hire date", "employee group",
        "pa0001", "pa0002", "pa0006", "hrp1000",
    ],
    "PAY": [
        "payroll", "salary", "salaries", "wage", "wages", "compensation",
        "pay scale", "earnings", "hrpy_rgdir", "t511", "t512t",
    ],
    "BEN": [
        "benefit", "benefits", "enrollment", "health plan", "insurance",
        "savings plan", "pa0167", "pa0168", "pa0169",
    ],
}


def _phrase_rx(phrase: str) -> re.Pattern:
    # word-boundary match, tolerating a plural "s" ("vendors", "deliveries"
    # handled by listing both forms where -ies applies)
    alts = "|".join(re.escape(a) for a in phrase.split("|"))
    return re.compile(rf"(?<![a-z0-9])(?:{alts})s?(?![a-z0-9])")


_COMPILED = {
    mod: [_phrase_rx(p) for p in phrases] for mod, phrases in MODULE_KEYWORDS.items()
}


def detect_modules(question: str) -> list[str]:
    """Rank modules by keyword hits; all modules when nothing matches
    (same fallback the reference uses so generation never gets an empty
    schema)."""
    q = question.lower()
    scores = {
        mod: sum(1 for rx in rxs if rx.search(q)) for mod, rxs in _COMPILED.items()
    }
    ranked = [m for m, s in sorted(scores.items(), key=lambda kv: -kv[1]) if s > 0]
    return ranked or list(MODULE_KEYWORDS)


# ---------------------------------------------------------------------------
# K6: BOKG catalog extraction
# ---------------------------------------------------------------------------


def extract_catalog(model: SemanticModel) -> dict:
    """Business-question + pattern catalog used to ground classification."""
    questions = []
    modules: dict[str, dict] = {}
    for obj_name, obj in model.objects.items():
        mod = modules.setdefault(obj["module"], {"objects": {}})
        mod["objects"][obj_name] = {
            "description": obj["description"],
            "nl_aliases": obj["aliases"],
            "tables": obj["tables"],
            "business_questions": obj["questions"],
        }
        for q in obj["questions"]:
            questions.append(
                {"question": q, "module": obj["module"], "object": obj_name}
            )
    patterns = [
        {
            "name": name,
            "prompt": p.get("description") or name.replace("_", " "),
            "module": p.get("primary_module", ""),
            "tables": p.get("tables") or p.get("tables_used") or [],
        }
        for name, p in model.patterns.items()
    ]
    return {
        "modules": modules,
        "query_patterns": patterns,
        "all_business_questions": questions,
    }


# ---------------------------------------------------------------------------
# Intent classification (deterministic; LLM pluggable)
# ---------------------------------------------------------------------------

_STOP = frozenset(
    "a an and are by for from how in is me my of on or our show the to us we "
    "what which who with list all give".split()
)

_TIME_RX = re.compile(
    r"(?i)\b(last|past|previous)\s+\d*\s*(day|week|month|quarter|year)s?\b"
    r"|\b(19|20)\d{2}\b|\bytd\b|\byear.to.date\b|\bq[1-4]\b|\bthis (month|quarter|year)\b"
    r"|\bcurrent (month|quarter|year|fiscal)\b|\btoday\b|\bopen\b|\boverdue\b"
)
_METRIC_RX = re.compile(
    r"(?i)\b(total|sum|count|average|avg|balance|amount|spend|revenue|cost|value"
    r"|headcount|quantity|top|aging|variance|number of|how (many|much))\b"
)
_ENTITY_RX = re.compile(
    r"(?i)\b(vendor|supplier|customer|material|cost center|account|employee"
    r"|order|invoice|delivery|equipment|plant|company code|org(anizational)? unit)s?\b"
)
_SCOPE_RX = re.compile(r"(?i)\bcompany code\s*'?(\d{3,4})'?|\bplant\s*'?(\d{3,4})'?")
_FORMAT_RX = re.compile(r"(?i)\btop\s+\d+\b|\btrend\b|\bchart\b|\bby (month|week|quarter|year)\b")


def _tokens(s: str) -> set[str]:
    return {t for t in re.findall(r"[a-z0-9/]+", s.lower()) if t not in _STOP}


def _slot(rx: re.Pattern, q: str) -> dict:
    m = rx.search(q)
    if m:
        return {"value": m.group(0).strip(), "status": "filled"}
    return {"value": "", "status": "missing"}


_SLOT_QUESTIONS = {
    "time_period": {
        "question": "What time period are you interested in?",
        "options": ["Last 30 days", "Last quarter", "Year to date", "All history"],
    },
    "metric": {
        "question": "Which metric should I report?",
        "options": ["Total amount", "Count of documents", "Average value", "Open balance"],
    },
    "entity": {
        "question": "Which business entity is this about?",
        "options": ["Vendors", "Customers", "Materials", "Cost centers", "Employees"],
    },
}


def classify(
    question: str,
    model: SemanticModel,
    history: list | None = None,
    llm: Callable[[str, str], str] | None = None,
) -> dict:
    """Return the reference's classification JSON contract.

    With ``llm`` (a ``(system_prompt, user_text) -> str`` callable) the
    assessment is delegated and parsed with the reference's fence-stripping
    fallback; otherwise a deterministic scorer over the BOKG catalog
    produces the same fields.
    """
    catalog = extract_catalog(model)
    if llm is not None:
        sys_prompt = (
            "Classify the user's SAP question against this catalog and reply "
            "with the standard classification JSON only.\n"
            + json.dumps(catalog["all_business_questions"][:200])
        )
        user = "\n".join(
            [*(m.get("content", "") for m in (history or [])[-6:]), question]
        )
        raw = llm(sys_prompt, user).strip()
        if raw.startswith("```"):
            raw = raw.split("\n", 1)[1] if "\n" in raw else raw[3:]
            raw = raw.removesuffix("```")
        try:
            parsed = json.loads(raw)
            # C6 token accounting: an LLMClient-style callable exposes the
            # last call's usage (reference attaches _usage the same way,
            # sap_sql_engine.py:414-422)
            usage = getattr(llm, "last_usage", None)
            if isinstance(parsed, dict) and isinstance(usage, dict) and usage:
                parsed.setdefault("_usage", usage)
            return parsed
        except json.JSONDecodeError:
            pass  # fall through to the deterministic path

    q_tok = _tokens(question)
    scored = []
    for item in catalog["all_business_questions"] + [
        {"question": p["prompt"], "module": p["module"], "object": p.get("name", "")}
        for p in catalog["query_patterns"]
    ]:
        c_tok = _tokens(item["question"])
        if not c_tok:
            continue
        j = len(q_tok & c_tok) / len(q_tok | c_tok)
        if j > 0:
            scored.append((j, item))
    scored.sort(key=lambda t: (-t[0], t[1]["question"]))

    def quality(j: float) -> str:
        return "exact" if j >= 0.75 else ("close" if j >= 0.4 else "related")

    suggestions = [
        {
            "prompt": it["question"],
            "module": it["module"],
            "object": it["object"],
            "match_quality": quality(j),
        }
        for j, it in scored[:4]
    ]

    slots = {
        "metric": _slot(_METRIC_RX, question),
        "entity": _slot(_ENTITY_RX, question),
        "time_period": _slot(_TIME_RX, question),
        "scope": _slot(_SCOPE_RX, question),
        "output_format": _slot(_FORMAT_RX, question),
    }
    # scope / output_format have safe defaults (reference guideline: default
    # company 1000, plain table) — missing there never forces a round-trip
    required_missing = [
        s for s in ("metric", "entity") if slots[s]["status"] == "missing"
    ]
    best = scored[0][0] if scored else 0.0
    if best >= 0.6 and not required_missing:
        confidence = "high"
    elif best >= 0.25 or not required_missing:
        confidence = "medium"
    else:
        confidence = "low"

    modules = detect_modules(question)
    return {
        "confidence": confidence,
        "modules": modules[:3],
        "objects": sorted({s["object"] for s in suggestions if s["object"]}),
        "slots": slots,
        "interpretation": question.strip().rstrip("?"),
        "disambiguation_needed": confidence != "high",
        "disambiguation_reason": (
            f"missing {', '.join(required_missing)}" if required_missing else ""
        )
        if confidence != "high"
        else "",
        "suggestions": suggestions,
        "slot_questions": [
            {"slot": s, **_SLOT_QUESTIONS[s]}
            for s in required_missing
            if s in _SLOT_QUESTIONS
        ],
    }


# ---------------------------------------------------------------------------
# System-prompt construction (schema → LLM context, filtered per module)
# ---------------------------------------------------------------------------

_PROMPT_RULES = """\
You translate business questions into ANSI SQL over SAP ECC tables.
Use only the tables and columns listed below; join along the declared
relationships. Semantic rules of this dataset:
- dates are ISO 'YYYY-MM-DD' strings/dates; compare with >=/<= directly
- amounts (DMBTR etc.) are unsigned; sign by SHKZG: 'S' debit (+), 'H'
  credit (-) on FI line-item tables only (BSIK/BSAK/BSID/BSAD/BSEG/EKBE)
- open items: AUGDT IS NULL OR AUGDT = ''; cleared items have AUGDT set
- exclude deleted rows (LOEKZ = 'X') unless asked otherwise
- text tables are language-dependent: join with SPRAS = 'E'
- default company code 1000 when none is given
- employee/payroll/benefits tables are PII: aggregate-only, never return
  individual rows; refuse row-level requests and offer aggregates instead
Answer with a short explanation and ONE ```sql block.
"""


def build_system_prompt(model: SemanticModel, modules: list[str] | None = None) -> str:
    """Filtered schema text — only the requested modules' tables, their
    relationships, and their validated patterns (the reference's ~10× token
    cut, ``sap_sql_engine.py:371``)."""
    mods = set(modules or model.modules())
    parts = [_PROMPT_RULES]
    for t in sorted(model.tables.values(), key=lambda t: (t.module, t.name)):
        if t.module not in mods:
            continue
        cols = ", ".join(f"{c['column']} {c.get('type', '')}".strip() for c in t.columns)
        pk = f" PK({', '.join(t.primary_key)})" if t.primary_key else ""
        parts.append(f"TABLE {t.name} [{t.module}/{t.business_object}]{pk}: {cols}")
    rels = [
        r
        for r in model.relationships
        if model.tables.get(r.get("from_table"), None) is not None
        and model.tables[r["from_table"]].module in mods
    ]
    if rels:
        parts.append("\nJOINS:")
        parts.extend(
            f"- {r['from_table']} -> {r.get('to_table')}: {r.get('join_condition', '')}"
            for r in rels
        )
    pats = [
        p
        for p in model.patterns.values()
        if not modules or p.get("primary_module", "") in mods
    ]
    if pats:
        parts.append("\nVALIDATED PATTERNS (reuse verbatim when they fit):")
        for p in pats:
            sql = (p.get("example_sql_structure") or "").strip()
            if sql:
                parts.append(f"-- {p.get('description', '')}\n{sql}")
    return "\n".join(parts)


# ---------------------------------------------------------------------------
# C1: SQL extraction from a markdown answer
# ---------------------------------------------------------------------------

_FENCE_RX = re.compile(r"```(sql)?\s*\n(.*?)```", re.DOTALL | re.IGNORECASE)


def extract_main_sql(markdown: str) -> str | None:
    """Last ```sql fenced block; falls back to the last unlabeled fence that
    parses as a query (the reference UI keeps the final block because LLMs
    often show drafts first, ``sap_sql_ui.html:2228``)."""
    sql_blocks = [
        m.group(2).strip()
        for m in _FENCE_RX.finditer(markdown)
        if (m.group(1) or "").lower() == "sql"
    ]
    if sql_blocks:
        return sql_blocks[-1]
    for m in reversed(list(_FENCE_RX.finditer(markdown))):
        body = m.group(2).strip()
        if re.match(r"(?is)^\s*(select|with)\b", body):
            return body
    return None


# ---------------------------------------------------------------------------
# End-to-end answer pipeline
# ---------------------------------------------------------------------------


# Reference guideline "default parameter injection" (sap_semantic_model.json
# :7900; prompt rule sap_sql_engine.py:643-646): company 1000, ledger 00,
# current fiscal year — avoids a clarification round-trip.
DEFAULT_PARAMS = {
    "company_code": "1000",
    "ledger": "00",
    "fiscal_year": "2026",
    "language": "E",
}


def _has_real_sql(p: dict) -> bool:
    sql = (p.get("example_sql_structure") or "").strip().upper()
    return sql.startswith(("SELECT", "WITH")) and "FROM" in sql


def _best_template(question: str, model: SemanticModel) -> str | None:
    """Highest token-Jaccard validated pattern. The match text includes the
    pattern's ``business_context`` (its example NL prompt) — 9 of the
    reference's 58 patterns carry pseudo-SQL sketches rather than runnable
    SQL; those are skipped (TemplateCatalog.validate classifies them the
    same way)."""
    q_tok = _tokens(question)
    if not q_tok:
        return None
    best: tuple[float, int, str] | None = None
    for name, p in model.patterns.items():
        if not _has_real_sql(p):
            continue
        cand = (
            f"{name.replace('_', ' ')} {p.get('description') or ''} "
            f"{p.get('business_context') or ''}"
        )
        c_tok = _tokens(cand)
        if not c_tok:
            continue
        common = len(q_tok & c_tok)
        # containment (|q∩c| / |q|), not Jaccard: a short question fully
        # covered by a pattern's text is a match even when the pattern text
        # is longer; ties broken toward more overlapping tokens
        score = common / len(q_tok)
        if best is None or (score, common) > (best[0], best[1]):
            best = (score, common, name)
    if best and best[0] >= 0.6 and best[1] >= 2:
        return best[2]
    return None


def answer(
    spark: SparkSession,
    question: str,
    model: SemanticModel,
    llm: Callable[[str, str], str] | None = None,
    max_rows: int = executor.DEFAULT_MAX_ROWS,
    params: dict | None = None,
) -> dict:
    """classify → SQL (validated template, else LLM, else suggestions) →
    dialect → governance → capped execute. Returns the classification plus
    either the executor's result contract or a clarification payload."""
    from .templates import TemplateCatalog  # local: avoids a cycle at import

    cls = classify(question, model, llm=llm)
    out: dict = {"classification": cls, "question": question}

    sql: str | None = None
    hit = _best_template(question, model)
    if hit is not None:
        catalog = TemplateCatalog(model)
        tpl = catalog.get(hit)
        fill = {**DEFAULT_PARAMS, **(params or {})}
        try:
            sql = tpl.render(**{k: fill[k] for k in tpl.params() if k in fill})
            out["template"] = hit
        except KeyError:
            sql = None  # un-defaultable parameter → fall through
    if sql is None and llm is not None:
        md = llm(build_system_prompt(model, cls["modules"]), question)
        out["answer_markdown"] = md
        usage = getattr(llm, "last_usage", None)
        if isinstance(usage, dict) and usage:
            out["usage"] = usage
        sql = extract_main_sql(md)
    if sql is None:
        out["clarification_needed"] = True
        out["suggestions"] = cls["suggestions"]
        return out

    out["sql"] = sql
    res = executor.execute(spark, sql, max_rows=max_rows)
    if "error" in res and "template" in out:
        # template didn't analyze against the mounted catalog (e.g. pattern
        # references unmounted tables) — degrade to suggestions, keep the
        # error for diagnostics
        out["clarification_needed"] = True
        out["suggestions"] = cls["suggestions"]
        out["template_error"] = res["error"]
        return out
    out["result"] = res
    return out
