"""Query-pattern catalog — the reference's 58 validated NL->SQL templates.

Each pattern carries its tables, business context, and an example SQL
structure (reference ``sap_semantic_model.json:7209-7878``). The catalog:

- lists/loads patterns from a SemanticModel,
- parameterizes ``:name``-style placeholders (reference templates use e.g.
  ``:company_code`` at ``sap_semantic_model.json:7855``),
- runs a pattern's SQL through the dialect front-end so the stored
  SQLite-flavored template executes on Spark unchanged,
- can *analyze* every pattern against empty schema-true views — a
  compile-time regression suite over the whole template surface with no
  data needed (Catalyst name/type resolution is the assertion).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .plans import dialect
from .sources.registry import SemanticModel

_PARAM = re.compile(r"(?<!:):([a-z_][a-z0-9_]*)", re.IGNORECASE)


@dataclass
class Template:
    name: str
    description: str
    module: str
    tables: list[str]
    context: str
    sql: str

    def params(self) -> list[str]:
        return sorted({m.group(1) for m in _PARAM.finditer(self.sql)})

    def render(self, **params: str) -> str:
        def sub(m: re.Match) -> str:
            key = m.group(1)
            if key not in params:
                raise KeyError(f"template {self.name}: missing param :{key}")
            v = params[key]
            if isinstance(v, (int, float)):
                return str(v)
            return "'" + str(v).replace("'", "''") + "'"

        return _PARAM.sub(sub, self.sql)


class TemplateCatalog:
    def __init__(self, model: SemanticModel):
        self.model = model
        self.templates = {
            name: Template(
                name=name,
                description=p.get("description", ""),
                module=p.get("primary_module", ""),
                tables=p.get("tables", []),
                context=p.get("business_context", ""),
                sql=p.get("example_sql_structure", ""),
            )
            for name, p in model.patterns.items()
            if p.get("example_sql_structure")
        }

    def names(self) -> list[str]:
        return sorted(self.templates)

    def get(self, name: str) -> Template:
        return self.templates[name]

    def to_spark_sql(self, name: str, **params) -> str:
        return dialect.transpile(self.templates[name].render(**params))

    def run(self, spark: SparkSession, name: str, **params) -> DataFrame:
        return spark.sql(self.to_spark_sql(name, **params))

    def analyze_all(self, spark: SparkSession) -> dict[str, str | None]:
        """Analyze (not execute) every template against the registered views;
        returns {name: None | error}. With ``register_empty_views`` this
        checks the full surface resolves on the engine's schemas."""
        results: dict[str, str | None] = {}
        for name, t in self.templates.items():
            try:
                sql = dialect.transpile(t.render(**{p: "1000" for p in t.params()}))
                spark.sql(sql).schema  # forces analysis, no job
                results[name] = None
            except Exception as e:
                results[name] = str(e).split("\n")[0][:200]
        return results

    def validate(self, spark: SparkSession) -> dict[str, list]:
        """Classify the template corpus:

        - ``valid``: analyzes cleanly against the schema-true views — the
          executable regression surface (the reference design doc's "20+
          tested SQL statements validated against the test database").
        - ``invalid``: references columns that exist neither in the model,
          the reference's physical DB, nor FIXTURES — the reference ships
          these un-runnable (column hallucinations, design doc §8.1); they
          fail identically on the reference's own SQLite DB.

        Pseudo-SQL sketches (one-line "SELECT vendor, SUM(amount)" shapes)
        land in ``invalid`` too — they are documentation, not SQL.
        """
        res = self.analyze_all(spark)
        return {
            "valid": sorted(n for n, e in res.items() if e is None),
            "invalid": sorted((n, e) for n, e in res.items() if e),
        }
