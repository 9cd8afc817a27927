"""Semantic-model registry: SAP-style model JSON -> Spark schemas + metadata.

Parses the reference's semantic-model format (10 modules -> business objects
-> tables -> business_columns with DDIC-style types; cross-module
relationships; NL query patterns; SQL guidelines — structure per reference
``sap_model_assembly.py:17-86`` and ``sap_semantic_model.json``) into:

- a ``StructType`` per table using the faithful type map of SURVEY §1.2
  (NUMC/CHAR/VARCHAR -> String, DATE -> Date, CURR/QUAN/DEC -> Decimal —
  deliberately *not* the reference's lossy TEXT/REAL physical mapping,
  reference ``build_sap_test_db.py:187-202``),
- PK/FK metadata (kept as metadata — Spark doesn't enforce constraints —
  and used for join-path inference by ``kg.py``),
- the pattern catalog + guidelines for ``templates.py``.

The model ships WITH the engine: the per-module JSONs are vendored under
``sap_sql_engine_spark/model/modules`` and assembled in-process at load
time (``model.assembly``), so the engine boots with no reference checkout
present. ``SemanticModel.load(path)`` still accepts an explicit combined
model JSON for users who maintain their own.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

from ..model import assembly as model_assembly

# Schema supplement: columns the template corpus references that the model's
# business_columns omit but that exist in the reference's physical DB
# (verified via PRAGMA table_info on sap_test.db) or in FIXTURES.md. The
# model declares only ~699 "business" columns; the DB carries the full
# physical row. Columns in NEITHER place are hallucinations (reference
# design doc §8.1) and deliberately NOT added — templates using them are
# classified invalid by TemplateCatalog.validate, same as they would fail
# on the reference's own DB.
AUX_TABLES: dict[str, dict] = {
    # org text lookups for employee_headcount (sap_semantic_model.json:7374)
    "HRP1000": {
        "module": "HR",
        "object": "Org_Structure",
        "pk": ["OTYPE", "OBJID", "LANGU"],
        "columns": [
            ("PLVAR", "CHAR(2)"), ("OTYPE", "CHAR(1)"), ("OBJID", "CHAR(8)"),
            ("ISTAT", "CHAR(1)"), ("BEGDA", "DATE"), ("ENDDA", "DATE"),
            ("LANGU", "CHAR(1)"), ("STEXT", "CHAR(40)"),
        ],
    },
    # GL open/cleared line items for FBL3N (reference sap_test.db has both,
    # 15/3 rows; absent from the JSON model's business_columns)
    "BSIS": {
        "module": "FI_GL",
        "object": "GL_Line_Items",
        "pk": ["BUKRS", "BELNR", "GJAHR", "BUZEI"],
        "columns": [
            ("HKONT", "CHAR(10)"), ("BUKRS", "CHAR(4)"), ("BELNR", "CHAR(10)"),
            ("GJAHR", "NUMC(4)"), ("BUZEI", "NUMC(3)"), ("BUDAT", "DATE"),
            ("BLDAT", "DATE"), ("BLART", "CHAR(2)"), ("BSCHL", "CHAR(2)"),
            ("DMBTR", "CURR(13,2)"), ("SHKZG", "CHAR(1)"), ("WAERS", "CUKY"),
            ("SGTXT", "CHAR(50)"), ("AUGDT", "DATE"), ("AUGBL", "CHAR(10)"),
            ("MONAT", "NUMC(2)"), ("KOSTL", "CHAR(10)"),
        ],
    },
    "BSAS": {
        "module": "FI_GL",
        "object": "GL_Line_Items",
        "pk": ["BUKRS", "BELNR", "GJAHR", "BUZEI"],
        "columns": [
            ("HKONT", "CHAR(10)"), ("BUKRS", "CHAR(4)"), ("BELNR", "CHAR(10)"),
            ("GJAHR", "NUMC(4)"), ("BUZEI", "NUMC(3)"), ("BUDAT", "DATE"),
            ("BLDAT", "DATE"), ("BLART", "CHAR(2)"), ("BSCHL", "CHAR(2)"),
            ("DMBTR", "CURR(13,2)"), ("SHKZG", "CHAR(1)"), ("WAERS", "CUKY"),
            ("SGTXT", "CHAR(50)"), ("AUGDT", "DATE"), ("AUGBL", "CHAR(10)"),
            ("MONAT", "NUMC(2)"), ("KOSTL", "CHAR(10)"),
        ],
    },
    # company codes / plants (FBL1N company name, ME23N plant name)
    "T001": {
        "module": "FI_GL",
        "object": "Company_Code",
        "pk": ["BUKRS"],
        "columns": [
            ("BUKRS", "CHAR(4)"), ("BUTXT", "CHAR(25)"), ("KTOPL", "CHAR(4)"),
            ("LAND1", "CHAR(3)"), ("WAERS", "CUKY"),
        ],
    },
    "T001W": {
        "module": "MM",
        "object": "Plant",
        "pk": ["WERKS"],
        "columns": [
            ("WERKS", "CHAR(4)"), ("NAME1", "CHAR(30)"), ("BWKEY", "CHAR(4)"),
            ("BUKRS", "CHAR(4)"),
        ],
    },
    # cost elements (referenced by KSB1-style patterns)
    "CSKB": {
        "module": "CO",
        "object": "Cost_Element",
        "pk": ["KOKRS", "KSTAR"],
        "columns": [
            ("KOKRS", "CHAR(4)"), ("KSTAR", "CHAR(10)"), ("DATAB", "DATE"),
        ],
    },
}

AUX_COLUMNS: dict[str, list[tuple[str, str]]] = {
    "EBAN": [("EBELN", "CHAR(10)"), ("EBELP", "NUMC(5)"), ("KOSTL", "CHAR(10)"),
             ("AUFNR", "CHAR(12)"), ("NETPR", "CURR(13,2)")],
    "COBK": [("PERIO", "NUMC(3)")],
    "COEP": [("KOSTL", "CHAR(10)"), ("PERIO", "NUMC(3)"), ("WKG001", "CURR(13,2)"),
             ("AUFNR", "CHAR(12)"), ("EBELN", "CHAR(10)")],
    "CSKS": [("KTEXT", "CHAR(25)")],
    "VBAK": [("VBTYP", "CHAR(1)"), ("GBSTK", "CHAR(1)")],
    "BSID": [("FAEDT", "DATE"), ("KOSTL", "CHAR(10)"), ("VBELN", "CHAR(10)")],
    "AFRU": [("ISMNW", "QUAN(13,3)"), ("APLZL", "NUMC(8)")],
    "EKBE": [("MATNR", "CHAR(18)"), ("WERKS", "CHAR(4)")],
}

_CURR = re.compile(r"(?i)^(CURR|QUAN|DEC|DECIMAL)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_CHAR = re.compile(r"(?i)^(CHAR|VARCHAR|NUMC|CLNT|CUKY|UNIT|LANG)\s*(\(\s*\d+\s*\))?$")


def spark_type_for(sap_type: str) -> T.DataType:
    """SAP DDIC-style declared type -> Spark type (SURVEY §1.2 table)."""
    s = (sap_type or "").strip()
    m = _CURR.match(s)
    if m:
        return T.DecimalType(int(m.group(2)), int(m.group(3)))
    if s.upper() in ("DATE", "DATS"):
        return T.DateType()
    if s.upper() in ("INT", "INTEGER", "INT4"):
        return T.IntegerType()
    if s.upper() in ("FLOAT", "REAL", "DOUBLE", "FLTP"):
        return T.DoubleType()
    if s.upper() in ("TIME", "TIMS"):
        return T.StringType()  # HHMMSS strings, like the reference data
    if _CHAR.match(s) or s.upper() in ("STRING", "TEXT"):
        return T.StringType()
    # unknown declared types degrade to string, never fail the load
    return T.StringType()


@dataclass
class TableMeta:
    name: str
    module: str
    business_object: str
    description: str
    primary_key: list[str]
    foreign_keys: list[dict]
    columns: list[dict]  # {column, type, description, nl_aliases}

    def struct_type(self) -> T.StructType:
        pk = set(self.primary_key)
        return T.StructType(
            [
                T.StructField(
                    c["column"],
                    spark_type_for(c.get("type", "")),
                    nullable=c["column"] not in pk,
                )
                for c in self.columns
            ]
        )


@dataclass
class SemanticModel:
    metadata: dict
    tables: dict[str, TableMeta]
    relationships: list[dict]
    patterns: dict[str, dict]
    guidelines: list[dict]
    objects: dict[str, dict] = field(default_factory=dict)  # name -> {module, tables, aliases, questions}

    # -- loading ------------------------------------------------------------

    @classmethod
    def load(cls, path: str | None = None) -> "SemanticModel":
        """Load the semantic model. With no path, assemble the vendored
        module JSONs in-process; with a path, read that combined model."""
        if path is None:
            return cls.from_dict(model_assembly.assemble())
        with open(path) as f:
            return cls.from_dict(json.load(f))

    @classmethod
    def from_dict(cls, m: dict) -> "SemanticModel":
        tables: dict[str, TableMeta] = {}
        objects: dict[str, dict] = {}
        for mod_name, mod in (m.get("modules") or {}).items():
            for obj_name, obj in (mod.get("business_objects") or {}).items():
                objects[obj_name] = {
                    "module": mod_name,
                    "tables": list((obj.get("tables") or {}).keys()),
                    "aliases": obj.get("nl_aliases") or [],
                    "questions": obj.get("business_questions") or [],
                    "description": obj.get("description") or "",
                }
                for tbl_name, tbl in (obj.get("tables") or {}).items():
                    if tbl_name in tables:
                        continue  # first definition wins (shared tables)
                    pk_raw = tbl.get("primary_key") or {}
                    if isinstance(pk_raw, dict):
                        pk_cols = [
                            c.strip()
                            for c in str(pk_raw.get("column", "")).split(",")
                            if c.strip()
                        ]
                    else:
                        pk_cols = [c.strip() for c in str(pk_raw).split(",") if c.strip()]
                    tables[tbl_name] = TableMeta(
                        name=tbl_name,
                        module=mod_name,
                        business_object=obj_name,
                        description=tbl.get("description") or "",
                        primary_key=pk_cols,
                        foreign_keys=tbl.get("foreign_keys") or [],
                        columns=tbl.get("business_columns") or [],
                    )
        # apply the verified schema supplement (see AUX_* docs above)
        for tbl_name, spec in AUX_TABLES.items():
            if tbl_name not in tables:
                tables[tbl_name] = TableMeta(
                    name=tbl_name,
                    module=spec["module"],
                    business_object=spec["object"],
                    description="supplemented from reference physical DB",
                    primary_key=spec["pk"],
                    foreign_keys=[],
                    columns=[{"column": c, "type": t} for c, t in spec["columns"]],
                )
        for tbl_name, cols in AUX_COLUMNS.items():
            t = tables.get(tbl_name)
            if t is None:
                continue
            have = {c["column"] for c in t.columns}
            for c, typ in cols:
                if c not in have:
                    t.columns.append({"column": c, "type": typ})
        patterns = {
            p["pattern_name"]: p for p in (m.get("nl_query_patterns") or [])
        }
        return cls(
            metadata=m.get("model_metadata") or {},
            tables=tables,
            relationships=m.get("cross_module_relationships") or [],
            patterns=patterns,
            guidelines=m.get("sql_generation_guidelines") or [],
            objects=objects,
        )

    # -- accessors ----------------------------------------------------------

    def schema_of(self, table: str) -> T.StructType:
        return self.tables[table].struct_type()

    def modules(self) -> list[str]:
        return sorted({t.module for t in self.tables.values()})

    def tables_in_module(self, module: str) -> list[str]:
        return sorted(t.name for t in self.tables.values() if t.module == module)

    def column_aliases(self) -> dict[str, list[tuple[str, str]]]:
        """nl alias -> [(table, column)] index for NL-term resolution."""
        idx: dict[str, list[tuple[str, str]]] = {}
        for t in self.tables.values():
            for c in t.columns:
                for a in c.get("nl_aliases") or []:
                    idx.setdefault(a.lower(), []).append((t.name, c["column"]))
        return idx

    def join_condition(self, t1: str, t2: str) -> str | None:
        """Declared cross-module join condition between two tables, if any."""
        for r in self.relationships:
            if {r.get("from_table"), r.get("to_table")} == {t1, t2}:
                return r.get("join_condition")
        return None

    def register_empty_views(self, spark) -> None:
        """Register every model table as an empty temp view with its proper
        schema — lets the full template surface be analyzed (plan-checked,
        governance-gated) without data."""
        for t in self.tables.values():
            spark.createDataFrame([], t.struct_type()).createOrReplaceTempView(t.name)
