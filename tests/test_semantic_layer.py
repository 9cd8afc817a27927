"""Semantic-model registry + knowledge graph + template catalog tests.

Hermetic tests use an inline mini-model; integration tests load the
vendored in-package model (no reference checkout needed)."""

import pytest

from pyspark.sql import types as T

from sap_sql_engine_spark.kg import KnowledgeGraph
from sap_sql_engine_spark.model import assembly as model_assembly
from sap_sql_engine_spark.sources.registry import (
    SemanticModel,
    spark_type_for,
)
from sap_sql_engine_spark.templates import TemplateCatalog

MINI_MODEL = {
    "model_metadata": {"version": "test"},
    "modules": {
        "FI_AP": {
            "business_objects": {
                "Vendor": {
                    "description": "vendor master",
                    "nl_aliases": ["vendor", "supplier"],
                    "business_questions": ["Who are our top vendors?"],
                    "tables": {
                        "LFA1": {
                            "primary_key": {"column": "LIFNR"},
                            "foreign_keys": [],
                            "business_columns": [
                                {"column": "LIFNR", "type": "CHAR(10)",
                                 "nl_aliases": ["vendor number"]},
                                {"column": "NAME1", "type": "CHAR(35)",
                                 "nl_aliases": ["vendor name"]},
                            ],
                        },
                        "BSIK": {
                            "primary_key": {"column": "BUKRS, LIFNR, BELNR, GJAHR, BUZEI"},
                            "foreign_keys": [
                                {"references_table": "LFA1", "column": "LIFNR"}
                            ],
                            "business_columns": [
                                {"column": "BUKRS", "type": "CHAR(4)"},
                                {"column": "LIFNR", "type": "CHAR(10)"},
                                {"column": "BELNR", "type": "CHAR(10)"},
                                {"column": "GJAHR", "type": "NUMC(4)"},
                                {"column": "BUZEI", "type": "NUMC(3)"},
                                {"column": "DMBTR", "type": "CURR(13,2)"},
                                {"column": "SHKZG", "type": "CHAR(1)"},
                                {"column": "AUGDT", "type": "DATE"},
                                {"column": "BUDAT", "type": "DATE"},
                            ],
                        },
                    },
                }
            }
        },
        "FI_GL": {
            "business_objects": {
                "Journal_Entry": {
                    "description": "journal entries",
                    "nl_aliases": ["journal entry"],
                    "business_questions": [],
                    "tables": {
                        "BKPF": {
                            "primary_key": {"column": "BUKRS, BELNR, GJAHR"},
                            "foreign_keys": [],
                            "business_columns": [
                                {"column": "BUKRS", "type": "CHAR(4)"},
                                {"column": "BELNR", "type": "CHAR(10)"},
                                {"column": "GJAHR", "type": "NUMC(4)"},
                                {"column": "BUDAT", "type": "DATE"},
                            ],
                        }
                    },
                }
            }
        },
    },
    "cross_module_relationships": [
        {
            "from_module": "FI_GL", "from_table": "BKPF",
            "to_module": "FI_AP", "to_table": "BSIK",
            "join_condition": "BKPF.BUKRS=BSIK.BUKRS AND BKPF.BELNR=BSIK.BELNR",
        }
    ],
    "nl_query_patterns": [
        {
            "pattern_name": "vendor_balance",
            "description": "open vendor balance",
            "primary_module": "FI_AP",
            "tables": ["LFA1", "BSIK"],
            "business_context": "",
            "example_sql_structure": (
                "SELECT v.NAME1 AS vendor_name, "
                "SUM(CASE WHEN b.SHKZG = 'S' THEN b.DMBTR ELSE -b.DMBTR END) AS balance "
                "FROM BSIK b JOIN LFA1 v ON b.LIFNR = v.LIFNR "
                "WHERE b.AUGDT IS NULL AND b.BUKRS = :company_code "
                "GROUP BY v.NAME1 ORDER BY balance DESC LIMIT 10"
            ),
        }
    ],
    "sql_generation_guidelines": [{"guideline": "g1", "description": "d"}],
}


@pytest.fixture(scope="module")
def mini():
    return SemanticModel.from_dict(MINI_MODEL)


def test_type_mapping():
    assert isinstance(spark_type_for("CHAR(10)"), T.StringType)
    assert isinstance(spark_type_for("NUMC(4)"), T.StringType)
    assert spark_type_for("CURR(13,2)") == T.DecimalType(13, 2)
    assert spark_type_for("QUAN(13,3)") == T.DecimalType(13, 3)
    assert isinstance(spark_type_for("DATE"), T.DateType)
    assert isinstance(spark_type_for("???unknown"), T.StringType)


def test_struct_type_pk_not_null(mini):
    st = mini.schema_of("BSIK")
    by_name = {f.name: f for f in st.fields}
    assert not by_name["LIFNR"].nullable  # PK component
    assert by_name["DMBTR"].nullable
    assert by_name["DMBTR"].dataType == T.DecimalType(13, 2)


def test_join_condition_lookup(mini):
    assert "BKPF.BUKRS=BSIK.BUKRS" in mini.join_condition("BKPF", "BSIK")
    assert mini.join_condition("LFA1", "BKPF") is None


def test_kg_join_path(mini):
    kg = KnowledgeGraph(mini)
    assert kg.find_join_path("BSIK", "LFA1") == ["BSIK", "LFA1"]
    # BKPF -> BSIK via cross-module relationship, then FK to LFA1
    assert kg.find_join_path("BKPF", "LFA1") == ["BKPF", "BSIK", "LFA1"]


def test_kg_resolution(mini):
    kg = KnowledgeGraph(mini)
    top = kg.resolve_term("vendor")[0]
    assert top.kind == "object" and top.target == "Vendor"
    q = kg.resolve_question("show open vendor balance by company")
    tables = dict(q["tables"])
    assert "LFA1" in tables and "BSIK" in tables


def test_template_render_and_params(mini):
    cat = TemplateCatalog(mini)
    t = cat.get("vendor_balance")
    assert t.params() == ["company_code"]
    rendered = t.render(company_code="1000")
    assert "b.BUKRS = '1000'" in rendered
    with pytest.raises(KeyError):
        t.render()


def test_template_executes_on_spark(spark, mini):
    mini.register_empty_views(spark)
    cat = TemplateCatalog(mini)
    df = cat.run(spark, "vendor_balance", company_code="1000")
    assert df.columns == ["vendor_name", "balance"]
    assert df.count() == 0  # empty views, but full pipeline runs
    # the open-item sentinel rewrite must be present in the transpiled SQL
    assert "AUGDT IS NULL OR" in cat.to_spark_sql("vendor_balance", company_code="1000")


class TestVendoredModelIntegration:
    @pytest.fixture(scope="class")
    def ref_model(self):
        return SemanticModel.load()

    def test_assembly_counts(self):
        # assembled from the 10 vendored module files + shared metadata,
        # with no reference checkout involved
        model = model_assembly.assemble()
        s = model_assembly.summarize(model)
        assert s["modules"] == 10
        assert s["tables"] == 59  # raw definitions; registry dedupes shared tables to 58
        assert s["relationships"] == 145
        assert s["patterns"] == 58
        # alphabetical, matching the reference combined artifact (not merge order)
        assert model["model_metadata"]["modules_covered"] == sorted(model["modules"].keys())

    def test_inventory_counts(self, ref_model):
        # 58 modeled + aux supplement (HRP1000, CSKB, BSIS, BSAS, T001, T001W)
        assert len(ref_model.tables) == 64
        assert len(ref_model.relationships) == 145
        assert len(ref_model.patterns) == 58
        assert len(ref_model.guidelines) == 29

    def test_template_surface(self, spark, ref_model):
        ref_model.register_empty_views(spark)
        cat = TemplateCatalog(ref_model)
        v = cat.validate(spark)
        # the reference design doc claims "20+ tested SQL statements";
        # everything beyond that ships with hallucinated columns/sketch SQL
        assert len(v["valid"]) >= 21
        for must in (
            "top_vendors_by_spend",
            "trial_balance",
            "employee_headcount",
            "value_chain_o2c_pipeline_summary",
        ):
            assert must in v["valid"]

    def test_kg_scale(self, ref_model):
        kg = KnowledgeGraph(ref_model)
        s = kg.stats()
        assert s["nodes"] > 200 and s["edges"] > 300
        assert kg.find_join_path("BSIK", "LFA1") == ["BSIK", "LFA1"]
        d3 = kg.to_d3()
        assert set(d3) == {"nodes", "links", "stats"}
