"""sap_sql_engine_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference system ``knmlee1261-sudo/sap-sql-engine`` (an NL->SQL analytics
prototype over SQLite), re-expressed Spark-first:

- Tables are Parquet -> DataFrames -> temp views; queries run through
  ``spark.sql`` / the DataFrame API so Catalyst owns optimization.
- A small dialect front-end accepts the reference's SAP-HANA/SQLite-flavored
  SQL surface (see ``plans.dialect``).
- Governance (PII aggregate-only gate) is enforced on the *analyzed plan*,
  not on SQL text (see ``plans.governance``).
- Large-scale data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing, streaming) live in ``operators`` and
  ``streaming`` and are designed for 100 TB / multi-executor scale even
  though tests run on local mode.
"""

__version__ = "0.1.0"
