"""ANSI-environment contract (FLOATS.md class E): the driver executes
``queries()`` under a vanilla Spark 4 session — ANSI mode ON — while the
repo's own session pins ANSI OFF. Round 5's `label_confusion_report`
DIVIDE_BY_ZERO crash reached the driver unseen because every local run
inherited the repo session. These tests flip the session-level ANSI flag
and execute the queries whose arithmetic is ANSI-sensitive (integral
`div`, CAST chains, products near type bounds), asserting they produce
rows instead of raising. The FULL 133-query ANSI leg is the pre-snapshot
`python tools/check_correctness.py --ansi` sweep; this test keeps the
known-sensitive surface from regressing between sweeps.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from sap_sql_engine_spark import cachereg

SF_DIR = "/root/testdata/sf0.001"

# every query the round-6 zero-divisor audit (FLOATS.md class E) found a
# guarded `div`/`//` in, plus the overflow-audited KL — the surface that
# historically diverged between ANSI modes
ANSI_SENSITIVE = [
    "label_confusion_report",
    "label_agreement_kappa",
    "zipf_slope_fit",
    "source_kl_divergence",
    "embedding_rp_reduce",
]


@pytest.fixture()
def ansi_spark(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", ANSI_SENSITIVE)
def test_ansi_sensitive_queries_run_under_ansi(ansi_spark, name):
    fn = entry.queries()[name]
    try:
        rows = fn(ansi_spark, SF_DIR).collect()
    finally:
        cachereg.release()
    assert len(rows) > 0


def test_confusion_report_null_for_never_predicted_class(ansi_spark):
    """The divisor that crashed r5: `zh` has no LANG_MARKERS entry so
    n_predicted('zh') = 0 — precision must be NULL, not an ANSI error."""
    fn = entry.queries()["label_confusion_report"]
    try:
        rows = {r["klass"]: r for r in fn(ansi_spark, SF_DIR).collect()}
    finally:
        cachereg.release()
    zh = rows.get("zh")
    assert zh is not None and zh["n_predicted"] == 0
    assert zh["precision_bp"] is None
