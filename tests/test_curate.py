"""curate() composition semantics: stage order, counts, idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.text import quality_score
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.curate import curate
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.dedup import jaccard_pairs
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def test_curate_report_and_invariants(spark, sf_dir):
    d = load(spark, sf_dir, "documents").limit(300)
    out, report = curate(d, with_report=True)

    assert report.n_input == 300
    # monotone funnel
    assert (
        report.n_input
        >= report.n_after_quality
        >= report.n_after_exact_dedup
        >= report.n_after_near_dedup
        > 0
    )
    assert out.count() == report.n_after_near_dedup
    assert 0 < report.kept_fraction <= 1

    rows = out.collect()
    # every survivor passes the quality gate
    q = {r.doc_id: None for r in rows}
    gated = d.filter(quality_score(F.col("text")) >= 0.5)
    assert set(q) <= {r.doc_id for r in gated.collect()}
    # no residual near-dups among survivors
    assert jaccard_pairs(out, "doc_id", "text", 0.9).count() == 0


def test_curate_idempotent(spark, sf_dir):
    d = load(spark, sf_dir, "documents").limit(200)
    once = curate(d)
    twice = curate(once)
    assert sorted(r.doc_id for r in once.collect()) == sorted(
        r.doc_id for r in twice.collect()
    )
