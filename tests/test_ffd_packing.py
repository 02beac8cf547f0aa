"""q109 FFD packing invariants: complete assignment, budget respected,
deterministic, and bin count within FFD's guarantee of the naive bound."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import registry
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.llm_ops import _FFD_BUDGET
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def _packed(spark, sf_dir):
    return registry.queries()["q109_ffd_packing"](spark, sf_dir)


def test_every_doc_assigned_and_budget_respected(spark, sf_dir):
    packed = _packed(spark, sf_dir)
    n_docs = load(spark, sf_dir, "documents").count()
    assert packed.count() == n_docs
    over = (
        packed.groupBy("source", "bin_id")
        .agg(F.sum("n_chars").alias("fill"))
        .filter(F.col("fill") > _FFD_BUDGET)
        .count()
    )
    assert over == 0


def test_bin_count_near_optimal(spark, sf_dir):
    packed = _packed(spark, sf_dir)
    per_source = (
        packed.groupBy("source")
        .agg(
            (F.max("bin_id") + 1).alias("n_bins"),
            F.sum("n_chars").alias("total"),
        )
        .collect()
    )
    for r in per_source:
        lower = math.ceil(r["total"] / _FFD_BUDGET)  # volume lower bound
        assert r["n_bins"] <= math.ceil(lower * 11 / 9) + 1, r


def test_packing_deterministic(spark, sf_dir):
    a = sorted(map(tuple, _packed(spark, sf_dir).collect()))
    b = sorted(map(tuple, _packed(spark, sf_dir).repartition(5).collect()))
    assert a == b
