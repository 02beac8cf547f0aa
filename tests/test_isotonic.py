"""Grouped isotonic regression (operators/isotonic.py): PAV semantics
pinned three ways — NumPy brute-force minimax twin, invariants
(monotonicity, weighted-mean preservation, idempotence), and equivalence
with the closed-form SQL formulation used by q292_isotonic_calibration.

Reference has no ML surface (/root/reference/etl_connector.py:53-242).
"""

from __future__ import annotations

import numpy as np
import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.isotonic import isotonic_calibrate, pav_fit


def minimax_fit(y, w):
    """O(n^2) reference: fit_i = max_{j<=i} min_{k>=i} wavg(y[j..k])."""
    n = len(y)
    out = []
    for i in range(n):
        best = -np.inf
        for j in range(i + 1):
            worst = np.inf
            for k in range(i, n):
                seg_w = sum(w[j : k + 1])
                seg_wy = sum(wi * yi for wi, yi in zip(w[j : k + 1], y[j : k + 1]))
                worst = min(worst, seg_wy / seg_w)
            best = max(best, worst)
        out.append(best)
    return out


@pytest.mark.parametrize(
    "y,w",
    [
        ([3.0, 1.0, 2.0, 5.0, 4.0], [1.0] * 5),
        ([1.0, 2.0, 3.0], [1.0, 1.0, 1.0]),  # already monotone
        ([5.0, 4.0, 3.0, 2.0], [1.0, 2.0, 3.0, 4.0]),  # fully pooled
        ([0.2, 0.9, 0.1, 0.4, 0.4, 0.8], [10.0, 1.0, 5.0, 2.0, 2.0, 7.0]),
    ],
)
def test_pav_matches_minimax(y, w):
    got = pav_fit(y, w)
    want = minimax_fit(y, w)
    assert np.allclose(got, want, atol=1e-12)


def test_pav_invariants():
    rng = np.random.RandomState(7)
    y = rng.rand(40).tolist()
    w = (rng.randint(1, 9, size=40)).astype(float).tolist()
    fit = pav_fit(y, w)
    # non-decreasing
    assert all(a <= b + 1e-12 for a, b in zip(fit, fit[1:]))
    # weighted mean preserved
    assert np.isclose(np.dot(fit, w), np.dot(y, w), atol=1e-9)
    # idempotent: fitting the fit returns itself
    assert np.allclose(pav_fit(fit, w), fit, atol=1e-12)


def test_operator_matches_sql_formulation(spark, sf_dir):
    """applyInPandas PAV (scale path) == q292's closed-form minimax SQL."""
    import pyspark.sql.functions as F

    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import queries

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.when(F.dayofweek("ts").isin(1, 7), "weekend").otherwise("weekday").alias("g"),
        F.hour("ts").cast("long").alias("x"),
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias("y"),
    )
    op = {
        (r["g"], r["x"]): (r["iso_fit"], r["n"], r["raw_rate"])
        for r in isotonic_calibrate(ev, "g", "x", "y").collect()
    }
    sql = {
        (r["g"], r["x"]): (r["iso_fit"], r["n"], r["raw_rate"])
        for r in queries()["q292_isotonic_calibration"](spark, sf_dir).collect()
    }
    assert set(op) == set(sql)
    for key in op:
        assert op[key][1] == sql[key][1], key  # n
        assert abs(op[key][0] - sql[key][0]) < 1e-9, key  # iso_fit
        assert abs(op[key][2] - sql[key][2]) < 1e-9, key  # raw_rate
