"""Snapped power-iteration axis (operators/spectral.py, q373).

Cross-engine bit-parity is enforced by tests/test_oracle.py; here we gate
the semantics: on a corpus with a planted dominant direction the snapped
iterate must align with it, and the operator must be a pure function of
its input (exact integer determinism, no run-to-run drift).
"""

from __future__ import annotations

import numpy as np
import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.spectral import (
    AXIS_SCALE,
    power_iteration_axis,
)


def _planted_df(spark, n=400, dim=16, seed=7):
    """Rows = strong signal along a fixed unit axis + small noise."""
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=dim)
    axis /= np.linalg.norm(axis)
    coef = rng.normal(scale=10.0, size=n)
    x = np.outer(coef, axis) + rng.normal(scale=0.1, size=(n, dim))
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        axis,
        x,
    )


def test_recovers_planted_axis(spark):
    df, axis, x = _planted_df(spark)
    v, scored = power_iteration_axis(df, "embedding", dim=16, iters=8)

    vf = np.asarray(v, dtype=np.float64) / AXIS_SCALE
    cos = abs(float(vf @ axis)) / np.linalg.norm(vf)
    assert cos >= 0.999, f"snapped iterate diverged from planted axis: {cos}"

    # scores order rows the way the true axis projection does (up to sign)
    got = {
        r["vec_id"]: r["spec_score"]
        for r in scored.select("vec_id", "spec_score").collect()
    }
    want = x @ axis
    sign = 1.0 if vf @ axis > 0 else -1.0
    got_arr = np.asarray([got[i] for i in range(len(want))], dtype=np.float64)
    corr = float(np.corrcoef(got_arr, sign * want)[0, 1])
    assert corr >= 0.999


def test_exact_determinism(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v1, s1 = power_iteration_axis(emb, "embedding", dim=16, iters=8)
    v2, s2 = power_iteration_axis(emb, "embedding", dim=16, iters=8)
    assert v1 == v2
    rows1 = sorted((r["vec_id"], r["spec_score"]) for r in s1.collect())
    rows2 = sorted((r["vec_id"], r["spec_score"]) for r in s2.collect())
    assert rows1 == rows2


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        power_iteration_axis(df, "embedding", dim=16, iters=8)
