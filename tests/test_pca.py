"""Power-iteration PCA vs a NumPy eigensolver twin (q243 has no SQL oracle;
this is its exact-method gate, like k-means' and PageRank's NumPy twins).
"""

from __future__ import annotations

import numpy as np
import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.pca import top_principal_component
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import queries

_QS = queries()


def test_top_component_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v, scored = top_principal_component(emb, "embedding", dim=64)

    pdf = emb.toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    xc = x - x.mean(axis=0)
    evals, evecs = np.linalg.eigh(xc.T @ xc)
    top = evecs[:, -1]

    cos = abs(float(np.dot(v, top)) / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert cos >= 0.9999, f"axis diverged from eigensolver: cos={cos}"

    # projections must match the numpy projections up to the pinned sign
    got = (
        scored.select("vec_id", "pc1_score")
        .toPandas()
        .set_index("vec_id")["pc1_score"]
    )
    want = pdf.set_index("vec_id").index.map(
        dict(zip(pdf["vec_id"], xc @ (top if np.dot(v, top) > 0 else -top)))
    )
    np.testing.assert_allclose(
        got.loc[pdf["vec_id"]].to_numpy(),
        np.asarray(want, dtype=np.float64),
        rtol=1e-3,
        atol=1e-4,
    )


def test_axis_is_unit_norm_and_sign_pinned(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v, _ = top_principal_component(emb, "embedding", dim=64)
    assert float(np.linalg.norm(v)) == pytest.approx(1.0, abs=1e-9)
    k = int(np.argmax(np.abs(v)))
    assert v[k] > 0  # deterministic sign convention


def test_planted_dominant_direction(spark):
    # Construct vectors whose variance is overwhelmingly along axis 7:
    # the Gram eigensolve must find (approximately) e_7.
    rng = np.random.default_rng(42)
    base = rng.normal(0, 0.01, size=(200, 16))
    base[:, 7] += rng.normal(0, 10.0, size=200)
    rows = [(i, base[i].astype(float).tolist(), 0) for i in range(200)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    v, _ = top_principal_component(df, "embedding", dim=16)
    assert abs(v[7]) > 0.999
