"""Deterministic k-means (operators/kmeans.py) vs a NumPy twin.

The Spark implementation must agree with plain Lloyd's algorithm run on
the same data with the same deterministic init (first k by vec_id) and
the same first-match argmin tie-break.
"""

from __future__ import annotations

import numpy as np
import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.kmeans import kmeans
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import queries
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

K, ITERS = 8, 5


def _numpy_kmeans(X: np.ndarray, k: int, iters: int):
    cents = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)  # argmin takes the first minimum: same tie-break
        for c in range(k):
            if (lab == c).any():
                cents[c] = X[lab == c].mean(axis=0)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), d.min(axis=1), cents


@pytest.fixture(scope="module")
def data(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    return X, ids


def test_kmeans_matches_numpy(spark, sf_dir, data):
    X, ids = data
    assigned, cents = kmeans(
        load(spark, sf_dir, "embeddings"), "embedding", "vec_id", k=K, iters=ITERS
    )
    got = {r.vec_id: (r.cluster, r.dist_sq) for r in assigned.collect()}
    lab, dist, np_cents = _numpy_kmeans(X, K, ITERS)
    assert np.allclose(np.array(cents), np_cents, atol=1e-9)
    for i, vid in enumerate(ids):
        assert got[vid][0] == lab[i], vid
        assert abs(got[vid][1] - dist[i]) <= 1e-6 * (1 + dist[i])


def test_kmeans_query_shape(spark, sf_dir):
    df = queries()["q136_kmeans_embeddings"](spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= K
    assert sum(r.n_points for r in rows) == load(spark, sf_dir, "embeddings").count()
    assert all(r.inertia >= 0 for r in rows)
