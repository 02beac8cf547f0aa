"""Top principal component of an embedding column via one-pass Gram
accumulation.

The reference has no vector or ML surface at all (its complete operator
inventory is /root/reference/etl_connector.py:53-242, SURVEY §2.1); this is
north-star extension surface for embedding-column analytics: the dominant
direction of variance of an ``array<float>`` column.

Scale design: ONE pass over the data. Each Arrow batch contributes a
d x d partial Gram matrix computed as a NumPy matmul inside
``mapInPandas`` (vectorized, C-speed — the blessed path when built-in
column expressions can't express a matrix product), and the driver sums
the tiny per-batch partials (d^2 doubles each) and eigensolves a d x d
matrix. For d up to a few thousand this beats power iteration outright —
power iteration pays one full scan PER iteration and converges only at
rate (lambda2/lambda1)^k, which on near-isotropic embedding corpora (tiny
eigengap) never finishes; the Gram route is exact after a single scan.
Driver state is O(d^2), independent of row count — the same
driver-holds-aggregate-only contract as k-means (operators/kmeans.py) and
PageRank (plans/round2.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_principal_component(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
) -> tuple[list[float], DataFrame]:
    """Return (top principal axis, df + ``pc1_score`` projection column).

    Exact (up to the d x d eigensolve) and deterministic: sign pinned so
    the largest-magnitude axis component is positive. Two scans total:
    one for the mean vector + Gram partials (fused), one implied by the
    returned projection.
    """

    def gram_partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.zeros((dim, dim), dtype=np.float64)
        s = np.zeros(dim, dtype=np.float64)
        n = 0
        for pdf in it:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g += x.T @ x
            s += x.sum(axis=0)
            n += x.shape[0]
        if n:
            yield pd.DataFrame(
                {"g": [g.ravel().tolist()], "s": [s.tolist()], "n": [n]}
            )

    parts = (
        df.select(vec_col)
        .mapInPandas(
            gram_partials, schema="g array<double>, s array<double>, n long"
        )
        .collect()
    )
    g = np.zeros((dim, dim), dtype=np.float64)
    s = np.zeros(dim, dtype=np.float64)
    n = 0
    for row in parts:
        g += np.asarray(row["g"], dtype=np.float64).reshape(dim, dim)
        s += np.asarray(row["s"], dtype=np.float64)
        n += row["n"]
    mu = s / n
    # centered scatter: sum (x-mu)(x-mu)^T = G - n * mu mu^T
    cov = g - n * np.outer(mu, mu)
    _, evecs = np.linalg.eigh(cov)
    v = evecs[:, -1]
    k = int(np.argmax(np.abs(v)))
    if v[k] < 0:
        v = -v
    v = v.tolist()

    score = sum(
        (
            (F.col(vec_col)[i].cast("double") - F.lit(float(mu[i])))
            * F.lit(v[i])
            for i in range(1, dim)
        ),
        (F.col(vec_col)[0].cast("double") - F.lit(float(mu[0]))) * F.lit(v[0]),
    )
    return v, df.withColumn("pc1_score", score)
