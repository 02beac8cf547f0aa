"""Integer-snapped power iteration: an oracle-pairable spectral axis.

q243 (``operators/pca.py``) computes the exact centered top principal
component with a driver-side LAPACK eigensolve — the right engine design
(one scan, exact), but its float eigenvector cannot be reproduced in SQL,
so it is gated by a NumPy twin instead of the DuckDB oracle. This module
is its oracle-paired sibling, the same duality the sketch family ships
(q16 engine-internal HLL++ vs q359 first-principles HLL): a dominant
direction of the UNCENTERED second-moment matrix, computed with integer
arithmetic only, so every intermediate — Gram entries, iterates, final
projections — is bit-identical in DuckDB (the q136 k-means device:
snapped updates + unrolled materialized CTE rounds).

Construction (all exact):
- components quantized to the 1e-6 grid (functions/vectors.py), first
  ``dim`` dims only (the matryoshka head — a 16-dim coarse axis is what
  drift monitors and IVF-style bucketers actually key on);
- Gram G[i][j] = sum of integer component products — order-independent
  BIGINT/DECIMAL sums;
- G is pre-scaled by ``s = max|G| // 1e6 + 1`` with truncation-toward-
  zero division (sign * (abs // s) — identical in Python and SQL, unlike
  bare ``//`` which floors in Python);
- ``iters`` fixed power-iteration rounds, each renormalizing the iterate
  to the 1e9 grid by the same sign-split truncating division;
- per-row score = integer dot of the quantized head with the final axis.

The fixed iteration count is part of the operator's DEFINITION — the
result is "the 8-round snapped power iterate", a deterministic quantity
both engines must agree on exactly, not an approximation racing an
eigensolver (on near-isotropic corpora the iterate and the true axis can
legitimately differ; q243 remains the exact-PCA surface).

Scale (100 TB): ONE aggregate pass produces the dim(dim+1)/2 Gram sums
(map-side combine, a single row leaves the cluster); the driver iterates
on a dim x dim integer matrix (O(dim^2) state, like k-means centroids);
scoring is one whole-stage-codegen projection — no shuffle, no UDF, no
join anywhere.

Reference parity: /root/reference/etl_connector.py has no vector surface
(evidence of absence, SURVEY §0) — north-star extension territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.vectors import quantize

AXIS_SCALE = 1_000_000_000  # iterate components live on the 1e9 grid
GRAM_CAP = 1_000_000  # pre-scale Gram entries below ~1e6


def _tdiv(x: int, s: int) -> int:
    """Truncation-toward-zero integer division (SQL ``abs//s`` semantics;
    Python's bare ``//`` floors, which differs on negatives)."""
    return (1 if x >= 0 else -1) * (abs(x) // s)


def power_iteration_axis(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 16,
    iters: int = 8,
) -> tuple[list[int], DataFrame]:
    """Return (integer axis on the 1e9 grid, df + ``spec_score`` column).

    ``spec_score`` is the exact BIGINT dot product of each row's
    quantized ``dim``-head with the final snapped iterate — identical in
    any engine that replays the same integer recurrence.
    """
    head = F.slice(quantize(vec_col), 1, dim)
    base = df.withColumn("_qv", head)

    aggs = [
        F.sum((F.col("_qv")[i] * F.col("_qv")[j]).cast("decimal(38,0)")).alias(
            f"g_{i}_{j}"
        )
        for i in range(dim)
        for j in range(i, dim)
    ]
    row = base.agg(*aggs).collect()[0]
    if row[0] is None:
        raise ValueError("empty input: cannot derive a spectral axis")

    g = [[0] * dim for _ in range(dim)]
    for i in range(dim):
        for j in range(i, dim):
            g[i][j] = g[j][i] = int(row[f"g_{i}_{j}"])

    s = max(abs(g[i][j]) for i in range(dim) for j in range(dim)) // GRAM_CAP + 1
    gp = [[_tdiv(g[i][j], s) for j in range(dim)] for i in range(dim)]

    v = [AXIS_SCALE] * dim
    for _ in range(iters):
        w = [sum(gp[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:  # degenerate (all-zero head) — keep the current iterate
            break
        v = [_tdiv(w[i] * AXIS_SCALE, m) for i in range(dim)]

    proj = F.col("_qv")[0] * F.lit(v[0])
    for j in range(1, dim):
        proj = proj + F.col("_qv")[j] * F.lit(v[j])
    return v, base.withColumn("spec_score", proj.cast("long")).drop("_qv")
