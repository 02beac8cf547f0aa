"""Grouped isotonic regression (pool-adjacent-violators) for probability
calibration at scale.

The reference has no ML or statistics surface at all (its complete operator
inventory is /root/reference/etl_connector.py:53-242, SURVEY §2.1); this is
north-star extension surface: the monotone-calibration step every scored
pipeline runs between a raw model score and a decision threshold.

Scale design: the raw fact NEVER reaches the Python worker. Stage 1
pre-aggregates (group, x-bin) -> (sum_w, sum_wy) with one shuffle — at
100 TB this collapses billions of rows to (groups x bins) cells. Stage 2
runs weighted PAV per group over its bins inside ``applyInPandas``: O(bins)
state and time via the classic stack algorithm, exact and deterministic
(pure integer/float arithmetic on already-reduced sums, no iteration over
raw rows). Correctness is pinned two independent ways in tests: against
sklearn-free NumPy PAV twins, and against the closed-form minimax
characterization fit_i = max_{j<=i} min_{k>=i} wavg(y[j..k]) that
q292_isotonic_calibration expresses in pure SQL on both engines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pav_fit(y: list[float], w: list[float]) -> list[float]:
    """Weighted pool-adjacent-violators on an ordered sequence.

    Returns the isotonic (non-decreasing) fit minimizing sum w*(fit-y)^2.
    O(n) stack algorithm; pure Python so the semantics are auditable and
    the applyInPandas path below stays dependency-free.
    """
    blocks: list[tuple[float, float, int]] = []  # (weight_sum, weighted_y_sum, count)
    for yi, wi in zip(y, w):
        blocks.append((wi, wi * yi, 1))
        # merge while the new block's mean violates monotonicity;
        # cross-multiplied comparison avoids the division entirely
        while len(blocks) > 1:
            w2, s2, c2 = blocks[-1]
            w1, s1, c1 = blocks[-2]
            if s1 * w2 <= s2 * w1:  # mean1 <= mean2
                break
            blocks[-2:] = [(w1 + w2, s1 + s2, c1 + c2)]
    fits: list[float] = []
    for bw, bs, bc in blocks:
        fits.extend([bs / bw] * bc)
    return fits


def isotonic_calibrate(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group isotonic fit of mean(y) as a non-decreasing function of x.

    Returns (group, x, n, raw_rate, iso_fit), one row per observed
    (group, x) cell. Stage 1 is the only wide operation; stage 2's
    applyInPandas receives (bins)-sized groups regardless of fact size.
    """
    cells = (
        df.groupBy(F.col(group_col).alias("g"), F.col(x_col).alias("x"))
        .agg(
            F.count("*").cast("double").alias("w"),
            F.sum(F.col(y_col).cast("double")).alias("wy"),
        )
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("x").reset_index(drop=True)
        y = (pdf["wy"] / pdf["w"]).tolist()
        fits = pav_fit(y, pdf["w"].tolist())
        return pd.DataFrame(
            {
                "g": pdf["g"],
                "x": pdf["x"],
                "n": pdf["w"].astype("int64"),
                "raw_rate": y,
                "iso_fit": fits,
            }
        )

    schema = "g string, x long, n long, raw_rate double, iso_fit double"
    return cells.groupBy("g").applyInPandas(fit, schema=schema)
