"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

A parquet scan prunes files and row groups from column min/max statistics.
Sorting by one column makes its stats tight but leaves every other column's
range full-width per file; interleaving the bits of several columns orders
rows along a space-filling curve, so EACH participating column's min/max is
tight per file and a multi-dimensional box predicate touches only the files
whose curve segment intersects the box. This is the standard lakehouse
layout optimization (Delta/Iceberg expose it as OPTIMIZE ... ZORDER BY);
here it is a pure DataFrame transform: normalize -> interleave bits ->
range-repartition -> sort within partitions -> write.

Everything is a JVM-side integer expression (no UDFs): one cheap min/max
aggregate per call, then shift/mask arithmetic inside whole-stage codegen.
At 100 TB the min/max pass is a metadata-only agg over partial stats and
the layout cost is one range shuffle — paid once at write time, repaid on
every selective scan thereafter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "__z"


def zorder_key(df: DataFrame, cols: list[str], n_bits: int | None = None) -> Column:
    """Morton key over ``cols``: each column min-max-normalized to an
    ``n_bits`` integer grid, bits interleaved (column j owns bit positions
    j, j+k, j+2k, ... for k columns). Requires one driver-visible min/max
    aggregate over ``df`` — O(cols) scalars, computed from parquet partial
    aggregates when available.

    Normalization is linear; heavily skewed columns get skewed grids, which
    degrades (never breaks) skipping — pre-transform such columns (log,
    rank-bucket) before calling if that matters.
    """
    k = len(cols)
    if k < 1:
        raise ValueError("zorder_key needs at least one column")
    if n_bits is None:
        n_bits = min(16, 62 // k)
    if n_bits * k > 62:
        raise ValueError(f"{n_bits} bits x {k} cols overflows a signed 64-bit key")

    row = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).first()

    grid = (1 << n_bits) - 1
    terms: list[str] = []
    for j, c in enumerate(cols):
        mn, mx = row[f"mn_{j}"], row[f"mx_{j}"]
        span = (mx - mn) or 1.0  # constant column -> every cell 0
        scaled = (
            f"CAST(least(CAST({grid} AS DOUBLE), greatest(0.0D, "
            f"(CAST({c} AS DOUBLE) - {mn!r}D) * {grid / span!r}D)) AS BIGINT)"
        )
        for i in range(n_bits):
            terms.append(f"shiftleft(shiftright({scaled}, {i}) & 1, {i * k + j})")
    # bit positions are disjoint, so + is bitwise OR
    return F.expr(" + ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    n_bits: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of ``cols``:
    range-repartition on the z-key (contiguous curve segments per file,
    sampled range bounds — no global sort barrier), sort within each
    partition so row-group stats are tight too, drop the key, write."""
    keyed = df.withColumn(Z_COL, zorder_key(df, cols, n_bits))
    (
        keyed.repartitionByRange(n_files, Z_COL)
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
        .write.mode("overwrite")
        .parquet(path)
    )
