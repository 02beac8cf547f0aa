"""Deterministic distributed k-means over ``array<float>`` columns.

Lloyd's algorithm, Spark-first: the assignment step is a pure Column
expression (squared distances to a broadcast centroid literal via
``transform``/``aggregate`` — JVM codegen, no Python workers), and the
update step is one (cluster, dim) aggregation. Only the k×dim centroid
matrix is collected to the driver per iteration; the N-row assignment
never leaves the executors, so the loop scales with scan bandwidth.

Determinism (pytest-verified against a NumPy twin):
- init = the first k vectors ordered by ``id_col`` (no RNG);
- argmin ties break toward the lowest cluster index (``array_position``
  returns the first match);
- empty clusters keep their previous centroid.

The reference has no vector/ML surface at all (its complete operator
inventory is /root/reference/etl_connector.py:53-242, SURVEY §2.1); this
is a north-star extension (SURVEY §2.3, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sql_dist_sq(vec_sql: str, centroid: list[float]) -> str:
    """Squared L2 between a double-array expression and a literal centroid,
    as SQL text: repr(x)+'D' round-trips every double bit-exactly (incl.
    denormals and -0.0, checked in tests), and one JVM parse replaces a
    py4j round trip per float — with k x dim literals the Column-builder
    path was pure driver-side plan-construction time."""
    arr = "array(" + ",".join(f"{float(x)!r}D" for x in centroid) + ")"
    return (
        f"aggregate(zip_with({vec_sql}, {arr}, (a, b) -> (a - b) * (a - b)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def assign(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Add ``cluster`` (int, argmin of squared distance, first-match tie
    break) and ``dist_sq`` (double) columns; no shuffle."""
    cols = list(df.columns)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dists = "array(" + ",".join(_sql_dist_sq("__ev", c) for c in centroids) + ")"
    return (
        df.withColumn("__ev", v)
        .selectExpr("*", f"{dists} AS __dists")
        .selectExpr(
            *cols,
            "CAST(array_position(__dists, array_min(__dists)) - 1 AS INT)"
            " AS cluster",
            "array_min(__dists) AS dist_sq",
        )
    )


def kmeans(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 5,
) -> tuple[DataFrame, list[list[float]]]:
    """Run ``iters`` Lloyd iterations; return (assigned_df, centroids).

    ``assigned_df`` is ``df`` plus ``cluster`` / ``dist_sq`` columns under
    the final centroids. Per iteration: one distributed scan + one
    k×dim-row shuffle; driver state is the centroid matrix only.
    """
    # The loop re-reads df once per iteration (init + iters scans of the
    # same rows); cache it for the duration so iterations 2..n read
    # executor-local blocks instead of re-scanning/recomputing lineage.
    # Unpersisted after the last update; the returned frame recomputes
    # from source once, which downstream consumers pay anyway.
    df = df.persist()
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"))
        .collect()
    )
    centroids = [list(r.v) for r in init]
    dim = len(centroids[0])

    for _ in range(iters):
        assigned = assign(df, vec_col, centroids)
        # Update: per-(cluster, dim) mean via posexplode — the shuffled
        # frame is k*dim rows of partial sums, metadata-sized at any SF.
        # per-dim sums snap to DECIMAL(38,18) so the distributed aggregate
        # is order-independent and exact — run-to-run AND cross-engine
        # bit-stable (the same device as pagerank's contribution sums);
        # only the final mean division happens in double
        sums = (
            assigned.select(
                "cluster",
                F.posexplode(
                    F.transform(F.col(vec_col), lambda x: x.cast("double"))
                ).alias("pos", "x"),
            )
            .groupBy("cluster", "pos")
            .agg(
                F.sum(F.col("x").cast("decimal(38,18)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep position
        acc: dict[int, list[float]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r.cluster, [0.0] * dim)[r.pos] = float(r.s)
            cnt[r.cluster] = r.n
        for cl, vec in acc.items():
            new[cl] = [x / cnt[cl] for x in vec]
        centroids = new

    df.unpersist()
    return assign(df, vec_col, centroids), centroids
