"""Similarity search over embedding columns (north-star ops, SURVEY §2.3):

- ``cosine_topk``      : exact brute-force top-k (the correctness baseline)
- ``lsh_topk``         : sign-random-projection LSH bucketed top-k (scale path)
- ``embedding_neardup``: near-duplicate pairs above a cosine threshold,
                         blocked by a partition column (IVF-style)

Cross-engine determinism: quantized-integer dot products
(functions/vectors.py) — exact, order-independent, identical in DuckDB.

Scale design (100 TB):
- Brute force is O(Q x N): fine for small query sets (Q broadcast, one pass
  over N, per-partition top-k heaps via window rank). For all-pairs use the
  blocked/LSH variants.
- LSH buckets candidates by hyperplane sign bits: multiple tables union'd,
  exact re-rank inside buckets only — sub-linear candidate volume.
- Blocked near-dup joins within blocks only: quadratic in the block, not
  the table.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.vectors import (
    cosine_from_int,
    int_dot,
    int_norm_sq,
    quantize,
)


def _with_quantized(df: DataFrame, vec_col: str) -> DataFrame:
    q = quantize(vec_col)
    return df.withColumn("__q", q).withColumn("__nsq", int_norm_sq(F.col("__q")))


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact top-k nearest neighbours by cosine for each query vector.

    ``queries`` is a (small) frame with the same ``id_col``/``vec_col``;
    it is broadcast, so the cost is one scan of ``df`` with per-partition
    partial top-k (window rank after a narrow crossJoin).

    Returns: query_id, neighbor_id, cosine, rank (rank 1..k, ties broken
    by neighbor_id — fully deterministic).
    """
    qdf = _with_quantized(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__q").alias("q_vec"),
        F.col("__nsq").alias("q_nsq"),
    )
    cdf = _with_quantized(df, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__q").alias("c_vec"),
        F.col("__nsq").alias("c_nsq"),
    )
    scored = (
        cdf.crossJoin(F.broadcast(qdf))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_int(
                int_dot(F.col("q_vec"), F.col("c_vec")), F.col("q_nsq"), F.col("c_nsq")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> list[list[list[float]]]:
    """Deterministic Gaussian hyperplanes [table][plane][dim] (fixed seed)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_tables, n_planes, dim).astype(float).tolist()


def _bucket_col(vec: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-bit bucket id of ``vec`` (array<double/float>) for one table."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: sign-random-projection LSH candidate generation,
    exact quantized-cosine re-rank within the union of bucket matches.

    Candidates = vectors sharing a bucket with the query in >= 1 of
    ``n_tables`` tables (each table = ``n_planes`` sign bits). Sub-linear:
    each query touches ~N * n_tables / 2^n_planes candidates in expectation.
    Approximate -> no SQL oracle; recall is pytest-verified with planted
    near-duplicates (tests/test_similarity.py).
    """
    tables = hyperplanes(dim, n_planes, n_tables, seed)

    def with_buckets(frame: DataFrame, idal: str) -> DataFrame:
        out = _with_quantized(frame, vec_col).select(
            F.col(id_col).alias(idal), F.col("__q").alias(f"{idal}_vec"),
            F.col("__nsq").alias(f"{idal}_nsq"), F.col(vec_col).alias("__raw")
        )
        rows = []
        for t, planes in enumerate(tables):
            rows.append(
                out.select(
                    idal, f"{idal}_vec", f"{idal}_nsq",
                    F.lit(t).alias("table"),
                    _bucket_col(F.col("__raw"), planes).alias("bucket"),
                )
            )
        res = rows[0]
        for r in rows[1:]:
            res = res.unionByName(r)
        return res

    qb = with_buckets(queries, "query_id")
    cb = with_buckets(df, "neighbor_id")
    cands = (
        qb.join(cb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_id_vec", "query_id_nsq",
                "neighbor_id", "neighbor_id_vec", "neighbor_id_nsq")
        .distinct()
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine_from_int(
            int_dot(F.col("query_id_vec"), F.col("neighbor_id_vec")),
            F.col("query_id_nsq"),
            F.col("neighbor_id_nsq"),
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_neardup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Near-duplicate embedding pairs (cosine >= threshold) within blocks
    (IVF-style: quadratic in the block, not the table).

    Returns: id_a, id_b, block, cosine (id_a < id_b).
    """
    q = _with_quantized(df, vec_col).select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id"),
        F.col("__q").alias("vec"),
        F.col("__nsq").alias("nsq"),
    )
    a = q.select(
        "block", F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("nsq").alias("nsq_a")
    )
    b = q.select(
        "block", F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("nsq").alias("nsq_b")
    )
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "block",
            cosine_from_int(
                int_dot(F.col("vec_a"), F.col("vec_b")), F.col("nsq_a"), F.col("nsq_b")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
