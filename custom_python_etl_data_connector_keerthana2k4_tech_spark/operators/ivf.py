"""IVF (inverted-file) approximate nearest-neighbor search.

The scale path the brief names alongside LSH (operators/similarity.py):
a k-means coarse quantizer splits the corpus into ``n_lists`` inverted
lists; a query probes only its ``nprobe`` nearest lists and reranks
exactly inside them — searched fraction ~ nprobe/n_lists of the corpus
instead of all of it.

Spark-first layout:
- **Build** = operators/kmeans (deterministic Lloyd, JVM-side assignment)
  over the embedding column; the "index" IS the corpus DataFrame plus its
  ``cluster`` column. Write it ``partitionBy("cluster")`` and every probe
  becomes a partition-pruned scan — the inverted list read is directory
  pruning, no index service.
- **Search**: queries broadcast; centroid distances are literal-array
  expressions (no UDF); the probe set explodes to (query, cluster) pairs
  and hash-joins the index on ``cluster``; candidates rerank with the
  exact quantized-integer cosine (functions/vectors — bit-stable across
  engines) and a per-query top-k window (keyed, parallel).

Determinism: k-means init/ties are deterministic (operators/kmeans),
probe order breaks ties on list index, rerank ties on neighbor id —
re-runs are bit-identical. With ``nprobe == n_lists`` the result equals
exact ``cosine_topk`` (tested), so recall degrades ONLY through the probe
budget, never through scoring.

The reference has no vector surface (/root/reference/etl_connector.py:
53-242, SURVEY §2.2); this is a north-star extension (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.vectors import (
    cosine_from_int,
    int_dot,
    int_norm_sq,
    quantize,
)
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.kmeans import kmeans


def ivf_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int = 16,
    iters: int = 5,
) -> tuple[DataFrame, list[list[float]]]:
    """Train the coarse quantizer and assign every vector to its list.

    Returns (index DataFrame = df + ``cluster``, centroids). Persist the
    index with ``.write.partitionBy("cluster")`` so probes prune
    directories at 100 TB.
    """
    assigned, centroids = kmeans(
        df, vec_col, id_col, k=n_lists, iters=iters
    )
    return assigned.drop("dist_sq"), centroids


def _probe_lists(
    queries: DataFrame, vec_col: str, centroids: list[list[float]], nprobe: int
) -> DataFrame:
    """queries + exploded ``cluster`` column: each query's nprobe nearest
    lists (squared-distance order, list-index tie-break)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        v,
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                F.lit(i).alias("idx"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probes = F.slice(F.array_sort(dists), 1, nprobe)
    return queries.withColumn(
        "cluster", F.explode(F.transform(probes, lambda s: s["idx"]))
    )


def ivf_topk(
    index: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k by cosine: probe ``nprobe`` lists per query,
    exact quantized rerank within them.

    Returns query_id, neighbor_id, cosine, rank — same schema and
    tie-breaks as ``similarity.cosine_topk`` (equal output when
    ``nprobe == len(centroids)``).
    """
    q = _probe_lists(queries, vec_col, centroids, nprobe).select(
        F.col(id_col).alias("query_id"),
        quantize(vec_col).alias("q_vec"),
        "cluster",
    )
    q = q.withColumn("q_nsq", int_norm_sq(F.col("q_vec")))
    c = index.select(
        F.col(id_col).alias("neighbor_id"),
        quantize(vec_col).alias("c_vec"),
        "cluster",
    ).withColumn("c_nsq", int_norm_sq(F.col("c_vec")))
    scored = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_int(
                int_dot(F.col("q_vec"), F.col("c_vec")),
                F.col("q_nsq"),
                F.col("c_nsq"),
            ).alias("cosine"),
        )
        # a neighbor can appear through several probed lists only if ids
        # collide across lists — they cannot (each vector lives in ONE
        # list), so no distinct needed before the rank
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
