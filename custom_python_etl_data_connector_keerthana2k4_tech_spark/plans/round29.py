"""Round-29 additions: product-quantization ANN under the oracle gate.

q372 runs the PQ half of the IVF-PQ vector-search recipe
(``operators/pq.py``): hash-sampled per-subspace codebooks, one-byte
codes per subspace, asymmetric-distance (ADC) top-k, exact audit rerank
— with every step in exact BIGINT arithmetic over 1e-6-quantized
components, so the APPROXIMATE search result itself is bit-reproducible
in DuckDB (the q358/q359 determinism pattern). The reference has no
vector surface (/root/reference/etl_connector.py, evidence of absence,
SURVEY §0); this is north-star extension territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.text import sql_hex_hash60
from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.vectors import sql_quantize
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

_PQ_M = 4  # subspaces
_PQ_K = 8  # centroids per subspace
_PQ_SUB = 16  # dims per subspace (64 / 4)
_PQ_DIM = 64
_PQ_TOPK = 10
_PQ_NQ = 3  # query vectors: vec_id < 3

_SQ_SUB = (
    f"CAST(list_sum(list_transform(range({_PQ_SUB}), "
    f"i -> (s[i+1]-c[i+1])*(s[i+1]-c[i+1]))) AS BIGINT)"
)


@query(
    "q372_pq_ann",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, {sql_quantize('embedding')} AS qv FROM embeddings
    ),
    hashed AS (
      SELECT vec_id, qv, {sql_hex_hash60("CAST(vec_id AS VARCHAR)")} AS h FROM v
    ),
    seeds AS (
      SELECT vec_id, qv, row_number() OVER (ORDER BY h, vec_id) - 1 AS j
      FROM hashed
      QUALIFY j < {_PQ_K}
    ),
    cb AS (
      SELECT m, j, list_slice(qv, m * {_PQ_SUB} + 1, (m + 1) * {_PQ_SUB}) AS c
      FROM seeds, range({_PQ_M}) mm(m)
    ),
    subv AS (
      SELECT vec_id, m, list_slice(qv, m * {_PQ_SUB} + 1, (m + 1) * {_PQ_SUB}) AS s
      FROM v, range({_PQ_M}) mm(m)
    ),
    dist AS (
      SELECT vec_id, m, j, {_SQ_SUB} AS d
      FROM subv JOIN cb USING (m)
    ),
    codes AS (
      SELECT vec_id, m, j FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
        FROM dist) t
      WHERE rn = 1
    ),
    qd AS (
      SELECT vec_id AS query_id, m, j, d FROM dist WHERE vec_id < {_PQ_NQ}
    ),
    adc AS (
      SELECT qd.query_id, c.vec_id AS neighbor_id,
             CAST(sum(qd.d) AS BIGINT) AS adc_dist
      FROM codes c JOIN qd ON qd.m = c.m AND qd.j = c.j
      WHERE c.vec_id <> qd.query_id
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, neighbor_id, adc_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, neighbor_id) AS rk
      FROM adc
    )
    SELECT r.query_id, r.neighbor_id, CAST(r.rk AS INT) AS rank, r.adc_dist,
           CAST(list_sum(list_transform(range({_PQ_DIM}),
                i -> (vq.qv[i+1]-vn.qv[i+1])*(vq.qv[i+1]-vn.qv[i+1])))
                AS BIGINT) AS exact_dist
    FROM ranked r
    JOIN v vq ON vq.vec_id = r.query_id
    JOIN v vn ON vn.vec_id = r.neighbor_id
    WHERE r.rk <= {_PQ_TOPK}
    """,
)
def q372_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-k with exact audit distances. The Spark
    plan is one narrow projection over the table (codes + ADC lookups
    are literal-array expressions — no join, no explode) followed by a
    per-query top-k; the DuckDB oracle re-derives the same codebook,
    codes, and ranks from the parquet, so both engines must agree on
    every approximate neighbor, not just the exact rerank."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.pq import pq_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < _PQ_NQ)
    return pq_topk(
        e, queries, "vec_id", "embedding",
        m=_PQ_M, k_centroids=_PQ_K, topk=_PQ_TOPK,
    )
