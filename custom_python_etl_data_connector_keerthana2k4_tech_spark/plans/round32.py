"""Round-32 additions: the distributed query side for vector search.

q382 runs the SAME IVF-PQ search as q374 but with ``query_mode="join"``
(operators/pq.encode_queries_join): the query set stays a DataFrame end
to end — probe selection (left-fold double chains + stable struct sort),
per-query ADC tables, candidate gating, and the exact audit all compute
JVM-side with O(1) driver state. This is the 100 TB shape for query sets
that are themselves tables (Q ~ 10^6; tests/test_pq_join.py drives
Q = 100,000 from a table); the literal path remains the right tool for
interactive / audit-sample query sets. Because the two modes are
row-identical by construction (pinned in tests), q382 shares q374's
full-replay DuckDB oracle — training, probes, codes, ADC sums, and the
exact audit distances must all match bit for bit.

Reference parity: /root/reference/etl_connector.py has no vector surface
(evidence of absence, SURVEY §0) — north-star extension territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round29 import (
    _IVF_ITERS,
    _IVF_LISTS,
    _IVF_NPROBE,
    _PQ_K,
    _PQ_M,
    _PQ_NQ,
    _PQ_TOPK,
    _coarse_centroids,
    _ivfpq_oracle,
    _pq_codebook,
)
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


@query("q382_ivfpq_join_query", oracle=_ivfpq_oracle())
def q382_ivfpq_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q374's IVF-PQ search with the DISTRIBUTED query side: queries stay
    a DataFrame (no driver collect, no literal plans) — encoded to ADC
    tables and probe lists in one JVM projection, equi-joined to the
    coded corpus on cluster, ranked per query, exact audit attached by
    joining survivors back to the raw vectors. Driver state is the
    trained parameters only, independent of Q. The oracle is q374's full
    replay — both engines must agree on every approximate neighbor, its
    source list, AND the exact audit distance."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.pq import ivfpq_topk

    e = load(spark, sf_dir, "embeddings")
    queries_df = e.filter(F.col("vec_id") < _PQ_NQ)
    return ivfpq_topk(
        e, queries_df, "vec_id", "embedding",
        n_lists=_IVF_LISTS, km_iters=_IVF_ITERS, nprobe=_IVF_NPROBE,
        m=_PQ_M, k_centroids=_PQ_K, topk=_PQ_TOPK,
        centroids=_coarse_centroids(spark, sf_dir),
        codebook=_pq_codebook(spark, sf_dir),
        query_mode="join",
    )


# ---------------------------------------------------------------------------
# q383: perceptual-hash (aHash) multimodal near-dup
# ---------------------------------------------------------------------------

_PH_MAX_HAMMING = 16


@query(
    "q383_phash_neardup",
    oracle=f"""
    WITH img AS (
      SELECT doc_id, text, length(text) AS L FROM documents WHERE doc_id % 3 = 0
    ),
    cells AS (
      SELECT doc_id,
             unnest(list_transform(range(L), i -> struct_pack(
               cell := CAST(i * 63 // L AS INT),
               b := ord(substring(text, CAST(i + 1 AS INT), 1))))) AS cb
      FROM img
    ),
    g AS (
      SELECT doc_id, cb.cell AS cell, sum(cb.b) // count(*) AS g
      FROM cells GROUP BY 1, 2
    ),
    tot AS (SELECT doc_id, sum(g) AS sg FROM g GROUP BY 1),
    h AS (
      SELECT g.doc_id,
             CAST(sum(CASE WHEN 63 * g.g > tot.sg
                           THEN 1::BIGINT << g.cell ELSE 0 END) AS BIGINT)
               AS ahash
      FROM g JOIN tot USING (doc_id) GROUP BY 1
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ahash, b.ahash)) <= {_PH_MAX_HAMMING}
    """,
)
def q383_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate IMAGE pairs — the media half of
    corpus dedup (text has exact/MinHash/SimHash/SemDeDup; this covers
    the ``media`` BinaryType columns themselves). Pipeline: the
    multimodal asset table's image payloads hash to 63-bit aHash
    fingerprints in one Arrow-batched mapInPandas stage
    (multimodal/ops.ahash_assets — the deterministic SGMM decode, so the
    fingerprint is itself SQL-replayable, the q50 device), then pairs
    within Hamming {_PH_MAX_HAMMING} mine via the same pigeonhole-
    lossless banded join as SimHash (operators/dedup.hamming_band_pairs)
    — so the banded Spark result must equal DuckDB's brute-force
    all-pairs replay exactly. At 100 TB: payloads are touched once
    (fingerprints are 8 bytes/image), and all pairwise work happens on
    banded fingerprints. The reference has no media surface at all
    (/root/reference/etl_connector.py, SURVEY §0)."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.multimodal import assets_from_documents
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.multimodal.ops import phash_neardup_pairs

    d = load(spark, sf_dir, "documents")
    return phash_neardup_pairs(
        assets_from_documents(d), max_hamming=_PH_MAX_HAMMING
    )
