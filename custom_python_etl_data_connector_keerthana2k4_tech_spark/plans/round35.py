"""Round-35 additions: the retrieval stores' batch paths complete their
production contracts —

- q399 BATCH time travel: q397 pins a generation for ONE query;
  reproducible batch evals over a mutating index previously had to loop
  single queries. ``ranked_bm25_table(as_of_gen=)`` now serves the whole
  query TABLE from a retained generation (postings + doclen legs pin
  together).
- q400 PER-QUERY RANGE bands in batch filtered ANN: q395's constraints
  are exact-match equality only; real filtered ANN wants per-query
  numeric bands (price ∈ [lo, hi], date ≥ cutoff). A (query_id, lo, hi)
  frame joins into the candidate stream and the band rides the cluster
  equi-join as a residual — candidates outside a query's band drop IN
  the join, before scoring, volume still bounded by the probed lists.

Reference parity: /root/reference/etl_connector.py has no query surface
at all (evidence of absence, SURVEY §0) — north-star extension territory.
"""

from __future__ import annotations

import tempfile

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
    _pq_codebook,
    ivfpq_adc_ctes,
)
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round33 import (
    _QT_TOPK,
    _qt_bm25_ctes,
    _qt_frame,
)
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round34 import _MUT_DEL, _MUT_UPS
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# q399: batch (query-table) BM25 served from a PINNED generation
# ---------------------------------------------------------------------------


@query(
    "q399_batch_time_travel_bm25",
    oracle=f"""
    WITH {_qt_bm25_ctes(_QT_TOPK)}
    SELECT query_id, doc_id, bm25, n_terms_hit, rank FROM qcut
    """,
)
def q399_batch_time_travel_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q397's BATCH sibling: build the postings store, capture the live
    generation, mutate the index (the q396/q397 slices — upsert text
    edits + delete, two CAS generation flips), then rank the whole
    q389 query TABLE ``as_of_gen`` the PRE-mutation generation in ONE
    batch plan (tf/df shared across queries, the per-term df join
    AQE-sized — q389's shape, just pinned). The oracle is q389's exact
    batch-BM25 derivation over the ORIGINAL corpus: a mutation leaking
    into the retained generation, or a doclen/postings leg pinning to
    DIFFERENT generations, is a value mismatch. Batch-vs-single-loop
    equality at the pinned generation is additionally pinned in
    tests/test_store_durability.py."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings_store import (
        PostingsStore,
    )

    docs = load(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="q399_batch_tt_") + "/ix"
    store = PostingsStore.build(spark, docs, "doc_id", "text", root, n_buckets=16)
    g0 = store.current_gen()
    store.upsert(
        docs.filter(F.col("doc_id") % _MUT_UPS == 5).withColumn(
            "text", F.concat(F.lit("fused rank "), F.col("text"))
        )
    )
    store.delete(docs.filter(F.col("doc_id") % _MUT_DEL == 4).select("doc_id"))
    return store.ranked_bm25_table(_qt_frame(spark), topk=_QT_TOPK, as_of_gen=g0)


# ---------------------------------------------------------------------------
# q400: batch filtered ANN with PER-QUERY numeric range bands
# ---------------------------------------------------------------------------

_BAND_MOD = 2  # query's band: label ∈ [query_id % 2, query_id % 2 + 1]


@query(
    "q400_batch_range_filtered_ann",
    oracle=f"""
    WITH {ivfpq_adc_ctes(
        "JOIN embeddings emb ON emb.vec_id = a.vec_id"
        f" AND emb.label >= (qp.query_id % {_BAND_MOD})"
        f" AND emb.label <= (qp.query_id % {_BAND_MOD}) + 1"
    )}
    SELECT query_id, neighbor_id, CAST(cluster AS INT) AS cluster,
           CAST(rk AS INT) AS rank, adc_dist
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, neighbor_id) AS rk
      FROM adc
    ) WHERE rk <= {_PQ_TOPK}
    """,
)
def q400_batch_range_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch filtered vector search with PER-QUERY RANGE constraints as
    DATA (q395 is the exact-match sibling): each query carries its own
    inclusive numeric band in a (query_id, label_lo, label_hi) frame,
    the bands equi-join into the query side on query_id and ride the
    cluster join as RESIDUAL conditions (operators/pq.adc_join_topk
    3-tuple pair_filters — candidates outside a query's band drop in the
    join, before scoring, never via a crossJoin), and each query's
    top-k is the best k among ITS in-band candidates in ITS probed
    lists (post-filter IVF semantics per query). The query side is the
    round-32 distributed JOIN mode — O(n_lists) driver state at any Q,
    PartitionFilters pruning intact. The oracle replays training,
    probes, codes, ADC sums, AND each query's own band. Row-identical
    to looping ``query(where="label BETWEEN lo AND hi")`` per query
    (pinned in tests/test_store_durability.py)."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.pq_store import IVFPQStore

    e = load(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="q400_band_ann_") + "/ix"
    store = IVFPQStore.build(
        spark, e, "vec_id", "embedding", root,
        n_lists=_IVF_LISTS, km_iters=_IVF_ITERS, m=_PQ_M, k_centroids=_PQ_K,
        centroids=_coarse_centroids(spark, sf_dir),
        codebook=_pq_codebook(spark, sf_dir),
        attr_cols=["label"],
    )
    qdf = e.filter(F.col("vec_id") < _PQ_NQ)
    bands = qdf.select(
        F.col("vec_id").alias("query_id"),
        (F.col("vec_id") % _BAND_MOD).cast("int").alias("label_lo"),
        ((F.col("vec_id") % _BAND_MOD) + 1).cast("int").alias("label_hi"),
    )
    return store.query(
        qdf, nprobe=_IVF_NPROBE, topk=_PQ_TOPK,
        query_mode="join", attr_ranges=bands,
    )
