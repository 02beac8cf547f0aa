"""Scale smoke tests: multi-million-row synthetic inputs with closed-form
answers, driving the heaviest operator families end to end.

These are the "1000x" guards behind SCALE.md: every frame is generated
distributed from ``spark.range`` (no fixture dependency, nothing
driver-side), the operator under test runs its real plan, and the
assertion is an exact analytic invariant — so a plan that silently
collapses to a single task, collects the column, or drops rows at scale
fails loudly here while staying CI-fast (each test is seconds, not
minutes, at local[32]).

The reference never faces this question (it tops out at 5,000 records
per run, /root/reference/etl_connector.py:139-146); these tests exist
because the engine claims 100 TB shapes and has to demonstrate them at
the largest size the harness affords.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.quantiles import exact_quantiles
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.ranks import with_global_rank
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.upsert import (
    dedup_last_write_wins,
    upsert_dataframe,
)


def test_lww_dedup_5m_rows_1m_keys(spark):
    """max_by last-write-wins over 5M rows / 1M keys: the winner for key
    j is exactly version 4_000_000 + j, so the survivor count AND the
    version checksum are closed-form."""
    n, k = 5_000_000, 1_000_000
    df = spark.range(n).select(
        (F.col("id") % k).alias("key"),
        F.col("id").alias("ver"),
        (F.col("id") * 2 + 1).alias("payload"),
    )
    out = dedup_last_write_wins(df, "key", ["ver"])
    agg = out.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("ver").alias("s"),
        F.sum("payload").alias("p"),
    ).collect()[0]
    assert agg["c"] == k
    expected_vers = k * (n - k) + (k - 1) * k // 2
    assert agg["s"] == expected_vers
    assert agg["p"] == 2 * expected_vers + k  # payload = 2*ver + 1


def test_global_rank_5m_permutation(spark):
    """Distributed row_number over a 5M-row Knuth-hash permutation (an
    odd multiplier mod 2^32 is a bijection, so values are distinct):
    ranks must be exactly the permutation 1..n, anchored to the true min
    and max of the value column."""
    n = 5_000_000
    df = spark.range(n).select(
        F.col("id").alias("i"),
        ((F.col("id") * F.lit(2654435761)) % F.lit(2**32)).alias("v"),
    )
    ranked = with_global_rank(df, [F.col("v")], out="r")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("r").alias("s"),
        F.countDistinct("r").alias("d"),
        F.min_by("v", "r").alias("v_first"),
        F.max_by("v", "r").alias("v_last"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    ).collect()[0]
    assert agg["c"] == n
    assert agg["s"] == n * (n + 1) // 2
    assert agg["d"] == n  # distinct + sum => exactly {1..n}
    assert agg["v_first"] == agg["v_min"]
    assert agg["v_last"] == agg["v_max"]


def test_exact_quantiles_10m_uniform(spark):
    """Exact distributed quantiles over range(10M): every order statistic
    IS its rank, so percentile_cont has a closed form at any p."""
    n = 10_000_000
    df = spark.range(n).select(F.col("id").cast("double").alias("x"))
    probs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = exact_quantiles(df, "x", probs)
    for p, g in zip(probs, got):
        assert g == pytest.approx((n - 1) * p, abs=1e-5)


def test_upsert_2m_existing_2m_batch(spark):
    """Keyed upsert at 2M existing rows with a half-overlapping 2M batch:
    updates replace (batch wins ties by priority), inserts append —
    counts and checksums are closed-form."""
    n = 2_000_000
    existing = spark.range(n).select(
        F.col("id").alias("key"), F.lit(0).alias("ver"), F.col("id").alias("val")
    )
    # evens 0..2n collide on n keys and add n/2 fresh keys above n
    batch = spark.range(n).select(
        (F.col("id") * 2).alias("key"), F.lit(1).alias("ver"),
        (F.col("id") * 2 + 7).alias("val"),
    )
    out = upsert_dataframe(existing, batch, "key", ["ver"])
    agg = out.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("ver").alias("vsum"),
        F.sum(F.when(F.col("key") % 2 == 0, F.col("val"))).alias("even_val"),
    ).collect()[0]
    # keys: 0..n-1 (odd half keep ver=0) plus evens n..2n-2 inserted
    assert agg["c"] == n + n // 2
    assert agg["vsum"] == n  # every even key (n of them) carries ver=1
    # every even key e in {0,2,..,2n-2} now holds val = e + 7
    assert agg["even_val"] == n * (n - 1) + 7 * n


def test_minhash_planted_dups_100k_docs(spark):
    """MinHash LSH at 100k synthetic docs: 500 planted exact duplicates
    must ALL surface (identical signatures collide in every band); the
    10-word random-hex vocabulary makes chance collisions negligible."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.dedup import minhash_pairs

    n, planted = 100_000, 500
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(9)),
                lambda j: F.substring(
                    F.md5((F.col("id") * 10 + j).cast("string")), 1, 8
                ),
            ),
        ).alias("text"),
    )
    dups = (
        spark.range(planted)
        .select(F.col("id").alias("src"))
        .join(base, F.col("src") == F.col("doc_id"))
        .select((F.col("doc_id") + n).alias("doc_id"), "text")
    )
    docs = base.unionByName(dups)
    pairs = minhash_pairs(docs, "doc_id", "text", threshold=0.9)
    found = {
        (r["id_a"], r["id_b"])
        for r in pairs.select("id_a", "id_b").collect()
    }
    expected = {(i, i + n) for i in range(planted)}
    assert expected <= found


@pytest.mark.slow
def test_exact_l2_topk_200k_line_closed_form(spark):
    """Sharded brute-force exact-L2 top-k over 200k synthetic vectors on
    a line (every dim = i*1e-4, so quantized dist(i,j) = 16*(100(i-j))^2
    exactly): interior query i's top-2 must be {i-1 (rank 1, lower id on
    the tie), i+1}, and the distances must equal the closed form. Q=130
    queries crosses two shard boundaries (3 union branches at the default
    batch of 64), so the sharded plan itself is what's being driven."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.pq import exact_l2_topk

    n, dim = 200_000, 16
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array_repeat((F.col("id") * 1e-4).cast("float"), dim).alias(
            "embedding"
        ),
    )
    q_ids = list(range(1000, 1130))  # interior: i-1 and i+1 both exist
    queries = vecs.filter(F.col("vec_id").isin(q_ids))
    out = exact_l2_topk(
        vecs, queries, "vec_id", "embedding", topk=2
    ).collect()
    assert len(out) == 2 * len(q_ids)
    got = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["exact_dist"]) for r in out}
    unit = dim * 100 * 100  # dist of adjacent points
    for i in q_ids:
        assert got[(i, 1)] == (i - 1, unit)
        assert got[(i, 2)] == (i + 1, unit)


def test_pq_topk_200k_exact_audit_consistent(spark):
    """pq_topk over the same 200k line corpus: the APPROXIMATE ranking
    may pick any neighbors (sampled codebook), but every returned row's
    exact audit distance must equal the quantized-column distance
    recomputed independently for that (query, neighbor) pair — a wrong
    code table, a mis-aligned stack, or a query/neighbor mixup all break
    this invariant at scale. (No float closed form: float32 components
    drift off the 1e-6 grid at large i, so the ground truth is the
    quantized frame itself.)"""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.vectors import quantize
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.pq import pq_topk

    n, dim, topk = 200_000, 16, 3
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array_repeat((F.col("id") * 1e-4).cast("float"), dim).alias(
            "embedding"
        ),
    )
    queries = vecs.filter(F.col("vec_id").isin([0, 77_777, 199_999]))
    out = pq_topk(
        vecs, queries, "vec_id", "embedding", m=4, k_centroids=8, topk=topk
    )
    qv = vecs.select("vec_id", quantize("embedding").alias("qv"))
    recomputed = (
        out.join(qv.withColumnRenamed("vec_id", "query_id").withColumnRenamed("qv", "qa"), "query_id")
        .join(qv.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed("qv", "qb"), "neighbor_id")
        .withColumn(
            "expected",
            F.aggregate(
                F.zip_with("qa", "qb", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
    )
    rows = recomputed.collect()
    assert len(rows) == 3 * topk
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["exact_dist"] == r["expected"], (
            r["query_id"], r["neighbor_id"])
    assert sorted(per_q) == [0, 77_777, 199_999]
    assert all(len(v) == topk for v in per_q.values())
