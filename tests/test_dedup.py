"""Dedup operator semantics (SURVEY §5.2.6): exact Jaccard vs approximate
MinHash/SimHash, planted-duplicate detection, idempotence."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.dedup import (
    content_dedup,
    jaccard_pairs,
    minhash_pairs,
    shingle_sets,
    simhash64,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank now"),  # ~1-word edit of 1
        (3, "completely different words about spark catalyst optimizer and shuffles"),
        (4, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
        (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingle_sets_ngram(spark, docs):
    sh3 = {r.id: set(r.shingles) for r in shingle_sets(docs, "doc_id", "text", n=3).collect()}
    assert "the quick brown" in sh3[1]
    assert "quick brown fox" in sh3[1]
    # doc 5 has 10 words -> 8 distinct 3-grams
    assert len(sh3[5]) == 8


def test_jaccard_pairs_exact(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert pairs[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.8  # near dup
    assert (2, 4) in pairs
    assert not any({3, 5} & {a, b} for a, b in pairs)  # unrelated docs excluded


def test_jaccard_prefix_filter_lossless(spark, sf_dir):
    """Prefix-filtered plan == naive all-pairs on real fixture data."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    d = load(spark, sf_dir, "documents").limit(200)
    fast = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(d, "doc_id", "text", threshold=0.8).collect()
    }
    sets_df = shingle_sets(d, "doc_id", "text", n=1)
    a = sets_df.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sets_df.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    naive = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / (
                    F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
                ).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )
    naive_pairs = {(r.id_a, r.id_b): r.jaccard for r in naive.collect()}
    assert fast == naive_pairs
    assert len(fast) > 0  # fixture has real near-dups

    # Both candidate strategies are lossless, not just the auto-picked one.
    for strategy in ("bitmap", "prefix"):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in jaccard_pairs(
                d, "doc_id", "text", threshold=0.8, strategy=strategy
            ).collect()
        }
        assert got == naive_pairs, f"strategy {strategy} diverged"


def test_minhash_recall(spark, sf_dir):
    """MinHash LSH must find most exact J>=0.8 pairs (it is the approximate
    scale path for q43) and all exact duplicates."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    d = load(spark, sf_dir, "documents").limit(200)
    exact = {(r.id_a, r.id_b) for r in jaccard_pairs(d, "doc_id", "text", 0.8).collect()}
    approx = {(r.id_a, r.id_b) for r in minhash_pairs(d, "doc_id", "text", 0.8).collect()}
    assert exact, "fixture should contain near-dup pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"minhash recall too low: {recall} ({len(exact)} exact pairs)"


def test_minhash_deterministic(spark, docs):
    p1 = sorted((r.id_a, r.id_b) for r in minhash_pairs(docs, "doc_id", "text", 0.5).collect())
    p2 = sorted((r.id_a, r.id_b) for r in minhash_pairs(docs, "doc_id", "text", 0.5).collect())
    assert p1 == p2
    assert (1, 4) in p1  # exact dup always found (identical signatures)


def test_simhash_semantics(spark, docs):
    h = {r.id: r.simhash for r in simhash64(docs, "doc_id", "text").collect()}
    assert h[1] == h[4]  # identical text -> identical simhash
    assert all(v >= 0 for v in h.values())  # 63-bit positive

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(h[1], h[2]) <= 8  # one-word edit flips few bits
    assert hamming(h[1], h[3]) > 8  # unrelated text is far
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(docs, "doc_id", "text", 8).collect()}
    assert pairs[(1, 4)] == 0
    assert (1, 2) in pairs


def test_content_dedup(spark, docs):
    out = content_dedup(docs, "doc_id", "text")
    ids = {r.doc_id for r in out.collect()}
    assert 1 in ids and 4 not in ids  # min doc_id survives per fingerprint
    assert ids == {1, 2, 3, 5}


def test_jaccard_prefix_open_vocabulary_planted_twins(spark):
    """The open-vocabulary regime (auto -> prefix path): a Zipf corpus where
    the bitmap kernel doesn't apply. Planted one-word-edit twins are found
    exactly — no false positives from the random bulk, no missed twins."""
    import numpy as np

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(20000)]
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    probs /= probs.sum()
    docs = []
    for i in range(4000):
        n = rng.randint(20, 60)
        words = rng.choice(len(vocab), size=n, p=probs)
        docs.append((i, " ".join(vocab[w] for w in words)))
    for i in range(200):
        base = docs[i][1].split()
        base[0] = "edited"
        docs.append((100000 + i, " ".join(base)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    out = jaccard_pairs(df, "doc_id", "text", threshold=0.8).collect()
    planted = {(r.id_a, r.id_b) for r in out if r.id_b >= 100000}
    # every twin found; the random bulk produces no J>=0.8 pairs
    assert len(planted) >= 200
    assert all(r.jaccard >= 0.8 for r in out)
    spurious = [r for r in out if r.id_b < 100000]
    assert not spurious, spurious[:5]


def test_connected_components_chain_and_clusters(spark):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.dedup import connected_components

    # chain 1-2-3 (transitive), pair 10-11, self-contained triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_near_dedup_corpus(spark, sf_dir):
    """near_dedup removes exactly the non-representative cluster members and
    is idempotent; the survivors contain no J>=threshold pair."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.dedup import near_dedup
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    d = load(spark, sf_dir, "documents").limit(300)
    out = near_dedup(d, "doc_id", "text", threshold=0.9)
    n_in, n_out = d.count(), out.count()
    assert 0 < n_out < n_in  # fixture has near-dups

    # survivors are pairwise below threshold
    leftover = jaccard_pairs(out, "doc_id", "text", threshold=0.9)
    assert leftover.count() == 0

    # idempotent
    again = near_dedup(out, "doc_id", "text", threshold=0.9)
    assert again.count() == n_out

    # equivalence with a driver-side union-find over the exact pairs
    pairs = jaccard_pairs(d, "doc_id", "text", threshold=0.9).collect()
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r.id_a), find(r.id_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    losers = {x for x in parent if find(x) != x}
    expected = {r.doc_id for r in d.collect()} - losers
    assert {r.doc_id for r in out.collect()} == expected


def test_connected_components_distributed_path_matches_local(spark):
    """Force the distributed label-propagation path (local_threshold=0) and
    check it produces exactly the local union-find labels."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (12, 11), (20, 21)],
        "id_a long, id_b long",
    )
    dist = {
        r.node: r.component
        for r in connected_components(edges, local_threshold=0).collect()
    }
    local = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert dist == local == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
    }
