"""Deduplication operator family (north-star ops, SURVEY §2.3):

- exact dedup by key / by content fingerprint (hash-groupBy)
- exact n-gram Jaccard near-dup pairs with prefix filtering (scale path)
- MinHash LSH near-dup pairs (MLlib, seeded — approximate scale path)
- SimHash 64-bit fingerprints + Hamming-distance near-dup pairs

Scale design:
- Fingerprint dedup is one hash shuffle on the digest — the canonical
  100 TB dedup (same shape as the reference's key upsert, R8).
- Jaccard pairs use *prefix filtering*: for J >= tau, two sets must share
  at least one of their ``floor((1-tau)*|S|)+1`` rarest shingles under a
  global (freq, shingle) canonical order, and sizes must satisfy
  ``|A| >= tau*|B|``. This turns the all-pairs O(n^2) into a join on rare
  shingles only — no false negatives, exact verification on candidates.
- MinHash/SimHash are the sub-quadratic approximate paths; both are
  seeded/deterministic and pytest-verified against the exact method.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.text import fingerprint, words


def exact_dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact dedup by columns (hash-groupBy keep-any; deterministic variant
    is dedup_last_write_wins in operators/upsert.py)."""
    return df.dropDuplicates(subset)


def content_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id document per content fingerprint (md5 of
    normalized text). One shuffle on the digest."""
    w = Window.partitionBy("__fp").orderBy(F.col(id_col))
    return (
        df.withColumn("__fp", fingerprint(text_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 1) -> DataFrame:
    """(id, shingles array<string>) with distinct word n-gram shingles.

    n=1 -> distinct-word sets; n>=2 -> sliding word n-grams.
    """
    ws = words(text_col)
    if n == 1:
        sh = F.array_distinct(ws)
    else:
        # sliding n-grams via index sequence (JVM-side, no UDF)
        sh = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(-1))),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(n)]
                ),
            )
        )
    return df.select(F.col(id_col).alias("id"), sh.alias("shingles")).filter(
        F.size("shingles") > 0
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    n: int = 1,
) -> DataFrame:
    """Exact Jaccard near-duplicate pairs (id_a < id_b, jaccard >= threshold)
    via prefix filtering + exact verification.

    Returns columns: id_a, id_b, n_common, n_a, n_b, jaccard.
    jaccard is a single double division of exact integers — deterministic.
    """
    sets_df = shingle_sets(df, id_col, text_col, n=n).persist()

    # Global canonical order: rarest shingle first (freq asc, shingle asc).
    freq = (
        sets_df.select(F.explode("shingles").alias("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("freq"))
    )

    exploded = sets_df.select(
        "id", F.size("shingles").alias("sz"), F.explode("shingles").alias("sh")
    ).join(F.broadcast(freq), "sh")
    rank_w = Window.partitionBy("id").orderBy("freq", "sh")
    # Prefix length floor((1-tau)*|S|)+1: any pair with J >= tau must share
    # a shingle inside both prefixes (pigeonhole on the canonical order).
    prefixes = exploded.withColumn("pos", F.row_number().over(rank_w)).filter(
        F.col("pos") <= F.floor(F.lit(1.0 - threshold) * F.col("sz")) + 1
    )

    a = prefixes.select(
        F.col("id").alias("id_a"), F.col("sz").alias("n_a"), F.col("sh").alias("sh")
    )
    b = prefixes.select(
        F.col("id").alias("id_b"), F.col("sz").alias("n_b"), F.col("sh").alias("sh")
    )
    candidates = (
        a.join(b, "sh")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # size filter: J >= tau implies tau*|B| <= |A| (for |A| <= |B|)
            & (F.col("n_a") >= F.ceil(F.lit(threshold) * F.col("n_b")))
            & (F.col("n_b") >= F.ceil(F.lit(threshold) * F.col("n_a")))
        )
        .select("id_a", "id_b")
        .distinct()
    )

    sa = sets_df.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sets_df.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_common"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )
    return verified


def minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    num_hash_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate Jaccard near-dup pairs via MLlib MinHashLSH (seeded).

    Words are hashed into a sparse binary vector (HashingTF), then
    ``approxSimilarityJoin`` with distance threshold ``1 - threshold``
    (MinHash distance = 1 - estimated Jaccard). Sub-quadratic: candidates
    come from LSH band buckets, not all pairs.

    Returns: id_a, id_b, jaccard_est (double). Approximate — no SQL oracle;
    verified against jaccard_pairs in tests/test_dedup.py.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sets_df = shingle_sets(df, id_col, text_col, n=1)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(sets_df).filter(F.size("shingles") > 0)

    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = mh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, distCol="dist", threshold=1.0 - threshold
    )
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            (1.0 - F.col("dist")).alias("jaccard_est"),
        )
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """63-bit SimHash fingerprint per document (bigint, deterministic via
    xxhash64 word hashes).

    Bit j of the fingerprint is 1 iff the sum over distinct words of
    sign(bit j of xxhash64(word)) is positive. Near-duplicate word sets
    flip few bits. Implementation is explode + two hash-partitioned
    aggregations — linear in tokens, no pairwise work.
    """
    nbits = 63  # keep the sign bit clear so the result is a positive bigint
    word_df = shingle_sets(df, id_col, text_col, n=1).select(
        "id", F.explode("shingles").alias("w")
    )
    bits = word_df.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(nbits - 1))).alias("j"),
        F.xxhash64("w").alias("h"),
    ).select(
        "id",
        "j",
        # shiftright with a column shift amount needs the SQL form
        F.expr("CASE WHEN (shiftright(h, j) & 1) = 1 THEN 1 ELSE -1 END").alias("sign"),
    )
    per_bit = bits.groupBy("id", "j").agg(F.sum("sign").alias("s"))
    return per_bit.groupBy("id").agg(
        F.sum(
            F.expr(
                "CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), j)"
                " ELSE CAST(0 AS BIGINT) END"
            )
        ).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs whose SimHash Hamming distance <= max_hamming.

    Candidate generation: split the 63-bit hash into ``max_hamming + 1``
    bands — a pair within the distance bound must match exactly on at least
    one band (pigeonhole), so the join is on (band_idx, band_bits), not all
    pairs. Exact Hamming verification on candidates.
    """
    hashes = simhash64(df, id_col, text_col).persist()
    n_bands = max_hamming + 1
    width = 63 // n_bands + 1

    bands = hashes.select(
        "id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_bits",
        F.expr(f"shiftright(simhash, band * {width}) & {(1 << width) - 1}"),
    )
    a = bands.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("h_a"), "band", "band_bits"
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("h_b"), "band", "band_bits"
    )
    cands = (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
