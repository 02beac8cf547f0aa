"""Round-26 additions: the data-MIXING and serving-prep layer of a
training pipeline — what happens after curation (rounds 1-25) and before
the trainer reads bytes:

- q361 temperature-scaled source sampling weights (the "data mixture"
  knob: weight ~ n_tokens^alpha with alpha=1/2, normalized) plus the
  per-source epoch count a fixed token budget implies;
- q362 duplicate-span coverage: per document, the share of its word
  8-grams that also occur in OTHER documents — the span-level dedup
  score (Lee et al. 2022 exact-substring signal at the n-gram grain);
- q363 type-token statistics per source (TTR, hapax share, Heaps-style
  log ratio) — the vocabulary-growth profile behind "will more of this
  source keep paying?";
- q364 length-bucketed batch packing audit: padding waste per bucket
  under bucket-local batching (the serving/inference answer to q39's
  training-side packing);
- q365 character-distribution entropy per source (compressibility /
  noisiness screen at the cheapest possible grain);
- q366 deterministic training-order shuffle: global hash-order positions
  via the distributed rank operator, audited per source for mixing
  uniformity (no single-task sort).

The reference computes none of this (complete operator surface:
/root/reference/etl_connector.py:53-242; SURVEY §2.1-2.2). All six are
oracle-paired (DuckDB) and auto-gated by tests/test_oracle.py.

Cross-engine determinism: counts are exact BIGINTs; the only floats are
single divisions / sqrt / log of identical integers (and one
sum-of-sqrt over the handful of sources, far inside the 1e-6 gate);
q366's shuffle key is the hex_hash60 cross-engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions import text as TXT
from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.text import hex_hash60
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# q361: temperature-scaled source mixture weights
# ---------------------------------------------------------------------------

_MIX_BUDGET = 1_000_000  # token budget the epoch column is computed against


@query(
    "q361_source_mixture_weights",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum({TXT.sql_word_count('text')}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), t AS (
      SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS z FROM s
    )
    SELECT source, n_docs, n_tokens,
           sqrt(CAST(n_tokens AS DOUBLE)) / t.z AS weight,
           {_MIX_BUDGET} * (sqrt(CAST(n_tokens AS DOUBLE)) / t.z)
             / CAST(n_tokens AS DOUBLE) AS epochs
    FROM s CROSS JOIN t
    """,
)
def q361_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights over sources: w_s ~ n_s^(1/2)
    normalized (alpha = 1/2, the standard up-weighting of small sources in
    multi-corpus pretraining; sqrt keeps the power cross-engine exact),
    plus the EPOCH count a fixed token budget implies per source — epochs
    far above ~4 flag sources the mixture would over-repeat. Scale: one
    map-side-combinable aggregate to per-source token counts (a
    metadata-sized frame), then a broadcast of the one-row normalizer —
    no second pass over the corpus. Reference has no aggregation surface
    (SURVEY §2.1)."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(TXT.words("text"))).cast("long").alias("n_tokens"),
    )
    sq = F.sqrt(F.col("n_tokens").cast("double"))
    t = s.agg(F.sum(sq).alias("z"))
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_tokens",
        (sq / F.col("z")).alias("weight"),
        (
            F.lit(_MIX_BUDGET) * (sq / F.col("z")) / F.col("n_tokens").cast("double")
        ).alias("epochs"),
    )


# ---------------------------------------------------------------------------
# q362: duplicate-span coverage (cross-document shared 8-grams)
# ---------------------------------------------------------------------------

_SPAN_N = 8


@query(
    "q362_duplicate_span_coverage",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, {TXT.sql_words('text')} AS t FROM documents
    ), g AS (
      SELECT doc_id, source, array_to_string(t[i:i + {_SPAN_N - 1}], ' ') AS gram
      FROM d, unnest(generate_series(1, len(t) - {_SPAN_N - 1})) s(i)
      WHERE len(t) >= {_SPAN_N}
    ), shared AS (
      SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT g.doc_id, any_value(g.source) AS source,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (shared.gram IS NOT NULL) AS BIGINT)
             AS n_shared,
           CAST(count(*) FILTER (shared.gram IS NOT NULL) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS coverage
    FROM g LEFT JOIN shared ON g.gram = shared.gram
    GROUP BY g.doc_id
    """,
)
def q362_duplicate_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication score: per document, the fraction of its
    word {n}-gram occurrences that also occur in at least one OTHER
    document — the n-gram-grain form of exact-substring dedup scoring
    (documents near coverage 1.0 are wholesale copies; mid-range values
    localize boilerplate). Complements q43/q44's set-level Jaccard, which
    cannot see ORDERED span reuse. Scale: one explode to (doc, gram), one
    map-side-combinable distinct-doc count per gram, one hash join back —
    linear in corpus tokens, no pairwise work, no driver state (at 100 TB
    you hash grams to 64-bit with xxhash64 instead of carrying strings;
    the string form here keeps the oracle exact). Reference has no text
    surface (SURVEY §2.2)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", TXT.words("text").alias("t")
    )
    grams = (
        d.filter(F.size("t") >= _SPAN_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - _SPAN_N),
                    lambda i: F.concat_ws(" ", F.slice("t", i + 1, _SPAN_N)),
                )
            ).alias("gram"),
        )
    )
    shared = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    flagged = grams.join(shared.withColumn("is_shared", F.lit(1)), "gram", "left")
    return flagged.groupBy("doc_id").agg(
        F.first("source").alias("source"),
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.coalesce(F.sum("is_shared"), F.lit(0)).cast("long").alias("n_shared"),
        (
            F.coalesce(F.sum("is_shared"), F.lit(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# q363: type-token statistics per source
# ---------------------------------------------------------------------------


@query(
    "q363_type_token_stats",
    oracle=f"""
    WITH w AS (
      SELECT source, unnest({TXT.sql_words('text')}) AS w FROM documents
    ), c AS (
      SELECT source, w, count(*) AS n FROM w GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS ttr,
           CAST(count(*) FILTER (n = 1) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS hapax_share,
           CASE WHEN sum(n) > 1
                THEN ln(CAST(count(*) AS DOUBLE)) / ln(CAST(sum(n) AS DOUBLE))
                END AS heaps_beta
    FROM c GROUP BY source
    """,
)
def q363_type_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth profile per source: type-token ratio, hapax
    share, and the Heaps-style log ratio beta = ln(types)/ln(tokens) —
    high beta means the source keeps introducing new vocabulary (more of
    it keeps paying, q344's P0 at the type grain), low beta means it is
    templated. Scale: one explode + one (source, word) count (map-side
    combined, bounded by vocabulary x sources), then a per-source
    conditional aggregate over that already-reduced frame; ratios are
    single divisions of exact BIGINTs. NULL-guarded ln for the one-token
    corner on both engines. Reference has no text surface (SURVEY §2.2)."""
    d = load(spark, sf_dir, "documents")
    c = (
        d.select("source", F.explode(TXT.words("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_tokens = F.sum("n")
    n_types = F.count(F.lit(1))
    n_hapax = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    return c.groupBy("source").agg(
        n_tokens.cast("long").alias("n_tokens"),
        n_types.cast("long").alias("n_types"),
        (n_types.cast("double") / n_tokens.cast("double")).alias("ttr"),
        (n_hapax.cast("double") / n_types.cast("double")).alias("hapax_share"),
        F.when(
            n_tokens > 1,
            F.log(n_types.cast("double")) / F.log(n_tokens.cast("double")),
        ).alias("heaps_beta"),
    )


# ---------------------------------------------------------------------------
# q364: length-bucketed batch packing audit (padding waste)
# ---------------------------------------------------------------------------

_PAD_BUCKET = 256  # chars per length bucket
_PAD_BATCH = 8  # sequences per batch


@query(
    "q364_padding_waste",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, n_chars, n_chars // {_PAD_BUCKET} AS bucket,
             (row_number() OVER (PARTITION BY n_chars // {_PAD_BUCKET}
                                 ORDER BY doc_id) - 1) // {_PAD_BATCH}
               AS batch
      FROM documents
    ), per_batch AS (
      SELECT bucket, batch,
             max(n_chars) * count(*) AS padded,
             sum(n_chars) AS chars,
             count(*) AS n_docs
      FROM b GROUP BY 1, 2
    )
    SELECT bucket,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(padded) AS BIGINT) AS total_padded,
           CAST(sum(chars) AS BIGINT) AS total_chars,
           1.0 - CAST(sum(chars) AS DOUBLE) / CAST(sum(padded) AS DOUBLE)
             AS waste_ratio
    FROM per_batch GROUP BY bucket
    """,
)
def q364_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-side batch packing audit: bucket sequences by length
    (width {bucket} chars), batch {batch} per bucket in stable doc_id
    order, and measure the padding waste each bucket's batches would pay
    (padded = batch_max x batch_size vs the real bytes) — the knob
    vLLM-style length-bucketed batching turns; waste near 0 says the
    bucketing is tight, a fat tail bucket says split it. The dual of
    q39's training-side packing (which CONCATENATES; serving must PAD).
    Scale: the only shuffle is the bucket-partitioned window (parallel
    across buckets; skew bounded by bucket width choice), then two
    metadata-sized aggregations; all byte counts exact BIGINTs.
    Reference has no batching surface beyond a fixed page size
    (/root/reference/etl_connector.py:106, SURVEY §2.1 R9)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    b = d.withColumn("bucket", (F.col("n_chars") / _PAD_BUCKET).cast("long"))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    b = b.withColumn(
        "batch", ((F.row_number().over(w) - 1) / _PAD_BATCH).cast("long")
    )
    per_batch = b.groupBy("bucket", "batch").agg(
        (F.max("n_chars") * F.count(F.lit(1))).alias("padded"),
        F.sum("n_chars").alias("chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return per_batch.groupBy("bucket").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("padded").cast("long").alias("total_padded"),
        F.sum("chars").cast("long").alias("total_chars"),
        (
            F.lit(1.0)
            - F.sum("chars").cast("double") / F.sum("padded").cast("double")
        ).alias("waste_ratio"),
    )


# ---------------------------------------------------------------------------
# q365: character-distribution entropy per source
# ---------------------------------------------------------------------------


@query(
    "q365_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT source, unnest(list_filter(string_split(text, ''), c -> c <> ''))
               AS c
      FROM documents
    ), cnt AS (
      SELECT source, c, count(*) AS n FROM ch GROUP BY 1, 2
    ), tot AS (
      SELECT source, sum(n) AS total FROM cnt GROUP BY 1
    )
    SELECT cnt.source,
           CAST(any_value(tot.total) AS BIGINT) AS n_chars_total,
           CAST(count(*) AS BIGINT) AS n_distinct_chars,
           -sum((CAST(n AS DOUBLE) / tot.total)
                * log2(CAST(n AS DOUBLE) / tot.total)) AS entropy_bits
    FROM cnt JOIN tot ON cnt.source = tot.source
    GROUP BY cnt.source
    """,
)
def q365_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the character unigram distribution per source —
    the cheapest compressibility/noisiness screen there is: natural text
    sits ~4-4.5 bits/char, base64 blobs and binary spills push toward 6,
    templated boilerplate collapses low. Scale: characters never leave
    the executor as rows of one — the per-(source, char) count is
    map-side combined into a frame bounded by alphabet x sources, and the
    entropy fold runs on that metadata-sized frame. Each p*log2(p) term
    is a deterministic double of two exact BIGINTs; the per-source term
    sum is over the tiny alphabet (order-insensitive at the 1e-6 gate).
    Reference has no text surface (SURVEY §2.2)."""
    d = load(spark, sf_dir, "documents")
    chars = d.select(
        "source",
        F.explode(
            F.filter(F.split("text", ""), lambda c: c != F.lit(""))
        ).alias("c"),
    )
    cnt = chars.groupBy("source", "c").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("source").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total").cast("double")
    return (
        cnt.join(tot, "source")
        .groupBy("source")
        .agg(
            F.first("total").cast("long").alias("n_chars_total"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
            (-F.sum(p * F.log2(p))).alias("entropy_bits"),
        )
    )


# ---------------------------------------------------------------------------
# q366: deterministic training-order shuffle (distributed rank)
# ---------------------------------------------------------------------------


@query(
    "q366_training_order_audit",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             {TXT.sql_hex_hash60('CAST(doc_id AS VARCHAR)')} AS hk
      FROM documents
    ), r AS (
      SELECT doc_id, source,
             row_number() OVER (ORDER BY hk, doc_id) AS pos,
             count(*) OVER () AS n
      FROM h
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(pos) AS BIGINT) AS first_pos,
           CAST(max(pos) AS BIGINT) AS last_pos,
           avg(CAST(pos AS DOUBLE) / n) AS mean_pos_norm
    FROM r GROUP BY source
    """,
)
def q366_training_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle, audited: every
    document gets a position under the total order (hex_hash60(doc_id),
    doc_id) — a reproducible cross-engine shuffle, the thing a trainer
    needs so step N reads the same example on every restart — and the
    audit checks mixing uniformity per source (mean normalized position
    ~0.5 for every source; a source clumped early/late would bias the
    curriculum). Scale: positions come from operators/ranks.
    with_global_rank (range-partitioned parallel rank, NO single-task
    global sort), the normalizer is one count, and the audit is one
    metadata-sized aggregate. Reference preserves upstream order and has
    no ordering surface (SURVEY §2.1)."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.ranks import with_global_rank

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", hex_hash60(F.col("doc_id").cast("string")).alias("hk")
    )
    ranked = with_global_rank(d, [F.col("hk"), F.col("doc_id")], out="pos")
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("pos").cast("long").alias("first_pos"),
            F.max("pos").cast("long").alias("last_pos"),
            F.avg(F.col("pos").cast("double") / F.col("n").cast("double")).alias(
                "mean_pos_norm"
            ),
        )
    )
