"""Round-3 additions to the declared query surface (SURVEY §2.3 extensions).

North-star LLM-pipeline operators beyond the reference's ETL surface
(the reference implements none of these — its full operator inventory is
/root/reference/etl_connector.py:53-242, SURVEY §2.1): bigram language-model
statistics, revenue-concentration (Lorenz/Gini) profiling for data-mix
auditing, and deterministic k-means clustering over embedding vectors.

All batch queries here are oracle-paired (DuckDB) except k-means, which is
pytest-verified against a NumPy twin (tests/test_kmeans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.kmeans import kmeans
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# Bigram language-model counts (n-gram conditional probabilities)
# ---------------------------------------------------------------------------


@query(
    "q134_bigram_lm",
    oracle="""
    WITH d AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS toks
      FROM documents
    ), s AS (
      SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
      FROM d WHERE len(toks) >= 2
    ), b AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM s
    ), c AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2
    )
    SELECT w1, w2, n,
           CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY w1) AS p
    FROM c
    """,
)
def q134_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model statistics: within-document adjacent token
    pairs -> count and conditional probability P(w2 | w1). The bigram
    extraction is a narrow per-row ``transform(sequence(...))`` over the
    token array — zero shuffle, so it runs at raw scan bandwidth; the
    only shuffle is the final (w1, w2) aggregation, which map-side
    combines (Zipf-distributed bigrams compress heavily in the partial
    aggregate). P(w2|w1) is a window over the already-aggregated frame
    (|distinct bigrams| rows, not |corpus| rows). The integer/integer
    division makes the probability bit-identical across engines. At
    100 TB this is the canonical first step of tokenizer/LM data prep;
    the reference has no text analytics at all (SURVEY §2.2)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z]+"), lambda x: x != F.lit("")
    )
    bigrams = docs.select(toks.alias("toks")).filter(F.size("toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
            )
        ).alias("bg")
    )
    counts = bigrams.groupBy(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    ).agg(F.count(F.lit(1)).alias("n"))
    return counts.withColumn(
        "p",
        F.col("n").cast("double") / F.sum("n").over(Window.partitionBy("w1")),
    )


# ---------------------------------------------------------------------------
# Revenue concentration: Lorenz deciles + Gini (data-mix inequality profile)
# ---------------------------------------------------------------------------


@query(
    "q135_lorenz_deciles",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(30,10))) AS rev
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT rev, ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
      FROM rev
    ), d AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
             sum(rev) AS revenue
      FROM ranked GROUP BY decile
    )
    SELECT decile, n_customers,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(revenue / sum(revenue) OVER () AS DOUBLE) AS rev_share,
           CAST(sum(revenue) OVER (ORDER BY decile)
                / sum(revenue) OVER () AS DOUBLE) AS cum_share
    FROM d
    """,
)
def q135_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve by revenue decile: how concentrated is spend across
    customers (the dual, for training corpora, is "how concentrated are
    tokens across sources" — the same shape audits a data mix). One
    shuffle aggregates orders to per-customer revenue in exact DECIMAL
    (double summation order would diverge across engines); the decile
    assignment is ENTITY-grain (|customers| rows), so it runs as
    operators/ranks.with_ntile — range repartition + parallel local
    sorts + broadcast offsets, bit-identical to the ntile window without
    its one-task global sort — and only the 10-row share windows stay in
    window form. Deterministic tie-break: the ntile ordering includes
    o_custkey. At 100 TB the per-customer rollup is the only full-data
    pass; everything after is metadata-sized. The reference has no
    aggregation surface (SURVEY §2.2)."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.ranks import with_ntile

    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,10)")).alias("rev"))
    )
    ranked = with_ntile(
        rev,
        [F.col("rev").asc(), F.col("o_custkey").asc()],
        10,
        out="decile",
    ).select("rev", "decile")
    d = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("rev").alias("revenue")
    )
    total = Window.partitionBy()
    running = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return d.select(
        "decile",
        "n_customers",
        F.col("revenue").cast("double").alias("revenue"),
        (F.col("revenue") / F.sum("revenue").over(total))
        .cast("double")
        .alias("rev_share"),
        (F.sum("revenue").over(running) / F.sum("revenue").over(total))
        .cast("double")
        .alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# Canonicalized exact dedup (normalize-then-fingerprint)
# ---------------------------------------------------------------------------


@query(
    "q137_canonical_dedup",
    oracle="""
    WITH c AS (
      SELECT source, text,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS canon
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT text) AS BIGINT) AS n_raw_distinct,
           CAST(count(DISTINCT canon) AS BIGINT) AS n_canon_distinct
    FROM c GROUP BY source
    """,
)
def q137_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized exact dedup: lowercase, strip punctuation, collapse
    whitespace BEFORE fingerprinting, so trivially-reformatted copies
    (case, spacing, punctuation) collapse together — the standard
    normalization pass that runs ahead of q42's raw-content dedup in an
    LLM data pipeline. The canonical form is a narrow per-row expression
    (no shuffle); the distinct counts are one hash aggregation per
    source. At 100 TB you'd count distinct over a fingerprint of the
    canonical form rather than the string itself — q42 demonstrates that
    md5 path; here the oracle compares the semantics of the
    normalization itself."""
    d = load(spark, sf_dir, "documents")
    canon = F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "))
    return (
        d.select("source", "text", canon.alias("canon"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("text").alias("n_raw_distinct"),
            F.countDistinct("canon").alias("n_canon_distinct"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus-level source vocabulary overlap (pairwise Jaccard of sources)
# ---------------------------------------------------------------------------


@query(
    "q138_source_overlap",
    oracle="""
    WITH v AS (
      SELECT DISTINCT source, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS token
      FROM documents
    ), sz AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY source
    ), inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM v a JOIN v b ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, sa.n AS vocab_a, sb.n AS vocab_b, i.n_common,
           CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.source = i.src_a
    JOIN sz sb ON sb.source = i.src_b
    """,
)
def q138_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level similarity: pairwise vocabulary Jaccard between
    sources — the contamination / redundancy screen run between corpus
    components before mixing (q43 compares document pairs; this
    compares whole sources). The (source, token) distinct is the only
    full-data shuffle; the self-join then runs on the vocabulary frame,
    where each token matches at most n_sources rows, so the join output
    is bounded by |vocab| x n_sources^2 — independent of corpus row
    count. Source-count sized frames (sizes, intersections) broadcast.
    The integer-ratio Jaccard is bit-identical across engines."""
    d = load(spark, sf_dir, "documents")
    v = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: x != F.lit(""))
        ).alias("token"),
    ).distinct()
    sz = v.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = v.alias("a"), v.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa, sb = sz.alias("sa"), sz.alias("sb")
    return (
        inter.join(F.broadcast(sa), F.col("sa.source") == F.col("src_a"))
        .join(F.broadcast(sb), F.col("sb.source") == F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            F.col("sa.n").alias("vocab_a"),
            F.col("sb.n").alias("vocab_b"),
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Equal-frequency binning (quantile buckets without a global sort)
# ---------------------------------------------------------------------------


@query(
    "q139_equifreq_bins",
    oracle="""
    WITH cuts AS (
      SELECT quantile_cont(l_extendedprice,
                           [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
      FROM lineitem
    ), binned AS (
      SELECT l_extendedprice AS v,
             1 + len(list_filter(c.qs, q -> q < l_extendedprice)) AS bin
      FROM lineitem, cuts c
    )
    SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
           min(v) AS min_v, max(v) AS max_v,
           CAST(sum(CAST(v AS DECIMAL(30,10))) AS DOUBLE) AS sum_v
    FROM binned GROUP BY bin
    """,
)
def q139_equifreq_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) binning WITHOUT a global sort OR the
    built-in percentile UDAF: the nine exact interpolated deciles come
    from operators/quantiles.exact_quantiles — the two-phase
    range-bucket algorithm whose scans are all full-parallel and whose
    driver state is O(buckets), unlike Spark's exact percentile
    aggregate which buffers every value per partition and merges the
    buffers on one thread (measured 2.4s of this query's 4.4s at
    sf0.1; at 100 TB it is not runnable at all). The cutoffs return as
    driver literals, so bin assignment is a narrow
    count-of-cutoffs-below expression — the data-sized pass is
    shuffle-free, unlike the ntile formulation which funnels every row
    through one sorted partition. This is the profile behind quantile
    feature bucketing and length-balanced shard carving at 100 TB
    (swap the exact quantiles for q67's mergeable sketch when
    approximate cutoffs are acceptable). Per-bin sums in DECIMAL for
    cross-engine exactness."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.quantiles import exact_quantiles

    li = load(spark, sf_dir, "lineitem")
    cuts = exact_quantiles(li, "l_extendedprice", [i / 10 for i in range(1, 10)])
    binned = li.select(
        F.col("l_extendedprice").alias("v"),
        (
            1
            + F.size(
                F.filter(
                    F.lit(cuts), lambda q: q < F.col("l_extendedprice")
                )
            )
        ).cast("long").alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.sum(F.col("v").cast("decimal(30,10)")).cast("double").alias("sum_v"),
    )


# ---------------------------------------------------------------------------
# Last-touch attribution (conversion-window as-of credit assignment)
# ---------------------------------------------------------------------------


@query(
    "q140_last_touch_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, ts,
             (SELECT max(c.ts) FROM events c
              WHERE c.user_id = p0.user_id AND c.event_type = 'click'
                AND c.ts <= p0.ts
                AND c.ts >= p0.ts - INTERVAL 7 DAY) AS click_ts
      FROM events p0 WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(click_ts) AS BIGINT) AS n_attributed,
           CAST(coalesce(sum(CAST(epoch_us(ts) - epoch_us(click_ts) AS BIGINT)),
                         0) AS BIGINT) AS sum_gap_us
    FROM p GROUP BY user_id
    """,
)
def q140_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution with a 7-day conversion window: every
    purchase credits the most recent preceding click by the same user.
    The oracle states it as a correlated MAX subquery; the engine uses
    the asof formulation that scales — one shuffle by user_id, then a
    running ``last(click_ts, ignorenulls)`` over the time-ordered
    union, so each user's events are scanned once instead of joined
    quadratically (clicks sort before purchases at equal ts, matching
    the subquery's ``<=``). The window check then turns stale clicks
    into unattributed purchases. Micro-second integer gaps keep the
    sums engine-exact."""
    e = load(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts0"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    enriched = tagged.withColumn(
        "last_click", F.last("click_ts0", ignorenulls=True).over(w)
    ).filter(F.col("is_purchase") == 1)
    gap_us = F.unix_micros("ts") - F.unix_micros("last_click")
    attributed = enriched.select(
        "user_id",
        "ts",
        F.when(
            F.col("last_click").isNotNull()
            & (gap_us <= F.lit(7 * 24 * 3600 * 1_000_000)),
            F.col("last_click"),
        ).alias("click_ts"),
    )
    return attributed.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("click_ts").alias("n_attributed"),
        F.coalesce(
            F.sum(F.unix_micros("ts") - F.unix_micros("click_ts")), F.lit(0)
        ).alias("sum_gap_us"),
    )


# ---------------------------------------------------------------------------
# Event debounce (keep-first-per-burst collapse)
# ---------------------------------------------------------------------------


@query(
    "q141_debounce",
    oracle="""
    WITH g AS (
      SELECT event_type, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
                  THEN 1 ELSE 0 END AS is_burst_head
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(is_burst_head) AS BIGINT) AS n_kept
    FROM g GROUP BY event_type
    """,
)
def q141_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst debounce: repeated (user, event_type) events within an hour
    of their predecessor collapse into one — the keep-first-per-island
    dual of q92's gap sessionization, and the batch shape of
    click-spam / retry-storm suppression ahead of training-data
    extraction. One shuffle: the lag window and the burst-head flag
    share the (user_id, event_type) partitioning, and the final rollup
    aggregates the flagged frame. Deterministic ordering pins ties by
    event_id. Microsecond integer gaps keep both engines exact."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = e.select(
        "event_type",
        F.when(gap_us.isNull() | (gap_us > 3_600_000_000), 1)
        .otherwise(0)
        .alias("is_burst_head"),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_burst_head").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Bigram PMI collocations (association strength over q134's counts)
# ---------------------------------------------------------------------------


@query(
    "q142_bigram_pmi",
    oracle="""
    WITH d AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS toks
      FROM documents
    ), uni AS (
      SELECT unnest(toks) AS w, FROM d
    ), uc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM uni GROUP BY w
    ), tot AS (
      SELECT CAST(sum(n_w) AS BIGINT) AS n_tok FROM uc
    ), s AS (
      SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
      FROM d WHERE len(toks) >= 2
    ), bc AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2, CAST(count(*) AS BIGINT) AS n
      FROM s GROUP BY 1, 2
    )
    SELECT b.w1, b.w2, b.n,
           ln(CAST(b.n AS DOUBLE) * t.n_tok / (u1.n_w * u2.n_w)) AS pmi
    FROM bc b
    JOIN uc u1 ON u1.w = b.w1
    JOIN uc u2 ON u2.w = b.w2
    CROSS JOIN tot t
    WHERE b.n >= 5
    """,
)
def q142_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent-token pairs: the
    collocation score that separates genuine phrases from frequency
    accidents (q134 gives the counts; PMI normalizes by unigram
    popularity). Two count aggregations (unigram, bigram — the bigram
    extraction itself is the shuffle-free transform/sequence kernel),
    then vocabulary-sized joins to score; the support floor (n >= 5)
    bounds output. The PMI argument is an exact integer ratio evaluated
    in one double division, so the only cross-engine wiggle is ln's
    last ulp — inside the 1e-6 comparison tolerance."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: x != F.lit(""))
    td = docs.select(toks.alias("toks"))
    uc = (
        td.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    tot = uc.agg(F.sum("n_w").alias("n_tok"))
    bc = (
        td.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
                )
            ).alias("bg")
        )
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )
    u1 = uc.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    return (
        bc.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n",
            F.log(
                F.col("n").cast("double")
                * F.col("n_tok")
                / (F.col("n_w1") * F.col("n_w2"))
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# Interval-dimension lookup (broadcast banding join — rate/bracket tables)
# ---------------------------------------------------------------------------

_PRICE_BANDS = [
    ("budget", 0.0, 20_000.0),
    ("mid", 20_000.0, 45_000.0),
    ("premium", 45_000.0, 70_000.0),
    ("luxury", 70_000.0, 10_000_000.0),
]


@query(
    "q143_band_lookup",
    oracle=f"""
    WITH bands(band, lo, hi) AS (
      VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _PRICE_BANDS)}
    )
    SELECT b.band, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(30,10))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN bands b
      ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band
    """,
)
def q143_band_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-dimension lookup: classify every fact row against a small
    table of half-open bands (rate tables, tax brackets, price tiers).
    The band table broadcasts, so the non-equi join is a
    BroadcastNestedLoopJoin whose inner side is a handful of rows —
    constant work per fact row, zero shuffle before the final rollup.
    This is the broadcast complement of bucketed_range_join (q72),
    which handles the big-big interval case. DECIMAL revenue keeps the
    cross-engine sum exact."""
    li = load(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_PRICE_BANDS, "band string, lo double, hi double")
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_extendedprice") >= F.col("lo"))
            & (F.col("l_extendedprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(30,10)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# String-construction kit (formatting scalar surface)
# ---------------------------------------------------------------------------


@query(
    "q144_string_kit",
    oracle="""
    SELECT n_name,
           lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS key_padded,
           translate(lower(n_name), ' -', '__') AS slug,
           reverse(lower(n_name)) AS rev,
           repeat('*', CAST(n_nationkey % 5 AS INT)) AS stars,
           concat_ws('/', 'nation', CAST(n_regionkey AS VARCHAR),
                     lower(n_name)) AS path
    FROM nation
    """,
)
def q144_string_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-construction surface in one projection: lpad, translate,
    reverse, repeat, concat_ws — the label/slug/path builders of export
    pipelines. Pure codegen'd Column expressions (narrow, shuffle-free;
    at 100 TB this runs at scan bandwidth). The reference's only string
    handling is f-string logging (etl_connector.py:105,116); this is
    the declared engine surface for it."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.lpad(F.col("n_nationkey").cast("string"), 4, "0").alias("key_padded"),
        F.translate(F.lower("n_name"), " -", "__").alias("slug"),
        F.reverse(F.lower("n_name")).alias("rev"),
        F.repeat(F.lit("*"), (F.col("n_nationkey") % 5).cast("int")).alias("stars"),
        F.concat_ws(
            "/", F.lit("nation"), F.col("n_regionkey").cast("string"), F.lower("n_name")
        ).alias("path"),
    )


# ---------------------------------------------------------------------------
# Calendar kit (date-boundary scalar surface)
# ---------------------------------------------------------------------------


@query(
    "q145_calendar_kit",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           date_trunc('quarter', o_orderdate) AS quarter_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                last_day(CAST(o_orderdate AS DATE))) AS BIGINT)
             AS days_to_month_end,
           CAST(extract(dow FROM o_orderdate) AS BIGINT) AS dow
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def q145_calendar_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-boundary surface: quarter start, month end,
    days-remaining-in-month, day-of-week — the fiscal/periodization
    helpers under q95/q127-style period analytics. All narrow codegen
    expressions over the pushed-down key filter (the modulo sample
    keeps oracle output small). Spark's dayofweek is 1=Sunday;
    DuckDB's dow is 0=Sunday — aligned by subtracting one."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.datediff(F.last_day(d), d).cast("long").alias("days_to_month_end"),
        (F.dayofweek(d) - 1).cast("long").alias("dow"),
    )


# ---------------------------------------------------------------------------
# Fulfillment latency percentiles (fact-fact join + ordered-set aggregate)
# ---------------------------------------------------------------------------


@query(
    "q146_latency_percentiles",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           quantile_cont(days, 0.50) AS p50,
           quantile_cont(days, 0.90) AS p90,
           quantile_cont(days, 0.99) AS p99,
           CAST(max(days) AS BIGINT) AS worst
    FROM lat GROUP BY o_orderpriority
    """,
)
def q146_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution by priority: the fact-fact
    equi-join (orders ⋈ lineitem on the order key — both sides shuffle
    on the key; at 100 TB co-locate them with bucketing, q72's setup)
    feeding exact interpolated percentiles per group (q35's engine-exact
    percentile path). Integer day latencies make the interpolation
    arithmetic identical across engines. The operational-SLA shape of
    latency dashboards."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    lat = o.join(li, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("days", F.lit(0.50)).alias("p50"),
        F.percentile("days", F.lit(0.90)).alias("p90"),
        F.percentile("days", F.lit(0.99)).alias("p99"),
        F.max("days").cast("long").alias("worst"),
    )


# ---------------------------------------------------------------------------
# Chi-square contingency (segment x region independence screen)
# ---------------------------------------------------------------------------


@query(
    "q147_chisq_contingency",
    oracle="""
    WITH obs AS (
      SELECT c.c_mktsegment AS seg, n.n_regionkey AS region,
             CAST(count(*) AS BIGINT) AS o
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT seg, region, o,
             sum(o) OVER (PARTITION BY seg) AS row_n,
             sum(o) OVER (PARTITION BY region) AS col_n,
             sum(o) OVER () AS grand
      FROM obs
    )
    SELECT seg, region, o,
           CAST(row_n * col_n AS DOUBLE) / grand AS expected,
           (o - CAST(row_n * col_n AS DOUBLE) / grand)
             * (o - CAST(row_n * col_n AS DOUBLE) / grand)
             / (CAST(row_n * col_n AS DOUBLE) / grand) AS chi2_term
    FROM tot
    """,
)
def q147_chisq_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency table: observed vs expected counts for
    market segment × region, the independence screen behind "is my
    corpus mix correlated with source?" audits (the categorical dual of
    q121's correlations). One dimension-broadcast join + one count
    aggregation touch the data; the margin sums are windows over the
    |seg|×|region| cell frame, so the statistic costs nothing extra at
    any scale. Exact integer counts make every expected/chi2 term a
    deterministic double expression."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    obs = (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("n_regionkey").alias("region")
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    row_n = F.sum("o").over(Window.partitionBy("seg"))
    col_n = F.sum("o").over(Window.partitionBy("region"))
    grand = F.sum("o").over(Window.partitionBy())
    expected = (row_n * col_n).cast("double") / grand
    return obs.select(
        "seg",
        "region",
        "o",
        expected.alias("expected"),
        ((F.col("o") - expected) * (F.col("o") - expected) / expected).alias(
            "chi2_term"
        ),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit (fraud/data-quality screen)
# ---------------------------------------------------------------------------


@query(
    "q148_benford_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    )
    , c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit)
    SELECT digit, n,
           CAST(n AS DOUBLE) / sum(n) OVER () AS share,
           log10(1.0 + 1.0 / digit) AS benford_expected
    FROM c
    """,
)
def q148_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    anomaly screen for fabricated or truncated numeric columns (a
    synthetic uniform fixture will visibly NOT follow Benford, which is
    exactly what the audit reports). The first significant digit comes
    from the ×100-scaled integer's decimal string — no float log10 near
    digit boundaries, so both engines bucket identically. One
    aggregation over a narrow projection; the share normalizes by a
    window over the 9-row digit frame (no second data pass)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    return counts.select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(Window.partitionBy())).alias(
            "share"
        ),
        F.log10(1.0 + 1.0 / F.col("digit")).alias("benford_expected"),
    )


# ---------------------------------------------------------------------------
# Co-purchase graph degree distribution (graph profile)
# ---------------------------------------------------------------------------


@query(
    "q149_degree_distribution",
    oracle="""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT u FROM e UNION ALL SELECT v FROM e) t(u)
      GROUP BY u
    )
    SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def q149_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph (parts are nodes,
    same-order co-occurrence is an edge): the first profile you run on
    any graph before q117's triangles or q126's PageRank, because the
    tail of this histogram is what blows up wedge-generating
    algorithms. Edge generation is q93's bounded basket expansion
    (fan-out capped by order size, not catalog size), PERSISTED via the
    shared copurchase_edges helper since both unioned degree branches
    scan it; degrees come from one aggregation over the edge list
    counted from both endpoints, and the histogram is metadata-sized.
    Orientation (u < v) halves the edge list; the union-all restores
    both endpoints for degree counting without materializing reversed
    edges."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.extensions import copurchase_edges

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = copurchase_edges(li)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


# ---------------------------------------------------------------------------
# Current-state census from the event log (single-pass argmax collapse)
# ---------------------------------------------------------------------------


@query(
    "q150_current_state_census",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_type AS current_state,
           CAST(count(*) AS BIGINT) AS n_users
    FROM latest WHERE rn = 1 GROUP BY event_type
    """,
)
def q150_current_state_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-state census: collapse the event log to each user's
    latest event and count the population per state — the materialized
    "where is everyone now" view over a CDC-style log. The engine does
    it in ONE aggregation pass with ``max_by`` keyed on the
    (ts, event_id) struct (deterministic tie-break, map-side combined:
    each partition keeps one candidate per user before the shuffle);
    the oracle states the same thing as the row_number formulation,
    which shuffles every raw row into a per-user sort. The max_by form
    is q78's argmax generalized to a composite ordering key — at 100 TB
    the difference is a combiner-friendly aggregate vs a full-data
    window sort."""
    e = load(spark, sf_dir, "events")
    latest = e.groupBy("user_id").agg(
        F.max_by("event_type", F.struct("ts", "event_id")).alias("current_state")
    )
    return latest.groupBy("current_state").agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# Deterministic k-means over embeddings (iterative vector clustering)
# ---------------------------------------------------------------------------


def _kmeans_dist_chain(e: str, c: str, dim: int) -> str:
    """LEFT-FOLD dim-term double distance chain — the same op order as
    Spark's ``aggregate``/``zip_with`` fold, so doubles are bit-equal."""
    return " + ".join(
        f"({e}[{j}] - {c}[{j}]) * ({e}[{j}] - {c}[{j}])"
        for j in range(1, dim + 1)
    )


def _kmeans_ctes(k: int = 8, iters: int = 5, dim: int = 64) -> str:
    """Unrolled Lloyd iterations in DuckDB, bit-matched to the engine —
    the WITH body (no ``WITH`` keyword, no final SELECT), ending at
    ``afinal`` (vec_id, cluster, dsq under the final centroids); the
    final centroid table is CTE ``c{iters}`` (cluster, c).

    - init = first k vectors by vec_id (both engines);
    - distances are LEFT-FOLD dim-term double chains (same op order as
      Spark's ``aggregate``/``zip_with`` fold -> bit-equal doubles);
    - argmin tie-break toward the lowest cluster index (ORDER BY dsq,
      cluster == array_position's first match);
    - the update snaps per-dim sums to DECIMAL(38,18) exactly like
      operators/kmeans.py, so centroids stay bit-identical through every
      iteration and assignments can never straddle.
    All CTEs MATERIALIZED (DuckDB would otherwise inline the iteration
    cascade exponentially). Composable: q136 appends its rollup, q374
    (plans/round29.py) appends the IVF-PQ probe/score chain."""
    dist = lambda e, c: _kmeans_dist_chain(e, c, dim)  # noqa: E731

    steps = []
    prev = "c0"
    for i in range(1, iters + 1):
        steps.append(f"""
    a{i} AS MATERIALIZED (
      SELECT vec_id, e, cluster FROM (
        SELECT p.vec_id, p.e, c.cluster,
               row_number() OVER (PARTITION BY p.vec_id
                                  ORDER BY {dist('p.e', 'c.c')}, c.cluster) AS rn
        FROM pts p CROSS JOIN {prev} c
      ) WHERE rn = 1
    ),
    m{i} AS MATERIALIZED (
      SELECT cluster, list(s / n ORDER BY pos) AS c FROM (
        SELECT a.cluster, t.i AS pos,
               CAST(sum(CAST(a.e[CAST(t.i AS INT)] AS DECIMAL(38,18))) AS DOUBLE) AS s,
               count(*) AS n
        FROM a{i} a CROSS JOIN range(1, {dim + 1}) t(i)
        GROUP BY 1, 2
      ) GROUP BY 1
    ),
    c{i} AS MATERIALIZED (
      SELECT p.cluster, coalesce(m.c, p.c) AS c
      FROM {prev} p LEFT JOIN m{i} m ON m.cluster = p.cluster
    )""")
        prev = f"c{i}"
    return f"""pts AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    c0 AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, e AS c
      FROM (SELECT vec_id, e FROM pts ORDER BY vec_id LIMIT {k})
    ),{",".join(steps)},
    afinal AS MATERIALIZED (
      SELECT vec_id, cluster, dsq FROM (
        SELECT p.vec_id, c.cluster,
               {dist('p.e', 'c.c')} AS dsq,
               row_number() OVER (PARTITION BY p.vec_id
                                  ORDER BY {dist('p.e', 'c.c')}, c.cluster) AS rn
        FROM pts p CROSS JOIN {prev} c
      ) WHERE rn = 1
    )"""


def _kmeans_oracle_sql(k: int = 8, iters: int = 5, dim: int = 64) -> str:
    return f"""
    WITH {_kmeans_ctes(k, iters, dim)}
    SELECT CAST(cluster AS INT) AS cluster,
           CAST(count(*) AS BIGINT) AS n_points,
           round(sum(dsq), 6) AS inertia
    FROM afinal GROUP BY cluster
    """


@query("q136_kmeans_embeddings", oracle=_kmeans_oracle_sql(8, 5, 64))
def q136_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means (k=8, 5 iterations) over the embeddings
    table: the semantic-clustering primitive behind corpus mixing,
    diversity sampling, and semantic dedup. Assignment is a pure Column
    expression (distances via ``transform``/``aggregate`` over a
    broadcast centroid literal — JVM-side, no Python in the hot path);
    the update step aggregates (cluster, dim) partial sums, so per-
    iteration cost is one scan + one k×dim-sized shuffle. Only the
    k×dim centroid matrix ever reaches the driver — the N-row
    assignment stays distributed, which is what lets the same loop run
    at 100 TB. Init is the first k rows by vec_id (seeded determinism;
    rerun-stable across engines). Oracle: none (iterative, not SQL-
    expressible); tests/test_kmeans.py checks exact agreement with a
    NumPy twin at sf0.001/0.01."""
    assigned, _ = kmeans(
        load(spark, sf_dir, "embeddings"), vec_col="embedding", id_col="vec_id",
        k=8, iters=5,
    )
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("dist_sq"), 6).alias("inertia"),
    )
