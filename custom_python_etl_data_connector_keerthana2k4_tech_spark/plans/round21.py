"""Round-21 additions: inverse-propensity weighting (stratified
Horvitz-Thompson treatment effect), the Laspeyres/Paasche/Fisher price
index triplet (basket-weighted inflation between two years), and
tokenizer fertility per language (tokens-per-word, the
tokenizer-evaluation metric that decides whether a vocabulary serves a
language or fragments it).

The reference computes none of these (complete operator surface:
/root/reference/etl_connector.py:53-242; SURVEY §2.1-2.2). All three are
oracle-paired (DuckDB) and auto-gated by tests/test_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.relational import DSUM, dsum
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# Stratified IPW (Horvitz-Thompson) treatment-effect estimate
# ---------------------------------------------------------------------------


@query(
    "q337_ipw_estimate",
    oracle="""
    WITH tagged AS (
      SELECT CAST(hour(ts) AS INT) AS h,
             CAST(((user_id * 2654435761) % 4294967296) // 2147483648
                  AS BIGINT) AS t,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ), strata AS (
      SELECT h, count(*) AS n,
             sum(t) AS nt,
             sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS ct,
             sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS cc
      FROM tagged GROUP BY 1
    ), terms AS (
      SELECT n, nt,
             CAST(ct AS DOUBLE) * n / nt AS treated_term,
             CAST(cc AS DOUBLE) * n / (n - nt) AS control_term
      FROM strata WHERE nt > 0 AND nt < n
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_used,
           CAST(count(*) AS BIGINT) AS k_strata,
           (sum(treated_term) - sum(control_term)) / sum(n) AS ate_ipw
    FROM terms
    """,
)
def q337_ipw_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted treatment effect with hour-of-day
    strata: each stratum's propensity is its OBSERVED treated share, and
    the Horvitz-Thompson terms c_T * n/n_T and c_C * n/n_C reweight both
    arms back to the full population — the estimator that stays honest
    when exposure correlates with a covariate, completing the causal kit
    (balance q305, MH q315, DiD q333). Strata with a degenerate
    propensity (0 or 1) are excluded, and the query reports how many
    survived. Scale: one conditional pass to 24 integer strata; every
    weight is an exact rational of cell counts. Reference has no
    statistics (SURVEY §2.2)."""
    tagged = load(spark, sf_dir, "events").select(
        F.hour("ts").cast("int").alias("h"),
        F.floor(
            F.pmod(F.col("user_id") * 2654435761, F.lit(4294967296)) / F.lit(2147483648)
        )
        .cast("long")
        .alias("t"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    strata = tagged.groupBy("h").agg(
        F.count("*").alias("n"),
        F.sum("t").alias("nt"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).alias("cc"),
    )
    terms = strata.filter((F.col("nt") > 0) & (F.col("nt") < F.col("n"))).select(
        "n",
        (F.col("ct").cast("double") * F.col("n") / F.col("nt")).alias("treated_term"),
        (F.col("cc").cast("double") * F.col("n") / (F.col("n") - F.col("nt"))).alias(
            "control_term"
        ),
    )
    return terms.agg(
        F.sum("n").cast("long").alias("n_used"),
        F.count("*").cast("long").alias("k_strata"),
        ((F.sum("treated_term") - F.sum("control_term")) / F.sum("n")).alias("ate_ipw"),
    )


# ---------------------------------------------------------------------------
# Laspeyres / Paasche / Fisher price indexes, 1996 -> 1997
# ---------------------------------------------------------------------------


@query(
    "q338_fisher_price_index",
    oracle=f"""
    WITH cell AS (
      SELECT l_partkey,
             CAST(year(l_shipdate) AS INT) AS yr,
             {DSUM('l_extendedprice')} AS spend,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ), both_years AS (
      SELECT a.l_partkey,
             a.spend / a.qty AS p96, a.qty AS q96,
             b.spend / b.qty AS p97, b.qty AS q97
      FROM (SELECT * FROM cell WHERE yr = 1996) a
      JOIN (SELECT * FROM cell WHERE yr = 1997) b USING (l_partkey)
    ), idx AS (
      SELECT {DSUM('p97 * q96')} / {DSUM('p96 * q96')} AS laspeyres,
             {DSUM('p97 * q97')} / {DSUM('p96 * q97')} AS paasche,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM both_years
    )
    SELECT n_parts, laspeyres, paasche,
           sqrt(laspeyres * paasche) AS fisher
    FROM idx
    """,
)
def q338_fisher_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic price-index triplet between 1996 and 1997 over parts
    traded in BOTH years: Laspeyres (base-year basket), Paasche
    (current-year basket), and their geometric mean Fisher — the
    substitution-bias-bracketing inflation measure that q177's
    volume/price bridge reports only one side of. Scale: the fact
    collapses to (part, year) decimal spend/quantity cells with both
    year predicates pushed to the scan; the two-year join runs on the
    part-grain aggregate; index sums accumulate in decimal so both
    engines divide identical numbers. Reference has no joins
    (SURVEY §2.2)."""
    cell = (
        load(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .groupBy("l_partkey", F.year("l_shipdate").alias("yr"))
        .agg(
            dsum("l_extendedprice").alias("spend"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    a = cell.filter(F.col("yr") == 1996).select(
        "l_partkey",
        (F.col("spend") / F.col("qty")).alias("p96"),
        F.col("qty").alias("q96"),
    )
    b = cell.filter(F.col("yr") == 1997).select(
        F.col("l_partkey").alias("pk97"),
        (F.col("spend") / F.col("qty")).alias("p97"),
        F.col("qty").alias("q97"),
    )
    both = a.join(b, F.col("l_partkey") == F.col("pk97"))
    idx = both.agg(
        (dsum(F.col("p97") * F.col("q96")) / dsum(F.col("p96") * F.col("q96"))).alias(
            "laspeyres"
        ),
        (dsum(F.col("p97") * F.col("q97")) / dsum(F.col("p96") * F.col("q97"))).alias(
            "paasche"
        ),
        F.count("*").cast("long").alias("n_parts"),
    )
    return idx.select(
        "n_parts",
        "laspeyres",
        "paasche",
        F.sqrt(F.col("laspeyres") * F.col("paasche")).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility per language (tokens per whitespace word)
# ---------------------------------------------------------------------------


@query(
    "q339_tokenizer_fertility",
    oracle="""
    WITH d AS (
      SELECT lang,
             length(list_filter(string_split(text, ' '), w -> w <> ''))
               AS words,
             length(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
               AS tokens
      FROM documents
    )
    SELECT lang,
           CAST(sum(words) AS BIGINT) AS n_words,
           CAST(sum(tokens) AS BIGINT) AS n_tokens,
           CAST(sum(tokens) AS DOUBLE) / sum(words) AS fertility
    FROM d GROUP BY 1
    """,
)
def q339_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: tokens emitted by the BPE-ish
    regex tokenizer (letter runs / digit runs / single punctuation —
    q106's pre-tokenization) per whitespace word. Fertility near 1 means
    the vocabulary serves the language; high fertility means its text
    fragments into many tokens — the metric that exposes tokenizer bias
    across languages and forecasts per-language context-window costs
    (with q226's overflow profile). Scale: two narrow regexp counts per
    document, one small-group aggregate of exact integers — shuffle
    carries three numbers per doc. Reference has no text surface
    (SURVEY §2.2)."""
    d = load(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.filter(F.split(F.col("text"), " "), lambda w: w != "")).alias("words"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).alias("tokens"),
    )
    return d.groupBy("lang").agg(
        F.sum("words").cast("long").alias("n_words"),
        F.sum("tokens").cast("long").alias("n_tokens"),
        (F.sum("tokens").cast("double") / F.sum("words")).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# Two-component Gaussian-mixture fit of the event-value distribution
# ---------------------------------------------------------------------------


def _em_oracle_sql(iters: int = 10) -> str:
    """Unrolled EM in DuckDB, matched to operators/mixture.py: the same
    quantile_cont init, the same closed-form responsibilities, and the
    same DECIMAL(38,15) snap on every sufficient statistic before the
    aggregate — so the only cross-engine noise is 1-ulp libm (exp/sqrt)
    divergence, which the decimal grid quantizes to ~1e-12 drift over 10
    iterations, orders of magnitude inside the float tolerance. The
    query side runs the full fixed iteration budget (tol=0) so the
    engine's early stop cannot create a step-count mismatch."""
    steps = []
    prev = "p0"
    for i in range(1, iters + 1):
        steps.append(f"""
    p{i} AS MATERIALIZED (
      SELECT p.n,
             s.s1 / p.n AS w1, (p.n - s.s1) / p.n AS w2,
             s.sx1 / s.s1 AS mu1, s.sx2 / (p.n - s.s1) AS mu2,
             greatest(s.sxx1 / s.s1
                      - (s.sx1 / s.s1) * (s.sx1 / s.s1), 1e-12) AS var1,
             greatest(s.sxx2 / (p.n - s.s1)
                      - (s.sx2 / (p.n - s.s1)) * (s.sx2 / (p.n - s.s1)),
                      1e-12) AS var2
      FROM (
        SELECT CAST(sum(CAST(r1 AS DECIMAL(38,15))) AS DOUBLE) AS s1,
               CAST(sum(CAST(r1 * x AS DECIMAL(38,15))) AS DOUBLE) AS sx1,
               CAST(sum(CAST(r1 * x * x AS DECIMAL(38,15))) AS DOUBLE) AS sxx1,
               CAST(sum(CAST((1 - r1) * x AS DECIMAL(38,15))) AS DOUBLE) AS sx2,
               CAST(sum(CAST((1 - r1) * x * x AS DECIMAL(38,15))) AS DOUBLE) AS sxx2
        FROM (
          SELECT x, d1 / (d1 + d2) AS r1 FROM (
            SELECT b.x,
                   p.w1 * (1.0 / sqrt(2 * pi() * p.var1))
                     * exp(-(b.x - p.mu1) * (b.x - p.mu1) / (2.0 * p.var1)) AS d1,
                   p.w2 * (1.0 / sqrt(2 * pi() * p.var2))
                     * exp(-(b.x - p.mu2) * (b.x - p.mu2) / (2.0 * p.var2)) AS d2
            FROM base b CROSS JOIN {prev} p
          )
        )
      ) s CROSS JOIN {prev} p
    )""")
        prev = f"p{i}"
    return f"""
    WITH base AS MATERIALIZED (
      SELECT CAST(value AS DOUBLE) AS x FROM events WHERE value IS NOT NULL
    ),
    init AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n,
             greatest(var_pop(x) / 4.0, 1e-12) AS v0,
             quantile_cont(x, 0.25) AS q1,
             quantile_cont(x, 0.75) AS q3
      FROM base
    ),
    p0 AS (
      SELECT n, 0.5 AS w1, 0.5 AS w2, q1 AS mu1, q3 AS mu2,
             v0 AS var1, v0 AS var2
      FROM init
    ),{",".join(steps)}
    SELECT CASE WHEN mu1 <= mu2 THEN 1 ELSE 2 END AS component,
           w1 AS weight, mu1 AS mean, var1 AS variance, n
    FROM {prev}
    UNION ALL
    SELECT CASE WHEN mu1 <= mu2 THEN 2 ELSE 1 END AS component,
           w2 AS weight, mu2 AS mean, var2 AS variance, n
    FROM {prev}
    """


@query("q340_value_mixture_fit", oracle=_em_oracle_sql(10))
def q340_value_mixture_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component 1-D Gaussian mixture over event values via
    distributed EM (operators/mixture.py): weights, means, variances,
    components ordered by mean — the soft regime-separation that k-means
    (q136) answers only with hard assignments. EM semantics are ALSO
    pinned against a NumPy twin and planted mixtures in
    tests/test_mixture.py (same gate pattern as q126 PageRank / q136
    k-means). Scale: each EM iteration is ONE map-side-combinable
    aggregate (six decimal sufficient statistics); driver state is the
    6 parameters. Reference has no ML surface (SURVEY §2.2).

    Oracle-paired (round 3): fixed 10 iterations (tol=0 — the early
    stop stays an operator feature, but a step-count mismatch would
    break cross-engine equality), DuckDB unrolls the same decimal-
    snapped E+M aggregate per iteration."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.mixture import gaussian_mixture_1d

    fit = gaussian_mixture_1d(
        load(spark, sf_dir, "events").select("value"), "value", n_iter=10,
        tol=0.0,
    )
    rows = [
        (
            int(k + 1),
            float(fit["weight"][k]),
            float(fit["mean"][k]),
            float(fit["var"][k]),
            int(fit["n"]),
        )
        for k in range(2)
    ]
    return spark.createDataFrame(
        rows, "component int, weight double, mean double, variance double, n long"
    )


# ---------------------------------------------------------------------------
# Cluster-safe train/val split (near-dup leakage-proof assignment)
# ---------------------------------------------------------------------------


@query(
    "q341_cluster_safe_split",
    oracle="""
    WITH canon AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
               AS canon
      FROM documents
    ), clusters AS (
      SELECT canon, min(doc_id) AS rep, count(*) AS sz,
             sum(CASE WHEN (doc_id * 2654435761) % 100 < 80
                      THEN 1 ELSE 0 END) AS naive_train
      FROM canon GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS multi_doc_clusters,
           CAST(sum(CASE WHEN naive_train > 0 AND naive_train < sz
                         THEN 1 ELSE 0 END) AS BIGINT) AS leaky_naive,
           CAST(0 AS BIGINT) AS leaky_cluster_safe,
           CAST(sum(CASE WHEN (rep * 2654435761) % 100 < 80 THEN sz
                         ELSE 0 END) AS DOUBLE) / sum(sz) AS train_frac_safe
    FROM clusters
    """,
)
def q341_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-proof train/val splitting: duplicate-content CLUSTERS (not
    documents) are the split unit, assigned by a deterministic hash of
    the cluster representative — so no near-identical pair can straddle
    train and validation, which per-document hashing (the naive split
    this query audits side-by-side) cannot guarantee. Reports how many
    multi-document clusters the naive split actually leaks, and the
    achieved train fraction under the safe assignment (by construction
    the safe split leaks zero — emitted as a pinned column). Scale: one
    canonicalization pass, one groupBy(canon) — the same two-shuffle
    profile as exact dedup (q137), with the split decision a pure hash
    of the aggregate frame. Extends q208's entity-consistent sampling
    and q240's contamination audit into the assignment step itself.
    Reference has no set operations (SURVEY §2.2)."""
    canon = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
        ).alias("canon"),
    )
    clusters = canon.groupBy("canon").agg(
        F.min("doc_id").alias("rep"),
        F.count("*").alias("sz"),
        F.sum(
            F.when(F.pmod(F.col("doc_id") * 2654435761, F.lit(100)) < 80, 1).otherwise(0)
        ).alias("naive_train"),
    )
    return clusters.agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).cast("long").alias("multi_doc_clusters"),
        F.sum(
            F.when(
                (F.col("naive_train") > 0) & (F.col("naive_train") < F.col("sz")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("leaky_naive"),
        F.lit(0).cast("long").alias("leaky_cluster_safe"),
        (
            F.sum(
                F.when(
                    F.pmod(F.col("rep") * 2654435761, F.lit(100)) < 80, F.col("sz")
                ).otherwise(0)
            ).cast("double")
            / F.sum("sz")
        ).alias("train_frac_safe"),
    )


# ---------------------------------------------------------------------------
# Trailing-window sequence feature (last-3 event types as an ordered list)
# ---------------------------------------------------------------------------


@query(
    "q342_trailing_sequence_feature",
    oracle="""
    SELECT event_id,
           array_to_string(
             list(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             '>') AS last3
    FROM events WHERE event_id < 3000
    """,
)
def q342_trailing_sequence_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-sequence feature: for every event, the ordered last-3
    event types of that user as one encoded string — the sliding-context
    feature sequence models and next-event predictors (q297) train on,
    materialized relationally instead of in a Python loop. Scale: one
    user-keyed ordered window with a ROWS frame; collect_list over a
    bounded frame keeps per-row state at 3 elements, and the encode is
    codegen string concat — no UDF, no per-user re-sort beyond the single
    shuffle. Deterministic ordering via the (ts, event_id) tie-break.
    Reference has no windows (SURVEY §2.2)."""
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 3000)
        .select(
            "event_id",
            F.array_join(F.collect_list("event_type").over(w), ">").alias("last3"),
        )
    )


# ---------------------------------------------------------------------------
# Precision-recall threshold sweep with cost-optimal operating point
# ---------------------------------------------------------------------------


@query(
    "q343_pr_threshold_sweep",
    oracle="""
    WITH scored AS (
      SELECT ((user_id * 2654435761) % 1000) / 1000.0 AS score,
             CASE WHEN event_type = 'purchase' AND value > 90
                  THEN 1 ELSE 0 END AS y
      FROM events
    ), th AS (
      SELECT unnest(generate_series(1, 9)) / 10.0 AS t
    ), sweep AS (
      SELECT t,
             sum(CASE WHEN score >= t AND y = 1 THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN score >= t AND y = 0 THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN score < t AND y = 1 THEN 1 ELSE 0 END) AS fn
      FROM scored CROSS JOIN th GROUP BY t
    )
    SELECT t,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
           CAST(fp + 5 * fn AS BIGINT) AS expected_cost,
           CAST(row_number() OVER (ORDER BY fp + 5 * fn ASC, t ASC) = 1
                AS BOOLEAN) AS cost_optimal
    FROM sweep
    """,
)
def q343_pr_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall sweep over nine decision thresholds of the hash
    score against rare high-value purchases, plus the cost-optimal
    operating point under an asymmetric 1:5 FP:FN cost — the
    imbalanced-data evaluation that ROC AUC (q187) flatters and the
    reliability bins (q290) don't price: choosing WHERE to cut is a
    decision problem, and this query solves it in the same pass that
    draws the curve. Scale: one conditional pass per (threshold x
    outcome) cell via a broadcast 9-row threshold ladder; all confusion
    counts exact BIGINTs; the argmin is a deterministic rank. Reference
    has no statistics (SURVEY §2.2)."""
    scored = load(spark, sf_dir, "events").select(
        (F.pmod(F.col("user_id") * 2654435761, F.lit(1000)) / 1000.0).alias("score"),
        F.when(
            (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    th = spark.range(1, 10).select((F.col("id") / 10.0).alias("t"))
    sweep = (
        scored.crossJoin(F.broadcast(th))
        .groupBy("t")
        .agg(
            F.sum(F.when((F.col("score") >= F.col("t")) & (F.col("y") == 1), 1).otherwise(0)).alias("tp"),
            F.sum(F.when((F.col("score") >= F.col("t")) & (F.col("y") == 0), 1).otherwise(0)).alias("fp"),
            F.sum(F.when((F.col("score") < F.col("t")) & (F.col("y") == 1), 1).otherwise(0)).alias("fn"),
        )
    )
    from pyspark.sql.window import Window as W

    cost = F.col("fp") + 5 * F.col("fn")
    return sweep.select(
        "t",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.when(F.col("tp") + F.col("fp") > 0, F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))).alias("precision"),
        F.when(F.col("tp") + F.col("fn") > 0, F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))).alias("recall"),
        cost.cast("long").alias("expected_cost"),
        (F.row_number().over(W.orderBy(F.asc(cost), F.asc("t"))) == 1).alias("cost_optimal"),
    )
