"""Round-15 additions: data profiling & sampling design & clustering
evaluation — functional-dependency discovery (which column implications
actually hold, the schema-inference pre-flight), Neyman optimal
allocation of a sampling budget across strata (variance-weighted, the
statistically correct version of proportional sampling), centroid-based
silhouette scores per embedding label (clustering quality without the
O(n^2) pairwise silhouette), and a per-step two-proportion funnel
readout between experiment arms.

The reference computes none of these (complete operator surface:
/root/reference/etl_connector.py:53-242; SURVEY §2.1-2.2). All four are
oracle-paired (DuckDB) and auto-gated by tests/test_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.vectors import sql_quantize
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.relational import DSUM, dsum
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# Functional-dependency discovery over lineitem
# ---------------------------------------------------------------------------

_FD_CANDIDATES = [
    ("l_orderkey", "l_returnflag"),
    ("l_orderkey", "l_linestatus"),
    ("l_orderkey", "l_shipdate"),
    ("l_partkey", "l_suppkey"),
    ("l_suppkey", "l_partkey"),
    ("l_partkey", "l_extendedprice"),
]


def _fd_oracle() -> str:
    parts = [
        f"""
        SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS violating_groups,
               CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0
                    AS BOOLEAN) AS holds
        FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS n_rhs
              FROM lineitem GROUP BY 1)
        """
        for lhs, rhs in _FD_CANDIDATES
    ]
    return " UNION ALL ".join(parts)


@query("q310_fd_discovery", oracle=_fd_oracle())
def q310_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery: for each candidate implication
    lhs -> rhs over lineitem, how many lhs groups carry more than one
    rhs value — the profiling pass that tells schema inference which
    columns are denormalized copies (orderkey -> shipdate holds: ship
    date is order-grain in this fixture) and which only look dependent
    (partkey -> suppkey fails: parts have many suppliers). Scale: each
    candidate is one column-pruned scan + one groupBy(lhs) with a
    distinct-count — map-side combinable, and candidates evaluate
    independently (a real profiler fans them out in one job each); the
    union frame is 6 rows. Exact integer counts. Reference has no
    aggregation (SURVEY §2.2)."""
    li = load(spark, sf_dir, "lineitem")
    frames = []
    for lhs, rhs in _FD_CANDIDATES:
        g = li.groupBy(lhs).agg(F.countDistinct(rhs).alias("n_rhs"))
        viol = F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
        frames.append(
            g.agg(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.count("*").cast("long").alias("n_groups"),
                viol.cast("long").alias("violating_groups"),
                (viol == 0).alias("holds"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


# ---------------------------------------------------------------------------
# Neyman optimal allocation of a sampling budget across strata
# ---------------------------------------------------------------------------


@query(
    "q311_neyman_allocation",
    oracle=f"""
    WITH strata AS (
      SELECT c_mktsegment AS segment,
             count(*) AS n,
             {DSUM('o_totalprice')} AS s,
             {DSUM('o_totalprice * o_totalprice')} AS ss
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY 1
    ), w AS (
      SELECT segment, n,
             n * sqrt(ss / n - (s / n) * (s / n)) AS weight
      FROM strata
    ), quota AS (
      SELECT segment, n, weight,
             1000 * weight / (SELECT sum(weight) FROM w) AS exact_quota
      FROM w
    ), alloc AS (
      SELECT segment, n, exact_quota,
             CAST(floor(exact_quota) AS BIGINT) AS base,
             row_number() OVER (ORDER BY exact_quota - floor(exact_quota) DESC,
                                segment ASC) AS rk,
             (SELECT 1000 - sum(CAST(floor(exact_quota) AS BIGINT)) FROM quota)
               AS leftover
      FROM quota
    )
    SELECT segment, CAST(n AS BIGINT) AS stratum_size,
           round(exact_quota, 6) AS exact_quota,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
    FROM alloc
    """,
)
def q311_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman allocation of a 1000-row sampling budget across customer
    segments: each stratum gets budget proportional to N_h * sigma_h of
    order value — the design that minimizes the estimator's variance,
    versus proportional allocation which over-samples homogeneous
    strata. Integer seats come from largest-remainder apportionment
    (floor + ranked remainders, segment tie-break) so the allocation
    sums to the budget exactly — the same integer-apportionment
    discipline as q239/q249. Scale: one fact-dim join and one
    groupBy(segment) collapse the fact to 5 strata; everything after is
    5-row frame algebra with one one-row total broadcast. Decimal
    moments make sigma identical on both engines. Reference has no
    statistics (SURVEY §2.2)."""
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    strata = (
        load(spark, sf_dir, "orders")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("s"),
            dsum(F.col("o_totalprice") * F.col("o_totalprice")).alias("ss"),
        )
    )
    mean = F.col("s") / F.col("n")
    w = strata.select(
        "segment",
        "n",
        (F.col("n") * F.sqrt(F.col("ss") / F.col("n") - mean * mean)).alias("weight"),
    )
    tot = w.agg(F.sum("weight").alias("wtot"))
    quota = w.join(F.broadcast(tot)).select(
        "segment", "n", (1000 * F.col("weight") / F.col("wtot")).alias("exact_quota")
    )
    base_sum = quota.agg(
        F.sum(F.floor(F.col("exact_quota")).cast("long")).alias("base_total")
    )
    alloc = (
        quota.join(F.broadcast(base_sum))
        .withColumn("base", F.floor(F.col("exact_quota")).cast("long"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(
                    F.desc(F.col("exact_quota") - F.floor(F.col("exact_quota"))),
                    F.asc("segment"),
                )
            ),
        )
        .withColumn("leftover", F.lit(1000) - F.col("base_total"))
    )
    return alloc.select(
        "segment",
        F.col("n").cast("long").alias("stratum_size"),
        F.round("exact_quota", 6).alias("exact_quota"),
        (F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
        .cast("long")
        .alias("alloc"),
    )


# ---------------------------------------------------------------------------
# Centroid-based silhouette score per embedding label
# ---------------------------------------------------------------------------


@query(
    "q312_silhouette_centroid",
    oracle=f"""
    WITH comp AS (
      SELECT vec_id, label, unnest({sql_quantize('embedding')}) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ), cent AS (
      SELECT label, i, sum(x) AS s, count(*) AS n FROM comp GROUP BY 1, 2
    ), pd AS (
      SELECT c.vec_id, c.label AS own, ct.label AS other,
             sum((ct.n * c.x - ct.s) * (ct.n * c.x - ct.s))
               / (CAST(max(ct.n) AS DOUBLE) * max(ct.n)) AS dsq
      FROM comp c JOIN cent ct USING (i)
      GROUP BY 1, 2, 3
    ), ab AS (
      SELECT vec_id, own,
             max(CASE WHEN own = other THEN dsq END) AS a_sq,
             min(CASE WHEN own <> other THEN dsq END) AS b_sq
      FROM pd GROUP BY 1, 2
    ), s AS (
      SELECT own AS label,
             (sqrt(b_sq) - sqrt(a_sq))
               / greatest(sqrt(a_sq), sqrt(b_sq)) AS sil
      FROM ab
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           {DSUM('sil')} / count(*) AS mean_silhouette
    FROM s GROUP BY 1
    """,
)
def q312_silhouette_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based silhouette per label: for each embedding, distance
    to its own label centroid (a) vs the nearest other centroid (b),
    scored (b-a)/max(a,b) and averaged per label — the O(n*k) clustering
    quality readout that replaces the O(n^2) pairwise silhouette at
    corpus scale (completes q65 centroids / q188 centroid distances /
    q136 k-means). Scale: component explode keeps everything relational
    — the centroid frame is (labels x dims) integer sums that broadcast
    into one pass over the exploded components, and the per-(point,
    label) distance n^2*d^2 = sum((n*x - s)^2) is EXACT integer algebra
    divided once, so a/b comparisons are bit-identical on both engines.
    Reference has no vector surface (SURVEY §2.2)."""
    comp = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.posexplode(
                F.transform(
                    F.col("embedding"),
                    lambda x: F.round(x.cast("double") * 1_000_000).cast("long"),
                )
            ).alias("i0", "x"),
        )
        .select("vec_id", "label", (F.col("i0") + 1).alias("i"), "x")
    )
    cent = comp.groupBy(F.col("label").alias("clabel"), "i").agg(
        F.sum("x").alias("s"), F.count("*").alias("n")
    )
    pd_ = (
        comp.join(F.broadcast(cent), "i")
        .groupBy("vec_id", F.col("label").alias("own"), F.col("clabel").alias("other"))
        .agg(
            (
                F.sum(
                    (F.col("n") * F.col("x") - F.col("s"))
                    * (F.col("n") * F.col("x") - F.col("s"))
                )
                / (F.max("n").cast("double") * F.max("n"))
            ).alias("dsq")
        )
    )
    ab = pd_.groupBy("vec_id", "own").agg(
        F.max(F.when(F.col("own") == F.col("other"), F.col("dsq"))).alias("a_sq"),
        F.min(F.when(F.col("own") != F.col("other"), F.col("dsq"))).alias("b_sq"),
    )
    sil = ab.select(
        F.col("own").alias("label"),
        (
            (F.sqrt(F.col("b_sq")) - F.sqrt(F.col("a_sq")))
            / F.greatest(F.sqrt(F.col("a_sq")), F.sqrt(F.col("b_sq")))
        ).alias("sil"),
    )
    return sil.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        (dsum("sil") / F.count("*")).alias("mean_silhouette"),
    )


# ---------------------------------------------------------------------------
# Experiment funnel: per-step two-proportion z between arms
# ---------------------------------------------------------------------------


@query(
    "q313_funnel_dropoff_z",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(((user_id * 2654435761) % 4294967296) // 2147483648
                  AS BIGINT) AS arm,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s_view,
             max(CASE WHEN event_type = 'click' AND value > 50
                      THEN 1 ELSE 0 END) AS s_click,
             max(CASE WHEN event_type = 'purchase' AND value > 90
                      THEN 1 ELSE 0 END) AS s_buy
      FROM events GROUP BY 1
    ), steps AS (
      SELECT arm, 'view_to_click' AS step,
             sum(s_view) AS base, sum(CASE WHEN s_view = 1 AND s_click = 1
                                           THEN 1 ELSE 0 END) AS conv
      FROM u GROUP BY 1
      UNION ALL
      SELECT arm, 'click_to_buy',
             sum(s_click), sum(CASE WHEN s_click = 1 AND s_buy = 1
                                    THEN 1 ELSE 0 END)
      FROM u GROUP BY 1
    ), wide AS (
      SELECT step,
             sum(CASE WHEN arm = 1 THEN base ELSE 0 END) AS bt,
             sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS ct,
             sum(CASE WHEN arm = 0 THEN base ELSE 0 END) AS bc,
             sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS cc
      FROM steps GROUP BY 1
    )
    SELECT step,
           CAST(bt AS BIGINT) AS n_treat, CAST(bc AS BIGINT) AS n_ctrl,
           CAST(ct AS DOUBLE) / bt AS rate_treat,
           CAST(cc AS DOUBLE) / bc AS rate_ctrl,
           CASE WHEN ct + cc > 0 AND ct + cc < bt + bc THEN
             (CAST(ct AS DOUBLE) / bt - CAST(cc AS DOUBLE) / bc)
               / sqrt((CAST(ct + cc AS DOUBLE) / (bt + bc))
                      * (1 - CAST(ct + cc AS DOUBLE) / (bt + bc))
                      * (1.0 / bt + 1.0 / bc)) END AS z
    FROM wide
    """,
)
def q313_funnel_dropoff_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment funnel readout: view->click and click->purchase
    conversion per hash arm, with the pooled two-proportion z statistic
    per step — localizes WHERE in the funnel a treatment moves behavior,
    which the overall conversion test (q130) averages away. Scale: one
    conditional-max pass per user, a 2x2-arm step frame, and exact
    integer counts into three divisions and one sqrt. Arm is the
    high-bit Knuth hash (decorrelated from dense ids, per q302's
    analysis). Reference has no statistics (SURVEY §2.2)."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("s_view"),
            F.max(
                F.when((F.col("event_type") == "click") & (F.col("value") > 50), 1).otherwise(0)
            ).alias("s_click"),
            F.max(
                F.when((F.col("event_type") == "purchase") & (F.col("value") > 90), 1).otherwise(
                    0
                )
            ).alias("s_buy"),
        )
        .withColumn(
            "arm",
            F.floor(
                F.pmod(F.col("user_id") * 2654435761, F.lit(4294967296)) / F.lit(2147483648)
            ).cast("long"),
        )
    )
    v2c = u.groupBy("arm").agg(
        F.lit("view_to_click").alias("step"),
        F.sum("s_view").alias("base"),
        F.sum(F.when((F.col("s_view") == 1) & (F.col("s_click") == 1), 1).otherwise(0)).alias(
            "conv"
        ),
    )
    c2b = u.groupBy("arm").agg(
        F.lit("click_to_buy").alias("step"),
        F.sum("s_click").alias("base"),
        F.sum(F.when((F.col("s_click") == 1) & (F.col("s_buy") == 1), 1).otherwise(0)).alias(
            "conv"
        ),
    )
    steps = v2c.unionAll(c2b)
    wide = steps.groupBy("step").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("base")).otherwise(0)).alias("bt"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("arm") == 0, F.col("base")).otherwise(0)).alias("bc"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("cc"),
    )
    rt = F.col("ct").cast("double") / F.col("bt")
    rc = F.col("cc").cast("double") / F.col("bc")
    pooled = (F.col("ct") + F.col("cc")).cast("double") / (F.col("bt") + F.col("bc"))
    return wide.select(
        "step",
        F.col("bt").cast("long").alias("n_treat"),
        F.col("bc").cast("long").alias("n_ctrl"),
        rt.alias("rate_treat"),
        rc.alias("rate_ctrl"),
        F.when(
            ((F.col("ct") + F.col("cc")) > 0)
            & ((F.col("ct") + F.col("cc")) < (F.col("bt") + F.col("bc"))),
            (rt - rc)
            / F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("bt") + 1.0 / F.col("bc"))),
        ).alias("z"),
    )
