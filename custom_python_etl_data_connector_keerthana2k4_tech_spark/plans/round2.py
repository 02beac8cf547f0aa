"""Round-2 query surface: analytics shapes that round out SURVEY §2.3.

Interval sweep-lines, Pareto frontiers, closed-form per-group regression
and correlation (decimal moments, so distributed sums stay bit-identical
to the serial oracle), Markov transition matrices, deterministic k-fold
carving, incremental materialized-view merging, rule-based constraint
audits, PageRank, and seasonal anomaly screens.

Same determinism rules as plans/relational.py: decimal accumulation for
every distributed sum the oracle re-computes serially, aligned aliases,
unique window tiebreakers. Scale notes live in each docstring and in
SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.joins import asof_join
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.extensions import copurchase_pairs
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.relational import DSUM, dsum
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


# ---------------------------------------------------------------------------
# Sweep-line concurrency: how many orders are open on each day
# ---------------------------------------------------------------------------


@query(
    "q118_order_concurrency",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey, o.o_orderdate AS open_d, max(l.l_shipdate) AS close_d
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), deltas AS (
      SELECT d, CAST(sum(delta) AS BIGINT) AS delta FROM (
        SELECT open_d AS d, 1 AS delta FROM spans
        UNION ALL
        SELECT close_d, -1 FROM spans
      ) GROUP BY d
    )
    SELECT d, CAST(sum(delta) OVER (ORDER BY d) AS BIGINT) AS open_orders
    FROM deltas
    """,
)
def q118_order_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency: an order is "open" from its order
    date until its last shipment; the question is how many are open on
    each day (the max of this series is peak WIP — the classic
    max-concurrent-sessions problem). The scale-critical move: the ±1
    deltas are AGGREGATED PER DAY against the raw tables first (one join
    + one shuffle over the facts), and only the tiny per-day delta frame
    — thousands of rows regardless of fact size — flows into the
    running-sum window. The naive formulation (window over raw events)
    would single-thread 100 TB; this one windows over ~dates. The same
    two-phase prefix-sum extends to per-key partitions if the date
    domain itself ever grows large."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    close = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("close_d"))
    )
    spans = o.join(close, o.o_orderkey == close.l_orderkey).select(
        F.col("o_orderdate").alias("open_d"), "close_d"
    )
    deltas = (
        spans.select(F.col("open_d").alias("d"), F.lit(1).alias("delta"))
        .unionByName(spans.select(F.col("close_d").alias("d"), F.lit(-1).alias("delta")))
        .groupBy("d")
        .agg(F.sum("delta").alias("delta"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return deltas.select("d", F.sum("delta").over(w).alias("open_orders"))


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier
# ---------------------------------------------------------------------------


@query(
    "q119_skyline_parts",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def q119_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline): parts not dominated on (cheaper price,
    larger size). The ORACLE spells out the O(n^2) NOT-EXISTS dominance
    test; the ENGINE uses the sort-and-prefix-max identity — a part is
    dominated iff some strictly-cheaper price level reaches its size, or
    its own price level has a strictly larger part. Per-price best sizes
    come from one groupBy over the raw table (big side, one shuffle);
    the exclusive prefix max runs as operators/ranks.with_running_max —
    range repartition + per-range windows + broadcast max-merge offsets,
    so even a fact-sized distinct-price frame (near-unique prices make it
    entity-grain) never funnels through one task; the verdict
    broadcast-joins back. No self-join of the fact table ever happens —
    that is what makes a skyline feasible at 100 TB."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.ranks import with_running_max

    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    per_price = p.groupBy("p_retailprice").agg(F.max("p_size").alias("best_size"))
    run = with_running_max(
        per_price,
        [F.col("p_retailprice").asc()],
        {"cheaper_best": "best_size"},
        inclusive=False,
    )
    joined = p.join(F.broadcast(run), "p_retailprice")
    dominated = (F.coalesce(F.col("cheaper_best"), F.lit(-1)) >= F.col("p_size")) | (
        F.col("best_size") > F.col("p_size")
    )
    return joined.filter(~dominated).select("p_partkey", "p_retailprice", "p_size")


# ---------------------------------------------------------------------------
# Per-group OLS trend (closed-form, decimal moments)
# ---------------------------------------------------------------------------


@query(
    "q120_group_ols_trend",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2020-01-01', CAST(ts AS DATE))
                  AS DECIMAL(30,10)) AS x,
             CAST(value AS DECIMAL(30,10)) AS y
      FROM events
    ), s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(x * y) AS DOUBLE) AS sxy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
    FROM s
    """,
)
def q120_group_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend of event value over time, in closed
    form: slope = (n·Sxy − Sx·Sy)/(n·Sxx − Sx²). Built-in regr_slope
    accumulates doubles in partition order and would drift between a
    1000-way parallel sum and the oracle's serial one; here the four
    moments accumulate in DECIMAL (exact, order-independent) and the
    final slope/intercept arithmetic is a fixed double expression —
    bit-identical on both engines. One partial-aggregated shuffle over
    the facts, a per-group result frame. X is centered as days-since-
    epoch-2020 so second moments stay far inside decimal range."""
    e = load(spark, sf_dir, "events")
    x = F.datediff(F.to_date("ts"), F.lit("2020-01-01").cast("date")).cast(
        "decimal(30,10)"
    )
    y = F.col("value").cast("decimal(30,10)")
    s = e.select(F.col("event_type"), x.alias("x"), y.alias("y")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "event_type",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / n).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Correlation matrix (decimal moments)
# ---------------------------------------------------------------------------


@query(
    "q121_corr_matrix",
    oracle="""
    WITH pts AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
             CAST(round(l_discount * 100) AS BIGINT) AS z
      FROM lineitem
    ), s AS (
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(z) AS DOUBLE) AS sz,
             CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(y * y) AS DOUBLE) AS syy,
             CAST(sum(z * z) AS DOUBLE) AS szz,
             CAST(sum(x * y) AS DOUBLE) AS sxy, CAST(sum(x * z) AS DOUBLE) AS sxz,
             CAST(sum(y * z) AS DOUBLE) AS syz
      FROM pts GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
             AS corr_qty_price,
           (n * sxz - sx * sz) / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz))
             AS corr_qty_disc,
           (n * syz - sy * sz) / sqrt((n * syy - sy * sy) * (n * szz - sz * sz))
             AS corr_price_disc
    FROM s
    """,
)
def q121_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of three fact measures per group, in
    one aggregation pass. Same determinism argument as q120 — built-in
    corr() would float-drift across partitionings — but the moments are
    quantized-integer (vectors.py's trick: measures are exact at 2
    decimals, so ×100-scaled BIGINTs make every product/sum exact and
    order-independent), and Pearson is scale-invariant so the ×100
    cancels algebraically. Long arithmetic stays in whole-stage codegen
    with no BigDecimal allocation — ~6× faster than the decimal-moment
    formulation under a loaded heap; only the final sums pass through
    DECIMAL(38) to avoid 64-bit overflow (price² sums exceed 2⁶³). One
    shuffle regardless of how many measure pairs are requested (moments
    grow quadratically in measures, rows scanned once)."""
    li = load(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.round(F.col("l_discount") * 100).cast("long").alias("z"),
    )

    def msum(expr) -> F.Column:
        # exact sum: per-row products are longs; the sum alone widens to
        # decimal(38,0) (DuckDB's BIGINT sum widens to HUGEINT likewise)
        return F.sum(expr.cast("decimal(38,0)")).cast("double")

    x, y, z = F.col("x"), F.col("y"), F.col("z")
    s = pts.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        msum(x).alias("sx"),
        msum(y).alias("sy"),
        msum(z).alias("sz"),
        msum(x * x).alias("sxx"),
        msum(y * y).alias("syy"),
        msum(z * z).alias("szz"),
        msum(x * y).alias("sxy"),
        msum(x * z).alias("sxz"),
        msum(y * z).alias("syz"),
    )
    n, sx, sy, sz = F.col("n"), F.col("sx"), F.col("sy"), F.col("sz")
    sxx, syy, szz = F.col("sxx"), F.col("syy"), F.col("szz")
    sxy, sxz, syz = F.col("sxy"), F.col("sxz"), F.col("syz")
    return s.select(
        "l_returnflag",
        "n",
        ((n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).alias(
            "corr_qty_price"
        ),
        ((n * sxz - sx * sz) / F.sqrt((n * sxx - sx * sx) * (n * szz - sz * sz))).alias(
            "corr_qty_disc"
        ),
        ((n * syz - sy * sz) / F.sqrt((n * syy - sy * sy) * (n * szz - sz * sz))).alias(
            "corr_price_disc"
        ),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over event sequences
# ---------------------------------------------------------------------------


@query(
    "q122_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ), t AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS n_transitions
      FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
    )
    SELECT src, dst, n_transitions,
           CAST(n_transitions AS DOUBLE)
             / CAST(sum(n_transitions) OVER (PARTITION BY src) AS DOUBLE) AS prob
    FROM t
    """,
)
def q122_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    (event_type -> next event_type) pair, its count and row-normalized
    probability. One shuffle on user_id for the lead() sequencing, one
    partial-aggregated shuffle to the |types|^2 transition frame; the
    normalizing window runs over that tiny frame, never the raw events.
    The probability is a single long/long double division — identical
    bits on both engines."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    t = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_transitions"))
    norm = Window.partitionBy("src")
    return t.select(
        "src",
        "dst",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(norm).cast("double")
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified k-fold carving
# ---------------------------------------------------------------------------


@query(
    "q123_kfold_stratified",
    oracle=f"""
    SELECT CAST(((o_orderkey * 2654435761) % 4294967296) % 5 AS BIGINT) AS fold,
           o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           {DSUM('o_totalprice')} AS total
    FROM orders GROUP BY 1, 2
    """,
)
def q123_kfold_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation carving with a stratification audit: fold =
    Knuth-hash(key) mod k (q58's engine-independent uniform, so the SAME
    rows land in the same fold on any engine, partitioning, or rerun —
    df.randomSplit cannot promise that), and the output is the per-fold
    per-stratum count/mass balance sheet a training pipeline checks
    before trusting the split. Pure map-side arithmetic plus one
    partial-aggregated shuffle; at 100 TB the fold assignment is a
    pushdown-friendly projected column, and carving fold i out later is
    a plain filter with no stored split table. Keys wider than ~2^33
    would overflow the 64-bit product; production would hash via
    xxhash64 — kept as plain arithmetic here so the oracle can replay
    it."""
    o = load(spark, sf_dir, "orders")
    fold = ((F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296)) % F.lit(5)
    return (
        o.select(fold.alias("fold"), "o_orderstatus", "o_totalprice")
        .groupBy("fold", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance (merge partial states)
# ---------------------------------------------------------------------------


@query(
    "q124_incremental_view_merge",
    oracle=f"""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           {DSUM('o_totalprice')} AS total_spend
    FROM orders GROUP BY o_custkey
    """,
)
def q124_incremental_view_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-customer rollup
    is computed as two INDEPENDENT partial states — the "base" history
    (orders before 1997) and the "delta" batch (1997+) — then merged by
    re-aggregating (count partials add; decimal sum partials add
    exactly). The ORACLE recomputes from scratch; equality proves the
    merge operator is lossless, which is the property that lets a 100 TB
    view absorb a daily 100 GB delta without rescanning history: persist
    the partial-state frame, aggregate only the delta, merge, write
    back. Same pattern as q77's rollup cascade and q103's HLL union,
    here for the exact count/sum state."""
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(30,10)")).alias("ps"),
        )

    base = partial(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(F.sum("pn").alias("n_orders"), F.sum("ps").cast("double").alias("total_spend"))
    )


# ---------------------------------------------------------------------------
# Rule-based constraint audit (data-quality pre-flight)
# ---------------------------------------------------------------------------


@query(
    "q125_constraint_audit",
    oracle="""
    SELECT 'orders_orphan_custkey' AS rule, CAST((
      SELECT count(*) FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    ) AS BIGINT) AS violations
    UNION ALL
    SELECT 'lineitem_orphan_orderkey', CAST((
      SELECT count(*) FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    ) AS BIGINT)
    UNION ALL
    SELECT 'orders_nonpositive_total', CAST((
      SELECT count(*) FROM orders WHERE o_totalprice <= 0
    ) AS BIGINT)
    UNION ALL
    SELECT 'events_null_user', CAST((
      SELECT count(*) FROM events WHERE user_id IS NULL
    ) AS BIGINT)
    UNION ALL
    SELECT 'events_duplicate_id', CAST((
      SELECT count(*) - count(DISTINCT event_id) FROM events
    ) AS BIGINT)
    """,
)
def q125_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit: one row per constraint with its
    violation count — referential integrity (orphan foreign keys, via
    left-anti joins whose small build sides broadcast), domain rules
    (non-positive totals: a pushed-down scan predicate), null checks,
    and key uniqueness (count − count distinct). This is the pre-flight
    a training pipeline runs before trusting a new drop; every rule is
    an independent aggregate over a pruned scan, so the audit costs one
    pass per fact table and the result frame is rule-sized. At 100 TB
    the rules would share scans via a single multi-aggregate pass per
    table; kept one-rule-one-frame here for declarative clarity."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    e = load(spark, sf_dir, "events")

    def rule(name: str, count_df: DataFrame) -> DataFrame:
        return count_df.select(
            F.lit(name).alias("rule"), F.col("violations").cast("long").alias("violations")
        )

    orphan_orders = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    orphan_lines = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    nonpos = o.filter(F.col("o_totalprice") <= 0).agg(
        F.count(F.lit(1)).alias("violations")
    )
    null_user = e.filter(F.col("user_id").isNull()).agg(
        F.count(F.lit(1)).alias("violations")
    )
    dup_ids = e.agg(
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("violations")
    )
    return (
        rule("orders_orphan_custkey", orphan_orders)
        .unionByName(rule("lineitem_orphan_orderkey", orphan_lines))
        .unionByName(rule("orders_nonpositive_total", nonpos))
        .unionByName(rule("events_null_user", null_user))
        .unionByName(rule("events_duplicate_id", dup_ids))
    )


# ---------------------------------------------------------------------------
# PageRank (iterative, decimal-summed contributions)
# ---------------------------------------------------------------------------


def pagerank(
    edges: DataFrame, *, iterations: int = 6, damping: float = 0.85
) -> DataFrame:
    """PageRank over a directed edge list (``src``, ``dst``) with uniform
    teleport. Each iteration is one hash join of ranks onto the
    out-degree-annotated edges plus one aggregation; contributions are
    accumulated in DECIMAL so the distributed sum is order-independent
    and runs are bit-reproducible. Ranks are checkpointed every third
    iteration to cut the growing lineage (same discipline as
    operators/dedup.connected_components). Dangling nodes are absent by
    construction in symmetric graphs; for general graphs add their mass
    to the teleport term."""
    out = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ann = edges.join(out, "src").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for i in range(iterations):
        contribs = (
            ann.join(ranks, ann.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).cast("decimal(38,18)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("double").alias("mass"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % 3 == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def _pagerank_oracle_sql(iterations: int = 6) -> str:
    """Unrolled fixed-iteration PageRank in DuckDB — the engine's exact
    twin. Contributions are snapped to DECIMAL(38,18) before the sum in
    BOTH engines, so the per-iteration aggregate is order-independent and
    exact; the only float ops are scalar (division, damping blend), which
    agree across engines to ~1e-19 — far inside the 1e8 readout grid."""
    steps = []
    prev = "r0"
    for i in range(1, iterations + 1):
        steps.append(f"""
    r{i} AS (
      SELECT n.node,
             (1.0 - 0.85) / nn.n
               + 0.85 * coalesce(m.mass, 0.0) AS rank
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (
        SELECT a.dst AS node,
               CAST(sum(CAST(r.rank / a.out_deg AS DECIMAL(38,18))) AS DOUBLE) AS mass
        FROM ann a JOIN {prev} r ON a.src = r.node GROUP BY 1
      ) m ON m.node = n.node
    )""")
        prev = f"r{i}"
    return f"""
    WITH p AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ),
    e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
    deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
    ann AS (SELECT e.src, e.dst, d.out_deg FROM e JOIN deg d ON e.src = d.src),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),{",".join(steps)}
    SELECT CAST(node AS BIGINT) AS node,
           CAST(round(rank * 100000000) AS BIGINT) AS rank_e8
    FROM {prev}
    """


@query("q126_pagerank", oracle=_pagerank_oracle_sql(6))
def q126_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality of the co-purchase graph (edges from q93's
    basket pairs, symmetrized). Six join+aggregate rounds; the edge set
    and node set are localCheckpointed once so every iteration reuses
    materialized inputs instead of replaying the basket build. ALSO
    verified in tests/test_round2.py against a dense NumPy power
    iteration on the same graph.

    Oracle-paired (round 3): the iteration count is FIXED, so the
    "iterative fixpoint" objection dissolves — DuckDB unrolls the six
    rounds as chained CTEs. Reproducibility across engines comes from
    the same device the engine already used for run-to-run determinism:
    per-edge contributions snap to DECIMAL(38,18) before the aggregate,
    making the sum exact and order-free; ranks then read out on a 1e8
    integer grid (scalar float ops agree to ~1e-19, so the grid never
    straddles)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        copurchase_pairs(li)
        .filter(F.col("n_orders") >= 2)
        .select(F.col("part_a").alias("src"), F.col("part_b").alias("dst"))
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, iterations=6, damping=0.85)
    return ranks.select(
        F.col("node").cast("long").alias("node"),
        F.round(F.col("rank") * F.lit(100000000.0)).cast("long").alias("rank_e8"),
    )


# ---------------------------------------------------------------------------
# Seasonal anomaly screen (same-weekday trailing baseline)
# ---------------------------------------------------------------------------


@query(
    "q127_weekday_anomaly",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS d, {DSUM('o_totalprice')} AS revenue
      FROM orders GROUP BY 1
    ), lagged AS (
      SELECT d, revenue,
             lag(revenue, 1) OVER w AS l1, lag(revenue, 2) OVER w AS l2,
             lag(revenue, 3) OVER w AS l3, lag(revenue, 4) OVER w AS l4
      FROM daily
      WINDOW w AS (PARTITION BY dayofweek(CAST(d AS DATE)) ORDER BY d)
    )
    SELECT d, revenue,
           (l1 + l2 + l3 + l4) / 4 AS expected,
           revenue / ((l1 + l2 + l3 + l4) / 4) AS ratio
    FROM lagged WHERE l4 IS NOT NULL
    """,
)
def q127_weekday_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly screen: each day's revenue against the average of
    the trailing four SAME-WEEKDAY days (Mondays compare to Mondays —
    the baseline that doesn't false-alarm on weekly cycles). Raw facts
    collapse to one row per day first, so the weekday-partitioned lag
    windows run over ~dates, not 100 TB of orders. The baseline is an
    explicit (l1+l2+l3+l4)/4 expression rather than a windowed avg():
    a fixed four-term double expression is bit-deterministic, while
    sliding-frame avg implementations are free to accumulate in any
    order. Spark's and DuckDB's weekday numberings differ by an offset,
    which is irrelevant here — the weekday is only a partition key."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        dsum("o_totalprice").alias("revenue")
    )
    w = Window.partitionBy(F.dayofweek(F.to_date("d"))).orderBy("d")
    lagged = daily.select(
        "d",
        "revenue",
        F.lag("revenue", 1).over(w).alias("l1"),
        F.lag("revenue", 2).over(w).alias("l2"),
        F.lag("revenue", 3).over(w).alias("l3"),
        F.lag("revenue", 4).over(w).alias("l4"),
    ).filter(F.col("l4").isNotNull())
    expected = (F.col("l1") + F.col("l2") + F.col("l3") + F.col("l4")) / 4
    return lagged.select(
        "d",
        "revenue",
        expected.alias("expected"),
        (F.col("revenue") / expected).alias("ratio"),
    )


# ---------------------------------------------------------------------------
# Point-in-time interval join against an SCD2 dimension
# ---------------------------------------------------------------------------


@query(
    "q128_pit_interval_join",
    oracle="""
    WITH snap AS (
      SELECT user_id, ts AS valid_from, max(event_id) AS version_id,
             max_by(value, event_id) AS attr_value
      FROM events WHERE event_type = 'signup' GROUP BY 1, 2
    ), dim AS (
      SELECT user_id, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               AS valid_to,
             version_id, attr_value
      FROM snap
    )
    SELECT e.event_id, e.user_id, e.ts, d.valid_from, d.version_id, d.attr_value
    FROM events e LEFT JOIN dim d
      ON e.user_id = d.user_id AND e.ts >= d.valid_from
     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    WHERE e.event_type = 'click'
    """,
)
def q128_pit_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment against an SCD2 dimension: each click gets
    the signup-attribute version valid AT its timestamp. The ORACLE
    proves containment semantics with an explicit half-open interval
    join (valid_from <= ts < valid_to); the ENGINE exploits that SCD2
    versions tile time per key, so interval containment IS a backward
    as-of match on valid_from — operators/joins.asof_join does it in
    ONE shuffle with zero row explosion, versus the interval join's
    |events|x|versions-per-user| intermediate. Same-timestamp mutations
    are snapshotted to one version (max event_id wins) so both engines
    are deterministic."""
    e = load(spark, sf_dir, "events")
    snap = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", F.col("ts").alias("valid_from"))
        .agg(
            F.max("event_id").alias("version_id"),
            F.max_by("value", "event_id").alias("attr_value"),
        )
    )
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    return asof_join(
        clicks, snap, on="user_id", left_time="ts", right_time="valid_from"
    ).select("event_id", "user_id", "ts", "valid_from", "version_id", "attr_value")


# ---------------------------------------------------------------------------
# Inverted index (posting lists) over the document corpus
# ---------------------------------------------------------------------------


@query(
    "q129_inverted_index",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
      FROM documents
    )
    SELECT token, CAST(count(*) AS BIGINT) AS df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM tok WHERE token <> '' GROUP BY token
    """,
)
def q129_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: token -> document frequency + its posting
    list, the retrieval-side dual of q82's vocabulary. Postings sort
    NUMERICALLY before rendering (array_sort on the bigint ids, then
    cast) so the engine's unordered collect_list matches the oracle's
    ORDER BY exactly. One explode + one distinct + one aggregation; at
    100 TB the posting list for a stopword-grade token would blow the
    row budget, so production shards postings by (token, bucket) — the
    df column is exactly the statistic that picks which tokens need
    sharding."""
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    return tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("postings"),
    )


# ---------------------------------------------------------------------------
# A/B experiment readout (Welch's t, decimal moments)
# ---------------------------------------------------------------------------


@query(
    "q130_ab_welch_test",
    oracle="""
    WITH assigned AS (
      SELECT CAST(((user_id * 2654435761) % 4294967296) % 2 AS BIGINT) AS arm,
             CAST(value AS DECIMAL(30,10)) AS v
      FROM events WHERE event_type = 'purchase'
    ), s AS (
      SELECT
        CAST(count(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS na,
        CAST(count(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS nb,
        CAST(sum(CASE WHEN arm = 0 THEN v END) AS DOUBLE) AS sa,
        CAST(sum(CASE WHEN arm = 1 THEN v END) AS DOUBLE) AS sb,
        CAST(sum(CASE WHEN arm = 0 THEN v * v END) AS DOUBLE) AS saa,
        CAST(sum(CASE WHEN arm = 1 THEN v * v END) AS DOUBLE) AS sbb
      FROM assigned
    )
    SELECT na, nb, sa / na AS mean_a, sb / nb AS mean_b,
           (sb / nb) / (sa / na) - 1 AS lift,
           (sb / nb - sa / na)
             / sqrt(((saa - sa * sa / na) / (na - 1)) / na
                    + ((sbb - sb * sb / nb) / (nb - 1)) / nb) AS welch_t
    FROM s
    """,
)
def q130_ab_welch_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout in one aggregation pass: deterministic arm
    assignment (q58's Knuth hash — the SAME users land in the same arm
    on every engine and rerun, which randomSplit cannot promise), then
    per-arm counts/sums/sums-of-squares as conditional decimal
    aggregates, then mean lift and Welch's unequal-variance t statistic
    as fixed double expressions. No groupBy-then-pivot: the conditional
    aggregates keep it a single map-side-combined pass with a one-row
    result, which is how experiment scorecards stay cheap when the
    metrics table is 100 TB."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    arm = ((F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296)) % F.lit(2)
    v = F.col("value").cast("decimal(30,10)")
    a, b = F.col("arm") == 0, F.col("arm") == 1
    s = e.select(arm.alias("arm"), v.alias("v")).agg(
        F.count(F.when(a, 1)).alias("na"),
        F.count(F.when(b, 1)).alias("nb"),
        F.sum(F.when(a, F.col("v"))).cast("double").alias("sa"),
        F.sum(F.when(b, F.col("v"))).cast("double").alias("sb"),
        F.sum(F.when(a, F.col("v") * F.col("v"))).cast("double").alias("saa"),
        F.sum(F.when(b, F.col("v") * F.col("v"))).cast("double").alias("sbb"),
    )
    na, nb = F.col("na"), F.col("nb")
    sa, sb, saa, sbb = F.col("sa"), F.col("sb"), F.col("saa"), F.col("sbb")
    ma, mb = sa / na, sb / nb
    va, vb = (saa - sa * sa / na) / (na - 1), (sbb - sb * sb / nb) / (nb - 1)
    return s.select(
        "na",
        "nb",
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        (mb / ma - 1).alias("lift"),
        ((mb - ma) / F.sqrt(va / na + vb / nb)).alias("welch_t"),
    )


# ---------------------------------------------------------------------------
# Sliding-window document chunking (context-window prep)
# ---------------------------------------------------------------------------


@query(
    "q131_doc_chunking",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, len(toks) - 1, 40)) AS start
      FROM d WHERE len(toks) > 0
    )
    SELECT doc_id, CAST(start // 40 AS BIGINT) AS chunk_id,
           array_to_string(toks[start + 1 : start + 50], ' ') AS chunk_text,
           CAST(len(toks[start + 1 : start + 50]) AS BIGINT) AS n_tokens
    FROM s
    """,
)
def q131_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: each document becomes overlapping
    50-token chunks on a 40-token stride (10 tokens of overlap), the
    standard context-window prep for embedding/pretraining pipelines
    (complementary to q39's packing, which concatenates — this one
    splits). Entirely narrow operations: split, sequence, explode,
    slice — no shuffle at all, so it scales with raw scan bandwidth.
    The chunk grid comes from an explicit integer sequence so both
    engines enumerate identical (start, length) windows; the final
    short chunk is kept (slice clamps), matching the oracle's list
    slicing."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "\\s+"), lambda x: x != "")
    d = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    s = d.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.size("toks") - 1, F.lit(40))).alias("start"),
    )
    chunk = F.slice("toks", F.col("start") + 1, 50)
    return s.select(
        "doc_id",
        (F.col("start") / 40).cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# User journey paths (ordered first-k funnel strings)
# ---------------------------------------------------------------------------


@query(
    "q132_user_paths",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), paths AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 5 GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    """,
)
def q132_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User journey analysis: each user's first five events collapse to
    an ordered path string ('signup>view>click>...'), then paths are
    counted — the exploratory dual of q80's fixed-order funnel. One
    shuffle on user_id covers both the ranking window and the path
    aggregation (same key, Catalyst reuses the partitioning); the
    second aggregation runs over the tiny distinct-path frame. Ordering
    inside the path is pinned by collecting (rn, type) structs and
    array_sorting before join — collect_list alone is
    partition-order-dependent and would scramble under AQE."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first5 = (
        e.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )
    paths = first5.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# Hierarchy contribution shares (percent-of-parent rollup)
# ---------------------------------------------------------------------------


@query(
    "q133_hierarchy_share",
    oracle="""
    WITH rev AS (
      SELECT r.r_name, n.n_name,
             sum(CAST(o.o_totalprice AS DECIMAL(30,10))) AS rev_dec
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    )
    SELECT r_name, n_name, CAST(rev_dec AS DOUBLE) AS revenue,
           CAST(rev_dec AS DOUBLE)
             / CAST(sum(rev_dec) OVER (PARTITION BY r_name) AS DOUBLE)
             AS share_of_region,
           CAST(rev_dec AS DOUBLE) / CAST(sum(rev_dec) OVER () AS DOUBLE)
             AS share_of_total
    FROM rev
    """,
)
def q133_hierarchy_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent at two hierarchy levels: each nation's revenue
    as a share of its region and of the world (q94's ratio-to-report
    generalized to a cascade). The fact table aggregates FIRST — dims
    broadcast onto orders, one partial-aggregated shuffle — and the
    share windows run over the ~nations-sized frame. Window sums stay
    in DECIMAL until the final double cast: a windowed double sum's
    accumulation order is engine-internal and would drift; the decimal
    sum is exact on both."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,10)")).alias("rev_dec"))
    )
    wr = Window.partitionBy("r_name")
    wt = Window.partitionBy()
    revenue = F.col("rev_dec").cast("double")
    return rev.select(
        "r_name",
        "n_name",
        revenue.alias("revenue"),
        (revenue / F.sum("rev_dec").over(wr).cast("double")).alias("share_of_region"),
        (revenue / F.sum("rev_dec").over(wt).cast("double")).alias("share_of_total"),
    )
