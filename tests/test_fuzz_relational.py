"""Grammar-based differential fuzzing of the relational surface
(SURVEY §5.2.6 extension): hypothesis draws random plans from a bounded
grammar (table -> filters -> project | aggregate | window | set-op |
join+aggregate | COMPOSED shapes: outer-join->window, set-op->aggregate,
set-op->window), each plan is rendered BOTH as a Spark DataFrame program
and as DuckDB SQL, and the results must match canonically (sorted
columns, sorted rows, doubles rounded to 6).

This covers the combinational space BETWEEN the 374 hand-written
oracle-paired queries: filter/projection/aggregation/join corners the
fixed suite doesn't enumerate (operator x literal x null-order x
group-cardinality interactions). Sums/averages go through the same
decimal-accumulation pact as the main suite (plans/relational.py dsum/
DSUM) so cross-engine float summation order can't produce flakes.

Determinism: hypothesis derives examples from a fixed seed database in
CI fashion (derandomize), so failures replay.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.relational import DAVG, DSUM, davg, dsum
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"

# numeric / key / date columns per table (narrow, known domains)
_TABLES = {
    "lineitem": {
        "nums": {
            "l_quantity": (1.0, 50.0),
            "l_extendedprice": (900.0, 100_000.0),
            "l_discount": (0.0, 0.10),
            "l_tax": (0.0, 0.08),
        },
        "keys": {
            "l_returnflag": ["A", "N", "R"],
            "l_linestatus": ["F", "O"],
        },
        "ids": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "date": ("l_shipdate", "1992-01-01", "1998-12-01"),
    },
    "orders": {
        "nums": {"o_totalprice": (800.0, 600_000.0)},
        "keys": {"o_orderstatus": ["F", "O", "P"]},
        "ids": ["o_orderkey", "o_custkey"],
        "date": ("o_orderdate", "1992-01-01", "1998-08-02"),
    },
    "customer": {
        "nums": {"c_acctbal": (-1_000.0, 10_000.0)},
        "keys": {"c_mktsegment": None},  # sampled from data below
        "ids": ["c_custkey", "c_nationkey"],
        "date": None,
    },
}

_CMP = ["<", "<=", ">", ">=", "=", "<>"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        elif pdf[c].dtype.kind == "M":
            # Spark hands datetime64[ns], DuckDB datetime64[us]: same
            # instants, different epoch units — normalize before compare
            pdf[c] = pdf[c].astype("datetime64[ns]")
        elif pdf[c].dtype == object:
            # NULL group keys sort consistently on both engines
            pdf[c] = pdf[c].where(pdf[c].notna(), "~null~")
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


# --- plan grammar -----------------------------------------------------------


@st.composite
def _filter(draw, table: str):
    """One predicate as (spark_condition_builder, sql_text)."""
    spec = _TABLES[table]
    kind = draw(st.sampled_from(["num", "key", "date"] if spec["date"] else ["num", "key"]))
    if kind == "num":
        col = draw(st.sampled_from(sorted(spec["nums"])))
        lo, hi = spec["nums"][col]
        lit = round(draw(st.floats(min_value=lo, max_value=hi, allow_nan=False)), 3)
        op = draw(st.sampled_from(_CMP))
        return (col, op, repr(lit)), f"{col} {op} {lit!r}"
    if kind == "key":
        col = draw(st.sampled_from(sorted(spec["keys"])))
        vals = spec["keys"][col] or ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
        lit = draw(st.sampled_from(vals))
        op = draw(st.sampled_from(["=", "<>"]))
        return (col, op, f"'{lit}'"), f"{col} {op} '{lit}'"
    col, dlo, dhi = spec["date"]
    # draw a cutoff day inside the domain
    year = draw(st.integers(int(dlo[:4]), int(dhi[:4])))
    month = draw(st.integers(1, 12))
    lit = f"{year:04d}-{month:02d}-01"
    op = draw(st.sampled_from(["<", ">="]))
    return (col, op, f"TIMESTAMP '{lit}'"), f"{col} {op} TIMESTAMP '{lit}'"


@st.composite
def plans(draw):
    table = draw(st.sampled_from(sorted(_TABLES)))
    spec = _TABLES[table]
    filters = draw(st.lists(_filter(table), min_size=0, max_size=2))
    shape = draw(
        st.sampled_from(
            [
                "project", "agg", "join_agg", "window", "setop",
                # composed shapes: the round-3 grammar stopped at
                # join+aggregate; these chain a second operator on top
                "join_window", "setop_agg", "setop_window",
                # round-5 productions: correlated subqueries (Catalyst
                # decorrelation — EXISTS and the scalar-COUNT "count bug")
                # and the as-of join vs DuckDB's native ASOF JOIN
                "exists_agg", "scalar_sub", "asof",
            ]
        )
    )
    setop = draw(st.sampled_from(["union_all", "union", "intersect", "except"]))
    filters2 = draw(st.lists(_filter(table), min_size=1, max_size=2))
    num = draw(st.sampled_from(sorted(spec["nums"])))
    key = draw(st.sampled_from(sorted(spec["keys"])))
    return {
        "table": table,
        "filters": filters,
        "shape": shape,
        "num": num,
        "key": key,
        "distinct": draw(st.booleans()),
        # join_agg extras: join type and an optional dim-side filter that
        # manufactures unmatched rows (NULL group keys under LEFT JOIN;
        # FULL adds unmatched customers, so aggregates also see NULL
        # measure inputs)
        "join_how": draw(st.sampled_from(["inner", "left", "full"])),
        "cust_bal_min": draw(
            st.one_of(st.none(), st.floats(min_value=-500, max_value=9_000, allow_nan=False))
        ),
        "setop": setop,
        "filters2": filters2,
        # round-5 extras: lineitem-domain inner filters for the correlated
        # subquery shapes, and EXISTS vs NOT EXISTS
        "li_filters": draw(st.lists(_filter("lineitem"), min_size=1, max_size=2)),
        "negate": draw(st.booleans()),
    }


# --- renderers --------------------------------------------------------------


def _where_sql(filters) -> str:
    if not filters:
        return ""
    return " WHERE " + " AND ".join(sql for _, sql in filters)


def _apply_filters(df, filters):
    for (col, op, lit), _sql in filters:
        if lit.startswith("TIMESTAMP "):
            c = F.lit(lit[len("TIMESTAMP '"):-1]).cast("timestamp")
        elif lit.startswith("'"):
            c = F.lit(lit.strip("'"))
        else:
            c = F.lit(float(lit))
        cond = {
            "<": F.col(col) < c, "<=": F.col(col) <= c,
            ">": F.col(col) > c, ">=": F.col(col) >= c,
            "=": F.col(col) == c, "<>": F.col(col) != c,
        }[op]
        df = df.filter(cond)
    return df


def _setop(spark, plan, cols):
    """The drawn set operation over two filtered variants of the same
    keyed projection, as (spark_df, duckdb_sql_text)."""
    t = plan["table"]
    l = _apply_filters(load(spark, SF_DIR, t), plan["filters"]).select(*cols)
    r = _apply_filters(load(spark, SF_DIR, t), plan["filters2"]).select(*cols)
    op = plan["setop"]
    sdf = {
        "union_all": l.unionAll(r),
        "union": l.union(r).distinct(),
        "intersect": l.intersect(r),
        "except": l.exceptAll(r),
    }[op]
    kw = {
        "union_all": "UNION ALL",
        "union": "UNION",
        "intersect": "INTERSECT",
        "except": "EXCEPT ALL",
    }[op]
    sel = f"SELECT {', '.join(cols)} FROM {t}"
    sql = (
        f"{sel}{_where_sql(plan['filters'])} {kw}"
        f" {sel}{_where_sql(plan['filters2'])}"
    )
    return sdf, sql


def _render(spark, plan):
    """Return (spark_df, duckdb_sql) for one drawn plan."""
    t, key, num = plan["table"], plan["key"], plan["num"]
    ids = _TABLES[t]["ids"]
    base = _apply_filters(load(spark, SF_DIR, t), plan["filters"])
    where = _where_sql(plan["filters"])

    if plan["shape"] == "project":
        cols = [*ids[:2], key, num]
        sdf = base.select(*cols, (F.col(num) * 2 + 1).alias("computed"))
        sql = (
            f"SELECT {', '.join(cols)}, {num} * 2 + 1 AS computed FROM {t}{where}"
        )
        if plan["distinct"]:
            sdf = sdf.distinct()
            sql = sql.replace("SELECT ", "SELECT DISTINCT ", 1)
        return sdf, sql

    if plan["shape"] == "window":
        # rank + lag over a total order (num, unique id) per key group
        from pyspark.sql import Window

        uid = ids[0]
        w = Window.partitionBy(key).orderBy(F.col(num), F.col(uid))
        # the running sum goes through the decimal pact: DuckDB evaluates
        # windowed aggregates with a segment tree (different float
        # association than Spark's sequential fold), so raw-double
        # cumulative sums drift past 1e-6 at sf0.01 group sizes — the
        # sf0.01 widened sweep caught exactly this
        run = (
            F.sum(F.col(num).cast("decimal(30,10)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
        )
        sdf = base.select(uid, key, num).select(
            uid, key, num,
            F.row_number().over(w).cast("long").alias("rn"),
            F.lag(num).over(w).alias("lg"),
            run.alias("run"),
        )
        sql = f"""
            SELECT {uid}, {key}, {num},
                   CAST(row_number() OVER win AS BIGINT) AS rn,
                   lag({num}) OVER win AS lg,
                   CAST(sum(CAST({num} AS DECIMAL(30,10)))
                        OVER (PARTITION BY {key} ORDER BY {num}, {uid}
                              ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run
            FROM {t}{where}
            WINDOW win AS (PARTITION BY {key} ORDER BY {num}, {uid})
        """
        return sdf, sql

    if plan["shape"] == "exists_agg" and t == "orders":
        # correlated EXISTS / NOT EXISTS feeding an aggregate — rendered
        # as SQL on BOTH engines so Spark runs Catalyst's subquery
        # decorrelation (RewritePredicateSubquery -> semi/anti join),
        # not a hand-built semi-join
        load(spark, SF_DIR, "orders").createOrReplaceTempView("__fz_orders")
        load(spark, SF_DIR, "lineitem").createOrReplaceTempView("__fz_lineitem")
        li_where = " AND ".join(sql for _, sql in plan["li_filters"])
        neg = "NOT " if plan["negate"] else ""

        def q(orders: str, lineitem: str) -> str:
            return f"""
                SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                       min(o_orderkey) AS mn, max(o_orderkey) AS mx
                FROM {orders} o
                WHERE {neg}EXISTS (SELECT 1 FROM {lineitem} l
                                   WHERE l.l_orderkey = o.o_orderkey
                                     AND {li_where})
                {' AND ' + ' AND '.join(s for _, s in plan['filters']) if plan['filters'] else ''}
                GROUP BY o_orderstatus
            """

        return spark.sql(q("__fz_orders", "__fz_lineitem")), q("orders", "lineitem")

    if plan["shape"] == "scalar_sub" and t == "orders":
        # correlated SCALAR subqueries: COUNT over an empty correlation
        # must decorrelate to 0, not NULL (the classic "count bug" in
        # subquery-to-join rewrites); MAX over empty stays NULL
        load(spark, SF_DIR, "orders").createOrReplaceTempView("__fz_orders")
        load(spark, SF_DIR, "lineitem").createOrReplaceTempView("__fz_lineitem")
        li_where = " AND ".join(sql for _, sql in plan["li_filters"])

        def q(orders: str, lineitem: str) -> str:
            return f"""
                SELECT o_orderkey, o_orderstatus,
                       (SELECT CAST(count(*) AS BIGINT) FROM {lineitem} l
                        WHERE l.l_orderkey = o.o_orderkey AND {li_where})
                         AS n_items,
                       (SELECT max(l.l_quantity) FROM {lineitem} l
                        WHERE l.l_orderkey = o.o_orderkey AND {li_where})
                         AS mx_q
                FROM {orders} o{_where_sql(plan['filters'])}
            """

        return spark.sql(q("__fz_orders", "__fz_lineitem")), q("orders", "lineitem")

    if plan["shape"] == "asof" and t == "orders":
        # as-of self-join per customer: each order picks the same
        # customer's max-price order at-or-before its date. The right
        # side pre-aggregates to one row per (custkey, orderdate), so
        # both engines' tie rules are moot and the match is unique —
        # our asof_join's documented determinism contract. DuckDB runs
        # its NATIVE ASOF JOIN; any drift in inclusivity, unmatched-row
        # handling, or per-key isolation surfaces as a diff.
        from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.joins import asof_join

        lft = base.select("o_orderkey", "o_custkey", "o_orderdate")
        rgt = (
            _apply_filters(load(spark, SF_DIR, "orders"), plan["filters2"])
            .groupBy("o_custkey", "o_orderdate")
            .agg(F.max("o_totalprice").alias("p"))
        )
        sdf = asof_join(
            lft, rgt, on="o_custkey",
            left_time="o_orderdate", right_time="o_orderdate",
        )
        sql = f"""
            SELECT l.o_orderkey, l.o_custkey, l.o_orderdate,
                   r.o_orderdate AS o_orderdate_right, r.p
            FROM (SELECT o_orderkey, o_custkey, o_orderdate
                  FROM orders{where}) l
            ASOF LEFT JOIN
            (SELECT o_custkey, o_orderdate, max(o_totalprice) AS p
             FROM orders{_where_sql(plan['filters2'])}
             GROUP BY 1, 2) r
            ON l.o_custkey = r.o_custkey AND r.o_orderdate <= l.o_orderdate
        """
        return sdf, sql

    if plan["shape"] == "setop":
        return _setop(spark, plan, [ids[0], key])

    if plan["shape"] == "setop_agg":
        # set-op feeding an aggregate: NULL-able group keys and duplicate
        # rows (UNION ALL / EXCEPT ALL multiplicities) hit count/distinct
        uid = ids[0]
        inner_df, inner_sql = _setop(spark, plan, [uid, key])
        sdf = inner_df.groupBy(key).agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(uid).alias("nd"),
            F.min(uid).alias("mn"),
            F.max(uid).alias("mx"),
        )
        sql = f"""
            SELECT {key}, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT {uid}) AS BIGINT) AS nd,
                   min({uid}) AS mn, max({uid}) AS mx
            FROM ({inner_sql}) GROUP BY {key}
        """
        return sdf, sql

    if plan["shape"] == "setop_window":
        # set-op feeding a window. Deterministic even under UNION ALL /
        # EXCEPT ALL duplicates: ordering is by uid, so rows tied in the
        # order are bit-identical and any rank permutation among them
        # yields the same output multiset; the running sum is exact
        # BIGINT (no float association drift).
        from pyspark.sql import Window

        uid = ids[0]
        inner_df, inner_sql = _setop(spark, plan, [uid, key])
        w = Window.partitionBy(key).orderBy(uid)
        sdf = inner_df.select(
            uid, key,
            F.row_number().over(w).cast("long").alias("rn"),
            F.lag(uid).over(w).alias("lg"),
            F.sum(uid)
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("run"),
        )
        sql = f"""
            SELECT {uid}, {key},
                   CAST(row_number() OVER win AS BIGINT) AS rn,
                   lag({uid}) OVER win AS lg,
                   CAST(sum({uid}) OVER (PARTITION BY {key} ORDER BY {uid}
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
            FROM ({inner_sql})
            WINDOW win AS (PARTITION BY {key} ORDER BY {uid})
        """
        return sdf, sql

    if plan["shape"] == "join_window" and t == "orders":
        # outer join feeding a window: NULL partition keys (unmatched
        # orders under LEFT) must group into one window partition on both
        # engines. Ordering keys come from the preserved (orders) side,
        # so they are never NULL and ranks stay deterministic; FULL draws
        # degrade to LEFT (NULL ordering keys would tie unmatched
        # customers arbitrarily).
        from pyspark.sql import Window

        how = "inner" if plan["join_how"] == "inner" else "left"
        bal = plan["cust_bal_min"]
        cust = load(spark, SF_DIR, "customer")
        cust_where = ""
        if bal is not None:
            bal = round(bal, 2)
            cust = cust.filter(F.col("c_acctbal") >= bal)
            cust_where = f" WHERE c_acctbal >= {bal!r}"
        joined = base.join(cust, base["o_custkey"] == cust["c_custkey"], how)
        w = Window.partitionBy("c_mktsegment").orderBy(
            F.col(num), F.col("o_orderkey")
        )
        run = (
            F.sum(F.col(num).cast("decimal(30,10)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
        )
        sdf = joined.select(
            "o_orderkey", "c_mktsegment", num,
            F.row_number().over(w).cast("long").alias("rn"),
            F.lag(num).over(w).alias("lg"),
            run.alias("run"),
        )
        sql = f"""
            SELECT o_orderkey, c_mktsegment, {num},
                   CAST(row_number() OVER win AS BIGINT) AS rn,
                   lag({num}) OVER win AS lg,
                   CAST(sum(CAST({num} AS DECIMAL(30,10)))
                        OVER (PARTITION BY c_mktsegment
                              ORDER BY {num}, o_orderkey
                              ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run
            FROM (SELECT * FROM orders{where}) o
            {'LEFT ' if how == 'left' else ''}JOIN
            (SELECT * FROM customer{cust_where}) c ON o.o_custkey = c.c_custkey
            WINDOW win AS (PARTITION BY c_mktsegment
                           ORDER BY {num}, o_orderkey)
        """
        return sdf, sql

    if plan["shape"] == "agg" or t != "orders":
        # join shapes need orders as the fact side; other tables fall back
        sdf = base.groupBy(key).agg(
            F.count(F.lit(1)).alias("n"),
            dsum(num).alias("s"),
            F.min(num).alias("mn"),
            F.max(num).alias("mx"),
            davg(num).alias("av"),
        )
        sql = f"""
            SELECT {key}, CAST(count(*) AS BIGINT) AS n, {DSUM(num)} AS s,
                   min({num}) AS mn, max({num}) AS mx, {DAVG(num)} AS av
            FROM {t}{where} GROUP BY {key}
        """
        return sdf, sql

    # join_agg: orders ⋈ customer, aggregate by market segment. A LEFT
    # join with a dim-side balance filter manufactures unmatched orders,
    # so NULL group keys and null-skipping aggregates get fuzzed too.
    how = plan["join_how"]
    bal = plan["cust_bal_min"]
    cust = load(spark, SF_DIR, "customer")
    cust_where = ""
    if bal is not None:
        bal = round(bal, 2)
        cust = cust.filter(F.col("c_acctbal") >= bal)
        cust_where = f" WHERE c_acctbal >= {bal!r}"
    sdf = (
        base.join(cust, base["o_custkey"] == cust["c_custkey"], how)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), dsum(num).alias("s"))
    )
    jkw = {"inner": "", "left": "LEFT ", "full": "FULL "}[how]
    sql = f"""
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, {DSUM(num)} AS s
        FROM (SELECT * FROM orders{where}) o
        {jkw}JOIN
        (SELECT * FROM customer{cust_where}) c ON o.o_custkey = c.c_custkey
        GROUP BY c_mktsegment
    """
    return sdf, sql


@given(plan=plans())
@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_random_plan_matches_duckdb(spark, ddb, plan):
    sdf, sql = _render(spark, plan)
    got = _canon(sdf.toPandas())
    want = _canon(ddb.execute(sql).df())
    assert list(got.columns) == list(want.columns), plan
    assert len(got) == len(want), plan
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-6, rtol=0,
        obj=str(plan),
    )


# One pinned example per composed shape (plus the FULL-join aggregate), so
# every new grammar production is exercised even if hypothesis's
# derandomized draws happen to skip one.
_PINNED = [
    {
        "table": "orders", "shape": "join_window",
        "filters": [], "filters2": [(("o_totalprice", ">", "1000.0"), "o_totalprice > 1000.0")],
        "num": "o_totalprice", "key": "o_orderstatus", "distinct": False,
        "join_how": "left", "cust_bal_min": 4_000.0,
        "setop": "union_all",
    },
    {
        "table": "orders", "shape": "join_agg",
        "filters": [(("o_orderstatus", "=", "'F'"), "o_orderstatus = 'F'")],
        "filters2": [(("o_totalprice", ">", "1000.0"), "o_totalprice > 1000.0")],
        "num": "o_totalprice", "key": "o_orderstatus", "distinct": False,
        "join_how": "full", "cust_bal_min": 2_500.0,
        "setop": "union_all",
    },
    {
        "table": "lineitem", "shape": "setop_agg",
        "filters": [(("l_quantity", "<", "25.0"), "l_quantity < 25.0")],
        "filters2": [(("l_quantity", ">=", "10.0"), "l_quantity >= 10.0")],
        "num": "l_quantity", "key": "l_returnflag", "distinct": False,
        "join_how": "inner", "cust_bal_min": None,
        "setop": "except",
    },
    {
        "table": "customer", "shape": "setop_window",
        "filters": [],
        "filters2": [(("c_acctbal", ">", "0.0"), "c_acctbal > 0.0")],
        "num": "c_acctbal", "key": "c_mktsegment", "distinct": False,
        "join_how": "inner", "cust_bal_min": None,
        "setop": "union_all",
    },
    {
        "table": "orders", "shape": "exists_agg",
        "filters": [(("o_orderstatus", "<>", "'P'"), "o_orderstatus <> 'P'")],
        "filters2": [],
        "num": "o_totalprice", "key": "o_orderstatus", "distinct": False,
        "join_how": "inner", "cust_bal_min": None, "setop": "union_all",
        "li_filters": [(("l_quantity", ">", "45.0"), "l_quantity > 45.0")],
        "negate": True,  # NOT EXISTS -> anti-join decorrelation
    },
    {
        "table": "orders", "shape": "scalar_sub",
        "filters": [(("o_totalprice", ">", "100000.0"), "o_totalprice > 100000.0")],
        "filters2": [],
        "num": "o_totalprice", "key": "o_orderstatus", "distinct": False,
        "join_how": "inner", "cust_bal_min": None, "setop": "union_all",
        # selective inner filter -> many empty correlations (the count bug)
        "li_filters": [(("l_discount", "<=", "0.01"), "l_discount <= 0.01")],
        "negate": False,
    },
    {
        "table": "orders", "shape": "asof",
        "filters": [],
        "filters2": [(("o_totalprice", ">", "200000.0"), "o_totalprice > 200000.0")],
        "num": "o_totalprice", "key": "o_orderstatus", "distinct": False,
        "join_how": "inner", "cust_bal_min": None, "setop": "union_all",
        "li_filters": [(("l_quantity", ">", "45.0"), "l_quantity > 45.0")],
        "negate": False,
    },
]


@pytest.mark.parametrize(
    "plan", _PINNED, ids=[p["shape"] for p in _PINNED]
)
def test_pinned_composed_shapes(spark, ddb, plan):
    sdf, sql = _render(spark, plan)
    got = _canon(sdf.toPandas())
    want = _canon(ddb.execute(sql).df())
    assert list(got.columns) == list(want.columns), plan
    assert len(got) == len(want), plan
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-6, rtol=0,
        obj=str(plan),
    )
