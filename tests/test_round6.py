"""Round-6 operator semantics: Kruskal-Wallis hand case, Theil-Sen
robustness to planted outliers, LM-score fluency ordering, temperature-mix
allocation invariants (oracle hash-matches are in tests/test_oracle.py).
"""

from __future__ import annotations

import datetime

import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import queries
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round6 import MIX_TOKEN_BUDGET

_QS = queries()

_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_kruskal_wallis_hand_case(spark, tmp_path):
    # Two groups {1,2,3} and {4,5,6}: H = 12/(6*7)*(36/3 + 225/3) - 21
    # = 27/7 = 3.857142... (equals the Mann-Whitney z^2 for 2 groups).
    rows = [
        (i + 1, 1, "O", float(v), datetime.datetime(2000, 1, 1), pri)
        for i, (v, pri) in enumerate(
            [(1, "1-URGENT"), (2, "1-URGENT"), (3, "1-URGENT"),
             (4, "5-LOW"), (5, "5-LOW"), (6, "5-LOW")]
        )
    ]
    spark.createDataFrame(rows, _ORDERS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    r = _QS["q246_kruskal_wallis"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["k"]) == (6, 2)
    assert r["h_stat"] == pytest.approx(27 / 7, rel=1e-6)
    assert r["h_corrected"] == pytest.approx(27 / 7, rel=1e-6)  # no ties


def test_theil_sen_ignores_outlier_week(spark, tmp_path):
    # Nation 0: weekly revenue grows exactly 700 cents/day (49.0/week),
    # except ONE wild outlier week. OLS would be dragged; the pairwise-
    # slope median must stay exactly 7.00 $/day = 700 cents/day.
    nat = [(0, "NATION_0", 0)]
    cust = [(1, "c", 0, 0.0, "BUILDING")]
    orders = []
    for w in range(10):
        amt = 100.0 + 49.0 * w
        if w == 5:
            amt = 100000.0  # outlier week
        orders.append(
            (w + 1, 1, "O", amt,
             datetime.datetime(1995, 1, 2) + datetime.timedelta(weeks=w),
             "1-URGENT")
        )
    spark.createDataFrame(nat, "n_nationkey int, n_name string, n_regionkey int").write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(cust, "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string").write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(orders, _ORDERS_SCHEMA).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = _QS["q247_theil_sen_slope"](spark, str(tmp_path)).collect()[0]
    assert r["n_pairs"] == 45
    assert r["sen_slope_cents_per_day"] == pytest.approx(700.0, rel=1e-9)


def test_lm_score_ranks_fluent_above_gibberish(spark, tmp_path):
    # 20 copies of a fluent sentence make its bigrams high-probability;
    # one gibberish doc of unique bigrams must score strictly lower.
    fluent = "the quick brown fox jumps over the lazy dog"
    docs = [(i, fluent, "en", "web", len(fluent)) for i in range(20)]
    docs.append((99, "zq xv qj wk vb nm pl dt", "en", "web", 23))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r["avg_logprob"]
        for r in _QS["q248_lm_quality_score"](spark, str(tmp_path)).collect()
    }
    assert out[0] > out[99]
    assert all(v < 0 for v in out.values())  # log-probs are negative


def test_temperature_mix_invariants(spark, sf_dir):
    rows = _QS["q249_temperature_mix"](spark, sf_dir).collect()
    assert rows
    assert sum(r["token_quota"] for r in rows) == MIX_TOKEN_BUDGET
    # temperature < 1 compresses: the largest source's quota share must
    # not exceed its document share, the smallest's must not fall below.
    tot_docs = sum(r["n_docs"] for r in rows)
    big = max(rows, key=lambda r: r["n_docs"])
    small = min(rows, key=lambda r: r["n_docs"])
    if big["n_docs"] != small["n_docs"]:
        assert big["token_quota"] / MIX_TOKEN_BUDGET <= big["n_docs"] / tot_docs + 1e-9
        assert small["token_quota"] / MIX_TOKEN_BUDGET >= small["n_docs"] / tot_docs - 1e-9
    # monotone: more docs never means a smaller quota
    by_docs = sorted(rows, key=lambda r: (r["n_docs"], r["source"]))
    for a, b in zip(by_docs, by_docs[1:]):
        if b["n_docs"] > a["n_docs"]:
            assert b["token_quota"] >= a["token_quota"]


def test_market_share_bounds(spark, sf_dir):
    rows = _QS["q250_market_share"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["mkt_share"] <= 1.0
        assert r["total_volume"] > 0


def test_idle_rich_excludes_buyers(spark, sf_dir):
    import pyspark.sql.functions as F

    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    out = _QS["q251_idle_rich_customers"](spark, sf_dir)
    n_out = sum(r["n_customers"] for r in out.collect())
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey").distinct()
    pos = c.filter(F.col("c_acctbal") > 0)
    avg_bal = pos.agg(F.sum("c_acctbal") / F.count(F.lit(1))).collect()[0][0]
    manual = (
        c.filter(F.col("c_acctbal") > avg_bal)
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .count()
    )
    assert n_out == manual


def test_acf_bounds_and_ljung_box_monotone(spark, sf_dir):
    rows = sorted(
        _QS["q252_acf_ljung_box"](spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == list(range(1, 11))
    for r in rows:
        assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9
    qs = [r["ljung_box_q"] for r in rows]
    assert all(b >= a - 1e-12 for a, b in zip(qs, qs[1:]))  # cumulative


def test_events_since_purchase_hand_case(spark, tmp_path):
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0), 1, "view", 0.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 1), 1, "purchase", 0.0, "{}"),
        (3, datetime.datetime(2024, 1, 1, 2), 1, "view", 0.0, "{}"),
        (4, datetime.datetime(2024, 1, 1, 3), 1, "click", 0.0, "{}"),
        (5, datetime.datetime(2024, 1, 1, 4), 1, "purchase", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["event_id"]: r["events_since_purchase"]
        for r in _QS["q253_events_since_purchase"](
            spark, str(tmp_path)
        ).collect()
    }
    # before first purchase -> NULL; purchase row counts since PREVIOUS one
    assert out == {1: None, 2: None, 3: 0, 4: 1, 5: 2}


def test_modularity_total_in_valid_range(spark, sf_dir):
    rows = _QS["q254_brand_modularity"](spark, sf_dir).collect()
    assert rows
    q = sum(r["modularity_term"] for r in rows)
    assert -0.5 - 1e-9 <= q <= 1.0 + 1e-9  # Newman modularity bounds


def test_attribution_credit_is_conserved(spark, sf_dir):
    import pyspark.sql.functions as F

    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    rows = _QS["q258_position_attribution"](spark, sf_dir).collect()
    assert rows
    total_micro = sum(r["credit_micro_total"] for r in rows)
    # every attributed purchase contributes exactly 1,000,000 micro-units
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"), F.col("ts").alias("tts")
    )
    n_attributed = (
        p.join(
            t,
            (F.col("p_user") == F.col("t_user"))
            & (F.col("tts") < F.col("pts"))
            & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
            "left_semi",
        ).count()
    )
    assert total_micro == n_attributed * 1_000_000


def test_heaps_beta_plausible(spark, sf_dir):
    r = _QS["q259_heaps_law"](spark, sf_dir).collect()[0]
    assert 0.0 < r["heaps_beta"] < 1.0  # sublinear vocabulary growth


def test_two_hop_excludes_direct_neighbors(spark, tmp_path):
    # path graph via orders: parts {1,2} {2,3} {3,4} co-purchased.
    # From 1: neighbors={2}, two-hop-only={3}. From 2: nb={1,3}, 2hop={4}.
    import datetime

    ts = datetime.datetime(2000, 1, 1)
    rows = []
    for ok, (pa, pb) in enumerate([(1, 2), (2, 3), (3, 4)], start=1):
        for ln, pk in enumerate([pa, pb], start=1):
            rows.append((ok, pk, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", ts))
    schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {
        r["part"]: (r["degree"], r["two_hop_only"])
        for r in _QS["q260_two_hop_reach"](spark, str(tmp_path)).collect()
    }
    assert out == {1: (1, 1), 2: (2, 1), 3: (2, 1), 4: (1, 1)}
