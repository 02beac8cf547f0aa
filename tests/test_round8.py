"""Round-8 operator semantics on planted inputs: KS extremes, MI/V on
independent vs. determined grids, alternating-runs counting, zero
permutation entropy on a monotone series, Q13 zero-order bucketing, and
the solo-late-supplier window logic (oracle hash-matches are in
tests/test_oracle.py).
"""

from __future__ import annotations

import datetime
import math

import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import queries

_QS = queries()

_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{table}.parquet")
    )


def _orders(prices_by_prio):
    day = datetime.datetime(2024, 1, 1)
    rows = []
    k = 0
    for prio, prices in prices_by_prio.items():
        for p in prices:
            k += 1
            rows.append((k, 1, "O", float(p), day, prio))
    return rows


def test_ks_zero_on_identical_distributions(spark, tmp_path):
    prices = [10.0, 20.0, 30.0, 40.0]
    _write(spark, tmp_path, "orders",
           _orders({"1-URGENT": prices, "5-LOW": prices}), _ORDERS_SCHEMA)
    r = _QS["q272_ks_two_sample"](spark, str(tmp_path)).collect()[0]
    assert r["ks_d"] == 0.0


def test_ks_one_on_disjoint_distributions(spark, tmp_path):
    _write(spark, tmp_path, "orders",
           _orders({"1-URGENT": [1.0, 2.0, 3.0],
                    "5-LOW": [100.0, 200.0, 300.0]}), _ORDERS_SCHEMA)
    r = _QS["q272_ks_two_sample"](spark, str(tmp_path)).collect()[0]
    assert r["ks_d"] == 1.0


def _docs(cells):
    """cells: list of (source, lang, count) -> en-marker docs."""
    rows = []
    i = 0
    for source, lang, n in cells:
        for _ in range(n):
            i += 1
            rows.append((i, "word " * 10, lang, source, 50))
    return rows


def test_mi_zero_when_independent(spark, tmp_path):
    # Identical lang mix in both sources -> knowing source tells nothing.
    _write(spark, tmp_path, "documents",
           _docs([("a", "en", 6), ("a", "de", 2),
                  ("b", "en", 3), ("b", "de", 1)]), _DOCS_SCHEMA)
    r = _QS["q273_mutual_information"](spark, str(tmp_path)).collect()[0]
    assert r["mi_nats"] == pytest.approx(0.0, abs=1e-12)


def test_mi_full_dependence_is_entropy(spark, tmp_path):
    # source determines lang, uniform 2-way split -> MI = ln 2.
    _write(spark, tmp_path, "documents",
           _docs([("a", "en", 5), ("b", "de", 5)]), _DOCS_SCHEMA)
    r = _QS["q273_mutual_information"](spark, str(tmp_path)).collect()[0]
    assert r["mi_nats"] == pytest.approx(math.log(2), rel=1e-12)


def test_cramers_v_extremes(spark, tmp_path):
    _write(spark, tmp_path, "documents",
           _docs([("a", "en", 5), ("b", "de", 5)]), _DOCS_SCHEMA)
    r = _QS["q274_cramers_v"](spark, str(tmp_path)).collect()[0]
    assert r["cramers_v"] == pytest.approx(1.0)
    assert r["dof"] == 1
    _write(spark, tmp_path, "documents",
           _docs([("a", "en", 6), ("a", "de", 2),
                  ("b", "en", 3), ("b", "de", 1)]), _DOCS_SCHEMA)
    r = _QS["q274_cramers_v"](spark, str(tmp_path)).collect()[0]
    assert r["cramers_v"] == pytest.approx(0.0, abs=1e-9)


def test_runs_test_counts_alternations(spark, tmp_path):
    # Daily counts 1,3,1,3,... -> every day flips direction: runs == days-1.
    day0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(10):
        for _ in range(3 if d % 2 else 1):
            eid += 1
            rows.append((eid, 1, "O", 10.0,
                         day0 + datetime.timedelta(days=d), "1-URGENT"))
    _write(spark, tmp_path, "orders", rows, _ORDERS_SCHEMA)
    r = _QS["q275_runs_test"](spark, str(tmp_path)).collect()[0]
    assert r["n_runs"] == 9  # 9 sign flips, each its own run
    assert r["n_up"] + r["n_down"] == 9
    assert r["z"] > 0  # more runs than randomness expects


def test_permutation_entropy_zero_on_monotone_series(spark, tmp_path):
    # Strictly increasing daily counts -> only the all-ascending pattern.
    day0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(8):
        for _ in range(d + 1):
            eid += 1
            rows.append((eid, day0 + datetime.timedelta(days=d), 1,
                         "view", 0.0, "{}"))
    _write(spark, tmp_path, "events", rows, _EVENTS_SCHEMA)
    r = _QS["q276_permutation_entropy"](spark, str(tmp_path)).collect()[0]
    assert r["n_patterns"] == 1
    assert r["perm_entropy"] == pytest.approx(0.0, abs=1e-12)
    assert r["n_windows"] == 6


def test_custdist_keeps_zero_order_customers(spark, tmp_path):
    _write(spark, tmp_path, "customer",
           [(1, "a", 0, 0.0, "S"), (2, "b", 0, 0.0, "S"),
            (3, "c", 0, 0.0, "S")],
           "c_custkey long, c_name string, c_nationkey int, "
           "c_acctbal double, c_mktsegment string")
    _write(spark, tmp_path, "orders",
           _orders({"1-URGENT": [10.0, 20.0]}), _ORDERS_SCHEMA)
    out = {r["c_count"]: r["custdist"]
           for r in _QS["q268_tpch_q13_custdist"](spark, str(tmp_path)).collect()}
    assert out[0] == 2  # customers 2,3 never ordered
    assert out[2] == 1  # customer 1 placed both orders


def test_solo_late_supplier_logic(spark, tmp_path):
    # Order 1: suppliers 10 (late) and 20 (on time) -> 10 counted.
    # Order 2: suppliers 10 and 20 both late -> nobody counted.
    # Order 3: supplier 10 late but sole supplier -> not counted.
    d0 = datetime.datetime(2024, 1, 1)
    late = d0 + datetime.timedelta(days=120)
    ontime = d0 + datetime.timedelta(days=10)
    li = [
        (1, 1, 10, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
        (1, 2, 20, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", ontime),
        (2, 1, 10, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
        (2, 2, 20, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
        (3, 1, 10, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
    ]
    _write(spark, tmp_path, "lineitem", li, _LI_SCHEMA)
    _write(spark, tmp_path, "orders",
           [(1, 1, "O", 10.0, d0, "1-URGENT"),
            (2, 1, "O", 10.0, d0, "1-URGENT"),
            (3, 1, "O", 10.0, d0, "1-URGENT")], _ORDERS_SCHEMA)
    _write(spark, tmp_path, "supplier",
           [(10, "S10", 0, 0.0), (20, "S20", 0, 0.0)],
           "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
    out = {r["s_name"]: r["numwait"]
           for r in _QS["q271_solo_late_suppliers"](spark, str(tmp_path)).collect()}
    assert out == {"S10": 1}


def test_mixed_lang_screen_flags_half_and_half(spark, tmp_path):
    en = "the and is of to in that it was for "  # strong EN markers
    de = "der die und in den von zu das mit sich "  # strong DE markers
    docs = [(1, en * 3 + de * 3, "en", "web", 200),
            (2, en * 6, "en", "web", 200)]
    _write(spark, tmp_path, "documents", docs, _DOCS_SCHEMA)
    out = {(r["lang_head"], r["lang_tail"]): r["n_docs"]
           for r in _QS["q277_mixed_lang_screen"](spark, str(tmp_path)).collect()}
    assert out[("en", "de")] == 1
    assert out[("en", "en")] == 1
