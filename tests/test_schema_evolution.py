"""evolve_union: drifted snapshots reconcile by NULL-fill + numeric
widening, nested structs evolve recursively, and incompatible drift fails
loudly instead of silently casting."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.schema import evolve_union


def test_added_dropped_and_widened_columns(spark):
    old = spark.createDataFrame(
        [(1, 10, "a")], "id int, amount int, status string"
    )
    new = spark.createDataFrame(
        [(2, 20.5, 99)], "id long, amount double, score int"
    )
    out = evolve_union(old, new)
    assert [f.name for f in out.schema.fields] == ["id", "amount", "status", "score"]
    types = {f.name: f.dataType for f in out.schema.fields}
    assert types["id"] == T.LongType()      # int widened to long
    assert types["amount"] == T.DoubleType()  # int widened to double
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["score"] is None and rows[1]["status"] == "a"
    assert rows[2]["status"] is None and rows[2]["amount"] == 20.5


def test_nested_struct_evolves_recursively(spark):
    old = spark.createDataFrame(
        [(1, (10, "x"))], "id int, meta struct<n:int,tag:string>"
    )
    new = spark.createDataFrame(
        [(2, (7_000_000_000, True))], "id int, meta struct<n:long,flag:boolean>"
    )
    out = evolve_union(old, new)
    meta = {f.name: f for f in out.schema["meta"].dataType.fields}
    assert meta["n"].dataType == T.LongType()
    assert set(meta) == {"n", "tag", "flag"}
    rows = {r["id"]: r["meta"] for r in out.collect()}
    assert rows[1]["n"] == 10 and rows[1]["flag"] is None
    assert rows[2]["n"] == 7_000_000_000 and rows[2]["tag"] is None


def test_decimal_widening_keeps_integral_digits(spark):
    from decimal import Decimal

    old = spark.createDataFrame([(Decimal("1.25"),)], "v decimal(10,2)")
    new = spark.createDataFrame([(Decimal("2.1234"),)], "v decimal(12,4)")
    out = evolve_union(old, new)
    assert out.schema["v"].dataType == T.DecimalType(12, 4)


def test_incompatible_drift_raises(spark):
    old = spark.createDataFrame([("x",)], "v string")
    new = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(TypeError, match="cannot reconcile"):
        evolve_union(old, new)


def test_union_is_plan_only_no_shuffle(spark, sf_dir):
    a = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    b = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    plan = (
        evolve_union(a, b)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
