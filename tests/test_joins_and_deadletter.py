"""Salted-join equivalence, dead-letter quarantine, and multi-format scan
coverage (SURVEY §2.3 source row: parquet/JSON/CSV)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.joins import salted_join
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def _canon(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain_join(spark, sf_dir, how):
    """Salting redistributes the shuffle but must not change results —
    including left rows with no match (left join) and skewed keys."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    # make the key space skewed: collapse half the keys onto one hot key
    o_skew = o.withColumn(
        "o_custkey", F.when(F.col("o_orderkey") % 2 == 0, F.lit(1)).otherwise(F.col("o_custkey"))
    )
    plain = o_skew.join(c, "o_custkey", how)
    salted = salted_join(o_skew, c, "o_custkey", how=how, n_salts=8)
    assert _canon(salted) == _canon(plain)


def test_salted_join_rejects_outer(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(o, o, "o_orderkey", how="full")


def test_dead_letter_quarantine(spark, tmp_path):
    """Invalid records (R7 failures) land in the quarantine table; valid
    records land in the target; counts partition the input."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.config import PipelineConfig
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.otx_fixture import raw_pulses_df
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.pipeline import run_batch

    # poison two records: NULL raw fails validation
    good = raw_pulses_df(spark).select(F.struct("*").alias("raw"))
    bad = good.limit(2).select(F.lit(None).cast(good.schema["raw"].dataType).alias("raw"))
    cfg = PipelineConfig(api_key="k", base_url="http://x", connector_name="t", city="")
    target = str(tmp_path / "t")
    quarantine = str(tmp_path / "q")
    metrics = run_batch(
        spark,
        good.unionByName(bad),
        cfg,
        target,
        run_ts=dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc),
        quarantine_path=quarantine,
    )
    assert metrics["records_skipped_invalid"] == 2
    assert spark.read.parquet(quarantine).count() == 2
    assert metrics["records_upserted"] == 8  # valid input rows
    # table rows < upserted rows: the fixture's duplicate pi-001 collapses
    # to one row (5 distinct keys + 2 NULL-key inserts)
    assert spark.read.parquet(target).count() == 7


def test_json_and_csv_scans_match_parquet(spark, sf_dir, tmp_path):
    """The engine reads the same relation identically from parquet, JSON
    lines, and CSV (SURVEY §2.3 source row) — schema applied on read, no
    inference drift."""
    nation = load(spark, sf_dir, "nation")
    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    nation.write.mode("overwrite").json(jdir)
    nation.write.mode("overwrite").option("header", True).csv(cdir)

    schema = nation.schema
    from_json = spark.read.schema(schema).json(jdir)
    from_csv = spark.read.schema(schema).option("header", True).csv(cdir)
    assert _canon(from_json) == _canon(nation)
    assert _canon(from_csv) == _canon(nation)


def test_orc_scan_matches_parquet(spark, sf_dir, tmp_path):
    """ORC (the other built-in columnar format) roundtrips the same
    relation with predicate pushdown intact."""
    nation = load(spark, sf_dir, "nation")
    odir = str(tmp_path / "o")
    nation.write.mode("overwrite").orc(odir)
    from_orc = spark.read.schema(nation.schema).orc(odir)
    assert _canon(from_orc) == _canon(nation)
    plan = (
        from_orc.filter("n_nationkey = 3")
        .select("n_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "n_nationkey" in plan


def test_bucketed_join_elides_shuffle(spark, sf_dir):
    """Two tables bucketed by the join key into the same bucket count join
    WITHOUT a shuffle: the physical plan has no Exchange under the join,
    while the plain parquet join shuffles both sides."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    write_bucketed(o.withColumnRenamed("o_custkey", "custkey"), "t_orders_b", "custkey", 8, sort_by=["custkey"])
    write_bucketed(c.withColumnRenamed("c_custkey", "custkey"), "t_customer_b", "custkey", 8, sort_by=["custkey"])

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_orders_b", "t_customer_b", "custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all

        plain = o.withColumnRenamed("o_custkey", "custkey").join(
            c.withColumnRenamed("c_custkey", "custkey"), "custkey"
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan  # the baseline does shuffle

        # and results are identical to the plain join
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")
