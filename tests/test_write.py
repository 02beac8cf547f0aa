"""write_sized_parquet: file counts track the size target, content survives."""

from __future__ import annotations

import glob

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.write import (
    estimated_bytes,
    write_sized_parquet,
)
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def _parquet_files(path: str) -> list[str]:
    return glob.glob(f"{path}/**/*.parquet", recursive=True)


def test_small_target_splits_large_target_coalesces(spark, sf_dir, tmp_path):
    df = load(spark, sf_dir, "events")
    est = estimated_bytes(df)
    assert est > 0

    many = str(tmp_path / "many")
    n_many = write_sized_parquet(df, many, target_file_bytes=max(1, est // 8))
    assert n_many >= 8
    assert len(_parquet_files(many)) == n_many

    one = str(tmp_path / "one")
    n_one = write_sized_parquet(df, one, target_file_bytes=est * 10)
    assert n_one == 1
    assert len(_parquet_files(one)) == 1

    # content identical either way
    a = spark.read.parquet(many)
    b = spark.read.parquet(one)
    assert a.count() == b.count() == df.count()
    assert a.exceptAll(b).count() == 0


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    df = load(spark, sf_dir, "events").withColumnRenamed("event_type", "et")
    out = str(tmp_path / "by_type")
    write_sized_parquet(df, out, partition_by=["et"])
    # directory-partitioned: one subdir per type, and a reader filter
    # touches only that subdir (partition pruning)
    pruned = spark.read.parquet(out).filter("et = 'click'")
    types = {r.et for r in pruned.select("et").distinct().collect()}
    assert types <= {"click"}
