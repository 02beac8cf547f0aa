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


def test_compact_parquet_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.write import compact_parquet

    src = load(spark, sf_dir, "orders")
    path = str(tmp_path / "frag")
    src.repartition(40).write.parquet(path)  # fragment: 40 small files

    before = src.orderBy("o_orderkey").collect()
    stats = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert stats["compacted"] and stats["files_before"] == 40
    assert stats["files_after"] == 1  # everything fits one target-sized file

    after_df = spark.read.parquet(path)
    assert after_df.orderBy("o_orderkey").collect() == before
    # temp/old dirs cleaned up
    leftovers = [p.name for p in tmp_path.iterdir()]
    assert leftovers == ["frag"]


def test_compact_parquet_noop_when_already_compact(spark, sf_dir, tmp_path):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.write import compact_parquet

    path = str(tmp_path / "ok")
    load(spark, sf_dir, "nation").coalesce(1).write.parquet(path)
    stats = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert not stats["compacted"]
    assert stats["files_before"] == stats["files_after"] == 1
    # idempotent maintenance: second run still a no-op after a real compact
    frag = str(tmp_path / "frag2")
    load(spark, sf_dir, "nation").repartition(8).write.parquet(frag)
    assert compact_parquet(spark, frag, target_file_bytes=1 << 30)["compacted"]
    assert not compact_parquet(spark, frag, target_file_bytes=1 << 30)["compacted"]
