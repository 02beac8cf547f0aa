"""operators/matview: materialized count/sum views over versioned tables —
each refresh applies only the CDC delta between base versions, and the
result equals a full rebuild of the current snapshot bit-for-bit.

Reference recomputes per run, no aggregate surface
(/root/reference/etl_connector.py:53-242).
"""

from __future__ import annotations

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.ivm import group_agg_view
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.matview import (
    materialized_version,
    read_materialized_view,
    refresh_materialized_view,
)
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.versioned import (
    read_versioned,
    versioned_upsert,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, g string, v long, ts long")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _refresh(spark, root, vroot):
    return refresh_materialized_view(
        spark, root, vroot, keys=["k"], group_cols=["g"], sum_cols=["v"]
    )


def test_incremental_refresh_equals_rebuild(spark, tmp_path):
    root, vroot = str(tmp_path / "base"), str(tmp_path / "view")
    versioned_upsert(spark, _df(spark, [("a", "x", 1, 1), ("b", "y", 2, 1)]), root, "k", ["ts"])
    assert _refresh(spark, root, vroot) == 1  # full build
    # update migrating a's group, insert c, b stays
    versioned_upsert(spark, _df(spark, [("a", "z", 5, 2), ("c", "x", 7, 2)]), root, "k", ["ts"])
    assert _refresh(spark, root, vroot) == 2  # incremental
    want = group_agg_view(read_versioned(spark, root), ["g"], ["v"])
    assert _rows(read_materialized_view(spark, vroot)) == _rows(want)


def test_refresh_spans_multiple_versions_in_one_delta(spark, tmp_path):
    root, vroot = str(tmp_path / "base"), str(tmp_path / "view")
    versioned_upsert(spark, _df(spark, [("a", "x", 1, 1)]), root, "k", ["ts"])
    _refresh(spark, root, vroot)
    # three more base versions land before the next refresh
    versioned_upsert(spark, _df(spark, [("b", "x", 2, 2)]), root, "k", ["ts"])
    versioned_upsert(spark, _df(spark, [("a", "y", 3, 3)]), root, "k", ["ts"])
    versioned_upsert(spark, _df(spark, [("c", "y", 4, 4)]), root, "k", ["ts"])
    assert _refresh(spark, root, vroot) == 4  # one old..current delta
    want = group_agg_view(read_versioned(spark, root), ["g"], ["v"])
    assert _rows(read_materialized_view(spark, vroot)) == _rows(want)


def test_refresh_is_idempotent_and_replay_safe(spark, tmp_path):
    root, vroot = str(tmp_path / "base"), str(tmp_path / "view")
    versioned_upsert(spark, _df(spark, [("a", "x", 1, 1)]), root, "k", ["ts"])
    versioned_upsert(spark, _df(spark, [("b", "y", 2, 2)]), root, "k", ["ts"])
    assert _refresh(spark, root, vroot) == 2
    before = _rows(read_materialized_view(spark, vroot))
    # replaying the refresh at the same base version is a no-op
    assert _refresh(spark, root, vroot) == 2
    assert _rows(read_materialized_view(spark, vroot)) == before
    assert materialized_version(spark, vroot) == 2
