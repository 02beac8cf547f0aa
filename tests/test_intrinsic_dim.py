"""q308_intrinsic_dimension path equivalence: the dense broadcast path
(whole quantized matrix as one shard) and the sharded distributed path
(per-shard partial two-NN + min-merge) must produce IDENTICAL output —
the integer-grid distances are bit-reproducible and dsum's decimal
accumulation is order-independent, so this is exact equality, not a
tolerance check.

Reference has no vector surface (/root/reference/etl_connector.py:53-242).
"""

from __future__ import annotations

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import round14


def _row(df):
    r = df.collect()[0]
    return r["n_used"], r["intrinsic_dim"]


def test_dense_and_sharded_paths_agree(spark, sf_dir, monkeypatch):
    dense_n, dense_id = _row(round14.q308_intrinsic_dimension(spark, sf_dir))
    # force the sharded path: every residue class becomes its own shard
    monkeypatch.setattr(round14, "INTRINSIC_DENSE_ROW_LIMIT", 100)
    sharded_n, sharded_id = _row(
        round14.q308_intrinsic_dimension(spark, sf_dir)
    )
    assert dense_n == sharded_n > 0
    assert dense_id == sharded_id  # exact: same doubles on both paths
    assert dense_id > 0
