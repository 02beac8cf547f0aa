"""Count-Min operator family (operators/countmin.py): merge associativity,
streaming accumulation parity with the batch sketch, crash-replay safety
of the per-batch-partition store, and the one-sided guarantee end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions import text as TXT
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.countmin import (
    cm_cells,
    cm_estimate,
    cm_merge,
    countmin_sink,
    read_cm_sketch,
)
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


@pytest.fixture(scope="module")
def occurrences(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(TXT.words("text")).alias("token"))
    )


def _cells_dict(df):
    return {(r.rid, r.bucket): r.cell for r in df.collect()}


def test_cm_merge_equals_whole(spark, occurrences):
    """Sharded cells merged cell-wise == cells of the whole stream."""
    whole = _cells_dict(cm_cells(occurrences))
    a = cm_cells(occurrences.filter(F.col("doc_id") % 2 == 0))
    b = cm_cells(occurrences.filter(F.col("doc_id") % 2 == 1))
    assert _cells_dict(cm_merge(a, b)) == whole


def test_cm_estimate_one_sided(spark, occurrences):
    cells = cm_cells(occurrences)
    true = occurrences.groupBy("token").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = {r.token: r.est_cnt for r in cm_estimate(cells, true).collect()}
    for r in true.collect():
        assert est[r.token] >= r.true_cnt


def test_streaming_accumulation_matches_batch_and_survives_replay(
    spark, occurrences, tmp_path
):
    """Three micro-batches through the sink == one batch sketch; replaying
    a batch (crash re-delivery) must not double-count any cell."""
    path = str(tmp_path / "sketch")
    sink = countmin_sink(path)
    batches = [
        occurrences.filter(F.col("doc_id") % 3 == i).select("token") for i in range(3)
    ]
    for i, b in enumerate(batches):
        sink(b, i)
    sink(batches[1], 1)  # crash-replay of batch 1
    accumulated = _cells_dict(read_cm_sketch(spark, path))
    whole = _cells_dict(cm_cells(occurrences))
    assert accumulated == whole


def test_cm_estimate_unknown_token_is_bounded_by_collisions(spark, occurrences):
    """A token never inserted gets only colliding mass (>= 0, finite) —
    and a token with a collision-free row gets exactly 0."""
    cells = cm_cells(occurrences)
    probe = occurrences.sparkSession.createDataFrame(
        [("zzz-never-seen-token-qq",)], "token string"
    )
    est = cm_estimate(cells, probe).collect()[0]
    assert est.est_cnt >= 0
