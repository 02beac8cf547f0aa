"""Round-26 semantic properties (the oracle gate covers value equality;
these pin the invariants the numbers must satisfy).

Reference has no mixing/serving surface (/root/reference/etl_connector.py:53-242).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round26 import (
    q361_source_mixture_weights,
    q362_duplicate_span_coverage,
    q364_padding_waste,
    q366_training_order_audit,
)


def test_mixture_weights_normalized_and_flattening(spark, sf_dir):
    rows = q361_source_mixture_weights(spark, sf_dir).collect()
    assert sum(r.weight for r in rows) == pytest.approx(1.0, abs=1e-12)
    # alpha = 1/2 must flatten: the weight ratio between any two sources is
    # closer to 1 than their token ratio
    big = max(rows, key=lambda r: r.n_tokens)
    small = min(rows, key=lambda r: r.n_tokens)
    if big.n_tokens > small.n_tokens:
        assert 1 <= big.weight / small.weight < big.n_tokens / small.n_tokens


def test_duplicate_span_coverage_planted_copy(spark, tmp_path):
    """An exact copy of a long document must have coverage 1.0; a document
    sharing no 8-gram with anyone must have coverage 0.0."""
    words = " ".join(f"w{i}" for i in range(40))
    unique = " ".join(f"u{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, words, "en", "s", len(words)),
         (2, words, "en", "s", len(words)),
         (3, unique, "en", "s", len(unique))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.write.parquet(str(d / "documents.parquet"))
    cov = {r.doc_id: r.coverage for r in q362_duplicate_span_coverage(spark, str(d)).collect()}
    assert cov[1] == 1.0 and cov[2] == 1.0
    assert cov[3] == 0.0


def test_padding_waste_bounds(spark, sf_dir):
    rows = q364_padding_waste(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.waste_ratio < 1.0
        assert r.total_padded >= r.total_chars
        # batches hold at most _PAD_BATCH docs
        assert r.n_batches >= (r.n_docs + 7) // 8


def test_training_order_is_permutation_and_mixed(spark, sf_dir):
    rows = q366_training_order_audit(spark, sf_dir).collect()
    n = sum(r.n_docs for r in rows)
    assert min(r.first_pos for r in rows) == 1
    assert max(r.last_pos for r in rows) == n
    for r in rows:
        # hash order interleaves sources: every source's mean normalized
        # position is near the uniform 0.5, not clumped at either end
        assert 0.3 < r.mean_pos_norm < 0.7, (r.source, r.mean_pos_norm)
