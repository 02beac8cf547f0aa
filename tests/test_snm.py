"""Multi-pass sorted-neighborhood blocking (operators/snm.py): exact-twin
recall per pass, union recall dominance over single-pass, and candidate
hygiene (ordered distinct pairs, pass counts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.dedup import jaccard_pairs
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.snm import (
    snm_candidates,
    snm_text_passes,
)
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


def test_snm_candidate_hygiene(spark, docs):
    cands = snm_candidates(docs, "doc_id", snm_text_passes(), window=2).collect()
    assert len(cands) > 0
    seen = set()
    for r in cands:
        assert r.id_a < r.id_b
        assert (r.id_a, r.id_b) not in seen
        seen.add((r.id_a, r.id_b))
        assert 1 <= r.n_passes <= 3


def test_snm_multi_pass_dominates_single_pass(spark, docs):
    """The multi-pass union must recover at least every true near-dup pair
    the first pass alone recovers — and on this corpus strictly more
    candidates overall."""
    passes = snm_text_passes()
    truth = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    single = {
        (r.id_a, r.id_b)
        for r in snm_candidates(docs, "doc_id", passes[:1], window=2).collect()
    }
    multi = {
        (r.id_a, r.id_b)
        for r in snm_candidates(docs, "doc_id", passes, window=2).collect()
    }
    assert single <= multi
    assert len(truth & multi) >= len(truth & single)
    assert len(multi) > len(single)


def test_snm_exact_twins_always_adjacent(spark):
    """Documents with identical word sets share every sort key, so every
    pass proposes the pair (n_passes == number of passes)."""
    rows = [
        (1, "alpha beta gamma", "en", "s", 16),
        (2, "gamma alpha beta", "en", "s", 16),
        (3, "unrelated words entirely different", "en", "s", 34),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {(r.id_a, r.id_b): r.n_passes for r in snm_candidates(
        df, "doc_id", snm_text_passes(), window=2
    ).collect()}
    assert out.get((1, 2)) == 3
