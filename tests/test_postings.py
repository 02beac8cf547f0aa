"""Positional postings / phrase search unit semantics
(operators/postings.py) — the corners the fixture corpus doesn't hit:
multiple occurrences per document, overlapping matches, duplicate
continuation tokens, and cross-document non-matches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings import build_postings, phrase_match


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hits(spark, rows, phrase):
    postings = build_postings(_docs(spark, rows), "doc_id", "text")
    return {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match(postings, phrase).collect()
    }


def test_multiple_occurrences_and_first_pos(spark):
    rows = [
        (1, "x table scan y table scan"),  # hits at 1 and 4
        (2, "table y scan"),               # tokens present, not adjacent
        (3, "scan table"),                 # wrong order
    ]
    assert _hits(spark, rows, ["table", "scan"]) == {1: (2, 1)}


def test_overlapping_matches_count(spark):
    # anchors at 0 and 1 both continue: overlapping occurrences count
    assert _hits(spark, [(7, "a a a")], ["a", "a"]) == {7: (2, 0)}


def test_duplicate_continuations_do_not_multiply(spark):
    # two 'b's in doc but only pos 1 continues the anchor at 0;
    # the semi-join must not double-count the anchor
    assert _hits(spark, [(9, "a b c b")], ["a", "b"]) == {9: (1, 0)}


def test_three_token_phrase_and_cross_doc_isolation(spark):
    rows = [(1, "u v w"), (2, "u v"), (3, "v w u v w q u v w")]
    assert _hits(spark, rows, ["u", "v", "w"]) == {1: (1, 0), 3: (2, 2)}


def test_single_token_phrase_counts_occurrences(spark):
    assert _hits(spark, [(4, "k j k k")], ["k"]) == {4: (3, 0)}


def test_empty_phrase_rejected(spark):
    postings = build_postings(_docs(spark, [(1, "a")]), "doc_id", "text")
    with pytest.raises(ValueError):
        phrase_match(postings, [])


def test_repeated_spaces_keep_alignment(spark):
    # split on single space yields an empty token slot between 'a' and
    # 'b': positions stay raw-split-aligned, so 'a b' is NOT adjacent
    assert _hits(spark, [(5, "a  b")], ["a", "b"]) == {}
    assert _hits(spark, [(5, "a  b")], ["b"]) == {5: (1, 2)}
