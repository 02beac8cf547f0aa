"""Positional inverted index: postings lists and exact phrase search.

The missing sibling of q196's trigram SUBSTRING search: a positional
postings table ``(token, doc_id, pos)`` answers exact PHRASE queries
("w1 w2 w3" with adjacency) by joining the phrase's tokens on
``(doc_id, pos + offset)`` — the classic IR phrase-query plan, done as
plain co-partitioned equi-joins.

Scale (100 TB): the postings table is built once (one narrow explode
scan) and written bucketed/partitioned BY TOKEN, so a phrase query
reads only its own tokens' lists — the join keys (doc_id, pos) arrive
pre-grouped per token and never touch the corpus text again. At fixture
scale the build is inlined into the query; ``phrase_match`` filters the
explode to the phrase's tokens BEFORE any shuffle, so the joined frames
are token-sliver-sized either way. Joins are equi-joins on
``(doc_id, pos)`` — Catalyst picks broadcast for rare tokens.

Reference parity: /root/reference/etl_connector.py has no text or
search surface at all (SURVEY §0, §2.2) — north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Positional postings: one row per (token occurrence) —
    ``token, doc_id, pos`` with 0-based ``pos`` over single-space
    tokenization (empty tokens from repeated spaces keep their slot so
    positions stay aligned with the raw split; they never match a real
    phrase token)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"),
    ).select("token", "doc_id", F.col("pos").cast("long").alias("pos"))


def phrase_match(
    postings: DataFrame, phrase: list[str]
) -> DataFrame:
    """Exact phrase occurrences from a positional postings frame.

    Returns ``doc_id, n_matches, first_pos`` for documents containing
    the tokens of ``phrase`` at strictly consecutive positions. Plan:
    filter the postings to the phrase's tokens (pushed to the scan),
    then a semi-join per continuation token on BOTH keys
    ``(doc_id, anchor_pos)`` — the continuation's position is shifted
    by its phrase offset before the join, so adjacency IS the equi-join
    condition (no doc-wide blowup, no post-join filter) and duplicate
    occurrences can't multiply anchor rows.
    """
    if not phrase:
        raise ValueError("empty phrase")
    anchor = (
        postings.filter(F.col("token") == phrase[0])
        .select("doc_id", F.col("pos").alias("p0"))
    )
    for i, tok in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("token") == tok).select(
            "doc_id", (F.col("pos") - i).alias("p0")
        )
        anchor = anchor.join(nxt, ["doc_id", "p0"], "left_semi")
    return anchor.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("p0").alias("first_pos"),
    )


def phrase_match_table(
    postings: DataFrame,
    phrases: DataFrame,
    phrase_id_col: str = "phrase_id",
    pos_col: str = "ppos",
    term_col: str = "term",
) -> DataFrame:
    """Exact phrase occurrences for a phrase TABLE — the batch sibling
    of ``phrase_match`` (which serves ONE Python token list). ``phrases``
    is a (phrase_id, ppos, term) frame: 0-based positions within each
    phrase, one row per slot. A well-formed spec has exactly one term
    per (phrase_id, ppos); if a slot carries SEVERAL terms, the slot
    counts as matched when ANY of them is present (the distinct-slot
    count below can't tell which term matched) — callers wanting strict
    conjunction must not emit duplicate positions.

    Plan (the anchor-alignment formulation — one join for ALL phrases
    instead of k-1 joins per phrase): every posting row that matches ANY
    phrase slot proposes an anchor ``p0 = pos - ppos`` (the document
    position where the phrase would have to start); a full match at p0
    is exactly ``count(DISTINCT ppos) == phrase length`` within the
    (phrase, doc, p0) group, because the equi-join on the term already
    guarantees each counted slot has the right token at p0 + ppos.
    Duplicate occurrences can't inflate the count (distinct slots), and
    per-phrase independence makes the result row-identical to looping
    ``phrase_match``. Returns phrase_id, doc_id, n_matches, first_pos."""
    ph = phrases.select(
        F.col(phrase_id_col).alias("phrase_id"),
        F.col(pos_col).cast("long").alias("ppos"),
        F.col(term_col).alias("token"),
    )
    plen = ph.groupBy("phrase_id").agg(
        F.countDistinct("ppos").alias("plen")
    )
    cand = (
        postings.join(ph, "token")
        .select(
            "phrase_id",
            "doc_id",
            (F.col("pos") - F.col("ppos")).alias("p0"),
            "ppos",
        )
        .filter(F.col("p0") >= 0)
    )
    # plen is one row per phrase; the join is left UNHINTED so AQE sizes
    # it at runtime — broadcast at any sane phrase count, shuffle join if
    # an offline batch ever ships 10^7 phrases (a forced broadcast there
    # would OOM the driver). Fixture-scale AQE broadcast is pinned in
    # tests/test_postings_store.py.
    anchors = (
        cand.groupBy("phrase_id", "doc_id", "p0")
        .agg(F.countDistinct("ppos").alias("__nhit"))
        .join(plen, "phrase_id")
        .filter(F.col("__nhit") == F.col("plen"))
    )
    return anchors.groupBy("phrase_id", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("p0").alias("first_pos"),
    )
