"""Conditional-clause MERGE on versioned tables
(operators/versioned.merge_apply / versioned_merge): Delta-parity
WHEN MATCHED [AND cond] THEN UPDATE/DELETE + WHEN NOT MATCHED [AND cond]
THEN INSERT — clause precedence, keep-by-default, partition-referencing
rewrite, emptied-partition drop, and history isolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.versioned import (
    _manifest,
    current_version,
    merge_apply,
    read_versioned,
    versioned_merge,
    versioned_upsert,
)

DDL = "k long, part string, v long, rev int"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 100, 1), (2, "a", 600, 1), (3, "b", 300, 1), (4, "b", 400, 1)],
        DDL,
    )
    source = spark.createDataFrame(
        [(2, "a", 50, 2), (3, "b", 999, 2), (5, "c", 700, 2), (6, "c", 5, 2)],
        DDL,
    )
    return target, source


def test_merge_apply_clause_precedence(spark, frames):
    target, source = frames
    # delete-first: k=2 (t.v=600 >= 500) skips delete, updates; k=3
    # (t.v=300 < 500) deletes even though the update clause also holds
    out = merge_apply(
        target, source, ["k"],
        [("t.v < 500", "delete"), ("s.v > t.v", "update")],
        not_matched="insert", not_matched_cond="s.v >= 100",
    )
    assert _rows(out) == [
        (1, "a", 100, 1),   # target-only: kept
        (2, "a", 600, 1),   # matched; no clause fires (600>=500, 50<600): kept
        (4, "b", 400, 1),   # target-only: kept (k=3 deleted by clause 1)
        (5, "c", 700, 2),   # unmatched, insert gate passes; k=6 (v=5) dropped
    ]


def test_merge_apply_first_true_clause_wins(spark, frames):
    target, source = frames
    # update-first ordering flips k=3's fate
    upd_first = merge_apply(
        target, source, ["k"],
        [("s.v > t.v", "update"), ("t.v < 500", "delete")],
        not_matched=None,
    )
    del_first = merge_apply(
        target, source, ["k"],
        [("t.v < 500", "delete"), ("s.v > t.v", "update")],
        not_matched=None,
    )
    assert (3, "b", 999, 2) in _rows(upd_first)  # update won
    assert all(r[0] != 3 for r in _rows(del_first))  # delete won
    # not_matched=None drops source-only rows entirely
    assert all(r[0] not in (5, 6) for r in _rows(upd_first))


def test_merge_apply_no_clause_keeps_row(spark, frames):
    target, source = frames
    out = merge_apply(target, source, ["k"], [], not_matched=None)
    assert _rows(out) == _rows(target)


def test_merge_apply_empty_target_inserts(spark, frames):
    _, source = frames
    out = merge_apply(None, source, ["k"], [("true", "update")],
                      not_matched="insert", not_matched_cond="s.v > 10")
    assert _rows(out) == [(2, "a", 50, 2), (3, "b", 999, 2), (5, "c", 700, 2)]
    none = merge_apply(None, source, ["k"], [], not_matched=None)
    assert none.count() == 0


def test_merge_apply_rejects_bad_actions(spark, frames):
    target, source = frames
    with pytest.raises(ValueError, match="matched action"):
        merge_apply(target, source, ["k"], [(None, "upsert")])
    with pytest.raises(ValueError, match="not_matched action"):
        merge_apply(target, source, ["k"], [], not_matched="update")


def test_versioned_merge_partition_reuse_and_drop(spark, frames, tmp_path):
    target, source = frames
    root = str(tmp_path / "t")
    v1 = versioned_upsert(
        spark, target, root, "k", ["rev"], partition_by="part",
        stats_cols=["v"],
    )
    m1 = _manifest(spark, root, v1)
    # merge touching ONLY partition b (delete both its rows) and c (inserts);
    # partition a must be REFERENCED from v1's manifest, not rewritten
    src = spark.createDataFrame(
        [(3, "b", 999, 2), (4, "b", 999, 2), (5, "c", 700, 2)], DDL
    )
    v2 = versioned_merge(
        spark, src, root, "k",
        matched_clauses=[(None, "delete")],
        not_matched="insert",
    )
    got = read_versioned(spark, root, v2).select("k", "part", "v", "rev")
    assert _rows(got) == [(1, "a", 100, 1), (2, "a", 600, 1), (5, "c", 700, 2)]
    m2 = _manifest(spark, root, v2)
    assert m2["partitions"]["a"] == m1["partitions"]["a"]  # referenced, not copied
    assert "b" not in m2["partitions"]  # emptied partition dropped
    assert m2["partitions"]["c"] == m2["data"]  # rewritten in the new dir
    # stats carry: 'a' keeps v1's zone map, 'c' gets a fresh one, 'b' is gone
    assert m2["stats"]["a"] == m1["stats"]["a"]
    assert m2["stats"]["c"]["v"] == [700, 700]
    assert "b" not in m2["stats"]
    # history untouched
    assert _rows(
        read_versioned(spark, root, v1).select("k", "part", "v", "rev")
    ) == _rows(target)


def test_versioned_merge_conditional_update_partitioned(spark, frames, tmp_path):
    target, source = frames
    root = str(tmp_path / "t")
    versioned_upsert(spark, target, root, "k", ["rev"], partition_by="part")
    versioned_merge(
        spark, source, root, "k",
        matched_clauses=[("s.v > t.v", "update")],
        not_matched="insert", not_matched_cond="s.v >= 100",
    )
    got = read_versioned(spark, root).select("k", "part", "v", "rev")
    assert _rows(got) == [
        (1, "a", 100, 1),
        (2, "a", 600, 1),   # s.v=50 not > 600: kept
        (3, "b", 999, 2),   # updated
        (4, "b", 400, 1),
        (5, "c", 700, 2),   # inserted (>=100); k=6 (v=5) filtered
    ]
    assert current_version(spark, root) == 2


def test_versioned_merge_creates_table_when_absent(spark, frames, tmp_path):
    _, source = frames
    root = str(tmp_path / "t")
    v = versioned_merge(spark, source, root, "k", matched_clauses=[])
    assert v == 1
    assert _rows(read_versioned(spark, root)) == _rows(source)


def test_versioned_merge_multi_key(spark, tmp_path):
    """Composite merge keys: the ON condition is the conjunction of all
    key columns."""
    root = str(tmp_path / "t")
    target = spark.createDataFrame(
        [(1, "x", "a", 10, 1), (1, "y", "a", 20, 1), (2, "x", "b", 30, 1)],
        "k1 long, k2 string, part string, v long, rev int",
    )
    source = spark.createDataFrame(
        [(1, "x", "a", 99, 2),   # matches (1,x): update
         (1, "z", "a", 50, 2),   # k1 matches but k2 not: insert
         (2, "y", "b", 7, 2)],   # insert
        "k1 long, k2 string, part string, v long, rev int",
    )
    versioned_upsert(spark, target, root, ["k1", "k2"], ["rev"],
                     partition_by="part")
    versioned_merge(
        spark, source, root, ["k1", "k2"],
        matched_clauses=[("s.v > t.v", "update")],
    )
    got = read_versioned(spark, root).select("k1", "k2", "part", "v", "rev")
    assert _rows(got) == [
        (1, "x", "a", 99, 2),
        (1, "y", "a", 20, 1),
        (1, "z", "a", 50, 2),
        (2, "x", "b", 30, 1),
        (2, "y", "b", 7, 2),
    ]


def test_versioned_merge_cas_conflict(spark, frames, tmp_path):
    """expected_parent CAS: a merge that read version 1 must fail fast
    once another writer has published version 2, leaving the table
    untouched."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.versioned import ConcurrentWriteError

    target, source = frames
    root = str(tmp_path / "t")
    v1 = versioned_upsert(spark, target, root, "k", ["rev"],
                          partition_by="part")
    v2 = versioned_upsert(
        spark, target.withColumn("rev", F.lit(2)), root, "k", ["rev"],
        partition_by="part",
    )
    with pytest.raises(ConcurrentWriteError, match="expected 1"):
        versioned_merge(
            spark, source, root, "k",
            matched_clauses=[(None, "update")], expected_parent=v1,
        )
    assert current_version(spark, root) == v2
    # retry with the refreshed parent succeeds
    v3 = versioned_merge(
        spark, source, root, "k",
        matched_clauses=[(None, "update")], expected_parent=v2,
    )
    assert v3 == 3


# -- property fuzz: merge_apply vs a pure-Python reference -------------------

from hypothesis import HealthCheck, given, settings, strategies as st

_CONDS = {
    "t.v < 300": lambda t, s: t["v"] < 300,
    "s.v > t.v": lambda t, s: s["v"] > t["v"],
    "s.v % 2 = 0": lambda t, s: s["v"] % 2 == 0,
    None: lambda t, s: True,
}
_INS_CONDS = {
    "s.v >= 100": lambda s: s["v"] >= 100,
    "s.v % 2 = 1": lambda s: s["v"] % 2 == 1,
    None: lambda s: True,
}


def _py_merge(target, source, clauses, not_matched, ins_cond):
    """Reference semantics on plain dicts: first true clause wins,
    keep-by-default, insert gate for source-only rows."""
    src = {r["k"]: r for r in source}
    out = []
    for t in target:
        s = src.get(t["k"])
        if s is None:
            out.append(t)
            continue
        act = "keep"
        for cond, action in clauses:
            if _CONDS[cond](t, s):
                act = action
                break
        if act == "keep":
            out.append(t)
        elif act == "update":
            out.append(s)
    tgt_keys = {r["k"] for r in target}
    if not_matched == "insert":
        for s in source:
            if s["k"] not in tgt_keys and _INS_CONDS[ins_cond](s):
                out.append(s)
    return sorted((r["k"], r["part"], r["v"], r["rev"]) for r in out)


@given(
    clauses=st.lists(
        st.tuples(st.sampled_from(sorted(_CONDS, key=str)),
                  st.sampled_from(["update", "delete"])),
        min_size=0, max_size=3,
    ),
    not_matched=st.sampled_from(["insert", None]),
    ins_cond=st.sampled_from(sorted(_INS_CONDS, key=str)),
    tv=st.lists(st.integers(0, 600), min_size=0, max_size=6),
    sv=st.lists(st.integers(0, 600), min_size=0, max_size=6),
)
@settings(
    max_examples=12, deadline=None, derandomize=True,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
def test_merge_apply_matches_python_reference(
    spark, clauses, not_matched, ins_cond, tv, sv
):
    target = [
        {"k": i, "part": "ab"[i % 2], "v": v, "rev": 1}
        for i, v in enumerate(tv)
    ]
    source = [
        {"k": i * 2, "part": "ab"[i % 2], "v": v, "rev": 2}
        for i, v in enumerate(sv)  # keys overlap evens, miss odds
    ]
    if not target and not source:
        return
    tdf = (
        spark.createDataFrame([tuple(r.values()) for r in target], DDL)
        if target else None
    )
    sdf = spark.createDataFrame(
        [tuple(r.values()) for r in source] or [(0, "a", 0, 0)], DDL
    )
    if not source:
        sdf = sdf.filter(F.lit(False))
    got = merge_apply(
        tdf, sdf, ["k"], list(clauses),
        not_matched=not_matched, not_matched_cond=ins_cond,
    )
    assert _rows(got) == _py_merge(target, source, clauses,
                                   not_matched, ins_cond)
