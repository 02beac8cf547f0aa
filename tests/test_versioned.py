"""operators/versioned: snapshot-isolated keyed upserts with time travel,
rollback, and vacuum — R8's upsert semantics plus the atomicity the
reference's in-place Mongo writes lack (etl_connector.py:167-191)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.versioned import (
    current_version,
    read_versioned,
    rollback,
    vacuum_versioned,
    versioned_upsert,
    versions,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v string, ts long")


def _state(spark, root, version=None):
    return {
        r["k"]: r["v"]
        for r in read_versioned(spark, root, version).collect()
    }


def test_upsert_versions_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = versioned_upsert(spark, _df(spark, [("a", "v1", 1), ("b", "w1", 1)]), root, "k", ["ts"])
    v2 = versioned_upsert(spark, _df(spark, [("a", "v2", 2), ("c", "x1", 1)]), root, "k", ["ts"])
    v3 = versioned_upsert(spark, _df(spark, [("b", "w0", 0)]), root, "k", ["ts"])  # older ts loses
    assert (v1, v2, v3) == (1, 2, 3)
    assert current_version(spark, root) == 3
    # latest: last-write-wins by ts, stale update rejected
    assert _state(spark, root) == {"a": "v2", "b": "w1", "c": "x1"}
    # time travel: every historical state intact
    assert _state(spark, root, 1) == {"a": "v1", "b": "w1"}
    assert _state(spark, root, 2) == {"a": "v2", "b": "w1", "c": "x1"}
    assert [m["version"] for m in versions(spark, root)] == [1, 2, 3]
    assert versions(spark, root)[2]["parent"] == 2


def test_replay_converges(spark, tmp_path):
    """Re-delivering a batch produces a new version with IDENTICAL content
    (keyed idempotence — the reference's replace_one, :181)."""
    root = str(tmp_path / "t")
    batch = _df(spark, [("a", "v1", 1), (None, "keyless", 1)])
    versioned_upsert(spark, batch, root, "k", ["ts"])
    s1 = _state(spark, root)
    n1 = read_versioned(spark, root).count()
    versioned_upsert(spark, _df(spark, [("a", "v1", 1)]), root, "k", ["ts"])
    assert _state(spark, root) == s1
    # NULL-key rows are the reference's insert fallback and accumulate
    assert read_versioned(spark, root).count() == n1


def test_rollback_is_append_only(spark, tmp_path):
    root = str(tmp_path / "t")
    versioned_upsert(spark, _df(spark, [("a", "good", 1)]), root, "k", ["ts"])
    versioned_upsert(spark, _df(spark, [("a", "bad", 2)]), root, "k", ["ts"])
    v3 = rollback(spark, root, 1)
    assert v3 == 3 and current_version(spark, root) == 3
    assert _state(spark, root) == {"a": "good"}
    # history intact: the bad version is still readable for audit
    assert _state(spark, root, 2) == {"a": "bad"}
    m3 = versions(spark, root)[-1]
    assert m3["rollback_of"] == 1 and m3["data"] == versions(spark, root)[0]["data"]


def test_vacuum_respects_retention_and_shared_dirs(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(4):
        versioned_upsert(spark, _df(spark, [("a", f"v{i}", i)]), root, "k", ["ts"])
    rollback(spark, root, 1)  # v5 shares v1's data dir
    reclaimed = vacuum_versioned(spark, root, keep_last=2)
    # v4 and v5(=v1 data) retained; v1's dir survives via the rollback ref
    assert 1 not in reclaimed
    assert set(reclaimed) <= {2, 3}
    assert _state(spark, root) == {"a": "v0"}  # latest (rollback of 1)
    assert _state(spark, root, 4) == {"a": "v3"}
    with pytest.raises(Exception):
        read_versioned(spark, root, 2).collect()  # vacuumed


def test_snapshot_isolation_reader_pinned(spark, tmp_path):
    """A DataFrame resolved before a new publish keeps reading its own
    immutable snapshot."""
    root = str(tmp_path / "t")
    versioned_upsert(spark, _df(spark, [("a", "v1", 1)]), root, "k", ["ts"])
    pinned = read_versioned(spark, root)  # resolves version 1's files
    versioned_upsert(spark, _df(spark, [("a", "v2", 2)]), root, "k", ["ts"])
    assert {r["v"] for r in pinned.collect()} == {"v1"}
    assert _state(spark, root) == {"a": "v2"}


def test_table_changes_roundtrip(spark, tmp_path):
    """CDC across versions: apply_cdc(v_from, changes(from, to)) == v_to."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.upsert import apply_cdc
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.versioned import table_changes

    root = str(tmp_path / "t")
    versioned_upsert(spark, _df(spark, [("a", "v1", 1), ("b", "w1", 1)]), root, "k", ["ts"])
    versioned_upsert(spark, _df(spark, [("a", "v2", 2), ("c", "x1", 1)]), root, "k", ["ts"])
    changes = table_changes(spark, root, 1, 2, keys=["k"])
    ops = {(r["op"], r["k"]) for r in changes.collect()}
    assert ops == {("update", "a"), ("insert", "c")}
    rebuilt = apply_cdc(
        read_versioned(spark, root, 1), changes, "k", ["ts"]
    )
    got = {(r["k"], r["v"]) for r in rebuilt.collect()}
    want = {(r["k"], r["v"]) for r in read_versioned(spark, root, 2).collect()}
    assert got == want


def test_table_changes_roundtrip_across_rollback(spark, tmp_path):
    """A rollback version carries OLDER order_by values, so the feed must
    replay authoritatively (order_by=[]) — including deletes, which
    table_diff spells out and apply_cdc normalizes."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.upsert import apply_cdc
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.versioned import table_changes

    root = str(tmp_path / "t")
    versioned_upsert(spark, _df(spark, [("a", "v1", 1)]), root, "k", ["ts"])
    versioned_upsert(spark, _df(spark, [("a", "v2", 2), ("c", "x1", 2)]), root, "k", ["ts"])
    rollback(spark, root, 1)  # v3 == v1's state
    changes = table_changes(spark, root, 2, 3, keys=["k"])
    ops = {(r["op"], r["k"]) for r in changes.collect()}
    assert ops == {("update", "a"), ("delete", "c")}
    rebuilt = apply_cdc(read_versioned(spark, root, 2), changes, "k", [])
    got = {(r["k"], r["v"]) for r in rebuilt.collect()}
    assert got == {("a", "v1")}


def _pdf(spark, rows):
    return spark.createDataFrame(rows, "k string, v string, ts long, day string")


def test_partitioned_versions_reference_untouched_partitions(spark, tmp_path):
    """The 100 TB path: a new version rewrites only touched partitions and
    its manifest references the previous owner for the rest."""
    import os

    root = str(tmp_path / "t")
    versioned_upsert(
        spark,
        _pdf(spark, [("a", "v1", 1, "d1"), ("b", "w1", 1, "d2")]),
        root, "k", ["ts"], partition_by="day",
    )
    # second batch touches ONLY d2
    versioned_upsert(
        spark,
        _pdf(spark, [("b", "w2", 2, "d2"), ("c", "x1", 1, "d2")]),
        root, "k", ["ts"], partition_by="day",
    )
    ms = versions(spark, root)
    assert ms[1]["partitions"]["d1"] == ms[0]["data"]  # referenced, not copied
    assert ms[1]["partitions"]["d2"] == ms[1]["data"]  # rewritten
    # v2's own directory holds ONLY the touched partition
    assert not os.path.exists(f"{root}/{ms[1]['data']}/day=d1")
    assert _state(spark, root) == {"a": "v1", "b": "w2", "c": "x1"}
    assert _state(spark, root, 1) == {"a": "v1", "b": "w1"}


def test_partitioned_rollback_vacuum_and_cdc(spark, tmp_path):
    root = str(tmp_path / "t")
    versioned_upsert(
        spark, _pdf(spark, [("a", "v1", 1, "d1")]), root, "k", ["ts"],
        partition_by="day",
    )
    versioned_upsert(
        spark, _pdf(spark, [("a", "v2", 2, "d1"), ("b", "w1", 1, "d2")]),
        root, "k", ["ts"], partition_by="day",
    )
    v3 = rollback(spark, root, 1)
    assert _state(spark, root) == {"a": "v1"}
    assert _state(spark, root, 2) == {"a": "v2", "b": "w1"}
    # vacuum keeps every dir referenced by retained manifests (v2, v3=v1 refs)
    reclaimed = vacuum_versioned(spark, root, keep_last=2)
    assert reclaimed == []  # v1's dir is referenced by v3 (the rollback)
    assert _state(spark, root) == {"a": "v1"}
    # CDC across partitioned versions
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.versioned import table_changes

    ch = table_changes(spark, root, 1, 2, keys=["k"])
    assert {(r["op"], r["k"]) for r in ch.collect()} == {
        ("update", "a"), ("insert", "b"),
    }


def test_concurrent_writer_loser_aborts_cleanly(spark, tmp_path):
    """Two writers racing from the same parent: exactly one commits;
    the loser raises ConcurrentWriteError, nothing visible changes, and
    history stays linear. The race is staged deterministically via the
    expected_parent CAS handle (both writers read parent=1)."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.versioned import (
        ConcurrentWriteError,
    )

    root = str(tmp_path / "t")
    versioned_upsert(spark, _df(spark, [("a", "v1", 1)]), root, "k", ["ts"])
    # writer A (parent=1) wins
    va = versioned_upsert(
        spark, _df(spark, [("a", "A", 2)]), root, "k", ["ts"], expected_parent=1
    )
    assert va == 2
    # writer B also read parent=1 — must abort, not clobber A
    with pytest.raises(ConcurrentWriteError):
        versioned_upsert(
            spark, _df(spark, [("a", "B", 3)]), root, "k", ["ts"], expected_parent=1
        )
    assert _state(spark, root) == {"a": "A"}
    hist = versions(spark, root)
    assert [m["version"] for m in hist] == [1, 2]
    assert [m["parent"] for m in hist] == [None, 1]


def test_manifest_claim_serializes_even_without_cas_handle(spark, tmp_path):
    """A writer that crashed between manifest commit and pointer update
    must not be overwritten: the manifest directory is authoritative, the
    pointer self-heals, and the next writer builds on the committed
    version."""
    import json as _json

    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.versioned import (
        _create_exclusive,
        _read_small,
    )

    root = str(tmp_path / "t")
    versioned_upsert(spark, _df(spark, [("a", "v1", 1)]), root, "k", ["ts"])
    # simulate a writer that committed v2's manifest then crashed before
    # moving the pointer (reuses v1's data dir so the state stays readable)
    m1 = _json.loads(_read_small(spark, f"{root}/_versions/v00000001.json"))
    ghost = {"version": 2, "parent": 1, "data": m1["data"], "n_rows": m1["n_rows"]}
    assert _create_exclusive(
        spark, f"{root}/_versions/v00000002.json", _json.dumps(ghost)
    )
    assert _read_small(spark, f"{root}/_LATEST").strip() == "1"  # stale pointer
    assert current_version(spark, root) == 2  # self-healed
    v3 = versioned_upsert(spark, _df(spark, [("b", "w1", 1)]), root, "k", ["ts"])
    assert v3 == 3
    assert [m["version"] for m in versions(spark, root)] == [1, 2, 3]
    # re-claiming a committed slot fails
    assert not _create_exclusive(spark, f"{root}/_versions/v00000002.json", "x")


def test_vacuum_sweeps_loser_orphans(spark, tmp_path):
    """A losing writer's data directory (unreferenced, version already
    committed) is reclaimed by vacuum; in-flight targets (higher than any
    committed version) survive."""
    root = str(tmp_path / "t")
    versioned_upsert(spark, _df(spark, [("a", "v1", 1)]), root, "k", ["ts"])
    versioned_upsert(spark, _df(spark, [("a", "v2", 2)]), root, "k", ["ts"])
    import os

    loser = tmp_path / "t" / "data" / "v00000002-deadbeef"
    inflight = tmp_path / "t" / "data" / "v00000003-cafef00d"
    os.makedirs(loser)
    os.makedirs(inflight)
    vacuum_versioned(spark, root, keep_last=2)
    assert not loser.exists()  # orphan of an already-committed version
    assert inflight.exists()  # in-flight writer, never swept
    assert _state(spark, root) == {"a": "v2"}
