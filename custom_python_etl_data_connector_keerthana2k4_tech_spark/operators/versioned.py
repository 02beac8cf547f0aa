"""Versioned keyed table: snapshot-isolated upserts with time travel,
rollback, and vacuum on plain parquet — the transactional half of Delta's
MERGE reproduced with nothing but immutable data directories and one
atomically-renamed pointer file.

Reference parity: the reference's Mongo sink mutates one collection in
place, per document (/root/reference/etl_connector.py:167-191) — readers
can observe half-applied batches and there is no history. This operator
keeps R8's exact upsert semantics (last-write-wins by key, insert
fallback for NULL keys via operators/upsert.upsert_dataframe) while
adding the properties a 100 TB pipeline actually needs:

- **Snapshot isolation.** Each upsert writes a brand-new data directory
  and publishes it by atomically renaming a pointer file; a reader that
  resolved the pointer keeps reading a consistent, immutable snapshot no
  matter how many writes land afterwards. No reader ever sees a partial
  merge.
- **Time travel.** Every version's manifest (version, parent, row count)
  is retained; ``read_versioned(root, version=k)`` reads any historical
  state.
- **Rollback.** ``rollback(root, version=k)`` republishes an old version
  as latest by writing a NEW version whose data is k's — history stays
  append-only (audit-friendly), nothing is mutated.
- **Vacuum.** ``vacuum_versioned(root, keep_last=n)`` deletes data dirs
  beyond the retention window; manifests stay (lineage), pointers stay
  valid.

- **DELETE.** ``versioned_delete(root, predicate)`` publishes a new
  version without the matching rows; the partitioned path rewrites ONLY
  partitions that actually contain matches and references every other
  partition from the parent (a targeted delete against a years-deep
  table touches days, not years).
- **OPTIMIZE.** ``compact_versioned(root)`` republishes the latest
  content with bin-packed files (the small-files compaction every
  long-lived table needs); the partitioned path rewrites only
  fragmented partitions. Content-identical by construction — readers
  of the old version are untouched, time travel still works.
- **Zone maps.** ``versioned_upsert(..., stats_cols=[...])`` records
  per-partition min/max for the named columns in the manifest;
  ``read_versioned(..., prune={col: (lo, hi)})`` skips partitions whose
  recorded range cannot overlap the predicate BEFORE any file listing —
  partition-level data skipping on top of parquet's own row-group
  skipping. Stats rows are tiny (columns x partitions), carried in the
  same JSON commit record.
- **Optimistic concurrency.** The manifest file is the commit record and
  it is claimed with create-if-absent (``_create_exclusive``): two
  writers that both read parent version n race to create
  ``_versions/v{n+1}.json`` — exactly one wins; the loser's data
  directory (written under a unique name, never shared) stays invisible
  and the loser raises ``ConcurrentWriteError`` without corrupting
  anything. History stays linear by construction. The ``_LATEST``
  pointer is a cache of max(manifest versions); ``current_version``
  self-heals past a writer that crashed between manifest commit and
  pointer update. (On HDFS/local the exclusive create is the primitive;
  an object-store deployment would swap in a conditional put — same
  protocol, same commit record.)

At 100 TB the merge itself is the same one-shuffle window-dedup plan as
``upsert_parquet``; the versioning layer adds one directory rename and
one small JSON per batch.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.upsert import upsert_dataframe

_VERSIONS = "_versions"
_LATEST = "_LATEST"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed the version this writer was about to
    publish. The losing write changed nothing visible (its data directory
    is unreferenced; vacuum sweeps it) — re-read the table and retry."""


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _read_small(spark: SparkSession, path: str) -> str | None:
    fs, jvm = _fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        # py4j passes arrays by value, so a Java read(byte[]) cannot fill a
        # Python buffer — let commons-io (on Spark's classpath) drain the
        # stream JVM-side and hand back a String
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _write_atomic(spark: SparkSession, path: str, content: str) -> None:
    """Write via temp file + rename — atomic on local FS and HDFS."""
    fs, jvm = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}.tmp.{uuid.uuid4().hex}")
    dst = jvm.org.apache.hadoop.fs.Path(path)
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()
    if fs.exists(dst):
        fs.delete(dst, False)
    fs.rename(tmp, dst)


def _create_exclusive(spark: SparkSession, path: str, content: str) -> bool:
    """Create ``path`` with ``content`` iff it does not already exist —
    the commit primitive. Returns False (and writes nothing) if another
    writer already claimed the path."""
    fs, jvm = _fs(spark, path)
    dst = jvm.org.apache.hadoop.fs.Path(path)
    if fs.exists(dst):
        return False
    try:
        stream = fs.create(dst, False)  # overwrite=False: fail if claimed
    except Exception:
        return False
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()
    return True


def _max_manifest_version(spark: SparkSession, root: str) -> int | None:
    """Newest committed manifest by file name (no content reads)."""
    fs, jvm = _fs(spark, root)
    vdir = jvm.org.apache.hadoop.fs.Path(f"{root}/{_VERSIONS}")
    if not fs.exists(vdir):
        return None
    best = None
    for status in fs.listStatus(vdir):
        name = status.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            v = int(name[1:-5])
            best = v if best is None or v > best else best
    return best


def current_version(spark: SparkSession, root: str) -> int | None:
    """Latest committed version: the manifest directory is authoritative
    (manifest creation is the commit point); the ``_LATEST`` pointer is a
    fast-path cache that may trail by one if a writer crashed between
    commit and pointer update — take the max to self-heal."""
    raw = _read_small(spark, f"{root}/{_LATEST}")
    pointed = None if raw is None else int(raw.strip())
    committed = _max_manifest_version(spark, root)
    if pointed is None:
        return committed
    if committed is None:
        return pointed
    return max(pointed, committed)


def versions(spark: SparkSession, root: str) -> list[dict]:
    """All version manifests, oldest first."""
    fs, jvm = _fs(spark, root)
    vdir = jvm.org.apache.hadoop.fs.Path(f"{root}/{_VERSIONS}")
    if not fs.exists(vdir):
        return []
    out = []
    for status in fs.listStatus(vdir):
        name = status.getPath().getName()
        if name.endswith(".json"):
            out.append(json.loads(_read_small(spark, f"{root}/{_VERSIONS}/{name}")))
    return sorted(out, key=lambda m: m["version"])


def _manifest(spark: SparkSession, root: str, version: int) -> dict:
    raw = _read_small(spark, f"{root}/{_VERSIONS}/v{version:08d}.json")
    if raw is None:
        raise FileNotFoundError(f"version {version} not found under {root}")
    return json.loads(raw)


def _json_scalar(v):
    """Stats values must round-trip through the JSON manifest: keep
    JSON-native scalars as-is, render everything else (dates, decimals,
    timestamps) as their string form — which sorts consistently for ISO
    dates, the partition-column case that matters."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return str(v)


def _collect_stats(
    df: DataFrame, partition_by: str | None, stats_cols: list[str]
) -> dict[str, dict[str, list]]:
    """Per-partition [min, max] zone maps for ``stats_cols`` (one
    map-side-combinable aggregate over the data being written — cost is a
    single extra pass over the REWRITTEN rows only, never the table).
    Unpartitioned frames get a single entry under key ``""``."""
    aggs = []
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))
    if partition_by is None:
        row = df.agg(*aggs).collect()[0]
        return {"": {c: [_json_scalar(row[f"__mn_{c}"]), _json_scalar(row[f"__mx_{c}"])] for c in stats_cols}}
    out: dict[str, dict[str, list]] = {}
    for row in df.groupBy(partition_by).agg(*aggs).collect():
        out[str(row[partition_by])] = {
            c: [_json_scalar(row[f"__mn_{c}"]), _json_scalar(row[f"__mx_{c}"])]
            for c in stats_cols
        }
    return out


def versioned_upsert(
    spark: SparkSession,
    batch: DataFrame,
    root: str,
    key: str | list[str],
    order_by: list[str],
    partition_by: str | None = None,
    expected_parent: "int | None | object" = "_unset",
    stats_cols: list[str] | None = None,
) -> int:
    """Merge ``batch`` into the latest snapshot (last-write-wins on key)
    and publish the result as a NEW version. Returns the version number.

    The merge never rewrites history: the new data directory (a UNIQUE
    name — concurrent losers never collide with the winner's files) is
    written completely, then the manifest is committed with
    create-if-absent — the serialization point: if another writer already
    published this version number, ``ConcurrentWriteError`` is raised and
    nothing visible changed. Only after the commit does the pointer move.
    A crash at any earlier point leaves the previous version live and the
    orphan directory invisible (vacuum sweeps it).

    ``expected_parent`` (optional CAS handle): the version this writer
    read its inputs from — publish fails fast with ConcurrentWriteError
    if the table has moved past it (pass ``None`` for "I expect an empty
    table"). Without it, the parent is re-read at publish time and the
    manifest claim alone serializes writers.

    **The 100 TB path is ``partition_by``** (e.g. a date column, stable
    per key): the new version rewrites ONLY the partitions the batch
    touches and its manifest REFERENCES the previous owner directory for
    every untouched partition (Iceberg-style metadata reuse) — a daily
    batch against a years-deep table copies days, not years, and
    snapshot isolation still holds because referenced directories are
    immutable. Partition values are tracked as strings in the manifest
    (hive directory names), so the partition column should render
    stably as a string (dates, ints, strings all do).
    """
    cur = current_version(spark, root)
    if expected_parent != "_unset" and cur != expected_parent:
        raise ConcurrentWriteError(
            f"table at {root} is at version {cur}, writer expected "
            f"{expected_parent}; re-read and retry"
        )
    new_version = 1 if cur is None else cur + 1
    data_rel = f"data/v{new_version:08d}-{uuid.uuid4().hex[:8]}"
    data_dir = f"{root}/{data_rel}"

    # stats_cols sticks: once a table records zone maps, later upserts
    # keep maintaining them without re-passing the list
    if stats_cols is None and cur is not None:
        stats_cols = _manifest(spark, root, cur).get("stats_cols")

    if partition_by is None:
        existing = read_versioned(spark, root, cur) if cur is not None else None
        merged = upsert_dataframe(existing, batch, key, order_by)
        merged.write.mode("overwrite").parquet(data_dir)
        manifest = {
            "version": new_version,
            "parent": cur,
            "data": data_rel,
            "n_rows": spark.read.parquet(data_dir).count(),
        }
        if stats_cols:
            manifest["stats_cols"] = list(stats_cols)
            manifest["stats"] = _collect_stats(
                spark.read.parquet(data_dir), None, stats_cols
            )
    else:
        touched = sorted(
            str(r[0])
            for r in batch.select(partition_by).distinct().collect()
        )
        prev_parts: dict[str, str] = {}
        if cur is not None:
            pm = _manifest(spark, root, cur)
            if "partitions" not in pm:
                raise ValueError(
                    "cannot mix partitioned and unpartitioned versions"
                )
            prev_parts = dict(pm["partitions"])
        existing_touched = None
        if prev_parts:
            owned = [p for p in touched if p in prev_parts]
            if owned:
                existing_touched = _read_partitions(
                    spark, root, prev_parts, only=owned, col=partition_by
                )
        merged = upsert_dataframe(existing_touched, batch, key, order_by)
        merged.write.partitionBy(partition_by).mode("overwrite").parquet(
            data_dir
        )
        parts = dict(prev_parts)
        for p in touched:
            parts[p] = data_rel
        manifest = {
            "version": new_version,
            "parent": cur,
            "data": data_rel,
            "partition_by": partition_by,
            "partitions": parts,
        }
        if stats_cols:
            prev_stats: dict = {}
            if cur is not None:
                prev_stats = _manifest(spark, root, cur).get("stats", {})
            stats = {
                p: s for p, s in prev_stats.items() if p in parts
            }
            stats.update(
                _collect_stats(
                    spark.read.parquet(data_dir), partition_by, stats_cols
                )
            )
            manifest["stats_cols"] = list(stats_cols)
            manifest["stats"] = stats

    if not _create_exclusive(
        spark,
        f"{root}/{_VERSIONS}/v{new_version:08d}.json",
        json.dumps(manifest, sort_keys=True),
    ):
        raise ConcurrentWriteError(
            f"version {new_version} under {root} was committed by another "
            f"writer; this write is invisible (orphan {data_rel}) — "
            f"re-read and retry"
        )
    _write_atomic(spark, f"{root}/{_LATEST}", str(new_version))
    return new_version


def _read_partitions(
    spark: SparkSession,
    root: str,
    parts: dict[str, str],
    only: list[str] | None,
    col: str,
) -> DataFrame:
    """Union of owner-directory reads, one scan per distinct owner version
    (bounded by retention depth, NOT by partition count); each read prunes
    to the partitions that owner still holds via partition filters."""
    from collections import defaultdict

    wanted = set(only) if only is not None else set(parts)
    by_owner: dict[str, list[str]] = defaultdict(list)
    for value, owner in parts.items():
        if value in wanted:
            by_owner[owner].append(value)
    pieces = []
    for owner, values in sorted(by_owner.items()):
        df = spark.read.parquet(f"{root}/{owner}")
        pieces.append(df.filter(F.col(col).cast("string").isin(values)))
    if not pieces:
        raise FileNotFoundError(f"no partitions to read under {root}")
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def _any_owner_dir(spark: SparkSession, root: str, m: dict) -> str:
    """Some existing partitioned data directory reachable from manifest
    ``m`` or its ancestors — used only to recover the SCHEMA of an empty
    version (a table whose rows were all deleted)."""
    fs, jvm = _fs(spark, root)
    seen = m
    while True:
        candidates = sorted(set(seen.get("partitions", {}).values()))
        candidates.append(seen["data"])
        for rel in candidates:
            if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{root}/{rel}")):
                # the dir must contain at least one parquet file
                n, _ = _partition_dir_has_files(spark, f"{root}/{rel}")
                if n:
                    return rel
        if seen.get("parent") is None:
            raise FileNotFoundError(f"no data directories under {root}")
        seen = _manifest(spark, root, seen["parent"])


def _partition_dir_has_files(spark, path: str) -> tuple[int, int]:
    """(n_files, bytes) of parquet files anywhere under ``path``."""
    fs, jvm = _fs(spark, path)
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(path), True)
    n, b = 0, 0
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not name.startswith(("_", ".")):
            n += 1
            b += status.getLen()
    return n, b


def _zone_overlaps(stats: dict, prune: dict) -> bool:
    """True if a partition with these zone maps COULD hold a row matching
    every ``col: (lo, hi)`` range (inclusive). min/max of None means every
    value is NULL — no row can match a range predicate on that column.
    A column with no recorded stats keeps the partition (conservative)."""
    for col, (lo, hi) in prune.items():
        if col not in stats:
            continue
        mn, mx = stats[col]
        if mn is None or mx is None:
            return False
        if (hi is not None and mn > hi) or (lo is not None and mx < lo):
            return False
    return True


def prune_report(
    spark: SparkSession,
    root: str,
    prune: dict,
    version: int | None = None,
) -> tuple[list[str], list[str]]:
    """(kept, skipped) partition values for ``prune`` ({col: (lo, hi)},
    bounds inclusive, None = unbounded) against the recorded zone maps —
    the observability half of data skipping. Partitions without stats are
    kept (skipping must never lose rows)."""
    v = current_version(spark, root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published version under {root}")
    m = _manifest(spark, root, v)
    stats = m.get("stats", {})
    values = sorted(m.get("partitions", {"": None}))
    kept, skipped = [], []
    for p in values:
        (kept if _zone_overlaps(stats.get(p, {}), prune) else skipped).append(p)
    return kept, skipped


def read_versioned(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    prune: dict | None = None,
) -> DataFrame:
    """Read the latest (default) or any historical version — time travel.
    Partitioned versions assemble from their referenced owner directories
    (one pruned scan per distinct owner).

    ``prune`` ({col: (lo, hi)} inclusive ranges) applies the manifest's
    zone maps BEFORE any directory listing: partitions whose recorded
    min/max cannot overlap are never read. The result is a SUPERSET of
    the rows matching the ranges (zone granularity) — the caller still
    applies its row filter; Catalyst collapses the two into one scan.
    At 100 TB this is the difference between listing a handful of
    directories and listing the table."""
    v = current_version(spark, root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published version under {root}")
    m = _manifest(spark, root, v)
    if "partitions" in m:
        if not m["partitions"] or (prune and not prune_report(spark, root, prune, v)[0]):
            # empty result — borrow schema from any owner dir in history
            # (partition col included via hive discovery)
            owner = _any_owner_dir(spark, root, m)
            return spark.read.parquet(f"{root}/{owner}").filter(F.lit(False))
        only = None
        if prune:
            only, _ = prune_report(spark, root, prune, v)
        return _read_partitions(
            spark, root, m["partitions"], only=only, col=m["partition_by"]
        )
    df = spark.read.parquet(f"{root}/{m['data']}")
    if prune and "stats" in m and not _zone_overlaps(m["stats"].get("", {}), prune):
        return df.filter(F.lit(False))
    return df


def versioned_delete(
    spark: SparkSession,
    root: str,
    predicate,
    expected_parent: "int | None | object" = "_unset",
) -> int:
    """DELETE: publish a new version without the rows matching
    ``predicate`` (a Column or SQL string). History is untouched — the
    deleted rows remain readable at older versions until vacuum.

    The partitioned path first finds the partitions that actually CONTAIN
    matches (one aggregate over the predicate, which Catalyst prunes with
    the table's partition layout) and rewrites only those, referencing
    every other partition from the parent; a partition left empty is
    dropped from the manifest. At 100 TB a targeted delete (one user, one
    day) rewrites a sliver of the table.
    """
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    cur = current_version(spark, root)
    if expected_parent != "_unset" and cur != expected_parent:
        raise ConcurrentWriteError(
            f"table at {root} is at version {cur}, writer expected "
            f"{expected_parent}; re-read and retry"
        )
    if cur is None:
        raise FileNotFoundError(f"no published version under {root}")
    m = _manifest(spark, root, cur)
    new_version = cur + 1
    data_rel = f"data/v{new_version:08d}-{uuid.uuid4().hex[:8]}"
    data_dir = f"{root}/{data_rel}"
    stats_cols = m.get("stats_cols")

    if "partitions" not in m:
        kept = read_versioned(spark, root, cur).filter(~pred)
        kept.coalesce(max(1, min(kept.rdd.getNumPartitions(), 32))).write.mode(
            "overwrite"
        ).parquet(data_dir)
        manifest = {
            "version": new_version,
            "parent": cur,
            "data": data_rel,
            "deleted_where": str(predicate),
            "n_rows": spark.read.parquet(data_dir).count(),
        }
        if stats_cols:
            manifest["stats_cols"] = stats_cols
            manifest["stats"] = _collect_stats(
                spark.read.parquet(data_dir), None, stats_cols
            )
    else:
        col = m["partition_by"]
        cur_df = read_versioned(spark, root, cur)
        touched = sorted(
            str(r[0])
            for r in cur_df.filter(pred).select(col).distinct().collect()
        )
        parts = {p: o for p, o in m["partitions"].items() if p not in touched}
        stats = {
            p: s for p, s in m.get("stats", {}).items() if p not in touched
        }
        if touched:
            kept = _read_partitions(
                spark, root, m["partitions"], only=touched, col=col
            ).filter(~pred)
            survivors = sorted(
                str(r[0]) for r in kept.select(col).distinct().collect()
            )
            if survivors:
                kept.write.partitionBy(col).mode("overwrite").parquet(data_dir)
                for p in survivors:
                    parts[p] = data_rel
                if stats_cols:
                    stats.update(
                        _collect_stats(
                            spark.read.parquet(data_dir), col, stats_cols
                        )
                    )
        manifest = {
            "version": new_version,
            "parent": cur,
            "data": data_rel,
            "deleted_where": str(predicate),
            "partition_by": col,
            "partitions": parts,
        }
        if stats_cols:
            manifest["stats_cols"] = stats_cols
            manifest["stats"] = stats

    if not _create_exclusive(
        spark,
        f"{root}/{_VERSIONS}/v{new_version:08d}.json",
        json.dumps(manifest, sort_keys=True),
    ):
        raise ConcurrentWriteError(
            f"version {new_version} under {root} was committed by another "
            f"writer; this delete is invisible (orphan {data_rel}) — "
            f"re-read and retry"
        )
    _write_atomic(spark, f"{root}/{_LATEST}", str(new_version))
    return new_version


def merge_apply(
    target: DataFrame | None,
    source: DataFrame,
    keys: list[str],
    matched_clauses: list[tuple[str | None, str]],
    not_matched: str | None = "insert",
    not_matched_cond: str | None = None,
) -> DataFrame:
    """Delta-parity MERGE semantics as one relational plan (the pure
    transform behind ``versioned_merge``): full-outer join target to
    source on ``keys``, then per row the FIRST satisfied clause wins —

    - ``matched_clauses``: ordered ``(condition, action)`` pairs with
      action ``"update"`` (take the source row — UPDATE SET *) or
      ``"delete"``; ``condition`` is SQL seeing target columns as
      ``t.<col>`` and source columns as ``s.<col>`` (``None`` =
      unconditional). A NULL condition result is false (SQL semantics).
      A matched row satisfying no clause is kept unchanged.
    - ``not_matched``: ``"insert"`` (INSERT * for source-only rows,
      gated by ``not_matched_cond`` over ``s.<col>``) or ``None`` (drop
      source-only rows).
    - Target-only rows are always kept.

    Source must carry the target's columns (SET * / INSERT * semantics)
    and be key-unique (the Delta multiple-match precondition; a
    duplicate-key source applies an arbitrary winner per key, exactly
    like a nondeterministic Delta merge would error on).
    """
    for cond, act in matched_clauses:
        if act not in ("update", "delete"):
            raise ValueError(f"unknown matched action {act!r}")
    if not_matched not in ("insert", None):
        raise ValueError(f"unknown not_matched action {not_matched!r}")
    cols = source.columns if target is None else target.columns
    if target is None:
        if not_matched != "insert":
            return source.filter(F.lit(False))
        if not_matched_cond is not None:
            s_only = source.alias("s").filter(F.expr(not_matched_cond))
            return s_only.select(*[F.col(f"s.{c}").alias(c) for c in cols])
        return source

    t = target.withColumn("__te", F.lit(1)).alias("t")
    s = source.withColumn("__se", F.lit(1)).alias("s")
    on = None
    for k in keys:
        e = F.col(f"t.{k}") == F.col(f"s.{k}")
        on = e if on is None else (on & e)
    j = t.join(s, on, "full_outer")

    mc = None
    for cond, act in matched_clauses:
        c = F.lit(True) if cond is None else F.expr(cond)
        mc = F.when(c, F.lit(act)) if mc is None else mc.when(c, F.lit(act))
    matched_action = mc.otherwise(F.lit("keep")) if mc is not None else F.lit("keep")

    if not_matched == "insert":
        ins_gate = (
            F.lit(True) if not_matched_cond is None else F.expr(not_matched_cond)
        )
        unmatched_action = F.when(ins_gate, F.lit("insert")).otherwise(
            F.lit("drop")
        )
    else:
        unmatched_action = F.lit("drop")

    action = (
        F.when(F.col("t.__te").isNull(), unmatched_action)
        .when(F.col("s.__se").isNull(), F.lit("keep"))
        .otherwise(matched_action)
    )
    picked = [
        F.when(F.col("__act") == "keep", F.col(f"t.{c}"))
        .otherwise(F.col(f"s.{c}"))
        .alias(c)
        for c in cols
    ]
    return (
        j.withColumn("__act", action)
        .filter(~F.col("__act").isin("drop", "delete"))
        .select(*picked)
    )


def versioned_merge(
    spark: SparkSession,
    source: DataFrame,
    root: str,
    key: str | list[str],
    matched_clauses: list[tuple[str | None, str]],
    not_matched: str | None = "insert",
    not_matched_cond: str | None = None,
    expected_parent: "int | None | object" = "_unset",
) -> int:
    """Conditional-clause MERGE INTO the versioned table — Delta's
    ``WHEN MATCHED [AND cond] THEN UPDATE/DELETE`` +
    ``WHEN NOT MATCHED [AND cond] THEN INSERT`` on plain parquet
    (semantics in ``merge_apply``; ``versioned_upsert`` stays the
    unconditional last-write-wins fast path). Publishes a new version;
    history is untouched.

    Partitioned tables rewrite ONLY the touched partitions: the ones the
    source's rows land in plus the ones currently holding a matched key
    (found with one key semi-join over the table — the standard merge
    key-location pass), referencing every other partition from the
    parent manifest; a partition left EMPTY by deletes is dropped, and
    zone-map stats are recomputed for rewritten partitions and carried
    for referenced ones — the exact rewrite discipline of
    versioned_delete. Commit/CAS/crash contracts are versioned_upsert's
    (unique data dir, create-if-absent manifest, pointer moves last).
    """
    ks = [key] if isinstance(key, str) else list(key)
    cur = current_version(spark, root)
    if expected_parent != "_unset" and cur != expected_parent:
        raise ConcurrentWriteError(
            f"table at {root} is at version {cur}, writer expected "
            f"{expected_parent}; re-read and retry"
        )
    new_version = 1 if cur is None else cur + 1
    data_rel = f"data/v{new_version:08d}-{uuid.uuid4().hex[:8]}"
    data_dir = f"{root}/{data_rel}"
    m = _manifest(spark, root, cur) if cur is not None else {}
    stats_cols = m.get("stats_cols")

    if cur is None or "partitions" not in m:
        existing = read_versioned(spark, root, cur) if cur is not None else None
        merged = merge_apply(
            existing, source, ks, matched_clauses, not_matched, not_matched_cond
        )
        merged.write.mode("overwrite").parquet(data_dir)
        manifest = {
            "version": new_version,
            "parent": cur,
            "data": data_rel,
            "merge_on": ks,
            "n_rows": spark.read.parquet(data_dir).count(),
        }
        if stats_cols:
            manifest["stats_cols"] = list(stats_cols)
            manifest["stats"] = _collect_stats(
                spark.read.parquet(data_dir), None, stats_cols
            )
    else:
        col = m["partition_by"]
        cur_df = read_versioned(spark, root, cur)
        # the partitions the source's rows land in plus the ones holding
        # a matched key — two narrow distinct scans under ONE action (one
        # scheduling round trip, not two sequential collects)
        touched = sorted(
            {
                str(r[0])
                for r in source.select(col)
                .unionByName(
                    cur_df.join(
                        source.select(*ks).distinct(), ks, "left_semi"
                    ).select(col)
                )
                .distinct()
                .collect()
            }
        )
        prev_parts = dict(m["partitions"])
        parts = {p: o for p, o in prev_parts.items() if p not in touched}
        stats = {
            p: s for p, s in m.get("stats", {}).items() if p not in touched
        }
        owned = [p for p in touched if p in prev_parts]
        existing_touched = (
            _read_partitions(spark, root, prev_parts, only=owned, col=col)
            if owned
            else None
        )
        merged = merge_apply(
            existing_touched, source, ks, matched_clauses,
            not_matched, not_matched_cond,
        )
        survivors = sorted(
            str(r[0]) for r in merged.select(col).distinct().collect()
        )
        if survivors:
            merged.write.partitionBy(col).mode("overwrite").parquet(data_dir)
            for p in survivors:
                parts[p] = data_rel
            if stats_cols:
                stats.update(
                    _collect_stats(
                        spark.read.parquet(data_dir), col, stats_cols
                    )
                )
        manifest = {
            "version": new_version,
            "parent": cur,
            "data": data_rel,
            "merge_on": ks,
            "partition_by": col,
            "partitions": parts,
        }
        if stats_cols:
            manifest["stats_cols"] = list(stats_cols)
            manifest["stats"] = stats

    if not _create_exclusive(
        spark,
        f"{root}/{_VERSIONS}/v{new_version:08d}.json",
        json.dumps(manifest, sort_keys=True),
    ):
        raise ConcurrentWriteError(
            f"version {new_version} under {root} was committed by another "
            f"writer; this merge is invisible (orphan {data_rel}) — "
            f"re-read and retry"
        )
    _write_atomic(spark, f"{root}/{_LATEST}", str(new_version))
    return new_version


def _partition_file_stats(spark, path: str) -> tuple[int, int]:
    """(file_count, total_bytes) of data files directly under ``path``."""
    fs, jvm = _fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return 0, 0
    n, b = 0, 0
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if status.isFile() and not name.startswith(("_", ".")):
            n += 1
            b += status.getLen()
    return n, b


def compact_versioned(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 << 20,
    expected_parent: "int | None | object" = "_unset",
) -> int:
    """OPTIMIZE: republish the latest content with bin-packed files and
    return the new version (content-identical — readers, time travel and
    CDC are unaffected; the fragmented version's files stay until
    vacuum). A long-lived upsert table accretes one file set per batch;
    compaction is what keeps the scan planner's file count proportional
    to data size instead of batch count.

    The partitioned path inspects each partition's CURRENT file layout
    and rewrites only partitions holding more files than
    ``ceil(bytes / target_file_bytes)`` — the rest keep their owner
    directories untouched. Zone-map stats carry forward verbatim
    (content is identical by construction).
    """
    cur = current_version(spark, root)
    if expected_parent != "_unset" and cur != expected_parent:
        raise ConcurrentWriteError(
            f"table at {root} is at version {cur}, writer expected "
            f"{expected_parent}; re-read and retry"
        )
    if cur is None:
        raise FileNotFoundError(f"no published version under {root}")
    m = _manifest(spark, root, cur)
    new_version = cur + 1
    data_rel = f"data/v{new_version:08d}-{uuid.uuid4().hex[:8]}"
    data_dir = f"{root}/{data_rel}"

    if "partitions" not in m:
        from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.write import write_sized_parquet

        write_sized_parquet(
            read_versioned(spark, root, cur),
            data_dir,
            target_file_bytes=target_file_bytes,
        )
        manifest = {
            k: m[k] for k in ("n_rows", "stats_cols", "stats") if k in m
        }
        manifest.update(
            version=new_version, parent=cur, data=data_rel, compaction_of=cur
        )
    else:
        col = m["partition_by"]
        fragmented = []
        for p, owner in sorted(m["partitions"].items()):
            n_files, n_bytes = _partition_file_stats(
                spark, f"{root}/{owner}/{col}={p}"
            )
            ideal = max(1, -(-n_bytes // target_file_bytes))
            if n_files > ideal:
                fragmented.append((p, ideal))
        parts = dict(m["partitions"])
        if fragmented:
            values = [p for p, _ in fragmented]
            df = _read_partitions(
                spark, root, m["partitions"], only=values, col=col
            )
            # one shuffle keyed by partition value, sized per partition
            df.repartition(
                max(1, sum(i for _, i in fragmented)), F.col(col)
            ).write.partitionBy(col).mode("overwrite").parquet(data_dir)
            for p in values:
                parts[p] = data_rel
        manifest = {
            k: m[k] for k in ("stats_cols", "stats") if k in m
        }
        manifest.update(
            version=new_version,
            parent=cur,
            data=data_rel,
            partition_by=col,
            partitions=parts,
            compaction_of=cur,
        )

    if not _create_exclusive(
        spark,
        f"{root}/{_VERSIONS}/v{new_version:08d}.json",
        json.dumps(manifest, sort_keys=True),
    ):
        raise ConcurrentWriteError(
            f"version {new_version} under {root} was committed by another "
            f"writer; this compaction is invisible (orphan {data_rel}) — "
            f"re-read and retry"
        )
    _write_atomic(spark, f"{root}/{_LATEST}", str(new_version))
    return new_version


def rollback(spark: SparkSession, root: str, version: int) -> int:
    """Republish ``version``'s data as a NEW latest version (append-only
    history: the bad versions stay for audit)."""
    m = _manifest(spark, root, version)  # validates existence
    cur = current_version(spark, root)
    new_version = (cur or 0) + 1
    manifest = {
        "version": new_version,
        "parent": cur,
        "data": m["data"],  # shares the immutable data dir(s)
        "rollback_of": version,
    }
    # stats/stats_cols MUST carry over: versioned_upsert inherits the
    # zone-map config from the PARENT manifest, so dropping them here would
    # silently stop zone-map maintenance for every upsert after a rollback.
    for field in ("n_rows", "partition_by", "partitions", "stats", "stats_cols"):
        if field in m:
            manifest[field] = m[field]
    if not _create_exclusive(
        spark,
        f"{root}/{_VERSIONS}/v{new_version:08d}.json",
        json.dumps(manifest, sort_keys=True),
    ):
        raise ConcurrentWriteError(
            f"rollback lost the race for version {new_version} under "
            f"{root}; re-read and retry"
        )
    _write_atomic(spark, f"{root}/{_LATEST}", str(new_version))
    return new_version


def vacuum_versioned(
    spark: SparkSession, root: str, keep_last: int = 2,
    grace_seconds: float = 600.0,
) -> list[int]:
    """Delete data directories not referenced by the newest ``keep_last``
    versions (rollbacks share dirs — a dir survives while ANY retained
    version references it). Also sweeps CONCURRENCY ORPHANS: directories
    written by writers that lost the manifest race or crashed pre-commit,
    identified as unreferenced dirs whose claimed version number is
    already committed AND whose modification time is older than
    ``grace_seconds``. The age guard matters: a writer that read parent n
    while a concurrent writer commits n+1 is MID-WRITE to a dir claiming
    n+1 <= max_committed — sweeping it under the running job would turn
    the expected ConcurrentWriteError at commit time into an arbitrary
    task failure. Within the grace window such a writer either commits
    (dir becomes referenced) or loses the manifest race (dir goes quiet
    and ages past the window for the next vacuum). Manifests are kept for
    lineage. Returns the versions whose storage was reclaimed."""
    all_versions = versions(spark, root)
    if not all_versions:
        return []
    retained = all_versions[-keep_last:] if keep_last > 0 else []
    keep_dirs = set()
    for m in retained:
        keep_dirs.add(m["data"])
        keep_dirs.update(m.get("partitions", {}).values())
    fs, jvm = _fs(spark, root)
    reclaimed = []
    cutoff = len(all_versions) - keep_last if keep_last > 0 else len(all_versions)
    for m in all_versions[:cutoff]:
        if m["data"] in keep_dirs:
            continue
        p = jvm.org.apache.hadoop.fs.Path(f"{root}/{m['data']}")
        if fs.exists(p):
            fs.delete(p, True)
            reclaimed.append(m["version"])
    referenced = set(keep_dirs)
    for m in all_versions:
        referenced.add(m["data"])
        referenced.update(m.get("partitions", {}).values())
    max_committed = all_versions[-1]["version"]
    now_ms = __import__("time").time() * 1000.0
    ddir = jvm.org.apache.hadoop.fs.Path(f"{root}/data")
    if fs.exists(ddir):
        for status in fs.listStatus(ddir):
            name = status.getPath().getName()
            if f"data/{name}" in referenced or not name.startswith("v"):
                continue
            try:
                claimed = int(name[1:9])
            except ValueError:
                continue
            # Freshness must consider the WHOLE tree, not the dir's own
            # mtime: a partitioned in-flight write creates its partition
            # subdirectories early and then only touches files inside
            # them, so the top-level mtime goes stale while the write is
            # still running — sweeping on it would kill a live job that
            # merely outlasted the grace window.
            newest = _tree_max_mtime(fs, status)
            fresh = now_ms - newest < grace_seconds * 1000.0
            if claimed <= max_committed and not fresh:
                fs.delete(status.getPath(), True)
    return reclaimed


def _tree_max_mtime(fs, status) -> float:
    """Max modification time (ms) over a FileStatus and everything under
    it — the conservative 'was anything here touched recently?' signal
    the vacuum grace window needs."""
    newest = status.getModificationTime()
    if status.isDirectory():
        for child in fs.listStatus(status.getPath()):
            newest = max(newest, _tree_max_mtime(fs, child))
    return newest


def table_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
    keys: list[str] | None = None,
    key: str | list[str] | None = None,
) -> DataFrame:
    """CDC read over the version history: the change feed (insert/update/
    delete rows, ``operators/diff.table_diff`` schema) that transforms
    snapshot ``from_version`` into ``to_version`` (default: latest) —
    Delta's ``table_changes`` on plain parquet. Round-trip contract:
    ``apply_cdc(read(from), table_changes(from, to), key, order_by=[])
    == read(to)`` — replay the feed AUTHORITATIVELY (empty order_by:
    change rows win outright), because a rollback version carries OLDER
    order_by values than the state it replaces and a last-write-wins
    replay would ignore it. With a monotone history both replays agree
    (tests pin both). One full-outer join keyed on ``keys``."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.diff import table_diff

    ks = keys if keys is not None else ([key] if isinstance(key, str) else key)
    if not ks:
        raise ValueError("keys required")
    old = read_versioned(spark, root, from_version)
    new = read_versioned(spark, root, to_version)
    return table_diff(old, new, ks)
