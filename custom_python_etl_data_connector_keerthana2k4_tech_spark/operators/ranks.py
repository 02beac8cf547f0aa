"""Distributed EXACT global ranks / ntile without a single-partition sort.

An unpartitioned ``Window.orderBy(...)`` funnels the whole input through
ONE task (Spark itself warns ``WindowExec: No Partition Defined``). That
is fine over an aggregate-sized frame (months, thresholds, a bounded
vocabulary) but fatal over an entity-grain one (customers, tokens, users)
at 100 TB. This module computes exact global row numbers the way every
distributed sort engine does — Spark's own global ``ORDER BY`` is the
same range-partition + local-sort plan:

1. ``repartitionByRange`` on the sort key: partition ids are totally
   ordered by key range, and this shuffle is the ONLY data movement;
2. ``sortWithinPartitions``: fully parallel local sorts;
3. an Arrow-batched ``mapInPandas`` pass numbers rows *within* each
   partition (batches arrive in sorted order, so a running counter per
   partition suffices — no extra shuffle, unlike a
   ``Window.partitionBy(spark_partition_id())`` which would re-shuffle);
4. per-partition row counts (#partitions rows, aggregate-sized) collect
   to the driver and cumulative offsets go back as a literal map:
   ``global_rank = offset[partition] + local_row_number``.

The result is bit-identical to ``row_number() OVER (ORDER BY ...)`` /
``ntile(k)`` — ties included, provided the caller's ordering is total
(add a unique tie-break column, exactly as you must for a deterministic
window) — while every stage stays parallel. q96 (customer RFM quartiles)
and q106 (vocabulary ids) build on this; their oracle SQL keeps the plain
window formulation as the independent cross-check.

The reference has no ranking surface at all
(/root/reference/etl_connector.py:53-242, SURVEY §2.2).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _ranked(
    df: DataFrame, order: list[Column], num_partitions: int | None
) -> tuple[DataFrame, int]:
    """df + ``__grank`` (exact 1-based global rank under ``order``), and
    the total row count (free: the sum of the per-partition counts)."""
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_part, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
    )
    schema = StructType(
        part.schema.fields + [StructField("__rn", LongType(), False)]
    )

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rn = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__rn"] = np.arange(rn + 1, rn + 1 + len(pdf), dtype=np.int64)
            rn += len(pdf)
            yield pdf

    ranked = part.mapInPandas(number, schema=schema).persist()
    counts = {
        r["__pid"]: r["n"]
        for r in ranked.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    if not counts:  # empty input
        empty = ranked.drop("__pid", "__rn").withColumn(
            "__grank", F.lit(None).cast("long")
        )
        return empty, 0
    offsets: dict[int, int] = {}
    cum = 0
    for pid in sorted(counts):
        offsets[pid] = cum
        cum += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid, off in sorted(offsets.items()) for x in (pid, off)]
    )
    out = ranked.withColumn(
        "__grank", (off_map[F.col("__pid")] + F.col("__rn")).cast("long")
    ).drop("__pid", "__rn")
    return out, cum


def with_global_rank(
    df: DataFrame,
    order: list[Column],
    out: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order)`` as a fully parallel plan.

    ``order`` must be a total order (include a unique tie-break) for the
    ranks to be deterministic — the same requirement the window form has.
    """
    ranked, _ = _ranked(df, order, num_partitions)
    return ranked.withColumnRenamed("__grank", out)


def with_ntile(
    df: DataFrame,
    order: list[Column],
    k: int,
    out: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY order)`` as a fully parallel plan.

    Exact SQL ntile semantics: with n rows, the first ``n mod k`` buckets
    hold ``n div k + 1`` rows, the rest ``n div k`` — reproduced from the
    global rank with k-1 literal boundary comparisons (no second pass).
    """
    ranked, n = _ranked(df, order, num_partitions)
    base, rem = divmod(n, k)
    boundaries = [i * base + min(i, rem) for i in range(1, k)]
    bucket = F.lit(1)
    for b in boundaries:
        bucket = bucket + (F.col("__grank") > F.lit(b)).cast("int")
    return ranked.withColumn(out, bucket.cast("long")).drop("__grank")


def with_running_sums(
    df: DataFrame,
    order: list[Column],
    sums: dict[str, str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running sums under a total order — the parallel form of
    ``sum(v) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING)``.

    ``sums`` maps output column -> source column. Plan: range-repartition
    on the key, per-range cumulative windows (partitioned by the range id,
    so every sort and sum is parallel and the arithmetic stays in Spark —
    exact for BIGINT/DECIMAL, unlike a Python-side refold), then each
    range's exclusive prefix total (one row per range, aggregate-sized)
    comes back as a broadcast literal map. Two shuffles of the frame
    instead of the window form's single-task funnel. Like the window
    form, ``order`` must be total for deterministic output.
    """
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_part, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    part = part.persist()
    from pyspark.sql import Window

    w = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.select(
        "*", *[F.sum(src).over(w).alias(out) for out, src in sums.items()]
    )
    totals = (
        part.groupBy("__pid")
        .agg(*[F.sum(src).alias(out) for out, src in sums.items()])
        .collect()
    )
    if not totals:
        return local.drop("__pid")
    by_pid = sorted((r["__pid"], r) for r in totals)
    out_df = local
    for out in sums:
        dtype = local.schema[out].dataType
        run = None
        offsets = []
        for pid, r in by_pid:
            offsets.append((pid, run))
            v = r[out]
            if v is not None:
                run = v if run is None else run + v
        entries = [
            x
            for pid, off in offsets
            if off is not None
            for x in (F.lit(pid), F.lit(off).cast(dtype))
        ]
        if entries:
            # try_element_at: ranges with no preceding non-null total have
            # no map entry (offset 0); ANSI element_at would raise there
            off_col = F.try_element_at(F.create_map(*entries), F.col("__pid"))
            # coalesce the local cumsum to 0 under a non-null offset: a row
            # whose range-local prefix is all-NULL still has the preceding
            # ranges' sum, exactly as the window form would report
            out_df = out_df.withColumn(
                out,
                F.when(
                    off_col.isNotNull(),
                    F.coalesce(F.col(out), F.lit(0).cast(dtype)) + off_col,
                ).otherwise(F.col(out)),
            )
    return out_df.drop("__pid")


def with_running_max(
    df: DataFrame,
    order: list[Column],
    maxes: dict[str, str],
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Running maxima under a total order — the parallel form of
    ``max(v) OVER (ORDER BY order ROWS BETWEEN UNBOUNDED PRECEDING AND
    {CURRENT ROW | 1 PRECEDING})``.

    Same plan as ``with_running_sums`` (range repartition + per-range
    windows + broadcast offsets) with max-merge offsets: each range's
    prefix is ``greatest(local prefix max, max of all PRECEDING ranges'
    totals)`` — max is associative and NULL-skipping on both sides, so
    the result matches the window form exactly, including the
    all-NULL-prefix case. ``inclusive=False`` gives the exclusive frame
    (skyline/prefix-dominance shape, q119)."""
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_part, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    part = part.persist()
    from pyspark.sql import Window

    upper = Window.currentRow if inclusive else -1
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    local = part.select(
        "*", *[F.max(src).over(w).alias(out) for out, src in maxes.items()]
    )
    totals = (
        part.groupBy("__pid")
        .agg(*[F.max(src).alias(out) for out, src in maxes.items()])
        .collect()
    )
    if not totals:
        return local.drop("__pid")
    by_pid = sorted((r["__pid"], r) for r in totals)
    out_df = local
    for out in maxes:
        dtype = local.schema[out].dataType
        run = None
        offsets = []
        for pid, r in by_pid:
            offsets.append((pid, run))
            v = r[out]
            if v is not None:
                run = v if run is None or v > run else run
        entries = [
            x
            for pid, off in offsets
            if off is not None
            for x in (F.lit(pid), F.lit(off).cast(dtype))
        ]
        if entries:
            off_col = F.try_element_at(F.create_map(*entries), F.col("__pid"))
            # greatest() skips NULLs on either side, exactly like the
            # window max over a partially-NULL prefix
            out_df = out_df.withColumn(out, F.greatest(F.col(out), off_col))
    return out_df.drop("__pid")
