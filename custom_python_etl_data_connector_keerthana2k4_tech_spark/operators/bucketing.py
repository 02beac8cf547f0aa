"""Bucketed (pre-shuffled) tables for co-located joins (SURVEY §4; the
100 TB checklist).

A join between two tables bucketed by the join key into the same bucket
count needs NO shuffle: each task reads matching bucket files from both
sides. For repeatedly-joined big tables (fact-to-fact joins AQE cannot
broadcast) this moves the shuffle from every query to a one-time write.
The test asserts the Exchange nodes actually disappear from the plan.

At 100 TB: bucket count should be sized so one bucket of the larger table
fits an executor's memory (e.g. 10 TB fact / 4096 buckets ≈ 2.5 GB); both
sides must agree on count and key. Bucketing metadata lives in the session
catalog (``saveAsTable``) — path-based parquet reads do not preserve it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    num_buckets: int,
    sort_by: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets additionally removes the sort from sort-merge
    joins on the bucket key (Exchange AND Sort elided).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    writer = df.write.bucketBy(num_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.mode("overwrite").format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — planned
    without a shuffle (verify with .explain: no Exchange below the join)."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on, how)
