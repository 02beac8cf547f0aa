"""Incremental view maintenance for grouped aggregates.

The warehouse capability that turns the versioned-table CDC feed
(operators/versioned.table_changes / operators/diff.table_diff_wide) into
cheap materialized-view refreshes: a groupBy().agg(count, sums) view over
a 100 TB base table is maintained from each batch's CHANGE FEED alone —
cost proportional to the delta, never a base rescan.

Algebra (the standard delta rules for distributive aggregates):

- insert  -> +1 count, +new values into the NEW row's group
- delete  -> -1 count, -old values from the OLD row's group
- update  -> both of the above (the group itself may change: the old
             image leaves its group, the new image enters its group —
             handled for free by emitting two signed contributions)

count/sum are exactly maintainable (ints/decimals stay exact; doubles are
exact only as exact adds, so prefer decimal metrics for bit-stable
refresh). avg derives as sum/count downstream. min/max are NOT
incrementally maintainable under deletes without auxiliary state — out of
scope by design, matching every production IVM engine's distributive-only
fast path.

Plan shape: one narrow signed-contribution projection of the feed, one
map-side-combinable aggregate over it (bounded by touched groups), and one
full-outer hash join against the previous view keyed on the group — the
view refresh shuffles the DELTA, not the base.

The reference recomputes everything per run and has no aggregate surface
at all (/root/reference/etl_connector.py:53-242, SURVEY §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Column name of the maintained row count inside the view.
COUNT_COL = "n_rows"


def group_agg_view(base: DataFrame, group_cols: list[str], sum_cols: list[str]) -> DataFrame:
    """The materialized view this module maintains: per-group row count +
    sums. Use this for the initial (full) build; refresh with
    ``incremental_group_agg``."""
    return base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias(COUNT_COL),
        *[F.sum(c).alias(c) for c in sum_cols],
    )


def incremental_group_agg(
    prev_view: DataFrame,
    changes_wide: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Refresh ``group_agg_view`` from a ``table_diff_wide`` change feed.

    Contract (tests/test_ivm.py):
    ``incremental_group_agg(group_agg_view(old), table_diff_wide(old, new),
    ...) == group_agg_view(new)`` exactly, including groups that appear,
    disappear, or are migrated into by updates.

    Metric columns are assumed non-NULL (coalesce upstream): a group whose
    metric values are ALL NULL would sum to 0 here but NULL in a full
    rebuild — the one divergence of the delta algebra.
    """
    def _signed(image: str, sign: int, ops: list[str]) -> DataFrame:
        return changes_wide.filter(F.col("op").isin(ops)).select(
            *[F.col(image).getField(g).alias(g) for g in group_cols],
            F.lit(sign).cast("long").alias("__dn"),
            *[
                (F.lit(sign) * F.col(image).getField(c)).alias(c)
                for c in sum_cols
            ],
        )

    neg = _signed("old_image", -1, ["delete", "update"])
    pos = _signed("new_image", 1, ["insert", "update"])
    delta = (
        neg.unionByName(pos)
        .groupBy(*group_cols)
        .agg(
            F.sum("__dn").alias("__dn"),
            *[F.sum(c).alias(f"__d_{c}") for c in sum_cols],
        )
    )
    merged = prev_view.join(delta, group_cols, "full_outer").select(
        *group_cols,
        (
            F.coalesce(F.col(COUNT_COL), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).cast("long").alias(COUNT_COL),
        *[
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(c)
            for c in sum_cols
        ],
    )
    # a group whose count reaches 0 has no surviving base rows: drop it so
    # the refreshed view equals the full rebuild bit-for-bit
    return merged.filter(F.col(COUNT_COL) > 0)
