"""Distributed EXACT quantiles without a global sort or a single-node
value buffer.

Spark's built-in exact ``percentile`` UDAF buffers every value in the
aggregation state and merges the per-partition buffers on one thread —
at fact scale that is the slowest operator in the suite (and at 100 TB it
is simply not runnable). This module computes the same
``quantile_cont``-exact answers with the classic two-phase range-bucket
algorithm used by distributed sort/quantile engines:

1. one narrow scan: count / min / max;
2. one map-side-combinable scan: row counts per value-range bucket
   (default 1024 buckets — the shuffle carries <= buckets rows);
3. the driver locates which buckets contain the O(len(probs)) needed
   order statistics from the cumulative bucket counts;
4. one pushed-down-filter scan collects ONLY rows in those buckets
   (~n/buckets rows each); if a skewed bucket would collect more than
   ``collect_limit`` rows the bucket is recursively re-bucketed, so the
   driver never materializes more than a bounded candidate set;
5. exact order statistics + linear interpolation
   (lo + (hi-lo)*frac — the same arithmetic DuckDB's quantile_cont and
   Spark's percentile use, so results are bit-comparable).

Every scan is a full-parallel column scan; no stage funnels the data
through one task. The reference has no statistics surface at all
(/root/reference/etl_connector.py:53-242, SURVEY §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _order_stats(
    df: DataFrame,
    col: str,
    ranks: list[int],
    lo: float,
    hi: float,
    offset: int,
    buckets: int,
    collect_limit: int,
    depth: int,
) -> dict[int, float]:
    """Exact values at the given global 0-based ranks of df[col] sorted
    ascending, where df holds only values in [lo, hi] and ``offset`` rows
    precede it globally. Recursive range refinement on skewed buckets."""
    if not ranks:
        return {}
    width = (hi - lo) / buckets
    if width <= 0 or depth >= _MAX_DEPTH:
        # degenerate range (ulp-wide) or deep skew: collect_limit still
        # applies — aggregate to distinct values / bisect, never an
        # unbounded raw-row collect (an adversarial distribution can pack
        # any number of rows into an epsilon-wide range)
        return _order_stats_degenerate(df, col, ranks, offset, collect_limit)
    bucket = F.greatest(
        F.lit(0),
        F.least(
            F.floor((F.col(col) - F.lit(lo)) / F.lit(width)),
            F.lit(buckets - 1),
        ),
    ).cast("int")
    counts = dict(
        df.groupBy(bucket.alias("b")).agg(F.count("*").alias("n")).collect()
    )
    cum = offset
    bucket_offsets: dict[int, int] = {}
    for b in range(buckets):
        bucket_offsets[b] = cum
        cum += counts.get(b, 0)
    import bisect

    nonempty = [b for b in range(buckets) if counts.get(b, 0) > 0]
    starts = [bucket_offsets[b] for b in nonempty]
    by_bucket: dict[int, list[int]] = {}
    for rk in ranks:
        b = nonempty[bisect.bisect_right(starts, rk) - 1]
        by_bucket.setdefault(b, []).append(rk)
    out: dict[int, float] = {}
    for b, rks in by_bucket.items():
        b_lo = lo + b * width
        b_hi = lo + (b + 1) * width if b < buckets - 1 else hi
        sub = df.filter(
            (bucket == F.lit(b))
        )
        if counts[b] > collect_limit:
            out.update(
                _order_stats(
                    sub,
                    col,
                    rks,
                    b_lo,
                    b_hi,
                    bucket_offsets[b],
                    buckets,
                    collect_limit,
                    depth + 1,
                )
            )
        else:
            vals = sorted(r[0] for r in sub.select(col).collect())
            for rk in rks:
                out[rk] = vals[rk - bucket_offsets[b]]
    return out


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    buckets: int = 1024,
    collect_limit: int = 4_000_000,
) -> list[float]:
    """quantile_cont-exact quantiles of ``df[col]`` at ``probs``.

    Returns driver-side floats (use as literals / broadcast cutoffs).
    Three full-parallel scans; driver state is O(buckets + collected
    candidate rows), never the column.
    """
    stats = df.agg(
        F.count(col).alias("n"), F.min(col).alias("lo"), F.max(col).alias("hi")
    ).collect()[0]
    n, lo, hi = stats["n"], stats["lo"], stats["hi"]
    if n == 0:
        return [float("nan")] * len(probs)
    if n == 1 or lo == hi:
        return [float(lo)] * len(probs)
    ranks: set[int] = set()
    for p in probs:
        h = (n - 1) * p
        ranks.add(int(h))
        ranks.add(min(int(h) + 1, n - 1))
    clean = df.select(col).filter(F.col(col).isNotNull())
    stats_at = _order_stats(
        clean, col, sorted(ranks), float(lo), float(hi), 0, buckets,
        collect_limit, 0,
    )
    out = []
    for p in probs:
        h = (n - 1) * p
        lo_rk = int(h)
        hi_rk = min(lo_rk + 1, n - 1)
        frac = h - lo_rk
        v_lo, v_hi = stats_at[lo_rk], stats_at[hi_rk]
        out.append(v_lo + (v_hi - v_lo) * frac)
    return out
