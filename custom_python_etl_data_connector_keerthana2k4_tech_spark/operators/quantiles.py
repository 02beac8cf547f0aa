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
   ``collect_limit`` rows the bucket is recursively re-bucketed, and when
   refinement bottoms out (ulp-wide range / _MAX_DEPTH skew levels) the
   degenerate path aggregates to (value, count) pairs or bisects on value
   — the driver NEVER materializes more than collect_limit rows, even
   against an adversarial distribution;
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

#: Range-refinement recursion cap; past it, _order_stats_degenerate takes
#: over with distinct-value aggregation / value bisection (still bounded).
_MAX_DEPTH = 3


def _order_stats_degenerate(
    df: DataFrame, col: str, ranks: list[int], offset: int, collect_limit: int
) -> dict[int, float]:
    """Exact order stats when range refinement has bottomed out (ulp-wide
    range or _MAX_DEPTH consecutive ~buckets-fold skew refinements),
    with driver memory still bounded by ``collect_limit``:

    - one (value, count) aggregation when the range's DISTINCT count fits
      the limit — rank arithmetic on cumulative counts, no raw rows;
    - otherwise per-rank value-range bisection (_rank_value_bisect).
    """
    n_distinct = df.select(F.count_distinct(col).alias("d")).first()["d"]
    if n_distinct <= collect_limit:
        pairs = sorted(
            (r[0], r[1])
            for r in df.groupBy(col).agg(F.count("*").alias("n")).collect()
        )
        out: dict[int, float] = {}
        i, cum = 0, offset
        for rk in sorted(ranks):
            while cum + pairs[i][1] <= rk:
                cum += pairs[i][1]
                i += 1
            out[rk] = pairs[i][0]
        return out
    return {
        rk: _rank_value_bisect(df, col, rk - offset, collect_limit) for rk in ranks
    }


def _rank_value_bisect(
    df: DataFrame, col: str, rank: int, collect_limit: int
) -> float:
    """Exact ``rank``-th smallest (0-based) value of df[col] by value-range
    bisection: each step one count/min/max aggregate plus one count-below
    job; collect only once the candidate range holds <= collect_limit rows.
    Converges in O(log(value range in ulps)) full-parallel jobs — driver
    memory is O(collect_limit) regardless of the distribution.
    """
    cur = df
    rk = rank
    while True:
        s = cur.agg(
            F.count(col).alias("n"), F.min(col).alias("mn"), F.max(col).alias("mx")
        ).first()
        n, mn, mx = s["n"], s["mn"], s["mx"]
        if mn == mx:
            return float(mn)
        if n <= collect_limit:
            return float(sorted(r[0] for r in cur.select(col).collect())[rk])
        mid = (float(mn) + float(mx)) / 2.0
        if mid <= float(mn) or mid >= float(mx):
            # adjacent doubles: the arithmetic midpoint rounds to one of the
            # endpoints (either direction under ties-to-even — e.g.
            # mn=1+2^-52, mx=1+2^-51 rounds UP to mx, where a mid==mx split
            # would never shrink the range and the loop would spin Spark
            # jobs forever). Split {mn} | (mn, mx] instead: both sides are
            # nonempty because mn < mx, so every step makes progress.
            mid = float(mn)
        n_low = cur.filter(F.col(col) <= mid).count()
        if rk < n_low:
            cur = cur.filter(F.col(col) <= mid)
        else:
            cur = cur.filter(F.col(col) > mid)
            rk -= n_low


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
