"""Multi-pass sorted-neighborhood candidate generation (Hernandez &
Stolfo 1995), the production form of q355's single-pass SNM: each pass
sorts the corpus by a different key and pairs every row with its ``w``
predecessors; the union of passes recovers near-dup pairs that any single
sort order separates (the known SNM false-negative class).

Scale (100 TB): each pass is one range-shuffle + linear window over
bounded blocks — O(n log n) per pass, never candidate mining or an
all-pairs join; ``p`` passes cost ``p`` sorted scans, and the candidate
volume is at most ``p * w * n`` rows before dedup. Blocks keep the window
partitioned (no single-task global sort); pairs straddling a block
boundary within one pass are exactly what the other passes' rotated keys
recover.

Pair semantics: inside a duplicate CLUSTER of m documents, adjacency
proposes the ~m-1 chain pairs, not all m(m-1)/2 transitive pairs — by
design. Dedup consumers verify the chain pairs and run connected
components (operators/dedup.near_dedup) to recover full clusters, so
chain recall, not pair recall, is the operative metric.

The reference has no dedup surface at all (complete operator inventory:
/root/reference/etl_connector.py:53-242, SURVEY §2.1-2.2); this is a
north-star extension component (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def snm_candidates(
    df: DataFrame,
    id_col: str,
    passes: list[tuple[Column, Column]],
    window: int = 2,
) -> DataFrame:
    """Candidate pairs from multi-pass sorted-neighborhood blocking.

    ``passes`` is a list of ``(block_expr, key_expr)``: per pass, rows
    sort by ``key_expr`` inside ``block_expr`` partitions and each row
    pairs with its ``window`` predecessors. Returns distinct
    ``(id_a, id_b)`` with ``id_a < id_b`` plus ``n_passes`` — how many
    passes independently proposed the pair (a cheap match-confidence
    prior: pairs adjacent under several orderings are likelier dups).
    """
    per_pass = []
    for pass_id, (block_expr, key_expr) in enumerate(passes):
        base = df.select(
            F.col(id_col).alias("__id"),
            block_expr.alias("__blk"),
            key_expr.alias("__key"),
        )
        win = Window.partitionBy("__blk").orderBy("__key", "__id")
        lags = base.select(
            "__id",
            *[F.lag("__id", i).over(win).alias(f"__p{i}") for i in range(1, window + 1)],
        )
        for i in range(1, window + 1):
            per_pass.append(
                lags.filter(F.col(f"__p{i}").isNotNull()).select(
                    F.least("__id", f"__p{i}").alias("id_a"),
                    F.greatest("__id", f"__p{i}").alias("id_b"),
                    F.lit(pass_id).alias("pass_id"),
                )
            )
    out = per_pass[0]
    for frame in per_pass[1:]:
        out = out.unionAll(frame)
    return (
        out.distinct()
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_passes"))
    )


def snm_text_passes(text_col: str = "text", lang_col: str = "lang") -> list[tuple[Column, Column]]:
    """Three rotated sort keys for document near-dup: canonical sorted
    word set (exact-set twins adjacent), the reversed canonical string
    (suffix-similar docs adjacent — recovers pairs a differing FIRST
    word separates), and size-within-language (length-similar docs
    adjacent). Blocks = (lang, 1-char key prefix) keep every pass's
    window partitioned."""
    words = F.array_sort(
        F.array_distinct(F.filter(F.split(F.lower(F.col(text_col)), " +"), lambda w: w != ""))
    )
    ckey = F.array_join(words, " ")
    rkey = F.reverse(ckey)
    size_key = F.format_string("%08d", F.size(words))
    lang = F.col(lang_col)
    return [
        (F.concat_ws("|", lang, F.substring(ckey, 1, 1)), ckey),
        (F.concat_ws("|", lang, F.substring(rkey, 1, 1)), rkey),
        # size pass: blocks bucket by size/64 so window partitions stay
        # bounded; bucket-edge neighbors are the other passes' job
        (F.concat_ws("|", lang, (F.size(words) / 64).cast("int")), size_key),
    ]
