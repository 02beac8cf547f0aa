"""Round-2 operator semantics: PageRank vs a dense NumPy power iteration,
sweep-line and skyline invariants, and incremental-view merge losslessness
(the oracle-paired queries themselves are covered by tests/test_oracle.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import queries
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round2 import pagerank

_QS = queries()


def test_pagerank_matches_dense_power_iteration(spark):
    rows = [
        (1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1),  # triangle
        (3, 4), (4, 3), (4, 5), (5, 4),                  # tail
    ]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=20).collect()}

    nodes = sorted({n for e in rows for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    adj = np.zeros((len(nodes), len(nodes)))
    for s, d in rows:
        adj[idx[s], idx[d]] = 1.0
    out_deg = adj.sum(axis=1, keepdims=True)
    p = adj / out_deg
    rank = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(20):
        rank = (1 - 0.85) / len(nodes) + 0.85 * (p.T @ rank)

    assert set(got) == set(nodes)
    for n in nodes:
        assert abs(got[n] - rank[idx[n]]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9  # conserved mass (no dangling)


def test_pagerank_is_deterministic_across_partitionings(spark):
    rows = [(i, (i * 7) % 23) for i in range(23) if i != (i * 7) % 23]
    e1 = spark.createDataFrame(rows, "src long, dst long").repartition(1)
    e8 = spark.createDataFrame(rows, "src long, dst long").repartition(8)
    r1 = {r["node"]: r["rank"] for r in pagerank(e1, iterations=8).collect()}
    r8 = {r["node"]: r["rank"] for r in pagerank(e8, iterations=8).collect()}
    assert r1 == r8  # decimal-summed contributions: bit-identical, not just close


def test_order_concurrency_sweep_closes_to_zero(spark, sf_dir):
    out = _QS["q118_order_concurrency"](spark, sf_dir).orderBy("d").collect()
    assert out[-1]["open_orders"] == 0  # every +1 has its -1: the sweep closes
    assert all(r["open_orders"] >= 0 for r in out)
    assert max(r["open_orders"] for r in out) > 0


def test_skyline_dominance_semantics(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    frontier = {
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in _QS["q119_skyline_parts"](spark, sf_dir).collect()
    }
    pts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in load(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in pts
        )

    for p in pts:
        assert (p in frontier) == (not dominated(p)), p


def test_incremental_merge_equals_direct_rollup(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    merged = _QS["q124_incremental_view_merge"](spark, sf_dir)
    direct = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,10)"))
            .cast("double")
            .alias("total_spend"),
        )
    )
    assert merged.exceptAll(direct).isEmpty() and direct.exceptAll(merged).isEmpty()


def test_markov_probabilities_normalize(spark, sf_dir):
    t = _QS["q122_markov_transitions"](spark, sf_dir)
    sums = t.groupBy("src").agg(F.sum("prob").alias("p")).collect()
    assert sums and all(abs(r["p"] - 1.0) < 1e-9 for r in sums)


def test_chunking_covers_every_token_with_overlap(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    chunks = _QS["q131_doc_chunking"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: [t for t in r["text"].split() if t]
        for r in load(spark, sf_dir, "documents").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {d for d, toks in docs.items() if toks}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        toks = docs[doc_id]
        assert all(r["n_tokens"] <= 50 for r in rows)
        covered = set()
        for r in rows:
            start = r["chunk_id"] * 40
            assert r["chunk_text"].split() == toks[start : start + 50]
            covered.update(range(start, min(start + 50, len(toks))))
        assert covered == set(range(len(toks)))  # no token falls between chunks


def test_pit_join_picks_version_valid_at_event_time(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    out = _QS["q128_pit_interval_join"](spark, sf_dir).collect()
    events = load(spark, sf_dir, "events").collect()
    signups: dict[int, list] = {}
    for r in events:
        if r["event_type"] == "signup":
            signups.setdefault(r["user_id"], []).append((r["ts"], r["event_id"]))
    for row in out:
        cands = [
            (ts, eid)
            for ts, eid in signups.get(row["user_id"], [])
            if ts <= row["ts"]
        ]
        if not cands:
            assert row["version_id"] is None
        else:
            latest_ts = max(ts for ts, _ in cands)
            expect_vid = max(eid for ts, eid in cands if ts == latest_ts)
            assert row["version_id"] == expect_vid, row
