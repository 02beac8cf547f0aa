"""q260_two_hop_reach path equivalence: the dense packed-bitset path
(GraphBLAS-style broadcast adjacency) and the distributed neighbor-array
fallback must produce identical exact counts.

Reference has no graph surface (/root/reference/etl_connector.py:53-242).
"""

from __future__ import annotations

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import round6


def _rows(df):
    return sorted(
        (r["part"], r["degree"], r["two_hop_only"]) for r in df.collect()
    )


def test_dense_and_fallback_paths_agree(spark, sf_dir, monkeypatch):
    dense = _rows(round6.q260_two_hop_reach(spark, sf_dir))
    monkeypatch.setattr(round6, "TWO_HOP_DENSE_DOMAIN_LIMIT", 0)
    fallback = _rows(round6.q260_two_hop_reach(spark, sf_dir))
    assert dense == fallback
    assert len(dense) > 0
    # strictly-two-hop never includes self or direct neighbors, so the
    # count is bounded by (nodes - 1 - degree)
    n = len(dense)
    assert all(t <= n - 1 - d for _, d, t in dense)
