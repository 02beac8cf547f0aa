"""registry.table_lineage: plan-derived table dependencies per query.

Reference parity: the reference's single hard-coded data dependency
(/root/reference/etl_connector.py:94) vs a real metadata surface.
"""

from __future__ import annotations

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import table_lineage


def test_lineage_matches_known_dependencies(spark, sf_dir):
    lin = table_lineage(
        spark,
        sf_dir,
        [
            "q01_pricing_summary",
            "q61_regional_revenue",
            "q284_readability_profile",
            "q46_cosine_topk",
            "q285_target_encoding",
        ],
    )
    assert lin["q01_pricing_summary"] == ["lineitem"]
    assert lin["q61_regional_revenue"] == [
        "customer",
        "lineitem",
        "nation",
        "orders",
        "region",
        "supplier",
    ]
    assert lin["q284_readability_profile"] == ["documents"]
    assert lin["q46_cosine_topk"] == ["embeddings"]
    assert lin["q285_target_encoding"] == ["customer", "orders"]
