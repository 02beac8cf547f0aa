"""Optional-dependency coverage: these tests SKIP in the stock image (no
PIL, no delta-spark) and run for real wherever the dependency exists —
so the gated branches in multimodal/ops.py and operators/upsert.py are
exercised instead of permanently excluded. The in-image fallbacks
(synthetic SGMM decode, upsert_parquet) are covered by
tests/test_multimodal.py and tests/test_upsert.py.
"""

from __future__ import annotations

import pytest


def test_pil_real_decode_path(spark):
    """With PIL installed, decode_assets must decode a REAL image payload
    (dimensions + mean from the actual pixels), while synthetic SGMM
    payloads still fall through to the fixture parser."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image
    from pyspark.sql import functions as F

    from custom_python_etl_data_connector_keerthana2k4_tech_spark.multimodal.ops import (
        assets_from_documents,
        decode_assets,
    )

    buf = io.BytesIO()
    Image.new("L", (8, 4), color=200).save(buf, format="PNG")
    png = buf.getvalue()

    docs = spark.createDataFrame(
        [(1, "synthetic text body", 19)], "doc_id long, text string, n_chars long"
    )
    synthetic = assets_from_documents(docs)
    real = synthetic.limit(1).selectExpr(
        "asset_id", "'image' AS modality", "payload", "meta"
    ).withColumn("payload", F.lit(png))
    # decode both shapes through the same stage
    out_real = decode_assets(real).collect()[0]
    assert (out_real["decoded_width"], out_real["decoded_height"]) == (8, 4)
    assert out_real["mean_value"] == 200
    assert out_real["decode_error"] is None
    out_syn = decode_assets(synthetic).collect()[0]
    assert out_syn["decode_error"] is None  # SGMM fallback still works


def test_delta_upsert_path(tmp_path):
    """With delta-spark installed, upsert_delta must converge to
    last-write-wins via MERGE (its own session: Delta needs SQL extensions
    the shared fixture session doesn't load)."""
    delta = pytest.importorskip("delta")
    from pyspark.sql import SparkSession

    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.upsert import upsert_delta

    builder = (
        SparkSession.builder.master("local[2]")
        .appName("delta-gate-test")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = delta.configure_spark_with_delta_pip(builder).getOrCreate()
    try:
        path = str(tmp_path / "dt")
        b1 = spark.createDataFrame(
            [("a", "v1", 1), ("b", "w1", 1)], "k string, v string, ts long"
        )
        b2 = spark.createDataFrame(
            [("a", "v2", 2), ("c", "x1", 1)], "k string, v string, ts long"
        )
        upsert_delta(spark, b1, path, "k", ["ts"])
        upsert_delta(spark, b2, path, "k", ["ts"])
        out = {r["k"]: r["v"] for r in spark.read.format("delta").load(path).collect()}
        assert out == {"a": "v2", "b": "w1", "c": "x1"}
    finally:
        spark.stop()
