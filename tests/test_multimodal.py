"""Multimodal column plumbing (SURVEY §2.3): binary payloads, Arrow-batched
decode, feature extraction, frame sampling."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.multimodal import (
    ASSET_SCHEMA,
    FEATURE_DIM,
    assets_from_documents,
    decode_assets,
    extract_features,
    sample_frames,
)
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    return assets_from_documents(load(spark, sf_dir, "documents").limit(60))


def test_asset_schema(assets):
    # simpleString drops nullability, which legitimately tightens for
    # computed columns (including nested struct fields)
    assert assets.schema.simpleString() == ASSET_SCHEMA.simpleString()
    mods = {r.modality for r in assets.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_decode_roundtrip(spark, assets):
    decoded = decode_assets(assets)
    rows = decoded.collect()
    assert all(r.decode_error is None for r in rows)
    for r in rows:
        assert r.decoded_width == r.meta.width  # header round-trips
        assert r.decoded_height == r.meta.height
        assert 0 <= r.mean_value <= 255


def test_decode_dead_letter(spark):
    """Unknown format -> per-record error column, not a job failure
    (reference R7 dead-letter semantics, etl_connector.py:199-202)."""
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"JPEG-not-really"), None)], ASSET_SCHEMA
    )
    row = decode_assets(bad).first()
    assert row.decode_error is not None and "decodable" in row.decode_error
    assert row.decoded_width is None


def test_feature_extraction_deterministic(spark, assets):
    f1 = {r.asset_id: r.feature for r in extract_features(assets).collect()}
    f2 = {r.asset_id: r.feature for r in extract_features(assets).collect()}
    assert f1 == f2
    assert all(len(v) == FEATURE_DIM for v in f1.values())
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)


def test_frame_sampling(assets):
    frames = sample_frames(assets, every_n=10)
    rows = frames.collect()
    assert rows and all(r.frame_idx % 10 == 0 for r in rows)
    per_asset = frames.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")
    )
    for r in per_asset.collect():
        assert r.n >= 1 and r.mx <= 300


def test_resize_assets(spark, sf_dir):
    """Resize rewrites dimensions (payload header + metadata) but preserves
    content bytes; audio passes through; re-decoding sees the new dims."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.multimodal import (
        assets_from_documents,
        decode_assets,
        resize_assets,
    )
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    d = load(spark, sf_dir, "documents").limit(60)
    assets = assets_from_documents(d)
    resized = resize_assets(assets, 32, 24)
    rows = resized.collect()
    assert all(r.resize_error is None for r in rows)
    by_modality = {}
    for r in rows:
        by_modality.setdefault(r.modality, []).append(r)
    # image/video: meta updated to the target dims
    for m in ("image", "video"):
        assert all(r.meta.width == 32 and r.meta.height == 24 for r in by_modality[m])
    # audio untouched (original meta widths vary)
    assert any(r.meta.width != 32 for r in by_modality["audio"])

    # re-decode: decoded dims equal the new header dims, content preserved
    redecoded = (
        decode_assets(resized.drop("resize_error"))
        .filter("modality != 'audio'")
        .collect()
    )
    assert all(r.decode_error is None for r in redecoded)
    assert all(r.decoded_width == 32 and r.decoded_height == 24 for r in redecoded)
    orig_means = {r.asset_id: r.mean_value
                  for r in decode_assets(assets).filter("modality != 'audio'").collect()}
    assert all(orig_means[r.asset_id] == r.mean_value for r in redecoded)
