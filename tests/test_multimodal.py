"""Multimodal plumbing: schema, mapInPandas batching, binary-column
pruning. Decode itself is stubbed (no codecs in container) — the fake
extractor exercises the full distributed path.
"""

from __future__ import annotations

import json

import pytest

from activecube_graphql_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark, tmp_path_factory):
    rows = [
        (1, "image/png", 64, 64, None, b"\x89PNG-fake-bytes-1"),
        (2, "image/png", 128, 64, None, b"\x89PNG-fake-bytes-2"),
        (3, "audio/wav", None, None, 4.2, b"RIFF-fake-audio"),
        (4, "video/mp4", 640, 480, 12.5, b"\x00\x00ftyp-fake"),
    ]
    df = spark.createDataFrame(rows, schema=mm.ASSET_SCHEMA)
    path = str(tmp_path_factory.mktemp("mm") / "assets.parquet")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_extract_features_shapes(assets):
    out = mm.extract_features(assets, dim=8).collect()
    assert len(out) == 4
    for r in out:
        assert r["feature_dim"] == 8
        vec = json.loads(r["feature"])
        assert len(vec) == 8 and all(0.0 <= x <= 1.0 for x in vec)
    # deterministic: same payload → same features
    again = mm.extract_features(assets, dim=8).collect()
    assert sorted(r["feature"] for r in again) == \
        sorted(r["feature"] for r in out)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"anything")


def test_metadata_query_prunes_binary_column(assets):
    """The payload column must not be read for metadata-only rollups —
    column pruning reaches the parquet scan."""
    plan = mm.metadata_stats(assets)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "payload" not in plan
    rows = {r["mime"]: r["cnt"] for r in mm.metadata_stats(assets).collect()}
    assert rows == {"image/png": 2, "audio/wav": 1, "video/mp4": 1}
