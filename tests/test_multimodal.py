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


def test_resize_images_plumbing(assets):
    """Resize touches only image assets, rewrites dims + payload with
    deterministic output; non-images pass through byte-identical."""
    out = {r["asset_id"]: r for r in
           mm.resize_images(assets, 32, 32).collect()}
    src = {r["asset_id"]: r for r in assets.collect()}
    for aid in (1, 2):
        assert (out[aid]["width"], out[aid]["height"]) == (32, 32)
        assert len(out[aid]["payload"]) == max(8, (32 * 32) // 256)
        assert out[aid]["payload"] != src[aid]["payload"]
    for aid in (3, 4):
        assert out[aid]["payload"] == src[aid]["payload"]
        assert out[aid]["width"] == src[aid]["width"]
    # deterministic: re-run gives identical bytes
    out2 = {r["asset_id"]: r["payload"] for r in
            mm.resize_images(assets, 32, 32).collect()}
    assert all(out2[a] == out[a]["payload"] for a in out2)


def test_sample_frames_fanout(assets):
    """Frame sampling fans out one row per grid point over [0, duration]
    for video assets only; frame bytes are deterministic per (asset, t)."""
    rows = mm.sample_frames(assets, every_s=5.0).collect()
    assert {r["asset_id"] for r in rows} == {4}  # only the video
    got = sorted((r["frame_idx"], r["t_s"]) for r in rows)
    assert got == [(0, 0.0), (1, 5.0), (2, 10.0)]  # duration 12.5
    frames = {r["frame_idx"]: r["frame"] for r in rows}
    assert len({bytes(f) for f in frames.values()}) == 3  # distinct per t
    rows2 = {r["frame_idx"]: r["frame"]
             for r in mm.sample_frames(assets, every_s=5.0).collect()}
    assert all(bytes(rows2[k]) == bytes(frames[k]) for k in frames)
