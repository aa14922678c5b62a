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


def test_decode_stub_raises_for_codec_formats():
    """Formats that genuinely need codec libraries stay honest stubs."""
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\nanything")


def test_ppm_codec_roundtrip_and_spec_edges():
    """The real dependency-free P6 codec (r10): encode→decode is exact
    for every byte value; the parser handles the spec's whitespace and
    comment forms and rejects malformed payloads instead of mis-reading
    them."""
    px = bytes((i * 7 + 3) % 256 for i in range(5 * 4 * 3))
    p = mm.encode_ppm(5, 4, px)
    assert mm.decode_ppm(p) == (5, 4, px)
    assert mm.decode_image(p) == (5, 4, px)  # dispatch on P6 magic
    # header with comments and mixed whitespace runs
    assert mm.decode_ppm(b"P6 # c\n#line\n 5\t4\n255\n" + px) == (5, 4, px)
    # raster bytes that LOOK like whitespace must survive (the single
    # separator rule — a split()-based parser eats these)
    tricky = b"\n\n " + px[3:]
    assert mm.decode_ppm(mm.encode_ppm(5, 4, tricky))[2] == tricky
    for bad in (b"", b"P5\n1 1\n255\n\x00" * 3,      # wrong magic
                p[:-1],                               # truncated raster
                b"P6\n2 2\n65535\n" + b"\x00" * 24,   # wide maxval
                b"P6\nx 2\n255\n",                    # non-numeric dim
                b"P6 1 1 255Xabc",                    # missing separator
                b"P6 1 1 255"):                       # header-only
        with pytest.raises(ValueError):
            mm.decode_ppm(bad)
    with pytest.raises(ValueError):
        mm.encode_ppm(2, 2, b"\x00" * 5)  # raster size mismatch


def test_ppm_real_resize_and_features():
    """Nearest-neighbor resize through the real codec: identity at the
    source size, exact source-pixel sampling at other sizes; the real
    feature extractor reports decoded dims + exact channel means."""
    px = bytes((i * 11 + 5) % 251 for i in range(4 * 3 * 3))
    p = mm.encode_ppm(4, 3, px)
    assert mm.ppm_resizer(p, 4, 3) == p
    w, h, rp = mm.decode_ppm(mm.ppm_resizer(p, 8, 6))
    assert (w, h) == (8, 6)
    for y in range(6):
        for x in range(8):
            j, k = 3 * (y * 8 + x), 3 * ((y // 2) * 4 + x // 2)
            assert rp[j:j + 3] == px[k:k + 3]
    f = mm.ppm_feature_extractor(p)
    assert f[:2] == [4.0, 3.0] and len(f) == 5
    assert abs(f[2] - sum(px[0::3]) / 12) < 1e-6
    # and it plugs into the distributed extract path as a REAL extractor
    # (signature-compatible with the pluggable `extractor` arg)


def test_extract_features_with_real_ppm_extractor(spark):
    rows = [(i, "image/x-portable-pixmap",
             mm.encode_ppm(2, 2, bytes((i * 13 + j) % 251
                                       for j in range(12))))
            for i in range(6)]
    df = spark.createDataFrame(
        rows, "asset_id long, mime string, payload binary")
    out = {r["asset_id"]: r for r in
           mm.extract_features(df, extractor=mm.ppm_feature_extractor)
           .collect()}
    assert len(out) == 6
    for aid, r in out.items():
        assert r["feature_dim"] == 5
        import json as _json
        f = _json.loads(r["feature"])
        assert f[:2] == [2.0, 2.0]
        want = sum((aid * 13 + j) % 251 for j in (0, 3, 6, 9)) / 4
        assert abs(f[2] - want) < 1e-6


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
