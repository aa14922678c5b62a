"""Unit tests for the dependency-free JPEG (operators/jpeg.py) and
WAV (operators/audio.py) codecs — the r12 additions (VERDICT r11
items 4 and 5). Pure-Python, no SparkSession needed."""

from __future__ import annotations

import os
import struct
import zlib  # noqa: F401  (parallel to the PNG test imports)

import pytest

from activecube_graphql_spark.operators import audio as au
from activecube_graphql_spark.operators import jpeg as J
from activecube_graphql_spark.operators import multimodal as mm


def _const_block_image(w, h, seed=7):
    """Constant-per-8×8-block grey pixels on the DC-exact grid the
    graded fixtures use (even offset from 128 → FLAT_Q16 divides the
    DC coefficient exactly)."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = 128 + 2 * (((x // 8) * 5 + (y // 8) * 3 + seed) % 49
                           - 24)
            px += bytes((v, v, v))
    return bytes(px)


def test_jpeg_dc_exact_roundtrip_all_modes():
    """Constant blocks + flat quant: the lossy codec is bit-exact, in
    grayscale, 4:4:4, 4:2:2 and 4:2:0, with and without restart
    markers — entropy coding, dequant, IDCT, upsampling, and the
    YCbCr transform all verified to the byte."""
    px = _const_block_image(32, 16)
    for kwargs in (dict(grayscale=True),
                   dict(subsampling="4:4:4"),
                   dict(subsampling="4:2:2"),
                   dict(subsampling="4:2:0"),
                   dict(subsampling="4:2:0", restart_interval=1),
                   dict(grayscale=True, restart_interval=2)):
        enc = J.encode_jpeg(32, 16, px, **kwargs)
        assert J.decode_jpeg(enc) == (32, 16, px), kwargs
        # dispatch: decode_image routes on the SOI marker
        assert mm.decode_image(enc) == (32, 16, px)


def test_jpeg_nonaligned_dims_crop_and_bounded_error():
    """Non-MCU-aligned dims: edge-replication padding encodes, the
    decoder crops back to the declared size; smooth content survives
    the flat-16 quantizer within a tight error bound."""
    import numpy as np
    w, h = 21, 13
    grad = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            grad[y, x] = (x * 9 % 256, y * 11 % 256, (x + y) * 4 % 256)
    for sub in ("4:4:4", "4:2:2", "4:2:0"):
        gw, gh, rgb = J.decode_jpeg(
            J.encode_jpeg(w, h, grad.tobytes(), subsampling=sub))
        assert (gw, gh) == (w, h) and len(rgb) == 3 * w * h
        got = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(int)
        err = np.abs(got - grad.astype(int)).max()
        # flat q=16 on smooth content: DCT error ≤ q/2 per coefficient
        # concentrates well under this; chroma subsampling averages
        # 2×2 neighborhoods of a gentle gradient
        assert err <= 24, (sub, err)


def test_jpeg_rejects_non_baseline_and_malformed():
    px = _const_block_image(16, 16)
    enc = J.encode_jpeg(16, 16, px)
    # arithmetic-coded (SOF9) honest rejection — fabricated marker swap
    arith = bytearray(enc)
    arith[arith.index(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(ValueError, match="arithmetic"):
        J.decode_jpeg(bytes(arith))
    # SOF2 frame carrying a baseline full-band scan is malformed:
    # a progressive DC scan must have Se == 0 (r13 — SOF2 itself is
    # now SUPPORTED; see test_jpeg_progressive_*)
    prog = bytearray(enc)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="Se"):
        J.decode_jpeg(bytes(prog))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x89PNG1234")
    with pytest.raises(ValueError):
        J.decode_jpeg(enc[:40])            # truncated mid-segment
    with pytest.raises(ValueError, match="exhausted"):
        J.decode_jpeg(enc[:-3])            # truncated entropy data
    # encoder validation
    with pytest.raises(ValueError, match="subsampling"):
        J.encode_jpeg(8, 8, bytes(192), subsampling="4:1:1")
    with pytest.raises(ValueError, match="quant"):
        J.encode_jpeg(8, 8, bytes(192), quant=(0,) * 64)
    with pytest.raises(ValueError, match="payload"):
        J.encode_jpeg(8, 8, bytes(10))
    with pytest.raises(ValueError, match="zero-dimension"):
        J.encode_jpeg(0, 8, b"")


def test_jpeg_progressive_matches_baseline_bit_exactly():
    """progressive=True must decode to EXACTLY the bytes the baseline
    encoding decodes to (same quantized coefficients, fully-refining
    scan script) — random content, every subsampling mode, odd dims,
    and restart intervals, so DC first/refine, AC spectral bands,
    EOB runs, and AC successive-approximation refinement are all
    verified against the sequential path."""
    import numpy as np
    rng = np.random.RandomState(7)
    for (w, h) in [(16, 16), (32, 16), (21, 13), (8, 8), (24, 17)]:
        for kwargs in (dict(grayscale=True),
                       dict(subsampling="4:4:4"),
                       dict(subsampling="4:2:2"),
                       dict(subsampling="4:2:0"),
                       dict(subsampling="4:2:0", restart_interval=1),
                       dict(grayscale=True, restart_interval=2),
                       dict(subsampling="4:4:4", restart_interval=3)):
            px = rng.randint(0, 256, (h, w, 3), np.uint8).tobytes()
            base = J.decode_jpeg(J.encode_jpeg(w, h, px, **kwargs))
            prog = J.decode_jpeg(
                J.encode_jpeg(w, h, px, progressive=True, **kwargs))
            assert prog == base, (w, h, kwargs)
            # a progressive stream really was produced (SOF2 marker)
            assert b"\xff\xc2" in J.encode_jpeg(
                w, h, px, progressive=True, **kwargs)


def test_jpeg_progressive_dc_exact_fixture_invariant():
    """The graded multimodal_jpeg fixture family decodes bit-exactly
    through the progressive path too (the r13 fixture cycles
    baseline and progressive assets on the same oracle formula)."""
    for seed in range(6):
        px = _const_block_image(32, 16, seed=seed)
        for kw in (dict(grayscale=True), dict(subsampling="4:4:4"),
                   dict(subsampling="4:2:0"),
                   dict(subsampling="4:2:0", restart_interval=2)):
            got = J.decode_jpeg(
                J.encode_jpeg(32, 16, px, progressive=True, **kw))
            assert got == (32, 16, px), (seed, kw)


def test_jpeg_progressive_decodes_real_third_party_files():
    """Real progressive encoder output (OS-shipped libjpeg-family
    assets) decodes without error to plausible near-white banner
    content — the decoder handles scan scripts, table replacement,
    and EOB-run shapes WE did not emit."""
    import numpy as np
    found = 0
    for path, exp_w, exp_h in (
            ("/usr/share/doc/nodejs/thin-white-stripe.jpg", 493, 58),
            ("/usr/share/doc/nodejs/full-white-stripe.jpg", 493, 312)):
        if not os.path.exists(path):
            continue
        found += 1
        w, h, rgb = J.decode_jpeg(open(path, "rb").read())
        assert (w, h) == (exp_w, exp_h)
        a = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
        # mostly-white stripe images: bright mean, full byte range used
        assert a.mean() > 200 and a.max() == 255
    if not found:
        pytest.skip("no OS-shipped progressive JPEGs on this host")


def test_jpeg_decoder_uses_stream_tables_not_module_constants():
    """The decoder must parse DQT from the STREAM: re-encode with a
    different flat quantizer and the same DC-exact fixture — divisor 8
    also divides 8·(v−128) exactly — and decode must still be exact,
    which it can only be by reading the stream's table."""
    px = _const_block_image(16, 16, seed=11)
    enc = J.encode_jpeg(16, 16, px, quant=(8,) * 64)
    assert J.decode_jpeg(enc) == (16, 16, px)


def test_wav_roundtrips_and_chunk_walk():
    s = [((i * 17 + 5) % 201) - 100 for i in range(101)]  # odd count
    w = au.encode_wav(8000, s)
    assert au.decode_wav(w) == (8000, 1, s)
    # PCM8 and stereo
    s8 = [((i * 7) % 255) - 127 for i in range(33)]
    assert au.decode_wav(au.encode_wav(4000, s8, bits=8)) == (4000, 1, s8)
    st = [1, -1, 2, -2, 3, -3, 4, -4]
    assert au.decode_wav(au.encode_wav(16000, st, channels=2)) \
        == (16000, 2, st)
    # unknown chunks are skipped with word alignment (RIFF spec):
    # splice a LIST chunk with odd length between fmt and data
    pos = w.index(b"data")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = w[:pos] + extra + w[pos:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    assert au.decode_wav(spliced) == (8000, 1, s)


def test_wav_features_exact():
    s = [((i * 17 + 5) % 201) - 100 for i in range(100)]
    f = au.wav_features(au.encode_wav(8000, s))
    assert f["n_frames"] == 100
    assert f["sum_sq"] == sum(v * v for v in s)
    assert f["zero_cross"] == sum(
        1 for i in range(1, 100) if s[i - 1] * s[i] < 0)
    assert f["peak"] == max(abs(v) for v in s)
    assert f["duration_ms"] == round(1000.0 * 100 / 8000, 4)
    # stereo features ride the channel sum (scaled integers)
    st = [3, 1, -2, -2, 5, -1]  # frames sums: 4, -4, 4
    fs = au.wav_features(au.encode_wav(8000, st, channels=2))
    assert fs["sum_sq"] == 16 * 3 and fs["zero_cross"] == 2


def test_wav_rejects_malformed():
    s = [0, 1, -1]
    w = au.encode_wav(8000, s)
    for bad in (b"", b"RIFX" + w[4:], w[:16],
                w[:20] + b"\xff" * 4 + w[24:]):  # clobber codec/chan
        with pytest.raises(ValueError):
            au.decode_wav(bad)
    # non-PCM codec code
    nb = bytearray(w)
    nb[20] = 3  # fmt codec field -> IEEE float
    with pytest.raises(ValueError, match="non-PCM"):
        au.decode_wav(bytes(nb))
    with pytest.raises(ValueError, match="range"):
        au.encode_wav(8000, [70000])
    with pytest.raises(ValueError, match="interleave"):
        au.encode_wav(8000, [1, 2, 3], channels=2)
    with pytest.raises(ValueError, match="width"):
        au.encode_wav(8000, [1], bits=24)


# ---------------------------------------------------------------- video

def _mjpeg_frames(w, h, n, grayscale=False):
    return [J.encode_jpeg(w, h, _const_block_image(w, h, seed=11 * f),
                          grayscale=grayscale)
            for f in range(n)]


def test_avi_mux_demux_roundtrip():
    """encode_avi → avi_frames returns the exact frame payloads, and
    the idx1 seek path (avi_frame) agrees with the sequential walk for
    every index — including odd-length frames, which exercise RIFF
    word alignment inside movi."""
    from activecube_graphql_spark.operators import video as V
    for w, h, n in [(16, 16, 1), (32, 16, 4), (16, 16, 6)]:
        frames = _mjpeg_frames(w, h, n)
        avi = V.encode_avi(w, h, frames, rate=7, scale=2)
        assert V.avi_frames(avi) == frames
        for i in range(n):
            assert V.avi_frame(avi, i) == frames[i]
        m = V.avi_meta(avi)
        assert (m["width"], m["height"], m["n_frames"]) == (w, h, n)
        assert (m["rate"], m["scale"]) == (7, 2)
        if any(len(f) % 2 for f in frames):
            break  # alignment exercised
    # force an odd-length frame explicitly: a JPEG payload is opaque
    # bytes to the muxer, so append a trailing 0xFF00-free comment
    frames = _mjpeg_frames(16, 16, 2)
    odd = frames[0] + b"\x00" if len(frames[0]) % 2 == 0 else frames[0]
    avi = V.encode_avi(16, 16, [odd, frames[1]])
    assert V.avi_frames(avi) == [odd, frames[1]]
    assert V.avi_frame(avi, 1) == frames[1]


def test_avi_timestamp_mapping_and_real_decode():
    """frame_index_at = floor(t·rate/scale) with last-frame clamp, and
    auto_frame_decoder really decodes the sought frame: the decoded
    raster equals the encoder input on the DC-exact family."""
    from activecube_graphql_spark.operators import video as V
    rasters = [_const_block_image(16, 16, seed=11 * f) for f in range(4)]
    frames = [J.encode_jpeg(16, 16, r) for r in rasters]
    avi = V.encode_avi(16, 16, frames, rate=4, scale=1)
    assert V.frame_index_at(avi, 0.0) == 0
    assert V.frame_index_at(avi, 0.49) == 1
    assert V.frame_index_at(avi, 0.5) == 2
    assert V.frame_index_at(avi, 9.0) == 3          # clamp
    with pytest.raises(ValueError):
        V.frame_index_at(avi, -0.1)
    assert mm.auto_frame_decoder(avi, 0.5) == rasters[2]
    # non-AVI payloads stay on the deterministic fake
    fake = mm.auto_frame_decoder(b"not-a-container", 0.5)
    assert fake == mm.fake_frame_decoder(b"not-a-container", 0.5)


def test_avi_rejects_malformed():
    """Honest ValueError on every corruption class — never a mis-read
    frame (the decode_png/decode_jpeg discipline)."""
    from activecube_graphql_spark.operators import video as V
    frames = _mjpeg_frames(16, 16, 2)
    avi = V.encode_avi(16, 16, frames)
    with pytest.raises(ValueError):
        V.avi_meta(b"RIFF\x04\x00\x00\x00WAVE")      # not AVI
    with pytest.raises(ValueError):
        V.avi_meta(avi[:60])                          # truncated
    with pytest.raises(ValueError):
        V.encode_avi(16, 16, [])                      # no frames
    with pytest.raises(ValueError):
        V.encode_avi(16, 16, [b"not-jpeg"])           # bad frame
    # header/movi frame-count disagreement
    pos = avi.index(b"avih") + 8 + 16
    bad = bytearray(avi)
    bad[pos:pos + 4] = struct.pack("<I", 5)           # dwTotalFrames
    strh = avi.index(b"strh") + 8 + 32                # dwLength
    bad[strh:strh + 4] = struct.pack("<I", 5)
    with pytest.raises(ValueError):
        V.avi_frames(bytes(bad))
    # corrupt idx1 offset must raise on seek, not mis-read
    ipos = avi.index(b"idx1") + 8 + 8                 # entry 0 dwOffset
    bad = bytearray(avi)
    bad[ipos:ipos + 4] = struct.pack("<I", 2)
    with pytest.raises(ValueError):
        V.avi_frame(bytes(bad), 0)
    # non-MJPG handler rejected honestly
    hpos = avi.index(b"strh") + 8 + 4
    bad = bytearray(avi)
    bad[hpos:hpos + 4] = b"H264"
    with pytest.raises(ValueError):
        V.avi_meta(bytes(bad))


# ----------------------------------------------------------------- gif

def test_gif_roundtrip_palettes_and_interlace():
    """encode_gif → decode_gif is byte-exact across palette sizes,
    dimensions, and 4-pass interlace (LZW code-width growth, CLEAR
    reset, KwKwK, sub-block framing all inside the path)."""
    from activecube_graphql_spark.operators import gif as G
    for w, h, npal, inter in [(16, 16, 16, False), (24, 16, 16, True),
                              (7, 5, 4, False), (1, 1, 2, False),
                              (33, 9, 256, True)]:
        pal = [(16 * (i % 16) + 7, (37 * i) % 256, (91 * i) % 256)
               for i in range(npal)]
        idx = bytes((13 * x + 7 * y + x * y) % npal
                    for y in range(h) for x in range(w))
        p = G.encode_gif(w, h, idx, pal, interlace=inter)
        assert G.decode_gif(p) == \
            (w, h, b"".join(bytes(pal[i]) for i in idx))
    # dictionary-overflow regime: noisy 256-color image forces the
    # 12-bit table full and a mid-stream CLEAR
    w, h = 120, 90
    idx = bytes((i * 197 + (i * i) % 251) % 256 for i in range(w * h))
    pal = [(i, 255 - i, (i * i) % 256) for i in range(256)]
    p = G.encode_gif(w, h, idx, pal)
    assert G.decode_gif(p) == \
        (w, h, b"".join(bytes(pal[i]) for i in idx))
    # decode_image dispatch on the GIF signature
    pal4 = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]
    idx = bytes((x + y) % 4 for y in range(4) for x in range(4))
    assert mm.decode_image(G.encode_gif(4, 4, idx, pal4)) == \
        (4, 4, b"".join(bytes(pal4[i]) for i in idx))


def test_gif_decodes_real_third_party_files():
    """OS-shipped GIFs (third-party encoders) decode without error —
    the codec handles real extension blocks, sub-block layouts, and
    LZW streams it did not write."""
    import glob
    from activecube_graphql_spark.operators import gif as G
    paths = glob.glob("/usr/share/doc/**/*.gif", recursive=True)[:20]
    if not paths:
        pytest.skip("no OS-shipped GIFs on this host")
    for path in paths:
        w, h, rgb = G.decode_gif(open(path, "rb").read())
        assert w > 0 and h > 0 and len(rgb) == 3 * w * h, path


def test_gif_rejects_malformed():
    from activecube_graphql_spark.operators import gif as G
    pal = [(0, 0, 0), (255, 255, 255)]
    p = G.encode_gif(4, 4, bytes([0, 1] * 8), pal)
    with pytest.raises(ValueError):
        G.decode_gif(b"notgif")
    with pytest.raises(ValueError):
        G.decode_gif(p[:20])                        # truncated
    with pytest.raises(ValueError):
        G.encode_gif(4, 4, bytes(15), pal)          # wrong raster len
    with pytest.raises(ValueError):
        G.encode_gif(4, 4, bytes([5] * 16), pal)    # index > palette
    with pytest.raises(ValueError):
        G.encode_gif(4, 4, bytes(16), [(0, 0, 0)])  # 1-entry palette
    # LZW stream that emits too many pixels: descriptor says 2x2 but
    # the stream carries 16 pixels
    big = G.encode_gif(4, 4, bytes(16), pal)
    small_hdr = G.encode_gif(2, 2, bytes(4), pal)
    hybrid = small_hdr[:big.index(b"\x2C")] \
        + b"\x2C" + small_hdr[small_hdr.index(b"\x2C") + 1:
                              small_hdr.index(b"\x2C") + 10] \
        + big[big.index(b"\x2C") + 10:]
    with pytest.raises(ValueError):
        G.decode_gif(hybrid)


def test_gif_subscreen_frame_composites_onto_canvas():
    """A first frame smaller than the logical screen composites at its
    (left, top) onto a background-colored screen-sized canvas — the
    PIL/browser still-image semantics (review r12: returning the
    cropped sub-frame silently mis-sizes real crawl images)."""
    from activecube_graphql_spark.operators import gif as G
    pal = [(10, 20, 30), (200, 100, 50)]
    inner = G.encode_gif(2, 2, bytes([1, 0, 0, 1]), pal)
    # surgically enlarge the logical screen to 5x4 and place the
    # 2x2 frame at (2, 1); background index 0
    buf = bytearray(inner)
    struct.pack_into("<HH", buf, 6, 5, 4)            # sw, sh
    desc = bytes(buf).index(b"\x2C")
    struct.pack_into("<HH", buf, desc + 1, 2, 1)     # left, top
    w, h, rgb = G.decode_gif(bytes(buf))
    assert (w, h) == (5, 4)
    px = [tuple(rgb[3 * i:3 * i + 3]) for i in range(20)]
    bg, fg = (10, 20, 30), (200, 100, 50)
    expect = [bg] * 20
    expect[1 * 5 + 2] = fg                            # (2,1) idx 1
    expect[1 * 5 + 3] = bg                            # idx 0
    expect[2 * 5 + 2] = bg
    expect[2 * 5 + 3] = fg
    assert px == expect


def test_gif_local_color_table_and_extension_skip():
    """A GIF whose image carries a LOCAL color table (none global) and
    leading extension blocks (graphic control + comment) decodes via
    the local palette — the real-crawl layout optimized encoders
    emit."""
    from activecube_graphql_spark.operators import gif as G
    pal = [(5, 6, 7), (250, 100, 0)]
    base = G.encode_gif(4, 2, bytes([0, 1] * 4), pal)
    # strip the global color table (flags bit 7 + 6 bytes) and re-home
    # the palette as a LOCAL table on the image descriptor; inject a
    # graphic-control extension + a comment before the descriptor
    hdr = bytearray(base[:13])
    hdr[10] &= 0x7F                                  # no GCT
    gct = base[13:13 + 6]
    rest = base[13 + 6:]
    desc_at = rest.index(b"\x2C")
    desc = bytearray(rest[desc_at:desc_at + 10])
    desc[9] |= 0x80                                  # local table, depth 1
    gce = b"\x21\xF9\x04\x00\x00\x00\x00\x00"        # graphic control
    com = b"\x21\xFE\x05hello\x00"                   # comment
    rebuilt = (bytes(hdr) + gce + com + bytes(desc) + bytes(gct)
               + rest[desc_at + 10:])
    w, h, rgb = G.decode_gif(rebuilt)
    assert (w, h) == (4, 2)
    assert rgb == b"".join(bytes(pal[i]) for i in [0, 1] * 4)


def test_avi_rational_fps_seek():
    """Non-integer fps (rate/scale rational, e.g. 30000/1001-style):
    frame_index_at uses floor(t*rate/scale) exactly, and the idx1 seek
    agrees with the walk at every grid point."""
    from activecube_graphql_spark.operators import video as V
    frames = _mjpeg_frames(16, 16, 5)
    avi = V.encode_avi(16, 16, frames, rate=30000, scale=1001)
    m = V.avi_meta(avi)
    assert (m["rate"], m["scale"]) == (30000, 1001)
    walked = V.avi_frames(avi)
    for t in [0.0, 0.0333, 0.0334, 0.1, 0.2]:
        idx = V.frame_index_at(avi, t)
        assert idx == min(int(t * 30000 / 1001), 4)
        assert V.avi_frame(avi, idx) == walked[idx]


# ---------------------------------------------------------------- MP4

from activecube_graphql_spark.operators import mp4 as M  # noqa: E402


def _mk_frames(n, w=32, h=16, seed=3):
    import numpy as np
    rng = np.random.RandomState(seed)
    return [J.encode_jpeg(
        w, h, rng.randint(0, 256, (h, w, 3), np.uint8).tobytes(),
        subsampling="4:2:0") for _ in range(n)]


def test_mp4_mux_demux_roundtrip_and_pair_chunking():
    """Samples recovered bit-exactly through the general stsc path
    (pair chunks + odd tail), sequential AND random access, for every
    frame count parity; timestamp map matches floor(t·rate) clamp."""
    for n in (1, 2, 3, 4, 5, 7):
        frames = _mk_frames(n)
        enc = M.encode_mp4(32, 16, frames, rate=6)
        meta = M.mp4_meta(enc)
        assert (meta["width"], meta["height"], meta["n_frames"],
                meta["fps"]) == (32, 16, n, 6.0)
        assert M.mp4_frames(enc) == frames
        p = M._parse(enc)
        for i in range(n):
            assert M.mp4_frame(enc, i, parsed=p) == frames[i]
        assert M.frame_index_at(p, 0.0) == 0
        assert M.frame_index_at(p, 99.0) == n - 1
        if n > 1:
            assert M.frame_index_at(p, 1.0 / 6) == 1


def test_mp4_seek_decode_matches_sequential():
    """mp4_frame_decoder (seek path) returns the same raster bytes as
    decoding the sequentially-walked sample — the at-scale path is
    verified against the integrity path."""
    frames = _mk_frames(5, seed=11)
    enc = M.encode_mp4(32, 16, frames, rate=4)
    p = M._parse(enc)
    seq = [J.decode_jpeg(f)[2] for f in M.mp4_frames(enc)]
    for t, exp_idx in [(0.0, 0), (0.25, 1), (0.5, 2), (0.75, 3),
                       (2.0, 4)]:
        assert M.frame_index_at(p, t) == exp_idx
        assert M.mp4_frame_decoder(enc, t, parsed=p) == seq[exp_idx]


def test_mp4_corruption_and_foreign_codings_rejected():
    """Honest rejection: corrupt chunk offsets re-validate at the SOI
    check, non-JPEG sample entries (H.264 etc.) raise by name,
    table/count disagreements raise — never a mis-read sample."""
    frames = _mk_frames(2)
    good = M.encode_mp4(32, 16, frames, rate=5)

    bad = bytearray(good)
    i = bad.index(b"stco")
    struct.pack_into(">I", bad, i + 8 + 4, 5)     # offset -> garbage
    with pytest.raises(ValueError, match="not a JPEG|exceeds"):
        M.mp4_frame(bytes(bad), 0)

    avc = bytearray(good)
    j = avc.index(b"jpeg", avc.index(b"stsd"))
    avc[j:j + 4] = b"avc1"
    with pytest.raises(ValueError, match="avc1"):
        M._parse(bytes(avc))

    cnt = bytearray(good)
    k = cnt.index(b"stsz")
    struct.pack_into(">I", cnt, k + 12, 9)        # stsz count != stts
    with pytest.raises(ValueError, match="stsz"):
        M._parse(bytes(cnt))

    with pytest.raises(ValueError, match="ftyp"):
        M._parse(b"\x00" * 16)
    with pytest.raises(ValueError, match="moov"):
        M._parse(good[: good.index(b"moov") - 4])


def test_mp4_v1_and_co64_parse():
    """Version-1 mdhd (64-bit times) and co64 chunk offsets — the
    third-party large-file layouts — parse to the same samples."""
    frames = _mk_frames(3)
    enc = bytearray(M.encode_mp4(32, 16, frames, rate=5))

    # rewrite mdhd v0 -> v1 in place (body grows 12 bytes): rebuild
    # the file through the box math instead of hand-patching sizes
    i = enc.index(b"mdhd") - 4
    (sz,) = struct.unpack(">I", enc[i:i + 4])
    body = bytes(enc[i + 12:i + sz])              # after version+flags
    ts, dur = struct.unpack(">II", body[8:16])
    v1 = struct.pack(">QQIQ", 0, 0, ts, dur) + body[16:]
    newbox = struct.pack(">I", len(v1) + 12) + b"mdhd" \
        + bytes([1]) + b"\x00\x00\x00" + v1
    patched = bytes(enc[:i]) + newbox + bytes(enc[i + sz:])
    # fix enclosing box sizes (mdia, trak, moov grow by the delta)
    delta = len(newbox) - sz
    out = bytearray(patched)
    for outer in (b"moov", b"trak", b"mdia"):
        j = out.index(outer) - 4
        (osz,) = struct.unpack(">I", out[j:j + 4])
        struct.pack_into(">I", out, j, osz + delta)
    p = M._parse(bytes(out))
    assert p["timescale"] == ts and p["n_frames"] == 3
    assert M.mp4_frames(bytes(out)) == frames

    # stco -> co64: widen offsets to 64-bit
    enc2 = bytearray(M.encode_mp4(32, 16, frames, rate=5))
    i = enc2.index(b"stco") - 4
    (sz,) = struct.unpack(">I", enc2[i:i + 4])
    (n_off,) = struct.unpack(">I", enc2[i + 12:i + 16])
    offs = [struct.unpack(">I", enc2[i + 16 + 4 * k:
                                     i + 20 + 4 * k])[0]
            for k in range(n_off)]
    co64 = struct.pack(">I", 16 + 8 * n_off) + b"co64" \
        + b"\x00" * 4 + struct.pack(">I", n_off) \
        + b"".join(struct.pack(">Q", o) for o in offs)
    patched = bytes(enc2[:i]) + co64 + bytes(enc2[i + sz:])
    delta = len(co64) - sz
    out = bytearray(patched)
    for outer in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = out.index(outer) - 4
        (osz,) = struct.unpack(">I", out[j:j + 4])
        struct.pack_into(">I", out, j, osz + delta)
    assert M.mp4_frames(bytes(out)) == frames


def test_mp4_auto_frame_decoder_dispatch():
    """auto_frame_decoder routes real ftyp payloads to the MP4 seek
    path (and the AVI/fake routes are untouched)."""
    frames = _mk_frames(2, seed=5)
    enc = M.encode_mp4(32, 16, frames, rate=5)
    assert mm.auto_frame_decoder(enc, 0.0) == J.decode_jpeg(frames[0])[2]
    # the fake-ftyp test payload (offset-2 ftyp) still hits the fake
    assert mm.auto_frame_decoder(b"\x00\x00ftyp-fake", 0.0) \
        == mm.fake_frame_decoder(b"\x00\x00ftyp-fake", 0.0)


def test_gif_transparent_background_renders_neutral_white():
    """ADVICE r12: when the GCE marks the BACKGROUND index
    transparent, the sub-screen canvas must render the browser/PIL
    flattening (neutral white), not the palette color hiding behind
    the transparent slot; an opaque background keeps the palette
    color."""
    from activecube_graphql_spark.operators import gif as G
    pal = [(10, 20, 30), (200, 100, 50)]
    inner = G.encode_gif(2, 2, bytes([1, 0, 0, 1]), pal)
    buf = bytearray(inner)
    struct.pack_into("<HH", buf, 6, 5, 4)            # sw, sh = 5x4
    desc = bytes(buf).index(b"\x2C")
    struct.pack_into("<HH", buf, desc + 1, 2, 1)     # left, top
    # inject a GCE flagging index 0 (the background) transparent
    gce = b"\x21\xF9\x04\x01\x00\x00\x00\x00"
    trans = bytes(buf[:desc]) + gce + bytes(buf[desc:])
    w, h, rgb = G.decode_gif(trans)
    assert (w, h) == (5, 4)
    px = [tuple(rgb[3 * i:3 * i + 3]) for i in range(20)]
    assert px[0] == (255, 255, 255)                  # flattened bg
    assert px[1 * 5 + 2] == (200, 100, 50)           # frame pixels keep
    # opaque GCE (flag clear) keeps the palette background
    gce_opaque = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
    opaque = bytes(buf[:desc]) + gce_opaque + bytes(buf[desc:])
    _, _, rgb2 = G.decode_gif(opaque)
    assert tuple(rgb2[0:3]) == (10, 20, 30)


def test_avi_idx1_absolute_offsets_fallback():
    """ADVICE r12/r13: real-world muxers sometimes write idx1 offsets
    as ABSOLUTE file positions.  The convention is detected ONCE per
    file from the first index entry (the ffmpeg approach) and applied
    uniformly — never retried per entry, so conventions cannot
    silently mix within one file."""
    from activecube_graphql_spark.operators import video as V
    frames = _mjpeg_frames(16, 16, 3)
    avi = bytearray(V.encode_avi(16, 16, frames, rate=5))
    p = V._parse(bytes(avi))
    i_start, i_len = p["idx1"]
    fourcc_pos = p["movi"][0]
    offs = []
    for e in range(i_len // 16):
        (off,) = struct.unpack("<I", avi[i_start + 16 * e + 8:
                                        i_start + 16 * e + 12])
        offs.append(off)
        struct.pack_into("<I", avi, i_start + 16 * e + 8,
                         fourcc_pos + off)           # make absolute
    for e, f in enumerate(frames):
        assert V.avi_frame(bytes(avi), e) == f
    # a wrong NON-first offset raises under the detected convention
    bad = bytearray(avi)
    struct.pack_into("<I", bad, i_start + 16 + 8, 7)
    with pytest.raises(ValueError, match="does not land"):
        V.avi_frame(bytes(bad), 1)
    # MIXED conventions (entry 1 back to movi-relative in an
    # absolute-convention file) must raise, not silently read the
    # wrong chunk — the exact ADVICE r13 hazard
    mixed = bytearray(avi)
    struct.pack_into("<I", mixed, i_start + 16 + 8, offs[1])
    with pytest.raises(ValueError, match="does not land"):
        V.avi_frame(bytes(mixed), 1)
    # a corrupt FIRST entry defeats detection itself — loudly
    struct.pack_into("<I", avi, i_start + 8, 7)
    with pytest.raises(ValueError, match="neither"):
        V.avi_frame(bytes(avi), 0)


def test_fmp4_roundtrip_seek_and_defaults():
    """fMP4 (r13): the fragmented layout recovers the same samples as
    the classic one — moov-first empty tables + trex defaults,
    moof/tfhd/tfdt/trun pairs, default-base-is-moof data offsets,
    tfhd default durations — for every frame-count parity; seek ==
    sequential walk; the timestamp map flows through the RLE'd trun
    durations."""
    for n in (1, 2, 3, 4, 5, 7):
        frames = _mk_frames(n, seed=n)
        flat = M.encode_mp4(32, 16, frames, rate=6)
        frag = M.encode_mp4(32, 16, frames, rate=6, fragmented=True)
        assert frag != flat and b"moof" in frag and b"trex" in frag
        assert M.mp4_frames(frag) == M.mp4_frames(flat) == frames
        p = M._parse(frag)
        for i in range(n):
            assert M.mp4_frame(frag, i, parsed=p) == frames[i]
        assert M.frame_index_at(p, 99.0) == n - 1
        m = M.mp4_meta(frag)
        assert (m["n_frames"], m["fps"]) == (n, 6.0)


def test_fmp4_corruption_rejected():
    """A corrupt trun sample size re-validates at the SOI/bounds check
    and raises — the idx1-discipline applied to fragment tables."""
    frames = _mk_frames(4, seed=9)
    enc = bytearray(M.encode_mp4(16, 16, frames, rate=4,
                                 fragmented=True))
    i = enc.index(b"trun")
    struct.pack_into(">I", enc, i + 16, 5)        # sample 0 size
    with pytest.raises(ValueError, match="not a JPEG|exceeds"):
        M.mp4_frames(bytes(enc))
    # empty tables AND no moofs is an honest rejection, not 0 frames
    flat = M.encode_mp4(16, 16, frames, rate=4, fragmented=True)
    no_moof = flat[:flat.index(b"moof") - 4]
    with pytest.raises(ValueError, match="no samples"):
        M._parse(no_moof)


# ------------------------------------------------------------------
# FLAC (operators/flac.py, r14 — VERDICT r13 item 8)
# ------------------------------------------------------------------

def _flac_sig(aid, n):
    return [((aid * 31 + i * 17) % 201) - 100 for i in range(n)]


def test_flac_roundtrip_all_subframe_families():
    from activecube_graphql_spark.operators import flac as FL

    for aid in range(12):
        n = 64 + 32 * (aid % 5)
        mode = ("constant", "verbatim", "fixed", "lpc")[aid % 4]
        s = ([(aid * 7 % 201) - 100] * n if mode == "constant"
             else _flac_sig(aid, n))
        enc = FL.encode_flac(8000, s, mode=mode,
                             partition_order=1 if aid % 3 == 0 else 0)
        sr, bits, out, info = FL.decode_flac(enc)
        assert (sr, bits) == (8000, 16)
        assert out == s, (aid, mode)
        assert info["modes"] == [mode]


def test_flac_multiframe_and_compression():
    from activecube_graphql_spark.operators import flac as FL

    s = _flac_sig(7, 10000)
    enc = FL.encode_flac(8000, s, mode="fixed", block_size=4096)
    sr, bits, out, info = FL.decode_flac(enc)
    assert out == s and info["n_frames"] == 3
    # rice-coded fixed-order-2 beats raw PCM on this signal
    assert len(enc) < 2 * len(s)


def test_flac_variants_wasted_escape_rice2_orders():
    from activecube_graphql_spark.operators import flac as FL

    s4 = [x * 4 for x in _flac_sig(3, 96)]
    assert FL.decode_flac(FL.encode_flac(
        8000, s4, mode="fixed", wasted_bits=2))[2] == s4
    s = _flac_sig(5, 64)
    assert FL.decode_flac(FL.encode_flac(
        8000, s, mode="fixed", force_escape=True))[2] == s
    s = _flac_sig(9, 64)
    assert FL.decode_flac(FL.encode_flac(
        8000, s, mode="lpc", rice2=True, lpc_coefs=[5, -3, 1],
        lpc_shift=2))[2] == s
    for order in range(5):
        s = _flac_sig(11 + order, 64)
        assert FL.decode_flac(FL.encode_flac(
            8000, s, mode="fixed", order=order))[2] == s
    # 8-bit depth
    s8 = [v % 100 - 50 for v in _flac_sig(13, 80)]
    assert FL.decode_flac(FL.encode_flac(
        8000, s8, bits=8, mode="verbatim"))[2] == s8


def test_flac_integrity_layers_reject_corruption():
    import pytest

    from activecube_graphql_spark.operators import flac as FL

    s = _flac_sig(2, 96)
    enc = FL.encode_flac(8000, s, mode="fixed")
    with pytest.raises(ValueError, match="magic"):
        FL.decode_flac(b"fLaX" + enc[4:])
    with pytest.raises(ValueError):
        FL.decode_flac(enc[:-3])  # truncated frame
    # flip a residual bit mid-frame: CRC-16 must catch it
    bad = bytearray(enc)
    bad[len(bad) - 10] ^= 0x10
    with pytest.raises(ValueError, match="CRC|truncated|unary"):
        FL.decode_flac(bytes(bad))
    # corrupt the frame header: CRC-8 must catch it
    hdr = bytearray(enc)
    # frame starts right after 4(magic)+4(block hdr)+34(streaminfo)
    hdr[42 + 2] ^= 0x04
    with pytest.raises(ValueError, match="CRC-8|sync|reserved"):
        FL.decode_flac(bytes(hdr))
    # tamper the STREAMINFO MD5: decoded PCM no longer matches
    md5bad = bytearray(enc)
    md5bad[42 - 16] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        FL.decode_flac(bytes(md5bad))


def test_flac_honest_rejections():
    import pytest

    from activecube_graphql_spark.operators import flac as FL

    with pytest.raises(ValueError, match="at least one"):
        FL.encode_flac(8000, [])
    with pytest.raises(ValueError, match="constant"):
        FL.encode_flac(8000, [1, 2], mode="constant")
    with pytest.raises(ValueError, match="range"):
        FL.encode_flac(8000, [40000], bits=16)
    with pytest.raises(ValueError, match="divisible"):
        FL.encode_flac(8000, [3], wasted_bits=2)


# ------------------------------------------------------- MP3 walk (r16)

def _mk_mp3(n_frames=4, bi=3, si=0, mono=True, id3_body=None,
            pad_fn=lambda f: f % 2, fill=37):
    """Hand-rolled CBR MPEG-1 Layer III stream for walker tests."""
    from activecube_graphql_spark.operators import audio as au
    out = bytearray()
    if id3_body is not None:
        out += b"ID3" + bytes([3, 0, 0, 0, 0, 0, len(id3_body)])
        out += id3_body
    kbps, rate = au.MP3_BITRATES[bi], au.MP3_RATES[si]
    for f in range(n_frames):
        pad = pad_fn(f)
        flen = 144 * kbps * 1000 // rate + pad
        out += bytes([0xFF, 0xFB, (bi << 4) | (si << 2) | (pad << 1),
                      0xC0 if mono else 0x00])
        out += bytes([(fill + f + j) % 251 for j in range(flen - 4)])
    return bytes(out)


def test_mp3_walk_known_stream():
    """The walker recovers every header field, hops both padding
    lengths, skips the ID3 tag, and sums exactly the payload bytes
    of the hand stream."""
    from activecube_graphql_spark.operators import audio as au
    body = bytes(range(23))
    raw = _mk_mp3(n_frames=5, bi=3, si=1, mono=False, id3_body=body)
    info = au.mp3_stream_info(raw)
    assert info["n_frames"] == 5
    assert info["bitrate_kbps"] == 48 and info["sample_rate"] == 48000
    assert info["channel_mode"] == "stereo"
    assert info["id3_bytes"] == 10 + len(body)
    assert info["stream_len"] == len(raw)
    # exact payload byte sum, independently recomputed
    want = sum(b for f in range(5)
               for b in _frame_payload(raw, info, f))
    assert info["payload_sum"] == want
    # duration is the single-division formula
    assert info["duration_ms"] == (5 * 1152 * 1000) / 48000


def _frame_payload(raw, info, f):
    off = info["id3_bytes"]
    for i in range(f + 1):
        b2 = raw[off + 2]
        pad = (b2 >> 1) & 1
        flen = 144 * info["bitrate_kbps"] * 1000 \
            // info["sample_rate"] + pad
        if i == f:
            return raw[off + 4:off + flen]
        off += flen


def test_mp3_walk_rejects_malformed():
    """Honest-failure contract: truncation, desync, VBR switches, and
    non-syncsafe ID3 sizes raise — never mis-count."""
    import pytest

    from activecube_graphql_spark.operators import audio as au
    good = _mk_mp3()
    with pytest.raises(ValueError, match="overruns"):
        au.mp3_stream_info(good[:-3])          # truncated tail frame
    with pytest.raises(ValueError, match="overruns"):
        au.mp3_stream_info(good[:10])          # truncated first frame
    with pytest.raises(ValueError, match="sync"):
        au.mp3_stream_info(b"\x00" + good)     # leading garbage
    with pytest.raises(ValueError, match="CBR"):
        au.mp3_stream_info(_mk_mp3(2, bi=3) + _mk_mp3(2, bi=5))
    bad_id3 = bytearray(_mk_mp3(id3_body=b"x" * 5))
    bad_id3[6] = 0x80                          # non-syncsafe size
    with pytest.raises(ValueError, match="syncsafe"):
        au.mp3_stream_info(bytes(bad_id3))
    with pytest.raises(ValueError, match="frames"):
        au.mp3_stream_info(b"ID3" + bytes([3, 0, 0, 0, 0, 0, 0]))


def test_audio_stream_info_dispatch():
    """The audio front door sniffs all three containers and rejects
    unknown magic with the supported-list message."""
    import pytest

    from activecube_graphql_spark.operators import audio as au
    from activecube_graphql_spark.operators import flac as fl

    samples = [((i * 17) % 201) - 100 for i in range(96)]
    wav = au.audio_stream_info(au.encode_wav(8000, samples))
    assert wav["format"] == "wav" and wav["n_frames"] == 96
    flac = au.audio_stream_info(fl.encode_flac(8000, samples))
    assert flac["format"] == "flac"
    mp3 = au.audio_stream_info(_mk_mp3(n_frames=3))
    assert mp3["format"] == "mp3" and mp3["n_frames"] == 3
    # ID3-led MP3 sniffs by the tag magic, not frame sync
    assert au.audio_stream_info(
        _mk_mp3(n_frames=2, id3_body=b"meta"))["format"] == "mp3"
    with pytest.raises(NotImplementedError, match="honest rejection"):
        au.audio_stream_info(b"OggS....vorbis")
