"""AVI/RIFF MJPEG video container codec — dependency-free (r12; the
reference has no video surface, this is the beyond-reference
training-data-pipeline brief: video stops being a fake modality).

The container is OpenDML-era AVI with an MJPEG video stream — the one
real video format expressible without codec libraries, because every
frame is a complete baseline JPEG and this repo already ships a real
JPEG codec (:mod:`.jpeg`).  Composition over invention: the RIFF chunk
walk is the same discipline as :mod:`.audio` (WAV), the per-frame
decode is :func:`.jpeg.decode_jpeg`.

* ``encode_avi`` — canonical single-stream muxer: ``hdrl`` (``avih``
  main header + ``strl`` with ``strh``/``strf``), ``movi`` list of
  word-aligned ``00dc`` chunks, and a standard ``idx1`` index
  (offsets relative to the ``movi`` fourcc, the common muxer
  convention) with AVIF_HASINDEX set.
* ``avi_meta`` — header parse: dimensions, rate/scale fps rational,
  frame count, handler.
* ``avi_frames`` — sequential ``movi`` walk returning every frame
  payload (the integrity path: chunk ids, sizes, alignment, SOI
  check per frame, count cross-checked against the header).
* ``avi_frame`` — random access via ``idx1`` (the seek path a frame
  sampler uses at scale: one index lookup + one bounded read, never
  a full-file walk); the chunk header at the seek target is
  re-validated so a corrupt index can never mis-read bytes.

Rejections are honest ValueError (bad magic, truncated chunks,
non-MJPG handlers, multi-stream files, frame/index disagreement) —
never a mis-read frame, the decode_png/decode_jpeg discipline.
"""

from __future__ import annotations

import struct

#: dwFlags: file carries a valid idx1
AVIF_HASINDEX = 0x00000010
#: idx1 dwFlags: every MJPEG frame is a keyframe
AVIIF_KEYFRAME = 0x00000010


def _chunk(cid: bytes, body: bytes) -> bytes:
    """One RIFF chunk, word-aligned (odd bodies get a pad byte that is
    NOT counted in the stored size — the WAV/RIFF rule)."""
    return cid + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) % 2 else b"")


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi(width: int, height: int, frames: list[bytes],
               rate: int = 10, scale: int = 1) -> bytes:
    """Mux complete baseline-JPEG frame payloads into a single-stream
    MJPEG AVI at ``rate/scale`` frames per second."""
    if width <= 0 or height <= 0:
        raise ValueError("AVI dimensions must be positive")
    if rate <= 0 or scale <= 0:
        raise ValueError("AVI rate/scale must be positive")
    if not frames:
        raise ValueError("AVI needs at least one frame")
    for i, f in enumerate(frames):
        if len(f) < 2 or f[:2] != b"\xff\xd8":
            raise ValueError(f"frame {i} is not a JPEG payload")

    max_size = max(len(f) for f in frames)
    usec = round(1_000_000 * scale / rate)
    avih = struct.pack(
        "<14I", usec, max_size * rate // scale, 0, AVIF_HASINDEX,
        len(frames), 0, 1, max_size, width, height, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", b"MJPG", 0, 0, 0, 0,
        scale, rate, 0, len(frames), max_size, 0xFFFFFFFF, 0,
        0, 0, width, height)
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl",
                         _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    # movi body + idx1 built together: idx1 offsets are relative to
    # the position of the 'movi' fourcc (the common convention — VLC,
    # ffmpeg and mplayer all accept it; 4 = the fourcc itself, so the
    # first chunk header sits at offset 4)
    movi_body = b""
    idx = b""
    for f in frames:
        off = 4 + len(movi_body)
        movi_body += _chunk(b"00dc", f)
        idx += struct.pack("<4sIII", b"00dc", AVIIF_KEYFRAME,
                           off, len(f))
    body = b"AVI " + hdrl + _list(b"movi", movi_body) \
        + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(payload: bytes, pos: int, end: int):
    """Yield ``(cid, list_type_or_None, body_start, body_len)`` for
    each chunk in ``payload[pos:end]``; LIST chunks yield their type
    and the body AFTER the 4-byte type."""
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if pos + 8 + clen > end:
            raise ValueError(f"truncated AVI chunk {cid!r}")
        if cid == b"LIST":
            if clen < 4:
                raise ValueError("AVI LIST too short for a type")
            yield cid, payload[pos + 8:pos + 12], pos + 12, clen - 4
        else:
            yield cid, None, pos + 8, clen
        pos += 8 + clen + (clen % 2)


def _parse(payload: bytes) -> dict:
    """Container parse: headers + movi/idx1 spans, fully validated."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_len,) = struct.unpack("<I", payload[4:8])
    if riff_len + 8 > len(payload):
        raise ValueError("RIFF size exceeds payload")
    end = 8 + riff_len

    avih = strh = strf = None
    movi = None  # (fourcc_pos, body_start, body_len)
    idx1 = None  # (body_start, body_len)
    for cid, ltype, start, ln in _walk(payload, 12, end):
        if ltype == b"hdrl":
            for c2, l2, s2, n2 in _walk(payload, start, start + ln):
                if c2 == b"avih":
                    avih = payload[s2:s2 + n2]
                elif l2 == b"strl":
                    if strh is not None:
                        raise ValueError(
                            "multi-stream AVI unsupported (one MJPEG "
                            "video stream only)")
                    for c3, _, s3, n3 in _walk(payload, s2, s2 + n2):
                        if c3 == b"strh":
                            strh = payload[s3:s3 + n3]
                        elif c3 == b"strf":
                            strf = payload[s3:s3 + n3]
        elif ltype == b"movi":
            movi = (start - 4, start, ln)
        elif cid == b"idx1":
            idx1 = (start, ln)

    if avih is None or strh is None or strf is None or movi is None:
        raise ValueError("AVI missing avih/strh/strf/movi")
    if len(avih) < 56 or len(strh) < 56 or len(strf) < 40:
        raise ValueError("AVI header chunk too short")
    a = struct.unpack("<14I", avih[:56])
    fcc_type, handler = strh[:4], strh[4:8]
    scale, rate, _start, length = struct.unpack("<IIII", strh[20:36])
    compression = strf[16:20]
    width, height = struct.unpack("<ii", strf[4:12])
    if fcc_type != b"vids":
        raise ValueError(f"AVI stream type {fcc_type!r} unsupported")
    if handler != b"MJPG" or compression != b"MJPG":
        raise ValueError(
            f"AVI handler {handler!r}/{compression!r} unsupported "
            "(MJPG only without codec libraries)")
    if a[6] != 1:
        raise ValueError("multi-stream AVI unsupported")
    if rate <= 0 or scale <= 0:
        raise ValueError("AVI rate/scale must be positive")
    return {"width": width, "height": abs(height), "rate": rate,
            "scale": scale, "n_frames": length, "movi": movi,
            "idx1": idx1, "payload_end": end}


def avi_meta(payload: bytes) -> dict:
    """Header-only metadata: ``{width, height, rate, scale, n_frames,
    fps}`` — no frame bytes touched (the metadata-rollup path prunes
    to this)."""
    p = _parse(payload)
    return {"width": p["width"], "height": p["height"],
            "rate": p["rate"], "scale": p["scale"],
            "n_frames": p["n_frames"],
            "fps": round(p["rate"] / p["scale"], 6)}


def avi_frames(payload: bytes) -> list[bytes]:
    """Every frame payload via the sequential ``movi`` walk; frame
    count is cross-checked against the stream header and every frame
    must open with a JPEG SOI."""
    p = _parse(payload)
    _, body_start, body_len = p["movi"]
    out: list[bytes] = []
    for cid, _, s, n in _walk(payload, body_start,
                              body_start + body_len):
        if cid[2:4] not in (b"dc", b"db"):
            raise ValueError(f"non-video chunk {cid!r} in movi")
        frame = payload[s:s + n]
        if frame[:2] != b"\xff\xd8":
            raise ValueError(f"movi frame {len(out)} is not a JPEG")
        out.append(frame)
    if len(out) != p["n_frames"]:
        raise ValueError(
            f"AVI header says {p['n_frames']} frames, movi has "
            f"{len(out)}")
    return out


def _idx1_mode(payload: bytes, p: dict) -> str:
    """Detect the file's idx1 offset convention — ``relative`` (to the
    movi fourcc, the spec reading) or ``absolute`` (file positions,
    what several real muxers write) — ONCE from the first index entry
    and memoize it on the parse dict.  Relative wins when both happen
    to validate (the spec-first precedence, deterministic)."""
    mode = p.get("idx1_mode")
    if mode is None:
        i_start, i_len = p["idx1"]
        if i_len < 16:
            raise ValueError("empty idx1 index")
        ckid0, _f, off0, _s = struct.unpack(
            "<4sIII", payload[i_start:i_start + 16])
        fourcc_pos = p["movi"][0]
        if payload[fourcc_pos + off0:fourcc_pos + off0 + 4] == ckid0:
            mode = "relative"
        elif payload[off0:off0 + 4] == ckid0:
            mode = "absolute"
        else:
            raise ValueError(
                "idx1 offsets match neither the movi-relative nor "
                "the absolute convention")
        p["idx1_mode"] = mode
    return mode


def avi_frame(payload: bytes, idx: int, parsed: dict | None = None
              ) -> bytes:
    """Random access to frame ``idx`` via ``idx1`` — one index entry
    read + one bounded chunk read (the at-scale seek path; a sampler
    pulling 3 frames from a 2-hour file must not walk the file).  The
    chunk header at the seek target is re-validated against the index
    entry, so a corrupt index raises instead of mis-reading.
    ``parsed`` reuses a prior :func:`_parse` result so a multi-point
    sampler pays the header walk once per asset, not per timestamp
    (review r12 finding)."""
    p = parsed if parsed is not None else _parse(payload)
    if p["idx1"] is None:
        raise ValueError("AVI has no idx1 index (seek unsupported)")
    i_start, i_len = p["idx1"]
    n = i_len // 16
    if not 0 <= idx < n:
        raise ValueError(f"frame {idx} out of range (idx1 has {n})")
    ckid, _flags, off, size = struct.unpack(
        "<4sIII", payload[i_start + 16 * idx:i_start + 16 * idx + 16])
    if ckid[2:4] not in (b"dc", b"db"):
        raise ValueError(f"idx1 entry {idx} is not a video chunk")
    fourcc_pos = p["movi"][0]
    # ADVICE r12/r13: some real muxers write idx1 offsets as ABSOLUTE
    # file positions instead of movi-fourcc-relative.  The convention
    # is a property of the FILE, not the entry: detect it ONCE from
    # the first index entry (the ffmpeg approach, memoized on the
    # parse dict) and apply it uniformly — a per-entry retry could
    # silently mix conventions when a movi-relative position happens
    # to land on a plausible chunk header.
    hdr = (fourcc_pos + off if _idx1_mode(payload, p) == "relative"
           else off)
    if payload[hdr:hdr + 4] != ckid:
        raise ValueError(
            f"idx1 entry {idx} does not land on {ckid!r}")
    (clen,) = struct.unpack("<I", payload[hdr + 4:hdr + 8])
    if clen != size:
        raise ValueError(
            f"idx1 size {size} disagrees with chunk size {clen}")
    frame = payload[hdr + 8:hdr + 8 + clen]
    if len(frame) != clen or frame[:2] != b"\xff\xd8":
        raise ValueError(f"idx1 frame {idx} is truncated or not a JPEG")
    return frame


def frame_index_at(payload_or_meta, t_s: float) -> int:
    """Timestamp → frame index: ``floor(t·rate/scale)``, clamped to the
    last frame (sampling past the end returns the final frame, the
    ffmpeg seek convention)."""
    m = payload_or_meta if isinstance(payload_or_meta, dict) \
        else avi_meta(payload_or_meta)
    if t_s < 0:
        raise ValueError("negative timestamp")
    if m["n_frames"] <= 0:
        raise ValueError("AVI with no frames")
    return min(int(t_s * m["rate"] / m["scale"]), m["n_frames"] - 1)


def avi_frame_decoder(payload: bytes, t_s: float,
                      parsed: dict | None = None) -> bytes:
    """REAL drop-in for :func:`..multimodal.fake_frame_decoder` on AVI
    payloads: idx1 seek to the frame covering ``t_s``, then decode the
    JPEG to raw RGB bytes via the real codec.  The container is parsed
    ONCE per call (the parse dict carries rate/scale/n_frames for the
    timestamp map and the idx1 span for the seek); pass ``parsed`` to
    amortize it across a timestamp grid."""
    from .jpeg import decode_jpeg
    p = parsed if parsed is not None else _parse(payload)
    idx = frame_index_at(p, t_s)
    _w, _h, px = decode_jpeg(avi_frame(payload, idx, parsed=p))
    return px
