"""ISO-BMFF (MP4) MJPEG video container codec — dependency-free (r13,
VERDICT r12 item 4: the AVI pattern applied to the second container;
the reference has no video surface, this is the beyond-reference
training-data-pipeline brief).

Motion-JPEG in MP4 is the one ISO-BMFF payload expressible without
codec libraries: every sample is a complete JPEG and this repo already
ships a real JPEG codec (:mod:`.jpeg`).  Composition over invention —
the box walk is the ISO/IEC 14496-12 discipline, the per-frame decode
is :func:`.jpeg.decode_jpeg`.

* ``encode_mp4``  — canonical unfragmented muxer: ``ftyp`` + ``mdat``
  (concatenated JPEG samples) + trailing ``moov`` with the full sample
  tables — ``stsd`` with a ``jpeg`` visual sample entry, ``stts``
  (one run), ``stsc`` with samples chunked in PAIRS (so the parser's
  general sample-to-chunk resolution is exercised, not a degenerate
  one-sample-per-chunk layout), ``stsz`` per-sample sizes, ``stco``
  absolute chunk offsets. ``fragmented=True`` muxes the fMP4/DASH
  layout instead: moov-first with empty tables + ``mvex/trex``
  defaults, then ``moof``+``mdat`` pairs (mfhd/tfhd/tfdt/trun) — the
  segmented shape streaming crawl video actually ships.
* ``mp4_meta``    — box-walk parse of the single video trak:
  dimensions (from the sample entry), timescale/delta rational, frame
  count, fps.
* ``mp4_frames``  — every sample via the tables (integrity path:
  sizes/offsets bounds-checked, SOI check per sample, stsz count
  cross-checked against the stts total).
* ``mp4_frame``   — random access to sample ``i``: stsc run walk →
  owning chunk, stco chunk offset + within-chunk size prefix → ONE
  bounded read (the sample tables ARE the index — no ``mdat`` walk;
  the seek path a frame sampler uses at scale).

Version-1 (64-bit) ``mvhd``/``mdhd``/``tkhd`` and ``co64`` are
parsed; non-video traks are skipped (real files carry audio); but a
non-JPEG coding (``avc1``/``hev1``/``vp09``…) is an honest ValueError
— H.264 and friends genuinely need codec libraries, never mis-read
(the decode_png/decode_jpeg discipline).
"""

from __future__ import annotations

import struct


# ------------------------------------------------------------------ mux

def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big")
                + body)


def encode_mp4(width: int, height: int, frames: list[bytes],
               rate: int = 10, scale: int = 1,
               fragmented: bool = False) -> bytes:
    """Mux complete JPEG frame payloads into MJPEG-in-MP4 at
    ``rate/scale`` frames per second (media timescale = ``rate``,
    per-sample delta = ``scale``).

    ``fragmented=False``: the classic unfragmented layout (ftyp +
    mdat + trailing moov with full sample tables). ``fragmented=True``
    (r13): the fMP4/DASH layout real crawl video increasingly ships —
    moov FIRST with EMPTY sample tables + ``mvex/trex`` defaults, then
    one ``moof`` + ``mdat`` pair per TWO samples (mfhd sequence
    numbers, tfhd with default-base-is-moof + default duration, tfdt
    decode times, trun with data-offset + per-sample sizes)."""
    if width <= 0 or height <= 0:
        raise ValueError("MP4 dimensions must be positive")
    if rate <= 0 or scale <= 0:
        raise ValueError("MP4 rate/scale must be positive")
    if not frames:
        raise ValueError("MP4 needs at least one frame")
    for i, f in enumerate(frames):
        if len(f) < 2 or f[:2] != b"\xff\xd8":
            raise ValueError(f"sample {i} is not a JPEG payload")

    n = len(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isom" + b"iso2")
    sizes = [len(f) for f in frames]
    if not fragmented:
        mdat = _box(b"mdat", b"".join(frames))
        # samples are laid out in chunks of TWO (general stsc path);
        # chunk offsets are absolute file offsets into mdat's body
        mdat_body = len(ftyp) + 8
        chunk_offs = []
        off = mdat_body
        for i in range(0, n, 2):
            chunk_offs.append(off)
            off += sum(sizes[i:i + 2])
        stsc_entries = [(1, 2, 1)]
        if n % 2:                       # odd tail chunk holds 1 sample
            if n == 1:
                stsc_entries = [(1, 1, 1)]
            else:
                stsc_entries.append((len(chunk_offs), 1, 1))

    duration = n * scale
    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, rate, duration)
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                      0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 16
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                      0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIII", 0, 0, rate, duration) + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"MJPEG\x00")
    entry = (b"\x00" * 6 + struct.pack(">H", 1)
             + struct.pack(">HH", 0, 0) + b"\x00" * 12
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)
             + struct.pack(">I", 0) + struct.pack(">H", 1)
             + bytes([5]) + b"mjpeg" + b"\x00" * 26
             + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                 + _box(b"jpeg", entry))
    if fragmented:                      # empty tables: samples in moof
        stts = _full(b"stts", 0, 0, struct.pack(">I", 0))
        stsc = _full(b"stsc", 0, 0, struct.pack(">I", 0))
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
        stco = _full(b"stco", 0, 0, struct.pack(">I", 0))
    else:
        stts = _full(b"stts", 0, 0, struct.pack(">I", 1)
                     + struct.pack(">II", n, scale))
        stsc = _full(b"stsc", 0, 0,
                     struct.pack(">I", len(stsc_entries))
                     + b"".join(struct.pack(">III", *e)
                                for e in stsc_entries))
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                     + b"".join(struct.pack(">I", s) for s in sizes))
        stco = _full(b"stco", 0, 0,
                     struct.pack(">I", len(chunk_offs))
                     + b"".join(struct.pack(">I", o)
                                for o in chunk_offs))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    if not fragmented:
        return ftyp + mdat + _box(b"moov", mvhd + trak)

    # ---- fMP4: moov first (empty tables + trex defaults), then one
    # ---- moof+mdat pair per TWO samples
    trex = _full(b"trex", 0, 0,
                 struct.pack(">IIIII", 1, 1, scale, 0, 0))
    out = bytearray(ftyp)
    out += _box(b"moov", mvhd + trak + _box(b"mvex", trex))
    seq = 1
    base_time = 0
    for i in range(0, n, 2):
        chunk = frames[i:i + 2]
        csizes = [len(f) for f in chunk]
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        # tfhd: default-base-is-moof | default-sample-duration
        tfhd = _full(b"tfhd", 0, 0x020008,
                     struct.pack(">II", 1, scale))
        tfdt = _full(b"tfdt", 1, 0, struct.pack(">Q", base_time))

        def trun_box(data_offset):
            # flags: data-offset-present | sample-size-present
            return _full(b"trun", 0, 0x000201,
                         struct.pack(">Ii", len(chunk), data_offset)
                         + b"".join(struct.pack(">I", s)
                                    for s in csizes))

        probe = _box(b"moof", mfhd + _box(b"traf",
                                          tfhd + tfdt + trun_box(0)))
        moof = _box(b"moof", mfhd + _box(b"traf",
                                         tfhd + tfdt
                                         + trun_box(len(probe) + 8)))
        out += moof + _box(b"mdat", b"".join(chunk))
        base_time += len(chunk) * scale
        seq += 1
    return bytes(out)


# ---------------------------------------------------------------- demux

def _boxes(payload: bytes, pos: int, end: int):
    """Yield ``(btype, body_start, body_len)`` for each box in
    ``payload[pos:end]`` (64-bit largesize and size-0-to-end
    handled)."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos:pos + 4])
        btype = payload[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack(">Q", payload[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"truncated MP4 box {btype!r}")
        yield btype, body, pos + size - body
        pos += size


def _find(payload, pos, ln, btype):
    for t, s, n in _boxes(payload, pos, pos + ln):
        if t == btype:
            return s, n
    return None


def _fullbox(payload, s, n):
    """(version, flags, body_start, body_len) of a full box body."""
    if n < 4:
        raise ValueError("truncated MP4 full box")
    return payload[s], int.from_bytes(payload[s + 1:s + 4], "big"), \
        s + 4, n - 4


def _parse(payload: bytes) -> dict:
    """Container parse: locate the single video trak and materialize
    its sample tables, fully validated."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 payload (missing ftyp)")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov")
    vtrak = None
    for t, s, n in _boxes(payload, moov[0], moov[0] + moov[1]):
        if t != b"trak":
            continue
        mdia = _find(payload, s, n, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            continue
        _, _, hs, hn = _fullbox(payload, *hdlr)
        if hn >= 8 and payload[hs + 4:hs + 8] == b"vide":
            if vtrak is not None:
                raise ValueError("multiple MP4 video traks unsupported")
            track_id = 0
            tkhd = _find(payload, s, n, b"tkhd")
            if tkhd is not None:        # track id gates moof fragments
                tv, _, ts_, tn_ = _fullbox(payload, *tkhd)
                at = ts_ + (16 if tv == 1 else 8)
                if at + 4 <= ts_ + tn_:
                    (track_id,) = struct.unpack(
                        ">I", payload[at:at + 4])
            vtrak = (s, n, mdia, track_id)
    if vtrak is None:
        raise ValueError("MP4 has no video trak")
    _, _, mdia, track_id = vtrak

    mdhd = _find(payload, mdia[0], mdia[1], b"mdhd")
    if mdhd is None:
        raise ValueError("MP4 video trak missing mdhd")
    v, _, s, n = _fullbox(payload, *mdhd)
    if v == 1:
        if n < 28:
            raise ValueError("truncated MP4 mdhd")
        (timescale,) = struct.unpack(">I", payload[s + 16:s + 20])
    else:
        if n < 16:
            raise ValueError("truncated MP4 mdhd")
        (timescale,) = struct.unpack(">I", payload[s + 8:s + 12])
    if timescale <= 0:
        raise ValueError("MP4 timescale must be positive")

    minf = _find(payload, mdia[0], mdia[1], b"minf")
    stbl = minf and _find(payload, minf[0], minf[1], b"stbl")
    if not stbl:
        raise ValueError("MP4 video trak missing minf/stbl")

    tables: dict[bytes, tuple] = {}
    for t, s, n in _boxes(payload, stbl[0], stbl[0] + stbl[1]):
        tables[t] = (s, n)
    for req in (b"stsd", b"stts", b"stsc", b"stsz"):
        if req not in tables:
            raise ValueError(f"MP4 stbl missing {req.decode()}")
    if b"stco" not in tables and b"co64" not in tables:
        raise ValueError("MP4 stbl missing stco/co64")

    # stsd: exactly one JPEG visual sample entry
    _, _, s, n = _fullbox(payload, *tables[b"stsd"])
    (n_entries,) = struct.unpack(">I", payload[s:s + 4])
    if n_entries != 1:
        raise ValueError("MP4 multi-entry stsd unsupported")
    ebox = next(_boxes(payload, s + 4, s + n), None)
    if ebox is None:
        raise ValueError("truncated MP4 stsd entry")
    coding, es, en = ebox
    if coding != b"jpeg":
        raise ValueError(
            f"MP4 sample coding {coding!r} unsupported (motion-JPEG "
            "'jpeg' entries only without codec libraries — H.264/HEVC/"
            "VP9 rejected, never mis-read)")
    if en < 78:
        raise ValueError("truncated MP4 visual sample entry")
    width, height = struct.unpack(">HH", payload[es + 24:es + 28])

    # stts: run-length (count, delta) pairs
    _, _, s, n = _fullbox(payload, *tables[b"stts"])
    (cnt,) = struct.unpack(">I", payload[s:s + 4])
    if n < 4 + 8 * cnt:
        raise ValueError("truncated MP4 stts")
    stts = [struct.unpack(">II", payload[s + 4 + 8 * i:
                                         s + 12 + 8 * i])
            for i in range(cnt)]
    if any(d <= 0 for _, d in stts):
        raise ValueError("MP4 stts delta must be positive")
    n_frames = sum(c for c, _ in stts)

    # stsz: per-sample sizes (or one uniform size)
    _, _, s, n = _fullbox(payload, *tables[b"stsz"])
    uniform, count = struct.unpack(">II", payload[s:s + 8])
    if count != n_frames:
        raise ValueError(
            f"MP4 stsz says {count} samples, stts says {n_frames}")
    if uniform:
        sizes = [uniform] * count
    else:
        if n < 8 + 4 * count:
            raise ValueError("truncated MP4 stsz")
        sizes = list(struct.unpack(f">{count}I",
                                   payload[s + 8:s + 8 + 4 * count]))

    # stsc: (first_chunk, samples_per_chunk, sdi) runs — may be EMPTY
    # in a fragmented file (samples live in moof trun tables instead)
    _, _, s, n = _fullbox(payload, *tables[b"stsc"])
    (cnt,) = struct.unpack(">I", payload[s:s + 4])
    if n < 4 + 12 * cnt:
        raise ValueError("truncated MP4 stsc")
    stsc = [struct.unpack(">III", payload[s + 4 + 12 * i:
                                          s + 16 + 12 * i])
            for i in range(cnt)]
    if stsc and (stsc[0][0] != 1 or any(e[1] <= 0 for e in stsc)):
        raise ValueError("malformed MP4 stsc")
    if not stsc and n_frames:
        raise ValueError("MP4 stts has samples but stsc is empty")

    # stco/co64: chunk offsets
    key = b"stco" if b"stco" in tables else b"co64"
    _, _, s, n = _fullbox(payload, *tables[key])
    (cnt,) = struct.unpack(">I", payload[s:s + 4])
    w = 4 if key == b"stco" else 8
    if n < 4 + w * cnt:
        raise ValueError("truncated MP4 chunk-offset table")
    fmt = ">I" if key == b"stco" else ">Q"
    stco = [struct.unpack(fmt, payload[s + 4 + w * i:
                                       s + 4 + w * (i + 1)])[0]
            for i in range(cnt)]

    p = {"width": width, "height": height, "timescale": timescale,
         "stts": stts, "n_frames": n_frames, "sizes": sizes,
         "stsc": stsc, "stco": stco, "payload_len": len(payload)}

    if n_frames == 0:                   # ---- fMP4: samples in moofs
        defaults = _trex_defaults(payload, moov, track_id)
        samples, durations = _parse_fragments(payload, track_id,
                                              defaults)
        if not samples:
            raise ValueError("MP4 has no samples (empty sample "
                             "tables and no moof fragments)")
        # RLE the per-sample durations into stts runs so the
        # timestamp map is shared with the unfragmented path
        runs: list[list[int]] = []
        for d in durations:
            if runs and runs[-1][1] == d:
                runs[-1][0] += 1
            else:
                runs.append([1, d])
        p["stts"] = [tuple(r) for r in runs]
        p["n_frames"] = len(samples)
        p["sizes"] = [sz for _, sz in samples]
        p["frag"] = samples             # direct (offset, size) table
    return p


def _trex_defaults(payload, moov, track_id) -> dict:
    """mvex/trex defaults (sample duration/size) for this track."""
    out = {"duration": 0, "size": 0}
    mvex = _find(payload, moov[0], moov[1], b"mvex")
    if mvex is None:
        return out
    for t, s, n in _boxes(payload, mvex[0], mvex[0] + mvex[1]):
        if t != b"trex" or n < 24:
            continue
        tid, _sdi, ddur, dsize, _fl = struct.unpack(
            ">IIIII", payload[s + 4:s + 24])
        if tid == track_id:
            out = {"duration": ddur, "size": dsize}
    return out


def _parse_fragments(payload, track_id, defaults):
    """Walk top-level ``moof`` boxes and materialize this track's
    samples from the traf/tfhd/trun tables: ``(offset, size)`` per
    sample plus per-sample durations. Handles base-data-offset,
    default-base-is-moof, tfhd/trex defaults, multiple truns per traf
    (a data-offset-less trun continues where the previous one ended),
    and skips other tracks' fragments (real files interleave audio)."""
    try:
        return _parse_fragments_walk(payload, track_id, defaults)
    except struct.error:
        # a truncated moof makes some tfhd/trun field unpack run past
        # the box end; surface it as the documented rejection instead
        # of a raw struct.error (ADVICE r13)
        raise ValueError("truncated MP4 tfhd/trun") from None


def _parse_fragments_walk(payload, track_id, defaults):
    samples: list[tuple[int, int]] = []
    durations: list[int] = []
    for t, s, n in _boxes(payload, 0, len(payload)):
        if t != b"moof":
            continue
        moof_start = s - 8
        for t2, s2, n2 in _boxes(payload, s, s + n):
            if t2 != b"traf":
                continue
            tfhd = _find(payload, s2, n2, b"tfhd")
            if tfhd is None:
                raise ValueError("MP4 traf missing tfhd")
            _, fl, ts, tn = _fullbox(payload, *tfhd)
            q = ts
            (tid,) = struct.unpack(">I", payload[q:q + 4])
            q += 4
            base = moof_start
            if fl & 0x000001:           # base-data-offset
                (base,) = struct.unpack(">Q", payload[q:q + 8])
                q += 8
            if fl & 0x000002:           # sample-description-index
                q += 4
            def_dur = defaults["duration"]
            if fl & 0x000008:
                (def_dur,) = struct.unpack(">I", payload[q:q + 4])
                q += 4
            def_size = defaults["size"]
            if fl & 0x000010:
                (def_size,) = struct.unpack(">I", payload[q:q + 4])
                q += 4
            if fl & 0x020000:           # default-base-is-moof
                base = moof_start
            if tid != track_id:
                continue                # another track's fragment
            cursor = None               # running offset across truns
            for t3, s3, n3 in _boxes(payload, s2, s2 + n2):
                if t3 != b"trun":
                    continue
                _, fl3, s4, n4 = _fullbox(payload, s3, n3)
                (cnt,) = struct.unpack(">I", payload[s4:s4 + 4])
                q3 = s4 + 4
                if fl3 & 0x000001:      # data-offset-present
                    (doff,) = struct.unpack(
                        ">i", payload[q3:q3 + 4])
                    q3 += 4
                    cursor = base + doff
                elif cursor is None:
                    cursor = base
                if fl3 & 0x000004:      # first-sample-flags
                    q3 += 4
                for _ in range(cnt):
                    dur = def_dur
                    if fl3 & 0x000100:
                        (dur,) = struct.unpack(
                            ">I", payload[q3:q3 + 4])
                        q3 += 4
                    size = def_size
                    if fl3 & 0x000200:
                        (size,) = struct.unpack(
                            ">I", payload[q3:q3 + 4])
                        q3 += 4
                    if fl3 & 0x000400:  # per-sample flags
                        q3 += 4
                    if fl3 & 0x000800:  # composition offsets
                        q3 += 4
                    if q3 > s4 + n4:
                        raise ValueError("truncated MP4 trun")
                    if size <= 0:
                        raise ValueError(
                            "fMP4 sample without a size (no trun "
                            "entry, tfhd default, or trex default)")
                    if dur <= 0:
                        raise ValueError(
                            "fMP4 sample without a duration")
                    samples.append((cursor, size))
                    durations.append(dur)
                    cursor += size
    return samples, durations


def _sample_location(p: dict, i: int) -> tuple[int, int]:
    """Absolute (offset, size) of sample ``i`` from the tables: stsc
    run walk → owning chunk, stco offset + within-chunk size prefix.
    Cost is bounded by table size and samples-per-chunk — never a
    payload walk. Fragmented files resolve through the materialized
    trun table directly (one tuple read)."""
    if not 0 <= i < p["n_frames"]:
        raise ValueError(
            f"frame {i} out of range ({p['n_frames']} samples)")
    if "frag" in p:
        return p["frag"][i]
    stsc, stco, sizes = p["stsc"], p["stco"], p["sizes"]
    base = 0                            # first sample of current run
    for j, (first, spc, _sdi) in enumerate(stsc):
        next_first = stsc[j + 1][0] if j + 1 < len(stsc) \
            else len(stco) + 1
        span = (next_first - first) * spc
        if i < base + span:
            rel = i - base
            chunk = first - 1 + rel // spc
            within = rel % spc
            if chunk >= len(stco):
                raise ValueError("MP4 stsc points past stco")
            first_in_chunk = i - within
            off = stco[chunk] + sum(sizes[first_in_chunk:i])
            return off, sizes[i]
        base += span
    raise ValueError("MP4 stsc does not cover all samples")


def mp4_meta(payload: bytes) -> dict:
    """Header-only metadata: ``{width, height, timescale, delta,
    n_frames, fps}`` — sample tables parsed, no frame bytes touched."""
    p = _parse(payload)
    delta = p["stts"][0][1]
    return {"width": p["width"], "height": p["height"],
            "timescale": p["timescale"], "delta": delta,
            "n_frames": p["n_frames"],
            "fps": round(p["timescale"] / delta, 6)}


def mp4_frames(payload: bytes) -> list[bytes]:
    """Every sample payload via the tables; each must open with a JPEG
    SOI and land inside the payload (the integrity path)."""
    p = _parse(payload)
    out = []
    for i in range(p["n_frames"]):
        out.append(mp4_frame(payload, i, parsed=p))
    return out


def mp4_frame(payload: bytes, idx: int, parsed: dict | None = None
              ) -> bytes:
    """Random access to sample ``idx`` — table resolve + ONE bounded
    read (the at-scale seek path; no mdat walk).  ``parsed`` reuses a
    prior :func:`_parse` so a multi-point sampler pays the box walk
    once per asset."""
    p = parsed if parsed is not None else _parse(payload)
    off, size = _sample_location(p, idx)
    if off < 0:
        # a hostile/corrupt negative trun data-offset would otherwise
        # slice from the END of the payload via Python negative
        # indexing (ADVICE r13) — never mis-read
        raise ValueError(f"MP4 sample {idx} has a negative offset")
    if off + size > p["payload_len"]:
        raise ValueError(f"MP4 sample {idx} exceeds payload")
    frame = payload[off:off + size]
    if len(frame) != size or frame[:2] != b"\xff\xd8":
        raise ValueError(f"MP4 sample {idx} is truncated or not a JPEG")
    return frame


def frame_index_at(payload_or_meta, t_s: float) -> int:
    """Timestamp → sample index through the stts runs (media time
    ``t·timescale``), clamped to the last sample (the ffmpeg seek
    convention, matching :func:`.video.frame_index_at`)."""
    p = payload_or_meta if isinstance(payload_or_meta, dict) \
        else _parse(payload_or_meta)
    if t_s < 0:
        raise ValueError("negative timestamp")
    if p["n_frames"] <= 0:
        raise ValueError("MP4 with no samples")
    t = int(t_s * p["timescale"])
    idx = 0
    for cnt, delta in p["stts"]:
        span = cnt * delta
        if t < span:
            return min(idx + t // delta, p["n_frames"] - 1)
        t -= span
        idx += cnt
    return p["n_frames"] - 1


def mp4_frame_decoder(payload: bytes, t_s: float,
                      parsed: dict | None = None) -> bytes:
    """REAL seek+decode for MP4 payloads (the AVI
    :func:`.video.avi_frame_decoder` twin): stts timestamp resolve →
    table seek → one bounded read → the real JPEG codec → raw RGB."""
    from .jpeg import decode_jpeg
    p = parsed if parsed is not None else _parse(payload)
    idx = frame_index_at(p, t_s)
    _w, _h, px = decode_jpeg(mp4_frame(payload, idx, parsed=p))
    return px
