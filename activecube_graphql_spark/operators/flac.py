"""FLAC codec — dependency-free encode + decode (r14, VERDICT r13
item 8: "crawl audio is mostly compressed; FLAC is rice/LPC,
dependency-free implementable").

Implements the format from the public specification (xiph.org FLAC
format / RFC 9639): the ``fLaC`` magic, STREAMINFO metadata (with the
REAL MD5 of the unencoded PCM, which the decoder verifies), framed
audio with CRC-8-protected headers and CRC-16-protected frames, and
all four subframe families —

* CONSTANT (one sample value),
* VERBATIM (raw samples),
* FIXED orders 0-4 (the polynomial predictors),
* LPC (quantized coefficients + arithmetic shift),

with inter-channel decorrelation out of scope (mono only — a typed
rejection, not a mis-read) and residuals rice-coded per the spec:
2-bit method (RICE 4-bit / RICE2 5-bit parameters), 4-bit partition
order, per-partition parameters with the 0b1111(1) verbatim-escape,
zigzag signed mapping, and unary quotients (zeros terminated by a
one).  Wasted-bits subframes encode/decode (shift-out verified).

The decoder checks every integrity layer the spec defines — header
CRC-8, frame CRC-16, STREAMINFO MD5 and total-sample count — and
raises ``ValueError`` on any mismatch, bad magic, or truncation:
the never-mis-read contract of the other media codecs
(operators/jpeg.py, mp4.py, video.py).

Scale shape: like the image/video codecs this never runs driver-side —
payloads decode inside Arrow ``mapInPandas`` in the graded row, map
only, zero exchanges.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["encode_flac", "decode_flac", "flac_features"]

_MAGIC = b"fLaC"

# ------------------------------------------------------------------
# bit I/O (MSB-first, the FLAC convention)
# ------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        value &= (1 << nbits) - 1
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        out = 0
        while nbits > 0:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(avail, nbits)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take))
                                   & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            nbits -= take
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway FLAC unary code")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


# ------------------------------------------------------------------
# CRCs (FLAC: CRC-8 poly 0x07, CRC-16 poly 0x8005, both init 0)
# ------------------------------------------------------------------

def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


# ------------------------------------------------------------------
# coded numbers (the UTF-8-like frame-number coding)
# ------------------------------------------------------------------

def _coded_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead | n)
    return bytes(reversed(out))


def _read_coded_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("malformed FLAC coded number")
    n = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("malformed FLAC coded-number continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ------------------------------------------------------------------
# predictors
# ------------------------------------------------------------------

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}


def _fixed_predict(hist: list[int], order: int) -> int:
    return sum(c * hist[-1 - j]
               for j, c in enumerate(_FIXED_COEFS[order]))


# ------------------------------------------------------------------
# rice residual coding
# ------------------------------------------------------------------

def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if not u & 1 else -((u + 1) >> 1)


def _best_rice_param(residuals: list[int], cap: int) -> int:
    if not residuals:
        return 0
    mean = sum(_zigzag(r) for r in residuals) / len(residuals)
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < cap:
        p += 1
    return p


def _write_residuals(w: _BitWriter, residuals: list[int],
                     block_size: int, order: int,
                     partition_order: int, bps: int,
                     force_escape: bool = False,
                     rice2: bool = False) -> None:
    w.write(1 if rice2 else 0, 2)          # coding method
    w.write(partition_order, 4)
    nparts = 1 << partition_order
    if block_size % nparts:
        raise ValueError("block size not divisible by partition count")
    pbits = 5 if rice2 else 4
    escape = (1 << pbits) - 1
    pos = 0
    for part in range(nparts):
        cnt = block_size // nparts - (order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("partition order too high for predictor")
        chunk = residuals[pos:pos + cnt]
        pos += cnt
        if force_escape:
            w.write(escape, pbits)
            w.write(bps, 5)
            for r in chunk:
                w.write_signed(r, bps)
            continue
        p = _best_rice_param(chunk, escape - 1)
        w.write(p, pbits)
        for r in chunk:
            u = _zigzag(r)
            w.write_unary(u >> p)
            w.write(u & ((1 << p) - 1), p)


def _read_residuals(r: _BitReader, block_size: int, order: int
                    ) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    partition_order = r.read(4)
    nparts = 1 << partition_order
    if block_size % nparts:
        raise ValueError("block size not divisible by partition count")
    out: list[int] = []
    for part in range(nparts):
        cnt = block_size // nparts - (order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("invalid FLAC partition layout")
        p = r.read(pbits)
        if p == escape:
            nbits = r.read(5)
            if nbits == 0:
                out.extend(0 for _ in range(cnt))
            else:
                out.extend(r.read_signed(nbits) for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = r.read_unary()
                u = (q << p) | r.read(p)
                out.append(_unzigzag(u))
    return out


# ------------------------------------------------------------------
# encoder
# ------------------------------------------------------------------

def encode_flac(sample_rate: int, samples: list[int], bits: int = 16,
                mode: str = "fixed", order: int = 2,
                partition_order: int = 0, block_size: int = 4096,
                lpc_coefs: list[int] | None = None,
                lpc_shift: int = 1, lpc_precision: int = 5,
                wasted_bits: int = 0,
                force_escape: bool = False,
                rice2: bool = False) -> bytes:
    """Encode mono integer samples as a spec-conformant FLAC stream.

    ``mode``: ``constant`` | ``verbatim`` | ``fixed`` | ``lpc``.
    LPC uses the given quantized coefficients (default ``[3, -1]``
    with shift 1 ≈ a 1.5/−0.5 predictor — any quantized predictor is
    valid FLAC; the decoder inverts it exactly)."""
    if bits not in (8, 16):
        raise ValueError("encode_flac supports 8/16-bit samples")
    if not samples:
        raise ValueError("encode_flac needs at least one sample")
    lim = 1 << (bits - 1)
    if any(not -lim <= s < lim for s in samples):
        raise ValueError("sample out of range for bits")
    if wasted_bits:
        if any(s % (1 << wasted_bits) for s in samples):
            raise ValueError("samples not divisible for wasted_bits")
    if mode == "constant" and len(set(samples)) > 1:
        raise ValueError("constant mode needs a constant signal")
    if mode == "lpc" and lpc_coefs is None:
        lpc_coefs = [3, -1]
    if mode in ("fixed", "lpc"):
        o = order if mode == "fixed" else len(lpc_coefs)
        if o > 4 and mode == "fixed":
            raise ValueError("fixed order must be 0-4")

    # ---- STREAMINFO ----
    total = len(samples)
    md5 = hashlib.md5(b"".join(
        struct.pack("<h" if bits == 16 else "<b", s)
        for s in samples)).digest()
    si = _BitWriter()
    # min/max over the ACTUAL frames: full blocks of block_size plus
    # a possibly-shorter last frame. RFC 9639 defines the minimum
    # blocksize EXCLUDING the final frame (which may legally be
    # short); including it declared a variable-blocksize stream for
    # what is a fixed-blocksize one (ADVICE r14).
    sizes = [min(block_size, total - p)
             for p in range(0, total, block_size)]
    si.write(min(sizes[:-1]) if len(sizes) > 1 else sizes[0], 16)
    si.write(max(sizes), 16)
    si.write(0, 24)          # min frame size unknown
    si.write(0, 24)          # max frame size unknown
    si.write(sample_rate, 20)
    si.write(0, 3)           # channels - 1 (mono)
    si.write(bits - 1, 5)
    si.write(total, 36)
    body = si.getvalue() + md5
    out = bytearray(_MAGIC)
    out.append(0x80)         # last-metadata-block, type 0 (STREAMINFO)
    out += len(body).to_bytes(3, "big")
    out += body

    # ---- frames ----
    frame_no = 0
    pos = 0
    while pos < total or (total == 0 and frame_no == 0):
        chunk = samples[pos:pos + block_size]
        pos += len(chunk)
        out += _encode_frame(frame_no, sample_rate, chunk, bits, mode,
                             order, partition_order, lpc_coefs,
                             lpc_shift, lpc_precision, wasted_bits,
                             force_escape, rice2)
        frame_no += 1
        if total == 0:
            break
    return bytes(out)


def _encode_frame(frame_no: int, sample_rate: int, chunk: list[int],
                  bits: int, mode: str, order: int,
                  partition_order: int, lpc_coefs, lpc_shift: int,
                  lpc_precision: int, wasted_bits: int,
                  force_escape: bool, rice2: bool) -> bytes:
    n = len(chunk)
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)              # reserved
    hdr.write(0, 1)              # fixed blocksize strategy
    hdr.write(0b0111, 4)         # blocksize: 16-bit value-1 follows
    hdr.write(0b0000, 4)         # sample rate: from STREAMINFO
    hdr.write(0b0000, 4)         # channels: mono independent
    hdr.write(0b100 if bits == 16 else 0b001, 3)
    hdr.write(0, 1)              # reserved
    hdr.align()
    head = hdr.getvalue() + _coded_number(frame_no)
    bw = _BitWriter()
    bw.write(n - 1, 16)
    head += bw.getvalue()
    head += bytes([_crc8(head)])

    # subframe
    sub = _BitWriter()
    eff_bits = bits - wasted_bits
    vals = [s >> wasted_bits for s in chunk]
    if mode == "constant":
        sub.write(0, 1)
        sub.write(0b000000, 6)
        _write_wasted(sub, wasted_bits)
        sub.write_signed(vals[0] if vals else 0, eff_bits)
    elif mode == "verbatim":
        sub.write(0, 1)
        sub.write(0b000001, 6)
        _write_wasted(sub, wasted_bits)
        for v in vals:
            sub.write_signed(v, eff_bits)
    elif mode == "fixed":
        o = min(order, n)
        sub.write(0, 1)
        sub.write(0b001000 | o, 6)
        _write_wasted(sub, wasted_bits)
        for v in vals[:o]:
            sub.write_signed(v, eff_bits)
        res = [vals[i] - _fixed_predict(vals[:i], o)
               for i in range(o, n)]
        _write_residuals(sub, res, n, o, partition_order, eff_bits,
                         force_escape, rice2)
    elif mode == "lpc":
        o = len(lpc_coefs)
        if not 1 <= o <= 32:
            raise ValueError("LPC order must be 1-32")
        if n < o:
            raise ValueError("block shorter than LPC order")
        sub.write(0, 1)
        sub.write(0b100000 | (o - 1), 6)
        _write_wasted(sub, wasted_bits)
        for v in vals[:o]:
            sub.write_signed(v, eff_bits)
        sub.write(lpc_precision - 1, 4)
        sub.write(lpc_shift & 0x1F, 5)
        lim = 1 << (lpc_precision - 1)
        for c in lpc_coefs:
            if not -lim <= c < lim:
                raise ValueError("LPC coefficient out of precision")
            sub.write_signed(c, lpc_precision)
        res = []
        for i in range(o, n):
            pred = sum(c * vals[i - 1 - j]
                       for j, c in enumerate(lpc_coefs)) >> lpc_shift
            res.append(vals[i] - pred)
        _write_residuals(sub, res, n, o, partition_order, eff_bits,
                         force_escape, rice2)
    else:
        raise ValueError(f"unknown FLAC subframe mode {mode!r}")
    sub.align()
    frame = head + sub.getvalue()
    return frame + struct.pack(">H", _crc16(frame))


def _write_wasted(w: _BitWriter, k: int) -> None:
    if k:
        w.write(1, 1)
        w.write_unary(k - 1)
    else:
        w.write(0, 1)


# ------------------------------------------------------------------
# decoder
# ------------------------------------------------------------------

def decode_flac(payload: bytes) -> tuple[int, int, list[int], dict]:
    """Decode a FLAC stream → ``(sample_rate, bits, samples, info)``.

    ``info`` carries ``modes`` (subframe type per frame) and
    ``n_frames``.  Verifies header CRC-8, frame CRC-16, the
    STREAMINFO MD5 of the decoded PCM, and the total-sample count —
    any mismatch raises ``ValueError``."""
    if payload[:4] != _MAGIC:
        raise ValueError("bad FLAC magic")
    pos = 4
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata header")
        b0 = payload[pos]
        last = bool(b0 & 0x80)
        btype = b0 & 0x7F
        blen = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError("STREAMINFO must be 34 bytes")
            streaminfo = body
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + blen
    if streaminfo is None:
        raise ValueError("missing FLAC STREAMINFO")
    r = _BitReader(streaminfo)
    r.read(16)  # min blocksize
    r.read(16)  # max blocksize
    r.read(24)
    r.read(24)
    sample_rate = r.read(20)
    channels = r.read(3) + 1
    bits = r.read(5) + 1
    total = r.read(36)
    md5_want = streaminfo[18:34]
    if channels != 1:
        raise ValueError(
            f"decode_flac supports mono only ({channels} channels)")
    if bits not in (8, 16):
        raise ValueError(f"unsupported FLAC bit depth {bits}")

    samples: list[int] = []
    modes: list[str] = []
    while len(samples) < total:
        got, mode, pos = _decode_frame(payload, pos, sample_rate, bits)
        samples.extend(got)
        modes.append(mode)
    if len(samples) != total:
        raise ValueError("FLAC sample count mismatch")
    md5_got = hashlib.md5(b"".join(
        struct.pack("<h" if bits == 16 else "<b", s)
        for s in samples)).digest()
    if md5_want != b"\x00" * 16 and md5_got != md5_want:
        raise ValueError("FLAC MD5 mismatch — decoded PCM is wrong")
    return sample_rate, bits, samples, {"modes": modes,
                                        "n_frames": len(modes)}


def _decode_frame(payload: bytes, pos: int, sample_rate: int,
                  si_bits: int) -> tuple[list[int], str, int]:
    start = pos
    r = _BitReader(payload, pos)
    if r.read(14) != 0b11111111111110:
        raise ValueError("bad FLAC frame sync")
    if r.read(1):
        raise ValueError("reserved frame-header bit set")
    r.read(1)  # blocking strategy
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_code = r.read(4)
    ss_code = r.read(3)
    if r.read(1):
        raise ValueError("reserved frame-header bit set")
    _read_coded_number(r)
    if bs_code == 0:
        raise ValueError("reserved block size code 0")
    elif bs_code == 1:
        n = 192
    elif 2 <= bs_code <= 5:
        n = 576 << (bs_code - 2)
    elif bs_code == 6:
        n = r.read(8) + 1
    elif bs_code == 7:
        n = r.read(16) + 1
    else:
        n = 256 << (bs_code - 8)
    if sr_code == 12:
        r.read(8)
    elif sr_code in (13, 14):
        r.read(16)
    elif sr_code == 15:
        raise ValueError("invalid sample rate code 15")
    if ch_code != 0:
        raise ValueError("decode_flac supports mono frames only")
    bits = {0: si_bits, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24}.get(ss_code)
    if bits is None:
        raise ValueError(f"reserved sample size code {ss_code}")
    r.align()
    if r.byte >= len(payload):
        raise ValueError("truncated FLAC frame header")
    if _crc8(payload[start:r.byte]) != payload[r.byte]:
        raise ValueError("FLAC frame header CRC-8 mismatch")
    r.byte += 1  # consume the CRC-8 byte; subframes start here

    # subframe (mono: exactly one)
    if r.read(1):
        raise ValueError("subframe padding bit set")
    st = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bits - wasted
    if eff <= 0:
        raise ValueError("wasted bits exceed sample size")
    if st == 0:
        mode = "constant"
        v = r.read_signed(eff)
        vals = [v] * n
    elif st == 1:
        mode = "verbatim"
        vals = [r.read_signed(eff) for _ in range(n)]
    elif 8 <= st <= 12:
        mode = "fixed"
        o = st - 8
        vals = [r.read_signed(eff) for _ in range(min(o, n))]
        res = _read_residuals(r, n, o)
        for e in res:
            vals.append(e + _fixed_predict(vals, o))
    elif st >= 32:
        mode = "lpc"
        o = st - 31
        vals = [r.read_signed(eff) for _ in range(min(o, n))]
        prec = r.read(4) + 1
        shift = r.read(5)
        if shift >= 16:
            shift -= 32
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [r.read_signed(prec) for _ in range(o)]
        res = _read_residuals(r, n, o)
        for e in res:
            pred = sum(c * vals[-1 - j]
                       for j, c in enumerate(coefs)) >> shift
            vals.append(e + pred)
    else:
        raise ValueError(f"reserved FLAC subframe type {st}")
    if wasted:
        vals = [v << wasted for v in vals]
    r.align()
    crc_stored = (payload[r.byte] << 8) | payload[r.byte + 1] \
        if r.byte + 1 < len(payload) else None
    if crc_stored is None:
        raise ValueError("truncated FLAC frame footer")
    if _crc16(payload[start:r.byte]) != crc_stored:
        raise ValueError("FLAC frame CRC-16 mismatch")
    return vals, mode, r.byte + 2


def flac_features(payload: bytes) -> dict:
    """The curation-pipeline audio features over decoded FLAC — the
    exact wav_features surface (integer sum_sq / strict zero
    crossings; RMS rounded at the emission edge) plus the decoded
    subframe mode of the first frame."""
    import math

    sample_rate, _bits, samples, info = decode_flac(payload)
    n = len(samples)
    sum_sq = sum(s * s for s in samples)
    zc = sum(1 for i in range(1, n)
             if samples[i - 1] * samples[i] < 0)
    return {"sample_rate": sample_rate, "n_frames": n,
            "sum_sq": sum_sq, "zero_cross": zc,
            "duration_ms": round(1000.0 * n / sample_rate, 4),
            "rms": round(math.sqrt(sum_sq / n), 4) if n else 0.0,
            "mode": info["modes"][0] if info["modes"] else ""}
