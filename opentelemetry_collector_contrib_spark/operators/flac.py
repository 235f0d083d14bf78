"""FLAC codec in pure python + numpy — the compressed-audio member of the
multimodal suite (PGM/PPM, WAV, PNG, baseline JPEG, GIF, AVI are the
siblings; MP3 stays honestly stubbed — its hybrid filterbank/Huffman stack
is out of scope).

Spec: the public FLAC format (xiph.org / RFC 9639). Implemented surface —
16-bit mono/stereo-independent streams:

- container: "fLaC" marker, STREAMINFO metadata block
- frames: 14-bit sync, fixed-blocksize strategy, UTF-8 frame numbers,
  CRC-8 header check, CRC-16 frame check
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC (any order —
  quantized coefficients + shift)
- residuals: rice partitions (RICE 4-bit and RICE2 5-bit parameters,
  escape code → verbatim residuals), any partition order

The ENCODER emits CONSTANT / VERBATIM / FIXED 0-2 (best-of by residual
magnitude) and, on request, an LPC subframe whose quantized coefficients
equal the FIXED order-2 predictor (legal LPC, exercises the decode path's
precision/shift handling). Encoding is deterministic — byte-identical
output for identical samples — which the WebDataset shard discipline and
the dual-engine oracles rely on.

Like the sibling codecs this is a correctness/plumbing implementation for
the distributed mapInPandas decode frame, not a bandwidth-tuned library:
bit IO is per-frame python over small test payloads.
"""

from __future__ import annotations

import struct

import numpy as np

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TABLE[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_code(n: int) -> bytes:
    """FLAC's extended-UTF-8 coding of frame numbers."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead | (n >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _utf8_decode(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        n = (n << 6) | (r.read(8) & 0x3F)
    return n


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res << 1, (-res << 1) - 1).astype(np.int64)


def _rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = int(np.abs(res).mean()) + 1
    k = max(0, min(14, int(mean).bit_length() - 1))
    return k


def _write_rice(w: _BitWriter, res: np.ndarray, k: int) -> None:
    for z in _zigzag(res):
        z = int(z)
        w.write_unary(z >> k)
        if k:
            w.write(z & ((1 << k) - 1), k)


def _encode_subframe(w: _BitWriter, x: np.ndarray, use_lpc: bool) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if n and np.all(x == x[0]):
        w.write(0, 1)           # zero padding bit
        w.write(0b000000, 6)    # CONSTANT
        w.write(0, 1)           # no wasted bits
        w.write(int(x[0]) & 0xFFFF, 16)
        return
    # pick the cheapest of fixed orders 0..2 by |residual| sum
    best_o, best_res, best_cost = 0, x, None
    for o in range(0, 3):
        if n <= o:
            break
        res = _fixed_residual(x, o)
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best_o, best_res, best_cost = o, res, cost
    verbatim_cost = n * 16
    rice_k = _rice_param(best_res)
    approx_bits = len(best_res) * (rice_k + 2) + best_o * 16
    if approx_bits >= verbatim_cost:
        w.write(0, 1)
        w.write(0b000001, 6)    # VERBATIM
        w.write(0, 1)
        for v in x:
            w.write(int(v) & 0xFFFF, 16)
        return
    if use_lpc and best_o == 2:
        # LPC subframe mathematically identical to FIXED order 2:
        # coeffs [2, -1], precision 4 bits, shift 0 — exercises the
        # decoder's precision/shift/coefficient path
        w.write(0, 1)
        w.write(0b100001, 6)    # LPC, order-1 = 1 → order 2
        w.write(0, 1)
        for v in x[:2]:
            w.write(int(v) & 0xFFFF, 16)   # warmup
        w.write(4 - 1, 4)       # precision-1
        w.write(0, 5)           # shift (signed 5 bits)
        w.write(2 & 0xF, 4)     # coeff 2
        w.write(-1 & 0xF, 4)    # coeff -1
    else:
        w.write(0, 1)
        w.write(0b001000 | best_o, 6)  # FIXED order
        w.write(0, 1)
        for v in x[:best_o]:
            w.write(int(v) & 0xFFFF, 16)
    # residual: partition order 0, RICE (4-bit param)
    w.write(0b00, 2)            # residual coding method: RICE
    w.write(0, 4)               # partition order 0
    w.write(rice_k, 4)
    _write_rice(w, best_res, rice_k)


def encode_flac(samples: np.ndarray, rate: int = 8000, block: int = 64,
                use_lpc: bool = False) -> bytes:
    """16-bit mono FLAC. Deterministic; frames of ``block`` samples (last
    frame shorter)."""
    x = np.asarray(samples, dtype=np.int16).astype(np.int64)
    n = len(x)
    out = bytearray(b"fLaC")
    # STREAMINFO: last-block flag + type 0, length 34
    info = struct.pack(">HH", block, block)  # min/max blocksize
    info += b"\x00\x00\x00" * 2              # min/max framesize unknown
    w = _BitWriter()
    w.write(rate, 20)
    w.write(0, 3)    # channels-1 = 0 (mono)
    w.write(15, 5)   # bits-1 = 15
    w.write(n, 36)
    info += w.buf + bytes(16)  # (20+3+5+36 = 64 bits = 8 bytes) + zero MD5
    out += bytes([0x80 | 0]) + len(info).to_bytes(3, "big") + info
    fno = 0
    for s0 in range(0, n, block):  # zero samples → zero frames
        fx = x[s0: s0 + block]
        bs = len(fx)
        h = _BitWriter()
        h.write(0b11111111111110, 14)
        h.write(0, 1)            # reserved
        h.write(0, 1)            # fixed blocksize strategy
        h.write(0b0111, 4)       # blocksize: 16 bits at end of header - 1
        h.write(0b0000, 4)       # sample rate: from STREAMINFO
        h.write(0, 4)            # channel assignment: mono
        h.write(0b100, 3)        # sample size: 16 bits
        h.write(0, 1)            # reserved
        h.align()
        hdr = bytes(h.buf) + _utf8_code(fno) + struct.pack(">H", bs - 1)
        hdr += bytes([_crc8(hdr)])
        body = _BitWriter()
        _encode_subframe(body, fx, use_lpc)
        body.align()
        frame = hdr + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        fno += 1
        if n == 0:
            break
    return bytes(out)


def _read_rice_partition(r: _BitReader, count: int, rice2: bool) -> list[int]:
    pbits = 5 if rice2 else 4
    k = r.read(pbits)
    esc = (1 << pbits) - 1
    out = []
    if k == esc:  # escape: raw residuals at explicit bit width
        width = r.read(5)
        for _ in range(count):
            v = r.read(width)
            if width and v >= (1 << (width - 1)):  # sign-extend
                v -= 1 << width
            out.append(v)
        return out
    for _ in range(count):
        q = r.read_unary()
        z = (q << k) | (r.read(k) if k else 0)
        out.append((z >> 1) ^ -(z & 1))
    return out


def _read_residual(r: _BitReader, bs: int, order: int) -> list[int]:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual method {method}")
    porder = r.read(4)
    nparts = 1 << porder
    res: list[int] = []
    for p in range(nparts):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        res.extend(_read_rice_partition(r, cnt, rice2=method == 1))
    return res


def _decode_subframe(r: _BitReader, bs: int, bits: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bits -= wasted

    def s16(v: int) -> int:
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    if t == 0b000000:  # CONSTANT
        out = np.full(bs, s16(r.read(bits)), dtype=np.int64)
    elif t == 0b000001:  # VERBATIM
        out = np.array([s16(r.read(bits)) for _ in range(bs)], dtype=np.int64)
    elif 0b001000 <= t <= 0b001100:  # FIXED 0..4
        order = t & 0x7
        warm = [s16(r.read(bits)) for _ in range(order)]
        res = _read_residual(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, bs):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out[i] = pred + res[i - order]
    elif t & 0b100000:  # LPC
        order = (t & 0x1F) + 1
        warm = [s16(r.read(bits)) for _ in range(order)]
        prec = r.read(4) + 1
        shift = r.read(5)
        if shift >= 16:  # signed 5-bit
            shift -= 32
        if shift < 0:
            # negative quantization shift is spec-invalid; reject here so a
            # malformed stream surfaces as a diagnostic, not `pred >> -n`.
            raise ValueError("reserved negative LPC shift")
        coefs = []
        for _ in range(order):
            c = r.read(prec)
            if c >= (1 << (prec - 1)):
                c -= 1 << prec
            coefs.append(c)
        res = _read_residual(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        for i in range(order, bs):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs)) >> shift
            out[i] = pred + res[i - order]
    else:
        raise ValueError(f"reserved subframe type {t:#08b}")
    return out << wasted


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 mono samples, sample_rate). Validates the stream marker,
    frame sync codes, header CRC-8 and frame CRC-16."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = nsamples = None
    while True:  # metadata blocks
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        blen = int.from_bytes(payload[pos + 1: pos + 4], "big")
        body = payload[pos + 4: pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            r = _BitReader(body, 4 + 6)  # skip blocksizes+framesizes
            rate = r.read(20)
            channels = r.read(3) + 1
            bits = r.read(5) + 1
            nsamples = r.read(36)
            if channels != 1 or bits != 16:
                raise NotImplementedError("decoder handles 16-bit mono")
        pos += 4 + blen
        if last:
            break
    if rate is None:
        raise ValueError("missing STREAMINFO")
    out: list[np.ndarray] = []
    got = 0
    while got < (nsamples or 0) and pos < len(payload):
        r = _BitReader(payload, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        r.read(1)
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        r.read(4)  # channel assignment (mono)
        r.read(3)  # sample size code
        r.read(1)
        _utf8_decode(r)
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif bs_code == 0:
            # 0b0000 is reserved by the spec; without this guard the
            # fallback below would raise a confusing negative-shift
            # ValueError instead of the module's reserved-code style.
            raise ValueError("reserved blocksize code 0b0000")
        else:
            bs = 576 << (bs_code - 2) if 2 <= bs_code <= 5 else 256 << (bs_code - 8)
        if sr_code in (0b1100, 0b1101, 0b1110):
            r.read(8 if sr_code == 0b1100 else 16)
        r.align()
        hdr_len = r.byte - pos
        crc8 = payload[r.byte]
        if _crc8(payload[pos: pos + hdr_len]) != crc8:
            raise ValueError("frame header CRC-8 mismatch")
        r.byte += 1
        samples = _decode_subframe(r, bs, 16)
        r.align()
        frame_bytes = payload[pos: r.byte]
        crc16 = struct.unpack(">H", payload[r.byte: r.byte + 2])[0]
        if _crc16(frame_bytes) != crc16:
            raise ValueError("frame CRC-16 mismatch")
        pos = r.byte + 2
        out.append(samples)
        got += bs
    dec = np.concatenate(out) if out else np.array([], dtype=np.int64)
    if nsamples:
        dec = dec[:nsamples]
    return dec.astype(np.int16), rate
