"""GIF87a/89a codec in pure Python + numpy (no PIL in this container).

Third real image codec beside the zlib PNG and the from-scratch baseline
JPEG (`multimodal.py`, `jpeg.py`): GIF is what a web-scrape multimodal
pipeline actually meets for logos/diagrams/early memes. Implements the
full stills path of the 89a spec: logical screen descriptor, global +
local color tables, variable-width LSB-first LZW with CLEAR/EOI and
dictionary reset at 4096, 255-byte sub-block framing, extension-block
skipping, and Appendix-E four-pass interlacing. Animation (multiple
image descriptors) decodes as the FIRST frame — documented, not hidden.

GIF pixel data is a palette index stream and LZW is lossless, so — like
PNG — an encode→decode round-trip is the identity on the indexed raster,
which is what makes `gif_features` oracle-checkable from the tokens
alone.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------
# LZW (GIF variant: variable code width, LSB-first, CLEAR/EOI)


def _lzw_compress(data: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW over a uint8 index stream → sub-block-framed bytes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    next_code = eoi + 1
    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = -1
    for b in data.tolist():
        if prev < 0:
            prev = b
            continue
        key = (prev, b)
        if key in table:
            prev = table[key]
            continue
        emit(prev)
        table[key] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code == 4096:
            emit(clear)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = b
    if prev >= 0:
        emit(prev)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)

    framed = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        framed.append(len(chunk))
        framed += chunk
    framed.append(0)
    return bytes(framed)


def _lzw_decompress(blocks: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1

    # unwrap sub-blocks, then read variable-width codes LSB-first
    body = bytearray()
    pos = 0
    while pos < len(blocks):
        blen = blocks[pos]
        pos += 1
        if blen == 0:
            break
        body += blocks[pos : pos + blen]
        pos += blen

    seqs: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev = -1
    for byte in body:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                del seqs[eoi + 1 :]
                next_code = eoi + 1
                width = min_code_size + 1
                prev = -1
                continue
            if code == eoi:
                return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8).copy()
            if prev < 0:
                entry = seqs[code]
            elif code < next_code:
                entry = seqs[code]
            elif code == next_code:  # KwKwK
                entry = seqs[prev] + seqs[prev][:1]
            else:
                raise ValueError("corrupt LZW stream")
            if prev >= 0 and next_code < 4096:
                seqs.append(seqs[prev] + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            out += entry
            prev = code
            if len(out) >= n_pixels:
                return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8).copy()
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8).copy()


# --------------------------------------------------------------------------
# container


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(
    pixels: np.ndarray,
    palette: np.ndarray | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode an indexed raster as GIF89a.

    ``pixels``: (h, w) uint8 palette indices. ``palette``: (n, 3) uint8
    RGB rows (defaults to 256-entry grayscale identity). One frame, global
    color table only."""
    if pixels.ndim != 2 or pixels.dtype != np.uint8:
        raise ValueError("pixels must be a (h, w) uint8 index raster")
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    n = len(palette)
    if n < 2 or n > 256 or (n & (n - 1)):
        raise ValueError("palette size must be a power of two in [2, 256]")
    if int(pixels.max(initial=0)) >= n:
        raise ValueError("pixel index out of palette range")
    depth = max(1, n.bit_length() - 1)
    h, w = pixels.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0)
    if interlace:
        order = np.concatenate(
            [np.arange(s, h, step) for s, step in _INTERLACE_PASSES]
        )
        pixels = pixels[order]
    mcs = max(2, depth)
    out.append(mcs)
    out += _lzw_compress(pixels.ravel(), mcs)
    out += b"\x3B"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame of a GIF to an (h, w, 3) uint8 RGB array."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, w, h = struct.unpack("<HHHH", payload[pos : pos + 8])
            iflags = payload[pos + 8]
            pos += 9
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("no color table for image")
            mcs = payload[pos]
            pos += 1
            end = pos
            while payload[end]:
                end += 1 + payload[end]
            end += 1
            idx = _lzw_decompress(payload[pos:end], mcs, w * h)
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            raster = idx.reshape(h, w)
            if iflags & 0x40:  # de-interlace
                order = np.concatenate(
                    [np.arange(s, h, step) for s, step in _INTERLACE_PASSES]
                )
                de = np.empty_like(raster)
                de[order] = raster
                raster = de
            return pal[raster]
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")
