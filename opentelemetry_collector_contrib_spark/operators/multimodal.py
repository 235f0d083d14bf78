"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition strategy, Arrow batch shape,
UDF signatures) is real and tested. Codec coverage is split honestly:

- REAL decoders (stdlib/numpy only, no external libs): PGM/PPM images
  (P2/P3 ASCII, P5/P6 binary — pure parsing), PNG (8-bit gray/RGB:
  chunk walk + ``zlib`` inflate + vectorized numpy unfilter of all five
  scanline filters), baseline JPEG (operators/jpeg: Annex K tables,
  canonical Huffman, matrix DCT — encoder AND decoder), and RIFF/PCM WAV
  audio (stdlib ``wave``) plus FLAC (operators/flac: frames, CRC-8/16,
  rice residuals, CONSTANT/VERBATIM/FIXED/LPC subframes). ``decode_and_featurize_real`` runs them
  distributed over mapInPandas and extracts pixel/sample-domain features.
- STUBBED codecs (MP3/H.264 — would need ffmpeg-class libraries, not in
  this container): dispatch raises NotImplementedError; ``fake=True``
  swaps in a deterministic stand-in so the plumbing is exercisable for
  any mime.

Batch shape contract: mapInPandas receives column-pruned Arrow batches —
binary payloads stream batch-by-batch, never materialized per partition,
so executor memory is bounded by (arrow batch rows × max payload size).
"""

from __future__ import annotations

import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql import functions as F

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes int, mean_byte double, feature array<float>"
)


def synthetic_media_df(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake corpus: payload = seeded pseudo-random bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = [
                (np.arange(64, dtype=np.uint64) * np.uint64(i * 2654435761 + 12345))
                .astype(np.uint8)
                .tobytes()
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "mime": ["image/fake"] * len(ids),
                    "meta": [
                        {"width": 8, "height": 8, "duration_ms": int(i) % 5000 + 1000, "codec": "raw"}
                        for i in ids
                    ],
                }
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------- real codecs
# Pure-stdlib/numpy encode+decode for the formats that need no external
# libraries. Encoders exist so tests and synthetic corpora can round-trip
# genuine bytes through the distributed decode path.


def encode_pgm(pixels: np.ndarray) -> bytes:
    """Grayscale (h, w) uint8 → binary PGM (P5)."""
    h, w = pixels.shape
    return f"P5\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """RGB (h, w, 3) uint8 → binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Mono int16 samples → RIFF/PCM WAV via stdlib wave."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ------------------------------------------------------------------- PNG
# 8-bit greyscale / RGB PNG, stdlib zlib + numpy only. The encoder applies
# a caller-chosen filter per scanline (default cycles None/Sub/Up/Average/
# Paeth) so a decode round-trip exercises every unfilter branch; filtering
# is lossless, so decoded pixels equal the input exactly — which is what
# makes a PNG round-trip SQL-oracle-checkable from the source tokens.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a scanline."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def encode_png(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → PNG bytes (bit depth 8, no
    interlace). ``filters`` picks the filter type per scanline (0..4);
    default cycles 0,1,2,3,4 so decoding exercises every unfilter path."""
    import zlib

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        color_type, bpp = 0, 1
        raw = px
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w, _ = px.shape
        color_type, bpp = 2, 3
        raw = px.reshape(h, w * 3)
    else:
        raise ValueError(f"encode_png: unsupported shape {px.shape}")
    if filters is None:
        filters = [r % 5 for r in range(h)]
    stride = raw.shape[1]
    # shifted views: left = recon[x-bpp] (zeros at x<bpp), up = prior row
    left = np.zeros_like(raw)
    left[:, bpp:] = raw[:, :-bpp]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    out = bytearray()
    for r in range(h):
        f = int(filters[r])
        row = raw[r].astype(np.int16)
        if f == 0:
            filt = raw[r]
        elif f == 1:
            filt = (row - left[r]).astype(np.uint8)
        elif f == 2:
            filt = (row - up[r]).astype(np.uint8)
        elif f == 3:
            filt = (row - ((left[r].astype(np.int16) + up[r]) >> 1)).astype(np.uint8)
        elif f == 4:
            ul = np.zeros(stride, dtype=np.uint8)
            if r > 0:
                ul[bpp:] = raw[r - 1, :-bpp]
            filt = (row - _paeth(left[r], up[r], ul)).astype(np.uint8)
        else:
            raise ValueError(f"encode_png: bad filter {f}")
        out.append(f)
        out += filt.tobytes()
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → uint8 array, (h, w) gray or (h, w, 3) RGB. Supports bit depth
    8, color types 0/2, no interlace — the subset ``encode_png`` emits and
    the common web-scrape case. Chunk CRCs are verified; unfiltering is
    numpy-vectorized where the recurrence allows (Up fully; Sub via
    per-lane modular cumsum); Average/Paeth carry a true sequential
    dependency on recon[x-bpp] so they walk the scanline byte-wise —
    acceptable because scanlines are short relative to row count and the
    decode itself is distributed across mapInPandas tasks."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    w = h = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(payload[pos + 8 + ln : pos + 12 + ln], "big")
        if (zlib.crc32(tag + body) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, color_type, comp, filt, interlace = body[8:13]
            if depth != 8 or color_type not in (0, 2):
                raise ValueError(
                    f"PNG depth={depth} color_type={color_type} not supported "
                    "(8-bit gray/RGB only)"
                )
            if comp or filt or interlace:
                raise ValueError("PNG interlace/nonzero method not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    bpp = 3 if color_type == 2 else 1
    stride = w * bpp
    data = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(data) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    data = data.reshape(h, stride + 1)
    ftypes = data[:, 0]
    rows = data[:, 1:].astype(np.int16)  # headroom for additive unfilter
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f = int(ftypes[r])
        row = rows[r]
        if f == 0:
            cur = row.astype(np.uint8)
        elif f == 1:
            # recon[x] = raw[x] + recon[x-bpp]: per-lane prefix sum mod 256
            cur = np.empty(stride, dtype=np.uint8)
            for lane in range(bpp):
                cur[lane::bpp] = (
                    np.cumsum(row[lane::bpp].astype(np.int64)) % 256
                ).astype(np.uint8)
        elif f == 2:
            cur = ((row + prev) % 256).astype(np.uint8)
        elif f == 3:
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(row[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG bad filter type {f}")
        recon[r] = cur
        prev = cur
    return recon.reshape((h, w, 3) if color_type == 2 else (h, w))


def decode_netpbm(payload: bytes) -> np.ndarray:
    """PGM/PPM decode (P2/P3 ASCII, P5/P6 binary) → uint8 array of shape
    (h, w) gray or (h, w, 3) RGB. Pure parsing; raises ValueError on
    malformed input."""
    if not payload or payload[:1] != b"P":
        raise ValueError("not a netpbm payload")
    magic = payload[:2].decode("ascii", "strict")
    if magic not in ("P2", "P3", "P5", "P6"):
        raise ValueError(f"unsupported netpbm magic {magic}")
    # tokenize header: magic, width, height, maxval (comments start with #)
    pos, tokens = 2, []
    while len(tokens) < 3:
        # skip whitespace/comments
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if maxval > 255:
        # a 16-bit PGM/PPM is valid netpbm but 2 bytes/sample — decoding it
        # as uint8 would silently garble the raster
        raise ValueError(f"netpbm maxval {maxval} > 255 (16-bit) not supported")
    channels = 3 if magic in ("P3", "P6") else 1
    if magic in ("P5", "P6"):
        pos += 1  # single whitespace after maxval
        raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels, offset=pos)
    else:
        vals = [int(x) for x in payload[pos:].split()[: w * h * channels]]
        raster = np.array(vals, dtype=np.uint8)
    return raster.reshape((h, w, 3) if channels == 3 else (h, w))


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/PCM WAV → (mono float32 samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as r:
        rate = r.getframerate()
        n = r.getnframes()
        width = r.getsampwidth()
        ch = r.getnchannels()
        raw = r.readframes(n)
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}[width]
    arr = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if width == 1:
        arr = (arr - 128.0) / 128.0
    else:
        arr = arr / float(1 << (8 * width - 1))
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr, rate


def _image_feature(img: np.ndarray) -> np.ndarray:
    """4×4 block-mean grid of the grayscale image → 16-dim float32."""
    gray = img.mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
    h, w = gray.shape
    ys = np.linspace(0, h, 5, dtype=int)
    xs = np.linspace(0, w, 5, dtype=int)
    out = np.zeros(16, dtype=np.float32)
    for i in range(4):
        for j in range(4):
            block = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i * 4 + j] = float(block.mean()) / 255.0
    return out


def _audio_feature(samples: np.ndarray) -> np.ndarray:
    """16-segment RMS energy profile → 16-dim float32."""
    out = np.zeros(16, dtype=np.float32)
    if len(samples):
        bounds = np.linspace(0, len(samples), 17, dtype=int)
        for i in range(16):
            seg = samples[bounds[i] : max(bounds[i + 1], bounds[i] + 1)]
            out[i] = float(np.sqrt(np.mean(seg**2)))
    return out


REAL_FEATURE_SCHEMA = (
    "media_id long, kind string, width int, height int, sample_rate int, "
    "duration_ms int, feature array<float>"
)


def decode_and_featurize_real(df: DataFrame) -> DataFrame:
    """Distributed REAL decode: netpbm images and WAV audio parsed from
    their actual bytes inside mapInPandas (one Arrow batch at a time);
    features come from the decoded pixel/sample domain (audio/flac routes
    through the operators/flac decoder). Mimes without a pure-Python codec
    (audio/mpeg, video/* outside the AVI path) raise NotImplementedError —
    the honest boundary of this container."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                if mime in ("image/x-portable-graymap", "image/x-portable-pixmap",
                            "image/png", "image/jpeg", "image/gif"):
                    if mime == "image/png":
                        decode = decode_png
                    elif mime == "image/jpeg":
                        from .jpeg import decode_jpeg as decode
                    elif mime == "image/gif":
                        from .gif import decode_gif as decode
                    else:
                        decode = decode_netpbm
                    img = decode(bytes(payload))
                    h, w = img.shape[:2]
                    rows.append(
                        dict(media_id=mid, kind="image", width=w, height=h,
                             sample_rate=None, duration_ms=None,
                             feature=_image_feature(img))
                    )
                elif mime in ("audio/wav", "audio/x-wav", "audio/flac"):
                    if mime == "audio/flac":
                        from .flac import decode_flac
                        ints, rate = decode_flac(bytes(payload))
                        samples = ints.astype(np.float32) / 32768.0
                    else:
                        samples, rate = decode_wav(bytes(payload))
                    rows.append(
                        dict(media_id=mid, kind="audio", width=None, height=None,
                             sample_rate=rate,
                             duration_ms=int(len(samples) * 1000 / rate),
                             feature=_audio_feature(samples))
                    )
                else:
                    raise NotImplementedError(
                        f"no pure-Python codec for {mime!r}; PIL/ffmpeg not "
                        "available in this environment"
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, REAL_FEATURE_SCHEMA)


def synthetic_real_media_df(spark, n: int, partitions: int = 8) -> DataFrame:
    """Corpus of GENUINE encoded bytes: even ids → images (ids ≡0 mod 8:
    binary PGM 8×8 gradient; ids ≡4 mod 8: baseline JPEG of the same
    gradient; ids ≡2 mod 4: PNG RGB with cycling scanline filters), odd
    ids → WAV audio (8 kHz sine, id-dependent frequency). Exercises every
    real decoder distributed."""
    from .jpeg import encode_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % 4 == 2:
                    base = ((np.add.outer(np.arange(8), np.arange(8)) * (i + 3)) % 256).astype(np.uint8)
                    px = np.stack([base, base[::-1], base.T], axis=2)
                    rows.append(
                        dict(media_id=i, payload=encode_png(px),
                             mime="image/png",
                             meta=dict(width=8, height=8, duration_ms=None, codec="png"))
                    )
                elif i % 8 == 4:
                    px = ((np.add.outer(np.arange(8), np.arange(8)) * (i + 3)) % 256).astype(np.uint8)
                    rows.append(
                        dict(media_id=i, payload=encode_jpeg(px, quality=90),
                             mime="image/jpeg",
                             meta=dict(width=8, height=8, duration_ms=None, codec="jpeg"))
                    )
                elif i % 2 == 0:
                    px = ((np.add.outer(np.arange(8), np.arange(8)) * (i + 3)) % 256).astype(np.uint8)
                    rows.append(
                        dict(media_id=i, payload=encode_pgm(px),
                             mime="image/x-portable-graymap",
                             meta=dict(width=8, height=8, duration_ms=None, codec="pgm"))
                    )
                else:
                    t = np.arange(800, dtype=np.float64)
                    freq = 100.0 + (i % 7) * 50.0
                    samples = (np.sin(2 * np.pi * freq * t / 8000.0) * 20000).astype(np.int16)
                    rows.append(
                        dict(media_id=i, payload=encode_wav(samples, 8000),
                             mime="audio/wav",
                             meta=dict(width=None, height=None, duration_ms=100, codec="pcm_s16le"))
                    )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


MEDIA_STATS_SCHEMA = (
    "media_id long, kind string, width int, height int, sample_rate int, "
    "duration_ms int, pix_sum long, pix_wsum long, samp_sum long, samp_wsum long"
)


def media_features_from_tokens(
    df: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """Oracle-checkable distributed codec round-trip: build GENUINE media
    bytes from each document's tokens (even ids → 8×8 binary PGM whose
    pixels are token%256; odd ids → 8 kHz PCM WAV whose int16 samples are
    (token*37)%20000-10000), push them through the REAL encoders+decoders
    (encode_pgm/decode_netpbm, encode_wav/decode_wav) inside mapInPandas,
    and emit integer stats of the DECODED domain. Every output is an exact
    integer a SQL engine can re-derive from the tokens alone — int16→f32/
    32768 is exact (values < 2²⁴, power-of-two scale), so round(x*32768)
    recovers the samples bit-exactly. Weighted sums catch order/offset
    decode bugs a plain sum would miss."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, toks in zip(pdf[id_col], pdf[tokens_col]):
                mid = int(mid)
                t = np.asarray(toks, dtype=np.int64)
                if mid % 2 == 0:
                    pix = np.zeros(64, dtype=np.uint8)
                    m = min(64, len(t))
                    pix[:m] = (t[:m] % 256).astype(np.uint8)
                    img = decode_netpbm(encode_pgm(pix.reshape(8, 8)))
                    flat = img.reshape(-1).astype(np.int64)
                    rows.append(dict(
                        media_id=mid, kind="image",
                        width=img.shape[1], height=img.shape[0],
                        sample_rate=None, duration_ms=None,
                        pix_sum=int(flat.sum()),
                        pix_wsum=int((flat * np.arange(1, 65)).sum()),
                        samp_sum=None, samp_wsum=None,
                    ))
                else:
                    s = ((t * 37) % 20000 - 10000).astype(np.int16)
                    dec, rate = decode_wav(encode_wav(s, 8000))
                    ints = np.round(dec.astype(np.float64) * 32768.0).astype(np.int64)
                    rows.append(dict(
                        media_id=mid, kind="audio", width=None, height=None,
                        sample_rate=rate,
                        duration_ms=int(len(ints) * 1000 / rate),
                        pix_sum=None, pix_wsum=None,
                        samp_sum=int(ints.sum()),
                        samp_wsum=int((ints * np.arange(1, len(ints) + 1)).sum()),
                    ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "width", "height", "sample_rate",
                "duration_ms", "pix_sum", "pix_wsum", "samp_sum", "samp_wsum",
            ])

    return df.mapInPandas(gen, MEDIA_STATS_SCHEMA)


PNG_STATS_SCHEMA = (
    "media_id long, color string, width int, height int, n_png_bytes int, "
    "pix_sum long, pix_wsum long"
)


def png_features_from_tokens(
    df: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """Oracle-checkable distributed PNG round-trip: build a GENUINE PNG per
    document from its tokens (even ids → 8×8 grayscale, pixel j =
    tokens[j]%256; odd ids → 4×8 RGB, byte j = tokens[j]%256, both
    zero-padded), encode with per-row filter types cycling (row+doc_id)%5
    so Sub/Up/Average/Paeth all occur in the corpus, then decode with the
    zlib+numpy decoder and emit integer stats of the DECODED raster.
    PNG filtering is lossless, so every stat is re-derivable from the
    tokens alone by a SQL engine — the decode is correct iff the
    round-trip is the identity (the weighted sum pins byte order).
    n_png_bytes (the compressed file size) is NOT oracle-derivable and is
    deliberately excluded from the driver query's projection."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, toks in zip(pdf[id_col], pdf[tokens_col]):
                mid = int(mid)
                t = np.asarray(toks, dtype=np.int64)
                if mid % 2 == 0:
                    buf = np.zeros(64, dtype=np.uint8)
                    m = min(64, len(t))
                    buf[:m] = (t[:m] % 256).astype(np.uint8)
                    px, color = buf.reshape(8, 8), "gray"
                else:
                    buf = np.zeros(96, dtype=np.uint8)
                    m = min(96, len(t))
                    buf[:m] = (t[:m] % 256).astype(np.uint8)
                    px, color = buf.reshape(4, 8, 3), "rgb"
                h = px.shape[0]
                payload = encode_png(px, filters=[(r + mid) % 5 for r in range(h)])
                img = decode_png(payload)
                flat = img.reshape(-1).astype(np.int64)
                rows.append(dict(
                    media_id=mid, color=color,
                    width=img.shape[1], height=img.shape[0],
                    n_png_bytes=len(payload),
                    pix_sum=int(flat.sum()),
                    pix_wsum=int((flat * np.arange(1, len(flat) + 1)).sum()),
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "color", "width", "height", "n_png_bytes",
                "pix_sum", "pix_wsum",
            ])

    return df.mapInPandas(gen, PNG_STATS_SCHEMA)


GIF_STATS_SCHEMA = (
    "media_id long, mode string, width int, height int, n_gif_bytes int, "
    "pix_sum long, pix_wsum long"
)


def gif_features_from_tokens(
    df: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """Oracle-checkable distributed GIF round-trip (`gif.py`: pure-python
    LZW + palette + interlace): even ids → 8×8 grayscale (index j =
    tokens[j]%256, identity palette, sequential); odd ids → 4×8 with a
    16-color FORMULA palette (r=i·17, g=255−i·17, b=i²·7 mod 256) encoded
    INTERLACED, so palette mapping, small code widths, and the Appendix-E
    de-interlace all run in the corpus. GIF's index stream is lossless, so
    every stat of the decoded RGB raster is re-derivable from the tokens
    alone; pix_wsum over the flat [r,g,b,...] order pins channel layout.
    n_gif_bytes (compressed size) is excluded from the oracle query."""
    from .gif import decode_gif, encode_gif

    pal16 = np.stack(
        [
            np.arange(16, dtype=np.int64) * 17,
            255 - np.arange(16, dtype=np.int64) * 17,
            (np.arange(16, dtype=np.int64) ** 2 * 7) % 256,
        ],
        axis=1,
    ).astype(np.uint8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, toks in zip(pdf[id_col], pdf[tokens_col]):
                mid = int(mid)
                t = np.asarray(toks, dtype=np.int64)
                if mid % 2 == 0:
                    buf = np.zeros(64, dtype=np.uint8)
                    m = min(64, len(t))
                    buf[:m] = (t[:m] % 256).astype(np.uint8)
                    payload = encode_gif(buf.reshape(8, 8))
                    mode = "gray256"
                else:
                    buf = np.zeros(32, dtype=np.uint8)
                    m = min(32, len(t))
                    buf[:m] = (t[:m] % 16).astype(np.uint8)
                    payload = encode_gif(
                        buf.reshape(4, 8), palette=pal16, interlace=True
                    )
                    mode = "pal16i"
                img = decode_gif(payload)
                flat = img.reshape(-1).astype(np.int64)
                rows.append(dict(
                    media_id=mid, mode=mode,
                    width=img.shape[1], height=img.shape[0],
                    n_gif_bytes=len(payload),
                    pix_sum=int(flat.sum()),
                    pix_wsum=int((flat * np.arange(1, len(flat) + 1)).sum()),
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "mode", "width", "height", "n_gif_bytes",
                "pix_sum", "pix_wsum",
            ])

    return df.mapInPandas(gen, GIF_STATS_SCHEMA)


def decode_and_featurize(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode payload → fixed-length feature vector, batch-vectorized.
    Real decode (PIL.Image.open / librosa) is stubbed behind ``fake``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/librosa; "
                    "not available in this environment"
                )
            feats, means, sizes = [], [], []
            for b in pdf["payload"]:
                arr = np.frombuffer(b or b"", dtype=np.uint8)
                sizes.append(len(arr))
                means.append(float(arr.mean()) if len(arr) else 0.0)
                # deterministic fake "embedding": first 16 bytes scaled
                v = np.zeros(16, dtype=np.float32)
                v[: min(16, len(arr))] = arr[:16].astype(np.float32) / 255.0
                feats.append(v)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "mean_byte": means,
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame offset.
    Offsets derive from metadata (duration), payload decode is stubbed."""
    frames = F.when(
        F.col("meta.duration_ms").isNotNull(),
        F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)),
    ).otherwise(F.array(F.lit(0)))
    return df.select(
        "media_id", F.explode(frames).alias("frame_ms"), "mime"
    )


FLAC_STATS_SCHEMA = (
    "media_id long, lpc boolean, n_samples int, n_frames int, "
    "n_flac_bytes int, samp_sum long, samp_wsum long"
)


def flac_features_from_tokens(
    df: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """Oracle-checkable distributed FLAC round-trip (`operators/flac.py`:
    pure python+numpy — frames, CRC-8/16, rice residuals, CONSTANT/
    VERBATIM/FIXED/LPC subframes): each document's tokens become int16
    samples ((t*53)%30000−15000), ENCODED to a genuine multi-frame FLAC
    stream (even docs exercise the FIXED subframe path, odd docs the LPC
    path) and DECODED back in the same mapInPandas pass. FLAC is lossless,
    so the integer sample stats are re-derivable from the tokens alone —
    the decode is correct iff the round-trip is the identity (samp_wsum
    pins frame order and concatenation). n_flac_bytes (compressed size) is
    NOT oracle-derivable and is excluded from the driver projection."""
    from .flac import decode_flac, encode_flac

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, toks in zip(pdf[id_col], pdf[tokens_col]):
                mid = int(mid)
                t = np.asarray(toks, dtype=np.int64)
                s = ((t * 53) % 30000 - 15000).astype(np.int16)
                payload = encode_flac(s, 8000, block=64, use_lpc=mid % 2 == 1)
                dec, rate = decode_flac(payload)
                assert rate == 8000
                ints = dec.astype(np.int64)
                rows.append(dict(
                    media_id=mid, lpc=mid % 2 == 1,
                    n_samples=len(ints),
                    n_frames=(len(ints) + 63) // 64,
                    n_flac_bytes=len(payload),
                    samp_sum=int(ints.sum()),
                    samp_wsum=int((ints * np.arange(1, len(ints) + 1)).sum()),
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "lpc", "n_samples", "n_frames", "n_flac_bytes",
                "samp_sum", "samp_wsum",
            ])

    return df.mapInPandas(gen, FLAC_STATS_SCHEMA)
