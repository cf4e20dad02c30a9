"""Multimodal columns (SURVEY.md §2 K5): image/audio/video as opaque
``binary`` columns + typed metadata, processed with Arrow-batched
``mapInPandas`` UDFs.

The Spark-side plumbing — schemas, batch iteration, partition sizing,
metadata propagation — is real and tested. Codec status: uncompressed
container formats decode FOR REAL in pure numpy (24-bit BMP, PCM-16
WAV, P6 PPM — parser + pixel/sample math below, round-trip-tested);
compressed codecs (JPEG/PNG/MP3/MP4) need external libraries absent
from this container and stay stubbed — deterministic digest fake by
default, ``NotImplementedError`` when ``require_real_codecs=True``.

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
    pos, rate, n_ch, bits = 12, None, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        if cid == b"fmt ":
            fmt, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", content, pos + 8)
            if fmt != 1 or bits != 16:
                raise NotImplementedError(f"only PCM-16 WAV (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            if rate is None:
                raise ValueError("WAV data chunk before fmt chunk")
            raw = np.frombuffer(content, dtype="<i2", count=size // 2, offset=pos + 8)
            return raw.reshape(-1, n_ch).astype(np.float64) / 32768.0, rate
        pos += 8 + size + (size & 1)
    raise ValueError("WAV stream has no data chunk")


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
    the uncompressed container formats (24-bit BMP, PCM-16 WAV, P6
    PPM); compressed codecs (JPEG/PNG/MP3/MP4) still need external
    libraries absent from this container and remain stubbed — with
    ``require_real_codecs=True`` they raise instead of falling back to
    the deterministic digest fake."""
    content = content or b""
    if content[:2] == b"BM":
        return image_features(decode_bmp(content))
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return audio_features(*decode_wav(content))
    if content[:2] == b"P6":
        return image_features(decode_ppm(content))
    if require_real_codecs:
        raise NotImplementedError(
            "compressed media codecs (JPEG/PNG/MP3/MP4) are not available "
            "in this environment; uncompressed BMP/WAV/PPM decode natively"
        )
    digest = hashlib.sha256(content).digest()
    return [
        float(int.from_bytes(digest[2 * i : 2 * i + 2], "big")) / 65535.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    media: DataFrame, require_real_codecs: bool = False
) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas`` (Arrow batch
    transfer, iterator API — constant memory per task)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_and_featurize(c, k, require_real_codecs)
                for c, k in zip(pdf["content"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "content_sha": [
                        hashlib.sha256(c or b"").hexdigest() for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


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
    for BMP/PPM) → nearest-neighbor resize → re-encode BMP. mapInPandas
    iterator API — record batches stream through, constant memory per
    task; output is again an opaque binary column, so the op composes
    with media_dedup / extract_features downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for c in pdf["content"]:
                c = bytes(c or b"")
                if c[:2] == b"BM":
                    img = decode_bmp(c)
                elif c[:2] == b"P6":
                    img = decode_ppm(c)
                elif require_real_codecs:
                    raise NotImplementedError(
                        "resize_media: only BMP/PPM decode natively in this "
                        "environment"
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
