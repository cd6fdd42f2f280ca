"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing here — schemas, batch shapes, partitioning-safe UDF
signatures — is real and tested.  Metadata extraction is ALSO real: the
default :func:`header_decode` parses dimensions and duration straight from
container headers in pure Python (PNG/JPEG/GIF/BMP images, WAV audio, MP4
video) — no media library needed.  Content decode is REAL wherever the
format is pure-Python-decodable: PNG pixels (stdlib zlib + filter undo),
GIF (LZW, this repo's decoder), baseline JPEG (Huffman+IDCT, `jpeg.py`),
uncompressed BMP pixels, and WAV PCM samples all produce features computed
from actual content (:func:`pixel_feature`, :func:`audio_feature`).  MP4
video resolves the real sample table (stts/stsc/stsz/stco →
:func:`_mp4_sample_table`) to per-frame byte ranges and timestamps, and
features are statistics of the ACTUAL mdat sample bytes
(:func:`video_feature`) — only the codec-domain → pixel-domain transform
(a full h264 stack) stays out of scope; unresolvable payloads fall back to
the clearly-marked BLAKE2b stand-in via :func:`deterministic_fake_decode`.
Swapping in a full decoder (Pillow/ffmpeg/torchaudio) changes one
constructor argument and nothing else.

Design-for-scale notes:
  * binary payloads stay in the executor — no collect, no driver transfer;
  * ``mapInPandas`` streams Arrow batches, so one task holds at most
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads in memory —
    tune that (not the code) for big blobs, or repartition upstream so a
    task's batch fits the executor heap;
  * derived features land in flat columns → downstream is plain Catalyst.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: lake schema for a multimodal asset table
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime_type", StringType()),
        StructField("content", BinaryType()),
        StructField("meta_json", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)

#: feature-vector length produced by decoders
FEATURE_DIM = 8

Decoder = Callable[[bytes, str], dict]


def deterministic_fake_decode(content: bytes, modality: str) -> dict:
    """STAND-IN for a real codec (Pillow / ffmpeg are not installed here).

    Derives stable pseudo-metadata from a BLAKE2b of the payload so the
    Spark plumbing (schema, batching, partitioning) is exercised end-to-end
    with assertable outputs.  A real decoder returns the same dict shape.
    """
    h = hashlib.blake2b(content, digest_size=16).digest()
    w, x, y, z = struct.unpack("<IIII", h)
    feature = np.frombuffer(
        hashlib.blake2b(content, digest_size=FEATURE_DIM * 8).digest(), dtype="<u8"
    )
    return {
        "width": int(16 + w % 4096) if modality in ("image", "video") else None,
        "height": int(16 + x % 4096) if modality in ("image", "video") else None,
        "n_channels": int(1 + y % 4),
        "duration_s": round(z % 3_600_000 / 1000.0, 3)
        if modality in ("audio", "video")
        else None,
        "feature": (feature / np.uint64(1) / 2**64).tolist(),
    }


# ---------------------------------------------------------------------------
# Real header-level decode (pure Python, no media libraries)
# ---------------------------------------------------------------------------
# Container *headers* carry dimensions / duration in documented fixed
# layouts, so no codec is needed to extract them.  PNG goes further: the
# pixel data itself is just zlib + per-scanline filters (both stdlib), so
# PNG features are computed from REAL decoded pixels (`_png_pixels` +
# `pixel_feature`).  GIF's LZW (`_gif_pixels`) and baseline JPEG
# (`jpeg.py`: Huffman + dequant + IDCT) decode in pure Python too.  MP4
# resolves the sample table to real per-frame mdat byte ranges
# (`_mp4_sample_table`); only the h264 entropy decode itself is skipped
# (features are coded-domain byte statistics of the actual samples).

#: PNG color type → sample channels (PNG spec, IHDR color type field)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: JPEG SOF markers that carry frame dimensions (all SOFn except the
#: DHT/DAC/RST aliases C4, C8, CC)
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def _parse_png(b: bytes) -> dict | None:
    if len(b) < 26 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return {"width": w, "height": h, "n_channels": _PNG_CHANNELS.get(b[25])}


def _png_pixels(b: bytes) -> np.ndarray | None:
    """Decode a non-interlaced 8-bit PNG to a (height, width, channels)
    uint8 array using only stdlib zlib — no media library.

    Handles color types 0 (gray), 2 (RGB), 3 (palette -> RGB via PLTE),
    4 (gray+alpha), 6 (RGBA) at bit depth 8, which covers everything
    :func:`_write_png_gray` emits plus the common web/baseline cases.
    Sub-byte depths, 16-bit, and interlaced images return None and the
    caller falls back to the hash stand-in.  Filters None/Up are vectorized; Sub/Average/Paeth carry a
    per-byte left dependency and run as a Python loop over the scanline —
    fine inside a mapInPandas batch, where the per-row cost is dominated by
    zlib anyway.
    """
    import zlib

    hdr = _parse_png(b)
    if hdr is None or len(b) < 33:
        return None
    bit_depth, color_type, interlace = b[24], b[25], b[28]
    if bit_depth != 8 or interlace != 0 or color_type not in (0, 2, 3, 4, 6):
        return None
    palette = None
    if color_type == 3:  # indexed: need the PLTE chunk
        for ctype, cs, ce in _iter_png_chunks(b):
            if ctype == b"PLTE" and (ce - cs) % 3 == 0:
                palette = np.frombuffer(
                    b, np.uint8, ce - cs, cs
                ).reshape(-1, 3)
                break
        if palette is None:
            return None
    w, h, ch = hdr["width"], hdr["height"], _PNG_CHANNELS[color_type]
    if not w or not h or w * h * ch > 1 << 28:  # 256 MB decoded cap
        return None
    # concatenate IDAT payloads in stream order
    idat = bytearray()
    for ctype, s, e in _iter_png_chunks(b):
        if ctype == b"IDAT":
            idat += b[s:e]
        elif ctype == b"IEND":
            break
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (1 + stride):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for r in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256 per spec
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-sequential
            cur = np.empty(stride, dtype=np.uint8)
            li, pv, cu = line.tolist(), prev.tolist(), [0] * stride
            for i in range(stride):
                a = cu[i - ch] if i >= ch else 0
                up = pv[i]
                if ftype == 1:
                    rec = li[i] + a
                elif ftype == 3:
                    rec = li[i] + ((a + up) >> 1)
                else:
                    c = pv[i - ch] if i >= ch else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    rec = li[i] + pred
                cu[i] = rec & 0xFF
            cur = np.array(cu, dtype=np.uint8)
        else:
            return None
        out[r] = cur
        prev = out[r]
    px = out.reshape(h, w, ch)
    if color_type == 3:
        return palette[np.minimum(px[:, :, 0], len(palette) - 1)]
    return px


def _iter_png_chunks(b: bytes):
    """Yield (type, payload_start, payload_end) over well-formed PNG chunks."""
    i = 8
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        s = i + 8
        e = s + length
        if e + 4 > len(b):
            return
        yield ctype, s, e
        i = e + 4  # skip CRC


def _luminance(px: np.ndarray) -> np.ndarray:
    """(h, w, ch) uint8 → (h, w) float64 luminance (ITU-R BT.601 weights for
    color; alpha ignored)."""
    ch = px.shape[2]
    if ch in (1, 2):  # gray / gray+alpha
        return px[:, :, 0].astype(np.float64)
    rgb = px[:, :, :3].astype(np.float64)
    return rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587 + rgb[:, :, 2] * 0.114


def pixel_feature(px: np.ndarray) -> list[float]:
    """FEATURE_DIM-dim descriptor from REAL pixels: luminance mean, std,
    min, max (all /255) + 4-bin luminance histogram fractions.  Deterministic
    and content-derived — two images with the same pixels get the same
    feature regardless of container byte differences."""
    lum = _luminance(px)
    hist, _ = np.histogram(lum, bins=4, range=(0.0, 256.0))
    frac = hist / max(lum.size, 1)
    return [
        round(float(lum.mean()) / 255.0, 9),
        round(float(lum.std()) / 255.0, 9),
        round(float(lum.min()) / 255.0, 9),
        round(float(lum.max()) / 255.0, 9),
        *(round(float(x), 9) for x in frac),
    ]


def _parse_jpeg(b: bytes) -> dict | None:
    if len(b) < 4 or b[:3] != b"\xff\xd8\xff":
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:  # not at a marker → corrupt scan; bail out
            return None
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte padding
            i += 1
            continue
        if marker in _JPEG_SOF:
            if i + 10 > len(b):
                return None
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return {"width": w, "height": h, "n_channels": b[i + 9]}
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # standalone markers
            i += 2
            continue
        (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
        i += 2 + seg_len
    return None


def _parse_gif(b: bytes) -> dict | None:
    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    return {"width": w, "height": h, "n_channels": 3}


def _gif_pixels(b: bytes) -> np.ndarray | None:
    """Decode the FIRST frame of a GIF to (h, w, 3) uint8 RGB in pure
    Python — GIF's only codec is LZW (variable 3..12-bit codes, little-
    endian bit packing), which needs no media library.

    Handles global/local color tables, interlaced row order, and the
    full clear/end/grow LZW state machine; animation beyond frame 1,
    and malformed streams, return None (caller falls back).
    """
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh = struct.unpack("<HH", b[6:10])
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(b):
            return None
        gct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    try:
        while pos < len(b):
            blk = b[pos]
            if blk == 0x21:  # extension: label + sub-blocks
                pos += 2
                while b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
            elif blk == 0x2C:  # image descriptor
                _, _, w, h = struct.unpack("<HHHH", b[pos + 1 : pos + 9])
                ipacked = b[pos + 9]
                pos += 10
                ct = gct
                if ipacked & 0x80:
                    n = 2 << (ipacked & 0x07)
                    ct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
                    pos += 3 * n
                if ct is None or w == 0 or h == 0 or w * h * 3 > 1 << 28:
                    return None
                min_code = b[pos]
                pos += 1
                data = bytearray()
                while b[pos] != 0:
                    ln = b[pos]
                    data += b[pos + 1 : pos + 1 + ln]
                    pos += 1 + ln
                idx = _gif_lzw(bytes(data), min_code, w * h)
                if idx is None:
                    return None
                img = idx.reshape(h, w)
                if ipacked & 0x40:  # interlaced: 4-pass row order
                    out = np.empty_like(img)
                    rows = np.concatenate(
                        [
                            np.arange(0, h, 8),
                            np.arange(4, h, 8),
                            np.arange(2, h, 4),
                            np.arange(1, h, 2),
                        ]
                    )
                    out[rows] = img
                    img = out
                return ct[np.minimum(img, len(ct) - 1)]
            else:  # 0x3B trailer or junk
                return None
    except (IndexError, struct.error):
        return None
    return None


def _gif_lzw(data: bytes, min_code: int, npix: int) -> np.ndarray | None:
    """GIF LZW decode → uint8 index array of length ``npix``."""
    if not 2 <= min_code <= 11:
        return None
    clear, end = 1 << min_code, (1 << min_code) + 1
    base = [[i] for i in range(clear)] + [None, None]
    table = list(base)
    size = min_code + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= size:
            code = acc & ((1 << size) - 1)
            acc >>= size
            bits -= size
            if code == clear:
                table = list(base)
                size = min_code + 1
                prev = None
                continue
            if code == end:
                if len(out) < npix:
                    return None
                return np.array(out[:npix], np.uint8)
            if prev is None:
                if code >= len(table) or table[code] is None:
                    return None
                entry = table[code]
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                return None
            out.extend(entry)
            if len(out) >= npix:
                return np.array(out[:npix], np.uint8)
            prev = entry
            if len(table) == (1 << size) and size < 12:
                size += 1
    return np.array(out[:npix], np.uint8) if len(out) >= npix else None


def _image_pixels(b: bytes) -> np.ndarray | None:
    """Decode any pure-Python-decodable image payload to an (h, w, c)
    uint8 array: PNG, GIF (LZW), uncompressed BMP, baseline JPEG."""
    from .jpeg import jpeg_pixels

    for dec in (_png_pixels, _gif_pixels, _bmp_pixels, jpeg_pixels):
        px = dec(b)
        if px is not None:
            return px
    return None


def _parse_bmp(b: bytes) -> dict | None:
    if len(b) < 26 or b[:2] != b"BM":
        return None
    (hdr_size,) = struct.unpack("<I", b[14:18])
    if hdr_size not in (12, 40, 52, 56, 108, 124):  # known DIB headers only
        return None
    w, h = struct.unpack("<ii", b[18:26])
    return {"width": w, "height": abs(h), "n_channels": 3}


def _bmp_pixels(b: bytes) -> np.ndarray | None:
    """Decode an uncompressed (BI_RGB) 24/32-bit BMP to (h, w, 3) uint8 RGB
    using only struct+numpy — BMP stores raw pixels, no codec needed.

    Rows are 4-byte aligned and bottom-up when height > 0 (the common
    layout); top-down (negative height) is handled too.  Palette, RLE, and
    bitfield BMPs return None and the caller falls back to the stand-in.
    """
    if len(b) < 54 or b[:2] != b"BM":
        return None
    (data_off,) = struct.unpack("<I", b[10:14])
    (hdr_size,) = struct.unpack("<I", b[14:18])
    if hdr_size < 40:  # BITMAPCOREHEADER lacks the compression field
        return None
    w, h = struct.unpack("<ii", b[18:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    (compression,) = struct.unpack("<I", b[30:34])
    if compression != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    if w * h * 3 > 1 << 28:  # 256 MB decoded cap, mirrors _png_pixels
        return None
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    if data_off + stride * h > len(b):
        return None
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    px = rows[:, : w * nbytes].reshape(h, w, nbytes)
    if not top_down:
        px = px[::-1]
    # BMP stores BGR(A); emit RGB
    return px[:, :, 2::-1].copy()


def _wav_samples(b: bytes) -> np.ndarray | None:
    """Decode WAV PCM samples to a (n_frames, channels) float64 array in
    [-1, 1] — pure struct+numpy, no audio library (PCM is just raw ints).

    Supports format 1 (integer PCM: u8, i16, i32) and format 3 (float32/
    float64).  Compressed formats (ADPCM, mp3-in-wav, ...) return None and
    the caller falls back to the stand-in feature.
    """
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, fmt = 12, None
    data_off = data_size = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        if cid == b"fmt " and i + 24 <= len(b):
            audio_fmt, channels = struct.unpack("<HH", b[i + 8 : i + 12])
            bits, = struct.unpack("<H", b[i + 22 : i + 24])
            fmt = (audio_fmt, channels, bits)
        elif cid == b"data":
            data_off, data_size = i + 8, size
        i += 8 + size + (size & 1)
    if fmt is None or data_off is None:
        return None
    audio_fmt, channels, bits = fmt
    if not channels:
        return None
    data_size = min(data_size, len(b) - data_off)
    dtypes = {(1, 8): "u1", (1, 16): "<i2", (1, 32): "<i4",
              (3, 32): "<f4", (3, 64): "<f8"}
    dt = dtypes.get((audio_fmt, bits))
    if dt is None:
        return None
    width = bits // 8
    n = data_size // (width * channels) * channels
    if n == 0:
        return np.zeros((0, channels))
    raw = np.frombuffer(b, dtype=dt, count=n, offset=data_off)
    if audio_fmt == 1:
        if bits == 8:  # u8 PCM is offset-binary around 128
            x = (raw.astype(np.float64) - 128.0) / 128.0
        else:
            x = raw.astype(np.float64) / float(2 ** (bits - 1))
    else:
        x = raw.astype(np.float64)
    return x.reshape(-1, channels)


def audio_feature(samples: np.ndarray) -> list[float]:
    """FEATURE_DIM-dim descriptor from REAL audio samples (channel-mean
    mono mix): RMS, peak, mean, std, zero-crossing rate + 3-bin
    |amplitude| histogram fractions.  Content-derived and deterministic —
    the audio analogue of :func:`pixel_feature`."""
    mono = samples.mean(axis=1) if samples.size else np.zeros(1)
    n = mono.size
    zc = float(np.count_nonzero(np.diff(np.signbit(mono)))) / max(n - 1, 1)
    hist, _ = np.histogram(np.abs(mono), bins=3, range=(0.0, 1.0))
    frac = hist / max(n, 1)
    return [
        round(float(np.sqrt(np.mean(mono**2))), 9),
        round(float(np.max(np.abs(mono))), 9),
        round(float(mono.mean()), 9),
        round(float(mono.std()), 9),
        round(zc, 9),
        *(round(float(x), 9) for x in frac),
    ]


def _parse_wav(b: bytes) -> dict | None:
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, channels, byte_rate, data_size = 12, None, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        if cid == b"fmt " and i + 24 <= len(b):
            channels, = struct.unpack("<H", b[i + 10 : i + 12])
            byte_rate, = struct.unpack("<I", b[i + 16 : i + 20])
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if not byte_rate or data_size is None:
        return None
    return {
        "n_channels": channels,
        "duration_s": round(data_size / byte_rate, 3),
    }


def _iter_boxes(b: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", b[i : i + 4])
        btype = b[i + 4 : i + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize: payload starts after the 16B header
            if i + 16 > end:
                return
            (size,) = struct.unpack(">Q", b[i + 8 : i + 16])
            hdr = 16
        if size < hdr or i + size > end:
            return
        yield btype, i + hdr, i + size
        i += size


def _parse_mp4(b: bytes) -> dict | None:
    """ISO BMFF: mvhd → duration, first tkhd with nonzero dims → width/height
    (16.16 fixed point)."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    out: dict = {}

    def walk(start: int, end: int):
        for btype, s, e in _iter_boxes(b, start, end):
            if btype in (b"moov", b"trak"):
                walk(s, e)
            elif btype == b"mvhd" and e - s >= 24:
                ver = b[s]
                if ver == 1:
                    if e - s < 32:  # v1 needs 32 payload bytes for duration
                        continue
                    (ts,) = struct.unpack(">I", b[s + 20 : s + 24])
                    (dur,) = struct.unpack(">Q", b[s + 24 : s + 32])
                else:
                    (ts,) = struct.unpack(">I", b[s + 12 : s + 16])
                    (dur,) = struct.unpack(">I", b[s + 16 : s + 20])
                if ts:
                    out["duration_s"] = round(dur / ts, 3)
            elif btype == b"tkhd" and e > s:
                ver = b[s]
                off = s + (88 if ver == 1 else 76)
                if e - off >= 8 and "width" not in out:
                    w, h = struct.unpack(">II", b[off : off + 8])
                    if w and h:
                        out["width"] = w >> 16
                        out["height"] = h >> 16

    walk(0, len(b))
    return out or None


def _mp4_sample_table(b: bytes) -> dict | None:
    """Resolve the first video track's sample table to absolute per-frame
    byte ranges and timestamps — REAL frame counts, durations, and payload
    locations from stts/stsc/stsz/stco (ISO 14496-12 §8.6-8.7), no entropy
    decode needed.

    Returns ``{"offsets": [...], "sizes": [...], "ts_s": [...],
    "n_frames": n}`` or None when any table is absent/corrupt or a resolved
    sample range falls outside the payload.
    """

    def parse_trak(ts: int, te: int) -> dict:
        t: dict = {}

        def walk(s: int, e: int) -> None:
            for btype, cs, ce in _iter_boxes(b, s, e):
                if btype in (b"mdia", b"minf", b"stbl"):
                    walk(cs, ce)
                elif btype == b"mdhd" and ce - cs >= 24:
                    off = cs + (20 if b[cs] == 1 else 12)
                    (t["timescale"],) = struct.unpack(">I", b[off : off + 4])
                elif btype == b"hdlr" and ce - cs >= 12:
                    t["handler"] = b[cs + 8 : cs + 12]
                elif btype == b"stts" and ce - cs >= 8:
                    (n,) = struct.unpack(">I", b[cs + 4 : cs + 8])
                    if cs + 8 + 8 * n <= ce:
                        t["stts"] = [
                            struct.unpack(">II", b[p : p + 8])
                            for p in range(cs + 8, cs + 8 + 8 * n, 8)
                        ]
                elif btype == b"stsc" and ce - cs >= 8:
                    (n,) = struct.unpack(">I", b[cs + 4 : cs + 8])
                    if cs + 8 + 12 * n <= ce:
                        t["stsc"] = [
                            struct.unpack(">III", b[p : p + 12])
                            for p in range(cs + 8, cs + 8 + 12 * n, 12)
                        ]
                elif btype == b"stsz" and ce - cs >= 12:
                    fixed, n = struct.unpack(">II", b[cs + 4 : cs + 12])
                    if fixed:
                        t["sizes"] = [fixed] * n
                    elif cs + 12 + 4 * n <= ce:
                        t["sizes"] = [
                            struct.unpack(">I", b[p : p + 4])[0]
                            for p in range(cs + 12, cs + 12 + 4 * n, 4)
                        ]
                elif btype == b"stco" and ce - cs >= 8:
                    (n,) = struct.unpack(">I", b[cs + 4 : cs + 8])
                    if cs + 8 + 4 * n <= ce:
                        t["chunks"] = [
                            struct.unpack(">I", b[p : p + 4])[0]
                            for p in range(cs + 8, cs + 8 + 4 * n, 4)
                        ]
                elif btype == b"co64" and ce - cs >= 8:
                    (n,) = struct.unpack(">I", b[cs + 4 : cs + 8])
                    if cs + 8 + 8 * n <= ce:
                        t["chunks"] = [
                            struct.unpack(">Q", b[p : p + 8])[0]
                            for p in range(cs + 8, cs + 8 + 8 * n, 8)
                        ]

        walk(ts, te)
        return t

    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    for btype, s, e in _iter_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        for bt2, s2, e2 in _iter_boxes(b, s, e):
            if bt2 != b"trak":
                continue
            t = parse_trak(s2, e2)
            if t.get("handler", b"vide") != b"vide" or not all(
                k in t for k in ("stts", "stsc", "sizes", "chunks")
            ):
                continue
            # walk chunks in order; stsc runs give samples-per-chunk until
            # the next run's first_chunk (1-based)
            sizes, chunks, runs = t["sizes"], t["chunks"], t["stsc"]
            offsets: list[int] = []
            si = 0
            for ci, chunk_off in enumerate(chunks, start=1):
                per = 0
                for first, n_per, _desc in runs:
                    if first <= ci:
                        per = n_per
                    else:
                        break
                pos = chunk_off
                for _ in range(per):
                    if si >= len(sizes):
                        break
                    offsets.append(pos)
                    pos += sizes[si]
                    si += 1
            if si != len(sizes) or any(
                o + z > len(b) for o, z in zip(offsets, sizes)
            ):
                return None
            scale = t.get("timescale") or 0
            ts_s, acc = [], 0
            for count, delta in t["stts"]:
                for _ in range(count):
                    if len(ts_s) == len(sizes):
                        break
                    ts_s.append(round(acc / scale, 6) if scale else 0.0)
                    acc += delta
            ts_s += [0.0] * (len(sizes) - len(ts_s))
            return {
                "offsets": offsets,
                "sizes": sizes,
                "ts_s": ts_s,
                "n_frames": len(sizes),
            }
    return None


def byte_feature(u: np.ndarray) -> list[float]:
    """FEATURE_DIM-dim descriptor over REAL payload bytes (uint8): mean,
    std, min, max (all /255) + 4-bin byte-value histogram fractions — the
    coded-domain analogue of :func:`pixel_feature` for entropy-coded
    payloads (video samples) where pixel decode needs a codec stack."""
    if u.size == 0:
        u = np.zeros(1, np.uint8)
    hist, _ = np.histogram(u, bins=4, range=(0.0, 256.0))
    frac = hist / u.size
    return [
        round(float(u.mean()) / 255.0, 9),
        round(float(u.std()) / 255.0, 9),
        round(float(u.min()) / 255.0, 9),
        round(float(u.max()) / 255.0, 9),
        *(round(float(x), 9) for x in frac),
    ]


def video_feature(content: bytes, table: dict) -> list[float]:
    """Feature from the ACTUAL mdat sample bytes addressed by the resolved
    sample table — every byte that enters the statistics is real frame
    payload located via stts/stsc/stsz/stco; only the codec-domain →
    pixel-domain transform (a full h264 stack) is out of scope."""
    u = np.frombuffer(
        b"".join(
            content[o : o + z]
            for o, z in zip(table["offsets"], table["sizes"])
        ),
        np.uint8,
    )
    return byte_feature(u)


_SNIFFERS = (_parse_png, _parse_jpeg, _parse_gif, _parse_bmp, _parse_wav, _parse_mp4)


def header_decode(content: bytes, modality: str) -> dict:
    """DEFAULT decoder: real metadata from container headers (pure Python —
    PNG/JPEG/GIF/BMP dimensions, WAV duration, MP4 dimensions+duration),
    falling back to :func:`deterministic_fake_decode` for unrecognized
    payloads.  Feature vectors come from REAL content wherever no entropy
    codec is needed: PNG and uncompressed BMP pixels
    (:func:`_png_pixels` / :func:`_bmp_pixels` → :func:`pixel_feature`)
    GIF LZW frames (:func:`_gif_pixels` → :func:`pixel_feature`),
    baseline JPEG (:func:`jpeg.jpeg_pixels` — Huffman + IDCT in numpy),
    and WAV PCM samples (:func:`_wav_samples` → :func:`audio_feature`).
    MP4 video features are computed from the ACTUAL mdat sample bytes
    addressed by the resolved sample table (:func:`_mp4_sample_table` →
    :func:`video_feature`) — coded-domain statistics, since pixel decode
    would need a full h264 stack; payloads with no resolvable sample
    table fall back to the BLAKE2b-derived stand-in.
    """
    for sniff in _SNIFFERS:
        parsed = sniff(content)
        if parsed:
            feature = None
            if sniff is _parse_mp4:
                table = _mp4_sample_table(content)
                if table:
                    feature = video_feature(content, table)
            elif sniff is _parse_png:
                px = _png_pixels(content)
                if px is not None:
                    feature = pixel_feature(px)
            elif sniff is _parse_jpeg:
                from .jpeg import jpeg_pixels

                px = jpeg_pixels(content)
                if px is not None:
                    feature = pixel_feature(px)
            elif sniff is _parse_gif:
                px = _gif_pixels(content)
                if px is not None:
                    feature = pixel_feature(px)
            elif sniff is _parse_bmp:
                px = _bmp_pixels(content)
                if px is not None:
                    feature = pixel_feature(px)
            elif sniff is _parse_wav:
                s = _wav_samples(content)
                if s is not None and s.size:
                    feature = audio_feature(s)
            if feature is None:
                feature = deterministic_fake_decode(content, modality)[
                    "feature"
                ]
            return {
                "width": parsed.get("width"),
                "height": parsed.get("height"),
                "n_channels": parsed.get("n_channels"),
                "duration_s": parsed.get("duration_s"),
                "feature": feature,
            }
    return deterministic_fake_decode(content, modality)


def decode_assets(
    assets: DataFrame, decoder: Decoder = header_decode
) -> DataFrame:
    """binary column → typed metadata + feature vector via one Arrow-batched
    pass; tasks never see more than one Arrow batch of payloads at a time."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, modality, content in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"]
            ):
                d = decoder(bytes(content), modality)
                out.append({"asset_id": aid, "modality": modality, **d})
            yield pd.DataFrame(
                out, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return assets.select("asset_id", "modality", "content").mapInPandas(
        kernel, DECODED_SCHEMA
    )


def sample_frames(
    assets: DataFrame,
    every_s: float = 1.0,
    decoder: Decoder = header_decode,
) -> DataFrame:
    """Video → one row per sampled frame.  For MP4 payloads with a
    resolvable sample table the frames are REAL: timestamps come from stts
    and each feature is computed from that frame's actual mdat bytes
    (:func:`byte_feature`); frames are thinned to one per ``every_s``
    seconds (cap 64).  Payloads without a sample table keep the labeled
    stand-in path so the explode/batch contract is exercised either way."""
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_ts_s", DoubleType()),
            StructField("feature", ArrayType(DoubleType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, modality, content in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"]
            ):
                if modality != "video":
                    continue
                raw = bytes(content)
                table = _mp4_sample_table(raw)
                if table:
                    next_t = 0.0
                    taken = 0
                    for off, sz, t in zip(
                        table["offsets"], table["sizes"], table["ts_s"]
                    ):
                        if t + 1e-9 < next_t or taken >= 64:
                            continue
                        rows.append(
                            {
                                "asset_id": aid,
                                "frame_ts_s": round(t, 3),
                                "feature": byte_feature(
                                    np.frombuffer(
                                        raw[off : off + sz], np.uint8
                                    )
                                ),
                            }
                        )
                        next_t = t + every_s
                        taken += 1
                    continue
                d = decoder(raw, modality)
                dur = d["duration_s"] or 0.0
                n = max(1, min(int(dur / every_s), 64))
                for i in range(n):
                    f = decoder(raw + str(i).encode(), "image")
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_ts_s": round(i * every_s, 3),
                            "feature": f["feature"],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return assets.select("asset_id", "modality", "content").mapInPandas(
        kernel, schema
    )


def _write_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal valid 8-bit grayscale PNG writer (stdlib zlib only).

    ``pixels`` must hold ``width * height`` bytes, row-major.  Used by
    :func:`resize_images` so the resized payload is a REAL container that
    :func:`header_decode` round-trips — not an opaque blob.
    """
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * width : (r + 1) * width] for r in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _write_gif_indexed(
    width: int, height: int, indices: list[int], palette: list[tuple[int, int, int]]
) -> bytes:
    """Minimal valid GIF89a writer (pure Python LZW compressor).

    Together with :func:`_gif_pixels` this closes the GIF round-trip without
    any media library — used by :func:`make_asset_table` so the synthetic
    lake contains REAL decodable GIF payloads.
    """
    min_code = 2
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, sz: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += sz
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code, size = end + 1, min_code + 1
    emit(clear, size)
    prefix: tuple[int, ...] = ()
    for px in indices:
        cand = prefix + (px,)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], size)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << size) and size < 12:
            size += 1
        if next_code == 4096:
            emit(clear, size)
            table = {(i,): i for i in range(clear)}
            next_code, size = end + 1, min_code + 1
        prefix = (px,)
    if prefix:
        emit(table[prefix], size)
    emit(end, size)
    if nbits:
        out.append(acc & 0xFF)
    gct_bits = 1  # 4-entry table
    gct = bytearray()
    for r, g, b in palette[:4]:
        gct += bytes([r, g, b])
    gct += b"\x00" * (12 - len(gct))
    sub = b"".join(
        bytes([len(out[i : i + 255])]) + bytes(out[i : i + 255])
        for i in range(0, len(out), 255)
    )
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([0x80 | gct_bits, 0, 0])
        + gct
        + b"\x2c"
        + struct.pack("<HHHH", 0, 0, width, height)
        + b"\x00"
        + bytes([min_code])
        + sub
        + b"\x00\x3b"
    )


def _write_bmp_rgb(width: int, height: int, px: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (bottom-up, 4-byte row pad)."""
    stride = (width * 3 + 3) & ~3
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        row = px[r, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (stride - len(row))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + bytes(body)


def _write_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal PCM16 mono WAV writer (struct only)."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _write_mp4_video(
    width: int,
    height: int,
    frames: list[bytes],
    fps: int = 10,
    timescale: int = 1000,
) -> bytes:
    """Minimal valid ISO BMFF (MP4) writer: ftyp + mdat + moov with a full
    video-track sample table (stsd/stts/stsc/stsz/stco), one chunk, one
    constant frame delta.

    The frame payloads are stored verbatim as mdat samples (format tag
    'mp4v'; no entropy coding — decoders that honor the sample table, like
    :func:`_mp4_sample_table`, recover every payload byte exactly).  moov
    is written AFTER mdat so chunk offsets don't depend on moov's size.
    """

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    def full(tag: bytes, verflags: int, payload: bytes) -> bytes:
        return box(tag, struct.pack(">I", verflags) + payload)

    delta = max(timescale // fps, 1)
    n = len(frames)
    dur = n * delta
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = box(b"mdat", b"".join(frames))
    first_off = len(ftyp) + 8  # first sample starts right after mdat header

    entry = box(
        b"mp4v",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count per sample
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stbl = box(
        b"stbl",
        full(b"stsd", 0, struct.pack(">I", 1) + entry)
        + full(b"stts", 0, struct.pack(">III", 1, n, delta))
        + full(b"stsc", 0, struct.pack(">IIII", 1, 1, n, 1))
        + full(
            b"stsz",
            0,
            struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", len(f)) for f in frames),
        )
        + full(b"stco", 0, struct.pack(">II", 1, first_off)),
    )
    minf = box(
        b"minf",
        full(b"vmhd", 1, b"\x00" * 8)
        + box(b"dinf", full(b"dref", 0, struct.pack(">I", 1) + full(b"url ", 1, b"")))
        + stbl,
    )
    mdia = box(
        b"mdia",
        full(
            b"mdhd",
            0,
            struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        + full(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
        + minf,
    )
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    tkhd = full(
        b"tkhd",
        7,  # enabled | in_movie | in_preview
        struct.pack(">III", 0, 0, 1)  # creation, modification, track_id
        + b"\x00" * 4
        + struct.pack(">I", dur)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    mvhd = full(
        b"mvhd",
        0,
        struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10
        + matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_id
    )
    return ftyp + mdat + box(b"moov", mvhd + box(b"trak", tkhd + mdia))


def resize_images(
    assets: DataFrame, width: int, height: int
) -> DataFrame:
    """Image rows → re-encoded at (width, height); non-images pass through.

    The Spark contract is the real thing: one Arrow-batched ``mapInPandas``
    pass, binary in → binary out, schema preserved (``ASSET_SCHEMA``), no
    payload ever leaves the executors.  Decodable PNG inputs get REAL
    nearest-neighbor resampling of their decoded luminance plane
    (:func:`_image_pixels`: PNG, GIF, uncompressed BMP, baseline JPEG),
    re-encoded by :func:`_write_png_gray`.  Undecodable inputs fall
    back to the labeled stand-in: BLAKE2b-derived pixels tiled to
    width*height, still packed into a genuine PNG so downstream
    ``decode_assets`` reads back the target dimensions from a real header.
    """
    out_cols = [f.name for f in ASSET_SCHEMA.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, modality, mime, content, meta in zip(
                pdf["asset_id"],
                pdf["modality"],
                pdf["mime_type"],
                pdf["content"],
                pdf["meta_json"],
            ):
                if modality != "image":
                    rows.append(
                        {
                            "asset_id": aid,
                            "modality": modality,
                            "mime_type": mime,
                            "content": content,
                            "meta_json": meta,
                        }
                    )
                    continue
                rows.append(
                    {
                        "asset_id": aid,
                        "modality": "image",
                        "mime_type": "image/png",
                        "content": bytearray(
                            resize_image_content(
                                bytes(content), width, height
                            )
                        ),
                        "meta_json": meta,
                    }
                )
            yield pd.DataFrame(rows, columns=out_cols)

    return assets.select(*out_cols).mapInPandas(kernel, ASSET_SCHEMA)


def resize_image_content(content: bytes, width: int, height: int) -> bytes:
    """One image payload -> (width, height) gray PNG bytes (the per-row
    body of :func:`resize_images`, extracted so the independent-DCT
    reference test can run the identical transform in-process)."""
    src = _image_pixels(content)
    if src is not None:
        # REAL nearest-neighbor resample of the decoded luminance plane.
        lum = np.clip(_luminance(src), 0, 255).astype(np.uint8)
        ri = (np.arange(height) * lum.shape[0]) // height
        ci = (np.arange(width) * lum.shape[1]) // width
        pixels = lum[np.ix_(ri, ci)].tobytes()
    else:
        # STAND-IN resample (non-PNG: no codec libs in env):
        # deterministic pixels from the payload.
        npix = width * height
        seed = hashlib.blake2b(content, digest_size=64).digest()
        pixels = (seed * (npix // len(seed) + 1))[:npix]
    return _write_png_gray(width, height, pixels)


def make_asset_table(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic asset table.

    EVERY payload is a real decodable container written by the pure-Python
    writers in this repo: gray PNG, 4-color GIF, 24-bit BMP, baseline
    JPEG, PCM16 WAV, and ISO-BMFF MP4 with a full sample table
    (:func:`_write_mp4_video`) — so the decode pipeline exercises its
    actual pixel/sample/sample-table paths for all six modalities."""
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    rows = []
    for i in range(n):
        w, h = 8 + i % 9, 6 + i % 7
        seed = hashlib.blake2b(str(i).encode(), digest_size=32).digest()
        kind = i % 6
        if kind == 0:
            gray = bytes(
                seed[(x * y + i) % len(seed)] for y in range(h) for x in range(w)
            )
            row = (i, "image", "image/png",
                   bytearray(_write_png_gray(w, h, gray)), "{}")
        elif kind == 1:
            idx = [(x + y + i) % 4 for y in range(h) for x in range(w)]
            row = (i, "image", "image/gif",
                   bytearray(_write_gif_indexed(w, h, idx, palette)), "{}")
        elif kind == 2:
            px = np.frombuffer(
                (seed * ((w * h * 3) // len(seed) + 1))[: w * h * 3], np.uint8
            ).reshape(h, w, 3)
            row = (i, "image", "image/bmp",
                   bytearray(_write_bmp_rgb(w, h, px)), "{}")
        elif kind == 3:
            t = np.arange(800 + 100 * (i % 5))
            samples = (3000 * np.sin(t * (0.02 + 0.003 * (i % 11)))).astype(
                np.int16
            )
            row = (i, "audio", "audio/wav",
                   bytearray(_write_wav_pcm16(samples)), "{}")
        elif kind == 4:
            from .jpeg import write_jpeg_baseline

            px = np.frombuffer(
                (seed * ((w * h * 3) // len(seed) + 1))[: w * h * 3], np.uint8
            ).reshape(h, w, 3)
            row = (i, "image", "image/jpeg",
                   bytearray(write_jpeg_baseline(px)), "{}")
        else:
            frames = [
                hashlib.blake2b(
                    seed + bytes([j]), digest_size=32
                ).digest() * (2 + (i + j) % 3)
                for j in range(3 + i % 5)
            ]
            row = (i, "video", "video/mp4",
                   bytearray(_write_mp4_video(16 * w, 16 * h, frames)), "{}")
        rows.append(row)
    return spark.createDataFrame(rows, ASSET_SCHEMA).repartition(8, "asset_id")


def cosine_to_query(decoded: DataFrame, query: list[float]) -> DataFrame:
    """Feature-space similarity of decoded assets to a query vector — pure
    Catalyst fold over the feature array (no Python)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.expr(
        "aggregate(zip_with(feature, _q, (a, b) -> a * b), CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + x)"
    )
    nf = F.sqrt(
        F.expr(
            "aggregate(feature, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)"
        )
    )
    nq = F.sqrt(
        F.expr("aggregate(_q, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)")
    )
    return (
        decoded.withColumn("_q", q)
        .withColumn("cosine", dot / (nf * nq))
        .drop("_q")
    )


# ---------------------------------------------------------------------------
# Perceptual hashing (image near-dup dedup)
# ---------------------------------------------------------------------------

#: pHash LSH banding: 8 bands × 8 bits — by pigeonhole ANY pair within
#: Hamming distance 7 shares at least one exact band, so candidate recall
#: is total for the <= 6 threshold used by :func:`phash_near_pairs`.
PHASH_BANDS = 8
PHASH_MAX_HAMMING = 6


def _dct32_basis() -> np.ndarray:
    """Orthonormal 32-point DCT-II basis, quantized to a 2^-40 grid.

    The quantization is a HOST-REPRODUCIBILITY measure, not an accuracy
    one: ``np.cos`` dispatches to CPU-specific SIMD kernels whose results
    may differ in the last ulp between machines, and a last-ulp
    difference in the basis can flip a pHash bit whose DCT coefficient
    sits within rounding noise of the median split.  Snapping every
    basis entry to a 2^-40 grid collapses those ulps to identical
    doubles on every host (an entry would have to land within 2^-41 of a
    grid boundary for two hosts to still disagree — none of the 1024
    fixed angles does) while perturbing the basis by < 1e-12, far below
    anything the hash's median threshold can see."""
    n = np.arange(32)
    d = np.sqrt(2.0 / 32) * np.cos(
        np.pi * (2 * n[None, :] + 1) * n[:, None] / 64
    )
    d[0] *= 1 / np.sqrt(2)
    return np.round(d * (1 << 40)) / (1 << 40)


_DCT32 = _dct32_basis()


def _matmul_ordered(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Bit-reproducible matrix product — see
    :func:`lab_etl_spark.multimodal.jpeg.matmul_ordered` (one shared
    implementation: the round-13 host change flipped two bits of one
    planted pHash through a BLAS ``@`` here, and the JPEG DCTs carry the
    same knife-edge-rounding hazard)."""
    from .jpeg import matmul_ordered

    return matmul_ordered(a, b)


def phash64(lum: np.ndarray) -> int:
    """Classic 64-bit perceptual hash of a luminance plane: nearest-neighbor
    resample to 32×32, orthonormal 2-D DCT, the low-frequency 8×8 block
    thresholded at its median (DC excluded from the median so one huge
    coefficient cannot skew the split).  Every float step is order-fixed
    (:func:`_matmul_ordered`, quantized basis) so the hash is
    bit-reproducible across hosts — a BLAS ``@`` here produced
    host-dependent bits and broke the literal oracle pin (see those
    docstrings).  Measured on the synthetic corpus: ±3-gray noise moves
    <= 2 bits; unrelated images differ by >= 24."""
    lum = lum.astype(np.float64)
    ys = (np.arange(32) * lum.shape[0]) // 32
    xs = (np.arange(32) * lum.shape[1]) // 32
    small = lum[np.ix_(ys, xs)]
    dct = _matmul_ordered(_matmul_ordered(_DCT32, small), _DCT32.T)
    block = dct[:8, :8].flatten()
    med = np.median(block[1:])
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << i
    return bits


def phash_assets(assets: DataFrame) -> DataFrame:
    """(asset_id, mime, phash) for every decodable image payload — one
    Arrow-batched pass; payloads never leave the executors."""
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("mime", StringType()),
            StructField("phash", LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, mime, content in zip(
                pdf["asset_id"], pdf["mime_type"], pdf["content"]
            ):
                px = _image_pixels(bytes(content))
                if px is None:
                    continue
                h = phash64(_luminance(px) if px.ndim == 3 else px)
                # store as signed 64-bit (Spark LongType)
                rows.append(
                    {
                        "asset_id": aid,
                        "mime": mime,
                        "phash": h - (1 << 64) if h >= (1 << 63) else h,
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "mime", "phash"])

    return assets.select("asset_id", "mime_type", "content").mapInPandas(
        kernel, schema
    )


def phash_near_pairs(
    hashed: DataFrame, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """Near-duplicate image pairs at Hamming <= ``max_hamming`` via
    band-bucketed LSH over the 64-bit pHash — same candidate algebra as
    operators/simhash.py, JVM-side end to end: band keys explode in
    codegen, candidates meet on (band, key), and ``bit_count(xor)`` kills
    false positives exactly.  Scale: O(assets × bands) bucket rows, never
    the all-pairs product."""
    width = 64 // PHASH_BANDS
    band_keys = F.array(
        *[
            F.expr(
                f"(phash >> {b * width}) & {(1 << width) - 1}"
            )
            for b in range(PHASH_BANDS)
        ]
    )
    buckets = hashed.select(
        "asset_id", "mime", "phash", F.posexplode(band_keys).alias("band", "bkey")
    )
    x, y = buckets.alias("x"), buckets.alias("y")
    ham = F.expr("bit_count(h_a ^ h_b)")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.asset_id") < F.col("y.asset_id")),
        )
        .select(
            F.col("x.asset_id").alias("id_a"),
            F.col("y.asset_id").alias("id_b"),
            F.col("x.mime").alias("mime_a"),
            F.col("y.mime").alias("mime_b"),
            F.col("x.phash").alias("h_a"),
            F.col("y.phash").alias("h_b"),
        )
        .distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "mime_a", "mime_b", "hamming")
    )


def make_near_dup_assets(spark, n_pairs: int = 24) -> DataFrame:
    """Synthetic image table with planted CROSS-FORMAT near-duplicates:
    pair 2i is a gray PNG, pair 2i+1 the same luminance plane with ±3
    deterministic noise re-encoded as 24-bit BMP — the transcoded-copy
    situation (same picture, different container + tiny requantization)
    that byte-level dedup can never catch and pHash exists for."""
    rows = []
    for i in range(n_pairs):
        w, h = 8 + i % 9, 6 + i % 7
        seed = hashlib.blake2b(f"phash{i}".encode(), digest_size=32).digest()
        gray = np.frombuffer(
            (seed * ((w * h) // len(seed) + 1))[: w * h], np.uint8
        ).reshape(h, w)
        noise = (
            np.frombuffer(
                (hashlib.blake2b(f"n{i}".encode(), digest_size=32).digest()
                 * ((w * h) // 32 + 1))[: w * h],
                np.uint8,
            ).reshape(h, w).astype(np.int16) % 7 - 3
        )
        noisy = np.clip(gray.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        rows.append(
            (2 * i, "image", "image/png",
             bytearray(_write_png_gray(w, h, gray.tobytes())), "{}")
        )
        rows.append(
            (2 * i + 1, "image", "image/bmp",
             bytearray(_write_bmp_rgb(w, h, np.repeat(noisy[:, :, None], 3, 2))),
             "{}")
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA).repartition(8, "asset_id")


# ---------------------------------------------------------------------------
# Audio fingerprinting (constellation tokens, Shazam-style)
# ---------------------------------------------------------------------------

#: FFT frame/hop and the four spectral bands (rfft bins at frame=256)
_FP_FRAME, _FP_HOP = 256, 128
_FP_BANDS = [(4, 24), (24, 56), (56, 92), (92, 129)]
#: token-set Jaccard threshold for a near-dup verdict (integer 3/5)
AUDIO_FP_T_NUM, AUDIO_FP_T_DEN = 3, 5


def audio_fingerprint_tokens(samples: np.ndarray) -> list[int]:
    """Spectral-peak constellation fingerprint of a PCM clip: Hann-windowed
    FFT frames, the strongest bin per band (amplitude-gated at 20% of the
    frame max so silent bands emit nothing), and (band, peak_i, peak_j,
    Δframe) pairs over 1-2 frame gaps packed into integers — the
    Shazam-style landmark scheme reduced to pure numpy.  Noise moves no
    token on the synthetic corpus while unrelated clips share ~none
    (pinned in tests/test_multimodal_decode.py).  Deterministic
    everywhere: FFT of float64 + integer packing."""
    if samples.ndim == 2:
        samples = samples.mean(axis=1)
    seq = []
    for s in range(0, len(samples) - _FP_FRAME + 1, _FP_HOP):
        w = samples[s : s + _FP_FRAME] * np.hanning(_FP_FRAME)
        mag = np.abs(np.fft.rfft(w))
        gate = 0.2 * mag[4:].max() if mag[4:].size else 0.0
        peaks = []
        for lo, hi in _FP_BANDS:
            k = int(np.argmax(mag[lo:hi])) + lo
            peaks.append(k if mag[k] >= gate else -1)
        seq.append(peaks)
    toks = set()
    for i in range(len(seq) - 2):
        for b in range(len(_FP_BANDS)):
            for dj in (1, 2):
                a, c = seq[i][b], seq[i + dj][b]
                if a >= 0 and c >= 0:
                    toks.add((b << 24) | (a << 16) | (c << 8) | dj)
    return sorted(toks)


def fingerprint_audio(assets: DataFrame) -> DataFrame:
    """(asset_id, token) rows for every decodable PCM payload — tokens
    extracted in one Arrow-batched pass, then everything downstream
    (posting lists, pair generation, Jaccard) runs JVM-side in the same
    inverted-index algebra as text dedup."""
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("token", LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                x = _wav_samples(bytes(content))
                if x is None or not len(x):
                    continue
                for t in audio_fingerprint_tokens(x):
                    rows.append({"asset_id": aid, "token": t})
            yield pd.DataFrame(rows, columns=["asset_id", "token"])

    return assets.select("asset_id", "content").mapInPandas(kernel, schema)


def audio_near_pairs(fingerprints: DataFrame) -> DataFrame:
    """Near-duplicate audio pairs at token-set Jaccard >= 3/5 — the text
    package's posting-list kernel verbatim (one shuffle on the token,
    codegen pair explosion, integer threshold), fed by spectral landmarks
    instead of shingles."""
    from ..operators.dedup import _pair_common_counts, _shingle_postings

    sh = fingerprints.select(
        F.col("asset_id").alias("doc_id"), F.col("token").alias("shingle")
    )
    postings = _shingle_postings(sh, None)
    sizes = (
        postings.select(F.explode("_ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_fp"))
    )
    pairs = _pair_common_counts(postings)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_b"))
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(AUDIO_FP_T_DEN * F.col("n_common") >= AUDIO_FP_T_NUM * union)
        .select(
            F.col("doc_a").alias("id_a"),
            F.col("doc_b").alias("id_b"),
            "n_common",
            F.round(F.col("n_common").cast("double") / union, 6).alias(
                "jaccard"
            ),
        )
    )


def make_near_dup_audio(spark, n_pairs: int = 16) -> DataFrame:
    """Synthetic WAV table with planted near-duplicates: clip 2i is a
    3-tone mixture with blake2b-seeded frequencies across the full band,
    clip 2i+1 the same mixture plus σ=0.05 deterministic noise — the
    re-encoded/re-recorded copy case."""
    rows = []
    for i in range(n_pairs):
        seed = int.from_bytes(
            hashlib.blake2b(f"audio{i}".encode(), digest_size=8).digest(),
            "big",
        )
        rng = np.random.RandomState(seed % (2**31))
        n = 1500 + 200 * (i % 4)
        t = np.arange(n)
        x = np.zeros(n)
        for _ in range(3):
            w = rng.uniform(0.1, 2.8)
            a = rng.uniform(0.3, 1.0)
            x += a * np.sin(w * t + rng.uniform(0, 2 * np.pi))
        noisy = x + np.random.RandomState(i).normal(0, 0.05, n)
        for j, sig in ((0, x), (1, noisy)):
            pcm = np.clip(sig * 8000, -32768, 32767).astype(np.int16)
            rows.append(
                (2 * i + j, "audio", "audio/wav",
                 bytearray(_write_wav_pcm16(pcm)), "{}")
            )
    return spark.createDataFrame(rows, ASSET_SCHEMA).repartition(8, "asset_id")
