"""Real pure-numpy media codecs for the multimodal operators.

No media libraries ship in this container, so the two simplest REAL
containers are implemented from their public specs with struct + numpy:

- **BMP** (Windows Bitmap, BITMAPINFOHEADER variant): 24-bit uncompressed,
  BGR pixel order, rows bottom-up (or top-down when height < 0), each row
  zero-padded to a 4-byte boundary. Spec: the Microsoft BITMAPFILEHEADER /
  BITMAPINFOHEADER layout (public documentation).
- **WAV** (RIFF/WAVE): chunk-walked container, PCM (format tag 1) mono
  16-bit little-endian samples in the `data` chunk, chunks word-aligned.
  Spec: the public RIFF/WAVE format description.

The encoders exist so the pipeline can synthesize payloads deterministically
from document text (the test corpus carries no real media); the decoders are
full parsers — they validate magic numbers, walk real headers/chunks, honor
row padding / bottom-up order / word alignment — and are pinned in
tests/test_multimodal.py against hand-built files the encoders never
produced (top-down BMPs, WAVs with extra chunks before `data`).

Everything here is executor-side code invoked from Arrow-batched
mapInPandas (llm/multimodal.py); nothing touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np

# --- BMP ------------------------------------------------------------------

_BMP_FILE = struct.Struct("<2sIHHI")  # magic, file size, 2x reserved, px offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")  # 40-byte BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) -> 24-bit uncompressed BMP bytes
    (bottom-up rows, BGR order, 4-byte row padding)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {pixels.shape}")
    h, w, _ = pixels.shape
    row = w * 3
    stride = (row + 3) & ~3
    img_size = stride * h
    offset = _BMP_FILE.size + _BMP_INFO.size
    header = _BMP_FILE.pack(b"BM", offset + img_size, 0, 0, offset)
    info = _BMP_INFO.pack(40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    # RGB -> BGR, top row last (bottom-up)
    rows[:, :row] = pixels[::-1, :, ::-1].reshape(h, row)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> RGB uint8 array (h, w, 3).

    Validates the magic, reads the pixel offset from the file header and
    the dims/bpp/compression from BITMAPINFOHEADER, honors the 4-byte row
    stride, and handles both bottom-up (h > 0) and top-down (h < 0) rows."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    _, _file_size, _, _, offset = _BMP_FILE.unpack_from(payload, 0)
    hdr_size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: planes={planes} bpp={bpp} comp={comp}")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dims {w}x{h}")
    stride = (w * 3 + 3) & ~3
    need = offset + stride * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} < {need} bytes")
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    bgr = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(pixels: np.ndarray, target_long_edge: int) -> np.ndarray:
    """Nearest-neighbor resample so the long edge equals target_long_edge,
    preserving aspect ratio (center-of-pixel sampling — the standard
    nearest-neighbor mapping, deterministic)."""
    h, w, _ = pixels.shape
    scale = target_long_edge / max(w, h)
    ow = max(1, round(w * scale))
    oh = max(1, round(h * scale))
    yi = np.minimum(((np.arange(oh) + 0.5) * h / oh).astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(ow) + 0.5) * w / ow).astype(np.int64), w - 1)
    return pixels[yi][:, xi]


# --- WAV ------------------------------------------------------------------

_WAV_FMT = struct.Struct("<HHIIHH")  # tag, channels, rate, byte rate, align, bits


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Mono int16 samples -> RIFF/WAVE PCM bytes (fmt + data chunks,
    word-aligned)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = _WAV_FMT.pack(1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) % 2:
        body += b"\x00"  # chunk word alignment
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes -> (sample_rate, mono int16 samples).

    Walks chunks (word-aligned) rather than assuming fixed offsets, so
    containers with extra chunks (LIST/INFO, fact) before `data` parse
    correctly; rejects non-PCM, non-mono, non-16-bit streams."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    rate: int | None = None
    samples: np.ndarray | None = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate, _brate, _align, bits = _WAV_FMT.unpack_from(body, 0)
            if tag != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: tag={tag} channels={channels} bits={bits}"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    return rate, samples


# --- deterministic synthesis (document text -> media payload) -------------


def pixels_from_bytes(data: bytes) -> np.ndarray:
    """Deterministic RGB image from arbitrary bytes: content-derived dims,
    pixel values tiled from the bytes themselves. Stands in for a camera —
    everything downstream of it is a real codec path."""
    n = len(data)
    w = 8 + n % 24
    h = max(1, min(64, -(-n // (3 * w))))
    need = 3 * w * h
    if n == 0:
        buf = np.zeros(need, dtype=np.uint8)
    else:
        reps = -(-need // n)
        buf = np.frombuffer((data * reps)[:need], dtype=np.uint8)
    return buf.reshape(h, w, 3).copy()


def samples_from_bytes(data: bytes, min_samples: int = 256) -> np.ndarray:
    """Deterministic mono int16 PCM from arbitrary bytes: each byte maps to
    a centered 16-bit sample, repeated to at least min_samples."""
    if not data:
        data = b"\x80"
    arr = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) * 256
    if len(arr) < min_samples:
        arr = np.tile(arr, -(-min_samples // len(arr)))[:min_samples]
    return arr
