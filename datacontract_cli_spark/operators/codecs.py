"""Pure-stdlib media codecs for the multimodal operators.

The container has no PIL/opencv/librosa, but UNCOMPRESSED formats need no
codec library: PPM (P6) and BMP (24-bit uncompressed) images and PCM WAV
audio parse with struct/numpy alone. These make the multimodal pipeline
REAL end-to-end for those formats — decode, pixel statistics, resize,
re-encode — while compressed formats (png/jpeg/mp3/mp4) remain explicit
NotImplementedError stubs.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Tuple

import numpy as np


# ---------------------------------------------------------------------------
# images: PPM (P6) + BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _decode_ppm(content: bytes) -> np.ndarray:
    # header: magic, whitespace-separated width height maxval, single
    # whitespace, then raw RGB
    fields, i, n = [], 2, len(content)
    while len(fields) < 3 and i < n:
        while i < n and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":  # comment line
            while i < n and content[i] != 0x0A:
                i += 1
            continue
        start = i
        while i < n and not content[i : i + 1].isspace():
            i += 1
        fields.append(int(content[start:i]))
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    arr = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=i)
    return arr.reshape(h, w, 3).copy()


def _decode_bmp(content: bytes) -> np.ndarray:
    if content[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    header_size = struct.unpack_from("<I", content, 14)[0]
    if header_size < 40:
        raise NotImplementedError("BMP core header not supported")
    w, h = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got bpp={bpp}, "
                                  f"compression={compression})")
    flip = h > 0
    h = abs(h)
    row_stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(content, dtype=np.uint8, count=row_stride * h,
                         offset=data_offset).reshape(h, row_stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return (rgb[::-1] if flip else rgb).copy()


def decode_image(content: bytes) -> np.ndarray:
    """Encoded bytes -> (h, w, 3) uint8. PPM(P6)/BMP24 decode for real;
    anything else raises NotImplementedError (compressed codecs absent)."""
    if content[:2] == b"P6":
        return _decode_ppm(content)
    if content[:2] == b"BM":
        return _decode_bmp(content)
    raise NotImplementedError(
        "only PPM(P6)/BMP24 decode without codec libraries; "
        f"got magic {content[:2]!r}")


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index math."""
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return arr[ys][:, xs]


# ---------------------------------------------------------------------------
# audio: PCM WAV
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> PCM WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(content: bytes) -> Tuple[np.ndarray, int]:
    """PCM WAV bytes -> (float64 samples in [-1, 1] (frames, channels
    collapsed to mono by averaging), sample rate)."""
    with wave.open(io.BytesIO(content), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        channels = f.getnchannels()
        raw = f.readframes(n)
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"sample width {width} not supported")
    if channels > 1:
        arr = arr.reshape(-1, channels).mean(axis=1)
    return arr, rate
