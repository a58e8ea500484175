"""Pure-stdlib/numpy media codecs for the multimodal operators.

REAL codecs (no external libraries, fully decoded content):

- **PPM (P6)** — binary NetPBM RGB images (header parse + numpy reshape)
- **BMP** — uncompressed 24-bit Windows bitmaps (BITMAPINFOHEADER,
  bottom-up row order, 4-byte row padding, BGR→RGB)
- **WAV** — PCM audio via the stdlib ``wave`` module (8/16/32-bit)

Everything else (JPEG/PNG/MP4/…) needs codec libraries this container
does not ship and raises ``NotImplementedError`` — callers decide
whether to quarantine the row or substitute a clearly-flagged
deterministic stand-in. Encoders for the real formats exist so tests can
round-trip content without fixture binaries.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# Sniffing
# ---------------------------------------------------------------------------


def sniff(data: bytes) -> str | None:
    """Best-effort container detection for the formats we can decode."""
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def _ppm_tokens(data: bytes, n: int) -> tuple[list[bytes], int]:
    """First ``n`` whitespace-delimited header tokens (comments skipped);
    returns (tokens, offset just past the single whitespace that
    terminates the last token — the pixel data start)."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":
            while i < len(data) and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        start = i
        while i < len(data) and not data[i:i + 1].isspace():
            i += 1
        if start == i:
            raise ValueError("truncated PPM header")
        toks.append(data[start:i])
    return toks, i + 1  # exactly one whitespace byte after maxval


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 → (height, width, 3) uint8 RGB array."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    (_, w, h, maxval), off = _ppm_tokens(data, 4)
    w, h, maxval = int(w), int(h), int(maxval)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    pixels = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    return pixels.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit)
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (height, width, 3) uint8 RGB array."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=pixel_off).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    raw = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raw), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw),
                      2835, 2835, 0, 0)
    return header + dib + raw


# ---------------------------------------------------------------------------
# WAV (PCM via stdlib wave)
# ---------------------------------------------------------------------------

_WAV_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (samples float64 in [-1, 1] shaped (frames, channels),
    sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        ch, sw, rate, n = (wf.getnchannels(), wf.getsampwidth(),
                           wf.getframerate(), wf.getnframes())
        if sw not in _WAV_DTYPES:
            raise NotImplementedError(f"unsupported sample width {sw}")
        raw = wf.readframes(n)
    x = np.frombuffer(raw, dtype=_WAV_DTYPES[sw]).astype(np.float64)
    if sw == 1:          # 8-bit WAV is unsigned, midpoint 128
        x = (x - 128.0) / 128.0
    else:
        x = x / float(2 ** (8 * sw - 1))
    return x.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(frames, channels) float in [-1, 1] → 16-bit PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Decoded-content features
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes; NotImplementedError for formats needing
    libraries absent from this container (JPEG, PNG, …)."""
    kind = sniff(data)
    if kind == "ppm":
        return decode_ppm(data)
    if kind == "bmp":
        return decode_bmp(data)
    raise NotImplementedError(
        "no codec for this image format (supported here: PPM P6, "
        "24-bit BMP; JPEG/PNG need external libraries)")


def luma(arr: np.ndarray) -> np.ndarray:
    """Rec.601 grayscale from an RGB uint8 array."""
    return (0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1]
            + 0.114 * arr[:, :, 2])


def resize_nn(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w[, c]) array via index maps —
    the decode/resize primitive for thumbnailing media payloads."""
    h, w = arr.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ri][:, ci]


def image_features(arr: np.ndarray, dims: int) -> list[float]:
    """L1-normalized luma histogram with ``dims`` bins over the decoded
    pixels — a real content-derived feature vector (two images with the
    same bytes always match; brightness shifts move mass across bins)."""
    hist, _ = np.histogram(luma(arr), bins=dims, range=(0.0, 256.0))
    total = hist.sum() or 1
    return (hist / total).astype(float).tolist()


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Real signal statistics from decoded PCM: duration, RMS, peak,
    zero-crossing rate (mean over channels)."""
    frames = samples.shape[0]
    mono = samples.mean(axis=1) if samples.size else samples.reshape(0)
    zc = (np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean() \
        if frames > 1 else 0.0
    return {
        "duration_ms": int(round(frames * 1000.0 / rate)) if rate else 0,
        "sample_rate": int(rate),
        "n_channels": int(samples.shape[1]) if samples.ndim == 2 else 1,
        "rms": float(np.sqrt((mono ** 2).mean())) if frames else 0.0,
        "peak": float(np.abs(mono).max()) if frames else 0.0,
        "zero_crossing_rate": float(zc),
    }
