"""Pure-stdlib/numpy media codecs for the multimodal operators.

REAL codecs (no external libraries, fully decoded content):

- **PNG** — 8-bit gray/RGB/palette/gray-alpha/RGBA, non-interlaced
  (stdlib ``zlib`` inflate + per-scanline unfilter of all five PNG
  filter types per RFC 2083 §6)
- **PPM (P6)** — binary NetPBM RGB images (header parse + numpy reshape)
- **BMP** — uncompressed 24-bit Windows bitmaps (BITMAPINFOHEADER,
  bottom-up row order, 4-byte row padding, BGR→RGB)
- **WAV** — PCM audio via the stdlib ``wave`` module (8/16/32-bit)

Everything else (JPEG/MP4/…, plus PNG's interlaced/16-bit variants)
needs codec libraries this container does not ship and raises
``NotImplementedError`` — callers decide whether to quarantine the row
or substitute a clearly-flagged deterministic stand-in. Encoders for the
real formats exist so tests can round-trip content without fixture
binaries.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# Sniffing
# ---------------------------------------------------------------------------


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff(data: bytes) -> str | None:
    """Best-effort container detection for the formats we can decode."""
    if data[:8] == _PNG_MAGIC:
        return "png"
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------------------
# PNG (RFC 2083) — stdlib zlib inflate + scanline unfilter
# ---------------------------------------------------------------------------

#: color type → samples per pixel at bit depth 8
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters (None/Sub/Up/Average/Paeth,
    RFC 2083 §6.3-6.6) → (h, stride) uint8 of reconstructed samples.

    Sub/Average/Paeth recurrences are sequential along the row, so those
    rows loop per byte — correct-first; the multimodal pipeline batches
    documents via Arrow and quarantines per row, it never decodes one
    giant image per task."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride,
                            y * (stride + 1) + 1).astype(np.int32)
        if ft == 0:                                   # None
            rec = row
        elif ft == 1:                                 # Sub
            rec = row.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif ft == 2:                                 # Up
            rec = (row + prev) & 0xFF
        elif ft == 3:                                 # Average
            rec = row.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:                                 # Paeth
            rec = row.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG → (height, width, 3) uint8 RGB array.

    Supports the 8-bit non-interlaced profiles (gray, RGB, palette,
    gray+alpha, RGBA — alpha dropped, gray replicated, palette resolved
    via PLTE). 16-bit, sub-byte depths and Adam7 interlace raise
    ``NotImplementedError`` (quarantined upstream like JPEG)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, plte, hdr = 8, [], None, None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack_from(">I4s", data, pos)
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if hdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, ctype, comp, filt, interlace = hdr
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit depth {depth} / interlace {interlace} not "
            f"supported (8-bit non-interlaced only)")
    if comp != 0 or filt != 0 or ctype not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG header {hdr}")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    px = _png_unfilter(raw, h, stride, ch).reshape(h, w, ch)
    if ctype == 0:                       # grayscale
        return np.repeat(px, 3, axis=2)
    if ctype == 2:                       # RGB
        return px.copy()
    if ctype == 3:                       # palette
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return plte[px[:, :, 0]]
    if ctype == 4:                       # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()           # RGBA → RGB


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → non-interlaced 8-bit RGB PNG (filter 0
    scanlines) — fixture generator for round-trip tests."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


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
    libraries absent from this container (JPEG, …)."""
    kind = sniff(data)
    if kind == "png":
        return decode_png(data)
    if kind == "ppm":
        return decode_ppm(data)
    if kind == "bmp":
        return decode_bmp(data)
    raise NotImplementedError(
        "no codec for this image format (supported here: PNG 8-bit, "
        "PPM P6, 24-bit BMP; JPEG needs external libraries)")


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
