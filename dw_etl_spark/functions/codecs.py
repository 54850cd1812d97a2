"""Real, dependency-free media codecs for the multimodal operators.

The container has no image/audio libraries, but two formats need none:
uncompressed 24-bit BMP (fixed little-endian headers + raw BGR rows —
struct/numpy suffice) and PCM WAV (stdlib ``wave``). These give the
``mapInPandas`` multimodal plumbing (operators/multimodal.py) a REAL
decode → feature/resize path end-to-end; compressed formats
(JPEG/PNG/MP4) remain injection points for environments that ship
codecs.

Everything here is driver/executor-side plain Python over ``bytes`` —
exactly the shape a codec UDF has inside an Arrow batch.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ----------------------------------------------------------------- BMP

_BMP_HEADER = struct.Struct("<2sIHHI")       # signature, file size, res, offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")    # BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_bmp expects an (h, w, 3) RGB array")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = _BMP_HEADER.pack(b"BM", 54 + img_size, 0, 0, 54)
    info = _BMP_INFO.pack(40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    bgr = pixels[..., ::-1]  # BMP stores BGR
    rows = []
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(bgr[y].astype(np.uint8).tobytes() + pad)
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes → (h, w, 3) uint8 RGB array."""
    sig, _, _, _, offset = _BMP_HEADER.unpack_from(payload, 0)
    if sig != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, _, bpp, compression, *_rest) = _BMP_INFO.unpack_from(
        payload, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        start = offset + i * row_size
        row = np.frombuffer(payload, np.uint8, w * 3, start).reshape(w, 3)
        y = h - 1 - i if bottom_up else i
        out[y] = row[:, ::-1]  # BGR → RGB
    return out


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """Decode → nearest-neighbor resample (numpy index grid) → re-encode."""
    img = decode_bmp(payload)
    h, w, _ = img.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_bmp(img[np.ix_(ys, xs)])


def bmp_feature(payload: bytes, dim: int) -> list[float]:
    """Real image feature: ``dim``-bin normalized grayscale histogram."""
    img = decode_bmp(payload)
    gray = img.astype(np.float32).mean(axis=2)
    hist, _ = np.histogram(gray, bins=dim, range=(0.0, 255.0))
    total = max(int(hist.sum()), 1)
    return [round(float(x) / total, 6) for x in hist]


# ----------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """1-D int16 PCM samples → mono WAV bytes (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(rate)
        fh.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, float32 samples in [-1, 1], mono-mixed)."""
    with wave.open(io.BytesIO(payload), "rb") as fh:
        rate = fh.getframerate()
        n_ch = fh.getnchannels()
        width = fh.getsampwidth()
        raw = fh.readframes(fh.getnframes())
    if width != 2:
        raise ValueError(f"unsupported WAV sample width: {width}")
    samples = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return rate, samples


def wav_feature(payload: bytes, dim: int) -> list[float]:
    """Real audio feature: RMS energy over ``dim`` equal time windows."""
    _, samples = decode_wav(payload)
    if samples.size == 0:
        return [0.0] * dim
    chunks = np.array_split(samples, dim)
    return [
        round(float(np.sqrt(np.mean(np.square(c)))) if c.size else 0.0, 6)
        for c in chunks
    ]


def wav_spectral_feature(
    payload: bytes, dim: int, frame: int = 256, hop: int = 128
) -> list[float]:
    """Real FREQUENCY-domain audio feature (numpy only): log10 power in
    ``dim`` equal bands of the Welch-averaged periodogram — Hann-
    windowed ``frame``-sample windows every ``hop`` samples, |rFFT|²
    averaged across windows, band-averaged, log-compressed. The
    spectral sibling of ``wav_feature``'s time-domain RMS profile: a
    440 Hz tone lights up exactly one band instead of every window.

    Deterministic per payload (pure numpy arithmetic); clips shorter
    than one frame are zero-padded to a single frame; an empty clip
    returns all-floor values (log10 of the 1e-12 floor).
    """
    _, samples = decode_wav(payload)
    if samples.size < frame:
        samples = np.pad(samples, (0, frame - samples.size))
    win = np.hanning(frame).astype(np.float32)
    n_frames = 1 + (samples.size - frame) // hop
    psd = np.zeros(frame // 2 + 1, dtype=np.float64)
    for i in range(n_frames):
        seg = samples[i * hop : i * hop + frame] * win
        psd += np.abs(np.fft.rfft(seg)) ** 2
    psd /= max(n_frames, 1)
    bands = np.array_split(psd, dim)
    return [
        round(float(np.log10(np.mean(b) + 1e-12)), 6) for b in bands
    ]


def bmp_color_feature(payload: bytes, bins_per_channel: int = 8) -> list[float]:
    """Real color feature: concatenated per-channel (R, G, B)
    normalized histograms — 3 × ``bins_per_channel`` floats. The color
    sibling of ``bmp_feature``'s grayscale histogram (a pure-red and a
    pure-blue image hash identically in grayscale; not here)."""
    img = decode_bmp(payload)
    out: list[float] = []
    n = max(img.shape[0] * img.shape[1], 1)
    for ch in range(3):
        hist, _ = np.histogram(
            img[..., ch], bins=bins_per_channel, range=(0, 256)
        )
        out.extend(round(float(x) / n, 6) for x in hist)
    return out


# ----------------------------------------------------------------- PNG

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 RGB(A) → PNG bytes — dependency-free: PNG's
    compression IS stdlib ``zlib`` (DEFLATE), so only the container
    (chunks + CRCs) and scanline filtering are hand-rolled. Encoding
    uses filter 0 on every scanline and a fixed compression level, so
    output bytes are deterministic for a given array."""
    import zlib

    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4):
        raise ValueError("encode_png expects an (h, w, 3|4) uint8 array")
    h, w, ch = pixels.shape
    color_type = 2 if ch == 3 else 6

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3|4) uint8 array. Supports the formats a
    pipeline actually normalizes to: 8-bit, color types 2 (RGB) and
    6 (RGBA), non-interlaced, any number of IDAT chunks, all five
    scanline filters (None/Sub/Up/Average/Paeth — the unfilter loop is
    the spec's reconstruction, vectorized per scanline where the
    filter allows). Chunk CRCs are verified; palette/16-bit/interlaced
    variants raise (normalize upstream)."""
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color_type})"
        )
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    ch = 3 if color_type == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.uint16)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth carry left-pixel state
            cur = np.zeros(stride, dtype=np.uint16)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (int(a) + int(b)) // 2
                elif f == 4:
                    p = int(a) + int(b) - int(c)
                    pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"unknown PNG filter {f}")
                cur[x] = (int(line[x]) + int(pred)) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """Decode → nearest-neighbor resample → re-encode (filter-0)."""
    img = decode_png(payload)
    h, w, _ = img.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_png(img[np.ix_(ys, xs)])


def png_feature(payload: bytes, dim: int) -> list[float]:
    """``dim``-bin normalized grayscale histogram (alpha ignored) —
    the PNG sibling of ``bmp_feature``."""
    img = decode_png(payload)[..., :3]
    gray = img.astype(np.float32).mean(axis=2)
    hist, _ = np.histogram(gray, bins=dim, range=(0.0, 255.0))
    total = max(int(hist.sum()), 1)
    return [round(float(x) / total, 6) for x in hist]


def png_color_feature(payload: bytes, bins_per_channel: int = 8) -> list[float]:
    """Concatenated per-channel RGB histograms — the PNG sibling of
    ``bmp_color_feature``."""
    img = decode_png(payload)[..., :3]
    out: list[float] = []
    n = max(img.shape[0] * img.shape[1], 1)
    for ch in range(3):
        hist, _ = np.histogram(
            img[..., ch], bins=bins_per_channel, range=(0, 256)
        )
        out.extend(round(float(x) / n, 6) for x in hist)
    return out
