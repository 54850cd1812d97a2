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
