"""Real, dependency-free media codecs for the multimodal operators.

The container has no image/audio libraries, but these formats need
none: uncompressed 24-bit BMP (fixed little-endian headers + raw BGR
rows), PCM WAV (stdlib ``wave``), PNG (stdlib ``zlib`` — DEFLATE is
the whole compression; chunks/CRCs/filters hand-rolled), and baseline
JPEG (ITU-T T.81 sequential DCT — numpy matrix DCT, Annex-K tables,
canonical Huffman coding, all hand-rolled below). These give the
``mapInPandas`` multimodal plumbing (operators/multimodal.py) REAL
decode → feature/resize paths end-to-end, including both a lossless
(PNG) and a lossy (JPEG) compressed-image codec, and a real VIDEO
path: a minimal ISO-BMFF (MP4) container writer/parser carrying
motion-JPEG samples — box walking, sample tables, metadata without
touching frame bytes, offset-based frame sampling. Frame-exact video
codecs (H.264/HEVC) genuinely need native libraries and remain
injection points.

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


# ---------------------------------------------------------------- JPEG
#
# Baseline JFIF (ITU-T T.81 sequential DCT, 8-bit) with no dependency
# beyond numpy: the encoder writes 4:4:4 or 4:2:0 with the Annex-K
# quantization + Huffman tables; the decoder reads any baseline SOF0
# stream whose sampling factors are in {1, 2} (covers 4:4:4, 4:2:2,
# 4:2:0 and grayscale), honoring the tables IN the stream (DQT/DHT are
# self-describing — the Annex-K constants below are encoder defaults,
# not decoder assumptions) plus DRI restart markers. Unsupported
# variants (progressive, 12-bit, arithmetic coding) raise.
#
# JPEG is lossy: the roundtrip contract is PSNR, not equality — pinned
# in tests, alongside exact checks the math allows (a uniform image is
# DC-only and reconstructs to the same value modulo quantization).

JPEG_SIG = b"\xff\xd8\xff"

_JPEG_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_JPEG_QUANT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex-K Huffman table specs: (BITS counts for code lengths 1..16,
# HUFFVAL symbol list in code order).
_DC_LUM_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_AC_CHR_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix: forward is D @ B @ D.T, inverse
    is D.T @ B @ D (D is orthogonal — pinned in tests)."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2
    d[0, :] = 1 / (2 * np.sqrt(2))
    return d


_DCT = _dct_matrix()


def _quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality→table scaling (jcparam.c convention)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _huff_codes(spec: tuple[list[int], list[int]]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment: symbol → (code, bit-length)."""
    bits, vals = spec
    out: dict[int, tuple[int, int]] = {}
    code, i = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def pad_to_byte(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1-bits per T.81


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _pad_to_multiple(plane: np.ndarray, m: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % m, (-w) % m
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _block_dct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) plane (H, W multiples of 8) → (H/8 * W/8, 64) zigzagged
    quantized int32 coefficients, block raster order."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) - 128.0
    )
    coef = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
    q = np.round(coef / qtab.reshape(8, 8)).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZIGZAG]


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    bw: _JpegBitWriter,
    zz: np.ndarray,
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    diff = int(zz[0]) - pred
    s = _size_cat(diff)
    code, length = dc_tab[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                zrl, zl = ac_tab[0xF0]
                bw.write(zrl, zl)
                run = 0
            continue
        s = _size_cat(v)
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        eob, el = ac_tab[0x00]
        bw.write(eob, el)
    return int(zz[0])


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes. ``subsample=True``
    writes 4:2:0 (chroma averaged 2×2, Y sampling 2×2); default is
    4:4:4. ``grayscale=True`` writes a single-component (Y-only)
    stream. ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs. Deterministic: fixed Annex-K tables scaled by
    ``quality``, round-half-away quantization, no RNG."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_jpeg expects an (h, w, 3) RGB array")
    h, w, _ = pixels.shape
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    qlum = _quality_scaled(_JPEG_QUANT_LUM, quality)
    qchr = _quality_scaled(_JPEG_QUANT_CHR, quality)
    y, cb, cr = _rgb_to_ycbcr(pixels)

    if grayscale:
        samp = [(1, 1)]
        planes = [_pad_to_multiple(y, 8)]
    elif subsample:
        y_p = _pad_to_multiple(y, 16)
        cb_p = _pad_to_multiple(cb, 16)
        cr_p = _pad_to_multiple(cr, 16)
        # 2×2 box average to half resolution
        cb_s = cb_p.reshape(cb_p.shape[0] // 2, 2, cb_p.shape[1] // 2, 2).mean((1, 3))
        cr_s = cr_p.reshape(cr_p.shape[0] // 2, 2, cr_p.shape[1] // 2, 2).mean((1, 3))
        samp = [(2, 2), (1, 1), (1, 1)]
        planes = [y_p, cb_s, cr_s]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
        planes = [_pad_to_multiple(p, 8) for p in (y, cb, cr)]

    qz = [
        _block_dct_quant(p, qlum if ci == 0 else qchr)
        for ci, p in enumerate(planes)
    ]
    # per-component block grids (blocks across, blocks down)
    grids = [(p.shape[1] // 8, p.shape[0] // 8) for p in planes]

    dc_l, ac_l = _huff_codes(_DC_LUM_SPEC), _huff_codes(_AC_LUM_SPEC)
    dc_c, ac_c = _huff_codes(_DC_CHR_SPEC), _huff_codes(_AC_CHR_SPEC)
    ncomp = len(samp)
    comp_tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)][:ncomp]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = planes[0].shape[1] // (8 * hmax)
    mcus_y = planes[0].shape[0] // (8 * vmax)

    bw = _JpegBitWriter()
    preds = [0] * ncomp
    rst = 0
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.pad_to_byte()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samp[ci]
                bx_w, _ = grids[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * bx_w + (mx * sh + bx)
                        preds[ci] = _encode_block(
                            bw, qz[ci][bi], preds[ci], *comp_tabs[ci]
                        )
            mcu_i += 1
    bw.pad_to_byte()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        # DQT entries are serialized in ZIGZAG order per T.81 B.2.4.1
        return seg(0xDB, bytes([tid]) + bytes(int(tab[z]) for z in _ZIGZAG))

    def dht(cls: int, tid: int, spec: tuple[list[int], list[int]]) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qlum)
    out += dqt(1, qchr)
    out += seg(0xC0, sof)
    out += dht(0, 0, _DC_LUM_SPEC)
    out += dht(1, 0, _AC_LUM_SPEC)
    out += dht(0, 1, _DC_CHR_SPEC)
    out += dht(1, 1, _AC_CHR_SPEC)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data: de-stuffs FF 00,
    stops (zero-padding) at any other marker so a truncated read is a
    loud size-mismatch downstream rather than garbage."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos < len(self.data):
                b = self.data[self.pos]
                if b == 0xFF:
                    nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                    if nxt == 0x00:
                        self.pos += 2
                    else:
                        b = 0  # marker reached: pad with zeros, don't advance
                else:
                    self.pos += 1
            else:
                b = 0
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self._n = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("JPEG: expected restart marker")


def _receive_extend(br: _JpegBitReader, s: int) -> int:
    if s == 0:
        return 0
    v = br.read_bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    out: dict[tuple[int, int], int] = {}
    code, i = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_read(br: _JpegBitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB. Supports SOF0
    (baseline sequential, 8-bit) with per-component sampling factors
    in {1, 2} — 4:4:4, 4:2:2, 4:2:0 and grayscale (replicated to 3
    channels) — any number of DQT/DHT segments, and DRI restart
    markers. Tables are read FROM the stream (self-describing), chroma
    upsampling is nearest-neighbor. Progressive (SOF2), 12-bit and
    arithmetic-coded streams raise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, off + 1).astype(np.int32)
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = zz  # de-zigzag to natural order
                qtabs[tq] = tab
                off += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                htabs[(cls, tid)] = _huff_decode_table(bits, vals)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            precision = body[0]
            if precision != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, sf, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("JPEG: only baseline (SOF0/SOF1) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS → entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            scan_tabs = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan_tabs[cs] = (tt >> 4, tt & 0xF)
            return _jpeg_decode_scan(
                payload, pos + 2 + length, frame, scan_tabs,
                qtabs, htabs, restart_interval,
            )
        pos += 2 + length
    raise ValueError("JPEG: no scan data found")


def _jpeg_decode_scan(
    payload: bytes,
    pos: int,
    frame: dict,
    scan_tabs: dict[int, tuple[int, int]],
    qtabs: dict[int, np.ndarray],
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]],
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise ValueError("JPEG: sampling factors beyond 2 unsupported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw = mcus_x * c["h"] * 8
        ph = mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    br = _JpegBitReader(payload, pos)
    preds = [0] * len(comps)
    for mcu_i in range(mcus_x * mcus_y):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            br.sync_restart()
            preds = [0] * len(comps)
        my, mx = divmod(mcu_i, mcus_x)
        for ci, c in enumerate(comps):
            dc_tab = htabs[(0, scan_tabs[c["id"]][0])]
            ac_tab = htabs[(1, scan_tabs[c["id"]][1])]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int32)
                    s = _huff_read(br, dc_tab)
                    preds[ci] += _receive_extend(br, s)
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_read(br, ac_tab)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG: AC index overflow")
                        zz[k] = _receive_extend(br, s)
                        k += 1
                    coef = np.zeros(64, dtype=np.float64)
                    coef[_ZIGZAG] = zz * qtabs[c["tq"]][_ZIGZAG]
                    block = _DCT.T @ coef.reshape(8, 8) @ _DCT + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample each component to full padded-luma resolution (nearest)
    full_h, full_w = mcus_y * vmax * 8, mcus_x * hmax * 8
    up = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        up.append(p[:full_h, :full_w])

    if len(comps) == 1:
        y_p = np.clip(up[0][:h, :w], 0, 255)
        return np.repeat(y_p[..., None], 3, axis=2).astype(np.uint8)
    y_p, cb, cr = up[0][:h, :w], up[1][:h, :w], up[2][:h, :w]
    r = y_p + 1.402 * (cr - 128.0)
    g = y_p - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y_p + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def resize_jpeg(payload: bytes, width: int, height: int) -> bytes:
    """Decode → nearest-neighbor resample → re-encode (4:4:4, q=90)."""
    img = decode_jpeg(payload)
    h, w, _ = img.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_jpeg(img[np.ix_(ys, xs)])


def jpeg_feature(payload: bytes, dim: int) -> list[float]:
    """``dim``-bin normalized grayscale histogram — the JPEG sibling
    of ``bmp_feature``/``png_feature``."""
    img = decode_jpeg(payload)
    gray = img.astype(np.float32).mean(axis=2)
    hist, _ = np.histogram(gray, bins=dim, range=(0.0, 255.0))
    total = max(int(hist.sum()), 1)
    return [round(float(x) / total, 6) for x in hist]


def jpeg_color_feature(payload: bytes, bins_per_channel: int = 8) -> list[float]:
    """Concatenated per-channel RGB histograms — the JPEG sibling of
    ``bmp_color_feature``."""
    img = decode_jpeg(payload)
    out: list[float] = []
    n = max(img.shape[0] * img.shape[1], 1)
    for ch in range(3):
        hist, _ = np.histogram(
            img[..., ch], bins=bins_per_channel, range=(0, 256)
        )
        out.extend(round(float(x) / n, 6) for x in hist)
    return out


# ----------------------------------------------------------------- MP4
#
# Minimal ISO BMFF (MP4 / ISO 14496-12) container carrying motion-JPEG
# samples — the video sibling of the image codecs above, and the last
# multimodal format to get a REAL dependency-free path: the container
# is pure struct packing (boxes are length-prefixed fourcc trees), and
# the per-frame payload is the baseline JPEG codec above. Frame-exact
# video codecs (H.264 etc.) genuinely need native libraries and stay
# injection points; motion-JPEG-in-MP4 is the standard
# no-external-codec compromise and exercises every piece of container
# plumbing a real pipeline needs: box walking, sample tables
# (stsz/stco/stsc/stts), metadata extraction WITHOUT touching frame
# bytes, and offset-based frame sampling that reads only the selected
# samples.


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + fourcc + body


def _full_box(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def encode_mp4(
    frames: list[np.ndarray], fps: int = 8, quality: int = 90
) -> bytes:
    """List of (h, w, 3) uint8 RGB frames → MP4 bytes (motion-JPEG:
    one baseline-JPEG sample per frame, 'jpeg' sample entry, single
    chunk, constant frame duration). Deterministic for given input."""
    if not frames:
        raise ValueError("encode_mp4: need at least one frame")
    h, w, _ = frames[0].shape
    for f in frames:
        if f.shape != frames[0].shape:
            raise ValueError("encode_mp4: all frames must share one shape")
    samples = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(samples)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(samples))
    data_start = len(ftyp) + 8  # first sample byte: after mdat header

    movie_ts = 1000
    movie_dur = n * movie_ts // fps

    mvhd = _full_box(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, movie_ts, movie_dur)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume, reserved
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full_box(
        b"tkhd", 0, 3,  # enabled + in-movie
        struct.pack(">IIIII", 0, 0, 1, 0, movie_dur)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
    )
    mdhd = _full_box(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full_box(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full_box(
        b"dref", 0, 0, struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)
    sample_entry = _box(
        b"jpeg",  # QuickTime/ISO motion-JPEG sample entry fourcc
        b"\x00" * 6
        + struct.pack(">H", 1)  # data reference index
        + struct.pack(">HH", 0, 0) + b"\x00" * 12  # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count per sample
        + b"\x07mjpeg  " + b"\x00" * 24  # 32-byte compressorname (len-prefixed)
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, data_start))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body_off = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
            body_off = pos + 8
        else:
            body_off = pos + 8
        if size < 8 or pos + size > end:
            raise ValueError("MP4: malformed box size")
        yield fourcc, body_off, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """Return (body_off, box_end) of the first box at ``path``."""
    for fourcc, body_off, box_end in _walk_boxes(data, start, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return body_off, box_end
            return _find_box(data, body_off, box_end, path[1:])
    raise ValueError(f"MP4: box {b'/'.join(path).decode()} not found")


def mp4_metadata(payload: bytes) -> dict:
    """Container metadata WITHOUT touching frame bytes — the cheap
    pre-filter a video pipeline runs before any expensive decode:
    duration, frame count, fps, dimensions and sample-entry fourcc
    from the moov tree alone."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload")
    end = len(payload)
    moov_off, moov_end = _find_box(payload, 0, end, [b"moov"])
    mvhd_off, _ = _find_box(payload, moov_off, moov_end, [b"mvhd"])
    version = payload[mvhd_off]
    if version == 0:
        ts, dur = struct.unpack_from(">II", payload, mvhd_off + 12)
    else:
        (ts,) = struct.unpack_from(">I", payload, mvhd_off + 20)
        (dur,) = struct.unpack_from(">Q", payload, mvhd_off + 24)
    stbl_off, stbl_end = _find_box(
        payload, moov_off, moov_end,
        [b"trak", b"mdia", b"minf", b"stbl"],
    )
    mdhd_off, _ = _find_box(
        payload, moov_off, moov_end, [b"trak", b"mdia", b"mdhd"]
    )
    m_ts, m_dur = struct.unpack_from(">II", payload, mdhd_off + 12)
    stsd_off, _ = _find_box(payload, stbl_off, stbl_end, [b"stsd"])
    fourcc = payload[stsd_off + 12 : stsd_off + 16].decode("ascii", "replace")
    w, h = struct.unpack_from(">HH", payload, stsd_off + 40)
    stsz_off, _ = _find_box(payload, stbl_off, stbl_end, [b"stsz"])
    _, n_samples = struct.unpack_from(">II", payload, stsz_off + 4)
    return {
        "duration_s": round(dur / ts, 6) if ts else 0.0,
        "n_frames": int(n_samples),
        "fps": round(n_samples * m_ts / m_dur, 6) if m_dur else 0.0,
        "width": int(w),
        "height": int(h),
        "codec": fourcc,
    }


def _mp4_sample_spans(payload: bytes) -> list[tuple[int, int]]:
    """(offset, size) per sample from the stsz/stco/stsc tables —
    general over multi-chunk layouts, not just this module's writer."""
    end = len(payload)
    moov_off, moov_end = _find_box(payload, 0, end, [b"moov"])
    stbl_off, stbl_end = _find_box(
        payload, moov_off, moov_end,
        [b"trak", b"mdia", b"minf", b"stbl"],
    )
    stsz_off, _ = _find_box(payload, stbl_off, stbl_end, [b"stsz"])
    fixed, n = struct.unpack_from(">II", payload, stsz_off + 4)
    sizes = (
        [fixed] * n
        if fixed
        else list(struct.unpack_from(f">{n}I", payload, stsz_off + 12))
    )
    stco_off, _ = _find_box(payload, stbl_off, stbl_end, [b"stco"])
    (n_chunks,) = struct.unpack_from(">I", payload, stco_off + 4)
    chunk_offsets = list(
        struct.unpack_from(f">{n_chunks}I", payload, stco_off + 8)
    )
    stsc_off, _ = _find_box(payload, stbl_off, stbl_end, [b"stsc"])
    (n_stsc,) = struct.unpack_from(">I", payload, stsc_off + 4)
    runs = [
        struct.unpack_from(">III", payload, stsc_off + 8 + 12 * i)
        for i in range(n_stsc)
    ]
    # expand stsc runs → samples-per-chunk for each chunk
    spc = []
    for i, (first, per, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        spc.extend([per] * (last - first + 1))
    spans: list[tuple[int, int]] = []
    si = 0
    for ci, coff in enumerate(chunk_offsets):
        pos = coff
        for _ in range(spc[ci] if ci < len(spc) else 0):
            if si >= n:
                break
            spans.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    if si != n:
        raise ValueError("MP4: sample tables disagree on sample count")
    return spans


def mp4_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Evenly-spaced frame sampling: ``n_frames`` sample payloads (the
    JPEG bytes) selected across the video — matches the
    ``sample_fn(payload, n) -> list[bytes]`` contract of
    ``operators.multimodal.sample_frames``. Reads ONLY the selected
    byte ranges, never decodes unselected frames."""
    spans = _mp4_sample_spans(payload)
    total = len(spans)
    if total == 0 or n_frames <= 0:
        return []
    idxs = [min(i * total // n_frames, total - 1) for i in range(n_frames)]
    return [payload[off : off + size] for off, size in (spans[i] for i in idxs)]


def mp4_frame_feature(payload: bytes, dim: int) -> list[float]:
    """Video feature: decode the MIDDLE sampled frame (motion-JPEG)
    and emit its grayscale histogram — the video sibling of
    ``bmp_feature``/``jpeg_feature``."""
    spans = _mp4_sample_spans(payload)
    off, size = spans[len(spans) // 2]
    return jpeg_feature(payload[off : off + size], dim)
