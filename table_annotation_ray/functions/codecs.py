"""Pure-stdlib media codecs for the multimodal stages.

This environment has no PIL / turbojpeg / ffmpeg, but PNG, BMP and
WAV/PCM are fully decodable with ``zlib`` + ``struct`` + ``wave``
alone, so the DEFAULT decode path of :class:`~..stages.multimodal.
DecodeImage` / :class:`~..stages.multimodal.ExtractAudioFeatures` runs
a REAL kernel (``decoded=True``) rather than the byte-stats fallback.
Formats outside this set (JPEG, MP3, ...) raise
``NotImplementedError`` — the documented plug-point where PIL/ffmpeg
slot in — and corrupt payloads of a recognized format raise
``ValueError`` so one bad row degrades to the fallback instead of
killing a 100 TB job.

Scope (deliberate): PNG 8-bit gray / RGB / RGBA, non-interlaced, all
five scanline filters; BMP 24-bit uncompressed (BI_RGB), top-down or
bottom-up; WAV PCM 8/16-bit, any channel count (mixed to mono).
Encoders for the same formats feed deterministic test/synth payloads.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color_type -> channels (8-bit only; palettes/16-bit are plug-point)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


# ---------------------------------------------------------------- PNG

def decode_png(payload: bytes) -> np.ndarray:
    """PNG → uint8 array of shape (H, W) or (H, W, C).

    Raises ``NotImplementedError`` for PNG features outside the
    supported scope (16-bit, palette, interlaced), ``ValueError`` for
    corrupt data."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = None
    channels = None
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or color_type not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG bit_depth={bit_depth} color_type={color_type} "
                    "outside the stdlib codec scope; plug PIL in here"
                )
            if interlace:
                raise NotImplementedError("interlaced PNG not supported")
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT: {e}") from e
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        f = filters[y]
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub = per-channel cumulative sum mod 256 (the
            # most common real-encoder filter — keep it vectorized)
            cur = (
                np.cumsum(line.reshape(width, bpp), axis=0, dtype=np.int64)
                .reshape(stride) & 0xFF
            ).astype(np.int32)
        else:  # Average / Paeth need the running left pixel
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0  # left
                b = prev[x]  # up
                if f == 3:  # Average
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif f == 4:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0  # up-left
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                    cur[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
    arr = out.reshape(height, width, channels)
    return arr[:, :, 0] if channels == 1 else arr


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (H, W) / (H, W, 3) / (H, W, 4) → PNG bytes (filter 0)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * c)], axis=1
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(rows.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- BMP

def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → uint8 (H, W, 3) RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    (offset,) = struct.unpack("<I", payload[10:14])
    width, height = struct.unpack("<ii", payload[18:26])
    bpp, compression = struct.unpack("<HI", payload[28:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} outside the stdlib "
            "codec scope (24-bit BI_RGB only)"
        )
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    end = offset + stride * height
    if len(payload) < end:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload[offset:end], dtype=np.uint8).reshape(height, stride)
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB → 24-bit bottom-up BMP bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixels = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


# ------------------------------------------------------- image dispatch

def decode_image(payload: bytes) -> np.ndarray:
    """Magic-sniffing image decode: PNG or BMP via the stdlib codecs,
    anything else ``NotImplementedError`` (the PIL plug-point)."""
    if payload.startswith(_PNG_SIG):
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "image format not in the stdlib codec set (PNG/BMP); plug "
        "PIL/turbojpeg in here"
    )


# ---------------------------------------------------------------- WAV

def decode_wav(payload: bytes) -> np.ndarray:
    """WAV PCM → float64 mono in [-1, 1) (channels averaged)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            sw = wf.getsampwidth()
            nch = wf.getnchannels()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"corrupt WAV: {e}") from e
    if sw == 2:
        pcm = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        pcm = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(
            f"WAV sample width {sw} outside the stdlib codec scope (8/16-bit)"
        )
    if nch > 1:
        pcm = pcm[: len(pcm) - len(pcm) % nch].reshape(-1, nch).mean(axis=1)
    return pcm


def encode_wav(pcm: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float array in [-1, 1] → 16-bit mono WAV bytes."""
    i16 = np.clip(np.asarray(pcm, dtype=np.float64) * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(i16.tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes) -> np.ndarray:
    """Magic-sniffing audio decode: WAV/PCM via stdlib ``wave``,
    anything else ``NotImplementedError`` (the ffmpeg plug-point)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        "audio format not in the stdlib codec set (WAV/PCM); plug "
        "ffmpeg/soundfile in here"
    )


# ---------------------------------------------------------------------------
# perceptual hashing
# ---------------------------------------------------------------------------

_PHASH_N = 32  # working grid; DCT low-frequency block is 8x8


def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (row k = frequency k)."""
    k = np.arange(n)[:, None].astype(np.float64)
    x = np.arange(n)[None, :].astype(np.float64)
    d = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


_PHASH_DCT = _dct_basis(_PHASH_N)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash (classic DCT pHash): grayscale → 32×32
    (deterministic integral-image area pooling, nearest upsample below
    32px) → 2-D DCT-II → top-left 8×8 low-frequency block → bit i =
    coefficient_i > median of the 63 AC coefficients.  Signed int64
    (bit pattern offset like the SimHash column) so it rides the same
    banded-Hamming pair machinery.

    Robust to small pixel noise / re-encodes (low frequencies move
    little); NOT robust to crops/rotations — that is the documented
    contract of DCT pHash."""
    a = np.asarray(pixels, dtype=np.float64)
    if a.ndim == 3:  # luma (Rec. 601)
        if a.shape[2] >= 3:
            a = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        else:
            a = a[..., 0]
    h, w = a.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    n = _PHASH_N
    if h < n or w < n:  # nearest upsample keeps pooling bins non-empty
        a = a[np.minimum(np.arange(n) * h // n, h - 1)][
            :, np.minimum(np.arange(n) * w // n, w - 1)
        ]
        h = w = n
    ys = np.linspace(0, h, n + 1).astype(np.int64)
    xs = np.linspace(0, w, n + 1).astype(np.int64)
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = a.cumsum(axis=0).cumsum(axis=1)
    s = ii[ys][:, xs]
    blocks = s[1:, 1:] - s[:-1, 1:] - s[1:, :-1] + s[:-1, :-1]
    area = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    g = blocks / area
    low = (_PHASH_DCT @ g @ _PHASH_DCT.T)[:8, :8].ravel()
    med = float(np.median(low[1:]))  # AC median; DC only contributes its bit
    weights = 1 << np.arange(63, -1, -1, dtype=np.uint64)
    u = int(((low > med).astype(np.uint64) * weights).sum(dtype=np.uint64))
    return u - 2**64 if u >= 2**63 else u  # signed two's-complement view


def resize_bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real vectorized bilinear resize (align-corners=False, the
    torchvision/PIL convention: sample at pixel centers, clamp at the
    borders) — pure numpy, no image library.  Accepts (H, W) or
    (H, W, C) uint8; returns the same layout at (out_h, out_w).  An
    identity target returns the input values exactly (the sample grid
    degenerates to the pixel centers)."""
    if out_h <= 0 or out_w <= 0:
        raise ValueError(f"bad target size {(out_h, out_w)}")
    a = np.asarray(arr)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    h, w = a.shape[:2]
    af = a.astype(np.float64)
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = af[y0][:, x0] * (1 - wx) + af[y0][:, x1] * wx
    bot = af[y1][:, x0] * (1 - wx) + af[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


_AFP_WINDOWS = 16
_AFP_BANDS = 4


def afp64(pcm: np.ndarray) -> int:
    """64-bit audio fingerprint (Haitsma–Kalker-style band-energy
    signs): the clip is cut into 16 equal windows, each window's FFT
    magnitude is pooled into 4 log-spaced frequency bands, and bit
    (w, b) = band energy > that band's median across the windows —
    the same median-threshold trick as :func:`phash64`, so additive
    noise / re-encode flips few bits while different content flips
    ~half.  Signed int64 (bit-pattern offset) to ride the banded-Hamming
    pair machinery.  Not robust to time shifts/stretches — the
    documented contract of fixed-grid fingerprints."""
    a = np.asarray(pcm, dtype=np.float64).ravel()
    if len(a) == 0:
        raise ValueError("empty audio")
    W, B = _AFP_WINDOWS, _AFP_BANDS
    if len(a) < W * 2 * B:
        a = np.tile(a, int(np.ceil(W * 2 * B / len(a))))
    n = (len(a) // W) * W
    frames = a[:n].reshape(W, -1)
    mag = np.abs(np.fft.rfft(frames, axis=1))[:, 1:]  # drop DC
    nf = mag.shape[1]
    # log-spaced band edges over the positive spectrum
    edges = np.unique(
        np.round(np.geomspace(1, nf, B + 1)).astype(np.int64)
    )
    while len(edges) < B + 1:  # tiny spectra: pad with the top edge
        edges = np.append(edges, edges[-1] + 1)
    energy = np.stack(
        [
            (mag[:, edges[i] - 1:edges[i + 1] - 1] ** 2).sum(axis=1)
            for i in range(B)
        ],
        axis=1,
    )  # (W, B)
    med = np.median(energy, axis=0, keepdims=True)
    bits = (energy > med).ravel()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 63) if v >= (1 << 63) else v
