"""Multimodal (image / audio / video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
alongside; decode / feature-extract stages are actor-pool
``map_batches`` classes with SMALL batch sizes (binary payloads are
wide — a 4 MiB image × 1024-row batch would blow the worker heap; see
ray_guide "Memory-aware").

The DEFAULT decode kernels are REAL pure-stdlib codecs
(:mod:`..functions.codecs`): PNG/BMP for images, WAV/PCM for audio —
rows of those formats come back ``decoded=True`` with pixel/PCM-derived
features.  Formats needing PIL/ffmpeg (JPEG, MP3, video containers)
raise ``NotImplementedError`` at the documented plug-point
(``_decode_pixels`` / ``_decode_pcm``) and degrade per-row to byte
stats with ``decoded=False`` — one undecodable payload must never kill
a 100 TB job.  The Ray-side plumbing — schema, actor signature, batch
sizing, zero-copy binary handling — is format-independent and tested.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from ..functions import codecs

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("checksum", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

RECOMMENDED_BATCH_SIZE = 64  # small: payload-dominated rows


class DecodeImage:
    """Actor-pool stage: (media rows) → per-image features.

    Use as::

        ds.map_batches(DecodeImage, batch_format="pyarrow",
                       batch_size=RECOMMENDED_BATCH_SIZE,
                       concurrency=(1, N), num_cpus=1,
                       fn_constructor_kwargs={"decoder": my_decode})

    ``decoder`` is the plug-point contract: ``bytes -> np.ndarray`` of
    shape (H, W[, C]), uint8.  The DEFAULT is the real stdlib PNG/BMP
    codec (functions/codecs.py::decode_image) — those rows carry pixel
    features (``decoded=True``, decoded dims, mean luma).  A decoder
    raising ``NotImplementedError`` (unsupported format — the
    PIL/turbojpeg plug-point) or ``ValueError`` (corrupt payload) makes
    the row fall back to byte stats with ``decoded=False``.  The
    injected-kernel pytest additionally drives a raw-RGB decoder,
    proving the contract is not PNG-specific."""

    def __init__(self, target_size: tuple[int, int] = (224, 224), decoder=None):
        # decoder/model state is built here, once per actor
        self.target_size = target_size
        self.decoder = decoder if decoder is not None else codecs.decode_image

    @staticmethod
    def _decode_pixels(payload: bytes):
        # plug-point for formats beyond the stdlib PNG/BMP codec
        raise NotImplementedError(
            "image format requires an image library not present in this "
            "environment; plug PIL/turbojpeg in here"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        payloads = batch["payload"].to_pylist()
        n_bytes = [len(p) if p is not None else 0 for p in payloads]
        checksum = [zlib.crc32(p) if p else 0 for p in payloads]
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        decoded, mean_luma, phashes = [], [], []
        out_w, out_h = [], []
        for i, p in enumerate(payloads):
            try:
                pixels = self.decoder(p or b"")
                arr = np.asarray(pixels, dtype=np.float64)
                decoded.append(True)
                mean_luma.append(round(float(arr.mean()), 3))
                out_h.append(int(arr.shape[0]))
                out_w.append(int(arr.shape[1]))
                phashes.append(codecs.phash64(pixels))
            except (NotImplementedError, ValueError):
                # unsupported format / corrupt payload: byte-stats fallback
                decoded.append(False)
                mean_luma.append(None)
                out_w.append(widths[i])
                out_h.append(heights[i])
                phashes.append(None)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "checksum": pa.array(checksum, pa.int64()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "decoded": pa.array(decoded, pa.bool_()),
                "mean_luma": pa.array(mean_luma, pa.float64()),
                "phash": pa.array(phashes, pa.int64()),
            }
        )


class ResizeImage:
    """Actor-pool stage: (media rows) → same rows with the image
    payload REPLACED by a resized re-encoded PNG (the preprocessing
    step in front of batched vision inference).  The whole path is
    real stdlib/numpy: decode (``codecs.decode_image`` by default,
    same plug-point contract as :class:`DecodeImage`), vectorized
    bilinear resample (``codecs.resize_bilinear``, align-corners=False
    pixel-center convention), ``codecs.encode_png`` re-encode.
    Undecodable/corrupt rows pass through UNCHANGED with
    ``resized=False`` — one bad payload must never kill the job.
    Batch size stays small (RECOMMENDED_BATCH_SIZE): payload-dominated
    rows."""

    def __init__(self, target_size: tuple[int, int] = (224, 224), decoder=None):
        self.th, self.tw = target_size
        self.decoder = decoder if decoder is not None else codecs.decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        out_payload, out_w, out_h, resized, mime = [], [], [], [], []
        mimes = batch["mime"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        for i, p in enumerate(payloads):
            try:
                pixels = self.decoder(p or b"")
                small = codecs.resize_bilinear(pixels, self.th, self.tw)
                out_payload.append(codecs.encode_png(small))
                out_w.append(self.tw)
                out_h.append(self.th)
                resized.append(True)
                mime.append("image/png")
            except (NotImplementedError, ValueError):
                out_payload.append(p)
                out_w.append(widths[i])
                out_h.append(heights[i])
                resized.append(False)
                mime.append(mimes[i])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(out_payload, pa.binary()),
                "mime": pa.array(mime, pa.string()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "resized": pa.array(resized, pa.bool_()),
            }
        )


class SampleVideoFrames:
    """Actor-pool stage stub: (video rows) → (media_id, frame_idx, frame
    payload slice).  Deterministic byte-range sampling stands in for real
    frame extraction; the fan-out shape (flat_map-like explode inside
    map_batches) is the part that matters for the pipeline."""

    def __init__(self, frames_per_video: int = 4):
        self.frames = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, slices = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            payload = payload or b""
            step = max(1, len(payload) // max(1, self.frames))
            for f in range(self.frames):
                ids.append(mid)
                idxs.append(f)
                slices.append(payload[f * step : f * step + min(step, 1024)])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_bytes": pa.array(slices, pa.binary()),
            }
        )


class ExtractAudioFeatures:
    """Actor-pool stage: (audio rows) → per-clip features.  Same
    contract as :class:`DecodeImage`: the DEFAULT decode kernel is the
    real stdlib WAV/PCM codec (functions/codecs.py::decode_audio) —
    WAV rows carry per-window RMS energy over actual samples
    (``decoded=True``).  Non-WAV formats raise at the ffmpeg plug-point
    (``_decode_pcm``) and fall back per-row to a windowed byte-energy
    profile (the shape a real loudness/VAD feature would have) with
    ``decoded=False``."""

    def __init__(self, sample_rate: int = 16_000, n_windows: int = 8, decoder=None):
        # codec/VAD model state is built here, once per actor
        self.sample_rate = sample_rate
        self.n_windows = n_windows
        self.decoder = decoder if decoder is not None else codecs.decode_audio

    @staticmethod
    def _decode_pcm(payload: bytes):
        # plug-point for formats beyond the stdlib WAV codec
        raise NotImplementedError(
            "audio format requires ffmpeg/soundfile, absent in this "
            "environment; plug the codec in here"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids, n_bytes, checksums, energies = [], [], [], []
        decoded, duration_s = [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            payload = payload or b""
            ids.append(mid)
            n_bytes.append(len(payload))
            checksums.append(zlib.crc32(payload))
            try:
                # real path (injected codec): per-window RMS over PCM
                pcm = np.asarray(self.decoder(payload), dtype=np.float64)
                win = np.array_split(pcm, self.n_windows)
                energies.append(
                    [
                        round(float(np.sqrt((w**2).mean())), 6) if len(w) else 0.0
                        for w in win
                    ]
                )
                decoded.append(True)
                duration_s.append(round(len(pcm) / self.sample_rate, 6))
            except (NotImplementedError, ValueError):
                # unsupported format / corrupt payload: windowed
                # byte-energy profile fallback
                if payload:
                    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                    win = np.array_split(arr, self.n_windows)
                    energies.append(
                        [round(float(w.mean()), 3) if len(w) else 0.0 for w in win]
                    )
                else:
                    energies.append([0.0] * self.n_windows)
                decoded.append(False)
                duration_s.append(None)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "checksum": pa.array(checksums, pa.int64()),
                "energy_profile": pa.array(energies, pa.list_(pa.float64())),
                "decoded": pa.array(decoded, pa.bool_()),
                "duration_s": pa.array(duration_s, pa.float64()),
            }
        )


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic media rows for tests/benches.  Image rows are REAL
    PNGs and audio rows REAL 16 kHz WAVs (functions/codecs.py encoders)
    so the default decode path exercises ``decoded=True``; video rows
    stay opaque bytes (container decode is the documented ffmpeg
    plug-point) and exercise the fallback."""
    import numpy as np

    from ..functions import codecs

    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    payloads, mimes, widths, heights, durations = [], [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = int(rng.randint(8, 48)), int(rng.randint(8, 48))
            pixels = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            payloads.append(codecs.encode_png(pixels))
            mimes.append("image/png")
            widths.append(w)
            heights.append(h)
            durations.append(-1)
        elif kind == "audio":
            n_samp = int(rng.randint(400, 2400))  # 25–150 ms at 16 kHz
            t = np.arange(n_samp) / 16_000.0
            freq = float(rng.randint(100, 2000))
            pcm = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.randn(n_samp)
            payloads.append(codecs.encode_wav(pcm, 16_000))
            mimes.append("audio/wav")
            widths.append(-1)
            heights.append(-1)
            durations.append(int(n_samp / 16))
        else:
            payloads.append(rng.bytes(int(rng.randint(256, 4096))))
            mimes.append("application/octet-stream")
            widths.append(-1)
            heights.append(-1)
            durations.append(-1)
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array(durations, pa.int32()),
        }
    )


def image_near_dup_pairs(
    media,
    max_hamming: int = 7,
    bands: int = 8,
    max_bucket: int = 256,
    decoder=None,
    concurrency=(1, 4),
):
    """Perceptual image near-duplicate pairs: decode → 64-bit DCT pHash
    (functions/codecs.py::phash64) → the dedup family's banded-Hamming
    machinery (stages/dedup.py::simhash_near_pairs) with 8×8-bit bands,
    so every pair within Hamming ≤ bands-1 = 7 is GUARANTEED found by
    pigeonhole — the usual pHash near-dup radius.  Returns
    (a, b, hamming) over ``media_id``; undecodable rows (no pixels → no
    perceptual hash) are excluded, exactly like text rows with no
    shingles.

    Scale shape: decode is embarrassingly parallel map_batches (small
    batches, payload-dominated rows); the pair search is one bucketed
    band exchange over (media_id, 8 band keys) rows — never pixels —
    with the same ``max_bucket`` capped-bucket recall contract as the
    text family."""
    from .dedup import simhash_near_pairs

    kwargs = {} if decoder is None else {"fn_constructor_kwargs": {"decoder": decoder}}
    feats = media.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=RECOMMENDED_BATCH_SIZE,
        concurrency=concurrency,
        **kwargs,
    )
    sigs = feats.filter(expr="decoded").select_columns(["media_id", "phash"])
    return simhash_near_pairs(
        sigs,
        id_col="media_id",
        max_hamming=max_hamming,
        max_bucket=max_bucket,
        bands=bands,
        sig_col="phash",
    )


def plant_perturbed_images(
    table: pa.Table, n_planted: int = 16, noise: int = 1, id_offset: int = 1_000_000
) -> pa.Table:
    """Append re-encoded copies of the first ``n_planted`` IMAGE rows
    with per-pixel uniform noise in [-noise, +noise] (seeded by media
    id) — planted ground truth for perceptual near-dup recall, the
    image twin of similarity.plant_near_dups.  Copies keep the original
    schema with ``media_id + id_offset``."""
    import numpy as np

    rows = table.to_pylist()
    out = []
    planted = 0
    for r in rows:
        if planted >= n_planted:
            break
        if r["kind"] != "image":
            continue
        pixels = codecs.decode_image(r["payload"]).astype(np.int64)
        rng = np.random.RandomState(900_001 + int(r["media_id"]))
        noisy = np.clip(
            pixels + rng.randint(-noise, noise + 1, size=pixels.shape), 0, 255
        ).astype(np.uint8)
        out.append(
            {**r, "media_id": r["media_id"] + id_offset,
             "payload": codecs.encode_png(noisy), "mime": "image/png"}
        )
        planted += 1
    return pa.concat_tables(
        [table, pa.Table.from_pylist(out, schema=table.schema)]
    )


def audio_near_dup_pairs(
    media,
    max_hamming: int = 7,
    bands: int = 8,
    max_bucket: int = 256,
    decoder=None,
):
    """Acoustic near-duplicate pairs — the audio twin of
    :func:`image_near_dup_pairs`: decode → 64-bit band-energy
    fingerprint (functions/codecs.py::afp64) → the dedup family's
    banded-Hamming machinery with 8×8-bit bands (every pair within
    Hamming ≤ 7 found by pigeonhole).  Returns (a, b, hamming) over
    ``media_id``; undecodable rows (no PCM → no fingerprint) are
    excluded, like unshingleable text rows.

    Scale shape: fingerprinting is map-only over payload rows; the pair
    search exchanges (media_id, band key) rows — never PCM."""
    from .dedup import simhash_near_pairs

    dec = decoder if decoder is not None else codecs.decode_audio

    def fp(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids, sigs = [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                pcm = np.asarray(dec(payload or b""), dtype=np.float64)
                sigs.append(codecs.afp64(pcm))
                ids.append(mid)
            except (ValueError, NotImplementedError):
                continue
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "afp": pa.array(sigs, pa.int64()),
            }
        )

    sigs = media.map_batches(
        fp, batch_format="pyarrow", batch_size=RECOMMENDED_BATCH_SIZE
    )
    return simhash_near_pairs(
        sigs,
        id_col="media_id",
        max_hamming=max_hamming,
        max_bucket=max_bucket,
        bands=bands,
        sig_col="afp",
    )


def plant_perturbed_audio(
    table: pa.Table, n_planted: int = 16, noise: float = 0.01,
    id_offset: int = 2_000_000,
) -> pa.Table:
    """Append re-encoded copies of the first ``n_planted`` AUDIO rows
    with additive Gaussian PCM noise (seeded by media id) — planted
    ground truth for acoustic near-dup recall, the audio twin of
    :func:`plant_perturbed_images`."""
    import numpy as np

    rows = table.to_pylist()
    out = []
    planted = 0
    for r in rows:
        if planted >= n_planted:
            break
        if r["kind"] != "audio":
            continue
        pcm = codecs.decode_audio(r["payload"])
        rng = np.random.RandomState(900_101 + int(r["media_id"]))
        noisy = pcm + noise * rng.randn(len(pcm))
        out.append(
            {**r, "media_id": r["media_id"] + id_offset,
             "payload": codecs.encode_wav(noisy), "mime": "audio/wav"}
        )
        planted += 1
    return pa.concat_tables(
        [table, pa.Table.from_pylist(out, schema=table.schema)]
    )


class AudioQualityAudit:
    """Actor-pool stage: (audio rows) → per-clip QA signals over REAL
    decoded PCM — clipping ratio (samples at full scale), silence ratio
    (|s| < ``silence_thresh``), RMS and peak — the corpus gate that
    drops mangled/empty recordings before feature extraction.  Same
    per-row degradation contract as the other stages: undecodable or
    corrupt payloads come back ``decoded=False`` with null metrics
    (never a poisoned batch)."""

    def __init__(
        self,
        silence_thresh: float = 0.01,
        clip_thresh: float = 32767.0 / 32768.0,
        decoder=None,
    ):
        self.silence = float(silence_thresh)
        self.clip = float(clip_thresh)
        self.decoder = decoder if decoder is not None else codecs.decode_audio

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids, decoded = [], []
        clip_r, sil_r, rms, peak, n_samples = [], [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            ids.append(mid)
            try:
                pcm = np.asarray(self.decoder(payload or b""), dtype=np.float64)
                if len(pcm) == 0:
                    raise ValueError("empty PCM")
                a = np.abs(pcm)
                decoded.append(True)
                clip_r.append(round(float((a >= self.clip).mean()), 6))
                sil_r.append(round(float((a < self.silence).mean()), 6))
                rms.append(round(float(np.sqrt((pcm * pcm).mean())), 6))
                peak.append(round(float(a.max()), 6))
                n_samples.append(len(pcm))
            except (NotImplementedError, ValueError):
                decoded.append(False)
                clip_r.append(None)
                sil_r.append(None)
                rms.append(None)
                peak.append(None)
                n_samples.append(0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "decoded": pa.array(decoded, pa.bool_()),
                "clip_ratio": pa.array(clip_r, pa.float64()),
                "silence_ratio": pa.array(sil_r, pa.float64()),
                "rms": pa.array(rms, pa.float64()),
                "peak": pa.array(peak, pa.float64()),
                "n_samples": pa.array(n_samples, pa.int64()),
            }
        )


class AudioSpectralFeatures:
    """Actor-pool/task stage: per-clip SPECTRAL features over real
    stdlib-decoded WAV PCM (numpy rfft — no external DSP libs): the
    retrieval/classification front-end beyond the time-domain RMS of
    :class:`ExtractAudioFeatures`.

    Per decoded clip: ``centroid_norm`` / ``rolloff85_norm`` /
    ``bandwidth_norm`` (magnitude-weighted moments of the rfft
    spectrum, as fractions of Nyquist — sample-rate-free), and ``zcr``
    (zero-crossing rate).  Non-WAV formats raise at the ffmpeg
    plug-point and corrupt payloads degrade per row
    (``decoded=False``, NaN features) — the multimodal family
    contract."""

    def __init__(self, decoder=None):
        self.decoder = decoder if decoder is not None else codecs.decode_audio

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids, dec = [], []
        cent, roll, bw, zcr = [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            ids.append(mid)
            try:
                pcm = np.asarray(self.decoder(payload or b""),
                                 dtype=np.float64)
                if len(pcm) < 4:
                    raise ValueError("clip too short")
                mag = np.abs(np.fft.rfft(pcm))
                f = np.linspace(0.0, 0.5, len(mag))
                tot = mag.sum()
                if tot <= 0:
                    c = 0.0
                    r = 0.0
                    b = 0.0
                else:
                    c = float((f * mag).sum() / tot)
                    cum = np.cumsum(mag)
                    r = float(f[int(np.searchsorted(cum, 0.85 * tot))])
                    b = float(np.sqrt(((f - c) ** 2 * mag).sum() / tot))
                z = float((np.signbit(pcm[1:]) != np.signbit(pcm[:-1])).mean())
                cent.append(round(c, 6))
                roll.append(round(r, 6))
                bw.append(round(b, 6))
                zcr.append(round(z, 6))
                dec.append(True)
            except (NotImplementedError, ValueError):
                cent.append(float("nan"))
                roll.append(float("nan"))
                bw.append(float("nan"))
                zcr.append(float("nan"))
                dec.append(False)
        return pa.table(
            {
                "media_id": pa.array(ids),
                "decoded": pa.array(dec, pa.bool_()),
                "centroid_norm": pa.array(cent, pa.float64()),
                "rolloff85_norm": pa.array(roll, pa.float64()),
                "bandwidth_norm": pa.array(bw, pa.float64()),
                "zcr": pa.array(zcr, pa.float64()),
            }
        )


def image_ssim_pairs(
    media: pa.Table | "rd.Dataset",
    pairs: pd.DataFrame,
    size: int = 32,
    decoder=None,
) -> pd.DataFrame:
    """Global SSIM (Wang et al. 2004, single-window form) for CANDIDATE
    image pairs: both sides stdlib-decoded, grayscale-averaged,
    bilinear-resized to ``size``x``size``, then

        ssim = (2 μa μb + C1)(2 cov + C2)
               / ((μa² + μb² + C1)(σa² + σb² + C2))

    with the standard C1=(0.01·255)², C2=(0.03·255)².  The
    pixel-domain similarity that catches re-encodes/resizes byte
    hashes miss and complements :func:`phash64`'s Hamming screen —
    use pHash banding to GENERATE candidates, SSIM to VERIFY.
    Pairs whose either side fails to decode get NaN.  Driver-bounded
    by the candidate contract (pairs are a blocking output)."""
    import numpy as np
    import pandas as pd

    dec = decoder if decoder is not None else codecs.decode_image
    if not isinstance(media, pa.Table):
        media = pa.Table.from_pandas(media.to_pandas())
    pay = dict(zip(media["media_id"].to_pylist(),
                   media["payload"].to_pylist()))

    def gray(mid):
        arr = np.asarray(dec(pay[mid] or b""), dtype=np.float64)
        if arr.ndim == 3:
            arr = arr.mean(axis=2)
        return codecs.resize_bilinear(arr, size, size)

    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    rows = []
    for a, b in zip(pairs["media_a"], pairs["media_b"]):
        try:
            x, y = gray(a), gray(b)
            mx, my = x.mean(), y.mean()
            vx, vy = x.var(), y.var()
            cov = ((x - mx) * (y - my)).mean()
            ssim = ((2 * mx * my + C1) * (2 * cov + C2)) / (
                (mx * mx + my * my + C1) * (vx + vy + C2)
            )
            rows.append({"media_a": a, "media_b": b,
                         "ssim": round(float(ssim), 6)})
        except (NotImplementedError, ValueError, KeyError):
            rows.append({"media_a": a, "media_b": b, "ssim": float("nan")})
    return pd.DataFrame(rows)
