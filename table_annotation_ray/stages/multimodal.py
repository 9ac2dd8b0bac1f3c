"""Multimodal (image / audio / video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
alongside; decode / feature-extract stages are actor-pool
``map_batches`` classes with SMALL batch sizes (binary payloads are
wide — a 4 MiB image × 1024-row batch would blow the worker heap; see
ray_guide "Memory-aware").

The decode kernels themselves are STUBBED (no PIL / ffmpeg in this
environment): ``DecodeImage`` computes deterministic fake features
(payload length, crc32, parsed header dims) and raises
``NotImplementedError`` from ``_decode_pixels`` where a real decoder
would plug in.  The Ray-side plumbing — schema, actor signature, batch
sizing, zero-copy binary handling — is real and tested.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

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
    shape (H, W[, C]), uint8.  When it decodes, the output row carries
    real pixel features (``decoded=True``, decoded dims, mean luma);
    when it raises ``NotImplementedError`` (the default stub — no image
    library in this environment) the row falls back to byte stats with
    ``decoded=False``.  The injected-kernel pytest drives the real path
    with a raw-RGB decoder, proving the contract end-to-end."""

    def __init__(self, target_size: tuple[int, int] = (224, 224), decoder=None):
        # a real implementation loads the decoder/model here, once per actor
        self.target_size = target_size
        self.decoder = decoder if decoder is not None else self._decode_pixels

    @staticmethod
    def _decode_pixels(payload: bytes):
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; plug PIL/turbojpeg in here"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        payloads = batch["payload"].to_pylist()
        n_bytes = [len(p) if p is not None else 0 for p in payloads]
        checksum = [zlib.crc32(p) if p else 0 for p in payloads]
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        decoded, mean_luma = [], []
        out_w, out_h = [], []
        for i, p in enumerate(payloads):
            try:
                pixels = self.decoder(p or b"")
                arr = np.asarray(pixels, dtype=np.float64)
                decoded.append(True)
                mean_luma.append(round(float(arr.mean()), 3))
                out_h.append(int(arr.shape[0]))
                out_w.append(int(arr.shape[1]))
            except NotImplementedError:
                decoded.append(False)
                mean_luma.append(None)
                out_w.append(widths[i])
                out_h.append(heights[i])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "checksum": pa.array(checksum, pa.int64()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "decoded": pa.array(decoded, pa.bool_()),
                "mean_luma": pa.array(mean_luma, pa.float64()),
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
    contract as :class:`DecodeImage`: the PCM decode kernel is stubbed
    (no ffmpeg/soundfile here — ``_decode_pcm`` raises), the Ray-side
    plumbing (small payload-dominated batches, per-actor model slot,
    typed output schema) is real.  Deterministic stand-in features:
    byte stats plus a windowed byte-energy profile (the shape a real
    loudness/VAD feature would have)."""

    def __init__(self, sample_rate: int = 16_000, n_windows: int = 8, decoder=None):
        # a real implementation loads the codec/VAD model here, once per actor
        self.sample_rate = sample_rate
        self.n_windows = n_windows
        self.decoder = decoder if decoder is not None else self._decode_pcm

    @staticmethod
    def _decode_pcm(payload: bytes):
        raise NotImplementedError(
            "audio decoding requires ffmpeg/soundfile, absent in this "
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
            except NotImplementedError:
                # stub fallback: windowed byte-energy profile (the shape
                # a real loudness/VAD feature would have)
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
    """Deterministic fake media rows for tests/benches."""
    import numpy as np

    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(int(rng.randint(256, 4096))) for _ in range(n)]
    kinds = ["image", "audio", "video"]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(
                ["image/jpeg" if i % 3 == 0 else "application/octet-stream" for i in range(n)]
            ),
            "width": pa.array([224 if i % 3 == 0 else -1 for i in range(n)], pa.int32()),
            "height": pa.array([224 if i % 3 == 0 else -1 for i in range(n)], pa.int32()),
            "duration_ms": pa.array([-1] * n, pa.int32()),
        }
    )
