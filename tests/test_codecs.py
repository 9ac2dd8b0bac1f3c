"""Pure-stdlib media codecs (functions/codecs.py): PNG/BMP/WAV round
trips, all five PNG scanline filters, corrupt-payload errors, and the
multimodal default decode path running them for real."""

import struct
import zlib

import numpy as np
import pytest

from table_annotation_ray.functions import codecs


def test_png_round_trip_shapes():
    rng = np.random.RandomState(3)
    for shape in [(5, 7), (6, 4, 3), (3, 3, 4), (1, 1), (2, 1, 3)]:
        arr = rng.randint(0, 256, size=shape).astype(np.uint8)
        out = codecs.decode_png(codecs.encode_png(arr))
        assert out.shape == arr.shape
        assert (out == arr).all()


def _filter_line(ftype, line, prev, bpp):
    """Reference PNG filterer (encode side) used only to build fixtures."""
    out = np.empty(len(line), dtype=np.uint8)
    for x in range(len(line)):
        a = int(line[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
        out[x] = (int(line[x]) - pred) & 0xFF
    return out


def test_png_decodes_all_filter_types():
    # one image, five rows, one filter type per row — exercises every
    # unfilter branch (externally-produced PNGs use all of them)
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, size=(5, 6, 3)).astype(np.uint8)
    h, w, c = arr.shape
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        line = arr[y].reshape(-1)
        raw.append(y)  # filter type = row index (0..4)
        raw.extend(_filter_line(y, line, prev, c).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._png_chunk(b"IEND", b"")
    )
    out = codecs.decode_png(payload)
    assert (out == arr).all()


def test_png_unsupported_features_hit_plugpoint():
    # 16-bit depth -> NotImplementedError (plug-point), not a crash
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    payload = (
        codecs._PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        codecs.decode_png(payload)


def test_bmp_round_trip_and_padding():
    rng = np.random.RandomState(5)
    for w in (5, 4, 3):  # 5*3=15 -> stride 16 (padded); 4*3=12 unpadded
        arr = rng.randint(0, 256, size=(7, w, 3)).astype(np.uint8)
        out = codecs.decode_bmp(codecs.encode_bmp(arr))
        assert out.shape == arr.shape
        assert (out == arr).all()


def test_wav_round_trip_and_channels():
    pcm = np.sin(np.linspace(0, 30, 800)) * 0.6
    out = codecs.decode_wav(codecs.encode_wav(pcm, 16_000))
    assert len(out) == 800
    assert np.abs(out - pcm).max() < 1e-3


def test_dispatch_and_error_classes():
    with pytest.raises(NotImplementedError):  # JPEG = plug-point
        codecs.decode_image(b"\xff\xd8\xff\xe0rest")
    with pytest.raises(NotImplementedError):  # MP3 = plug-point
        codecs.decode_audio(b"ID3\x04rest")
    with pytest.raises(ValueError):  # corrupt recognized formats
        codecs.decode_png(codecs._PNG_SIG + b"\x00\x00\x00\x04IHDR")
    with pytest.raises(ValueError):
        codecs.decode_audio(b"RIFF\x00\x00\x00\x00WAVEbroken")
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"BM" + b"\x00" * 10)


def test_default_decode_path_is_real(ray_session):
    """The multimodal stages now decode PNG/WAV for real by default:
    image rows come back decoded=True with exact mean luma, audio rows
    decoded=True with PCM-derived duration, video rows (opaque bytes)
    fall back to decoded=False byte stats."""
    import ray.data as rd

    from table_annotation_ray.stages.multimodal import (
        RECOMMENDED_BATCH_SIZE,
        DecodeImage,
        ExtractAudioFeatures,
        synth_media_table,
    )

    media = synth_media_table(n=30, seed=5)
    kinds = {mid: k for mid, k in zip(media["media_id"].to_pylist(),
                                      media["kind"].to_pylist())}
    img_feats = (
        rd.from_arrow(media)
        .map_batches(DecodeImage, batch_format="pyarrow",
                     batch_size=RECOMMENDED_BATCH_SIZE, concurrency=(1, 2))
        .to_pandas()
        .set_index("media_id")
    )
    for mid, kind in kinds.items():
        assert bool(img_feats.loc[mid, "decoded"]) == (kind == "image")
    # exact pixel check on one image row
    mid0 = next(m for m, k in kinds.items() if k == "image")
    payload = media["payload"][mid0].as_py()
    pixels = codecs.decode_png(payload)
    assert img_feats.loc[mid0, "mean_luma"] == pytest.approx(
        round(float(pixels.astype(np.float64).mean()), 3)
    )
    assert img_feats.loc[mid0, "width"] == pixels.shape[1]
    assert img_feats.loc[mid0, "height"] == pixels.shape[0]

    au_feats = (
        rd.from_arrow(media)
        .map_batches(ExtractAudioFeatures, batch_format="pyarrow",
                     batch_size=RECOMMENDED_BATCH_SIZE, concurrency=(1, 2))
        .to_pandas()
        .set_index("media_id")
    )
    for mid, kind in kinds.items():
        assert bool(au_feats.loc[mid, "decoded"]) == (kind == "audio")
    mid1 = next(m for m, k in kinds.items() if k == "audio")
    pcm = codecs.decode_wav(media["payload"][mid1].as_py())
    assert au_feats.loc[mid1, "duration_s"] == pytest.approx(
        round(len(pcm) / 16_000, 6)
    )
    # energy profile on the real path is RMS over actual samples
    prof = au_feats.loc[mid1, "energy_profile"]
    win = np.array_split(pcm, 8)
    want = [round(float(np.sqrt((w**2).mean())), 6) for w in win]
    assert list(prof) == pytest.approx(want)


def test_phash64_properties():
    """Determinism, noise robustness, cross-image separation, PNG
    round-trip invariance of the DCT perceptual hash."""
    from table_annotation_ray.functions import codecs

    def mk(seed, size=64):
        r = np.random.RandomState(seed)
        base = r.randint(0, 256, size=(4, 4, 3)).astype(np.float64)
        return base.repeat(size // 4, 0).repeat(size // 4, 1).astype(np.uint8)

    def ham(a, b):
        return bin(((a + 2**64) % 2**64) ^ ((b + 2**64) % 2**64)).count("1")

    h = codecs.phash64(mk(1))
    assert codecs.phash64(mk(1)) == h  # deterministic
    # PNG encode/decode round trip is hash-invariant (lossless)
    assert codecs.phash64(codecs.decode_image(codecs.encode_png(mk(1)))) == h
    # small pixel noise moves few low-frequency bits (flat-block synth
    # images are the worst case: many ACs sit at the median threshold,
    # so the bound is loose here; the pipeline recall test pins the
    # guaranteed ≤7 radius on its own planted set)
    r = np.random.RandomState(7)
    noisy = np.clip(mk(1).astype(int) + r.randint(-1, 2, mk(1).shape), 0, 255)
    noise_ham = ham(h, codecs.phash64(noisy.astype(np.uint8)))
    cross_ham = ham(h, codecs.phash64(mk(2)))
    assert noise_ham <= 12 < cross_ham
    assert cross_ham > 16
    # grayscale and sub-32px inputs hash without error
    assert isinstance(codecs.phash64(np.ones((5, 7)) * 3), int)
    with pytest.raises(ValueError):
        codecs.phash64(np.empty((0, 4)))


def test_image_near_dup_planted_recall(ray_session):
    """Every planted noise-perturbed image pair within the 8-band
    pigeonhole radius (Hamming ≤ 7) MUST be recovered by
    image_near_dup_pairs; random synth images must not cross-match."""
    import ray.data as rd

    from table_annotation_ray.functions import codecs
    from table_annotation_ray.stages.multimodal import (
        image_near_dup_pairs,
        plant_perturbed_images,
        synth_media_table,
    )

    planted = plant_perturbed_images(
        synth_media_table(n=90, seed=5), n_planted=12, noise=1
    )
    pairs = (
        image_near_dup_pairs(rd.from_arrow(planted))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )

    def ham(a, b):
        return bin(((a + 2**64) % 2**64) ^ ((b + 2**64) % 2**64)).count("1")

    rows = {r["media_id"]: r for r in planted.to_pylist()}
    expected = []
    for mid, r in rows.items():
        if mid >= 1_000_000:
            h = ham(
                codecs.phash64(codecs.decode_image(rows[mid - 1_000_000]["payload"])),
                codecs.phash64(codecs.decode_image(r["payload"])),
            )
            if h <= 7:
                expected.append((mid - 1_000_000, mid))
    assert expected, "planted set degenerate (all hammings > 7)"
    found = set(zip(pairs.a, pairs.b))
    assert set(expected) <= found
    # no cross-matches between independent random images
    assert all(b - a == 1_000_000 for a, b in found)
    # hamming column is the true signature distance
    for _, row in pairs.iterrows():
        assert row["hamming"] == ham(
            codecs.phash64(codecs.decode_image(rows[row["a"]]["payload"])),
            codecs.phash64(codecs.decode_image(rows[row["b"]]["payload"])),
        )


def test_resize_bilinear_kernel():
    import numpy as np

    from table_annotation_ray.functions.codecs import resize_bilinear

    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert (resize_bilinear(a, 4, 4) == a).all()  # identity exact
    b = np.array([[0, 100], [200, 255]], dtype=np.uint8)
    up = resize_bilinear(b, 4, 4)
    # corners clamp to the source corners (align-corners=False centers)
    assert up[0, 0] == 0 and up[-1, -1] == 255
    # monotone along rows/cols of a monotone source
    assert (np.diff(up.astype(int), axis=0) >= 0).all()
    assert (np.diff(up.astype(int), axis=1) >= 0).all()
    c = np.dstack([b, b, b])
    out = resize_bilinear(c, 3, 5)
    assert out.shape == (3, 5, 3)
    # channel independence: replicated channels stay identical
    assert (out[:, :, 0] == out[:, :, 1]).all()
    import pytest

    with pytest.raises(ValueError):
        resize_bilinear(b, 0, 4)


def test_resize_image_stage(ray_session):
    import numpy as np
    import ray.data as rd

    from table_annotation_ray.functions.codecs import decode_image
    from table_annotation_ray.stages.multimodal import (
        RECOMMENDED_BATCH_SIZE,
        ResizeImage,
        synth_media_table,
    )

    ds = rd.from_arrow(synth_media_table(n=48, seed=5))
    out = ds.map_batches(
        ResizeImage,
        batch_format="pyarrow",
        batch_size=RECOMMENDED_BATCH_SIZE,
        concurrency=(1, 2),
        fn_constructor_kwargs={"target_size": (32, 48)},
    ).to_pandas()
    assert len(out) == 48
    ok = out[out["resized"]]
    assert len(ok) > 0
    # resized rows decode back to the target dims as real PNG
    for _, row in ok.head(4).iterrows():
        px = decode_image(row["payload"])
        assert px.shape[:2] == (32, 48)
        assert row["mime"] == "image/png"
        assert (row["height"], row["width"]) == (32, 48)
    # undecodable rows pass through unchanged
    bad = out[~out["resized"]]
    src = synth_media_table(n=48, seed=5).to_pandas().set_index("media_id")
    for _, row in bad.head(4).iterrows():
        assert row["payload"] == src.loc[row["media_id"], "payload"]


def test_afp64_noise_robust_and_discriminative():
    import numpy as np

    from table_annotation_ray.functions.codecs import afp64

    rng = np.random.RandomState(1)
    t = np.arange(4000) / 16000.0

    def ham(a, b):
        return bin(((a + 2**64) % 2**64) ^ ((b + 2**64) % 2**64)).count("1")

    a = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.randn(4000)
    b = a + 0.01 * rng.randn(4000)
    c = 0.5 * np.sin(2 * np.pi * 1320 * t) + 0.05 * rng.randn(4000)
    assert ham(afp64(a), afp64(b)) <= 7          # noisy copy: near
    assert ham(afp64(a), afp64(c)) > 15          # different tone: far
    # deterministic + short-clip padding path
    assert afp64(a) == afp64(a)
    assert isinstance(afp64(np.ones(5)), int)
    import pytest

    with pytest.raises(ValueError):
        afp64(np.empty(0))


def test_audio_near_dup_planted_recall(ray_session):
    """Every planted noise-perturbed audio pair within the 8-band
    pigeonhole radius (Hamming ≤ 7) MUST be recovered; distinct synth
    tones must not cross-match."""
    import numpy as np
    import ray.data as rd

    from table_annotation_ray.functions import codecs
    from table_annotation_ray.stages.multimodal import (
        audio_near_dup_pairs,
        plant_perturbed_audio,
        synth_media_table,
    )

    planted = plant_perturbed_audio(
        synth_media_table(n=90, seed=5), n_planted=12, noise=0.01
    )
    pairs = audio_near_dup_pairs(rd.from_arrow(planted)).to_pandas()

    def ham(a, b):
        return bin(((a + 2**64) % 2**64) ^ ((b + 2**64) % 2**64)).count("1")

    rows = {r["media_id"]: r for r in planted.to_pylist()}
    fps = {
        mid: codecs.afp64(codecs.decode_audio(r["payload"]))
        for mid, r in rows.items()
        if r["kind"] == "audio" or mid >= 2_000_000
    }
    expected = {
        (mid - 2_000_000, mid)
        for mid in fps
        if mid >= 2_000_000 and ham(fps[mid], fps[mid - 2_000_000]) <= 7
    }
    got = {(int(r.a), int(r.b)) for r in pairs.itertuples()}
    assert expected, "planting produced no in-radius pairs"
    assert expected <= got                      # pigeonhole recall
    for a, b in got - expected:                 # extras must be real
        assert ham(fps[a], fps[b]) <= 7, (a, b)
