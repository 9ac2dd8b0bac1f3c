"""Training-data operators: dedup family, similarity search, text stats,
multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},  # exact dup
        {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog tonight"},  # near dup (shingle jaccard 7/8)
        {"doc_id": 3, "text": "completely different content about ray data pipelines"},
        {"doc_id": 4, "text": "THE QUICK  BROWN fox jumps over the lazy dog"},  # norm dup
        {"doc_id": 5, "text": "le renard brun rapide saute par dessus le chien"},
    ]
    return rd.from_items(rows)


def test_exact_dedup(docs_ds):
    from table_annotation_ray.stages.dedup import exact_dedup

    kept = sorted(exact_dedup(docs_ds).to_pandas().doc_id)
    # 0/1/4 collapse (lower+whitespace normalization) → keep 0
    assert kept == [0, 2, 3, 5]


def test_exact_dedup_keep_best(docs_ds, ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.dedup import exact_dedup_keep_best

    # score by raw length: doc 4 ("THE QUICK  BROWN ..." with the double
    # space) is the longest member of the 0/1/4 cluster → it must win,
    # distinguishing keeper-by-score from exact_dedup's keeper-by-min-id
    def score(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(score=b["text"].str.len().astype("int64"))

    scored = docs_ds.map_batches(score, batch_format="pandas")
    out = exact_dedup_keep_best(scored, "score").to_pandas()
    assert sorted(out.columns) == ["doc_id", "score"]
    assert sorted(out.doc_id) == [2, 3, 4, 5]
    # ties fall back to min id: equal-length exact dups 0 and 1 → 0
    two = rd.from_items(
        [
            {"doc_id": 7, "text": "same text"},
            {"doc_id": 6, "text": "same text"},
        ]
    ).map_batches(score, batch_format="pandas")
    assert sorted(exact_dedup_keep_best(two, "score").to_pandas().doc_id) == [6]
    # ascending flavor: keep the SHORTEST member
    low = exact_dedup_keep_best(scored, "score", descending=False).to_pandas()
    assert 4 not in set(low.doc_id) and {0, 1, 4} & set(low.doc_id) == {0}


def test_leakage_safe_split(docs_ds, ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.datapipe import id_hash_bucket
    from table_annotation_ray.stages.dedup import leakage_safe_split

    out = leakage_safe_split(docs_ds).to_pandas().set_index("doc_id")
    # the 0/1/4 normalized-dup cluster shares rep 0 and hence ONE split
    assert out.loc[[0, 1, 4], "rep_id"].tolist() == [0, 0, 0]
    assert out.loc[[0, 1, 4], "split"].nunique() == 1
    # singletons are their own rep: identical to a plain hash split
    hb = id_hash_bucket(pd.Series([3]))[0]
    want = "train" if hb < 90 else ("val" if hb < 95 else "test")
    assert out.loc[3, "rep_id"] == 3 and out.loc[3, "split"] == want
    # a copy with a doc-id hashing to a DIFFERENT split still follows
    # its rep (the leakage case a per-doc split would get wrong)
    base = {"doc_id": 0, "text": "some shared boilerplate text"}
    ids = [i for i in range(1, 400) if
           (id_hash_bucket(pd.Series([i]))[0] < 90)
           != (id_hash_bucket(pd.Series([0]))[0] < 90)]
    dup = {"doc_id": ids[0], "text": base["text"]}
    two = leakage_safe_split(rd.from_items([base, dup])).to_pandas()
    assert two.split.nunique() == 1 and set(two.rep_id) == {0}


def test_minhash_dedup_finds_near_dup(docs_ds):
    from table_annotation_ray.stages.dedup import minhash_dedup

    comp = minhash_dedup(docs_ds, threshold=0.5).to_pandas()
    comp_of = dict(zip(comp.doc_id, comp.component))
    # exact + near dups share a component rooted at doc 0
    assert comp_of.get(1) == comp_of.get(0)
    assert comp_of.get(2) == comp_of.get(0)
    assert 3 not in comp_of
    assert 5 not in comp_of


def test_simhash_pairs(docs_ds):
    from table_annotation_ray.stages.dedup import simhash_near_pairs, simhash_signatures

    sigs = simhash_signatures(docs_ds)
    pairs = simhash_near_pairs(sigs, max_hamming=3).to_pandas()
    got = set(zip(pairs.a, pairs.b))
    assert (0, 1) in got  # identical text → distance 0
    assert (0, 4) in got  # case/whitespace normalized
    assert (0, 5) not in got


def test_ngram_jaccard_matches_bruteforce(docs_ds):
    """ngram_jaccard_pairs (inverted index + df-capped candidates +
    exact verify) must equal the all-pairs brute force wherever the
    brute-force pair shares at least one rare (df<=max_df) gram —
    which on this tiny corpus is every qualifying pair."""
    from table_annotation_ray.stages.dedup import char_ngrams, ngram_jaccard_pairs

    got = ngram_jaccard_pairs(docs_ds, k=5, max_df=20, threshold=0.3).to_pandas()
    got_pairs = {(a, b): j for a, b, j in zip(got.a, got.b, got.jaccard)}

    import re

    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy dog tonight",
        3: "completely different content about ray data pipelines",
        4: "THE QUICK  BROWN fox jumps over the lazy dog",
        5: "le renard brun rapide saute par dessus le chien",
    }
    norm = {i: re.sub(r"\s+", " ", t).strip().lower() for i, t in texts.items()}
    grams = {i: char_ngrams(t, 5) for i, t in norm.items()}
    want = {}
    for a in texts:
        for b in texts:
            if a < b and grams[a] and grams[b]:
                j = len(grams[a] & grams[b]) / len(grams[a] | grams[b])
                if j >= 0.3:
                    want[(a, b)] = round(j, 6)
    assert got_pairs == want
    assert (0, 1) in want and want[(0, 1)] == 1.0  # sanity: dups really pair

    # distributed co-location verify path (broadcast gate off) must agree
    from table_annotation_ray.stages.dedup import ngram_jaccard_pairs as njp

    dist = njp(docs_ds, k=5, max_df=20, threshold=0.3, broadcast_below=0).to_pandas()
    assert {(a, b): j for a, b, j in zip(dist.a, dist.b, dist.jaccard)} == want


def test_brute_force_topk(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.similarity import brute_force_topk

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(50, 16))
    vecs[7] = vecs[0] * 2.0  # same direction as 0 → cosine 1
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    out = brute_force_topk(rd.from_items(rows), [0], k=3)
    assert list(out.neighbor_id)[0] == 7
    assert out.cosine.iloc[0] == pytest.approx(1.0, abs=1e-6)
    assert len(out) == 3
    assert list(out["rank"]) == [1, 2, 3]


def test_lsh_topk_subset_of_bruteforce(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.similarity import brute_force_topk, lsh_topk

    rng = np.random.RandomState(4)
    rows = [{"vec_id": i, "embedding": rng.normal(size=16).tolist()} for i in range(80)]
    ds = rd.from_items(rows)
    exact = brute_force_topk(ds, [1], k=10)
    approx = lsh_topk(ds, [1], k=5, num_planes=4)
    # approximate results must be valid neighbors with correct cosines
    exact_map = dict(zip(exact.neighbor_id, exact.cosine))
    for _, r in approx.iterrows():
        assert r.neighbor_id != 1


def test_minhash_dedup_distributed_path_equals_driver(docs_ds):
    """Routing through min_label_components (distributed_above=0) must
    produce the same components as driver union-find (VERDICT r1 #3)."""
    from table_annotation_ray.stages.dedup import minhash_dedup

    def collect(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    driver = collect(minhash_dedup(docs_ds, threshold=0.5))
    dist = collect(minhash_dedup(docs_ds, threshold=0.5, distributed_above=0))
    assert driver.equals(dist)


def test_minhash_bucket_cap_is_counted(ray_session):
    """The max_bucket recall cap must be observable: a degenerate bucket
    (identical docs > max_bucket) reports truncated_buckets and
    dropped_pairs through the stats dict instead of silently shrinking
    the candidate set."""
    import ray.data as rd

    from table_annotation_ray.stages.dedup import minhash_dedup

    docs = [{"doc_id": i, "text": "the same text shingled identically everywhere"} for i in range(12)]
    stats = {}
    out = (
        minhash_dedup(rd.from_items(docs), threshold=0.5, max_bucket=5, stats=stats)
        .to_pandas()
    )
    assert stats["truncated_buckets"] > 0
    # every bucket kept its first 5 ids → C(12,2)-C(5,2)=56 dropped per band-bucket
    assert stats["dropped_pairs"] > 0
    # capped ids still dedup among themselves
    assert set(out.doc_id) == set(range(5))

    stats_ok = {}
    minhash_dedup(rd.from_items(docs), threshold=0.5, max_bucket=100, stats=stats_ok).to_pandas()
    assert stats_ok == {"truncated_buckets": 0, "dropped_pairs": 0}


def test_embedding_near_dup_planted_recall(ray_session):
    """Planted near-duplicates (VERDICT r1 #6): perturbed copies at
    cos≈0.9988 must be recovered by the 2-probe LSH + exact verify."""
    import ray.data as rd

    from table_annotation_ray.stages.similarity import (
        embedding_near_dup_pairs,
        plant_near_dups,
    )

    rng = np.random.RandomState(9)
    rows = [{"vec_id": i, "embedding": rng.normal(size=32).tolist()} for i in range(200)]
    seeded = plant_near_dups(rd.from_items(rows), n_planted=24)
    pairs = embedding_near_dup_pairs(seeded, threshold=0.9).to_pandas()
    planted = pairs[(pairs.b - pairs.a) == 1_000_000_000]
    # ≥ 80% of the 24 planted pairs recovered (per-probe collision ≈0.88,
    # two probes ≈0.986 expected)
    assert len(planted) >= 0.8 * 24
    assert (planted.cosine >= 0.99).all()
    # false-positive check: random 32-dim vectors can't hit cos ≥ 0.9
    assert len(pairs) == len(planted)


def test_ivf_topk_recall_on_clusters(ray_session):
    """IVF with enough probes recovers most true neighbors on a
    clustered corpus; results are valid (no self matches, correct
    ranks) and deterministic."""
    import ray.data as rd

    from table_annotation_ray.stages.similarity import brute_force_topk, ivf_topk

    rng = np.random.RandomState(21)
    centers = rng.normal(size=(6, 16)) * 4
    rows = [
        {"vec_id": i, "embedding": (centers[i % 6] + rng.normal(size=16) * 0.3).tolist()}
        for i in range(240)
    ]
    ds = rd.from_items(rows)
    exact = brute_force_topk(ds, [0, 1], k=5)
    approx = ivf_topk(ds, [0, 1], k=5, num_centroids=8, nprobe=3)
    approx2 = ivf_topk(ds, [0, 1], k=5, num_centroids=8, nprobe=3)
    pd_eq = approx.reset_index(drop=True).equals(approx2.reset_index(drop=True))
    assert pd_eq  # deterministic (seeded quantizer, seeded assignment)
    assert (approx.query_id != approx.neighbor_id).all()
    for qid in (0, 1):
        e = set(exact[exact.query_id == qid].neighbor_id)
        a = set(approx[approx.query_id == qid].neighbor_id)
        assert len(e & a) / len(e) >= 0.6, qid  # tight clusters → high recall
    got = approx[approx.query_id == 0]
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_ivf_topk_tiny_corpus_clamps_centroids(ray_session):
    """Fewer vectors than num_centroids must degrade (clamp k-means k),
    not crash rng.choice(replace=False); results stay exact-complete
    because every bucket is probed."""
    import ray.data as rd

    from table_annotation_ray.stages.similarity import ivf_topk

    rng = np.random.RandomState(5)
    rows = [{"vec_id": i, "embedding": rng.normal(size=8).tolist()} for i in range(6)]
    out = ivf_topk(rd.from_items(rows), [0], k=3, num_centroids=16, nprobe=4)
    assert (out.query_id == 0).all() and (out.neighbor_id != 0).all()
    assert len(out) >= 1


def test_lsh_recall_measurement(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.similarity import lsh_recall

    rng = np.random.RandomState(11)
    # clustered corpus: queries have true neighbors inside their cluster,
    # so single-bucket LSH recall is measurably high
    centers = rng.normal(size=(5, 16)) * 4
    rows = []
    for i in range(150):
        c = centers[i % 5]
        rows.append({"vec_id": i, "embedding": (c + rng.normal(size=16) * 0.3).tolist()})
    out = lsh_recall(rd.from_items(rows), [0, 1, 2], k=5, num_planes=4)
    assert set(out.columns) == {"query_id", "recall", "n_exact", "n_hit"}
    assert ((out.recall >= 0) & (out.recall <= 1)).all()
    assert (out.n_exact == 5).all()
    assert out.recall.mean() >= 0.5  # tight clusters land in one bucket


def test_textstats(docs_ds):
    from table_annotation_ray.stages.textstats import (
        fingerprint,
        lang_id,
        quality_scores,
        token_stats,
    )

    ts = docs_ds.map_batches(token_stats, batch_format="pandas").to_pandas()
    assert ts.set_index("doc_id").loc[0, "n_tokens"] == 9
    qs = docs_ds.map_batches(quality_scores, batch_format="pandas").to_pandas()
    assert (qs.punct_ratio == 0).all()
    assert qs.set_index("doc_id").loc[0, "stopword_ratio"] > 0
    li = docs_ds.map_batches(lang_id, batch_format="pandas").to_pandas()
    pred = li.set_index("doc_id").pred_lang
    assert pred[0] == "en" and pred[5] == "fr"
    fp = docs_ds.map_batches(fingerprint, batch_format="pandas").to_pandas()
    f = fp.set_index("doc_id").fp
    assert f[0] == f[1] == f[4]  # normalization collapses
    assert f[0] != f[2]


def test_multimodal_decode_stage(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.multimodal import (
        RECOMMENDED_BATCH_SIZE,
        DecodeImage,
        SampleVideoFrames,
        synth_media_table,
    )

    media = synth_media_table(n=32, seed=5)
    ds = rd.from_arrow(media)
    feats = ds.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=RECOMMENDED_BATCH_SIZE,
        concurrency=(1, 2),
    ).to_pandas()
    assert len(feats) == 32
    assert (feats.n_bytes > 0).all()
    # deterministic features
    feats2 = rd.from_arrow(media).map_batches(
        DecodeImage, batch_format="pyarrow", concurrency=(1, 2)
    ).to_pandas()
    assert feats.sort_values("media_id").checksum.tolist() == feats2.sort_values("media_id").checksum.tolist()
    # real decode kernel is explicitly stubbed
    with pytest.raises(NotImplementedError):
        DecodeImage._decode_pixels(b"\xff\xd8")
    frames = rd.from_arrow(media).map_batches(
        SampleVideoFrames, batch_format="pyarrow", batch_size=8, concurrency=(1, 2)
    ).to_pandas()
    assert len(frames) == 32 * 4


def test_audio_feature_stage(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.multimodal import (
        RECOMMENDED_BATCH_SIZE,
        ExtractAudioFeatures,
        synth_media_table,
    )

    media = synth_media_table(n=24, seed=7)
    ds = rd.from_arrow(media)
    feats = ds.map_batches(
        ExtractAudioFeatures, batch_format="pyarrow",
        batch_size=RECOMMENDED_BATCH_SIZE, concurrency=(1, 2),
    ).to_pandas()
    assert len(feats) == 24
    assert (feats.n_bytes > 0).all()
    assert feats.energy_profile.map(len).eq(8).all()
    # deterministic across runs
    feats2 = rd.from_arrow(media).map_batches(
        ExtractAudioFeatures, batch_format="pyarrow", concurrency=(1, 2)
    ).to_pandas()
    assert feats.sort_values("media_id").checksum.tolist() == \
        feats2.sort_values("media_id").checksum.tolist()
    with pytest.raises(NotImplementedError):
        ExtractAudioFeatures._decode_pcm(b"RIFF")


def test_multimodal_injected_kernels_real_feature_path(ray_session):
    """VERDICT r2 #10: plugging a working decoder into the actor-pool
    stages must exercise the REAL feature path (decoded=True, pixel /
    PCM-derived values), proving the plug-point contract rather than the
    stub fallback.  The decoders are defined INSIDE the test: closures
    pickle by value, while a tests-module top-level function pickles by
    reference, which workers cannot import (actor ctor retries forever)."""
    import struct

    import pyarrow as pa
    import ray.data as rd

    from table_annotation_ray.stages.multimodal import (
        DecodeImage,
        ExtractAudioFeatures,
    )

    def _raw_rgb_decode(payload: bytes):
        # trivial in-repo image codec: 4-byte LE width, 4-byte LE height,
        # then H*W*3 uint8 pixels — enough to drive the real feature path
        w, h = struct.unpack("<II", payload[:8])
        return np.frombuffer(payload[8 : 8 + h * w * 3], dtype=np.uint8).reshape(h, w, 3)

    def _pcm16_decode(payload: bytes):
        # trivial in-repo audio codec: int16 LE PCM → float in [-1, 1)
        return np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0

    # two raw-RGB images with known mean pixel values
    def img(w, h, value):
        return struct.pack("<II", w, h) + bytes([value]) * (w * h * 3)

    media = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "kind": pa.array(["image", "image"]),
            "payload": pa.array([img(4, 2, 100), img(3, 5, 30)], pa.binary()),
            "mime": pa.array(["image/x-raw"] * 2),
            "width": pa.array([-1, -1], pa.int32()),
            "height": pa.array([-1, -1], pa.int32()),
            "duration_ms": pa.array([-1, -1], pa.int32()),
        }
    )
    feats = (
        rd.from_arrow(media)
        .map_batches(
            DecodeImage,
            batch_format="pyarrow",
            concurrency=1,
            fn_constructor_kwargs={"decoder": _raw_rgb_decode},
        )
        .to_pandas()
        .sort_values("media_id")
    )
    assert feats.decoded.all()
    assert feats.mean_luma.tolist() == [100.0, 30.0]  # real pixel means
    assert feats.width.tolist() == [4, 3] and feats.height.tolist() == [2, 5]

    # constant-amplitude int16 PCM: RMS is known, duration = n/sr
    amp = 8192  # 0.25 in float
    pcm = np.full(16_000, amp, dtype="<i2").tobytes()
    audio = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "payload": pa.array([pcm], pa.binary()),
        }
    )
    afeats = (
        rd.from_arrow(audio)
        .map_batches(
            ExtractAudioFeatures,
            batch_format="pyarrow",
            concurrency=1,
            fn_constructor_kwargs={"decoder": _pcm16_decode},
        )
        .to_pandas()
    )
    assert afeats.decoded.all()
    assert afeats.duration_s.iloc[0] == pytest.approx(1.0)  # 16k samples @16kHz
    for e in afeats.energy_profile.iloc[0]:
        assert e == pytest.approx(0.25, rel=1e-6)  # per-window RMS of 0.25


def test_pii_scrub_matches_duckdb(ray_session):
    """The scrub semantics are pinned against DuckDB's RE2 on inputs
    with real matches (the driver testdata has none, so its hash-match
    alone would be trivially green)."""
    import duckdb
    import ray.data as rd

    from table_annotation_ray.stages.datapipe import pii_scrub

    docs = [
        {"doc_id": 0, "text": "contact bob.smith+x@example.co.uk or call +1(555)123-4567 now"},
        {"doc_id": 1, "text": "server at 192.168.0.1 and 10.0.0.255, backup 8.8.8.8"},
        {"doc_id": 2, "text": "no pii here at all"},
        {"doc_id": 3, "text": "a@b.io c@d.net 127.0.0.1 0123-456-7890"},
    ]
    ours = (
        rd.from_items(docs)
        .map_batches(pii_scrub, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs))
    import __ray_entry__ as e

    sql = e.oracle_sql()["pii_scrub"] + " ORDER BY doc_id"
    theirs = con.execute(sql).df()
    for c in ("scrubbed", "n_email", "n_ip", "n_phone"):
        assert list(ours[c]) == list(theirs[c]), c
    assert "<EMAIL>" in ours.scrubbed[0] and "<PHONE>" in ours.scrubbed[0]
    assert ours.n_ip[1] == 3


def test_hash_sample_deterministic(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.datapipe import hash_sample

    ds = rd.from_items([{"doc_id": i} for i in range(1000)])
    a = sorted(ds.map_batches(hash_sample, batch_format="pandas").to_pandas().doc_id)
    b = sorted(ds.map_batches(hash_sample, batch_format="pandas").to_pandas().doc_id)
    assert a == b
    assert 120 <= len(a) <= 280  # ~20% of 1000


def test_id_hash_bucket_matches_sql_on_extreme_ids():
    """The multiplicative id hash must agree with its DuckDB HUGEINT
    mirror for ids beyond 2^31.6 (where int64 multiply wraps) and for
    negative ids (where % sign semantics differ)."""
    import duckdb

    from table_annotation_ray.stages.datapipe import id_hash_bucket

    ids = pd.Series(
        [0, 1, 7, 3_470_000_000, 2**32, 2**40 + 123, 2**62, 2**63 - 1,
         -1, -7, -(2**35), -(2**62)],
        dtype="int64",
    )
    ours = id_hash_bucket(ids).astype("int64")
    sql = duckdb.sql(
        "SELECT ((CAST(x AS HUGEINT) * 2654435761) % 4294967296 + 4294967296)"
        " % 4294967296 % 100 AS h FROM (SELECT unnest($ids) AS x)",
        params={"ids": ids.tolist()},
    ).df()["h"].astype("int64")
    assert list(ours) == list(sql)


def test_sliding_window_merge_paths_agree(ray_session):
    """Driver-merge and distributed groupby-Sum paths of the sliding
    window aggregate produce identical (wstart, key, n) rows."""
    import ray.data as rd

    from table_annotation_ray.stages.windows import sliding_window_counts

    rows = [
        {"ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=137 * i), "event_type": f"t{i % 3}"}
        for i in range(5000)
    ]
    ds = rd.from_items(rows)

    def collect(out):
        return (
            out.to_pandas()
            .sort_values(["wstart", "event_type"])
            .reset_index(drop=True)
        )

    driver = collect(sliding_window_counts(ds))
    dist = collect(sliding_window_counts(ds, driver_merge_below=0))
    pd.testing.assert_frame_equal(driver, dist)
    # every event lands in exactly window/hop windows
    assert driver["n"].sum() == 5000 * 4


def test_anti_semi_join_paths_agree(ray_session):
    """Broadcast and co-location paths of the size-gated anti/semi-join
    produce identical multisets (multiplicity preserved)."""
    import ray.data as rd

    from table_annotation_ray.stages.relational import anti_join_keys, semi_join_keys

    left = rd.from_items([{"k": i % 50} for i in range(400)])  # each key ×8
    right = rd.from_items([{"r": v} for v in range(0, 50, 3) for _ in range(2)])

    def collect(ds):
        return sorted(ds.to_pandas()["k"].tolist())

    expect_anti = sorted(i % 50 for i in range(400) if (i % 50) % 3 != 0)
    expect_semi = sorted(i % 50 for i in range(400) if (i % 50) % 3 == 0)
    for bb in (10_000, 0):  # broadcast path, then forced co-location
        assert collect(anti_join_keys(left, right, "k", "r", broadcast_below=bb)) == expect_anti
        assert collect(semi_join_keys(left, right, "k", "r", broadcast_below=bb)) == expect_semi


def test_pack_documents_prefix_sum(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.datapipe import pack_documents

    docs = [{"doc_id": i, "text": " ".join(["w"] * (10 * (i % 7 + 1)))} for i in range(300)]
    out = (
        pack_documents(rd.from_items(docs), max_tokens=100, chunk=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # offsets are the running sum of token counts in doc_id order
    ntok = [10 * (i % 7 + 1) for i in range(300)]
    expect_off = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    assert list(out.token_offset) == list(expect_off)
    assert (out.pack_id == out.token_offset // 100).all()


def test_shard_by_token_budget(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.datapipe import shard_by_token_budget

    docs = [{"doc_id": i, "text": " ".join(["w"] * (10 * (i % 7 + 1)))} for i in range(300)]
    out = (
        shard_by_token_budget(rd.from_items(docs), n_shards=5, chunk=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ntok = np.array([10 * (i % 7 + 1) for i in range(300)], dtype=np.int64)
    off = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    total = int(ntok.sum())
    assert list(out.token_offset) == list(off)
    assert list(out.shard_id) == list(np.minimum(4, off * 5 // total))
    # shards are contiguous in doc order and balanced in tokens
    per = out.groupby("shard_id").n_tokens.sum()
    assert len(per) == 5
    assert per.max() - per.min() <= 2 * ntok.max()
    assert (out.sort_values("doc_id").shard_id.diff().fillna(0) >= 0).all()
    # zero-token docs land in a shard without crashing (empty text)
    tiny = rd.from_items([{"doc_id": 0, "text": ""}, {"doc_id": 1, "text": "a b"}])
    t = shard_by_token_budget(tiny, n_shards=3).to_pandas().sort_values("doc_id")
    assert list(t.shard_id) == [0, 0] and list(t.n_tokens) == [0, 2]


def test_char_entropy_and_repetition(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.datapipe import char_entropy, repetition_stats

    docs = [
        {"doc_id": 0, "text": "aaaaaaaa"},          # entropy 0
        {"doc_id": 1, "text": "abcdefgh"},          # entropy 3 bits
        {"doc_id": 2, "text": "one. one. two. "},   # dup sentence
    ]
    ds = rd.from_items(docs)
    ent = ds.map_batches(char_entropy, batch_format="pandas").to_pandas().set_index("doc_id")
    assert ent.loc[0, "entropy"] == 0.0
    assert ent.loc[1, "entropy"] == pytest.approx(3.0)
    rep = ds.map_batches(repetition_stats, batch_format="pandas").to_pandas().set_index("doc_id")
    assert rep.loc[2, "n_sent"] > rep.loc[2, "n_uniq_sent"]
    assert rep.loc[0, "dup_ratio"] == 0.0


def test_min_label_components_matches_union_find(ray_session):
    import numpy as np
    import ray.data as rd

    from table_annotation_ray.stages.dedup import connected_components, min_label_components

    rng = np.random.RandomState(9)
    # random graph over 60 nodes: chains + clusters + singleton edges
    pairs = []
    for base in range(0, 60, 12):
        for i in range(base, base + 4):
            pairs.append({"a": i, "b": i + 1})  # chains of length 5
    for _ in range(15):
        x, y = rng.randint(0, 60, 2)
        if x != y:
            pairs.append({"a": int(min(x, y)), "b": int(max(x, y))})
    ds = rd.from_items(pairs)
    dist = min_label_components(ds).to_pandas()
    import pandas as pd

    uf = connected_components(pd.DataFrame(pairs))
    d = dict(zip(dist.doc_id, dist.component))
    u = dict(zip(uf.doc_id, uf.component))
    assert set(d) == set(u)
    # same partition: equal component labels for every node pair
    for n in d:
        assert d[n] == u[n], n


def test_embedding_near_dup(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.similarity import embedding_near_dup_pairs

    rng = np.random.RandomState(6)
    base = rng.normal(size=(20, 16))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(20)]
    # plant near-duplicates: 20≈0 (tiny noise), 21≈5 (scaled)
    rows.append({"vec_id": 20, "embedding": (base[0] + 0.01 * rng.normal(size=16)).tolist()})
    rows.append({"vec_id": 21, "embedding": (2.0 * base[5]).tolist()})
    pairs = embedding_near_dup_pairs(rd.from_items(rows), threshold=0.95).to_pandas()
    got = set(zip(pairs.a, pairs.b))
    assert (0, 20) in got
    assert (5, 21) in got
    assert (pairs.cosine >= 0.95).all()


def test_bpe_token_count(docs_ds):
    from table_annotation_ray.stages.textstats import token_stats

    ts = docs_ds.map_batches(token_stats, batch_format="pandas").to_pandas().set_index("doc_id")
    # word-soup text: BPE segments == whitespace tokens (no punctuation)
    assert ts.loc[0, "n_tokens_bpe"] == ts.loc[0, "n_tokens"]
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.textstats import token_stats as tsf

    mixed = rd.from_items([{"doc_id": 0, "text": "hello  world42, foo-bar"}])
    out = mixed.map_batches(tsf, batch_format="pandas").to_pandas()
    assert out.n_tokens_bpe.iloc[0] == 7  # hello, world, 42, ',', foo, -, bar


def test_hll_accuracy_and_merge(ray_session):
    import pandas as pd

    from table_annotation_ray.stages.sketches import HyperLogLog, _hash64

    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add_hashes(_hash64(pd.Series([f"u{i}" for i in range(30000)])))
    b.add_hashes(_hash64(pd.Series([f"u{i}" for i in range(20000, 50000)])))
    merged = a.merge(b)
    est = merged.estimate()
    assert abs(est - 50000) / 50000 < 0.05  # union, not sum
    assert abs(a.estimate() - 30000) / 30000 < 0.05


def test_approx_distinct_stage(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.sketches import approx_distinct

    rows = [{"k": f"key-{i % 777}"} for i in range(10000)]
    est = approx_distinct(rd.from_items(rows), "k")
    assert abs(est - 777) / 777 < 0.05


def test_heavy_hitters_exact(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.sketches import heavy_hitters

    rows = (
        [{"k": "hot1"}] * 500 + [{"k": "hot2"}] * 120
        + [{"k": f"cold{i}"} for i in range(400)]
    )
    out = heavy_hitters(rd.from_items(rows), "k", min_count=100, k=64)
    got = dict(zip(out.k, out.n))
    assert got == {"hot1": 500, "hot2": 120}


def test_heavy_hitters_counts_all_distinct_batches(ray_session):
    """Regression: a batch whose Misra-Gries candidates compress to
    empty (>k all-distinct values) must still contribute its rows to the
    total N used for callable thresholds and the N/k guarantee."""
    import ray.data as rd

    from table_annotation_ray.stages.sketches import MisraGries, heavy_hitters

    # unit-level: >k distinct singletons compress to an empty candidate set
    mg = MisraGries(4)
    for i in range(9):
        mg.add(f"d{i}")
    assert mg.candidates() == {}

    # end-to-end: 2000 all-distinct rows + one hot key; threshold is a
    # callable over total N — if the distinct batches' counts vanished,
    # total would understate 2600 and the resolved threshold would drift
    rows = [{"k": f"cold{i}"} for i in range(2000)] + [{"k": "hot"}] * 600
    seen = {}

    def threshold(total):
        seen["total"] = total
        return max(1, total // 5)  # 520 with the true N

    out = heavy_hitters(
        rd.from_items(rows).repartition(8), "k", min_count=threshold, k=64
    )
    assert seen["total"] == 2600
    assert dict(zip(out.k, out.n)) == {"hot": 600}


def test_tree_reduce_many_partials(ray_session):
    """approx_distinct through >max_partials sketch partials (forces at
    least one distributed merge tier) is bit-identical to the flat path."""
    import ray.data as rd

    from table_annotation_ray.stages.sketches import approx_distinct

    rows = [{"k": f"key-{i % 777}"} for i in range(6000)]
    # batch_size=20 → 300 partials > max_partials=128 → merge tier runs
    est = approx_distinct(rd.from_items(rows), "k", p=10, batch_size=20)
    flat = approx_distinct(rd.from_items(rows), "k", p=10)
    assert est == flat  # register max is associative — identical estimate


def test_stratified_sample_rates(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.datapipe import id_hash_bucket, stratified_sample

    df = pd.DataFrame(
        {
            "doc_id": range(1000),
            "lang": ["en", "fr", "zz", "de"] * 250,
        }
    )
    rates = {"en": 80, "fr": 40, "de": 0}
    out = (
        rd.from_pandas(df)
        .map_batches(
            stratified_sample, batch_format="pandas", fn_kwargs={"rates": rates}
        )
        .to_pandas()
    )
    # exact reproduction of the hash rule per group, incl. default 0
    h = id_hash_bucket(df["doc_id"])
    want = df[h < df["lang"].map(lambda g: rates.get(g, 0)).to_numpy()]
    assert sorted(out.doc_id) == sorted(want.doc_id)
    assert set(out[out.lang == "de"].doc_id) == set()
    assert set(out[out.lang == "zz"].doc_id) == set()


def test_shuffle_order_is_global_rank(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.datapipe import (
        HASH_MOD,
        HASH_MULT,
        shuffle_order,
    )

    ids = np.arange(0, 5000, 7, dtype=np.int64)  # 715 ids, many buckets
    out = (
        shuffle_order(rd.from_pandas(pd.DataFrame({"doc_id": ids})), num_buckets=32)
        .to_pandas()
        .sort_values("position")
    )
    assert len(out) == len(ids)
    assert list(out.position) == list(range(len(ids)))  # dense 0-based rank
    key = (ids.astype(np.uint64) * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD)
    want = [i for _, i in sorted(zip(key.tolist(), ids.tolist()))]
    assert list(out.doc_id) == want


def test_vocab_topk_ties_and_combine(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.textstats import vocab_topk

    docs = rd.from_items(
        [
            {"doc_id": 0, "text": "b a  a c"},
            {"doc_id": 1, "text": " c B b"},
            {"doc_id": 2, "text": "a"},
        ]
    )
    out = vocab_topk(docs, k=2).to_pandas()
    # a:3, b:3 (case-folded), c:2 -> top-2 ties broken by token text
    assert list(out.token) == ["a", "b"]
    assert list(out.n) == [3, 3]


def test_decontaminate_paths_agree(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.decontam import decontaminate, doc_ngrams

    corpus = rd.from_items(
        [
            {"doc_id": 0, "text": "alpha beta gamma delta"},
            {"doc_id": 1, "text": "xx alpha beta gamma yy"},   # shares 3-gram
            {"doc_id": 2, "text": "totally unrelated words here"},
            {"doc_id": 3, "text": "ALPHA  beta gamma delta"},  # norm-identical grams
        ]
    )
    bench = rd.from_items([{"doc_id": 90, "text": "alpha beta gamma delta"}])
    for bb in (10_000, 0):  # broadcast and forced co-location
        out = decontaminate(corpus, bench, n=3, broadcast_below=bb).to_pandas()
        got = dict(zip(out.doc_id, out.n_hits))
        assert got == {0: 2, 1: 1, 3: 2}
    assert doc_ngrams("a b", 3) == set()  # shorter than n -> no grams


def test_semantic_dedup_planted_recall(ray_session):
    """SemDeDup: planted perturbed copies (cos≈0.9988) must be caught by
    the in-cluster cosine pass; kept_id is the lower (original) id and
    the victim the planted copy. k-means must co-cluster a vector with
    its tiny perturbation, so the cluster gate costs no recall here."""
    import ray.data as rd

    from table_annotation_ray.stages.similarity import plant_near_dups, semantic_dedup

    rng = np.random.RandomState(11)
    rows = [{"vec_id": i, "embedding": rng.normal(size=32).tolist()} for i in range(240)]
    seeded = plant_near_dups(rd.from_items(rows), n_planted=24)
    out = semantic_dedup(seeded, k=6, threshold=0.95, iters=5).to_pandas()
    planted = out[(out.dup_id - out.kept_id) == 1_000_000_000]
    assert len(planted) >= 0.8 * 24
    assert (planted.cosine >= 0.99).all()
    # no false victims among the 240 random 32-dim originals
    assert len(out) == len(planted)
    # deterministic across runs
    out2 = semantic_dedup(seeded, k=6, threshold=0.95, iters=5).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("dup_id").reset_index(drop=True),
        out2.sort_values("dup_id").reset_index(drop=True),
    )


# --- fourth code-review batch regressions ---------------------------------


def test_minhash_bands_skip_blank_docs(ray_session):
    """Zero-shingle (empty/whitespace) docs must emit NO band rows —
    they'd otherwise share the all-sentinel signature and flood one
    degenerate LSH bucket per band with junk pairs."""
    import ray.data as rd

    from table_annotation_ray.stages.dedup import minhash_bands, minhash_dedup

    rows = [
        {"doc_id": 0, "text": ""},
        {"doc_id": 1, "text": "   "},
        {"doc_id": 2, "text": "\t\n  \t"},
        {"doc_id": 3, "text": "real content that shingles fine today"},
        {"doc_id": 4, "text": "real content that shingles fine today"},
    ]
    bands = minhash_bands(rd.from_items(rows)).to_pandas()
    assert set(bands.doc_id) == {3, 4}
    # and the dedup pipeline never pairs blanks with each other
    comp = minhash_dedup(rd.from_items(rows), threshold=0.5).to_pandas()
    assert set(comp.doc_id) <= {3, 4}


def test_cross_corpus_trunc_counter(ray_session):
    """cross_corpus_near_dups counts bucket truncations on the shared
    TruncationCounter — the cap is never silent."""
    import ray
    import ray.data as rd

    from table_annotation_ray.stages.dedup import (
        TruncationCounter,
        cross_corpus_near_dups,
    )

    text = "the same boilerplate text repeated across every single doc"
    new = rd.from_items(
        [{"doc_id": i, "text": text} for i in range(12)]
    ).repartition(2)
    base = rd.from_items(
        [{"doc_id": 100 + i, "text": text} for i in range(12)]
    ).repartition(2)
    counter = ray.remote(TruncationCounter).options(num_cpus=0).remote()
    out = cross_corpus_near_dups(
        new, base, threshold=0.9, max_bucket=5, trunc_counter=counter
    ).to_pandas()
    stats = ray.get(counter.get.remote())
    assert stats["truncated_buckets"] > 0
    assert stats["dropped_pairs"] > 0
    # surviving pairs are still cross-side and correct
    assert ((out.a < 100) ^ (out.b < 100)).all()
    assert (out.jaccard == 1.0).all()


def test_brute_force_topk_tie_determinism(ray_session):
    """>= k+2 neighbors tied in cosine: the global (cosine desc, id asc)
    order must pick the LOWEST ids regardless of block layout — the
    per-batch prune keeps all boundary ties."""
    import ray.data as rd

    from table_annotation_ray.stages.similarity import brute_force_topk

    # ids deliberately descending so naive per-batch pruning would favor
    # whichever tied rows argpartition happens to keep
    rows = [{"vec_id": 0, "embedding": [1.0, 0.0]}] + [
        {"vec_id": i, "embedding": [1.0, 0.0]} for i in (17, 16, 15, 14, 13, 12, 11, 10)
    ]
    for parts in (1, 3, 9):
        out = brute_force_topk(
            rd.from_items(rows).repartition(parts), [0], k=3
        )
        assert list(out.neighbor_id) == [10, 11, 12], parts
        assert (out.cosine == 1.0).all()


def test_norm_text_ascii_whitespace_agreement():
    """_norm_text (pandas/Python path) must agree with _norm_arrow
    (RE2/DuckDB path) on non-ASCII whitespace: NBSP is NOT collapsed."""
    import pyarrow as pa

    from table_annotation_ray.stages.dedup import _norm_arrow, _norm_text

    texts = ["a b", "a b", "  a\t b \n"]
    py = list(_norm_text(pd.Series(texts)))
    ar = _norm_arrow(pa.chunked_array([pa.array(texts)])).to_pylist()
    assert py == ar
    assert py[0] != py[1]  # NBSP stays distinct from ASCII space


def test_min_label_components_warns_on_nonconvergence(ray_session):
    """A duplicate chain deeper than max_iters must WARN, not silently
    split the component."""
    import warnings

    import ray.data as rd

    from table_annotation_ray.stages.dedup import min_label_components

    chain = [{"a": i, "b": i + 1} for i in range(6)]  # diameter 6
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = min_label_components(
            rd.from_items(chain), max_iters=2, num_partitions=2
        ).to_pandas()
    assert any("WITHOUT converging" in str(x.message) for x in w)
    # converged run: one component, no warning
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        out2 = min_label_components(
            rd.from_items(chain), max_iters=12, num_partitions=2
        ).to_pandas()
    assert not any("WITHOUT converging" in str(x.message) for x in w2)
    assert set(out2.component) == {0} and len(out2) == 7
    assert len(out) == 7


def test_tfidf_topk_matches_pandas_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.textstats import tfidf_topk

    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(60, dtype=np.int64),
            "text": [
                " ".join(rng.choice(vocab, rng.integers(5, 30))) + " Doc42!"
                for _ in range(60)
            ],
        }
    )
    got = (
        tfidf_topk(rd.from_pandas(docs).repartition(4), k=3)
        .to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    )

    # pure-pandas reference with the same rounded ordering
    import re
    rows = []
    for _, r in docs.iterrows():
        toks = re.findall(r"[a-z]+", r["text"].lower())
        for t in set(toks):
            rows.append((r["doc_id"], t, toks.count(t)))
    tf = pd.DataFrame(rows, columns=["doc_id", "term", "tf"])
    df = tf.groupby("term").size().rename("df").reset_index()
    s = tf.merge(df, on="term")
    raw = s["tf"].to_numpy(float) * np.log(len(docs) / s["df"].to_numpy(float))
    s["tfidf"] = np.floor(raw * 1e6 + 0.5) / 1e6  # half-away, like the operator
    want = (
        s.sort_values(["tfidf", "term"], ascending=[False, True], kind="mergesort")
        .groupby("doc_id", sort=False).head(3)
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "term", "tf", "tfidf"]],
        want[["doc_id", "term", "tf", "tfidf"]],
        check_dtype=False,
    )
    # "doc" from "Doc42!" survives tokenization ([a-z]+ runs) but carries
    # idf=0 (present in every doc) so it scores, yet never ranks top-3
    assert "doc" in set(s["term"]) and "doc" not in set(want["term"])


def test_pmi_pairs_matches_bruteforce(ray_session):
    import itertools
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.textstats import pmi_pairs

    rng = np.random.default_rng(29)
    vocab = ["red", "blue", "gear", "bolt", "ring"]
    texts = []
    for i in range(80):
        ws = list(rng.choice(vocab, rng.integers(1, 5)))
        if i % 4 == 0:
            ws += ["red", "gear"]  # planted collocation
        texts.append(" ".join(ws) + " Zz9")
    docs = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64), "text": texts})
    got = (
        pmi_pairs(rd.from_pandas(docs).repartition(4), k=6, min_pairs=3)
        .to_pandas().reset_index(drop=True)
    )

    # brute force with identical rounding/ordering
    import re
    tok = [set(re.findall(r"[a-z]+", t.lower())) for t in texts]
    df: dict = {}
    for s in tok:
        for w in s:
            df[w] = df.get(w, 0) + 1
    cnt: dict = {}
    for s in tok:
        for a, b in itertools.combinations(sorted(s), 2):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    rows = []
    for (a, b), c in cnt.items():
        if c < 3:
            continue
        pmi = np.log((80.0 * c) / (df[a] * df[b]))
        pmi6 = np.floor(abs(pmi) * 1e6 + 0.5) / 1e6 * (1 if pmi >= 0 else -1)
        rows.append((a, b, c, pmi6))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = pd.DataFrame(rows[:6], columns=["term_a", "term_b", "n_ab", "pmi"])
    pd.testing.assert_frame_equal(
        got[["term_a", "term_b", "n_ab", "pmi"]], want, check_dtype=False
    )
    # the planted pair dominates
    assert (got.loc[0, "term_a"], got.loc[0, "term_b"]) == ("gear", "red")


def test_categorical_dependence_known_cases(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.stats import categorical_dependence

    # perfectly dependent: y == x  ->  mi = H(x), chi2 = n*(k-1)
    n = 600
    rng = np.random.default_rng(31)
    x = rng.choice(["a", "b", "c"], n, p=[0.5, 0.3, 0.2])
    df = pd.DataFrame({"x": x, "y": x})
    r = categorical_dependence(rd.from_pandas(df).repartition(4), "x", "y")
    px = pd.Series(x).value_counts(normalize=True).to_numpy()
    assert r["n"] == n and r["dof"] == 4
    assert abs(r["mi"] - float(-(px * np.log(px)).sum())) < 1e-9
    assert abs(r["chi2"] - n * 2) < 1e-6  # k=3 -> n*(k-1)

    # independent-by-construction: every (x, y) combo equally frequent
    xs = np.repeat(["a", "b"], 50)
    ys = np.tile(["u", "v"], 50)
    d2 = pd.DataFrame({"x": xs, "y": ys})
    r2 = categorical_dependence(rd.from_pandas(d2), "x", "y")
    assert abs(r2["mi"]) < 1e-12 and abs(r2["chi2"]) < 1e-9

    # nulls drop; empty input is the zero profile
    d3 = pd.DataFrame({"x": [None, "a"], "y": ["u", None]})
    assert categorical_dependence(rd.from_pandas(d3), "x", "y")["n"] == 0


def test_numeric_moments_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.stats import numeric_moments

    rng = np.random.default_rng(41)
    n = 5000
    x = rng.normal(10, 2, n)
    y = 3.5 * x + rng.normal(0, 1, n)
    df = pd.DataFrame({"x": x, "y": y})
    df.loc[df.index[:20], "y"] = np.nan  # nulls drop pairwise
    r = numeric_moments(rd.from_pandas(df).repartition(6), "x", "y")
    m = df.dropna()
    assert r["n"] == len(m)
    assert abs(r["mean_x"] - m["x"].mean()) < 1e-9
    assert abs(r["covar_pop"] - np.cov(m["x"], m["y"], bias=True)[0, 1]) < 1e-6
    assert abs(r["corr"] - np.corrcoef(m["x"], m["y"])[0, 1]) < 1e-9
    assert abs(r["slope"] - 3.5) < 0.1  # planted slope
    # constant x -> zero-variance guards (no division blowup)
    dc = pd.DataFrame({"x": np.ones(50), "y": np.arange(50.0)})
    rc = numeric_moments(rd.from_pandas(dc), "x", "y")
    assert rc["corr"] == 0.0 and rc["slope"] == 0.0
    # empty
    assert numeric_moments(
        rd.from_pandas(pd.DataFrame({"x": [np.nan], "y": [1.0]})), "x", "y"
    )["n"] == 0


def test_distribution_drift_known_cases(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.stats import distribution_drift

    # identical distributions -> zero everywhere
    df = pd.DataFrame({"t": ["a", "b"] * 100, "side": [0, 0, 1, 1] * 50})
    r = distribution_drift(rd.from_pandas(df).repartition(3), "t", "side")
    assert r["n_a"] == r["n_b"] == 100
    assert abs(r["js"]) < 1e-12 and abs(r["kl_ab"]) < 1e-12

    # disjoint supports -> JS = ln 2, KL restricted to shared support = 0
    d2 = pd.DataFrame({"t": ["a"] * 50 + ["b"] * 50,
                       "side": [0] * 50 + [1] * 50})
    r2 = distribution_drift(rd.from_pandas(d2), "t", "side")
    assert abs(r2["js"] - np.log(2)) < 1e-12
    assert r2["kl_ab"] == 0.0  # no shared support

    # hand-computed asymmetric case
    d3 = pd.DataFrame({"t": ["a"] * 9 + ["b"] * 1 + ["a"] * 5 + ["b"] * 5,
                       "side": [0] * 10 + [1] * 10})
    r3 = distribution_drift(rd.from_pandas(d3), "t", "side")
    p, q = np.array([0.9, 0.1]), np.array([0.5, 0.5])
    m = (p + q) / 2
    assert abs(r3["kl_ab"] - (p * np.log(p / q)).sum()) < 1e-12
    assert abs(r3["kl_ba"] - (q * np.log(q / p)).sum()) < 1e-12
    assert abs(r3["js"] - 0.5 * ((p * np.log(p / m)).sum()
                                 + (q * np.log(q / m)).sum())) < 1e-12
    # one empty side -> zero profile
    d4 = pd.DataFrame({"t": ["a", "b"], "side": [0, 0]})
    assert distribution_drift(rd.from_pandas(d4), "t", "side")["js"] == 0.0


def test_pq_adc_exact_at_m1_full_codebook(ray_session):
    """With m=1 and one centroid per corpus vector (trained on the full
    corpus), every vector is its own code word, the ADC LUT holds exact
    inner products, and pq_topk must equal brute_force_topk exactly."""
    import ray.data as rd

    from table_annotation_ray.stages.similarity import brute_force_topk, pq_topk

    rng = np.random.RandomState(11)
    rows = [{"vec_id": i, "embedding": rng.normal(size=16).tolist()} for i in range(40)]
    ds = rd.from_items(rows)
    exact = brute_force_topk(ds, [0, 1], k=4).reset_index(drop=True)
    approx = pq_topk(
        ds, [0, 1], k=4, m=1, ks=40, train_sample=1000, rerank=0
    ).reset_index(drop=True)
    assert list(approx.neighbor_id) == list(exact.neighbor_id)
    assert list(approx["rank"]) == list(exact["rank"])
    np.testing.assert_allclose(
        approx.score.to_numpy(), exact.cosine.to_numpy(), atol=2e-6
    )


def test_pq_recall_on_clusters_and_encode_contract(ray_session):
    """PQ/ADC on a clustered corpus recovers most true neighbors; codes
    are deterministic, bounded by ks, and m per vector."""
    import ray.data as rd

    from table_annotation_ray.stages.similarity import pq_encode, pq_recall, pq_train

    rng = np.random.RandomState(21)
    centers = rng.normal(size=(6, 16)) * 4
    rows = [
        {"vec_id": i,
         "embedding": (centers[i % 6] + rng.normal(size=16) * 0.3).tolist()}
        for i in range(240)
    ]
    ds = rd.from_items(rows)
    # rerank path (default): ADC shortlist + exact rerank recovers
    # within-codeword order — pure ADC cannot rank members of one code
    # word (identical scores), so the rerank number is the headline
    rec = pq_recall(ds, [0, 1, 2], k=5, m=4, ks=16, rerank=32)
    assert (rec["recall"] >= 0.8).all(), rec.to_dict("records")

    books = pq_train(ds, m=4, ks=16, train_sample=240)
    assert books.shape == (4, 16, 4)
    codes = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    codes2 = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    assert codes.codes.map(tuple).tolist() == codes2.codes.map(tuple).tolist()
    flat = np.concatenate([np.asarray(c) for c in codes.codes])
    assert flat.min() >= 0 and flat.max() < 16
    assert all(len(c) == 4 for c in codes.codes)


def test_near_dedup_keep_best(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.dedup import near_dedup_keep_best

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    for i in range(60):
        rows.append({"doc_id": i, "text": " ".join(rng.choice(vocab, 60))})
    # near-dup copies of docs 0-9: one token changed plus a longer tail,
    # so the COPY must win every cluster (keeper-by-score, not min-id)
    for i in range(10):
        t = rows[i]["text"].split()
        t[3] = "CHANGED"
        rows.append({"doc_id": 100 + i, "text": " ".join(t) + " extra tail tokens"})

    def score(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(score=b["text"].str.len().astype("int64"))

    ds = rd.from_items(rows).repartition(4).map_batches(score, batch_format="pandas")
    out = (
        near_dedup_keep_best(ds, "score")
        .to_pandas()
        .sort_values("component")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["component", "doc_id", "score", "n_members"]
    assert list(out.component) == list(range(10))
    assert list(out.doc_id) == [100 + i for i in range(10)]
    assert (out.n_members == 2).all()
    # ascending flavor keeps the SHORTEST member — the originals
    low = near_dedup_keep_best(ds, "score", descending=False).to_pandas()
    assert sorted(low.doc_id) == list(range(10))


def test_near_dup_components_literal_matches_pipeline(ray_session):
    """The component mapping injected into the near_dedup_keep_best SQL
    oracle (__ray_entry__._NEAR_DUP_COMPONENTS_SF001) must equal what
    minhash_dedup actually computes at sf0.01 (threshold 0.8)."""
    import os
    import re
    import sys

    import ray.data as rd

    from table_annotation_ray.stages.dedup import minhash_dedup

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    docs = rd.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    )
    comps = minhash_dedup(docs, threshold=0.8).to_pandas().sort_values("doc_id")
    computed = [(int(r.doc_id), int(r.component)) for r in comps.itertuples()]
    literal = [
        (int(a), int(b))
        for a, b in re.findall(r"\((-?\d+),\s*(-?\d+)\)", entry._NEAR_DUP_COMPONENTS_SF001)
    ]
    assert computed == literal


def test_dsir_planted_target_recovery(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.dsir import (
        dsir_logratio,
        dsir_sample,
        dsir_weights,
        hashed_ngram_counts,
    )

    rng = np.random.default_rng(3)
    va = [f"alpha{i}" for i in range(50)]  # target-like vocabulary
    vb = [f"beta{i}" for i in range(50)]  # off-target
    raw_rows = [
        {"doc_id": i, "text": " ".join(rng.choice(va if i < 200 else vb, 30))}
        for i in range(400)
    ]
    tgt_rows = [
        {"doc_id": 1000 + i, "text": " ".join(rng.choice(va, 30))} for i in range(50)
    ]
    raw = rd.from_items(raw_rows).repartition(4).materialize()
    tgt = rd.from_items(tgt_rows).repartition(2)

    # greedy top-k by log-weight: all selected docs are target-like
    sel = dsir_sample(raw, tgt, k=100, gumbel=False).to_pandas()
    assert (sel.doc_id < 200).all()
    # Gumbel resampling: overwhelmingly target-like, and deterministic
    g1 = dsir_sample(raw, tgt, k=100).to_pandas()
    g2 = dsir_sample(raw, tgt, k=100).to_pandas()
    assert (g1.doc_id < 200).mean() > 0.9
    assert sorted(g1.doc_id) == sorted(g2.doc_id)

    # log-weights: target-vocab docs score strictly above off-target
    lr = dsir_logratio(
        hashed_ngram_counts(tgt), hashed_ngram_counts(raw)
    )
    w = dsir_weights(raw, lr).to_pandas().sort_values("doc_id")
    assert w.logw.iloc[:200].min() > w.logw.iloc[200:].max()

    # smoothing guard
    with pytest.raises(ValueError):
        dsir_logratio(np.ones(4), np.ones(4), smooth=0.0)


def test_embedding_decontam_planted(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.decontam import embedding_decontam

    rng = np.random.default_rng(5)
    d = 16
    bench_m = rng.normal(size=(20, d))
    corpus_m = rng.normal(size=(200, d))
    # plant perturbed copies of bench rows 0-9 at ids 500-509 (paraphrase
    # leakage: high-but-not-exact cosine, what n-gram overlap misses)
    planted = bench_m[:10] + rng.normal(scale=0.01, size=(10, d))
    bench = rd.from_items(
        [{"vec_id": 1000 + i, "embedding": list(map(float, v))} for i, v in enumerate(bench_m)]
    )
    corpus_rows = [
        {"vec_id": i, "embedding": list(map(float, v))} for i, v in enumerate(corpus_m)
    ] + [
        {"vec_id": 500 + i, "embedding": list(map(float, v))} for i, v in enumerate(planted)
    ]
    corpus = rd.from_items(corpus_rows).repartition(4)

    out = (
        embedding_decontam(corpus, bench, threshold=0.98)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == 210
    flagged = set(out[out.contaminated].vec_id)
    assert flagged == {500 + i for i in range(10)}
    # random 16-d vectors never reach 0.98 cosine; planted ones all do
    assert out[out.vec_id >= 500].max_sim.min() > 0.99
    assert (out[out.vec_id < 500].n_hits == 0).all()

    # empty benchmark: nothing flagged, max_sim sentinel -1
    empty = bench.filter(lambda r: False)
    out0 = embedding_decontam(corpus, empty, threshold=0.5).to_pandas()
    assert (~out0.contaminated).all() and (out0.max_sim == -1.0).all()

    # benchmark size guard
    with pytest.raises(ValueError):
        embedding_decontam(corpus, bench, threshold=0.5, max_bench=5).to_pandas()


def test_line_dedup_paths_and_semantics(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.dedup import line_dedup

    rows = [
        {"doc_id": 0, "text": "COOKIE BANNER\nunique zero a\nunique zero b"},
        {"doc_id": 1, "text": "unique one\nCOOKIE BANNER\nfooter text here"},
        # normalization collapses case/whitespace: these count as the
        # same boilerplate as above
        {"doc_id": 2, "text": "cookie   banner\nunique two\nFooter Text HERE"},
        {"doc_id": 3, "text": "COOKIE BANNER"},  # fully boilerplate -> dropped
        {"doc_id": 4, "text": "solo doc\nanother solo line"},
        {"doc_id": 5, "text": ""},  # empty doc: "" is never boilerplate
    ]
    ds = rd.from_items(rows).repartition(3)
    want = {
        0: "unique zero a\nunique zero b",
        1: "unique one",
        2: "unique two",
        4: "solo doc\nanother solo line",
        5: "",
    }
    out_b = line_dedup(ds, min_count=2).to_pandas()
    assert dict(zip(out_b.doc_id, out_b.text)) == want
    # co-location path (broadcast gate forced off): identical output
    out_c = line_dedup(ds, min_count=2, broadcast_below=0).to_pandas()
    assert dict(zip(out_c.doc_id, out_c.text)) == want
    # no common lines at all: corpus passes through intact (empty
    # common set must not crash the broadcast collect)
    solo = rd.from_items([{"doc_id": 9, "text": "a\nb"}])
    out_s = line_dedup(solo, min_count=2).to_pandas()
    assert list(out_s.text) == ["a\nb"]


def test_compression_stats(ray_session):
    import zlib

    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.textstats import compression_stats

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "spam spam spam " * 50,                     # repetitive
                "The quick brown fox jumps over the lazy dog. "
                "Colorless green ideas sleep furiously in Prague.",
                "",                                          # empty
                None,                                        # null
            ],
        }
    )
    out = (
        rd.from_pandas(docs)
        .map_batches(compression_stats, batch_format="pandas")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # repetitive text compresses far below natural prose
    assert out.loc[0, "ratio"] < 0.2 < out.loc[1, "ratio"]
    assert out.loc[2, "ratio"] == 1.0 and out.loc[3, "ratio"] == 1.0
    # exact zlib agreement
    assert out.loc[1, "n_compressed"] == len(
        zlib.compress(docs.loc[1, "text"].encode(), 6)
    )


def test_dq_audit_planted_violations(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.dq import Check, dq_audit

    child = pd.DataFrame(
        {
            "fk": [1, 1, 2, 3, 99, 98],        # 99, 98 are orphans
            "qty": [5.0, -1.0, None, 200.0, 5.0, 5.0],  # -1, null, 200 violate
            "cat": ["a", "b", "zz", "a", "b", "a"],     # zz violates
        }
    )
    parent = pd.DataFrame({"pk": [1, 2, 3, 3]})  # dup pk
    tables = {
        "child": rd.from_pandas(child).repartition(3),
        "parent": rd.from_pandas(parent).repartition(2),
    }
    out = dq_audit(
        tables,
        [
            Check("child_qty_range", "child", "in_range", col="qty", lo=0, hi=100),
            Check("child_qty_not_null", "child", "not_null", col="qty"),
            Check("child_cat_accepted", "child", "accepted_values",
                  col="cat", values=["a", "b"]),
            Check("child_fk", "child", "foreign_key",
                  col="fk", parent_table="parent", parent_col="pk"),
            Check("parent_pk_unique", "parent", "unique", col="pk"),
        ],
    ).set_index("check")
    assert out.loc["child_qty_range", "n_violations"] == 3
    assert out.loc["child_qty_not_null", "n_violations"] == 1
    assert out.loc["child_cat_accepted", "n_violations"] == 1
    assert out.loc["child_fk", "n_violations"] == 2
    assert out.loc["parent_pk_unique", "n_violations"] == 1
    assert not out["passed"].any()
    assert (out["n_rows"] == [6, 6, 6, 6, 4]).all()


def test_join_size_estimate_never_underestimates(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.sketches import join_size_estimate

    rng = np.random.default_rng(21)
    # zipf-ish skewed keys on the left, uniform right
    lk = rng.zipf(1.5, 5000) % 200
    rk = rng.integers(0, 200, 3000)
    left = rd.from_pandas(pd.DataFrame({"k": lk})).repartition(4)
    right = rd.from_pandas(pd.DataFrame({"j": rk})).repartition(3)

    lc = pd.Series(lk).value_counts()
    rc = pd.Series(rk).value_counts()
    exact = int(sum(int(lc[k]) * int(rc.get(k, 0)) for k in lc.index))

    est = join_size_estimate(left, "k", right, "j", width=8192)
    assert est >= exact
    assert est <= exact * 1.05  # 200 keys in 8192 counters: tiny noise

    # narrow sketch still never underestimates, error grows
    est2 = join_size_estimate(left, "k", right, "j", width=64)
    assert est2 >= exact


def test_psi_drift_detects_planted_shift(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.stats import psi_drift

    rng = np.random.default_rng(4)
    base = pd.DataFrame({"v": rng.normal(0, 1, 8000)})
    same = pd.DataFrame({"v": rng.normal(0, 1, 8000)})
    shifted = pd.DataFrame({"v": rng.normal(1.0, 1, 8000)})

    def psi(cur):
        out = psi_drift(
            rd.from_pandas(base).repartition(4),
            rd.from_pandas(cur).repartition(3), "v",
        )
        assert (out["n_base"] > 0).all() and len(out) == 10
        return out["psi_term"].sum()

    assert psi(same) < 0.05          # same distribution: no shift
    assert psi(shifted) > 0.25       # 1-sigma mean shift: major

    # baseline decile binning puts ~1/10 of the baseline in each bin
    out = psi_drift(rd.from_pandas(base), rd.from_pandas(same), "v")
    assert (np.abs(out["n_base"] - 800) <= 1).all()


def test_snapshot_diff_statuses_and_dup_guard(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from table_annotation_ray.stages.dq import snapshot_diff

    old = pd.DataFrame(
        {"k": [1, 2, 3, 4], "v": [10.0, 20.0, np.nan, 40.0], "x": list("abcd")}
    )
    new = pd.DataFrame(
        {"k": [2, 3, 4, 5], "v": [25.0, np.nan, 40.0, 50.0], "x": list("bcde")}
    )
    out = (
        snapshot_diff(
            rd.from_pandas(old).repartition(2),
            rd.from_pandas(new).repartition(3),
            "k", ["v"],
        )
        .to_pandas().set_index("k")["status"].to_dict()
    )
    # 1 removed; 2 changed; 3 unchanged (NaN == NaN); 4 unchanged; 5 added
    assert out == {1: "removed", 2: "changed", 3: "unchanged",
                   4: "unchanged", 5: "added"}

    dup = pd.DataFrame({"k": [1, 1], "v": [1.0, 2.0], "x": ["a", "b"]})
    with pytest.raises(Exception, match="duplicate keys"):
        snapshot_diff(
            rd.from_pandas(dup), rd.from_pandas(new), "k", ["v"]
        ).materialize()


def test_embedding_audit_planted_corruption(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.dq import embedding_audit

    rng = np.random.default_rng(2)
    vecs = [rng.normal(0, 1, 8).tolist() for _ in range(50)]
    vecs[3] = vecs[3][:5]                       # wrong dim
    vecs[7] = [float("nan")] * 8                # non-finite
    vecs[9] = [float("inf")] + [0.0] * 7        # non-finite
    df = pd.DataFrame({"vec_id": range(50), "embedding": vecs})
    out = embedding_audit(rd.from_pandas(df).repartition(4))
    assert out.loc[0, "n_rows"] == 50
    assert out.loc[0, "n_bad_dim"] == 1
    assert out.loc[0, "n_nonfinite"] == 2
    good = np.array([
        np.linalg.norm(v) for i, v in enumerate(vecs)
        if i not in (3, 7, 9)
    ])
    assert abs(out.loc[0, "min_norm"] - round(good.min(), 6)) < 1e-9
    assert abs(out.loc[0, "max_norm"] - round(good.max(), 6)) < 1e-9
    assert abs(out.loc[0, "mean_norm"] - round(good.mean(), 6)) < 1e-6

    # empty corpus path
    empty = embedding_audit(rd.from_pandas(df.iloc[:0]))
    assert empty.loc[0, "n_rows"] == 0


def test_mad_outliers_robust_to_wild_values(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.stats import mad_outliers

    rng = np.random.default_rng(19)
    base = pd.DataFrame(
        {"id": range(500), "g": ["a"] * 250 + ["b"] * 250,
         "v": np.r_[rng.normal(0, 1, 250), rng.normal(10, 2, 250)]}
    )
    # plant wild values: classic z-score would inflate sigma; MAD won't
    base.loc[0, "v"] = 1000.0
    base.loc[1, "v"] = -1000.0
    base.loc[250, "v"] = 500.0
    out = mad_outliers(rd.from_pandas(base).repartition(4), "g", "v", k=3.5)
    flagged = set(out["id"])
    assert {0, 1, 250} <= flagged
    # the planted wilds dominate: few normal rows co-flagged
    assert len(flagged) <= 12
    # per-group stats attached and sane
    assert (out["mad"] > 0).all()


def test_ks_test_matches_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.stats import ks_test

    rng = np.random.default_rng(17)
    # quantized values force TIES within and across groups — the case
    # where naive rank formulas break and per-value CDF evaluation wins
    va = np.round(rng.normal(0.0, 1.0, 500), 1)
    vb = np.round(rng.normal(0.4, 1.3, 300), 1)
    df = pd.DataFrame(
        {
            "grp": ["a"] * len(va) + ["b"] * len(vb) + ["other", "other"],
            "value": np.r_[va, vb, [99.0, -99.0]],  # other-group noise rows
        }
    )
    out = ks_test(
        rd.from_pandas(df.sample(frac=1, random_state=3)).repartition(5),
        "grp", "value", "a", "b", n_chunks=7,
    )
    assert int(out.loc[0, "n1"]) == 500 and int(out.loc[0, "n2"]) == 300

    # brute force: evaluate |F_a - F_b| at every distinct pooled value
    pooled = np.unique(np.r_[va, vb])
    fa = np.searchsorted(np.sort(va), pooled, side="right") / len(va)
    fb = np.searchsorted(np.sort(vb), pooled, side="right") / len(vb)
    expected = np.abs(fa - fb).max()
    assert abs(float(out.loc[0, "ks_d"]) - expected) < 1e-12

    # degenerate group -> explicit error, not a silent nan
    import pytest

    with pytest.raises(ValueError):
        ks_test(rd.from_pandas(df), "grp", "value", "a", "missing")


def test_extract_html_entities_skip_and_boilerplate(ray_session):
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.extract import extract_html, extract_text

    # unit-level: entities decode, script/style/title are dropped,
    # anchors keep their TEXT, blocks join with \n
    html = (
        "<html><head><title>nope</title><style>x{}</style></head><body>"
        "<h2>A &amp; B</h2><p>caf&eacute; &lt;tag&gt;</p>"
        '<p><a href="/x">one</a> <a href="/y">two</a> glue</p>'
        "<script>var nope = 1;</script></body></html>"
    )
    text, n_links, n_paras, n_blocks = extract_text(html)
    assert text == "A & B\ncafé <tag>\none two glue"
    assert (n_links, n_paras, n_blocks) == (2, 2, 3)

    # link-density drop kills the nav block, keeps the prose block
    nav = '<p><a href="/a">home</a> <a href="/b">about</a></p>'
    prose = "<p>real content with a <a href='/c'>link</a> inside it</p>"
    kept, _, _, nb = extract_text(
        f"<body>{nav}{prose}</body>", drop_link_blocks=True
    )
    assert "real content" in kept and "home" not in kept and nb == 1

    # dataset stage: malformed row degrades per-row, others survive
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "html": ["<p>fine</p>", None, "<p>also fine</p>"],
        }
    )
    out = (
        extract_html(rd.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["text"]) == ["fine", "", "also fine"]
    assert list(out["n_blocks"]) == [1, 0, 1]


def test_repetition_stats_gopher_signals(ray_session):
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.textstats import ngram_repetition_stats

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                # top bigram "b c" x2 (ties "a b" broken lexicographically
                # -> "a b" also x2, smallest wins); no dup 5-gram
                "a b c a b c d",
                # dup 5-gram "x y z w v" occurs twice, overlapping tail
                "x y z w v x y z w v",
                "one two",  # shorter than dup_n
                "",  # empty
            ],
        }
    )
    out = (
        ngram_repetition_stats(rd.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    r1 = out.iloc[0]
    assert r1["top_gram"] == "a b" and r1["top_count"] == 2
    assert r1["top_chars"] == 2 * 2 and r1["dup_chars"] == 0
    assert r1["n_tokens"] == 7 and r1["total_chars"] == 7
    r2 = out.iloc[1]
    # both occurrences of the repeated 5-gram cover all 10 tokens
    assert r2["dup_chars"] == 10 and r2["top_count"] == 2
    r3, r4 = out.iloc[2], out.iloc[3]
    assert r3["dup_chars"] == 0 and r3["top_gram"] == "one two"
    assert r4["n_tokens"] == 0 and r4["top_gram"] == "" and r4["total_chars"] == 0


def test_duplicate_ngram_coverage_cross_doc_spans(ray_session):
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.dedup import duplicate_ngram_coverage

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens -> 3 5-grams
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"u1 u2 {shared} u3 u4",  # shared span mid-doc
                f"{shared} v1 v2 v3 v4 v5",  # shared span at head
                "w1 w2 w3 w4 w5 w6 w7 w8",  # unique -> zeros
                "r r r r r r",  # within-doc repeat counts too (corpus-wide >= 2)
            ],
        }
    )
    out = (
        duplicate_ngram_coverage(rd.from_pandas(df).repartition(3), n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2, 3, 4]
    # docs 1+2: the 3 shared 5-grams hit, covering exactly the 7 shared tokens
    shared_chars = len(shared.replace(" ", ""))
    for r in (out.iloc[0], out.iloc[1]):
        assert r["dup_hits"] == 3 and r["covered_tokens"] == 7
        assert r["dup_chars"] == shared_chars
    assert out.iloc[2]["dup_hits"] == 0 and out.iloc[2]["dup_chars"] == 0
    r4 = out.iloc[3]  # "r"x6 -> 2 identical 5-grams, all 6 tokens covered
    assert r4["dup_hits"] == 2 and r4["covered_tokens"] == 6 and r4["dup_chars"] == 6


def test_acf_by_key_matches_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.windows import acf_by_key

    rng = np.random.default_rng(7)
    rows = []
    for k in range(6):
        n = int(rng.integers(5, 30))
        v = rng.normal(size=n).cumsum()  # random walk -> strong lag-1 ACF
        for i in range(n):
            rows.append((k, i, float(v[i])))
    rows.append((99, 0, 5.0))  # single-point key: no pairs at any lag
    rows.append((98, 0, 2.0))  # constant pair series -> NULL acf
    rows.append((98, 1, 2.0))
    rows.append((98, 2, 2.0))
    df = pd.DataFrame(rows, columns=["k", "t", "v"])

    out = (
        acf_by_key(rd.from_pandas(df).repartition(4), "k", ["t"], "v", lags=(1, 2))
        .to_pandas()
        .sort_values(["k", "lag"])
        .reset_index(drop=True)
    )

    # single-point key emits nothing; constant key emits NaN acf
    assert 99 not in set(out["k"])
    const = out[out["k"] == 98]
    assert list(const["n_pairs"]) == [2, 1] and const["acf"].isna().all()

    # reference: plain per-key numpy corrcoef
    for k in range(6):
        g = df[df["k"] == k].sort_values("t")["v"].to_numpy()
        for lag in (1, 2):
            got = out[(out["k"] == k) & (out["lag"] == lag)]
            x, y = g[lag:], g[:-lag]
            assert int(got["n_pairs"].iloc[0]) == len(x)
            ref = float(np.corrcoef(x, y)[0, 1])
            assert abs(float(got["acf"].iloc[0]) - ref) < 2e-6

    with pytest.raises(ValueError):
        acf_by_key(rd.from_pandas(df), "k", ["t"], "v", lags=(0,))


def test_zorder_key_interleave_and_locality(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.datapipe import zorder_key

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "x": rng.integers(0, 1024, 4000),
            "y": rng.integers(0, 1024, 4000),
        }
    )
    out = zorder_key(rd.from_pandas(df).repartition(3), "x", "y").to_pandas()

    def ref(x, y):
        z = 0
        for k in range(10):
            z |= ((int(x) >> k) & 1) << (2 * k)
            z |= ((int(y) >> k) & 1) << (2 * k + 1)
        return z

    want = np.fromiter((ref(a, b) for a, b in zip(out["x"], out["y"])), np.int64)
    assert (out["zkey"].to_numpy() == want).all()

    # locality: consecutive zkey-sorted chunks have bounding boxes far
    # smaller than the domain in BOTH dims (the point of z-order; an
    # x-sort would leave y spanning ~the whole domain in every chunk)
    s = out.sort_values("zkey").reset_index(drop=True)
    spans_x, spans_y = [], []
    for i in range(0, len(s) - 200, 200):
        c = s.iloc[i : i + 200]
        spans_x.append(int(c["x"].max() - c["x"].min()))
        spans_y.append(int(c["y"].max() - c["y"].min()))
    assert np.mean(spans_x) < 600 and np.mean(spans_y) < 600

    # mask wrap: out-of-range inputs don't crash or exceed 2*bits bits
    big = pd.DataFrame({"x": [5000], "y": [-3]})
    z = zorder_key(rd.from_pandas(big), "x", "y").to_pandas()["zkey"].iloc[0]
    assert 0 <= z < (1 << 20)


def test_ring_negative_samples_contract(ray_session):
    import hashlib

    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.dedup import exact_dedup  # noqa: F401 (family import guard)
    from table_annotation_ray.stages.datapipe import ring_negative_samples

    # 40 ids, two groups interleaved on the md5 ring; single-process ref
    df = pd.DataFrame({"doc_id": range(40), "lang": ["a", "a", "b", "c"] * 10})
    out = (
        ring_negative_samples(
            rd.from_pandas(df).repartition(4), "doc_id", "lang",
            k=3, lookahead=6, num_buckets=5,
        )
        .to_pandas()
        .sort_values(["doc_id", "neg_rank"])
        .reset_index(drop=True)
    )

    ring = sorted(
        df.itertuples(index=False),
        key=lambda t: (hashlib.md5(str(t.doc_id).encode()).hexdigest(), t.doc_id),
    )
    n = len(ring)
    want = []
    for i, a in enumerate(ring):
        rank = 0
        for d in range(1, 7):
            b = ring[(i + d) % n]
            if b.lang != a.lang:
                rank += 1
                want.append((a.doc_id, rank, b.doc_id))
                if rank == 3:
                    break
    want = pd.DataFrame(want, columns=["doc_id", "neg_rank", "neg_id"])
    want = want.sort_values(["doc_id", "neg_rank"]).reset_index(drop=True)
    assert len(out) == len(want)
    assert (out.to_numpy() == want.to_numpy()).all()
    # every negative really is a different group
    m = out.merge(df, on="doc_id").merge(
        df.rename(columns={"doc_id": "neg_id", "lang": "neg_lang"}), on="neg_id"
    )
    assert (m["lang"] != m["neg_lang"]).all()

    with pytest.raises(ValueError):
        ring_negative_samples(rd.from_pandas(df), k=0)


def test_resample_counts_fills_gaps(ray_session):
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.windows import resample_counts

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:10", "2024-01-01 00:40",
                 "2024-01-01 03:05", "2024-01-01 03:20"]
            ),
            "kind": ["a", "b", "a", "a"],
        }
    )
    out = resample_counts(rd.from_pandas(df).repartition(2), "ts", "kind", freq="h")
    # 4 hours x 2 kinds, gaps (01:00, 02:00) present with n=0
    assert len(out) == 8
    z = out[(out["period"] == "2024-01-01 01:00:00")]
    assert list(z["n"]) == [0, 0]
    a3 = out[(out["period"] == "2024-01-01 03:00:00") & (out["kind"] == "a")]
    assert int(a3["n"].iloc[0]) == 2
    b0 = out[(out["period"] == "2024-01-01 00:00:00") & (out["kind"] == "b")]
    assert int(b0["n"].iloc[0]) == 1

    daily = resample_counts(rd.from_pandas(df), "ts", "kind", freq="D")
    assert len(daily) == 2 and set(daily["period"]) == {"2024-01-01"}


def test_merge_intervals_islands(ray_session):
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.windows import merge_intervals

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "b"],
            "st": [0, 5, 12, 20, 3],
            "en": [10, 8, 15, 25, 4],  # a: [0,10]+[5,8] merge; [12,15] touches? no; [20,25]
        }
    )
    out = (
        merge_intervals(rd.from_pandas(df).repartition(3), "k", "st", "en")
        .to_pandas()
        .sort_values(["k", "start"])
        .reset_index(drop=True)
    )
    want = [
        ("a", 0, 10, 2),
        ("a", 12, 15, 1),
        ("a", 20, 25, 1),
        ("b", 3, 4, 1),
    ]
    assert [tuple(r) for r in out.to_numpy()] == want

    # touching intervals (start == running max end) merge
    df2 = pd.DataFrame({"k": ["x", "x"], "st": [0, 10], "en": [10, 20]})
    out2 = merge_intervals(rd.from_pandas(df2), "k", "st", "en").to_pandas()
    assert len(out2) == 1 and int(out2["n_merged"].iloc[0]) == 2

    with pytest.raises(Exception):
        merge_intervals(
            rd.from_pandas(pd.DataFrame({"k": ["y"], "st": [5], "en": [1]})),
            "k", "st", "en",
        ).materialize()


def test_ranking_metrics_hand_computed(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.retrieval import ranking_metrics

    ranked = pd.DataFrame(
        {
            "term": ["q1"] * 3 + ["q2"] * 3 + ["q3"] * 2,
            "doc_id": [10, 11, 12, 20, 21, 22, 30, 31],
            "rank": [1, 2, 3, 1, 2, 3, 1, 2],
        }
    )
    # q1: rel = {11, 12, 99} -> hits at ranks 2,3; q2: rel = {20} -> hit at 1
    # q3: no relevant docs at all -> NULL metrics
    rel = pd.DataFrame(
        {"term": ["q1", "q1", "q1", "q2"], "doc_id": [11, 12, 99, 20]}
    )
    out = ranking_metrics(
        rd.from_pandas(rel).repartition(2), ranked, k=3
    ).sort_values("term").reset_index(drop=True)

    dcg1 = 1 / np.log2(3) + 1 / np.log2(4)
    idcg1 = 1 + 1 / np.log2(3) + 1 / np.log2(4)
    assert abs(out.loc[0, "ndcg"] - dcg1 / idcg1) < 2e-6
    assert abs(out.loc[0, "mrr"] - 0.5) < 1e-9
    assert abs(out.loc[0, "recall"] - 2 / 3) < 2e-6
    assert out.loc[1, "ndcg"] == 1.0 and out.loc[1, "mrr"] == 1.0
    assert out.loc[1, "recall"] == 1.0 and out.loc[1, "n_rel"] == 1
    assert out.loc[2, "n_rel"] == 0 and pd.isna(out.loc[2, "ndcg"])


def test_ffill_by_key_locf(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.windows import ffill_by_key

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "b", "b"],
            "t": [1, 2, 3, 4, 1, 2],
            "v": [np.nan, 5.0, np.nan, np.nan, np.nan, 7.0],
        }
    )
    out = (
        ffill_by_key(rd.from_pandas(df).repartition(3), "k", ["t"], ["v"])
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    # leading null stays; later nulls take the last non-null; keys isolated
    assert np.isnan(out["v"].iloc[0])
    assert list(out["v"].iloc[1:4]) == [5.0, 5.0, 5.0]
    assert np.isnan(out["v"].iloc[4]) and out["v"].iloc[5] == 7.0


def test_time_weighted_avg_step_function(ray_session):
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.windows import time_weighted_avg

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:10",
                 "2024-01-01 00:40", "2024-01-01 09:00"]
            ),
            "v": [6.0, 0.0, 99.0, 5.0],  # last reading carries no weight
        }
    )
    out = time_weighted_avg(
        rd.from_pandas(df).repartition(2), "k", "ts", "v"
    ).to_pandas()
    # a: 6.0 for 600s then 0.0 for 1800s -> twa = 3600/2400 = 1.5
    assert len(out) == 1  # single-reading key b omitted
    r = out.iloc[0]
    assert r["k"] == "a" and r["twa"] == 1.5
    assert r["n_segments"] == 2 and r["span_seconds"] == 2400.0
