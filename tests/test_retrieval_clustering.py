"""Tests for BM25 retrieval and distributed k-means."""

import numpy as np
import pandas as pd

import ray.data as rd

from table_annotation_ray.stages.clustering import kmeans_assign, kmeans_fit
from table_annotation_ray.stages.retrieval import bm25_topk


def test_bm25_matches_reference_formula(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "hash join hash join hash",
                "vector scan vector",
                "hash vector join table scan filter",
                "table scan only nothing relevant",
                "",
            ],
        }
    )
    out = bm25_topk(rd.from_pandas(docs).repartition(3),
                    ["hash", "vector"], k=3)
    # straight NumPy reference on the same corpus
    texts = [t.lower().split() for t in docs["text"]]
    dls = np.array([len(t) for t in texts], dtype=float)
    n, avgdl = len(texts), dls.mean()
    k1, b = 1.5, 0.75
    scores = np.zeros(n)
    for term in ("hash", "vector"):
        tf = np.array([t.count(term) for t in texts], dtype=float)
        df = int((tf > 0).sum())
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
        scores += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls / avgdl))
    want = sorted(
        [(round(s, 6), i) for i, s in enumerate(scores) if round(s, 6) > 0],
        key=lambda x: (-x[0], x[1]),
    )[:3]
    assert list(zip(out["score"], out["doc_id"])) == want


def test_bm25_no_match_terms(ray_session):
    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["aa bb", "cc dd"]})
    out = bm25_topk(rd.from_pandas(docs), ["zzz"], k=5)
    assert len(out) == 0


def _planted(seed=0, per=60, d=8):
    rng = np.random.default_rng(seed)
    centers = np.array([[10.0] * d, [-10.0] * d, [10.0] * (d // 2) + [-10.0] * (d // 2)])
    X, lab = [], []
    for c in range(3):
        X.append(centers[c] + rng.normal(0, 0.5, (per, d)))
        lab += [c] * per
    X = np.vstack(X)
    order = rng.permutation(len(X))
    return X[order], np.array(lab)[order]


def test_kmeans_recovers_planted_clusters(ray_session):
    X, true_lab = _planted()
    df = pd.DataFrame(
        {"vec_id": np.arange(len(X)), "embedding": [row.astype(np.float32) for row in X]}
    )
    ds = rd.from_pandas(df).repartition(4)
    cents, hist = kmeans_fit(ds, k=3, iters=12)
    # inertia must be non-increasing
    assert all(a >= b - 1e-9 for a, b in zip(hist, hist[1:]))
    got = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    # same-partition purity: every true cluster maps to one learned label
    pred = got["cluster"].to_numpy()
    for c in range(3):
        labs = pred[true_lab == c]
        assert (labs == np.bincount(labs).argmax()).mean() > 0.95
    assert len(set(pred)) == 3


def test_kmeans_deterministic(ray_session):
    X, _ = _planted(seed=3)
    df = pd.DataFrame(
        {"vec_id": np.arange(len(X)), "embedding": [row.astype(np.float32) for row in X]}
    )
    ds = rd.from_pandas(df).repartition(4)
    c1, h1 = kmeans_fit(ds, k=3, iters=5)
    c2, h2 = kmeans_fit(ds, k=3, iters=5)
    assert h1 == h2 and np.array_equal(c1, c2)


def test_inverted_postings(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.retrieval import inverted_postings

    rows = [
        {"doc_id": 0, "text": "Apple banana apple"},
        {"doc_id": 1, "text": "banana cherry"},
        {"doc_id": 2, "text": "   "},           # empty after trim: no postings
        {"doc_id": 3, "text": "apple"},
    ]
    out = (
        inverted_postings(rd.from_items(rows).repartition(3))
        .to_pandas()
        .sort_values(["term", "doc_id"])
        .reset_index(drop=True)
    )
    got = {(t, d): (tf, df) for t, d, tf, df in out.itertuples(index=False)}
    # lowercased terms, per-doc tf, per-term df (posting-list length)
    assert got == {
        ("apple", 0): (2, 2),
        ("apple", 3): (1, 2),
        ("banana", 0): (1, 2),
        ("banana", 1): (1, 2),
        ("cherry", 1): (1, 1),
    }
    # block-layout independence
    out2 = (
        inverted_postings(rd.from_items(rows).repartition(1))
        .to_pandas()
        .sort_values(["term", "doc_id"])
        .reset_index(drop=True)
    )
    assert out.equals(out2)
    # an all-empty block must not poison block unification (empty-frame rule)
    allempty = rd.from_items([{"doc_id": 9, "text": ""}])
    assert inverted_postings(allempty).count() == 0


def test_bm25_indexed_equals_scan(ray_session):
    """bm25_topk_indexed over the materialized inverted index must equal
    the index-free bm25_topk scan on a punctuation-free corpus (where
    word-boundary and whitespace tokenizations coincide)."""
    import ray.data as rd

    from table_annotation_ray.stages.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
        inverted_postings,
    )
    from table_annotation_ray.stages.textstats import token_stats

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).repartition(4)
    postings = inverted_postings(docs).materialize()
    lens = docs.map_batches(token_stats, batch_format="pandas").select_columns(
        ["doc_id", "n_tokens"]
    )
    for terms in (["table", "fast"], ["window"], ["nosuchterm"], ["table", "nosuchterm"]):
        scan = bm25_topk(docs, terms, k=12)
        idx = bm25_topk_indexed(postings, lens, terms, k=12)
        assert list(scan.doc_id) == list(idx.doc_id), terms
        assert np.allclose(scan.score, idx.score, atol=1e-9), terms


def test_hashed_text_features_planted_topics(ray_session):
    import ray.data as rd

    from table_annotation_ray.stages.clustering import kmeans_assign, kmeans_fit
    from table_annotation_ray.stages.textstats import hashed_text_features

    rng = np.random.default_rng(17)
    vocab_a = [f"alpha{i}" for i in range(30)]
    vocab_b = [f"beta{i}" for i in range(30)]
    rows = []
    for i in range(200):
        v = vocab_a if i % 2 == 0 else vocab_b
        rows.append({"doc_id": i, "text": " ".join(rng.choice(v, 25))})
    rows.append({"doc_id": 200, "text": "   "})  # zero-token doc → zero vector
    ds = rd.from_items(rows).repartition(4)

    feats = hashed_text_features(ds, dim=64).materialize()
    got = feats.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 201
    m = np.vstack(got["embedding"].to_numpy())
    assert m.shape == (201, 64)
    # normalized rows (except the zero vector), deterministic across layouts
    norms = np.linalg.norm(m, axis=1)
    assert np.allclose(norms[:200], 1.0) and norms[200] == 0.0
    got2 = (
        hashed_text_features(rd.from_items(rows).repartition(1), dim=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.allclose(m, np.vstack(got2["embedding"].to_numpy()))

    # the two planted vocabularies are linearly separable in hash space:
    # k-means (k=2) recovers the topic split
    cents, _ = kmeans_fit(feats, k=2, iters=10)
    lab = (
        kmeans_assign(feats, cents, id_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")["cluster"]
        .to_numpy()[:200]
    )
    true = np.arange(200) % 2
    purity = max((lab == true).mean(), (lab != true).mean())
    assert purity > 0.95
