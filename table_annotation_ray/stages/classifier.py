"""Trainable quality classifier — the fastText-shaped gate of
web-corpus curation (Joulin et al. 2016, arXiv:1607.01759: a linear
model over hashed bag-of-n-gram features; the GPT-3/CCNet pipelines
train exactly this shape to score documents against a high-quality
reference corpus, then keep the top of the score distribution).

Layout is the engine's bounded-model broadcast pattern (stages/lm.py):

* **features** — lowercased whitespace unigrams + adjacent bigrams,
  hashed to ``dim`` buckets (vectorized ``pd.util.hash_pandas_object``;
  no vocabulary is ever built, the hash IS the vocabulary — the trick
  that keeps the model a fixed-size array at any corpus size).
* **training** — full-batch logistic regression, one corpus pass per
  epoch: the CURRENT weight vector is broadcast (``ray.put``, read once
  per worker), each batch computes its gradient partial as SPARSE
  (feature_idx, grad_sum) rows via segment sums, and ONE
  :func:`~.agg.grouped_reduce` exchange per epoch sums them by index —
  the driver applies the dense update to its ≤ ``dim``-row result.
  Nothing driver-side ever scales with the corpus: the exchange carries
  at most (distinct features per batch) × batches rows and collapses to
  ≤ dim + 1 rows (the +1 is the bias, index −1).
* **scoring** — one broadcast + one streaming pass; sigmoid scores.

Deterministic: hashing is seed-free (pandas' stable hash), batches
contribute through a commutative sum, and the update is applied once
per epoch on the driver — the planted-signal pytest recovers the same
weights at any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .agg import grouped_reduce


def _hash_features(texts: pd.Series, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """(flat feature indices, row offsets) for unigram+bigram hashed
    features of each text — fully vectorized (one str.split, one
    pandas hash over the exploded token/bigram frames)."""
    n = len(texts)
    flat = (
        texts.fillna("").str.lower().reset_index(drop=True).str.split().explode().dropna()
    )
    pos = flat.index.to_numpy(dtype=np.int64)
    counts = np.bincount(pos, minlength=n).astype(np.int64)
    d = np.uint64(dim)
    if len(flat):
        toks_np = flat.to_numpy()
        same_row = pos[1:] == pos[:-1]
        # adjacent bigrams: elementwise object-array concat inside rows
        bi = pd.Series(
            toks_np[:-1][same_row] + np.array(" ", dtype=object) + toks_np[1:][same_row]
        )
        bi_pos = pos[:-1][same_row]
        uni_idx = (
            pd.util.hash_pandas_object(flat, index=False).to_numpy() % d
        ).astype(np.int64)
        bi_idx = (
            pd.util.hash_pandas_object(bi, index=False).to_numpy() % d
        ).astype(np.int64)
    else:
        uni_idx = bi_idx = np.empty(0, dtype=np.int64)
        bi_pos = np.empty(0, dtype=np.int64)
    # order features row-major: all of row0's unigrams+bigrams, row1's…
    order_pos = np.concatenate([pos, bi_pos])
    idx = np.concatenate([uni_idx, bi_idx])[np.argsort(order_pos, kind="stable")]
    n_bi = np.bincount(bi_pos, minlength=n).astype(np.int64)
    offsets = np.r_[0, np.cumsum(counts + n_bi)]
    return idx, offsets


def _segment_sums(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    c = np.r_[0.0, np.cumsum(values)]
    return c[offsets[1:]] - c[offsets[:-1]]


def train_quality_classifier(
    docs: rd.Dataset,
    label_col: str = "label",
    text_col: str = "text",
    dim: int = 1 << 18,
    epochs: int = 5,
    lr: float = 0.5,
    l2: float = 1e-6,
    batch_size: int = 4096,
) -> dict:
    """Returns {"w": float64[dim], "bias": float, "dim": int} — a
    logistic model over hashed n-gram features, trained with one
    gradient exchange per epoch (see module docstring).  Labels are
    0/1 in ``label_col``."""
    from ..state.worker_state import get_worker_state, ref_key

    n_total = docs.count()
    if n_total == 0:
        raise ValueError("empty training set")
    w = np.zeros(dim, dtype=np.float64)
    bias = 0.0

    for _epoch in range(epochs):
        wref = ray.put((w, bias))

        def grad_partial(b: pd.DataFrame, _wref=wref) -> pa.Table:
            cur_w, cur_b = get_worker_state(
                ("qclf-w", ref_key(_wref)), lambda: ray.get(_wref)
            )
            idx, off = _hash_features(b[text_col], dim)
            y = b[label_col].to_numpy(dtype=np.float64)
            nf = np.maximum(np.diff(off), 1).astype(np.float64)
            # mean-of-feature-weights text representation (the fastText
            # shape) → score, sigmoid, residual
            score = _segment_sums(cur_w[idx], off) / nf + cur_b
            r = 1.0 / (1.0 + np.exp(-score)) - y  # dL/dscore
            # per-feature gradient: residual/nf at each occurrence,
            # pre-summed per index WITHIN the batch (np.bincount on the
            # batch's own distinct indices keeps the emission sparse)
            contrib = np.repeat(r / nf, np.diff(off))
            uniq, inv = np.unique(idx, return_inverse=True)
            g = np.bincount(inv, weights=contrib)
            return pa.table(
                {
                    "fidx": pa.array(
                        np.r_[uniq, np.int64(-1)], pa.int64()
                    ),  # -1 = bias row
                    "g": pa.array(np.r_[g, r.sum()], pa.float64()),
                }
            )

        sums = grouped_reduce(
            docs.map_batches(grad_partial, batch_format="pandas", batch_size=batch_size),
            ["fidx"], {"g": ("g", "sum")},
        ).to_pandas()
        gi = sums["fidx"].to_numpy(dtype=np.int64)
        gv = sums["g"].to_numpy(dtype=np.float64) / n_total
        bmask = gi == -1
        w *= 1.0 - lr * l2  # L2 shrink on every coordinate
        np.subtract.at(w, gi[~bmask], lr * gv[~bmask])
        if bmask.any():
            bias -= lr * float(gv[bmask][0])
    return {"w": w, "bias": float(bias), "dim": int(dim)}


def score_quality_classifier(
    docs: rd.Dataset,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 4096,
) -> rd.Dataset:
    """(id, score) per document — sigmoid P(quality=1); one model
    broadcast, one streaming pass."""
    from ..state.worker_state import get_worker_state, ref_key

    mref = ray.put((model["w"], model["bias"]))
    dim = model["dim"]

    def score(b: pd.DataFrame) -> pa.Table:
        cur_w, cur_b = get_worker_state(
            ("qclf-score", ref_key(mref)), lambda: ray.get(mref)
        )
        idx, off = _hash_features(b[text_col], dim)
        nf = np.maximum(np.diff(off), 1).astype(np.float64)
        s = _segment_sums(cur_w[idx], off) / nf + cur_b
        return pa.table(
            {
                id_col: pa.array(b[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "score": pa.array(
                    np.round(1.0 / (1.0 + np.exp(-s)), 6), pa.float64()
                ),
            }
        )

    return docs.map_batches(score, batch_format="pandas", batch_size=batch_size)
