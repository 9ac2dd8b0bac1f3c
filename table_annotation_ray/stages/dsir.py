"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): pick raw-corpus documents whose hashed-n-gram
distribution looks like a small TARGET corpus, by importance weight
w(x) = p_target(x) / q_raw(x) under bag-of-hashed-ngrams models, then
resample top-k under Gumbel noise.

Distributed shape (all bounded-model patterns already in this repo):

* **Feature counts** (:func:`hashed_ngram_counts`): per-batch bincount
  over the classifier's hashed unigram+bigram space → sparse
  ``(fidx, c)`` partials → one ``grouped_reduce`` exchange → driver
  densify.  The exchange and the collect are ≤ ``dim`` rows (default
  16k), never corpus-sized — same bounded-vocabulary contract as
  ``stages/lm.py``.
* **Scoring** (:func:`dsir_weights`): the log-ratio vector is
  ``ray.put`` ONCE and read per worker (never re-shipped per batch);
  each doc's log-weight is one vectorized segment-sum over its feature
  occurrences.  Map-only — zero exchanges.
* **Resampling** (:func:`dsir_sample`): Gumbel top-k — ``logw + G_i``
  with ``G_i`` a deterministic Gumbel from the multiplicative id hash
  (the exp-overflow-safe form of Efraimidis–Spirakis; argmax under
  Gumbel noise samples ∝ exp(logw), the Gumbel-max trick).  Same
  per-batch-partial-top-k → ``sort().limit(k)`` shape as
  ``datapipe.weighted_sample_k`` — the input is never globally sorted.

Smoothing: add-``smooth`` on every hashed bucket (both sides), so
features unseen in either corpus contribute a finite, symmetric prior
instead of ±inf.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .agg import grouped_reduce
from .classifier import _hash_features, _segment_sums
from .datapipe import HASH_MOD, HASH_MULT


def hashed_ngram_counts(
    docs: rd.Dataset,
    text_col: str = "text",
    dim: int = 1 << 14,
    batch_size: int = 4096,
) -> np.ndarray:
    """Corpus-level hashed unigram+bigram count vector (float64[dim])."""

    def partial(b: pd.DataFrame) -> pa.Table:
        idx, _off = _hash_features(b[text_col], dim)
        uniq, cnt = np.unique(idx, return_counts=True)
        return pa.table(
            {
                "fidx": pa.array(uniq.astype(np.int64), pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    sums = grouped_reduce(
        docs.map_batches(partial, batch_format="pandas", batch_size=batch_size),
        ["fidx"],
        {"c": ("c", "sum")},
    ).to_pandas()
    out = np.zeros(dim, dtype=np.float64)
    if len(sums):
        out[sums["fidx"].to_numpy(dtype=np.int64)] = sums["c"].to_numpy(
            dtype=np.float64
        )
    return out


def dsir_logratio(
    target_counts: np.ndarray, raw_counts: np.ndarray, smooth: float = 1.0
) -> np.ndarray:
    """log(p_target / q_raw) per hashed bucket, add-``smooth`` smoothed."""
    if smooth <= 0:
        raise ValueError("smooth must be > 0 (log of empty buckets)")
    p = target_counts + smooth
    q = raw_counts + smooth
    return np.log(p / p.sum()) - np.log(q / q.sum())


def dsir_weights(
    raw_docs: rd.Dataset,
    logratio: np.ndarray,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 4096,
) -> rd.Dataset:
    """(id, logw) per raw doc: logw(x) = Σ_occurrences logratio[f] —
    the importance log-weight under the bag-of-hashed-ngrams models.
    Map-only; ``logratio`` is broadcast once via ``ray.put``."""
    from ..state.worker_state import get_worker_state, ref_key

    dim = len(logratio)
    lref = ray.put(logratio)

    def score(b: pd.DataFrame) -> pa.Table:
        lr = get_worker_state(("dsir-lr", ref_key(lref)), lambda: ray.get(lref))
        idx, off = _hash_features(b[text_col], dim)
        logw = _segment_sums(lr[idx], off)
        return pa.table(
            {
                id_col: pa.array(b[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "logw": pa.array(logw, pa.float64()),
            }
        )

    return raw_docs.map_batches(score, batch_format="pandas", batch_size=batch_size)


def dsir_sample(
    raw_docs: rd.Dataset,
    target_docs: rd.Dataset,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1 << 14,
    smooth: float = 1.0,
    gumbel: bool = True,
    batch_size: int = 65536,
) -> rd.Dataset:
    """Select ``k`` raw docs by DSIR: counts on both corpora →
    log-ratio → per-doc log-weights → Gumbel top-k (``gumbel=False``
    takes the deterministic top-k by log-weight instead — useful for
    tests and greedy selection).  Returns (id, logw), highest first.

    The raw corpus streams THREE times (counts, scoring, and the
    caller's own use) — pass a materialized Dataset when it is cheap to
    hold, exactly like the classifier's epoch loop."""
    raw_counts = hashed_ngram_counts(raw_docs, text_col, dim)
    tgt_counts = hashed_ngram_counts(target_docs, text_col, dim)
    lr = dsir_logratio(tgt_counts, raw_counts, smooth)
    weights = dsir_weights(raw_docs, lr, id_col, text_col)

    def keyed(b: pd.DataFrame) -> pa.Table:
        key = b["logw"].to_numpy(dtype=np.float64)
        if gumbel:
            u64 = b[id_col].to_numpy(dtype=np.int64).astype(np.uint64)
            h = (u64 * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD)
            u = (h.astype(np.float64) + 0.5) / float(HASH_MOD)  # (0, 1)
            key = key - np.log(-np.log(u))  # Gumbel-max trick
        out = (
            b.assign(__g_key=key)
            .sort_values(["__g_key", id_col], ascending=[False, True], kind="mergesort")
            .head(k)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        weights.map_batches(keyed, batch_format="pandas", batch_size=batch_size)
        .sort(["__g_key", id_col], descending=[True, False])
        .limit(k)
        .drop_columns(["__g_key"])
    )
