"""Corpus-trained bigram language model + perplexity scoring — the
model-based quality gate of training-data pipelines (the KenLM-filter
shape: train a cheap n-gram LM on the corpus/reference, broadcast it,
score every document, drop the tail).

Training is two :func:`~.agg.grouped_reduce` passes (unigram and bigram
counts — corpus-cardinality keys, never per-key Python), truncated to
the top ``max_unigrams`` / ``max_bigrams`` by count.  Truncation is
two-level: each reduce-output block keeps its local top-K first (a
global top-K item is by definition inside its block's top-K), so the
driver collects ≤ blocks×K rows, never the full distinct-gram set —
at pretraining scale the distinct-bigram table is 10^8+ rows and a
driver ``to_pandas`` of it would OOM (review r4).  Bigrams whose
context unigram fell below the unigram cutoff are dropped so every
retained bigram satisfies c(a) ≥ c(a,b) — without that filter a kept
bigram with a truncated context scored (c(ab)+k)/(0+kV), inflating
P(b|a) past 1 and deflating perplexity (review r4).  Scoring is one
broadcast +
one streaming pass: per batch, token pairs map through the model's
hash tables via ``pd.Series.map`` (C-speed lookups, no Python loop
over tokens beyond the per-doc tokenize).

Probabilities are add-k smoothed conditionals
``P(b|a) = (c(a,b) + k) / (c(a) + k·V)`` with unseen bigrams falling
back to the same formula at c(a,b)=0 (and c(a)=0 for OOV contexts), so
every score is finite and the result deterministic.  Perplexity =
``exp(-mean log P)`` over a doc's bigrams; docs with <2 tokens score
the OOV perplexity.

Tokenization is lowercased whitespace splitting — identical to
stages/textstats.py::vocab_topk, so the signal lines up with the
vocabulary/token-count family.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

import ray
import ray.data as rd

_WS = re.compile(r"\s+")


def _tokenize(text: str) -> list[str]:
    return [t for t in _WS.split(text.lower()) if t]


def train_bigram_lm(
    docs: rd.Dataset,
    text_col: str = "text",
    max_unigrams: int = 65_536,
    max_bigrams: int = 1_048_576,
    smoothing_k: float = 0.5,
) -> dict:
    """Returns {"uni": {tok: count}, "bi": {(a,b): count}, "V": int,
    "k": float} — bounded driver state (top-K by count, count-desc /
    lexicographic tie-break so truncation is deterministic)."""
    from .agg import grouped_reduce

    def unigrams(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in b[text_col].fillna(""):
            toks.extend(_tokenize(t))
        return pd.DataFrame({"tok": pd.Series(toks, dtype="object")})

    def bigrams(b: pd.DataFrame) -> pd.DataFrame:
        a_out: list[str] = []
        b_out: list[str] = []
        for t in b[text_col].fillna(""):
            ts = _tokenize(t)
            a_out.extend(ts[:-1])
            b_out.extend(ts[1:])
        return pd.DataFrame(
            {"a": pd.Series(a_out, dtype="object"), "b": pd.Series(b_out, dtype="object")}
        )

    def _topk(counts_ds: rd.Dataset, sort_cols: list[str], k: int) -> pd.DataFrame:
        asc = [False] + [True] * (len(sort_cols) - 1)

        # per-block local top-K under the SAME total order: any global
        # top-K row is inside its block's top-K, so the driver collect
        # is bounded by blocks×K rows regardless of corpus cardinality
        def prune(b: pd.DataFrame) -> pd.DataFrame:
            return b.sort_values(sort_cols, ascending=asc).head(k)

        out = counts_ds.map_batches(prune, batch_format="pandas").to_pandas()
        return out.sort_values(sort_cols, ascending=asc)

    uni = _topk(
        grouped_reduce(
            docs.map_batches(unigrams, batch_format="pandas"),
            ["tok"], {"n": (None, "count")},
        ),
        ["n", "tok"], max_unigrams,
    ).head(max_unigrams)

    bi = _topk(
        grouped_reduce(
            docs.map_batches(bigrams, batch_format="pandas"),
            ["a", "b"], {"n": (None, "count")},
        ),
        ["n", "a", "b"], max_bigrams,
    )
    # context-consistency: keep only bigrams whose context unigram
    # survived its own truncation (guarantees c(a) >= c(a,b)); filter
    # BEFORE the final head so the model keeps max_bigrams USABLE rows
    bi = bi[bi["a"].isin(set(uni["tok"]))].head(max_bigrams)

    return {
        "uni": dict(zip(uni["tok"], uni["n"].astype(int))),
        "bi": dict(zip(zip(bi["a"], bi["b"]), bi["n"].astype(int))),
        "V": int(len(uni)) + 1,  # +1 for the OOV type
        "k": float(smoothing_k),
    }


def score_perplexity(
    docs: rd.Dataset,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 4096,
) -> rd.Dataset:
    """(id, n_bigrams, ppl) per document — one broadcast, one pass."""
    import pyarrow as pa

    mref = ray.put(model)

    from ..state.worker_state import get_worker_state, ref_key

    def score(b: pd.DataFrame) -> pa.Table:
        m = get_worker_state(("bigram_lm", ref_key(mref)), lambda: ray.get(mref))
        uni, bi, V, k = m["uni"], m["bi"], m["V"], m["k"]
        kv = k * V
        oov_lp = math.log(k / kv)  # c(a,b)=0, c(a)=0
        ids = b[id_col].to_numpy(dtype=np.int64)
        # batch-level vectorization: ONE pairs Series + ONE map per
        # batch (a per-doc Series construction was measured 15 s over
        # 5k docs; this shape is ~2 s), per-doc means via reduceat
        tok_lists = [_tokenize(t) for t in b[text_col].fillna("")]
        counts = np.array([max(len(ts) - 1, 0) for ts in tok_lists], dtype=np.int64)
        a_all = [t for ts in tok_lists for t in ts[:-1]]
        b_all = [t for ts in tok_lists for t in ts[1:]]
        if a_all:
            cab = (
                pd.Series(list(zip(a_all, b_all)), dtype="object")
                .map(bi).fillna(0.0).to_numpy(dtype=np.float64)
            )
            ca = (
                pd.Series(a_all, dtype="object")
                .map(uni).fillna(0.0).to_numpy(dtype=np.float64)
            )
            lp = np.log((cab + k) / (ca + kv))
        else:
            lp = np.empty(0)
        offsets = np.r_[0, np.cumsum(counts)]
        ppls = np.full(len(ids), math.exp(-oov_lp))
        nz = counts > 0
        if nz.any():
            sums = np.add.reduceat(lp, offsets[:-1][nz])
            ppls[nz] = np.exp(-sums / counts[nz])
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_bigrams": pa.array(counts),
                "ppl": pa.array(ppls),
            }
        )

    return docs.map_batches(score, batch_format="pandas", batch_size=batch_size)
