"""Corpus-trained bigram language model + perplexity scoring — the
model-based quality gate of training-data pipelines (the KenLM-filter
shape: train a cheap n-gram LM on the corpus/reference, broadcast it,
score every document, drop the tail).

Training is ONE fused count pass (r5, was two grouped_reduce passes):
each batch explodes to (token, next-token) rows — the last token of a
doc pairs with a sentinel "" so every token appears exactly once as a
context — then a map-side pandas-groupby partial bucketed by
``hash(a) % 64`` rides one sort exchange; the in-bucket finalize sums
bigram counts and derives unigram counts as the context margin
(Σ_b c(a,b) including the sentinel — exactly the token's occurrence
count).  Bucketing by the CONTEXT token co-locates a unigram with all
its bigrams, which is what lets one exchange serve both tables; a
pathologically hot context word skews one bucket, the usual 64-bucket
grouped_reduce envelope.  Truncation is
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
import pyarrow as pa

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
    num_buckets: int = 64,
) -> dict:
    """Returns {"uni": {tok: count}, "bi": {(a,b): count}, "V": int,
    "k": float} — bounded driver state (top-K by count, count-desc /
    lexicographic tie-break so truncation is deterministic).

    One corpus pass, one exchange (see module docstring): the sentinel
    row (a, "") carries the "a was a doc-final token" occurrences, so
    the in-bucket context margin Σ_b c(a,b) equals c(a) exactly — the
    tokenizer never emits "" as a real token."""
    nb = np.uint64(num_buckets)

    def explode_partial(b: pd.DataFrame) -> pa.Table:
        a_out: list[str] = []
        b_out: list[str] = []
        for t in b[text_col].fillna(""):
            ts = _tokenize(t)
            if not ts:
                continue
            a_out.extend(ts)
            b_out.extend(ts[1:])
            b_out.append("")  # doc-final sentinel: margin row only
        df = pd.DataFrame(
            {"a": pd.Series(a_out, dtype="object"),
             "b": pd.Series(b_out, dtype="object")}
        )
        p = df.groupby(["a", "b"], sort=False).size().rename("n").reset_index()
        bkt = (
            pd.util.hash_pandas_object(p["a"], index=False).to_numpy() % nb
        ).astype(np.int64)
        # explicit Arrow types: an all-empty-text batch yields an empty
        # object frame that would infer NULL columns (CLAUDE.md rule)
        return pa.table(
            {
                "a": pa.array(p["a"].tolist(), pa.string()),
                "b": pa.array(p["b"].tolist(), pa.string()),
                "n": pa.array(p["n"].to_numpy(dtype=np.int64), pa.int64()),
                "__gr_bkt": pa.array(bkt, pa.int64()),
            }
        )

    def finalize(g: pd.DataFrame) -> pa.Table:
        bi = g.groupby(["a", "b"], sort=False)["n"].sum().reset_index()
        # context margin INCLUDING the sentinel rows = unigram count
        uni = bi.groupby("a", sort=False)["n"].sum().reset_index()
        bi = bi[bi["b"] != ""]
        out_a = uni["a"].tolist() + bi["a"].tolist()
        out_b = [""] * len(uni) + bi["b"].tolist()
        out_n = np.concatenate(
            [uni["n"].to_numpy(dtype=np.int64), bi["n"].to_numpy(dtype=np.int64)]
        ) if len(uni) or len(bi) else np.empty(0, dtype=np.int64)
        kind = np.r_[np.zeros(len(uni), dtype=np.int64),
                     np.ones(len(bi), dtype=np.int64)]
        return pa.table(
            {
                "a": pa.array(out_a, pa.string()),
                "b": pa.array(out_b, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "kind": pa.array(kind, pa.int64()),
            }
        )

    counts = (
        docs.map_batches(explode_partial, batch_format="pandas", batch_size=65536)
        .groupby("__gr_bkt")
        .map_groups(finalize, batch_format="pandas")
    )

    # per-block local top-K per kind under the SAME total order: any
    # global top-K row is inside its block's top-K (each (a[,b]) key
    # lives in exactly one bucket's output), so the driver collect is
    # bounded by blocks×K rows regardless of corpus cardinality
    def prune(b: pd.DataFrame) -> pd.DataFrame:
        is_u = b["kind"].to_numpy() == 0
        u = b[is_u].sort_values(["n", "a"], ascending=[False, True]).head(max_unigrams)
        bg = b[~is_u].sort_values(
            ["n", "a", "b"], ascending=[False, True, True]
        ).head(max_bigrams)
        return pd.concat([u, bg], ignore_index=True)

    allc = counts.map_batches(prune, batch_format="pandas").to_pandas()
    uni = (
        allc[allc["kind"] == 0]
        .sort_values(["n", "a"], ascending=[False, True])
        .head(max_unigrams)
    )
    bi = allc[allc["kind"] == 1].sort_values(
        ["n", "a", "b"], ascending=[False, True, True]
    )
    # context-consistency: keep only bigrams whose context unigram
    # survived its own truncation (guarantees c(a) >= c(a,b)); filter
    # BEFORE the final head so the model keeps max_bigrams USABLE rows
    bi = bi[bi["a"].isin(set(uni["a"]))].head(max_bigrams)

    return {
        "uni": dict(zip(uni["a"], uni["n"].astype(int))),
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


def kn_bigram_probs(
    docs: rd.Dataset,
    text_col: str = "text",
    discount: float = 0.75,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Interpolated Kneser–Ney smoothed bigram probabilities — the
    classic LM-smoothing upgrade over the add-k model in
    :func:`train_bigram_lm`::

        P_KN(b|a) = (max(c(a,b) - d, 0) + d * N1+(a,·) * (N1+(·,b)/D))
                    / c(a·)

    where ``c(a·) = Σ_b c(a,b)`` is the context total over REAL pairs,
    ``N1+(a,·)`` / ``N1+(·,b)`` are distinct continuation counts and
    ``D`` is the number of distinct bigram types (so ``N1+(·,b)/D`` is
    the continuation probability).  All inputs are integers and the
    float expression is evaluated in EXACTLY the SQL association order
    ``(greatest(cab-d,0) + d*n1f*(n1b/D)) / ctot`` — bit-identical to a
    DuckDB mirror, no rounding step.

    Shape: one corpus pass exploding consecutive token pairs with
    map-side partial counts, ONE hash(context) exchange (bigram totals
    + context margin + forward continuation counts all fall out of the
    same in-bucket groupby), ONE hash(next-token) exchange for backward
    continuation counts (rows are distinct types by then, so n1b is the
    group size — no separate join), then a map-only scoring pass with
    the scalar ``D`` captured from the materialized type table.
    Returns a Dataset ``(a, b, cab, ctot, n1f, n1b, kn_prob)`` — one
    row per distinct bigram type, streamable at corpus scale.
    """
    nb = np.uint64(num_buckets)
    d = float(discount)

    def explode_partial(b: pd.DataFrame) -> pa.Table:
        a_out: list[str] = []
        b_out: list[str] = []
        for t in b[text_col].fillna(""):
            ts = _tokenize(t)
            a_out.extend(ts[:-1])
            b_out.extend(ts[1:])
        df = pd.DataFrame(
            {"a": pd.Series(a_out, dtype="object"),
             "b": pd.Series(b_out, dtype="object")}
        )
        p = df.groupby(["a", "b"], sort=False).size().rename("n").reset_index()
        bkt = (
            pd.util.hash_pandas_object(p["a"], index=False).to_numpy() % nb
        ).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(p["a"].tolist(), pa.string()),
                "b": pa.array(p["b"].tolist(), pa.string()),
                "n": pa.array(p["n"].to_numpy(dtype=np.int64), pa.int64()),
                "__kn_bkt": pa.array(bkt, pa.int64()),
            }
        )

    def ctx_margin(g: pd.DataFrame) -> pa.Table:
        bi = g.groupby(["a", "b"], sort=False)["n"].sum().reset_index(name="cab")
        gb = bi.groupby("a", sort=False)
        ctot = gb["cab"].transform("sum").to_numpy(dtype=np.int64)
        n1f = gb["cab"].transform("size").to_numpy(dtype=np.int64)
        bkt2 = (
            pd.util.hash_pandas_object(bi["b"], index=False).to_numpy() % nb
        ).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(bi["a"].tolist(), pa.string()),
                "b": pa.array(bi["b"].tolist(), pa.string()),
                "cab": pa.array(bi["cab"].to_numpy(dtype=np.int64), pa.int64()),
                "ctot": pa.array(ctot, pa.int64()),
                "n1f": pa.array(n1f, pa.int64()),
                "__kn_bkt2": pa.array(bkt2, pa.int64()),
            }
        )

    def back_margin(g: pd.DataFrame) -> pa.Table:
        g = g.drop(columns="__kn_bkt2")
        n1b = g.groupby("b", sort=False)["a"].transform("size").to_numpy(
            dtype=np.int64
        )
        return pa.Table.from_pandas(
            g.assign(n1b=n1b), preserve_index=False
        )

    typed = (
        docs.map_batches(explode_partial, batch_format="pandas",
                         batch_size=65536)
        .groupby("__kn_bkt")
        .map_groups(ctx_margin, batch_format="pandas")
        .groupby("__kn_bkt2")
        .map_groups(back_margin, batch_format="pandas")
        .materialize()
    )
    D = typed.count()

    def score(t: pa.Table) -> pa.Table:
        cab = t["cab"].to_numpy().astype(np.float64)
        ctot = t["ctot"].to_numpy().astype(np.float64)
        n1f = t["n1f"].to_numpy().astype(np.float64)
        n1b = t["n1b"].to_numpy().astype(np.float64)
        # EXACT SQL association order (docstring) — do not refactor
        p = (np.maximum(cab - d, 0.0) + d * n1f * (n1b / float(D))) / ctot
        return t.append_column("kn_prob", pa.array(p, pa.float64()))

    return typed.map_batches(score, batch_format="pyarrow")
