"""Benchmark decontamination — flag corpus documents sharing any word
n-gram with a held-out benchmark/eval set (the GPT-3-style 13-gram
overlap rule: a pre-training corpus must not quote the test set).

Tokenization is the textstats convention (lowercase, split ``\\s+``,
drop empties); a gram is ``n`` consecutive tokens joined by single
spaces.  Grams are matched as STRINGS, not hashes — exact semantics,
SQL-replicable (a 64-bit-hash variant would cut wire bytes ~10× at the
cost of a documented false-positive rate; exactness wins here because
the op's output is a drop list).

Scale shapes, size-gated like stages/relational.py:

* **broadcast** (benchmark gram set ≤ ``broadcast_below``): distinct
  benchmark grams ``ray.put`` once; ONE streaming corpus pass explodes
  each doc's distinct grams per batch and counts membership hits —
  zero shuffle.  Real benchmarks (10^3–10^5 docs × ~10^2 grams) fit
  comfortably.
* **co-location** (huge benchmark): both sides exploded to (gram,
  doc_id)-tagged rows, ONE ``groupby(gram)`` sort shuffle emits corpus
  doc ids whose group contains a benchmark row, then a
  ``groupby(doc_id)`` count.  Corpus grams cross the wire once.

Output: (doc_id, n_hits) for contaminated docs only — n_hits = number
of DISTINCT benchmark-overlapping grams in the doc.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data as rd

_WS = re.compile(r"\s+")

DEFAULT_BROADCAST_BELOW = 20_000_000  # distinct benchmark grams


def doc_ngrams(text: str, n: int) -> set[str]:
    """Distinct word-``n``-grams of one normalized document."""
    toks = [t for t in _WS.split(text.strip().lower()) if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _explode_grams(
    b: pd.DataFrame, id_col: str, text_col: str, n: int
) -> pd.DataFrame:
    ids, grams = [], []
    for doc_id, text in zip(b[id_col], b[text_col].fillna("")):
        gs = doc_ngrams(text, n)
        ids.extend([doc_id] * len(gs))
        grams.extend(gs)
    return pd.DataFrame(
        {id_col: pd.Series(ids, dtype="int64"), "gram": pd.Series(grams, dtype="str")}
    )


def decontaminate(
    corpus: rd.Dataset,
    benchmark: rd.Dataset,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_below: int = DEFAULT_BROADCAST_BELOW,
) -> rd.Dataset:
    """(doc_id, n_hits) over ``corpus`` docs sharing ≥1 word-``n``-gram
    with any ``benchmark`` doc.  See module docstring for the size-gated
    execution shapes."""
    import ray

    from ..state.worker_state import get_worker_state, ref_key

    # materialize: the gram explode feeds the size gate AND the chosen
    # path — without it the benchmark explode recomputed per consumer
    # (review r4)
    bench_grams = benchmark.map_batches(
        _explode_grams,
        batch_format="pandas",
        fn_kwargs={"id_col": id_col, "text_col": text_col, "n": n},
    ).materialize()

    # the gate is documented as a DISTINCT-gram threshold (what is
    # actually ray.put), but raw row count over-counts grams shared
    # across benchmark docs — gate on an HLL distinct estimate (one
    # streaming pass, ~1% error; 1.05 headroom keeps the broadcast set
    # safely under the cap) with the row count as a free short-circuit
    # upper bound (review r4)
    def _gate() -> bool:
        if not broadcast_below:
            return False
        if bench_grams.count() <= broadcast_below:
            return True
        from .sketches import approx_distinct

        return approx_distinct(bench_grams, "gram") * 1.05 <= broadcast_below

    if _gate():
        gset = set(bench_grams.unique("gram"))
        gref = ray.put(gset)

        def hits(b: pd.DataFrame) -> pd.DataFrame:
            gs = get_worker_state(
                ("decontam", ref_key(gref)), lambda: ray.get(gref)
            )
            out_ids, out_hits = [], []
            for doc_id, text in zip(b[id_col], b[text_col].fillna("")):
                k = sum(1 for g in doc_ngrams(text, n) if g in gs)
                if k:
                    out_ids.append(doc_id)
                    out_hits.append(k)
            return pd.DataFrame(
                {
                    id_col: pd.Series(out_ids, dtype="int64"),
                    "n_hits": pd.Series(out_hits, dtype="int64"),
                }
            )

        return corpus.map_batches(hits, batch_format="pandas")

    # co-location path: tag sides, bucket by hash(gram) so the exchange
    # groups over ≤64 values (gram cardinality is corpus-sized — both a
    # per-gram map_groups UDF call and the builtin per-key aggregate are
    # pathological there, CLAUDE.md r3), then a vectorized in-bucket
    # membership pass and a grouped_reduce hit count per doc
    import pyarrow as pa

    from .agg import grouped_reduce

    NB = np.uint64(64)

    def tag(is_bench: bool):
        # arrow out — pandas blocks poison the sort-shuffle
        def f(b: pd.DataFrame) -> pa.Table:
            out = b.copy()
            out["_bench"] = np.full(len(b), is_bench)
            out["_gbkt"] = (
                pd.util.hash_pandas_object(out["gram"], index=False).to_numpy()
                % NB
            ).astype(np.int64)
            return pa.Table.from_pandas(out, preserve_index=False)

        return f

    tagged = corpus.map_batches(
        _explode_grams,
        batch_format="pandas",
        fn_kwargs={"id_col": id_col, "text_col": text_col, "n": n},
    ).map_batches(tag(False), batch_format="pandas").union(
        bench_grams.map_batches(tag(True), batch_format="pandas")
    )

    def emit_hits(g: pd.DataFrame) -> pa.Table:
        # vectorized over the whole bucket: one (gram, doc) hit per
        # distinct pair whose gram also appears on the benchmark side
        is_bench = g["_bench"].to_numpy()
        bench_set = set(g.loc[is_bench, "gram"])
        hit = g[~is_bench & g["gram"].isin(bench_set).to_numpy()]
        hit = hit.drop_duplicates(["gram", id_col])
        return pa.table(
            {
                id_col: hit[id_col].to_numpy(dtype=np.int64),
                "one": np.ones(len(hit), dtype=np.int64),
            }
        )

    hits = tagged.groupby("_gbkt").map_groups(emit_hits, batch_format="pandas")
    return grouped_reduce(hits, [id_col], {"n_hits": ("one", "sum")})


def embedding_decontam(
    corpus: rd.Dataset,
    bench: rd.Dataset,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 6,
    max_bench: int = 1_000_000,
    batch_size: int = 4096,
) -> rd.Dataset:
    """Embedding-space decontamination — the SEMANTIC analogue of the
    13-gram rule: flag every corpus vector whose cosine similarity to
    ANY benchmark vector reaches ``threshold`` (catches paraphrased /
    reformatted test-set leakage that exact n-gram overlap misses).

    Shape: the benchmark matrix is collected ONCE, L2-normalized and
    ``ray.put``-broadcast; each corpus batch is one numpy matmul
    against it — map-only, zero exchanges.  Similarities are rounded
    half-away to ``round_decimals`` BEFORE the threshold compare (the
    tfidf_topk portability rule: BLAS vs SQL float paths differ by
    ulps; compare rounded values on both sides).

    Returns (id, max_sim, n_hits, contaminated) for EVERY corpus row —
    the caller filters or joins; emitting all rows keeps the output a
    drop-list AND an audit trail.

    Partitioning assumption: the benchmark fits a worker heap (an eval
    set by contract; guarded by ``max_bench``).  Benchmarks beyond that
    need the LSH-bucketed co-location path
    (``similarity.embedding_near_dup_pairs`` shape)."""
    import pyarrow as pa

    import ray

    from ..state.worker_state import get_worker_state, ref_key
    from .similarity import _normalize, _stack

    bdf = bench.to_pandas()
    if len(bdf) > max_bench:
        raise ValueError(
            f"benchmark has {len(bdf)} vectors > max_bench={max_bench}; "
            "use an LSH-bucketed co-location (embedding_near_dup_pairs shape)"
        )
    bmat = _normalize(_stack(bdf[vec_col])) if len(bdf) else np.zeros((0, 1))
    bref = ray.put(np.ascontiguousarray(bmat.T))  # (d, nb), matmul-ready
    f = 10.0**round_decimals

    def score(b: pd.DataFrame) -> pa.Table:
        bt = get_worker_state(("edecon-b", ref_key(bref)), lambda: ray.get(bref))
        x = _normalize(_stack(b[vec_col]))
        if bt.shape[1] == 0:
            mx = np.full(len(b), -1.0)
            nh = np.zeros(len(b), dtype=np.int64)
        else:
            sims = x @ bt
            # round half-away BEFORE max/threshold (portable compare)
            sims = np.sign(sims) * np.floor(np.abs(sims) * f + 0.5) / f
            mx = sims.max(axis=1)
            nh = (sims >= threshold).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(b[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "max_sim": pa.array(mx, pa.float64()),
                "n_hits": pa.array(nh, pa.int64()),
                "contaminated": pa.array(nh > 0, pa.bool_()),
            }
        )

    return corpus.map_batches(score, batch_format="pandas", batch_size=batch_size)
