"""BPE tokenizer training — the last first-class pretraining-pipeline
operator (Sennrich et al. 2016, arXiv:1508.07909): iteratively merge
the most frequent adjacent symbol pair over a word-frequency table.

Two engines behind one ``train_bpe`` API, size-gated like the repo's
broadcast-vs-colocation joins:

* **driver** (distinct words ≤ ``driver_max_words``): ONE distributed
  word-count pass (whitespace words, :func:`~.agg.grouped_reduce` — the
  only corpus-scale step; the distinct-word table is Heaps-law bounded),
  then the classic in-memory merge loop on the collected table.  This
  is how SentencePiece/HF train too: the corpus pass is the big-data
  part, the merge loop runs over word COUNTS.
* **dataset** (larger word tables): the word table stays a Dataset of
  (word, syms, n) rows; each round runs one map-side pre-summed pair
  count + ``grouped_reduce`` exchange, a block-local top-1 prune under
  the global order (count desc, pair lexicographic asc) so the driver
  collects ≤ blocks rows, broadcasts the winning pair, and rewrites
  only the words containing it.  ``repartition`` before each
  materialize keeps round block counts flat (CLAUDE.md r2 iterative
  rule).  One exchange per merge — at real scale amortized by the
  word-table size, at toy scale exchange-overhead-bound like the other
  multi-exchange pipelines.

Both engines are byte-identical to each other and to the single-process
reference implementation in tests/test_curation.py (same full-recount
semantics, same deterministic tie-break).  Word symbolization is
Sennrich's: ``tuple(word) + ("</w>",)``; pair counts are per adjacent
POSITION (``"aaa"`` contributes (a,a) twice) weighted by word frequency;
merge application scans left-to-right (non-overlapping).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .agg import grouped_reduce

EOW = "</w>"


def _symbolize(word: str) -> list[str]:
    return list(word) + [EOW]


def _merge_syms(syms: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping merge of adjacent (a, b) → a+b."""
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _pair_stats(syms: list[str]) -> dict[tuple[str, str], int]:
    d: dict[tuple[str, str], int] = {}
    for i in range(len(syms) - 1):
        p = (syms[i], syms[i + 1])
        d[p] = d.get(p, 0) + 1
    return d


def word_counts(
    docs: rd.Dataset, text_col: str = "text", num_buckets: int = 64
) -> rd.Dataset:
    """(word, n) over lowercased whitespace words — one corpus pass,
    one hash-bucket exchange (corpus-cardinality keys ride
    grouped_reduce, never per-key Ray groups)."""

    def explode(b: pd.DataFrame) -> pa.Table:
        flat = (
            b[text_col].fillna("").str.lower().str.split().explode().dropna()
        )
        return pa.table({"word": pa.array(flat.tolist(), pa.string())})

    return grouped_reduce(
        docs.map_batches(explode, batch_format="pandas"),
        ["word"], {"n": (None, "count")},
        num_buckets=num_buckets,
    )


def train_bpe_local(counts: dict[str, int], num_merges: int,
                    min_count: int = 2) -> list[tuple[str, str]]:
    """Reference merge loop over an in-memory word-count table — full
    pair recount per round, tie-break (count desc, pair asc).  The
    driver engine and the pytest reference both call this."""
    table = {w: _symbolize(w) for w in counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        stats: dict[tuple[str, str], int] = {}
        for w, syms in table.items():
            cnt = counts[w]
            for p, k in _pair_stats(syms).items():
                stats[p] = stats.get(p, 0) + k * cnt
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        a, b = best[0]
        merges.append((a, b))
        for w, syms in table.items():
            if a in syms:  # cheap containment gate before the scan
                table[w] = _merge_syms(syms, a, b)
    return merges


def train_bpe(
    docs: rd.Dataset,
    num_merges: int = 100,
    text_col: str = "text",
    min_count: int = 2,
    num_buckets: int = 64,
    driver_max_words: int = 1_000_000,
    engine: str = "auto",
    repartition_blocks: int = 16,
) -> list[tuple[str, str]]:
    """Train ``num_merges`` BPE merges over ``docs`` (see module
    docstring for the two engines).  Returns the ordered merge list."""
    if engine not in ("auto", "driver", "dataset"):
        raise ValueError(f"engine must be auto|driver|dataset, got {engine!r}")
    wc = word_counts(docs, text_col, num_buckets).materialize()
    n_words = wc.count()
    if engine == "driver" or (engine == "auto" and n_words <= driver_max_words):
        df = wc.to_pandas()
        return train_bpe_local(
            dict(zip(df["word"], df["n"].astype(int))), num_merges, min_count
        )

    # dataset engine: word table stays distributed
    def to_syms(b: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "word": pa.array(b["word"].tolist(), pa.string()),
                "syms": pa.array(
                    [_symbolize(w) for w in b["word"]], pa.list_(pa.string())
                ),
                "n": pa.array(b["n"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    table = wc.map_batches(to_syms, batch_format="pandas").materialize()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):

        def pair_partial(b: pd.DataFrame) -> pa.Table:
            acc: dict[tuple[str, str], int] = {}
            for syms, n in zip(b["syms"], b["n"]):
                for p, k in _pair_stats(list(syms)).items():
                    acc[p] = acc.get(p, 0) + k * int(n)
            la = [p[0] for p in acc]
            lb = [p[1] for p in acc]
            return pa.table(
                {
                    "a": pa.array(la, pa.string()),
                    "b": pa.array(lb, pa.string()),
                    "c": pa.array(list(acc.values()), pa.int64()),
                }
            )

        stats = grouped_reduce(
            table.map_batches(pair_partial, batch_format="pandas"),
            ["a", "b"], {"c": ("c", "sum")},
            num_buckets=num_buckets,
        )

        # block-local top-1 under the global order → driver collects
        # ≤ one row per block, never the distinct-pair table
        def top1(b: pd.DataFrame) -> pd.DataFrame:
            return b.sort_values(
                ["c", "a", "b"], ascending=[False, True, True]
            ).head(1)

        cand = stats.map_batches(top1, batch_format="pandas").to_pandas()
        if cand.empty:
            break
        cand = cand.sort_values(["c", "a", "b"], ascending=[False, True, True])
        best_c = int(cand["c"].iloc[0])
        if best_c < min_count:
            break
        a, b = str(cand["a"].iloc[0]), str(cand["b"].iloc[0])
        merges.append((a, b))
        pair_ref = ray.put((a, b))

        def apply(batch: pd.DataFrame, _ref=pair_ref) -> pa.Table:
            ma, mb = ray.get(_ref)
            out = []
            for syms in batch["syms"]:
                s = list(syms)
                out.append(_merge_syms(s, ma, mb) if ma in s else s)
            return pa.table(
                {
                    "word": pa.array(batch["word"].tolist(), pa.string()),
                    "syms": pa.array(out, pa.list_(pa.string())),
                    "n": pa.array(batch["n"].to_numpy(dtype=np.int64), pa.int64()),
                }
            )

        table = (
            table.map_batches(apply, batch_format="pandas")
            .repartition(repartition_blocks)
            .materialize()
        )
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank BPE segmentation of one word (the standard
    GPT-2-style encode): repeatedly merge the present pair with the
    SMALLEST merge rank until none applies."""
    syms = _symbolize(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = _merge_syms(syms, *best_pair)
    return syms


def bpe_token_counts(
    docs: rd.Dataset,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """(id, n_tokens) under the TRAINED tokenizer — one merge-table
    broadcast (bounded: num_merges rows), one streaming pass; encode
    runs once per DISTINCT word per batch through a per-worker memo
    cache, then counts map back to occurrences vectorically."""
    from ..state.worker_state import get_worker_state, ref_key

    mref = ray.put({p: i for i, p in enumerate(merges)})

    def count(b: pd.DataFrame) -> pa.Table:
        ranks = get_worker_state(("bpe-ranks", ref_key(mref)), lambda: ray.get(mref))
        cache: dict = get_worker_state(("bpe-encode-cache", ref_key(mref)), dict)
        flat = (
            b[text_col].fillna("").str.lower().reset_index(drop=True)
            .str.split().explode().dropna()
        )
        pos = flat.index.to_numpy(dtype=np.int64)
        lens = np.zeros(len(flat), dtype=np.int64)
        if len(flat):
            codes, uniq = pd.factorize(flat.to_numpy())
            per_word = np.empty(len(uniq), dtype=np.int64)
            for i, w in enumerate(uniq):
                L = cache.get(w)
                if L is None:
                    L = len(encode_word(w, ranks))
                    cache[w] = L
                per_word[i] = L
            lens = per_word[codes]
        totals = np.zeros(len(b), dtype=np.int64)
        np.add.at(totals, pos, lens)
        return pa.table(
            {
                id_col: pa.array(b[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "n_tokens": pa.array(totals, pa.int64()),
            }
        )

    return docs.map_batches(count, batch_format="pandas")


def corpus_alphabet(docs: rd.Dataset, text_col: str = "text") -> list[str]:
    """Sorted distinct characters of the lowercased corpus words — one
    map-only pass (per-batch set union, driver unions ≤ blocks sets of
    ≤ alphabet size; bounded by Unicode, not corpus)."""
    def chars(b: pd.DataFrame) -> pa.Table:
        s = set()
        for t in b[text_col].fillna(""):
            for w in t.lower().split():
                s.update(w)
        return pa.table({"ch": pa.array(sorted(s), pa.string())})

    out = docs.map_batches(chars, batch_format="pandas").to_pandas()
    return sorted(set(out["ch"]))


def bpe_vocab(merges: list[tuple[str, str]], alphabet: list[str]) -> dict[str, int]:
    """Deterministic symbol→id table: the sorted base alphabet, then
    ``EOW``, then one new symbol per merge in rank order (duplicate
    merge outputs keep their FIRST id).  Mirrors how GPT-2/SentencePiece
    derive ids from the merge list."""
    vocab: dict[str, int] = {}
    for ch in sorted(set(alphabet)):
        vocab.setdefault(ch, len(vocab))
    vocab.setdefault(EOW, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def bpe_encode(
    docs: rd.Dataset,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_id: int = -1,
) -> rd.Dataset:
    """Tokenize the corpus to id sequences — the pretraining step
    between tokenizer training and packing: ``(id, token_ids:
    list<int32>, n_tokens)`` per document.

    One bounded broadcast (merge ranks + vocab), one streaming pass;
    each DISTINCT word per worker encodes once through the per-worker
    memo cache (Zipf makes the cache hit rate ≈ 1), and the id lists
    assemble into one flat buffer + offsets (``ListArray.from_arrays``
    — never a Python list-of-lists column).  Symbols outside ``vocab``
    (characters unseen at train time) emit ``unk_id``."""
    from ..state.worker_state import get_worker_state, ref_key

    mref = ray.put(({p: i for i, p in enumerate(merges)}, dict(vocab)))

    def encode(b: pd.DataFrame) -> pa.Table:
        ranks, voc = get_worker_state(
            ("bpe-enc-model", ref_key(mref)), lambda: ray.get(mref)
        )
        cache: dict = get_worker_state(("bpe-enc-cache", ref_key(mref)), dict)

        per_doc: list[np.ndarray] = []
        for t in b[text_col].fillna(""):
            ids: list[int] = []
            for w in t.lower().split():
                got = cache.get(w)
                if got is None:
                    got = np.array(
                        [voc.get(s, unk_id) for s in encode_word(w, ranks)],
                        dtype=np.int32,
                    )
                    cache[w] = got
                ids.append(got)
            per_doc.append(
                np.concatenate(ids) if ids else np.empty(0, np.int32)
            )

        lens = np.fromiter((len(x) for x in per_doc), np.int64, len(per_doc))
        offsets = np.zeros(len(per_doc) + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        flat = (
            np.concatenate(per_doc) if per_doc else np.empty(0, np.int32)
        )
        col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.int32())
        )
        return pa.table(
            {
                id_col: pa.array(b[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "token_ids": col,
                "n_tokens": pa.array(lens, pa.int64()),
            }
        )

    return docs.map_batches(encode, batch_format="pandas")
