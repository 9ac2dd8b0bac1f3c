"""Deduplication operators over a documents table — exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale shapes (ray_guide patterns):
  * exact: content-hash inside ``map_batches`` (combiner) → groupby(hash)
    keep-min — one hash-partition shuffle on the digest, never on text.
  * MinHash-LSH: shingle→minhash per batch (numpy, vectorized over
    permutations) → explode to (band, band_hash, doc_id) rows →
    groupby band bucket → candidate pairs → exact-Jaccard verify
    (fully distributed: pair/doc co-location by union+groupby, no
    driver-side text dict) → components via driver union-find for
    small pair sets, min-label propagation above a threshold.
  * SimHash: 64-bit signature per doc → 4×16-bit band buckets →
    Hamming-verify within bucket.

All stages stream; only bucket groupbys shuffle, and their keys are
uniform hashes (no skew).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

# ASCII-only \s (re.ASCII) so the pandas-side normalization agrees with
# _norm_arrow (RE2) and the DuckDB oracles — Python's unicode \s would
# collapse NBSP etc. that the Arrow/SQL side keeps, making exact-dedup
# and near-dup stages disagree on identity (code-review r4)
_WS = re.compile(r"\s+", re.ASCII)

_MERSENNE = (1 << 61) - 1


def _norm_text(s: pd.Series) -> pd.Series:
    return s.fillna("").str.strip().str.lower().str.replace(_WS, " ", regex=True)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _norm_arrow(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Arrow-native trim+lower+whitespace-collapse (re2 kernels — no
    Python loop, no pandas conversion of the wide string block)."""
    import pyarrow.compute as pc

    filled = pc.coalesce(col, pa.scalar("", pa.string()))
    return pc.replace_substring_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(filled)), pattern=r"\s+", replacement=" "
    )


def exact_dedup(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_text: bool = False,
) -> rd.Dataset:
    """One representative (min id) per distinct normalized text.

    ``keep_text=True`` returns (id, original text) instead of ids only —
    the payload-preserving flavor a downstream pipeline stage needs.
    Wire cost is the same class either way (one text-sized column
    crosses the digest shuffle: ``norm_text`` in the id-only flavor,
    the original in the keeping one; collision regrouping re-normalizes
    in-group with the SAME Arrow kernels, so both flavors keep
    identical survivors)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        norm = _norm_arrow(batch[text_col])
        # vectorized 64-bit digest as the shuffle key (collisions are
        # resolved by the regroup on the actual text below)
        h = pd.util.hash_pandas_object(
            pd.Series(norm.to_pandas()), index=False
        ).to_numpy(dtype=np.uint64)
        # shuffle key is a 64-value BUCKET of the digest, not the digest
        # itself: distinct-text cardinality ≈ corpus size, and per-key
        # groups are pathological in ray 2.49 (CLAUDE.md r3); equal
        # texts share a digest, hence a bucket, so correctness is
        # unchanged — the in-bucket regroup below is on the actual text
        cols = {
            id_col: batch[id_col],
            "text_bkt": pa.array((h % np.uint64(64)).astype(np.int64), pa.int64()),
        }
        if keep_text:
            cols[text_col] = batch[text_col]
        else:
            cols["norm_text"] = norm
        return pa.table(cols)

    hashed = docs.map_batches(add_hash, batch_format="pyarrow")

    def keep_min(group: pd.DataFrame) -> pa.Table:
        # one vectorized per-text min over the whole bucket
        if keep_text:
            g = group.assign(
                norm_text=_norm_arrow(pa.array(group[text_col], pa.string())).to_pandas()
            )
            idx = g.groupby("norm_text", sort=True)[id_col].idxmin()
            return pa.Table.from_pandas(
                g.loc[idx, [id_col, text_col]], preserve_index=False
            )
        out = group.groupby("norm_text", sort=True)[id_col].min().reset_index()
        return pa.Table.from_pandas(out[[id_col]], preserve_index=False)

    return hashed.groupby("text_bkt").map_groups(keep_min, batch_format="pandas")


def exact_dedup_keep_best(
    docs: rd.Dataset,
    score_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    descending: bool = True,
) -> rd.Dataset:
    """One representative per distinct normalized text, chosen by a
    QUALITY SCORE (highest wins by default; ties → min id) instead of
    min id — the production dedup semantics when a quality signal
    exists (keep the longest / best-scored member of each duplicate
    cluster, as web-corpus curation does).  Same digest-bucket exchange
    as :func:`exact_dedup` — the score column rides the shuffle, the
    in-bucket survivor pick is one vectorized sort + per-text head.
    Returns (id, score).  SQL mirror: ``row_number() OVER (PARTITION BY
    norm_text ORDER BY score DESC, id) = 1``."""

    def add_hash(batch: pa.Table) -> pa.Table:
        norm = _norm_arrow(batch[text_col])
        h = pd.util.hash_pandas_object(
            pd.Series(norm.to_pandas()), index=False
        ).to_numpy(dtype=np.uint64)
        return pa.table(
            {
                id_col: batch[id_col],
                score_col: batch[score_col],
                "norm_text": norm,
                "text_bkt": pa.array((h % np.uint64(64)).astype(np.int64), pa.int64()),
            }
        )

    hashed = docs.map_batches(add_hash, batch_format="pyarrow")

    def keep_best(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(
            [score_col, id_col], ascending=[not descending, True], kind="mergesort"
        )
        out = g.groupby("norm_text", sort=True).head(1)
        return pa.Table.from_pandas(out[[id_col, score_col]], preserve_index=False)

    return hashed.groupby("text_bkt").map_groups(keep_best, batch_format="pandas")


def leakage_safe_split(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_pct: int = 90,
    val_pct: int = 5,
) -> rd.Dataset:
    """Train/val/test assignment that cannot leak duplicates across
    splits: every member of an exact-duplicate cluster (normalized
    text) gets the split of the cluster's REPRESENTATIVE (min id), via
    the same multiplicative rep-id hash as ``dataset_split`` — a plain
    per-doc hash split would scatter copies of one text across train
    AND test, contaminating held-out evaluation.

    Same digest-bucket exchange as :func:`exact_dedup`; the in-bucket
    pass is one vectorized groupby-transform(min) + hash.  Returns
    (id, rep_id, split).  SQL mirror: ``min(id) OVER (PARTITION BY
    norm_text)`` fed through the established hash-bucket CASE."""

    def add_hash(batch: pa.Table) -> pa.Table:
        norm = _norm_arrow(batch[text_col])
        h = pd.util.hash_pandas_object(
            pd.Series(norm.to_pandas()), index=False
        ).to_numpy(dtype=np.uint64)
        return pa.table(
            {
                id_col: batch[id_col],
                "norm_text": norm,
                "text_bkt": pa.array((h % np.uint64(64)).astype(np.int64), pa.int64()),
            }
        )

    hashed = docs.map_batches(add_hash, batch_format="pyarrow")

    def assign(group: pd.DataFrame) -> pa.Table:
        from .datapipe import id_hash_bucket

        rep = group.groupby("norm_text", sort=False)[id_col].transform("min")
        hb = id_hash_bucket(rep)
        split = np.where(
            hb < train_pct, "train", np.where(hb < train_pct + val_pct, "val", "test")
        )
        return pa.table(
            {
                id_col: pa.array(group[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "rep_id": pa.array(rep.to_numpy(dtype=np.int64), pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return hashed.groupby("text_bkt").map_groups(assign, batch_format="pandas")


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

def _word_ngrams(text: str, n: int = 3) -> set[int]:
    toks = text.split()
    if len(toks) < n:
        return {zlib.crc32(" ".join(toks).encode())} if toks else set()
    return {
        zlib.crc32(" ".join(toks[i : i + n]).encode()) for i in range(len(toks) - n + 1)
    }


class MinHasher:
    """Seeded universal-hash MinHash (num_perms signatures)."""

    def __init__(self, num_perms: int = 64, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perms, dtype=np.int64)
        self.b = rng.randint(0, _MERSENNE, size=num_perms, dtype=np.int64)
        self.num_perms = num_perms

    def signature(self, shingles: set[int]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perms, _MERSENNE, dtype=np.int64)
        h = np.fromiter(shingles, dtype=np.int64, count=len(shingles))
        # (P, S) universal hashes, min over shingles per permutation
        vals = (np.outer(self.a, h) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)


def minhash_bands(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
) -> rd.Dataset:
    """documents → exploded (band, band_hash, doc_id) rows (LSH keys).

    The permutation minima are computed for the WHOLE batch in one
    ``(P, S_total)`` universal-hash matrix + ``np.minimum.reduceat``
    over per-doc shingle segments — bit-identical to the per-doc
    :meth:`MinHasher.signature` (same constants, same math) without
    4096 tiny numpy calls per batch.  Shingling (string n-grams +
    crc32) stays a per-doc loop: it is C-bound string work."""
    rows_per_band = num_perms // bands

    def band_stage(batch: pd.DataFrame) -> pd.DataFrame:
        from ..state.worker_state import get_worker_state

        hasher = get_worker_state(
            ("minhash", num_perms, seed), lambda: MinHasher(num_perms, seed)
        )
        texts = _norm_text(batch[text_col]).reset_index(drop=True)
        ids = batch[id_col].reset_index(drop=True)
        n = len(texts)
        all_hashes: list[int] = []
        offsets = np.empty(n + 1, dtype=np.int64)
        offsets[0] = 0
        for i, text in enumerate(texts):
            all_hashes.extend(_word_ngrams(text, ngram))
            offsets[i + 1] = len(all_hashes)
        sigs = np.full((n, num_perms), _MERSENNE, dtype=np.int64)
        nonempty = offsets[1:] > offsets[:-1]
        if all_hashes:
            h = np.fromiter(all_hashes, dtype=np.int64, count=len(all_hashes))
            vals = (hasher.a[:, None] * h[None, :] + hasher.b[:, None]) % _MERSENNE
            # empty docs contribute no elements, so the nonempty starts
            # partition the concatenated hash array exactly
            sigs[nonempty] = np.minimum.reduceat(
                vals, offsets[:-1][nonempty], axis=1
            ).T
        # zero-shingle (empty/whitespace) docs all share the all-sentinel
        # signature — emitting their band rows floods one degenerate
        # bucket per band with junk pairs that verify must reject and
        # drowns the truncation counters (code-review r4); skip them
        keep = np.flatnonzero(nonempty)
        nk = len(keep)
        band_ids = np.tile(np.arange(bands, dtype=np.int64), nk)
        band_hashes = np.empty(nk * bands, dtype=np.int64)
        for j, i in enumerate(keep):
            row = sigs[i]
            for b in range(bands):
                band_hashes[j * bands + b] = zlib.crc32(
                    row[b * rows_per_band : (b + 1) * rows_per_band].tobytes()
                )
        return pd.DataFrame(
            {
                "band": band_ids,
                "band_hash": band_hashes,
                id_col: np.repeat(ids.to_numpy()[keep], bands),
            }
        )

    return docs.map_batches(band_stage, batch_format="pandas")


class TruncationCounter:
    """Tiny zero-CPU actor aggregating LSH bucket truncations across the
    candidate-pair tasks — the observability VERDICT r2 #6 asked for (a
    silent recall cap reads as 'covered everything' when it didn't).
    Plain class; instantiate as an actor via
    ``ray.remote(TruncationCounter).options(num_cpus=0).remote()``."""

    def __init__(self):
        self.buckets = 0
        self.dropped_pairs = 0

    def add(self, buckets: int, dropped_pairs: int) -> None:
        self.buckets += buckets
        self.dropped_pairs += dropped_pairs

    def get(self) -> dict:
        return {"truncated_buckets": self.buckets, "dropped_pairs": self.dropped_pairs}


def minhash_candidate_pairs(
    bands_ds: rd.Dataset,
    id_col: str = "doc_id",
    dedup: bool = True,
    max_bucket: int = 200,
    trunc_counter=None,
) -> rd.Dataset:
    """LSH buckets → candidate pairs (a < b).

    ``dedup=False`` skips the cross-band pair-dedup groupby (one whole
    all-to-all) — correct whenever the consumer re-keys by (a, b)
    anyway, as :func:`jaccard_verify` does.

    ``max_bucket`` bounds the quadratic pair expansion of a degenerate
    bucket (a band key shared corpus-wide on near-uniform text) to its
    first ``max_bucket`` ids by sort order — a RECALL CAP.  Truncations
    are counted on ``trunc_counter`` (a :class:`TruncationCounter`
    actor handle) when one is passed; counts are final once the
    consuming pipeline has materialized (the rare-path ``add`` is
    awaited inside the task)."""

    # the exchange groups on a 64-value hash of (band, band_hash) — one
    # Ray group per LSH bucket is pathological at corpus scale (most
    # buckets are singletons; CLAUDE.md r3 per-group cost).  The pair
    # expansion loops over the bucket's (band, band_hash) segments with
    # list-append bodies (segments are ≤ max_bucket by construction).
    def tag_gb(b: pd.DataFrame) -> pa.Table:
        out = b.copy()
        out["__lh_gb"] = (
            pd.util.hash_pandas_object(
                b[["band", "band_hash"]], index=False
            ).to_numpy()
            % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a: list = []
        out_b: list = []
        truncs = 0
        dropped = 0
        gvals = group[id_col].to_numpy()
        for _, idx in group.groupby(["band", "band_hash"], sort=False).indices.items():
            ids = sorted(set(gvals[idx]))
            n = len(ids)
            if n < 2:
                continue
            if n > max_bucket:
                truncs += 1
                dropped += n * (n - 1) // 2 - max_bucket * (max_bucket - 1) // 2
            for i in range(min(n, max_bucket)):
                for j in range(i + 1, min(n, max_bucket)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        if truncs and trunc_counter is not None:
            import ray

            # block (rare path): guarantees the count is visible as soon
            # as the dataset has executed, no fire-and-forget race
            ray.get(trunc_counter.add.remote(truncs, dropped))
        if not out_a:
            # dtype-preserving empty (an untyped {} empty becomes float64
            # and breaks schema unification in downstream hash joins)
            empty = group[id_col].iloc[:0]
            return pd.DataFrame({"a": empty, "b": empty})
        return pd.DataFrame({"a": out_a, "b": out_b})

    cand = bands_ds.map_batches(
        tag_gb, batch_format="pandas", batch_size=65536
    ).groupby("__lh_gb").map_groups(pairs, batch_format="pandas")
    if not dedup:
        return cand
    # dedup pairs found in multiple bands — bucketed distinct, not a
    # per-pair map_groups (pair cardinality scales with the corpus)
    from .agg import bucketed_distinct

    return bucketed_distinct(cand, ["a", "b"])


def char_ngrams(text: str, k: int = 5) -> set[str]:
    """Distinct character k-grams as STRINGS (no hashing — exact-set
    semantics, so Jaccard over them is SQL-replicable to the bit)."""
    if len(text) < k:
        return set()
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def jaccard_verify(
    pairs: rd.Dataset,
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    ngram: int = 3,
    broadcast_below: int = 100_000,
    gram_fn=None,
) -> rd.Dataset:
    """Exact n-gram Jaccard for candidate pairs, fully distributed:
    neither the corpus nor the pair set ever materializes on the driver
    (above ``broadcast_below`` docs).

    Scale shape: each pair explodes to two (a, b, jv_doc) rows; the doc
    texts are attached by CO-LOCATION — union the exploded pair rows
    with the tagged doc rows and group by ``jv_doc`` (one sort shuffle
    on a uniform key), each group copying its single text onto its pair
    rows; a second groupby on the pair key reunites the two sides and
    verifies.  ``ds.join`` is deliberately avoided: Ray 2.49's hash
    join loses the schema of empty partitions (ArrowInvalid FieldRef on
    small/skewed inputs), and the sort-shuffle groupby is this repo's
    proven exchange (CLAUDE.md).

    Small-corpus fast path (same routing philosophy as
    ``minhash_dedup``'s union-find threshold): when the corpus holds ≤
    ``broadcast_below`` docs — a metadata-cheap ``count()`` — the texts
    are broadcast once via ``ray.put`` and verification is a single
    streaming map over the pairs, saving both sort shuffles.

    ``gram_fn`` overrides the shingling (default: crc32-hashed word
    ``ngram``-grams); pass e.g. ``lambda t: char_ngrams(t, 5)`` for
    exact string-set semantics (:func:`ngram_jaccard_pairs`)."""
    gf = gram_fn or (lambda t: _word_ngrams(t, ngram))
    if broadcast_below and docs.count() <= broadcast_below:
        return _jaccard_verify_broadcast(pairs, docs, id_col, text_col, threshold, gf)

    # both exchanges group on a 64-value HASH BUCKET (doc bucket for the
    # attach, pair bucket for the verify) — per-doc / per-pair Ray
    # groups are pathological at corpus cardinality (CLAUDE.md r3); the
    # in-bucket attach is ONE vectorized merge, the in-bucket verify a
    # local loop over its pairs (set-Jaccard is irreducibly per-pair)
    NB = np.uint64(64)

    def _bkt(v) -> np.ndarray:
        return (
            pd.util.hash_pandas_object(v, index=False).to_numpy() % NB
        ).astype(np.int64)

    def tag_docs(b: pd.DataFrame) -> pa.Table:
        ids = b[id_col]
        return pa.table(
            {
                "jv_doc": ids.to_numpy(),
                "a": ids.to_numpy(),  # placeholders, dtype-consistent
                "b": ids.to_numpy(),
                "jv_text": pa.array(_norm_text(b[text_col]), pa.string()),
                "is_text": np.ones(len(b), dtype=bool),
                "_jvb": _bkt(ids),
            }
        )

    def explode_pairs(b: pd.DataFrame) -> pa.Table:
        two_a = pd.concat([b["a"], b["a"]], ignore_index=True)
        two_b = pd.concat([b["b"], b["b"]], ignore_index=True)
        jv_doc = pd.concat([b["a"], b["b"]], ignore_index=True)
        n = len(two_a)
        return pa.table(
            {
                "jv_doc": jv_doc.to_numpy(),
                "a": two_a.to_numpy(),
                "b": two_b.to_numpy(),
                "jv_text": pa.array([""] * n, pa.string()),
                "is_text": np.zeros(n, dtype=bool),
                "_jvb": _bkt(jv_doc),
            }
        )

    def attach(group: pd.DataFrame) -> pa.Table:
        is_t = group["is_text"].to_numpy()
        texts_rows = group.loc[is_t, ["jv_doc", "jv_text"]].drop_duplicates("jv_doc")
        # duplicate pair rows (same pair surfacing from several LSH
        # bands, when the producer skipped its dedup groupby) collapse
        # here — one text-attach row per (pair, side)
        pair_rows = group.loc[~is_t, ["a", "b", "jv_doc"]].drop_duplicates()
        out = pair_rows.merge(texts_rows, on="jv_doc", how="inner")
        out["_pb"] = _bkt(out[["a", "b"]])
        return pa.Table.from_pandas(
            out[["a", "b", "jv_doc", "jv_text", "_pb"]], preserve_index=False
        )

    sides = pairs.map_batches(explode_pairs, batch_format="pandas", batch_size=65536)
    texts = docs.map_batches(tag_docs, batch_format="pandas", batch_size=65536)
    joined = texts.union(sides).groupby("_jvb").map_groups(
        attach, batch_format="pandas"
    )

    def verify(group: pd.DataFrame) -> pa.Table:
        keep_a, keep_b, sims = [], [], []
        for (a, b), sub in group.groupby(["a", "b"], sort=False):
            if len(sub) != 2:  # a side's doc was missing from the corpus
                continue
            by_doc = dict(zip(sub["jv_doc"], sub["jv_text"]))
            sa = gf(by_doc.get(a, ""))
            sb = gf(by_doc.get(b, ""))
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                sims.append(round(j, 6))
        return pa.table(
            {
                "a": np.asarray(keep_a, dtype=group["a"].dtype),
                "b": np.asarray(keep_b, dtype=group["b"].dtype),
                "jaccard": np.asarray(sims, dtype=np.float64),
            }
        )

    return joined.groupby("_pb").map_groups(verify, batch_format="pandas")


def _jaccard_verify_broadcast(
    pairs: rd.Dataset,
    docs: rd.Dataset,
    id_col: str,
    text_col: str,
    threshold: float,
    gf,
) -> rd.Dataset:
    """Small-corpus verify: normalized texts collected once
    (``to_pandas``, NOT per-row take_all), broadcast via ``ray.put``,
    pairs verified in one streaming map (dedup across LSH bands handled
    inline)."""
    import ray

    tx_df = docs.map_batches(
        lambda b: pd.DataFrame({id_col: b[id_col], "t": _norm_text(b[text_col])}),
        batch_format="pandas",
    ).to_pandas()
    texts_ref = ray.put(dict(zip(tx_df[id_col], tx_df["t"])))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        from ..state.worker_state import get_worker_state, ref_key

        tx = get_worker_state(("jacc-texts", ref_key(texts_ref)), lambda: ray.get(texts_ref))
        batch = batch.drop_duplicates(subset=["a", "b"])
        # per-batch gram-set memo: near-dup CLUSTERS repeat the same doc
        # across many pairs — recomputing its gram set per pair made the
        # verify 50 s instead of ~3 s on a clustered sf0.1 corpus
        memo: dict = {}

        def grams(doc_id):
            s = memo.get(doc_id)
            if s is None:
                s = memo[doc_id] = gf(tx.get(doc_id, ""))
            return s

        keep_a, keep_b, sims = [], [], []
        for a, b in zip(batch["a"], batch["b"]):
            sa = grams(a)
            sb = grams(b)
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                sims.append(round(j, 6))
        return pd.DataFrame({"a": keep_a, "b": keep_b, "jaccard": sims})

    # cross-band duplicate pairs may straddle batch boundaries — the
    # in-batch drop_duplicates is an optimization, the distinct the truth
    from .agg import bucketed_distinct

    return bucketed_distinct(
        pairs.map_batches(verify, batch_format="pandas"), ["a", "b"]
    )


def ngram_jaccard_pairs(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_df: int = 20,
    threshold: float = 0.5,
    broadcast_below: int = 100_000,
) -> rd.Dataset:
    """EXACT character-``k``-gram Jaccard near-dup pairs — the
    deterministic, SQL-replicable flavor (vs MinHash's probabilistic
    recall).  Returns (a, b, jaccard) with a < b and jaccard ≥
    ``threshold`` computed over the FULL distinct-gram sets of the
    normalized texts.

    Shape: (1) explode each doc's distinct char grams to
    (gram_hash, doc_id) rows — the inverted index; (2) one groupby on
    the 64-bit gram hash; groups with 2 ≤ df ≤ ``max_df`` emit their
    id pairs (the df cap bounds the quadratic blowup of stop-grams AND
    is part of the semantics: pairs sharing only corpus-common grams
    are by definition not near-dups); (3) exact verify via
    :func:`jaccard_verify` with string-set ``char_ngrams`` (re-keys by
    (a, b), so cross-gram duplicate candidates collapse there).

    Scale note: the exploded index is O(total chars) rows — this is the
    exact-recall flavor for refined corpora; use ``minhash_dedup`` when
    a probabilistic candidate pass must cut the exchange first.  Gram
    hashes are 64-bit (collisions ~1e-10 at 1e5 grams; a collision can
    only add a candidate the verify rejects, or — vanishingly — inflate
    one df past the cap)."""

    # gram-hash cardinality ≈ corpus size: exchange on hash(gh) % 64
    # buckets with Arrow partials, NEVER one Ray group per distinct gram
    # (per-key map_groups + pandas blocks into the sort-shuffle are the
    # two measured CLAUDE.md r3 pathologies; code-review r4).  Grams are
    # emitted DISTINCT per doc so the exchange ships each (gram, doc)
    # once.
    NB = np.int64(64)

    def explode(batch: pd.DataFrame) -> pa.Table:
        ids = batch[id_col].to_numpy()
        texts = _norm_text(batch[text_col])
        all_grams: list[str] = []
        counts = np.empty(len(ids), dtype=np.int64)
        for i, t in enumerate(texts):
            gs = set(char_ngrams(t, k))
            all_grams.extend(gs)
            counts[i] = len(gs)
        gh = (
            pd.util.hash_pandas_object(pd.Series(all_grams, dtype="object"), index=False)
            .to_numpy(dtype=np.uint64)
            .view(np.int64)
        )
        return pa.table(
            {
                "gh": gh,
                id_col: np.repeat(ids, counts),
                "__njb": gh % NB,
            }
        )

    def pairs_bucket(group: pd.DataFrame) -> pa.Table:
        group = group.sort_values(["gh", id_col], kind="mergesort")
        ghs = group["gh"].to_numpy()
        ids_all = group[id_col].to_numpy()
        bounds = np.r_[0, np.flatnonzero(ghs[1:] != ghs[:-1]) + 1, len(ghs)]
        out_a, out_b = [], []
        for s, t in zip(bounds[:-1], bounds[1:]):
            n = t - s
            if n < 2 or n > max_df:
                continue
            ids = ids_all[s:t]  # distinct per gram by construction, sorted
            ii, jj = np.triu_indices(n, k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        if not out_a:
            e = np.empty(0, dtype=ids_all.dtype)
            return pa.table({"a": e, "b": e})
        return pa.table(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    cand = (
        docs.map_batches(explode, batch_format="pandas")
        .groupby("__njb")
        .map_groups(pairs_bucket, batch_format="pandas")
    )
    return jaccard_verify(
        cand,
        docs,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        broadcast_below=broadcast_below,
        gram_fn=lambda t: char_ngrams(t, k),
    )


def repeated_ngrams(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 40,
    min_docs: int = 2,
    hash_only: bool = False,
    num_buckets: int = 64,
    batch_size: int = 4096,
) -> rd.Dataset:
    """Cross-document repeated substring detection — every exact
    character ``k``-gram that occurs in ≥ ``min_docs`` DISTINCT
    documents, the building block of exact substring deduplication
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", arXiv:2107.06499 — their 50-token ExactSubstr
    windows, here over chars so the SQL mirror is plain ``substr``).

    Returns (gram, n_docs, min_doc).  Raw text, raw positions — no
    normalization, so a surviving gram locates a literal span to mask.

    Shape: per-doc distinct-gram explode (each doc lives in exactly one
    batch row, so (gram, doc) pairs are already globally distinct — no
    dedup exchange needed) → :func:`~.agg.grouped_reduce` on the gram
    (64-value bucket exchange, vectorized in-bucket count/min) → an
    Arrow filter on ``n_docs``.

    Scale path: with ``hash_only=True`` the exchange carries a 64-bit
    gram hash instead of the k-char string (~k× fewer shuffle bytes;
    output column ``gram_hash``) — resolve surviving hashes back to
    spans with one further pruned scan.  Collisions at 64 bits can only
    merge two grams (~1e-9 at 1e5 distinct grams), never drop one."""
    from .agg import grouped_reduce

    def explode(b: pd.DataFrame) -> pa.Table:
        ids: list[int] = []
        grams: list[str] = []
        for doc_id, text in zip(b[id_col], b[text_col].fillna("")):
            gs = {text[i : i + k] for i in range(len(text) - k + 1)}
            grams.extend(gs)
            ids.extend([doc_id] * len(gs))
        out = pd.DataFrame({id_col: np.asarray(ids, dtype=np.int64)})
        if hash_only:
            out["gram_hash"] = (
                pd.util.hash_pandas_object(
                    pd.Series(grams, dtype="object"), index=False
                )
                .to_numpy(dtype=np.uint64)
                .view(np.int64)
            )
        else:
            out["gram"] = pd.Series(grams, dtype="object")
        return pa.Table.from_pandas(out, preserve_index=False)

    gram_col = "gram_hash" if hash_only else "gram"
    counts = grouped_reduce(
        docs.map_batches(explode, batch_format="pandas", batch_size=batch_size),
        [gram_col],
        {"n_docs": (None, "count"), "min_doc": (id_col, "min")},
        num_buckets=num_buckets,
    )
    import pyarrow.compute as pc

    return counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], pa.scalar(min_docs))),
        batch_format="pyarrow",
    )


def _window_hashes_batch(
    texts: list[str], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """64-bit hashes of every char k-gram window for a WHOLE BATCH of
    texts — one pandas hash call total (a per-document Series
    construction + hash was measured 133 s over 5k docs; this shape is
    ~3 s).  Hashing is identical to ``hash_only`` in
    :func:`repeated_ngrams`, so the passes agree.  Returns (hashes,
    windows-per-doc counts); split doc d's hashes via the count
    prefix sums."""
    grams: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        n = max(len(t) - k + 1, 0)
        counts[i] = n
        grams.extend(t[j : j + k] for j in range(n))
    if not grams:
        return np.empty(0, dtype=np.int64), counts
    hs = (
        pd.util.hash_pandas_object(pd.Series(grams, dtype="object"), index=False)
        .to_numpy(dtype=np.uint64)
        .view(np.int64)
    )
    return hs, counts


def _merge_spans(positions: np.ndarray, k: int) -> list[tuple[int, int]]:
    """Overlapping/adjacent [p, p+k) windows → disjoint intervals."""
    if len(positions) == 0:
        return []
    positions = np.sort(positions)
    out = []
    start = prev = int(positions[0])
    for p in positions[1:]:
        p = int(p)
        if p <= prev + k:  # overlaps or touches the previous window
            prev = p
        else:
            out.append((start, prev + k))
            start = prev = p
    out.append((start, prev + k))
    return out


def mask_repeated_spans(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 40,
    min_docs: int = 2,
    broadcast_below: int = 5_000_000,
    num_buckets: int = 64,
    batch_size: int = 4096,
) -> rd.Dataset:
    """The ACTION half of exact substring deduplication (Lee et al.
    2022, arXiv:2107.06499): drop every char span covered by a k-gram
    that occurs in ≥ ``min_docs`` distinct documents — except in the
    gram's FIRST document (min doc id), which keeps its copy.
    Overlapping masked windows merge into maximal spans before
    rewriting, so repeated passages are excised once, cleanly.

    Returns (id, text, n_spans, n_dropped_chars) for EVERY document
    (untouched docs pass through with 0/0).

    Size-gated like stages/decontam.py:

    * **broadcast** (≤ ``broadcast_below`` surviving repeated grams):
      the {gram_hash → min_doc} map ships once via ``ray.put``; ONE
      further streaming pass recomputes each doc's window hashes,
      masks, and rewrites — zero extra shuffle.
    * **co-location** (huge survivor sets): window (doc, pos, hash)
      rows and survivor rows co-locate on ``hash % num_buckets`` to
      emit (doc, pos) hits; hits then co-locate with the original texts
      on ``doc % num_buckets`` for the rewrite — two more exchanges,
      corpus text crossing the wire once.

    Both paths are pytest-pinned identical.  Detection reuses
    :func:`repeated_ngrams` with ``hash_only=True`` (the k× cheaper
    exchange); a 64-bit collision can only merge two grams — the worst
    case is masking a span that occurred once (rate ~1e-9)."""
    import ray

    from ..state.worker_state import get_worker_state, ref_key

    survivors = repeated_ngrams(
        docs, id_col=id_col, text_col=text_col, k=k, min_docs=min_docs,
        hash_only=True, num_buckets=num_buckets, batch_size=batch_size,
    ).materialize()

    def rewrite_one(text: str, hit_pos: np.ndarray) -> tuple[str, int, int]:
        spans = _merge_spans(hit_pos, k)
        if not spans:
            return text, 0, 0
        parts, last = [], 0
        dropped = 0
        for s, t in spans:
            parts.append(text[last:s])
            dropped += t - s
            last = t
        parts.append(text[last:])
        return "".join(parts), len(spans), dropped

    if broadcast_below and survivors.count() <= broadcast_below:
        sdf = survivors.to_pandas()
        gmap_ref = ray.put(dict(zip(sdf["gram_hash"], sdf["min_doc"])))

        def mask_batch(b: pd.DataFrame) -> pa.Table:
            gmap = get_worker_state(
                ("mask_spans", ref_key(gmap_ref)), lambda: ray.get(gmap_ref)
            )
            texts = b[text_col].fillna("").tolist()
            ids = b[id_col].to_numpy(dtype=np.int64)
            hs, counts = _window_hashes_batch(texts, k)
            offsets = np.r_[0, np.cumsum(counts)]
            # keep owner ids on an object path: int64 ids must not round-
            # trip through the float64 that fillna/NaN would force
            owners = pd.Series(hs).map(gmap).to_numpy()
            doc_of = np.repeat(ids, counts)
            notna = ~pd.isna(owners)
            ow_int = np.zeros(len(hs), dtype=np.int64)
            if notna.any():
                ow_int[notna] = owners[notna].astype(np.int64)
            hit = notna & (ow_int != doc_of)
            pos_global = np.arange(len(hs), dtype=np.int64) - np.repeat(
                offsets[:-1], counts
            )
            out_t, n_spans, n_drop = [], [], []
            for i, text in enumerate(texts):
                s, t = offsets[i], offsets[i + 1]
                new_text, ns, nd = rewrite_one(text, pos_global[s:t][hit[s:t]])
                out_t.append(new_text)
                n_spans.append(ns)
                n_drop.append(nd)
            return pa.table(
                {
                    id_col: pa.array(ids),
                    text_col: pa.array(out_t, pa.string()),
                    "n_spans": pa.array(np.asarray(n_spans, dtype=np.int64)),
                    "n_dropped_chars": pa.array(np.asarray(n_drop, dtype=np.int64)),
                }
            )

        return docs.map_batches(
            mask_batch, batch_format="pandas", batch_size=batch_size
        )

    # ---- co-location path ------------------------------------------------
    NB = np.uint64(num_buckets)

    def win_rows(b: pd.DataFrame) -> pa.Table:
        texts = b[text_col].fillna("").tolist()
        ids = b[id_col].to_numpy(dtype=np.int64)
        h, counts = _window_hashes_batch(texts, k)
        offsets = np.r_[0, np.cumsum(counts)]
        pos = np.arange(len(h), dtype=np.int64) - np.repeat(offsets[:-1], counts)
        return pa.table(
            {
                id_col: np.repeat(ids, counts),
                "pos": pos,
                "gram_hash": h,
                "min_doc": np.full(len(h), -1, dtype=np.int64),  # sentinel
                "__ms_bkt": (h.astype(np.uint64) % NB).astype(np.int64),
            }
        )

    def surv_rows(b: pd.DataFrame) -> pa.Table:
        h = b["gram_hash"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                id_col: np.full(len(b), -1, dtype=np.int64),
                "pos": np.full(len(b), -1, dtype=np.int64),
                "gram_hash": h,
                "min_doc": b["min_doc"].to_numpy(dtype=np.int64),
                "__ms_bkt": (h.astype(np.uint64) % NB).astype(np.int64),
            }
        )

    def hits(g: pd.DataFrame) -> pa.Table:
        surv = g[g["min_doc"] >= 0][["gram_hash", "min_doc"]]
        wins = g[g["min_doc"] < 0][[id_col, "pos", "gram_hash"]]
        m = wins.merge(surv, on="gram_hash", how="inner")
        m = m[m[id_col] != m["min_doc"]]
        return pa.table(
            {
                id_col: m[id_col].to_numpy(dtype=np.int64),
                "pos": m["pos"].to_numpy(dtype=np.int64),
            }
        )

    hit_ds = (
        docs.map_batches(win_rows, batch_format="pandas", batch_size=batch_size)
        .union(survivors.map_batches(surv_rows, batch_format="pandas"))
        .groupby("__ms_bkt")
        .map_groups(hits, batch_format="pandas")
    )

    def text_rows(b: pd.DataFrame) -> pa.Table:
        ids = b[id_col].to_numpy(dtype=np.int64)
        return pa.table(
            {
                id_col: ids,
                "pos": np.full(len(b), -1, dtype=np.int64),
                text_col: pa.array(b[text_col].fillna("").tolist(), pa.string()),
                "__mr_bkt": ((ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                             % NB).astype(np.int64),
            }
        )

    def hit_rows(b: pd.DataFrame) -> pa.Table:
        ids = b[id_col].to_numpy(dtype=np.int64)
        return pa.table(
            {
                id_col: ids,
                "pos": b["pos"].to_numpy(dtype=np.int64),
                text_col: pa.array([""] * len(b), pa.string()),
                "__mr_bkt": ((ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                             % NB).astype(np.int64),
            }
        )

    def rewrite_bucket(g: pd.DataFrame) -> pa.Table:
        is_text = g["pos"].to_numpy() == -1
        texts = g[is_text]
        hit = g[~is_text]
        pos_by_doc = {
            d: sub["pos"].to_numpy() for d, sub in hit.groupby(id_col, sort=False)
        }
        ids, out_t, n_spans, n_drop = [], [], [], []
        for doc_id, text in zip(texts[id_col], texts[text_col]):
            new_text, ns, nd = rewrite_one(
                text, pos_by_doc.get(doc_id, np.empty(0, dtype=np.int64))
            )
            ids.append(doc_id)
            out_t.append(new_text)
            n_spans.append(ns)
            n_drop.append(nd)
        return pa.table(
            {
                id_col: pa.array(np.asarray(ids, dtype=np.int64)),
                text_col: pa.array(out_t, pa.string()),
                "n_spans": pa.array(np.asarray(n_spans, dtype=np.int64)),
                "n_dropped_chars": pa.array(np.asarray(n_drop, dtype=np.int64)),
            }
        )

    return (
        docs.map_batches(text_rows, batch_format="pandas", batch_size=batch_size)
        .union(hit_ds.map_batches(hit_rows, batch_format="pandas"))
        .groupby("__mr_bkt")
        .map_groups(rewrite_bucket, batch_format="pandas")
    )


def min_label_components(
    pairs: rd.Dataset, max_iters: int = 12, num_partitions: int = 8
) -> rd.Dataset:
    """Distributed connected components over duplicate pairs (a, b) →
    (doc_id, component) via min-label propagation: each round every node
    takes the min label among itself and its neighbors (groupby-min per
    round, ray_guide pattern).  Converges in ≤ component-diameter
    rounds; ``max_iters`` bounds pathological chains (a 12-deep chain
    of near-duplicates is already degenerate data).  Use when the
    verified-pair set is too large for driver-side union-find.

    The per-round message pass (each src sends its label along its out
    edges) runs as union + groupby("src") co-location — same rationale
    as :func:`jaccard_verify`: Ray 2.49's hash join breaks on empty
    partitions, the sort-shuffle groupby does not.

    Every round's label set is ``repartition(num_partitions)``-ed before
    materializing: the groupby inherits the union's block count (edges +
    labels), so without the rebound the block count — and with it the
    per-round task count and wall time — grows every iteration
    (measured: 1.4 s → 35 s by round 11 on a toy graph; flat 0.4 s with
    the rebound).  Size ``num_partitions`` to the cluster: the labels
    relation is one row per node."""

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"src": b["a"], "dst": b["b"]})
        rev = pd.DataFrame({"src": b["b"], "dst": b["a"]})
        return pd.concat([fwd, rev], ignore_index=True)

    edges = pairs.map_batches(both_dirs, batch_format="pandas").materialize()
    # initial label = node id
    from .agg import grouped_reduce

    labels = (
        grouped_reduce(
            edges.map_batches(
                lambda b: pd.DataFrame({"node": b["src"], "label": b["src"]}),
                batch_format="pandas",
            ),
            ["node"], {"label": ("label", "min")},
        )
        .repartition(num_partitions)
        .materialize()
    )

    NB = np.uint64(64)

    def _sbkt(v: pd.Series) -> np.ndarray:
        return (
            pd.util.hash_pandas_object(v, index=False).to_numpy() % NB
        ).astype(np.int64)

    # arrow out + src-hash bucket: the message-pass exchange groups over
    # 64 bucket values instead of node cardinality, and the in-bucket
    # join runs as ONE vectorized pandas merge (CLAUDE.md r3 —
    # per-key aggregate/map_groups is pathological at node counts)
    def tag_edges(b: pd.DataFrame) -> pa.Table:
        out = {"src": b["src"], "dst": b["dst"], "label": b["src"],
               "is_label": np.zeros(len(b), dtype=bool), "_bkt": _sbkt(b["src"])}
        return pa.table(out)

    def tag_labels(b: pd.DataFrame) -> pa.Table:
        out = {"src": b["node"], "dst": b["node"], "label": b["label"],
               "is_label": np.ones(len(b), dtype=bool), "_bkt": _sbkt(b["node"])}
        return pa.table(out)

    def send(group: pd.DataFrame) -> pa.Table:
        """One BUCKET of source nodes: emit (dst, label(src)) for every
        out edge plus each node's own (node, label) row — so the
        min-label reduce below needs no second union with ``labels`` (a
        materialized dataset consumed twice in one execution graph is
        both wasteful and a flaky-deadlock shape in Ray 2.49's
        streaming executor).  Vectorized: one merge for the whole
        bucket, no per-node Python."""
        is_l = group["is_label"].to_numpy()
        L = group.loc[is_l, ["src", "label"]]
        E = group.loc[~is_l, ["src", "dst"]]
        sent = E.merge(L, on="src", how="inner")
        nodes = pd.concat([sent["dst"], L["src"]], ignore_index=True)
        labs = pd.concat([sent["label"], L["label"]], ignore_index=True)
        return pa.table({"node": nodes.to_numpy(), "label": labs.to_numpy()})

    tagged_edges = (
        edges.map_batches(tag_edges, batch_format="pandas")
        .repartition(num_partitions)
        .materialize()
    )
    prev_sum = labels.sum("label")
    converged = False
    for _ in range(max_iters):
        new_labels = (
            grouped_reduce(
                tagged_edges.union(
                    labels.map_batches(tag_labels, batch_format="pandas")
                )
                .groupby("_bkt")
                .map_groups(send, batch_format="pandas"),
                ["node"], {"label": ("label", "min")},
            )
            .repartition(num_partitions)
            .materialize()
        )
        # convergence: total label sum strictly decreases while changing;
        # carry the previous round's sum instead of re-scanning it
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # a >max_iters-diameter duplicate chain would otherwise be
        # SILENTLY split into multiple components, diverging from the
        # driver union-find path (code-review r4) — make it observable
        import warnings

        warnings.warn(
            f"min_label_components stopped after max_iters={max_iters} "
            "rounds WITHOUT converging: components deeper than max_iters "
            "are split; raise max_iters for chain-shaped duplicate graphs",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.map_batches(
        lambda b: pd.DataFrame({"doc_id": b["node"], "component": b["label"]}),
        batch_format="pandas",
    )


def connected_components(pairs_df: pd.DataFrame) -> pd.DataFrame:
    """Union-find over verified duplicate pairs → (doc_id, component).
    Driver-side is acceptable because the verified-duplicate set is
    orders of magnitude smaller than the corpus; for larger pair sets
    use :func:`min_label_components` (distributed)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame(rows, columns=["doc_id", "component"])


def minhash_dedup(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    distributed_above: int = 200_000,
    max_bucket: int = 200,
    stats: dict | None = None,
) -> rd.Dataset:
    """Full near-dup pipeline → Dataset of (doc_id, component) for docs
    that have a near-duplicate (singleton docs are not listed).

    Components run through driver union-find only while the verified
    pair set is small (≤ ``distributed_above`` pairs); above that the
    distributed :func:`min_label_components` takes over (equivalent
    output, tested).  Either way the RESULT stays a Dataset — one row
    per near-duplicated doc is corpus-cardinality data, so collection
    (``to_pandas``) is the caller's choice, made at the caller's scale
    (the sf-scale query wrappers collect; a 100 TB job writes Parquet).

    Pass ``stats={}`` to receive LSH bucket-truncation observability:
    after the call it holds ``truncated_buckets`` / ``dropped_pairs``
    (the recall cost of the ``max_bucket`` cap); a warning is logged
    when any bucket truncated."""
    import ray

    counter = None
    if stats is not None:
        counter = ray.remote(TruncationCounter).options(num_cpus=0).remote()
    bands = minhash_bands(docs, id_col, text_col)
    # dedup=False: jaccard_verify re-keys by (a, b) anyway, so the
    # cross-band pair-dedup all-to-all is pure overhead here
    cand = minhash_candidate_pairs(
        bands, id_col, dedup=False, max_bucket=max_bucket, trunc_counter=counter
    )
    verified = jaccard_verify(cand, docs, id_col, text_col, threshold).materialize()
    if counter is not None:
        stats.update(ray.get(counter.get.remote()))
        if stats["truncated_buckets"]:
            import logging

            logging.getLogger(__name__).warning(
                "minhash LSH: %d bucket(s) over max_bucket=%d truncated, "
                "%d candidate pair(s) dropped (recall cap)",
                stats["truncated_buckets"],
                max_bucket,
                stats["dropped_pairs"],
            )
    if verified.count() > distributed_above:
        return min_label_components(verified)
    return rd.from_pandas(connected_components(verified.to_pandas()))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text", seed: int = 11
) -> rd.Dataset:
    """64-bit SimHash per document (token-hash bit voting).

    Vectorized: tokens are exploded to one (doc, token) frame, the
    ±1 sign rows are looked up from a per-worker token→signs cache
    (crc32 runs once per *unique* token per worker, not per occurrence),
    and the bit votes accumulate in a single ``np.add.at`` scatter.
    Output is bit-identical to the original per-row formulation."""
    _shifts = np.arange(32)

    def _token_signs(tok: str) -> np.ndarray:
        lo = np.int64(zlib.crc32(tok.encode()))
        hi = np.int64(zlib.crc32(tok[::-1].encode()))
        bits = np.concatenate(((lo >> _shifts) & 1, (hi >> _shifts) & 1))
        return np.where(bits == 1, 1, -1).astype(np.int8)

    _weights = (np.uint64(1) << np.uint64(63 - np.arange(64))).astype(np.uint64)

    def stage(batch: pd.DataFrame) -> pd.DataFrame:
        from ..state.worker_state import get_worker_state

        cache: dict = get_worker_state(("simhash-signs", seed), dict)
        texts = _norm_text(batch[text_col]).reset_index(drop=True)
        n = len(texts)
        votes = np.zeros((n, 64), dtype=np.int64)
        exploded = texts.str.split().explode().dropna()
        if len(exploded):
            pairs = pd.DataFrame(
                {"pos": exploded.index.to_numpy(), "tok": exploded.to_numpy()}
            ).drop_duplicates()  # unique token per doc (set semantics)
            codes, uniques = pd.factorize(pairs["tok"])
            signs = np.empty((len(uniques), 64), dtype=np.int8)
            for i, tok in enumerate(uniques):
                s = cache.get(tok)
                if s is None:
                    s = _token_signs(tok)
                    cache[tok] = s
                signs[i] = s
            np.add.at(votes, pairs["pos"].to_numpy(), signs[codes])
        sig_u = (votes > 0).astype(np.uint64) @ _weights
        signed = (sig_u ^ np.uint64(1 << 63)).view(np.int64)  # == sig - 2**63
        out = pd.DataFrame({id_col: batch[id_col]})
        out["simhash"] = pd.array(signed, dtype="int64")
        return out

    return docs.map_batches(stage, batch_format="pandas")


def simhash_near_pairs(
    sigs: rd.Dataset, id_col: str = "doc_id", max_hamming: int = 3,
    max_bucket: int = 256, bands: int = 4, sig_col: str = "simhash",
) -> rd.Dataset:
    """Band the 64-bit signature into ``bands`` equal keys; by
    pigeonhole any pair within Hamming ≤ bands-1 shares at least one
    band (defaults: 4×16-bit → guarantee ≤ 3; the pHash image path uses
    8×8-bit → guarantee ≤ 7).  ``sig_col`` names the int64 signature
    column (``simhash`` for text SimHash, ``phash`` callers rename).

    ``max_bucket`` caps the per-bucket pair expansion: a band key shared
    by more than ``max_bucket`` docs (a degenerate band on a
    near-uniform corpus) is truncated to its first ``max_bucket`` ids by
    sort order — a documented recall cap that bounds the otherwise
    quadratic blowup.  Raise it (or pre-shard by an extra band) when
    exhaustive recall matters more than latency."""
    if 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    bits = 64 // bands
    band_mask = np.uint64((1 << bits) - 1)

    _POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        s = batch[sig_col].to_numpy(dtype=np.int64)
        u = s.view(np.uint64) ^ np.uint64(1 << 63)  # == s + 2**63
        n = len(ids)
        shifts = np.tile((np.arange(bands) * bits).astype(np.uint64), n)
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(bands, dtype=np.int64), n),
                "key": ((np.repeat(u, bands) >> shifts) & band_mask).astype(
                    np.int64
                ),
                id_col: np.repeat(ids, bands),
                "simhash": np.repeat(s, bands),
            }
        )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(set(zip(group[id_col], group["simhash"])))[:max_bucket]
        if len(recs) < 2:
            return pd.DataFrame(
                {
                    "a": group[id_col].iloc[:0],
                    "b": group[id_col].iloc[:0],
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
        if len(recs) <= 16:
            # tiny buckets (the common case) — plain loop beats numpy
            # setup overhead by a wide margin
            out_a, out_b, dist = [], [], []
            mask64 = (1 << 64) - 1
            for i in range(len(recs)):
                u1 = recs[i][1] & mask64
                for j in range(i + 1, len(recs)):
                    h = bin(u1 ^ (recs[j][1] & mask64)).count("1")
                    if h <= max_hamming:
                        out_a.append(recs[i][0])
                        out_b.append(recs[j][0])
                        dist.append(h)
            return pd.DataFrame(
                {"a": out_a, "b": out_b, "hamming": pd.Series(dist, dtype="int64")}
            )
        ids = np.array([r[0] for r in recs])
        sigs_u = np.array([r[1] for r in recs], dtype=np.int64).view(np.uint64)
        ii, jj = np.triu_indices(len(recs), k=1)
        xor = (sigs_u[ii] ^ sigs_u[jj]).copy()
        # vectorized popcount: per-byte table lookup over the u64 view
        ham = _POP[xor.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"a": ids[ii[keep]], "b": ids[jj[keep]], "hamming": ham[keep]}
        )

    # exchange on a 64-value hash of (band, key) — one Ray group per
    # band bucket is pathological at corpus scale (CLAUDE.md r3); the
    # in-group loop applies the pair logic per (band, key) segment
    def tag_gb(b: pd.DataFrame) -> pa.Table:
        out = b.copy()
        out["__sh_gb"] = (
            pd.util.hash_pandas_object(b[["band", "key"]], index=False).to_numpy()
            % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, idx in group.groupby(["band", "key"], sort=False).indices.items():
            outs.append(pairs(group.iloc[idx]))
        non_empty = [o for o in outs if len(o)]
        if not non_empty:
            return pairs(group.iloc[:0])
        return pd.concat(non_empty, ignore_index=True)

    exploded = sigs.map_batches(explode, batch_format="pandas").map_batches(
        tag_gb, batch_format="pandas", batch_size=65536
    )
    cand = exploded.groupby("__sh_gb").map_groups(bucket_pairs, batch_format="pandas")
    # cross-band pair dedup: bucketed distinct on the pair key
    # (duplicate (a, b) rows carry identical hamming, so which copy
    # survives is immaterial)
    from .agg import bucketed_distinct

    return bucketed_distinct(cand, ["a", "b"])


def cross_corpus_near_dups(
    new_docs: rd.Dataset,
    base_docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perms: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
    max_bucket: int = 200,
    broadcast_below: int = 100_000,
    trunc_counter=None,
) -> rd.Dataset:
    """Incremental near-deduplication: (new_id, base_id, jaccard) pairs
    between an INCOMING batch of documents and an EXISTING corpus — the
    shape every continuously-ingesting pipeline needs (dedup new data
    against what is already in the corpus, never re-pairing the base
    against itself).  Ids across the two datasets must be disjoint
    (offset upstream).

    Both sides run the shared vectorized MinHash band stage (identical
    hasher constants, so a doc pairs with its prior copy with the
    standard LSH recall); candidates come from ONE groupby on
    (band, band_hash) emitting only CROSS-side pairs — |new|×|base|
    within a bucket, never base×base (the base side's quadratic term,
    which dwarfs everything in steady state, is gone by construction).
    Exact verify via :func:`jaccard_verify` over the unioned texts.
    ``max_bucket`` caps degenerate buckets per side; truncations are
    counted on ``trunc_counter`` (a :class:`TruncationCounter` actor
    handle, same contract as :func:`minhash_candidate_pairs`) when one
    is passed — never silent."""
    new_b = minhash_bands(new_docs, id_col, text_col, num_perms, bands, ngram, seed)
    base_b = minhash_bands(base_docs, id_col, text_col, num_perms, bands, ngram, seed)

    def tag(side: int):
        def f(b: pd.DataFrame) -> pa.Table:
            return pa.table(
                {
                    "band": b["band"].to_numpy(dtype=np.int64),
                    "band_hash": b["band_hash"].to_numpy(dtype=np.int64),
                    id_col: b[id_col].to_numpy(dtype=np.int64),
                    "__side": np.full(len(b), side, dtype=np.int64),
                    "__cb": (
                        (b["band"].to_numpy(dtype=np.int64) * np.int64(1_000_003)
                         + b["band_hash"].to_numpy(dtype=np.int64))
                        % np.int64(64)
                    ),
                }
            )
        return f

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        truncs = 0
        dropped = 0
        for _, sub in g.groupby(["band", "band_hash"], sort=False):
            news = np.unique(sub.loc[sub["__side"] == 0, id_col].to_numpy())
            bases = np.unique(sub.loc[sub["__side"] == 1, id_col].to_numpy())
            if len(news) == 0 or len(bases) == 0:
                continue
            if len(news) > max_bucket or len(bases) > max_bucket:
                truncs += 1
                dropped += len(news) * len(bases) - min(
                    len(news), max_bucket
                ) * min(len(bases), max_bucket)
            news = news[:max_bucket]
            bases = bases[:max_bucket]
            out_a.append(np.repeat(news, len(bases)))
            out_b.append(np.tile(bases, len(news)))
        if truncs and trunc_counter is not None:
            import ray

            # block (rare path): count visible as soon as the dataset
            # has executed — same contract as minhash_candidate_pairs
            ray.get(trunc_counter.add.remote(truncs, dropped))
        if not out_a:
            e = np.empty(0, dtype=np.int64)
            return pd.DataFrame({"a": e, "b": e})
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        ).drop_duplicates()

    # wall profile at sf0.1/32cpu: two band passes ~3 s, this groupby
    # ~2.8 s, the verify's exchanges ~3 s — each all-to-all carries
    # ~2.5 s FIXED session overhead at toy scale (amortizes at real
    # input sizes); a pre-exchange repartition was measured a no-op
    cand = (
        new_b.map_batches(tag(0), batch_format="pandas")
        .union(base_b.map_batches(tag(1), batch_format="pandas"))
        .groupby("__cb")
        .map_groups(pairs, batch_format="pandas")
        # groupby output block count caps downstream task parallelism
        # (CLAUDE.md); without this the fused verify ran as 2 tasks
        .repartition(32)
    )
    all_docs = new_docs.select_columns([id_col, text_col]).union(
        base_docs.select_columns([id_col, text_col])
    )
    return jaccard_verify(
        cand, all_docs, id_col=id_col, text_col=text_col,
        threshold=threshold, broadcast_below=broadcast_below,
        gram_fn=lambda t: _word_ngrams(t, ngram),
    )


def cross_corpus_exact_dups(
    new_docs: rd.Dataset,
    base_docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Incremental EXACT dedup: (new_id, base_id) for every incoming
    document whose normalized text already exists in the base corpus
    (base_id = the base side's min-id representative of that text) —
    the exact twin of :func:`cross_corpus_near_dups`, and like it the
    base×base term never materializes: one digest-bucket co-location,
    one vectorized in-bucket merge on the actual normalized text (hash
    collisions cannot produce false pairs).  Both unioned branches emit
    Arrow (mixed block types break downstream batchers, CLAUDE.md r3).

    SQL mirror: inner join on the normalization expression with the
    base side pre-aggregated to min(id) per text."""
    nb = np.uint64(num_buckets)

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            norm = _norm_arrow(batch[text_col])
            h = pd.util.hash_pandas_object(
                pd.Series(norm.to_pandas()), index=False
            ).to_numpy(dtype=np.uint64)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "__xt": norm,
                    "__side": pa.array(
                        np.full(len(batch), side, dtype=np.int64), pa.int64()
                    ),
                    "__xb": pa.array((h % nb).astype(np.int64), pa.int64()),
                }
            )
        return f

    def pairs(g: pd.DataFrame) -> pa.Table:
        news = g[g["__side"] == 0]
        bases = g[g["__side"] == 1]
        if len(news) == 0 or len(bases) == 0:
            e = np.empty(0, dtype=np.int64)
            return pa.table({"new_id": e, "base_id": e})
        reps = bases.groupby("__xt", as_index=False)[id_col].min()
        m = news.merge(reps, on="__xt", how="inner", suffixes=("", "_b"))
        out = m[[id_col, f"{id_col}_b"]].sort_values([id_col, f"{id_col}_b"])
        return pa.table(
            {
                "new_id": out[id_col].to_numpy(dtype=np.int64),
                "base_id": out[f"{id_col}_b"].to_numpy(dtype=np.int64),
            }
        )

    tagged = new_docs.map_batches(tag(0), batch_format="pyarrow").union(
        base_docs.map_batches(tag(1), batch_format="pyarrow")
    )
    return tagged.groupby("__xb").map_groups(pairs, batch_format="pandas")


def near_dedup_keep_best(
    docs: rd.Dataset,
    score_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    descending: bool = True,
    num_buckets: int = 64,
) -> rd.Dataset:
    """One survivor per MinHash NEAR-duplicate cluster, chosen by a
    quality score (highest wins by default; ties → min id) — the
    near-dup counterpart of :func:`exact_dedup_keep_best` (web-corpus
    curation keeps the best/longest member of each near-dup cluster,
    not the min-id one).  Returns one row per cluster:
    ``(component, id, score, n_members)``.

    Shape: :func:`minhash_dedup`'s (id, component) table — only docs
    that HAVE a near-duplicate, orders of magnitude smaller than the
    corpus — joins the (id, score) projection via the size-gated
    ``equi_join`` (broadcast when the component table is small,
    bucketed co-location when it isn't), then ONE
    ``hash(component) % num_buckets`` exchange picks survivors with a
    vectorized in-bucket pandas sort + per-component head (no per-key
    Python at component cardinality)."""
    from .relational import equi_join

    comps = minhash_dedup(docs, id_col, text_col, threshold)
    scores = docs.map_batches(
        lambda b: b.select([id_col, score_col]), batch_format="pyarrow"
    )
    joined = equi_join(scores, comps, id_col, num_buckets=num_buckets)

    def tag(b: pa.Table) -> pa.Table:
        comp = b["component"].to_numpy().astype(np.uint64)
        bkt = ((comp * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % np.uint64(
            num_buckets
        )
        return b.append_column("__cb", pa.array(bkt.astype(np.int64), pa.int64()))

    def keep_best(g: pd.DataFrame) -> pa.Table:
        sizes = g.groupby("component", sort=False).size().rename("n_members")
        best = g.sort_values(
            [score_col, id_col], ascending=[not descending, True], kind="mergesort"
        ).groupby("component", sort=True).head(1)
        out = best.join(sizes, on="component").sort_values("component")
        return pa.Table.from_pandas(
            out[["component", id_col, score_col, "n_members"]], preserve_index=False
        )

    return joined.map_batches(tag, batch_format="pyarrow").groupby("__cb").map_groups(
        keep_best, batch_format="pandas"
    )


def line_dedup(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    broadcast_below: int = 5_000_000,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Cross-corpus LINE/paragraph dedup — the CCNet / RefinedWeb
    boilerplate rule: every line whose normalized form (lower +
    whitespace collapse, the exact-dedup identity) occurs in ≥
    ``min_count`` lines corpus-wide is removed from EVERY doc (all
    occurrences, including the first — boilerplate headers/footers
    carry no training signal anywhere).  Returns (id, text) with the
    surviving lines rejoined by ``\\n`` in original order; docs whose
    every line is removed are dropped.

    Lines travel as normalized STRINGS, not hashes — exact semantics,
    SQL-replicable (same trade as stages/decontam.py grams).

    Shapes, size-gated like decontaminate:

    1. **Count**: per-batch line explode → batch-local value_counts →
       ``grouped_reduce`` sum → the common-line set (≥ min_count).
       The exchange carries batch-DISTINCT partials, never raw lines.
    2a. **Broadcast scrub** (common set ≤ ``broadcast_below``): the
        common lines ``ray.put`` once; ONE streaming pass drops
        matching lines per batch (vectorized isin over the exploded
        frame) — zero further exchanges.  Boilerplate sets are small
        by nature (that's what makes them boilerplate).
    2b. **Co-location scrub**: exploded (doc, idx, line) rows and the
        common set union under one schema, ``groupby(hash(line_norm))``
        drops marked groups, then ``groupby(hash(doc))`` reassembles —
        two more exchanges, no driver set.  Identical output (pytest).
    """
    import ray

    from ..state.worker_state import get_worker_state, ref_key
    from .agg import grouped_reduce

    def count_partial(b: pd.DataFrame) -> pa.Table:
        lines = b[text_col].fillna("").str.split("\n").explode()
        norm = _norm_text(lines.astype(str))
        cnt = norm[norm != ""].value_counts()
        return pa.table(
            {
                "__ln": pa.array(cnt.index.to_numpy(dtype=object), pa.string()),
                "c": pa.array(cnt.to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    common = (
        grouped_reduce(
            docs.map_batches(count_partial, batch_format="pandas"),
            ["__ln"],
            {"n": ("c", "sum")},
            num_buckets=num_buckets,
        )
        .filter(expr=f"n >= {int(min_count)}")
        .materialize()
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        lines = b[text_col].fillna("").str.split("\n").explode()
        pos = lines.index.to_numpy(dtype=np.int64)
        idx = np.arange(len(lines)) - np.r_[0, np.cumsum(np.bincount(pos))][pos]
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(dtype=np.int64)[pos],
                "__idx": idx.astype(np.int64),
                "__line": lines.to_numpy(dtype=object),
                "__ln": _norm_text(lines.astype(str)).to_numpy(dtype=object),
            }
        )

    def reassemble(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([id_col, "__idx"], kind="mergesort")
        out = g.groupby(id_col, sort=True)["__line"].agg("\n".join).reset_index()
        return pa.table(
            {
                id_col: pa.array(out[id_col].to_numpy(dtype=np.int64), pa.int64()),
                text_col: pa.array(out["__line"].to_numpy(dtype=object), pa.string()),
            }
        )

    if common.count() <= broadcast_below:
        cdf = common.to_pandas()  # empty Dataset loses its schema — guard
        cset = (
            cdf["__ln"].to_numpy(dtype=object)
            if "__ln" in cdf.columns
            else np.empty(0, dtype=object)
        )
        cref = ray.put(cset)

        def scrub(b: pd.DataFrame) -> pa.Table:
            cs = get_worker_state(("linededup", ref_key(cref)), lambda: ray.get(cref))
            ex = explode(b)
            return reassemble(ex[~ex["__ln"].isin(cs)])

        return docs.map_batches(scrub, batch_format="pandas")

    # co-location: exploded rows + marked common lines share one schema
    nb = np.uint64(num_buckets)

    def _tagged_table(
        ids: np.ndarray, idx: np.ndarray, line, ln, mark: np.ndarray
    ) -> pa.Table:
        # explicit Arrow types: empty object-dtype columns infer NULL
        # (r4 rule) and these UDFs can all emit 0 rows
        lb = (
            pd.util.hash_pandas_object(pd.Series(ln), index=False).to_numpy() % nb
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "__idx": pa.array(idx, pa.int64()),
                "__line": pa.array(line, pa.string()),
                "__ln": pa.array(ln, pa.string()),
                "__mark": pa.array(mark, pa.int64()),
                "__lb": pa.array(lb, pa.int64()),
            }
        )

    def tag_rows(b: pd.DataFrame) -> pa.Table:
        ex = explode(b)
        return _tagged_table(
            ex[id_col].to_numpy(dtype=np.int64),
            ex["__idx"].to_numpy(dtype=np.int64),
            ex["__line"].to_numpy(dtype=object),
            ex["__ln"].to_numpy(dtype=object),
            np.zeros(len(ex), dtype=np.int64),
        )

    def tag_common(b: pd.DataFrame) -> pa.Table:
        n = len(b)
        return _tagged_table(
            np.full(n, -1, dtype=np.int64),
            np.full(n, -1, dtype=np.int64),
            np.full(n, "", dtype=object),
            b["__ln"].to_numpy(dtype=object),
            np.ones(n, dtype=np.int64),
        )

    def drop_marked(g: pd.DataFrame) -> pa.Table:
        bad = set(g.loc[g["__mark"] == 1, "__ln"])
        kept = g[(g["__mark"] == 0) & ~g["__ln"].isin(bad)]
        db = (
            pd.util.hash_pandas_object(kept[id_col], index=False).to_numpy() % nb
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(kept[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "__idx": pa.array(kept["__idx"].to_numpy(dtype=np.int64), pa.int64()),
                "__line": pa.array(kept["__line"].to_numpy(dtype=object), pa.string()),
                "__db": pa.array(db, pa.int64()),
            }
        )

    tagged = docs.map_batches(tag_rows, batch_format="pandas").union(
        common.map_batches(tag_common, batch_format="pandas")
    )
    kept_rows = tagged.groupby("__lb").map_groups(drop_marked, batch_format="pandas")
    return kept_rows.groupby("__db").map_groups(
        lambda g: reassemble(g), batch_format="pandas"
    )


def duplicate_ngram_coverage(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_count: int = 2,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Cross-corpus exact-substring duplication audit — the ExactSubstr
    signal of Lee et al. 2021 ("Deduplicating Training Data Makes
    Language Models Better") at token-n-gram granularity: for every
    document, how many of its token ``n``-gram occurrences also occur
    elsewhere in the corpus (>= ``min_count`` occurrences corpus-wide,
    any document including itself), and how many token-characters those
    duplicated spans cover (union of overlapping occurrences).

    Returns one row per input doc: ``(id, n_tokens, total_chars,
    dup_hits, covered_tokens, dup_chars)`` — all int64, SQL hash-exact.

    Shapes (two skinny exchanges, no document text crosses either):

    1. **Gram explode** (map-only, vectorized): Arrow whitespace
       tokenization, gram strings built with
       ``pc.binary_join_element_wise`` over shifted takes of the flat
       token array — no per-row Python.  Grams travel as STRINGS
       co-located by ``hash(gram) % num_buckets`` (exact semantics, the
       decontam/line_dedup trade; a hash-only variant would admit
       collision false-positives).
    2. **Duplicate filter**: in-bucket pandas value_counts keeps
       occurrences of grams with corpus-wide count >= min_count,
       emitting skinny ``(doc, pos)`` hits.
    3. **Span reassembly**: hits union one row per doc carrying its
       token-length list (list<int64> — lengths only, never text),
       co-located by ``hash(doc) % num_buckets``; per doc the covered
       position set is the union of ``[pos, pos+n)`` intervals.

    Beyond-reference operator (training-data curation; no counterpart
    in Orange-OpenSource/Table-Annotation).
    """
    import pyarrow.compute as pc

    from .textstats import _ws_tokens

    nb = np.uint64(num_buckets)

    def _hits_table(ids, pos, db) -> pa.Table:
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "__pos": pa.array(pos, pa.int64()),
                "__db": pa.array(db, pa.int64()),
                "__side": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
                "__lens": pa.nulls(len(ids), pa.list_(pa.int64())),
            }
        )

    def explode_grams(b: pd.DataFrame) -> pa.Table:
        toks, nt = _ws_tokens(b[text_col])
        flat = toks.flatten().combine_chunks() if isinstance(
            toks, pa.ChunkedArray
        ) else toks.flatten()
        off = (
            toks.offsets.to_numpy()
            if not isinstance(toks, pa.ChunkedArray)
            else toks.combine_chunks().offsets.to_numpy()
        )
        # per-doc gram counts and global start indices into `flat`
        g_per_doc = np.maximum(nt - n + 1, 0)
        total = int(g_per_doc.sum())
        if total == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "__pos": pa.array([], pa.int64()),
                    "gram": pa.array([], pa.string()),
                    "__gb": pa.array([], pa.int64()),
                }
            )
        doc_idx = np.repeat(np.arange(len(b)), g_per_doc)
        # position within doc: global arange minus each doc's first slot
        first = np.r_[0, np.cumsum(g_per_doc)][:-1]
        pos = np.arange(total, dtype=np.int64) - np.repeat(first, g_per_doc)
        starts = off[:-1][doc_idx] + pos
        parts = [flat.take(pa.array(starts + k)) for k in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        gb = (
            pd.util.hash_pandas_object(
                pd.Series(grams.to_numpy(zero_copy_only=False)), index=False
            ).to_numpy()
            % nb
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(
                    b[id_col].to_numpy(dtype=np.int64)[doc_idx], pa.int64()
                ),
                "__pos": pa.array(pos, pa.int64()),
                "gram": grams,
                "__gb": pa.array(gb, pa.int64()),
            }
        )

    def keep_duplicated(g: pd.DataFrame) -> pa.Table:
        cnt = g["gram"].value_counts()
        dup = g[g["gram"].isin(cnt.index[cnt >= min_count])]
        ids = dup[id_col].to_numpy(dtype=np.int64)
        db = (
            pd.util.hash_pandas_object(dup[id_col], index=False).to_numpy() % nb
        ).astype(np.int64)
        return _hits_table(ids, dup["__pos"].to_numpy(dtype=np.int64), db)

    def doc_lens(b: pd.DataFrame) -> pa.Table:
        toks, _ = _ws_tokens(b[text_col])
        t = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lens = pc.utf8_length(t.flatten()).cast(pa.int64())
        lens_list = pa.ListArray.from_arrays(t.offsets, lens)
        ids = b[id_col].to_numpy(dtype=np.int64)
        db = (
            pd.util.hash_pandas_object(b[id_col], index=False).to_numpy() % nb
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "__pos": pa.array(np.full(len(b), -1, np.int64), pa.int64()),
                "__db": pa.array(db, pa.int64()),
                "__side": pa.array(np.ones(len(b), np.int64), pa.int64()),
                "__lens": lens_list,
            }
        )

    def per_doc(g: pd.DataFrame) -> pa.Table:
        base = g[g["__side"] == 1]
        hits = g[g["__side"] == 0]
        hit_pos = {
            did: grp["__pos"].to_numpy(dtype=np.int64)
            for did, grp in hits.groupby(id_col, sort=False)
        }
        ids, ntok, tchars, nhits, ctok, dchars = [], [], [], [], [], []
        for did, lens in zip(base[id_col], base["__lens"]):
            lens = np.asarray(lens, dtype=np.int64)
            t = len(lens)
            ids.append(int(did))
            ntok.append(t)
            tchars.append(int(lens.sum()))
            ps = hit_pos.get(did)
            if ps is None or t == 0:
                nhits.append(0)
                ctok.append(0)
                dchars.append(0)
                continue
            covered = np.zeros(t, dtype=bool)
            for p in ps:
                covered[p : p + n] = True
            nhits.append(int(len(ps)))
            ctok.append(int(covered.sum()))
            dchars.append(int(lens[covered].sum()))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "total_chars": pa.array(tchars, pa.int64()),
                "dup_hits": pa.array(nhits, pa.int64()),
                "covered_tokens": pa.array(ctok, pa.int64()),
                "dup_chars": pa.array(dchars, pa.int64()),
            }
        )

    grams = docs.map_batches(explode_grams, batch_format="pandas")
    hits = grams.groupby("__gb").map_groups(
        keep_duplicated, batch_format="pandas"
    )
    tagged = hits.union(docs.map_batches(doc_lens, batch_format="pandas"))
    return tagged.groupby("__db").map_groups(per_doc, batch_format="pandas")


def duplicate_weights(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Duplicate-aware loss weights — the keep-but-downweight
    alternative to dropping duplicates: every document gets
    ``weight = 1 / |its exact-duplicate cluster|`` (normalized text:
    lower, trim, collapse whitespace — the exact_dedup rule), so a
    text repeated k times contributes total mass 1 to training.

    ONE hash(normalized text) co-location; cluster size is a
    groupby-transform inside the bucket (grouping on the TEXT itself,
    so 64-bit digest collisions cannot merge clusters); the weight is
    one double division of the exact count.  Output ``(id, n_copies,
    weight)``.
    """
    nb = np.uint64(num_buckets)

    def tag(b: pd.DataFrame) -> pa.Table:
        norm = (
            b[text_col].fillna("").str.lower().str.strip()
            .str.replace(r"\s+", " ", regex=True)
        )
        bkt = (
            pd.util.hash_pandas_object(norm, index=False).to_numpy() % nb
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(b[id_col].to_numpy(dtype=np.int64),
                                 pa.int64()),
                "__dw_norm": pa.array(norm.tolist(), pa.string()),
                "__dw_bkt": pa.array(bkt, pa.int64()),
            }
        )

    def weigh(g: pd.DataFrame) -> pa.Table:
        n = g.groupby("__dw_norm", sort=False)[id_col].transform("size").to_numpy(
            dtype=np.int64
        )
        return pa.table(
            {
                id_col: pa.array(g[id_col].to_numpy(dtype=np.int64),
                                 pa.int64()),
                "n_copies": pa.array(n, pa.int64()),
                "weight": pa.array(1.0 / n.astype(np.float64), pa.float64()),
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(tag, batch_format="pandas")
        .groupby("__dw_bkt")
        .map_groups(weigh, batch_format="pandas")
    )
