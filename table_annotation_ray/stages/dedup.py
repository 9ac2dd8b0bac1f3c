"""Deduplication operators over a documents table — exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale shapes (ray_guide patterns):
  * exact: content-hash inside ``map_batches`` (combiner) → groupby(hash)
    keep-min — one hash-partition shuffle on the digest, never on text.
  * MinHash-LSH: shingle→minhash per batch (numpy, vectorized over
    permutations) → explode to (band, band_hash, doc_id) rows →
    groupby band bucket → candidate pairs → exact-Jaccard verify →
    min-label propagation for components (bounded rounds).
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

_WS = re.compile(r"\s+")

_MERSENNE = (1 << 61) - 1


def _norm_text(s: pd.Series) -> pd.Series:
    return s.fillna("").str.strip().str.lower().str.replace(_WS, " ", regex=True)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """One representative (min id) per distinct normalized text."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        norm = _norm_text(batch[text_col])
        batch = batch[[id_col]].copy()
        batch["text_hash"] = norm.map(lambda s: zlib.crc32(s.encode()) )
        batch["norm_text"] = norm
        return batch

    hashed = docs.map_batches(add_hash, batch_format="pandas")

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        # hash buckets may collide: group again by the actual text
        out = group.groupby("norm_text", sort=True)[id_col].min().reset_index()
        return out[[id_col]]

    return hashed.groupby("text_hash").map_groups(keep_min, batch_format="pandas")


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
    """documents → exploded (band, band_hash, doc_id) rows (LSH keys)."""
    rows_per_band = num_perms // bands

    def band_stage(batch: pd.DataFrame) -> pd.DataFrame:
        from ..state.worker_state import get_worker_state

        hasher = get_worker_state(
            ("minhash", num_perms, seed), lambda: MinHasher(num_perms, seed)
        )
        ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch[id_col], _norm_text(batch[text_col])):
            sig = hasher.signature(_word_ngrams(text, ngram))
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(zlib.crc32(chunk.tobytes()))
        return pd.DataFrame({"band": band_ids, "band_hash": band_hashes, id_col: ids})

    return docs.map_batches(band_stage, batch_format="pandas")


def minhash_candidate_pairs(bands_ds: rd.Dataset, id_col: str = "doc_id") -> rd.Dataset:
    """LSH buckets → unique candidate pairs (a < b)."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group[id_col]))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        out_a, out_b = [], []
        # bucket sizes are tiny for honest thresholds; cap defensively
        for i in range(min(len(ids), 200)):
            for j in range(i + 1, min(len(ids), 200)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    cand = bands_ds.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )
    # dedup pairs found in multiple bands
    return cand.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def jaccard_verify(
    pairs: rd.Dataset,
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    ngram: int = 3,
) -> rd.Dataset:
    """Exact n-gram Jaccard for candidate pairs.  The documents side is
    broadcast (ray.put) — valid while the candidate set's doc closure is
    the small side; at 100 TB this becomes a hash-join on doc_id."""
    import ray

    texts = {}
    for b in docs.select_columns([id_col, text_col]).iter_batches(batch_format="pandas"):
        for i, t in zip(b[id_col], _norm_text(b[text_col])):
            texts[i] = t
    texts_ref = ray.put(texts)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        from ..state.worker_state import get_worker_state, ref_key

        tx = get_worker_state(("jacc-texts", ref_key(texts_ref)), lambda: ray.get(texts_ref))
        keep_a, keep_b, sims = [], [], []
        for a, b in zip(batch["a"], batch["b"]):
            sa = _word_ngrams(tx.get(a, ""), ngram)
            sb = _word_ngrams(tx.get(b, ""), ngram)
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                sims.append(round(j, 6))
        return pd.DataFrame({"a": keep_a, "b": keep_b, "jaccard": sims})

    return pairs.map_batches(verify, batch_format="pandas")


def min_label_components(
    pairs: rd.Dataset, max_iters: int = 12
) -> rd.Dataset:
    """Distributed connected components over duplicate pairs (a, b) →
    (doc_id, component) via min-label propagation: each round every node
    takes the min label among itself and its neighbors (groupby-min per
    round, ray_guide pattern).  Converges in ≤ component-diameter
    rounds; ``max_iters`` bounds pathological chains (a 12-deep chain
    of near-duplicates is already degenerate data).  Use when the
    verified-pair set is too large for driver-side union-find."""

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"src": b["a"], "dst": b["b"]})
        rev = pd.DataFrame({"src": b["b"], "dst": b["a"]})
        return pd.concat([fwd, rev], ignore_index=True)

    edges = pairs.map_batches(both_dirs, batch_format="pandas").materialize()
    # initial label = node id
    labels = edges.map_batches(
        lambda b: pd.DataFrame({"node": b["src"], "label": b["src"]}),
        batch_format="pandas",
    ).groupby("node").map_groups(lambda g: g.head(1), batch_format="pandas").materialize()

    for _ in range(max_iters):
        # message pass: each src sends its label to dst (join on src)
        msgs = edges.join(
            labels.map_batches(
                lambda b: pd.DataFrame({"src": b["node"], "label": b["label"]}),
                batch_format="pandas",
            ),
            join_type="inner",
            num_partitions=8,
            on=("src",),
        ).map_batches(
            lambda b: pd.DataFrame({"node": b["dst"], "label": b["label"]}),
            batch_format="pandas",
        )
        from ray.data.aggregate import Min

        new_labels = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # convergence: total label sum strictly decreases while changing
        old_sum = labels.sum("label")
        new_sum = new_labels.sum("label")
        labels = new_labels
        if old_sum == new_sum:
            break
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
) -> pd.DataFrame:
    """Full near-dup pipeline → (doc_id, component) for docs that have a
    near-duplicate (singleton docs are not listed)."""
    bands = minhash_bands(docs, id_col, text_col)
    cand = minhash_candidate_pairs(bands, id_col)
    verified = jaccard_verify(cand, docs, id_col, text_col, threshold)
    return connected_components(verified.to_pandas())


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    docs: rd.Dataset, id_col: str = "doc_id", text_col: str = "text", seed: int = 11
) -> rd.Dataset:
    """64-bit SimHash per document (token-hash bit voting)."""

    def stage(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = []
        for text in _norm_text(batch[text_col]):
            votes = np.zeros(64, dtype=np.int64)
            shifts = np.arange(32)
            for tok in set(text.split()):
                lo = np.int64(zlib.crc32(tok.encode()))
                hi = np.int64(zlib.crc32(tok[::-1].encode()))
                bits = np.concatenate(((lo >> shifts) & 1, (hi >> shifts) & 1))
                votes += np.where(bits == 1, 1, -1)
            sig = int("".join("1" if v > 0 else "0" for v in votes), 2)
            sigs.append(sig - (1 << 63))  # store as signed int64
        out = pd.DataFrame({id_col: batch[id_col]})
        out["simhash"] = pd.array(sigs, dtype="int64")
        return out

    return docs.map_batches(stage, batch_format="pandas")


def simhash_near_pairs(
    sigs: rd.Dataset, id_col: str = "doc_id", max_hamming: int = 3,
    max_bucket: int = 256,
) -> rd.Dataset:
    """Band the 64-bit signature into 4×16-bit keys; by pigeonhole any
    pair within Hamming ≤ 3 shares at least one 16-bit band.

    ``max_bucket`` caps the per-bucket pair expansion: a band key shared
    by more than ``max_bucket`` docs (a degenerate band on a
    near-uniform corpus) is truncated to its first ``max_bucket`` ids by
    sort order — a documented recall cap that bounds the otherwise
    quadratic blowup.  Raise it (or pre-shard by an extra band) when
    exhaustive recall matters more than latency."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"band": [], "key": [], id_col: [], "simhash": []}
        for i, s in zip(batch[id_col], batch["simhash"]):
            u = int(s) + (1 << 63)
            for b in range(4):
                rows["band"].append(b)
                rows["key"].append((u >> (16 * b)) & 0xFFFF)
                rows[id_col].append(i)
                rows["simhash"].append(s)
        return pd.DataFrame(rows)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(set(zip(group[id_col], group["simhash"])))[:max_bucket]
        out_a, out_b, dist = [], [], []
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                h = bin((recs[i][1] ^ recs[j][1]) & ((1 << 64) - 1)).count("1")
                if h <= max_hamming:
                    out_a.append(recs[i][0])
                    out_b.append(recs[j][0])
                    dist.append(h)
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": dist})

    exploded = sigs.map_batches(explode, batch_format="pandas")
    cand = exploded.groupby(["band", "key"]).map_groups(pairs, batch_format="pandas")
    return cand.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")
