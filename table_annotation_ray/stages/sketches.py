"""Mergeable sketches — approximate aggregates for 100 TB-scale passes.

The reference computes everything exactly in memory (SURVEY §2.5 "no
sketches"); at 10^12 rows a distinct count or heavy-hitter scan needs
mergeable sketches: one small sketch per batch, a tiny merge stage —
the ray_guide "sketches are designed to be mergeable" pattern.

* :class:`HyperLogLog` — from-scratch HLL (Flajolet et al.) with the
  standard bias correction and linear-counting small-range correction;
  numpy register updates, union = elementwise max.
* :class:`MisraGries` — heavy-hitter candidate sketch; ``k > 1/θ``
  guarantees every key with frequency ≥ θ·N survives, so an exact
  verification pass over the candidate set (a broadcast semi-join +
  groupby-count) yields EXACTLY the keys above threshold — which is why
  ``heavy_hitters`` is SQL-oracle-checkable despite using a sketch.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _hash64(values: pd.Series) -> np.ndarray:
    """Deterministic, well-mixed 64-bit hashes (pandas' vectorized
    SipHash-like object hash with a fixed key)."""
    return pd.util.hash_pandas_object(values.astype(str), index=False).to_numpy(
        dtype=np.uint64
    )


class HyperLogLog:
    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits, + 1
        ranks = np.zeros(len(hashes), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        remaining = rest.copy()
        rank = np.ones(len(hashes), dtype=np.uint8)
        active = np.ones(len(hashes), dtype=bool)
        for _ in range(64 - self.p):
            is_zero = (remaining & mask) == 0
            step = active & is_zero
            rank[step] += 1
            active &= is_zero
            remaining = remaining << np.uint64(1)
            if not active.any():
                break
        ranks = rank
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())


def tree_reduce(
    parts: rd.Dataset, merge_fn, fanin: int = 64, max_partials: int = 128
) -> pd.DataFrame:
    """Distributed reduction of mergeable-partial rows: repeated
    ``map_batches`` merge tiers (each batch of ≤ ``fanin`` partials →
    one merged partial) until ≤ ``max_partials`` rows remain, then
    collect.  At 10^12 rows / 64k batches that is ~15M partials → 3
    distributed tiers → a driver merge over ≤128 rows, instead of a 15M
    iteration Python loop on the driver.  Materializing between tiers is
    fine — partials are sketch-sized, not data-sized."""
    parts = parts.materialize()
    n = parts.count()
    while n > max_partials:
        parts = parts.map_batches(
            merge_fn, batch_format="pandas", batch_size=fanin
        ).materialize()
        prev, n = n, parts.count()
        if n >= prev:  # safety: merge_fn failed to reduce — fall out
            break
    # to_pandas, not take_all: row materialization is pathologically slow
    # in ray 2.49 (measured 57 s vs 0.4 s for 76k rows)
    return parts.to_pandas()


def approx_distinct(
    ds: rd.Dataset, col: str, p: int = 12, batch_size: int = 65536
) -> float:
    """Streaming approximate distinct count: one HLL per batch, merged
    through a distributed tree-reduce (register max is associative —
    the result is bit-identical to a flat merge)."""

    def sketch_batch(batch: pd.DataFrame) -> pd.DataFrame:
        hll = HyperLogLog(p)
        hll.add_hashes(_hash64(batch[col]))
        return pd.DataFrame({"sketch": [hll.to_bytes()]})

    def merge_batch(batch: pd.DataFrame) -> pd.DataFrame:
        regs = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in batch["sketch"]]
        ).max(axis=0)
        return pd.DataFrame({"sketch": [regs.tobytes()]})

    parts = tree_reduce(
        ds.map_batches(sketch_batch, batch_format="pandas", batch_size=batch_size),
        merge_batch,
    )
    merged = HyperLogLog(p)
    for sk in parts["sketch"]:
        merged = merged.merge(HyperLogLog.from_bytes(sk, p))
    return merged.estimate()


class MisraGries:
    """Batched-compression Misra-Gries: adds are plain dict updates; when
    the dict exceeds 2k entries it is compressed to ≤ k by subtracting
    the (k+1)-th largest count from every entry and dropping ≤0 — each
    compression removes ≥ (k+1)·cutoff total mass, so the cumulative
    undercount per key stays ≤ N/(k+1) (the classic MG guarantee) while
    adds are amortized O(1) instead of O(k)."""

    def __init__(self, k: int):
        self.k = k
        self.counters: dict = {}

    def _compress(self) -> None:
        c = self.counters
        if len(c) <= self.k:
            return
        vals = sorted(c.values(), reverse=True)
        cutoff = vals[self.k]
        self.counters = {key: cnt - cutoff for key, cnt in c.items() if cnt > cutoff}

    def add(self, key, count: int = 1) -> None:
        c = self.counters
        c[key] = c.get(key, 0) + count
        if len(c) > 2 * self.k:
            self._compress()

    def candidates(self) -> dict:
        self._compress()
        return self.counters

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(self.k)
        out.counters = dict(self.counters)
        for key, cnt in other.counters.items():
            out.counters[key] = out.counters.get(key, 0) + cnt
        out._compress()
        return out


def heavy_hitters(
    ds: rd.Dataset, col: str, min_count, k: int = 4096
) -> pd.DataFrame:
    """Exact heavy hitters via sketch + verify: Misra-Gries per batch →
    merged candidate set (guaranteed superset of keys with ≥ N/k
    occurrences) → exact count verification restricted to candidates →
    keys with count ≥ min_count.  Output is EXACT (SQL: GROUP BY ...
    HAVING count(*) >= min_count) as long as min_count ≥ N/k — assert
    that precondition rather than silently under-reporting.

    TWO passes total over ``ds``: each sketch partial is ONE row
    ``(pickled counters, row count)``, so the total row count — needed
    both for the guarantee assert and for callers whose threshold
    depends on N — costs no extra scan, and is carried even when a
    batch's candidates compress to empty (>k all-distinct values: the
    old per-key row format dropped the count row with them, silently
    understating N).  Partials are merged through a distributed
    tree-reduce; the driver merges ≤128 final partials.  ``min_count``
    may be an int or a callable ``total_rows -> int`` (resolved after
    the sketch pass)."""
    import pickle

    def sketch_batch(batch: pd.DataFrame) -> pd.DataFrame:
        mg = MisraGries(k)
        for key, cnt in batch[col].value_counts().items():
            mg.add(key, int(cnt))
        return pd.DataFrame(
            {
                "sketch": [pickle.dumps(mg.candidates())],
                "rows": pd.Series([len(batch)], dtype="int64"),
            }
        )

    def merge_batch(batch: pd.DataFrame) -> pd.DataFrame:
        mg = MisraGries(k)
        rows = 0
        for sk, n in zip(batch["sketch"], batch["rows"]):
            for key, cnt in pickle.loads(sk).items():
                mg.add(key, int(cnt))
            rows += int(n)
        return pd.DataFrame(
            {
                "sketch": [pickle.dumps(mg.candidates())],
                "rows": pd.Series([rows], dtype="int64"),
            }
        )

    parts = tree_reduce(
        ds.map_batches(sketch_batch, batch_format="pandas", batch_size=65536),
        merge_batch,
    )
    merged = MisraGries(k)
    total = 0
    for sk, n in zip(parts["sketch"], parts["rows"]):
        for key, cnt in pickle.loads(sk).items():
            merged.add(key, int(cnt))
        total += int(n)
    if callable(min_count):
        min_count = int(min_count(total))
    assert min_count >= total / k, (
        f"min_count={min_count} below the sketch guarantee N/k={total / k:.1f}; "
        "raise k or min_count"
    )
    candidates = set(merged.candidates())
    if not candidates:
        return pd.DataFrame({col: [], "n": []})

    # exact verify: broadcast the candidate set, count only those keys
    import ray

    cand_ref = ray.put(candidates)

    def filter_cand(batch: pd.DataFrame):
        import pyarrow as pa

        from ..state.worker_state import get_worker_state, ref_key

        cands = get_worker_state(("hh-cand", ref_key(cand_ref)), lambda: ray.get(cand_ref))
        # Arrow out (pandas blocks poison the downstream exchange) and
        # grouped_reduce below, not the builtin aggregate (per-key
        # Python at up to k candidate keys) — CLAUDE.md r3
        return pa.Table.from_pandas(
            batch[batch[col].isin(cands)][[col]], preserve_index=False
        )

    from .agg import grouped_reduce

    counts = grouped_reduce(
        ds.map_batches(filter_cand, batch_format="pandas"),
        [col],
        {"n": (None, "count")},
    ).to_pandas()
    out = counts[counts["n"] >= min_count].sort_values(col).reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out


def approx_distinct_by_key(
    ds: rd.Dataset,
    key_cols: list[str],
    col: str,
    p: int = 12,
    num_buckets: int = 64,
    batch_size: int = 65536,
    out_col: str = "approx_distinct",
) -> rd.Dataset:
    """Per-group approximate distinct counts in ONE streaming scan —
    the sketch counterpart of stages/agg.py::distinct_count_by_key
    (exact, two exchanges of distinct pairs).  One HLL per (group,
    batch) map-side, ``hash(group) % num_buckets`` exchange (the
    grouped_reduce shape — never per-group Ray groups), in-bucket
    register-max merge per group.  Sketch rows are 2^p bytes each;
    shrink ``p`` or raise ``batch_size`` if groups-per-batch ×
    2^p bytes dominates the exchange."""
    nb = np.uint64(num_buckets)

    def sketch_partial(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(key_cols, kind="mergesort")
        hashes = _hash64(b[col])
        keys = b[key_cols].to_records(index=False)
        bounds = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1, len(b)]
        rows_k, rows_s = [], []
        for s, t in zip(bounds[:-1], bounds[1:]):
            hll = HyperLogLog(p)
            hll.add_hashes(hashes[s:t])
            rows_k.append(s)
            rows_s.append(hll.to_bytes())
        out = b.iloc[rows_k][key_cols].reset_index(drop=True)
        out["sk"] = rows_s
        out["__ad_bkt"] = (
            pd.util.hash_pandas_object(
                out[key_cols[0]] if len(key_cols) == 1 else out[key_cols],
                index=False,
            ).to_numpy()
            % nb
        ).astype(np.int64)
        # Arrow block ahead of the sort-shuffle (pandas blocks poison
        # the exchange — CLAUDE.md r3 invariant; bytes -> Arrow binary).
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for key, sub in g.groupby(key_cols, sort=False):
            regs = np.stack(
                [np.frombuffer(x, dtype=np.uint8) for x in sub["sk"]]
            ).max(axis=0)
            est = HyperLogLog(p, registers=regs).estimate()
            row = dict(zip(key_cols, key if isinstance(key, tuple) else (key,)))
            row[out_col] = est
            outs.append(row)
        return pd.DataFrame(outs)

    return (
        ds.map_batches(sketch_partial, batch_format="pandas", batch_size=batch_size)
        .groupby("__ad_bkt")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def grouped_heavy_hitters(
    ds: rd.Dataset,
    key_cols: list[str],
    col: str,
    min_count: int,
    k: int = 1024,
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> rd.Dataset:
    """EXACT per-group heavy hitters — ``GROUP BY keys, value HAVING
    count >= min_count`` with the value space too large to aggregate
    raw: per-(group, batch) Misra-Gries candidate sketches merge in a
    hash-bucket exchange (one MG per group is a superset of its ≥ N_g/k
    keys), then ONE exact verification pass counts only candidate
    (group, value) pairs via grouped_reduce.  Exactness requires
    ``min_count ≥ N_g/k`` for every group — enforced with an explicit
    ``ValueError`` (survives ``python -O``) from the piggybacked
    per-group row counts, never silently violated.

    Output: one row per (keys, value) with ``n ≥ min_count``."""
    import pickle

    nb = np.uint64(num_buckets)
    pair_cols = key_cols + [col]

    def sketch_partial(b: pd.DataFrame) -> pa.Table:
        rows_k, rows_s, rows_n = [], [], []
        for key, sub in b.groupby(key_cols, sort=False):
            mg = MisraGries(k)
            for v, cnt in sub[col].value_counts().items():
                mg.add(v, int(cnt))
            rows_k.append(key if isinstance(key, tuple) else (key,))
            rows_s.append(pickle.dumps(mg.candidates()))
            rows_n.append(len(sub))
        out = pd.DataFrame(rows_k, columns=key_cols)
        out["sk"] = rows_s
        out["rows"] = pd.Series(rows_n, dtype="int64")
        out["__gh_bkt"] = (
            pd.util.hash_pandas_object(
                out[key_cols[0]] if len(key_cols) == 1 else out[key_cols],
                index=False,
            ).to_numpy()
            % nb
        ).astype(np.int64)
        # Arrow block ahead of the sort-shuffle (CLAUDE.md r3 invariant).
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, sub in g.groupby(key_cols, sort=False):
            mg = MisraGries(k)
            n = 0
            for blob, cnt in zip(sub["sk"], sub["rows"]):
                for v, c in pickle.loads(blob).items():
                    mg.add(v, int(c))
                n += int(cnt)
            # Explicit raise, not `assert` — the exactness guarantee
            # must survive `python -O` (asserts are stripped there).
            if min_count < n / k:
                raise ValueError(
                    f"min_count={min_count} below N_g/k={n / k:.1f} for group "
                    f"{key!r}; raise k or min_count"
                )
            for v in mg.candidates():
                row = dict(zip(key_cols, key if isinstance(key, tuple) else (key,)))
                row[col] = v
                rows.append(row)
        return pd.DataFrame(rows, columns=pair_cols)

    cands = (
        ds.map_batches(sketch_partial, batch_format="pandas", batch_size=batch_size)
        .groupby("__gh_bkt")
        .map_groups(merge_bucket, batch_format="pandas")
        .to_pandas()
    )
    import ray

    from ..state.worker_state import get_worker_state, ref_key

    cand_set = set(map(tuple, cands[pair_cols].itertuples(index=False)))
    cref = ray.put(cand_set)

    def filter_cand(b: pd.DataFrame) -> pa.Table:
        cs = get_worker_state(("ghh", ref_key(cref)), lambda: ray.get(cref))
        keep = [tuple(t) in cs for t in b[pair_cols].itertuples(index=False)]
        return pa.Table.from_pandas(
            b.loc[keep, pair_cols], preserve_index=False
        )

    from .agg import grouped_reduce

    counts = grouped_reduce(
        ds.map_batches(filter_cand, batch_format="pandas", batch_size=batch_size),
        pair_cols,
        {"n": (None, "count")},
        num_buckets=num_buckets,
    )
    return counts.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["n"], pa.scalar(min_count))),
        batch_format="pyarrow",
    )


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): mergeable
    approximate point counts.  ``depth`` rows × ``width`` counters;
    the d row positions derive from one 64-bit hash via the
    Kirsch–Mitzenmacher double-hashing trick (h1 + i·h2 mod w).

    Guarantees (pytest-pinned): a query NEVER underestimates, and
    overestimates by ≤ (e/width)·N with probability ≥ 1 − e^-depth.
    Merging is elementwise addition — exact, associative, so the
    distributed tree-reduce result is identical to a flat build."""

    def __init__(self, depth: int = 4, width: int = 8192,
                 table: np.ndarray | None = None):
        self.depth = depth
        self.width = width
        self.table = (
            table if table is not None
            else np.zeros((depth, width), dtype=np.int64)
        )

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) counter indices per hashed key."""
        h1 = (hashes >> np.uint64(32)).astype(np.uint64)
        h2 = (hashes | np.uint64(1)).astype(np.uint64)  # odd -> full cycle
        rows = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + rows * h2[None, :]) % np.uint64(self.width)).astype(
            np.int64
        )

    def add_hashes(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        pos = self._positions(hashes)
        c = counts if counts is not None else np.ones(len(hashes), dtype=np.int64)
        for i in range(self.depth):
            np.add.at(self.table[i], pos[i], c)

    def query_hashes(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)
        ests = np.stack([self.table[i][pos[i]] for i in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        return CountMin(self.depth, self.width, self.table + other.table)

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, depth: int = 4, width: int = 8192) -> "CountMin":
        return cls(depth, width,
                   np.frombuffer(b, dtype=np.int64).reshape(depth, width).copy())


def cms_point_counts(
    ds: rd.Dataset,
    col: str,
    queries: list,
    depth: int = 4,
    width: int = 8192,
    batch_size: int = 65536,
) -> pd.DataFrame:
    """Approximate point counts for ``queries`` values over a key column
    in ONE streaming scan: per-batch CountMin partials (map-side
    value_counts first, so the scatter is per-distinct not per-row) →
    tree-reduced elementwise sums → one driver query.  The sketch is
    (depth × width × 8) bytes regardless of key cardinality — the
    shape for counting over 10^9-key spaces where even the bucketed
    exact reduce is a corpus-wide exchange."""

    acc = _cms_build(ds, col, depth, width, batch_size)
    q = pd.Series(queries)
    return pd.DataFrame(
        {col: q, "approx_count": acc.query_hashes(_hash64(q)).astype("int64")}
    )


def _cms_build(
    ds: rd.Dataset, col: str, depth: int, width: int, batch_size: int
) -> CountMin:
    """One streaming CountMin build (per-batch partials, tree-reduced)."""
    def sketch_batch(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[col].value_counts()
        cm = CountMin(depth, width)
        cm.add_hashes(_hash64(vc.index.to_series()), vc.to_numpy(dtype=np.int64))
        return pd.DataFrame({"sk": [cm.to_bytes()]})

    def merge_batch(b: pd.DataFrame) -> pd.DataFrame:
        t = np.stack([np.frombuffer(x, dtype=np.int64) for x in b["sk"]]).sum(axis=0)
        return pd.DataFrame({"sk": [t.tobytes()]})

    parts = tree_reduce(
        ds.map_batches(sketch_batch, batch_format="pandas", batch_size=batch_size),
        merge_batch,
    )
    acc = CountMin(depth, width)
    for sk in parts["sk"]:
        acc = acc.merge(CountMin.from_bytes(sk, depth, width))
    return acc


def join_size_estimate(
    left: rd.Dataset,
    left_col: str,
    right: rd.Dataset,
    right_col: str,
    depth: int = 4,
    width: int = 8192,
    batch_size: int = 65536,
) -> int:
    """Equi-join cardinality estimate from two Count-Min sketches
    (Cormode & Muthukrishnan 2005 §4.2): |L ⋈ R| ≈ min over sketch
    rows of the inner product  Σ_w  T_L[i,w]·T_R[i,w].  NEVER
    underestimates the true size (every true (key_L, key_R) pair lands
    in the same counter of every row); overestimates by collision noise
    ≤ (e/width)·|L|·|R| per row w.h.p. — the query-planner primitive
    for choosing broadcast vs shuffle WITHOUT running the join.

    Cost: one streaming scan per side, sketches tree-reduced; the
    estimate itself is a (depth × width) dot product on the driver.
    Both sketches must share (depth, width) — same hash family by
    construction."""
    cl = _cms_build(left, left_col, depth, width, batch_size)
    cr = _cms_build(right, right_col, depth, width, batch_size)
    prods = (cl.table.astype(np.float64) * cr.table.astype(np.float64)).sum(axis=1)
    return int(prods.min())


def _splitmix64(z: np.ndarray) -> np.ndarray:
    z = (z.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def bottomk_signatures(
    ds: rd.Dataset,
    cat_col: str,
    id_col: str,
    k: int = 256,
) -> pd.DataFrame:
    """Bottom-k (KMV) set signatures per category — ONE sketch per
    category answers BOTH distinct-count and every pairwise
    Jaccard/overlap question, where the exact answer needs a distinct
    exchange per pair: keep the k smallest splitmix64(id) values of
    each category's id set.

    Per-batch bottom-k is a superset of the global bottom-k (the k
    smallest overall are each the k smallest of their batch), so one
    skinny ``groupby(cat)`` co-location of per-batch candidates
    finishes the exact signature.  Returns a DataFrame ``(cat,
    sig)`` with sorted uint64 arrays (<= k each)."""
    kk = int(k)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows_c, rows_s = [], []
        for cat, sub in b.groupby(cat_col, sort=False):
            h = np.unique(_splitmix64(
                sub[id_col].to_numpy(dtype=np.int64).astype(np.uint64)))
            rows_c.append(cat)
            rows_s.append(h[:kk].tobytes())
        return pd.DataFrame({cat_col: rows_c, "sig": rows_s})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(np.concatenate(
            [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        ))
        return pd.DataFrame(
            {cat_col: g[cat_col].iloc[:1], "sig": [h[:kk].tobytes()]}
        )

    got = (
        ds.select_columns([cat_col, id_col])
        .map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby(cat_col)
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    got["sig"] = [np.frombuffer(s, dtype=np.uint64) for s in got["sig"]]
    return got.sort_values(cat_col).reset_index(drop=True)


def bottomk_pairwise(sigs: pd.DataFrame, cat_col: str, k: int = 256) -> pd.DataFrame:
    """Pairwise estimates from :func:`bottomk_signatures`: for every
    category pair, the KMV Jaccard estimate (share of the union's
    bottom-k present in both signatures) and each side's distinct-count
    estimate ``(k-1) * 2^64 / kth_min`` (exact count when the
    signature holds the whole set).  Driver math over cat-count²
    sketches."""
    kk = int(k)

    def est_distinct(sig: np.ndarray) -> float:
        if len(sig) < kk:
            return float(len(sig))  # exact: whole set seen
        return (kk - 1) * (2.0 ** 64) / float(sig[kk - 1])

    rows = []
    cats = list(sigs[cat_col])
    sig = {c: s for c, s in zip(sigs[cat_col], sigs["sig"])}
    for i, a in enumerate(cats):
        for b in cats[i + 1:]:
            u = np.unique(np.concatenate([sig[a], sig[b]]))[:kk]
            inter = np.intersect1d(u, np.intersect1d(sig[a], sig[b]))
            jac = len(inter) / len(u) if len(u) else 0.0
            rows.append(
                {
                    "cat_a": a, "cat_b": b,
                    "est_jaccard": jac,
                    "est_distinct_a": est_distinct(sig[a]),
                    "est_distinct_b": est_distinct(sig[b]),
                }
            )
    return pd.DataFrame(rows)


def rolling_kmv_distinct(
    ds: rd.Dataset,
    ts_col: str,
    id_col: str,
    window_days: int = 7,
    k: int = 256,
) -> pd.DataFrame:
    """Rolling-window distinct counts from MERGEABLE daily KMV
    sketches — the at-scale replacement for exact rolling distinct
    (which must re-deduplicate every window): one bottom-k signature
    per day (one skinny day co-location over the data), then every
    rolling window is a driver-side UNION of <= ``window_days``
    signatures (sketch merge = concat + unique + truncate) — the data
    is read ONCE no matter how many windows are asked.

    Returns ``(day, n_days, est_distinct)`` per day with the trailing
    ``window_days`` window; the estimate is exact whenever the window's
    true distinct count is <= k (signature holds the whole set).
    Accuracy vs the exact rolling distinct is pinned in pytest
    (~1/sqrt(k) relative band)."""
    kk = int(k)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        us = b[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {"day": us // 86_400_000_000, id_col: b[id_col]}
        )

    daily = bottomk_signatures(
        ds.map_batches(tag, batch_format="pandas"), "day", id_col, k=kk
    )
    days = daily["day"].to_numpy(dtype=np.int64)
    sigs = list(daily["sig"])
    rows = []
    for i, d in enumerate(days):
        lo = d - window_days + 1
        parts = [s for dd, s in zip(days, sigs) if lo <= dd <= d]
        u = np.unique(np.concatenate(parts))
        # len(u) == k is ambiguous (a truncated signature), so only a
        # STRICTLY short union proves the whole set was seen
        if len(u) < kk:
            est = float(len(u))
        else:
            est = (kk - 1) * (2.0 ** 64) / float(u[kk - 1])
        rows.append({"day": int(d), "n_days": len(parts),
                     "est_distinct": est})
    return pd.DataFrame(rows).sort_values("day").reset_index(drop=True)
