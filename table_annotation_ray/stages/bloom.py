"""Distributed Bloom filter over an integer key column — the
fixed-size broadcast that makes large-large semi/anti joins cheap.

A broadcast key SET grows with key cardinality (the reason
``relational._keyed_join`` size-gates it); a Bloom filter is a FIXED
``m``-bit broadcast regardless of cardinality, at the price of a
false-positive rate ~``(1 - e^{-h·n/m})^h``.  The join protocol stays
exact:

* **semi join**: bloom-absent left rows are *definitely* non-members —
  drop them immediately; only the "maybe" residue enters the exact
  co-location shuffle.
* **anti join**: bloom-absent rows are *definitely* kept — emit them
  straight from the map side; only the residue shuffles.

With a 1% fp-rate filter the shuffle shrinks to (selectivity + 1%) of
the left side — usually the difference between a full all-to-all and a
trickle.  Build is one streaming pass over the right keys: per-batch
partial bitmaps OR-merged through the sketch family's
:func:`~.sketches.tree_reduce` (bitwise OR is associative/commutative,
so the merge is order-independent and bit-identical to a flat build).

Hashing: splitmix64-style double hashing — ``pos_i = (h1 + i·h2) mod
m`` — fully vectorized over numpy uint64 arrays; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from .sketches import tree_reduce

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _mix(u: np.ndarray, salt: np.uint64) -> np.ndarray:
    x = (u + salt) * _C1
    x ^= x >> np.uint64(30)
    x *= _C2
    x ^= x >> np.uint64(27)
    x *= _C3
    return x ^ (x >> np.uint64(31))


class BloomFilter:
    """m must be a power of two; h double-hashing probes."""

    def __init__(self, m_bits: int, h: int = 7, words: np.ndarray | None = None):
        assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
        self.m = np.uint64(m_bits)
        self.h = h
        self.words = (
            words if words is not None else np.zeros(m_bits // 64, dtype=np.uint64)
        )

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        u = keys.astype(np.int64).astype(np.uint64)
        h1 = _mix(u, np.uint64(0x51ED2701))
        h2 = _mix(u, np.uint64(0x63A91E15)) | np.uint64(1)
        i = np.arange(self.h, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) & (self.m - np.uint64(1))

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)  # h × n
        w = self.words[(pos >> np.uint64(6)).astype(np.int64)]
        bit = (w >> (pos & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=0)

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, h: int = 7) -> "BloomFilter":
        w = np.frombuffer(b, dtype=np.uint64).copy()
        return cls(len(w) * 64, h, w)


def build_bloom(
    keys: rd.Dataset, col: str, m_bits: int = 1 << 27, h: int = 7
) -> BloomFilter:
    """One streaming pass over ``keys[col]`` → a BloomFilter.  Default
    2^27 bits = 16 MB ≈ 1% fp at 10M distinct keys (scale ``m_bits``
    with expected cardinality; it broadcasts once per worker).

    The per-batch partial is a full m-bit bitmap, so the batch size is
    tied to the filter size (≥ m_bits/32 rows ⇒ ≤ 4 amortized
    partial-bytes per key — the same wire cost class as shuffling the
    key column).  If partial traffic ever dominates, the alternative is
    hash-partitioning keys into B buckets and building B independent
    m/B-bit segments (no full-size partials at all)."""
    batch_size = max(262_144, m_bits // 32)

    def part(b: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(m_bits, h)
        bf.add(b[col].to_numpy())
        return pd.DataFrame({"bloom": [bf.to_bytes()]})

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        w = np.stack(
            [np.frombuffer(x, dtype=np.uint64) for x in b["bloom"]]
        )
        return pd.DataFrame({"bloom": [np.bitwise_or.reduce(w, axis=0).tobytes()]})

    parts = tree_reduce(
        keys.select_columns([col]).map_batches(
            part, batch_format="pandas", batch_size=batch_size
        ),
        merge,
        max_partials=64,
    )
    w = np.bitwise_or.reduce(
        np.stack([np.frombuffer(x, dtype=np.uint64) for x in parts["bloom"]]),
        axis=0,
    )
    return BloomFilter(m_bits, h, w.copy())
