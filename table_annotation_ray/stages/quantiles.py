"""Exact distributed order statistics (quantiles) without a global
sort: histogram selection.

``exact_quantiles(ds, col, qs)`` returns, for each q, the k-th
smallest value with ``k = ceil(q * n)`` — the discrete quantile — via:

1. one ``aggregate(Min, Max, Count)`` scan for the value range,
2. one ``map_batches`` pass building per-batch equi-width histograms
   (``np.histogram`` over shared edges — mergeable int64 partials,
   combined through the sketch family's distributed ``tree_reduce``),
3. for every target rank the owning bin is found from the cumulative
   histogram; if a bin holds more rows than ``collect_below`` the
   histogram is recursively refined WITHIN that bin (another filtered
   scan, geometric shrink — at 10^12 rows and 4096 bins two refinement
   levels reach ~60k candidates), else
4. one filtered collection of just that bin's values (tiny) and an
   exact in-memory selection.

Total cost: 2 + O(log_bins(n / collect_below)) streaming scans, no
shuffle at all — compare a global ``ds.sort`` (full all-to-all
exchange) to select a handful of ranks.  Ties need no tie-break: the
VALUE at rank k is unique regardless of the ordering of equal values.

No reference counterpart (SURVEY §2 extension: sketch/statistics
family alongside HLL / Misra-Gries); the SQL oracle is the
row_number-over-order window at the same ranks.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

import ray.data as rd

from .sketches import tree_reduce

DEFAULT_BINS = 4096
DEFAULT_COLLECT_BELOW = 200_000


def _histogram(ds: rd.Dataset, col: str, lo: float, hi: float, bins: int) -> np.ndarray:
    """Distributed fixed-range histogram of ``col`` over [lo, hi] —
    per-batch ``np.histogram`` partials tree-reduced to one count row."""
    edges = np.linspace(lo, hi, bins + 1)

    def part(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(dtype=np.float64)
        v = v[(v >= lo) & (v <= hi)]
        h, _ = np.histogram(v, bins=edges)
        return pd.DataFrame({"h": [h.astype(np.int64).tobytes()]})

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        s = np.stack([np.frombuffer(x, dtype=np.int64) for x in b["h"]]).sum(axis=0)
        return pd.DataFrame({"h": [s.tobytes()]})

    parts = tree_reduce(
        ds.map_batches(part, batch_format="pandas", batch_size=262_144), merge
    )
    return np.stack(
        [np.frombuffer(x, dtype=np.int64) for x in parts["h"]]
    ).sum(axis=0)


def exact_quantiles(
    ds: rd.Dataset,
    col: str,
    qs: list[float],
    bins: int = DEFAULT_BINS,
    collect_below: int = DEFAULT_COLLECT_BELOW,
    max_refine: int = 8,
) -> pd.DataFrame:
    """Exact k-th-order-statistic quantiles of ``ds[col]`` (k =
    ceil(q·n), 1-indexed).  Returns a small DataFrame ``(q, value)`` —
    driver-sized output, streaming input."""
    from ray.data.aggregate import Count, Max, Min

    ds = ds.select_columns([col])
    stats = ds.aggregate(Min(col), Max(col), Count())
    n = int(stats["count()"])
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=float), "value": np.nan})
    gmin, gmax = float(stats[f"min({col})"]), float(stats[f"max({col})"])

    values: list[float] = []
    for q in qs:
        k = int(math.ceil(q * n))  # 1-indexed rank; q>0 assumed
        k = min(max(k, 1), n)
        lo, hi, below, span_n = gmin, gmax, 0, n
        # invariant: rank-k value lies in [lo, hi], `below` rows < lo-range
        for _ in range(max_refine):
            if span_n <= collect_below or lo == hi:
                break
            h = _histogram(ds, col, lo, hi, bins)
            edges = np.linspace(lo, hi, bins + 1)
            cum = np.cumsum(h)
            b = int(np.searchsorted(cum, k - below, side="left"))
            below += int(cum[b - 1]) if b > 0 else 0
            span_n = int(h[b])
            # np.histogram bins are [edge, edge) except the last (right-
            # closed), matching the <= hi collection filter; edges[bins]
            # == hi so the top bin never widens the range
            lo, hi = float(edges[b]), float(edges[b + 1])
        # exact selection over the (small) candidate range [lo, hi];
        # values == hi belonging to the bin above may leak in — they sort
        # after all in-range rows and the rank k-below is ≤ span_n, so
        # selection is unaffected

        cand = ds.map_batches(
            lambda bdf, lo=lo, hi=hi: pd.DataFrame(
                {col: bdf[col][(bdf[col] >= lo) & (bdf[col] <= hi)]}
            ),
            batch_format="pandas",
        ).to_pandas()[col].to_numpy(dtype=np.float64)
        cand = np.sort(cand)  # zero-copy Arrow arrays are read-only
        values.append(float(cand[(k - below) - 1]))
    return pd.DataFrame({"q": pd.Series(qs, dtype=float), "value": values})
