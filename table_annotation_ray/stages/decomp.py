"""Distributed PCA — exact principal components from one streaming
moment pass.

``pca_fit`` computes the exact covariance eigendecomposition without
ever materializing the data matrix: each batch emits a mergeable moment
partial (count n, feature sum s ∈ R^d, Gram X'X ∈ R^{d×d}, serialized
to bytes like the HLL registers in stages/sketches.py), the partials
collapse through :func:`~.sketches.tree_reduce` (sums are associative),
and the driver eigendecomposes the d×d covariance

    C = (G − n·μμ') / (n − 1)

— O(d²) driver state regardless of row count.  Components get a
deterministic sign convention (largest-|entry| coordinate positive), so
repeated fits agree.  Merge tiers sort partials canonically before
summing, so a given block layout reproduces bitwise; across different
layouts results agree to float-sum reordering (~1e-12 relative), which
the tests bound.

``pca_transform`` is a stateless broadcast map: (X − μ)·W' emitted as
``pc0..pc{k-1}`` double columns — joins, filters and sinks compose
downstream.

Partitioning assumptions: d² fits comfortably in a partial row (d up to
a few thousand); for d beyond that use randomized sketched PCA instead
(not implemented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from .sketches import tree_reduce


def _batch_matrix(col: pd.Series) -> np.ndarray:
    return np.stack(col.to_numpy()).astype(np.float64, copy=False)


def pca_fit(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    n_components: int = 2,
    batch_size: int = 8192,
) -> dict:
    """Returns {"mean": (d,), "components": (k,d), "explained_variance":
    (k,), "explained_variance_ratio": (k,), "n": int}."""

    def part(b: pd.DataFrame) -> pd.DataFrame:
        X = _batch_matrix(b[vec_col])
        g = X.T @ X
        return pd.DataFrame(
            {
                "n": np.array([len(X)], dtype=np.int64),
                "d": np.array([X.shape[1]], dtype=np.int64),
                "s": [X.sum(axis=0).tobytes()],
                "g": [g.tobytes()],
            }
        )

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        # canonical order -> deterministic float summation per tier
        b = b.sort_values(["n", "s"], kind="mergesort")
        d = int(b["d"].iloc[0])
        s = np.zeros(d)
        g = np.zeros((d, d))
        for sb, gb in zip(b["s"], b["g"]):
            s += np.frombuffer(sb, dtype=np.float64)
            g += np.frombuffer(gb, dtype=np.float64).reshape(d, d)
        return pd.DataFrame(
            {
                "n": np.array([int(b["n"].sum())], dtype=np.int64),
                "d": np.array([d], dtype=np.int64),
                "s": [s.tobytes()],
                "g": [g.tobytes()],
            }
        )

    parts = ds.map_batches(part, batch_format="pandas", batch_size=batch_size)
    final = merge(tree_reduce(parts, merge))
    n = int(final["n"].iloc[0])
    d = int(final["d"].iloc[0])
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    s = np.frombuffer(final["s"].iloc[0], dtype=np.float64)
    g = np.frombuffer(final["g"].iloc[0], dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    k = min(n_components, d)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    # deterministic sign: largest-|entry| coordinate positive
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = evals[order]
    total_var = float(np.trace(cov))
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": ev,
        "explained_variance_ratio": ev / total_var if total_var > 0 else ev * 0.0,
        "n": n,
    }


def pca_transform(
    ds: rd.Dataset,
    model: dict,
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
    batch_size: int = 8192,
) -> rd.Dataset:
    """Project onto the fitted components: double columns pc0..pc{k-1}
    (plus ``keep_cols``), one vectorized matmul per batch."""
    import pyarrow as pa

    mean = np.asarray(model["mean"])
    comps = np.asarray(model["components"])
    keep = keep_cols or []

    def project(b: pd.DataFrame) -> pa.Table:
        X = _batch_matrix(b[vec_col])
        P = (X - mean) @ comps.T
        cols = {c: b[c].to_numpy() for c in keep}
        for i in range(comps.shape[0]):
            cols[f"pc{i}"] = P[:, i]
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pandas", batch_size=batch_size)


def random_project(
    ds: rd.Dataset,
    out_dim: int = 16,
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
    seed: int = 42,
    batch_size: int = 8192,
) -> rd.Dataset:
    """Johnson–Lindenstrauss random projection — the zero-pass
    dimensionality reducer beside :func:`pca_fit` (Achlioptas 2003;
    sklearn GaussianRandomProjection semantics): ``x → x Rᵀ / √m`` with
    R an m×d standard-Gaussian matrix drawn ONCE from ``seed``.
    Pairwise distances are preserved to (1±ε) with m = O(log n / ε²) —
    no data pass, no model state, fully map-only (the 100-TB path when
    PCA's Gram pass is too expensive or d is huge).

    The projection matrix is built lazily per worker from (seed, d, m)
    — deterministic everywhere, nothing is shipped.  Emits double
    columns ``rp0..rp{m-1}`` plus ``keep_cols``."""
    import pyarrow as pa

    from ..state.worker_state import get_worker_state

    keep = keep_cols or []

    def project(b: pd.DataFrame) -> pa.Table:
        X = _batch_matrix(b[vec_col])
        d = X.shape[1]
        R = get_worker_state(
            ("jl", seed, d, out_dim),
            lambda: np.random.default_rng(seed).standard_normal((out_dim, d))
            / np.sqrt(out_dim),
        )
        P = X @ R.T
        cols = {c: b[c].to_numpy() for c in keep}
        for i in range(out_dim):
            cols[f"rp{i}"] = P[:, i]
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pandas", batch_size=batch_size)


def frequent_directions(
    ds: rd.Dataset,
    col: str = "embedding",
    ell: int = 16,
) -> np.ndarray:
    """Frequent-Directions matrix sketch (Liberty 2013) — the streaming
    low-rank summary of a tall embedding matrix: an ``ell x d`` sketch
    ``B`` with the deterministic guarantee

        0 <= x'A'Ax - x'B'Bx <= ||A||_F^2 / ell     for all unit x

    i.e. the sketch's Gram matrix underestimates the true one by at
    most the (controllable) additive term — the principal subspace of
    100 TB of embeddings in ``O(ell * d)`` memory, no global pass
    structure required (vs :func:`pca_fit`'s exact d x d Gram, which
    needs d small).

    Shape: each batch SVD-shrinks its own rows into a ``<= 2*ell x d``
    partial; partials merge associatively (stack + shrink) through the
    sketch family's :func:`tree_reduce`; the driver folds <=128 final
    partials.  Merge ORDER affects the exact basis (floats), never the
    guarantee — pytest pins the error bound and the subspace, not the
    bits.  Returns the ``ell x d`` sketch matrix.
    """
    from .sketches import tree_reduce
    from .similarity import _stack

    L = int(ell)

    def _shrink(M: np.ndarray) -> np.ndarray:
        if M.shape[0] <= L:
            return M
        _, s, vt = np.linalg.svd(M, full_matrices=False)
        keep = min(L, len(s))
        delta = s[keep - 1] ** 2 if len(s) >= keep else 0.0
        s2 = np.sqrt(np.maximum(s[:keep] ** 2 - delta, 0.0))
        return s2[:, None] * vt[:keep]

    def sketch_batch(b: pd.DataFrame) -> pd.DataFrame:
        X = _stack(b[col])
        Bm = _shrink(X)
        return pd.DataFrame({"sk": [Bm.astype(np.float64).tobytes()],
                             "d": [Bm.shape[1]], "r": [Bm.shape[0]]})

    def merge_fn(b: pd.DataFrame) -> pd.DataFrame:
        mats = [
            np.frombuffer(sk, dtype=np.float64).reshape(int(r), int(d))
            for sk, d, r in zip(b["sk"], b["d"], b["r"])
        ]
        M = _shrink(np.vstack(mats))
        return pd.DataFrame({"sk": [M.tobytes()], "d": [M.shape[1]],
                             "r": [M.shape[0]]})

    parts = tree_reduce(
        ds.select_columns([col]).map_batches(
            sketch_batch, batch_format="pandas", batch_size=4096
        ),
        merge_fn,
    )
    mats = [
        np.frombuffer(sk, dtype=np.float64).reshape(int(r), int(d))
        for sk, d, r in zip(parts["sk"], parts["d"], parts["r"])
    ]
    out = _shrink(np.vstack(mats))
    if out.shape[0] < L:  # tiny inputs: pad with zero rows to ell x d
        out = np.vstack([out, np.zeros((L - out.shape[0], out.shape[1]))])
    return out
