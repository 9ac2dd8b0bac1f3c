"""Distributed k-means (Lloyd) over an embedding column.

Each iteration is ONE streaming pass: centroids are broadcast once via
``ray.put``, every batch assigns its vectors with a single matmul
(``argmin ||x||² − 2x·C + ||C||²``) and emits a map-side-combined
partial — per-centroid vector sums and counts, ≤k rows per batch.  The
driver merges ``batches × k`` sketch-sized partials and updates the
centroids; empty clusters keep their previous centroid.  The input is
materialized once and re-scanned per iteration (no growing lineage —
the CLAUDE.md iterative-loop trap does not apply because per-iteration
outputs never feed the next iteration's input).

Init is the first ``k`` rows of the dataset (deterministic).  The final
``assign`` pass labels every vector; inertia (summed squared distance)
is accumulated on the same partials, so convergence is observable for
free.

At 100 TB: per-iteration cost = one read-through; the only driver
state is k×dim floats.  No reference counterpart (SURVEY §2 extension:
embedding family alongside ANN brute/LSH/IVF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd


def _emb_matrix(series: pd.Series) -> np.ndarray:
    return np.stack(series.to_numpy()).astype(np.float64)


def kmeans_fit(
    ds: rd.Dataset,
    col: str = "embedding",
    k: int = 8,
    iters: int = 10,
    tol: float = 1e-6,
) -> tuple[np.ndarray, list[float]]:
    """Lloyd iterations; returns (centroids [k×d], per-iteration
    inertia).  Stops early when relative inertia improvement < tol."""
    import ray

    from ..state.worker_state import get_worker_state, ref_key

    ds = ds.select_columns([col]).materialize()
    init = ds.limit(k).to_pandas()
    cents = _emb_matrix(init[col])
    if len(cents) < k:
        k = len(cents)
    history: list[float] = []

    for _ in range(iters):
        cref = ray.put(cents)

        def partials(b: pd.DataFrame) -> pd.DataFrame:
            C = get_worker_state(("km", ref_key(cref)), lambda: ray.get(cref))
            X = _emb_matrix(b[col])
            d2 = (
                (X * X).sum(axis=1, keepdims=True)
                - 2.0 * X @ C.T
                + (C * C).sum(axis=1)[None, :]
            )
            lab = d2.argmin(axis=1)
            inert = float(d2[np.arange(len(X)), lab].sum())
            rows = []
            for c in np.unique(lab):
                m = lab == c
                rows.append(
                    (int(c), X[m].sum(axis=0).tobytes(), int(m.sum()), inert)
                )
                inert = 0.0  # carry the batch inertia on the first row only
            return pd.DataFrame(
                rows, columns=["c", "vsum", "cnt", "inertia"]
            )

        p = ds.map_batches(
            partials, batch_format="pandas", batch_size=8192
        ).to_pandas()
        # canonical order before the float reductions: the streaming
        # executor does not preserve block order (preserve_order=False),
        # and float sums in arrival order would make runs diverge
        p = p.sort_values(["c", "cnt", "vsum"], kind="mergesort").reset_index(
            drop=True
        )
        history.append(float(p["inertia"].sum()))
        new = cents.copy()
        for c, grp in p.groupby("c"):
            vs = np.stack(
                [np.frombuffer(x, dtype=np.float64) for x in grp["vsum"]]
            ).sum(axis=0)
            n = int(grp["cnt"].sum())
            if n > 0:
                new[c] = vs / n
        if len(history) >= 2 and history[-2] > 0:
            if (history[-2] - history[-1]) / history[-2] < tol:
                cents = new
                break
        cents = new
    return cents, history


def kmeans_assign(
    ds: rd.Dataset,
    centroids: np.ndarray,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Label every vector with its nearest centroid — one broadcast +
    one streaming pass; returns (id, cluster, dist2)."""
    import ray

    from ..state.worker_state import get_worker_state, ref_key

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        C = get_worker_state(("kma", ref_key(cref)), lambda: ray.get(cref))
        X = _emb_matrix(b[col])
        d2 = (
            (X * X).sum(axis=1, keepdims=True)
            - 2.0 * X @ C.T
            + (C * C).sum(axis=1)[None, :]
        )
        lab = d2.argmin(axis=1)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "cluster": lab.astype(np.int64),
                "dist2": d2[np.arange(len(X)), lab],
            }
        )

    return ds.select_columns([id_col, col]).map_batches(
        assign, batch_format="pandas"
    )
