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


def kmeans_silhouette(
    ds: rd.Dataset,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Simplified (centroid-based) silhouette per cluster — the k-means
    quality diagnostic at corpus scale, where the classic all-pairs
    silhouette is O(n²) and the standard substitute scores each point
    against CENTROIDS: ``a`` = distance to own centroid, ``b`` = min
    distance to any other, ``s = (b - a) / max(a, b)`` (0 where both
    are 0).  Returns one row per cluster: ``(cluster, n, mean_sil)``
    (half-away 6 dp).

    Map-only over broadcast centroids (one matmul per batch — the
    kmeans_assign shape) + one bounded grouped_reduce over k partials;
    nothing else moves.  Pinned against a single-process numpy
    reference in pytest (rows-only; no SQL equivalent worth having)."""
    import pyarrow as pa

    import ray

    from ..state.worker_state import get_worker_state, ref_key
    from .agg import grouped_reduce

    c = np.asarray(centroids, dtype=np.float64)
    if c.ndim != 2 or len(c) < 2:
        raise ValueError("need a (k>=2, d) centroid matrix")
    cref = ray.put(c)

    def score(b: pd.DataFrame, _c=cref) -> pa.Table:
        cc = get_worker_state(("sil-c", ref_key(_c)), lambda: ray.get(_c))
        x = _emb_matrix(b[emb_col])
        # squared distances via the expansion; exact enough and one GEMM
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * x @ cc.T
            + (cc * cc).sum(axis=1)[None, :]
        )
        d = np.sqrt(np.maximum(d2, 0.0))
        own = np.argmin(d, axis=1)
        a = d[np.arange(len(d)), own]
        d[np.arange(len(d)), own] = np.inf
        bdist = d.min(axis=1)
        denom = np.maximum(a, bdist)
        s = np.where(denom > 0, (bdist - a) / np.where(denom > 0, denom, 1.0), 0.0)
        part = (
            pd.DataFrame({"cluster": own.astype(np.int64), "s": s})
            .groupby("cluster", sort=False)
            .agg(n=("s", "size"), s_sum=("s", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "cluster": pa.array(part["cluster"].to_numpy(), pa.int64()),
                "n": pa.array(part["n"].to_numpy(), pa.int64()),
                "s_sum": pa.array(part["s_sum"].to_numpy(), pa.float64()),
            }
        )

    agg = grouped_reduce(
        ds.select_columns([emb_col]).map_batches(score, batch_format="pandas"),
        ["cluster"],
        {"n": ("n", "sum"), "s_sum": ("s_sum", "sum")},
        num_buckets=num_buckets,
    )

    def finalize(t) -> "pa.Table":
        import pyarrow as _pa

        n = t["n"].to_numpy()
        m = t["s_sum"].to_numpy(zero_copy_only=False) / np.maximum(n, 1)
        m = np.sign(m) * np.floor(np.abs(m) * 1e6 + 0.5) / 1e6
        return _pa.table(
            {
                "cluster": t["cluster"].combine_chunks(),
                "n": t["n"].combine_chunks(),
                "mean_sil": _pa.array(m, _pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def kcenter_coreset(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    col: str = "embedding",
    k: int = 16,
) -> pd.DataFrame:
    """Greedy k-center coreset selection (Gonzalez 2-approximation) —
    the diversity-maximizing subset picker used for training-data
    coresets and prototype selection: start from the smallest id, then
    repeatedly take the point FARTHEST from the chosen set.

    Fully distributed state: the running min-distance-to-centers lives
    as a COLUMN on the embedding dataset (updated by one map pass per
    round against the newly chosen center, broadcast in the closure);
    the driver only ever reduces per-block (max, argmax) partials —
    k rounds × one map pass, no driver-side matrix.  Distances are
    squared L2 in float64 (identical per-row ops regardless of block
    layout, so results are partitioning-independent); argmax ties break
    to the smaller id.  Returns ``(order, id, radius)`` where
    ``radius`` is the max-min squared distance at selection time (the
    coverage radius sequence; radius of order 0 is NULL).
    """
    import pyarrow as pa

    base = ds.select_columns([id_col, col]).materialize()

    # seed: smallest id (per-block min partials -> driver reduce)
    def min_id(b: pd.DataFrame) -> pd.DataFrame:
        i = b[id_col].idxmin()
        return b.loc[[i], [id_col, col]]

    seeds = base.map_batches(min_id, batch_format="pandas").to_pandas()
    srow = seeds.loc[seeds[id_col].idxmin()]
    centers = [(int(srow[id_col]), np.asarray(srow[col], dtype=np.float64))]
    radii: list[float] = [float("nan")]

    st = base
    for _ in range(1, k):
        cvec = centers[-1][1]

        def upd(b: pd.DataFrame, _c=cvec) -> pa.Table:
            X = _emb_matrix(b[col])
            d = ((X - _c[None, :]) ** 2).sum(axis=1)
            if "__kc_mind" in b.columns:
                d = np.minimum(b["__kc_mind"].to_numpy(dtype=np.float64), d)
            from table_annotation_ray.stages.similarity import _list_col

            return pa.table(
                {
                    id_col: pa.array(
                        b[id_col].to_numpy(dtype=np.int64), pa.int64()
                    ),
                    col: _list_col(X),
                    "__kc_mind": pa.array(d, pa.float64()),
                }
            )

        st = st.map_batches(upd, batch_format="pandas").materialize()

        def far(b: pd.DataFrame) -> pd.DataFrame:
            d = b["__kc_mind"].to_numpy(dtype=np.float64)
            ids = b[id_col].to_numpy(dtype=np.int64)
            best = np.lexsort((ids, -d))[0]  # max dist, then min id
            return b.iloc[[best]]

        cand = st.map_batches(far, batch_format="pandas").to_pandas()
        d = cand["__kc_mind"].to_numpy(dtype=np.float64)
        ids = cand[id_col].to_numpy(dtype=np.int64)
        best = np.lexsort((ids, -d))[0]
        centers.append(
            (int(ids[best]), np.asarray(cand[col].iloc[best], dtype=np.float64))
        )
        radii.append(float(d[best]))

    return pd.DataFrame(
        {
            "order": np.arange(len(centers), dtype=np.int64),
            "id": np.array([c[0] for c in centers], dtype=np.int64),
            "radius": np.array(radii, dtype=np.float64),
        }
    )


def centroid_outliers(
    ds: rd.Dataset,
    label_col: str = "label",
    id_col: str = "vec_id",
    col: str = "embedding",
    top_k: int = 5,
) -> rd.Dataset:
    """Per-label embedding outliers: the ``top_k`` vectors FARTHEST
    (squared L2) from their own label's centroid — the mislabeled-
    example / contamination triage view of an embedded, labeled corpus.

    Shape: per-(batch, label) vector-sum partials (one skinny
    label-count-bounded exchange) → driver centroids → broadcast →
    map-only distance pass → ``grouped_topk`` per label (map-side
    combiner keeps ≤k per batch).  Centroid sums are float (order-
    dependent in the last ulp), so distances are reported rounded to
    6 dp — a diagnostic ranking, not an oracle quantity (rows-only;
    the numpy equivalence is pinned at rtol in pytest).  Output
    ``(label, id, dist2)``.
    """
    import pyarrow as pa

    from .relational import grouped_topk

    def partial(b: pd.DataFrame) -> pa.Table:
        rows_l, rows_n, rows_s = [], [], []
        for lab, sub in b.groupby(label_col, sort=False):
            X = _emb_matrix(sub[col])
            rows_l.append(lab)
            rows_n.append(len(sub))
            rows_s.append(X.sum(axis=0).tobytes())
        return pa.table(
            {
                label_col: pa.array(rows_l),
                "n": pa.array(rows_n, pa.int64()),
                "s": pa.array(rows_s, pa.binary()),
            }
        )

    parts = (
        ds.select_columns([label_col, col])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    cents = {}
    for lab, sub in parts.groupby(label_col, sort=True):
        s = np.stack(
            [np.frombuffer(x, dtype=np.float64) for x in sub["s"]]
        ).sum(axis=0)
        cents[lab] = s / float(sub["n"].sum())

    def dist(b: pd.DataFrame) -> pa.Table:
        X = _emb_matrix(b[col])
        labs = b[label_col].to_numpy()
        C = np.stack([cents[l] for l in labs])
        d = ((X - C) ** 2).sum(axis=1)
        d = np.floor(d * 1e6 + 0.5) / 1e6  # round half-away, 6 dp
        return pa.table(
            {
                label_col: pa.array(labs),
                id_col: pa.array(b[id_col].to_numpy(dtype=np.int64),
                                 pa.int64()),
                "dist2": pa.array(d, pa.float64()),
            }
        )

    scored = ds.map_batches(dist, batch_format="pandas")
    return grouped_topk(scored, [label_col], "dist2", top_k,
                        descending=True, tiebreak=id_col)
