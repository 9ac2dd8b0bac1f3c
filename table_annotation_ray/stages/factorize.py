"""Distributed ALS matrix factorization — alternating ridge solves
over an implicit/explicit rating table (Koren, Bell & Volinsky 2009;
the Spark MLlib ALS data layout rethought for Ray Data exchanges).

Beyond-reference operator (no counterpart in
Orange-OpenSource/Table-Annotation): the collaborative-filtering /
embedding-learning primitive of a training-data platform.

Scale contract — NOTHING is ever broadcast or driver-held, factor
matrices included (at 100 TB both the user and item sides can be
corpus-cardinality):

* Ratings are tagged ``bucket = hash(side) % num_buckets`` ONCE per
  side and materialized — like PageRank's edge tagging, the static
  table never re-ships per iteration through a re-tag.
* Each half-step (solve users from item factors, then the mirror) is
  TWO bounded exchanges: (1) the current factor rows co-locate with
  the ratings tagged by the SAME hash (tag-union ``groupby(bucket)``,
  the repo's join idiom), and the in-bucket pass emits per-(bucket,
  target) pre-summed normal-equation partials — ``k² + k + 1`` floats
  per target, never one row per rating; (2) one ``grouped_reduce``
  sums partials per target, then a map-only batched
  ``np.linalg.solve`` over the stacked (n, k, k) systems emits the new
  factor rows.  Per-target Gram matrices bound memory at ``k² ≤ 1024``
  floats regardless of degree.
* Per-iteration factor Datasets are materialized (they feed the next
  half-step twice) with block counts capped by the bucket count —
  lineage stays flat across iterations (CLAUDE.md r2 loop rule).

Regularization is the weighted-λ variant (``λ·n_u·I``), scale-free in
the rating counts.  Float partial sums reduce in arrival order, so
factors are run-deterministic only to ~1e-12; tests assert planted
low-rank recovery, not bit equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_MAX_K = 32


def _fcols(k: int) -> list[str]:
    return [f"f{i}" for i in range(k)]


def _hash_init(ids: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Deterministic per-(id, dim) init in [-0.5, 0.5)/sqrt(k) — stable
    under any partitioning (no RNG state crosses workers)."""
    base = ids.astype(np.uint64)[:, None] * np.uint64(k) + np.arange(
        k, dtype=np.uint64
    )
    h = pd.util.hash_array(base.ravel() + np.uint64(seed * 0x9E3779B9))
    u = (h.astype(np.float64) / 2.0**64) - 0.5
    return (u / np.sqrt(k)).reshape(len(ids), k)


def _tag(
    ratings: rd.Dataset,
    user_col: str,
    item_col: str,
    val_col: str,
    by: str,
    k: int,
    nb: int,
) -> rd.Dataset:
    """Ratings under the union schema, bucketed by hash(``by``)."""
    fc = _fcols(k)

    def prep(b: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_pandas_object(b[by], index=False).to_numpy()
        cols = {
            "__id": pa.array(b[by].to_numpy(dtype=np.int64), pa.int64()),
            "__other": pa.array(
                b[item_col if by == user_col else user_col].to_numpy(
                    dtype=np.int64
                ),
                pa.int64(),
            ),
            "__r": pa.array(b[val_col].to_numpy(dtype=np.float64), pa.float64()),
            "__side": pa.array(np.zeros(len(b), np.int8), pa.int8()),
            "__bkt": pa.array(
                (h.astype(np.uint64) % np.uint64(nb)).astype(np.int64), pa.int64()
            ),
        }
        zero = np.zeros(len(b), np.float64)
        for c in fc:
            cols[c] = pa.array(zero, pa.float64())
        return pa.table(cols)

    return ratings.map_batches(prep, batch_format="pandas")


def _tag_factors(factors: rd.Dataset, k: int, nb: int) -> rd.Dataset:
    fc = _fcols(k)

    def prep(b: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_pandas_object(b["id"], index=False).to_numpy()
        cols = {
            "__id": pa.array(b["id"].to_numpy(dtype=np.int64), pa.int64()),
            "__other": pa.array(np.zeros(len(b), np.int64), pa.int64()),
            "__r": pa.array(np.zeros(len(b), np.float64), pa.float64()),
            "__side": pa.array(np.ones(len(b), np.int8), pa.int8()),
            "__bkt": pa.array(
                (h.astype(np.uint64) % np.uint64(nb)).astype(np.int64), pa.int64()
            ),
        }
        for c in fc:
            cols[c] = pa.array(b[c].to_numpy(dtype=np.float64), pa.float64())
        return pa.table(cols)

    return factors.map_batches(prep, batch_format="pandas")


def _half_step(
    tagged_ratings: rd.Dataset,
    src_factors: rd.Dataset,
    k: int,
    reg: float,
    num_buckets: int,
) -> rd.Dataset:
    """Solve the TARGET side's factors given the SOURCE side's.
    ``tagged_ratings`` must be tagged by the SOURCE id (``__id`` is the
    source, ``__other`` the target)."""
    from .agg import grouped_reduce

    fc = _fcols(k)
    gcols = [f"g{i}" for i in range(k * k)]

    def partials(g: pd.DataFrame) -> pa.Table:
        rows = g[g["__side"] == 0]
        fac = g[g["__side"] == 1][["__id", *fc]]
        m = rows[["__id", "__other", "__r"]].merge(fac, on="__id")
        if len(m) == 0:
            cols = {"__t": pa.array([], pa.int64())}
            for c in gcols + [f"b{i}" for i in range(k)] + ["n"]:
                cols[c] = pa.array([], pa.float64())
            return pa.table(cols)
        x = m[fc].to_numpy()
        r = m["__r"].to_numpy()
        outer = (x[:, :, None] * x[:, None, :]).reshape(len(m), k * k)
        rx = x * r[:, None]
        part = pd.DataFrame(
            np.hstack([outer, rx, np.ones((len(m), 1))]),
            columns=gcols + [f"b{i}" for i in range(k)] + ["n"],
        )
        part["__t"] = m["__other"].to_numpy()
        agg = part.groupby("__t", sort=False).sum().reset_index()
        cols = {"__t": pa.array(agg["__t"].to_numpy(dtype=np.int64), pa.int64())}
        for c in gcols + [f"b{i}" for i in range(k)] + ["n"]:
            cols[c] = pa.array(agg[c].to_numpy(), pa.float64())
        return pa.table(cols)

    summed = grouped_reduce(
        tagged_ratings.union(src_factors).groupby("__bkt").map_groups(
            partials, batch_format="pandas"
        ),
        ["__t"],
        {
            c: (c, "sum")
            for c in gcols + [f"b{i}" for i in range(k)] + ["n"]
        },
        num_buckets=num_buckets,
    )

    def solve(b: pd.DataFrame) -> pa.Table:
        n = len(b)
        a = b[gcols].to_numpy().reshape(n, k, k)
        a = a + reg * b["n"].to_numpy()[:, None, None] * np.eye(k)[None, :, :]
        rhs = b[[f"b{i}" for i in range(k)]].to_numpy()
        sol = np.linalg.solve(a, rhs)
        cols = {"id": pa.array(b["__t"].to_numpy(dtype=np.int64), pa.int64())}
        for i, c in enumerate(fc):
            cols[c] = pa.array(sol[:, i], pa.float64())
        return pa.table(cols)

    return summed.map_batches(solve, batch_format="pandas")


def als_factorize(
    ratings: rd.Dataset,
    user_col: str,
    item_col: str,
    val_col: str,
    k: int = 8,
    iters: int = 5,
    reg: float = 0.1,
    num_buckets: int = 64,
    seed: int = 42,
) -> tuple[rd.Dataset, rd.Dataset]:
    """Factorize the (user, item, value) table into rank-``k`` user and
    item factor Datasets ``(id, f0..f{k-1})``.  Ids must be int64;
    see the module docstring for the exchange shape."""
    if not 1 <= k <= _MAX_K:
        raise ValueError(f"k must be in [1, {_MAX_K}]")
    fc = _fcols(k)

    by_item = _tag(
        ratings, user_col, item_col, val_col, item_col, k, num_buckets
    ).materialize()
    by_user = _tag(
        ratings, user_col, item_col, val_col, user_col, k, num_buckets
    ).materialize()

    def init_items(b: pd.DataFrame) -> pa.Table:
        ids = b["__id"].to_numpy(dtype=np.int64)
        v = _hash_init(ids, k, seed)
        cols = {"id": pa.array(ids, pa.int64())}
        for i, c in enumerate(fc):
            cols[c] = pa.array(v[:, i], pa.float64())
        return pa.table(cols)

    from .agg import grouped_reduce

    item_ids = grouped_reduce(
        by_item.select_columns(["__id"]), ["__id"], {"n": (None, "count")},
        num_buckets=num_buckets,
    )
    vfac = item_ids.map_batches(init_items, batch_format="pandas").materialize()

    ufac = None
    for _ in range(iters):
        ufac = _half_step(
            by_item, _tag_factors(vfac, k, num_buckets), k, reg, num_buckets
        ).materialize()
        vfac = _half_step(
            by_user, _tag_factors(ufac, k, num_buckets), k, reg, num_buckets
        ).materialize()
    return ufac, vfac


def als_rmse(
    ratings: rd.Dataset,
    ufac: rd.Dataset,
    vfac: rd.Dataset,
    user_col: str,
    item_col: str,
    val_col: str,
    num_buckets: int = 64,
) -> float:
    """Reconstruction RMSE of the factor model over the rating table —
    two tag-union co-locations (attach u, then v) + one scalar
    aggregate; nothing driver-side scales with anything."""
    k = len([c for c in ufac.schema().names if c.startswith("f")])

    tagged = _tag(ratings, user_col, item_col, val_col, user_col, k, num_buckets)

    def attach(g: pd.DataFrame) -> pa.Table:
        fc = _fcols(k)
        rows = g[g["__side"] == 0]
        fac = g[g["__side"] == 1][["__id", *fc]]
        m = rows[["__id", "__other", "__r"]].merge(fac, on="__id")
        # re-key by the OTHER side for the second co-location
        cols = {
            "__id": pa.array(m["__other"].to_numpy(dtype=np.int64), pa.int64()),
            "__other": pa.array(np.zeros(len(m), np.int64), pa.int64()),
            "__r": pa.array(m["__r"].to_numpy(), pa.float64()),
            "__side": pa.array(np.zeros(len(m), np.int8), pa.int8()),
            "__bkt": pa.array(
                (
                    pd.util.hash_pandas_object(
                        m["__other"], index=False
                    ).to_numpy()
                    % np.uint64(num_buckets)
                ).astype(np.int64),
                pa.int64(),
            ),
        }
        for c in fc:
            cols[c] = pa.array(m[c].to_numpy(), pa.float64())
        return pa.table(cols)

    def score(g: pd.DataFrame) -> pa.Table:
        fc = _fcols(k)
        rows = g[g["__side"] == 0]
        fac = g[g["__side"] == 1][["__id", *fc]]
        m = rows[["__id", "__r", *fc]].merge(
            fac, on="__id", suffixes=("_u", "_v")
        )
        pred = np.einsum(
            "ij,ij->i",
            m[[c + "_u" for c in fc]].to_numpy(),
            m[[c + "_v" for c in fc]].to_numpy(),
        )
        err = m["__r"].to_numpy() - pred
        return pa.table(
            {
                "se": pa.array([float((err * err).sum())], pa.float64()),
                "n": pa.array([float(len(m))], pa.float64()),
            }
        )

    with_u = (
        tagged.union(_tag_factors(ufac, k, num_buckets))
        .groupby("__bkt")
        .map_groups(attach, batch_format="pandas")
    )
    parts = (
        with_u.union(_tag_factors(vfac, k, num_buckets))
        .groupby("__bkt")
        .map_groups(score, batch_format="pandas")
        .to_pandas()
    )
    return float(np.sqrt(parts["se"].sum() / max(parts["n"].sum(), 1.0)))
