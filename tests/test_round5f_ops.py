"""Round-5 final-wave operators: roc_auc, neighbor_agg,
changepoint_by_key (+ their query compositions)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _auc_pairwise(y: np.ndarray, s: np.ndarray) -> float:
    """O(n_pos * n_neg) reference: P(s_pos > s_neg) + 0.5 P(ties)."""
    pos = s[y == 1]
    neg = s[y == 0]
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    return (gt + 0.5 * eq) / (len(pos) * len(neg))


def test_roc_auc_vs_pairwise(ray_session):
    from table_annotation_ray.stages.stats import roc_auc

    rng = np.random.default_rng(7)
    n = 400
    y = (rng.random(n) < 0.3).astype(np.int64)
    # scores correlated with label, quantized to force heavy ties
    s = np.round(rng.normal(0, 1, n) + 1.2 * y, 1)
    df = pd.DataFrame({"label": y, "score": s})
    r = roc_auc(rd.from_pandas(df).repartition(4), "label", "score")
    ref = _auc_pairwise(y, s)
    assert r["n_pos"] == int(y.sum()) and r["n_neg"] == int((1 - y).sum())
    assert r["auc"] == pytest.approx(ref, abs=1e-12)
    # u2 is the exact integer 2U
    assert r["u2"] == int(round(2 * ref * r["n_pos"] * r["n_neg"]))
    # perfect separation -> 1.0
    r2 = roc_auc(
        rd.from_pandas(pd.DataFrame({"label": [0, 0, 1, 1], "score": [1.0, 2.0, 3.0, 4.0]})),
        "label",
        "score",
    )
    assert r2["auc"] == 1.0 and r2["u2"] == 8


def test_neighbor_agg_vs_pandas(ray_session):
    from table_annotation_ray.stages.graph import neighbor_agg

    rng = np.random.default_rng(3)
    edges = pd.DataFrame(
        {"src": rng.integers(0, 20, 60), "dst": rng.integers(0, 20, 60)}
    )
    edges = edges[edges["src"] != edges["dst"]].drop_duplicates()
    feats = pd.DataFrame({"node": np.arange(20), "feat": rng.integers(1, 100, 20)})
    fmap = dict(zip(feats["node"], feats["feat"]))

    for directed in (False, True):
        if directed:
            msgs = edges.rename(columns={"src": "node", "dst": "nbr"})
        else:
            msgs = pd.concat(
                [
                    edges.rename(columns={"src": "node", "dst": "nbr"}),
                    edges.rename(columns={"dst": "node", "src": "nbr"}),
                ]
            )
        ref = (
            msgs.assign(f=msgs["nbr"].map(fmap))
            .groupby("node")
            .agg(n_neighbors=("f", "size"), feat_sum=("f", "sum"))
            .reset_index()
        )
        for bb in (2_000_000, 0):  # broadcast, then bucketed co-location
            out = (
                neighbor_agg(
                    rd.from_pandas(edges).repartition(3),
                    rd.from_pandas(feats).repartition(2),
                    directed=directed,
                    broadcast_below=bb,
                )
                .to_pandas()
                .sort_values("node")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                out.astype("int64"),
                ref.sort_values("node").reset_index(drop=True).astype("int64"),
            )


def test_changepoint_by_key_vs_numpy(ray_session):
    from table_annotation_ray.stages.windows import changepoint_by_key

    rng = np.random.default_rng(11)
    rows = []
    truth = {}
    for uid in range(12):
        n = int(rng.integers(5, 40))
        cp = int(rng.integers(2, n - 1))
        x = np.concatenate(
            [rng.integers(0, 50, cp), rng.integers(200, 260, n - cp)]
        ).astype(np.int64)
        order = rng.permutation(n)  # rows arrive shuffled
        for i in order:
            rows.append((uid, int(i), int(x[i])))
        # reference argmax of |n*S_k - k*S_n|, earliest k
        s = np.cumsum(x)
        k = np.arange(1, n + 1)
        stat = np.abs(n * s - k * s[-1])[:-1]
        truth[uid] = (n, int(np.argmax(stat)) + 1, int(stat.max()), cp)
    df = pd.DataFrame(rows, columns=["user_id", "pos", "value"])
    out = (
        changepoint_by_key(
            rd.from_pandas(df).repartition(5), "user_id", ["pos"], "value"
        )
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert len(out) == 12
    for uid, (n, cp_pos, stat, planted) in truth.items():
        row = out.loc[uid]
        assert int(row["n"]) == n
        assert int(row["cp_pos"]) == cp_pos
        assert int(row["stat"]) == stat
        # with a 4x mean shift the argmax sits at the planted split
        assert cp_pos == planted
    # single-row keys emit nothing
    one = changepoint_by_key(
        rd.from_pandas(pd.DataFrame({"user_id": [1], "pos": [0], "value": [5]})),
        "user_id",
        ["pos"],
        "value",
    ).to_pandas()
    assert len(one) == 0


def test_als_recovers_planted_low_rank(ray_session):
    from table_annotation_ray.stages.factorize import als_factorize, als_rmse

    rng = np.random.default_rng(5)
    n_u, n_i, r = 30, 20, 2
    u0 = rng.uniform(0.5, 1.5, (n_u, r))
    v0 = rng.uniform(0.5, 1.5, (n_i, r))
    m = u0 @ v0.T  # values ~ [0.5, 4.5]
    users, items = np.meshgrid(np.arange(n_u), np.arange(n_i), indexing="ij")
    df = pd.DataFrame(
        {
            "user": users.ravel().astype(np.int64),
            "item": items.ravel().astype(np.int64),
            "r": m.ravel(),
        }
    ).sample(frac=0.8, random_state=1)  # sparse observation of the matrix
    ds = rd.from_pandas(df).repartition(4)
    ufac, vfac = als_factorize(
        ds, "user", "item", "r", k=4, iters=6, reg=0.01, num_buckets=8
    )
    assert ufac.count() == n_u and vfac.count() == n_i
    rmse = als_rmse(ds, ufac, vfac, "user", "item", "r", num_buckets=8)
    assert rmse < 0.05  # rank-4 fit of an exact rank-2 matrix
    # driver-side sanity: reconstruct and compare to the true matrix
    up = ufac.to_pandas().set_index("id").sort_index()
    vp = vfac.to_pandas().set_index("id").sort_index()
    pred = up.to_numpy() @ vp.to_numpy().T
    mask = np.zeros((n_u, n_i), bool)
    mask[df["user"], df["item"]] = True
    assert np.abs((pred - m)[mask]).mean() < 0.05


def test_random_project_jl(ray_session):
    from table_annotation_ray.stages.decomp import random_project

    rng = np.random.default_rng(2)
    n, d, m = 200, 64, 24
    X = rng.normal(0, 1, (n, d))
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": [list(r) for r in X]})
    out = (
        random_project(
            rd.from_pandas(df).repartition(4),
            out_dim=m,
            keep_cols=["vec_id"],
            seed=7,
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # exact numpy equivalence: same seed -> same R -> same product
    R = np.random.default_rng(7).standard_normal((m, d)) / np.sqrt(m)
    np.testing.assert_allclose(
        out[[f"rp{i}" for i in range(m)]].to_numpy(), X @ R.T, rtol=1e-12
    )
    # JL property: pairwise distances preserved within a loose band
    P = out[[f"rp{i}" for i in range(m)]].to_numpy()
    idx = rng.integers(0, n, (100, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    d_orig = np.linalg.norm(X[idx[:, 0]] - X[idx[:, 1]], axis=1)
    d_proj = np.linalg.norm(P[idx[:, 0]] - P[idx[:, 1]], axis=1)
    ratio = d_proj / d_orig
    assert 0.6 < ratio.min() and ratio.max() < 1.5
    assert abs(ratio.mean() - 1.0) < 0.1
