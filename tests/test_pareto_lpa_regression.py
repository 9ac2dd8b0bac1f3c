"""Round-5 late operators: skyline (Pareto frontier), per-key linear
regression, label-propagation communities — each vs an in-memory
single-process reference with identical semantics."""

import itertools
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

import ray.data as rd


# ---------------------------------------------------------------- skyline


def _ref_skyline(df: pd.DataFrame, minimize, maximize) -> pd.DataFrame:
    """O(n²) NOT-EXISTS dominance, the SQL semantics verbatim."""
    crit = df[list(minimize) + list(maximize)].astype(float).copy()
    for c in maximize:
        crit[c] = -crit[c]
    m = crit.to_numpy()
    keep = np.ones(len(m), bool)
    for i in range(len(m)):
        dom = (m <= m[i]).all(axis=1) & (m < m[i]).any(axis=1)
        if dom.any():
            keep[i] = False
    return df[keep].reset_index(drop=True)


def test_skyline_matches_bruteforce(ray_session):
    from table_annotation_ray.stages.relational import skyline

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "id": np.arange(500, dtype=np.int64),
            "price": rng.integers(1, 60, 500).astype(np.int64),
            "size": rng.integers(1, 60, 500).astype(np.int64),
        }
    )
    # exact duplicates of a guaranteed-frontier point must BOTH survive
    df.loc[498, ["price", "size"]] = (1, 59)
    df.loc [499, ["price", "size"]] = (1, 59)

    out = skyline(
        rd.from_pandas(df).repartition(6),
        minimize=["price"],
        maximize=["size"],
        batch_size=64,
    ).sort_values("id")
    ref = _ref_skyline(df, ["price"], ["size"]).sort_values("id")
    assert out["id"].tolist() == ref["id"].tolist()
    assert {498, 499} <= set(out["id"])

    # both-minimize orientation too
    out2 = skyline(
        rd.from_pandas(df).repartition(6), minimize=["price", "size"]
    ).sort_values("id")
    ref2 = _ref_skyline(df, ["price", "size"], []).sort_values("id")
    assert out2["id"].tolist() == ref2["id"].tolist()


def test_skyline_requires_two_criteria(ray_session):
    import pytest

    from table_annotation_ray.stages.relational import skyline

    df = pd.DataFrame({"x": [1.0, 2.0], "y": [2.0, 1.0], "z": [0.0, 1.0]})
    with pytest.raises(NotImplementedError):
        skyline(rd.from_pandas(df), minimize=["x", "y", "z"])


# ---------------------------------------------------------- linreg_by_key


def test_linreg_matches_polyfit(ray_session):
    from table_annotation_ray.stages.agg import linreg_by_key

    rng = np.random.default_rng(11)
    ks = np.repeat(np.arange(8, dtype=np.int64), 400)
    x = rng.normal(10, 3, len(ks))
    # per-key slope k+1, intercept 2k, plus noise
    y = (ks + 1) * x + 2 * ks + rng.normal(0, 0.5, len(ks))
    df = pd.DataFrame({"k": ks, "x": x, "y": y})

    out = linreg_by_key(
        rd.from_pandas(df).repartition(7), ["k"], "x", "y"
    ).set_index("k")
    assert (out["n"] == 400).all()
    for k, g in df.groupby("k"):
        slope, intercept = np.polyfit(g["x"], g["y"], 1)
        r = np.corrcoef(g["x"], g["y"])[0, 1]
        assert abs(out.loc[k, "slope"] - slope) < 1e-8, k
        assert abs(out.loc[k, "intercept"] - intercept) < 1e-8, k
        assert abs(out.loc[k, "corr"] - r) < 1e-8, k
        # recovered the planted line
        assert abs(out.loc[k, "slope"] - (k + 1)) < 0.1


def test_linreg_zero_variance_is_nan(ray_session):
    from table_annotation_ray.stages.agg import linreg_by_key

    df = pd.DataFrame({"k": [0, 0, 0], "x": [5.0, 5.0, 5.0], "y": [1.0, 2.0, 3.0]})
    out = linreg_by_key(rd.from_pandas(df), ["k"], "x", "y")
    assert np.isnan(out.loc[0, "slope"]) and np.isnan(out.loc[0, "corr"])
    assert out.loc[0, "n"] == 3


# ----------------------------------------------------- label_propagation


def _ref_lpa(pairs, max_iters):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(max_iters):
        new = {}
        for n in adj:
            cnt = Counter(labels[m] for m in adj[n])
            top = max(cnt.values())
            new[n] = min(l for l, c in cnt.items() if c == top)
        if new == labels:
            break
        labels = new
    return labels


def test_lpa_matches_reference_and_finds_cliques(ray_session):
    from table_annotation_ray.stages.graph import label_propagation

    rng = np.random.default_rng(23)
    # two planted 8-cliques bridged by ONE edge + random background
    c1 = list(itertools.combinations(range(100, 108), 2))
    c2 = list(itertools.combinations(range(200, 208), 2))
    rand = [(int(a), int(b)) for a, b in rng.integers(0, 60, (80, 2)) if a != b]
    pairs = c1 + c2 + [(100, 200)] + rand
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    # reversed duplicates: canon must collapse them
    df = pd.concat([df, df.rename(columns={"src": "dst", "dst": "src"})])

    out = label_propagation(rd.from_pandas(df).repartition(5), max_iters=10)
    ref = _ref_lpa(pairs, 10)
    assert dict(zip(out["node"], out["label"])) == ref

    lab = dict(zip(out["node"], out["label"]))
    # each planted clique is one community...
    assert len({lab[n] for n in range(100, 108)}) == 1
    assert len({lab[n] for n in range(200, 208)}) == 1
    # ...and the bridge did not merge them
    assert lab[100] != lab[200]


# ------------------------------------------------------- welch / zscore


def test_welch_ttest_matches_direct_formula(ray_session):
    from table_annotation_ray.stages.stats import welch_ttest

    rng = np.random.default_rng(5)
    va = rng.normal(10.0, 2.0, 300)
    vb = rng.normal(10.8, 3.0, 200)
    df = pd.DataFrame(
        {
            "g": ["a"] * 300 + ["b"] * 200 + ["c"] * 50,
            "v": np.r_[va, vb, rng.normal(0, 1, 50)],
        }
    )
    r = welch_ttest(rd.from_pandas(df).repartition(6), "g", "v", "a", "b")
    ma, mb = va.mean(), vb.mean()
    sa, sb = va.var(ddof=1), vb.var(ddof=1)
    se2 = sa / 300 + sb / 200
    t = (ma - mb) / np.sqrt(se2)
    dof = se2**2 / ((sa / 300) ** 2 / 299 + (sb / 200) ** 2 / 199)
    assert r["n_a"] == 300 and r["n_b"] == 200
    assert abs(r["t"] - t) < 1e-9
    assert abs(r["df"] - dof) < 1e-6
    assert abs(r["var_a"] - sa) < 1e-9
    # the planted shift is detected with the expected sign
    assert r["t"] < -2


def test_welch_ttest_degenerate_group(ray_session):
    from table_annotation_ray.stages.stats import welch_ttest

    df = pd.DataFrame({"g": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]})
    r = welch_ttest(rd.from_pandas(df), "g", "v", "a", "b")
    assert r["n_b"] == 1 and np.isnan(r["t"]) and np.isnan(r["df"])


def test_zscore_by_key_matches_pandas(ray_session):
    from table_annotation_ray.stages.stats import zscore_by_key

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "rid": np.arange(900, dtype=np.int64),
            "k": rng.integers(0, 30, 900).astype(np.int64),
            "v": rng.normal(50, 12, 900),
        }
    )
    out = (
        zscore_by_key(rd.from_pandas(df).repartition(5), ["k"], "v")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    ref = df.copy()
    g = ref.groupby("k")["v"]
    ref["z"] = (ref["v"] - g.transform("mean")) / g.transform("std")
    assert np.allclose(out["zscore"], ref["z"], atol=1e-9)
    # singleton group emits null
    one = pd.DataFrame({"rid": [0, 1, 2], "k": [7, 7, 9], "v": [1.0, 3.0, 5.0]})
    o2 = zscore_by_key(rd.from_pandas(one), ["k"], "v").to_pandas()
    assert o2.loc[o2["k"] == 9, "zscore"].isna().all()
    assert np.isfinite(o2.loc[o2["k"] == 7, "zscore"]).all()


def test_spearman_matches_pandas(ray_session):
    from table_annotation_ray.stages.stats import spearman_corr

    rng = np.random.default_rng(17)
    n = 2000
    x = rng.integers(0, 25, n).astype(np.float64)     # heavy ties
    y = 3.0 * x + rng.normal(0, 10, n)                # monotone-ish + noise
    df = pd.DataFrame({"rid": np.arange(n, dtype=np.int64), "x": x, "y": y})

    r = spearman_corr(rd.from_pandas(df).repartition(6), "x", "y", "rid")
    ref = (
        df["x"].rank(method="average").corr(df["y"].rank(method="average"))
    )
    assert r["n"] == n
    assert abs(r["rho"] - ref) < 1e-9

    # anti-correlated, no ties
    df2 = pd.DataFrame(
        {"rid": np.arange(50, dtype=np.int64),
         "x": np.arange(50, dtype=np.float64),
         "y": -np.arange(50, dtype=np.float64)}
    )
    r2 = spearman_corr(rd.from_pandas(df2), "x", "y", "rid")
    assert abs(r2["rho"] + 1.0) < 1e-12

    # the two engines (counts fast path vs general ranks path) agree
    # exactly, including the auto fallback when distinct > gate
    ds = rd.from_pandas(df).repartition(6)
    rc = spearman_corr(ds, "x", "y", "rid", method="counts")
    rr = spearman_corr(ds, "x", "y", "rid", method="ranks")
    ra = spearman_corr(ds, "x", "y", "rid", method="auto", max_distinct=3)
    assert rc["n"] == rr["n"] == ra["n"] == n
    assert abs(rc["rho"] - rr["rho"]) < 1e-12
    assert abs(ra["rho"] - rr["rho"]) < 1e-12
