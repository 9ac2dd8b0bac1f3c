"""Round-5 continuation wave: theilsen_by_key, weighted_median_by_key,
jaccard_links, seasonal_mase, fuzzy_pairs_1del."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _theilsen_ref(v: np.ndarray) -> tuple[int, float]:
    slopes = []
    for i in range(len(v)):
        for j in range(i + 1, len(v)):
            slopes.append((v[j] - v[i]) / (j - i))
    slopes.sort()
    return len(slopes), slopes[(len(slopes) - 1) // 2]


def test_theilsen_by_key_vs_pairwise(ray_session):
    from table_annotation_ray.stages.windows import theilsen_by_key

    rng = np.random.default_rng(11)
    frames = []
    expect = {}
    for k in range(8):
        n = int(rng.integers(2, 30))
        v = np.round(rng.normal(0, 5, n) + 0.7 * np.arange(n), 2)
        frames.append(pd.DataFrame({"k": k, "t": np.arange(n), "v": v}))
        expect[k] = _theilsen_ref(v)
    # a 1-row key must be dropped
    frames.append(pd.DataFrame({"k": [99], "t": [0], "v": [1.0]}))
    df = pd.concat(frames, ignore_index=True).sample(frac=1, random_state=0)
    out = (
        theilsen_by_key(rd.from_pandas(df).repartition(4), "k", ["t"], "v")
        .to_pandas()
        .set_index("k")
    )
    assert 99 not in out.index
    assert len(out) == 8
    for k, (n_pairs, med) in expect.items():
        assert out.loc[k, "n_pairs"] == n_pairs
        assert out.loc[k, "ts_slope"] == med  # element selection: bit-exact


def test_weighted_median_by_key_hand(ray_session):
    from table_annotation_ray.stages.quantiles import weighted_median_by_key

    # key a: values 1(w1), 2(w1), 3(w2): total 4, cum 1,2,4 -> first 2cum>=4 is v=2
    # key b: values 10(w3), 20(w1): total 4, cum 3 -> 2*3>=4 at v=10
    # key c: single value
    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "b", "b", "c"],
            "v": [1.0, 2.0, 3.0, 3.0, 10.0, 20.0, 7.0],
            "w": [1.0, 1.0, 1.0, 1.0, 3.0, 1.0, 2.0],
        }
    )
    out = (
        weighted_median_by_key(rd.from_pandas(df).repartition(3), "k", "v", "w")
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    assert out.loc["a", "wmedian"] == 2.0 and out.loc["a", "total_weight"] == 4.0
    assert out.loc["b", "wmedian"] == 10.0 and out.loc["b", "total_weight"] == 4.0
    assert out.loc["c", "wmedian"] == 7.0 and out.loc["c", "total_weight"] == 2.0


def test_jaccard_links_small_graph(ray_session):
    from table_annotation_ray.stages.graph import jaccard_links

    # path 1-2, 2-3, 3-4, plus 1-5, 3-5: N(1)={2,5}, N(3)={2,4,5}
    edges = pd.DataFrame(
        {"src": [1, 2, 3, 1, 3], "dst": [2, 3, 4, 5, 5]}
    )
    out = (
        jaccard_links(rd.from_pandas(edges).repartition(2),
                      max_center_degree=64, min_common=2)
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    # non-adjacent pairs with >=2 common neighbors:
    # (1,3) via {2,5}; (2,5) via {1,3} (N(2) == N(5))
    assert len(out) == 2
    r = out.iloc[0]
    assert (r["u"], r["v"], r["common"]) == (1, 3, 2)
    assert (r["deg_u"], r["deg_v"], r["union_size"]) == (2, 3, 3)
    assert r["jaccard"] == 2 / 3
    r2 = out.iloc[1]
    assert (r2["u"], r2["v"], r2["common"]) == (2, 5, 2)
    assert (r2["deg_u"], r2["deg_v"], r2["union_size"]) == (2, 2, 2)
    assert r2["jaccard"] == 1.0


def test_seasonal_mase_hand(ray_session):
    from table_annotation_ray.stages.windows import seasonal_mase

    # key x: hourly counts over 50 hours with period-24 structure:
    # 2 events in hours 0,24,48 and 1 event elsewhere -> compute by hand
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    for h in range(50):
        n = 2 if h % 24 == 0 else 1
        for i in range(n):
            rows.append({"ts": base + pd.Timedelta(hours=h, minutes=i), "k": "x"})
    df = pd.DataFrame(rows)
    out = seasonal_mase(rd.from_pandas(df).repartition(2), "ts", "k", period=24)
    assert list(out.columns) == ["k", "n_periods", "sae_seasonal", "sae_naive", "mase"]
    y = np.where(np.arange(50) % 24 == 0, 2, 1)
    sae_s = int(np.abs(y[24:] - y[:-24]).sum())
    sae_n = int(np.abs(y[1:] - y[:-1]).sum())
    r = out.iloc[0]
    assert r["n_periods"] == 50
    assert r["sae_seasonal"] == sae_s and r["sae_naive"] == sae_n
    assert r["mase"] == (sae_s * 49) / (sae_n * 26)
    # constant series -> NULL mase
    df2 = pd.DataFrame(
        {"ts": [base + pd.Timedelta(hours=h) for h in range(30)], "k": "c"}
    )
    out2 = seasonal_mase(rd.from_pandas(df2), "ts", "k", period=24)
    assert out2.iloc[0]["sae_naive"] == 0 and np.isnan(out2.iloc[0]["mase"])


def test_lev1_mask_cases():
    from table_annotation_ray.stages.joins import _lev1_mask

    a = np.array(["abc", "abc", "abc", "abcd", "abc", "ab", "a", "abc"], object)
    b = np.array(["abd", "bca", "abcd", "abc", "ab", "abc", "", "xyz"], object)
    got = _lev1_mask(a, b)
    #      sub    d=2    ins    del    del   ins   del   d=3
    assert list(got) == [True, False, True, True, True, True, True, False]


def test_fuzzy_pairs_1del_vs_brute(ray_session):
    from table_annotation_ray.stages.joins import fuzzy_pairs_1del

    def lev(x, y):
        m, n = len(x), len(y)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1,
                           prev + (x[i - 1] != y[j - 1]))
                prev = cur
        return d[n]

    rng = np.random.default_rng(5)
    alphabet = list("abcd")
    vocab = set()
    while len(vocab) < 60:
        vocab.add("".join(rng.choice(alphabet, rng.integers(2, 6))))
    vocab = sorted(vocab)
    expect = {
        (x, y)
        for i, x in enumerate(vocab)
        for y in vocab[i + 1:]
        if lev(x, y) <= 1
    }
    assert expect  # the generator must actually produce near pairs
    # duplicate rows: operator runs on distinct strings
    df = pd.DataFrame({"s": vocab * 2})
    out = fuzzy_pairs_1del(rd.from_pandas(df).repartition(3), "s").to_pandas()
    got = set(zip(out["a"], out["b"]))
    assert got == expect
