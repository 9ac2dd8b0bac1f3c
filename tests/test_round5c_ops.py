"""Round-5 third-wave operators: per-key OLS trend, rolling median,
grouped moments, entropy rate, series cross-correlation, lexical
diversity, RFM segmentation, ABC classification and the global_rank
running-sum extension — each pinned against a hand case or a
single-process reference."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from table_annotation_ray.stages.datapipe import (
    abc_classify,
    global_rank,
    rfm_segments,
)
from table_annotation_ray.stages.stats import (
    entropy_rate,
    moments_by_key,
    series_corr,
)
from table_annotation_ray.stages.textstats import lexical_stats
from table_annotation_ray.stages.windows import (
    rolling_median_by_key,
    trend_by_key,
)


def _ts(days):
    return pd.Timestamp("2024-01-01") + pd.to_timedelta(days, unit="D")


def test_trend_by_key_hand_cases(ray_session):
    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 2, 2, 3, 3, 3],
            "ts": [_ts(0), _ts(1), _ts(2),      # slope 2/day
                   _ts(5), _ts(5),              # all-equal ts -> NULL
                   _ts(0), _ts(2), _ts(4)],     # constant y -> slope 0
            "v": [1.0, 3.0, 5.0, 7.0, 9.0, 4.0, 4.0, 4.0],
        }
    )
    out = (
        trend_by_key(rd.from_pandas(df).repartition(3), "u", "ts", "v")
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    assert out["n"].tolist() == [3, 2, 3]
    assert out.loc[0, "slope_per_day"] == pytest.approx(2.0)
    assert np.isnan(out.loc[1, "slope_per_day"])  # exact-zero denominator
    assert out.loc[2, "slope_per_day"] == 0.0


def test_rolling_median_hand_case(ray_session):
    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 1, 2],
            "ts": [_ts(0), _ts(1), _ts(2), _ts(3), _ts(0)],
            "id": [1, 2, 3, 4, 5],
            "v": [5.0, 1.0, 9.0, 3.0, 7.0],
        }
    )
    out = (
        rolling_median_by_key(
            rd.from_pandas(df).repartition(2), "u", ["ts", "id"], "v",
            window=3,
        )
        .to_pandas()
        .sort_values("id")["rolling_median"]
        .tolist()
    )
    # u1: [5], [5,1]->3, [5,1,9]->5, [1,9,3]->3; u2: [7]
    assert out == [5.0, 3.0, 5.0, 3.0, 7.0]


def test_moments_by_key_vs_numpy(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k": np.repeat(["a", "b"], 500),
            "v": np.r_[rng.normal(10, 2, 500), rng.exponential(3, 500)],
        }
    )
    out = moments_by_key(rd.from_pandas(df).repartition(4), "k", "v")
    for _, row in out.iterrows():
        v = df.loc[df["k"] == row["k"], "v"].to_numpy()
        m2 = ((v - v.mean()) ** 2).mean()
        m3 = ((v - v.mean()) ** 3).mean()
        m4 = ((v - v.mean()) ** 4).mean()
        assert row["skewness"] == pytest.approx(m3 / m2**1.5, abs=2e-6)
        assert row["ex_kurtosis"] == pytest.approx(m4 / m2**2 - 3, abs=2e-6)
    # constant group -> NULL moments
    cdf = pd.DataFrame({"k": ["c"] * 4, "v": [2.0] * 4})
    out2 = moments_by_key(rd.from_pandas(cdf), "k", "v")
    assert np.isnan(out2.loc[0, "skewness"])


def test_entropy_rate_hand_cases(ray_session):
    # u1: a->b, b->a, a->b (deterministic both ways, H=0)
    # u2: a->b, (new a) a->c  => from 'a' transitions: b,b,c ... build
    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 1, 2, 2, 2],
            "ts": [_ts(i) for i in range(4)] + [_ts(i) for i in range(3)],
            "id": list(range(1, 8)),
            "t": ["a", "b", "a", "b", "a", "c", "a"],
        }
    )
    out = entropy_rate(
        rd.from_pandas(df).repartition(3), "u", ["ts", "id"], "t"
    ).set_index("from_type")
    # from 'a': u1 gives b,b; u2 gives c  -> p = (2/3, 1/3)
    h = -(2 / 3) * np.log2(2 / 3) - (1 / 3) * np.log2(1 / 3)
    assert out.loc["a", "n_transitions"] == 3
    assert out.loc["a", "h_bits"] == pytest.approx(h, abs=1e-6)
    # from 'b': always a -> H = 0; from 'c': always a -> H = 0
    assert out.loc["b", "h_bits"] == 0.0
    assert out.loc["c", "h_bits"] == 0.0


def test_series_corr_perfect_and_constant(ray_session):
    # clicks and views both double every hour -> r = 1
    rows = []
    for h, n in enumerate([1, 2, 4]):
        for i in range(n):
            rows.append((_ts(0) + pd.Timedelta(hours=h), "click"))
            rows.append((_ts(0) + pd.Timedelta(hours=h), "view"))
    df = pd.DataFrame(rows, columns=["ts", "t"])
    out = series_corr(rd.from_pandas(df), "ts", "t", "click", "view")
    assert out.loc[0, "n_periods"] == 3
    assert out.loc[0, "r"] == 1.0
    # constant series -> NULL r
    df2 = pd.DataFrame(
        {"ts": [_ts(0), _ts(0) + pd.Timedelta(hours=1)] * 2,
         "t": ["click", "click", "view", "view"]}
    )
    out2 = series_corr(rd.from_pandas(df2), "ts", "t", "click", "view")
    assert np.isnan(out2.loc[0, "r"])


def test_lexical_stats_hand_cases():
    b = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a A b", "", "x  x\tx\ny"],
        }
    )
    out = lexical_stats(b)
    assert out["n_tokens"].tolist() == [3, 0, 4]
    assert out["n_types"].tolist() == [2, 0, 2]
    assert out.loc[0, "ttr"] == pytest.approx(2 / 3, abs=1e-6)
    assert np.isnan(out.loc[1, "ttr"])
    assert out.loc[2, "ttr"] == 0.5


def test_rfm_segments_five_customers(ray_session):
    # 5 customers, k=5 -> one per tile on every axis
    rows = []
    for c in range(1, 6):
        for o in range(c):  # frequency = custkey
            rows.append((c, _ts(10 * c + o), 100.0 * c))
    df = pd.DataFrame(rows, columns=["ck", "ts", "amt"])
    out = (
        rfm_segments(rd.from_pandas(df).repartition(3), "ck", "ts", "amt",
                     k=5)
        .to_pandas()
        .sort_values("ck")
        .reset_index(drop=True)
    )
    # most recent last order: c5 (day 54) -> r_tile 1; oldest: c1 -> 5
    assert out["r_tile"].tolist() == [5, 4, 3, 2, 1]
    # highest frequency/monetary: c5 -> f_tile/m_tile 1
    assert out["f_tile"].tolist() == [5, 4, 3, 2, 1]
    assert out["m_tile"].tolist() == [5, 4, 3, 2, 1]
    assert out["monetary_cents"].tolist() == [
        10000, 40000, 90000, 160000, 250000
    ]
    assert out.loc[4, "rfm_code"] == 111


def test_abc_classify_integer_boundaries(ray_session):
    # cum shares land EXACTLY on the 80% / 95% thresholds: the integer
    # cross-multiplication must classify the boundary rows A and B
    df = pd.DataFrame({"k": [1, 2, 3], "v": [80, 15, 5]})
    out = (
        abc_classify(rd.from_pandas(df), "k", "v")
        .to_pandas()
        .sort_values("position")
        .reset_index(drop=True)
    )
    assert out["abc_class"].tolist() == ["A", "B", "C"]
    assert out["cum_value"].tolist() == [80, 95, 100]
    assert out["k"].tolist() == [1, 2, 3]


def test_global_rank_running_sums_vs_pandas(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "id": np.arange(1000),
            "a": rng.integers(0, 50, 1000),
            "w": rng.integers(1, 100, 1000).astype(np.int64),
        }
    )
    out = (
        global_rank(
            rd.from_pandas(df).repartition(5), ["a"], "id",
            num_buckets=8, running_sums={"cw": "w"},
        )
        .to_pandas()
        .sort_values("position")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["a", "id"]).reset_index(drop=True)
    assert out["id"].tolist() == ref["id"].tolist()
    assert out["cw"].tolist() == ref["w"].cumsum().tolist()
