"""Round-5 second-wave operators: attribution, session paths, Benford,
Gini, Kaplan–Meier — each pinned against a single-process reference."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from table_annotation_ray.stages.dq import benford_audit
from table_annotation_ray.stages.stats import gini_by_key, km_survival
from table_annotation_ray.stages.windows import (
    conversion_lag,
    last_touch_attribution,
    session_paths,
)


def test_last_touch_attribution(ray_session):
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:05", "2024-01-01 00:10",
         "2024-01-01 00:20", "2024-01-01 01:00", "2024-01-01 01:30",
         "2024-01-02 00:00"]
    )
    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 1, 2, 2, 3],
            "ts": ts,
            "t": ["view", "click", "purchase", "purchase",
                  "purchase", "view", "purchase"],
            "v": [0.0, 0.0, 10.0, 20.0, 5.0, 0.0, 7.0],
            "id": [1, 2, 3, 4, 5, 6, 7],
        }
    )
    out = (
        last_touch_attribution(
            rd.from_pandas(df).repartition(3),
            "u", "ts", "t", "v", "purchase", "id",
        )
        .to_pandas()
        .sort_values("touch")
        .reset_index(drop=True)
    )
    # u1: both purchases credit 'click' (second purchase's most recent
    # NON-purchase event is still the click); u2 and u3 have no prior
    # touch -> (none)
    assert out["touch"].tolist() == ["(none)", "click"]
    assert out["n_conversions"].tolist() == [2, 2]
    assert out["attributed_value"].tolist() == [12.0, 30.0]


def test_session_paths_gap_edge_and_ties(ray_session):
    base = pd.Timestamp("2024-01-01")
    rows = []
    # u1: gap of exactly 1800s stays in ONE session; >1800 breaks
    rows += [
        (1, base, "a", 1),
        (1, base + pd.Timedelta(seconds=1800), "b", 2),
        (1, base + pd.Timedelta(seconds=3601), "a", 3),
    ]
    # u2: single-event sessions, same path as u1's second session
    rows += [(2, base, "a", 4), (2, base + pd.Timedelta(hours=2), "a", 5)]
    df = pd.DataFrame(rows, columns=["u", "ts", "t", "id"])
    out = session_paths(
        rd.from_pandas(df).repartition(2), "u", "ts", "t", "id",
        gap_seconds=1800.0, k=10,
    ).to_pandas()
    assert out["path"].tolist() == ["a", "a>b"]
    assert out["n_sessions"].tolist() == [3, 1]


def test_benford_audit(ray_session):
    vals = [1.5, 19.0, 123.0, 2.0, 29.9, 999.0, 8.0, 1.0]
    out = benford_audit(rd.from_pandas(pd.DataFrame({"x": vals})), "x")
    got = dict(zip(out["digit"], out["n"]))
    assert got == {1: 4, 2: 2, 8: 1, 9: 1}
    row1 = out[out["digit"] == 1].iloc[0]
    assert row1["share"] == 0.5
    assert abs(row1["expected_share"] - np.log10(2)) < 1e-6
    with pytest.raises(Exception):
        benford_audit(
            rd.from_pandas(pd.DataFrame({"x": [0.5, 2.0]})), "x"
        ).to_string()


def _gini_ref(x: np.ndarray) -> float:
    x = np.sort(x.astype(np.float64))
    n = len(x)
    i = np.arange(1, n + 1)
    return float(2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n)


def test_gini_by_key_matches_sorted_formula(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b", "c"], 200),
            # ties on purpose: quantized values
            "x": np.round(rng.gamma(2.0, 50.0, 600), 0) + 1.0,
        }
    )
    out = (
        gini_by_key(rd.from_pandas(df).repartition(5), ["g"], "x")
        .to_pandas()
        .set_index("g")
    )
    for g, sub in df.groupby("g"):
        ref = round(_gini_ref(sub["x"].to_numpy()) + 1e-12, 6)
        assert abs(out.loc[g, "gini"] - ref) <= 1e-6
        assert out.loc[g, "n"] == len(sub)
    # uniform values -> gini 0
    u = pd.DataFrame({"g": ["z"] * 50, "x": [42.0] * 50})
    z = gini_by_key(rd.from_pandas(u), ["g"], "x").to_pandas()
    assert z["gini"].iloc[0] == 0.0


def test_km_survival_hand_reference(ray_session):
    # subjects: durations (days) 1,1,2,2(censored),3 ; censor cutoff day 3
    base = pd.Timestamp("2024-01-01")
    lags = pd.DataFrame(
        {
            "from_ts": [base] * 5,
            "to_ts": [
                base + pd.Timedelta(days=1),
                base + pd.Timedelta(days=1),
                base + pd.Timedelta(days=2),
                pd.NaT,
                base + pd.Timedelta(days=3),
            ],
        }
    )
    censor = base + pd.Timedelta(days=2)  # the censored subject: 2 days
    out = km_survival(rd.from_pandas(lags).repartition(2), censor)
    # t=1: n=5 d=2 -> S=0.6 ; t=2: n=3 d=1 -> S=0.4 ; t=3: n=1 d=1 -> 0
    assert out["t"].tolist() == [1, 2, 3]
    assert out["n_risk"].tolist() == [5, 3, 1]
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["survival"].tolist() == [0.6, 0.4, 0.0]
