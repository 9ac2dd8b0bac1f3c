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


def test_hits_engines_agree(ray_session):
    from table_annotation_ray.stages.graph import hits

    rng = np.random.default_rng(11)
    e = pd.DataFrame(
        {
            "src": rng.integers(0, 40, 300),
            "dst": rng.integers(40, 80, 300),
        }
    )
    ds = rd.from_pandas(e).repartition(4)
    d_out, d_eng = hits(ds, iters=3, driver_below=10**9)
    assert d_eng == "driver"
    ds_out, ds_eng = hits(ds, iters=3, num_buckets=8, repartition_to=4)
    assert ds_eng == "dataset"
    a = d_out.to_pandas().sort_values("node").reset_index(drop=True)
    b = ds_out.to_pandas().sort_values("node").reset_index(drop=True)
    assert a["node"].tolist() == b["node"].tolist()
    np.testing.assert_allclose(a["hub"], b["hub"], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(
        a["authority"], b["authority"], rtol=1e-9, atol=1e-12
    )
    # hubs have no in-edges in this bipartite graph -> authority 0
    assert (a.loc[a["node"] < 40, "authority"] == 0).all()
    assert (a.loc[a["node"] >= 40, "hub"] == 0).all()
    # L2 norms are 1 after the final normalization of each half-step
    assert abs(np.square(a["authority"]).sum() - 1.0) < 1e-9
    assert abs(np.square(a["hub"]).sum() - 1.0) < 1e-9


def test_cusum_matches_literal_recursion(ray_session):
    from table_annotation_ray.stages.windows import cusum_by_key

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 8, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.permutation(n), unit="min"),
            "id": np.arange(n),
            "x": rng.exponential(50.0, n),
        }
    )
    out = (
        cusum_by_key(
            rd.from_pandas(df).repartition(5), "u", ["ts", "id"], "x"
        )
        .to_pandas()
        .sort_values(["u", "ts", "id"])
        .reset_index(drop=True)
    )
    for u, sub in df.sort_values(["ts", "id"]).groupby("u"):
        mu = sub["x"].mean()
        s, ref = 0.0, []
        for x in sub["x"]:
            s = max(0.0, s + (x - mu))
            ref.append(s)
        got = out.loc[out["u"] == u, "cusum"].to_numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)


def test_rolling_active_daily(ray_session):
    from table_annotation_ray.stages.windows import rolling_active

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 05:00", "2024-01-01 09:00",
                 "2024-01-02 01:00", "2024-01-05 12:00"]
            ),
            "u": [1, 2, 1, 3],
        }
    )
    dau = (
        rolling_active(rd.from_pandas(df), "ts", "u",
                       window_hours=1, freq="D")
        .to_pandas()
        .sort_values("win_end")
        .reset_index(drop=True)
    )
    assert dau["n_active"].tolist() == [2, 1, 1]
    # trailing 3-day window: day 3 (Jan 3) covers Jan 1-3 -> users {1,2}
    w3 = (
        rolling_active(rd.from_pandas(df), "ts", "u",
                       window_hours=3, freq="D")
        .to_pandas()
        .set_index("win_end")
    )
    assert w3.loc[pd.Timestamp("2024-01-03"), "n_active"] == 2
    assert w3.loc[pd.Timestamp("2024-01-05"), "n_active"] == 1


def test_mann_whitney_hand_reference(ray_session):
    from table_annotation_ray.stages.stats import mann_whitney_u

    # a: [1, 2, 2, 5]  b: [2, 3, 4]; pooled sorted: 1,2,2,2,3,4,5
    # avg ranks: 1; 3,3,3; 5; 6; 7  -> R_a = 1+3+3+7 = 14, U = 14-10 = 4
    df = pd.DataFrame(
        {
            "g": ["a"] * 4 + ["b"] * 3,
            "v": [1.0, 2.0, 2.0, 5.0, 2.0, 3.0, 4.0],
        }
    )
    r = mann_whitney_u(
        rd.from_pandas(df).repartition(3), "g", "v", "a", "b"
    )
    assert (r["n_a"], r["n_b"]) == (4, 3)
    assert r["u"] == 4.0
    # z from the tie-corrected variance: mu=6, tie term t=3 at v=2
    n1, n2, N = 4.0, 3.0, 7.0
    var = n1 * n2 / 12.0 * ((N + 1) - (27.0 - 3.0) / (N * (N - 1)))
    assert abs(r["z"] - (4.0 - 6.0) / np.sqrt(var)) < 1e-12
    # identical samples -> U = n1*n2/2, z = 0 (var > 0 needs some tie split)
    df2 = pd.DataFrame({"g": ["a", "b", "a", "b"], "v": [1.0, 1.0, 2.0, 2.0]})
    r2 = mann_whitney_u(rd.from_pandas(df2), "g", "v", "a", "b")
    assert r2["u"] == 2.0 and abs(r2["z"]) < 1e-12


def test_group_quantile_threshold_rank_semantics(ray_session):
    from table_annotation_ray.stages.quantiles import group_quantile_threshold

    df = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 4,
            "x": [10.0, 20.0, 20.0, 30.0, 40.0, 1.0, 2.0, 3.0, 4.0],
        }
    )
    thr = group_quantile_threshold(
        rd.from_pandas(df).repartition(3), "g", "x", 0.5
    ).set_index("g")
    # a: ranks 1..5, k = ceil(2.5) = 3 -> sorted[3rd] = 20 (tie run)
    # b: k = ceil(2) = 2 -> 2.0
    assert thr.loc["a", "threshold"] == 20.0 and thr.loc["a", "n"] == 5
    assert thr.loc["b", "threshold"] == 2.0 and thr.loc["b", "n"] == 4
    top = group_quantile_threshold(rd.from_pandas(df), "g", "x", 1.0)
    assert top.set_index("g").loc["a", "threshold"] == 40.0
    with pytest.raises(ValueError, match="max_distinct"):
        group_quantile_threshold(
            rd.from_pandas(df), "g", "x", 0.5, max_distinct=2
        )


def test_diversity_by_key(ray_session):
    from table_annotation_ray.stages.stats import diversity_by_key

    df = pd.DataFrame(
        {
            "u": [1] * 4 + [2] * 3,
            "t": ["a", "b", "a", "b", "x", "x", "x"],
        }
    )
    out = (
        diversity_by_key(rd.from_pandas(df).repartition(3), "u", "t")
        .to_pandas()
        .set_index("u")
    )
    # u1: uniform over 2 types -> H = ln 2, eff = 2 ; u2: single type -> 0, 1
    assert abs(out.loc[1, "entropy"] - round(np.log(2), 6)) < 1e-9
    assert out.loc[1, "eff_cats"] == 2.0
    assert out.loc[2, "entropy"] == 0.0 and out.loc[2, "eff_cats"] == 1.0
    assert out.loc[1, "n_events"] == 4 and out.loc[2, "n_events"] == 3


def test_nearest_join_brute_force(ray_session):
    from table_annotation_ray.stages.joins import nearest_join

    rng = np.random.default_rng(5)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 6, 60),
            "lts": base + pd.to_timedelta(rng.integers(0, 10000, 60), unit="s"),
            "lid": np.arange(60),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 6, 80),
            "rts": base + pd.to_timedelta(rng.integers(0, 10000, 80), unit="s"),
            "rid": np.arange(80),
        }
    )
    tol = pd.Timedelta(minutes=20)
    got = (
        nearest_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            "k", "lts", "rts",
            ["k", "lts", "lid"], ["k", "rts", "rid"],
            "rid", tolerance=tol,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # brute force: min (|diff|, rts, rid)
    exp = []
    for _, lr in left.iterrows():
        cand = right[right["k"] == lr["k"]].copy()
        if len(cand) == 0:
            continue
        cand["d"] = (cand["rts"] - lr["lts"]).abs()
        cand = cand[cand["d"] <= tol]
        if len(cand) == 0:
            continue
        best = cand.sort_values(["d", "rts", "rid"]).iloc[0]
        exp.append((lr["lid"], best["rid"]))
    exp = pd.DataFrame(exp, columns=["lid", "rid"]).sort_values(
        "lid"
    ).reset_index(drop=True)
    assert got["lid"].tolist() == exp["lid"].tolist()
    assert got["rid"].tolist() == exp["rid"].tolist()


def test_audio_quality_audit(ray_session):
    import io
    import wave

    import pyarrow as pa
    import ray.data as rdm

    from table_annotation_ray.stages.multimodal import AudioQualityAudit

    def wav_bytes(samples: np.ndarray) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            wf.writeframes(
                (np.clip(samples, -1.0, 0.999969) * 32768)
                .astype("<i2")
                .tobytes()
            )
        return buf.getvalue()

    t = np.linspace(0, 1, 16000)
    clipped = np.sin(2 * np.pi * 440 * t) * 3.0  # hard-clips at full scale
    quiet = np.zeros(16000)
    quiet[:1600] = 0.5  # 90% silence
    tbl = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array(
                [wav_bytes(clipped), wav_bytes(quiet), b"not-audio"],
                pa.binary(),
            ),
        }
    )
    out = (
        rdm.from_arrow(tbl)
        .map_batches(AudioQualityAudit, batch_format="pyarrow",
                     concurrency=(1, 1))
        .to_pandas()
        .set_index("media_id")
    )
    assert out.loc[1, "decoded"] and out.loc[1, "clip_ratio"] > 0.3
    assert out.loc[2, "silence_ratio"] == 0.9
    assert abs(out.loc[2, "peak"] - 0.5) < 0.01
    assert not out.loc[3, "decoded"] and pd.isna(out.loc[3, "rms"])


def test_cusum_fixed_target(ray_session):
    from table_annotation_ray.stages.windows import cusum_by_key

    df = pd.DataFrame(
        {
            "u": [1] * 5,
            "ts": pd.date_range("2024-01-01", periods=5, freq="min"),
            "id": range(5),
            "x": [12.0, 8.0, 13.0, 9.0, 15.0],
        }
    )
    out = (
        cusum_by_key(rd.from_pandas(df), "u", ["ts", "id"], "x", target=10.0)
        .to_pandas()
        .sort_values("id")
    )
    # S: max-reset recursion vs 10: 2, 0, 3, 2, 7
    assert out["cusum"].tolist() == [2.0, 0.0, 3.0, 2.0, 7.0]


def test_markov_stationary_vs_eigenvector(ray_session):
    from table_annotation_ray.stages.stats import markov_stationary

    # hand chain: a->b 3, b->a 1, b->b 1, plus dangling state c (b->c 0
    # never appears; c appears only as a destination: a->c 1)
    t = pd.DataFrame(
        {
            "from_type": ["a", "b", "b", "a"],
            "to_type": ["b", "a", "b", "c"],
            "n": [3, 1, 1, 1],
        }
    )
    out = markov_stationary(rd.from_pandas(t)).set_index("state")
    # numpy reference: P with dangling c -> uniform row
    states = ["a", "b", "c"]
    p = np.zeros((3, 3))
    p[0, 1] = 3; p[0, 2] = 1; p[1, 0] = 1; p[1, 1] = 1
    p[2] = 1.0 / 3
    p /= p.sum(axis=1)[:, None]
    vals, vecs = np.linalg.eig(p.T)
    pi = np.real(vecs[:, np.argmax(np.real(vals))])
    pi = pi / pi.sum()
    for s, ref in zip(states, pi):
        assert abs(out.loc[s, "stationary"] - ref) < 1e-5
    assert abs(out["stationary"].sum() - 1.0) < 1e-5


def test_cohen_kappa_bounds(ray_session):
    from table_annotation_ray.stages.stats import cohen_kappa

    # perfect agreement -> kappa 1
    df = pd.DataFrame({"a": ["x", "y", "z"] * 10, "b": ["x", "y", "z"] * 10})
    r = cohen_kappa(rd.from_pandas(df).repartition(3), "a", "b")
    assert r["accuracy"] == 1.0 and abs(r["kappa"] - 1.0) < 1e-12
    # marginal-independent agreement -> kappa ~= 0 (exactly 0 for this
    # balanced construction: po = 0.5 = pe)
    df2 = pd.DataFrame(
        {"a": ["x", "x", "y", "y"] * 5, "b": ["x", "y", "x", "y"] * 5}
    )
    r2 = cohen_kappa(rd.from_pandas(df2), "a", "b")
    assert abs(r2["kappa"]) < 1e-12 and r2["accuracy"] == 0.5
    # hand case: po=0.6, pe=0.5 -> kappa=0.2
    df3 = pd.DataFrame(
        {
            "a": ["x"] * 5 + ["y"] * 5,
            "b": ["x", "x", "x", "y", "y", "y", "y", "y", "x", "x"],
        }
    )
    r3 = cohen_kappa(rd.from_pandas(df3), "a", "b")
    assert abs(r3["accuracy"] - 0.6) < 1e-12
    assert abs(r3["kappa"] - 0.2) < 1e-12


def test_nearest_join_no_tolerance_and_empty_sides(ray_session):
    from table_annotation_ray.stages.joins import nearest_join

    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {"k": [1, 2], "lts": [base, base], "lid": [0, 1]}
    )
    # k=2 has no right rows -> inner semantics drop it
    right = pd.DataFrame(
        {"k": [1], "rts": [base + pd.Timedelta(days=30)], "rid": [7]}
    )
    got = nearest_join(
        rd.from_pandas(left), rd.from_pandas(right),
        "k", "lts", "rts", ["k", "lts", "lid"], ["k", "rts", "rid"], "rid",
    ).to_pandas()
    # no tolerance: the 30-day-away row still matches
    assert got["lid"].tolist() == [0] and got["rid"].tolist() == [7]


def test_session_stats_matches_hand_count(ray_session):
    from table_annotation_ray.stages.windows import session_stats

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 2, 2],
            "ts": [base, base + pd.Timedelta(minutes=10),
                   base + pd.Timedelta(hours=3), base,
                   base + pd.Timedelta(hours=5)],
            "id": range(5),
        }
    )
    out = session_stats(rd.from_pandas(df).repartition(2), "u", "ts", "id")
    # u1: [2-event session, 1-event session]; u2: two 1-event sessions
    assert out["n_sessions"].iloc[0] == 4
    assert out["n_bounces"].iloc[0] == 3
    assert out["bounce_rate"].iloc[0] == 0.75
    assert out["avg_len"].iloc[0] == 1.25


def test_wasserstein_hand_case(ray_session):
    from table_annotation_ray.stages.stats import wasserstein_1d

    # a: point mass at 0; b: point mass at 1 -> W1 = 1
    df = pd.DataFrame(
        {"g": ["a"] * 4 + ["b"] * 4, "v": [0.0] * 4 + [1.0] * 4}
    )
    r = wasserstein_1d(rd.from_pandas(df).repartition(2), "g", "v", "a", "b")
    assert r["w1"] == 1.0 and r["n_a"] == 4 and r["n_b"] == 4
    # identical distributions -> 0
    df2 = pd.DataFrame({"g": ["a", "b"] * 6, "v": [1.0, 1.0, 5.0, 5.0] * 3})
    r2 = wasserstein_1d(rd.from_pandas(df2), "g", "v", "a", "b")
    assert r2["w1"] == 0.0
