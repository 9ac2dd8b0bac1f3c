"""Tests for the time-keyed joins (as-of, interval) and exact
distributed quantiles."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from table_annotation_ray.stages.joins import asof_join, interval_join
from table_annotation_ray.stages.quantiles import exact_quantiles
from table_annotation_ray.stages.relational import grouped_topk


def _ts(s: str) -> pd.Timestamp:
    return pd.Timestamp(s)


def test_asof_join_basic_and_ties(ray_session):
    left = pd.DataFrame(
        {
            "lid": [1, 2, 3, 4],
            "k": [10, 10, 10, 20],
            "lts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 11:00",
                 "2024-01-01 09:00", "2024-01-01 10:00"]
            ),
        }
    )
    right = pd.DataFrame(
        {
            "rid": [100, 101, 102, 103],
            "k": [10, 10, 10, 20],
            "rts": pd.to_datetime(
                # 101/102 tie on ts — tie-break must pick max rid (102)
                ["2024-01-01 09:30", "2024-01-01 10:30",
                 "2024-01-01 10:30", "2024-01-01 11:00"]
            ),
        }
    )
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        key="k", left_ts="lts", right_ts="rts",
        left_cols=["lid", "k", "lts"], right_cols=["k", "rid", "rts"],
        right_tiebreak="rid", how="inner",
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    # lid=1 @10:00 -> rid 100 (09:30); lid=2 @11:00 -> tie at 10:30 -> 102
    # lid=3 @09:00 -> no prior view (dropped); lid=4 @10:00 key 20 -> none
    assert out["lid"].tolist() == [1, 2]
    assert out["rid"].tolist() == [100, 102]


def test_asof_join_left_keeps_unmatched(ray_session):
    left = pd.DataFrame(
        {"lid": [1, 2], "k": [1, 2],
         "lts": pd.to_datetime(["2024-01-01", "2024-01-01"])}
    )
    right = pd.DataFrame(
        {"rid": [9], "k": [1], "rts": pd.to_datetime(["2023-12-31"])}
    )
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        key="k", left_ts="lts", right_ts="rts",
        left_cols=["lid", "k", "lts"], right_cols=["k", "rid", "rts"],
        right_tiebreak="rid", how="left",
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[0, "rid"] == 9
    assert pd.isna(out.loc[1, "rid"])


def test_interval_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    n_l, n_r = 60, 400
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    l_start = base + rng.integers(0, 86_400_000_000, n_l)
    l_len = rng.integers(1, 7_200_000_000, n_l)  # up to 2 h
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "k": rng.integers(0, 5, n_l),
            "s": pd.to_datetime(l_start, unit="us"),
            "e": pd.to_datetime(l_start + l_len, unit="us"),
        }
    )
    r_ts = base + rng.integers(0, 86_400_000_000, n_r)
    right = pd.DataFrame(
        {
            "rid": np.arange(n_r),
            "k": rng.integers(0, 5, n_r),
            "t": pd.to_datetime(r_ts, unit="us"),
        }
    )
    out = interval_join(
        rd.from_pandas(left), rd.from_pandas(right),
        start="s", end="e", right_ts="t",
        left_cols=["lid", "k", "s", "e"], right_cols=["k", "rid", "t"],
        key="k", bucket_width_us=1_800_000_000,  # buckets < interval len
    ).to_pandas()
    got = set(zip(out["lid"], out["rid"]))
    want = set()
    for _, L in left.iterrows():
        m = right[(right["k"] == L["k"]) & (right["t"] >= L["s"]) & (right["t"] < L["e"])]
        want |= {(L["lid"], r) for r in m["rid"]}
    assert got == want and len(want) > 50


def test_interval_join_no_key_and_exact_boundaries(ray_session):
    # ts == start is IN, ts == end is OUT (half-open)
    left = pd.DataFrame(
        {"lid": [0], "s": pd.to_datetime(["2024-01-01 00:10:00"]),
         "e": pd.to_datetime(["2024-01-01 00:20:00"])}
    )
    right = pd.DataFrame(
        {"rid": [0, 1, 2],
         "t": pd.to_datetime(["2024-01-01 00:10:00.000000",
                              "2024-01-01 00:19:59.999999",
                              "2024-01-01 00:20:00.000000"])}
    )
    out = interval_join(
        rd.from_pandas(left), rd.from_pandas(right),
        start="s", end="e", right_ts="t",
        left_cols=["lid", "s", "e"], right_cols=["rid", "t"],
        key=None, bucket_width_us=60_000_000,
    ).to_pandas()
    assert sorted(out["rid"].tolist()) == [0, 1]


def test_rolling_sum_by_key_vs_bruteforce(ray_session):
    from table_annotation_ray.stages.windows import rolling_sum_by_key

    rng = np.random.default_rng(21)
    n = 500
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "id": np.arange(n),
            "k": rng.integers(0, 4, n),
            "ts": base + pd.to_timedelta(rng.integers(0, 86_400 * 3, n), unit="s"),
            "v": np.round(rng.uniform(0, 10, n), 2),
        }
    )
    # force ts ties inside a key to check RANGE peer semantics
    df.loc[10, ["k", "ts"]] = [df.loc[11, "k"], df.loc[11, "ts"]]
    w = pd.Timedelta(hours=6)
    out = (
        rolling_sum_by_key(rd.from_pandas(df).repartition(4), "k", "ts", "v", w)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    for _, r in df.iterrows():
        m = df[(df["k"] == r["k"]) & (df["ts"] >= r["ts"] - w) & (df["ts"] <= r["ts"])]
        got = float(out.loc[out["id"] == r["id"], "roll_sum"].iloc[0])
        assert abs(got - m["v"].sum()) < 1e-9


def test_bloom_filter_exactness_and_fp_rate(ray_session):
    from table_annotation_ray.stages.bloom import BloomFilter, build_bloom

    rng = np.random.default_rng(13)
    members = rng.choice(10**9, 5000, replace=False)
    bf = BloomFilter(1 << 16)
    bf.add(members)
    # no false negatives, ever
    assert bf.contains(members).all()
    probe = rng.choice(10**9, 20000, replace=False)
    non = np.setdiff1d(probe, members)
    fp = bf.contains(non).mean()
    assert fp < 0.05  # 64k bits / 5k keys ≈ well under 1%, allow slack
    # distributed build == flat build, bit for bit
    ds = rd.from_pandas(pd.DataFrame({"k": members})).repartition(5)
    dbf = build_bloom(ds, "k", m_bits=1 << 16)
    assert dbf.to_bytes() == bf.to_bytes()


def test_join_bloom_path_matches_plain(ray_session):
    from table_annotation_ray.stages.relational import (
        anti_join_keys,
        semi_join_keys,
    )

    rng = np.random.default_rng(17)
    left = pd.DataFrame({"k": rng.integers(0, 500, 3000)})
    right = pd.DataFrame({"rk": rng.choice(500, 120, replace=False)})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(2)
    for fn in (semi_join_keys, anti_join_keys):
        plain = sorted(
            fn(lds, rds, "k", "rk", broadcast_below=0, bloom_bits=None)
            .to_pandas()["k"]
        )
        bloom = sorted(
            fn(lds, rds, "k", "rk", broadcast_below=0, bloom_bits=1 << 12)
            .to_pandas()["k"]
        )
        assert plain == bloom and len(plain) > 0


def test_equi_join_paths_agree(ray_session):
    from table_annotation_ray.stages.relational import equi_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 30, 200),  # duplicate keys on both sides
            "lv": rng.normal(size=200),
            "ls": [f"l{i}" for i in range(200)],
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 40, 80),
            "rv": rng.integers(0, 100, 80),
            "rts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 1000, 80), unit="s"),
        }
    )
    want = (
        left.merge(right.rename(columns={"rk": "k"}), on="k", how="inner")
        .sort_values(["ls", "rv", "rts"])
        .reset_index(drop=True)
    )
    for bb in (10**6, 0):  # broadcast path, then forced co-location
        got = (
            equi_join(
                rd.from_pandas(left).repartition(4),
                rd.from_pandas(right).repartition(3),
                "k", "rk", broadcast_below=bb,
            )
            .to_pandas()
            .sort_values(["ls", "rv", "rts"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns], want)


def test_grouped_topk_boundary_ties(ray_session):
    df = pd.DataFrame(
        {
            "g": [1] * 4 + [2] * 2,
            "v": [5.0, 5.0, 5.0, 1.0, 3.0, 3.0],
            "id": [11, 12, 13, 14, 21, 22],
        }
    )
    out = (
        grouped_topk(
            rd.from_pandas(df).repartition(3), ["g"], "v", k=2,
            descending=True, tiebreak="id",
        )
        .to_pandas()
        .sort_values(["g", "id"])
        .reset_index(drop=True)
    )
    # group 1: three rows tie at v=5 — k=2 picks the two smallest ids
    assert out[out["g"] == 1]["id"].tolist() == [11, 12]
    assert out[out["g"] == 2]["id"].tolist() == [21, 22]


@pytest.mark.parametrize("dup_heavy", [False, True])
def test_exact_quantiles_vs_numpy(ray_session, dup_heavy):
    rng = np.random.default_rng(3)
    if dup_heavy:
        v = rng.integers(0, 20, 5000).astype(float)  # massive ties
    else:
        v = rng.lognormal(3.0, 1.0, 5000)
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(8)
    qs = [0.1, 0.5, 0.9, 0.99]
    # collect_below small enough to force ≥1 histogram refinement
    out = exact_quantiles(ds, "x", qs, bins=16, collect_below=200)
    sv = np.sort(v)
    for q, got in zip(out["q"], out["value"]):
        k = int(np.ceil(q * len(v)))
        assert got == sv[k - 1], (q, got, sv[k - 1])


def test_grouped_quantiles_vs_numpy(ray_session):
    from table_annotation_ray.stages.quantiles import grouped_quantiles

    rng = np.random.default_rng(5)
    g = rng.integers(0, 4, 4000)
    v = np.where(g == 0, rng.integers(0, 5, 4000).astype(float),
                 rng.normal(g * 10, 3.0, 4000))
    ds = rd.from_pandas(pd.DataFrame({"g": g, "x": v})).repartition(6)
    qs = [0.25, 0.5, 0.99]
    out = grouped_quantiles(ds, "g", "x", qs, bins=32)
    for gi in range(4):
        sv = np.sort(v[g == gi])
        for q in qs:
            k = int(np.ceil(q * len(sv)))
            got = out[(out["g"] == gi) & (out["q"] == q)]["value"].iloc[0]
            assert got == sv[k - 1], (gi, q)


def test_grouped_quantiles_fallback_path(ray_session):
    from table_annotation_ray.stages.quantiles import grouped_quantiles

    rng = np.random.default_rng(9)
    v = rng.normal(0, 1, 2000)
    df = pd.DataFrame({"g": np.zeros(2000, dtype=np.int64), "x": v})
    # collect_below smaller than any bin count forces the per-group
    # exact_quantiles fallback
    out = grouped_quantiles(
        rd.from_pandas(df).repartition(4), "g", "x", [0.5], bins=4,
        collect_below=10,
    )
    sv = np.sort(v)
    assert out["value"].iloc[0] == sv[int(np.ceil(0.5 * 2000)) - 1]


def test_exact_quantiles_small_input(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"x": [3.0, 1.0, 2.0]}))
    out = exact_quantiles(ds, "x", [0.5, 1.0])
    assert out["value"].tolist() == [2.0, 3.0]


def test_kll_sketch_weight_conservation_and_rank_error():
    from table_annotation_ray.stages.quantiles import KLLSketch

    rng = np.random.default_rng(17)
    vals = rng.lognormal(0, 1.2, 50_000)
    sk = KLLSketch(k=256, seed=3)
    for chunk in np.array_split(vals, 37):
        sk.add(chunk)
    assert sk.n_items() == len(vals)
    qs = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = sk.quantiles(qs)
    srt = np.sort(vals)
    for q, e in zip(qs, est):
        true_rank = np.searchsorted(srt, e) / len(vals)
        assert abs(true_rank - q) < 0.02, (q, true_rank)
    # merge of two halves obeys the same bound and exact counts
    a, b = KLLSketch(k=256, seed=5), KLLSketch(k=256, seed=9)
    a.add(vals[:25_000]); b.add(vals[25_000:])
    m = a.merge(b)
    assert m.n_items() == len(vals)
    for q, e in zip(qs, m.quantiles(qs)):
        true_rank = np.searchsorted(srt, e) / len(vals)
        assert abs(true_rank - q) < 0.025, (q, true_rank)


def test_kll_quantiles_dataset_vs_exact(ray_session):
    from table_annotation_ray.stages.quantiles import kll_quantiles

    rng = np.random.default_rng(23)
    vals = rng.normal(100, 15, 120_000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    qs = [0.1, 0.5, 0.9, 0.99]
    out = kll_quantiles(ds, "v", qs, k=256, batch_size=8192)
    srt = np.sort(vals)
    for q, e in zip(out["q"], out["value"]):
        true_rank = np.searchsorted(srt, e) / len(vals)
        assert abs(true_rank - q) < 0.025, (q, true_rank)


def test_kll_quantiles_nan_first_value(ray_session):
    # A batch whose FIRST element is NaN (or inf) must not crash the
    # scan: the partial seed derives from batch length, never values.
    from table_annotation_ray.stages.quantiles import kll_quantiles

    rng = np.random.default_rng(31)
    vals = rng.normal(0, 1, 5000)
    vals[0] = np.nan
    vals[2500] = np.inf  # first value of the second block after repartition
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(2)
    out = kll_quantiles(ds, "v", [0.5], k=128, batch_size=2048)
    med = out["value"].iloc[0]
    assert abs(med - np.median(vals[np.isfinite(vals)])) < 0.15


def test_equi_join_left_and_full_outer(ray_session):
    from table_annotation_ray.stages.relational import equi_join

    left = pd.DataFrame({"k": [1, 2, 3, 3, 5], "lv": [10, 20, 30, 31, 50]})
    right = pd.DataFrame({"rk": [2, 3, 3, 7], "rv": [200, 300, 301, 700]})
    lds, rds = rd.from_pandas(left).repartition(2), rd.from_pandas(right).repartition(2)

    for bb in (1000, 0):  # broadcast and bucketed paths
        got = (
            equi_join(lds, rds, "k", "rk", broadcast_below=bb, how="left")
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(right.rename(columns={"rk": "k"}), on="k", how="left")
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"k": "int64"}), want.astype({"k": "int64"}), check_dtype=False
        )

    got = (
        equi_join(lds, rds, "k", "rk", broadcast_below=1000, how="full")
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right.rename(columns={"rk": "k"}), on="k", how="outer")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64"}), want.astype({"k": "int64"}), check_dtype=False
    )
    # the unmatched-right row (k=7) must be present exactly once
    assert (got["k"] == 7).sum() == 1


def test_grouped_kll_quantiles_rank_error(ray_session):
    from table_annotation_ray.stages.quantiles import grouped_kll_quantiles

    rng = np.random.default_rng(37)
    n = 80_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "d"], n),
            "v": rng.lognormal(1.0, 0.8, n),
        }
    )
    qs = [0.25, 0.5, 0.9]
    out = (
        grouped_kll_quantiles(
            rd.from_pandas(df).repartition(6), "g", "v", qs, batch_size=8192
        )
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    assert len(out) == 4 * len(qs)
    for g, sub in df.groupby("g"):
        srt = np.sort(sub["v"].to_numpy())
        for q in qs:
            est = out[(out["g"] == g) & (out["q"] == q)]["value"].iloc[0]
            true_rank = np.searchsorted(srt, est) / len(srt)
            assert abs(true_rank - q) < 0.025, (g, q, true_rank)


# --- fifth code-review batch regressions -----------------------------------


def test_exact_quantiles_ignores_nulls(ray_session):
    """Rank base = non-null count (SQL semantics); a null-inflated
    Count() shifted every rank / IndexErrored on nullable columns."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    x = rng.normal(size=400)
    df = pd.DataFrame({"x": np.r_[x, np.full(100, np.nan)]})
    ds = rd.from_pandas(df.sample(frac=1.0, random_state=1)).repartition(4)
    qs = [0.1, 0.5, 0.99, 1.0]
    out = exact_quantiles(ds, "x", qs, bins=16, collect_below=50)
    xs = np.sort(x)
    for q, v in zip(out["q"], out["value"]):
        k = max(int(np.ceil(q * len(xs))), 1)
        assert v == xs[k - 1], q


def test_anti_join_bloom_path_chains_downstream(ray_session):
    """The Bloom anti-join unions its definite-absent stream with the
    co-located exact stream; both must be Arrow so a DOWNSTREAM batcher
    can consume the union (mixed block types crash next_batch)."""
    import ray.data as rd

    from table_annotation_ray.stages.relational import anti_join_keys

    left = rd.from_pandas(
        pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})
    ).repartition(4)
    right = rd.from_pandas(
        pd.DataFrame({"k": np.arange(0, 1000, 2, dtype=np.int64)})
    ).repartition(3)
    out = anti_join_keys(left, right, "k", broadcast_below=0, bloom_bits=1 << 14)
    # chain a groupby (sort-shuffle) over the union — the crash site
    n_odd = (
        out.map_batches(
            lambda b: pd.DataFrame({"k": b["k"], "one": np.ones(len(b), dtype=np.int64)}),
            batch_format="pandas",
        )
        .groupby("k")
        .count()
        .to_pandas()
    )
    assert len(n_odd) == 500
    assert set(n_odd["k"]) == set(range(1, 1000, 2))


def test_filter_rows_by_keys_timestamp_payload(ray_session):
    """Bucketed path with a timestamp payload column: sentinel fillers
    must come from the ACTUAL dtypes (joins._tag_union), not int64 0."""
    import ray.data as rd

    from table_annotation_ray.stages.relational import filter_rows_by_keys

    left = pd.DataFrame(
        {
            "doc_id": np.arange(20, dtype=np.int64),
            "ts": pd.date_range("2024-01-01", periods=20, freq="h"),
            "text": [f"doc {i}" for i in range(20)],
        }
    )
    keys = pd.DataFrame({"doc_id": np.array([3, 7, 11], dtype=np.int64)})
    out = filter_rows_by_keys(
        rd.from_pandas(left).repartition(3),
        rd.from_pandas(keys),
        "doc_id",
        keep_members=False,
        broadcast_below=0,  # force the bucketed exchange
    ).to_pandas()
    assert sorted(out["doc_id"]) == [i for i in range(20) if i not in (3, 7, 11)]
    merged = out.merge(left, on="doc_id", suffixes=("", "_want"))
    assert (merged["ts"] == merged["ts_want"]).all()


def test_equi_join_overlap_raises_on_broadcast_path(ray_session):
    """Overlapping payload columns must raise on BOTH paths — the
    broadcast early-return previously let pandas suffix them to _x/_y."""
    import ray.data as rd

    from table_annotation_ray.stages.relational import equi_join

    lds = rd.from_pandas(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    rds = rd.from_pandas(pd.DataFrame({"k": [1, 2], "v": [30, 40]}))
    for bb in (1000, 0):  # broadcast and bucketed
        with pytest.raises(ValueError, match="overlapping payload"):
            equi_join(lds, rds, "k", broadcast_below=bb)


def test_interval_join_inverted_interval_matches_nothing(ray_session):
    """end <= start intervals match nothing — the probe used to compute
    a NEGATIVE searchsorted count and crash np.repeat for the whole
    bucket (review r4)."""
    import pandas as pd

    from table_annotation_ray.stages.joins import interval_join

    t0 = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "iv_id": np.array([1, 2], dtype=np.int64),
            "start": [t0, t0 + pd.Timedelta(hours=2)],
            "end": [t0 + pd.Timedelta(hours=1), t0 + pd.Timedelta(hours=1)],
        }
    )
    right = pd.DataFrame(
        {
            "ev_id": np.array([10, 11], dtype=np.int64),
            "ts": [t0 + pd.Timedelta(minutes=30), t0 + pd.Timedelta(minutes=150)],
        }
    )
    out = interval_join(
        rd.from_pandas(left), rd.from_pandas(right),
        start="start", end="end", right_ts="ts",
        left_cols=["iv_id", "start", "end"], right_cols=["ev_id", "ts"],
    ).to_pandas()
    # only the well-formed interval matches; the inverted one is silent
    assert sorted(zip(out["iv_id"], out["ev_id"])) == [(1, 10)]


def test_pivot_table_matches_pandas(ray_session):
    from table_annotation_ray.stages.relational import pivot_table

    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n),
            "cat": rng.choice(["a", "b", "c"], n),
            "v": rng.normal(size=n).round(3),
        }
    )
    # a key with no 'c' rows at all -> that cell must come back 0 (sum)
    df = df[~((df["k"] == 5) & (df["cat"] == "c"))]
    ds = rd.from_pandas(df).repartition(6)

    got = (
        pivot_table(ds, ["k"], "cat", "v", agg="sum")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        df.pivot_table(index="k", columns="cat", values="v",
                       aggfunc="sum", fill_value=0.0)
        .reset_index().sort_values("k").reset_index(drop=True)
    )
    for c in ("a", "b", "c"):
        np.testing.assert_allclose(
            got[f"sum_{c}"].to_numpy(), want[c].to_numpy(), rtol=1e-9
        )

    # count mode counts non-null values only (SQL COUNT(expr))
    df2 = df.copy()
    df2.loc[df2.index[:50], "v"] = np.nan
    got_n = (
        pivot_table(rd.from_pandas(df2).repartition(4), ["k"], "cat", "v",
                    agg="count", values=["a", "b", "c"])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want_n = (
        df2.dropna(subset=["v"])
        .pivot_table(index="k", columns="cat", values="v",
                     aggfunc="size", fill_value=0)
        .reindex(sorted(df2["k"].unique()), fill_value=0)
        .reset_index()
    )
    for c in ("a", "b", "c"):
        np.testing.assert_array_equal(
            got_n[f"count_{c}"].to_numpy(dtype=np.int64),
            want_n[c].to_numpy(dtype=np.int64),
        )

    # bounded-domain contract survives
    with pytest.raises(ValueError):
        pivot_table(ds, ["k"], "cat", "v", max_values=2)


def test_unpivot_roundtrip(ray_session):
    from table_annotation_ray.stages.relational import pivot_table, unpivot

    df = pd.DataFrame(
        {
            "id": np.arange(200, dtype=np.int64),
            "m1": np.arange(200, dtype=np.float64),
            "m2": np.arange(200, dtype=np.float64) * 2,
        }
    )
    long = unpivot(rd.from_pandas(df).repartition(3), ["id"], ["m1", "m2"]).to_pandas()
    assert len(long) == 400
    assert set(long["measure"]) == {"m1", "m2"}
    want = df.melt(id_vars=["id"], value_vars=["m1", "m2"],
                   var_name="measure", value_name="value")
    got = long.sort_values(["measure", "id"]).reset_index(drop=True)
    want = want.sort_values(["measure", "id"]).reset_index(drop=True)
    np.testing.assert_allclose(got["value"].to_numpy(), want["value"].to_numpy())

    # melt -> pivot round-trips to the original wide frame
    wide = (
        pivot_table(
            rd.from_pandas(long), ["id"], "measure", "value",
            agg="sum", prefix="",
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    np.testing.assert_allclose(wide["m1"].to_numpy(), df["m1"].to_numpy())
    np.testing.assert_allclose(wide["m2"].to_numpy(), df["m2"].to_numpy())

    with pytest.raises(ValueError):
        unpivot(rd.from_pandas(df), ["id"], [])


def test_ntile_matches_sql_semantics(ray_session):
    import duckdb

    from table_annotation_ray.stages.datapipe import ntile

    rng = np.random.default_rng(5)
    for n, k in [(103, 8), (16, 4), (3, 7)]:
        df = pd.DataFrame(
            {
                "id": np.arange(n, dtype=np.int64),
                "v": rng.integers(0, 20, n).astype(np.float64),  # heavy ties
            }
        )
        got = (
            ntile(rd.from_pandas(df).repartition(4), ["v"], "id", k=k)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            f"SELECT id, NTILE({k}) OVER (ORDER BY v, id) AS tile FROM t ORDER BY id"
        ).fetchdf()
        np.testing.assert_array_equal(
            got["tile"].to_numpy(dtype=np.int64), want["tile"].to_numpy(np.int64)
        )
    with pytest.raises(ValueError):
        ntile(rd.from_pandas(df), ["v"], "id", k=0)


def test_equi_join_hot_keys_split_matches_plain(ray_session):
    from table_annotation_ray.stages.relational import equi_join

    rng = np.random.default_rng(9)
    n = 20_000
    # one celebrity key holding ~half the left mass
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 500, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys, "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame(
        {"k": np.arange(0, 500, 2, dtype=np.int64),
         "rv": np.arange(250, dtype=np.int64) * 10}
    )

    # hot_keys: 8 present in right (hot join produces matches via the
    # broadcast branch), 7 and 3 absent (how='left' null branch); cold
    # side (248 right rows > broadcast_below=100) takes the bucketed path
    for how in ("inner", "left"):
        plain = equi_join(
            rd.from_pandas(left).repartition(8),
            rd.from_pandas(right).repartition(3),
            "k", broadcast_below=0, how=how,
        ).to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
        split = equi_join(
            rd.from_pandas(left).repartition(8),
            rd.from_pandas(right).repartition(3),
            "k", broadcast_below=100, how=how, hot_keys=[7, 3, 8],
        ).to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            plain, split[plain.columns], check_dtype=False
        )

    with pytest.raises(ValueError):
        equi_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                  how="full", hot_keys=[7])


def test_char_jaccard_link_matches_bruteforce(ray_session):
    from table_annotation_ray.stages.relational import char_jaccard_link

    rng = np.random.default_rng(13)
    words = ["alpha", "alder", "amber", "beta", "bets", "bolt", "gear",
             "gaze", "gizmo", "alphas", "bet", ""]
    ids = np.arange(len(words), dtype=np.int64)
    df = pd.DataFrame({"vid": ids, "name": words})
    df.loc[len(df)] = [99, None]  # null text must drop, not crash
    got = (
        char_jaccard_link(rd.from_pandas(df).repartition(4), "vid", "name", 0.6)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )

    want = []
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            s, t = words[i], words[j]
            if not s or not t or s[0] != t[0]:
                continue
            a, b = set(s), set(t)
            sim = len(a & b) / len(a | b)
            if sim >= 0.6:
                want.append((ids[i], ids[j], np.floor(sim * 1e6 + 0.5) / 1e6))
    want.sort()
    assert len(got) == len(want) > 0
    np.testing.assert_array_equal(got["a"].to_numpy(np.int64), [w[0] for w in want])
    np.testing.assert_array_equal(got["b"].to_numpy(np.int64), [w[1] for w in want])
    np.testing.assert_allclose(got["sim"].to_numpy(), [w[2] for w in want])

    # degenerate block hard-fails (never silently under-links)
    big = pd.DataFrame({"vid": np.arange(30, dtype=np.int64),
                        "name": ["x" + str(i) for i in range(30)]})
    with pytest.raises(Exception, match="max_block"):
        char_jaccard_link(rd.from_pandas(big), "vid", "name", 0.5,
                          max_block=10).to_pandas()


def test_set_op_distinct_matches_sql_semantics(ray_session):
    import duckdb

    from table_annotation_ray.stages.relational import set_op_distinct

    a = pd.DataFrame({"k": [1, 1, 2, 3, 5], "s": ["x", "x", "y", "y", "z"]})
    b = pd.DataFrame({"k": [2, 3, 3, 4], "s": ["y", "y", "q", "y"]})
    con = duckdb.connect()
    con.register("a", a)
    con.register("b", b)
    for op, kw in (("intersect", "INTERSECT"), ("except", "EXCEPT"),
                   ("union", "UNION")):
        got = (
            set_op_distinct(rd.from_pandas(a).repartition(3),
                            rd.from_pandas(b).repartition(2), ["k", "s"], op)
            .to_pandas().sort_values(["k", "s"]).reset_index(drop=True)
        )
        want = con.execute(
            f"SELECT k, s FROM a {kw} SELECT k, s FROM b ORDER BY k, s"
        ).fetchdf()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # empty result keeps a typed schema (string col must not become NULL)
    empty = set_op_distinct(
        rd.from_pandas(a), rd.from_pandas(a), ["k", "s"], "except"
    ).to_pandas()
    assert len(empty) == 0

    with pytest.raises(ValueError):
        set_op_distinct(rd.from_pandas(a), rd.from_pandas(b), ["k"], "minus")


def test_percent_rank_matches_window(ray_session):
    import duckdb

    from table_annotation_ray.stages.datapipe import percent_rank

    rng = np.random.default_rng(37)
    df = pd.DataFrame(
        {"id": np.arange(500, dtype=np.int64),
         "v": rng.integers(0, 50, 500).astype(np.float64)}
    )
    got = (
        percent_rank(rd.from_pandas(df).repartition(4), ["v"], "id")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT id, PERCENT_RANK() OVER (ORDER BY v, id) AS pr FROM t ORDER BY id"
    ).fetchdf()
    np.testing.assert_allclose(got["pct_rank"].to_numpy(), want["pr"].to_numpy(),
                               atol=1e-12)
    # single row -> 0.0
    one = percent_rank(rd.from_pandas(df.head(1)), ["v"], "id").to_pandas()
    assert one["pct_rank"].iloc[0] == 0.0


def test_merge_upsert_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from table_annotation_ray.stages.relational import merge_upsert

    cols = ["k", "ts", "seq", "val", "dead"]
    base = pd.DataFrame(
        {"k": [1, 2, 3, 4], "ts": [10, 10, 10, 99], "seq": [0, 0, 0, 0],
         "val": ["b1", "b2", "b3", "b4"], "dead": [False] * 4}
    )
    changes = pd.DataFrame(
        {
            # k=1: newest change wins; k=2: winning change is a delete;
            # k=3: no change -> base survives; k=4: change with OLDER ts
            # than base still beats base (side precedence); k=5: insert;
            # k=6: equal-ts changes tie-break to smallest seq
            "k":    [1, 1, 2, 4, 5, 6, 6],
            "ts":   [20, 30, 20, 5, 7, 8, 8],
            "seq":  [1, 2, 3, 4, 5, 7, 6],
            "val":  ["c1a", "c1b", "c2", "c4", "c5", "c6b", "c6a"],
            "dead": [False, False, True, False, False, False, False],
        }
    )
    out = (
        merge_upsert(
            rd.from_pandas(base[cols]).repartition(3),
            rd.from_pandas(changes[cols]).repartition(4),
            "k", "ts", "seq", delete_col="dead",
        )
        .to_pandas()
        .sort_values("k")
    )
    assert dict(zip(out.k, out.val)) == {
        1: "c1b", 3: "b3", 4: "c4", 5: "c5", 6: "c6a"
    }

    # without delete semantics the tombstone row simply wins
    out2 = merge_upsert(
        rd.from_pandas(base[cols]), rd.from_pandas(changes[cols]),
        "k", "ts", "seq",
    ).to_pandas()
    assert dict(zip(out2.k, out2.val))[2] == "c2"

    with pytest.raises(ValueError, match="share one schema"):
        merge_upsert(
            rd.from_pandas(base[["k", "ts", "seq", "val"]]),
            rd.from_pandas(changes[cols]), "k", "ts", "seq",
        )


def test_audience_overlap_reference(ray_session):
    import itertools

    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.relational import audience_overlap

    rows = []
    sets = {"x": {1, 2, 3, 4}, "y": {3, 4, 5}, "z": {9}}
    for cat, users in sets.items():
        for u in users:
            rows.append({"u": u, "c": cat})
            rows.append({"u": u, "c": cat})  # duplicates must not count
    out = audience_overlap(
        rd.from_pandas(pd.DataFrame(rows)).repartition(3), "u", "c"
    ).set_index(["cat_a", "cat_b"])
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            assert (a, b) not in out.index
            continue
        r = out.loc[(a, b)]
        assert r["n_both"] == inter
        assert r["n_a"] == len(sets[a]) and r["n_b"] == len(sets[b])
        assert abs(r["jaccard"] - round(inter / len(sets[a] | sets[b]), 6)) < 1e-9


def test_association_rules_brute_force(ray_session):
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.relational import association_rules

    rng = np.random.default_rng(5)
    rows = []
    for b in range(60):
        items = rng.choice(12, size=rng.integers(1, 6), replace=True)
        rows += [(b, int(i)) for i in items]  # dup items within basket
    df = pd.DataFrame(rows, columns=["basket", "item"])

    out = (
        association_rules(
            rd.from_pandas(df).repartition(4), "basket", "item",
            min_pair_count=2,
        )
        .to_pandas()
        .sort_values(["antecedent", "consequent"])
        .reset_index(drop=True)
    )

    # brute-force reference
    baskets = df.drop_duplicates().groupby("basket")["item"].agg(set)
    n = len(baskets)
    supp = {}
    pair = {}
    for items in baskets:
        for i in items:
            supp[i] = supp.get(i, 0) + 1
        for a, b in itertools.combinations(sorted(items), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    exp = []
    for (a, b), nab in sorted(pair.items()):
        if nab < 2:
            continue
        for ant, con in ((a, b), (b, a)):
            exp.append(
                (ant, con, nab, supp[ant], supp[con],
                 nab / n, nab / supp[ant], nab * n / (supp[ant] * supp[con]))
            )
    ref = pd.DataFrame(
        exp,
        columns=["antecedent", "consequent", "n_both", "n_ant", "n_cons",
                 "support", "confidence", "lift"],
    ).sort_values(["antecedent", "consequent"]).reset_index(drop=True)
    assert len(out) == len(ref)
    for c in ("n_both", "n_ant", "n_cons"):
        assert (out[c].to_numpy() == ref[c].to_numpy()).all()
    for c in ("support", "confidence", "lift"):
        np.testing.assert_allclose(out[c].to_numpy(), ref[c].to_numpy(),
                                   rtol=1e-12)
