"""Round-5 fourth wave: ORC source/sink, table checksum, per-key gap
stats, one-pass correlation matrix — pinned against hand computations
and single-process references."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from table_annotation_ray.sources.jsonl import read_documents
from table_annotation_ray.sources.orc import read_orc, write_orc
from table_annotation_ray.stages.dq import table_checksum
from table_annotation_ray.stages.stats import pairwise_corr
from table_annotation_ray.stages.windows import gap_stats_by_key


def test_orc_roundtrip_and_pruning(ray_session, tmp_path):
    import pyarrow.orc as orc

    df = pd.DataFrame(
        {
            "doc_id": np.arange(200),
            "text": [f"doc number {i}" for i in range(200)],
            "n": np.arange(200) * 3,
        }
    )
    src = tmp_path / "in"
    src.mkdir()
    orc.write_table(pa.Table.from_pandas(df), str(src / "a.orc"))

    # full read through the dispatcher (extension-based)
    back = (
        read_documents(str(src / "a.orc"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, df)

    # pruned read only carries the asked columns
    pruned = read_orc(str(src), columns=["doc_id", "n"]).to_pandas()
    assert sorted(pruned.columns) == ["doc_id", "n"]

    # missing column fails at the read, not downstream
    with pytest.raises(Exception, match="lacks columns"):
        read_orc(str(src), columns=["nope"]).materialize()

    # distributed write -> one file per block, reads back identically
    out = tmp_path / "out"
    write_orc(rd.from_pandas(df).repartition(4), str(out))
    files = [f for f in os.listdir(out) if f.endswith(".orc")]
    assert len(files) == 4
    back2 = (
        read_orc(str(out))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back2, df)


def test_table_checksum_order_independent(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3], "t": ["a", "b", None]})
    a = table_checksum(rd.from_pandas(df).repartition(3), ["id", "t"])
    b = table_checksum(
        rd.from_pandas(df.iloc[::-1].reset_index(drop=True)), ["id", "t"]
    )
    assert a["checksum"].iloc[0] == b["checksum"].iloc[0]
    assert a["n_rows"].iloc[0] == 3
    # exact value pinned against hashlib (NULL renders as empty string)
    M = 9223372036854775807
    exp = sum(
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        for s in ["1|a", "2|b", "3|"]
    ) % M
    assert int(a["checksum"].iloc[0]) == exp
    # any single-row change moves the checksum
    df2 = df.assign(t=["a", "b", "c"])
    c = table_checksum(rd.from_pandas(df2), ["id", "t"])
    assert c["checksum"].iloc[0] != a["checksum"].iloc[0]


def test_gap_stats_hand_case(ray_session):
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 3, 3],
            "ts": [base, base + pd.Timedelta(seconds=10),
                   base + pd.Timedelta(seconds=11),
                   base + pd.Timedelta(seconds=25),
                   base,
                   base, base + pd.Timedelta(microseconds=7)],
            "id": [1, 2, 3, 4, 5, 6, 7],
        }
    )
    out = (
        gap_stats_by_key(rd.from_pandas(df).repartition(3), "k", "ts", "id")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # key 2 has a single event -> no gap row
    assert out["k"].tolist() == [1, 3]
    assert out["n_gaps"].tolist() == [3, 1]
    assert out["min_gap_us"].tolist() == [1_000_000, 7]
    assert out["max_gap_us"].tolist() == [14_000_000, 7]
    # gaps for k=1: 10s, 1s, 14s -> median 10s
    assert out["median_gap_us"].tolist() == [10_000_000.0, 7.0]


def test_pairwise_corr_vs_numpy(ray_session):
    rng = np.random.default_rng(11)
    x = rng.normal(size=400)
    df = pd.DataFrame(
        {"a": x, "b": 2 * x + rng.normal(size=400), "c": rng.normal(size=400)}
    )
    out = pairwise_corr(
        rd.from_pandas(df).repartition(4), ["a", "b", "c"]
    ).set_index(["col_a", "col_b"])
    ref = np.corrcoef(df.to_numpy().T)
    assert out.loc[("a", "b"), "r"] == pytest.approx(ref[0, 1], abs=2e-6)
    assert out.loc[("a", "c"), "r"] == pytest.approx(ref[0, 2], abs=2e-6)
    assert out.loc[("b", "c"), "r"] == pytest.approx(ref[1, 2], abs=2e-6)
    # constant column -> NULL r
    df2 = pd.DataFrame({"a": [1.0, 1.0, 1.0], "b": [1.0, 2.0, 3.0]})
    out2 = pairwise_corr(rd.from_pandas(df2), ["a", "b"])
    assert np.isnan(out2["r"].iloc[0])
    with pytest.raises(ValueError):
        pairwise_corr(rd.from_pandas(df2), ["a"])


def test_frequency_histogram_hand_case(ray_session):
    from table_annotation_ray.stages.agg import frequency_histogram

    df = pd.DataFrame({"k": [1, 1, 1, 2, 2, 3, 4, 5]})
    out = (
        frequency_histogram(rd.from_pandas(df).repartition(3), ["k"])
        .to_pandas()
        .sort_values("n_per_key")
        .reset_index(drop=True)
    )
    # three singletons, one pair, one triple
    assert out["n_per_key"].tolist() == [1, 2, 3]
    assert out["n_keys"].tolist() == [3, 1, 1]


def test_linear_attribution_hand_case(ray_session):
    from table_annotation_ray.stages.windows import linear_attribution

    base = pd.Timestamp("2024-01-01 12:00:00")
    s = pd.Timedelta(seconds=1)
    rows = [
        # u1: view, click, purchase  -> 0.5 each
        (1, base, "view"), (1, base + s, "click"), (1, base + 2 * s, "purchase"),
        # u1 second purchase 10s later, window 5s: only sees nothing -> (none)
        (1, base + 20 * s, "purchase"),
        # u2: touchless purchase -> (none)
        (2, base, "purchase"),
        # u3: click exactly AT purchase ts is excluded (strict <)
        (3, base, "click"), (3, base, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["u", "ts", "t"])
    out = linear_attribution(
        rd.from_pandas(df).repartition(3), "u", "ts", "t", "purchase", 5.0
    ).set_index("touch_type")
    assert out.loc["view", "credit"] == 0.5
    assert out.loc["click", "credit"] == 0.5
    assert out.loc["(none)", "credit"] == 3.0  # u1 2nd + u2 + u3


def test_local_clustering_hand_graph(ray_session):
    from table_annotation_ray.stages.graph import local_clustering

    # triangle 1-2-3 plus pendant 4 attached to 1
    e = pd.DataFrame({"s": [1, 2, 1, 1], "d": [2, 3, 3, 4]})
    out = (
        local_clustering(rd.from_pandas(e), "s", "d")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert out["node"].tolist() == [1, 2, 3, 4]
    assert out["deg"].tolist() == [3, 2, 2, 1]
    assert out["triangles"].tolist() == [1, 1, 1, 0]
    # cc(1) = 2*1/(3*2) = 1/3; cc(2)=cc(3)=1; cc(4) NULL (deg<2)
    assert out.loc[0, "cc"] == pytest.approx(1 / 3, abs=1e-6)
    assert out.loc[1, "cc"] == 1.0 and out.loc[2, "cc"] == 1.0
    assert np.isnan(out.loc[3, "cc"])


def test_merge_aggregates_identity(ray_session):
    """merge_aggregates(agg(old), new) == agg(old ∪ new) for every
    composable reducer — the incremental-materialized-view contract."""
    from table_annotation_ray.stages.agg import grouped_reduce, merge_aggregates

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, 500),
            "v": rng.integers(-50, 50, 500).astype("int64"),
        }
    )
    old, new = df.iloc[:350], df.iloc[350:]
    reducers = {
        "n": (None, "count"),
        "s": ("v", "sum"),
        "lo": ("v", "min"),
        "hi": ("v", "max"),
    }
    base = grouped_reduce(rd.from_pandas(old).repartition(3), ["k"], reducers)
    merged = (
        merge_aggregates(base, rd.from_pandas(new).repartition(3), ["k"], reducers)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    full = (
        grouped_reduce(rd.from_pandas(df).repartition(4), ["k"], reducers)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        merged[["k", "n", "s", "lo", "hi"]], full[["k", "n", "s", "lo", "hi"]]
    )
    # delta-only keys and base-only keys both survive the fold
    assert set(merged["k"]) == set(df["k"].unique())


def test_merge_aggregates_retraction(ray_session):
    """Negated delta rows retract sum/count partials (deletes in CDC)."""
    from table_annotation_ray.stages.agg import grouped_reduce, merge_aggregates

    df = pd.DataFrame({"k": [1, 1, 2], "v": [10, 5, 7]})
    reducers = {"n": (None, "count"), "s": ("v", "sum")}
    base = grouped_reduce(rd.from_pandas(df), ["k"], reducers)
    # retract the (1, 5) row: ship a pre-negated PARTIAL via base-side union
    retract = rd.from_pandas(pd.DataFrame({"k": [1], "n": [-1], "s": [-5]}))
    merged = (
        merge_aggregates(base.union(retract), rd.from_pandas(df.iloc[:0]), ["k"],
                         reducers)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert merged.loc[merged["k"] == 1, "n"].item() == 1
    assert merged.loc[merged["k"] == 1, "s"].item() == 10


def _holt_reference(df, key, order, val, alpha, beta):
    out = []
    for k, g in df.sort_values([key] + order).groupby(key, sort=False):
        y = g[val].to_numpy(np.float64)
        level, trend = y[0], 0.0
        for t in range(1, len(y)):
            prev = level
            level = alpha * y[t] + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
        out.append((k, len(y), level, trend, level + trend))
    r = pd.DataFrame(out, columns=[key, "n", "level", "trend", "forecast"])
    for c in ("level", "trend", "forecast"):
        v = r[c].to_numpy(np.float64)
        r[c] = np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6
    return r.sort_values(key).reset_index(drop=True)


def test_holt_by_key_vs_reference(ray_session):
    from table_annotation_ray.stages.windows import holt_by_key

    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 25, n),
            "ts": rng.permutation(n),
            "v": np.round(rng.normal(100, 15, n), 2),
        }
    )
    got = (
        holt_by_key(rd.from_pandas(df).repartition(5), "u", ["ts"], "v",
                    alpha=0.4, beta=0.2)
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    want = _holt_reference(df, "u", ["ts"], "v", 0.4, 0.2)
    got["u"] = got["u"].astype(want["u"].dtype)
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-9)


def test_holt_by_key_validates_params(ray_session):
    from table_annotation_ray.stages.windows import holt_by_key

    with pytest.raises(ValueError):
        holt_by_key(rd.from_pandas(pd.DataFrame({"u": [1], "ts": [1], "v": [1.0]})),
                    "u", ["ts"], "v", alpha=0.0)


def _bellman_ford(edges_df, source):
    """Single-process reference: undirected, min weight per pair."""
    import collections

    adj = collections.defaultdict(list)
    seen = {}
    for u, v, w in edges_df.itertuples(index=False):
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        key = (a, b)
        if key not in seen or w < seen[key]:
            seen[key] = w
    for (a, b), w in seen.items():
        adj[a].append((b, w))
        adj[b].append((a, w))
    dist = {source: 0}
    frontier = {source}
    while frontier:
        nxt = set()
        for u in frontier:
            for v, w in adj[u]:
                nd = dist[u] + w
                if v not in dist or nd < dist[v]:
                    dist[v] = nd
                    nxt.add(v)
        frontier = nxt
    return dist


def test_sssp_both_engines_vs_reference(ray_session):
    from table_annotation_ray.stages.graph import sssp_distances

    rng = np.random.default_rng(5)
    n_edges = 300
    df = pd.DataFrame(
        {
            "s": rng.integers(0, 60, n_edges),
            "d": rng.integers(0, 60, n_edges),
            "w": rng.integers(1, 100, n_edges).astype("int64"),
        }
    )
    want = _bellman_ford(df, 0)
    ds = rd.from_pandas(df).repartition(4)
    for bb in (2_000_000, 0):  # driver engine, then forced dataset engine
        got = (
            sssp_distances(ds, 0, "s", "d", "w", broadcast_below=bb)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert dict(zip(got["node"], got["dist"])) == want, f"engine bb={bb}"


def test_sssp_disconnected_and_parallel_edges(ray_session):
    from table_annotation_ray.stages.graph import sssp_distances

    df = pd.DataFrame(
        {
            "s": [1, 1, 2, 2, 5, 1],
            "d": [2, 2, 3, 1, 6, 1],
            "w": [10, 4, 1, 3, 2, 9],
        }
    )
    got = (
        sssp_distances(rd.from_pandas(df), 1, "s", "d", "w")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # parallel 1-2 edges collapse to min(10,4,3)=3; self-loop dropped;
    # 5-6 component unreachable
    assert dict(zip(got["node"], got["dist"])) == {1: 0, 2: 3, 3: 4}
