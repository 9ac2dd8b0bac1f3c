"""Round-5 fifth wave: Arrow IPC source/sink, streaming out-of-order
audit, rare-term pair blocking, rank fusion, gopher rules, cohort
retention — pinned against hand computations and references."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def test_feather_roundtrip_and_pruning(ray_session, tmp_path):
    from table_annotation_ray.sources.feather import read_feather, write_feather

    df = pd.DataFrame(
        {
            "doc_id": np.arange(300),
            "text": [f"doc {i}" for i in range(300)],
            "emb": [[float(i), float(i + 1)] for i in range(300)],
        }
    )
    out_dir = str(tmp_path / "ipc")
    write_feather(rd.from_pandas(df).repartition(4), out_dir)
    back = read_feather(out_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == list(range(300))
    assert back["text"].tolist() == df["text"].tolist()
    # list column survives byte-exactly (the reason IPC exists here)
    assert back["emb"].map(list).tolist() == df["emb"].tolist()

    pruned = read_feather(out_dir, columns=["doc_id"]).to_pandas()
    assert list(pruned.columns) == ["doc_id"]
    with pytest.raises(Exception, match="lacks columns"):
        read_feather(out_dir, columns=["nope"]).materialize()


def test_out_of_order_stats_hand_case(ray_session):
    from table_annotation_ray.stages.windows import out_of_order_stats

    base = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        # u1 arrival order: ts 0, 5, 3 (late by 2s), 4 (late by 1s), 9
        (1, 1, base), (1, 2, base + 5 * s), (1, 3, base + 3 * s),
        (1, 4, base + 4 * s), (1, 5, base + 9 * s),
        # u2: strictly ordered
        (2, 1, base), (2, 2, base + s),
        # u3: single event
        (3, 1, base),
    ]
    df = pd.DataFrame(rows, columns=["u", "seq", "ts"])
    out = (
        out_of_order_stats(rd.from_pandas(df).repartition(3), "u", "seq", "ts")
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    assert out["n_events"].tolist() == [5, 2, 1]
    assert out["n_late"].tolist() == [2, 0, 0]
    assert out["max_delay_us"].tolist() == [2_000_000, 0, 0]


def test_rare_term_pairs_hand_case(ray_session):
    from table_annotation_ray.stages.retrieval import rare_term_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "common zebra quark",
                "common zebra quark extra",
                "common other words",
                "common zebra",
            ],
        }
    )
    # df: common=4 (dropped at max_df=3), zebra=3, quark=2
    out = (
        rare_term_pairs(
            rd.from_pandas(docs).repartition(2), max_df=3, min_shared=2
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # only (1,2) shares two rare terms (zebra+quark)
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert out["n_shared"].tolist() == [2]
    # with min_shared=1, (1,4) and (2,4) join via zebra
    out1 = (
        rare_term_pairs(rd.from_pandas(docs), max_df=3, min_shared=1)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert out1[["doc_a", "doc_b"]].values.tolist() == [[1, 2], [1, 4], [2, 4]]


def test_fuse_rankings_borda_and_rrf(ray_session):
    from table_annotation_ray.stages.retrieval import fuse_rankings

    r1 = pd.DataFrame({"id": [10, 20, 30], "rank": [1, 2, 3]})
    r2 = pd.DataFrame({"id": [20, 40], "rank": [1, 2]})
    out = (
        fuse_rankings(
            [rd.from_pandas(r1), rd.from_pandas(r2)], "id", "rank",
            method="rrf",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # borda: missing charged len+1 (r1: 4, r2: 3)
    want = {10: 1 + 3, 20: 2 + 1, 30: 3 + 3, 40: 4 + 2}
    assert dict(zip(out["id"], out["fused_rank_sum"])) == want
    assert dict(zip(out["id"], out["n_lists"])) == {10: 1, 20: 2, 30: 1, 40: 1}
    rrf = dict(zip(out["id"], out["fused_score"]))
    expect_20 = round(1 / 62 + 1 / 61, 6)
    assert rrf[20] == pytest.approx(expect_20, abs=1e-9)
    with pytest.raises(ValueError):
        fuse_rankings([rd.from_pandas(r1)], "id", "rank", method="nope")


def test_gopher_rules_hand_case(ray_session):
    from table_annotation_ray.stages.textstats import gopher_rules

    good = "the be to of and that have with " + "word " * 60
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                good,
                "- a\n- b\nplain",          # bullet-heavy, too short
                "### symbols " + good,      # symbols but diluted: passes
            ],
        }
    )
    out = gopher_rules(df).set_index("doc_id")
    assert bool(out.loc[1, "keep"])
    assert not bool(out.loc[2, "keep"]) and not bool(out.loc[2, "r_bullet"])
    assert out.loc[3, "n_symbols"] == 3
    assert bool(out.loc[3, "r_symbol"])  # 30 <= 70 words


def test_cohort_retention_hand_case(ray_session):
    from table_annotation_ray.stages.windows import cohort_retention

    base = pd.Timestamp("2024-01-01")  # epoch day 19723, week 2817 (int math)
    d = pd.Timedelta(days=1)
    rows = [
        (1, base), (1, base + 8 * d),          # cohort w, returns w+1
        (2, base), (2, base + 8 * d), (2, base + 8 * d),  # dup same week
        (3, base + 8 * d),                     # later cohort
    ]
    df = pd.DataFrame(rows, columns=["u", "ts"])
    out = (
        cohort_retention(rd.from_pandas(df).repartition(2), "u", "ts")
        .to_pandas()
        .sort_values(["cohort_period", "period_offset"])
        .reset_index(drop=True)
    )
    w0 = int(base.value // 1000 // 86_400_000_000 // 7)
    assert out.values.tolist() == [
        [w0, 0, 2], [w0, 1, 2], [w0 + 1, 0, 1],
    ]


def test_rare_term_pairs_ngram(ray_session):
    from table_annotation_ray.stages.retrieval import rare_term_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta",
                "zz alpha beta gamma yy",
                "alpha beta other gamma",
            ],
        }
    )
    # 3-gram "alpha beta gamma" shared by docs 1 and 2 only
    out = (
        rare_term_pairs(
            rd.from_pandas(docs).repartition(2), ngram=3, max_df=5, min_shared=1
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    with pytest.raises(ValueError):
        rare_term_pairs(rd.from_pandas(docs), ngram=0)


def test_activity_streaks_hand_case(ray_session):
    from table_annotation_ray.stages.windows import activity_streaks

    base = pd.Timestamp("2024-01-01")
    d = pd.Timedelta(days=1)
    rows = [
        (1, base), (1, base + d), (1, base + d), (1, base + 3 * d),
        (1, base + 4 * d), (1, base + 5 * d),
        (2, base),
        (3, base + 2 * d), (3, base + 9 * d),
    ]
    df = pd.DataFrame(rows, columns=["u", "ts"])
    out = (
        activity_streaks(rd.from_pandas(df).repartition(3), "u", "ts")
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    # u1: runs [0,1] and [3,4,5] -> 5 active days, max 3, last 3
    assert out.values.tolist() == [
        [1, 5, 2, 3, 3], [2, 1, 1, 1, 1], [3, 2, 2, 1, 1],
    ]


def test_run_stream_cli_resume_and_verify(ray_session, tmp_path):
    """Micro-batch ingest CLI: fold-vs-oneshot identity end-to-end,
    then checkpoint resume (delete the last two markers, rerun)."""
    import json
    import shutil
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "stream_state")
    cmd = [
        sys.executable, os.path.join(repo, "jobs", "run_stream.py"),
        "--events", "/root/testdata/sf0.001/events.parquet",
        "--out", out, "--batches", "4", "--verify",
    ]
    env = dict(os.environ, RAY_ADDRESS="local")
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    j1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert j1["verified"] is True and j1["resumed_at"] == 0

    shutil.rmtree(os.path.join(out, "batch=3"))
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    j2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert j2["resumed_at"] == 3 and j2["ran"] == [3]
    assert j2["verified"] is True and j2["n_keys"] == j1["n_keys"]


def test_target_encode_loo(ray_session):
    from table_annotation_ray.stages.datapipe import target_encode

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5],
            "cat": ["a", "a", "a", "b", "c"],
            "t": [10, 20, 30, 7, 5],
        }
    )
    for bb in (2_000_000, 0):  # broadcast, then forced equi_join path
        out = (
            target_encode(
                rd.from_pandas(df).repartition(2), "id", "cat", "t",
                broadcast_below=bb,
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert out["loo_sum"].tolist() == [50, 40, 30, 0, 0]
        assert out["loo_n"].tolist() == [2, 2, 2, 0, 0]
        assert out["loo_mean"].tolist()[:3] == [25.0, 20.0, 15.0]
        assert np.isnan(out["loo_mean"].tolist()[3])  # singleton -> NULL


def test_kmeans_silhouette_vs_numpy(ray_session):
    from table_annotation_ray.stages.clustering import kmeans_silhouette

    rng = np.random.default_rng(9)
    k, d = 3, 4
    cents = np.array([[0.0] * d, [10.0] * d, [20.0] * d])
    pts = np.vstack(
        [c + rng.normal(0, 0.5, (40, d)) for c in cents]
    )
    df = pd.DataFrame(
        {"doc_id": np.arange(len(pts)), "emb": [list(p) for p in pts]}
    )
    out = (
        kmeans_silhouette(rd.from_pandas(df).repartition(4), cents, emb_col="emb")
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    # numpy reference
    d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(-1) ** 0.5
    own = d2.argmin(1)
    a = d2[np.arange(len(pts)), own]
    d2[np.arange(len(pts)), own] = np.inf
    b = d2.min(1)
    s = (b - a) / np.maximum(a, b)
    for c in range(k):
        row = out[out["cluster"] == c]
        assert int(row["n"].item()) == int((own == c).sum())
        assert row["mean_sil"].item() == pytest.approx(
            s[own == c].mean(), abs=1e-5
        )
    # tight well-separated clusters -> high silhouette
    assert (out["mean_sil"] > 0.8).all()
    with pytest.raises(ValueError):
        kmeans_silhouette(rd.from_pandas(df), cents[:1], emb_col="emb")
