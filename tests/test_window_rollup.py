"""Tests for lag_by_key, rollup_reduce, distinct_count_by_key and
bottomk_by_hash — each checked against an in-memory pandas/numpy
reference on randomized inputs."""

import numpy as np
import pandas as pd

import ray.data as rd

from table_annotation_ray.stages.agg import distinct_count_by_key, rollup_reduce
from table_annotation_ray.stages.datapipe import HASH_MOD, HASH_MULT, bottomk_by_hash
from table_annotation_ray.stages.windows import lag_by_key


def _events(n=500, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 20, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 3600, n), unit="s"),
            "event_type": rng.choice(["click", "view", "error"], n),
        }
    )


def test_lag_by_key_matches_pandas_shift(ray_session):
    df = _events()
    out = (
        lag_by_key(
            rd.from_pandas(df).repartition(6),
            "user_id",
            ["ts", "event_id"],
            ["ts", "event_type"],
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["ts_prev"] = ref.groupby("user_id")["ts"].shift(1)
    ref["event_type_prev"] = ref.groupby("user_id")["event_type"].shift(1)
    ref = ref.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(out["ts_prev"], ref["ts_prev"])
    assert out["event_type_prev"].fillna("").tolist() == ref[
        "event_type_prev"
    ].fillna("").tolist()


def test_lag_by_key_first_row_null_per_key(ray_session):
    df = _events(80)
    out = lag_by_key(
        rd.from_pandas(df), "user_id", ["ts", "event_id"], ["ts"]
    ).to_pandas()
    assert out["ts_prev"].isna().sum() == df["user_id"].nunique()


def test_rollup_reduce_matches_pandas(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], 400),
            "b": rng.choice(["p", "q"], 400),
            "v": rng.integers(0, 100, 400).astype(np.int64),
        }
    )
    out = (
        rollup_reduce(
            rd.from_pandas(df).repartition(5),
            ["a", "b"],
            {"s": ("v", "sum"), "n": (None, "count"), "mx": ("v", "max")},
            batch_size=64,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    fine = df.groupby(["a", "b"], as_index=False).agg(
        s=("v", "sum"), n=("v", "size"), mx=("v", "max")
    )
    mid = df.groupby("a", as_index=False).agg(
        s=("v", "sum"), n=("v", "size"), mx=("v", "max")
    )
    mid["b"] = "(all)"
    total = pd.DataFrame(
        {"a": ["(all)"], "b": ["(all)"], "s": [df["v"].sum()],
         "n": [len(df)], "mx": [df["v"].max()]}
    )
    ref = (
        pd.concat([fine, mid[fine.columns], total[fine.columns]], ignore_index=True)
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(out) == len(ref)
    for c in ("s", "n", "mx"):
        assert out[c].astype("int64").tolist() == ref[c].astype("int64").tolist()


def test_distinct_count_by_key_matches_nunique(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 2000).astype(np.int64),
            "v": rng.integers(0, 30, 2000).astype(np.int64),
        }
    )
    out = (
        distinct_count_by_key(
            rd.from_pandas(df).repartition(7), ["k"], "v", batch_size=128
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ref = df.groupby("k")["v"].nunique().sort_index()
    assert out["k"].tolist() == ref.index.tolist()
    assert out["n_distinct"].astype("int64").tolist() == ref.tolist()


def test_bottomk_by_hash_matches_full_sort(ray_session):
    rng = np.random.default_rng(5)
    ids = rng.permutation(10_000)[:3000].astype(np.int64)
    df = pd.DataFrame({"doc_id": ids, "payload": ids * 2})
    out = (
        bottomk_by_hash(
            rd.from_pandas(df).repartition(9), "doc_id", k=50, batch_size=200
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    h = (ids.astype(np.uint64) * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD)
    order = np.lexsort((ids, h.astype(np.int64)))
    want = np.sort(ids[order[:50]])
    assert out["doc_id"].tolist() == want.tolist()
    # payload columns ride along
    assert (out["payload"].to_numpy() == out["doc_id"].to_numpy() * 2).all()


def test_repeated_ngrams_planted_and_hash_only(ray_session):
    from table_annotation_ray.stages.dedup import repeated_ngrams

    shared = "X" * 10 + "the quick brown fox jumps over the lazy" + "Y" * 10
    assert len(shared) >= 40
    rng = np.random.default_rng(9)
    uniq = [
        "".join(rng.choice(list("abcdefgh "), 120)) for _ in range(6)
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(9, dtype=np.int64),
            "text": [
                uniq[0] + shared,
                shared + uniq[1],
                uniq[2] + shared + uniq[3],
                uniq[4],
                uniq[5],
                "short",
                "",
                uniq[0],          # exact dup of a unique prefix doc
                uniq[0],
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(4)
    out = (
        repeated_ngrams(ds, k=40, min_docs=2)
        .to_pandas()
        .sort_values("gram")
        .reset_index(drop=True)
    )
    # every 40-window of `shared` common to docs 0/1/2 must be found
    core = {shared[i : i + 40] for i in range(len(shared) - 39)}
    got = dict(zip(out["gram"], out["n_docs"]))
    assert all(got.get(g, 0) >= 3 for g in core)
    # exact-dup docs 7/8 (and 0's prefix) share uniq[0] windows
    assert (out["n_docs"] >= 2).all()

    hashed = (
        repeated_ngrams(ds, k=40, min_docs=2, hash_only=True)
        .to_pandas()
        .sort_values("gram_hash")
        .reset_index(drop=True)
    )
    want_hash = (
        pd.util.hash_pandas_object(out["gram"].astype("object"), index=False)
        .to_numpy(dtype="uint64")
        .view("int64")
    )
    ref = (
        pd.DataFrame(
            {"gram_hash": want_hash, "n_docs": out["n_docs"], "min_doc": out["min_doc"]}
        )
        .sort_values("gram_hash")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        hashed.astype({"n_docs": "int64", "min_doc": "int64"}),
        ref.astype({"n_docs": "int64", "min_doc": "int64"}),
    )


def test_funnel_by_key_edges(ray_session):
    from table_annotation_ray.stages.windows import funnel_by_key

    T = pd.Timestamp
    df = pd.DataFrame(
        [
            # user 1: full funnel within windows
            (1, T("2024-01-01 10:00"), "view"),
            (1, T("2024-01-01 10:30"), "click"),
            (1, T("2024-01-01 11:00"), "purchase"),
            # user 2: click too late (window 1h)
            (2, T("2024-01-01 10:00"), "view"),
            (2, T("2024-01-01 11:30"), "click"),
            # user 3: click at EXACTLY view ts -> not strictly after
            (3, T("2024-01-01 10:00"), "view"),
            (3, T("2024-01-01 10:00"), "click"),
            # user 4: greedy takes EARLIEST view; the qualifying click
            # for a later view must not count
            (4, T("2024-01-01 08:00"), "view"),
            (4, T("2024-01-01 10:00"), "view"),
            (4, T("2024-01-01 10:30"), "click"),
            # user 5: no view at all
            (5, T("2024-01-01 10:00"), "click"),
            # user 6: boundary - click exactly at view + window counts
            (6, T("2024-01-01 10:00"), "view"),
            (6, T("2024-01-01 11:00"), "click"),
        ],
        columns=["user_id", "ts", "event_type"],
    )
    out = (
        funnel_by_key(
            rd.from_pandas(df).repartition(3),
            "user_id", "ts", "event_type",
            steps=["view", "click", "purchase"],
            within=pd.Timedelta(hours=1),
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    got = dict(zip(out["user_id"], out["n_steps"]))
    assert got == {1: 3, 2: 1, 3: 1, 4: 1, 6: 2}
    assert out.loc[out["user_id"] == 1, "last_ts"].iloc[0] == T("2024-01-01 11:00")


def test_rollup_reduce_grouping_sets_cube(ray_session):
    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y"], 300),
            "b": rng.choice(["p", "q", "r"], 300),
            "v": rng.integers(0, 50, 300).astype(np.int64),
        }
    )
    # CUBE without the finest set and with a non-prefix set
    out = (
        rollup_reduce(
            rd.from_pandas(df).repartition(4),
            ["a", "b"],
            {"s": ("v", "sum"), "n": (None, "count")},
            grouping_sets=[["b"], []],
            batch_size=64,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    by_b = df.groupby("b")["v"].agg(["sum", "size"])
    # only (all, b) rows and the grand total — finest NOT emitted
    assert (out["a"] == "(all)").all()
    assert len(out) == len(by_b) + 1
    got_b = out[out["b"] != "(all)"].set_index("b")
    assert got_b["s"].astype("int64").to_dict() == by_b["sum"].astype("int64").to_dict()
    total = out[out["b"] == "(all)"].iloc[0]
    assert int(total["s"]) == int(df["v"].sum()) and int(total["n"]) == len(df)


def test_mask_repeated_spans_paths_and_semantics(ray_session):
    from table_annotation_ray.stages.dedup import mask_repeated_spans

    shared = "S" * 10 + "the quick brown fox jumps over the lazy" + "E" * 10
    rng = np.random.default_rng(13)
    uniq = ["".join(rng.choice(list("abcdefgh "), 150)) for _ in range(4)]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                uniq[0] + shared,          # first (kept) copy
                shared + uniq[1],          # masked
                uniq[2] + shared + uniq[3],  # masked
                uniq[0][:60],              # pure substring of doc 0 -> fully masked
                "",
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(3)
    for bb in (5_000_000, 0):  # broadcast and co-location paths
        out = (
            mask_repeated_spans(ds, k=40, min_docs=2, broadcast_below=bb)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == 5
        # first copy untouched
        assert out.loc[0, "text"] == docs.loc[0, "text"]
        assert out.loc[0, "n_spans"] == 0
        # later copies lose exactly the shared passage, keep their unique parts
        for i in (1, 2):
            assert out.loc[i, "n_spans"] == 1
            assert int(out.loc[i, "n_dropped_chars"]) == len(shared)
            assert shared not in out.loc[i, "text"]
        assert out.loc[1, "text"] == uniq[1]
        assert out.loc[2, "text"] == uniq[2] + uniq[3]
        # a pure substring duplicate is excised entirely (contained-doc
        # dedup falls out of the span semantics)
        assert out.loc[3, "text"] == "" and int(out.loc[3, "n_dropped_chars"]) == 60
        assert out.loc[4, "text"] == ""
    # the two paths are identical
    a = mask_repeated_spans(ds, k=40, broadcast_below=5_000_000).to_pandas()
    b = mask_repeated_spans(ds, k=40, broadcast_below=0).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_global_rank_matches_lexsort(ray_session):
    from table_annotation_ray.stages.datapipe import global_rank

    rng = np.random.default_rng(41)
    n = 5000
    df = pd.DataFrame(
        {
            "v": rng.integers(0, 40, n).astype(np.int64),  # heavy ties
            "w": rng.normal(size=n),
            "id": rng.permutation(100_000)[:n].astype(np.int64),
        }
    )
    out = (
        global_rank(
            rd.from_pandas(df).repartition(7), ["v", "w"], "id",
            num_buckets=16, sample_size=200,
        )
        .to_pandas()
        .sort_values("position")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["v", "w", "id"], kind="mergesort").reset_index(drop=True)
    assert out["id"].tolist() == ref["id"].tolist()
    assert out["position"].tolist() == list(range(n))
    # payload survives
    assert (out.sort_values("id")["v"].to_numpy()
            == df.sort_values("id")["v"].to_numpy()).all()
    # degenerate boundaries (tiny sample) stay correct
    out2 = global_rank(
        rd.from_pandas(df).repartition(3), ["v", "w"], "id",
        num_buckets=64, sample_size=3,
    ).to_pandas().sort_values("position")
    assert out2["id"].tolist() == ref["id"].tolist()


def test_weighted_sample_k_distribution_and_determinism(ray_session):
    from table_annotation_ray.stages.datapipe import weighted_sample_k

    n = 20_000
    ids = np.arange(n, dtype=np.int64)
    # two strata: weight 9 vs 1 -> heavy items should dominate the sample
    w = np.where(ids % 10 == 0, 9.0, 1.0)
    df = pd.DataFrame({"doc_id": ids, "w": w})
    out = (
        weighted_sample_k(
            rd.from_pandas(df).repartition(8), "doc_id", "w", k=1000
        )
        .to_pandas()
    )
    assert len(out) == 1000
    heavy_frac = (out["doc_id"] % 10 == 0).mean()
    # heavy stratum: 10% of rows, 50% of total weight -> ~0.5 of sample
    assert 0.38 < heavy_frac < 0.62, heavy_frac
    # deterministic across block layouts
    out2 = weighted_sample_k(
        rd.from_pandas(df).repartition(3), "doc_id", "w", k=1000
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # zero/negative weights never sampled
    df.loc[df["doc_id"] < 100, "w"] = 0.0
    out3 = weighted_sample_k(rd.from_pandas(df), "doc_id", "w", k=500).to_pandas()
    assert (out3["doc_id"] >= 100).all()
    # internal sort keys never leak: the operator returns the input schema
    assert sorted(out.columns) == ["doc_id", "w"]


def test_samplers_return_input_schema(ray_session):
    from table_annotation_ray.stages.datapipe import bottomk_by_hash

    df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64), "x": 1.0})
    out = bottomk_by_hash(rd.from_pandas(df), "doc_id", k=20).to_pandas()
    assert sorted(out.columns) == ["doc_id", "x"]


def test_funnel_rejects_duplicate_steps(ray_session):
    import pytest

    from table_annotation_ray.stages.windows import funnel_by_key

    df = pd.DataFrame(
        {"u": [1], "ts": [pd.Timestamp("2024-01-01")], "t": ["view"]}
    )
    with pytest.raises(ValueError, match="distinct event types"):
        funnel_by_key(
            rd.from_pandas(df), "u", "ts", "t",
            steps=["view", "click", "view"], within=pd.Timedelta("1h"),
        )


def test_grouped_heavy_hitters_raises_below_guarantee(ray_session):
    import pytest

    from table_annotation_ray.stages.sketches import grouped_heavy_hitters

    # n=4000 in one group, k=4 -> N_g/k = 1000 > min_count=10: the
    # exactness precondition fails and must raise (not silently truncate).
    df = pd.DataFrame({"g": ["a"] * 4000, "v": np.arange(4000) % 7})
    with pytest.raises((ValueError, Exception), match="min_count"):
        grouped_heavy_hitters(
            rd.from_pandas(df), ["g"], "v", min_count=10, k=4
        ).to_pandas()


def test_approx_distinct_by_key_rel_error(ray_session):
    from table_annotation_ray.stages.sketches import approx_distinct_by_key

    rng = np.random.default_rng(47)
    n = 60_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": rng.integers(0, 5000, n).astype(np.int64),
        }
    )
    out = (
        approx_distinct_by_key(
            rd.from_pandas(df).repartition(6), ["g"], "v", batch_size=8192
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    ref = df.groupby("g")["v"].nunique()
    assert out["g"].tolist() == list(ref.index)
    rel = (out["approx_distinct"].to_numpy() - ref.to_numpy()) / ref.to_numpy()
    assert (np.abs(rel) < 0.05).all(), rel


def test_grouped_heavy_hitters_exact(ray_session):
    from table_annotation_ray.stages.sketches import grouped_heavy_hitters

    rng = np.random.default_rng(53)
    n = 30_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], n),
            "v": rng.zipf(1.5, n).astype(np.int64) % 500,
        }
    )
    out = (
        grouped_heavy_hitters(
            rd.from_pandas(df).repartition(6), ["g"], "v",
            min_count=100, k=512, batch_size=4096,
        )
        .to_pandas()
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    ref = (
        df.groupby(["g", "v"], as_index=False).size().rename(columns={"size": "n"})
    )
    ref = ref[ref["n"] >= 100].sort_values(["g", "v"]).reset_index(drop=True)
    assert out["g"].tolist() == ref["g"].tolist()
    assert out["v"].astype("int64").tolist() == ref["v"].tolist()
    assert out["n"].astype("int64").tolist() == ref["n"].tolist()


def test_profile_columns_nulls_and_merge(ray_session):
    from table_annotation_ray.stages.datapipe import profile_columns

    df = pd.DataFrame(
        {
            "x": [1.0, None, 3.5, -2.0, None, 10.0],
            "s": ["ab", None, "", "abcd", "x", None],
        }
    )
    out = profile_columns(
        rd.from_pandas(df).repartition(3), ["x"], ["s"], batch_size=2
    ).set_index("column")
    assert int(out.loc["x", "n_rows"]) == 6 and int(out.loc["x", "n_nulls"]) == 2
    assert out.loc["x", "min"] == -2.0 and out.loc["x", "max"] == 10.0
    assert abs(out.loc["x", "sum"] - 12.5) < 1e-12
    assert int(out.loc["s", "n_nulls"]) == 2
    assert out.loc["s", "min"] == 0.0 and out.loc["s", "max"] == 4.0
    # string sum is NULL per contract, not 0.0 (min_count=1; review r4)
    assert pd.isna(out.loc["s", "sum"])


def test_cross_corpus_near_dups(ray_session):
    from table_annotation_ray.stages.dedup import cross_corpus_near_dups

    rng = np.random.default_rng(61)
    words = ["alpha","beta","gamma","delta","epsilon","zeta","eta","theta",
             "iota","kappa","lam","mu","nu","xi","omicron","pi"]
    def doc(seed, n=30):
        r = np.random.default_rng(seed)
        return " ".join(r.choice(words, n))
    base = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "text": [doc(s) for s in range(100)],
    })
    # new batch: 10 near-copies of base docs (one word changed) + 20 fresh
    new_rows = []
    for i in range(10):
        toks = base.loc[i, "text"].split()
        toks[5] = "CHANGED"
        new_rows.append({"doc_id": 1000 + i, "text": " ".join(toks)})
    for i in range(20):
        new_rows.append({"doc_id": 1100 + i, "text": doc(10_000 + i)})
    new = pd.DataFrame(new_rows)
    # duplicate pair INSIDE base must NOT be reported
    base.loc[99, "text"] = base.loc[98, "text"]

    out = cross_corpus_near_dups(
        rd.from_pandas(new).repartition(3),
        rd.from_pandas(base).repartition(4),
        threshold=0.5,
    ).to_pandas()
    # every pair crosses sides: a is a new id, b a base id (or vice versa)
    sides = {True: "new", False: "base"}
    for a, b in zip(out["a"], out["b"]):
        assert sides[a >= 1000] != sides[b >= 1000], (a, b)
    # the planted copies are found
    found = {(min(a, b), max(a, b)) for a, b in zip(out["a"], out["b"])}
    planted = {(i, 1000 + i) for i in range(10)}
    assert len(planted & found) >= 8  # LSH recall, 16 bands / 4 rows
    # base-internal dup (98, 99) absent
    assert (98, 99) not in found


def test_chunk_documents_boundaries(ray_session):
    from table_annotation_ray.stages.datapipe import chunk_documents

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": ["", words(1), words(64), words(65), words(120), words(121)],
        }
    )
    out = (
        chunk_documents(rd.from_pandas(docs).repartition(3),
                        chunk_tokens=64, overlap=8)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    got = out.groupby("doc_id").size().to_dict()
    # n=0 -> 0 chunks; 1..64 -> 1; 65..120 -> 2 (start 56 covers to 119);
    # 121 -> 1 + ceil(57/56) = 3
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3}
    d5 = out[out.doc_id == 5]
    assert d5["start_tok"].tolist() == [0, 56, 112]
    assert d5["n_tokens"].tolist() == [64, 64, 9]
    # every token of every doc is covered by at least one chunk
    for _, r in out.iterrows():
        assert r["n_tokens"] >= 1


def test_cooccurrence_pairs_cross_block_baskets(ray_session):
    from table_annotation_ray.stages.relational import cooccurrence_pairs

    # basket 1 spans blocks; duplicate (basket,item) rows count once
    df = pd.DataFrame(
        {
            "basket": [1, 1, 1, 1, 2, 2, 3, 3, 3],
            "item":   [10, 20, 20, 30, 10, 20, 10, 20, 40],
        }
    ).astype(np.int64)
    out = (
        cooccurrence_pairs(
            rd.from_pandas(df).repartition(5), "basket", "item", batch_size=2
        )
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    got = {(a, b): n for a, b, n in zip(out["item_a"], out["item_b"], out["n_baskets"])}
    assert got == {(10, 20): 3, (10, 30): 1, (20, 30): 1, (10, 40): 1, (20, 40): 1}


def test_grouped_uniform_sample(ray_session):
    from table_annotation_ray.stages.datapipe import (
        HASH_MOD,
        HASH_MULT,
        grouped_uniform_sample,
    )

    rng = np.random.default_rng(61)
    n = 5000
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(50_000)[:n].astype(np.int64),
            "g": rng.choice(["a", "b", "c"], n, p=[0.6, 0.3, 0.1]),
        }
    )
    out = grouped_uniform_sample(
        rd.from_pandas(df).repartition(7), ["g"], "doc_id", k=40
    ).to_pandas()
    # exact per-group counts, input schema, no helper columns
    assert sorted(out.columns) == ["doc_id", "g"]
    assert out.groupby("g").size().eq(40).all()
    # matches the full-sort reference per group
    h = (df["doc_id"].to_numpy().astype(np.uint64) * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD)
    ref = df.assign(h=h.astype(np.int64))
    for g, sub in ref.groupby("g"):
        want = sub.sort_values(["h", "doc_id"]).head(40)["doc_id"].tolist()
        got = sorted(out[out["g"] == g]["doc_id"])
        assert got == sorted(want), g
    # deterministic across block layouts
    out2 = grouped_uniform_sample(
        rd.from_pandas(df).repartition(3), ["g"], "doc_id", k=40
    ).to_pandas()
    assert sorted(map(tuple, out[["g", "doc_id"]].itertuples(index=False))) == \
        sorted(map(tuple, out2[["g", "doc_id"]].itertuples(index=False)))
    # k larger than a group: min(k, group size) rows survive
    tiny = df[df["g"] == "c"].head(5)
    out3 = grouped_uniform_sample(rd.from_pandas(tiny), ["g"], "doc_id", k=40).to_pandas()
    assert len(out3) == 5


def test_temperature_sample(ray_session):
    from table_annotation_ray.stages.datapipe import (
        HASH_MOD,
        HASH_MULT,
        temperature_quotas,
        temperature_sample,
    )

    rng = np.random.default_rng(62)
    n = 4000
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(50_000)[:n].astype(np.int64),
            "lang": rng.choice(
                ["en", "zh", "es", "de"], n, p=[0.7, 0.15, 0.1, 0.05]
            ),
        }
    )
    counts = df["lang"].value_counts()

    # quota math (alpha=0.5 integer path): ∝ floor(sqrt(n)), capped at n
    kmap = temperature_quotas(counts, total_k=400)
    w = {g: int(np.floor(np.sqrt(float(c)))) for g, c in counts.items()}
    wsum = sum(w.values())
    assert kmap == {g: min(int(counts[g]), (400 * w[g]) // wsum) for g in w}
    # flattening: head lang's share shrinks vs its natural share
    assert kmap["en"] / sum(kmap.values()) < counts["en"] / n
    # alpha→1 approaches natural proportions; alpha float path works
    k1 = temperature_quotas(counts, total_k=400, alpha=1.0)
    assert abs(k1["en"] / sum(k1.values()) - counts["en"] / n) < 0.01

    out = temperature_sample(
        rd.from_pandas(df).repartition(7), total_k=400
    ).to_pandas()
    assert sorted(out.columns) == ["doc_id", "lang"]
    assert out.groupby("lang").size().to_dict() == kmap
    # per-group selection = global bottom-k_g by multiplicative hash
    h = (df["doc_id"].to_numpy().astype(np.uint64) * np.uint64(HASH_MULT)) % np.uint64(
        HASH_MOD
    )
    ref = df.assign(h=h.astype(np.int64))
    for g, sub in ref.groupby("lang"):
        want = sub.sort_values(["h", "doc_id"]).head(kmap[g])["doc_id"].tolist()
        assert sorted(out[out["lang"] == g]["doc_id"]) == sorted(want), g
    # deterministic across block layouts
    out2 = temperature_sample(
        rd.from_pandas(df).repartition(3), total_k=400
    ).to_pandas()
    assert sorted(map(tuple, out[["lang", "doc_id"]].itertuples(index=False))) == sorted(
        map(tuple, out2[["lang", "doc_id"]].itertuples(index=False))
    )
    # quota can be 0 for rare groups at tiny total_k (rows filtered
    # map-side; empty partial batches must not break block unification)
    k_tiny = temperature_quotas(counts, total_k=4)
    out3 = temperature_sample(rd.from_pandas(df).repartition(5), total_k=4).to_pandas()
    assert out3.groupby("lang").size().to_dict() == {
        g: k for g, k in k_tiny.items() if k > 0
    }
    # quota capped at group size when a group is smaller than its share
    tiny = pd.concat([df[df["lang"] == "en"].head(50), df[df["lang"] == "de"].head(2)])
    out4 = temperature_sample(rd.from_pandas(tiny), total_k=40).to_pandas()
    assert out4[out4["lang"] == "de"].shape[0] == 2


def test_countmin_bounds_and_merge_exactness(ray_session):
    from table_annotation_ray.stages.sketches import (
        CountMin,
        _hash64,
        cms_point_counts,
    )

    rng = np.random.default_rng(71)
    n = 40_000
    keys = pd.Series(rng.zipf(1.4, n) % 3000)
    vc = keys.value_counts()
    qs = list(vc.index[:30]) + [999_999]  # 30 present + 1 absent
    out = cms_point_counts(
        rd.from_pandas(keys.to_frame("k")).repartition(6), "k", qs,
        width=8192, batch_size=4096,
    ).set_index("k")["approx_count"]
    true = {k: int(vc.get(k, 0)) for k in qs}
    # never underestimates
    assert all(out[k] >= true[k] for k in qs)
    # eN overestimate bound (e/width * n), generous against whp
    bound = 2.7183 / 8192 * n * 4
    assert all(out[k] - true[k] <= bound for k in qs), out
    # distributed tree-reduce == flat single-sketch build (merge exact)
    flat = CountMin(width=8192)
    flat.add_hashes(_hash64(vc.index.to_series()), vc.to_numpy(dtype=np.int64))
    flat_est = flat.query_hashes(_hash64(pd.Series(qs)))
    assert out.to_numpy().tolist() == flat_est.astype("int64").tolist()


def test_cross_corpus_exact_dups_pairs_only_cross(ray_session):
    from table_annotation_ray.stages.dedup import cross_corpus_exact_dups

    base = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            # doc 0 and 1 are MUTUAL base-side dups: pairs must use the
            # min-id rep and never emit base x base
            "text": ["same  text", "Same text", "unique base", "other"],
        }
    )
    new = pd.DataFrame(
        {
            "doc_id": [10, 11, 12],
            "text": ["SAME TEXT  ", "brand new", "other"],
        }
    )
    out = (
        cross_corpus_exact_dups(
            rd.from_pandas(new).repartition(2), rd.from_pandas(base).repartition(2)
        )
        .to_pandas()
        .sort_values("new_id")
        .reset_index(drop=True)
    )
    assert out["new_id"].tolist() == [10, 12]
    assert out["base_id"].tolist() == [0, 3]  # min-id rep for the dup pair


# --- eighth code-review batch regressions ------------------------------------


def test_session_counts_matches_pandas(ray_session):
    """session_counts (bucketed sessionization) == the per-user pandas
    reference, including single-event users and exact-gap boundaries."""
    from table_annotation_ray.stages.windows import session_counts

    df = _events(600, seed=23)
    # plant a single-event user and an exact-30-min gap (NOT > gap)
    extra = pd.DataFrame(
        {
            "event_id": [9001, 9002, 9003],
            "user_id": np.array([777, 778, 778], dtype=np.int64),
            "ts": [
                pd.Timestamp("2024-02-01"),
                pd.Timestamp("2024-02-01"),
                pd.Timestamp("2024-02-01") + pd.Timedelta(minutes=30),
            ],
            "event_type": ["click", "view", "view"],
        }
    )
    df = pd.concat([df, extra], ignore_index=True)
    gap = pd.Timedelta(minutes=10)
    out = (
        session_counts(
            rd.from_pandas(df).repartition(5), "user_id", "ts", gap, num_buckets=8
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    def ref_one(g):
        gaps = g.sort_values("ts")["ts"].diff() > gap
        return pd.Series(
            {"n_sessions": int(gaps.sum()) + 1, "n_events": len(g)}
        )

    ref = (
        df.groupby("user_id").apply(ref_one, include_groups=False).reset_index()
        .sort_values("user_id").reset_index(drop=True)
    )
    assert out["user_id"].tolist() == ref["user_id"].tolist()
    assert out["n_sessions"].tolist() == ref["n_sessions"].tolist()
    assert out["n_events"].tolist() == ref["n_events"].tolist()
    # exact-gap boundary: 30 min gap with gap=30min is NOT a new session
    out30 = session_counts(
        rd.from_pandas(extra), "user_id", "ts", pd.Timedelta(minutes=30)
    ).to_pandas()
    assert out30.set_index("user_id").loc[778, "n_sessions"] == 1


def test_funnel_empty_bucket_keeps_string_schema(ray_session):
    """A bucket where NO key completes step 0 emits 0 rows; the key
    column must stay explicitly string-typed or downstream schema
    unification dies against the non-empty buckets (review r4)."""
    from table_annotation_ray.stages.windows import funnel_by_key

    t0 = pd.Timestamp("2024-01-01")
    rows = [("winner", t0, "view"), ("winner", t0 + pd.Timedelta(minutes=1), "click")]
    # 30 keys that only ever emit the SECOND step: every bucket they
    # land in (without 'winner') used to emit a null-typed key column
    for i in range(30):
        rows.append((f"late_{i}", t0, "click"))
    df = pd.DataFrame(rows, columns=["user", "ts", "etype"])
    out = funnel_by_key(
        rd.from_pandas(df).repartition(4),
        "user", "ts", "etype",
        steps=["view", "click"],
        within=pd.Timedelta(hours=1),
        num_buckets=16,
    ).to_pandas()
    assert out["user"].tolist() == ["winner"]
    assert out["n_steps"].tolist() == [2]


def test_domain_stats_matches_reference(ray_session):
    """domain_stats == an in-memory regex reference, including multi-URL
    rows, repeated domains within one doc, and URL-free corpora."""
    import re

    from table_annotation_ray.stages.textstats import domain_stats

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "see https://A.example/x and https://a.example/y",  # case-folds, 2 urls 1 doc
                "plain text no urls",
                "http://b.example/path https://a.example/z",
                None,
                "trailing https://c.example",
                "dup https://b.example/1 https://b.example/2",
            ],
        }
    )
    out = (
        domain_stats(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values("domain")
        .reset_index(drop=True)
    )
    ref = {}
    for did, text in zip(df["doc_id"], df["text"].fillna("")):
        for u in re.findall(r"https?://[^\s]+", text):
            d = re.match(r"https?://([^/\s]+)", u).group(1).lower()
            n_urls, docs = ref.get(d, (0, set()))
            docs.add(did)
            ref[d] = (n_urls + 1, docs)
    assert out["domain"].tolist() == sorted(ref)
    for _, row in out.iterrows():
        n_urls, docs = ref[row["domain"]]
        assert row["n_urls"] == n_urls and row["n_docs"] == len(docs)
    # URL-free corpus: empty result, schema intact
    empty = domain_stats(
        rd.from_pandas(pd.DataFrame({"doc_id": np.array([1], dtype=np.int64),
                                     "text": ["no links here"]}))
    ).to_pandas()
    assert len(empty) == 0
    # an all-empty result has zero blocks and hence no schema — same
    # caller-guards convention as the other set-returning queries
    # (__ray_entry__._q_parts_never_ordered)


def test_fixed_width_histogram_vs_numpy(ray_session):
    """fixed_width_histogram == the floor-expression reference; NaN
    excluded; degenerate (min == max) column lands in bin 0."""
    from table_annotation_ray.stages.quantiles import fixed_width_histogram

    rng = np.random.default_rng(3)
    v = np.r_[rng.uniform(10, 99, 500).round(2), np.nan, np.nan]
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(4)
    out = fixed_width_histogram(ds, "x", bins=8).sort_values("bin")
    fin = v[np.isfinite(v)]
    mn, mx = fin.min(), fin.max()
    w = (mx - mn) / 8
    idx = np.minimum(np.floor((fin - mn) / w), 7).astype(int)
    ref = np.bincount(idx, minlength=8)
    assert out["n"].sum() == len(fin)
    assert dict(zip(out["bin"], out["n"])) == {
        int(b): int(n) for b, n in enumerate(ref) if n
    }
    assert np.allclose(out["lo"].to_numpy(), mn + out["bin"].to_numpy() * w)
    # degenerate column
    const = fixed_width_histogram(
        rd.from_pandas(pd.DataFrame({"x": [5.0, 5.0, 5.0]})), "x", bins=4
    )
    assert const["bin"].tolist() == [0] and const["n"].tolist() == [3]


def test_ewma_by_key_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.windows import ewma_by_key

    rng = np.random.default_rng(23)
    n = 800
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 7, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 3600, n), unit="s"),  # ts ties
            "v": np.round(rng.normal(10, 3, n), 3),
        }
    )
    got = (
        ewma_by_key(rd.from_pandas(df).repartition(5), "k", "ts", "v",
                    alpha=0.3, tiebreak="id")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    ref = df.sort_values(["k", "ts", "id"], kind="mergesort")
    ref["ewma"] = (
        ref.groupby("k", sort=False)["v"].ewm(alpha=0.3, adjust=True)
        .mean().reset_index(level=0, drop=True)
    )
    ref = ref.sort_values("id").reset_index(drop=True)
    np.testing.assert_allclose(got["ewma"].to_numpy(), ref["ewma"].to_numpy(),
                               rtol=1e-12)
    assert list(got.columns[:4]) == list(df.columns)  # inputs survive

    import pytest as _pt
    with _pt.raises(ValueError):
        ewma_by_key(rd.from_pandas(df), "k", "ts", "v", alpha=0.0)


def test_transition_counts_matches_pandas(ray_session):
    from table_annotation_ray.stages.windows import transition_counts

    df = _events(800, seed=11)
    out = (
        transition_counts(
            rd.from_pandas(df).repartition(6), "user_id", ["ts", "event_id"], "event_type"
        )
        .to_pandas()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["nt"] = ref.groupby("user_id")["event_type"].shift(-1)
    ref = (
        ref[ref["nt"].notna()]
        .groupby(["event_type", "nt"], sort=True)
        .size()
        .reset_index(name="n")
        .rename(columns={"event_type": "from_type", "nt": "to_type"})
    )
    assert list(out.columns) == ["from_type", "to_type", "n"]
    pd.testing.assert_frame_equal(
        out.astype({"n": "int64"}), ref.astype({"n": "int64"})
    )
    # totals: every row with a successor is counted exactly once
    n_keys = df["user_id"].nunique()
    assert out["n"].sum() == len(df) - n_keys


def test_mode_by_key_matches_pandas(ray_session):
    from table_annotation_ray.stages.agg import mode_by_key

    df = _events(1000, seed=23)
    out = (
        mode_by_key(rd.from_pandas(df).repartition(6), "user_id", "event_type")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    cnt = df.groupby(["user_id", "event_type"]).size().reset_index(name="n")
    ref = (
        cnt.sort_values(["n", "event_type"], ascending=[False, True], kind="mergesort")
        .groupby("user_id")
        .head(1)
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"n": "int64"}), ref.astype({"n": "int64"})
    )
    # deterministic tie-break: equal counts -> smallest value
    tie = pd.DataFrame({"k": [1, 1, 1, 1], "v": ["b", "a", "a", "b"]})
    got = mode_by_key(rd.from_pandas(tie), "k", "v").to_pandas()
    assert list(got.v) == ["a"] and list(got.n) == [2]


def test_ohlc_by_key_matches_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.windows import ohlc_by_key

    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, n),
            # coarse ts so equal-ts ties are common: tiebreak must decide
            "ts": rng.integers(0, 50, n),
            "tb": np.arange(n),
            "v": rng.normal(size=n).round(3),
        }
    )
    out = (
        ohlc_by_key(
            rd.from_pandas(df).repartition(13), ["k"], "ts", "v",
            tiebreak="tb", batch_size=64,  # many partials per key
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    for k, g in df.groupby("k"):
        s = g.sort_values(["ts", "tb"], kind="mergesort")
        assert out.loc[k, "open"] == s["v"].iloc[0], k
        assert out.loc[k, "close"] == s["v"].iloc[-1], k
        assert out.loc[k, "high"] == g["v"].max(), k
        assert out.loc[k, "low"] == g["v"].min(), k
        assert out.loc[k, "n_events"] == len(g), k


def test_conversion_lag_censoring_and_order(ray_session):
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.windows import conversion_lag

    T = pd.Timestamp
    ev = pd.DataFrame(
        [
            # u1: purchase BEFORE signup must not count; next one does
            (1, T("2024-01-01"), "purchase"),
            (1, T("2024-01-02"), "signup"),
            (1, T("2024-01-05"), "purchase"),
            # u2: censored (no purchase after signup)
            (2, T("2024-01-03"), "signup"),
            (2, T("2024-01-01"), "purchase"),
            # u3: two signups — FIRST one anchors; same-ts purchase counts
            (3, T("2024-01-04"), "signup"),
            (3, T("2024-01-06"), "signup"),
            (3, T("2024-01-04"), "purchase"),
            # u4: no signup at all -> no row
            (4, T("2024-01-01"), "purchase"),
        ],
        columns=["user_id", "ts", "event_type"],
    )
    out = (
        conversion_lag(
            rd.from_pandas(ev).repartition(3),
            "user_id", "ts", "event_type", "signup", "purchase",
        )
        .to_pandas().set_index("user_id").sort_index()
    )
    assert list(out.index) == [1, 2, 3]
    assert out.loc[1, "to_ts"] == T("2024-01-05")
    assert pd.isna(out.loc[2, "to_ts"])
    assert out.loc[3, "from_ts"] == T("2024-01-04")
    assert out.loc[3, "to_ts"] == T("2024-01-04")


def test_scd2_intervals_runs_merge_and_censor(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.windows import scd2_intervals

    T = pd.Timestamp
    ev = pd.DataFrame(
        [
            # u1: A A B A -> three runs; middle run 1 row
            (1, "A", T("2024-01-01"), 10),
            (1, "A", T("2024-01-02"), 11),
            (1, "B", T("2024-01-03"), 12),
            (1, "A", T("2024-01-04"), 13),
            # u2: single run, ts tie broken by id (same attr anyway)
            (2, "X", T("2024-01-01"), 21),
            (2, "X", T("2024-01-01"), 20),
            # u3: ts tie STRADDLING a run boundary — id order decides
            (3, "P", T("2024-01-05"), 31),
            (3, "Q", T("2024-01-05"), 32),
        ],
        columns=["user_id", "attr", "ts", "event_id"],
    )
    out = (
        scd2_intervals(
            rd.from_pandas(ev.sample(frac=1, random_state=7)).repartition(3),
            "user_id", "attr", "ts", "event_id",
        )
        .to_pandas()
        .sort_values(["user_id", "valid_from", "attr"])
        .reset_index(drop=True)
    )
    u1 = out[out["user_id"] == 1].reset_index(drop=True)
    assert list(u1["attr"]) == ["A", "B", "A"]
    assert list(u1["n_rows"]) == [2, 1, 1]
    assert u1.loc[0, "valid_to"] == T("2024-01-03")
    assert u1.loc[1, "valid_to"] == T("2024-01-04")
    assert pd.isna(u1.loc[2, "valid_to"])  # current run is right-open
    u2 = out[out["user_id"] == 2].reset_index(drop=True)
    assert len(u2) == 1 and u2.loc[0, "n_rows"] == 2
    u3 = out[out["user_id"] == 3].sort_values("attr").reset_index(drop=True)
    assert list(u3["attr"]) == ["P", "Q"]
    # run boundary at identical ts: valid_to of P == valid_from of Q
    assert u3.loc[0, "valid_to"] == u3.loc[1, "valid_from"]
    assert int(out["n_rows"].sum()) == len(ev)
    assert out["n_rows"].dtype == np.int64


def test_rolling_active_matches_pandas_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.windows import rolling_active

    rng = np.random.default_rng(11)
    n = 400
    ev = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 48 * 3600, n), unit="s"),
            "user_id": rng.integers(0, 25, n),
        }
    )
    out = (
        rolling_active(rd.from_pandas(ev).repartition(4), "ts", "user_id",
                       window_hours=3)
        .to_pandas()
        .sort_values("win_end")
        .reset_index(drop=True)
    )
    # reference: explode each event hour into the 3 windows it feeds
    h = ev["ts"].dt.floor("h")
    ref = pd.concat(
        [
            pd.DataFrame({"win_end": h + pd.Timedelta(hours=k),
                          "user_id": ev["user_id"]})
            for k in range(3)
        ]
    ).drop_duplicates()
    ref = (
        ref.groupby("win_end").size().rename("n_active").reset_index()
        .sort_values("win_end").reset_index(drop=True)
    )
    assert len(out) == len(ref)
    assert (out["win_end"].to_numpy() == ref["win_end"].to_numpy()).all()
    assert (out["n_active"].to_numpy() == ref["n_active"].to_numpy()).all()
