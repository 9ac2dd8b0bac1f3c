

def test_embedding_near_dup_max_bucket_cap_warns(ray_session):
    """A hot LSH bucket over max_bucket truncates with a RECALL warning
    (never silently) and still emits pairs from the kept prefix."""
    import warnings

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.similarity import embedding_near_dup_pairs

    # 40 near-identical vectors -> one hot bucket in every probe
    rng = np.random.default_rng(4)
    base = rng.normal(size=16)
    vecs = [list(base + rng.normal(scale=1e-3, size=16)) for _ in range(40)]
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64), "embedding": vecs})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = embedding_near_dup_pairs(
            rd.from_pandas(df), threshold=0.99, max_bucket=10
        ).to_pandas()
    assert any("RECALL" in str(x.message) for x in w)
    # kept prefix = ids 0..9 -> pairs only among them
    assert len(out) > 0 and out["b"].max() <= 9


def test_ivfpq_recall_reasonable(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.similarity import ivfpq_recall, ivfpq_topk

    rng = np.random.default_rng(8)
    # clustered corpus (IVF lists align with real structure) + 5 planted
    # TRUE near-neighbors per query: within a tight cluster ALL pairwise
    # cosines are nearly equal and no coded index can rank them — the
    # fair recall test gives each query identifiable nearest neighbors
    centers = rng.normal(0, 1, (6, 32))
    vecs = np.concatenate(
        [c + 0.5 * rng.normal(0, 1, (80, 32)) for c in centers]
    )
    qids = [0, 100, 200, 300]
    planted = np.concatenate(
        [vecs[q] + 0.03 * rng.normal(0, 1, (5, 32)) for q in qids]
    )
    vecs = np.concatenate([vecs, planted])
    df = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
    )
    ds = rd.from_pandas(df).repartition(4)

    # refine path (default): exact rerank over the ADC shortlist
    rec = ivfpq_recall(ds, qids, k=5, num_centroids=8, nprobe=4, m=8, ks=32)
    assert len(rec) == len(qids)
    assert rec["recall"].mean() >= 0.9

    # self never returned; ranks contiguous from 1; k rows per query
    top = ivfpq_topk(ds, qids, k=5, num_centroids=8, nprobe=4, m=8, ks=32)
    for qid, g in top.groupby("query_id"):
        assert qid not in set(g["neighbor_id"])
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) == 5

    # pure-ADC path still runs and beats random (no within-code order)
    top0 = ivfpq_topk(
        ds, qids, k=5, num_centroids=8, nprobe=4, m=8, ks=32, rerank=0
    )
    assert len(top0) == len(qids) * 5 and "score" in top0.columns


def test_mmr_diversifies(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.similarity import brute_force_topk, mmr_topk

    rng = np.random.default_rng(14)
    # query at the origin direction; two tight candidate clusters A
    # (very relevant, mutually near-identical) and B (slightly less
    # relevant, different direction). Plain top-3 = all A; MMR with
    # lam=0.5 must mix in B.
    q = np.array([1.0, 0.0, 0.0, 0.0])
    a_dir = np.array([0.98, 0.2, 0.0, 0.0])
    b_dir = np.array([0.9, -0.43, 0.0, 0.0])
    A = [a_dir + 0.001 * rng.normal(size=4) for _ in range(5)]     # ids 1..5
    B = [b_dir + 0.001 * rng.normal(size=4) for _ in range(5)]     # ids 6..10
    noise = [rng.normal(size=4) for _ in range(20)]                # ids 11..30
    vecs = [q] + A + B + noise
    df = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
    )
    ds = rd.from_pandas(df).repartition(3)

    top = brute_force_topk(ds, [0], k=3)
    assert set(top["neighbor_id"]) <= set(range(1, 6))  # pure relevance: all A

    out = mmr_topk(ds, [0], k=3, pool=10, lam=0.5)
    got = list(out.sort_values("rank")["neighbor_id"])
    assert got[0] in range(1, 6)                 # first pick = most relevant
    assert any(i in range(6, 11) for i in got)   # diversity: B represented
    assert len(out) == 3 and list(out["rank"]) == [1, 2, 3]

    # deterministic across runs
    out2 = mmr_topk(ds, [0], k=3, pool=10, lam=0.5)
    assert got == list(out2.sort_values("rank")["neighbor_id"])
