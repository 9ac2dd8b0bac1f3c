

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
