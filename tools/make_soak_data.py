#!/usr/bin/env python
"""Deterministic 10×-sf0.1 soak corpus (VERDICT r4 #1): 50k documents +
20k embeddings shaped like the driver's testdata tables, written to
/tmp/ta_soak.  Purpose: measure whether the multi-exchange pipelines
(incremental_dedup, pmi_collocations, semantic_dedup, repeated_ngrams)
amortize their fixed ~2.5 s/exchange overhead as input grows — the
walls are recorded in BASELINE.md §soak.

Same generator family as the testdata documents (word-salad text over a
small vocabulary, en/fr/de/es/zh lang tags, ~2% planted near-dup pairs
so minhash has real work); embeddings are 64-dim seeded normals with
planted duplicates.  Usage::

    python tools/make_soak_data.py [--out /tmp/ta_soak] [--scale 10]
"""

import argparse
import os

import numpy as np
import pandas as pd

VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "vector query agg table key group stream filter customer the a join scale "
    "shuffle block read write merge index cache disk node task actor plan"
).split()
LANGS = ["en", "en", "en", "en", "zh", "es", "fr", "de"]  # en-heavy like testdata


def make(out_dir: str, scale: int = 10, seed: int = 73) -> dict:
    n_docs = 5_000 * scale
    n_embs = 2_000 * scale
    rng = np.random.default_rng(seed)
    lens = rng.integers(8, 26, size=n_docs)
    texts = [
        " ".join(rng.choice(VOCAB, size=int(k))) for k in lens
    ]
    # ~2% planted near-dups: overwrite doc i with doc i-1 plus one word
    for i in range(50, n_docs, 50):
        texts[i] = texts[i - 1] + " " + VOCAB[i % len(VOCAB)]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": [LANGS[i % len(LANGS)] for i in range(n_docs)],
            "source": [f"src{i % 7}" for i in range(n_docs)],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")

    emb = rng.standard_normal((n_embs, 64))
    for i in range(40, n_embs, 40):  # planted near-identical vectors
        emb[i] = emb[i - 1] + 0.01 * rng.standard_normal(64)
    embs = pd.DataFrame(
        {
            "vec_id": np.arange(n_embs, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in emb],
            "label": (np.arange(n_embs) % 16).astype(np.int32),
        }
    )

    os.makedirs(out_dir, exist_ok=True)
    # small row groups so a single file still parallelizes (CLAUDE.md)
    docs.to_parquet(
        os.path.join(out_dir, "documents.parquet"), index=False,
        row_group_size=16384,
    )
    embs.to_parquet(
        os.path.join(out_dir, "embeddings.parquet"), index=False,
        row_group_size=16384,
    )
    return {"out": out_dir, "n_docs": n_docs, "n_embeddings": n_embs}


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/ta_soak")
    p.add_argument("--scale", type=int, default=10)
    args = p.parse_args()
    import json

    print(json.dumps(make(args.out, args.scale)))
