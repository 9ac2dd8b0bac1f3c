#!/usr/bin/env python
"""Cluster job entrypoint for the training-data curation pipeline.

Submit to a Ray cluster::

    ray job submit --working-dir . -- \
        python jobs/run_curation.py --docs s3://bucket/documents \
            --out s3://bucket/curated --partitions 4096 --langs en,fr

In this sandbox it runs against a local session::

    python jobs/run_curation.py --docs /root/testdata/sf0.01/documents.parquet \
        --out /tmp/curated --langs en

Output layout (resumable, see stages/sinks.py): ``out/docs/part=N/``
curated documents, ``out/packs/part=N/`` sequence-packing assignments,
``out/_MANIFEST.json`` the retention funnel.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--docs", required=True, help="documents parquet path/dir")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--partitions", type=int, default=16, help="hash(doc_id) output partitions")
    parser.add_argument("--minhash-threshold", type=float, default=0.8)
    parser.add_argument("--min-stopword-ratio", type=float, default=0.05)
    parser.add_argument("--max-mean-token-len", type=float, default=8.0)
    parser.add_argument("--langs", default=None,
                        help="comma-separated allowed languages (default: keep all)")
    parser.add_argument("--max-tokens", type=int, default=512, help="pack size")
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data.context import DataContext, ShuffleStrategy

    DataContext.get_current().shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    from table_annotation_ray.pipelines.curation_pipeline import run_curation_pipeline

    manifest = run_curation_pipeline(
        args.docs,
        args.out,
        minhash_threshold=args.minhash_threshold,
        min_stopword_ratio=args.min_stopword_ratio,
        max_mean_token_len=args.max_mean_token_len,
        allowed_langs=tuple(args.langs.split(",")) if args.langs else None,
        max_tokens=args.max_tokens,
        num_partitions=args.partitions,
    )
    print(json.dumps({
        "n_input": manifest["n_input"],
        "n_after_exact_dedup": manifest["n_after_exact_dedup"],
        "n_near_dup_victims": manifest["n_near_dup_victims"],
        "n_curated": manifest["n_curated"],
        "docs_partitions": len(manifest["docs"]["partitions"]),
        "packs_partitions": len(manifest["packs"]["partitions"]),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
