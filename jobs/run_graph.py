#!/usr/bin/env python
"""Cluster job entrypoint for the graph algorithms: PageRank and
connected components over an edge-list Parquet table.

Submit to a Ray cluster::

    ray job submit --working-dir . -- \
        python jobs/run_graph.py --edges s3://bucket/edges --algo pagerank \
            --out s3://bucket/ranks --iters 20 --engine sharded

In this sandbox it runs against a local session::

    python jobs/run_graph.py --edges /tmp/edges.parquet --algo pagerank \
        --out /tmp/ranks

Engines for PageRank: ``auto`` (default — picks by edges × iters,
stages/graph.py::pagerank_auto), ``dataset`` (stages/graph.py —
streaming bucket exchanges, simplest; re-shuffles the static edge set
each round) and ``sharded`` (state/graph_shards.py — shard actors load
edges once, rounds exchange rank partials only; the long-iteration /
huge-graph choice, measured 2x faster from ~200k edge-iterations up).
Both produce identical ranks (pytest-pinned rtol 1e-9).
Components always run on the Dataset engine
(stages/dedup.py::min_label_components).

Prints ONE JSON line: node/edge counts, engine, output path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--edges", required=True, help="edge parquet path/dir")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--algo", choices=["pagerank", "components"],
                        default="pagerank")
    parser.add_argument("--engine", choices=["auto", "dataset", "sharded"],
                        default="auto", help="pagerank execution engine")
    parser.add_argument("--src", default="src")
    parser.add_argument("--dst", default="dst")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--damping", type=float, default=0.85)
    parser.add_argument("--num-shards", type=int, default=8)
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data.context import DataContext, ShuffleStrategy

    DataContext.get_current().shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    edges = rd.read_parquet(args.edges, columns=[args.src, args.dst])
    n_edges = edges.count()
    os.makedirs(args.out, exist_ok=True)

    if args.algo == "pagerank":
        engine = args.engine
        if engine == "auto":
            from table_annotation_ray.stages.graph import AUTO_EDGE_ITERS

            engine = (
                "sharded" if n_edges * args.iters >= AUTO_EDGE_ITERS else "dataset"
            )
        if engine == "sharded":
            from table_annotation_ray.state.graph_shards import pagerank_sharded

            # shards write their own rank parts — node-cardinality state
            # never routes through the driver
            manifest = pagerank_sharded(
                edges, src=args.src, dst=args.dst, damping=args.damping,
                iters=args.iters, num_shards=args.num_shards,
                out_dir=args.out,
            )
            print(json.dumps({
                "algo": "pagerank", "engine": "sharded",
                "n_edges": int(n_edges),
                "n_nodes": int(sum(m["rows"] for m in manifest)),
                "iters": args.iters, "out": args.out,
            }))
            ray.shutdown()
            return 0
        else:
            from table_annotation_ray.stages.graph import pagerank

            out_ds = pagerank(
                edges, src=args.src, dst=args.dst,
                damping=args.damping, iters=args.iters,
            )
        out_ds.write_parquet(args.out)
        n_nodes = out_ds.count()
    else:
        import pandas as pd

        from table_annotation_ray.stages.dedup import min_label_components

        pairs = edges.map_batches(
            lambda b: pd.DataFrame({"a": b[args.src], "b": b[args.dst]}),
            batch_format="pandas",
        )
        comp = min_label_components(pairs)
        comp.write_parquet(args.out)
        n_nodes = comp.count()

    print(json.dumps({
        "algo": args.algo,
        "engine": engine if args.algo == "pagerank" else "dataset",
        "n_edges": int(n_edges),
        "n_nodes": int(n_nodes),
        "iters": args.iters if args.algo == "pagerank" else None,
        "out": args.out,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
