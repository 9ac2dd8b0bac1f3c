#!/usr/bin/env python
"""Micro-batch streaming ingest: maintain a per-key materialized
aggregate over an append-only event stream, checkpoint per micro-batch,
resume from the last complete checkpoint.

The stream is the events table consumed in ``event_id`` (arrival)
order, sliced into ``--batches`` micro-batches.  Each round folds the
new slice into the running aggregate with
``stages/agg.py::merge_aggregates`` — only the DELTA is scanned and
only partial rows plus the one-row-per-key state table cross the one
bucket exchange; the historical facts are never re-read (the
incremental-materialized-view contract,
``merge_aggregates(agg(old), new) == agg(old ∪ new)``, pytest-pinned).

Checkpoints are ``state/batch=K/`` parquet directories with a
``_SUCCESS`` marker (the run_kg.py resumability contract): on restart
the job finds the newest complete checkpoint, loads ONLY that state
table, and continues with the remaining slices.  A crash mid-batch
leaves no marker, so that batch replays.

``--verify`` recomputes the one-shot aggregate over the full table and
compares — prints ``"verified": true`` only on an exact frame match.

Submit to a Ray cluster::

    ray job submit --working-dir . -- \
        python jobs/run_stream.py --events s3://bucket/events \
            --out s3://bucket/stream_state --batches 24

Prints ONE JSON line: batches run/resumed, key count, verification.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REDUCERS = {
    "n": (None, "count"),
    "sum_cents": ("cents", "sum"),
    "lo_cents": ("cents", "min"),
    "hi_cents": ("cents", "max"),
}


def _prep(lo: int, hi: int):
    """Slice [lo, hi) of the arrival order, values as exact cents."""
    import numpy as np
    import pandas as pd  # noqa: F401
    import pyarrow as pa

    def f(b):
        m = (b["event_id"] >= lo) & (b["event_id"] < hi)
        b = b[m]
        return pa.table(
            {
                "user_id": pa.array(b["user_id"].to_numpy(), pa.int64()),
                "cents": pa.array(
                    np.round(b["value"].to_numpy() * 100.0).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return f


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--events", required=True, help="events parquet path")
    parser.add_argument("--out", required=True, help="state directory")
    parser.add_argument("--batches", type=int, default=8)
    parser.add_argument("--verify", action="store_true",
                        help="compare final state to the one-shot aggregate")
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data.context import DataContext, ShuffleStrategy

    DataContext.get_current().shuffle_strategy = (
        ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    )
    DataContext.get_current().enable_progress_bars = False

    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.agg import grouped_reduce, merge_aggregates

    cols = ["event_id", "user_id", "value"]
    events = rd.read_parquet(args.events, columns=cols)
    # arrival-order bounds; event ids are dense but we only assume order
    lo_id = int(events.min("event_id"))
    hi_id = int(events.max("event_id")) + 1
    n_b = max(1, args.batches)
    step = max(1, (hi_id - lo_id + n_b - 1) // n_b)
    bounds = [
        (lo_id + i * step, min(lo_id + (i + 1) * step, hi_id))
        for i in range(n_b)
    ]
    bounds = [b for b in bounds if b[0] < b[1]]

    os.makedirs(args.out, exist_ok=True)

    def ckpt_dir(k: int) -> str:
        return os.path.join(args.out, f"batch={k}")

    # resume: newest complete checkpoint
    start = 0
    for k in range(len(bounds) - 1, -1, -1):
        if os.path.exists(os.path.join(ckpt_dir(k), "_SUCCESS")):
            start = k + 1
            break

    state = None
    if start > 0:
        state = rd.read_parquet(ckpt_dir(start - 1))

    ran = []
    for k in range(start, len(bounds)):
        lo, hi = bounds[k]
        delta = events.map_batches(_prep(lo, hi), batch_format="pandas")
        if state is None:
            state = grouped_reduce(delta, ["user_id"], REDUCERS)
        else:
            state = merge_aggregates(state, delta, ["user_id"], REDUCERS)
        d = ckpt_dir(k)
        os.makedirs(d, exist_ok=True)
        state.write_parquet(d)
        with open(os.path.join(d, "_SUCCESS"), "w"):
            pass
        # read the checkpoint back so the next fold consumes a bounded,
        # materialized base instead of an ever-deeper lazy chain
        state = rd.read_parquet(d, columns=["user_id", *REDUCERS])
        ran.append(k)

    final = state.to_pandas().sort_values("user_id").reset_index(drop=True)
    verified = None
    if args.verify:
        oneshot = (
            grouped_reduce(
                events.map_batches(_prep(lo_id, hi_id), batch_format="pandas"),
                ["user_id"],
                REDUCERS,
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        cols_ = ["user_id", *REDUCERS]
        verified = bool(
            final[cols_].astype("int64").equals(oneshot[cols_].astype("int64"))
        )

    print(json.dumps({
        "batches": len(bounds),
        "resumed_at": start,
        "ran": ran,
        "n_keys": int(len(final)),
        "verified": verified,
        "out": args.out,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
