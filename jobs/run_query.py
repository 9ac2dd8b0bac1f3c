#!/usr/bin/env python
"""Run any registered query/operator pipeline from ``__ray_entry__``
against a directory of the TPC-H-ish Parquet tables and write the
result as Parquet — the ad-hoc batch surface over the same query
registry the correctness gate verifies.

Submit to a Ray cluster::

    ray job submit --working-dir . -- \
        python jobs/run_query.py --query tfidf_keywords \
            --sf-dir s3://bucket/tables --out s3://bucket/result

In this sandbox it runs against a local session::

    python jobs/run_query.py --query triangle_count \
        --sf-dir /root/testdata/sf0.01 --out /tmp/q_out
    python jobs/run_query.py --list        # enumerate queries

Prints ONE JSON line: query name, row count, wall seconds, whether the
query carries a DuckDB SQL oracle, output path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--query", help="query name (see --list)")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                        help="directory with the parquet tables")
    parser.add_argument("--out", help="output directory (parquet); "
                        "omit to print the row count only")
    parser.add_argument("--list", action="store_true",
                        help="list registered queries and exit")
    args = parser.parse_args()

    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    if args.list:
        for name in qs:
            print(f"{name}\t{'sql' if name in oracles else 'rows_only'}")
        return 0
    if not args.query:
        parser.error("--query is required (or use --list)")
    if args.query not in qs:
        parser.error(f"unknown query {args.query!r}; use --list")

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 ignore_reinit_error=True, logging_level="ERROR")

    t0 = time.time()
    res = qs[args.query](args.sf_dir)

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        if args.out:
            res = res.materialize()
            res.write_parquet(args.out)
        n_rows = res.count()
    else:
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        n_rows = len(df)
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(df, preserve_index=False),
                os.path.join(args.out, "result.parquet"),
            )
    wall = round(time.time() - t0, 3)

    print(json.dumps({
        "query": args.query,
        "rows": int(n_rows),
        "wall_sec": wall,
        "oracle": "sql" if args.query in oracles else "rows_only",
        "out": args.out,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
