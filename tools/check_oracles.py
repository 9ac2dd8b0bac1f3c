"""Local emulation of the driver's correctness gate: run every
queries() entry at sf0.01 and compare against oracle_sql() via DuckDB
(row count + column names + order-insensitive values)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    only = sys.argv[1:] or list(qs)
    unknown = [n for n in only if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(qs)}")
        sys.exit(2)
    failures = 0
    for name in only:
        fn = qs[name]
        try:
            got = fn(SF_DIR)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            got = pd.DataFrame(got)
        except Exception as exc:
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(got)} rows)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        if not g.equals(w):
            neq = (g != w).any(axis=1)
            print(f"FAIL  {name}: {neq.sum()} mismatching rows; first:")
            print(pd.concat([g[neq].head(3), w[neq].head(3)], keys=["got", "want"]))
            failures += 1
            continue
        print(f"ok    {name}: {len(g)} rows match")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
