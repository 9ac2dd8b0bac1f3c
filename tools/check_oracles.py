"""Local emulation of the driver's correctness gate: run every
queries() entry at sf0.01 and compare against oracle_sql() via DuckDB
(row count + column names + order-insensitive values).

``--json PATH`` additionally writes a CORRECTNESS-style artifact (one
entry per query: status, row count, oracle mode, value hash) — evidence
for queries the driver's own file does not reach."""

import hashlib
import json
import os
import sys
import time

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
    # oracle_sql_at recomputes scale-dependent literals (the
    # curation_funnel minhash victim set) for THIS sf dir, so the full
    # sweep is green at any sf — the driver's oracle_sql() stays pinned
    # to its sf0.01 constant
    oracles = (
        e.oracle_sql_at(SF_DIR) if hasattr(e, "oracle_sql_at") else e.oracle_sql()
    )
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    only = args or list(qs)
    unknown = [n for n in only if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(qs)}")
        sys.exit(2)
    failures = 0
    report: dict = {}
    for name in only:
        fn = qs[name]
        t0 = time.perf_counter()
        try:
            got = fn(SF_DIR)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            got = pd.DataFrame(got)
        except Exception as exc:
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            report[name] = {"status": "error", "error": f"{type(exc).__name__}: {exc}"}
            failures += 1
            continue
        wall = round(time.perf_counter() - t0, 3)
        g = normalize(got)
        vhash = hashlib.md5(
            g.to_csv(index=False).encode("utf-8", "replace")
        ).hexdigest()
        entry = {"rows": int(len(got)), "wall_sec": wall, "value_hash": vhash}
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(got)} rows)")
            report[name] = {"status": "pass", "mode": "rows_only", **entry}
            continue
        want = con.execute(oracles[name]).fetchdf()
        w = normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(w.columns)}")
            report[name] = {"status": "fail", "mode": "sql",
                            "detail": "column mismatch", **entry}
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} != {len(w)}")
            report[name] = {"status": "fail", "mode": "sql",
                            "detail": f"rows {len(g)} != {len(w)}", **entry}
            failures += 1
            continue
        if not g.equals(w):
            neq = (g != w).any(axis=1)
            print(f"FAIL  {name}: {neq.sum()} mismatching rows; first:")
            print(pd.concat([g[neq].head(3), w[neq].head(3)], keys=["got", "want"]))
            report[name] = {"status": "fail", "mode": "sql",
                            "detail": f"{int(neq.sum())} mismatching rows", **entry}
            failures += 1
            continue
        print(f"ok    {name}: {len(g)} rows match")
        report[name] = {"status": "pass", "mode": "sql", **entry}
    ray.shutdown()
    if json_path:
        summary = {
            "sf_dir": SF_DIR,
            "n_queries": len(only),
            "n_pass": sum(1 for r in report.values() if r["status"] == "pass"),
            "n_sql_exact": sum(
                1 for r in report.values()
                if r["status"] == "pass" and r.get("mode") == "sql"
            ),
            "n_fail": failures,
            "queries": report,
        }
        with open(json_path, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {json_path}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
