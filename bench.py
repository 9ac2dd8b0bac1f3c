"""Benchmark harness.

Default run: one fresh Ray session (num_cpus=$RAY_GRAFT_CPUS, default 32),
input $GRAFT_SF_DIR (default /root/testdata/sf0.1), runs the headline KG
pipeline over synthesized transcripts sized by the sf plus the operator
queries over the sf tables, and prints ONE JSON line:

    {"metric": "kg_pipeline_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": 0.1, "num_cpus": 32,
     "turns": T, "turns_per_sec": R}

``--scaling``: runs the headline pipeline in two fresh subprocesses at
8 and 32 CPUs on the same input and prints both throughputs plus the
scaling efficiency (the sandbox proxy for the N → 4N-node criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


def _emit(payload: dict) -> None:
    """Emit the ONE result line robustly (VERDICT r3 #6: BENCH_r03's
    headline was lost to a truncated tail): serialize once, write
    atomically to stdout with an explicit flush so no worker output can
    interleave mid-line, and persist the same JSON to BENCH_LAST.json
    next to this file so the record survives even a truncated capture."""
    line = json.dumps(payload, separators=(",", ":"))
    sys.stdout.flush()
    sys.stdout.write(line + "\n")
    sys.stdout.flush()
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LAST.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass  # read-only checkout: stdout already has the line


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = _env_int("RAY_GRAFT_CPUS", 32)
BENCH_CONVS = _env_int("GRAFT_BENCH_CONVS", 40_000)
SCALING_CONVS = _env_int("GRAFT_SCALING_CONVS", 800_000)


def _init_ray(num_cpus: int):
    import logging

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # push-based sort shuffle overlaps map and merge tasks — measured
    # ~25% faster end-to-end at 32 CPUs with identical results
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def run_headline(num_cpus: int) -> dict:
    """KG pipeline (transcripts → triples) over BENCH_CONVS conversations."""
    import ray

    from table_annotation_ray import synth
    from table_annotation_ray.pipelines.kg_pipeline import run_kg_pipeline

    root = synth.default_dataset(n_convs=BENCH_CONVS, seed=42)
    import pyarrow.parquet as pq

    n_turns = pq.ParquetFile(os.path.join(root, "transcripts.parquet")).metadata.num_rows
    # warm the page cache so we measure compute+shuffle, not first disk read
    with open(os.path.join(root, "transcripts.parquet"), "rb") as f:
        f.read()
    # warm the worker pool (process spawn + module imports + per-worker
    # state) with an untimed tiny run so the timed run measures
    # steady-state throughput, not cold start
    warm_root = synth.default_dataset(n_convs=60, seed=42)
    run_kg_pipeline(
        os.path.join(warm_root, "transcripts.parquet"), os.path.join(warm_root, "kb")
    ).count()
    t0 = time.time()
    triples = run_kg_pipeline(os.path.join(root, "transcripts.parquet"), os.path.join(root, "kb"))
    n_triples = triples.count()
    dt = time.time() - t0
    return {
        "sec": round(dt, 3),
        "turns": int(n_turns),
        "turns_per_sec": round(n_turns / dt, 1),
        "triples": int(n_triples),
    }


def run_queries(sf_dir: str, repeats: int = 2) -> dict[str, float]:
    """Per-query wall time, min of ``repeats`` runs (first run pays
    worker-pool and page-cache warmup; the min is the steady state)."""
    import __ray_entry__ as e

    out: dict[str, float] = {}
    for name, fn in e.queries().items():
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            res = fn(sf_dir)
            if hasattr(res, "count") and not hasattr(res, "columns"):
                res.count()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    return out


def run_canary() -> float:
    """Fixed pure-CPU workload (numpy matmul, no Ray): the host-
    contention canary.  This sandbox has shown 2-4x wall-clock swings
    under external load; dividing any wall time by (canary_sec /
    historical canary_sec) normalizes cross-round comparisons.
    Reference values on this box: ~1.7 s measured under the heavy
    contention of the r3 third session; expect lower in clean windows."""
    import numpy as np

    a = np.random.default_rng(0).normal(size=(1000, 1000))
    t0 = time.time()
    for _ in range(6):
        a = a @ a / np.linalg.norm(a)
    return round(time.time() - t0, 3)


def main_single():
    canary = run_canary()
    _init_ray(NUM_CPUS)
    import ray

    headline = run_headline(NUM_CPUS)
    qtimes = run_queries(SF_DIR)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    _emit(
            {
                "metric": "kg_pipeline_sec",
                "value": headline["sec"],
                "unit": "sec",
                "queries": qtimes,
                "sf": float(sf) if sf else None,
                "num_cpus": NUM_CPUS,
                "turns": headline["turns"],
                "turns_per_sec": headline["turns_per_sec"],
                "triples": headline["triples"],
                "canary_sec": canary,
                # single-core canary misses multi-core contention; the
                # load average catches external core-stealing (observed
                # loadavg 6+ with zero local work on this box)
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
    )
    ray.shutdown()


def main_headline_only():
    _init_ray(NUM_CPUS)
    import ray

    headline = run_headline(NUM_CPUS)
    sys.stdout.flush()
    sys.stdout.write(json.dumps(headline) + "\n")
    sys.stdout.flush()
    ray.shutdown()


def main_scaling():
    """Each level is the MEDIAN of `GRAFT_SCALING_SAMPLES` fresh-process
    runs — single-run wall-clock on a shared box swings ±20%, which
    would swing the efficiency ratio by ±0.2."""
    samples = _env_int("GRAFT_SCALING_SAMPLES", 1)

    def run_once(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_CONVS=str(SCALING_CONVS),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run_median(ncpu: int) -> tuple[dict, list[float]]:
        runs = [run_once(ncpu) for _ in range(samples)]
        secs = sorted(r["sec"] for r in runs)
        median = secs[len(secs) // 2]
        rep = min(runs, key=lambda r: abs(r["sec"] - median))
        return rep, secs

    lo_cpus, hi_cpus = 8, 32
    # synth data materializes (cached) inside the first subprocess;
    # each subprocess does its own small worker-pool + page-cache warmup
    lo, lo_secs = run_median(lo_cpus)
    hi, hi_secs = run_median(hi_cpus)
    eff = (lo["sec"] / hi["sec"]) / (hi_cpus / lo_cpus)
    _emit(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "cpus_lo": lo_cpus,
                "cpus_hi": hi_cpus,
                "sec_lo": lo["sec"],
                "sec_hi": hi["sec"],
                "sec_lo_samples": lo_secs,
                "sec_hi_samples": hi_secs,
                "turns": lo["turns"],
                "turns_per_sec_lo": lo["turns_per_sec"],
                "turns_per_sec_hi": hi["turns_per_sec"],
            }
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--headline-only" in sys.argv:
        main_headline_only()
    else:
        main_single()
