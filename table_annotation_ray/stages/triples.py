"""Stage 4 — triple emission, canonicalization, dedup, partitioned sink.

The reference stops at per-table CEA/CTA/CPA JSON
(`annotation/table_annotation.py:114-143`); the triple materialization
is ours (north_rule): annotations → (subj, pred, obj) →
global sort + exact dedup → hash(subj)-partitioned adjacency Parquet
with per-partition commit manifests (resume support).

Emission rules (mirrored by synth goldens):
  * CPA: for each column pair, the TOP annotation only (the reference
    output also exposes only ``cpa[0]``, table_annotation.py:133-143);
    per row, subj = CEA(head), obj = CEA(tail) URI for entity tails or
    the cleaned cell text for literal tails.  ``(-)P`` predicates emit
    reversed (obj, P, subj); composite ``a::b`` paths are recorded in
    the CPA dataset but are NOT materialized as triples (a 2-hop path
    is not a KG edge).
  * CTA: (entity URI, P31 URI, top type URI) for every resolved cell of
    the column.
"""

from __future__ import annotations

import json
import os
import zlib

import pandas as pd
import pyarrow as pa

import ray.data as rd

from .annotator import AnnotationResult

_PREFIX_E = "http://www.wikidata.org/entity/"
_PREFIX_P = "http://www.wikidata.org/prop/direct/"


def conversation_outputs_to_rows(
    conv_id: str,
    result: AnnotationResult,
    cells: dict[tuple[int, int], str],
) -> list[tuple[str, str, str, str, float]]:
    """Annotation result of one conversation → deduplicated triple rows."""
    seen: dict[tuple[str, str, str], float] = {}

    def emit(subj: str, pred: str, obj: str, score: float):
        key = (subj, pred, obj)
        prev = seen.get(key)
        if prev is None or score > prev:
            seen[key] = score

    entity_col_set = set(result.entity_cols)
    for (head_col, tail_col), cpas in result.cpa.items():
        pid, score, _cov = cpas[0]
        if "::" in pid:
            continue
        tail_is_entity = tail_col in entity_col_set
        reverse = pid.startswith("(-)")
        bare = pid[3:] if reverse else pid
        rows = {r for (r, c) in result.cea if c == head_col}
        for row in rows:
            head = result.cea.get((row, head_col))
            if head is None:
                continue
            subj = _PREFIX_E + head[0]
            if tail_is_entity:
                tail = result.cea.get((row, tail_col))
                if tail is None:
                    continue
                obj = _PREFIX_E + tail[0]
            else:
                obj = cells.get((row, tail_col), "")
                if not obj:
                    continue
            if reverse:
                if not tail_is_entity:
                    continue
                emit(obj, _PREFIX_P + bare, subj, score)
            else:
                emit(subj, _PREFIX_P + bare, obj, score)

    for col, ctas in result.cta.items():
        type_id, score, _cov = ctas[0]
        for (row, c), (eid, _s) in result.cea.items():
            if c == col:
                emit(_PREFIX_E + eid, _PREFIX_P + "P31", _PREFIX_E + type_id, score)

    return [(s, p, o, conv_id, sc) for (s, p, o), sc in sorted(seen.items())]


# ---------------------------------------------------------------------------
# global canonicalization + partitioned sink
# ---------------------------------------------------------------------------

def dedup_triples(ds: rd.Dataset, high_cardinality: bool = False) -> rd.Dataset:
    """Exact global dedup on (subj, pred, obj), keeping the max score.

    This is the engine's one deliberate all-to-all shuffle
    (SURVEY.md §2.6): a groupby on the triple key with a max-score
    reduce.  Per-batch pre-dedup inside ``map_batches`` shrinks the
    shuffle input first (combiner pattern)."""

    def local_dedup(batch: pd.DataFrame) -> pd.DataFrame:
        # associative partial of the global (Max score, Min conv_id)
        # reduce — keeping a single arbitrary row per key here would make
        # the surviving conv_id depend on batch composition (run-order
        # nondeterminism)
        return batch.groupby(["subj", "pred", "obj"], as_index=False).agg(
            score=("score", "max"), conv_id=("conv_id", "min")
        )

    ds = ds.map_batches(local_dedup, batch_format="pandas")
    # the combiner collapses each block to its unique triples; coalesce
    # the now-tiny blocks so the exchange doesn't schedule hundreds of
    # micro tasks (dominates wall time otherwise)
    ds = ds.repartition(32)
    if high_cardinality:
        # corpus-cardinality triple spaces: hash-bucket exchange +
        # vectorized in-bucket reduce (stages/agg.py) — ray's builtin
        # aggregate is per-key Python (CLAUDE.md r3)
        from .agg import grouped_reduce

        return grouped_reduce(
            ds,
            ["subj", "pred", "obj"],
            {"score": ("score", "max"), "conv_id": ("conv_id", "min")},
            batch_size=None,
        )
    # DEFAULT: builtin aggregate.  The flagship's distinct-triple space
    # is KB-bounded (hundreds), where per-key Python is cheap — and
    # grouped_reduce's map_groups adds a SECOND push-based sort behind
    # the heavy conv-bucket sort, which starves it at low CPU counts
    # (measured 414 s vs 184 s at 8 CPUs / 1.75M turns, degrading to a
    # stall at 7M; the r1 "two barriers" lesson in a new form).
    # provenance = lexicographically-first emitting conv_id
    from ray.data.aggregate import Max, Min

    return ds.groupby(["subj", "pred", "obj"]).aggregate(
        Max("score", alias_name="score"),
        Min("conv_id", alias_name="conv_id"),
    )


def assign_part(batch: pa.Table, num_partitions: int) -> pa.Table:
    subj = batch["subj"].to_pylist()
    parts = [zlib.crc32(s.encode()) % num_partitions for s in subj]
    return batch.append_column("part", pa.array(parts, pa.int32()))


def completed_partitions(out_dir: str) -> set[int]:
    """Partitions with a ``_SUCCESS`` marker; incomplete leftovers from a
    crashed run are removed so a rerun cannot double-write."""
    import shutil

    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        part = int(name.split("=")[1])
        part_dir = os.path.join(out_dir, name)
        if os.path.exists(os.path.join(part_dir, "_SUCCESS")):
            done.add(part)
        else:
            shutil.rmtree(part_dir)
    return done


def write_triples_partitioned(
    ds: rd.Dataset, out_dir: str, num_partitions: int = 16,
    lineage: dict | None = None,
) -> dict:
    """Write hash(subj)-partitioned adjacency Parquet in ONE streaming
    pass with per-partition commit markers; returns the run manifest.

    Layout: ``out_dir/part=N/*.parquet`` + ``_SUCCESS`` per partition,
    ``out_dir/_MANIFEST.json`` with per-partition row counts (the
    north_rule lineage/metrics sidecar).  Resume = completed partitions
    are filtered OUT of the write; partial directories from a crashed
    run are removed first (see :func:`completed_partitions`)."""
    import time

    t_start = time.time()
    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir)
    ds = ds.map_batches(
        assign_part, batch_format="pyarrow", fn_kwargs={"num_partitions": num_partitions}
    )
    if done:
        done_list = sorted(done)
        ds = ds.filter(expr=f"part not in {done_list}")
    ds.write_parquet(out_dir, partition_cols=["part"])

    manifest: dict = {"num_partitions": num_partitions, "partitions": {}}
    import pyarrow.parquet as pq_mod

    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("part="):
            continue
        part = int(name.split("=")[1])
        part_dir = os.path.join(out_dir, name)
        n_rows = 0
        for f in os.listdir(part_dir):
            if f.endswith(".parquet"):
                n_rows += pq_mod.ParquetFile(os.path.join(part_dir, f)).metadata.num_rows
        status = "resumed(skip)" if part in done else "written"
        if part not in done:
            with open(os.path.join(part_dir, "_SUCCESS"), "w") as f:
                json.dump({"partition": part, "rows": n_rows}, f)
        manifest["partitions"][str(part)] = {"status": status, "rows": n_rows}
    manifest["total_rows"] = sum(p["rows"] for p in manifest["partitions"].values())
    manifest["resumed_partitions"] = sorted(done)
    manifest["write_wall_sec"] = round(time.time() - t_start, 3)
    manifest["lineage"] = lineage or {}
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
