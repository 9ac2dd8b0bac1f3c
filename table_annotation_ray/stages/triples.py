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

import pandas as pd
import pyarrow as pa

import ray.data as rd

from .annotator import AnnotationResult

_PREFIX_E = "http://www.wikidata.org/entity/"
_PREFIX_P = "http://www.wikidata.org/prop/direct/"

# explicit dedup-partial schema (column order = the pandas agg output)
_TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("score", pa.float64()),
        ("conv_id", pa.string()),
    ]
)


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
    # one pass over cea builds the col -> rows index; rescanning the
    # full cea dict per CPA pair / CTA column was O(pairs x |cea|) in
    # the flagship's hottest loop (code-review r4)
    rows_by_col: dict[int, list[int]] = {}
    for (r, c) in result.cea:
        rows_by_col.setdefault(c, []).append(r)
    for (head_col, tail_col), cpas in result.cpa.items():
        pid, score, _cov = cpas[0]
        if "::" in pid:
            continue
        tail_is_entity = tail_col in entity_col_set
        reverse = pid.startswith("(-)")
        bare = pid[3:] if reverse else pid
        rows = rows_by_col.get(head_col, ())
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
        for row in rows_by_col.get(col, ()):
            eid, _s = result.cea[(row, col)]
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

    def local_dedup(batch: pd.DataFrame) -> pa.Table:
        # associative partial of the global (Max score, Min conv_id)
        # reduce — keeping a single arbitrary row per key here would make
        # the surviving conv_id depend on batch composition (run-order
        # nondeterminism).  Arrow out: this partial feeds the
        # repartition + groupby exchange (CLAUDE.md r3 invariant).
        out = batch.groupby(["subj", "pred", "obj"], as_index=False).agg(
            score=("score", "max"), conv_id=("conv_id", "min")
        )
        if out.empty:
            # an empty pandas frame's object columns round-trip through
            # from_pandas as type NULL, and the groupby exchange dies on
            # schema unification (CLAUDE.md r2 dtype-preservation rule;
            # an all-literal bucket with no resolved CEA produces one)
            return pa.Table.from_pylist([], schema=_TRIPLE_SCHEMA)
        return pa.Table.from_pandas(out, preserve_index=False)

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


def write_triples_partitioned(
    ds: rd.Dataset, out_dir: str, num_partitions: int = 16,
    lineage: dict | None = None,
) -> dict:
    """Write hash(subj)-partitioned adjacency Parquet in ONE streaming
    pass with per-partition commit markers; returns the run manifest.

    Thin wrapper over the generic resumable sink (stages/sinks.py —
    layout, resume and manifest contract live THERE, once; the two
    implementations used to drift, code-review r4): partitions by
    ``crc32(subj) % num_partitions``."""
    from .sinks import write_partitioned

    return write_partitioned(
        ds, out_dir, key_col="subj", num_partitions=num_partitions,
        key_kind="str", lineage=lineage,
    )
