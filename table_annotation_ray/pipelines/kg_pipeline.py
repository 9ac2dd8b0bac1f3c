"""End-to-end KG-construction pipeline (the flagship DAG).

    read_parquet(transcripts: conv_id, turn_idx, text)   [column-pruned scan]
      → map_batches(add_bucket)                          [crc32(conv_id) % B]
      → groupby(bucket).map_groups(annotate)             [task-based, per-worker
            encoding repair → cell explode → typing →     state: gazetteer NER,
            fuzzy lookup → 4-loop CEA/CTA/CPA model]      label index, KB image]
      → triples → per-block dedup → groupby(s,p,o) max   [one global shuffle]
      → write hash(subj)-partitioned Parquet + manifests [resumable]

The streaming re-expression of the reference's per-table
``table_annotation`` entry point (annotation/table_annotation.py:22-148)
over 10^12-turn transcript shards.  The bucket exchange moves ONE ROW
PER TURN (cell explosion happens post-shuffle, inside the annotate
worker); no stage materializes the full dataset; the only all-to-alls
are the bucket groupby (key cardinality = num_buckets) and the triple
dedup.  See docs/SCALING.md for the 100 TB arithmetic.

Nothing here calls ray.init() — the caller owns the session.
"""

from __future__ import annotations

import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..state.kb import load_kb
from ..stages.annotate_stage import add_bucket, annotate_bucket_batch
from ..stages.clean import clean_and_explode
from ..stages.triples import dedup_triples, write_triples_partitioned
from ..stages.typing_stage import typing_batch


def read_transcripts(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Prune at the read: the KG pipeline needs only the table-bearing
    columns (conv_id, turn_idx, text)."""
    return rd.read_parquet(path, columns=columns or ["conv_id", "turn_idx", "text"])


def mentions_dataset(
    transcripts: rd.Dataset,
    kb_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> rd.Dataset:
    """transcripts → typed mentions (stages 1-2)."""
    cells = transcripts.map_batches(clean_and_explode, batch_format="pyarrow")
    # task-based stateful stage: state cached per worker process
    # (state/worker_state.py) — elastic scheduling, no reserved pool
    return cells.map_batches(
        typing_batch,
        batch_format="pyarrow",
        batch_size=cfg.runtime.typing_batch_size,
        fn_kwargs={"kb_ref": kb_ref},
    )


def triples_dataset(
    cells: rd.Dataset,
    kb_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> rd.Dataset:
    """cells (typed or untyped) → deduplicated triples (stages 3-4).

    The flagship path feeds UNTYPED cells: typing happens inside the
    annotate worker (memoized per worker process), so the conv_id
    shuffle carries only primitive columns — list<string> typing columns
    through an all-to-all roughly doubles its byte volume for nothing."""
    bucketed = cells.map_batches(
        add_bucket,
        batch_format="pyarrow",
        fn_kwargs={"num_buckets": cfg.runtime.num_buckets},
    )
    raw = bucketed.groupby("bucket").map_groups(
        annotate_bucket_batch,
        batch_format="pyarrow",
        fn_kwargs={"kb_ref": kb_ref, "config": cfg},
    )
    return dedup_triples(raw)


def annotations_dataset(
    cells: rd.Dataset,
    kb_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> rd.Dataset:
    """cells → the CEA/CTA/CPA annotation relations as one tall Dataset
    (kind ∈ {cea, cta, cpa}); same bucketed execution as the triple path."""

    def run(bucket, kb_ref=None, config=None):
        from ..stages.annotate_stage import AnnotateBucket
        from ..state.worker_state import get_worker_state, ref_key

        stage = get_worker_state(
            ("annotate", ref_key(kb_ref)), lambda: AnnotateBucket(kb_ref, config)
        )
        return stage.annotations_table(bucket)

    bucketed = cells.map_batches(
        add_bucket,
        batch_format="pyarrow",
        fn_kwargs={"num_buckets": cfg.runtime.num_buckets},
    )
    return bucketed.groupby("bucket").map_groups(
        run, batch_format="pyarrow", fn_kwargs={"kb_ref": kb_ref, "config": cfg}
    )


def triples_from_turns(
    transcripts: rd.Dataset,
    kb_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> rd.Dataset:
    """Flagship shuffle layout: bucket WHOLE TURNS by conv_id; encoding
    repair + cell explosion + typing all happen inside the annotate
    worker (post-shuffle) — the exchange moves one row per turn."""

    def run(bucket, kb_ref=None, config=None):
        from ..stages.annotate_stage import AnnotateBucket
        from ..state.worker_state import get_worker_state, ref_key

        stage = get_worker_state(
            ("annotate", ref_key(kb_ref)), lambda: AnnotateBucket(kb_ref, config)
        )
        return stage.annotate_turns_table(bucket)

    bucketed = transcripts.map_batches(
        add_bucket,
        batch_format="pyarrow",
        fn_kwargs={"num_buckets": cfg.runtime.num_buckets},
    )
    raw = bucketed.groupby("bucket").map_groups(
        run, batch_format="pyarrow", fn_kwargs={"kb_ref": kb_ref, "config": cfg}
    )
    return dedup_triples(raw)


def run_kg_pipeline(
    transcripts_path: str,
    kb_dir: str,
    out_dir: str | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> rd.Dataset:
    """Full DAG; returns the deduplicated triples Dataset (lazy).  When
    ``out_dir`` is given, also writes the partitioned, resumable sink."""
    kb_ref = ray.put(load_kb(kb_dir))
    transcripts = read_transcripts(transcripts_path)
    triples = triples_from_turns(transcripts, kb_ref, cfg)
    if out_dir is not None:
        from dataclasses import asdict
        from datetime import datetime, timezone

        lineage = {
            "input": transcripts_path,
            "kb_dir": kb_dir,
            "started_utc": datetime.now(timezone.utc).isoformat(),
            "config": asdict(cfg),
            "engine_version": __import__("table_annotation_ray").__version__,
        }
        write_triples_partitioned(
            triples, out_dir, cfg.runtime.triple_partitions, lineage=lineage
        )
    return triples
