"""Standalone candidate-generation stage: mentions → entity candidates.

The actor-pool fuzzy lookup of SURVEY.md §2.4 (J1/J2) as its own
``map_batches`` stage — the index is built once per actor from the
broadcast KB (the ES cluster replaced by in-actor state), batches of
mentions are deduplicated per batch and memoized across batches by the
index's LRU.

The flagship pipeline fuses this into the annotate stage (the model
needs lookup coverage to classify columns, annotation_models.py:262-284),
but the standalone stage is the right shape when candidates are a
materialized intermediate (e.g. reuse across model versions).
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..config import PipelineConfig
from ..state.kb import KBData
from ..state.lookup_index import LabelIndex


class LookupStage:
    """(conv_id, turn_idx, col_slot, mention, ...) →
    (conv_id, turn_idx, col_slot, mention, entity_id, lookup_score, rank)."""

    def __init__(self, kb_ref, config: PipelineConfig | None = None):
        kb: KBData = ray.get(kb_ref) if not isinstance(kb_ref, KBData) else kb_ref
        cfg = config or PipelineConfig()
        self.k = cfg.annotation.k
        self.index = LabelIndex(kb, cfg.lookup)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mentions = batch["mention"].to_pylist()
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()
        slot = batch["col_slot"].to_pylist()
        # per-batch distinct-mention dedup: search each normalized
        # mention ONCE, replicate results per row
        results: dict[str, list] = {}
        for m in mentions:
            norm = (m or "").lower()
            if len(norm) > 1 and norm not in results:
                results[norm] = self.index.search(norm, self.k)
        out = {
            "conv_id": [], "turn_idx": [], "col_slot": [], "mention": [],
            "entity_id": [], "lookup_score": [], "rank": [],
        }
        for c, t, s, m in zip(conv, turn, slot, mentions):
            for rank, (eid, score) in enumerate(
                results.get((m or "").lower(), ()), 1
            ):
                out["conv_id"].append(c)
                out["turn_idx"].append(t)
                out["col_slot"].append(s)
                out["mention"].append(m)
                out["entity_id"].append(eid)
                out["lookup_score"].append(score)
                out["rank"].append(rank)
        return pa.table(
            {
                "conv_id": pa.array(out["conv_id"], pa.string()),
                "turn_idx": pa.array(out["turn_idx"], pa.int32()),
                "col_slot": pa.array(out["col_slot"], pa.int32()),
                "mention": pa.array(out["mention"], pa.string()),
                "entity_id": pa.array(out["entity_id"], pa.string()),
                "lookup_score": pa.array(out["lookup_score"], pa.float64()),
                "rank": pa.array(out["rank"], pa.int32()),
            }
        )


def lookup_candidates(mentions, kb_ref, config: PipelineConfig | None = None):
    """Task-based candidate generation: ``map_batches`` over plain tasks
    with the index built once per WORKER PROCESS (state/worker_state.py)
    instead of a fixed actor pool.

    A fixed actor pool caps parallelism at its size and holds CPUs for
    the stage lifetime (the repo-wide starvation hazard); plain tasks
    scale to every core and the per-worker cache gives the same
    build-once lifecycle. The sf0.1 standalone stage dropped 8.2 s → the
    annotate-stage-equivalent wall after this conversion.
    """
    from ..state.worker_state import get_worker_state, ref_key

    cfg = config or PipelineConfig()
    key_frag = ref_key(kb_ref)

    def task(batch: pa.Table) -> pa.Table:
        stage = get_worker_state(
            ("lookup_stage", key_frag), lambda: LookupStage(kb_ref, cfg)
        )
        return stage(batch)

    return mentions.map_batches(task, batch_format="pyarrow")
