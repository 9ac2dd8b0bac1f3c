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
        out = {
            "conv_id": [], "turn_idx": [], "col_slot": [], "mention": [],
            "entity_id": [], "lookup_score": [], "rank": [],
        }
        for c, t, s, m in zip(conv, turn, slot, mentions):
            norm = (m or "").lower()
            if len(norm) <= 1:
                continue
            for rank, (eid, score) in enumerate(self.index.search(norm, self.k), 1):
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
