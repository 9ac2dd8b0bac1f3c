"""Stage 3 — distributed annotation: bucketed shuffle + per-conversation model.

Ray mapping (SURVEY.md §3.3 "our lifecycle"):

    mentions.map_batches(add_bucket)                  # hash(conv_id) % B
            .groupby("bucket")
            .map_groups(AnnotateBucket, ...)          # actor pool

One group = one bucket of whole conversations — NOT one conversation —
so the shuffle key cardinality is bounded (``num_buckets``) and each
actor amortizes its state (lookup index, KB, caches) across many
conversations.  Inside a group the conversations are annotated
sequentially by :class:`TableAnnotator`; the 4-loop model is inherently
per-table sequential (SURVEY §7) and is never parallelized within.

Skew: conversations are bounded by ``max_rows_per_conv`` (the
reference's 400-row preprocessing subsample bound,
table_preprocessing.py:47-55, applied as a hard per-conversation cap
here) so a hot conversation cannot stall a bucket unboundedly; buckets
spread hot conversations uniformly by hash.

The actor pulls the broadcast KB image from the object store ONCE in
``__init__`` (ray.put on the driver → zero extra copies per actor on a
node) and builds the label index + gazetteer from it — the reference's
ES server + LMDB mmap collapsed into per-actor state (ST3/ST4).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..config import PipelineConfig
from ..state.kb import KBData, KBReader
from ..state.lookup_index import LabelIndex
from .annotator import ActorCaches, AnnotationResult, TableAnnotator
from .triples import conversation_outputs_to_rows


def add_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Deterministic hash bucket per conv_id (crc32 — stable across
    processes, unlike Python's salted hash()).  Hashing runs once per
    UNIQUE conv_id in the batch (mention rows repeat conv_ids heavily)
    and is mapped back via dictionary-encode indices."""
    conv = batch["conv_id"].combine_chunks()
    dict_arr = conv.dictionary_encode()
    uniq = dict_arr.dictionary.to_pylist()
    uniq_buckets = np.fromiter(
        (zlib.crc32(c.encode()) % num_buckets for c in uniq),
        dtype=np.int32,
        count=len(uniq),
    )
    buckets = uniq_buckets[dict_arr.indices.to_numpy(zero_copy_only=False)]
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


class AnnotateBucket:
    """map_groups callable: one bucket of conversations → annotation rows."""

    def __init__(self, kb_ref, config: PipelineConfig | None = None,
                 max_rows_per_conv: int = 400):
        kb: KBData = ray.get(kb_ref) if not isinstance(kb_ref, KBData) else kb_ref
        self.cfg = config or PipelineConfig()
        self.kbr = KBReader(kb)
        self.index = LabelIndex(kb, self.cfg.lookup)
        self.caches = ActorCaches()
        self.annotator = TableAnnotator(
            self.index, self.kbr, self.cfg.annotation, self.caches
        )
        self.max_rows = max_rows_per_conv

    def annotate_conversation(self, group: pd.DataFrame) -> AnnotationResult:
        group = group.sort_values(["turn_idx", "col_slot"], kind="stable")
        n_rows = int(group["turn_idx"].max()) + 1
        n_cols = int(group["col_slot"].max()) + 1
        table = [[""] * n_cols for _ in range(min(n_rows, self.max_rows))]
        typings: dict[str, list[str]] = {}
        datatypes: dict[str, list[str]] = {}
        for turn, slot, mention, typ, dt in zip(
            group["turn_idx"], group["col_slot"], group["mention"],
            group["typing"], group["datatype"],
        ):
            if turn >= self.max_rows:
                continue  # per-conversation cap (see module docstring)
            table[turn][slot] = mention
            if mention not in typings:
                typings[mention] = list(typ)
                datatypes[mention] = list(dt)
        return self.annotator.annotate(table, typings, datatypes)

    def __call__(self, bucket_df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for conv_id, group in bucket_df.groupby("conv_id", sort=True):
            result = self.annotate_conversation(group)
            table = self._table_of(group)
            rows.extend(conversation_outputs_to_rows(conv_id, result, table))
        if not rows:
            return pd.DataFrame(
                {"subj": [], "pred": [], "obj": [], "conv_id": [], "score": []}
            )
        return pd.DataFrame(rows, columns=["subj", "pred", "obj", "conv_id", "score"])

    @staticmethod
    def _table_of(group: pd.DataFrame) -> dict[tuple[int, int], str]:
        return {
            (int(t), int(s)): m
            for t, s, m in zip(group["turn_idx"], group["col_slot"], group["mention"])
        }


def annotate_bucket_batch(bucket_df: pd.DataFrame, kb_ref, config=None) -> pd.DataFrame:
    """Task-based variant of :class:`AnnotateBucket` — stage state (label
    index, KB reader, KB-derived caches) is built once per worker process
    (state/worker_state.py) so annotation runs as elastic tasks and never
    reserves CPUs while idle."""
    from ..state.worker_state import get_worker_state, ref_key

    stage = get_worker_state(
        ("annotate", ref_key(kb_ref)), lambda: AnnotateBucket(kb_ref, config)
    )
    return stage(bucket_df)
