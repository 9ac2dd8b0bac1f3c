"""Generic-table pipelines — the reference's three public entry points
(`table_preprocessing`, `entity_lookup`, `table_annotation`) as Ray
Data stages over a Dataset of logical tables.

A logical table is rows (table_id, row_idx, cells:list<string>) — the
output of sources/delimited.read_tables_from_files or any equivalent.
Per-table computations run inside ``map_groups(table_id)``-style tasks;
per-worker state (NER gazetteer, lookup index, KB) follows the
task-based worker-state pattern of the flagship pipeline.
"""

from __future__ import annotations

import json
import zlib

import pyarrow as pa

import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..state.worker_state import get_worker_state, ref_key

TABLE_BUCKETS = 128


def _bucket_tables(ds: rd.Dataset, num_buckets: int = TABLE_BUCKETS) -> rd.Dataset:
    """Tag each row with ``crc32(table_id) % num_buckets`` — the
    flagship conv-bucket idiom (stages/annotate_stage.py): the exchange
    groups over ≤``num_buckets`` values instead of one Ray group per
    table, which pays a per-key UDF call at corpus table counts
    (CLAUDE.md r3: map_groups degrades past ~20k groups).  The group
    UDFs already iterate ``_group_tables`` so multi-table groups are
    free."""

    def tag(batch: pa.Table) -> pa.Table:
        tids = batch["table_id"].to_pylist()
        uniq = {t: zlib.crc32(t.encode()) % num_buckets for t in set(tids)}
        return batch.append_column(
            "__tb_bkt", pa.array([uniq[t] for t in tids], pa.int32())
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def _group_tables(batch: pa.Table) -> dict[str, list[list[str]]]:
    tables: dict[str, list[tuple[int, list[str]]]] = {}
    for tid, idx, cells in zip(
        batch["table_id"].to_pylist(),
        batch["row_idx"].to_pylist(),
        batch["cells"].to_pylist(),
    ):
        tables.setdefault(tid, []).append((idx, cells))
    return {
        tid: [cells for _, cells in sorted(rows)] for tid, rows in tables.items()
    }


def preprocess_tables(
    tables_ds: rd.Dataset, kb_ref=None, seed: int = 42
) -> rd.Dataset:
    """Dataset of table rows → one row per table with the preprocessing
    JSON (orientation/header/key/typing) as a string column."""

    def run(batch: pa.Table) -> pa.Table:
        from ..functions.typing_rules import GazetteerNER
        from ..stages.preprocess import preprocess_table

        def build_ner():
            if kb_ref is None:
                return GazetteerNER({})
            from ..state.kb import KBReader

            kb = ray.get(kb_ref) if isinstance(kb_ref, ray.ObjectRef) else kb_ref
            return GazetteerNER(KBReader(kb).build_gazetteer())

        ner = get_worker_state(("prep-ner", ref_key(kb_ref)), build_ner)
        ids, infos = [], []
        for tid, table in _group_tables(batch).items():
            out = preprocess_table(table, ner, seed=seed)
            ids.append(tid)
            infos.append(json.dumps(out["preprocessed"]))
        return pa.table(
            {"table_id": pa.array(ids, pa.string()), "preprocessed": pa.array(infos, pa.string())}
        )

    return (
        _bucket_tables(tables_ds)
        .groupby("__tb_bkt")
        .map_groups(run, batch_format="pyarrow")
    )


def lookup_labels(
    labels_ds: rd.Dataset,
    kb_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    label_col: str = "label",
) -> rd.Dataset:
    """The ``entity_lookup`` service (lookup/entity_lookup.py:74-76) as a
    batch stage: (label) → (label, entity, score, rank) rows."""

    def run(batch: pa.Table) -> pa.Table:
        from ..state.kb import KBData
        from ..state.lookup_index import LabelIndex

        def build():
            kb: KBData = ray.get(kb_ref) if not isinstance(kb_ref, KBData) else kb_ref
            return LabelIndex(kb, cfg.lookup)

        index = get_worker_state(("lookup", ref_key(kb_ref)), build)
        out = {"label": [], "entity": [], "score": [], "rank": []}
        for label in batch[label_col].to_pylist():
            for rank, (eid, score) in enumerate(index.search(label.lower()), 1):
                out["label"].append(label)
                out["entity"].append(eid)
                out["score"].append(score)
                out["rank"].append(rank)
        return pa.table(
            {
                "label": pa.array(out["label"], pa.string()),
                "entity": pa.array(out["entity"], pa.string()),
                "score": pa.array(out["score"], pa.float64()),
                "rank": pa.array(out["rank"], pa.int32()),
            }
        )

    return labels_ds.map_batches(run, batch_format="pyarrow")


def annotate_single(raw_table: list[list[str]], stage) -> dict | None:
    """One generic table → the reference-shaped CEA/CTA/CPA dict
    (table_annotation.py:22-148), shared by the Dataset stage below and
    the serving endpoint (jobs/serve_api.py).  ``stage`` is an
    AnnotateBucket (holds NER, lookup index, KB reader, annotator).
    Returns None for tables that preprocessing filters away."""
    from ..stages.preprocess import (
        detect_header,
        detect_orientation,
        parse_table,
        subsample_rows,
        table_filtering,
        transpose,
    )

    kbr = stage.kbr
    # the reference's annotation flow runs preprocessing first
    # (annotation_models.py:80-93): clean → orientation (transpose
    # if VERTICAL) → header → first_data_row
    table = table_filtering(raw_table)
    if len(table) <= 1:
        return None
    sample = subsample_rows(table)
    typings, datatypes = parse_table(sample, stage.ner)
    orientation = detect_orientation(sample, datatypes, typings)
    if orientation.orientation == "VERTICAL":
        sample = transpose(sample)
        table = transpose(table)
    header = detect_header(sample, orientation.score, typings)
    first_data_row = 1 if header.has_header else 0
    # re-type the full (possibly transposed) table's cells
    typings, datatypes = parse_table(table, stage.ner)
    result = stage.annotator.annotate(
        table, typings, datatypes, first_data_row=first_data_row
    )
    cea = [
        {
            "row": r,
            "column": c,
            "annotation": {
                "label": kbr.get_label_of_entity(eid),
                "uri": kbr.prefixing_entity(eid),
                "score": round(score, 2),
            },
        }
        for (r, c), (eid, score) in sorted(result.cea.items())
    ]
    cta = [
        {
            "column": col,
            "annotation": [
                {
                    "label": kbr.get_label_of_entity(t),
                    "uri": kbr.prefixing_entity(t),
                    "score": round(s, 2),
                    "coverage": round(cov, 2),
                }
                for t, s, cov in annots
            ],
        }
        for col, annots in sorted(result.cta.items())
    ]
    cpa = []
    for (h, t), annots in sorted(result.cpa.items()):
        rel_id = annots[0][0]
        components = set(
            rel_id.replace("(-)", "").replace("(", "").replace(")", "").split("::")
        )
        uri, label = rel_id, rel_id
        for comp in components:
            if kbr.is_valid_id(comp):
                uri = uri.replace(comp, kbr.prefixing_entity(comp))
                label = label.replace(comp, kbr.get_label_of_entity(comp))
        cpa.append(
            {
                "headColumn": h,
                "tailColumn": t,
                "annotation": {
                    "label": label,
                    "uri": uri,
                    "score": round(annots[0][1], 2),
                    "coverage": round(annots[0][2], 2),
                },
            }
        )
    return {
        "CEA": cea,
        "CTA": cta,
        "CPA": cpa,
        "avgLookupCandidate": result.avg_lookup_candidates,
    }


def annotate_tables(
    tables_ds: rd.Dataset,
    kb_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> rd.Dataset:
    """The full ``table_annotation`` (table_annotation.py:22-148) over a
    Dataset of generic tables → one row per table with CEA/CTA/CPA JSON
    (entity URIs + labels, reference output shape)."""

    def run(batch: pa.Table) -> pa.Table:
        from ..stages.annotate_stage import AnnotateBucket

        stage: AnnotateBucket = get_worker_state(
            ("annotate", ref_key(kb_ref)), lambda: AnnotateBucket(kb_ref, cfg)
        )
        ids, payloads = [], []
        for tid, raw_table in _group_tables(batch).items():
            payload = annotate_single(raw_table, stage)
            if payload is None:
                continue
            ids.append(tid)
            payloads.append(json.dumps(payload))
        return pa.table(
            {"table_id": pa.array(ids, pa.string()), "annotated": pa.array(payloads, pa.string())}
        )

    return (
        _bucket_tables(tables_ds)
        .groupby("__tb_bkt")
        .map_groups(run, batch_format="pyarrow")
    )
