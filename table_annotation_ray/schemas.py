"""Fixed Arrow schemas for every stage boundary.

The reference is schemaless (untyped nested JSON / List[List[str]],
`preprocessing/table_preprocessing.py:39-100`); our engine is
schema-first: every Dataset boundary carries one of these schemas so
blocks are zero-copy Arrow end to end.
"""

from __future__ import annotations

import pyarrow as pa

# transcript cell-encoding convention: a turn's text is its logical table
# row with cells joined by this separator (SURVEY.md §1.2)
CELL_SEP = " | "

# ---- primary input (BASELINE.json input_hint) -------------------------------
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# ---- mention/typing stage ---------------------------------------------------
# One row per cell of the logical per-conversation table: a turn's text is
# split into column slots (see sources/tables.py). `typing`/`datatype`
# mirror the reference's per-cell label lists (prp_scripts/utils.py:64-112).
MENTIONS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("col_slot", pa.int32()),
        ("mention", pa.string()),
        ("typing", pa.list_(pa.string())),
        ("datatype", pa.list_(pa.string())),
    ]
)

# ---- candidate generation (lookup) ------------------------------------------
CANDIDATES = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("col_slot", pa.int32()),
        ("mention", pa.string()),
        ("entity_id", pa.string()),
        ("lookup_score", pa.float64()),
    ]
)

# ---- annotation outputs (mirror table_annotation.py:114-132) ---------------
CEA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("col_slot", pa.int32()),
        ("entity_id", pa.string()),
        ("score", pa.float64()),
    ]
)

CTA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("col_slot", pa.int32()),
        ("type_id", pa.string()),
        ("score", pa.float64()),
        ("coverage", pa.float64()),
    ]
)

CPA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("head_col", pa.int32()),
        ("tail_col", pa.int32()),
        ("pid", pa.string()),
        ("score", pa.float64()),
        ("coverage", pa.float64()),
    ]
)

# ---- emitted triples --------------------------------------------------------
TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conv_id", pa.string()),
        ("score", pa.float64()),
    ]
)

# ---- mini-KB (FIXTURES.md F-3/F-4; mirrors entity_indexing.py:88-97 and
#      wd_hashmap_indexing.py:60-75) -----------------------------------------
KB_LABELS = pa.schema(
    [
        ("entity", pa.string()),
        ("label", pa.string()),
        ("length", pa.int32()),
        ("origin", pa.string()),  # LABEL | MAIN_ALIAS | SUB_ALIAS
        ("pr", pa.float64()),
    ]
)

KB_EDGES = pa.schema(
    [
        ("src", pa.string()),
        ("pid", pa.string()),  # "P…" or "(-)P…" for reverse edges
        ("obj", pa.string()),
        # entity objs: rank NORMAL/PREFERRED/DEPRECATED;
        # literal objs: DateTime-…, DateTime-Period, Quantity-<unitQID>, String
        ("obj_kind", pa.string()),
    ]
)

KB_ENTITY_META = pa.schema(
    [
        ("entity", pa.string()),
        ("en_label", pa.string()),
        ("num_edges", pa.int64()),
    ]
)
