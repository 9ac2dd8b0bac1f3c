"""Generic-table preprocessing — orientation / header / key-column /
primitive-typing detection.

Faithful re-derivation of the reference preprocessing stack
(`preprocessing/table_preprocessing.py:29-100`,
`prp_scripts/utils.py:149-446`,
`prp_scripts/table_info_extraction_modules.py:57-361`) for parity
testing and for the generic-table ingestion path (a table that is NOT a
fixed-schema transcript).  Pure per-table functions — at scale they run
inside ``map_groups(table_id)`` (each logical table is one group), so
none of this shuffles anything beyond the per-table exchange.

Divergences (deliberate, documented):
  * the ≤400-row subsample uses a seeded RNG (reference shuffles with
    the global random state — non-deterministic, table_preprocessing.py:50-55);
  * the stray debug print in orientation step 4 is dropped
    (table_info_extraction_modules.py:211).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..functions.text import fix_encoding
from ..functions.typing_rules import (
    GazetteerNER,
    header_related_datatype,
    is_concept,
    key_column_related_datatype,
    type_cell,
)
from .annotator import types_per_column

_PUNCT_STRIP = ".@_!#$%^&*()<>?/\\|}{][~:'-+~~_°¨"


# ---------------------------------------------------------------------------
# table shaping (utils.py:149-218)
# ---------------------------------------------------------------------------

def table_filtering(table: list[list[str]]) -> list[list[str]]:
    """Drop all-empty rows, repair encoding per cell, pad short rows,
    drop all-empty columns (utils.py:149-177)."""
    if not table:
        return []
    max_width = max(len(row) for row in table)
    new_table = []
    for row in table:
        if not row:
            continue
        # reference missing-cell test is EMPTY-OR-SPACES-ONLY
        # (utils.py:165: cell != "" and cell != " "*len(cell)) — a
        # tab/newline-only cell counts as content there, so strip only
        # spaces (code-review r4 parity fix)
        non_missing = sum(1 for c in row if c.strip(" ") != "")
        if non_missing == 0:
            continue
        new_table.append([fix_encoding(c) for c in row])
    table_padding(new_table, max_width)
    return remove_null_columns(new_table)


def table_padding(table: list[list[str]], width: int) -> None:
    for row in table:
        row.extend([""] * (width - len(row)))


def remove_null_columns(table: list[list[str]]) -> list[list[str]]:
    if not table:
        return table
    cols = transpose(table)
    kept = [c for c in cols if any(v != "" for v in c)]
    return transpose(kept) if kept else []


def transpose(table: list[list[str]]) -> list[list[str]]:
    """Transpose with implicit '' padding for ragged rows (utils.py:199-218)."""
    if not table:
        return []
    width = max(len(r) for r in table)
    return [
        [row[i] if i < len(row) else "" for row in table] for i in range(width)
    ]


def subsample_rows(table: list[list[str]], limit: int = 400, seed: int = 42) -> list[list[str]]:
    """Deterministic ≤400-row sample keeping the first 10 rows
    (table_preprocessing.py:47-55 semantics, seeded)."""
    if len(table) <= limit:
        return table
    rng = np.random.RandomState(seed)
    rest = np.arange(10, len(table))
    rng.shuffle(rest)
    idx = sorted(list(range(10)) + sorted(rest[: limit - 10].tolist()))
    return [table[i] for i in idx]


# ---------------------------------------------------------------------------
# typing of the unique cell set (utils.py:221-224)
# ---------------------------------------------------------------------------

def parse_table(
    table: list[list[str]], ner: GazetteerNER
) -> tuple[dict[str, list[str]], dict[str, list[str]]]:
    typings: dict[str, list[str]] = {}
    datatypes: dict[str, list[str]] = {}
    for row in table:
        for cell in row:
            if cell not in typings:
                ty, dt = type_cell(cell, ner)
                if ty:
                    typings[cell] = ty
                    datatypes[cell] = dt
    return typings, datatypes


# ---------------------------------------------------------------------------
# homogeneity + word-length statistics (utils.py:339-411)
# ---------------------------------------------------------------------------

def homogeneity_compute(
    table: list[list[str]],
    datatypes: dict[str, list[str]],
    direction: str = "horizontal",
):
    """Per-line datatype homogeneity mean/std (utils.py:339-391):
    per-line popularity score 1-(1-2f)^2 per type, averaged over
    distinct types, squared; lines with <25% typed cells skipped."""
    from ..functions.typing_rules import typing_priority

    lines = table if direction == "horizontal" else transpose(table)
    per_line = []
    for line in lines:
        counts: dict[str, int] = {}
        n_typed = 0
        for cell in line:
            dts = datatypes.get(cell)
            if dts:
                for dt in dts:
                    counts[dt] = counts.get(dt, 0) + 1
                n_typed += 1
        for cell in line:
            dts = datatypes.get(cell, [])
            if len(dts) > 1:
                ranked = sorted(
                    dts, key=lambda x: (counts.get(x, 0), typing_priority(x)), reverse=True
                )
                for other in ranked[1:]:
                    if other in counts:
                        counts[other] -= 1
                        if counts[other] == 0:
                            del counts[other]
        if not line or n_typed / len(line) < 0.25 or not counts:
            continue
        coef = sum(1 - (1 - 2 * (c / n_typed)) ** 2 for c in counts.values())
        per_line.append((coef / len(counts)) ** 2)
    if len(per_line) > 1:
        return float(np.mean(per_line)), float(np.std(per_line, ddof=1))
    return None, None


def std_column_word_length(table: list[list[str]], direction: str = "horizontal") -> float:
    """Mean over lines of the std of non-empty cell lengths; lines with
    <50% non-empty skipped (utils.py:393-411)."""
    lines = table if direction == "horizontal" else transpose(table)
    stds = []
    for line in lines:
        lens = [len(c) for c in line if c]
        if 2 * len(lens) >= len(line):
            stds.append(float(np.std(lens)))
    return float(np.mean(stds)) if stds else 0.0


# ---------------------------------------------------------------------------
# orientation (table_info_extraction_modules.py:57-220)
# ---------------------------------------------------------------------------

@dataclass
class Orientation:
    orientation: str
    score: float


def detect_orientation(
    table: list[list[str]],
    datatypes: dict[str, list[str]],
    typings: dict[str, list[str]],
) -> Orientation:
    n_rows, n_cols = len(table), len(table[0]) if table else 0

    # step 1: homogeneity bounds with soft margin, ignoring first row/col
    if n_rows > 2 and n_cols > 2:
        inner = [line[1:] for line in table[1:]]
        h_mean, h_std = homogeneity_compute(inner, datatypes, "horizontal")
        v_mean, v_std = homogeneity_compute(inner, datatypes, "vertical")
        if h_mean is not None and v_mean is not None:
            h_lo = h_mean - 0.5 * h_std / math.sqrt(n_rows)
            h_hi = h_mean + 0.5 * h_std / math.sqrt(n_rows)
            v_lo = v_mean - 0.5 * v_std / math.sqrt(n_cols)
            v_hi = v_mean + 0.5 * v_std / math.sqrt(n_cols)
            if h_hi + 0.01 < v_lo:
                smooth = 0.1 if h_mean < 0.1 else 0.0
                return Orientation("VERTICAL", (v_lo - h_hi) / (v_lo + smooth))
            if h_lo >= v_hi + 0.01:
                smooth = 0.1 if v_mean < 0.1 else 0.0
                return Orientation("HORIZONTAL", (h_lo - v_hi) / (h_lo + smooth))
    else:
        return Orientation("HORIZONTAL", 0.1)

    # step 2: first-row/first-column typing exposure
    def typed_ratio(cells):
        hits = 0
        for c in cells:
            ts = typings.get(c, [])
            if any(t not in ("", "UNKNOWN") for t in ts):
                hits += 1
        return hits / len(cells) if cells else 0.0

    top_ratio = typed_ratio(table[0][1:])
    left_ratio = typed_ratio([line[0] for line in table[1:]])
    if top_ratio > 0.5 and left_ratio < 0.05:
        return Orientation("VERTICAL", 0.2)
    if left_ratio > 0.5 and top_ratio < 0.05:
        return Orientation("HORIZONTAL", 0.2)

    # step 3: exists-a-homogeneous-column test
    def homo_typing_exists(t):
        cols = transpose(t[1:]) if len(t) > 1 else transpose(t)
        per_col = types_per_column(cols, typings, 1, True)
        return any(
            v[0]["type"] not in ("", "UNKNOWN") and v[0]["score"] > 0.8
            for v in per_col.values()
        )

    h_exists = homo_typing_exists(table)
    v_exists = homo_typing_exists(transpose(table))
    if n_rows > 2 and n_cols > 2 and h_exists and not v_exists:
        return Orientation("HORIZONTAL", 0.15)
    if n_rows > 2 and n_cols > 2 and v_exists and not h_exists:
        return Orientation("VERTICAL", 0.15)

    # step 4: aspect ratio, then word-length std
    if n_rows / n_cols <= 0.25 or n_rows / n_cols >= 4.0:
        return Orientation("HORIZONTAL" if n_rows >= n_cols else "VERTICAL", 0.1)
    if std_column_word_length(table, "horizontal") >= std_column_word_length(table, "vertical"):
        return Orientation("HORIZONTAL", 0.1)
    return Orientation("VERTICAL", 0.1)


# ---------------------------------------------------------------------------
# header (modules.py:222-267)
# ---------------------------------------------------------------------------

@dataclass
class Header:
    has_header: bool
    header: list[str]
    score: float


def detect_header(
    table: list[list[str]],
    orientation_score: float,
    typings: dict[str, list[str]],
) -> Header:
    potential = table[0]
    header_typings = [typings.get(c, "") for c in potential]
    body = table[1:] if len(table) > 1 else table
    column_typings = types_per_column(transpose(body), typings, 3, True)

    noheader = 0.0
    for i_col, col_types in column_typings.items():
        hts = header_typings[i_col]
        if not hts:
            continue
        top = col_types[0]
        if sum(is_concept(t) for t in hts) == 0:
            if top["type"] in hts and top["score"] > 0.2:
                noheader = max(noheader, top["score"])
        elif "UNKNOWN" not in hts and "PERSON" not in hts:
            if top["type"] in hts and top["score"] > 0.2:
                noheader = max(noheader, top["score"])
    if noheader > 0.0:
        return Header(False, [], noheader * orientation_score)

    has_score = 0.0
    for i_col, col_types in column_typings.items():
        hts = header_typings[i_col]
        if not hts:
            continue
        for dt in col_types:
            if dt["type"] not in hts:
                has_score += dt["score"]
    has_score /= max(1, len(column_typings))
    return Header(True, list(potential), has_score * orientation_score)


# ---------------------------------------------------------------------------
# key column (modules.py:284-361)
# ---------------------------------------------------------------------------

@dataclass
class KeyColumn:
    key_column: int | None
    score: float


def detect_key_column(
    table: list[list[str]],
    orientation_score: float,
    datatypes: dict[str, list[str]],
) -> KeyColumn:
    body = table[1:] if len(table) > 1 else table
    column_datatypes = types_per_column(transpose(body), datatypes, 3, False)
    columns = transpose(table)
    scores: dict[int, float] = {}
    first_candidate = None
    considered = 0
    max_considered = 3 if len(columns) > 8 else 2
    for col_idx, column in enumerate(columns):
        if not column_datatypes[col_idx][0]["type"]:
            continue
        if considered > max_considered:
            break
        considered += 1
        cand_score = sum(
            dt["score"]
            for dt in column_datatypes[col_idx]
            if key_column_related_datatype(dt["type"])
        )
        if cand_score > 0.5:
            if first_candidate is None:
                first_candidate = col_idx
            uniques, empties = [], 0
            for cell in column:
                if cell in datatypes:
                    cleaned = cell
                    for s in _PUNCT_STRIP:
                        cleaned = cleaned.replace(s, "")
                    for dt in datatypes[cell]:
                        if key_column_related_datatype(dt) and 3 < len(cleaned) < 200:
                            uniques.append(cell)
                            break
                else:
                    empties += 1
            if uniques:
                ratio_unique = len(set(uniques)) / len(column)
                ratio_empty = empties / len(column)
                scores[col_idx] = (ratio_unique - ratio_empty) / math.sqrt(
                    1 + 2 * (col_idx - first_candidate)
                )
            else:
                scores[col_idx] = 0.0
        else:
            scores[col_idx] = 0.0
    if not scores:
        return KeyColumn(None, 0.0)
    ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    if len(ordered) > 1:
        (key_col, best), (_, second) = ordered[0], ordered[1]
        if best < 0.25:
            return KeyColumn(None, 0.0)
        return KeyColumn(key_col, (best - second) / (best + second) * orientation_score)
    key_col, best = ordered[0]
    if best < 0.25:
        return KeyColumn(None, 0.0)
    return KeyColumn(key_col, orientation_score)


# ---------------------------------------------------------------------------
# short-row realignment (utils.py:414-446) + reshaping (modules.py:363-412)
# ---------------------------------------------------------------------------

def re_align_short_row(
    line: list[str],
    datatypes: dict[str, list[str]],
    column_datatypes: dict[int, list[dict]],
) -> list[str]:
    """Divergence: the reference (utils.py:414-446) compares the
    column-type string list against a list of per-cell datatype LISTS —
    which never matches (dead code behind a TODO,
    table_preprocessing.py:61-64).  Here a cell aligns to a column when
    the column's top datatype is among the cell's datatypes."""
    from itertools import combinations

    line_types = [datatypes.get(cell, "") for cell in line]
    if "" in line_types:
        return line
    for col_types in column_datatypes.values():
        if col_types[0]["type"] == "" or col_types[0]["score"] < 0.75:
            return line
    valid = []
    for idx_set in combinations(range(len(column_datatypes)), len(line)):
        target = [column_datatypes[i][0]["type"] for i in idx_set]
        if all(t in line_types[j] for j, t in enumerate(target)):
            valid.append(idx_set)
    if len(valid) == 1:
        new_line = [""] * len(column_datatypes)
        for idx, val in zip(valid[0], line):
            new_line[idx] = val
        return new_line
    return line


# ---------------------------------------------------------------------------
# full preprocessing (table_preprocessing.py:29-100)
# ---------------------------------------------------------------------------

def preprocess_table(
    raw_table: list[list[str]],
    ner: GazetteerNER,
    seed: int = 42,
) -> dict:
    """Full preprocessing; output mirrors the reference JSON shape
    (table_preprocessing.py:81-98)."""
    out = {"raw": {"tableDataRaw": raw_table}, "preprocessed": {}}
    table = table_filtering(raw_table)
    if len(table) <= 1:
        return out
    sample = subsample_rows(table, 400, seed)
    typings, datatypes = parse_table(sample, ner)
    orientation = detect_orientation(sample, datatypes, typings)
    if orientation.orientation == "VERTICAL":
        sample = transpose(sample)
        table = transpose(table)
    body = sample[1:] if len(sample) > 1 else sample
    primitive = types_per_column(transpose(body), typings, 3, True)
    key_col = detect_key_column(sample, orientation.score, datatypes)
    header = detect_header(sample, orientation.score, typings)
    out["preprocessed"] = {
        "tableDataRevised": table,
        "tableOrientation": {
            "orientationLabel": orientation.orientation,
            "orientationScore": round(orientation.score, 2),
        },
        "headerInfo": {
            "hasHeader": header.has_header,
            "headerPosition": 0 if header.has_header else None,
            "headerLabel": header.header,
            "headerScore": round(header.score, 2),
        },
        "primaryKeyInfo": {
            "hasPrimaryKey": key_col.key_column is not None,
            "primaryKeyPosition": key_col.key_column,
            "primaryKeyScore": round(key_col.score, 2),
        },
        "primitiveTyping": [
            {
                "columnIndex": i,
                "typing": [
                    {"typingLabel": t["type"], "typingScore": round(t["score"], 2)}
                    for t in ts
                ],
            }
            for i, ts in primitive.items()
        ],
    }
    return out
