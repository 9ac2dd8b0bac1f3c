"""Hermetic xlsx reader/writer — stdlib zip+XML only (S2,
`annotation/annot_scripts/file_loader.py:79-161`).

The reference uses openpyxl + scipy.ndimage; neither exists in this
environment, and neither is needed: xlsx is a zip of XML parts, and the
reference's two algorithms are small —

* **merged-cell unfolding** (file_loader.py:92-101): every cell of a
  merged range takes the top-left value;
* **multi-table segmentation** (file_loader.py:103-160): cells with
  content form a binary mask; 4-connected components (scipy
  ``ndi.label`` default connectivity) are labeled; each component's
  bounding-box slice of the raw sheet is one candidate table, kept when
  both dimensions exceed 1.

Value semantics follow openpyxl's: datetimes render '%m/%d/%Y'
(file_loader.py:110) — including real Excel dates, which are stored as
``t="n"`` SERIAL numbers bound to a date number format (numFmtId 14-17 /
22 / 27-36 or a custom y/m/d code), not as ``t="d"`` cells; the serial
is converted with the 1900-system origin 1899-12-30 exactly as openpyxl
does.  Booleans render "True"/"False", other numbers keep their XML
text.  Foreground matches the reference exactly (file_loader.py:117-126):
a cell is foreground when it has a value, OR its style's fill has a
patternType (≠ "none"), OR its border has a left/right style — the
styled-empty cases come from cross-referencing each cell's ``s`` index
through styles.xml cellXfs → fills/borders (what openpyxl's
``cell.fill.patternType`` / ``cell.border.left.style`` resolve to).
This closes the former divergence Dx1 (value-only foreground).

The writer emits a minimal valid workbook (inline strings) so tests and
sinks can round-trip without any xlsx dependency.
"""

from __future__ import annotations

import datetime as _dt
import io
import re
import zipfile
import xml.etree.ElementTree as ET

_REF = re.compile(r"([A-Z]+)([0-9]+)")

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_to_idx(col: str) -> int:
    n = 0
    for ch in col:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _idx_to_col(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _parse_ref(ref: str) -> tuple[int, int]:
    m = _REF.fullmatch(ref)
    return int(m.group(2)) - 1, _col_to_idx(m.group(1))  # (row, col)


def _cell_text(c: ET.Element, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(e.text or "" for e in c.iter(f"{{{_MAIN_NS}}}t"))
    v = c.find(f"{{{_MAIN_NS}}}v")
    raw = v.text if v is not None and v.text is not None else ""
    if raw == "":
        return ""
    if t == "s":
        return shared[int(raw)]
    if t == "b":
        return "True" if raw == "1" else "False"
    if t == "d":
        # ISO date → openpyxl-datetime rendering (file_loader.py:110)
        try:
            return _dt.datetime.fromisoformat(raw).strftime("%m/%d/%Y")
        except ValueError:
            return raw
    return raw  # "n" numbers and "str" formula results keep their text


def _sheet_parts(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet name, zip path)] in workbook order, via the rels part."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {
        r.get("Id"): r.get("Target") for r in rels.iter(f"{{{_PKG_REL_NS}}}Relationship")
    }
    out = []
    for sh in wb.iter(f"{{{_MAIN_NS}}}sheet"):
        target = target_by_rid[sh.get(f"{{{_REL_NS}}}id")]
        if not target.startswith("/"):
            target = "xl/" + target
        else:
            target = target[1:]
        out.append((sh.get("name"), target))
    return out


# builtin date number formats (ECMA-376 §18.8.30): dates, not times —
# a time-only cell stays numeric text, matching the reference's
# datetime-only strftime branch
_DATE_NUMFMT_IDS = frozenset({14, 15, 16, 17, 22, *range(27, 37)})
_QUOTED = re.compile(r'"[^"]*"|\[[^\]]*\]')


def _is_date_code(code: str) -> bool:
    """Custom format code → is it a DATE format?  Strip quoted literals
    and bracket sections first (openpyxl's is_date_format heuristic)."""
    bare = _QUOTED.sub("", code).lower()
    return "y" in bare or ("d" in bare and "m" in bare)


def _read_styles(zf: zipfile.ZipFile):
    """styles.xml → per-xf flags: (styled-foreground, is-date).
    Styled-foreground: the xf's fill has a patternType ≠ none or its
    border has a left/right style (the reference's openpyxl checks,
    file_loader.py:121-126).  Is-date: the xf's numFmtId is a builtin
    date format or a custom y/m/d code — real Excel stores dates as
    numeric serials bound to such an xf (review r4)."""
    if "xl/styles.xml" not in zf.namelist():
        return [], []
    root = ET.fromstring(zf.read("xl/styles.xml"))
    custom_date_ids: set[int] = set()
    numfmts_el = root.find(f"{{{_MAIN_NS}}}numFmts")
    if numfmts_el is not None:
        for nf in numfmts_el.iter(f"{{{_MAIN_NS}}}numFmt"):
            if _is_date_code(nf.get("formatCode", "")):
                custom_date_ids.add(int(nf.get("numFmtId")))
    fills: list[bool] = []
    fills_el = root.find(f"{{{_MAIN_NS}}}fills")
    if fills_el is not None:
        for fill in fills_el.iter(f"{{{_MAIN_NS}}}fill"):
            pat = fill.find(f"{{{_MAIN_NS}}}patternFill")
            fills.append(pat is not None and pat.get("patternType", "none") != "none")
    borders: list[bool] = []
    borders_el = root.find(f"{{{_MAIN_NS}}}borders")
    if borders_el is not None:
        for border in borders_el.iter(f"{{{_MAIN_NS}}}border"):
            sides = [border.find(f"{{{_MAIN_NS}}}{s}") for s in ("left", "right")]
            borders.append(any(s is not None and s.get("style") for s in sides))
    styled: list[bool] = []
    dates: list[bool] = []
    xfs_el = root.find(f"{{{_MAIN_NS}}}cellXfs")
    if xfs_el is not None:
        for xf in xfs_el.iter(f"{{{_MAIN_NS}}}xf"):
            fid = int(xf.get("fillId", 0))
            bid = int(xf.get("borderId", 0))
            styled.append(
                (fid < len(fills) and fills[fid])
                or (bid < len(borders) and borders[bid])
            )
            nid = int(xf.get("numFmtId", 0))
            dates.append(nid in _DATE_NUMFMT_IDS or nid in custom_date_ids)
    return styled, dates


def _serial_to_date(serial: float) -> _dt.datetime:
    """Excel 1900-system serial → datetime (openpyxl origin 1899-12-30,
    which absorbs the fictitious 1900-02-29 for serials > 60)."""
    return _dt.datetime(1899, 12, 30) + _dt.timedelta(days=serial)


def _read_sheet(
    zf: zipfile.ZipFile,
    part: str,
    shared: list[str],
    styled_xfs: list[bool],
    date_xfs: list[bool] | None = None,
) -> tuple[list[list[str]], list[list[bool]]]:
    """One worksheet → (dense 2D string grid with merged ranges unfolded,
    foreground mask: value OR styled-empty cell)."""
    date_xfs = date_xfs or []
    root = ET.fromstring(zf.read(part))
    cells: dict[tuple[int, int], str] = {}
    styled_cells: set[tuple[int, int]] = set()
    max_r = max_c = -1
    for c in root.iter(f"{{{_MAIN_NS}}}c"):
        ref = c.get("r")
        if not ref:
            continue
        r, col = _parse_ref(ref)
        val = _cell_text(c, shared)
        s = c.get("s")
        xf = int(s) if s is not None else -1
        # real Excel dates: t="n" serial + date number format →
        # openpyxl-datetime rendering (file_loader.py:110; review r4)
        if (
            val
            and c.get("t", "n") == "n"
            and 0 <= xf < len(date_xfs)
            and date_xfs[xf]
        ):
            try:
                val = _serial_to_date(float(val)).strftime("%m/%d/%Y")
            except (ValueError, OverflowError):
                pass
        cells[(r, col)] = val
        if 0 <= xf < len(styled_xfs) and styled_xfs[xf]:
            styled_cells.add((r, col))
        max_r, max_c = max(max_r, r), max(max_c, col)

    merges: list[tuple[int, int, int, int]] = []
    for mc in root.iter(f"{{{_MAIN_NS}}}mergeCell"):
        a, b = mc.get("ref").split(":")
        r0, c0 = _parse_ref(a)
        r1, c1 = _parse_ref(b)
        merges.append((r0, c0, r1, c1))
        max_r, max_c = max(max_r, r1), max(max_c, c1)

    if max_r < 0:
        return [], []
    grid = [["" for _ in range(max_c + 1)] for _ in range(max_r + 1)]
    for (r, col), val in cells.items():
        grid[r][col] = val
    # merged-cell unfolding: whole range takes the top-left value
    for r0, c0, r1, c1 in merges:
        top_left = grid[r0][c0]
        for r in range(r0, r1 + 1):
            for col in range(c0, c1 + 1):
                grid[r][col] = top_left
    fg = [
        [bool(grid[r][col]) or (r, col) in styled_cells for col in range(max_c + 1)]
        for r in range(max_r + 1)
    ]
    return grid, fg


def _label_components(
    mask: list[list[bool]],
) -> tuple[int, list[list[int]]]:
    """4-connected component labeling (scipy ndi.label default
    connectivity) — BFS, pure python; bounding boxes accumulate DURING
    the sweep (one pass; the old per-label full-grid rescan was
    O(components × cells) — review r4).  Returns (n, bboxes) with
    bboxes[lab-1] = [r0, r1, c0, c1]."""
    n_rows, n_cols = len(mask), len(mask[0]) if mask else 0
    labels = [[0] * n_cols for _ in range(n_rows)]
    bboxes: list[list[int]] = []
    nxt = 0
    for r in range(n_rows):
        for c in range(n_cols):
            if not mask[r][c] or labels[r][c]:
                continue
            nxt += 1
            bb = [r, r, c, c]
            bboxes.append(bb)
            stack = [(r, c)]
            labels[r][c] = nxt
            while stack:
                rr, cc = stack.pop()
                if rr < bb[0]:
                    bb[0] = rr
                elif rr > bb[1]:
                    bb[1] = rr
                if cc < bb[2]:
                    bb[2] = cc
                elif cc > bb[3]:
                    bb[3] = cc
                for r2, c2 in ((rr - 1, cc), (rr + 1, cc), (rr, cc - 1), (rr, cc + 1)):
                    if (
                        0 <= r2 < n_rows
                        and 0 <= c2 < n_cols
                        and mask[r2][c2]
                        and not labels[r2][c2]
                    ):
                        labels[r2][c2] = nxt
                        stack.append((r2, c2))
    return nxt, bboxes


def segment_tables(
    grid: list[list[str]], fg: list[list[bool]] | None = None
) -> list[list[list[str]]]:
    """Connected-component multi-table segmentation
    (file_loader.py:103-160): each component's bounding-box slice of the
    raw grid is a candidate table; keep those with >1 row and >1 col.
    ``fg`` overrides the foreground mask (styled-empty cells count as
    foreground, file_loader.py:121-126); default is value-only."""
    if not grid:
        return []
    mask = fg if fg is not None else [[bool(v) for v in row] for row in grid]
    _n, bboxes = _label_components(mask)
    tables = []
    for r0, r1, c0, c1 in bboxes:
        if r1 - r0 >= 1 and c1 - c0 >= 1:
            tables.append([row[c0 : c1 + 1] for row in grid[r0 : r1 + 1]])
    return tables


def excel_to_tables(payload: bytes) -> dict[str, list[list[list[str]]]]:
    """Reference `excel_to_table` surface: {"tableFromExcelSheet_<name>":
    [table, ...]} with merged-cell unfolding + CC segmentation."""
    zf = zipfile.ZipFile(io.BytesIO(payload))
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in ss.iter(f"{{{_MAIN_NS}}}si"):
            shared.append("".join(e.text or "" for e in si.iter(f"{{{_MAIN_NS}}}t")))
    styled_xfs, date_xfs = _read_styles(zf)
    out: dict[str, list[list[list[str]]]] = {}
    for name, part in _sheet_parts(zf):
        grid, fg = _read_sheet(zf, part, shared, styled_xfs, date_xfs)
        out[f"tableFromExcelSheet_{name}"] = segment_tables(grid, fg)
    return out


# ---------------------------------------------------------------------------
# minimal writer (inline strings) — round-trip support without openpyxl
# ---------------------------------------------------------------------------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    "{overrides}</Types>"
)

_SHEET_OVERRIDE = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" '
    'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_PKG_REL_NS}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)


def _esc(s: str) -> str:
    # &quot; because _esc is also used inside ATTRIBUTE values (sheet
    # name="...") — an unescaped double quote produced malformed
    # workbook.xml (review r4)
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


_STYLES_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<styleSheet xmlns="{_MAIN_NS}">'
    '<fills count="3"><fill><patternFill patternType="none"/></fill>'
    '<fill><patternFill patternType="gray125"/></fill>'
    '<fill><patternFill patternType="solid"><fgColor rgb="FFDDDDDD"/></patternFill></fill></fills>'
    '<borders count="2"><border><left/><right/><top/><bottom/></border>'
    '<border><left style="thin"/><right style="thin"/><top/><bottom/></border></borders>'
    '<cellXfs count="3"><xf fillId="0" borderId="0"/>'
    '<xf fillId="2" borderId="0" applyFill="1"/>'
    '<xf fillId="0" borderId="1" applyBorder="1"/></cellXfs>'
    "</styleSheet>"
)

_STYLES_OVERRIDE = (
    '<Override PartName="/xl/styles.xml" '
    'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
)


def tables_to_xlsx(
    sheets: dict[str, list[list]],
    merges: dict[str, list[str]] | None = None,
    styled: dict[str, list[tuple[int, int]]] | None = None,
) -> bytes:
    """{sheet name: 2D values} (+ optional {sheet: ["A1:B2", ...]} merged
    ranges) → xlsx bytes.  Strings go inline; ints/floats as numbers;
    datetimes as ISO t="d"; None/"" cells are omitted (background).

    ``styled`` marks EMPTY cells (0-based (row, col)) that carry a solid
    fill style — they serialize as valueless ``<c s="1"/>`` elements
    backed by a styles.xml, i.e. the decorative-spacer shape whose
    foreground treatment the reference defines (file_loader.py:121-126)."""
    merges = merges or {}
    styled = styled or {}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        names = list(sheets)
        overrides = "".join(_SHEET_OVERRIDE.format(i=i + 1) for i in range(len(names)))
        if styled:
            overrides += _STYLES_OVERRIDE
            zf.writestr("xl/styles.xml", _STYLES_XML)
        zf.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(overrides=overrides),
        )
        zf.writestr("_rels/.rels", _ROOT_RELS)
        sheet_tags = "".join(
            f'<sheet name="{_esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_MAIN_NS}" xmlns:r="{_REL_NS}">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rel_tags = "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        if styled:
            # OPC requires every part to be reachable via a relationship;
            # styles.xml without one is a spec-invalid package that
            # strict consumers repair/reject (review r4)
            rel_tags += (
                f'<Relationship Id="rId{len(names) + 1}" '
                'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" '
                'Target="styles.xml"/>'
            )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_PKG_REL_NS}">{rel_tags}</Relationships>',
        )
        for i, name in enumerate(names):
            styled_here = set(styled.get(name, ()))
            n_rows_sheet = len(sheets[name])
            rows_by_r: dict[int, list[str]] = {}
            for r, c in sorted(styled_here):
                if r >= n_rows_sheet or c >= len(sheets[name][r]) or not sheets[name][r][c]:
                    rows_by_r.setdefault(r, []).append(
                        f'<c r="{_idx_to_col(c)}{r + 1}" s="1"/>'
                    )
            rows_xml = []
            for r, row in enumerate(sheets[name]):
                cells_xml = rows_by_r.pop(r, [])
                for c, val in enumerate(row):
                    if val is None or val == "":
                        continue
                    ref = f"{_idx_to_col(c)}{r + 1}"
                    if isinstance(val, bool):
                        cells_xml.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
                    elif isinstance(val, (int, float)):
                        cells_xml.append(f'<c r="{ref}"><v>{val}</v></c>')
                    elif isinstance(val, (_dt.datetime, _dt.date)):
                        cells_xml.append(
                            f'<c r="{ref}" t="d"><v>{val.isoformat()}</v></c>'
                        )
                    else:
                        cells_xml.append(
                            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                            f"{_esc(str(val))}</t></is></c>"
                        )
                if cells_xml:
                    rows_xml.append(f'<row r="{r + 1}">{"".join(cells_xml)}</row>')
            for r in sorted(rows_by_r):  # styled rows beyond the value grid
                rows_xml.append(f'<row r="{r + 1}">{"".join(rows_by_r[r])}</row>')
            merge_xml = ""
            if merges.get(name):
                refs = "".join(f'<mergeCell ref="{m}"/>' for m in merges[name])
                merge_xml = (
                    f'<mergeCells count="{len(merges[name])}">{refs}</mergeCells>'
                )
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<worksheet xmlns="{_MAIN_NS}">'
                f'<sheetData>{"".join(rows_xml)}</sheetData>{merge_xml}</worksheet>',
            )
    return buf.getvalue()
