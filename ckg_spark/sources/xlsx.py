"""Minimal stdlib XLSX reader — the fallback engine behind
:func:`ckg_spark.sources.readers.read_excel` when ``openpyxl`` is absent
(VERDICT r02 #6: S2 must actually execute in environments without the
optional dependency).

Implements exactly the subset the reference's workbook ingestion needs
(builder_utils.py:65 ``pd.read_excel`` over dimension-sized clinical /
experiment-design sheets): worksheet selection by index or name, shared
strings, inline strings, numeric / boolean / formula-string cells, and
sparse rows (missing cells become None). An ``.xlsx`` file is a zip of
XML parts — ``zipfile`` + ``xml.etree`` are the whole dependency
surface. Not implemented (loudly, not silently): date formatting
(raw serial numbers come through as floats, matching openpyxl for
unformatted cells) and legacy ``.xls`` (BIFF) — raise upstream.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'B'->1, ... 'AA'->26 (cell refs like 'BC12')."""
    m = _CELL_REF.match(ref)
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - ord("A") + 1)
    return col - 1


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip_member_path)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {}
    for rel in rels.iter(f"{_PKG_REL_NS}Relationship"):
        t = rel.get("Target")
        target_by_rid[rel.get("Id")] = (
            t.lstrip("/") if t.startswith("/") else f"xl/{t}"
        )
    out = []
    for sh in wb.iter(f"{_MAIN_NS}sheet"):
        rid = sh.get(f"{_REL_NS}id")
        out.append((sh.get("name"), target_by_rid[rid]))
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    strings = []
    for si in root.iter(f"{_MAIN_NS}si"):
        # plain <t> or rich-text runs <r><t>; join all text nodes
        strings.append("".join(t.text or "" for t in si.iter(f"{_MAIN_NS}t")))
    return strings


def _cell_value(cell: ET.Element, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{_MAIN_NS}is")
        if is_el is None:
            return None
        return "".join(t.text or "" for t in is_el.iter(f"{_MAIN_NS}t"))
    v = cell.find(f"{_MAIN_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text == "1"
    # numeric: integral floats come back as int (openpyxl behavior)
    num = float(v.text)
    return int(num) if num.is_integer() else num


def read_xlsx_rows(
    path: str, sheet_name: str | int = 0
) -> list[list]:
    """Parse one worksheet into a dense list of rows (row-major, ragged
    rows right-padded with None to the max seen width; fully empty
    trailing cells of a row are preserved only up to that width)."""
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_targets(zf)
        if isinstance(sheet_name, int):
            if sheet_name >= len(sheets):
                raise ValueError(
                    f"sheet index {sheet_name} out of range "
                    f"({len(sheets)} sheets)"
                )
            target = sheets[sheet_name][1]
        else:
            by_name = dict(sheets)
            if sheet_name not in by_name:
                raise ValueError(
                    f"sheet {sheet_name!r} not found; have "
                    f"{[n for n, _ in sheets]}"
                )
            target = by_name[sheet_name]
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(target))
        rows: dict[int, dict[int, object]] = {}
        for row in root.iter(f"{_MAIN_NS}row"):
            for cell in row.iter(f"{_MAIN_NS}c"):
                ref = cell.get("r")
                if ref is None:
                    # c/@r is optional in OOXML (position then follows
                    # sequentially) — some streaming writers omit it;
                    # skipping would silently DROP data, so refuse
                    raise NotImplementedError(
                        "xlsx subset: cell without r= reference "
                        "(sequential-position cells) — install openpyxl "
                        "for this workbook"
                    )
                ridx = int(_CELL_REF.match(ref).group(2)) - 1
                rows.setdefault(ridx, {})[_col_index(ref)] = _cell_value(
                    cell, shared
                )
    if not rows:
        return []
    width = max(max(cols) for cols in rows.values()) + 1
    out = []
    for ridx in range(max(rows) + 1):
        cols = rows.get(ridx, {})
        out.append([cols.get(c) for c in range(width)])
    return out
