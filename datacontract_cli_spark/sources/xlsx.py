"""Minimal stdlib .xlsx reader — just enough of ECMA-376 SpreadsheetML for
the Excel contract-template importer (openpyxl is absent from this image):
sheet list, defined names (workbook- and sheet-scoped), and cell values
(shared strings, inline strings, numbers, booleans).

Zip entries read: xl/workbook.xml (sheets + definedNames),
xl/_rels/workbook.xml.rels (sheet rId -> part), xl/sharedStrings.xml,
xl/worksheets/*.xml.
"""

from __future__ import annotations

import re
import zipfile
from typing import Dict, List, Optional, Tuple
from xml.etree import ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {"r": "http://schemas.openxmlformats.org/package/2006/relationships"}
_RID_ATTR = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
             "relationships}id")


def _col_to_idx(col: str) -> int:
    """'A' -> 1, 'AB' -> 28."""
    n = 0
    for ch in col:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n


_CELL_REF = re.compile(r"^\$?([A-Z]+)\$?([0-9]+)$")


def parse_cell_ref(ref: str) -> Tuple[int, int]:
    """'$B$4' / 'B4' -> (row, col), 1-based."""
    m = _CELL_REF.match(ref)
    if not m:
        raise ValueError(f"bad cell reference: {ref}")
    return int(m.group(2)), _col_to_idx(m.group(1))


def parse_defined_ref(text: str) -> Tuple[str, str]:
    """A definedName value like ``'Schema x'!$B$4`` or ``Servers!$A$10:$C$20``
    -> (sheet name, range text)."""
    sheet, _, rng = text.rpartition("!")
    sheet = sheet.strip()
    if sheet.startswith("'") and sheet.endswith("'"):
        sheet = sheet[1:-1].replace("''", "'")
    return sheet, rng.strip()


class Sheet:
    def __init__(self, cells: Dict[Tuple[int, int], object]):
        self.cells = cells

    def value(self, row: int, col: int):
        return self.cells.get((row, col))

    @property
    def max_row(self) -> int:
        return max((r for r, _ in self.cells), default=0)


class XlsxWorkbook:
    def __init__(self, path: str):
        with zipfile.ZipFile(path) as z:
            wb = ET.fromstring(z.read("xl/workbook.xml"))
            rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
            rid_to_target = {
                rel.get("Id"): rel.get("Target")
                for rel in rels.findall("r:Relationship", _REL_NS)
            }
            shared: List[str] = []
            if "xl/sharedStrings.xml" in z.namelist():
                ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
                for si in ss.findall("m:si", _NS):
                    shared.append("".join(t.text or "" for t in si.iter(
                        "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t")))

            self.sheetnames: List[str] = []
            self._sheets: Dict[str, Sheet] = {}
            sheet_elems = wb.find("m:sheets", _NS)
            for sh in sheet_elems.findall("m:sheet", _NS):
                name = sh.get("name")
                target = rid_to_target.get(sh.get(_RID_ATTR), "")
                part = "xl/" + target.lstrip("/") if not target.startswith("xl/") else target
                part = part.replace("xl/xl/", "xl/")
                self.sheetnames.append(name)
                self._sheets[name] = self._read_sheet(z, part, shared)

            # defined names: (name, scope sheet or None) -> raw ref text
            self.defined_names: Dict[Tuple[str, Optional[str]], str] = {}
            dn = wb.find("m:definedNames", _NS)
            if dn is not None:
                for d in dn.findall("m:definedName", _NS):
                    scope = d.get("localSheetId")
                    scope_name = (self.sheetnames[int(scope)]
                                  if scope is not None else None)
                    self.defined_names[(d.get("name"), scope_name)] = d.text or ""

    def _read_sheet(self, z: zipfile.ZipFile, part: str,
                    shared: List[str]) -> Sheet:
        cells: Dict[Tuple[int, int], object] = {}
        root = ET.fromstring(z.read(part))
        for c in root.iter("{http://schemas.openxmlformats.org/spreadsheetml/2006/main}c"):
            ref = c.get("r")
            if not ref:
                continue
            row, col = parse_cell_ref(ref)
            ctype = c.get("t", "n")
            v = c.find("m:v", _NS)
            if ctype == "s" and v is not None and v.text is not None:
                cells[(row, col)] = shared[int(v.text)]
            elif ctype == "inlineStr":
                is_el = c.find("m:is", _NS)
                if is_el is not None:
                    cells[(row, col)] = "".join(
                        t.text or "" for t in is_el.iter(
                            "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"))
            elif ctype == "b" and v is not None and v.text is not None:
                cells[(row, col)] = v.text.strip() == "1"
            elif v is not None and v.text is not None:
                text = v.text.strip()
                if ctype == "str":
                    cells[(row, col)] = text
                else:
                    try:
                        num = float(text)
                        cells[(row, col)] = int(num) if num.is_integer() else num
                    except ValueError:
                        cells[(row, col)] = text
        return Sheet(cells)

    # ------------------------------------------------------------------
    def sheet(self, name: str) -> Optional[Sheet]:
        return self._sheets.get(name)

    def _lookup(self, name: str, scope: Optional[str]) -> Optional[Tuple[str, str]]:
        raw = self.defined_names.get((name, scope))
        if raw is None and scope is not None:
            raw = self.defined_names.get((name, None))
            if raw is not None:
                ref_sheet, _ = parse_defined_ref(raw)
                if ref_sheet != scope:
                    return None
        if raw is None:
            return None
        return parse_defined_ref(raw)

    def cell_by_name(self, name: str,
                     scope: Optional[str] = None) -> Optional[Tuple[str, int, int]]:
        """(sheet, row, col) of a single-cell defined name."""
        found = self._lookup(name, scope)
        if found is None:
            return None
        sheet, rng = found
        ref = rng.split(":")[0]
        try:
            row, col = parse_cell_ref(ref)
        except ValueError:
            return None
        return sheet, row, col

    def value_by_name(self, name: str, scope: Optional[str] = None):
        cell = self.cell_by_name(name, scope)
        if cell is None:
            return None
        sheet, row, col = cell
        sh = self._sheets.get(sheet)
        return sh.value(row, col) if sh else None

    def range_rows_by_name(self, name: str,
                           scope: Optional[str] = None) -> Optional[Tuple[str, int, int]]:
        """(sheet, start_row, end_row) of a (possibly multi-row) range."""
        found = self._lookup(name, scope)
        if found is None:
            return None
        sheet, rng = found
        parts = rng.split(":")
        rows = []
        for p in parts:
            m = _CELL_REF.match(p)
            if m:
                rows.append(int(m.group(2)))
            else:  # whole-row reference like $10
                digits = re.sub(r"[^0-9]", "", p)
                if digits:
                    rows.append(int(digits))
        if not rows:
            return None
        return sheet, min(rows), max(rows)
