"""Minimal .xlsx codec on the stdlib (zipfile + xml.etree) — no openpyxl.

An .xlsx file is a zip of SpreadsheetML XML parts. This module reads
and writes the subset an ETL connector needs: one sheet, a header row,
inline or shared strings, numeric/boolean cells. It exists so the
``excel://`` connector (reference
``excel/.../ExcelFileDataFrameSource.scala:9-38``) works even where no
Excel engine is installed; when pandas+openpyxl are present the
connector prefers them.

Excel is inherently a small-data, single-file format (the reference
even forces ``repartition(1)`` on write, ``:23``) — so the codec is
driver-side by design and the connector documents that boundary.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

_CONTENT_TYPES = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="{_REL_NS}/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="{_NS}" xmlns:r="{_REL_NS}">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="{_REL_NS}/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    """0-based column index → A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(ref: str) -> int:
    """Cell reference (e.g. 'BC12') → 0-based column index."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def write_xlsx(path: str, columns: list[str], rows) -> None:
    """Write one sheet: header row + data rows. Strings go inline (no
    sharedStrings part needed), int/float as numbers, bool as booleans,
    None as blank.

    ``rows`` may be any iterable of tuples and is consumed ONCE,
    streamed row-by-row into the zip member — peak memory is one row,
    not the sheet, so the Excel sink can feed ``toLocalIterator()``
    without collecting the frame."""

    def cell(r: int, c: int, v) -> str:
        ref = f"{_col_letter(c)}{r}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return (
            f'<c r="{ref}" t="inlineStr"><is>'
            f'<t xml:space="preserve">{escape(str(v))}</t></is></c>'
        )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        with z.open("xl/worksheets/sheet1.xml", "w") as sheet:
            def emit(s: str) -> None:
                sheet.write(s.encode("utf-8"))

            emit('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>')
            emit(f'<worksheet xmlns="{_NS}"><sheetData>')
            emit(
                '<row r="1">'
                + "".join(cell(1, c, name) for c, name in enumerate(columns))
                + "</row>"
            )
            for i, row in enumerate(rows, start=2):
                emit(
                    f'<row r="{i}">'
                    + "".join(cell(i, c, v) for c, v in enumerate(row))
                    + "</row>"
                )
            emit("</sheetData></worksheet>")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def read_xlsx(path: str) -> tuple[list[str], list[list]]:
    """First sheet → (header, rows). Handles inline, shared, and
    formula-cached strings, numbers, booleans; blank cells → None.
    Numbers come back as int when integral, else float."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root:
                # concatenate all <t> descendants (rich text runs)
                shared.append(
                    "".join(t.text or "" for t in si.iter() if _local(t.tag) == "t")
                )
        sheet_name = next(
            n for n in z.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        root = ET.fromstring(z.read(sheet_name))

    raw_rows: list[dict[int, object]] = []
    for row_el in root.iter():
        if _local(row_el.tag) != "row":
            continue
        cells: dict[int, object] = {}
        for c_el in row_el:
            if _local(c_el.tag) != "c":
                continue
            ref = c_el.get("r")
            idx = _col_index(ref) if ref else len(cells)
            ctype = c_el.get("t", "n")
            v_el = next((e for e in c_el if _local(e.tag) == "v"), None)
            is_el = next((e for e in c_el if _local(e.tag) == "is"), None)
            if ctype == "inlineStr" and is_el is not None:
                cells[idx] = "".join(
                    t.text or "" for t in is_el.iter() if _local(t.tag) == "t"
                )
            elif v_el is None or v_el.text is None:
                cells[idx] = None
            elif ctype == "s":
                cells[idx] = shared[int(v_el.text)]
            elif ctype == "b":
                cells[idx] = v_el.text == "1"
            elif ctype == "str":
                cells[idx] = v_el.text
            else:
                num = float(v_el.text)
                cells[idx] = int(num) if num.is_integer() else num
        raw_rows.append(cells)

    if not raw_rows:
        return [], []
    width = max((max(r) + 1 for r in raw_rows if r), default=0)
    grid = [[r.get(i) for i in range(width)] for r in raw_rows]
    header = [str(h) if h is not None else f"_c{i}" for i, h in enumerate(grid[0])]
    return header, grid[1:]
