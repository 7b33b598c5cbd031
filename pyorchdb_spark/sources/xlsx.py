"""Minimal .xlsx source — stdlib-only (zipfile + ElementTree).

The reference ingests raw blobs matching ``\\w+\\.(xlsx|csv)``
(PyOrchDB/main.py:137-139) via pandas/openpyxl; this sandbox has no
openpyxl, so this module parses the OOXML container directly — an .xlsx
file is a zip holding sheet XML plus a shared-string table. Scope is the
reference's use case: simple tabular sheets (header row + cells), not
formulas/styles/merged ranges.

Scale note: spreadsheets are inherently small driver-side inputs (the
reference treats them as raw CSV-equivalents); the parse happens on the
driver and becomes a DataFrame immediately — the distributed path starts
at the DataFrame, exactly like spark.read.csv on a single small file.
Large tabular data belongs in parquet (sources/lake.py).
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {"r": "http://schemas.openxmlformats.org/package/2006/relationships"}
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        data = z.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).findall("m:si", _NS):
        # plain <t> or rich-text runs <r><t>
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _sheet_path(z: zipfile.ZipFile, sheet: str | None) -> str:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    targets = {rel.get("Id"): rel.get("Target") for rel in rels.findall("r:Relationship", _REL_NS)}
    for sh in wb.find("m:sheets", _NS).findall("m:sheet", _NS):
        if sheet is None or sh.get("name") == sheet:
            target = targets[sh.get(_RID)]
            return target if target.startswith("xl/") else f"xl/{target}"
    raise ValueError(f"sheet {sheet!r} not found")


def read_xlsx_rows(path: str, sheet: str | None = None) -> list[list[str | None]]:
    """Parse one sheet into rows of cell strings (None = empty cell)."""
    with zipfile.ZipFile(path) as z:
        strings = _shared_strings(z)
        root = ET.fromstring(z.read(_sheet_path(z, sheet)))
        rows: list[list[str | None]] = []
        for row in root.iter(f"{{{_NS['m']}}}row"):
            cells: list[str | None] = []
            for c in row.findall("m:c", _NS):
                idx = _col_index(c.get("r", "A1"))
                while len(cells) < idx:
                    cells.append(None)
                t = c.get("t")
                if t == "inlineStr":
                    is_el = c.find("m:is", _NS)
                    val = "".join(x.text or "" for x in is_el.iter(f"{{{_NS['m']}}}t")) if is_el is not None else None
                else:
                    v = c.find("m:v", _NS)
                    val = None if v is None or v.text is None else v.text
                    if t == "s" and val is not None:
                        val = strings[int(val)]
                cells.append(val)
            rows.append(cells)
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def read_xlsx(
    spark: SparkSession, path: str, sheet: str | None = None, header: bool = True
) -> DataFrame:
    """.xlsx sheet -> DataFrame of strings (caller re-infers types, e.g.
    operators.curate.coerce_inferable_types — the reference's dtype
    re-inference, tools.py:108-109)."""
    rows = read_xlsx_rows(path, sheet)
    if not rows:
        return spark.createDataFrame([], "value string")
    if header:
        names = [c if c not in (None, "") else f"col_{i}" for i, c in enumerate(rows[0])]
        data = rows[1:]
    else:
        names = [f"col_{i}" for i in range(len(rows[0]))]
        data = rows
    schema = ", ".join(f"`{n}` string" for n in names)
    return spark.createDataFrame([tuple(r) for r in data], schema)


def write_xlsx(path: str, columns: list[str], rows: list[tuple]) -> None:
    """Tiny writer (tests/fixtures only): one inline-string sheet."""
    def esc(v) -> str:
        s = "" if v is None else str(v)
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    def row_xml(rno: int, vals) -> str:
        cells = []
        for i, v in enumerate(vals):
            if v is None:
                continue
            ref = ""
            n = i + 1
            while n:
                n, r = divmod(n - 1, 26)
                ref = chr(ord("A") + r) + ref
            cells.append(f'<c r="{ref}{rno}" t="inlineStr"><is><t>{esc(v)}</t></is></c>')
        return f'<row r="{rno}">{"".join(cells)}</row>'

    sheet_rows = [row_xml(1, columns)] + [row_xml(i + 2, r) for i, r in enumerate(rows)]
    ns = _NS["m"]
    sheet = f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>{"".join(sheet_rows)}</sheetData></worksheet>'
    workbook = (
        f'<?xml version="1.0"?><workbook xmlns="{ns}" '
        'xmlns:rel="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" rel:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
