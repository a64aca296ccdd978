"""Minimal self-contained xlsx writer/reader (stdlib zipfile + XML only).

The reference exports per-image detection tables and the class-wise metrics
report as .xlsx via pandas/openpyxl (`Detect_OBB.py:326-330`, `:682-685`).
openpyxl is not available in this image, so this module implements the tiny
subset of OOXML needed: one sheet, inline strings, numbers. The 11-column
schema `Class,X1,Y1,X2,Y2,X3,Y3,X4,Y4,Confidence,Angle` is part of the
public surface and is preserved exactly.
"""

from __future__ import annotations

import re
import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, str):
        return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(value)}</t></is></c>")
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    return f'<c r="{ref}"><v>{value!r}</v></c>'


def write_xlsx(path: str, rows: list, header: list | None = None) -> None:
    """Write rows (lists of str/num) to a single-sheet xlsx file."""
    all_rows = ([header] + [list(r) for r in rows]) if header is not None \
        else [list(r) for r in rows]
    body = []
    for ri, row in enumerate(all_rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(ci)}{ri}", v)
            for ci, v in enumerate(row))
        body.append(f'<row r="{ri}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(body) + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def read_xlsx(path: str) -> list:
    """Read the first sheet of an xlsx into a list of row lists.

    Understands inline strings, shared strings and numbers — enough to parse
    both our own output and the reference's committed golden `Output/*.xlsx`.
    """
    import xml.etree.ElementTree as ET

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        shared = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", ns):
                shared.append("".join(t.text or ""
                                      for t in si.iter(
                                          "{%s}t" % ns["m"])))
        sheet_names = sorted(n for n in z.namelist()
                             if re.match(r"xl/worksheets/sheet\d+\.xml", n))
        root = ET.fromstring(z.read(sheet_names[0]))
        rows = []
        for row in root.iter("{%s}row" % ns["m"]):
            vals = []
            for c in row.findall("m:c", ns):
                t = c.get("t")
                if t == "inlineStr":
                    is_el = c.find("m:is", ns)
                    vals.append("".join(
                        el.text or "" for el in is_el.iter(
                            "{%s}t" % ns["m"])))
                else:
                    v = c.find("m:v", ns)
                    if v is None:
                        vals.append(None)
                    elif t == "s":
                        vals.append(shared[int(v.text)])
                    elif t == "str":
                        vals.append(v.text)
                    else:
                        try:
                            f = float(v.text)
                            vals.append(int(f) if f.is_integer() else f)
                        except ValueError:
                            vals.append(v.text)
            rows.append(vals)
        return rows
