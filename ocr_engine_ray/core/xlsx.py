"""Minimal XLSX writer on the stdlib (zipfile + XML) — no openpyxl.

An .xlsx file is a ZIP of XML parts (ECMA-376 / ISO 29500
SpreadsheetML, public).  This writer produces the subset the
reference's Excel export uses (``app/utils/exporter.py:99-119``): one
sheet, a styled (bold) header row, auto column widths =
``max cell text length + 2``, strings as inline strings and integers as
numeric cells.  Enough for any conformant reader; deliberately not a
general-purpose library.
"""

from __future__ import annotations

import math
import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
    "</Relationships>"
)

# style 0 = default, style 1 = bold (header row)
_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    '<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>'
    '<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>'
    '<fills count="1"><fill><patternFill patternType="none"/></fill></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="2"><xf xfId="0" fontId="0"/>'
    '<xf xfId="0" fontId="1" applyFont="1"/></cellXfs>'
    "</styleSheet>"
)


def _col_letter(idx: int) -> str:
    """0-based column index → A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value, style: int) -> str:
    s = f' s="{style}"' if style else ""
    if isinstance(value, bool):
        return f'<c r="{ref}"{s} t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        # non-finite floats have no numeric SpreadsheetML representation
        # (<v>nan</v> makes Excel reject the file) → empty cell
        if isinstance(value, float) and not math.isfinite(value):
            return f'<c r="{ref}"{s}/>'
        return f'<c r="{ref}"{s}><v>{value}</v></c>'
    text = escape("" if value is None else str(value))
    return f'<c r="{ref}"{s} t="inlineStr"><is><t>{text}</t></is></c>'


def write_xlsx(path: str, columns: list[str], rows: list[list],
               sheet_name: str = "Invoices") -> None:
    """Write ``rows`` (lists aligned with ``columns``) to one sheet with
    a bold header and reference-style auto column widths."""
    widths = [len(str(c)) for c in columns]
    for row in rows:
        for i, v in enumerate(row):
            n = len(str(v)) if v is not None else 0
            if n > widths[i]:
                widths[i] = n
    cols_xml = "".join(
        f'<col min="{i + 1}" max="{i + 1}" width="{w + 2}" customWidth="1"/>'
        for i, w in enumerate(widths))
    body = ['<row r="1">']
    body += [_cell_xml(f"{_col_letter(i)}1", c, 1) for i, c in enumerate(columns)]
    body.append("</row>")
    for rix, row in enumerate(rows, start=2):
        body.append(f'<row r="{rix}">')
        body += [_cell_xml(f"{_col_letter(i)}{rix}", v, 0)
                 for i, v in enumerate(row)]
        body.append("</row>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<cols>{cols_xml}</cols><sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name, {chr(34): "&quot;"})}"'
        ' sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/styles.xml", _STYLES)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
