"""SNK7: Excel workbook sink, dependency-free.

The reference writes per-team xlsx files plus a combined workbook with one
sheet per table (get_basketball_stats_all_teams_Version6.py:5-10,200-210).
No Excel library ships in this environment, so this writes the XLSX
container directly — an .xlsx file is a zip of a fixed set of XML parts,
and inline-string worksheets need nothing beyond ``zipfile`` + manual XML.

Scale posture: an Excel workbook is a driver-side artifact by nature (the
reference emits small per-team summary tables). ``write_xlsx`` therefore
takes bounded DataFrames and collects them — callers cap rows the same way
the reference's summary exports do. Large results belong in the parquet /
partitioned-JSON sinks (SNK1-SNK6); this sink exists for report-shaped
output parity.
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

_MAX_ROWS = 100_000  # hard cap: refuse to build report artifacts beyond this

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _col_ref(idx: int) -> str:
    """0-based column index → A1-style column letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _sheet_xml(header: list[str], rows: list[tuple]) -> str:
    def cell(r: int, c: int, v: object) -> str:
        ref = f"{_col_ref(c)}{r + 1}"
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)) and v == v:  # NaN-safe numeric
            return f'<c r="{ref}"><v>{v}</v></c>'
        if v is None:
            return f'<c r="{ref}"/>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    all_rows = [tuple(header), *rows]
    body = "".join(
        f'<row r="{r + 1}">' + "".join(cell(r, c, v) for c, v in enumerate(vals)) + "</row>"
        for r, vals in enumerate(all_rows)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{body}</sheetData></worksheet>"
    )


def write_xlsx(sheets: dict[str, DataFrame], path: str) -> dict[str, int]:
    """Write ``{sheet_name: df}`` as one workbook (SNK7's combined mode;
    pass a single entry for the per-table mode). Returns rows per sheet —
    the sink's manifest, mirroring SNK6 discipline. Each DataFrame is
    collected (bounded, report-shaped output); a sheet exceeding _MAX_ROWS
    raises rather than silently building a driver-memory bomb.
    """
    if not sheets:
        raise ValueError("write_xlsx requires at least one sheet")
    counts: dict[str, int] = {}
    sheet_entries, rel_entries, overrides = [], [], []
    payloads: list[tuple[str, str]] = []
    for i, (name, df) in enumerate(sheets.items(), start=1):
        rows = df.limit(_MAX_ROWS + 1).collect()
        if len(rows) > _MAX_ROWS:
            raise ValueError(f"sheet {name!r} exceeds {_MAX_ROWS} rows; use a distributed sink")
        counts[name] = len(rows)
        safe = escape(name[:31])  # Excel's sheet-name limit
        sheet_entries.append(f'<sheet name="{safe}" sheetId="{i}" r:id="rId{i}"/>')
        rel_entries.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
        )
        overrides.append(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        )
        payloads.append(
            (f"xl/worksheets/sheet{i}.xml", _sheet_xml(df.columns, [tuple(r) for r in rows]))
        )

    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{''.join(sheet_entries)}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{''.join(rel_entries)}</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides="".join(overrides)))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for part, xml in payloads:
            zf.writestr(part, xml)
    return counts


def read_xlsx(path: str) -> dict[str, tuple[list[str], list[list[str | None]]]]:
    """Re-open a workbook written by ``write_xlsx``: {sheet_name: (header,
    rows)} with every cell as its string form (numeric <v> text, inline
    string text, bool "0"/"1"; empty cell → None). Driver-side by nature —
    the sink's artifacts are bounded report files, and the reader exists so
    the round-trip can be oracle-verified."""
    from xml.etree import ElementTree as ET

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    rns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    out: dict[str, tuple[list[str], list[list[str | None]]]] = {}
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        target_by_rid = {
            rel.get("Id"): rel.get("Target") for rel in rels.iter(f"{rns}Relationship")
        }
        rid_attr = (
            "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
        )
        for sheet in wb.iter(f"{ns}sheet"):
            name = sheet.get("name")
            part = "xl/" + target_by_rid[sheet.get(rid_attr)]
            grid: list[list[str | None]] = []
            for row in ET.fromstring(zf.read(part)).iter(f"{ns}row"):
                cells: list[str | None] = []
                for c in row.iter(f"{ns}c"):
                    if c.get("t") == "inlineStr":
                        cells.append(c.findtext(f"{ns}is/{ns}t"))
                    else:
                        cells.append(c.findtext(f"{ns}v"))
                grid.append(cells)
            header = [h or "" for h in grid[0]] if grid else []
            out[name] = (header, grid[1:])
    return out
