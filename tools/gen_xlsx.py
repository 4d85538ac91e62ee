#!/usr/bin/env python3
"""Build the committed XLSX statement corpus (dev-side, run once).

Writes every plain statement under data/statements as a minimal OOXML
workbook (ZIP of XML parts: content types, rels, workbook, sheet1,
sharedStrings) at data/statements_xlsx/<date>/<name>.xlsx — column A
holds the statement line as a shared string, column B its length as a
native numeric cell (so the committed corpus exercises both cell
kinds) — plus one non-ZIP damaged file, and the expected-text sidecar
parquet the DuckDB oracle reads.

Independence: this writer shares no code with the Scala reader
(graft.sources.XlsxCodec), and the sidecar content is derived from the
SOURCE .txt, so reader bugs can't self-confirm. Deterministic output
(fixed ZIP timestamps, fixed ordering) so the corpus commits cleanly.
"""
import os, sys, glob, zipfile

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "data", "statements")
DST = os.path.join(ROOT, "data", "statements_xlsx")

CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>
"""
ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>
"""
WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>
"""
WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>
"""


def esc(s):
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def build_xlsx(lines):
    shared, sidx = [], {}

    def sid(s):
        if s not in sidx:
            sidx[s] = len(shared)
            shared.append(s)
        return sidx[s]

    rows = []
    for i, ln in enumerate(lines, start=1):
        a = f'<c r="A{i}" t="s"><v>{sid(ln)}</v></c>'
        b = f'<c r="B{i}"><v>{len(ln)}</v></c>'
        rows.append(f'<row r="{i}">{a}{b}</row>')
    sheet = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
             '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
             '<sheetData>' + "".join(rows) + "</sheetData></worksheet>\n")
    sst = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
           f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
           f'count="{len(shared)}" uniqueCount="{len(shared)}">'
           + "".join(f"<si><t>{esc(s)}</t></si>" for s in shared) + "</sst>\n")

    import io
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, body in [
            ("[Content_Types].xml", CONTENT_TYPES), ("_rels/.rels", ROOT_RELS),
            ("xl/workbook.xml", WORKBOOK), ("xl/_rels/workbook.xml.rels", WB_RELS),
            ("xl/worksheets/sheet1.xml", sheet), ("xl/sharedStrings.xml", sst),
        ]:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, body)
    return buf.getvalue()


def main():
    rows = []
    srcs = sorted(glob.glob(os.path.join(SRC, "*", "*.txt")))
    if not srcs:
        sys.exit("no source statements found")
    for path in srcs:
        date = os.path.basename(os.path.dirname(path))
        name = os.path.splitext(os.path.basename(path))[0] + ".xlsx"
        text = open(path, encoding="utf-8").read()
        lines = text.split("\n")
        if lines and lines[-1] == "":
            lines = lines[:-1]
        os.makedirs(os.path.join(DST, date), exist_ok=True)
        with open(os.path.join(DST, date, name), "wb") as f:
            f.write(build_xlsx(lines))
        # reader contract: one line per sheet row, '\n' after each
        rows.append((name, date, "\n".join(lines) + "\n", True))

    dates = sorted({os.path.basename(os.path.dirname(p)) for p in srcs})
    bad = f"notzip_{dates[0]}.xlsx"
    with open(os.path.join(DST, dates[0], bad), "wb") as f:
        f.write(b"this is not a zip archive\n")
    rows.append((bad, dates[0], "", False))

    rows.sort()
    table = pa.table({
        "file_name": pa.array([r[0] for r in rows], pa.string()),
        "batch_date": pa.array([r[1] for r in rows], pa.string()),
        "content": pa.array([r[2] for r in rows], pa.string()),
        "xlsx_ok": pa.array([r[3] for r in rows], pa.bool_()),
    })
    pq.write_table(table, os.path.join(DST, "expected.parquet"))
    print(f"wrote {len(rows)} rows -> {DST}")


if __name__ == "__main__":
    main()
