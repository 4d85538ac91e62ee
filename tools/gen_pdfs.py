#!/usr/bin/env python3
"""Build the committed real-PDF statement corpus (dev-side, run once).

Wraps every plain statement under data/statements into a MINIMAL REAL
PDF 1.4 (header, catalog/pages/page objects, a content stream with one
text-showing op per statement line, xref table, trailer) at
data/statements_real/<date>/<name>.pdf, plus two deliberately-damaged
files (bad magic, corrupted Flate payload), and an expected-text
sidecar parquet the DuckDB oracle reads.

The sidecar is derived from the SOURCE .txt, never from the Scala
codec, so codec and oracle stay independent. Deterministic output —
no timestamps, fixed ordering — so the corpus commits cleanly.

String-form / filter coverage is keyed off the file index so the
committed corpus exercises every decoder path: FlateDecode vs
uncompressed, literal vs hex strings, and TJ segment arrays vs Tj.
"""
import os, sys, zlib, glob

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "data", "statements")
DST = os.path.join(ROOT, "data", "statements_real")


def pdf_escape(b: bytes) -> bytes:
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def content_stream(text: str, mode: int) -> bytes:
    """One text-showing op per line; mode picks the string form."""
    lines = text.split("\n")
    if lines and lines[-1] == "":   # trailing newline -> not an extra op
        lines = lines[:-1]
    ops = [b"BT", b"/F1 10 Tf", b"72 760 Td"]
    for i, ln in enumerate(lines):
        raw = ln.encode("utf-8")
        if i > 0:
            ops.append(b"0 -12 Td")
        if mode == 1:               # hex strings
            ops.append(b"<" + raw.hex().encode() + b"> Tj")
        elif mode == 2 and len(raw) > 4:  # TJ with kerned segments
            mid = len(raw) // 2
            ops.append(b"[(" + pdf_escape(raw[:mid]) + b") -40 ("
                       + pdf_escape(raw[mid:]) + b")] TJ")
        else:                       # literal Tj
            ops.append(b"(" + pdf_escape(raw) + b") Tj")
    ops.append(b"ET")
    return b"\n".join(ops) + b"\n"


def build_pdf(text: str, mode: int, compress: bool) -> bytes:
    content = content_stream(text, mode)
    payload = zlib.compress(content, 6) if compress else content
    filt = b"/Filter /FlateDecode " if compress else b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length " + str(len(payload)).encode() + b" >>\n"
        b"stream\n" + payload + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += ("%010d 00000 n \n" % off).encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)


def main():
    rows = []
    srcs = sorted(glob.glob(os.path.join(SRC, "*", "*.txt")))
    if not srcs:
        sys.exit("no source statements found")
    for idx, path in enumerate(srcs):
        date = os.path.basename(os.path.dirname(path))
        name = os.path.splitext(os.path.basename(path))[0] + ".pdf"
        text = open(path, encoding="utf-8").read()
        mode, compress = idx % 3, (idx % 2 == 0)
        os.makedirs(os.path.join(DST, date), exist_ok=True)
        with open(os.path.join(DST, date, name), "wb") as f:
            f.write(build_pdf(text, mode, compress))
        # expected text: decoder emits one line per showing op
        exp = text if text.endswith("\n") else text + "\n"
        rows.append((name, date, exp, True))

    # damaged twins: bad magic (not a PDF at all) and corrupted Flate
    dates = sorted({os.path.basename(os.path.dirname(p)) for p in srcs})
    bad_magic_date, bad_zlib_date = dates[0], dates[-1]
    with open(os.path.join(DST, bad_magic_date, f"notpdf_{bad_magic_date}.pdf"), "wb") as f:
        f.write(b"GIF89a not a pdf at all\n")
    rows.append((f"notpdf_{bad_magic_date}.pdf", bad_magic_date, "", False))
    good = build_pdf("x\n", 0, True)
    marker = good.index(b"stream\n") + len(b"stream\n")
    broken = good[:marker] + b"\xff\xfe\xfd" + good[marker + 3:]
    with open(os.path.join(DST, bad_zlib_date, f"badzlib_{bad_zlib_date}.pdf"), "wb") as f:
        f.write(broken)
    rows.append((f"badzlib_{bad_zlib_date}.pdf", bad_zlib_date, "", True))

    rows.sort()
    table = pa.table({
        "file_name": pa.array([r[0] for r in rows], pa.string()),
        "batch_date": pa.array([r[1] for r in rows], pa.string()),
        "content": pa.array([r[2] for r in rows], pa.string()),
        "pdf_ok": pa.array([r[3] for r in rows], pa.bool_()),
    })
    pq.write_table(table, os.path.join(DST, "expected.parquet"))
    print(f"wrote {len(rows)} rows -> {DST}")


if __name__ == "__main__":
    main()
