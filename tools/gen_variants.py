#!/usr/bin/env python3
"""Generate the SCANNED and BINARY-CONTAINER statement variants from the
committed text corpus (data/statements -> data/statements_scan +
data/statements_pdf).

Mirrors the two reference input shapes the text corpus doesn't cover:

- scanned statements whose text layer is empty, routed through OCR by
  the reference (/root/reference/extractors/manual_dividen_extractor.py:74-96
  falls back to EasyOCR when pdfplumber extracts no text). The stand-in
  is a two-line file: a scanner header line, then the hex encoding of
  the true statement text — the "OCR decode" is the deterministic
  unhex, so both Spark and the DuckDB oracle can run the stub decoder
  bit-for-bit while the routing/plumbing stays real.

- PDF-shaped binary containers (the reference's native input is PDF:
  /root/reference/extractors/conversion_extractor.py:253 pdfplumber.open).
  The stand-in is a minimal container: %GPDF-1.0 magic, an object
  header, the statement text between stream/endstream markers, a
  trailer. One corrupt-magic file exercises the invalid-container path.

Fully deterministic, derived from the committed corpus — run once from
the repo root: python3 tools/gen_variants.py
"""
import binascii
import os

BASE = os.path.join(os.path.dirname(__file__), "..", "data")
SRC = os.path.join(BASE, "statements")
SCAN = os.path.join(BASE, "statements_scan")
PDF = os.path.join(BASE, "statements_pdf")


def container(text):
    return (
        "%GPDF-1.0\n"
        "obj 1 0\n"
        "<< /Type /Statement /Pages 1 /Producer graft-stub >>\n"
        "stream\n"
        + text +
        "\nendstream\n"
        "trailer\n"
        "<< /Root 1 0 >>\n"
        "%%EOF\n"
    )


def main():
    n_scan = n_pdf = 0
    for date in sorted(os.listdir(SRC)):
        src_dir = os.path.join(SRC, date)
        if not os.path.isdir(src_dir):
            continue
        scan_dir = os.path.join(SCAN, date)
        pdf_dir = os.path.join(PDF, date)
        os.makedirs(scan_dir, exist_ok=True)
        os.makedirs(pdf_dir, exist_ok=True)
        files = sorted(f for f in os.listdir(src_dir) if f.endswith(".txt"))
        for i, name in enumerate(files):
            with open(os.path.join(src_dir, name), encoding="utf-8") as fh:
                text = fh.read()
            stem = name[:-4]
            # every 5th file gets a scanned twin (text layer = hex blob)
            if i % 5 == 0:
                payload = binascii.hexlify(text.encode("utf-8")).decode("ascii")
                with open(os.path.join(scan_dir, stem + "_scan.txt"), "w",
                          encoding="utf-8") as out:
                    out.write("SCANNED_IMAGE_V1\n" + payload)
                n_scan += 1
            # every 4th file gets a binary-container twin
            if i % 4 == 0:
                with open(os.path.join(pdf_dir, stem + ".gpdf"), "w",
                          encoding="utf-8") as out:
                    out.write(container(text))
                n_pdf += 1
        # one corrupt container per date dir: bad magic, no stream body
        with open(os.path.join(pdf_dir, f"corrupt_{date}.gpdf"), "w",
                  encoding="utf-8") as out:
            out.write("NOT-A-CONTAINER\ngarbage bytes\n")
        n_pdf += 1
    print(f"wrote {n_scan} scanned variants, {n_pdf} containers")


if __name__ == "__main__":
    main()
