#!/usr/bin/env python3
"""Build the committed fixed-width statement export corpus (dev-side,
run once) — the mainframe/bank-batch interchange format next to the
CSV/JSON/XLSX/PDF/scan legs: no delimiters, column positions ARE the
schema.

Layout (1-based, byte == char: ASCII only by construction):
  1-6    ledger_id   left-aligned,  space-padded
  7-16   platform    left-aligned,  space-padded
  17-22  fund_code   zero-padded 6 digits
  23-34  amount_e2   RIGHT-aligned integer cents
  35-46  shares_e2   RIGHT-aligned integer
  47-54  trade_date  yyyymmdd

Values are pure integer formulas of (file, row), so the DuckDB oracle
re-derives every field from read_text + substr — a fully independent
parse path, no sidecar needed. One malformed file (short lines) is
committed to exercise the reject contract.
"""
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(ROOT, "data", "statements_fw")

PLATFORMS = ["haomai", "tiantian", "jingdong", "ant"]


def row(f, i):
    k = f * 50 + i
    ledger = f"L{k % 997:04d}"
    platform = PLATFORMS[k % 4]
    fund_code = f"{(k * 37) % 1000000:06d}"
    amount_e2 = (k * 104729 + 13) % 10**9
    shares_e2 = (k * 7919 + 7) % 10**8
    trade_date = f"2024{1 + k % 2:02d}{1 + k % 28:02d}"
    return (f"{ledger:<6}{platform:<10}{fund_code}"
            f"{amount_e2:>12}{shares_e2:>12}{trade_date}")


def main():
    os.makedirs(DST, exist_ok=True)
    for f in range(20):
        lines = [row(f, i) for i in range(50)]
        with open(os.path.join(DST, f"export_{f:03d}.txt"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    # reject leg: lines shorter than the layout must surface as
    # invalid rows, never parse garbage or throw
    with open(os.path.join(DST, "export_bad.txt"), "w") as fh:
        fh.write("SHORT\nL9999 tooshort\n")
    print(f"wrote 21 files to {DST}")


if __name__ == "__main__":
    main()
