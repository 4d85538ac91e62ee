#!/usr/bin/env python3
"""Build the committed real-PNG corpus (dev-side, run once).

Writes 48 small deterministic RGB images as REAL PNG files (stdlib
zlib + struct only — no PIL in this container, and independence from
the JVM reader is the point) at data/images/img_NNN.png, plus two
corrupt files (bad magic / truncated stream), and the expected-stats
sidecar parquet the DuckDB oracle reads.

Pixels are pure integer formulas of (x, y, image id), so the sidecar
stats (channel sums, integer-luma perceptual hash with the SAME 8x8
NN index math mm_resize/mm_phash use) are derived from the FORMULA,
never from reading the PNG back: the JVM decoder (javax.imageio in
graft.functions.ImageCodec) must reproduce every pixel through a real
PNG parse for the oracle to hash-match.

Deterministic output (fixed zlib level, ordered writes) so the corpus
commits cleanly.
"""
import os
import struct
import sys
import zlib
import binascii

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(ROOT, "data", "images")


def chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload +
            struct.pack(">I", binascii.crc32(tag + payload) & 0xFFFFFFFF))


def png_bytes(w, h, raster):
    """raster: list of rows, each row a bytes of r,g,b triples."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + row for row in raster)      # filter 0 rows
    return (sig + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def bmp_bytes(w, h, raster):
    """raster: list of rows (top-down), each a bytes of r,g,b triples.
    24-bit uncompressed BITMAPINFOHEADER BMP: bottom-up rows, BGR
    order, each row padded to a 4-byte multiple."""
    pad = (-(w * 3)) % 4
    body = b"".join(
        bytes(v for x in range(w)
              for v in (row[x * 3 + 2], row[x * 3 + 1], row[x * 3]))
        + b"\x00" * pad
        for row in reversed(raster))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return head + info + body


def pixel(i, x, y):
    return ((x * 7 + y * 3 + i * 11) % 256,
            (x * 5 + y * 13 + i * 17) % 256,
            (x * 3 + y * 11 + i * 23) % 256)


def stats(i, w, h):
    sum_r = sum_g = sum_b = 0
    luma = [[0] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            r, g, b = pixel(i, x, y)
            sum_r += r
            sum_g += g
            sum_b += b
            luma[y][x] = (r * 299 + g * 587 + b * 114) // 1000
    # 8x8 NN thumbnail over integer luma — identical index math to
    # mm_phash (sy = y*h//8, sx = x*w//8), bit set iff
    # thumb*64 > sum (mean comparison without floats)
    thumb = [luma[y * h // 8][x * w // 8] for y in range(8) for x in range(8)]
    tsum = sum(thumb)
    lo = hi = n_bright = 0
    for j, v in enumerate(thumb):
        if v * 64 > tsum:
            n_bright += 1
            if j < 32:
                lo |= 1 << j
            else:
                hi |= 1 << (j - 32)
    # 10x10 NN thumbnail — the REAL mm_resize oracle: sum / min / max
    # plus a position-weighted sum (v * (idx+1)) that pins every output
    # pixel's value AND position, derived from the pixel formula, never
    # from reading the file back
    t10 = [luma[y * h // 10][x * w // 10] for y in range(10) for x in range(10)]
    r10 = (sum(t10), min(t10), max(t10),
           sum(v * (j + 1) for j, v in enumerate(t10)))
    return sum_r, sum_g, sum_b, lo, hi, n_bright, r10


def sniff(data):
    # the SAME magic rule the JVM operator applies (format from bytes,
    # never the extension)
    if len(data) >= 8 and data[0] == 0x89 and data[1:3] == b"PN":
        return "png"
    if len(data) >= 2 and data[0:2] == b"BM":
        return "bmp"
    return "unknown"


def meta_row(name, data, i=None, w=0, h=0):
    """expected_meta.parquet row for mm_decode_meta: sniffed format,
    on-disk byte count (the writer's own len), and the 4-bin luma
    quartile histogram (luma//64) from the pixel FORMULA — never from
    reading the file back. i=None marks a corrupt file."""
    fmt = sniff(data)
    if i is None:
        return (name, False, fmt, 0, 0, len(data), 0, 0, 0, 0)
    hist = [0, 0, 0, 0]
    for y in range(h):
        for x in range(w):
            r, g, b = pixel(i, x, y)
            hist[((r * 299 + g * 587 + b * 114) // 1000) // 64] += 1
    return (name, True, fmt, w, h, len(data), *hist)


def main():
    # optional: [dst_dir] [factor] — a FACTOR-scaled corpus (same pixel
    # formulas, more ids) for the binaryFile listing-amortization
    # measurement; the default invocation stays byte-identical
    dst = sys.argv[1] if len(sys.argv) > 1 else DST
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    os.makedirs(dst, exist_ok=True)
    rows = []
    meta_rows = []
    for i in range(48 * factor):
        w = 16 + (i % 5) * 8
        h = 12 + (i % 7) * 4
        raster = [bytes(v for x in range(w) for v in pixel(i, x, y))
                  for y in range(h)]
        name = f"img_{i:03d}.png"
        data = png_bytes(w, h, raster)
        with open(os.path.join(dst, name), "wb") as f:
            f.write(data)
        sr, sg, sb, lo, hi, nb, r10 = stats(i, w, h)
        rows.append((name, True, w, h, w * h, sr, sg, sb, lo, hi, nb,
                     10, 10, *r10))
        meta_rows.append(meta_row(name, data, i, w, h))

    # BMP leg: same pixel formulas through a SECOND real container
    # (ids 48-63, so no stats row collides with a PNG row) — the JVM
    # reader must route by magic sniffing, not extension trust
    for i in range(48 * factor, 48 * factor + 16 * factor):
        w = 16 + (i % 5) * 8
        h = 12 + (i % 7) * 4
        raster = [bytes(v for x in range(w) for v in pixel(i, x, y))
                  for y in range(h)]
        name = f"img_{i:03d}.bmp"
        data = bmp_bytes(w, h, raster)
        with open(os.path.join(dst, name), "wb") as f:
            f.write(data)
        sr, sg, sb, lo, hi, nb, r10 = stats(i, w, h)
        rows.append((name, True, w, h, w * h, sr, sg, sb, lo, hi, nb,
                     10, 10, *r10))
        meta_rows.append(meta_row(name, data, i, w, h))

    # corrupt BMP: header-level truncation (20 bytes keeps the 'BM'
    # magic but cuts BITMAPINFOHEADER, so no partial-raster decode is
    # possible — the reader must fail, not return garbage pixels)
    bmp_good = bmp_bytes(24, 16, [bytes(v for x in range(24)
                                        for v in pixel(98, x, y))
                                  for y in range(16)])
    with open(os.path.join(dst, "img_cut_header.bmp"), "wb") as f:
        f.write(bmp_good[:20])
    rows.append(("img_cut_header.bmp", False, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                 0, 0, 0, 0, 0, 0))
    meta_rows.append(meta_row("img_cut_header.bmp", bmp_good[:20]))

    # corrupt pair: wrong magic, and a truncated stream (half the bytes
    # of a real image — IDAT CRC can never validate)
    good = png_bytes(24, 16, [bytes(v for x in range(24) for v in pixel(99, x, y))
                              for y in range(16)])
    corrupt = [("img_bad_magic.png", b"NOTAPNG" + good[8:]),
               ("img_truncated.png", good[: len(good) // 2])]
    for name, data in corrupt:
        with open(os.path.join(dst, name), "wb") as f:
            f.write(data)
        rows.append((name, False, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
        meta_rows.append(meta_row(name, data))

    rows.sort()
    cols = list(zip(*rows))
    table = pa.table({
        "file_name": pa.array(cols[0], pa.string()),
        "img_ok": pa.array(cols[1], pa.bool_()),
        "width": pa.array(cols[2], pa.int32()),
        "height": pa.array(cols[3], pa.int32()),
        "n_pixels": pa.array(cols[4], pa.int64()),
        "sum_r": pa.array(cols[5], pa.int64()),
        "sum_g": pa.array(cols[6], pa.int64()),
        "sum_b": pa.array(cols[7], pa.int64()),
        "phash_lo": pa.array(cols[8], pa.int64()),
        "phash_hi": pa.array(cols[9], pa.int64()),
        "n_bright": pa.array(cols[10], pa.int64()),
        "r10_w": pa.array(cols[11], pa.int32()),
        "r10_h": pa.array(cols[12], pa.int32()),
        "r10_sum": pa.array(cols[13], pa.int64()),
        "r10_min": pa.array(cols[14], pa.int64()),
        "r10_max": pa.array(cols[15], pa.int64()),
        "r10_wsum": pa.array(cols[16], pa.int64()),
    })
    pq.write_table(table, os.path.join(dst, "expected.parquet"))

    meta_rows.sort()
    mcols = list(zip(*meta_rows))
    mtable = pa.table({
        "file_name": pa.array(mcols[0], pa.string()),
        "img_ok": pa.array(mcols[1], pa.bool_()),
        "format": pa.array(mcols[2], pa.string()),
        "width": pa.array(mcols[3], pa.int32()),
        "height": pa.array(mcols[4], pa.int32()),
        "n_bytes": pa.array(mcols[5], pa.int64()),
        "h0": pa.array(mcols[6], pa.int64()),
        "h1": pa.array(mcols[7], pa.int64()),
        "h2": pa.array(mcols[8], pa.int64()),
        "h3": pa.array(mcols[9], pa.int64()),
    })
    pq.write_table(mtable, os.path.join(dst, "expected_meta.parquet"))
    print(f"wrote {len(rows)} rows + {len(meta_rows)} meta rows to {dst}")


if __name__ == "__main__":
    main()
