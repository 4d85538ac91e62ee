#!/usr/bin/env python3
"""Build the committed scanned-statement PNG corpus (dev-side, run once).

Renders every committed statement under data/statements/<date>/*.txt
into a REAL grayscale PNG at data/statements_ocr/<date>/<base>_scan.png
using a FIXED DETERMINISTIC BITMAP FONT: each character is a 16x16
bitmap whose 256 bits are exactly one sha256 digest of the codepoint
(salted until the font validates — no blank glyph, pairwise Hamming
distance >= 80). The font is committed as DATA next to the corpus
(font/atlas.png + font/charmap.txt): the JVM matcher
(graft.functions.OcrCodec) loads those templates and recognizes glyph
cells by pixel comparison — classic fixed-font template-matching OCR,
the real version of the hex-stub scan corpus.

Adversarial legs, so recognition is nearest-neighbor matching rather
than equality lookup:
  * NOISY scans: a seeded PRNG flips 1-6 ink-grid pixels in some glyph
    cells (only inside true glyph cells, never padding), validated to
    stay strictly closer to the true template than to any other and
    under the rejection threshold — the matcher must do Hamming
    nearest-neighbor, and its confidence drops by exactly the flipped
    bits.
  * DESTROYED cells: a scribble pattern validated to sit > THRESH bits
    from EVERY template — the matcher must reject (emit '?', score 0)
    rather than guess. Two disjoint sub-legs: LABEL cells (i%10==7 —
    exact-label extraction loses the field; etl_ocr_fuzzy_extract's
    input) and 产品名称 VALUE cells (i%10==3, round 13 — the label
    survives but the extracted value carries '?';
    etl_fuzzy_product_match's input).
  * CORRUPT files: bad magic / truncated stream / corrupted IDAT —
    the decoder must surface ocr_ok=false rows, never a thrown scan.

The expected-text sidecar (expected.parquet: file_name, batch_date,
ocr_ok, content, ocr_conf_ppm) is derived from THIS generator's
formulas — source text with '?' at destroyed cells, confidence
ppm = 1e6 * sum(per-cell score) / (256 * n_glyph_cells) with
score = 256 - flips (recognized) or 0 (destroyed) — never from
running the JVM decoder, so a matcher bug cannot self-confirm.

Deterministic output (fixed salt, seeded PRNG keyed on file name,
fixed zlib level, ordered writes) so the corpus commits cleanly.
"""
import glob
import hashlib
import os
import random
import struct
import zlib
import binascii

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "data", "statements")
DST = os.path.join(ROOT, "data", "statements_ocr")

CELL = 16           # glyph cell edge: 16x16 = 256 bits = one sha256
THRESH = 64         # matcher rejection threshold (Hamming bits)
MIN_PAIR_DIST = 80  # font validation: min pairwise template distance


def chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload +
            struct.pack(">I", binascii.crc32(tag + payload) & 0xFFFFFFFF))


def png_gray(w, h, rows):
    """rows: list of h bytes objects, each w grayscale bytes."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + r for r in rows)
    return (sig + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def glyph_bits(cp, salt):
    """256-bit glyph bitmap for a codepoint: bit k = ink at pixel k
    (row-major), straight from one sha256 digest."""
    d = hashlib.sha256(f"graft-ocr-font:{salt}:{cp}".encode()).digest()
    return int.from_bytes(d, "big")


def hamming(a, b):
    return bin(a ^ b).count("1")


def build_font(charset):
    """Validate-by-construction: bump the salt until every glyph has
    ink and every pair is >= MIN_PAIR_DIST apart."""
    for salt in range(1000):
        bits = {c: glyph_bits(ord(c), salt) for c in charset}
        vals = list(bits.values())
        if any(v == 0 for v in vals):
            continue
        ok = all(hamming(vals[i], vals[j]) >= MIN_PAIR_DIST
                 for i in range(len(vals)) for j in range(i + 1, len(vals)))
        if ok:
            return salt, bits
    raise SystemExit("no valid font salt found")


def render(text, font):
    """Statement text -> (w, h, bytearray raster). bg=255, ink=0."""
    lines = text.split("\n")
    w = max(len(l) for l in lines) * CELL
    h = len(lines) * CELL
    ras = bytearray([255]) * (w * h)
    for r, line in enumerate(lines):
        for c, ch in enumerate(line):
            g = font[ch]
            for k in range(256):
                if (g >> (255 - k)) & 1:
                    y = r * CELL + k // CELL
                    x = c * CELL + k % CELL
                    ras[y * w + x] = 0
    return w, h, ras


def flip(ras, w, r, c, k):
    y = r * CELL + k // CELL
    x = c * CELL + k % CELL
    ras[y * w + x] = 255 - ras[y * w + x]


def cell_bits_from_raster(ras, w, r, c):
    v = 0
    for k in range(256):
        y = r * CELL + k // CELL
        x = c * CELL + k % CELL
        v = (v << 1) | (1 if ras[y * w + x] < 128 else 0)
    return v


def scribble_bits(name, r, c, templates):
    """A destroyed-cell pattern VALIDATED to be > THRESH from every
    template, so the matcher's rejection is deterministic."""
    for tries in range(1000):
        d = hashlib.sha256(
            f"graft-ocr-destroy:{name}:{r}:{c}:{tries}".encode()).digest()
        v = int.from_bytes(d, "big")
        if v and min(hamming(v, t) for t in templates) > THRESH:
            return v
    raise SystemExit("no valid scribble found")


def main():
    srcs = sorted(glob.glob(os.path.join(SRC, "*", "*.txt")))
    assert srcs, f"no source statements under {SRC}"
    texts = {}
    charset = set()
    for p in srcs:
        t = open(p, encoding="utf-8").read().rstrip("\n")
        assert all(l == l.rstrip() for l in t.split("\n")), p
        texts[p] = t
        charset.update(t.replace("\n", ""))
    charset = sorted(charset)
    salt, font = build_font(charset)
    templates = [font[c] for c in charset]

    # committed font: atlas PNG (cells left-to-right, 32 per row) +
    # charmap (one char per atlas slot, in order)
    fdir = os.path.join(DST, "font")
    os.makedirs(fdir, exist_ok=True)
    percol = 32
    arows = (len(charset) + percol - 1) // percol
    aw, ah = percol * CELL, arows * CELL
    ara = bytearray([255]) * (aw * ah)
    for i, ch in enumerate(charset):
        r, c = divmod(i, percol)
        g = font[ch]
        for k in range(256):
            if (g >> (255 - k)) & 1:
                y = r * CELL + k // CELL
                x = c * CELL + k % CELL
                ara[y * aw + x] = 0
    rows = [bytes(ara[y * aw:(y + 1) * aw]) for y in range(ah)]
    with open(os.path.join(fdir, "atlas.png"), "wb") as f:
        f.write(png_gray(aw, ah, rows))
    with open(os.path.join(fdir, "charmap.txt"), "w", encoding="utf-8") as f:
        f.write("".join(charset))
    with open(os.path.join(fdir, "README.txt"), "w") as f:
        f.write(f"salt={salt} cell={CELL} thresh={THRESH} "
                f"min_pair_dist={MIN_PAIR_DIST} glyphs={len(charset)}\n")

    side = []  # (file_name, batch_date, ocr_ok, content, conf_ppm)
    for i, p in enumerate(sorted(texts)):
        date = os.path.basename(os.path.dirname(p))
        base = os.path.splitext(os.path.basename(p))[0]
        name = f"{base}_scan.png"
        odir = os.path.join(DST, date)
        os.makedirs(odir, exist_ok=True)
        text = texts[p]
        w, h, ras = render(text, font)
        lines = text.split("\n")
        # glyph cells = INK cells: a space renders blank and the
        # matcher neither counts nor scores it, so the denominator
        # (and the noisy-cell candidates below) must skip spaces.
        # No committed statement contains one, so this is behavior-
        # preserving on the committed corpus.
        n_glyphs = sum(1 for l in lines for ch in l if ch != " ")
        score = 256 * n_glyphs
        expected = [list(l) for l in lines]

        rng = random.Random(f"graft-ocr-noise:{name}")
        flipped = {}  # (r, c) -> flips, for destroy-overlap correction
        if i % 2 == 1:  # NOISY leg: half the corpus
            cells = [(r, c) for r, l in enumerate(lines)
                     for c in range(len(l)) if l[c] != " "]
            for (r, c) in rng.sample(cells, min(5, len(cells))):
                nflips = rng.randrange(1, 7)
                ks = rng.sample(range(256), nflips)
                for k in ks:
                    flip(ras, w, r, c, k)
                # validate: still nearest to the true template and
                # under the rejection threshold (guaranteed by
                # MIN_PAIR_DIST >= 80 > 2*6, but assert anyway)
                v = cell_bits_from_raster(ras, w, r, c)
                true_g = font[lines[r][c]]
                d_true = hamming(v, true_g)
                assert d_true == nflips <= THRESH
                assert all(hamming(v, t) > d_true
                           for t in templates if t != true_g)
                score -= d_true
                flipped[(r, c)] = d_true
        if i % 10 == 7:  # DESTROYED leg: one unrecognizable cell
            # first line (from line 1, falling back to 0) with any
            # non-space glyph; within it, prefer column 2 but never a
            # space (a destroyed blank cell would gain ink the matcher
            # counts but the n_glyphs denominator above does not)
            r = next(ri for ri in list(range(1, len(lines))) + [0]
                     if lines[ri].strip())
            c = min(2, len(lines[r]) - 1)
            if lines[r][c] == " ":
                c = next(ci for ci, ch in enumerate(lines[r]) if ch != " ")
            v = scribble_bits(name, r, c, templates)
            for k in range(256):
                y = r * CELL + k // CELL
                x = c * CELL + k % CELL
                ras[y * w + x] = 0 if (v >> (255 - k)) & 1 else 255
            # the matcher scores a rejected cell exactly 0: back out any
            # noisy-leg deduction already taken on this cell before
            # charging the full 256 (destruction overwrote those flips)
            score -= 256 - flipped.get((r, c), 0)
            expected[r][c] = "?"
        if i % 10 == 3:  # VALUE-DESTROYED leg: one unrecognizable cell
            # INSIDE the 产品名称 value (label left intact) — the input
            # the fuzzy dictionary-recovery operator exists for. Mod-10
            # residues keep this leg disjoint from the label-destroyed
            # leg above; the noisy leg may overlap (same backout rule).
            pl = next((ri for ri, l in enumerate(lines)
                       if l.startswith("产品名称：")
                       and l[len("产品名称："):].strip()), None)
            vstart = len("产品名称：")
            if pl is not None:
                r2 = pl
                c2 = vstart + rng.randrange(len(lines[pl]) - vstart)
                if lines[r2][c2] == " ":
                    # a non-space exists past the label by the strip()
                    # in the line selection above
                    c2 = next(ci for ci in range(vstart, len(lines[r2]))
                              if lines[r2][ci] != " ")
                v = scribble_bits(name, r2, c2, templates)
                for k in range(256):
                    y = r2 * CELL + k // CELL
                    x = c2 * CELL + k % CELL
                    ras[y * w + x] = 0 if (v >> (255 - k)) & 1 else 255
                score -= 256 - flipped.get((r2, c2), 0)
                expected[r2][c2] = "?"

        rows = [bytes(ras[y * w:(y + 1) * w]) for y in range(h)]
        with open(os.path.join(odir, name), "wb") as f:
            f.write(png_gray(w, h, rows))
        conf = 1_000_000 * score // (256 * n_glyphs)
        side.append((name, date, True,
                     "\n".join("".join(l) for l in expected), conf))

    # CORRUPT leg: bad magic, truncated stream, corrupted IDAT
    odir = os.path.join(DST, "20240115")
    cw, chh, cras = render("".join(sorted(charset)[:4]), font)
    ok_png = png_gray(cw, chh,
                      [bytes(cras[y * cw:(y + 1) * cw]) for y in range(chh)])
    with open(os.path.join(odir, "corrupt_badmagic_scan.png"), "wb") as f:
        f.write(b"NOTAPNG!" + ok_png[8:])
    with open(os.path.join(odir, "corrupt_truncated_scan.png"), "wb") as f:
        f.write(ok_png[:len(ok_png) // 2])
    bad = bytearray(ok_png)
    idat = bad.find(b"IDAT")
    bad[idat + 8:idat + 16] = b"\x00" * 8
    with open(os.path.join(odir, "corrupt_idat_scan.png"), "wb") as f:
        f.write(bytes(bad))
    for n in ("corrupt_badmagic_scan.png", "corrupt_truncated_scan.png",
              "corrupt_idat_scan.png"):
        side.append((n, "20240115", False, "", 0))

    side.sort()
    tbl = pa.table({
        "file_name": pa.array([s[0] for s in side], pa.string()),
        "batch_date": pa.array([s[1] for s in side], pa.string()),
        "ocr_ok": pa.array([s[2] for s in side], pa.bool_()),
        "content": pa.array([s[3] for s in side], pa.string()),
        "ocr_conf_ppm": pa.array([s[4] for s in side], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(DST, "expected.parquet"))
    print(f"wrote {len(side)} sidecar rows, {len(charset)} glyphs, "
          f"salt={salt}")


if __name__ == "__main__":
    main()
