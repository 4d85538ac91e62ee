#!/usr/bin/env python3
"""Build the committed real-WAV corpus (dev-side, run once).

Writes 40 small deterministic PCM16 mono WAV files via the stdlib
`wave` module (independent of the JVM reader by construction) at
data/audio/clip_NNN.wav, plus two corrupt files (bad magic /
truncated), and the expected-stats sidecar parquet the DuckDB oracle
reads.

Samples are pure integer formulas of (t, clip id), so the sidecar
stats (abs-sum, energy, peak, zero crossings) are derived from the
FORMULA, never from reading the WAV back: the JVM decoder
(javax.sound.sampled in graft.functions.AudioCodec) must reproduce
every sample through a real RIFF/PCM parse for the oracle to
hash-match.
"""
import os
import struct
import sys
import wave

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(ROOT, "data", "audio")

RATE = 8000


def samples(i, n):
    # integer sawtooth-ish with clip-keyed period and phase; spans
    # negative and positive so zero-crossing counting is exercised
    return [((t * (2 * i + 3) + i * 17) % 4001) - 2000 for t in range(n)]


def stats(xs):
    sum_abs = sum(abs(v) for v in xs)
    energy = sum(v * v for v in xs)
    peak = max(abs(v) for v in xs)
    zc = sum(1 for a, b in zip(xs, xs[1:]) if (a < 0) != (b < 0))
    return sum_abs, energy, peak, zc


FRAME = 128
STRIDE = 2


def frame_rows(name, xs):
    # block-frame sampling oracle for mm_frame_sample: fixed 128-sample
    # frames, every 2nd frame kept, per-frame signed sum + abs peak —
    # derived from the sample FORMULA, never from reading the file back
    out = []
    for f in range(0, len(xs) // FRAME, STRIDE):
        blk = xs[f * FRAME:(f + 1) * FRAME]
        out.append((name, f, sum(blk), max(abs(v) for v in blk)))
    return out


FP_FRAME = 256
FP_HOP = 128


def fingerprint_row(name, xs=None):
    """expected_fingerprint.parquet row for mm_audio_fingerprint:
    256-sample frames at hop 128; per-frame abs-energy + in-frame zero
    crossings; interior local-max peaks (strict vs the two preceding
    frames, >= vs the two following); consecutive-peak landmarks with
    dt <= 16 hashed as (bitlen(e1)<<24 | min(zcr1,255)<<16 |
    bitlen(e2)<<8 | dt), aggregated order-free (xor + sum). Pure
    integer formulas — derived from the sample FORMULA, never from
    reading the file back. xs=None marks a corrupt file."""
    if xs is None:
        return (name, False, 0, 0, 0, 0, 0)
    nf = 0
    es, zs = [], []
    while nf * FP_HOP + FP_FRAME <= len(xs):
        w = xs[nf * FP_HOP: nf * FP_HOP + FP_FRAME]
        es.append(sum(abs(v) for v in w))
        zs.append(sum(1 for a, b in zip(w, w[1:]) if (a < 0) != (b < 0)))
        nf += 1
    peaks = [j for j in range(2, nf - 2)
             if es[j] > es[j - 2] and es[j] > es[j - 1]
             and es[j] >= es[j + 1] and es[j] >= es[j + 2]]
    lm_xor = lm_sum = n_lm = 0
    for p, q in zip(peaks, peaks[1:]):
        dt = q - p
        if dt <= 16:
            h = ((es[p].bit_length() << 24) | (min(zs[p], 255) << 16)
                 | (es[q].bit_length() << 8) | dt)
            lm_xor ^= h
            lm_sum += h
            n_lm += 1
    return (name, True, nf, len(peaks), n_lm, lm_xor, lm_sum)


def feature_row(name, xs=None):
    """expected_features.parquet row for mm_feature_extract: e4
    fixed-point mean |amplitude| / mean energy via pure integer
    division (bit-exact with the JVM's Long arithmetic), dynamic range,
    and alphabet size — from the sample FORMULA, never from reading the
    file back. xs=None marks a corrupt file."""
    if xs is None:
        return (name, False, 0, 0, 0, 0, 0)
    n = max(len(xs), 1)
    return (name, True, len(xs),
            sum(abs(v) for v in xs) * 10000 // n,
            sum(v * v for v in xs) * 10000 // n,
            (max(xs) - min(xs)) if xs else 0,
            len(set(xs)))


def main():
    # optional: [dst_dir] [factor] — a FACTOR-scaled corpus (same sample
    # formulas, more ids) for the binaryFile listing-amortization
    # measurement; the default invocation stays byte-identical
    dst = sys.argv[1] if len(sys.argv) > 1 else DST
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    os.makedirs(dst, exist_ok=True)
    rows = []
    frames = []
    feats = []
    fps = []
    for i in range(40 * factor):
        n = 500 + (i % 7) * 300
        xs = samples(i, n)
        name = f"clip_{i:03d}.wav"
        with wave.open(os.path.join(dst, name), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(RATE)
            w.writeframes(struct.pack(f"<{n}h", *xs))
        sa, en, pk, zc = stats(xs)
        rows.append((name, True, 1, RATE, n, sa, en, pk, zc))
        frames.extend(frame_rows(name, xs))
        feats.append(feature_row(name, xs))
        fps.append(fingerprint_row(name, xs))

    # AU leg: same sample formulas through a SECOND real container
    # (Sun AU — 24-byte big-endian header, PCM16 big-endian data;
    # struct-packed here so the writer shares no code with the JVM
    # reader). Ids 40-51 so no stats row collides with a WAV row.
    for i in range(40 * factor, 40 * factor + 12 * factor):
        n = 500 + (i % 7) * 300
        xs = samples(i, n)
        name = f"clip_{i:03d}.au"
        hdr = struct.pack(">4sIIIII", b".snd", 24, n * 2, 3, RATE, 1)
        with open(os.path.join(dst, name), "wb") as f:
            f.write(hdr + struct.pack(f">{n}h", *xs))
        sa, en, pk, zc = stats(xs)
        rows.append((name, True, 1, RATE, n, sa, en, pk, zc))
        frames.extend(frame_rows(name, xs))
        feats.append(feature_row(name, xs))
        fps.append(fingerprint_row(name, xs))

    # corrupt AU: header-level truncation (12 bytes keeps the '.snd'
    # magic but cuts the format fields — must fail, not mis-decode)
    with open(os.path.join(dst, "clip_cut_header.au"), "wb") as f:
        f.write(struct.pack(">4sII", b".snd", 24, 0))
    rows.append(("clip_cut_header.au", False, 0, 0, 0, 0, 0, 0, 0))
    feats.append(feature_row("clip_cut_header.au"))
    fps.append(fingerprint_row("clip_cut_header.au"))

    with open(os.path.join(dst, f"clip_{0:03d}.wav"), "rb") as f:
        good = f.read()
    corrupt = [("clip_bad_magic.wav", b"NOTRIFF!" + good[8:]),
               ("clip_truncated.wav", good[: 20])]
    for name, data in corrupt:
        with open(os.path.join(dst, name), "wb") as f:
            f.write(data)
        rows.append((name, False, 0, 0, 0, 0, 0, 0, 0))
        feats.append(feature_row(name))
        fps.append(fingerprint_row(name))

    rows.sort()
    cols = list(zip(*rows))
    table = pa.table({
        "file_name": pa.array(cols[0], pa.string()),
        "audio_ok": pa.array(cols[1], pa.bool_()),
        "n_channels": pa.array(cols[2], pa.int32()),
        "sample_rate": pa.array(cols[3], pa.int32()),
        "n_samples": pa.array(cols[4], pa.int64()),
        "sum_abs": pa.array(cols[5], pa.int64()),
        "energy": pa.array(cols[6], pa.int64()),
        "peak": pa.array(cols[7], pa.int64()),
        "zero_crossings": pa.array(cols[8], pa.int64()),
    })
    pq.write_table(table, os.path.join(dst, "expected.parquet"))

    frames.sort()
    fcols = list(zip(*frames))
    ftable = pa.table({
        "file_name": pa.array(fcols[0], pa.string()),
        "frame_idx": pa.array(fcols[1], pa.int64()),
        "frame_sum": pa.array(fcols[2], pa.int64()),
        "frame_peak": pa.array(fcols[3], pa.int64()),
    })
    pq.write_table(ftable, os.path.join(dst, "expected_frames.parquet"))

    feats.sort()
    xcols = list(zip(*feats))
    xtable = pa.table({
        "file_name": pa.array(xcols[0], pa.string()),
        "audio_ok": pa.array(xcols[1], pa.bool_()),
        "n_samples": pa.array(xcols[2], pa.int64()),
        "mean_abs_e4": pa.array(xcols[3], pa.int64()),
        "mean_energy_e4": pa.array(xcols[4], pa.int64()),
        "dyn_range": pa.array(xcols[5], pa.int64()),
        "alphabet": pa.array(xcols[6], pa.int64()),
    })
    pq.write_table(xtable, os.path.join(dst, "expected_features.parquet"))

    fps.sort()
    pcols = list(zip(*fps))
    ptable = pa.table({
        "file_name": pa.array(pcols[0], pa.string()),
        "audio_ok": pa.array(pcols[1], pa.bool_()),
        "n_frames": pa.array(pcols[2], pa.int64()),
        "n_peaks": pa.array(pcols[3], pa.int64()),
        "n_landmarks": pa.array(pcols[4], pa.int64()),
        "lm_xor": pa.array(pcols[5], pa.int64()),
        "lm_sum": pa.array(pcols[6], pa.int64()),
    })
    pq.write_table(ptable, os.path.join(dst, "expected_fingerprint.parquet"))
    print(f"wrote {len(rows)} rows + {len(frames)} frame rows "
          f"+ {len(feats)} feature rows to {dst}")


if __name__ == "__main__":
    main()
