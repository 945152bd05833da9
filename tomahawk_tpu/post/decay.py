"""LD decay statistics (reference: lib/two_reader.cpp:424-541).

decay: binned mean r2 as a function of pairwise distance (same contig,
upper triangle only). positional_decay: per left-variant summary of its
partner positions (count and mean partner offset)."""

import sys

import numpy as np

from ..io.two import TwoReader


def _interval_filter(reader, intervals):
    if not intervals:
        return lambda recs: recs
    from .intervals import parse_intervals, interval_mask
    ivals = parse_intervals(intervals, reader.header)
    return lambda recs: recs[interval_mask(recs, ivals)]


def decay(path: str, max_range: int = 10_000_000, n_bins: int = 1000,
          out=None, intervals=None):
    out = out or sys.stdout
    bin_w = max(max_range // n_bins, 1)
    sums = np.zeros(n_bins)
    cnts = np.zeros(n_bins, np.int64)
    r = TwoReader(path)
    filt = _interval_filter(r, intervals)
    for recs in r.blocks():
        recs = filt(recs)
        pos_a = (recs["packA"] >> 2).astype(np.int64)
        pos_b = (recs["packB"] >> 2).astype(np.int64)
        m = (recs["ridA"] == recs["ridB"]) & (pos_a < pos_b)
        d = pos_b[m] - pos_a[m]
        b = np.minimum(d // bin_w, n_bins - 1)
        np.add.at(sums, b, recs["R2"][m])
        np.add.at(cnts, b, 1)
    r.close()
    out.write("From\tTo\tMean\tFrequency\n")
    for i in range(n_bins):
        mean = sums[i] / max(cnts[i], 1)
        out.write(f"{i * bin_w}\t{(i + 1) * bin_w}\t{mean:.6g}\t"
                  f"{cnts[i]}\n")
    return sums, cnts


def positional_decay(path: str, out=None, intervals=None):
    """Per left-variant mean partner offset; emitted in file order
    grouped by consecutive (ridA, Apos) runs, like the reference."""
    out = out or sys.stdout
    r = TwoReader(path)
    filt = _interval_filter(r, intervals)
    groups = []   # (rid, pos, n, sum_bpos)
    prev = None
    for recs in r.blocks():
        recs = filt(recs)
        pos_a = (recs["packA"] >> 2).astype(np.int64)
        pos_b = (recs["packB"] >> 2).astype(np.int64)
        use = (recs["ridA"] == recs["ridB"]) & (pos_a < pos_b)
        for k in range(len(recs)):
            key = (int(recs["ridA"][k]), int(pos_a[k]))
            if key != prev:
                groups.append([key[0], key[1], 0, 0.0])
                prev = key
            if use[k]:
                groups[-1][2] += 1
                groups[-1][3] += float(pos_b[k])
    r.close()
    for rid, pos, n, tot in groups:
        mean_off = (tot / n - pos) if n else -float(pos)
        out.write(f"{rid}\t{pos}\t{n}\t{mean_off:.6f}\n")
    return groups
