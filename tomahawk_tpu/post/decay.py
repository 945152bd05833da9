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
    grouped by consecutive (ridA, Apos) runs, like the reference.
    Vectorized: per-block run-boundary detection + bincount reduction,
    with the run that straddles a block boundary carried over."""
    out = out or sys.stdout
    r = TwoReader(path)
    filt = _interval_filter(r, intervals)
    groups = []   # [rid, pos, n, sum_bpos]
    carry = None  # open run at the block boundary
    for recs in r.blocks():
        recs = filt(recs)
        if len(recs) == 0:
            continue
        rid = recs["ridA"].astype(np.int64)
        pos_a = (recs["packA"] >> 2).astype(np.int64)
        pos_b = (recs["packB"] >> 2).astype(np.int64)
        use = (recs["ridA"] == recs["ridB"]) & (pos_a < pos_b)

        change = np.empty(len(recs), bool)
        change[0] = True
        change[1:] = (rid[1:] != rid[:-1]) | (pos_a[1:] != pos_a[:-1])
        run_id = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        n_runs = len(starts)
        cnt = np.bincount(run_id[use], minlength=n_runs)
        tot = np.bincount(run_id[use], weights=pos_b[use],
                          minlength=n_runs)

        first = 0
        if carry is not None:
            if (carry[0], carry[1]) == (int(rid[0]), int(pos_a[0])):
                # block starts inside the carried run: fold run 0 in
                carry[2] += int(cnt[0])
                carry[3] += float(tot[0])
                first = 1
                if n_runs == 1:
                    continue   # whole block is one run; keep carrying
            groups.append(carry)
        for k in range(first, n_runs - 1):
            groups.append([int(rid[starts[k]]), int(pos_a[starts[k]]),
                           int(cnt[k]), float(tot[k])])
        k = n_runs - 1
        carry = [int(rid[starts[k]]), int(pos_a[starts[k]]),
                 int(cnt[k]), float(tot[k])]
    if carry is not None:
        groups.append(carry)
    r.close()
    lines = []
    for rid, pos, n, tot in groups:
        mean_off = (tot / n - pos) if n else -float(pos)
        lines.append(f"{rid}\t{pos}\t{n}\t{mean_off:.6f}\n")
        if len(lines) >= 65536:
            out.write("".join(lines))
            lines = []
    out.write("".join(lines))
    return groups
