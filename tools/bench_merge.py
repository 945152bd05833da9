#!/usr/bin/env python
"""Distributed shard-merge benchmark (VERDICT round-3 task 4).

Measures three ways of folding `calc --distributed` shards into one
sorted .two, against the single-file external-sort baseline:

  sort1   one unsorted file of R records          -> sort_two
  mergeN  N unsorted shards of R/N records each   -> merge_shards
          (streams shards straight into the sorter's run phase; the
          round-2 done criterion is mergeN rate >= sort1 rate)
  presorted  N shards EACH SORTED WHERE PRODUCED (calc --sort-shards;
          phase-1 work parallelizes across the producing processes)
          -> merge_sorted_two: single sequential k-way merge pass, the
          analogue of the reference's phase-2 priority-queue merge over
          presorted runs (reference: lib/two_reader.cpp:272-421)

Usage: python tools/bench_merge.py [n_records] [n_shards]
No device use -- host-only paths.
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tomahawk_tpu.io.header import VcfContig, VcfHeader  # noqa: E402
from tomahawk_tpu.io.two import TWO_DTYPE, TwoReader, TwoWriter  # noqa: E402
from tomahawk_tpu.parallel.distributed import merge_shards  # noqa: E402
from tomahawk_tpu.post.sort import merge_sorted_two, sort_two  # noqa: E402

REF_SORT_E2E = 850_000.0   # rec/s, reference 8-thread end-to-end
                           # (2.83M phase 1 + 1.22M merge, tutorial.md)


def synth_records(n, rng, n_contigs=3):
    recs = np.zeros(n, TWO_DTYPE)
    recs["ridA"] = rng.integers(0, n_contigs, n)
    recs["ridB"] = rng.integers(0, n_contigs, n)
    recs["packA"] = rng.integers(0, 1 << 28, n).astype(np.uint32) << 2
    recs["packB"] = rng.integers(0, 1 << 28, n).astype(np.uint32) << 2
    recs["R2"] = rng.random(n)
    recs["D"] = rng.random(n) - 0.5
    recs["P"] = rng.random(n)
    recs["cnt"] = rng.integers(0, 5000, (n, 4)).astype(np.float64)
    return recs


def write_two(path, recs, hdr, chunk=100_000):
    w = TwoWriter(path, hdr)
    for s in range(0, len(recs), chunk):
        w.add(recs[s:s + chunk])
    w.close()


def main():
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rng = np.random.default_rng(7)
    hdr = VcfHeader(samples=["S0"],
                    contigs=[VcfContig(idx=i, name=f"c{i}")
                             for i in range(3)])
    d = tempfile.mkdtemp()
    print(f"# bench_merge: {n_records:,} records, {n_shards} shards, "
          f"dir={d}", flush=True)

    recs = synth_records(n_records, rng)
    single = os.path.join(d, "single.two")
    write_two(single, recs, hdr)
    per = n_records // n_shards
    shards = []
    for k in range(n_shards):
        p = os.path.join(d, f"shard{k}.two")
        write_two(p, recs[k * per:(k + 1) * per if k < n_shards - 1
                          else n_records], hdr)
        shards.append(p)

    # 1) single-file external sort baseline
    t0 = time.perf_counter()
    n = sort_two(single, os.path.join(d, "single.sorted.two"))
    dt1 = time.perf_counter() - t0
    r1 = n / dt1
    print(f"# sort1: {n:,} records in {dt1:.2f}s -> {r1:,.0f} rec/s "
          f"({r1 / REF_SORT_E2E:.2f}x reference 8-thread end-to-end)",
          flush=True)

    # 2) merge of N unsorted shards (streams into the sorter run phase)
    t0 = time.perf_counter()
    n = merge_shards(shards, os.path.join(d, "merged.two"))
    dt2 = time.perf_counter() - t0
    r2 = n / dt2
    print(f"# merge{n_shards} (unsorted shards): {n:,} records in "
          f"{dt2:.2f}s -> {r2:,.0f} rec/s "
          f"({r2 / r1:.2f}x the single-file sort rate; round-2 "
          f"criterion: >= 1.0x)", flush=True)

    # 3) presorted shards (calc --sort-shards): phase 1 happened where
    # the shards were produced; only the k-way merge pass remains
    sorted_shards = []
    t0 = time.perf_counter()
    for p in shards:
        q = p[:-4] + ".sorted.two"
        sort_two(p, q)
        sorted_shards.append(q)
    dt_p1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = merge_sorted_two(sorted_shards, os.path.join(d, "premerged.two"))
    dt3 = time.perf_counter() - t0
    r3 = n / dt3
    print(f"# presorted merge: {n:,} records in {dt3:.2f}s -> "
          f"{r3:,.0f} rec/s ({r3 / r1:.2f}x the single-file sort rate; "
          f"per-shard presort cost {dt_p1:.2f}s total, parallel across "
          f"producers in a real distributed run)", flush=True)

    # outputs must agree record-for-record
    a = TwoReader(os.path.join(d, "single.sorted.two")).records()
    b = TwoReader(os.path.join(d, "merged.two")).records()
    c = TwoReader(os.path.join(d, "premerged.two")).records()
    key = np.lexsort((a["P"], a["packB"], a["packA"], a["ridB"], a["ridA"]))
    for other, name in ((b, "merged"), (c, "premerged")):
        ko = np.lexsort((other["P"], other["packB"], other["packA"],
                         other["ridB"], other["ridA"]))
        for f in a.dtype.names:
            np.testing.assert_array_equal(a[key][f], other[ko][f],
                                          err_msg=f"{name}:{f}")
    print("# outputs agree (record multisets equal)", flush=True)


if __name__ == "__main__":
    main()
