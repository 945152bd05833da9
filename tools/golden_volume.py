#!/usr/bin/env python
"""Volume-scale golden cross-validation against the reference binary.

The pytest golden suite (tests/test_golden_ref.py) pins semantics at
small scale; this tool stresses the paths that only trigger at volume
-- fused-cap overflow, survivor-buffer spills + exact-offset repair
sweeps, multi-segment prefetch pipelining, block flushing at b_size --
by running dense-LD data (groups of 16 variants share a template, so
in-group pairs carry r2 near 1) through both implementations and
diffing every TWO field at the reference's 1e-5 rounding guard.

Usage: python tools/golden_volume.py [n_sites] [n_samples] [mode]
       mode: phased (default) | unphased
"""

import os
import random
import subprocess
import sys
import tempfile
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from test_golden_ref import (REF_BIN, BUILD_SH, assert_two_equal,
                             load_two, run_ref)   # noqa: E402
from tomahawk_tpu.compute.engine import CalcSettings, compute_ld  # noqa
from tomahawk_tpu.io.importer import ImportSettings, import_vcf   # noqa
from tomahawk_tpu.io.twk import TwkReader                         # noqa
from tomahawk_tpu.post.sort import sort_two                       # noqa


def gen_ld_vcf(path, n_sites, n_samples, phased, seed=0, grp=16,
               flip=0.02):
    rng = np.random.default_rng(seed)
    sep = "|" if phased else "/"
    lines = ["##fileformat=VCFv4.2",
             '##FORMAT=<ID=GT,Number=1,Type=String,Description="GT">',
             "##contig=<ID=20,length=500000000>",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(f"S{i}" for i in range(n_samples))]
    pos = 100
    n_grp = (n_sites + grp - 1) // grp
    gt_cache = np.empty((n_samples,), object)
    written = 0
    for g in range(n_grp):
        maf = float(rng.uniform(0.1, 0.5))
        base = (rng.random((n_samples, 2)) < maf).astype(np.uint8)
        for _ in range(min(grp, n_sites - written)):
            h = base.copy()
            fl = rng.random((n_samples, 2)) < flip
            h[fl] ^= 1
            pos += int(rng.integers(50, 400))
            cols = [f"{a}{sep}{b}" for a, b in h]
            lines.append(f"20\t{pos}\t.\tA\tC\t.\tPASS\t.\tGT\t"
                         + "\t".join(cols))
            written += 1
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    del gt_cache


def main():
    n_sites = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    mode = sys.argv[3] if len(sys.argv) > 3 else "phased"
    phased = mode == "phased"
    min_r2 = 0.05

    if not os.path.exists(REF_BIN):
        r = subprocess.run(["bash", BUILD_SH], capture_output=True,
                           text=True)
        if r.returncode != 0:
            sys.exit("cannot build reference:\n" + r.stderr[-2000:])

    d = tempfile.mkdtemp()
    vcf = os.path.join(d, "v.vcf")
    t0 = time.perf_counter()
    gen_ld_vcf(vcf, n_sites, n_samples, phased)
    print(f"# generated {n_sites:,} x {n_samples} ({mode}) in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    # --- import parity (record-identical .twk incl. raw RLE words) ---
    ours_twk = os.path.join(d, "ours.twk")
    ref_twk = os.path.join(d, "ref.twk")
    import_vcf(ImportSettings(input=vcf, output=ours_twk))
    run_ref(REF_BIN, "import", "-i", vcf, "-o", ref_twk[:-4])
    ra, rb = TwkReader(ours_twk), TwkReader(ref_twk)
    assert ra.index.n == rb.index.n
    n_rec = 0
    for ba, bb in zip(ra.blocks(), rb.blocks()):
        assert ba.n == bb.n
        for x, y in zip(ba.rcds, bb.rcds):
            assert (x.pos, x.rid, x.ac, x.an, x.n_het, x.n_hom,
                    x.gt_ptype, x.gt_phase) == \
                   (y.pos, y.rid, y.ac, y.an, y.n_het, y.n_hom,
                    y.gt_ptype, y.gt_phase), (x.pos, y.pos)
            assert np.array_equal(x.gt_runs, y.gt_runs), x.pos
            n_rec += 1
    print(f"# import parity OK: {n_rec:,} records", flush=True)

    # --- calc parity at volume --------------------------------------
    ours_two = os.path.join(d, "ours.two")
    ref_two = os.path.join(d, "ref.two")
    flag = "-p" if phased else "-u"
    t0 = time.perf_counter()
    run_ref(REF_BIN, "calc", "-i", ref_twk, "-o", ref_two, flag,
            "-r", str(min_r2), "-P", "1", "-t", "1")
    t_ref = time.perf_counter() - t0
    t0 = time.perf_counter()
    compute_ld(CalcSettings(input=ours_twk, output=ours_two,
                            force_phased=phased,
                            forced_unphased=not phased,
                            min_r2=min_r2))
    t_us = time.perf_counter() - t0
    ours = load_two(ours_two)
    ref = load_two(ref_two)
    print(f"# calc: ref {t_ref:.1f}s, ours {t_us:.1f}s "
          f"(incl. compile), {len(ref):,} records", flush=True)
    assert len(ours) > 100_000, "volume test produced too few records"
    assert_two_equal(ours, ref)
    print(f"# calc parity OK: {len(ours):,} records, every field "
          f"within 1e-5", flush=True)

    # --- sort parity: identical streams when both sort the SAME file,
    # with multiple memory-capped runs forced on our side --------------
    ours_s = os.path.join(d, "ours_s.two")
    ref_s = os.path.join(d, "ref_s.two")
    t0 = time.perf_counter()
    sort_two(ref_two, ours_s, memory_limit_gb=0.01)
    t_us = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_ref(REF_BIN, "sort", "-i", ref_two, "-o", ref_s)
    t_ref = time.perf_counter() - t0
    a, b = load_two(ours_s), load_two(ref_s)
    assert len(a) == len(b)
    for f in a.dtype.names:
        assert np.array_equal(a[f], b[f]), f
    print(f"# sort parity OK: {len(a):,} records in identical order "
          f"(ours {t_us:.1f}s, ref {t_ref:.1f}s)", flush=True)
    print("PASS")


if __name__ == "__main__":
    main()
