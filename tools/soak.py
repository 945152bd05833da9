"""Randomized end-to-end soak: random (samples, sites, missingness,
mode, filters, tiling, mesh, memory-banding) configurations are run
through import -> calc and compared record-by-record against the
brute-force oracle.

Knife-edge cases are skipped, not failed: estimated haplotype counts
exactly on a .5 rounding boundary (P becomes f64-noise-dependent),
degenerate-corner Dprime (~1.0 with dmax ~ 0), symmetric-table chi2
root ties (equal-|D| solutions), and r2 exactly on the filter
threshold -- at those inputs the reference's own output is
bit-noise-dependent too.

Usage: python tools/soak.py <seed> <n_trials>
(CPU: XLA_FLAGS=--xla_force_host_platform_device_count=8)
"""

import sys, random, tempfile, os
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
import numpy as np
from test_importer import make_vcf
from test_end2end import _expected_records, _check_two
from tomahawk_tpu.io.importer import ImportSettings, import_vcf
from tomahawk_tpu.compute.engine import CalcSettings, compute_ld

rng = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
n_fail = 0
for trial in range(int(sys.argv[2]) if len(sys.argv) > 2 else 10):
    seed = rng.randint(0, 10**6)
    n_samples = rng.choice([15, 33, 64, 129])
    n_sites = rng.choice([20, 35, 50])
    miss = rng.choice([0.0, 0.03, 0.12])
    mode = rng.choice(["phased", "unphased", "mixed"])
    min_r2 = rng.choice([0.0, 0.05, 0.3])
    tile_rows = rng.choice([0, 7, 16, 4096])   # 0 = auto sizing
    window = rng.choice([None, 1500, 4000])
    mesh = rng.choice(["off", "auto"])
    memory_gb = rng.choice([12.0, 1e-6])
    tmp = tempfile.mkdtemp()
    cfgs = dict(seed=seed, n_samples=n_samples, n_sites=n_sites, miss=miss,
                mode=mode, min_r2=min_r2, tile_rows=tile_rows,
                window=window, mesh=mesh, memory_gb=memory_gb)
    try:
        vcf = f"{tmp}/t.vcf"
        make_vcf(vcf, n_samples=n_samples, n_sites=n_sites,
                 miss_frac=miss, seed=seed)
        twk = f"{tmp}/t.twk"
        import_vcf(ImportSettings(input=vcf, output=twk,
                                  block_size=rng.choice([4, 9, 500]),
                                  threshold_miss=0.5))
        two = f"{tmp}/t.two"
        common = dict(force_phased=(mode == "phased"),
                      forced_unphased=(mode == "unphased"),
                      window=window is not None,
                      l_window=window or 1_000_000,
                      min_r2=min_r2, tile_rows=tile_rows,
                      mesh=mesh, memory_gb=memory_gb)
        n_chunks = rng.choice([1, 1, 3]) if window is None else 1
        if n_chunks > 1:
            from tomahawk_tpu.post.concat import concat_two
            parts = []
            for c in range(n_chunks):
                part = f"{tmp}/part{c}.two"
                compute_ld(CalcSettings(input=twk, output=part,
                                        n_chunks=n_chunks, c_chunk=c,
                                        **common))
                parts.append(part)
            concat_two(parts, two)
            cfgs["n_chunks"] = n_chunks
        else:
            res = compute_ld(CalcSettings(input=twk, output=two, **common))
        want, n_cand = _expected_records(twk, mode, min_r2=min_r2,
                                         window=window)
        try:
            _check_two(two, want)
        except AssertionError as e:
            # knife-edge: estimated haplotype counts exactly on a .5
            # rounding boundary make P ill-defined (f64 noise decides)
            msg = str(e)
            if "'Dprime'" in msg and "1.000" in msg:
                print(f"trial {trial} SKIP degenerate-corner Dprime")
                continue
            if "'D'" in msg:
                # symmetric-table chi2 tie: equal-|D| roots, selection
                # decided by f64 summation order
                import re as _re
                nums = _re.findall(r"np\.float64\((-?[0-9.e-]+)\)", msg)
                if len(nums) >= 2 and abs(abs(float(nums[0]))
                                          - abs(float(nums[1]))) < 1e-9:
                    print(f"trial {trial} SKIP root-tie D sign flip")
                    continue
            if "'P'" in msg:
                # find the record and check for .5 boundaries
                bad = [k for k, v in want.items()
                       if any(abs(c - int(c) - 0.5) < 1e-6 for c in v["cnt"])]
                if bad:
                    print(f"trial {trial} SKIP knife-edge P ({len(bad)} boundary recs)")
                    continue
            raise
        print(f"trial {trial} OK ({len(want)} recs) {cfgs}")
    except Exception as e:
        n_fail += 1
        print(f"trial {trial} FAIL {cfgs}\n  {type(e).__name__}: {e}")
print(f"{n_fail} failures")
sys.exit(1 if n_fail else 0)
