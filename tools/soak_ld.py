"""LD-structured big-sample soak: correlated site clusters at
1024/2504 samples produce real survivors, exercising the f32 device
prefilter margins at production count magnitudes (products up to
~25M per cell). Usage: python tools/soak_ld.py <seed> <n_trials>."""

import sys, os, random, tempfile
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT); sys.path.insert(0, os.path.join(_ROOT, "tests"))
import numpy as np
from test_end2end import _expected_records, _check_two
from tomahawk_tpu.io.importer import ImportSettings, import_vcf
from tomahawk_tpu.compute.engine import CalcSettings, compute_ld

def make_ld_vcf(path, n_samples, n_sites, miss_frac, seed):
    """Sites come in correlated clusters: each cluster copies a base
    haplotype with per-site mutation noise -> real LD structure."""
    rng = np.random.default_rng(seed)
    lines = ["##fileformat=VCFv4.2",
             "##contig=<ID=c1,length=100000000>",
             '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(f"S{i}" for i in range(n_samples))]
    pos = 10_000
    sites = 0
    while sites < n_sites:
        k = int(rng.integers(2, 6))
        maf = float(rng.uniform(0.1, 0.5))
        base = rng.random(2 * n_samples) < maf
        for _ in range(min(k, n_sites - sites)):
            hap = base ^ (rng.random(2 * n_samples) < 0.05)
            pos += int(rng.integers(100, 1500))
            gt = []
            for s in range(n_samples):
                if rng.random() < miss_frac:
                    gt.append(".|.")
                else:
                    gt.append(f"{int(hap[2*s])}|{int(hap[2*s+1])}")
            lines.append(f"c1\t{pos}\t.\tA\tC\t.\tPASS\t.\tGT\t"
                         + "\t".join(gt))
            sites += 1
    open(path, "w").write("\n".join(lines) + "\n")

rng = random.Random(int(sys.argv[1]))
fails = 0
for trial in range(int(sys.argv[2])):
    seed = rng.randint(0, 10**6)
    n_samples = rng.choice([1024, 2504])
    mode = rng.choice(["phased", "mixed"])
    miss = rng.choice([0.0, 0.02])
    min_r2 = rng.choice([0.05, 0.1, 0.5])
    tmp = tempfile.mkdtemp()
    cfg = dict(seed=seed, n=n_samples, mode=mode, miss=miss, r2=min_r2)
    try:
        vcf, twk, two = f"{tmp}/t.vcf", f"{tmp}/t.twk", f"{tmp}/t.two"
        make_ld_vcf(vcf, n_samples, 24, miss, seed)
        import_vcf(ImportSettings(input=vcf, output=twk, block_size=6,
                                  threshold_miss=0.5))
        compute_ld(CalcSettings(input=twk, output=two,
                                force_phased=(mode == "phased"),
                                min_r2=min_r2, mesh="off"))
        want, _ = _expected_records(twk, mode, min_r2=min_r2)
        _check_two(two, want)
        print(f"trial {trial} OK ({len(want)} recs) {cfg}")
    except Exception as e:
        fails += 1
        print(f"trial {trial} FAIL {cfg}\n  {type(e).__name__}: {str(e)[:300]}")
print(f"{fails} failures")
