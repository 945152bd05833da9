"""Randomized scalc (single-site LD) soak vs the brute-force oracle.
Usage: python tools/soak_scalc.py <seed> <n_trials>."""

import sys, os, random, tempfile
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT); sys.path.insert(0, os.path.join(_ROOT, "tests"))
import numpy as np
from test_importer import make_vcf
from tomahawk_tpu.io.importer import ImportSettings, import_vcf
from tomahawk_tpu.io.twk import TwkReader
from tomahawk_tpu.io.two import TwoReader
from tomahawk_tpu.compute.scalc import ScalcSettings, compute_single
from oracles import counts_from_codes, phased_math_oracle, unphased_math_oracle

rng = random.Random(int(sys.argv[1]))
fails = 0
for trial in range(int(sys.argv[2])):
    seed = rng.randint(0, 10**6)
    n_samples = rng.choice([20, 64])
    miss = rng.choice([0.0, 0.05])
    min_r2 = rng.choice([0.0, 0.1])
    lsur = rng.choice([2000, 6000])
    tmp = tempfile.mkdtemp()
    try:
        vcf, twk, two = f"{tmp}/t.vcf", f"{tmp}/t.twk", f"{tmp}/t.two"
        make_vcf(vcf, n_samples=n_samples, n_sites=40, miss_frac=miss, seed=seed)
        import_vcf(ImportSettings(input=vcf, output=twk, block_size=6, threshold_miss=0.5))
        tr = TwkReader(twk)
        recs = list(tr.records())
        target = rng.choice(recs)
        contig = tr.header.contigs[target.rid].name
        compute_single(ScalcSettings(input=twk, output=two,
                                     interval=f"{contig}:{target.pos + 1}",
                                     l_surrounding=lsur, min_r2=min_r2))
        # oracle: target vs neighbours within +-lsur
        want = {}
        for other in recs:
            if other.rid != target.rid or other.pos == target.pos \
                    or abs(other.pos - target.pos) > lsur:
                continue
            hap, T = counts_from_codes(target.decode_codes(), other.decode_codes())
            if target.an > 0 or other.an > 0:
                res = unphased_math_oracle(T, min_r2=min_r2)
            else:
                res = phased_math_oracle(hap, min_r2=min_r2)
            if res is not None and target.ac + other.ac > 2:
                want[(other.rid, other.pos)] = res
        r = TwoReader(two); got = r.records(); r.close()
        fwd = got[(got["packA"] >> 2) == target.pos]
        got_keys = set((int(x["ridB"]), int(x["packB"]) >> 2) for x in fwd)
        assert got_keys == set(want), (sorted(got_keys), sorted(want))
        for x in fwd:
            o = want[(int(x["ridB"]), int(x["packB"]) >> 2)]
            assert abs(x["R2"] - o["R2"]) < 1e-6, (x["R2"], o["R2"])
        print(f"trial {trial} OK ({len(want)} neighbours)")
    except Exception as e:
        fails += 1
        print(f"trial {trial} FAIL seed={seed} n={n_samples} miss={miss} r2={min_r2} l={lsur}\n  {type(e).__name__}: {str(e)[:400]}")
print(f"{fails} failures")
