"""Randomized golden soak against the REFERENCE BINARY: random
(samples, sites, phasing, missingness, block size, mode, window)
configurations are imported and calc'd by BOTH implementations and
compared record-by-record.

The constraints baked in reflect the reference's own limits found
during golden testing (tests/test_golden_ref.py):
  - forced-phased with missing data is excluded (the reference's
    PhasedVectorized missing kernel emits garbage counts);
  - windowed runs use block_size=1 imports (the reference's windowed
    `goto end_cycle` drops pairs when a block spans > l_window);
  - ChiSqModel is excluded on unphased records (reference dead store).

Usage: python tools/soak_golden.py <seed> <n_trials>
"""

import os
import random
import subprocess
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np  # noqa: E402

import jax  # noqa: E402

from test_importer import make_vcf  # noqa: E402
from tomahawk_tpu.compute.engine import CalcSettings, compute_ld  # noqa: E402
from tomahawk_tpu.io.importer import ImportSettings, import_vcf  # noqa: E402
from tomahawk_tpu.io.twk import TwkReader  # noqa: E402
from tomahawk_tpu.io.two import TwoReader  # noqa: E402

REF_BIN = os.path.join(_ROOT, "tools", "refbuild", "build", "tomahawk")
TOL = 1e-5


def run_ref(*args):
    proc = subprocess.run([REF_BIN, *args], capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"reference failed: {args}\n{proc.stderr[-2000:]}")


def load(path):
    with TwoReader(path) as r:
        return r.records()


def canonical(recs):
    order = np.lexsort((recs["packB"] >> 2, recs["packA"] >> 2,
                        recs["ridB"], recs["ridA"]))
    return recs[order]


def _discriminant_knife_edge(T):
    """True when the unphased cubic's discriminant sits at the 3-case
    boundary within f64 noise — the root SET then depends on rounding
    in both implementations, and a keep/drop disagreement is expected
    (see tools/soak.py knife-edge notes)."""
    import math
    T = np.asarray(T, np.float64)
    n = T.sum()
    if n < 5 or T[1, 1] == 0:
        return False
    p = (2 * T[0].sum() + T[1].sum()) / (2 * n)
    q = (2 * T[:, 0].sum() + T[:, 1].sum()) / (2 * n)
    n11 = 2 * T[0, 0] + T[0, 1] + T[1, 0]
    a = 4 * n
    b = 2 * n * (1 - 2 * p - 2 * q) - 2 * n11 - T[1, 1]
    c = -n11 * (1 - 2 * p - 2 * q) - T[1, 1] * (1 - p - q) + 2 * n * p * q
    dee = -n11 * p * q
    xN = -b / (3 * a)
    d2 = (b * b - 3 * a * c) / (9 * a * a)
    yN = a * xN ** 3 + b * xN ** 2 + c * xN + dee
    yN2, h2 = yN * yN, 4 * a * a * d2 ** 3
    scale = max(abs(yN2), abs(h2), 1e-300)
    return abs(yN2 - h2) / scale < 1e-9


def _guard_knife_edge(T):
    """The rarer-corner guard compares a 3-term sum of f64-estimated
    haplotype counts against the integer 5 (ChooseF11Calculate,
    reference ld_engine.cpp:1632-1645); when that sum sits at 5 within
    f64 noise, the last-ulp difference between each implementation's
    cubic root flips keep/drop (seen in soak trial: f21 = q - f11
    rounded to -1e-14, giving guard = 5 - 1e-14 on one side and
    5 + eps on the other)."""
    from tomahawk_tpu.ops.ld_math import solve_unphased_f11
    T = np.asarray(T, np.int64)[None]
    if T[0].sum() < 5 or T[0, 1, 1] == 0:
        return False
    f11, p, q, n, valid, _, _ = solve_unphased_f11(T)
    if not valid[0]:
        return False
    two_n = 2.0 * n[0]
    c0 = f11[0] * two_n
    c1 = (p[0] - f11[0]) * two_n
    c2 = (q[0] - f11[0]) * two_n
    c3 = (1.0 - (f11[0] + (p[0] - f11[0]) + (q[0] - f11[0]))) * two_n
    guard = c1 + c2 + (c0 if c0 < c3 else c3)
    return abs(guard - 5.0) < 1e-6


def _drop_knife_edge_pairs(ours, ref, codes, cfg):
    """Remove records for pairs present in only one output, asserting
    each such pair is a discriminant or guard-boundary knife edge."""
    from oracles import counts_from_codes

    def keyset(arr):
        return {(int(r["ridA"]), int(r["packA"]) >> 2,
                 int(r["ridB"]), int(r["packB"]) >> 2) for r in arr}

    ka, kb = keyset(ours), keyset(ref)
    diff = ka ^ kb
    if not diff:
        return ours, ref
    for k in diff:
        fk = min((k[0], k[1], k[2], k[3]),
                 (k[2], k[3], k[0], k[1]))
        _, T = counts_from_codes(codes[(fk[0], fk[1])],
                                 codes[(fk[2], fk[3])])
        assert _discriminant_knife_edge(T) or _guard_knife_edge(T), \
            (cfg, "keep/drop disagreement on a non-knife-edge pair",
             k, T.ravel())

    def mask(arr, keep):
        m = np.array([(int(r["ridA"]), int(r["packA"]) >> 2,
                       int(r["ridB"]), int(r["packB"]) >> 2) in keep
                      for r in arr])
        return arr[m]

    common = ka & kb
    return mask(ours, common), mask(ref, common)


def compare(ours, ref, cfg, two_n, codes=None):
    if len(ours) != len(ref) and codes is not None:
        ours, ref = _drop_knife_edge_pairs(ours, ref, codes, cfg)
    assert len(ours) == len(ref), \
        (cfg, "record count", len(ours), len(ref))
    a, b = canonical(ours), canonical(ref)
    # knife edge: symmetric unphased tables have two EM roots with
    # equal chi2 and opposite-sign D; which one wins is f64 noise in
    # BOTH implementations (see tools/soak.py). Drop those records.
    tie = ((a["controller"] & 1) == 0) & \
        (np.abs(a["D"] + b["D"]) < 1e-9) & \
        (np.abs(np.abs(a["D"]) - np.abs(b["D"])) < 1e-9) & \
        (np.abs(a["R2"] - b["R2"]) < 1e-7) & (np.abs(a["D"]) > 0)
    # knife edge: Fisher P (and the count-derived flags) use ROUNDED
    # estimated counts; a count within the EM boundary slop of a .5
    # rounding boundary rounds differently between implementations
    slop = 2 * two_n * 2e-5 + 1e-9
    frac = np.abs(a["cnt"] - np.floor(a["cnt"]) - 0.5)
    boundary = (frac < slop) | (np.abs(a["cnt"] - 1.0) < slop)
    halfway = ((a["controller"] & 1) == 0) & boundary.any(axis=1)
    drop = tie | halfway
    if drop.any():
        a, b = a[~drop], b[~drop]
    if not len(a):
        return          # every record was a pinned knife edge
    for f in a.dtype.names:
        va, vb = a[f], b[f]
        if f == "ChiSqModel":
            unphased = (b["controller"] & 1) == 0
            assert (np.atleast_1d(vb)[unphased] == 0).all()
            va, vb = va[~unphased], vb[~unphased]
        if len(np.atleast_1d(va)) == 0:
            continue        # e.g. ChiSqModel on an all-unphased trial
        if va.dtype.kind == "f":
            # cnt carries 2n-scaled haplotype frequencies, and the
            # reference itself accepts EM roots within +-1e-5 in
            # FREQUENCY space (ld_engine.cpp biological bound slop), so
            # count equality holds only to 2n x that slop
            # cnt and ChiSqFisher (= total * r2) scale with 2n, so the
            # reference's +-1e-5 frequency slop scales with them
            atol = 2 * two_n * 1e-5 if f in ("cnt", "ChiSqFisher") \
                else TOL
            ok = np.isclose(va, vb, rtol=0, atol=atol) | \
                (np.isnan(va) & np.isnan(vb))
            if f == "Dprime":
                # documented knife edge: D' ~ 1 with dmax ~ 0 amplifies
                # the EM boundary slop; both sides sit at 1 +- eps
                near1 = (np.abs(np.abs(va) - 1) < 1e-3) & \
                    (np.abs(np.abs(vb) - 1) < 1e-3)
                ok |= near1
            bad = ~ok.reshape(len(va), -1).all(1)
            assert ok.all(), (cfg, f, list(zip(
                np.atleast_2d(va[bad])[:3].tolist(),
                np.atleast_2d(vb[bad])[:3].tolist())))
        elif f == "controller":
            # knife edge: FLAG_MULTIPLE_ROOTS (bit 5) counts EM roots
            # that fall within the +-1e-5 biological-bound slop; on
            # boundary roots (a ~0 estimated count) the two f64
            # implementations can count them differently
            boundary = (np.abs(a["cnt"]).min(axis=1) < 1e-2) & \
                ((a["controller"] & 1) == 0)
            mask = np.where(boundary, ~np.uint16(32), np.uint16(0xFFFF))
            if codes is not None:
                # knife edge: bit 5 also flips when the cubic
                # discriminant sits at the 1-root/3-root case boundary
                # within f64 noise -- the root COUNT is then
                # rounding-dependent even though the chosen root (and
                # every emitted statistic) agrees to 1e-10
                from oracles import counts_from_codes
                for i in np.flatnonzero((va & mask) != (vb & mask)):
                    if (int(va[i]) ^ int(vb[i])) & ~32 or va[i] & 1:
                        continue    # only pure bit-5 unphased diffs
                    _, T = counts_from_codes(
                        codes[(int(a["ridA"][i]),
                               int(a["packA"][i]) >> 2)],
                        codes[(int(a["ridB"][i]),
                               int(a["packB"][i]) >> 2)])
                    if _discriminant_knife_edge(T):
                        mask[i] &= ~np.uint16(32)
            assert np.array_equal(va & mask, vb & mask), (cfg, f)
        else:
            assert np.array_equal(va, vb), (cfg, f)


def main():
    if not os.path.exists(REF_BIN):
        r = subprocess.run(
            ["bash", os.path.join(_ROOT, "tools", "refbuild",
                                  "build_reference.sh")],
            capture_output=True, text=True)
        if r.returncode != 0:
            sys.exit("cannot build the reference oracle:\n"
                     + r.stderr[-2000:])
    rng = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
    n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpu = jax.devices("cpu")[0]
    n_fail = 0
    for trial in range(n_trials):
        seed = rng.randint(0, 10**6)
        n_samples = rng.choice([17, 32, 61, 120])
        n_sites = rng.choice([40, 80, 150])
        phased = rng.choice([True, False])
        miss = rng.choice([0.0, 0.04, 0.1])
        window = rng.choice([None, None, 2500])
        # reference constraint: forced-phased + missing is broken there
        mode = rng.choice(["unphased", "mixed"] if miss > 0
                          else ["phased", "unphased", "mixed"])
        if window is not None:
            mode = "phased" if miss == 0.0 else None
        if mode is None:
            window = None
            mode = "unphased"
        # windowed trials must use block=1: with blocks > 1 record the
        # reference's windowed slaves abandon the whole remaining block
        # pair on the first out-of-window pair (goto end_cycle,
        # ld_engine.cpp:2554-2560/2586-2588), silently dropping
        # in-window pairs -- its semantics are only exact at block=1
        block = 1 if window is not None else rng.choice([5, 17, 500])
        # reference windowed quirk: its per-pair window check only
        # applies to same-rid pairs, so it COMPUTES cross-contig pairs
        # in windowed mode (ld_engine.cpp:2553); keep windowed trials
        # single-contig (our windowed mode is same-contig by design)
        contigs = (("20",) if window is not None
                   else rng.choice([("20",), ("20", "21")]))
        cfg = dict(trial=trial, seed=seed, n_samples=n_samples,
                   n_sites=n_sites, phased=phased, miss=miss, mode=mode,
                   window=window, block=block, contigs=contigs)
        tmp = tempfile.mkdtemp()
        try:
            vcf = f"{tmp}/t.vcf"
            make_vcf(vcf, n_samples=n_samples, n_sites=n_sites,
                     miss_frac=miss, seed=seed, phased=phased,
                     contigs=contigs)
            thresh = rng.choice([0.5, 0.9])
            twk = f"{tmp}/t.twk"
            import_vcf(ImportSettings(input=vcf, output=twk,
                                      block_size=block,
                                      threshold_miss=thresh))
            ref_twk = f"{tmp}/r.twk"
            run_ref("import", "-i", vcf, "-o", ref_twk[:-4],
                    "-b", str(block), "-n", str(thresh))
            # .twk parity first
            with TwkReader(twk) as A, TwkReader(ref_twk) as B:
                ra, rb = list(A.records()), list(B.records())
            codes = {(x.rid, x.pos): x.decode_codes() for x in ra}
            assert len(ra) == len(rb), (cfg, "twk count")
            for x, y in zip(ra, rb):
                assert (x.pos, x.rid, x.ac, x.an, x.alleles,
                        x.gt_ptype) == \
                    (y.pos, y.rid, y.ac, y.an, y.alleles, y.gt_ptype), cfg
                assert np.array_equal(x.gt_runs, y.gt_runs), (cfg, x.pos)

            flags = {"phased": ["-p"], "unphased": ["-u"],
                     "mixed": []}[mode]
            ref_two = f"{tmp}/r.two"
            wargs = ["-w", str(window)] if window else []
            run_ref("calc", "-i", ref_twk, "-o", ref_two, "-t", "1",
                    "-r", "0.0", "-P", "1", *flags, *wargs)
            two = f"{tmp}/t.two"
            with jax.default_device(cpu):
                compute_ld(CalcSettings(
                    input=twk, output=two, min_r2=0.0, min_p=1.0,
                    force_phased=mode == "phased",
                    forced_unphased=mode == "unphased",
                    window=window is not None,
                    l_window=window or 1_000_000, mesh="off"))
            compare(load(two), load(ref_two), cfg, 2 * n_samples,
                    codes=codes)
            print(f"trial {trial}: OK {cfg}", flush=True)
        except AssertionError as e:
            n_fail += 1
            print(f"trial {trial}: FAIL {e}", flush=True)
        finally:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
    print(f"done: {n_trials - n_fail}/{n_trials} OK")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
