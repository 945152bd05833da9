"""Randomized checkpoint/resume soak: random (samples, sites, mode,
missingness, banding, segmenting) calc configurations are crashed at
random segment boundaries -- possibly several times -- then resumed,
and the final output must equal an uninterrupted run record-for-record.

Usage: python tools/soak_checkpoint.py <seed> <n_trials>
"""

import os
import random
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np  # noqa: E402

from test_importer import make_vcf  # noqa: E402
from tomahawk_tpu.compute import engine as E  # noqa: E402
from tomahawk_tpu.io.importer import ImportSettings, import_vcf  # noqa: E402
from tomahawk_tpu.io.two import TwoReader  # noqa: E402


class _Crash(RuntimeError):
    pass


def run_with_crashes(settings, crash_points):
    """compute_ld, raising _Crash after each count in crash_points,
    then one final uninterrupted resume."""
    orig = E.LdEngine._run_segment
    for point in crash_points:
        calls = [0]

        def wrapper(self, *a, _p=point, _c=calls, **kw):
            if _c[0] >= _p:
                raise _Crash()
            _c[0] += 1
            return orig(self, *a, **kw)

        E.LdEngine._run_segment = wrapper
        try:
            E.compute_ld(settings)
            return  # finished before the crash point
        except _Crash:
            pass
        finally:
            E.LdEngine._run_segment = orig
    E.compute_ld(settings)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = random.Random(seed)
    n_fail = 0
    for trial in range(n_trials):
        cfg = dict(
            n_samples=rng.choice([13, 32, 64]),
            n_sites=rng.choice([80, 150, 250]),
            miss=rng.choice([0.0, 0.05]),
            mode=rng.choice(["phased", "unphased", "mixed"]),
            window=rng.choice([None, 30_000]),
            block=rng.choice([8, 16]),
            memory_gb=rng.choice([12.0, 3e-5]),
            seg=rng.choice([16, 32]),
            crashes=sorted(rng.sample(range(1, 14),
                                      rng.choice([1, 1, 2, 3]))),
        )
        with tempfile.TemporaryDirectory() as tmp:
            vcf = f"{tmp}/in.vcf"
            make_vcf(vcf, n_samples=cfg["n_samples"],
                     n_sites=cfg["n_sites"], seed=seed * 1000 + trial,
                     miss_frac=cfg["miss"], contigs=("20",))
            twk = f"{tmp}/in.twk"
            import_vcf(ImportSettings(input=vcf, output=twk,
                                      block_size=cfg["block"]))
            base = dict(
                input=twk, min_r2=0.0, min_p=1.0, mesh="off",
                tile_rows=16, sweep_segment=cfg["seg"],
                memory_gb=cfg["memory_gb"],
                force_phased=cfg["mode"] == "phased",
                forced_unphased=cfg["mode"] == "unphased",
                window=cfg["window"] is not None,
                l_window=cfg["window"] or 1_000_000)
            E.compute_ld(E.CalcSettings(output=f"{tmp}/ref.two", **base))
            ck = f"{tmp}/calc.ckpt"
            run_with_crashes(
                E.CalcSettings(output=f"{tmp}/ck.two", checkpoint=ck,
                               checkpoint_interval=0.0, **base),
                cfg["crashes"])
            ok = not os.path.exists(ck)
            a = TwoReader(f"{tmp}/ref.two").records()
            b = TwoReader(f"{tmp}/ck.two").records()
            ok = ok and len(a) == len(b)
            if ok:
                for f in a.dtype.names:
                    if not np.array_equal(a[f], b[f]):
                        ok = False
                        break
            if ok:
                print(f"trial {trial}: OK ({len(a)} recs) {cfg}",
                      flush=True)
            else:
                n_fail += 1
                print(f"trial {trial}: FAIL {cfg} "
                      f"(ref={len(a)} ck={len(b)})", flush=True)
    print(f"done: {n_trials - n_fail}/{n_trials} OK")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
