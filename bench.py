#!/usr/bin/env python
"""Benchmark: all-vs-all phased LD pair rate, single chip.

Mirrors the reference's headline benchmark configuration (1000 Genomes
phase-3 scale: 2,504 samples, phased, minR2 = 0.1; reference baseline
89,806,242 pairs/s on 8 CPU threads, docs/tutorial.md:185-191).

Synthetic genotypes with a realistic MAF spectrum are packed into the
engine's bit-plane block format; the timed region is the real compute
path used by `twk calc -p`: the fused two-pass device sweep (MXU
contingency count sweep + exact-offset survivor extraction), exact host
f64 math on survivors, and .two record emission.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PAIRS_PER_SEC = 89_806_242.0


def build_planes(n_blocks, B, n_samples, seed=0):
    from tomahawk_tpu.ops.bitpack import (BlockPlanes, _pack_bits,
                                          stack_planes, words_for)
    rng = np.random.default_rng(seed)
    Wh = words_for(2 * n_samples)
    Ws = words_for(n_samples)
    # beta-distributed MAF spectrum, folded to (0, 0.5]
    planes = []
    zero_s = np.zeros((B, Ws * 32), bool)
    one_s = np.ones((B, n_samples), bool)
    one_s = np.pad(one_s, ((0, 0), (0, Ws * 32 - n_samples)))
    pos0 = 0
    for b in range(n_blocks):
        maf = np.minimum(rng.beta(0.5, 2.0, size=B) * 0.5 + 1e-3, 0.5)
        alt = rng.random((B, 2 * n_samples)) < maf[:, None]
        pos = pos0 + np.cumsum(rng.integers(50, 500, B)).astype(np.int32)
        pos0 = int(pos[-1])
        planes.append(BlockPlanes(
            n_rec=B,
            alt_bits=_pack_bits(alt, Wh),
            miss_bits=_pack_bits(np.zeros_like(alt), Wh),
            het_bits=_pack_bits(zero_s[:, :n_samples], Ws),
            hom_bits=_pack_bits(zero_s[:, :n_samples], Ws),
            valid_bits=_pack_bits(one_s[:, :n_samples], Ws),
            pos=pos, rid=np.zeros(B, np.int32),
            ac=alt.sum(axis=1).astype(np.int32),
            an=np.zeros(B, np.int32),
            n_het=np.zeros(B, np.int32),
            n_hom=np.zeros(B, np.int32),
            hwe=np.ones(B, np.float32),
            has_missing=np.zeros(B, bool),
            valid=np.ones(B, bool)))
    return stack_planes(planes)


def build_planes_grouped(n_blocks, B, n_samples, seed=1, group=16,
                         flip=0.02):
    """LD-structured planes for the records-dense metric: every `group`
    consecutive variants share a haplotype template with `flip`
    per-haplotype perturbation, so in-group pairs carry r2 ~ 0.9 and
    flow through the FULL pipeline (survivor extraction, exact host
    math, record emission) instead of being prefiltered away."""
    from tomahawk_tpu.ops.bitpack import (BlockPlanes, _pack_bits,
                                          stack_planes, words_for)
    rng = np.random.default_rng(seed)
    Wh = words_for(2 * n_samples)
    Ws = words_for(n_samples)
    planes = []
    zero_s = np.zeros((B, Ws * 32), bool)
    one_s = np.ones((B, n_samples), bool)
    one_s = np.pad(one_s, ((0, 0), (0, Ws * 32 - n_samples)))
    pos0 = 0
    for b in range(n_blocks):
        n_grp = B // group
        maf = np.minimum(rng.beta(0.5, 2.0, size=n_grp) * 0.4 + 0.05, 0.5)
        base = rng.random((n_grp, 2 * n_samples)) < maf[:, None]
        alt = np.repeat(base, group, axis=0)
        alt ^= rng.random((B, 2 * n_samples)) < flip
        pos = pos0 + np.cumsum(rng.integers(50, 500, B)).astype(np.int32)
        pos0 = int(pos[-1])
        planes.append(BlockPlanes(
            n_rec=B,
            alt_bits=_pack_bits(alt, Wh),
            miss_bits=_pack_bits(np.zeros_like(alt), Wh),
            het_bits=_pack_bits(zero_s[:, :n_samples], Ws),
            hom_bits=_pack_bits(zero_s[:, :n_samples], Ws),
            valid_bits=_pack_bits(one_s[:, :n_samples], Ws),
            pos=pos, rid=np.zeros(B, np.int32),
            ac=alt.sum(axis=1).astype(np.int32),
            an=np.zeros(B, np.int32),
            n_het=np.zeros(B, np.int32),
            n_hom=np.zeros(B, np.int32),
            hwe=np.ones(B, np.float32),
            has_missing=np.zeros(B, bool),
            valid=np.ones(B, bool)))
    return stack_planes(planes)


def _ensure_backend():
    """The axon TPU plugin registers at interpreter start and its
    failures are swallowed (a later jax.devices() then raises). A fresh
    interpreter retries registration, so re-exec on failure."""
    try:
        import jax
        jax.devices()
        return
    except Exception as e:  # noqa: BLE001
        tries = int(os.environ.get("TWK_BENCH_RETRY", "0"))
        if tries >= 4:
            raise
        print(f"# backend init failed ({e}); retrying "
              f"({tries + 1}/4)...", file=sys.stderr)
        os.environ["TWK_BENCH_RETRY"] = str(tries + 1)
        time.sleep(15)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    _ensure_backend()
    n_samples = int(os.environ.get("BENCH_SAMPLES", 2504))
    B = int(os.environ.get("BENCH_BLOCK", 4096))
    n_blocks = int(os.environ.get("BENCH_NBLOCKS", 64))

    from tomahawk_tpu.compute.engine import CalcSettings, LdEngine
    from tomahawk_tpu.io.header import VcfContig, VcfHeader
    from tomahawk_tpu.io.two import TwoWriter
    from tomahawk_tpu.ops.ld_math import LdFilters
    from tomahawk_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    t0 = time.perf_counter()
    stacked = build_planes(n_blocks, B, n_samples)
    print(f"# data built in {time.perf_counter() - t0:.1f}s "
          f"({n_blocks}x{B} variants, {n_samples} samples, "
          f"device={jax.devices()[0].platform})", file=sys.stderr)

    settings = CalcSettings(min_r2=0.1)
    engine = LdEngine(stacked, n_samples, settings)
    filt = LdFilters(min_r2=0.1)

    pairs = [(i, j, i == j) for i in range(n_blocks)
             for j in range(i, n_blocks)]
    V = n_blocks * B
    n_pairs_total = V * (V - 1) // 2

    hdr = VcfHeader(samples=[f"S{i}" for i in range(n_samples)],
                    contigs=[VcfContig(idx=0, name="bench")])
    tmpdir = tempfile.mkdtemp()

    def run(tag):
        out = os.path.join(tmpdir, f"bench_{tag}.two")
        writer = TwoWriter(out, hdr)
        n_rec = [0]

        def emit(recs, rev=None):
            if len(recs):
                writer.add(recs)
                if rev is not None:
                    writer.add(rev)
                n_rec[0] += len(recs) * (2 if rev is not None else 1)

        t = time.perf_counter()
        engine.run_phased_pairs(pairs, False, filt, emit)
        writer.close()
        dt = time.perf_counter() - t
        return dt, n_rec[0]

    # warmup / compile
    wdt, _ = run("warmup")
    print(f"# warmup (incl. compile): {wdt:.1f}s", file=sys.stderr)
    # timed
    best = None
    for rep in range(2):
        dt, n_rec = run(f"rep{rep}")
        rate = n_pairs_total / dt
        print(f"# rep{rep}: {dt:.3f}s, {rate:,.0f} pairs/s, "
              f"{n_rec} records", file=sys.stderr)
        best = rate if best is None else max(best, rate)

    headline = json.dumps({
        "metric": "ld_pairs_per_sec_all_vs_all_phased_2504_samples",
        "value": round(best, 1),
        "unit": "pairs/s",
        "vs_baseline": round(best / BASELINE_PAIRS_PER_SEC, 3),
    })

    # second metric: records-DENSE full-pipeline rate (VERDICT round-3
    # task 7). LD-structured planes make ~0.5% of candidate pairs real
    # records, so this measures the sweep PLUS survivor transfer, exact
    # host math, and .two emission -- the path the sparse headline
    # barely touches.
    nbd = int(os.environ.get("BENCH_DENSE_NBLOCKS", 16))
    t0 = time.perf_counter()
    stacked_d = build_planes_grouped(nbd, B, n_samples)
    print(f"# dense data built in {time.perf_counter() - t0:.1f}s "
          f"({nbd}x{B} grouped variants)", file=sys.stderr)
    engine_d = LdEngine(stacked_d, n_samples, settings)
    pairs_d = [(i, j, i == j) for i in range(nbd) for j in range(i, nbd)]
    Vd = nbd * B
    n_pairs_d = Vd * (Vd - 1) // 2

    def run_dense(tag):
        out = os.path.join(tmpdir, f"bench_dense_{tag}.two")
        writer = TwoWriter(out, hdr)
        n_rec = [0]

        def emit(recs, rev=None):
            if len(recs):
                writer.add(recs)
                if rev is not None:
                    writer.add(rev)
                n_rec[0] += len(recs) * (2 if rev is not None else 1)

        t = time.perf_counter()
        engine_d.run_phased_pairs(pairs_d, False, filt, emit)
        writer.close()
        dt = time.perf_counter() - t
        return dt, n_rec[0]

    wdt, wn = run_dense("warmup")
    print(f"# dense warmup: {wdt:.1f}s ({wn} records)", file=sys.stderr)
    best_d, nr_d = None, 0
    for rep in range(2):
        dt, n_rec = run_dense(f"rep{rep}")
        rate = n_pairs_d / dt
        print(f"# dense rep{rep}: {dt:.3f}s, {rate:,.0f} pairs/s, "
              f"{n_rec} records ({n_rec / dt:,.0f} rec/s)",
              file=sys.stderr)
        if best_d is None or rate > best_d:
            best_d, nr_d = rate, n_rec

    print(json.dumps({
        "metric": "ld_pairs_per_sec_records_dense_phased_2504_samples",
        "value": round(best_d, 1),
        "unit": "pairs/s",
        "records": nr_d,
        "vs_baseline": round(best_d / BASELINE_PAIRS_PER_SEC, 3),
    }))
    # the headline stays LAST: the driver parses the final JSON line
    print(headline)


if __name__ == "__main__":
    main()
