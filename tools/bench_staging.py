#!/usr/bin/env python
"""Real host->device band staging benchmark (round-2 VERDICT task 4).

Unlike tools/bench_northstar.py -- which regenerates evicted bands ON
DEVICE because a full 25 GB x O(n_bands) plane stream would measure
this container's tunneled link rather than the engine -- this bench
keeps every genotype plane in HOST memory and streams bands through the
production staging path: `LdEngine.stage_band_async` inflates/uploads
the NEXT load's band on the staging worker while the current load's
sweeps run, exactly as `compute_ld` does for banded runs
(reference low-memory analogue: ld_engine.cpp:1871-1896, which
re-inflates per tile on the compute threads with no overlap).

Reported: wall, device sweep time, bytes staged, upload seconds that
overlapped compute (hidden) vs blocked the main thread (exposed), and
the staging-exposed fraction of wall. Workload is sized so one band
upload ~ one load's compute on a tunnel-class link; on real PCIe the
same path is transfer-bound only below ~1000x smaller compute/byte.

Usage: python tools/bench_staging.py [--samples N] [--supers N]
       [--memory-gb G] [--no-prefetch]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=5000)
    ap.add_argument("--supers", type=int, default=144,
                    help="super-blocks of 4096 variants")
    ap.add_argument("--memory-gb", type=float, default=1.5,
                    help="plane budget; sized so bands stream")
    ap.add_argument("--min-r2", type=float, default=0.1)
    ap.add_argument("--no-prefetch", action="store_true",
                    help="serial staging (no overlap), for comparison")
    args = ap.parse_args()

    from tomahawk_tpu.compute.engine import (CalcSettings, LdEngine,
                                             _plan_loads, dispatch_pairs)
    from tomahawk_tpu.ops.bitpack import words_for
    from tomahawk_tpu.ops.ld_math import LdFilters
    from tomahawk_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    B = 4096
    NS = args.samples
    Wh = words_for(2 * NS)
    n_sup = args.supers
    V = n_sup * B
    prefetch = not args.no_prefetch
    dev = jax.devices()[0]

    per_super = B * Wh * 4  # phased/no-missing: only the alt plane
    budget = max(2, int(args.memory_gb * (1 << 30) / 2 / per_super))
    super_ids = list(range(n_sup))
    pairs = [(i, j, i == j) for i in range(n_sup) for j in range(i, n_sup)]
    bands, loads = _plan_loads(super_ids, pairs, budget,
                               parts=3 if prefetch else 2)
    print(f"# {V:,} variants x {NS:,} samples on {dev.platform}; "
          f"host planes {n_sup * per_super / 2**30:.2f} GiB, "
          f"{len(bands)} bands, {len(loads)} loads, "
          f"prefetch={'on' if prefetch else 'off'}", flush=True)
    if len(loads) < 3:
        print("# WARNING: workload fits nearly in budget; staging is "
              "trivial here -- raise --supers or cut --memory-gb")

    # final-word tail mask so padding bits beyond 2N stay zero
    tail = np.full(Wh, 0xFFFFFFFF, np.uint32)
    used = 2 * NS
    for w in range(Wh):
        bits = min(32, max(0, used - w * 32))
        tail[w] = np.uint32((1 << bits) - 1 if bits < 32 else 0xFFFFFFFF)

    gen_s = [0.0]

    def gen_band(bid, ids):
        """HOST plane generation for one band (the inflate analogue):
        random word planes AND-ed into 4 MAF classes, deterministic."""
        t0 = time.perf_counter()
        nb = len(ids)
        rng = np.random.default_rng(1000 + bid)
        alt = rng.integers(0, 1 << 32, size=(nb, B, Wh), dtype=np.uint32)
        # thin rows into MAF classes by AND-ing extra draws
        for extra in range(1, 4):
            sel = rng.integers(0, 4, size=nb * B).reshape(nb, B) >= extra
            more = rng.integers(0, 1 << 32, size=(nb, B, Wh),
                                dtype=np.uint32)
            alt &= np.where(sel[:, :, None], more, 0xFFFFFFFF)
        alt &= tail[None, None, :]
        # 16-bit popcount LUT (unpackbits would transiently 8x the band)
        lut = np.array([bin(i).count("1") for i in range(1 << 16)],
                       np.uint8)
        ac = lut[alt.view(np.uint16)].sum(axis=-1,
                                          dtype=np.int64).astype(np.int32)
        z_b = np.zeros((nb, B), np.int32)
        zero_w = np.broadcast_to(np.uint32(0), (nb, B, 1))
        stacked = dict(
            alt_bits=alt, miss_bits=zero_w, het_bits=zero_w,
            hom_bits=zero_w, valid_bits=zero_w,
            pos=np.arange(nb * B, dtype=np.int32).reshape(nb, B),
            rid=z_b, an=z_b, n_het=z_b, n_hom=z_b, ac=ac,
            hwe=np.ones((nb, B), np.float32),
            has_missing=np.zeros((nb, B), bool),
            valid=np.ones((nb, B), bool),
            n_rec=np.full(nb, B, np.int32),
        )
        gen_s[0] += time.perf_counter() - t0
        return stacked

    settings = CalcSettings(min_r2=args.min_r2,
                            memory_gb=args.memory_gb, mesh="off")
    engine = LdEngine(None, NS, settings, mesh=None, B=B)
    if prefetch:
        engine.MAX_RESIDENT_BANDS = 3
    filt = LdFilters(min_r2=args.min_r2)
    n_out = [0]

    def emit(recs, rev=None):
        n_out[0] += 2 * len(recs)

    total_pairs = V * (V - 1) // 2
    t0 = time.perf_counter()
    n_cand = 0
    done = 0
    for li, ((p, q), load_tiles) in enumerate(loads):
        engine.stage_wait()
        load = [(p, None if p in engine._band_host
                 else gen_band(p, bands[p]))]
        if q != p:
            load.append((q, None if q in engine._band_host
                         else gen_band(q, bands[q])))
        engine.set_load(load)
        if prefetch and li + 1 < len(loads):
            for b in set(loads[li + 1][0]):
                if b not in engine._band_host:
                    engine.stage_band_async(
                        b, lambda b=b: gen_band(b, bands[b]))
        load_ids = bands[p] if p == q else bands[p] + bands[q]
        slot = {g: s for s, g in enumerate(load_ids)}
        tiles = [(slot[i], slot[j], d) for i, j, d in load_tiles]
        n_cand += dispatch_pairs(engine, tiles, "phased", filt, emit,
                                 engine.stacked)
        done += len(tiles)
        el = time.perf_counter() - t0
        print(f"# load {li + 1}/{len(loads)} bands=({p},{q}) "
              f"tiles={done}/{len(pairs)} elapsed={el:.0f}s", flush=True)
    engine.stage_close()
    dt = time.perf_counter() - t0

    ss = engine.stage_stats
    sweep_s = sum(s["count_s"] for s in engine.stats.values())
    exposed = ss["exposed_s"] + ss["wait_s"]
    print(f"# DONE: {total_pairs:,} pairs in {dt:.1f}s = "
          f"{total_pairs / dt:,.0f} pairs/s; candidates {n_cand:,}; "
          f"records {n_out[0]:,}")
    print(f"# staging: {ss['bytes'] / 2**20:.0f} MB in "
          f"{engine.n_band_uploads} plane uploads; "
          f"{ss['hidden_s']:.1f}s hidden behind compute "
          f"({ss['n_prefetched']} prefetched bands), "
          f"{ss['exposed_s']:.1f}s blocking + {ss['wait_s']:.1f}s "
          f"prefetch wait = {exposed:.1f}s exposed")
    print(f"# host plane generation (inflate analogue): {gen_s[0]:.1f}s "
          f"total (overlapped portion included in hidden staging)")
    print(f"# device sweep {sweep_s:.1f}s of {dt:.1f}s wall; "
          f"staging-exposed fraction {exposed / dt:.1%}")


if __name__ == "__main__":
    main()
