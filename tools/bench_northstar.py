#!/usr/bin/env python
"""North-star config: all-vs-all phased LD at 1M variants x 100k
samples, single chip, memory-banded (BASELINE.json config 5 without the
multi-host shard axis).

The bitpacked planes for this workload are ~25 GB -- bigger than HBM --
so the run exercises the production band-streaming path (LdEngine band
residency + _plan_loads schedule). Plane data is GENERATED ON DEVICE
per band (deterministic per super-block id, MAF classes 0.5/0.25/
0.125/0.0625 by AND-ing random word planes): over this container's
tunneled device link (~8 MB/s) host uploads of 25 GB x O(n_bands)
re-loads would take days and measure the tunnel, not the engine. On
real hardware the same path runs from host DMA; the sweep, banding,
scheduling, and output machinery here are exactly the production ones
(the engine accepts device-resident band planes natively).

Usage: python tools/bench_northstar.py [--supers N] [--samples N]
       [--memory-gb G]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--supers", type=int, default=245,
                    help="super-blocks of 4096 variants (245 ~ 1M)")
    ap.add_argument("--samples", type=int, default=100_000)
    ap.add_argument("--memory-gb", type=float, default=9.0)
    ap.add_argument("--min-r2", type=float, default=0.1)
    args = ap.parse_args()

    from tomahawk_tpu.compute.engine import (CalcSettings, LdEngine,
                                             _plan_loads, dispatch_pairs)
    from tomahawk_tpu.ops.bitpack import words_for
    from tomahawk_tpu.ops.ld_math import LdFilters
    from tomahawk_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    B = 4096
    NS = args.samples
    Wh = words_for(2 * NS)
    n_sup = args.supers
    V = n_sup * B
    dev = jax.devices()[0]
    print(f"# {V:,} variants x {NS:,} samples; alt planes "
          f"{n_sup * B * Wh * 4 / 2**30:.1f} GiB total, device={dev.platform}",
          flush=True)

    # final-word mask so padding bits beyond 2N stay zero
    tail_mask = np.full(Wh, 0xFFFFFFFF, np.uint64)
    used = 2 * NS
    for w in range(Wh):
        lo = w * 32
        bits = min(32, max(0, used - lo))
        tail_mask[w] = (1 << bits) - 1 if bits < 32 else 0xFFFFFFFF
    tail_mask = jnp.asarray(tail_mask.astype(np.uint32))

    @jax.jit
    def gen_super(seed):
        """[B, Wh] uint32 alt plane + [B] int32 ac, deterministic."""
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        # 4 stacked AND-cumulative random planes -> MAF classes
        r = jax.random.bits(k1, (4, B, Wh), jnp.uint32)
        cum = jax.lax.associative_scan(jnp.bitwise_and, r, axis=0)
        cls = jax.random.randint(k2, (B,), 0, 4)
        alt = jnp.take_along_axis(cum, cls[None, :, None], axis=0)[0]
        alt = alt & tail_mask[None, :]
        ac = jax.lax.population_count(alt).sum(axis=1).astype(jnp.int32)
        return alt, ac

    settings = CalcSettings(min_r2=args.min_r2, memory_gb=args.memory_gb,
                            mesh="off")
    per_super = B * Wh * 4  # phased/no-missing: only the alt plane lives
    budget = max(2, int(args.memory_gb * (1 << 30) / 2 / per_super))
    super_ids = list(range(n_sup))
    pairs = [(i, j, i == j) for i in range(n_sup) for j in range(i, n_sup)]
    bands, loads = _plan_loads(super_ids, pairs, budget)
    print(f"# {len(bands)} bands (<= {budget // 2} supers), "
          f"{len(loads)} band-pair loads, {len(pairs)} tiles", flush=True)

    engine = LdEngine(None, NS, settings, mesh=None, B=B)
    filt = LdFilters(min_r2=args.min_r2)
    zero_words = np.broadcast_to(np.zeros(1, np.uint32), (0,))

    def gen_band(bid, ids):
        nb = len(ids)
        alts = []
        acs = []
        for g in ids:
            alt, ac = gen_super(g)
            alts.append(alt)
            acs.append(np.asarray(ac))
        alt_dev = jnp.stack(alts)
        ac_h = np.stack(acs)
        z_b = np.zeros((nb, B), np.int32)
        stacked = dict(
            alt_bits=alt_dev,
            # untouched by the phased/no-missing sweep config
            miss_bits=np.broadcast_to(np.uint32(0), (nb, B, 1)),
            het_bits=np.broadcast_to(np.uint32(0), (nb, B, 1)),
            hom_bits=np.broadcast_to(np.uint32(0), (nb, B, 1)),
            valid_bits=np.broadcast_to(np.uint32(0), (nb, B, 1)),
            pos=np.arange(nb * B, dtype=np.int32).reshape(nb, B),
            rid=z_b, an=z_b, n_het=z_b, n_hom=z_b,
            ac=ac_h.astype(np.int32),
            hwe=np.ones((nb, B), np.float32),
            has_missing=np.zeros((nb, B), bool),
            valid=np.ones((nb, B), bool),
            n_rec=np.full(nb, B, np.int32),
        )
        return stacked

    n_out = [0]

    def emit(recs, rev=None):
        n_out[0] += 2 * len(recs)

    total_pairs = V * (V - 1) // 2
    t0 = time.perf_counter()
    n_cand = 0
    done_tiles = 0
    for li, ((p, q), load_tiles) in enumerate(loads):
        load = [(p, None if p in engine._band_host
                 else gen_band(p, bands[p]))]
        if q != p:
            load.append((q, None if q in engine._band_host
                         else gen_band(q, bands[q])))
        engine.set_load(load)
        load_ids = bands[p] if p == q else bands[p] + bands[q]
        slot = {g: s for s, g in enumerate(load_ids)}
        tiles = [(slot[i], slot[j], d) for i, j, d in load_tiles]
        n_cand += dispatch_pairs(engine, tiles, "phased", filt, emit,
                                 engine.stacked)
        done_tiles += len(tiles)
        el = time.perf_counter() - t0
        est = el / done_tiles * (len(pairs) - done_tiles)
        print(f"# load {li + 1}/{len(loads)} bands=({p},{q}) "
              f"tiles={done_tiles}/{len(pairs)} "
              f"elapsed={el:.0f}s eta={est:.0f}s", flush=True)
    dt = time.perf_counter() - t0
    stats = getattr(dev, "memory_stats", lambda: None)()
    peak = (stats or {}).get("peak_bytes_in_use", 0)
    print(f"# DONE: {total_pairs:,} pairs in {dt:.1f}s -> "
          f"{total_pairs / dt:,.0f} pairs/s; candidates {n_cand:,}; "
          f"records {n_out[0]:,}; band gen/loads: "
          f"{engine.n_band_uploads} plane installs; "
          f"peak HBM {peak / 2**30:.1f} GiB", flush=True)
    for k, s in engine.stats.items():
        print(f"#   {k}: tiles={s['n_tiles']} sweep={s['count_s']:.1f}s "
              f"extract={s['extract_s']:.1f}s math={s['math_s']:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
