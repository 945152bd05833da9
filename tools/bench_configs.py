#!/usr/bin/env python
"""BASELINE.json reference-comparable configs 3 and 4, single chip.

config3: unphased genotypes with EM phasing fallback, 50k variants x
         10k samples, all-vs-all (BASELINE.json configs[2]).
config4: windowed/region LD at 500k variants x 100k samples plus a
         `twk aggregate` rasterization of the output
         (BASELINE.json configs[3]).

Configs 1/2 are covered by the golden-reference pytest suite and
bench.py; config 5 (the 1M x 100k north star) by bench_northstar.py.

config4 generates its alt planes on device (same rationale as
bench_northstar.py: at 100k samples the planes are ~12.6 GiB and this
container's tunneled device link moves ~8 MB/s; on real hardware the
identical engine path runs from host DMA). Positions are a fixed
275 bp lattice, matching 1KGP chr6 density (~290 bp/variant,
reference docs/tutorial.md:246-253).

Usage: python tools/bench_configs.py [config3|config4|all]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _ensure_backend  # noqa: E402

REF_ALLVSALL = 89_806_242.0   # pairs/s, 8 threads (docs/tutorial.md:185-191)
REF_WINDOWED = 72_104_114.0   # pairs/s, 8 threads (docs/tutorial.md:246-253)
REF_AGG_PASS = 10_600_000.0   # rec/s/pass, 4 threads (docs/tutorial.md:683-694)


def _build_unphased_planes(n_blocks, B, n_samples, seed=1):
    """HWE diploid genotypes with a beta MAF spectrum, packed into the
    engine's sample-level class planes (het/hom/valid) + haplotype alt
    plane."""
    from tomahawk_tpu.ops.bitpack import (BlockPlanes, _pack_bits,
                                          stack_planes, words_for)
    rng = np.random.default_rng(seed)
    Wh = words_for(2 * n_samples)
    Ws = words_for(n_samples)
    planes = []
    pos0 = 0
    ones_s = np.ones((B, n_samples), bool)
    for b in range(n_blocks):
        # LD structure: groups of 16 variants share a haplotype template
        # with 2% per-variant genotype perturbation, so in-group pairs
        # have high r2 and flow through the EM fallback + host math
        n_grp = B // 16
        maf_g = np.minimum(rng.beta(0.5, 2.0, size=n_grp) * 0.5 + 1e-3, 0.5)
        base = rng.binomial(2, maf_g[:, None],
                            size=(n_grp, n_samples)).astype(np.int8)
        g = np.repeat(base, 16, axis=0)
        flip = rng.random((B, n_samples)) < 0.02
        g = np.where(flip, rng.integers(0, 3, (B, n_samples)), g
                     ).astype(np.int8)
        maf = np.repeat(maf_g, 16)
        het = g == 1
        hom = g == 2
        # unphased GT packing: het contributes one alt haplotype
        alt = np.zeros((B, 2 * n_samples), bool)
        alt[:, 0::2] = g >= 1
        alt[:, 1::2] = g == 2
        pos = pos0 + np.cumsum(rng.integers(50, 500, B)).astype(np.int32)
        pos0 = int(pos[-1])
        n_het = het.sum(axis=1).astype(np.int32)
        n_hom = hom.sum(axis=1).astype(np.int32)
        planes.append(BlockPlanes(
            n_rec=B,
            alt_bits=_pack_bits(alt, Wh),
            miss_bits=_pack_bits(np.zeros_like(alt), Wh),
            het_bits=_pack_bits(het, Ws),
            hom_bits=_pack_bits(hom, Ws),
            valid_bits=_pack_bits(ones_s, Ws),
            pos=pos, rid=np.zeros(B, np.int32),
            ac=(n_het + 2 * n_hom).astype(np.int32),
            # an is the MISSING-allele count (reference twk1_t semantics,
            # ops/bitpack.py), not VCF AN -- all alleles here are called
            an=np.zeros(B, np.int32),
            n_het=n_het, n_hom=n_hom,
            hwe=np.ones(B, np.float32),
            has_missing=np.zeros(B, bool),
            valid=np.ones(B, bool)))
    return stack_planes(planes)


def config3(n_blocks=13, B=4096, n_samples=10_000):
    """Unphased EM all-vs-all, 50k x 10k (BASELINE configs[2])."""
    from tomahawk_tpu.compute.engine import CalcSettings, LdEngine
    from tomahawk_tpu.ops.ld_math import LdFilters
    from tomahawk_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    t0 = time.perf_counter()
    stacked = _build_unphased_planes(n_blocks, B, n_samples)
    V = n_blocks * B
    print(f"# config3: {V:,} variants x {n_samples:,} samples unphased, "
          f"built in {time.perf_counter() - t0:.1f}s, "
          f"device={jax.devices()[0].platform}", flush=True)

    settings = CalcSettings(min_r2=0.1, forced_unphased=True)
    engine = LdEngine(stacked, n_samples, settings)
    filt = LdFilters(min_r2=0.1)
    pairs = [(i, j, i == j) for i in range(n_blocks)
             for j in range(i, n_blocks)]
    n_pairs = V * (V - 1) // 2
    n_rec = [0]

    def emit(recs, rev=None):
        n_rec[0] += len(recs)

    def run():
        n_rec[0] = 0
        t = time.perf_counter()
        engine.run_unphased_pairs(pairs, False, filt, emit)
        return time.perf_counter() - t

    def snap():
        return {k: dict(s) for k, s in engine.stats.items()}

    wdt = run()
    print(f"# warmup (incl. compile): {wdt:.1f}s", flush=True)
    best = None
    for rep in range(2):
        before = snap()
        dt = run()
        rate = n_pairs / dt
        best = rate if best is None else max(best, rate)
        print(f"#   rep{rep}: {dt:.3f}s -> {rate:,.0f} pairs/s "
              f"({n_rec[0]} records, "
              f"{rate / REF_ALLVSALL:.0f}x the reference's phased "
              f"8-thread rate)", flush=True)
        for k, s in engine.stats.items():
            b = before.get(k, {})
            parts = " ".join(
                f"{f}={s.get(f, 0.0) - b.get(f, 0.0):.2f}s"
                for f in ("count_s", "extract_s", "math_s")
                if isinstance(s.get(f), float))
            print(f"#     rep{rep} {k}: {parts}", flush=True)
    for k, s in engine.stats.items():
        print(f"#   {k}: tiles={s['n_tiles']} sweep={s['count_s']:.1f}s "
              f"extract={s['extract_s']:.1f}s math={s['math_s']:.1f}s",
              flush=True)
    return best


def config4(n_sup=123, B=4096, n_samples=100_000, window=4_000_000,
            memory_gb=9.0, spacing=275, xbins=1000, ybins=1000):
    """Windowed LD at 500k x 100k + aggregate raster
    (BASELINE configs[3])."""
    from tomahawk_tpu.compute.balancer import Balancer
    from tomahawk_tpu.compute.engine import (CalcSettings, LdEngine,
                                             _plan_loads, dispatch_pairs)
    from tomahawk_tpu.io.header import VcfContig, VcfHeader
    from tomahawk_tpu.io.two import TwoWriter
    from tomahawk_tpu.ops.bitpack import words_for
    from tomahawk_tpu.ops.ld_math import LdFilters
    from tomahawk_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    NS = n_samples
    Wh = words_for(2 * NS)
    V = n_sup * B
    dev = jax.devices()[0]
    print(f"# config4: {V:,} variants x {NS:,} samples, "
          f"{window / 1e6:g} Mb window; alt planes "
          f"{n_sup * B * Wh * 4 / 2**30:.1f} GiB total, "
          f"device={dev.platform}", flush=True)

    tail_mask = np.full(Wh, 0xFFFFFFFF, np.uint64)
    used = 2 * NS
    for w in range(Wh):
        bits = min(32, max(0, used - w * 32))
        tail_mask[w] = (1 << bits) - 1 if bits < 32 else 0xFFFFFFFF
    tail_mask = jnp.asarray(tail_mask.astype(np.uint32))

    @jax.jit
    def gen_super(seed):
        """LD-structured planes: groups of 16 variants share a template
        haplotype plane (MAF class 1/2..1/16) with ~3% haplotype flips,
        so in-group pairs carry r2 ~ 0.88 and the run emits records
        through the full extract + host-math + writer path."""
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        G = B // 16
        r = jax.random.bits(k1, (4, G, Wh), jnp.uint32)
        cum = jax.lax.associative_scan(jnp.bitwise_and, r, axis=0)
        cls = jax.random.randint(k2, (G,), 0, 4)
        base = jnp.take_along_axis(cum, cls[None, :, None], axis=0)[0]
        base = jnp.repeat(base, 16, axis=0)
        noise = jax.random.bits(k3, (5, B, Wh), jnp.uint32)
        flips = jax.lax.associative_scan(jnp.bitwise_and, noise,
                                         axis=0)[-1]
        alt = (base ^ flips) & tail_mask[None, :]
        ac = jax.lax.population_count(alt).sum(axis=1).astype(jnp.int32)
        return alt, ac

    pos_all = (spacing * np.arange(1, V + 1, dtype=np.int64)).astype(np.int32)
    pos_by_super = pos_all.reshape(n_sup, B)
    minpos = {i: int(pos_by_super[i, 0]) for i in range(n_sup)}
    maxpos = {i: int(pos_by_super[i, -1]) for i in range(n_sup)}
    rid = {i: 0 for i in range(n_sup)}

    bal = Balancer.build(n_sup)
    tiles_all = bal.window_pairs(minpos, maxpos, rid, window)

    settings = CalcSettings(min_r2=0.1, window=True, l_window=window,
                            memory_gb=memory_gb, mesh="off", tile_rows=B)
    per_super = B * Wh * 4
    budget = max(2, int(memory_gb * (1 << 30) / 2 / per_super))
    bands, loads = _plan_loads(list(range(n_sup)), tiles_all, budget)
    print(f"# {len(tiles_all)} window tiles (of "
          f"{n_sup * (n_sup + 1) // 2} all-vs-all), {len(bands)} bands, "
          f"{len(loads)} band-pair loads", flush=True)

    engine = LdEngine(None, NS, settings, mesh=None, B=B)
    filt = LdFilters(min_r2=0.1)

    def gen_band(bid, ids):
        nb = len(ids)
        outs = [gen_super(g) for g in ids]     # one generation per super
        alt_dev = jnp.stack([o[0] for o in outs])
        ac_h = np.stack([np.asarray(o[1]) for o in outs])
        z_b = np.zeros((nb, B), np.int32)
        return dict(
            alt_bits=alt_dev,
            miss_bits=np.broadcast_to(np.uint32(0), (nb, B, 1)),
            het_bits=np.broadcast_to(np.uint32(0), (nb, B, 1)),
            hom_bits=np.broadcast_to(np.uint32(0), (nb, B, 1)),
            valid_bits=np.broadcast_to(np.uint32(0), (nb, B, 1)),
            pos=np.stack([pos_by_super[g] for g in ids]),
            rid=z_b, an=z_b, n_het=z_b, n_hom=z_b,
            ac=ac_h.astype(np.int32),
            hwe=np.ones((nb, B), np.float32),
            has_missing=np.zeros((nb, B), bool),
            valid=np.ones((nb, B), bool),
            n_rec=np.full(nb, B, np.int32),
        )

    hdr = VcfHeader(samples=[f"S{i}" for i in range(NS)],
                    contigs=[VcfContig(idx=0, name="chrW")])
    tmpdir = tempfile.mkdtemp()
    out = os.path.join(tmpdir, "config4.two")
    writer = TwoWriter(out, hdr)
    n_out = [0]

    def emit(recs, rev=None):
        if len(recs):
            writer.add(recs)
            n_out[0] += len(recs)

    n_cand_window = sum(B * (B - 1) // 2 if d else B * B
                        for _, _, d in tiles_all)
    t0 = time.perf_counter()
    n_cand = 0
    done = 0
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
        done += len(tiles)
        el = time.perf_counter() - t0
        print(f"# load {li + 1}/{len(loads)} tiles={done}/"
              f"{len(tiles_all)} elapsed={el:.0f}s "
              f"eta={el / done * (len(tiles_all) - done):.0f}s",
              flush=True)
    dt = time.perf_counter() - t0
    writer.close()
    rate = n_cand / dt
    geno = rate * NS
    print(f"# config4 windowed: {n_cand:,} in-window candidates in "
          f"{dt:.1f}s -> {rate:,.0f} candidate pairs/s "
          f"({rate / REF_WINDOWED:.1f}x the reference's windowed "
          f"pair rate AT 2,504 SAMPLES; per-pair work here is 40x "
          f"-> {geno:,.0f} genotypes/s = "
          f"{geno / 224_874_830_855:.0f}x its genotype rate); "
          f"tile utilization {n_cand / max(1, n_cand_window):.1%}; "
          f"{n_out[0]:,} records -> {out}", flush=True)

    # aggregate rasterization of the run output (2-pass, like the
    # reference tutorial's r2/count raster)
    from tomahawk_tpu.post.aggregate import aggregate_two
    twa = os.path.join(tmpdir, "config4.twa")
    t1 = time.perf_counter()
    aggregate_two(out, twa, agg="r2", reduce="count",
                  xbins=xbins, ybins=ybins, min_count=0)
    adt = time.perf_counter() - t1
    arate = 2 * n_out[0] / max(adt, 1e-9)
    print(f"# config4 aggregate: {n_out[0]:,} records x 2 passes in "
          f"{adt:.2f}s -> {arate:,.0f} rec-passes/s "
          f"({arate / REF_AGG_PASS:.2f}x the reference's 4-thread "
          f"per-pass rate; {xbins}x{ybins} bins)", flush=True)
    return rate


def main():
    _ensure_backend()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("config3", "all"):
        config3()
    if which in ("config4", "all"):
        config4()


if __name__ == "__main__":
    main()
