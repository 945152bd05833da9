#!/usr/bin/env python
"""Where does the records-dense pipeline time go?

Runs the bench.py dense workload with per-stage accounting:
- device sweep force time (count_s), survivor transfer (extract_s),
  host record math (math_s) from engine.stats
- TwoWriter add/close time measured separately
- a raw device->host transfer rate probe for the tunnel

Usage: python tools/profile_dense.py [nblocks]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    nbd = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_samples = 2504
    B = 4096

    from bench import build_planes_grouped
    from tomahawk_tpu.compute.engine import CalcSettings, LdEngine
    from tomahawk_tpu.io.header import VcfContig, VcfHeader
    from tomahawk_tpu.io.two import TwoWriter
    from tomahawk_tpu.ops.ld_math import LdFilters
    from tomahawk_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    # --- tunnel probe: device->host transfer rate at a few sizes ---
    probe = os.environ.get("PROFILE_PROBES", "1") == "1"
    for mb in ((1, 4, 16) if probe else ()):
        n = mb * (1 << 20) // 4
        arr = jnp.zeros(n, jnp.int32) + 1
        arr.block_until_ready()
        t = time.perf_counter()
        np.asarray(arr)
        dt = time.perf_counter() - t
        print(f"# d2h {mb:3d} MB: {dt*1e3:8.1f} ms  "
              f"({mb/dt:6.1f} MB/s)", file=sys.stderr)
    if probe:
        f = jax.jit(lambda x: x + 1)
        x = jnp.zeros(8, jnp.int32)
        f(x).block_until_ready()
        t = time.perf_counter()
        for _ in range(10):
            f(x).block_until_ready()
        print(f"# dispatch+force roundtrip: "
              f"{(time.perf_counter()-t)/10*1e3:.1f} ms", file=sys.stderr)

    t0 = time.perf_counter()
    stacked = build_planes_grouped(nbd, B, n_samples)
    print(f"# dense data built in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    settings = CalcSettings(min_r2=0.1)
    engine = LdEngine(stacked, n_samples, settings)
    filt = LdFilters(min_r2=0.1)
    pairs = [(i, j, i == j) for i in range(nbd) for j in range(i, nbd)]
    Vd = nbd * B
    n_pairs = Vd * (Vd - 1) // 2

    hdr = VcfHeader(samples=[f"S{i}" for i in range(n_samples)],
                    contigs=[VcfContig(idx=0, name="bench")])
    tmpdir = tempfile.mkdtemp()

    wtime = [0.0]

    def run(tag):
        out = os.path.join(tmpdir, f"prof_{tag}.two")
        writer = TwoWriter(out, hdr)
        n_rec = [0]

        def emit(recs, rev=None):
            if len(recs):
                t = time.perf_counter()
                writer.add(recs)
                if rev is not None:
                    writer.add(rev)
                wtime[0] += time.perf_counter() - t
                n_rec[0] += len(recs) * (2 if rev is not None else 1)

        t = time.perf_counter()
        engine.run_phased_pairs(pairs, False, filt, emit)
        tw = time.perf_counter()
        writer.close()
        wclose = time.perf_counter() - tw
        dt = time.perf_counter() - t
        return dt, n_rec[0], wclose

    wdt, wn, _ = run("warmup")
    print(f"# warmup: {wdt:.1f}s ({wn} records)", file=sys.stderr)
    engine.stats.clear()
    wtime[0] = 0.0
    dt, n_rec, wclose = run("timed")
    print(f"# timed: {dt:.3f}s, {n_pairs/dt:,.0f} pairs/s, "
          f"{n_rec} records ({n_rec/dt:,.0f} rec/s)", file=sys.stderr)
    for key, s in sorted(engine.stats.items()):
        print(f"#   {key}: tiles={s['n_tiles']} cand={s['n_cand']:,} "
              f"pass={s['n_pass']:,} recs={s['n_records']:,}\n"
              f"#     count_s={s['count_s']:.3f} "
              f"extract_s={s['extract_s']:.3f} math_s={s['math_s']:.3f}",
              file=sys.stderr)
    print(f"#   writer add={wtime[0]:.3f}s close={wclose:.3f}s",
          file=sys.stderr)
    acc = sum(s['count_s'] + s['extract_s'] + s['math_s']
              for s in engine.stats.values()) + wtime[0] + wclose
    print(f"#   accounted={acc:.3f}s of {dt:.3f}s "
          f"(other={dt-acc:.3f}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
