#!/usr/bin/env python
"""Windowed-LD throughput probe at chromosome scale, single chip.

Mirrors the reference's windowed benchmark (docs/tutorial.md:246-253:
chr6, 4 Mb window, 4.78M variants, 8 threads -> 72.1M candidate
pairs/s). Synthetic positions use the same 50-500 bp spacing as
bench.py (~275 bp mean, close to 1KGP chr6 density of ~290 bp/variant
over the 4.78M-variant set).

Usage: python tools/bench_window.py [--blocks N] [--window BP]
Prints per-config candidate-pair rates; the headline all-vs-all metric
stays in bench.py (one-JSON-line driver contract).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_planes  # noqa: E402

REF_WINDOWED_PAIRS_PER_SEC = 72_104_114.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=256)
    ap.add_argument("--block-rows", type=int, default=4096)
    ap.add_argument("--samples", type=int, default=2504)
    ap.add_argument("--windows", type=int, nargs="+",
                    default=[1_000_000, 4_000_000])
    args = ap.parse_args()

    from tomahawk_tpu.compute.engine import CalcSettings, LdEngine
    from tomahawk_tpu.ops.ld_math import LdFilters
    from tomahawk_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    B, n_blocks, n_samples = args.block_rows, args.blocks, args.samples
    t0 = time.perf_counter()
    stacked = build_planes(n_blocks, B, n_samples)
    span = int(stacked["pos"].max())
    print(f"# data built in {time.perf_counter() - t0:.1f}s: "
          f"{n_blocks * B:,} variants over {span / 1e6:.0f} Mb "
          f"({span / (n_blocks * B):.0f} bp/variant), "
          f"{n_samples} samples, device={jax.devices()[0].platform}",
          flush=True)

    minpos = {i: int(stacked["pos"][i].min()) for i in range(n_blocks)}
    maxpos = {i: int(stacked["pos"][i].max()) for i in range(n_blocks)}
    rid = {i: 0 for i in range(n_blocks)}

    for window in args.windows:
        from tomahawk_tpu.compute.balancer import Balancer
        bal = Balancer.build(n_blocks)
        tiles = bal.window_pairs(minpos, maxpos, rid, window)
        settings = CalcSettings(min_r2=0.1, window=True, l_window=window)
        engine = LdEngine(stacked, n_samples, settings)
        filt = LdFilters(min_r2=0.1)
        sink = lambda recs, rev=None: None

        def run():
            t = time.perf_counter()
            n_cand = engine.run_phased_pairs(tiles, False, filt, sink)
            return time.perf_counter() - t, n_cand

        wdt, n_cand = run()
        computed = sum(B * (B - 1) // 2 if d else B * B for _, _, d in tiles)
        print(f"# window={window / 1e6:g}Mb: {len(tiles)} tiles, "
              f"{n_cand:,} candidates, utilization "
              f"{n_cand / computed:.1%}, warmup run {wdt:.1f}s", flush=True)
        for rep in range(2):
            dt, n_cand = run()
            rate = n_cand / dt
            print(f"#   rep{rep}: {dt:.3f}s -> {rate:,.0f} candidate "
                  f"pairs/s ({rate / REF_WINDOWED_PAIRS_PER_SEC:.0f}x "
                  f"reference windowed)", flush=True)


if __name__ == "__main__":
    main()
