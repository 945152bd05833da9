"""A/B the tile kernel backends (xla vs pallas) on the real device.

Times fused_sweep over a segment of 4096-row tiles at 1000-genomes
scale (2,504 samples) for each table variant. Run on TPU.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from tomahawk_tpu.compute import sweeps
from tomahawk_tpu.ops.bitpack import words_for


def synth_dev(rng, NB, B, n_samples, missing):
    Wh = words_for(2 * n_samples)
    Ws = words_for(n_samples)
    maf = rng.uniform(0.05, 0.5, size=(NB, B))

    def plane(W, dens):
        x = rng.random((NB, B, W * 32)) < dens[..., None]
        x = np.packbits(x, axis=-1, bitorder="little")
        return jnp.asarray(x.view(np.uint32))

    dev = dict(
        alt_bits=plane(Wh, maf),
        miss_bits=plane(Wh, np.full_like(maf, 0.02 if missing else 0.0)),
        het_bits=plane(Ws, maf),
        hom_bits=plane(Ws, maf * 0.5),
        valid_bits=plane(Ws, np.full_like(maf, 1.0)),
        pos=jnp.asarray(
            np.sort(rng.integers(0, 3e8, size=(NB, B))).astype(np.int32)),
        rid=jnp.zeros((NB, B), jnp.int32),
        ac=jnp.asarray(rng.integers(100, 2 * n_samples // 2,
                                    size=(NB, B)).astype(np.int32)),
        an=jnp.zeros((NB, B), jnp.int32),
        n_het=jnp.asarray(rng.integers(50, n_samples // 2,
                                       size=(NB, B)).astype(np.int32)),
        n_hom=jnp.asarray(rng.integers(20, n_samples // 4,
                                       size=(NB, B)).astype(np.int32)),
        valid=jnp.ones((NB, B), bool),
    )
    return dev


def main():
    rng = np.random.default_rng(0)
    B, n_samples, NB, T = 4096, 2504, 4, 32
    dev = synth_dev(rng, NB, B, n_samples, True)
    ij = [(i, j) for i in range(NB) for j in range(i, NB)]
    tiles = [(ij[t % len(ij)][0], ij[t % len(ij)][1],
              ij[t % len(ij)][0] == ij[t % len(ij)][1])
             for t in range(T)]
    pi = jnp.asarray([t[0] for t in tiles], jnp.int32)
    pj = jnp.asarray([t[1] for t in tiles], jnp.int32)
    dg = jnp.asarray([t[2] for t in tiles])
    live = jnp.ones(T, bool)

    for table in ("phased", "unphased"):
        for miss in (False, True):
            base = None
            for backend in ("xla", "pallas"):
                cfg = sweeps.make_cfg(table, miss, "all", B, n_samples,
                                      0, 0.1, 100.0, backend=backend)
                fn = sweeps.jit_fused_sweep(cfg, 256, 1 << 18)
                out = fn(dev, pi, pj, dg, live)
                jax.block_until_ready(out)
                n_pass0 = np.asarray(out[0]).sum()
                t0 = time.perf_counter()
                reps = 3
                for _ in range(reps):
                    out = fn(dev, pi, pj, dg, live)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / reps
                per_tile = dt / T * 1e3
                rate = T * B * B / dt / 1e9
                tag = f"{table}/{'miss' if miss else 'nomiss'}/{backend}"
                extra = ""
                if backend == "xla":
                    base = dt
                else:
                    extra = f"  speedup {base / dt:.2f}x"
                print(f"{tag:28s} {per_tile:7.3f} ms/tile  "
                      f"{rate:6.2f}B pairs/s  n_pass={n_pass0}{extra}")


if __name__ == "__main__":
    main()
