"""Fast TPU probe: compile the pallas tile kernel for each variant at
production shape (B=4096, 2504 samples) and check masks/parts equal
the XLA path on one tile."""
import numpy as np
import jax
import jax.numpy as jnp

from tomahawk_tpu.compute import sweeps
from bench_tile_backend import synth_dev


def main():
    rng = np.random.default_rng(0)
    B, n_samples = 4096, 2504
    dev = synth_dev(rng, 1, B, n_samples, True)
    for table in ("phased", "unphased"):
        for miss in (False, True):
            for window, cls in ((0, "all"), (1_000_000, "all"),
                                (0, "clean")):
                outs = []
                for backend in ("xla", "pallas"):
                    cfg = sweeps.make_cfg(table, miss, cls, B, n_samples,
                                          window, 0.1, 100.0,
                                          backend=backend)
                    f = jax.jit(lambda d, i, j, dg, cfg=cfg:
                                sweeps.tile_prefilter(d, i, j, dg, cfg))
                    pf, m, parts = f(dev, jnp.int32(0), jnp.int32(0),
                                     jnp.asarray(True))
                    outs.append((np.asarray(pf), np.asarray(m),
                                 [np.asarray(p) for p in parts]))
                (pf_x, m_x, pts_x), (pf_p, m_p, pts_p) = outs
                ok = (np.array_equal(pf_x, pf_p)
                      and np.array_equal(m_x, m_p)
                      and all(np.array_equal(a, b)
                              for a, b in zip(pts_x, pts_p)))
                print(f"{table}/{'miss' if miss else 'nomiss'}"
                      f"/w{window}/{cls}: "
                      f"{'OK' if ok else 'MISMATCH'} "
                      f"pf={pf_x.sum()} m={m_x.sum()}", flush=True)
                assert ok


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "tools")
    main()
