"""Multi-chip sharding of the LD tile grid.

The reference scales out by handing independent chunks of the
upper-triangular block-pair grid to separate machines (reference:
lib/ld/ld_balancing.h, docs/job-balancing.md). The TPU-native design
shards two axes of the same computation over a device mesh:

- axis "pairs" (data parallel): the flattened tile-pair list is split
  across devices; every device owns the full bitpacked block tensors
  (they are small relative to the pair grid) and computes only its
  slice of tile pairs.
- axis "samples" (tensor/sequence parallel): the packed word axis of
  the genotype planes is sharded, each device computes partial
  contingency counts over its sample slice, and a psum over "samples"
  reconstitutes exact counts. This is how runs with very large N keep
  the planes within per-chip HBM.

Both axes compose in one shard_map; collectives ride ICI.
"""

from functools import partial

import numpy as np


def make_mesh(n_pairs: int = None, n_samples_shards: int = 1,
              devices=None):
    """Build a ('pairs', 'samples') mesh over the available devices."""
    import jax
    from jax.sharding import Mesh
    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    if n_pairs is None:
        n_pairs = n_dev // n_samples_shards
    assert n_pairs * n_samples_shards == n_dev, \
        f"{n_pairs} x {n_samples_shards} != {n_dev} devices"
    dev_array = np.array(devices).reshape(n_pairs, n_samples_shards)
    return Mesh(dev_array, axis_names=("pairs", "samples"))


def sharded_phased_ld(mesh, n_samples: int, B: int, cap: int,
                      min_r2: float = 0.1, max_r2: float = 100.0,
                      window: int = 0):
    """Jitted sharded function computing phased LD survivor sets for a
    batch of block pairs.

    Input shapes (global):
      alt_bits  [NB, B, W] uint32   sharded over W  (samples axis)
      ac        [NB, B]    int32    replicated
      valid     [NB, B]    bool     replicated
      rid, pos  [NB, B]    int32    replicated
      pair_i/j  [G]        int32    sharded over G  (pairs axis)
      diag      [G]        bool     sharded over G

    Returns (per global batch): n_pass [G], idx [G, cap], counts
    [G, cap, 4], n_cand [G] — all sharded over the pairs axis.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from ..ops import ld_kernels as K

    def local_fn(alt_bits, ac, valid, rid, pos, pair_i, pair_j, diag):
        # alt_bits: [NB, B, W_local]; pair lists are the local slice
        def body(_, inp):
            i, j, dg = inp
            a = K.unpack_bits(jnp.take(alt_bits, i, axis=0))
            b = K.unpack_bits(jnp.take(alt_bits, j, axis=0))
            partial_altalt = jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            # exact counts need the full sample axis: psum the partial
            altalt = jax.lax.psum(partial_altalt, axis_name="samples")
            ac_i = jnp.take(ac, i, axis=0)
            ac_j = jnp.take(ac, j, axis=0)
            altref = ac_i[:, None] - altalt
            refalt = ac_j[None, :] - altalt
            refref = 2 * n_samples - (ac_i[:, None] + ac_j[None, :]) \
                + altalt
            counts = jnp.stack([refref, refalt, altref, altalt], axis=-1)

            m = jnp.take(valid, i, axis=0)[:, None] & \
                jnp.take(valid, j, axis=0)[None, :]
            m &= (ac_i[:, None] + ac_j[None, :]) > 2
            ii = jnp.arange(B)[:, None]
            jj = jnp.arange(B)[None, :]
            m &= jnp.where(dg, ii < jj, True)
            if window > 0:
                same = jnp.take(rid, i, axis=0)[:, None] == \
                    jnp.take(rid, j, axis=0)[None, :]
                dist = jnp.abs(jnp.take(pos, i, axis=0)[:, None]
                               - jnp.take(pos, j, axis=0)[None, :])
                m &= same & (dist <= window)
            pf = K.phased_prefilter_mask(counts, m, min_r2, max_r2)
            n, idx, rows = K.compact_tile(pf, counts.reshape(-1, 4), cap)
            return None, (n, idx, rows, m.sum(dtype=jnp.int32))

        _, out = jax.lax.scan(body, None, (pair_i, pair_j, diag))
        return out

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None, "samples"), P(), P(), P(), P(),
                  P("pairs"), P("pairs"), P("pairs")),
        out_specs=(P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        check_rep=False)
    return jax.jit(fn)
