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

Both axes compose inside the production two-pass sweeps
(tomahawk_tpu.compute.sweeps.shard_count_sweep / shard_extract_sweep);
collectives ride ICI. The LdEngine takes a mesh directly:

    mesh = make_mesh(n_pairs, n_samples_shards)
    engine = LdEngine(stacked, n_samples, settings, mesh=mesh)
"""

import numpy as np

# re-exported so parallel consumers need only this module
from ..compute.sweeps import (shard_count_sweep,          # noqa: F401
                              shard_extract_sweep)        # noqa: F401


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
