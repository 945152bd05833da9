"""Worker for the 2-process jax.distributed test (test_multihost.py).

Each process owns 2 virtual CPU devices; the production sharded count
sweep runs over the global 4-device ('pairs', 'samples'=1) mesh, and
every process checks its addressable output shards against a
single-device reference computed locally.

Run: python multihost_worker.py <proc_id> <coordinator_port>
"""

import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=proc_id)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402
import jax.experimental.multihost_utils as mhu  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tomahawk_tpu.compute import sweeps  # noqa: E402
from tomahawk_tpu.ops.bitpack import stack_planes  # noqa: E402
from test_kernels import _block_from_codes, _random_rows  # noqa: E402

# deterministic data, identical on both processes
rng = np.random.default_rng(7)
n_samples, B, NB = 128, 8, 4
planes = [_block_from_codes(_random_rows(rng, B, n_samples, 0.0), pad_to=B)
          for _ in range(NB)]
stacked = stack_planes(planes)

devs = jax.devices("cpu")
assert len(devs) == 4, f"expected 4 global devices, got {len(devs)}"
mesh = Mesh(np.array(devs).reshape(4, 1), ("pairs", "samples"))

cfg = sweeps.make_cfg("phased", False, "all", B, n_samples, 0, 0.0, 100.0)
keys = sweeps.dev_keys_for(cfg)

pairs = [(i, j, i == j) for i in range(NB) for j in range(i, NB)]
pairs += [(0, 0, True)] * (12 - len(pairs))   # pad to a multiple of 4
pi = np.array([p[0] for p in pairs], np.int32)
pj = np.array([p[1] for p in pairs], np.int32)
dg = np.array([p[2] for p in pairs], bool)
live = np.array([True] * 10 + [False] * 2)

# global arrays: dev planes replicated, tile lists sharded over 'pairs'
dev = {k: mhu.host_local_array_to_global_array(
    np.asarray(stacked[k]), mesh, P()) for k in keys}
half = slice(proc_id * 6, (proc_id + 1) * 6)   # this host's tile slice
g_pi = mhu.host_local_array_to_global_array(pi[half], mesh, P("pairs"))
g_pj = mhu.host_local_array_to_global_array(pj[half], mesh, P("pairs"))
g_dg = mhu.host_local_array_to_global_array(dg[half], mesh, P("pairs"))
g_lv = mhu.host_local_array_to_global_array(live[half], mesh, P("pairs"))

fn = sweeps.shard_count_sweep(mesh, cfg)
n_g, nc_g = fn(dev, g_pi, g_pj, g_dg, g_lv)

# single-device reference on local CPU
dev_l = {k: jnp.asarray(stacked[k]) for k in keys}
n_ref, nc_ref = (np.asarray(x) for x in sweeps.jit_count_sweep(cfg)(
    dev_l, pi, pj, dg, live))

for shard in n_g.addressable_shards:
    lo = shard.index[0].start or 0
    got = np.asarray(jax.device_get(shard.data))
    want = n_ref[lo:lo + len(got)]
    np.testing.assert_array_equal(got, want)
for shard in nc_g.addressable_shards:
    lo = shard.index[0].start or 0
    got = np.asarray(jax.device_get(shard.data))
    np.testing.assert_array_equal(got, nc_ref[lo:lo + len(got)])

print(f"MULTIHOST_OK proc={proc_id}")
