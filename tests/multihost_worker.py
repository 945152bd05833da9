"""Worker for the 2-process jax.distributed test (test_multihost.py).

Each process owns 2 virtual CPU devices; the production sharded count
sweep runs over the global 4-device mesh, and every process checks its
addressable output shards against a single-device reference computed
locally. Mesh shape is an argument:

  4x1 — 'pairs' axis spans both processes (no collectives needed)
  2x2 — the 'samples' axis spans BOTH PROCESSES, so the psum over
        partial MXU contractions crosses the process boundary (the
        very-large-N sharding story over DCN)

Run: python multihost_worker.py <proc_id> <coordinator_port> [PxS]
"""

import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
mesh_spec = sys.argv[3] if len(sys.argv) > 3 else "4x1"

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
n_p, _, n_s = mesh_spec.partition("x")
n_p, n_s = int(n_p), int(n_s)
assert n_p * n_s == 4
if n_s > 1:
    # lay the 'samples' axis ACROSS processes: proc 0 owns devices
    # [d0, d1], so mesh [[d0, d2], [d1, d3]] puts one device of each
    # process in every samples row — the psum over partial MXU
    # contractions crosses the process boundary
    dev_arr = np.array(devs).reshape(n_s, n_p).T
else:
    dev_arr = np.array(devs).reshape(n_p, n_s)
mesh = Mesh(dev_arr, ("pairs", "samples"))

cfg = sweeps.make_cfg("phased", False, "all", B, n_samples, 0, 0.0, 100.0)
keys = sweeps.dev_keys_for(cfg)
if n_s > 1:
    for k in sweeps.WORD_KEYS:
        if k in keys:
            W = stacked[k].shape[-1]
            Wp = ((W + n_s - 1) // n_s) * n_s
            if Wp != W:
                pad = np.zeros((*stacked[k].shape[:-1], Wp - W),
                               stacked[k].dtype)
                stacked[k] = np.concatenate([stacked[k], pad], axis=-1)

pairs = [(i, j, i == j) for i in range(NB) for j in range(i, NB)]
pairs += [(0, 0, True)] * (12 - len(pairs))   # pad to a multiple of 4
pi = np.array([p[0] for p in pairs], np.int32)
pj = np.array([p[1] for p in pairs], np.int32)
dg = np.array([p[2] for p in pairs], bool)
live = np.array([True] * 10 + [False] * 2)

# host_local_array_to_global_array takes each process's CONCATENATED
# addressable shards along the sharded dims
dev = {}
for k in keys:
    arr = np.asarray(stacked[k])
    if k in sweeps.WORD_KEYS and n_s > 1:
        W = arr.shape[-1]
        lo = proc_id * (W // 2)
        local = arr[..., lo:lo + W // 2]
        dev[k] = mhu.host_local_array_to_global_array(
            local, mesh, P(None, None, "samples"))
    else:
        dev[k] = mhu.host_local_array_to_global_array(arr, mesh, P())

if n_s > 1:
    # every process's devices touch every pairs shard: local = full
    tiles_local = slice(None)
else:
    tiles_local = slice(proc_id * 6, (proc_id + 1) * 6)
g_pi = mhu.host_local_array_to_global_array(pi[tiles_local], mesh,
                                            P("pairs"))
g_pj = mhu.host_local_array_to_global_array(pj[tiles_local], mesh,
                                            P("pairs"))
g_dg = mhu.host_local_array_to_global_array(dg[tiles_local], mesh,
                                            P("pairs"))
g_lv = mhu.host_local_array_to_global_array(live[tiles_local], mesh,
                                            P("pairs"))

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
