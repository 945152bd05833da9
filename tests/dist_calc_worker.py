"""Worker for the 2-process end-to-end distributed calc test
(test_multihost.py): runs the PRODUCTION `compute_ld` with
settings.distributed over a 2-process CPU rendezvous; each process
computes its round-robin tile partition on its 2 local virtual devices
and writes its own .two shard.

With mesh spec "dcn" the packed-word (samples) axis spans both
processes instead: each process holds half of every genotype plane,
counts psum over the process boundary, and process 0 writes the ONE
output file.

Run: python dist_calc_worker.py <proc_id> <port> <in.twk> <out_base> [mesh]
"""

import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
twk = sys.argv[3]
out_base = sys.argv[4]
mesh = sys.argv[5] if len(sys.argv) > 5 else "auto"
memory_gb = float(sys.argv[6]) if len(sys.argv) > 6 else 12.0

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_cpu_collectives_implementation", "gloo")

from tomahawk_tpu.compute.engine import CalcSettings, compute_ld  # noqa: E402

res = compute_ld(CalcSettings(
    input=twk, output=out_base, min_r2=0.0, min_p=1.0, mesh=mesh,
    tile_rows=16,    # many tiles, so the round-robin split is exercised
    memory_gb=memory_gb, distributed=True,
    coordinator=f"127.0.0.1:{port}",
    num_processes=2, process_id=proc_id))

print(f"DIST_CALC_OK proc={proc_id} records={res.n_records}")
