"""Worker for the 2-process end-to-end distributed calc test
(test_multihost.py): runs the PRODUCTION `compute_ld` with
settings.distributed over a 2-process CPU rendezvous; each process
computes its round-robin tile partition on its 2 local virtual devices
and writes its own .two shard.

With mesh spec "dcn" the packed-word (samples) axis spans both
processes instead: each process holds half of every genotype plane,
counts psum over the process boundary, and process 0 writes the ONE
output file.

Env knobs (the kill/resume + banded-staging distributed tests):
  TWK_WORKER_CHECKPOINT   checkpoint sidecar base path (per-process
                          suffixes are added by compute_ld)
  TWK_WORKER_CRASH_AFTER  os._exit(3) after this many sweep segments
                          (simulated kill; checkpoints every segment)
  TWK_WORKER_SEGMENT      sweep_segment override (default 16)

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

from tomahawk_tpu.compute.engine import (CalcSettings, LdEngine,  # noqa: E402
                                         compute_ld)

ckpt = os.environ.get("TWK_WORKER_CHECKPOINT", "")
crash_after = int(os.environ.get("TWK_WORKER_CRASH_AFTER", "0"))
if crash_after:
    _orig = LdEngine._run_segment
    _n = [0]

    def _crashing(self, *a, **kw):
        if _n[0] >= crash_after:
            # wait for the PEER's sidecar before dying: process 0 is
            # the jax.distributed coordinator, so its exit tears the
            # other process down through the coordination service --
            # without this gate the peer could die before writing any
            # checkpoint and the resume test would race
            if ckpt:
                import time
                # dcn mode keeps ONE sidecar (process 0's, the output
                # owner); tile-partition mode keeps one per process
                peer = (ckpt if mesh == "dcn"
                        else f"{ckpt}.p{1 - proc_id}of2")
                deadline = time.time() + 120
                while not os.path.exists(peer) and time.time() < deadline:
                    time.sleep(0.05)
            sys.stdout.flush()
            os._exit(3)   # hard kill: no cleanup, like SIGKILL
        _n[0] += 1
        return _orig(self, *a, **kw)

    LdEngine._run_segment = _crashing

res = compute_ld(CalcSettings(
    input=twk, output=out_base, min_r2=0.0, min_p=1.0, mesh=mesh,
    tile_rows=16,    # many tiles, so the round-robin split is exercised
    sweep_segment=int(os.environ.get("TWK_WORKER_SEGMENT", "16")),
    memory_gb=memory_gb, distributed=True,
    checkpoint=ckpt, checkpoint_interval=0.0,
    coordinator=f"127.0.0.1:{port}",
    num_processes=2, process_id=proc_id))

ss = res.stage_stats or {}
print(f"DIST_CALC_OK proc={proc_id} records={res.n_records} "
      f"pairs={res.n_pairs} elapsed={res.elapsed:.3f} "
      f"loads={ss.get('n_loads', 0)} "
      f"prefetched={ss.get('n_prefetched', 0)} "
      f"hidden_s={ss.get('hidden_s', 0.0):.4f} "
      f"blocking={ss.get('n_blocking', 0)}")
