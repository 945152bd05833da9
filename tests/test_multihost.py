"""2-process jax.distributed test: the production sharded count sweep
runs over a global mesh spanning two processes (2 virtual CPU devices
each, gloo collectives) and every process's output shards must match a
single-device reference. This is the multi-host smoke test the
reference lacks (SURVEY §4 plan item 5)."""

import os
import socket
import subprocess
import sys

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_count_sweep():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # keep the workers off the axon TPU tunnel: concurrent interpreter
    # startups contend for the single tunneled device and can hang at
    # plugin registration; the test is CPU-only by design
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert f"MULTIHOST_OK proc={pid}" in out, \
            f"worker {pid} failed:\n{out[-3000:]}"
