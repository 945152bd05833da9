#!/usr/bin/env python
"""Distributed scaling measurement (VERDICT round-3 task 3).

Real multi-chip hardware is unavailable in this container (one tunneled
TPU, one vCPU), so this measures the honest proxies BASELINE's >= 85%
2-host efficiency target decomposes into:

  balance     per-process candidate-pair counts from the round-robin
              tile partition (the only inter-host coordination in the
              default distributed mode is the final shard barrier, so
              scaling efficiency ~= work balance x per-host rate)
  overhead    2-process gloo run on ONE time-shared vCPU: with zero
              coordination overhead and perfect balance, max(per-process
              wall) ~= the single-process wall (both runs get the same
              total core budget); efficiency_timeshare = single / max.

Writes one JSON line; the per-process numbers go in PERF.md's scaling
table. Usage: python tools/bench_scaling.py [n_sites] [n_samples]
"""

import json
import os
import re
import socket
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["TWK_WORKER_SEGMENT"] = "64"
    return env


def main():
    n_sites = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    d = tempfile.mkdtemp()
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    from test_importer import make_vcf  # noqa: E402
    from tomahawk_tpu.io.importer import ImportSettings, import_vcf

    vcf = os.path.join(d, "in.vcf")
    make_vcf(vcf, n_samples=n_samples, n_sites=n_sites, seed=9,
             miss_frac=0.0, contigs=("20",))
    twk = os.path.join(d, "in.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=500))
    print(f"# scaling bench: {n_sites} sites x {n_samples} samples",
          flush=True)

    # single-process baseline (same CPU budget as the 2-process run)
    single_py = (
        "import sys, jax\n"
        "from tomahawk_tpu.compute.engine import CalcSettings, compute_ld\n"
        "res = compute_ld(CalcSettings(input=sys.argv[1], "
        "output=sys.argv[2], min_r2=0.0, min_p=1.0, mesh='off', "
        "tile_rows=512, sweep_segment=64, backend='device'))\n"
        "print(f'SINGLE pairs={res.n_pairs} elapsed={res.elapsed:.3f}')\n")
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", single_py, twk, os.path.join(d, "s.two")],
        capture_output=True, text=True, env=_worker_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    m = re.search(r"SINGLE pairs=(\d+) elapsed=([0-9.]+)", out.stdout)
    assert m, out.stdout[-2000:] + out.stderr[-2000:]
    single_pairs, single_s = int(m.group(1)), float(m.group(2))
    print(f"# single-process: {single_pairs:,} pairs in {single_s:.2f}s "
          f"(launch-to-exit {time.perf_counter() - t0:.2f}s)", flush=True)

    # 2-process gloo run (the production distributed path)
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "tests", "dist_calc_worker.py")
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), port, twk,
         os.path.join(d, "dist"), "off", "12.0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_worker_env()) for pid in (0, 1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    stats = []
    for pid, o in enumerate(outs):
        m = re.search(r"DIST_CALC_OK proc=\d+ records=(\d+) "
                      r"pairs=(\d+) elapsed=([0-9.]+)", o)
        assert m, f"proc {pid}:\n{o[-3000:]}"
        stats.append(dict(records=int(m.group(1)), pairs=int(m.group(2)),
                          elapsed=float(m.group(3))))
    total_pairs = sum(s["pairs"] for s in stats)
    max_s = max(s["elapsed"] for s in stats)
    balance = (max(s["pairs"] for s in stats)
               - min(s["pairs"] for s in stats)) / (total_pairs / 2)
    eff = single_s / max_s
    for pid, s in enumerate(stats):
        print(f"# proc{pid}: {s['pairs']:,} pairs, {s['records']:,} "
              f"records, {s['elapsed']:.2f}s", flush=True)
    print(f"# balance spread: {balance:.1%} (target < 10%); "
          f"time-shared efficiency: single {single_s:.2f}s / "
          f"2-proc max {max_s:.2f}s = {eff:.2f} "
          f"(1.0 = zero coordination overhead on one shared vCPU)",
          flush=True)
    print(json.dumps(dict(metric="distributed_2proc_scaling",
                          balance_spread=round(balance, 4),
                          single_s=single_s, two_proc_max_s=max_s,
                          timeshare_efficiency=round(eff, 3))))


if __name__ == "__main__":
    main()
