"""2-process jax.distributed test: the production sharded count sweep
runs over a global mesh spanning two processes (2 virtual CPU devices
each, gloo collectives) and every process's output shards must match a
single-device reference. This is the multi-host smoke test the
reference lacks (SURVEY §4 plan item 5)."""

import os
import socket
import subprocess
import sys

import pytest

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # keep the workers off the axon TPU tunnel: concurrent interpreter
    # startups contend for the single tunneled device and can hang at
    # plugin registration; the tests are CPU-only by design
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.parametrize("n_sites", [120, 12])
def test_two_process_distributed_calc(tmp_path, n_sites):
    """End-to-end: `compute_ld(distributed=True)` under a 2-process CPU
    rendezvous; concat of the per-process shards must equal the
    single-process output as a record multiset (VERDICT round-1 item 6:
    production multi-host calc, not just the count sweep). The 12-site
    variant has a SINGLE tile, so process 1 draws an empty partition
    and must still write a valid empty shard and join the barrier."""
    import numpy as np
    import jax
    from test_importer import make_vcf
    from tomahawk_tpu.io.importer import ImportSettings, import_vcf
    from tomahawk_tpu.io.two import TwoReader
    from tomahawk_tpu.compute.engine import CalcSettings, compute_ld
    from tomahawk_tpu.parallel import merge_shards, shard_paths
    from tomahawk_tpu.post.sort import sort_two

    vcf = str(tmp_path / "in.vcf")
    make_vcf(vcf, n_samples=32, n_sites=n_sites, seed=21, miss_frac=0.03,
             contigs=("20", "21") if n_sites > 16 else ("20",))
    twk = str(tmp_path / "in.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=16))

    single = str(tmp_path / "single.two")
    with jax.default_device(jax.devices("cpu")[0]):
        compute_ld(CalcSettings(input=twk, output=single, min_r2=0.0,
                                min_p=1.0, mesh="off", tile_rows=16))

    worker = os.path.join(os.path.dirname(__file__),
                          "dist_calc_worker.py")
    port = str(_free_port())
    out_base = str(tmp_path / "dist")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), port, twk, out_base],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_worker_env()) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, out in enumerate(outs):
        assert f"DIST_CALC_OK proc={pid}" in out, \
            f"worker {pid} failed:\n{out[-3000:]}"

    # fold the shards with the production merge helper; a position-sort
    # of the single-process output must match record-for-record
    shards = shard_paths(out_base + ".two", 2)
    assert all(os.path.exists(s) for s in shards)
    merged = str(tmp_path / "merged.two")
    n_merged = merge_shards(f"{out_base}.p*of2.two", merged)  # glob form
    single_sorted = str(tmp_path / "single.sorted.two")
    sort_two(single, single_sorted)

    def multiset(path):
        recs = TwoReader(path).records()
        order = np.lexsort((recs["P"], recs["R2"], recs["packB"],
                            recs["packA"], recs["ridB"], recs["ridA"]))
        return recs[order]

    a, b = multiset(single_sorted), multiset(merged)
    assert len(a) == len(b) == n_merged and len(a) > 0
    for f in a.dtype.names:
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)


def test_two_process_dcn_calc(tmp_path):
    """End-to-end dcn mode: the packed-word (samples) axis spans the
    two processes -- each holds HALF of every genotype plane in device
    memory, per-tile counts psum across the process boundary, and
    process 0 writes the one output, which must equal a single-process
    run exactly (the very-large-N scale-out of SURVEY §5.7/§5.8)."""
    import numpy as np
    import jax
    from test_importer import make_vcf
    from tomahawk_tpu.io.importer import ImportSettings, import_vcf
    from tomahawk_tpu.io.two import TwoReader
    from tomahawk_tpu.compute.engine import CalcSettings, compute_ld

    vcf = str(tmp_path / "in.vcf")
    make_vcf(vcf, n_samples=70, n_sites=96, seed=5, miss_frac=0.04,
             contigs=("20",))
    twk = str(tmp_path / "in.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=16))

    single = str(tmp_path / "single.two")
    with jax.default_device(jax.devices("cpu")[0]):
        compute_ld(CalcSettings(input=twk, output=single, min_r2=0.0,
                                min_p=1.0, mesh="off", tile_rows=16))

    worker = os.path.join(os.path.dirname(__file__),
                          "dist_calc_worker.py")
    port = str(_free_port())
    out = str(tmp_path / "dcn.two")
    # tiny plane budget forces banded streaming: the global word-sliced
    # uploads then happen per band load, not once
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), port, twk, out, "dcn",
         "1e-5"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_worker_env()) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            o, _ = p.communicate(timeout=300)
            outs.append(o)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, o in enumerate(outs):
        assert f"DIST_CALC_OK proc={pid}" in o, \
            f"worker {pid} failed:\n{o[-3000:]}"
    assert os.path.exists(out)
    assert not os.path.exists(str(tmp_path / "dcn.p0of2.two"))

    def multiset(path):
        recs = TwoReader(path).records()
        order = np.lexsort((recs["P"], recs["R2"], recs["packB"],
                            recs["packA"], recs["ridB"], recs["ridA"]))
        return recs[order]

    a, b = multiset(single), multiset(out)
    assert len(a) == len(b) and len(a) > 0
    for f in a.dtype.names:
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)


@pytest.mark.parametrize("mesh", ["4x1", "2x2"])
def test_two_process_sharded_count_sweep(mesh):
    """mesh 4x1: 'pairs' spans both processes. mesh 2x2: the 'samples'
    word axis spans both processes, so the count psum crosses the
    process boundary (the very-large-N sharding story over DCN)."""
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), port, mesh],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_worker_env()) for pid in (0, 1)]
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


def test_two_process_distributed_resume_banded_staging(tmp_path):
    """First-class distributed mode (round-3 VERDICT task 2): a banded
    2-process run with per-process checkpoint sidecars is HARD-KILLED
    mid-run on both processes (os._exit after k sweep segments, a
    different k per process), then relaunched: each process resumes its
    own shard behind the resume barrier, the staging worker prefetches
    bands (stage_stats reports prefetched bands + hidden upload time),
    and the merged result equals a single-process run record for
    record. Sidecars must be gone on success."""
    import numpy as np
    import jax
    from test_importer import make_vcf
    from tomahawk_tpu.io.importer import ImportSettings, import_vcf
    from tomahawk_tpu.io.two import TwoReader
    from tomahawk_tpu.compute.engine import CalcSettings, compute_ld
    from tomahawk_tpu.parallel import merge_shards, shard_paths
    from tomahawk_tpu.post.sort import sort_two

    vcf = str(tmp_path / "in.vcf")
    make_vcf(vcf, n_samples=32, n_sites=260, seed=33, miss_frac=0.03,
             contigs=("20", "21"))
    twk = str(tmp_path / "in.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=16))

    single = str(tmp_path / "single.two")
    with jax.default_device(jax.devices("cpu")[0]):
        compute_ld(CalcSettings(input=twk, output=single, min_r2=0.0,
                                min_p=1.0, mesh="off", tile_rows=16,
                                memory_gb=2e-5))

    worker = os.path.join(os.path.dirname(__file__),
                          "dist_calc_worker.py")
    out_base = str(tmp_path / "dist")
    ckpt = str(tmp_path / "calc.ckpt")

    def launch(crash_after):
        port = str(_free_port())
        procs = []
        for pid in (0, 1):
            env = _worker_env()
            env["TWK_WORKER_CHECKPOINT"] = ckpt
            if crash_after:
                env["TWK_WORKER_CRASH_AFTER"] = str(crash_after[pid])
            # tiny budget -> banded streaming + staging prefetch
            procs.append(subprocess.Popen(
                [sys.executable, worker, str(pid), port, twk, out_base,
                 "auto", "2e-5"],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env))
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=300)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return [p.returncode for p in procs], outs

    # run 1: both processes die mid-run after 2 sweep segments. Each
    # crashing worker waits for the PEER's sidecar before exiting
    # (process 0 is the coordinator; its death tears process 1 down
    # through the coordination service), so both sidecars are
    # guaranteed -- but the torn-down peer may die mid-segment with a
    # coordination error instead of its own simulated exit code 3,
    # which is an equally valid hard kill for resume purposes.
    rcs, outs = launch(crash_after={0: 2, 1: 2})
    assert 3 in rcs and all(rc != 0 for rc in rcs), (rcs, outs)
    assert not any("DIST_CALC_OK" in o for o in outs), outs
    assert os.path.exists(f"{ckpt}.p0of2")
    assert os.path.exists(f"{ckpt}.p1of2")

    # run 2: resume both; must complete and clean up the sidecars
    rcs, outs = launch(crash_after=None)
    for pid, out in enumerate(outs):
        assert f"DIST_CALC_OK proc={pid}" in out, \
            f"worker {pid} failed:\n{out[-3000:]}"
    assert not os.path.exists(f"{ckpt}.p0of2")
    assert not os.path.exists(f"{ckpt}.p1of2")

    # banded staging ran with the background worker in distributed mode
    import re
    for pid, out in enumerate(outs):
        m = re.search(r"loads=(\d+) prefetched=(\d+) hidden_s=([0-9.]+)",
                      out)
        assert m, out[-2000:]
        n_loads, n_pre = int(m.group(1)), int(m.group(2))
        assert n_loads > 1, f"proc {pid} did not stream bands: {out[-500:]}"
        assert n_pre > 0, \
            f"proc {pid} staged no bands ahead: {out[-500:]}"

    shards = shard_paths(out_base + ".two", 2)
    assert all(os.path.exists(s) for s in shards)
    merged = str(tmp_path / "merged.two")
    n_merged = merge_shards(shards, merged)
    single_sorted = str(tmp_path / "single.sorted.two")
    sort_two(single, single_sorted)

    def multiset(path):
        recs = TwoReader(path).records()
        order = np.lexsort((recs["P"], recs["R2"], recs["packB"],
                            recs["packA"], recs["ridB"], recs["ridA"]))
        return recs[order]

    a, b = multiset(single_sorted), multiset(merged)
    assert len(a) == len(b) == n_merged and len(a) > 0
    for f in a.dtype.names:
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)


def test_two_process_dcn_kill_resume(tmp_path):
    """Band/segment-boundary checkpointing on a dcn mesh (round-4
    VERDICT task 5): process 0 owns the single sidecar; a hard kill of
    both processes mid-run resumes with process 0's progress BROADCAST
    to every process, so all of them skip the same segments (and whole
    band loads) and the collective program stays aligned. The resumed
    single output must equal an uninterrupted single-process run."""
    import numpy as np
    import jax
    from test_importer import make_vcf
    from tomahawk_tpu.io.importer import ImportSettings, import_vcf
    from tomahawk_tpu.io.two import TwoReader
    from tomahawk_tpu.compute.engine import CalcSettings, compute_ld

    vcf = str(tmp_path / "in.vcf")
    make_vcf(vcf, n_samples=70, n_sites=200, seed=11, miss_frac=0.04,
             contigs=("20",))
    twk = str(tmp_path / "in.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=16))

    single = str(tmp_path / "single.two")
    with jax.default_device(jax.devices("cpu")[0]):
        compute_ld(CalcSettings(input=twk, output=single, min_r2=0.0,
                                min_p=1.0, mesh="off", tile_rows=16,
                                memory_gb=2e-5))

    worker = os.path.join(os.path.dirname(__file__),
                          "dist_calc_worker.py")
    out = str(tmp_path / "dcn.two")
    ckpt = str(tmp_path / "dcn.ckpt")

    def launch(crash_after):
        port = str(_free_port())
        procs = []
        for pid in (0, 1):
            env = _worker_env()
            env["TWK_WORKER_CHECKPOINT"] = ckpt
            if crash_after:
                env["TWK_WORKER_CRASH_AFTER"] = str(crash_after[pid])
            # tiny plane budget -> banded streaming: resume must also
            # skip whole band loads collectively
            procs.append(subprocess.Popen(
                [sys.executable, worker, str(pid), port, twk, out,
                 "dcn", "1e-5"],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env))
        outs = []
        try:
            for p in procs:
                o, _ = p.communicate(timeout=300)
                outs.append(o)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return [p.returncode for p in procs], outs

    rcs, outs = launch(crash_after={0: 3, 1: 3})
    assert 3 in rcs and all(rc != 0 for rc in rcs), (rcs, outs)
    assert os.path.exists(ckpt), "process 0 wrote no sidecar"
    assert not os.path.exists(f"{ckpt}.p0of2"), \
        "dcn must not use per-process sidecars"

    rcs, outs = launch(crash_after=None)
    for pid, o in enumerate(outs):
        assert f"DIST_CALC_OK proc={pid}" in o, \
            f"worker {pid} failed:\n{o[-3000:]}"
    assert not os.path.exists(ckpt), "sidecar not cleaned up"

    def multiset(path):
        recs = TwoReader(path).records()
        order = np.lexsort((recs["P"], recs["R2"], recs["packB"],
                            recs["packA"], recs["ridB"], recs["ridA"]))
        return recs[order]

    a, b = multiset(single), multiset(out)
    assert len(a) == len(b) > 0
    for f in a.dtype.names:
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)
