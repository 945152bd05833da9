"""Multi-process orchestration for distributed `calc` runs.

The reference scales across machines by slicing the upper-triangular
block grid with `-c/-C` and merging the chunk outputs by hand
(reference: docs/job-balancing.md, lib/ld/ld_balancing.h:23-80). The
TPU-native run mode replaces that with a jax.distributed process group:

  - every process parses the same .twk index and tile plan,
  - the flattened tile list is partitioned round-robin over processes
    (`partition_tiles`) -- diagonal tiles carry ~half the pairs of
    square tiles, so interleaving spreads load evenly without any
    coordination (SURVEY §7),
  - each process computes only its tiles on its LOCAL devices (the
    pairs axis needs no cross-host collectives; the samples axis may
    still psum over a local mesh) and writes one `.pKofN.two` shard,
  - a device barrier (`sync_shards`) guarantees every shard is on disk
    before any process returns, and `merge_shards` folds them into one
    sorted .two.

Entry: `twk calc --distributed --coordinator host:port
--num-processes N --process-id K` (tomahawk_tpu/cli.py), exercised
end-to-end by tests/test_multihost.py.
"""

import glob

from ..utils.logging import log


def init_distributed(coordinator: str = None, num_processes: int = -1,
                     process_id: int = -1):
    """jax.distributed rendezvous; returns (process_id, n_processes).
    Must run before any other JAX use in the process."""
    import jax
    kw = {}
    if coordinator:
        kw["coordinator_address"] = coordinator
    if num_processes and num_processes > 0:
        kw["num_processes"] = num_processes
    if process_id is not None and process_id >= 0:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)
    p, n = jax.process_index(), jax.process_count()
    log("LOG", f"Distributed: process {p}/{n}, "
        f"{jax.local_device_count()} local device(s) of "
        f"{jax.device_count()} global", sub="DIST")
    return p, n


def resolve_mesh(spec: str, local_only: bool = False):
    """Mesh spec string -> jax Mesh or None. 'auto' shards the tile
    grid over all visible devices (pairs axis) when there is more than
    one; 'PxS' builds an explicit ('pairs', 'samples') mesh; a
    'platform:' prefix (e.g. 'cpu:4x2') pins the device platform. In
    distributed mode each process meshes only its LOCAL devices: the
    pairs axis needs no cross-host collectives (tiles are independent),
    so inter-host scaling is the static tile partition.

    'dcn' (distributed runs only) instead builds ONE global mesh whose
    'samples' axis spans the processes: see make_dcn_mesh."""
    if spec in ("off", "", None):
        return None
    import jax
    from .mesh import make_mesh
    if spec == "dcn" or spec.startswith("dcn:"):
        return make_dcn_mesh(spec)
    platform = None
    if ":" in spec:
        platform, _, spec = spec.partition(":")
    if platform:
        devices = (jax.local_devices(backend=platform) if local_only
                   else jax.devices(platform))
    else:
        devices = jax.local_devices() if local_only else jax.devices()
    n_dev = len(devices)
    if spec == "auto":
        return make_mesh(n_dev, 1, devices=devices) if n_dev > 1 else None
    p, _, s = spec.partition("x")
    n_p, n_s = int(p), int(s) if s else 1
    return make_mesh(n_p, n_s, devices=devices[:n_p * n_s])


def make_dcn_mesh(spec: str = "dcn"):
    """Global ('pairs', 'samples') mesh for sample-axis scale-out: the
    packed haplotype word axis is sharded ACROSS PROCESSES, so each
    host holds only 1/n_procs of every genotype plane in device memory
    and the per-tile contingency counts are psum-reduced over DCN.

    This is the very-large-N mode (SURVEY §5.7/§5.8: 10M-sample scale,
    where one host cannot hold the planes); for ordinary inputs prefer
    the default distributed mode, which partitions the *tile grid*
    across processes with no cross-host collectives at all.

    Layout: mesh[p, s] = process s's local device p, i.e. every process
    is one 'samples' column. Pairs shards (rows) then hold one device
    per process, so sweep outputs -- replicated over 'samples' by the
    psum -- are fully addressable on every process and the host-side
    record path runs unchanged. 'dcn:P' restricts to P local devices
    per process (default: all)."""
    import jax
    n_procs = jax.process_count()
    if n_procs < 2:
        raise ValueError("mesh 'dcn' needs a multi-process run "
                         "(use --distributed)")
    _, _, p = spec.partition(":")
    per_proc = {}
    for d in jax.devices():
        per_proc.setdefault(d.process_index, []).append(d)
    n_local = min(len(v) for v in per_proc.values())
    n_p = int(p) if p else n_local
    if n_p > n_local:
        raise ValueError(f"dcn:{n_p} exceeds {n_local} local devices")
    import numpy as np
    from jax.sharding import Mesh
    cols = [per_proc[s][:n_p] for s in sorted(per_proc)]
    return Mesh(np.array(cols, dtype=object).T, ("pairs", "samples"))


def mesh_is_multiprocess(mesh) -> bool:
    """True when the mesh spans more than one jax process (the engine
    must then build global arrays instead of plain device uploads)."""
    if mesh is None:
        return False
    procs = {d.process_index for d in mesh.devices.flat}
    return len(procs) > 1


def partition_tiles(pairs, proc_id: int, n_procs: int):
    """Round-robin slice of the (i, j, diag) tile list for one process,
    plus the set of super-block ids that slice touches (only those need
    loading on this host)."""
    mine = pairs[proc_id::n_procs]
    touched = {i for i, j, _ in mine} | {j for _, j, _ in mine}
    return mine, touched


def shard_output_path(output: str, proc_id: int, n_procs: int) -> str:
    """Per-process shard name: out.two -> out.pKofN.two. Raises on
    stdout output -- shards must land on disk to be mergeable."""
    if output == "-":
        raise ValueError("distributed calc needs a file output")
    base = output[:-4] if output.endswith(".two") else output
    return f"{base}.p{proc_id}of{n_procs}.two"


def shard_paths(output: str, n_procs: int):
    """The shard names a `n_procs`-process run of `output` produces."""
    return [shard_output_path(output, p, n_procs) for p in range(n_procs)]


def sync_shards():
    """Barrier: every process's shard is closed and on disk before any
    process returns (so a driving script can merge right after rank 0
    exits)."""
    import jax.experimental.multihost_utils as mhu
    mhu.sync_global_devices("twk_calc_shards_done")


def merge_shards(shards, output: str, memory_gb: float = 1.0,
                 threads: int = 0) -> int:
    """Fold per-process (or per-chunk) .two shards into ONE
    position-sorted .two. The reference recipe is concat-then-sort
    (docs/job-balancing.md "concatenate and sort"); here the shard list
    streams STRAIGHT into the external sorter's run phase (sort_two
    accepts multiple inputs), so the merge never writes or re-reads a
    concatenated intermediate -- at N shards the rate matches the
    single-file sort rate instead of paying an extra full IO pass.
    `shards` is a list of paths or a glob pattern. Returns the merged
    record count."""
    from ..post.sort import sort_two
    if isinstance(shards, str):
        shards = sorted(glob.glob(shards))
    if not shards:
        raise ValueError("no shards to merge")
    return sort_two(shards, output, memory_limit_gb=memory_gb,
                    threads=threads)
