"""All-vs-all / windowed LD compute orchestrator.

TPU-native replacement for the reference's slave/ticker engine
(reference: lib/ld/ld.cpp:477-671, ld_engine.cpp:1815-2880): variant
blocks regroup into MXU-sized super-blocks whose bitpacked planes live
in HBM, and the block-pair tile grid is swept by ONE fused device
dispatch per segment (compute/sweeps.py fused_sweep): per-tile MXU
contingency contractions, the f32 prefilter, per-tile survivor counts,
and capped gather-only compaction at a running offset, all inside one
lax.scan. The rare tiles that overflow the cap or spill the buffer are
repaired by a second exact-offset extract sweep.

Exact f64 statistics + Fisher tests are then recomputed on the host for
survivors only, and records stream to a .two writer. Total host<->device
traffic is proportional to the OUTPUT size, which matters both for
tunneled devices and for multi-host runs.
"""

import datetime
from dataclasses import dataclass, field
from typing import List

import numpy as np

from .. import __version__
from ..io.twk import TwkReader
from ..io.two import TwoWriter
from ..ops.bitpack import block_to_planes, stack_planes
from ..ops.ld_math import (LdFilters, PairMeta, ld_records, phased_math,
                           unphased_math)
from ..utils import Timer, log, pretty_int
from .balancer import Balancer


@dataclass
class CalcSettings:
    """Mirrors the reference twk_ld_settings defaults
    (reference: lib/core.cpp:297-306)."""
    input: str = ""
    output: str = "-"
    force_phased: bool = False
    forced_unphased: bool = False
    window: bool = False
    l_window: int = 1_000_000
    min_p: float = 1.0
    min_r2: float = 0.1
    max_r2: float = 100.0
    min_dprime: float = 0.0
    max_dprime: float = 100.0
    n_chunks: int = 1
    c_chunk: int = 0
    c_level: int = 1
    b_size: int = 10_000          # output block record limit
    intervals: List[str] = field(default_factory=list)
    # kept for backwards compatibility; the two-pass engine sizes its
    # buffers from the exact pass-1 counts instead
    batch_pairs: int = 16
    cap_fraction: float = 0.25
    # tiles per device dispatch: one compiled shape serves runs of any
    # size, and the progress ticker advances between segments
    sweep_segment: int = 4096
    performance: bool = False
    # consecutive .twk blocks are regrouped into super-blocks of up to
    # this many variants (never spanning a contig change) so each tile
    # is one large MXU matmul: [tile_rows x 2N] x [2N x tile_rows].
    # Small tiles leave the MXU ~10x under-utilized; oversized tiles
    # waste it in window mode, where pairs outside the window are
    # masked.  0 = auto: 4096 in square mode, and in window mode the
    # power of two nearest the expected variants-per-window (>= 512),
    # which keeps tile utilization high for small windows.
    tile_rows: int = 0
    # "auto": shard the tile grid over all local devices when more than
    # one is visible; "off": single device; "PxS": explicit
    # ('pairs', 'samples') mesh shape
    mesh: str = "auto"
    # device-memory budget for the bitpacked planes; inputs that exceed
    # it stream in band pairs (the low-memory analogue of the
    # reference's calc -M, reference: ld_engine.cpp:1871-1896)
    memory_gb: float = 12.0
    # host threads for block decompression + plane inflation (the
    # reference's parallel unpacker, ld_unpacker.h); 0 = all cores
    threads: int = 0
    # multi-host mode: initialize jax.distributed, round-robin the tile
    # list across processes (diagonal tiles are ~half the work of
    # square ones, so interleaving balances load), and write one .two
    # shard per process. Merge = `twk concat` + `twk sort` over the
    # shards, exactly like the reference's chunk farm
    # (docs/job-balancing.md) but from a single command per host.
    distributed: bool = False
    coordinator: str = ""        # host:port; "" = jax auto-detect
    num_processes: int = -1      # -1 = auto
    process_id: int = -1         # -1 = auto
    # per-tile kernel backend: "pallas" fuses unpack + MXU contractions
    # + prefilter epilogue in one VMEM pass (ops/pallas_tiles.py);
    # "xla" is the dot+fused-elementwise path (ops/ld_kernels.py).
    # "auto" = pallas on TPU, xla elsewhere (pallas does not lower on
    # CPU; a samples-sharded mesh uses the parts-only pallas kernel
    # with an XLA psum epilogue).
    tile_backend: str = "auto"
    # execution backend: "auto" routes workloads too small to amortize
    # device dispatch/compile overhead onto the XLA CPU backend (the
    # regime where the reference's RLE kernels shine,
    # reference: ld_engine.cpp:1011-1160 -- tiny N, few pairs);
    # "device" / "cpu" force one side. Single-process runs only.
    backend: str = "auto"
    # in-run checkpoint/resume (beyond the reference, whose only retry
    # unit is a whole -c/-C chunk, SURVEY §5.4): path of a sidecar
    # state file. If it exists, the run resumes after the last
    # checkpointed sweep segment, truncating the output to the
    # checkpointed offset; it is deleted on successful completion.
    # Distributed tile-partition runs checkpoint per process (sidecar
    # `<path>.pKofN`, each shard resumes independently behind a resume
    # barrier); a dcn mesh cannot checkpoint (collective program order
    # cannot skip segments per process).
    checkpoint: str = ""
    checkpoint_interval: float = 60.0   # seconds between checkpoints
    # banded (low-memory) runs: inflate + upload the NEXT load's band
    # on a background worker while the current load computes, hiding
    # host->device staging behind the sweep. Splits the plane budget 3
    # ways instead of 2 (the third slot holds the in-flight band).
    # Works in distributed tile-partition mode (each process stages its
    # own next band); a dcn mesh stays on-demand -- global-array
    # creation is collective and must run on the main thread in
    # program order.
    stage_prefetch: bool = True
    # sort this run's output (shard) in place before returning: in
    # distributed mode every process then ships a PRESORTED shard, so
    # `merge_shards` skips its re-sort phase and k-way merges the
    # shards in one sequential pass (the reference's phase-2 merge over
    # presorted runs, lib/two_reader.cpp:272-421) -- phase-1 sort work
    # parallelizes across the processes that produced the shards.
    sort_shards: bool = False


@dataclass
class CalcResult:
    n_pairs: int = 0
    n_records: int = 0
    elapsed: float = 0.0
    # banded-run staging telemetry (LdEngine.stage_stats): upload time
    # hidden behind compute vs exposed on the main thread, bytes moved,
    # bands prefetched by the background worker vs loaded on demand
    stage_stats: dict = None

    @property
    def pairs_per_sec(self) -> float:
        return self.n_pairs / self.elapsed if self.elapsed else 0.0


def _pair_meta_from(stacked, bi, bj, k, l) -> PairMeta:
    return PairMeta(
        pos_a=stacked["pos"][bi, k].astype(np.int64),
        pos_b=stacked["pos"][bj, l].astype(np.int64),
        rid_a=stacked["rid"][bi, k].astype(np.int64),
        rid_b=stacked["rid"][bj, l].astype(np.int64),
        ac_a=stacked["ac"][bi, k].astype(np.int64),
        ac_b=stacked["ac"][bj, l].astype(np.int64),
        an_a=stacked["an"][bi, k].astype(np.int64),
        an_b=stacked["an"][bj, l].astype(np.int64),
        hwe_a=stacked["hwe"][bi, k].astype(np.float64),
        hwe_b=stacked["hwe"][bj, l].astype(np.float64),
    )


def _reverse_records(recs: np.ndarray) -> np.ndarray:
    """The (B, A) mirror of each record: swap rid and position tuples;
    statistics and counts stay in the original orientation
    (reference: ld_engine.cpp:1290-1298)."""
    rev = recs.copy()
    # rev shares no memory with recs after the copy, so the swapped
    # field writes need no intermediate copies
    rev["ridA"], rev["ridB"] = recs["ridB"], recs["ridA"]
    rev["packA"], rev["packB"] = recs["packB"], recs["packA"]
    return rev


def _bucket(n: int, lo: int) -> int:
    """Round n up to a power of two (>= lo) to bound recompiles."""
    b = lo
    while b < n:
        b *= 2
    return b


def _round_up(n: int, q: int) -> int:
    """Round n up to a multiple of q. Used for tile-list padding where
    every padded entry costs a full tile of compute -- power-of-two
    padding would waste up to 2x; distinct lengths only cost compiles,
    which segmenting already bounds to one odd remainder per run."""
    return ((n + q - 1) // q) * q


def _auto_tile_rows(entries, block_ids, settings) -> int:
    """Resolve tile_rows=0 (auto): 4096 rows in every mode.

    Round 3 sized window-mode tiles to the expected variants-per-window
    (1024 rows at a chr6-density 250 kb window) to keep the candidate
    grid unmasked; round 5's grouped-scan sweeps (sweeps.tile_group)
    flipped the economics: a 4096-row tile's MXU dot runs ~8.5x more
    raw pairs/s than a 1024-row one, which beats any utilization win
    masking can offer (measured 250 kb chr-scale: 3.27B candidate
    pairs/s at 4096 rows / 14.8% utilization vs ~1.5-2B at 1024 rows /
    59% -- tools/bench_window.py). Even at a 10 kb window the raw-rate
    collapse of small tiles dominates the masking waste. tile_rows
    remains an explicit override."""
    return 4096


def _super_ranges(entries, block_ids, tile_rows: int):
    """Greedily pack consecutive block ids into super-blocks of up to
    tile_rows records, never crossing a contig boundary or a gap in the
    id list. Returns a list of dicts with keys ids/n/rid/minpos/maxpos."""
    out = []
    cur = None
    for b in block_ids:
        e = entries[b]
        if cur is not None and (
                cur["rid"] != e.rid or cur["n"] + e.n > tile_rows
                or cur["ids"][-1] + 1 != b):
            out.append(cur)
            cur = None
        if cur is None:
            cur = dict(ids=[b], n=e.n, rid=e.rid, minpos=e.minpos,
                       maxpos=e.maxpos)
        else:
            cur["ids"].append(b)
            cur["n"] += e.n
            cur["minpos"] = min(cur["minpos"], e.minpos)
            cur["maxpos"] = max(cur["maxpos"], e.maxpos)
    if cur is not None:
        out.append(cur)
    return out


class LdEngine:
    """Holds device-resident block tensors and the jitted two-pass
    sweeps for one run configuration. Pass a ('pairs'[, 'samples'])
    jax.sharding.Mesh to shard the tile grid (and optionally the packed
    word axis) across devices.

    The engine is long-lived across banded-streaming loads: device
    planes are cached per BAND (uploaded once while the band stays
    resident, the fix for the per-band-pair re-upload of round 1), and
    all jitted sweep functions are shared across loads. A plain
    `LdEngine(stacked, ...)` call wraps `stacked` as a single
    always-resident band."""

    #: resident band limit: a banded load touches at most 2 bands, and
    #: holding a third lets the row band survive the (i, i) diagonal
    MAX_RESIDENT_BANDS = 2

    def __init__(self, stacked: dict, n_samples: int,
                 settings: CalcSettings, mesh=None, B: int = None):
        from ..utils.jaxcache import enable_compilation_cache
        enable_compilation_cache()
        import jax.numpy as jnp
        from . import sweeps

        self.sweeps = sweeps
        self.settings = settings
        self.n_samples = n_samples
        self.window = settings.l_window if settings.window else 0
        self.mesh = mesh
        self.n_pair_shards = 1 if mesh is None else mesh.shape["pairs"]
        # a mesh whose 'samples' axis spans processes (dcn mode): plane
        # uploads become global arrays holding only the local word slice
        from ..parallel.distributed import mesh_is_multiprocess
        self._multiproc = mesh_is_multiprocess(mesh)
        self._samples_col = 0
        self._n_procs = 1
        if self._multiproc:
            import jax
            procs = sorted({d.process_index
                            for d in mesh.devices.flat})
            self._samples_col = procs.index(jax.process_index())
            self._n_procs = len(procs)
        self._jnp = jnp
        self._extract_fns = {}
        self.ticker = None           # optional ProgressTicker
        # fused-sweep survivor buffer, grown when a segment spills
        self._outcap = 1 << 18
        # per-tile survivor cap for the fused sweep, raised when tiles
        # overflow it (record-dense regimes): the repair sweep re-runs
        # the overflowed tiles' full MXU contractions, so chronic
        # overflow nearly doubles device work on hit tiles
        self._fused_cap = self.FUSED_CAP
        # in-sweep Fisher: the fused sweep carries a bracket per
        # survivor (sweeps.append_fisher_col) and the host multiplies
        # by the exact f64 q -- phased tables only. Above ~32k
        # haplotypes the outward walk's typical distance (D*2N cells to
        # the mirror crossing) overruns the device step cap, so most
        # lanes would flag for the host recompute anyway -- wide
        # cohorts keep Fisher on host.
        import os as _os
        self._device_fisher = \
            _os.environ.get("TWK_DEVICE_FISHER", "1") == "1" \
            and 2 * n_samples <= (1 << 15)
        self._lf_host = None
        # segment pipeline (run_group): a single consumer thread
        # processes dispatched segments in order while the main thread
        # keeps the device queue fed. After a consumer failure the run
        # degrades to serial; this many consecutive clean serial
        # segments re-enable pipelining (each disable doubles the
        # threshold, so a genuinely memory-tight run converges serial)
        self._pipeline_enabled = True
        self._pipeline_retry_after = 8
        self._serial_ok_streak = 0
        self._seg_error = None       # first consumer failure, if any
        self._seg_pool_ = None       # lazy 1-thread consumer pool
        # per-(table, miss, cls) survivor-buffer prefix rows pulled per
        # shard ahead of the counts (see _submit_segment)
        self._prefix_rows = {}
        # checkpoint/resume accounting: sweep segments are the resume
        # unit; the dispatch plan (group_tiles order, segment size) is
        # deterministic, so `units_done` counts identically across runs
        self.ckpt_skip = 0        # segments to skip (restored progress)
        self.units_done = 0       # segments completed or skipped
        self._units_planned = 0   # segments skipped or dispatched
        self.cand_total = 0       # cumulative candidate pairs
        self.on_segment = None    # callback after each executed segment
        # set when a pallas kernel fails to compile at runtime: the run
        # degrades to the XLA tile path instead of dying (Mosaic edge
        # cases on new shape combinations are real; outputs of the two
        # backends are identical by construction)
        self._backend_forced = None
        # per-config dispatch statistics, the analogue of the
        # reference's n_method[] kernel counters (ld_engine.h:313)
        self.stats = {}
        # per-allele-count histogram (log2 buckets of min(ac_a, ac_b)):
        # survivors and kept records per bucket, the analogue of the
        # reference's AC-keyed twk_ld_perf cycle arrays
        # (ld_engine.h:171-174, printed at ld.cpp:1047-1052) -- the
        # introspection view its kernel-crossover fits came from.
        # Filled only under settings.performance.
        self.ac_hist = {}
        # band-granular device residency
        self._band_host = {}      # band_id -> host planes (word keys)
        self._band_dev = {}       # (key, band_id) -> device array
        self._band_meta = {}      # band_id -> host metadata dict
        self._band_nb = {}        # band_id -> number of supers
        self._load_bands = []     # band ids of the current load, in order
        self._load_dev = {}       # per-load concatenated dev arrays
        self.n_band_uploads = 0   # telemetry: device uploads performed
        # band staging: a single worker inflates + uploads the NEXT
        # load's band while the current load computes (the host-DMA
        # overlap the reference's low-memory mode lacks -- it
        # re-inflates per tile on the compute threads,
        # ld_engine.cpp:1871-1896). `exposed_s` is main-thread time
        # blocked on uploads, `wait_s` main-thread time blocked on an
        # unfinished prefetch, `hidden_s` worker upload time that
        # overlapped compute.
        import threading
        self._stage_lock = threading.Lock()
        self._stage_pool = None
        self._stage_futures = []
        self._seen_keys = set()
        self.stage_stats = dict(hidden_s=0.0, exposed_s=0.0, wait_s=0.0,
                                bytes=0, n_prefetched=0, n_blocking=0)

        self.stacked = None
        self.B = B
        self.NB = 0
        if stacked is not None:
            self.set_load([("all", stacked)])
        elif B is None:
            raise ValueError("need either stacked planes or explicit B")

    # -- band residency --------------------------------------------------
    def _pad_samples_axis(self, host: dict) -> dict:
        if self.mesh is None or "samples" not in self.mesh.shape \
                or self.mesh.shape["samples"] <= 1:
            return host
        ns = self.mesh.shape["samples"]
        out = dict(host)
        for k in self.sweeps.WORD_KEYS:
            v = out[k]
            W = v.shape[-1]
            Wp = ((W + ns - 1) // ns) * ns
            if Wp != W:
                pad = np.zeros((*v.shape[:-1], Wp - W), v.dtype)
                if k == "miss_bits":   # padding is "missing"
                    pad = ~pad
                out[k] = np.concatenate([v, pad], axis=-1)
        return out

    META_KEYS = ("pos", "rid", "ac", "an", "n_het", "n_hom", "hwe",
                 "has_missing", "valid", "n_rec")

    def set_load(self, bands):
        """Make `bands` (a list of (band_id, stacked-or-None)) the
        current load, in order. A band passed with stacked=None must
        still be resident from an earlier load. Evicts bands outside
        the load beyond MAX_RESIDENT_BANDS."""
        for band_id, stacked in bands:
            if stacked is None:
                if band_id not in self._band_meta:
                    raise ValueError(f"band {band_id} not resident")
                continue
            self._register_band(band_id, stacked)
        self._load_bands = [b for b, _ in bands]
        self._load_dev = {}
        self.NB = sum(self._band_nb[b] for b in self._load_bands)
        self.stacked = {
            k: np.concatenate([self._band_meta[b][k]
                               for b in self._load_bands])
            for k in self.META_KEYS}
        # evict non-load bands beyond the residency limit (LRU-ish:
        # anything not in the current load is fair game)
        with self._stage_lock:
            resident = [b for b in self._band_host
                        if b in self._load_bands]
            others = [b for b in self._band_host
                      if b not in self._load_bands]
            for b in others[:max(0, len(resident) + len(others)
                                 - self.MAX_RESIDENT_BANDS)]:
                self._evict_locked(b)

    def _register_band(self, band_id, stacked):
        host = self._pad_samples_axis(
            {k: stacked[k] for k in self.sweeps.BAND_KEYS})
        if self.B is None:
            self.B = stacked["alt_bits"].shape[1]
        elif stacked["alt_bits"].shape[1] != self.B:
            raise ValueError("band tile_rows mismatch")
        with self._stage_lock:
            self._band_host[band_id] = host
            self._band_meta[band_id] = {k: stacked[k]
                                        for k in self.META_KEYS}
            self._band_nb[band_id] = stacked["alt_bits"].shape[0]

    def _evict_locked(self, band_id):
        self._band_host.pop(band_id, None)
        self._band_meta.pop(band_id, None)
        self._band_nb.pop(band_id, None)
        for key in [k for k in self._band_dev if k[1] == band_id]:
            self._band_dev.pop(key)

    def _upload(self, k, host):
        if self._multiproc:
            return self._global_upload(k, host)
        if self.mesh is not None:
            return self._mesh_upload(k, host)
        return self._jnp.asarray(host)

    def _band_dev_get(self, k, band_id):
        key = (k, band_id)
        self._seen_keys.add(k)
        with self._stage_lock:
            arr = self._band_dev.get(key)
            if arr is not None:
                return arr
            host = self._band_host[band_id][k]
        import time as _t
        t0 = _t.perf_counter()
        arr = self._upload(k, host)
        with self._stage_lock:
            self._band_dev[key] = arr
            self.n_band_uploads += 1
            self.stage_stats["exposed_s"] += _t.perf_counter() - t0
            self.stage_stats["bytes"] += getattr(host, "nbytes", 0)
            self.stage_stats["n_blocking"] += 1
        return arr

    # -- band staging (upload/compute overlap) ---------------------------
    def stage_band(self, band_id, stacked):
        """Register `stacked` as band `band_id` and push its device
        planes ahead of use, so the following `set_load` finds the band
        resident with its transfers already done. Runs on the staging
        worker; evicts surplus non-load bands first so the staged band
        never pushes residency past MAX_RESIDENT_BANDS."""
        if band_id in self._band_meta:
            return
        with self._stage_lock:
            others = [b for b in self._band_host
                      if b not in self._load_bands and b != band_id]
            for b in others[:max(0, len(self._band_host) + 1
                                 - self.MAX_RESIDENT_BANDS)]:
                self._evict_locked(b)
        self._register_band(band_id, stacked)
        # stage the planes the run has actually used (a phased sweep
        # never pays for het/hom/valid planes); before any sweep ran,
        # the alt plane is the one certainty
        keys = (self._seen_keys & set(self.sweeps.BAND_KEYS)) \
            or {"alt_bits"}
        import time as _t
        for k in keys:
            with self._stage_lock:
                if (k, band_id) in self._band_dev:
                    continue
                host = self._band_host[band_id][k]
            t0 = _t.perf_counter()
            arr = self._upload(k, host)
            try:
                arr.block_until_ready()
            except AttributeError:
                pass
            with self._stage_lock:
                self._band_dev[(k, band_id)] = arr
                self.n_band_uploads += 1
                self.stage_stats["hidden_s"] += _t.perf_counter() - t0
                self.stage_stats["bytes"] += getattr(host, "nbytes", 0)
        self.stage_stats["n_prefetched"] += 1

    def stage_band_async(self, band_id, provider):
        """Queue background staging of one band: `provider()` builds
        its stacked host planes (e.g. RLE inflation) and `stage_band`
        uploads them, all overlapping the current load's compute. The
        single worker thread doubles as backpressure: at most one band
        stages at a time. Not used on multi-process meshes (global
        array creation is a collective and must stay on the main
        thread, in program order)."""
        if band_id in self._band_meta or self._multiproc:
            return
        if self._stage_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._stage_pool = ThreadPoolExecutor(
                1, thread_name_prefix="twk-stage")

        def work():
            if band_id not in self._band_meta:
                self.stage_band(band_id, provider())
        self._stage_futures.append((band_id, self._stage_pool.submit(work)))

    def stage_wait(self):
        """Drain outstanding staging work before the next `set_load`
        touches the residency maps. A failed staging job degrades to
        the on-demand inflate+upload path instead of killing the run."""
        import time as _t
        t0 = _t.perf_counter()
        for band_id, fut in self._stage_futures:
            try:
                fut.result()
            except Exception as e:   # noqa: BLE001 - degrade, don't die
                log("WARNING", f"staging band {band_id} failed "
                    f"({type(e).__name__}: {str(e)[:120]}); falling "
                    f"back to on-demand load", sub="MEMORY")
        if self._stage_futures:
            self.stage_stats["wait_s"] += _t.perf_counter() - t0
        self._stage_futures = []

    def stage_close(self):
        self.stage_wait()
        if self._stage_pool is not None:
            self._stage_pool.shutdown(wait=False)
            self._stage_pool = None
        if self._seg_pool_ is not None:
            # run_group drains its in-flight segments before returning,
            # so the consumer pool is idle here
            self._seg_pool_.shutdown(wait=True)
            self._seg_pool_ = None

    def _mesh_upload(self, k, host):
        """Local mesh: commit each band plane with the sweep's sharding
        (word planes split on the samples axis, metadata replicated) so
        a samples-sharded mesh really holds 1/S of every word plane per
        device -- the banding budget assumes it -- instead of parking
        the full plane on the default device and resharding per call."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        samples = self.mesh.shape.get("samples", 1) > 1
        spec = (P(None, None, "samples")
                if samples and k in self.sweeps.WORD_KEYS else P())
        return jax.device_put(host, NamedSharding(self.mesh, spec))

    def _global_upload(self, k, host):
        """dcn mode: make a process-spanning global array for one band.
        Word planes upload only this process's 1/S slice of the (padded)
        word axis; metadata vectors are replicated. The host keeps the
        full planes; device memory per host is planes/S."""
        import jax.experimental.multihost_utils as mhu
        from jax.sharding import PartitionSpec as P
        ns = self.mesh.shape["samples"]
        with self.mesh:
            if k in self.sweeps.WORD_KEYS:
                W = host.shape[-1]
                step = W // ns
                lo = self._samples_col * step
                return mhu.host_local_array_to_global_array(
                    host[..., lo:lo + step], self.mesh,
                    P(None, None, "samples"))
            return mhu.host_local_array_to_global_array(
                host, self.mesh, P())

    def _dev_for(self, cfg) -> dict:
        """Device tensors for one sweep config: per-band uploads happen
        on first use (a phased run never pays for the het/hom/valid
        sample planes), then concatenate on device per load. In dcn
        mode bands are global arrays and the eager concatenation runs
        as the same SPMD program on every process, so band residency
        caching works identically."""
        out = {}
        for k in self.sweeps.dev_keys_for(cfg):
            if k not in self._load_dev:
                parts = [self._band_dev_get(k, b)
                         for b in self._load_bands]
                self._load_dev[k] = (parts[0] if len(parts) == 1
                                     else self._jnp.concatenate(parts))
            out[k] = self._load_dev[k]
        return out

    def _stat(self, table, has_missing, cls):
        key = f"{table}/{'miss' if has_missing else 'nomiss'}/{cls}"
        return self.stats.setdefault(key, dict(
            n_tiles=0, n_cand=0, n_pass=0, n_records=0,
            count_s=0.0, extract_s=0.0, math_s=0.0,
            n_supp=0, n_repair=0))

    def _can_degrade(self) -> bool:
        """Whether a kernel failure may degrade this run to the XLA
        tile backend (only meaningful when the pallas backend is
        active and not already degraded)."""
        return self._resolve_backend() == "pallas" \
            and self._backend_forced != "xla"

    def _resolve_backend(self) -> str:
        if self._backend_forced is not None:
            return self._backend_forced
        b = getattr(self.settings, "tile_backend", "auto")
        if b != "auto":
            return b
        # samples-sharded meshes run the parts-only pallas kernel with
        # a psum + jnp epilogue (sweeps.tile_prefilter psum path)
        plat = list(self._jnp.zeros(0).devices())[0].platform
        # the tunneled v5e plugin reports platform "axon", not "tpu"
        return "pallas" if plat in ("tpu", "axon") else "xla"

    def _cfg(self, table, has_missing, cls):
        return self.sweeps.make_cfg(
            table, has_missing, cls, self.B, self.n_samples, self.window,
            self.settings.min_r2, self.settings.max_r2,
            backend=self._resolve_backend(),
            min_dprime=self.settings.min_dprime,
            max_dprime=self.settings.max_dprime,
            fisher=self._device_fisher)

    def _lf_host_get(self) -> np.ndarray:
        """Host f64 log-factorial table: the exact q of the in-sweep
        Fisher split P = q * bracket (ops/fisher_dev.py)."""
        if self._lf_host is None:
            from ..ops.fisher_dev import log_factorial_table
            self._lf_host = log_factorial_table(2 * self.n_samples + 1)
        return self._lf_host

    def _extract_fn(self, table, has_missing, cls, cap, outcap):
        key = (table, has_missing, cls, cap, outcap)
        if key not in self._extract_fns:
            cfg = self._cfg(table, has_missing, cls)
            if self.mesh is None:
                fn = self.sweeps.jit_extract_sweep(cfg, cap, outcap)
            else:
                fn = self.sweeps.shard_extract_sweep(self.mesh, cfg, cap,
                                                     outcap)
            self._extract_fns[key] = fn
        return self._extract_fns[key]

    def _fused_fn(self, table, has_missing, cls, cap, outcap):
        key = ("fused", table, has_missing, cls, cap, outcap)
        if key not in self._extract_fns:
            cfg = self._cfg(table, has_missing, cls)
            if self.mesh is None:
                fn = self.sweeps.jit_fused_sweep(cfg, cap, outcap)
            else:
                fn = self.sweeps.shard_fused_sweep(self.mesh, cfg, cap,
                                                   outcap)
            self._extract_fns[key] = fn
        return self._extract_fns[key]

    def _tiles_in(self, *arrays):
        """Sweep tile-list inputs. dcn mode: global arrays sharded over
        'pairs'; every process passes the SAME full list (each pairs
        row holds one device per process, so the full list is each
        process's addressable portion)."""
        if not self._multiproc:
            return arrays
        import jax.experimental.multihost_utils as mhu
        from jax.sharding import PartitionSpec as P
        with self.mesh:
            return tuple(mhu.host_local_array_to_global_array(
                a, self.mesh, P("pairs")) for a in arrays)

    def _buf_rows(self, buf, lo, hi) -> np.ndarray:
        """Host copy of rows [lo, hi) of a sweep output buffer. dcn
        mode reads from the addressable replica of the owning 'pairs'
        shard (outputs are samples-replicated by the psum)."""
        return np.asarray(self._buf_slice(buf, lo, hi))

    def _buf_slice(self, buf, lo, hi):
        """ASYNC device slice of rows [lo, hi) of a sweep output buffer
        (no host transfer). Enqueueing the slice op BEFORE the next
        segment's sweep is dispatched is what lets the host transfer
        overlap that sweep -- a slice enqueued after it would wait for
        the whole sweep to finish (the round-3 dense-output
        serialization)."""
        if not self._multiproc:
            return buf[lo:hi]
        for sh in buf.addressable_shards:
            start = sh.index[0].start or 0
            stop = start + sh.data.shape[0]
            if start <= lo and hi <= stop:
                return sh.data[lo - start:hi - start]
        raise AssertionError(f"rows [{lo},{hi}) span no addressable "
                             f"shard of {buf.shape}")

    # -- orchestration ---------------------------------------------------
    def _seg_pool(self):
        if self._seg_pool_ is None:
            from concurrent.futures import ThreadPoolExecutor
            self._seg_pool_ = ThreadPoolExecutor(
                1, thread_name_prefix="twk-seg")
        return self._seg_pool_

    def _pipeline_depth(self) -> int:
        """In-flight segment limit. 1 = strictly serial (dispatch,
        process, dispatch, ...); 2 keeps the device sweeping segment
        k+1 while the consumer thread transfers + maths + writes
        segment k -- the TPU-native analogue of the reference's
        compute/output overlap across slave threads
        (reference: ld_engine.cpp:1742-1810). Gated on HBM headroom
        (two in-flight sweeps double the transient one-hot unpack
        workspace) and on survivor-buffer size (two in-flight buffers
        at the growth cap would hold ~2/3 GB of HBM). Multi-process
        meshes stay serial: collective programs must be issued from one
        thread in program order on every process."""
        if self._multiproc or not self._pipeline_enabled:
            return 1
        if self._outcap > (1 << 21) or not self._prefetch_headroom_ok():
            return 1
        return 2

    def run_group(self, tiles, table, has_missing, cls, filt, emit) -> int:
        """Sweep one (table, missing, cls) tile group in fixed-size
        segments (one compiled shape serves runs of any size; progress
        and checkpoints advance between segments). Returns the number
        of candidate pairs evaluated.

        Segments are dispatched AHEAD of consumption: _submit_segment
        enqueues the sweep plus prefix slices of its survivor buffer
        with no host round trip in between, and a single consumer
        thread forces counts, pulls survivors, runs the exact host math
        and emits records in segment order. The per-segment
        force->dispatch latency (a ~30 ms round trip per segment on a
        tunneled link, the round-4 headline regression) thus overlaps
        device compute instead of serializing with it."""
        from collections import deque
        seg = self._segment_size(len(tiles))
        todo = []
        for s in range(0, len(tiles), seg):
            if self._units_planned < self.ckpt_skip:
                # resumed run: this segment's records are already in
                # the checkpointed output
                self._units_planned += 1
                self.units_done += 1
                continue
            self._units_planned += 1
            todo.append(tiles[s:s + seg])
        n = 0
        inflight = deque()       # (todo index, future)
        k = 0
        while k < len(todo) or inflight:
            if self._seg_error is not None and not inflight:
                self._seg_error = None     # stale: nothing in flight
            depth = self._pipeline_depth()
            if k < len(todo) and len(inflight) < depth \
                    and self._seg_error is None:
                if depth == 1 and not inflight:
                    try:
                        n += self._run_segment(todo[k], table,
                                               has_missing, cls, filt,
                                               emit)
                    except Exception as e:  # noqa: BLE001 - ladder
                        n += self._degrade_or_raise(
                            todo[k], table, has_missing, cls, filt,
                            emit, e)
                    self._note_serial_ok()
                else:
                    st = self._submit_segment(todo[k], table,
                                              has_missing, cls)
                    fut = self._seg_pool().submit(
                        self._seg_job, todo[k], table, has_missing,
                        cls, filt, emit, st)
                    inflight.append((k, fut))
                k += 1
                continue
            j, fut = inflight.popleft()
            try:
                n += fut.result()
            except Exception as e:  # noqa: BLE001 - recovery ladder
                # segment j failed on the consumer (an HBM
                # RESOURCE_EXHAUSTED from overlapped workspace, or a
                # runtime Mosaic failure surfacing at force time).
                # Later in-flight segments skipped themselves without
                # emitting (emissions must stay in segment order), so
                # re-run everything from j serially; pipelining
                # re-enables after a clean streak.
                for _, f2 in inflight:
                    try:
                        f2.result()
                    except Exception:   # noqa: BLE001 - already skipped
                        pass
                inflight.clear()
                self._seg_error = None
                self._pipeline_enabled = False
                self._serial_ok_streak = 0
                self._pipeline_retry_after = min(
                    self._pipeline_retry_after * 2, 1 << 12)
                log("WARNING", f"device sweep failed in the segment "
                    f"pipeline ({type(e).__name__}: {str(e)[:160]}); "
                    f"retrying serially", sub="ENGINE")
                try:
                    n += self._run_segment(todo[j], table, has_missing,
                                           cls, filt, emit)
                except Exception as e2:  # noqa: BLE001 - last rung
                    n += self._degrade_or_raise(
                        todo[j], table, has_missing, cls, filt, emit, e2)
                k = j + 1
        return n

    def _degrade_or_raise(self, seg_tiles, table, has_missing, cls,
                          filt, emit, err) -> int:
        """Last recovery rung: degrade the run to the XLA tile backend
        (identical outputs by construction) and re-run the segment, or
        re-raise when no degradation is available."""
        if not self._can_degrade():
            raise err
        log("WARNING", f"pallas tile kernel failed "
            f"({type(err).__name__}: {str(err)[:160]}); falling back "
            f"to the XLA backend", sub="ENGINE")
        self._backend_forced = "xla"
        self._extract_fns.clear()
        return self._run_segment(seg_tiles, table, has_missing, cls,
                                 filt, emit)

    def _note_serial_ok(self):
        """A segment forced cleanly without overlap; after enough
        consecutive successes, retry pipelining (transient OOMs on
        stats-less tunneled devices shouldn't serialize the rest of a
        long run)."""
        if self._pipeline_enabled:
            return
        self._serial_ok_streak += 1
        if self._serial_ok_streak >= self._pipeline_retry_after:
            log("LOG", f"re-enabling the segment pipeline after "
                f"{self._serial_ok_streak} clean serial segments",
                sub="ENGINE")
            self._pipeline_enabled = True
            self._serial_ok_streak = 0

    def _seg_job(self, tiles, table, has_missing, cls, filt, emit, state):
        """Consumer-thread wrapper around _run_segment: skip (without
        emitting) when an earlier segment already failed, so emissions
        stay in segment order and the retry ladder can replay from the
        failure point."""
        if self._seg_error is not None:
            return 0
        try:
            return self._run_segment(tiles, table, has_missing, cls,
                                     filt, emit, state=state)
        except BaseException as e:
            self._seg_error = e
            raise

    # survivors extracted per tile inside the fused sweep; tiles with
    # more go through the exact-offset repair pass. The cap adapts
    # upward (see _run_segment) when a run's tiles overflow it.
    FUSED_CAP = 256
    FUSED_CAP_MAX = 32768

    # target sweep segments per tile group: the consumer thread handles
    # transfer + host math of segment k while the device sweeps k+1, so
    # a group swept as ONE segment serializes the whole host pipeline
    # after the sweep -- the round-3 dense-output ceiling. ~8 segments
    # hide all but the last segment's host work behind device compute.
    PIPELINE_SEGMENTS = 8

    # initial survivor-buffer prefix rows pulled per shard before the
    # sweep's counts are known (see _submit_segment); adapts per group
    PREFIX_ROWS0 = 4096

    def _segment_size(self, n_tiles: int) -> int:
        """Resolved sweep segment size for an n_tiles group: at most
        settings.sweep_segment, at least one 16*n_shards quantum, and
        small enough to split the group into ~PIPELINE_SEGMENTS pieces
        (deterministic in (n_tiles, settings, mesh shape) -- checkpoint
        segment counting depends on that)."""
        quant = 16 * self.n_pair_shards
        seg = max(self.settings.sweep_segment, quant)
        want = -(-n_tiles // self.PIPELINE_SEGMENTS)
        want = _round_up(want, quant)
        return max(quant, min(seg, want))

    def _submit_segment(self, tiles, table, has_missing, cls):
        """Dispatch one segment's fused sweep AND enqueue the device
        ops whose results the consumer will read: per-shard survivor
        buffer PREFIX slices, sized from this group's recent survivor
        volume. The prefix size is static per call, so the slices have
        no data dependency on the sweep's counts -- they enter the
        device queue right behind their sweep, BEFORE the next
        segment's sweep, and their host transfers proceed the moment
        the sweep finishes (a slice enqueued after later sweeps would
        wait for them -- the round-3 serialization). Survivor rows that
        land beyond the prefix are pulled by the consumer with an
        exact-offset supplementary slice once the counts are known."""
        st = self._dispatch_fused(tiles, table, has_missing, cls)
        outcap = st["outcap"]
        X = min(self._prefix_rows.get((table, has_missing, cls),
                                      self.PREFIX_ROWS0), outcap)
        st["X"] = X
        st["prefix"] = [self._buf_slice(st["buf"], s * outcap,
                                        s * outcap + X)
                        for s in range(self.n_pair_shards)]
        for h in (st["n_pass"], st["n_cand"], *st["prefix"]):
            try:
                h.copy_to_host_async()
            except Exception:   # noqa: BLE001 - transfers force later
                pass
        return st

    def _dispatch_fused(self, tiles, table, has_missing, cls):
        """Dispatch one segment's fused sweep. The jitted call returns
        ASYNC device arrays; nothing is forced here, so a caller can
        queue the next segment's work before reading this one."""
        np_ = np
        S = self.n_pair_shards
        Tpad = _round_up(len(tiles), 16 * S)
        pad = Tpad - len(tiles)
        pi = np_.array([t[0] for t in tiles] + [0] * pad, np_.int32)
        pj = np_.array([t[1] for t in tiles] + [0] * pad, np_.int32)
        dg = np_.array([t[2] for t in tiles] + [True] * pad, bool)
        live = np_.array([True] * len(tiles) + [False] * pad, bool)

        dev = self._dev_for(self._cfg(table, has_missing, cls))
        cap = min(self._fused_cap, self.B * self.B)
        outcap = max(self._outcap, cap * 2)

        if not getattr(self, "_warmed", None):
            self._warmed = True
            log("LOG", "Dispatching device sweep (the first dispatch may "
                "take minutes while the program warms up)...",
                sub="ENGINE")
        try:
            n_pass, n_cand, buf = self._fused_fn(
                table, has_missing, cls, cap, outcap)(
                    dev, *self._tiles_in(pi, pj, dg, live))
        except Exception as e:
            if not self._can_degrade():
                raise
            # a Mosaic lowering/compile failure on this shape: degrade
            # the whole run to the XLA tile path (identical outputs)
            log("WARNING", f"pallas tile kernel failed "
                f"({type(e).__name__}: {str(e)[:200]}); falling back "
                f"to the XLA backend", sub="ENGINE")
            self._backend_forced = "xla"
            self._extract_fns.clear()
            n_pass, n_cand, buf = self._fused_fn(
                table, has_missing, cls, cap, outcap)(
                    dev, *self._tiles_in(pi, pj, dg, live))
        return dict(n_pass=n_pass, n_cand=n_cand, buf=buf, dev=dev,
                    pi=pi, pj=pj, dg=dg, live=live, Tpad=Tpad,
                    cap=cap, outcap=outcap)

    def _prefetch_headroom_ok(self) -> bool:
        """Overlapping two sweeps doubles the transient workspace; the
        one-hot unpack of both tile operands ([B, 32*Wh] int8 each)
        dominates it. Gate on live device memory stats with a 2.5x
        margin (the in-flight segment's workspace may not be charged
        yet when this runs); unknown stats allow prefetch."""
        try:
            import jax
            d = jax.local_devices()[0]
            stats = getattr(d, "memory_stats", lambda: None)()
            if not stats:
                return True
            limit = stats.get("bytes_limit") \
                or stats.get("bytes_reservable_limit")
            if not limit:
                return True
            from ..ops.bitpack import words_for
            need = 3 * self.B * 32 * words_for(2 * self.n_samples)
            return (limit - stats.get("bytes_in_use", 0)) > 2.5 * need
        except Exception:   # noqa: BLE001 - stats are advisory only
            return True

    def _run_segment(self, tiles, table, has_missing, cls, filt,
                     emit, state=None) -> int:
        """Process one dispatched segment: force counts, pull survivor
        rows (prefix + supplementary slices, exact-offset repair
        re-sweeps for cap/buffer overflows), run the exact host math,
        and emit records. Runs on the consumer thread in pipelined
        mode, inline otherwise; `state=None` dispatches the sweep here
        (the serial path)."""
        if not tiles:
            return 0
        import time as _time
        stat = self._stat(table, has_missing, cls)
        stat["n_tiles"] += len(tiles)
        np_ = np

        t0 = _time.perf_counter()
        st = state if state is not None \
            else self._submit_segment(tiles, table, has_missing, cls)
        n_pass = np_.asarray(st["n_pass"])
        n_cand = np_.asarray(st["n_cand"])
        buf = st["buf"]
        S = self.n_pair_shards
        Tpad, cap, outcap = st["Tpad"], st["cap"], st["outcap"]
        X = st["X"]
        pi, pj, dg, live = st["pi"], st["pj"], st["dg"], st["live"]
        dev = st["dev"]
        cfg_seg = self._cfg(table, has_missing, cls)
        ncol = self.sweeps.buf_cols(cfg_seg)
        # in-sweep Fisher: the sweep carries a bracket per survivor --
        # bf16 packed into the payload column's top bits (phased
        # no-missing) or an appended bitcast-f32 column
        fish = self.sweeps.fisher_on(cfg_seg)
        ncol_out = ncol + self.sweeps.fisher_cols(cfg_seg)
        stat["count_s"] += _time.perf_counter() - t0
        total_cand = int(n_cand.sum())
        stat["n_cand"] += total_cand
        self.cand_total += total_cand
        if int(n_pass.sum()) == 0:
            if self.ticker:
                self.ticker.add(pairs=total_cand)
            self._finish_segment()
            return total_cand
        stat["n_pass"] += int(n_pass[:len(tiles)].sum())

        # per-shard offsets: each 'pairs' shard ran its own offset
        # counter over its contiguous Tpad/S slice of the tile list
        per_shard = Tpad // S
        offs = np_.zeros(Tpad, np_.int64)
        for s in range(S):
            sl = slice(s * per_shard, (s + 1) * per_shard)
            offs[sl] = np_.cumsum(n_pass[sl]) - n_pass[sl] \
                + s * outcap
        boundary = outcap - cap
        shard_of = np_.arange(Tpad) // per_shard
        ok = (n_pass <= cap) & \
            (offs - shard_of * outcap + n_pass <= boundary)
        ok &= live

        # per-shard survivor rows: the pre-enqueued prefix covers rows
        # [0, X); rows of intact tiles beyond it come from one exact
        # supplementary slice (enqueued now, so it may wait behind an
        # already-dispatched next sweep -- the prefix adaptation below
        # makes that rare)
        t0 = _time.perf_counter()
        slice_handles = []
        max_end = 0
        for s in range(S):
            sl = slice(s * per_shard, (s + 1) * per_shard)
            sel = np_.flatnonzero(ok[sl] & (n_pass[sl] > 0)) + s * per_shard
            if len(sel) == 0:
                continue
            end = int(offs[sel[-1]] + n_pass[sel[-1]]) - s * outcap
            max_end = max(max_end, end)
            sup = None
            if end > X:
                stat["n_supp"] += 1
                sup = self._buf_slice(buf, s * outcap + X,
                                      s * outcap + end)
            slice_handles.append((s, sel, st["prefix"][s], sup, end))

        # adapt the prefix so the next segments of this regime fit it
        # (grow immediately, decay by halves when oversized). 8192-row
        # quanta bound the distinct eager-slice shapes (each costs one
        # tiny compile) without the 2x over-transfer a power-of-two
        # bucket costs at steady survivor volume.
        key = (table, has_missing, cls)
        cur = self._prefix_rows.get(key, self.PREFIX_ROWS0)
        # +1/16 headroom: the transfer is the record-dense ceiling on
        # tunnel-class links, so over-provisioning is real cost; the
        # supplementary exact slice covers the occasional overshoot
        want = min(_round_up(max(2048, max_end + (max_end >> 4)), 8192),
                   1 << 20)
        self._prefix_rows[key] = max(want, cur // 2)

        # repair pass: tiles that overflowed cap or spilled the buffer
        bad = np_.flatnonzero(live & (n_pass > 0) & ~ok)
        if len(bad) and bool((n_pass[bad] <= cap).any()):
            # at least one tile spilled the shared buffer (rather than
            # overflowing the per-tile cap): grow it for later segments
            self._outcap = min(self._outcap * 4, 1 << 23)
        if len(bad):
            stat["n_repair"] += len(bad)
            over = int(n_pass[bad].max())
            if over > cap:
                # adapt the fused cap so later segments in this regime
                # compact in-pass instead of paying the repair re-sweep
                self._fused_cap = min(_bucket(over, self.FUSED_CAP),
                                      self.FUSED_CAP_MAX,
                                      self.B * self.B)
        repair_handles = []
        if len(bad):
            ns_bad = n_pass[bad]
            rcap = min(_bucket(int(ns_bad.max()), 1024), self.B * self.B)
            groups = np_.array_split(np_.arange(len(bad)), S)
            totals = [int(ns_bad[g].sum()) for g in groups]
            routcap = _bucket(max(totals) + rcap, 16384)
            Hpad = _round_up(max(len(g) for g in groups), 8)
            hpi = np_.zeros(Hpad * S, np_.int32)
            hpj = np_.zeros(Hpad * S, np_.int32)
            hdg = np_.ones(Hpad * S, bool)
            hoff = np_.full(Hpad * S, routcap - rcap, np_.int32)
            for s, g in enumerate(groups):
                lo = s * Hpad
                hpi[lo:lo + len(g)] = pi[bad[g]]
                hpj[lo:lo + len(g)] = pj[bad[g]]
                hdg[lo:lo + len(g)] = dg[bad[g]]
                o = np_.zeros(len(g), np_.int32)
                if len(g):
                    o[1:] = np_.cumsum(ns_bad[g])[:-1]
                hoff[lo:lo + len(g)] = o
            rbuf = self._extract_fn(table, has_missing, cls, rcap,
                                    routcap)(
                dev, *self._tiles_in(hpi, hpj, hdg, hoff))
            repair_handles = [
                (g, self._buf_slice(rbuf, s * routcap,
                                    s * routcap + totals[s]))
                for s, g in enumerate(groups) if len(g)]

        rows_by_tile = {}
        for s, sel, prefix, sup, end in slice_handles:
            if sup is None:
                shard_buf = np_.asarray(prefix)[:end]
            else:
                shard_buf = np_.concatenate([np_.asarray(prefix),
                                             np_.asarray(sup)])
            for t in sel:
                lo = int(offs[t]) - s * outcap
                rows_by_tile[int(t)] = shard_buf[lo:lo + int(n_pass[t])]
        for g, handle in repair_handles:
            shard_buf = np_.asarray(handle)
            if fish and ncol_out > ncol:
                # repair rows carry no bracket column; pad so widths
                # match (their P is NaN'd via the validity mask below)
                shard_buf = np_.concatenate(
                    [shard_buf, np_.zeros((len(shard_buf), 1),
                                          np_.int32)], axis=1)
            o = 0
            for gi in g:
                t = int(bad[gi])
                rows_by_tile[t] = shard_buf[o:o + int(ns_bad[gi])]
                o += int(ns_bad[gi])
        stat["extract_s"] += _time.perf_counter() - t0

        hit = np_.array(sorted(rows_by_tile), np_.int64)
        ns = n_pass[hit]
        rows = (np_.concatenate([rows_by_tile[int(t)] for t in hit])
                if len(hit) else np_.zeros((0, ncol_out), np_.int32))

        # host math, batched into one call per group
        B = self.B
        idx = rows[:, 0].astype(np_.int64)
        k, l = idx // B, idx % B
        tile_of = np_.repeat(np_.arange(len(hit)), ns)
        bi = pi[hit][tile_of].astype(np_.int64)
        bj = pj[hit][tile_of].astype(np_.int64)
        meta = _pair_meta_from(self.stacked, bi, bj, k, l)
        parts = self.sweeps.unpack_payload(rows[:, 1:ncol], table,
                                           has_missing, self.n_samples)
        p_bits = None
        p_valid = None
        if fish and len(rows):
            # mirror the device's per-shard volume gate (integer sums
            # of the same n_pass -- deterministic agreement), and mask
            # repair-pass rows, which carry no bracket
            shard_ok = np_.array(
                [int(n_pass[s * per_shard:(s + 1) * per_shard].sum())
                 >= self.sweeps.FISHER_MIN_ROWS for s in range(S)])
            if shard_ok.any():
                is_rep = np_.zeros(Tpad, bool)
                is_rep[bad] = True
                row_tile = hit[tile_of]
                p_valid = shard_ok[row_tile // per_shard] \
                    & ~is_rep[row_tile]
            if p_valid is not None and p_valid.any():
                if self.sweeps.fisher_packed(cfg_seg):
                    u = np_.ascontiguousarray(
                        rows[:, 1]).view(np_.uint32)
                    p_bits = (u & np_.uint32(0xFFFF0000)) \
                        .view(np_.float32)
                else:
                    p_bits = np_.ascontiguousarray(
                        rows[:, ncol]).view(np_.float32)
        t0 = _time.perf_counter()
        # the whole survivor -> record pipeline (filters, Fisher,
        # flags, fwd+rev assembly) is ONE native batch call; the numpy
        # fallbacks below only run when the native lib is unavailable
        if table == "phased":
            data = self._phased_counts_from_parts(parts, meta)
        else:
            data = self._unphased_table_from_parts(parts, bi, bj, k, l)
        p_pre = None
        if p_bits is not None and table == "phased":
            from ..ops.fisher_dev import host_p_from_bracket
            p_pre = host_p_from_bracket(data, p_bits,
                                        self._lf_host_get(),
                                        filt.min_p)
            p_pre[~p_valid] = np_.nan
        kept_idx = None
        if self._multiproc and self._n_procs > 1:
            # dcn mode: every process holds identical survivor rows
            # (counts are psum-replicated); instead of each deriving
            # the full record stream, split the rows, compute 1/N of
            # the math locally, and allgather the records
            recs, rev = self._dcn_records(table, data, meta, filt,
                                          p_pre)
        else:
            out = ld_records(table, data, meta, filt, p_pre=p_pre)
            if out is not None:
                recs, rev, kept_idx = out[0], out[1], out[2]
            elif table == "phased":
                recs, kept_idx = phased_math(data, meta, filt)
                rev = None
            else:
                recs = unphased_math(data, meta, filt)
                rev = None
        stat["math_s"] += _time.perf_counter() - t0
        if self.settings.performance:
            self._tally_ac(meta, kept_idx)
        stat["n_records"] += len(recs)
        emit(recs, rev)
        if self.ticker:
            self.ticker.add(pairs=total_cand, records=len(recs))
        self._finish_segment()
        return total_cand

    def _finish_segment(self):
        """Segment bookkeeping shared by the early-exit and full paths:
        progress and the checkpoint callback advance here, on whichever
        thread processed the segment, AFTER its records were emitted --
        so checkpoint state always describes a whole-segment boundary."""
        self.units_done += 1
        if self.on_segment is not None:
            self.on_segment()

    def _tally_ac(self, meta: PairMeta, kept_idx):
        """Accumulate the per-allele-count histogram: log2 bucket of
        min(ac_a, ac_b) -> [survivors, records]. See ac_hist."""
        mn = np.asarray(np.minimum(meta.ac_a, meta.ac_b), np.int64)
        if len(mn) == 0:
            return
        buck = np.frexp(np.maximum(mn, 1).astype(np.float64))[1] - 1
        surv = np.bincount(buck)
        kept = (np.bincount(buck[np.asarray(kept_idx, np.int64)],
                            minlength=len(surv))
                if kept_idx is not None and len(kept_idx)
                else np.zeros(len(surv), np.int64))
        for i in range(len(surv)):
            if surv[i]:
                h = self.ac_hist.setdefault(int(i), [0, 0])
                h[0] += int(surv[i])
                h[1] += int(kept[i])

    def _dcn_records(self, table, data, meta: PairMeta, filt,
                     p_pre=None):
        """dcn host-math sharding (round-2 weakness 6): each process
        runs the survivor -> record pipeline for its contiguous slice
        of the K rows (host math time ∝ 1/N) and the variable-length
        record chunks are allgathered in rank order, so every process
        ends with the identical, order-preserved (fwd, rev) stream that
        the single-process path would have produced."""
        from dataclasses import fields as _dfields
        import jax.experimental.multihost_utils as mhu
        K = len(data)
        step = -(-K // self._n_procs)
        lo = min(K, self._samples_col * step)
        hi = min(K, lo + step)
        sl = slice(lo, hi)
        meta_sl = PairMeta(**{f.name: getattr(meta, f.name)[sl]
                              for f in _dfields(PairMeta)})
        if hi <= lo:
            # fewer rows than processes: this rank's slice is empty,
            # but it must still join the allgathers below
            from ..io.two import TWO_DTYPE
            recs = rev = np.empty(0, TWO_DTYPE)
        else:
            out = ld_records(table, data[sl], meta_sl, filt,
                             p_pre=None if p_pre is None else p_pre[sl])
            if out is not None:
                recs, rev = out[0], out[1]
            elif table == "phased":
                recs, _ = phased_math(data[sl], meta_sl, filt)
                rev = None
            else:
                recs = unphased_math(data[sl], meta_sl, filt)
                rev = None
            if rev is None:
                rev = _reverse_records(recs)
        itemsize = recs.dtype.itemsize
        dtype = recs.dtype
        # allgather needs equal shapes: exchange lengths, pad to max
        lens = np.asarray(mhu.process_allgather(
            np.array([len(recs)], np.int64))).reshape(-1)
        mx = int(lens.max())
        if mx == 0:
            return recs[:0], rev[:0]

        def gather(arr):
            buf = np.zeros(mx * itemsize, np.uint8)
            raw = np.frombuffer(arr.tobytes(), np.uint8)
            buf[:len(raw)] = raw
            allb = np.asarray(mhu.process_allgather(buf))
            allb = allb.reshape(self._n_procs, mx * itemsize)
            return np.concatenate([
                allb[p, :int(lens[p]) * itemsize].view(dtype)
                for p in range(self._n_procs)])

        return gather(recs), gather(rev)

    def _phased_counts_from_parts(self, parts, meta) -> np.ndarray:
        """[K, 4] (REFREF, REFALT, ALTREF, ALTALT) int64 from the raw
        device contractions (mirrors ops.ld_kernels.phased_cells)."""
        if parts.shape[1] == 4:
            altalt, alt_val, val_alt, val_val = parts.T
            altref = alt_val - altalt
            refalt = val_alt - altalt
            refref = val_val - altalt - altref - refalt
        else:
            altalt = parts[:, 0]
            altref = meta.ac_a - altalt
            refalt = meta.ac_b - altalt
            refref = 2 * self.n_samples - (meta.ac_a + meta.ac_b) + altalt
        return np.stack([refref, refalt, altref, altalt], axis=1)

    def _unphased_table_from_parts(self, parts, bi, bj, k, l) -> np.ndarray:
        """[K, 3, 3] int64 genotype tables from the raw device
        contractions (mirrors ops.ld_kernels.unphased_cells)."""
        st = self.stacked
        if parts.shape[1] == 9:
            T11, T12, T21, T22, hv, vh, ov, vo, vv = parts.T
        else:
            T11, T12, T21, T22 = parts.T
            hv = st["n_het"][bi, k].astype(np.int64)
            vh = st["n_het"][bj, l].astype(np.int64)
            ov = st["n_hom"][bi, k].astype(np.int64)
            vo = st["n_hom"][bj, l].astype(np.int64)
            vv = np.full(len(T11), self.n_samples, np.int64)
        T10 = hv - T11 - T12
        T20 = ov - T21 - T22
        T01 = vh - T11 - T21
        T02 = vo - T12 - T22
        T00 = vv - (T01 + T02 + T10 + T11 + T12 + T20 + T21 + T22)
        # column fills into one [K, 9] buffer: np.stack's temporary
        # costs real fault time at millions of survivors per segment
        rows = np.empty((len(T11), 9), np.int64)
        for c, col in enumerate((T00, T01, T02, T10, T11, T12,
                                 T20, T21, T22)):
            rows[:, c] = col
        return rows.reshape(-1, 3, 3)

    # -- public API ------------------------------------------------------
    def run_phased_pairs(self, pairs, has_missing, filt, emit):
        return self.run_group(pairs, "phased", has_missing, "all", filt,
                              emit)

    def run_unphased_pairs(self, pairs, has_missing, filt, emit):
        return self.run_group(pairs, "unphased", has_missing, "all", filt,
                              emit)

    def run_mixed_pairs(self, pairs, filt, emit):
        """Reference mixed-mode Calculate() semantics on tiles that
        contain missing data: clean pairs take the phased math, pairs
        with missing alleles take the unphased math
        (reference: ld_engine.cpp:2737-2880)."""
        n = self.run_group(pairs, "phased", False, "clean", filt, emit)
        n += self.run_group(pairs, "unphased", True, "missing", filt, emit)
        return n


def group_tiles(pairs, mode: str, blk_missing):
    """Deterministic (table, has_missing, cls, tiles) sweep groups for
    one load -- the single source of truth for dispatch order, which
    checkpoint/resume relies on to count sweep segments identically
    across runs. 'mixed' follows the reference's default per-pair
    dispatch (reference: ld_engine.cpp:2737-2880 Calculate(): pairs
    with missing alleles use unphased math)."""
    nomiss = [p for p in pairs
              if not (blk_missing[p[0]] or blk_missing[p[1]])]
    withmiss = [p for p in pairs
                if blk_missing[p[0]] or blk_missing[p[1]]]
    if mode == "phased":
        return [("phased", False, "all", nomiss),
                ("phased", True, "all", withmiss)]
    if mode == "unphased":
        return [("unphased", False, "all", nomiss),
                ("unphased", True, "all", withmiss)]
    # blocks without any missing variant: pure phased fast path
    return [("phased", False, "all", nomiss),
            ("phased", False, "clean", withmiss),
            ("unphased", True, "missing", withmiss)]


def dispatch_pairs(engine: "LdEngine", pairs, mode: str, filt: LdFilters,
                   emit, stacked) -> int:
    """Route block pairs through the group_tiles dispatch plan."""
    blk_missing = stacked["has_missing"].any(axis=1)
    n = 0
    for table, has_missing, cls, tiles in group_tiles(pairs, mode,
                                                      blk_missing):
        n += engine.run_group(tiles, table, has_missing, cls, filt, emit)
    return n


def _plan_loads(super_ids, pairs, budget_supers: int, parts: int = 2):
    """Partition the run into device loads. If all supers fit the
    budget, one load covers everything; otherwise supers split into
    bands of budget/`parts` and every band pair becomes a load
    containing its slice of the tile list (classic blocked streaming).
    Returns (bands, loads): bands is a list of super-id lists; each
    load is ((p, q), tiles) over band indices. The engine keeps bands
    resident across consecutive loads, so with the row-major (p, q)
    order each row band uploads once per row and only the column band
    churns. `parts=3` reserves budget for a THIRD resident band so the
    staging worker can upload the next load's band while the current
    one computes (LdEngine.stage_band_async)."""
    if len(super_ids) <= budget_supers:
        return [list(super_ids)], [((0, 0), list(pairs))]
    band = max(1, budget_supers // parts)
    bands = [list(super_ids[k:k + band])
             for k in range(0, len(super_ids), band)]
    of_band = {}
    for bi, ids in enumerate(bands):
        for g in ids:
            of_band[g] = bi
    by_pair = {}
    for i, j, d in pairs:
        key = (of_band[i], of_band[j])
        by_pair.setdefault(key, []).append((i, j, d))
    return bands, [((p, q), by_pair[(p, q)]) for p, q in sorted(by_pair)]


def _route_backend(settings: CalcSettings, est_pairs: int,
                   n_samples: int, n_procs: int,
                   dcn: bool = False) -> bool:
    """True when this run should execute on the XLA CPU backend.

    The device path pays a fixed compile + dispatch price (seconds on a
    warm compilation cache, minutes cold, plus per-segment transfer
    latency over tunneled links), which small-N / few-pair workloads --
    the regime where the reference's RLE kernels shine
    (reference: lib/ld/ld_engine.cpp:1011-1160) -- never amortize. The
    CPU path computes roughly est_pairs * 2N one-hot MACs through
    XLA:CPU, so below a work crossover the CPU finishes before the
    accelerator warms up. Override with --backend device/cpu or the
    TWK_CPU_ROUTE_WORK env var (unit: pair-haplotype ops)."""
    import os
    b = getattr(settings, "backend", "auto")
    if dcn:
        # the dcn mesh's purpose is device planes sharded over
        # processes; routing to host CPU would defeat it
        if b == "cpu":
            raise ValueError("--backend cpu is incompatible with a dcn "
                             "mesh (its device planes span processes); "
                             "use the default distributed mode")
        return False
    if b == "cpu":
        return True
    if b != "auto":
        return False
    if settings.mesh not in ("auto", "off", ""):
        return False          # an explicit device mesh wins
    try:
        import jax
        plat = jax.local_devices()[0].platform
    except Exception:         # noqa: BLE001 - no backend at all
        return False
    if plat not in ("tpu", "axon"):
        return False          # already on a host backend
    work = est_pairs * 2 * n_samples
    limit = float(os.environ.get("TWK_CPU_ROUTE_WORK", 2e11))
    return work < limit


def _ckpt_config_key(settings: CalcSettings, seg_effective: int,
                     proc_id: int = 0, n_procs: int = 1) -> str:
    """Fingerprint of everything that determines the dispatch plan and
    the output stream; a resume under a different key would silently
    mix incompatible runs, so it is rejected. `seg_effective` is the
    resolved segment size (it depends on the visible device count, not
    just the settings: resuming on a different machine shape would
    misalign segment counting)."""
    import hashlib
    import json as _json
    import os as _os
    st = _os.stat(settings.input)
    fields = dict(
        # bump when the segment-size derivation changes (run_group
        # splits groups into ~PIPELINE_SEGMENTS pieces since round 4):
        # resumed runs must count segments identically
        plan=2,
        proc=f"{proc_id}/{n_procs}",
        input=_os.path.abspath(settings.input), size=st.st_size,
        mtime=st.st_mtime,
        output=_os.path.abspath(settings.output),
        seg_effective=seg_effective,
        force_phased=settings.force_phased,
        forced_unphased=settings.forced_unphased, window=settings.window,
        l_window=settings.l_window, min_p=settings.min_p,
        min_r2=settings.min_r2, max_r2=settings.max_r2,
        min_dprime=settings.min_dprime, max_dprime=settings.max_dprime,
        n_chunks=settings.n_chunks, c_chunk=settings.c_chunk,
        intervals=list(settings.intervals), b_size=settings.b_size,
        c_level=settings.c_level, sweep_segment=settings.sweep_segment,
        tile_rows=settings.tile_rows, mesh=settings.mesh,
        memory_gb=settings.memory_gb,
        # the load plan's band size depends on it, and segment counting
        # follows the plan
        stage_prefetch=settings.stage_prefetch)
    blob = _json.dumps(fields, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()


def _ckpt_read(path: str, config_key: str):
    import base64
    import json as _json
    with open(path) as fh:
        ck = _json.load(fh)
    if ck.get("version") != 1:
        raise ValueError(f"unsupported checkpoint version in {path}")
    if ck["config"] != config_key:
        raise ValueError(
            f"checkpoint {path} was written by a run with different "
            "settings or input; delete it to start over")
    ck["writer"]["index"] = base64.b64decode(ck["writer"]["index"])
    return ck


def _ckpt_write(path: str, config_key: str, units: int, n_pairs: int,
                n_records: int, load_cum, writer_state: dict,
                caps: dict = None):
    """Atomic sidecar write (tmp + fsync + rename): the checkpoint is
    only ever observed complete, and the writer state it carries was
    fsync'd by checkpoint_state() before this is called. `caps`
    carries the engine's adaptive buffer state (fused cap, outcap) so
    a resumed run replays the SAME fused-vs-repair extraction paths --
    with the in-sweep Fisher bracket, path choice decides which f32
    program computes P, and resuming with reset caps would leave
    f32-noise differences vs the uninterrupted run."""
    import base64
    import json as _json
    import os as _os
    state = dict(version=1, config=config_key, units=units,
                 n_pairs=n_pairs, n_records=n_records,
                 load_cum=list(load_cum),
                 caps=caps or {},
                 writer=dict(offset=writer_state["offset"],
                             n_records=writer_state["n_records"],
                             index=base64.b64encode(
                                 writer_state["index"]).decode()))
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump(state, fh)
        fh.flush()
        _os.fsync(fh.fileno())
    _os.replace(tmp, path)


def compute_ld(settings: CalcSettings) -> CalcResult:
    from ..parallel import distributed as dist
    timer = Timer()
    proc_id, n_procs = (0, 1)
    if settings.distributed:
        proc_id, n_procs = dist.init_distributed(
            settings.coordinator, settings.num_processes,
            settings.process_id)
    log("LOG", f"Opening {settings.input}...", sub="READER")
    reader = TwkReader(settings.input)
    n_samples = reader.header.n_samples
    log("LOG", f"Samples: {pretty_int(n_samples)}...")

    if settings.window and settings.n_chunks != 1:
        raise ValueError("cannot use chunking in window mode")

    # interval slicing
    block_subset = None
    if settings.intervals:
        from ..post.intervals import blocks_for_intervals
        block_subset = blocks_for_intervals(reader, settings.intervals)

    all_ids = (list(range(reader.index.n)) if block_subset is None
               else list(block_subset))
    # regroup consecutive .twk blocks into MXU-sized super-blocks
    tile_rows = settings.tile_rows or _auto_tile_rows(
        reader.index.ent, all_ids, settings)
    supers = _super_ranges(reader.index.ent, all_ids, tile_rows)
    n_blks = len(supers)
    balancer = Balancer.build(n_blks, settings.n_chunks, settings.c_chunk)
    log("LOG", f"Using ranges [{balancer.fromL}-{balancer.toL},"
        f"{balancer.fromR}-{balancer.toR}] of {n_blks} super-blocks "
        f"(<= {tile_rows} variants each) in "
        f"{'window' if settings.window else 'square'} mode...",
        sub="BALANCING")

    super_ids = balancer.block_ids()
    B = max((supers[s]["n"] for s in super_ids), default=0)
    if B == 0:
        raise ValueError("no valid data available")
    # lane-align the tile row count: padding rows carry valid=0 (and
    # all-missing planes) so results are unchanged, every tile satisfies
    # Mosaic's 128-lane block rules (odd-sized runs used to force the
    # XLA path, round-2 weakness 5), and XLA itself tiles better
    B = _round_up(B, 128)

    if settings.window:
        minpos = {s: supers[s]["minpos"] for s in super_ids}
        maxpos = {s: supers[s]["maxpos"] for s in super_ids}
        rid = {s: supers[s]["rid"] for s in super_ids}
        pairs = balancer.window_pairs(minpos, maxpos, rid, settings.l_window)
    else:
        pairs = balancer.tile_pairs()

    # dcn mode: the samples (packed-word) axis spans processes and every
    # process works every tile jointly -- no tile partitioning, one
    # output file (written by process 0). Default distributed mode
    # partitions the tile grid instead, with per-process shards.
    dcn = n_procs > 1 and settings.mesh.split(":")[0] == "dcn"
    # checkpoint validation, before any mesh/device work. dcn meshes
    # checkpoint from PROCESS 0's sidecar alone (it owns the single
    # output); at resume its progress broadcasts to every process, so
    # all of them skip the SAME segments and the collective program
    # stays aligned -- the skip path dispatches nothing, and whole-load
    # skips drop the (collective) band uploads identically everywhere
    # (round-4 weakness 5: band/segment boundaries ARE
    # collective-aligned).
    if settings.checkpoint and settings.output == "-":
        raise ValueError("checkpointing needs a file output")
    if n_procs > 1 and not dcn:
        pairs, touched = dist.partition_tiles(pairs, proc_id, n_procs)
        # only this process's supers need loading
        super_ids = [s for s in super_ids if s in touched]
        log("LOG", f"Process {proc_id}: {len(pairs)} tiles over "
            f"{len(super_ids)} super-blocks", sub="DIST")

    # upper-bound pair estimate (ETA + backend routing; diagonal tiles
    # carry ~half a tile's pairs)
    est = sum(B * (B - 1) // 2 if d else B * B for _, _, d in pairs)
    cpu_route = _route_backend(settings, est, n_samples, n_procs, dcn)
    if cpu_route:
        import jax as _jax_rt
        log("LOG", f"Workload below the device crossover "
            f"(~{pretty_int(est)} pairs x "
            f"{pretty_int(2 * n_samples)} haplotypes): running on the "
            f"XLA CPU backend (--backend device overrides)",
            sub="ENGINE")
        mesh = None
    else:
        mesh = dist.resolve_mesh(settings.mesh, local_only=n_procs > 1)
    if mesh is not None:
        log("LOG", f"Device mesh: {dict(mesh.shape)}", sub="MESH")

    # band the super list when the bitpacked planes exceed the device
    # memory budget (low-memory streaming; reference calc -M analogue)
    Wh = (2 * n_samples + 127) // 128 * 4
    Ws = (n_samples + 127) // 128 * 4
    per_super = B * (2 * Wh + 3 * Ws) * 4
    # a samples-sharded mesh (local PxS or dcn) holds only 1/S of every
    # word plane per device, so the per-device budget stretches S-fold
    n_samp_shards = (mesh.shape["samples"]
                     if mesh is not None and "samples" in mesh.shape
                     else 1)
    per_super = -(-per_super // max(n_samp_shards, 1))
    # the device holds resident band planes PLUS the per-load
    # concatenation, so the banding budget is half the configured one
    budget = max(2, int(settings.memory_gb * (1 << 30) / 2
                        / max(per_super, 1)))
    # staging prefetch needs a third resident band slot (the in-flight
    # upload) -- bands shrink to budget/3 so peak residency stays
    # inside the budget
    prefetch_on = settings.stage_prefetch and not dcn \
        and len(super_ids) > budget
    bands, loads = _plan_loads(super_ids, pairs, budget,
                               parts=3 if prefetch_on else 2)
    if len(loads) > 1:
        log("LOG", f"Streaming {len(super_ids)} super-blocks in "
            f"{len(loads)} band-pair loads over {len(bands)} bands "
            f"(~{per_super * budget / 2**30:.1f} GB plane budget)...",
            sub="MEMORY")
    filt = LdFilters(min_p=settings.min_p, min_r2=settings.min_r2,
                     max_r2=settings.max_r2, min_dprime=settings.min_dprime,
                     max_dprime=settings.max_dprime)

    from ..utils.progress import ProgressTicker
    ticker = ProgressTicker(total_pairs=est, n_samples=n_samples).start()

    # output (one shard per process in distributed mode; merge with
    # `twk concat` + `twk sort`, mirroring the reference's chunk merge,
    # docs/job-balancing.md)
    out = settings.output
    if n_procs > 1 and not dcn:
        out = dist.shard_output_path(out, proc_id, n_procs)
    elif dcn and out == "-":
        raise ValueError("distributed calc needs a file output")
    if out not in ("-",) and not out.endswith(".two"):
        out = out + ".two"
    hdr = reader.header
    hdr.literals += (f"\n##tomahawk_tpu_calcVersion={__version__}\n"
                     f"##tomahawk_tpu_calcCommand=calc; "
                     f"Date={datetime.datetime.now().isoformat()}\n")

    # in-run checkpoint/resume; distributed tile-partition runs keep a
    # sidecar PER PROCESS (each shard's segment stream is independent)
    import os as _os_ck
    ck = None
    ck_key = ""
    ck_path = settings.checkpoint
    if settings.checkpoint:
        if n_procs > 1 and not dcn:
            ck_path = f"{settings.checkpoint}.p{proc_id}of{n_procs}"
        seg_eff = max(settings.sweep_segment,
                      16 * (1 if mesh is None else mesh.shape["pairs"]))
        ck_key = _ckpt_config_key(settings, seg_eff,
                                  0 if dcn else proc_id, n_procs)
        if dcn and n_procs > 1:
            # only process 0 owns a sidecar (it owns the single
            # output); broadcast its progress so every process skips
            # the SAME segments and the collective program stays
            # aligned
            import jax.experimental.multihost_utils as mhu
            if proc_id == 0 and _os_ck.path.exists(ck_path):
                ck = _ckpt_read(ck_path, ck_key)
            st0 = np.array(
                [1 if ck is not None else 0,
                 ck["units"] if ck else 0,
                 ck["n_pairs"] if ck else 0,
                 ck["n_records"] if ck else 0,
                 (ck.get("caps") or {}).get("fused_cap", 0) if ck else 0,
                 (ck.get("caps") or {}).get("outcap", 0) if ck else 0,
                 len(ck["load_cum"]) if ck else 0]
                + (list(ck["load_cum"]) if ck else []), np.int64)
            # fixed-width exchange: pad to a generous load count
            pad = np.zeros(4096, np.int64)
            pad[:len(st0)] = st0
            allst = np.asarray(mhu.process_allgather(pad))
            st = allst.reshape(n_procs, -1)[0]
            if proc_id != 0 and st[0]:
                nl = int(st[6])
                ck = dict(units=int(st[1]), n_pairs=int(st[2]),
                          n_records=int(st[3]),
                          caps=dict(fused_cap=int(st[4]),
                                    outcap=int(st[5])),
                          load_cum=[int(x) for x in st[7:7 + nl]],
                          writer=None)
            if proc_id == 0 and ck is not None:
                log("LOG", f"Resuming dcn run from {ck_path}: "
                    f"{ck['units']} segments, "
                    f"{pretty_int(ck['n_records'])} records already "
                    f"on disk", sub="CKPT")
        elif _os_ck.path.exists(ck_path):
            ck = _ckpt_read(ck_path, ck_key)
            log("LOG", f"Resuming from {ck_path}: "
                f"{ck['units']} segments, "
                f"{pretty_int(ck['n_records'])} records already on "
                f"disk", sub="CKPT")
        if n_procs > 1:
            # resume barrier: no process proceeds until every process
            # has read and key-validated its sidecar, so a
            # partially-restarted job fails loudly at the rendezvous
            # instead of mixing run generations
            import jax.experimental.multihost_utils as mhu
            mhu.sync_global_devices("twk_calc_resume_barrier")

    # dcn: every process derives identical records (counts are
    # samples-replicated); only process 0 writes the single output
    writer = None
    if not (dcn and proc_id != 0):
        # async block compression: the engine's consumer thread is the
        # only writer, and its zstd CPU then overlaps the next
        # segment's survivor transfer (IO-bound)
        if ck is not None:
            writer = TwoWriter.resume(out, hdr, ck["writer"],
                                      c_level=settings.c_level,
                                      block_limit=settings.b_size,
                                      async_blocks=True)
        else:
            writer = TwoWriter(out, hdr, c_level=settings.c_level,
                               block_limit=settings.b_size,
                               async_blocks=True)

    result = CalcResult()
    if ck is not None:
        result.n_pairs = ck["n_pairs"]
        result.n_records = ck["n_records"]

    def emit(recs: np.ndarray, rev: np.ndarray = None):
        if len(recs) == 0:
            return
        if writer is not None:
            writer.add(recs)
            writer.add(rev if rev is not None else _reverse_records(recs))
        result.n_records += 2 * len(recs)

    mode = ("phased" if settings.force_phased else
            "unphased" if settings.forced_unphased else "mixed")

    import os as _os
    from concurrent.futures import ThreadPoolExecutor
    n_threads = settings.threads if settings.threads > 0 \
        else (_os.cpu_count() or 1)
    pool = ThreadPoolExecutor(n_threads) if n_threads > 1 else None

    def inflate_band(ids):
        blocks = []
        for s in ids:
            sup = supers[s]
            blk = reader.read_block(sup["ids"][0])
            for b in sup["ids"][1:]:
                for rec in reader.read_block(b).rcds:
                    blk.add(rec)
            blocks.append(blk)
        # parallel plane inflation (the reference's threaded unpacker,
        # ld_unpacker.h): the native RLE->plane decode releases the GIL
        inflate = lambda blk: block_to_planes(blk, n_samples, pad_to=B)
        planes = list(pool.map(inflate, blocks)) if pool \
            else [inflate(blk) for blk in blocks]
        return stack_planes(planes)

    # small-workload native path: the whole tile plan through the
    # popcount tile engine (compute/cpu_engine.py) -- byte-identical
    # output with none of the XLA:CPU compile/materialization overhead
    # (the regime where the reference's per-pair kernels shine).
    # Checkpointed runs keep the sweep-segment engine (its resume unit).
    native_stats = None
    if cpu_route and not settings.checkpoint and pairs:
        from .cpu_engine import run_native_cpu
        slot = {g: s for s, g in enumerate(super_ids)}
        stacked_all = inflate_band(super_ids)
        tiles_cpu = [(slot[i], slot[j], d) for i, j, d in pairs]
        blk_missing = stacked_all["has_missing"].any(axis=1)
        groups = group_tiles(tiles_cpu, mode, blk_missing)
        native_stats = {}
        n = run_native_cpu(stacked_all, groups, filt, emit, ticker,
                           n_samples, settings, native_stats)
        if n is not None:
            result.n_pairs += n
            pairs = []       # nothing left for the device engine
        else:
            native_stats = None

    # ONE engine for the whole run: jitted sweeps compile once, device
    # planes upload once per band residency (not once per band PAIR)
    # (a distributed process can draw an EMPTY tile partition when
    # there are fewer tiles than processes: it still writes a valid
    # empty shard and joins the barrier, but must not touch the device)
    _cpu_ctx = None
    if cpu_route:
        _cpu_ctx = _jax_rt.default_device(_jax_rt.devices("cpu")[0])
        _cpu_ctx.__enter__()
    engine = None
    load_cum = []            # units_done after each completed load
    try:
        if pairs:
            engine = LdEngine(None, n_samples, settings, mesh=mesh, B=B)
            engine.ticker = ticker
            if ck is not None:
                engine.ckpt_skip = ck["units"]
                engine.cand_total = ck["n_pairs"]
                load_cum = list(ck["load_cum"])
                caps = ck.get("caps") or {}
                if caps.get("fused_cap"):
                    engine._fused_cap = int(caps["fused_cap"])
                if caps.get("outcap"):
                    engine._outcap = int(caps["outcap"])
            if settings.checkpoint and writer is not None:
                # dcn processes != 0 own no writer and no sidecar:
                # their resume state replays from process 0's broadcast
                import time as _time_ck
                last_ck = [_time_ck.monotonic()]

                def _maybe_checkpoint():
                    now = _time_ck.monotonic()
                    if now - last_ck[0] < settings.checkpoint_interval:
                        return
                    last_ck[0] = now
                    _ckpt_write(ck_path, ck_key,
                                engine.units_done, engine.cand_total,
                                result.n_records, load_cum,
                                writer.checkpoint_state(),
                                caps=dict(fused_cap=engine._fused_cap,
                                          outcap=engine._outcap))
                engine.on_segment = _maybe_checkpoint
        if engine is not None and prefetch_on:
            engine.MAX_RESIDENT_BANDS = 3
        for li, ((p, q), load_tiles) in enumerate(loads if pairs else []):
            if li < len(load_cum) and load_cum[li] <= engine.ckpt_skip:
                # this whole load completed before the checkpoint: skip
                # even the host-side unpack (planned count must follow,
                # or later loads would re-skip against the wrong base)
                engine.units_done = max(engine.units_done, load_cum[li])
                engine._units_planned = max(engine._units_planned,
                                            load_cum[li])
                continue
            engine.stage_wait()
            load = [(p, None if p in engine._band_host
                     else inflate_band(bands[p]))]
            if q != p:
                load.append((q, None if q in engine._band_host
                             else inflate_band(bands[q])))
            engine.set_load(load)
            if prefetch_on and li + 1 < len(loads):
                # inflate + upload the next load's band on the staging
                # worker while this load's sweeps run
                for b in set(loads[li + 1][0]):
                    if b not in engine._band_host:
                        engine.stage_band_async(
                            b, lambda b=b: inflate_band(bands[b]))
            load_ids = bands[p] if p == q else bands[p] + bands[q]
            slot = {g: s for s, g in enumerate(load_ids)}
            tiles = [(slot[i], slot[j], d) for i, j, d in load_tiles]
            result.n_pairs += dispatch_pairs(engine, tiles, mode, filt,
                                             emit, engine.stacked)
            if li < len(load_cum):
                load_cum[li] = engine.units_done
            else:
                load_cum.append(engine.units_done)
    finally:
        if engine is not None:
            engine.stage_close()
        if _cpu_ctx is not None:
            _cpu_ctx.__exit__(None, None, None)
    all_stats = engine.stats if engine is not None \
        else (native_stats or {})
    if engine is not None:
        result.stage_stats = dict(engine.stage_stats,
                                  n_loads=len(loads),
                                  n_uploads=engine.n_band_uploads)
    if engine is not None and len(loads) > 1:
        ss = engine.stage_stats
        log("LOG", f"Band uploads: {engine.n_band_uploads} device plane "
            f"transfers over {len(loads)} loads "
            f"({ss['bytes'] / 2**20:.0f} MB; "
            f"{ss['hidden_s']:.1f}s overlapped with compute, "
            f"{ss['exposed_s'] + ss['wait_s']:.1f}s exposed)",
            sub="MEMORY")

    if pool is not None:
        pool.shutdown()
    if writer is not None:
        writer.close()
    if settings.checkpoint and _os_ck.path.exists(ck_path):
        # the output is complete and footered; the sidecar is obsolete.
        # Remove it BEFORE the in-place shard sort below: a crash
        # mid-sort must restart from scratch, not resume a stale
        # writer offset against the rewritten (sorted) block layout
        _os_ck.remove(ck_path)
    if writer is not None and settings.sort_shards and out != "-":
        from ..post.sort import sort_two as _shard_sort
        tmp_sorted = (out[:-4] if out.endswith(".two") else out) \
            + ".sorting.two"
        _shard_sort(out, tmp_sorted, threads=settings.threads)
        _os_ck.replace(tmp_sorted, out)
        log("LOG", f"Shard {out} sorted in place (presorted merge "
            f"ready)", sub="SORT")
    if n_procs > 1:
        # every shard exists before any process returns, so a driving
        # script can merge immediately after rank 0 finishes
        dist.sync_shards()
        if not dcn:
            log("LOG", f"Shard {out} complete; merge shards with "
                f"`twk concat` + `twk sort` (parallel.merge_shards)",
                sub="DIST")
    ticker.finalize()
    result.elapsed = timer.elapsed()
    log("LOG", f"Computed {pretty_int(result.n_pairs)} pairs -> "
        f"{pretty_int(result.n_records)} records in "
        f"{timer.elapsed_string()} "
        f"({pretty_int(int(result.pairs_per_sec))} pairs/s)",
        sub="PROGRESS")
    if settings.performance:
        report_performance(engine if engine is not None else all_stats)
    reader.close()
    return result


def report_performance(stats):
    """Per-kernel-config dispatch and timing report, the analogue of the
    reference's ComputePerformance / n_method counters
    (reference: lib/ld/ld.cpp:878-1057, ld_engine.h:171-174,313).
    Accepts an LdEngine or a stats dict; with an engine, also prints
    the per-allele-count histogram (the reference prints per-AC mean
    cycles at ld.cpp:1047-1052; here: prefilter survivors and kept
    records per log2 bucket of min(ac_a, ac_b), the same AC-resolved
    view its kernel-crossover fits came from)."""
    ac_hist = None
    if isinstance(stats, LdEngine):
        ac_hist = stats.ac_hist or None
        stats = stats.stats
    log("LOG", f"{'config':<24}{'tiles':>8}{'cand pairs':>14}"
        f"{'prefilter pass':>15}{'count s':>9}{'extract s':>10}"
        f"{'math s':>8}{'records':>9}{'repair':>7}{'supp':>5}",
        sub="PERF")
    for key, s in sorted(stats.items()):
        log("LOG", f"{key:<24}{s['n_tiles']:>8}{s['n_cand']:>14,}"
            f"{s['n_pass']:>15,}{s['count_s']:>9.3f}"
            f"{s['extract_s']:>10.3f}{s['math_s']:>8.3f}"
            f"{s['n_records']:>9,}{s.get('n_repair', 0):>7}"
            f"{s.get('n_supp', 0):>5}", sub="PERF")
        cs = s["count_s"]
        if cs > 0 and s["n_cand"]:
            log("LOG", f"{'':<24}count-sweep rate "
                f"{pretty_int(int(s['n_cand'] / cs))} pairs/s", sub="PERF")
    if ac_hist:
        log("LOG", f"{'min(ac) bucket':<18}{'survivors':>12}"
            f"{'records':>10}{'kept %':>8}", sub="PERF")
        for b in sorted(ac_hist):
            s, k = ac_hist[b]
            log("LOG", f"[{1 << b:>6}, {2 << b:>6}) "
                f"{s:>15,}{k:>10,}{100.0 * k / max(s, 1):>7.1f}%",
                sub="PERF")
