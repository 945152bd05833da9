"""All-vs-all / windowed LD compute orchestrator.

TPU-native replacement for the reference's slave/ticker engine
(reference: lib/ld/ld.cpp:477-671, ld_engine.cpp:1815-2880): variant
blocks become bitpacked device tensors resident in HBM; the block-pair
tile grid is swept in TWO fused device dispatches that amortize the
host<->device round trip over the whole run:

  pass 1 (count sweep)   one jitted lax.scan over every tile computes
                         contingency counts on the MXU, applies the f32
                         prefilter, and returns only per-tile survivor /
                         candidate counts (8 bytes per tile).
  pass 2 (extract sweep) only tiles with survivors are re-swept; each
                         writes its compacted survivor rows at an exact
                         host-computed offset into one output buffer
                         (gather-only compaction: cumsum + searchsorted,
                         no TPU scatter).

Exact f64 statistics + Fisher tests are then recomputed on the host for
survivors only, and records stream to a .two writer. This keeps total
host<->device traffic proportional to the OUTPUT size, which matters
both for tunneled devices and for multi-host runs.
"""

import datetime
from dataclasses import dataclass, field
from typing import List

import numpy as np

from .. import __version__
from ..io.twk import TwkReader
from ..io.two import TwoWriter
from ..ops.bitpack import block_to_planes, stack_planes
from ..ops.ld_math import LdFilters, PairMeta, phased_math, unphased_math
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
    single: bool = False
    # tiles per device dispatch: one compiled shape serves runs of any
    # size, and the progress ticker advances between segments
    sweep_segment: int = 4096
    performance: bool = False


@dataclass
class CalcResult:
    n_pairs: int = 0
    n_records: int = 0
    elapsed: float = 0.0

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
    rev["ridA"], rev["ridB"] = recs["ridB"].copy(), recs["ridA"].copy()
    rev["packA"], rev["packB"] = recs["packB"].copy(), recs["packA"].copy()
    return rev


def _bucket(n: int, lo: int) -> int:
    """Round n up to a power of two (>= lo) to bound recompiles."""
    b = lo
    while b < n:
        b *= 2
    return b


class LdEngine:
    """Holds device-resident block tensors and the jitted two-pass
    sweeps for one run configuration. Pass a ('pairs'[, 'samples'])
    jax.sharding.Mesh to shard the tile grid (and optionally the packed
    word axis) across devices."""

    def __init__(self, stacked: dict, n_samples: int,
                 settings: CalcSettings, mesh=None):
        from ..utils.jaxcache import enable_compilation_cache
        enable_compilation_cache()
        import jax.numpy as jnp
        from . import sweeps

        self.sweeps = sweeps
        self.settings = settings
        self.n_samples = n_samples
        self.stacked = stacked           # host copies for metadata
        self.B = stacked["alt_bits"].shape[1]
        self.NB = stacked["alt_bits"].shape[0]
        self.window = settings.l_window if settings.window else 0
        self.mesh = mesh
        self.n_pair_shards = 1 if mesh is None else mesh.shape["pairs"]

        host = {k: stacked[k] for k in sweeps.DEV_KEYS}
        if mesh is not None and "samples" in mesh.shape \
                and mesh.shape["samples"] > 1:
            # pad the packed word axes so they split evenly
            ns = mesh.shape["samples"]
            for k in sweeps.WORD_KEYS:
                v = host[k]
                W = v.shape[-1]
                Wp = ((W + ns - 1) // ns) * ns
                if Wp != W:
                    pad = np.zeros((*v.shape[:-1], Wp - W), v.dtype)
                    if k == "miss_bits":   # padding is "missing"
                        pad = ~pad
                    host[k] = np.concatenate([v, pad], axis=-1)
        self._dev = {k: jnp.asarray(v) for k, v in host.items()}
        self._count_fns = {}
        self._extract_fns = {}
        self.ticker = None           # optional ProgressTicker
        # per-config dispatch statistics, the analogue of the
        # reference's n_method[] kernel counters (ld_engine.h:313)
        self.stats = {}

    def _stat(self, table, has_missing, cls):
        key = f"{table}/{'miss' if has_missing else 'nomiss'}/{cls}"
        return self.stats.setdefault(key, dict(
            n_tiles=0, n_cand=0, n_pass=0, n_records=0,
            count_s=0.0, extract_s=0.0, math_s=0.0))

    def _cfg(self, table, has_missing, cls):
        return self.sweeps.make_cfg(
            table, has_missing, cls, self.B, self.n_samples, self.window,
            self.settings.min_r2, self.settings.max_r2)

    def _count_fn(self, table, has_missing, cls):
        key = (table, has_missing, cls)
        if key not in self._count_fns:
            cfg = self._cfg(table, has_missing, cls)
            if self.mesh is None:
                fn = self.sweeps.jit_count_sweep(cfg)
            else:
                fn = self.sweeps.shard_count_sweep(self.mesh, cfg)
            self._count_fns[key] = fn
        return self._count_fns[key]

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

    # -- orchestration ---------------------------------------------------
    def run_group(self, tiles, table, has_missing, cls, filt, emit) -> int:
        """Two-pass sweep of one (table, missing, class) tile group,
        processed in fixed-size segments (one compiled shape for runs of
        any size; progress advances between segments). Returns the
        number of candidate pairs evaluated."""
        seg = max(self.settings.sweep_segment, 16 * self.n_pair_shards)
        n = 0
        for s in range(0, len(tiles), seg):
            n += self._run_segment(tiles[s:s + seg], table, has_missing,
                                   cls, filt, emit)
        return n

    def _run_segment(self, tiles, table, has_missing, cls, filt,
                     emit) -> int:
        if not tiles:
            return 0
        import time as _time
        stat = self._stat(table, has_missing, cls)
        stat["n_tiles"] += len(tiles)
        np_ = np
        S = self.n_pair_shards
        Tpad = _bucket(len(tiles), 16 * S)
        pad = Tpad - len(tiles)
        pi = np_.array([t[0] for t in tiles] + [0] * pad, np_.int32)
        pj = np_.array([t[1] for t in tiles] + [0] * pad, np_.int32)
        dg = np_.array([t[2] for t in tiles] + [True] * pad, bool)
        live = np_.array([True] * len(tiles) + [False] * pad, bool)

        t0 = _time.perf_counter()
        n_pass, n_cand = (np_.asarray(x) for x in self._count_fn(
            table, has_missing, cls)(self._dev, pi, pj, dg, live))
        stat["count_s"] += _time.perf_counter() - t0
        n_pass, n_cand = n_pass[:len(tiles)], n_cand[:len(tiles)]
        total_cand = int(n_cand.sum())
        stat["n_cand"] += total_cand

        hit = np_.flatnonzero(n_pass)
        if len(hit) == 0:
            if self.ticker:
                self.ticker.add(pairs=total_cand)
            return total_cand
        stat["n_pass"] += int(n_pass.sum())
        ns = n_pass[hit]
        cap = min(_bucket(int(ns.max()), 1024), self.B * self.B)

        # split hit tiles into S contiguous shard groups with per-shard
        # offsets; every shard fills its own [outcap] buffer region
        groups = np_.array_split(np_.arange(len(hit)), S)
        totals = [int(ns[g].sum()) for g in groups]
        outcap = _bucket(max(totals) + cap, 16384)
        Hpad = _bucket(max(len(g) for g in groups), 8)

        hpi = np_.zeros(Hpad * S, np_.int32)
        hpj = np_.zeros(Hpad * S, np_.int32)
        hdg = np_.ones(Hpad * S, bool)
        # padding tiles park their writes in the junk tail of the buffer
        hoff = np_.full(Hpad * S, outcap - cap, np_.int32)
        for s, g in enumerate(groups):
            lo = s * Hpad
            hpi[lo:lo + len(g)] = pi[hit[g]]
            hpj[lo:lo + len(g)] = pj[hit[g]]
            hdg[lo:lo + len(g)] = dg[hit[g]]
            offs = np_.zeros(len(g), np_.int32)
            if len(g):
                offs[1:] = np_.cumsum(ns[g])[:-1]
            hoff[lo:lo + len(g)] = offs

        t0 = _time.perf_counter()
        buf = self._extract_fn(table, has_missing, cls, cap, outcap)(
            self._dev, hpi, hpj, hdg, hoff)
        shard_rows = [np_.asarray(buf[s * outcap:s * outcap + totals[s]])
                      for s in range(S) if totals[s]]
        stat["extract_s"] += _time.perf_counter() - t0
        rows = np_.concatenate(shard_rows) if shard_rows else \
            np_.zeros((0, 5 if table == "phased" else 10), np_.int32)

        # host math per hit tile, batched into one call per group
        B = self.B
        idx = rows[:, 0].astype(np_.int64)
        k, l = idx // B, idx % B
        tile_of = np_.repeat(np_.arange(len(hit)), ns)
        bi = pi[hit][tile_of].astype(np_.int64)
        bj = pj[hit][tile_of].astype(np_.int64)
        meta = _pair_meta_from(self.stacked, bi, bj, k, l)
        t0 = _time.perf_counter()
        if table == "phased":
            recs, _ = phased_math(rows[:, 1:].astype(np_.int64), meta, filt)
        else:
            recs = unphased_math(
                rows[:, 1:].astype(np_.int64).reshape(-1, 3, 3), meta, filt)
        stat["math_s"] += _time.perf_counter() - t0
        stat["n_records"] += len(recs)
        emit(recs)
        if self.ticker:
            self.ticker.add(pairs=total_cand, records=len(recs))
        return total_cand

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


def dispatch_pairs(engine: "LdEngine", pairs, mode: str, filt: LdFilters,
                   emit, stacked) -> int:
    """Route block pairs to the phased fast path or the general path by
    run mode and per-block missingness. 'mixed' follows the reference's
    default per-pair dispatch (reference: ld_engine.cpp:2737-2880
    Calculate(): pairs with missing alleles use unphased math)."""
    blk_missing = stacked["has_missing"].any(axis=1)
    nomiss = [p for p in pairs
              if not (blk_missing[p[0]] or blk_missing[p[1]])]
    withmiss = [p for p in pairs
                if blk_missing[p[0]] or blk_missing[p[1]]]
    n = 0
    if mode == "phased":
        n += engine.run_phased_pairs(nomiss, False, filt, emit)
        n += engine.run_phased_pairs(withmiss, True, filt, emit)
    elif mode == "unphased":
        n += engine.run_unphased_pairs(nomiss, False, filt, emit)
        n += engine.run_unphased_pairs(withmiss, True, filt, emit)
    else:
        # blocks without any missing variant: pure phased fast path
        n += engine.run_phased_pairs(nomiss, False, filt, emit)
        n += engine.run_mixed_pairs(withmiss, filt, emit)
    return n


def compute_ld(settings: CalcSettings) -> CalcResult:
    timer = Timer()
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

    n_blks = reader.index.n if block_subset is None else len(block_subset)
    balancer = Balancer.build(n_blks, settings.n_chunks, settings.c_chunk)
    log("LOG", f"Using ranges [{balancer.fromL}-{balancer.toL},"
        f"{balancer.fromR}-{balancer.toR}] in "
        f"{'window' if settings.window else 'square'} mode...",
        sub="BALANCING")

    def real_id(local: int) -> int:
        return local if block_subset is None else block_subset[local]

    block_ids = [real_id(b) for b in balancer.block_ids()]
    blocks = [reader.read_block(b) for b in block_ids]
    B = max((blk.n for blk in blocks), default=0)
    if B == 0:
        raise ValueError("no valid data available")
    planes = [block_to_planes(blk, n_samples, pad_to=B) for blk in blocks]
    stacked = stack_planes(planes)

    # map global block index -> local tensor slot
    slot = {g: s for s, g in enumerate(block_ids)}

    if settings.window:
        ents = [reader.index.ent[real_id(b)] for b in balancer.block_ids()]
        minpos = {balancer.block_ids()[i]: e.minpos
                  for i, e in enumerate(ents)}
        maxpos = {balancer.block_ids()[i]: e.maxpos
                  for i, e in enumerate(ents)}
        rid = {balancer.block_ids()[i]: e.rid for i, e in enumerate(ents)}
        pairs = balancer.window_pairs(minpos, maxpos, rid, settings.l_window)
    else:
        pairs = balancer.tile_pairs()
    pairs = [(slot[real_id(i)], slot[real_id(j)], d) for i, j, d in pairs]

    engine = LdEngine(stacked, n_samples, settings)
    filt = LdFilters(min_p=settings.min_p, min_r2=settings.min_r2,
                     max_r2=settings.max_r2, min_dprime=settings.min_dprime,
                     max_dprime=settings.max_dprime)

    # upper-bound pair estimate for the ETA (diag tiles ~ half a tile)
    est = sum(B * (B - 1) // 2 if d else B * B for _, _, d in pairs)
    from ..utils.progress import ProgressTicker
    engine.ticker = ProgressTicker(total_pairs=est,
                                   n_samples=n_samples).start()

    # output
    out = settings.output
    if out not in ("-",) and not out.endswith(".two"):
        out = out + ".two"
    hdr = reader.header
    hdr.literals += (f"\n##tomahawk_tpu_calcVersion={__version__}\n"
                     f"##tomahawk_tpu_calcCommand=calc; "
                     f"Date={datetime.datetime.now().isoformat()}\n")
    writer = TwoWriter(out, hdr, c_level=settings.c_level,
                       block_limit=settings.b_size)

    result = CalcResult()

    def emit(recs: np.ndarray):
        if len(recs) == 0:
            return
        writer.add(recs)
        writer.add(_reverse_records(recs))
        result.n_records += 2 * len(recs)

    mode = ("phased" if settings.force_phased else
            "unphased" if settings.forced_unphased else "mixed")
    result.n_pairs += dispatch_pairs(engine, pairs, mode, filt, emit,
                                     stacked)

    writer.close()
    engine.ticker.finalize()
    result.elapsed = timer.elapsed()
    log("LOG", f"Computed {pretty_int(result.n_pairs)} pairs -> "
        f"{pretty_int(result.n_records)} records in "
        f"{timer.elapsed_string()} "
        f"({pretty_int(int(result.pairs_per_sec))} pairs/s)",
        sub="PROGRESS")
    if settings.performance:
        report_performance(engine)
    reader.close()
    return result


def report_performance(engine: LdEngine):
    """Per-kernel-config dispatch and timing report, the analogue of the
    reference's ComputePerformance / n_method counters
    (reference: lib/ld/ld.cpp:878-1057, ld_engine.h:171-174,313)."""
    log("LOG", f"{'config':<24}{'tiles':>8}{'cand pairs':>14}"
        f"{'prefilter pass':>15}{'count s':>9}{'extract s':>10}"
        f"{'math s':>8}{'records':>9}", sub="PERF")
    for key, s in sorted(engine.stats.items()):
        log("LOG", f"{key:<24}{s['n_tiles']:>8}{s['n_cand']:>14,}"
            f"{s['n_pass']:>15,}{s['count_s']:>9.3f}"
            f"{s['extract_s']:>10.3f}{s['math_s']:>8.3f}"
            f"{s['n_records']:>9,}", sub="PERF")
        cs = s["count_s"]
        if cs > 0 and s["n_cand"]:
            log("LOG", f"{'':<24}count-sweep rate "
                f"{pretty_int(int(s['n_cand'] / cs))} pairs/s", sub="PERF")
