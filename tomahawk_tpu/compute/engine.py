"""All-vs-all / windowed LD compute orchestrator.

TPU-native replacement for the reference's slave/ticker engine
(reference: lib/ld/ld.cpp:477-671, ld_engine.cpp:1815-2880): variant
blocks become bitpacked device tensors resident in HBM; the block-pair
tile grid is walked with jitted, scan-batched contingency kernels (MXU
matmuls); an on-device f32 prefilter compacts surviving pairs; exact
f64 statistics + Fisher tests are recomputed on the host for survivors
only, and records stream to a .two writer.
"""

import datetime
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .. import __version__
from ..io.twk import TwkReader
from ..io.two import TWO_DTYPE, TwoWriter
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
    batch_pairs: int = 16         # tile pairs per device dispatch
    cap_fraction: float = 0.25    # survivor capacity per tile
    single: bool = False


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
        pos_a=stacked["pos"][bi][k].astype(np.int64),
        pos_b=stacked["pos"][bj][l].astype(np.int64),
        rid_a=stacked["rid"][bi][k].astype(np.int64),
        rid_b=stacked["rid"][bj][l].astype(np.int64),
        ac_a=stacked["ac"][bi][k].astype(np.int64),
        ac_b=stacked["ac"][bj][l].astype(np.int64),
        an_a=stacked["an"][bi][k].astype(np.int64),
        an_b=stacked["an"][bj][l].astype(np.int64),
        hwe_a=stacked["hwe"][bi][k].astype(np.float64),
        hwe_b=stacked["hwe"][bj][l].astype(np.float64),
    )


def _reverse_records(recs: np.ndarray) -> np.ndarray:
    """The (B, A) mirror of each record: swap rid and position tuples;
    statistics and counts stay in the original orientation
    (reference: ld_engine.cpp:1290-1298)."""
    rev = recs.copy()
    rev["ridA"], rev["ridB"] = recs["ridB"].copy(), recs["ridA"].copy()
    rev["packA"], rev["packB"] = recs["packB"].copy(), recs["packA"].copy()
    return rev


class LdEngine:
    """Holds device-resident block tensors and jitted kernels for one
    run configuration."""

    def __init__(self, stacked: dict, n_samples: int, settings: CalcSettings):
        from ..utils.jaxcache import enable_compilation_cache
        enable_compilation_cache()
        import jax
        import jax.numpy as jnp
        from ..ops import ld_kernels as K

        self.settings = settings
        self.n_samples = n_samples
        self.stacked = stacked           # host copies for metadata
        self.B = stacked["alt_bits"].shape[1]
        self.NB = stacked["alt_bits"].shape[0]
        cap = int(self.B * self.B * settings.cap_fraction)
        self.cap = max(1024, min(self.B * self.B, cap))
        self.window = settings.l_window if settings.window else 0

        dev = {k: jnp.asarray(v) for k, v in stacked.items()
               if k in ("alt_bits", "miss_bits", "het_bits", "hom_bits",
                        "valid_bits", "pos", "rid", "ac", "n_het", "n_hom",
                        "valid")}
        self._dev = dev
        jnp_ = jnp

        def gather(name, i):
            return jnp_.take(dev[name], i, axis=0)

        def tile_mask(i, j, diag):
            m = gather("valid", i)[:, None] & gather("valid", j)[None, :]
            m &= (gather("ac", i)[:, None] + gather("ac", j)[None, :]) > 2
            ii = jnp_.arange(self.B)[:, None]
            jj = jnp_.arange(self.B)[None, :]
            m &= jnp_.where(diag, ii < jj, True)
            if self.window > 0:
                same = gather("rid", i)[:, None] == gather("rid", j)[None, :]
                # positions are < 2^30 so int32 differences cannot overflow
                dist = jnp_.abs(gather("pos", i)[:, None]
                                - gather("pos", j)[None, :])
                m &= same & (dist <= self.window)
            return m

        n_s = n_samples
        min_r2, max_r2 = settings.min_r2, settings.max_r2
        cap_ = self.cap

        def phased_counts(i, j, has_missing):
            return K.phased_counts_tile(
                gather("alt_bits", i), gather("miss_bits", i),
                gather("alt_bits", j), gather("miss_bits", j),
                gather("ac", i), gather("ac", j), n_s, has_missing)

        def unphased_counts(i, j, has_missing):
            return K.unphased_counts_tile(
                gather("het_bits", i), gather("hom_bits", i),
                gather("valid_bits", i),
                gather("het_bits", j), gather("hom_bits", j),
                gather("valid_bits", j),
                gather("n_het", i), gather("n_hom", i),
                gather("n_het", j), gather("n_hom", j), n_s, has_missing)

        def _phased_batch(pair_i, pair_j, diag, has_missing):
            def body(_, inp):
                i, j, dg = inp
                counts = phased_counts(i, j, has_missing)
                mask = tile_mask(i, j, dg)
                pf = K.phased_prefilter_mask(counts, mask, min_r2, max_r2)
                n, idx, rows = K.compact_tile(
                    pf, counts.reshape(-1, 4), cap_)
                n_candidates = mask.sum(dtype=jnp_.int32)
                return None, (n, idx, rows, n_candidates)
            _, out = jax.lax.scan(body, None, (pair_i, pair_j, diag))
            return out

        self._phased_batch_nomiss = jax.jit(
            lambda pi, pj, dg: _phased_batch(pi, pj, dg, False))
        self._phased_batch_miss = jax.jit(
            lambda pi, pj, dg: _phased_batch(pi, pj, dg, True))

        def _phased_full(i, j, diag, has_missing):
            counts = phased_counts(i, j, has_missing)
            return counts, tile_mask(i, j, diag)

        self._phased_full_nomiss = jax.jit(
            lambda i, j, dg: _phased_full(i, j, dg, False))
        self._phased_full_miss = jax.jit(
            lambda i, j, dg: _phased_full(i, j, dg, True))

        def _unphased_full(i, j, diag, has_missing):
            T = unphased_counts(i, j, has_missing)
            return T, tile_mask(i, j, diag)

        self._unphased_full_nomiss = jax.jit(
            lambda i, j, dg: _unphased_full(i, j, dg, False))
        self._unphased_full_miss = jax.jit(
            lambda i, j, dg: _unphased_full(i, j, dg, True))

    # ------------------------------------------------------------------
    def run_phased_pairs(self, pairs, has_missing, filt, emit):
        """Batched phased path with device prefilter + compaction."""
        import numpy as np
        G = self.settings.batch_pairs
        fn = (self._phased_batch_miss if has_missing
              else self._phased_batch_nomiss)
        full_fn = (self._phased_full_miss if has_missing
                   else self._phased_full_nomiss)
        n_pairs_total = 0
        for s in range(0, len(pairs), G):
            chunk = pairs[s:s + G]
            pad = G - len(chunk)
            pi = np.array([p[0] for p in chunk] + [0] * pad, np.int32)
            pj = np.array([p[1] for p in chunk] + [0] * pad, np.int32)
            dg = np.array([p[2] for p in chunk] + [True] * pad, bool)
            # padding re-computes pair (0,0) diag; harmless but must be
            # skipped when emitting
            n, idx, rows, n_cand = (np.asarray(x) for x in fn(pi, pj, dg))
            for g, (bi, bj, diag) in enumerate(chunk):
                n_pairs_total += int(n_cand[g])
                n_pass = int(n[g])
                if n_pass == 0:
                    continue
                if n_pass > self.cap:
                    counts_t, mask_t = (np.asarray(x)
                                        for x in full_fn(bi, bj, diag))
                    pf = np.flatnonzero(mask_t.ravel())
                    counts_rows = counts_t.reshape(-1, 4)[pf]
                    flat_idx = pf
                else:
                    flat_idx = idx[g][:n_pass].astype(np.int64)
                    counts_rows = rows[g][:n_pass].astype(np.int64)
                k, l = flat_idx // self.B, flat_idx % self.B
                meta = _pair_meta_from(self.stacked, bi, bj, k, l)
                recs, _ = phased_math(counts_rows.astype(np.int64), meta,
                                      filt)
                emit(recs)
        return n_pairs_total

    def run_general_pairs(self, pairs, has_missing, filt, emit,
                          mode: str):
        """Unbatched general path: full tiles to host. mode is
        'unphased' (all pairs unphased) or 'mixed' (per-pair dispatch on
        missingness, reference Calculate() semantics)."""
        import numpy as np
        n_pairs_total = 0
        up_fn = (self._unphased_full_miss if has_missing
                 else self._unphased_full_nomiss)
        ph_fn = (self._phased_full_miss if has_missing
                 else self._phased_full_nomiss)
        for bi, bj, diag in pairs:
            T, mask = (np.asarray(x) for x in up_fn(bi, bj, diag))
            flat = np.flatnonzero(mask.ravel())
            n_pairs_total += len(flat)
            if len(flat) == 0:
                continue
            k, l = flat // self.B, flat % self.B
            meta = _pair_meta_from(self.stacked, bi, bj, k, l)
            tables = T.reshape(-1, 3, 3)[flat].astype(np.int64)
            if mode == "unphased":
                recs = unphased_math(tables, meta, filt)
                emit(recs)
            else:  # mixed: missing pairs -> unphased, clean -> phased
                miss_pair = (meta.an_a > 0) | (meta.an_b > 0)
                if miss_pair.any():
                    sub = {kk: getattr(meta, kk)[miss_pair]
                           for kk in PairMeta.__dataclass_fields__}
                    recs = unphased_math(tables[miss_pair],
                                         PairMeta(**sub), filt)
                    emit(recs)
                clean = ~miss_pair
                if clean.any():
                    counts_t, _ = (np.asarray(x) for x in ph_fn(bi, bj, diag))
                    counts_rows = counts_t.reshape(-1, 4)[flat][clean]
                    sub = {kk: getattr(meta, kk)[clean]
                           for kk in PairMeta.__dataclass_fields__}
                    recs, _ = phased_math(counts_rows.astype(np.int64),
                                          PairMeta(**sub), filt)
                    emit(recs)
        return n_pairs_total


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
        n += engine.run_general_pairs(nomiss, False, filt, emit, "unphased")
        n += engine.run_general_pairs(withmiss, True, filt, emit,
                                      "unphased")
    else:
        # blocks without any missing variant: pure phased fast path
        n += engine.run_phased_pairs(nomiss, False, filt, emit)
        n += engine.run_general_pairs(withmiss, True, filt, emit, "mixed")
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
    result.elapsed = timer.elapsed()
    log("LOG", f"Computed {pretty_int(result.n_pairs)} pairs -> "
        f"{pretty_int(result.n_records)} records in "
        f"{timer.elapsed_string()} "
        f"({pretty_int(int(result.pairs_per_sec))} pairs/s)",
        sub="PROGRESS")
    reader.close()
    return result
