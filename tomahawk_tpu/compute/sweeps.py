"""Pure-function tile sweeps, single-chip or mesh-sharded.

The same scan bodies serve both execution modes:

- single chip: jax.jit over the full tile list.
- device mesh ('pairs', 'samples'): shard_map splits the tile list
  across the 'pairs' axis (the TPU-native form of the reference's
  multi-machine chunking, reference: lib/ld/ld_balancing.h +
  docs/job-balancing.md) and optionally shards the packed haplotype
  word axis across 'samples'; partial MXU contractions are then
  psum-reduced to exact counts over ICI.

The production path is fused_sweep: one dispatch produces per-tile
survivor/candidate counts AND capped compacted survivor rows at a
running offset. extract_sweep re-runs specific tiles at exact
caller-computed offsets (repair for cap/buffer overflows), and
count_sweep is the counts-only variant. Host<->device traffic is
proportional to the output in all modes.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import ld_kernels as K

# device tensors consumed by the sweeps, in pytree order
BAND_KEYS = ("alt_bits", "miss_bits", "het_bits", "hom_bits",
             "valid_bits", "pos", "rid", "ac", "an", "n_het", "n_hom",
             "valid")
DEV_KEYS = BAND_KEYS

# planes whose trailing axis is the packed word axis (shardable over
# the 'samples' mesh axis); everything else is replicated metadata
WORD_KEYS = ("alt_bits", "miss_bits", "het_bits", "hom_bits", "valid_bits")


def dev_keys_for(cfg) -> tuple:
    """The subset of DEV_KEYS a sweep config actually reads -- uploads
    (and shard_map specs) cover only these."""
    keys = ["ac", "valid"]
    if cfg["table"] == "phased":
        keys.append("alt_bits")
        if cfg["has_missing"]:
            keys.append("miss_bits")
    else:
        keys += ["het_bits", "hom_bits", "n_het", "n_hom"]
        if cfg["has_missing"]:
            keys.append("valid_bits")
    if cfg["window"] > 0:
        keys += ["pos", "rid"]
    if cfg["cls"] != "all":
        keys.append("an")
    return tuple(k for k in DEV_KEYS if k in keys)


def tile_mask(dev, i, j, diag, B, window, cls):
    """Candidate-pair mask for one tile: real rows, the reference's ac
    skip rule (reference: ld_engine.cpp:1910-1912), the upper triangle
    on diagonal tiles, the distance window, and the phased/unphased
    pair-class split of mixed-mode Calculate()
    (reference: ld_engine.cpp:2737-2880)."""
    ac_i, ac_j = dev["ac"][i], dev["ac"][j]
    m = dev["valid"][i][:, None] & dev["valid"][j][None, :]
    m &= (ac_i[:, None] + ac_j[None, :]) > 2
    ii = jnp.arange(B)[:, None]
    jj = jnp.arange(B)[None, :]
    m &= jnp.where(diag, ii < jj, True)
    if window > 0:
        same = dev["rid"][i][:, None] == dev["rid"][j][None, :]
        dist = jnp.abs(dev["pos"][i][:, None] - dev["pos"][j][None, :])
        m &= same & (dist <= window)
    if cls != "all":
        clean = (dev["an"][i][:, None] == 0) & (dev["an"][j][None, :] == 0)
        m &= clean if cls == "clean" else ~clean
    return m


def payload_cols(table: str, has_missing: bool) -> int:
    """Raw MXU parts carried per survivor (the host re-derives the full
    table from these plus replicated per-variant metadata)."""
    if table == "phased":
        return 4 if has_missing else 1
    return 9 if has_missing else 4


def fisher_on(cfg) -> bool:
    """Whether the fused sweep appends the in-sweep Fisher bracket
    column (phased tables; the unphased EM path keeps Fisher on host
    until the EM root choice itself moves on device)."""
    return bool(cfg.get("fisher")) and cfg["table"] == "phased"


def fisher_packed(cfg) -> bool:
    """Whether the Fisher bracket rides the UNUSED top 16 bits of the
    single payload column as bf16 instead of its own f32 column --
    free transfer in the flagship phased/no-missing shape. Safe only
    when the device can bound P < 1e-4 (bf16's 0.2% relative error is
    then < 2e-7 absolute, 50x inside the golden 1e-5); larger-P lanes
    are flagged for the exact host recompute."""
    return fisher_on(cfg) and not cfg["has_missing"] and pack16_ok(cfg)


def fisher_cols(cfg) -> int:
    """Extra survivor-buffer columns the Fisher epilogue appends."""
    return 1 if fisher_on(cfg) and not fisher_packed(cfg) else 0


# per-shard survivor floor below which the fused sweep SKIPS the
# Fisher epilogue: the walk costs ~2 ms per 32k-lane chunk per
# segment, while the host's exact scan costs ~1 us/row -- sparse
# segments are cheaper on host. The host mirrors this EXACT rule from
# its n_pass copy (integer sums, deterministic), so both sides agree
# on which rows carry a device bracket.
FISHER_MIN_ROWS = 16384


def append_fisher_col(dev, ends, n_tile, buf, pi, pj, cfg):
    """Append a bitcast-f32 two-sided Fisher bracket column to the
    survivor buffer: one vectorized epilogue over the segment's
    compacted survivors inside the same dispatch as the sweep -- the
    in-sweep survivor statistic the reference computes inline on its
    slave threads (reference: lib/ld/ld_engine.cpp:1233-1242). The
    host combines P = q * bracket in f64 (ops/fisher_dev.py), so the
    ~1 us/table host Fisher scan leaves the record-dense critical
    path. Both the fused and the repair sweep run this same epilogue,
    so a record's P value is identical whichever extraction path its
    tile took (cap adaptation and resume stay byte-deterministic).

    ends: [T] ascending per-tile END offsets of each tile's survivor
    rows in `buf` (cumsum of counts for the fused sweep; offset+count
    for the exact-offset repair sweep). n_tile: [T] per-tile survivor
    counts, delimiting each tile's LIVE rows -- garbage slots must not
    reach the scans (they set the shared trip count)."""
    from ..ops import fisher_dev as F
    B = cfg["B"]
    T = ends.shape[0]
    R = buf.shape[0]
    rowid = jnp.arange(R, dtype=jnp.int32)
    t = jnp.minimum(jnp.searchsorted(ends, rowid, side="right"),
                    T - 1).astype(jnp.int32)
    live = (rowid >= ends[t] - n_tile[t]) & (rowid < ends[t])
    i, j = pi[t], pj[t]
    idx = buf[:, 0]
    k = jnp.clip(idx // B, 0, B - 1)
    ll = jnp.clip(idx % B, 0, B - 1)
    if cfg["has_missing"]:
        if pack16_ok(cfg):
            c0, c1 = buf[:, 1], buf[:, 2]
            aa = c0 & 0xFFFF
            alt_val = (c0 >> 16) & 0xFFFF
            val_alt = c1 & 0xFFFF
            val_val = (c1 >> 16) & 0xFFFF
        else:
            aa, alt_val, val_alt, val_val = (buf[:, 1], buf[:, 2],
                                             buf[:, 3], buf[:, 4])
        ar = alt_val - aa           # ALTREF (phased_cells order)
        ra = val_alt - aa           # REFALT
        rr = val_val - aa - ar - ra
    else:
        # single payload column holds altalt raw (pack16 leaves a
        # lone value unshifted)
        aa = buf[:, 1]
        ac_a = dev["ac"][i, k]
        ac_b = dev["ac"][j, ll]
        ar = ac_a - aa
        ra = ac_b - aa
        rr = 2 * cfg["n_samples"] - ac_a - ac_b + aa
    z = jnp.int32(0)
    # garbage rows (slots past a tile's survivor count) may decode to
    # inconsistent counts; clamp so the scan stays bounded
    rr, ra, ar, aa = (jnp.maximum(x, z) for x in (rr, ra, ar, aa))

    packed = fisher_packed(cfg)

    def chunk_col(ops):
        """Fisher bracket -> encoded int32 column for one row chunk."""
        crr, cra, car, caa, clive, cpay = ops
        br, log2_pb = F.fisher_bracket(crr, cra, car, caa, live=clive)
        if not packed:
            return jax.lax.bitcast_convert_type(br, jnp.int32)
        # packed variant: bf16 bracket in the top 16 bits of the
        # payload column. bf16's 0.2% relative error is only safe
        # while P < 1e-4; flag larger-P lanes (and anything already
        # uncertain) as bf16 NaN so the host recomputes them exactly.
        # log2_pb is the device-certain upper bound on log2(P); the
        # 1e-4 gate carries a 50x margin over where bf16 error would
        # cross the 1e-5 golden tolerance.
        p_big = log2_pb > F.LOG2_P_GATE
        bad = p_big | (br < 0)
        b16 = br.astype(jnp.bfloat16)
        bits = jax.lax.bitcast_convert_type(
            b16, jnp.uint16).astype(jnp.int32)
        bits = jnp.where(bad, jnp.int32(0x7FC0), bits)   # bf16 NaN
        return (cpay & 0xFFFF) | (bits << 16)

    def skip_col(ops):
        # a chunk with no live rows: the host never reads its bracket
        # bits, so any placeholder works (dead payload bits preserved)
        return ops[5] if packed else jnp.zeros_like(ops[5])

    # chunked cond-skip: the epilogue's cost scales with the BUFFER
    # size, not the survivor count -- sparse segments would pay for
    # outcap lanes of garbage. Splitting into chunks that lax.cond
    # skips at runtime makes the cost proportional to occupied rows
    # (survivors compact from row 0, so only leading chunks are
    # live). A scan over the chunk axis keeps ONE copy of the walk in
    # the program, bounding compile time.
    pay = buf[:, 1]
    nch = 8 if R % 8 == 0 and R >= (1 << 16) else 1
    if nch == 1:
        col = jax.lax.cond(jnp.any(live), chunk_col, skip_col,
                           (rr, ra, ar, aa, live, pay))
    else:
        xs = tuple(x.reshape(nch, R // nch)
                   for x in (rr, ra, ar, aa, live, pay))

        def chunk_body(_, ops):
            return None, jax.lax.cond(jnp.any(ops[4]), chunk_col,
                                      skip_col, ops)

        _, col = jax.lax.scan(chunk_body, None, xs)
        col = col.reshape(R)
    if not packed:
        return jnp.concatenate([buf, col[:, None]], axis=1)
    return jnp.concatenate([buf[:, :1], col[:, None], buf[:, 2:]],
                           axis=1)


def pack16_ok(cfg) -> bool:
    """Whether survivor payload parts fit uint16 so two can ride one
    int32 buffer column. Phased parts are haplotype-level counts
    (<= 2N), unphased genotype-level (<= N). Halving the survivor
    buffer width halves the device->host payload in record-dense
    regimes, where that transfer -- not the sweep -- is the ceiling
    (round-2 weakness 1 residual)."""
    lim = (2 if cfg["table"] == "phased" else 1) * cfg["n_samples"]
    return lim < (1 << 16)


def buf_cols(cfg) -> int:
    """Survivor buffer columns: 1 index col + (possibly pair-packed)
    payload cols."""
    p = payload_cols(cfg["table"], cfg["has_missing"])
    return 1 + ((p + 1) // 2 if pack16_ok(cfg) else p)


def _pack_cols(idx, parts, safe, cfg):
    """[cap, buf_cols] survivor rows: index + payload, with payload
    pairs packed (lo | hi << 16) when they fit uint16."""
    vals = [p.reshape(-1)[safe] for p in parts]
    if pack16_ok(cfg):
        vals = [vals[k] | (vals[k + 1] << 16)
                if k + 1 < len(vals) else vals[k]
                for k in range(0, len(vals), 2)]
    return jnp.concatenate([idx[:, None]] + [v[:, None] for v in vals],
                           axis=1)


def unpack_payload(cols, table: str, has_missing: bool,
                   n_samples: int):
    """Host inverse of _pack_cols' payload packing: [K, buf_cols-1]
    int32 buffer columns -> [K, payload_cols] int64 parts."""
    import numpy as np
    p = payload_cols(table, has_missing)
    cfg = dict(table=table, n_samples=n_samples)
    if not pack16_ok(cfg):
        return cols.astype(np.int64)
    out = np.empty((len(cols), p), np.int64)
    for k in range(cols.shape[1]):
        v = cols[:, k].astype(np.int64) & 0xFFFFFFFF
        out[:, 2 * k] = v & 0xFFFF
        if 2 * k + 1 < p:
            out[:, 2 * k + 1] = (v >> 16) & 0xFFFF
    return out


def tile_prefilter(dev, i, j, diag, cfg):
    """(prefilter_mask, candidate_mask, parts) for one tile. parts are
    the raw [I, J] contractions; counts/tables are formed only as fused
    elementwise expressions (a materialized [I, J, 4] tensor would be
    268 MB of HBM churn per 4096-row tile).

    backend "pallas" routes the whole tile through the fused VMEM
    kernel (ops/pallas_tiles.py) -- same outputs, ~half the HBM
    traffic; "xla" (default) is the portable dot + fused-epilogue
    path below."""
    if cfg.get("backend") == "pallas":
        from ..ops import pallas_tiles as PT
        if cfg["psum_axis"] is None:
            if PT.supported(cfg, dev):
                return PT.tile_prefilter_pallas(dev, i, j, diag, cfg)
        elif PT.supported(cfg, dev):
            # samples-sharded mesh: the fused VMEM kernel contracts the
            # LOCAL word slice (parts only), the psum makes the counts
            # global, and the same jnp epilogue as the XLA path runs on
            # them -- so the flagship kernel serves sharded (incl. dcn)
            # meshes instead of silently degrading (round-2 weakness 5)
            parts = PT.tile_parts_pallas(dev, i, j, cfg)
            parts = tuple(jax.lax.psum(jnp.stack(parts),
                                       axis_name=cfg["psum_axis"]))
            m = tile_mask(dev, i, j, diag, cfg["B"], cfg["window"],
                          cfg["cls"])
            dp = (cfg.get("min_dprime", 0.0), cfg.get("max_dprime", 100.0))
            if cfg["table"] == "phased":
                cells = K.phased_cells(parts, dev["ac"][i], dev["ac"][j],
                                       cfg["n_samples"])
                pf = K.phased_prefilter_cells(cells, m, cfg["min_r2"],
                                              cfg["max_r2"], *dp)
            else:
                cells = K.unphased_cells(
                    parts, dev["n_het"][i], dev["n_hom"][i],
                    dev["n_het"][j], dev["n_hom"][j], cfg["n_samples"])
                pf = K.unphased_prefilter_cells(cells, m, cfg["min_r2"],
                                                cfg["max_r2"], *dp)
            return pf, m, parts
    m = tile_mask(dev, i, j, diag, cfg["B"], cfg["window"], cfg["cls"])
    miss = cfg["has_missing"]
    dp = (cfg.get("min_dprime", 0.0), cfg.get("max_dprime", 100.0))
    if cfg["table"] == "phased":
        miss_i = dev["miss_bits"][i] if miss else dev["alt_bits"][i]
        miss_j = dev["miss_bits"][j] if miss else dev["alt_bits"][j]
        parts = K.phased_parts_tile(
            dev["alt_bits"][i], miss_i, dev["alt_bits"][j], miss_j,
            miss, psum_axis=cfg["psum_axis"])
        cells = K.phased_cells(parts, dev["ac"][i], dev["ac"][j],
                               cfg["n_samples"])
        pf = K.phased_prefilter_cells(cells, m, cfg["min_r2"],
                                      cfg["max_r2"], *dp)
        return pf, m, parts
    val_i = dev["valid_bits"][i] if miss else dev["het_bits"][i]
    val_j = dev["valid_bits"][j] if miss else dev["het_bits"][j]
    parts = K.unphased_parts_tile(
        dev["het_bits"][i], dev["hom_bits"][i], val_i,
        dev["het_bits"][j], dev["hom_bits"][j], val_j,
        miss, psum_axis=cfg["psum_axis"])
    cells = K.unphased_cells(parts, dev["n_het"][i], dev["n_hom"][i],
                             dev["n_het"][j], dev["n_hom"][j],
                             cfg["n_samples"])
    pf = K.unphased_prefilter_cells(cells, m, cfg["min_r2"],
                                    cfg["max_r2"], *dp)
    return pf, m, parts


def tile_group(cfg, T: int) -> int:
    """Tiles processed per scan step. Small tiles (window mode
    auto-sizes B below 4096) leave each scan iteration's fixed
    overhead amortized over B^2/4096^2 as much work, which dominated
    the 250 kb-window profile (~0.3 ms/iter vs ~0.05 ms of MXU dot at
    B=1024); grouping 4096/B tiles per step restores the 4096-tile
    iteration granularity. The engine pads tile lists to multiples of
    16 (per shard), so the group always divides T."""
    g = max(1, 4096 // max(cfg["B"], 1))
    while g > 1 and T % g:
        g //= 2
    return g


def count_sweep(dev, pi, pj, dg, live, *, cfg):
    """Per-tile (survivor count, candidate count) over a tile list."""
    T = pi.shape[0]
    G = tile_group(cfg, T)

    def body(_, inp):
        i_g, j_g, dg_g, lv_g = inp
        ns, ncs = [], []
        for g in range(G):
            pf, m, _ = tile_prefilter(dev, i_g[g], j_g[g], dg_g[g],
                                      cfg)
            ns.append(jnp.where(lv_g[g], pf.sum(dtype=jnp.int32), 0))
            ncs.append(jnp.where(lv_g[g], m.sum(dtype=jnp.int32), 0))
        return None, (jnp.stack(ns), jnp.stack(ncs))

    xs = tuple(x.reshape(T // G, G) for x in (pi, pj, dg, live))
    _, (n, nc) = jax.lax.scan(body, None, xs)
    return n.reshape(T), nc.reshape(T)


def fused_sweep(dev, pi, pj, dg, live, *, cfg, cap, outcap):
    """Single-pass sweep: per-tile counts AND capped survivor
    extraction at a running offset, in one dispatch. When survivors are
    thinly spread (the common case) this halves the work of the
    count-then-extract pair; the caller repairs the rare tiles that
    overflow `cap` or spill past the buffer via extract_sweep with
    exact offsets.

    Returns (n_pass [T], n_cand [T], buf [outcap, ncol]). The running
    offsets equal the host-side prefix sums of n_pass, so the caller
    can slice each tile's rows without any index column round trip.
    Writes clamp at outcap - cap; rows at or beyond the clamp boundary
    are garbage whenever the total spills (detectable from n_pass)."""
    ncol = buf_cols(cfg)
    BB = cfg["B"] * cfg["B"]
    T = pi.shape[0]
    G = tile_group(cfg, T)

    def body(carry, inp):
        buf, off = carry
        i_g, j_g, dg_g, lv_g = inp
        ns, ncs = [], []
        for g in range(G):
            lv = lv_g[g]
            pf, m, parts = tile_prefilter(dev, i_g[g], j_g[g],
                                          dg_g[g], cfg)
            pf &= lv
            n = pf.sum(dtype=jnp.int32)
            nc = jnp.where(lv, m.sum(dtype=jnp.int32), 0)

            def hit(buf, pf=pf, parts=parts, off=off):
                _, idx = K.compact_indices_small(pf, cap)
                safe = jnp.minimum(idx, BB - 1)
                rec = _pack_cols(idx, parts, safe, cfg)
                return jax.lax.dynamic_update_slice(
                    buf, rec, (jnp.minimum(off, outcap - cap), 0))

            # most tiles have no survivors: skip the whole compaction.
            # The carry clamps at outcap so a dense segment cannot
            # wrap the int32 accumulator (raw per-tile counts reach
            # B*B); once clamped, every later tile sits past the
            # spill boundary and the host marks it for the
            # exact-offset repair sweep.
            buf = jax.lax.cond(n > 0, hit, lambda b: b, buf)
            off = jnp.minimum(off + n, outcap)
            ns.append(n)
            ncs.append(nc)
        return (buf, off), (jnp.stack(ns), jnp.stack(ncs))

    buf0 = jnp.zeros((outcap, ncol), jnp.int32)
    xs = tuple(x.reshape(T // G, G) for x in (pi, pj, dg, live))
    (buf, _), (n, nc) = jax.lax.scan(body, (buf0, jnp.int32(0)), xs)
    n, nc = n.reshape(T), nc.reshape(T)
    if fisher_on(cfg):
        # volume gate: below FISHER_MIN_ROWS survivors (per shard) the
        # host's exact scan is cheaper than the device epilogue, so
        # the WHOLE epilogue (row->tile mapping, metadata gathers,
        # walks, buffer copy) sits behind one runtime cond -- sparse
        # segments pay only the reduce
        def _with_fisher(ops):
            n_, buf_ = ops
            return append_fisher_col(dev, jnp.cumsum(n_), n_, buf_,
                                     pi, pj, cfg)

        def _without(ops):
            _, buf_ = ops
            if fisher_cols(cfg):
                z = jnp.zeros((buf_.shape[0], 1), jnp.int32)
                return jnp.concatenate([buf_, z], axis=1)
            return buf_

        buf = jax.lax.cond(n.sum() >= FISHER_MIN_ROWS, _with_fisher,
                           _without, (n, buf))
    return n, nc, buf


def extract_sweep(dev, pi, pj, dg, off, *, cfg, cap, outcap):
    """Re-sweep hit tiles, writing [idx, raw parts...] survivor rows at
    exact offsets into one [outcap, ncol] buffer. Rows past each tile's
    survivor count are junk that later tiles overwrite; the caller
    slices the buffer to the exact total. Repair rows carry NO Fisher
    bracket -- the host computes their P with the exact native scan
    (repairs are rare; the P field tolerance across extraction paths
    is the 1e-5 golden contract)."""
    ncol = buf_cols(cfg)
    BB = cfg["B"] * cfg["B"]

    def body(buf, inp):
        i, j, diag, o = inp
        pf, _, parts = tile_prefilter(dev, i, j, diag, cfg)
        _, idx = K.compact_indices(pf, cap)
        safe = jnp.minimum(idx, BB - 1)
        rec = _pack_cols(idx, parts, safe, cfg)
        buf = jax.lax.dynamic_update_slice(buf, rec, (o, 0))
        return buf, None

    buf0 = jnp.zeros((outcap, ncol), jnp.int32)
    buf, _ = jax.lax.scan(body, buf0, (pi, pj, dg, off))
    return buf


def make_cfg(table: str, has_missing: bool, cls: str, B: int,
             n_samples: int, window: int, min_r2: float, max_r2: float,
             psum_axis: str = None, backend: str = "xla",
             min_dprime: float = 0.0, max_dprime: float = 100.0,
             fisher: bool = False) -> dict:
    return dict(table=table, has_missing=has_missing, cls=cls, B=B,
                n_samples=n_samples, window=window, min_r2=min_r2,
                max_r2=max_r2, psum_axis=psum_axis, backend=backend,
                min_dprime=min_dprime, max_dprime=max_dprime,
                fisher=fisher)


def jit_count_sweep(cfg):
    return jax.jit(partial(count_sweep, cfg=cfg))


def jit_extract_sweep(cfg, cap, outcap):
    return jax.jit(partial(extract_sweep, cfg=cfg, cap=cap, outcap=outcap))


def jit_fused_sweep(cfg, cap, outcap):
    return jax.jit(partial(fused_sweep, cfg=cfg, cap=cap, outcap=outcap))


def shard_fused_sweep(mesh, cfg, cap, outcap):
    """fused_sweep over a mesh: each 'pairs' shard keeps its own running
    offset into its own [outcap, ncol] buffer region; the global result
    concatenates shard buffers, and per-shard offsets are the prefix
    sums of that shard's n_pass slice."""
    from jax.sharding import PartitionSpec as P
    samples = "samples" in mesh.axis_names and mesh.shape["samples"] > 1
    cfg = dict(cfg, psum_axis="samples" if samples else None)
    fn = jax.shard_map(
        partial(fused_sweep, cfg=cfg, cap=cap, outcap=outcap), mesh=mesh,
        in_specs=(_dev_specs(P, samples, dev_keys_for(cfg)),
                  P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        out_specs=(P("pairs"), P("pairs"), P("pairs")),
        check_vma=False)
    return jax.jit(fn)


def _dev_specs(P, samples_sharded: bool, keys):
    specs = {}
    for k in keys:
        if k in WORD_KEYS and samples_sharded:
            specs[k] = P(None, None, "samples")
        else:
            specs[k] = P()
    return specs


def shard_count_sweep(mesh, cfg):
    """count_sweep over a ('pairs'[, 'samples']) mesh. The tile list
    length must be divisible by the 'pairs' axis size; outputs are the
    same global [T] arrays as the single-chip version."""
    from jax.sharding import PartitionSpec as P
    samples = "samples" in mesh.axis_names and mesh.shape["samples"] > 1
    cfg = dict(cfg, psum_axis="samples" if samples else None)
    fn = jax.shard_map(
        partial(count_sweep, cfg=cfg), mesh=mesh,
        in_specs=(_dev_specs(P, samples, dev_keys_for(cfg)),
                  P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        out_specs=(P("pairs"), P("pairs")),
        check_vma=False)
    return jax.jit(fn)


def shard_extract_sweep(mesh, cfg, cap, outcap):
    """extract_sweep over a mesh: each 'pairs' shard fills its own
    [outcap, ncol] buffer from its slice of hit tiles at caller-chosen
    local offsets; the global result is the concatenation [n_shards *
    outcap, ncol]."""
    from jax.sharding import PartitionSpec as P
    samples = "samples" in mesh.axis_names and mesh.shape["samples"] > 1
    cfg = dict(cfg, psum_axis="samples" if samples else None)

    # every samples-shard computes identical rows (counts are
    # psum-reduced before any use), so the unsharded 'samples' axis of
    # the output is replicated by construction
    fn = jax.shard_map(
        partial(extract_sweep, cfg=cfg, cap=cap, outcap=outcap), mesh=mesh,
        in_specs=(_dev_specs(P, samples, dev_keys_for(cfg)),
                  P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        out_specs=P("pairs"),
        check_vma=False)
    return jax.jit(fn)
