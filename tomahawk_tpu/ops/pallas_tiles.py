"""Fused pallas tile kernel: packed planes -> (candidate/survivor mask,
raw contraction parts) in ONE pass through VMEM.

The XLA tile path (ops/ld_kernels.py + compute/sweeps.tile_prefilter)
materializes each [B, B] int32 contraction in HBM and then streams it
back through the elementwise prefilter epilogue -- at 4096-row tiles
that is ~0.5 GB of HBM churn per tile for the 4-dot unphased table and
dominates the measured 3.4 ms/tile (vs ~0.9 ms of int8 MXU work).

This kernel keeps everything on-chip per [BM, BM] block:

  packed uint32 planes --DMA--> VMEM --unpack--> int8 lanes
      --MXU dots--> int32 parts (VMEM) --VPU epilogue--> mask

and writes only the final mask (i32: 0 = not a candidate, 1 =
candidate, 2 = survivor) plus the int32 parts (still needed as
survivor payload).
The prefilter math is the *same jnp code* as the XLA path
(ld_kernels.phased_prefilter_cells / unphased_prefilter_cells), traced
into the kernel, so survivor sets are identical by construction.

In-kernel unpack: `pltpu.repeat(x, 32, axis=1)` TILES the word axis
(lane p holds word p % W), so with shift p // W lane p carries bit
p // W of word p % W -- a fixed permutation of the canonical sample
order. Contractions over the lane axis cannot observe the permutation,
and both operands use the same unpack, so every count is exact.

Sample counts (the contraction K axis) can exceed one VMEM block; the
kernel then runs a third grid dimension over word chunks and
accumulates parts in the revisited output block, applying the epilogue
on the last chunk.

Reference behavior being reproduced: the per-pair prefilter semantics
of lib/ld/ld_engine.cpp (ac-skip rule :1910-1912, phased 2x2 and
unphased cubic-EM estimators) -- see ops/ld_kernels.py for the math
derivation notes.
"""


import numpy as np

import jax
import jax.numpy as jnp

from . import ld_kernels as K

# row/col metadata column layout inside the [B, 8] / [8, B] int32 arrays
META_COLS = ("valid", "ac", "n_het", "n_hom", "pos", "rid", "an")
_C = {name: c for c, name in enumerate(META_COLS)}

# Mosaic requires the trailing block dim be a multiple of 128 lanes or
# the full array; packed-word chunks are therefore either all of W or
# 128-word pieces. VMEM budgets bound the unpacked [BM, wk*32] int8
# temporaries and the accumulated [P, BM, BM] int32 parts block.
_CHUNK_WORDS = 128
_UNPACK_BUDGET = 6 << 20
_PARTS_BUDGET = 5 << 20


def plan_layout(B: int, W: int, n_unpacked: int, n_parts: int):
    """(BM, n_chunks, chunk_words, padded_words) for a [B, B]-pair tile
    with [*, W]-word planes: single-shot over the whole word axis when
    the unpacked operands fit VMEM, otherwise 128-word chunks
    accumulated over a third grid dimension. Returns BM = 0 when no
    layout fits (caller falls back to the XLA path)."""
    def ok(bm, wk):
        return (2 * n_unpacked * bm * wk * 32 <= _UNPACK_BUDGET
                and n_parts * bm * bm * 4 <= _PARTS_BUDGET)

    # only lane-aligned tiles: whole-B blocks satisfy Mosaic's block
    # rules but its vector-bool lowering crashes on non-128-aligned
    # shapes (observed on v5e), so odd-sized tiles (runs smaller than
    # tile_rows) stay on the XLA path -- they are small and fast there
    import os
    max_bm = int(os.environ.get("TWK_PALLAS_MAX_BM", "512"))
    cands = [b for b in (512, 256, 128) if B % b == 0 and b <= max_bm]
    for bm in cands:
        if ok(bm, W):
            return bm, 1, W, W
    for bm in cands:
        if ok(bm, _CHUNK_WORDS):
            nk = -(-W // _CHUNK_WORDS)
            return bm, nk, _CHUNK_WORDS, nk * _CHUNK_WORDS
    return 0, 0, 0, 0


def supported(cfg, dev) -> bool:
    """Whether the fused kernel has a VMEM layout for this config (the
    caller falls back to the XLA tile path otherwise)."""
    keys = plane_keys(cfg["table"], cfg["has_missing"])
    W = dev[keys[0]].shape[-1]
    nrp = len(keys)
    n_unpacked = nrp + (1 if (cfg["table"] == "phased"
                              and cfg["has_missing"]) else 0)
    return plan_layout(cfg["B"], W, n_unpacked,
                       n_parts(cfg["table"], cfg["has_missing"]))[0] != 0


def plane_keys(table: str, has_missing: bool):
    if table == "phased":
        return ("alt_bits", "miss_bits") if has_missing else ("alt_bits",)
    return (("het_bits", "hom_bits", "valid_bits") if has_missing
            else ("het_bits", "hom_bits"))


def n_parts(table: str, has_missing: bool) -> int:
    if table == "phased":
        return 4 if has_missing else 1
    return 9 if has_missing else 4


def _unpack(ref_val, interpret: bool):
    """[M, W] uint32 -> [M, W*32] int8 of 0/1 bits (permuted lane
    order, identical for every operand -- see module docstring)."""
    W = ref_val.shape[-1]
    if interpret:
        # interpreter mode (CPU tests): pltpu.repeat is TPU-only; use
        # the canonical unpack -- contraction results are identical.
        return K.unpack_bits(ref_val)
    from jax.experimental.pallas import tpu as pltpu
    rep = pltpu.repeat(ref_val, 32, axis=1)
    sh = jax.lax.broadcasted_iota(jnp.uint32, rep.shape, 1) // jnp.uint32(W)
    return ((rep >> sh) & jnp.uint32(1)).astype(jnp.int8)


# the canonical lane-axis contraction; shared so a change there (e.g.
# a precision flag) applies to both tile backends identically
_dot = K._dot


def _chunk_parts(table, has_missing, row_planes, col_planes, interpret):
    """The per-chunk MXU contractions, in the exact column order of
    sweeps.payload_cols / engine._*_from_parts."""
    if table == "phased":
        if has_missing:
            # valid = NOT missing, inverted at the packed-word level:
            # unpack(~miss) == 1 - unpack(miss) per bit, and Mosaic has
            # no i8 vector subi lowering (padding words are filled with
            # all-ones for miss_bits, so padded lanes stay invalid)
            a = _unpack(row_planes[0], interpret)
            va = _unpack(~row_planes[1], interpret)
            b = _unpack(col_planes[0], interpret)
            vb = _unpack(~col_planes[1], interpret)
            return [_dot(a, b), _dot(a, vb), _dot(va, b), _dot(va, vb)]
        (a,) = (_unpack(p, interpret) for p in row_planes)
        (b,) = (_unpack(p, interpret) for p in col_planes)
        return [_dot(a, b)]
    if has_missing:
        ha, oa, va = (_unpack(p, interpret) for p in row_planes)
        hb, ob, vb = (_unpack(p, interpret) for p in col_planes)
        return [_dot(ha, hb), _dot(ha, ob), _dot(oa, hb), _dot(oa, ob),
                _dot(ha, vb), _dot(va, hb), _dot(oa, vb), _dot(va, ob),
                _dot(va, vb)]
    ha, oa = (_unpack(p, interpret) for p in row_planes)
    hb, ob = (_unpack(p, interpret) for p in col_planes)
    return [_dot(ha, hb), _dot(ha, ob), _dot(oa, hb), _dot(oa, ob)]


def _cells_2d(table, has_missing, parts, mi, mj, n_samples):
    """Contingency cells as [BM, BN] (or broadcastable) expressions from
    accumulated parts + metadata blocks. 2D re-derivation of
    ld_kernels.phased_cells / unphased_cells (those index 1-D metadata
    vectors; here rows arrive as [BM, 1] and cols as [1, BN])."""
    if table == "phased":
        if has_missing:
            altalt, alt_val, val_alt, val_val = parts
            altref = alt_val - altalt
            refalt = val_alt - altalt
            refref = val_val - altalt - altref - refalt
        else:
            (altalt,) = parts
            ac_i = mi[:, _C["ac"]:_C["ac"] + 1]
            ac_j = mj[_C["ac"]:_C["ac"] + 1, :]
            altref = ac_i - altalt
            refalt = ac_j - altalt
            refref = 2 * n_samples - (ac_i + ac_j) + altalt
        return refref, refalt, altref, altalt
    if has_missing:
        T11, T12, T21, T22, hv, vh, ov, vo, vv = parts
    else:
        T11, T12, T21, T22 = parts
        hv = mi[:, _C["n_het"]:_C["n_het"] + 1]
        ov = mi[:, _C["n_hom"]:_C["n_hom"] + 1]
        vh = mj[_C["n_het"]:_C["n_het"] + 1, :]
        vo = mj[_C["n_hom"]:_C["n_hom"] + 1, :]
        vv = jnp.int32(n_samples)
    T10 = hv - T11 - T12
    T20 = ov - T21 - T22
    T01 = vh - T11 - T21
    T02 = vo - T12 - T22
    T00 = vv - (T01 + T02 + T10 + T11 + T12 + T20 + T21 + T22)
    return (T00, T01, T02, T10, T11, T12, T20, T21, T22)


def _pair_mask_2d(mi, mj, BM, BN, window, cls):
    """In-kernel candidate mask; mirrors sweeps.tile_mask EXCEPT the
    diagonal upper-triangle rule, which the XLA wrapper applies to the
    returned masks ('&' commutes): the diag flag is traced per tile and
    any SMEM-scalar participation in vector ops crashes Mosaic's v5e
    lowering. Metadata is broadcast to [BM, BN] as int32 BEFORE any
    comparison -- int32 broadcasts and same-shape i1 logic are solid."""
    def col(name):
        c = _C[name]
        return jnp.broadcast_to(mi[:, c:c + 1], (BM, BN))

    def row(name):
        c = _C[name]
        return jnp.broadcast_to(mj[c:c + 1, :], (BM, BN))

    m = (col("valid") > 0) & (row("valid") > 0)
    m &= (col("ac") + row("ac")) > 2
    if window > 0:
        m &= (col("rid") == row("rid")) \
            & (jnp.abs(col("pos") - row("pos")) <= window)
    if cls != "all":
        clean = (col("an") == 0) & (row("an") == 0)
        m &= clean if cls == "clean" else ~clean
    return m


def _make_parts_kernel(table, has_missing, BM, nk, n_row_planes,
                       interpret=False):
    """Parts-only kernel: MXU contractions of the LOCAL word slice,
    no epilogue. Used when the packed word axis is sharded over a mesh
    'samples' axis: the caller psums the returned parts to global
    counts and runs the (pure jnp) mask + prefilter epilogue outside
    the kernel, so the fused VMEM unpack+dot path serves sharded meshes
    too (round 2 dropped to the XLA path there)."""
    P = n_parts(table, has_missing)

    def kernel(*refs):
        import jax.experimental.pallas as pl
        plane_refs, parts_ref = refs[:-1], refs[-1]
        k = pl.program_id(2) if nk > 1 else jnp.int32(0)
        row_planes = [r[:] for r in plane_refs[:n_row_planes]]
        col_planes = [r[:] for r in plane_refs[n_row_planes:]]
        dots = _chunk_parts(table, has_missing, row_planes,
                            col_planes, interpret)

        @pl.when(k == 0)
        def _():
            for p in range(P):
                parts_ref[p] = dots[p]

        @pl.when(k > 0)
        def _():
            for p in range(P):
                parts_ref[p] = parts_ref[p] + dots[p]

    return kernel


def _build_parts_call(table, has_missing, B, W, interpret=False):
    """(planes...) -> parts i32 [P, B, B] pallas call (local words)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = n_parts(table, has_missing)
    nrp = len(plane_keys(table, has_missing))
    n_unpacked = nrp + (1 if (table == "phased" and has_missing) else 0)
    BM, nk, wk, wpad = plan_layout(B, W, n_unpacked, P)
    if BM == 0:
        raise ValueError(f"tile rows {B} not blockable")

    kernel = _make_parts_kernel(table, has_missing, BM, nk, nrp,
                                interpret)
    grid = (B // BM, B // BM, nk)
    row_spec = pl.BlockSpec((BM, wk), lambda gi, gj, k: (gi, k),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((BM, wk), lambda gi, gj, k: (gj, k),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec] * nrp + [col_spec] * nrp,
        out_specs=[pl.BlockSpec((P, BM, BM), lambda gi, gj, k: (0, gi, gj),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((P, B, B), jnp.int32)],
        interpret=interpret,
    )

    def run(*planes):
        padded = []
        for key, pl_arr in zip(
                list(plane_keys(table, has_missing)) * 2, planes):
            if wpad != W:
                fill = (2**32 - 1) if key == "miss_bits" else 0
                pl_arr = jnp.pad(pl_arr, ((0, 0), (0, wpad - W)),
                                 constant_values=np.uint32(fill))
            padded.append(pl_arr)
        (parts,) = call(*padded)
        return parts

    return run


def _make_kernel(table, has_missing, cls, window, n_samples,
                 min_r2, max_r2, BM, nk, n_row_planes, interpret):
    import jax.experimental.pallas as pl

    P = n_parts(table, has_missing)

    def _extrema(meta, sel):
        """(lo, hi) scalars of metadata column `sel` over valid rows,
        in whatever [BM,1] / [1,BM] orientation `meta` slices have."""
        BIG = jnp.int32(2**30)
        v = meta(_C["valid"]) > 0
        x = meta(sel)
        return (jnp.min(jnp.where(v, x, BIG)),
                jnp.max(jnp.where(v, x, -BIG)))

    def block_live(mi, mj):
        """Scalar: can this [BM, BM] block contain an in-window pair?
        Conservative test from per-block (rid, pos) extrema over valid
        rows -- false only when NO same-contig pair within `window` can
        exist, so skipping never changes results. The MXU dots and
        parts writes are elided for dead blocks (their parts are never
        gathered: the mask is zero there)."""
        rowm = lambda c: mi[:, c:c + 1]
        colm = lambda c: mj[c:c + 1, :]
        ri_lo, ri_hi = _extrema(rowm, _C["rid"])
        rj_lo, rj_hi = _extrema(colm, _C["rid"])
        pi_lo, pi_hi = _extrema(rowm, _C["pos"])
        pj_lo, pj_hi = _extrema(colm, _C["pos"])
        any_pair = (ri_hi >= jnp.int32(0)) & (rj_hi >= jnp.int32(0))
        rid_meet = (ri_lo <= rj_hi) & (rj_lo <= ri_hi)
        # the pos gap test is only sound when both blocks sit on one
        # shared contig; multi-contig blocks stay live
        one_rid = (ri_lo == ri_hi) & (rj_lo == rj_hi) & (ri_lo == rj_lo)
        far = (pj_lo - pi_hi > window) | (pi_lo - pj_hi > window)
        return any_pair & rid_meet & jnp.logical_not(one_rid & far)

    def kernel(mi_ref, mj_ref, *refs):
        plane_refs, (mask_ref, parts_ref) = refs[:-2], refs[-2:]
        # size-1 grid dims can be elided by the pipeline; never emit
        # program_id for them
        k = pl.program_id(2) if nk > 1 else jnp.int32(0)

        def body():
            row_planes = [r[:] for r in plane_refs[:n_row_planes]]
            col_planes = [r[:] for r in plane_refs[n_row_planes:]]
            dots = _chunk_parts(table, has_missing, row_planes,
                                col_planes, interpret)

            @pl.when(k == 0)
            def _():
                for p in range(P):
                    parts_ref[p] = dots[p]

            @pl.when(k > 0)
            def _():
                for p in range(P):
                    parts_ref[p] = parts_ref[p] + dots[p]

            @pl.when(k == nk - 1)
            def _():
                parts = [parts_ref[p] for p in range(P)]
                mi = mi_ref[:]
                mj = mj_ref[:]
                m = _pair_mask_2d(mi, mj, BM, BM, window, cls)
                cells = _cells_2d(table, has_missing, parts, mi, mj,
                                  n_samples)
                if table == "phased":
                    pf = K.phased_prefilter_cells(cells, m, min_r2,
                                                  max_r2)
                else:
                    pf = K.unphased_prefilter_cells(cells, m, min_r2,
                                                    max_r2)
                # mask stays int32: selects over 8-bit values need the
                # (32,128) i1 tiling, and Mosaic cannot relayout the
                # (8,128) masks that int32 compares produce into it
                # (Invalid relayout crash observed at BM=256/512)
                mask_ref[:] = jnp.where(pf, jnp.int32(2),
                                        jnp.where(m, jnp.int32(1),
                                                  jnp.int32(0)))

        if window > 0:
            live = block_live(mi_ref[:], mj_ref[:])

            @pl.when((k == nk - 1) & jnp.logical_not(live))
            def _():
                mask_ref[:] = jnp.zeros((BM, BM), jnp.int32)

            pl.when(live)(body)
        else:
            body()

    return kernel


def _build_call(table, has_missing, cls, window, n_samples, min_r2,
                max_r2, B, W, interpret):
    """jit-able (diag, mi, mj, *planes) -> (mask u8 [B,B],
    parts i32 [P,B,B]) pallas call for one static config."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = n_parts(table, has_missing)
    nrp = len(plane_keys(table, has_missing))
    n_unpacked = nrp + (1 if (table == "phased" and has_missing) else 0)
    BM, nk, wk, wpad = plan_layout(B, W, n_unpacked, P)
    if BM == 0:
        raise ValueError(f"tile rows {B} not blockable")

    kernel = _make_kernel(table, has_missing, cls, window, n_samples,
                          min_r2, max_r2, BM, nk, nrp, interpret)

    grid = (B // BM, B // BM, nk)
    row_spec = pl.BlockSpec((BM, wk), lambda gi, gj, k: (gi, k),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((BM, wk), lambda gi, gj, k: (gj, k),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, 8), lambda gi, gj, k: (gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BM), lambda gi, gj, k: (0, gj),
                         memory_space=pltpu.VMEM),
        ] + [row_spec] * nrp + [col_spec] * nrp,
        out_specs=[
            pl.BlockSpec((BM, BM), lambda gi, gj, k: (gi, gj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, BM, BM), lambda gi, gj, k: (0, gi, gj),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, B), jnp.int32),
            jax.ShapeDtypeStruct((P, B, B), jnp.int32),
        ],
        interpret=interpret,
    )

    def run(mi, mj, *planes):
        padded = []
        for key, pl_arr in zip(
                list(plane_keys(table, has_missing)) * 2, planes):
            if wpad != W:
                fill = (2**32 - 1) if key == "miss_bits" else 0
                pl_arr = jnp.pad(pl_arr, ((0, 0), (0, wpad - W)),
                                 constant_values=np.uint32(fill))
            padded.append(pl_arr)
        return call(mi, mj, *padded)

    return run


_CALL_CACHE = {}


def get_call(cfg, W, interpret=False):
    key = (cfg["table"], cfg["has_missing"], cfg["cls"], cfg["window"],
           cfg["n_samples"], cfg["min_r2"], cfg["max_r2"], cfg["B"], W,
           interpret)
    if key not in _CALL_CACHE:
        _CALL_CACHE[key] = _build_call(
            cfg["table"], cfg["has_missing"], cfg["cls"], cfg["window"],
            cfg["n_samples"], cfg["min_r2"], cfg["max_r2"], cfg["B"], W,
            interpret)
    return _CALL_CACHE[key]


def get_parts_call(cfg, W, interpret=False):
    key = ("parts", cfg["table"], cfg["has_missing"], cfg["B"], W,
           interpret)
    if key not in _CALL_CACHE:
        _CALL_CACHE[key] = _build_parts_call(
            cfg["table"], cfg["has_missing"], cfg["B"], W, interpret)
    return _CALL_CACHE[key]


def tile_parts_pallas(dev, i, j, cfg, interpret=False):
    """Raw LOCAL-word contraction parts for one tile via the fused
    VMEM kernel, as a tuple matching ld_kernels.*_parts_tile order.
    The caller psums over the sharded word axis and applies the
    mask/prefilter epilogue on the global counts (sweeps.tile_prefilter
    psum path)."""
    keys = plane_keys(cfg["table"], cfg["has_missing"])
    W = dev[keys[0]].shape[-1]
    call = get_parts_call(cfg, W, interpret)
    planes = [dev[k][i] for k in keys] + [dev[k][j] for k in keys]
    parts = call(*planes)
    return tuple(parts[p] for p in range(parts.shape[0]))


def tile_prefilter_pallas(dev, i, j, diag, cfg, interpret=False):
    """Drop-in for sweeps.tile_prefilter on the pallas backend:
    (prefilter_mask, candidate_mask, parts tuple) for one tile."""
    keys = plane_keys(cfg["table"], cfg["has_missing"])
    W = dev[keys[0]].shape[-1]
    call = get_call(cfg, W, interpret)

    mcols = []
    for name in META_COLS:
        if name in dev:
            mcols.append(dev[name][i].astype(jnp.int32))
        else:
            mcols.append(jnp.zeros(cfg["B"], jnp.int32))
    mi = jnp.stack(mcols, axis=1)                        # [B, 8ish]
    mi = jnp.pad(mi, ((0, 0), (0, 8 - mi.shape[1])))
    mcols = []
    for name in META_COLS:
        if name in dev:
            mcols.append(dev[name][j].astype(jnp.int32))
        else:
            mcols.append(jnp.zeros(cfg["B"], jnp.int32))
    mj = jnp.stack(mcols, axis=0)                        # [8ish, B]
    mj = jnp.pad(mj, ((0, 8 - mj.shape[0]), (0, 0)))

    planes = [dev[k][i] for k in keys] + [dev[k][j] for k in keys]
    mask, parts = call(mi, mj, *planes)
    # the diagonal upper-triangle rule is applied here, outside the
    # kernel ('&' commutes past the prefilter): the traced diag scalar
    # cannot participate in Mosaic vector ops (v5e lowering crash)
    B = cfg["B"]
    ii = jnp.arange(B, dtype=jnp.int32)[:, None]
    jj = jnp.arange(B, dtype=jnp.int32)[None, :]
    tri = jnp.where(jnp.asarray(diag, bool), ii < jj, True)
    m = (mask >= 1) & tri
    pf = (mask >= 2) & tri
    return pf, m, tuple(parts[p] for p in range(parts.shape[0]))
