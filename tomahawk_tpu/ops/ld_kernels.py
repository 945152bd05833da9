"""Device contingency-count kernels (JAX / XLA; MXU matmul formulation).

TPU-native replacement for the reference's per-pair SSE popcount kernels
(reference: lib/ld/ld_engine.cpp:84-1160): a whole tile of variant pairs
is computed at once by expanding bitpacked planes to one-hot int8 and
contracting the sample axis on the MXU with int8 x int8 -> int32 matmuls.

Phased (2N haplotype axis):
  ALTALT[i,j]   = alt_i . alt_j
  no-missing    : derive REFALT/ALTREF/REFREF from per-variant allele
                  counts exactly as the reference does
                  (ld_engine.cpp:683-685)
  with missing  : 4 matmuls (alt.alt, alt.valid, valid.alt, valid.valid)

Unphased (N sample axis, 3x3 genotype table): 4 class matmuls
(het/hom x het/hom) plus row/column marginals (2 more matmuls against
the valid plane when missing data is present; closed-form otherwise).

An optional on-device prefilter computes r2 in f32 with a conservative
margin and compacts surviving pair indices + integer counts, so only
survivors cross back to the host where exact f64 statistics are redone.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def unpack_bits(x: jnp.ndarray) -> jnp.ndarray:
    """[..., W] uint32 -> [..., W*32] int8 of 0/1 (little-endian bits).

    Bitcast to uint8 first so the intermediate is [..., W, 4, 8] uint8
    (same bytes as the output) rather than a 16x larger uint32 tensor --
    the unpack runs per tile inside the sweep scan, so its HBM footprint
    matters more than its op count."""
    b8 = jax.lax.bitcast_convert_type(x, jnp.uint8)       # [..., W, 4]
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (b8[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*x.shape[:-1], x.shape[-1] * 32).astype(jnp.int8)


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[I, L] x [J, L] -> [I, J] int32 contraction over the lane axis."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


def phased_parts_tile(alt_a, miss_a, alt_b, miss_b,
                      has_missing: bool, psum_axis: str = None):
    """Raw MXU contractions for a tile of pairs: (altalt,) without
    missing data, (altalt, alt_val, val_alt, val_val) with. Everything
    downstream is an elementwise expression of these [I, J] int32
    arrays plus replicated per-variant scalars -- crucially the
    [I, J, 4] count tensor is never materialized (at 4096-row tiles it
    would be 268 MB of HBM churn per tile).

    When the haplotype word axis is sharded across a mesh axis, pass
    psum_axis: the partial contractions over the local word slice are
    psum-reduced to exact global counts. Requires the miss plane to
    carry 1s on padding bits (bitpack._pack_bits pad_value=1) so the
    derived valid plane is zero there with no positional masking.
    """
    a = unpack_bits(alt_a)
    b = unpack_bits(alt_b)
    if has_missing:
        va = (1 - unpack_bits(miss_a)).astype(jnp.int8)
        vb = (1 - unpack_bits(miss_b)).astype(jnp.int8)
        parts = jnp.stack([_dot(a, b), _dot(a, vb),
                           _dot(va, b), _dot(va, vb)])
        if psum_axis is not None:
            parts = jax.lax.psum(parts, axis_name=psum_axis)
        return tuple(parts)
    altalt = _dot(a, b)
    if psum_axis is not None:
        altalt = jax.lax.psum(altalt, axis_name=psum_axis)
    return (altalt,)


def phased_cells(parts, ac_a, ac_b, n_samples: int):
    """(REFREF, REFALT, ALTREF, ALTALT) [I, J] expressions from raw
    parts. The no-missing derivation from allele counts is the
    reference's trick for skipping 3 of 4 popcount passes
    (reference: ld_engine.cpp:683-685)."""
    if len(parts) == 4:
        altalt, alt_val, val_alt, val_val = parts
        altref = alt_val - altalt
        refalt = val_alt - altalt
        refref = val_val - altalt - altref - refalt
    else:
        (altalt,) = parts
        altref = ac_a[:, None] - altalt
        refalt = ac_b[None, :] - altalt
        refref = 2 * n_samples - (ac_a[:, None] + ac_b[None, :]) + altalt
    return refref, refalt, altref, altalt


def phased_counts_tile(alt_a, miss_a, alt_b, miss_b, ac_a, ac_b,
                       n_samples: int, has_missing: bool,
                       psum_axis: str = None):
    """Stacked [I, J, 4] int32 (REFREF, REFALT, ALTREF, ALTALT) -- the
    materialized form, for small tiles and tests."""
    parts = phased_parts_tile(alt_a, miss_a, alt_b, miss_b, has_missing,
                              psum_axis)
    return jnp.stack(phased_cells(parts, ac_a, ac_b, n_samples), axis=-1)


def unphased_parts_tile(het_a, hom_a, valid_a, het_b, hom_b, valid_b,
                        has_missing: bool, psum_axis: str = None):
    """Raw MXU contractions for the unphased 3x3 table: 4 class-plane
    dots without missing data, plus 5 marginal dots against the valid
    plane with. psum_axis: see phased_parts_tile."""
    ha = unpack_bits(het_a)
    oa = unpack_bits(hom_a)
    hb = unpack_bits(het_b)
    ob = unpack_bits(hom_b)
    dots = [_dot(ha, hb), _dot(ha, ob), _dot(oa, hb), _dot(oa, ob)]
    if has_missing:
        va = unpack_bits(valid_a)
        vb = unpack_bits(valid_b)
        dots += [_dot(ha, vb), _dot(va, hb), _dot(oa, vb), _dot(va, ob),
                 _dot(va, vb)]
    parts = jnp.stack(dots)
    if psum_axis is not None:
        parts = jax.lax.psum(parts, axis_name=psum_axis)
    return tuple(parts)


def unphased_cells(parts, n_het_a, n_hom_a, n_het_b, n_hom_b,
                   n_samples: int):
    """The 9 table cells T00..T22 as [I, J] expressions (row = A
    genotype 0/1/2 alt alleles, col = B), counting fully-called sample
    pairs only."""
    if len(parts) == 9:
        T11, T12, T21, T22, hv, vh, ov, vo, vv = parts
    else:
        T11, T12, T21, T22 = parts
        hv = n_het_a[:, None]
        vh = n_het_b[None, :]
        ov = n_hom_a[:, None]
        vo = n_hom_b[None, :]
        vv = jnp.int32(n_samples)
    T10 = hv - T11 - T12
    T20 = ov - T21 - T22
    T01 = vh - T11 - T21
    T02 = vo - T12 - T22
    T00 = vv - (T01 + T02 + T10 + T11 + T12 + T20 + T21 + T22)
    return (T00, T01, T02, T10, T11, T12, T20, T21, T22)


def unphased_counts_tile(het_a, hom_a, valid_a, het_b, hom_b, valid_b,
                         n_het_a, n_hom_a, n_het_b, n_hom_b,
                         n_samples: int, has_missing: bool,
                         psum_axis: str = None):
    """Stacked [I, J, 3, 3] int32 table -- the materialized form, for
    small tiles and tests."""
    parts = unphased_parts_tile(het_a, hom_a, valid_a, het_b, hom_b,
                                valid_b, has_missing, psum_axis)
    cells = unphased_cells(parts, n_het_a, n_hom_a, n_het_b, n_hom_b,
                           n_samples)
    cells = [jnp.broadcast_to(c, cells[4].shape) for c in cells]
    rows = [jnp.stack(cells[0:3], axis=-1),
            jnp.stack(cells[3:6], axis=-1),
            jnp.stack(cells[6:9], axis=-1)]
    return jnp.stack(rows, axis=-2)


def pair_mask_tile(valid_a, valid_b, ac_a, ac_b, rid_a, rid_b, pos_a, pos_b,
                   diagonal: bool, window: int = 0):
    """Which pairs of the tile must be evaluated: both rows real, the
    reference's ac skip rule (ac_i + ac_j > 2, ld_engine.cpp:1910-1912),
    upper triangle for diagonal tiles, and the optional distance window
    (same contig, |posB - posA| <= window)."""
    m = valid_a[:, None] & valid_b[None, :]
    m &= (ac_a[:, None] + ac_b[None, :]) > 2
    if diagonal:
        i = jnp.arange(valid_a.shape[0])[:, None]
        j = jnp.arange(valid_b.shape[0])[None, :]
        m &= i < j
    if window > 0:
        same = rid_a[:, None] == rid_b[None, :]
        # positions are < 2^30 so int32 differences cannot overflow
        dist = jnp.abs(pos_a[:, None] - pos_b[None, :])
        m &= same & (dist <= window)
    return m


def phased_r2_cells(refref, refalt, altref, altalt):
    """Approximate r2 (f32) from 2x2 cell expressions, for on-device
    prefiltering; the host redoes the math exactly in f64 on
    survivors."""
    refref = refref.astype(jnp.float32)
    refalt = refalt.astype(jnp.float32)
    altref = altref.astype(jnp.float32)
    altalt = altalt.astype(jnp.float32)
    t = refref + refalt + altref + altalt
    ts = jnp.where(t > 0, t, 1.0)
    D = (refref * altalt - altref * refalt) / (ts * ts)
    g0 = (refref + refalt) / ts
    g1 = (altref + altalt) / ts
    h0 = (refref + altref) / ts
    h1 = (refalt + altalt) / ts
    denom = g0 * g1 * h0 * h1
    return jnp.where(denom > 0, D * D / jnp.where(denom > 0, denom, 1.0),
                     jnp.float32(np.inf))


def phased_r2_f32(counts):
    return phased_r2_cells(counts[..., 0], counts[..., 1],
                           counts[..., 2], counts[..., 3])


def dprime_prefilter_cells(cells, min_dprime: float, max_dprime: float):
    """In-sweep D' range filter (f32) for non-default D' bounds: the
    same normalized-by-t**2 trick as the r2 test (D and Dmax share the
    t**2 factor, so D' = d_num / dmax_num needs no marginal
    normalization). Pairs whose f32 d_num is cancellation-dominated
    (|rr*aa - ar*ra| within 8 ulps of the product magnitudes) are
    passed through untouched -- their f32 D' sign/magnitude is not
    trustworthy, and the host recomputes survivors exactly in f64
    anyway, so the device decision only has to be a superset
    (reference thresholds: lib/ld/ld_engine.cpp:1231-1238)."""
    refref, refalt, altref, altalt = cells
    rr = refref.astype(jnp.float32)
    ra = refalt.astype(jnp.float32)
    ar = altref.astype(jnp.float32)
    aa = altalt.astype(jnp.float32)
    p1, p2 = rr * aa, ar * ra
    d_num = p1 - p2
    # marginal products in t**2 units: dmax = D>=0 ? min(g0*h1, h0*g1)
    #                                          : -min(g0*g1, h0*h1)
    g0, g1 = rr + ra, ar + aa
    h0, h1 = rr + ar, ra + aa
    dmax_num = jnp.where(d_num >= 0,
                         jnp.minimum(g0 * h1, h0 * g1),
                         -jnp.minimum(g0 * g1, h0 * h1))
    dprime = jnp.where(dmax_num != 0,
                       d_num / jnp.where(dmax_num != 0, dmax_num, 1.0),
                       0.0)
    lo = jnp.float32(min_dprime) - 1e-3
    hi = jnp.float32(max_dprime) + 1e-3
    trusted = jnp.abs(d_num) > 8.0 * jnp.float32(1.2e-7) * (p1 + p2)
    ok = (dprime >= lo) & (dprime <= hi)
    return ok | ~trusted


def phased_prefilter_cells(cells, pair_mask, min_r2: float,
                           max_r2: float, min_dprime: float = 0.0,
                           max_dprime: float = 100.0):
    """Conservative device filter mirroring PhasedMath's integer guards
    and the r2 range with an f32 safety margin. Takes the four cell
    expressions so no [I, J, 4] tensor is ever materialized.

    The r2 test is evaluated in multiplicative form: with integer cell
    counts, r2 = (rr*aa - ar*ra)^2 / ((rr+ra)(ar+aa)(rr+ar)(ra+aa))
    exactly (the total-count factors cancel), so `D2 >= lo * denom`
    needs no division and no normalization -- division is the expensive
    part of the VPU epilogue at 4096^2 elements per tile. f32 rounding
    of the products is covered by the range margins; the host recomputes
    exactly in f64."""
    refref, refalt, altref, altalt = cells
    t = refref + refalt + altref + altalt
    m = pair_mask & (t >= 5)
    guard = jnp.where(refref < altalt,
                      refalt + altref + refref,
                      altalt + refalt + altref)
    m &= guard >= 5
    rr = refref.astype(jnp.float32)
    ra = refalt.astype(jnp.float32)
    ar = altref.astype(jnp.float32)
    aa = altalt.astype(jnp.float32)
    d_num = rr * aa - ar * ra
    d2 = d_num * d_num
    denom = (rr + ra) * (ar + aa) * (rr + ar) * (ra + aa)
    lo = jnp.float32(max(min_r2 * 0.999 - 1e-6, 0.0))
    hi = jnp.float32(max_r2) * 1.001 + 1e-6
    if min_r2 * 0.999 - 1e-6 > 0:
        # any pair with exact-integer D = 0 has true r2 ~ 0 < min_r2
        # (the host's f64 D is rounding noise ~1e-19 there, so this is
        # safe only when a positive r2 floor exists). It also excludes
        # zero-marginal tables (denom = 0 implies d_num = 0), which the
        # division form excluded via r2 = inf.
        m &= d_num != 0
    m &= (d2 >= lo * denom) & (d2 <= hi * denom)
    if (min_dprime, max_dprime) != (0.0, 100.0):
        # in-sweep D' filtering: only pairs inside the (guarded) D'
        # range survive to the host when a D' filter is configured
        m &= dprime_prefilter_cells(cells, min_dprime, max_dprime)
    return m


def phased_prefilter_mask(counts, pair_mask, min_r2: float, max_r2: float):
    return phased_prefilter_cells(
        (counts[..., 0], counts[..., 1], counts[..., 2], counts[..., 3]),
        pair_mask, min_r2, max_r2)


def compact_tile(mask, payload_flat, cap: int):
    """Compact surviving flat indices + payload rows to a fixed-capacity
    buffer. Returns (n_pass, idx[cap] int32, payload[cap, ...])."""
    flat = mask.ravel()
    n_pass = flat.sum(dtype=jnp.int32)
    idx = jnp.nonzero(flat, size=cap, fill_value=flat.shape[0])[0]
    safe = jnp.minimum(idx, flat.shape[0] - 1)
    rows = payload_flat[safe]
    # zero out slots beyond n_pass so padding is inert
    live = (jnp.arange(cap) < n_pass)[:, None]
    rows = jnp.where(live, rows, 0)
    idx = jnp.where(live[:, 0], idx, -1)
    return n_pass, idx.astype(jnp.int32), rows


def compact_indices(mask, cap: int):
    """Flat indices of the first `cap` set bits of a 2D `mask`,
    gather-only and two-level (scatter-free, so it is fast on TPU where
    jnp.nonzero's scatter path is not): a row-wise cumsum + row-total
    search locates each survivor's row, then a vectorized binary search
    over that row's cumsum finds its column -- O(rows + cap log cols)
    instead of a cumsum and search over the full rows*cols flat array.
    Slots k >= n_pass hold out-of-range garbage; callers must treat only
    the first n_pass rows as live."""
    if mask.ndim == 1:
        mask = mask[None, :]
    I, J = mask.shape
    rowc = jnp.cumsum(mask.astype(jnp.int32), axis=-1)     # [I, J]
    roff = jnp.cumsum(rowc[:, -1])                          # [I] inclusive
    n_pass = roff[-1]
    ri, kk = _rank_locate(roff, I, cap)
    lo = _bsearch_cols(lambda mid: rowc[ri, mid], kk, J, cap)
    idx = ri * J + lo
    return n_pass, idx.astype(jnp.int32)


def _rank_locate(roff, I: int, cap: int):
    """Map survivor ranks 1..cap to (row index, rank within row) via
    the inclusive per-row survivor-count cumsum `roff`."""
    ks = jnp.arange(1, cap + 1, dtype=jnp.int32)
    ri = jnp.minimum(jnp.searchsorted(roff, ks, side="left"),
                     I - 1).astype(jnp.int32)
    base = jnp.where(ri > 0, roff[jnp.maximum(ri - 1, 0)], 0)
    return ri, ks - base


def _bsearch_cols(val_at, kk, J: int, cap: int):
    """Per-rank binary search for the column whose row-cumsum (looked
    up through `val_at(mid)`, [cap]-shaped) first reaches the rank."""
    lo = jnp.zeros(cap, jnp.int32)
    hi = jnp.full(cap, J, jnp.int32)

    def step(c, _):
        lo, hi = c
        mid = (lo + hi) // 2
        right = val_at(jnp.minimum(mid, J - 1)) < kk
        return (jnp.where(right, mid + 1, lo),
                jnp.where(right, hi, mid)), None

    n_steps = max(1, int(np.ceil(np.log2(J + 1))))
    (lo, _), _ = jax.lax.scan(step, (lo, hi), None, length=n_steps)
    return lo


def compact_indices_small(mask, cap: int):
    """compact_indices for small caps: instead of cumsumming the whole
    [I, J] mask (a log2(J)-pass, ~1.6 GB-traffic operation at 4096^2),
    compute row sums in one pass, locate each survivor's row, and
    cumsum only the <= cap gathered rows. Same contract as
    compact_indices."""
    if mask.ndim == 1:
        mask = mask[None, :]
    I, J = mask.shape
    rc = mask.sum(axis=-1, dtype=jnp.int32)                 # [I]
    roff = jnp.cumsum(rc)                                   # inclusive
    n_pass = roff[-1]
    ri, kk = _rank_locate(roff, I, cap)
    rowc = jnp.cumsum(mask[ri].astype(jnp.int32), axis=-1)  # [cap, J]
    rng = jnp.arange(cap)
    lo = _bsearch_cols(lambda mid: rowc[rng, mid], kk, J, cap)
    idx = ri * J + lo
    return n_pass, idx.astype(jnp.int32)


def unphased_prefilter_cells(cells, pair_mask, min_r2: float,
                             max_r2: float, min_dprime: float = 0.0,
                             max_dprime: float = 100.0):
    """Conservative device prefilter for the unphased path: an f32
    re-derivation of the reference's cubic-EM estimator
    (reference: ld_engine.cpp:1312-1740) that passes a pair when ANY
    biologically-plausible root yields r2 inside the (widened) range.
    The host recomputes the exact f64 root choice + all filters on
    survivors, so this only needs to be a superset of the keep set.

    cells: the 9 T00..T22 expressions from unphased_cells.
    """
    T00, T01, T02, T10, T11, T12, T20, T21, T22 = (
        c.astype(jnp.float32) for c in cells)
    n = T00 + T01 + T02 + T10 + T11 + T12 + T20 + T21 + T22
    m = pair_mask & (n >= 5)          # MINIMUM_ALLOWED_ALLELES gate
    ns = jnp.maximum(n, 1.0)
    p = (2 * (T00 + T01 + T02) + (T10 + T11 + T12)) / (2 * ns)
    q = (2 * (T00 + T10 + T20) + (T01 + T11 + T21)) / (2 * ns)
    n11 = 2 * T00 + T01 + T10
    ndh = T11

    lo = jnp.float32(min_r2) * 0.98 - 1e-4
    hi = jnp.float32(max_r2) * 1.02 + 1e-4

    # ---- fold case (no double hets): exact phased table ----
    refref = 2 * T00 + T01 + T10
    refalt = 2 * T02 + T01 + T12
    altref = 2 * T20 + T10 + T21
    altalt = 2 * T22 + T21 + T12
    r2_fold = phased_r2_cells(refref, refalt, altref, altalt)
    t = refref + refalt + altref + altalt
    fold_ok = (t >= 5) & (r2_fold >= lo) & (r2_fold <= hi)
    if (min_dprime, max_dprime) != (0.0, 100.0):
        # the fold case has an exact phased table, so the in-sweep D'
        # filter applies; the EM case stays a pass-through superset
        # (D' varies with the root choice, which the host makes)
        fold_ok &= dprime_prefilter_cells(
            (refref, refalt, altref, altalt), min_dprime, max_dprime)

    # ---- EM case: exact r2 range over the plausible f11 interval ----
    # D(f11) = f11*f22 - f12*f21 collapses to f11 - p*q (linear!), so
    # r2(f11) = (f11 - pq)^2 / denom is a parabola whose exact min/max
    # over the biologically-plausible interval [minhap, maxhap] come
    # from the endpoints (min 0 when pq lies inside). Whatever cubic
    # root the host's f64 EM selects lies in this interval, so passing
    # when [r2_min, r2_max] intersects [lo, hi] is a true superset --
    # unlike solving the cubic in f32, whose discriminant/cancellation
    # error near degenerate cases dropped real survivors.
    minhap = n11 / (2.0 * ns)
    maxhap = (n11 + ndh) / (2.0 * ns)
    tol = 1e-4                        # widened vs the host's 1e-5
    pq = p * q
    lo_h = minhap - tol
    hi_h = maxhap + tol
    dmin = jnp.maximum(jnp.maximum(lo_h - pq, pq - hi_h), 0.0)
    dmax = jnp.maximum(hi_h - pq, pq - lo_h)
    denom = p * (1 - p) * q * (1 - q)
    pos = denom > 0
    denom_s = jnp.where(pos, denom, 1.0)
    r2_min = jnp.where(pos, dmin * dmin / denom_s, jnp.float32(np.inf))
    r2_max = jnp.where(pos, dmax * dmax / denom_s, jnp.float32(np.inf))
    em_ok = (r2_min <= hi) & (r2_max >= lo)

    # boolean logic, not where-over-bools: a select producing i1 hits
    # Mosaic's "unsupported target bitwidth for truncation" in-kernel
    no_dh = ndh == 0
    return m & ((no_dh & fold_ok) | (~no_dh & em_ok))


def unphased_prefilter_mask(T, pair_mask, min_r2: float, max_r2: float):
    """Stacked-table wrapper over unphased_prefilter_cells."""
    cells = (T[..., 0, 0], T[..., 0, 1], T[..., 0, 2],
             T[..., 1, 0], T[..., 1, 1], T[..., 1, 2],
             T[..., 2, 0], T[..., 2, 1], T[..., 2, 2])
    return unphased_prefilter_cells(cells, pair_mask, min_r2, max_r2)
