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
    """[..., W] uint32 -> [..., W*32] int8 of 0/1 (little-endian bits)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (x[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*x.shape[:-1], x.shape[-1] * 32).astype(jnp.int8)


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[I, L] x [J, L] -> [I, J] int32 contraction over the lane axis."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


def phased_counts_tile(alt_a, miss_a, alt_b, miss_b, ac_a, ac_b,
                       n_samples: int, has_missing: bool,
                       psum_axis: str = None):
    """2x2 haplotype tables for all pairs of two blocks.

    Returns [I, J, 4] int32 in order (REFREF, REFALT, ALTREF, ALTALT).

    When the haplotype word axis is sharded across a mesh axis, pass
    psum_axis: the partial MXU contractions over the local word slice
    are psum-reduced to exact global counts (the per-variant scalars
    ac / n_samples are replicated). Requires the miss plane to carry 1s
    on padding bits (bitpack._pack_bits pad_value=1) so the derived
    valid plane is zero there with no positional masking.
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
        altalt, alt_val, val_alt, val_val = parts
        altref = alt_val - altalt
        refalt = val_alt - altalt
        refref = val_val - altalt - altref - refalt
    else:
        altalt = _dot(a, b)
        if psum_axis is not None:
            altalt = jax.lax.psum(altalt, axis_name=psum_axis)
        altref = ac_a[:, None] - altalt
        refalt = ac_b[None, :] - altalt
        refref = 2 * n_samples - (ac_a[:, None] + ac_b[None, :]) + altalt
    return jnp.stack([refref, refalt, altref, altalt], axis=-1)


def unphased_counts_tile(het_a, hom_a, valid_a, het_b, hom_b, valid_b,
                         n_het_a, n_hom_a, n_het_b, n_hom_b,
                         n_samples: int, has_missing: bool,
                         psum_axis: str = None):
    """3x3 genotype tables for all pairs of two blocks.

    Returns [I, J, 3, 3] int32; axis -2 is the A genotype (0/1/2 alt
    alleles), axis -1 the B genotype. Rows/cols count fully-called
    sample pairs only. psum_axis: see phased_counts_tile.
    """
    ha = unpack_bits(het_a)
    oa = unpack_bits(hom_a)
    hb = unpack_bits(het_b)
    ob = unpack_bits(hom_b)
    if has_missing:
        va = unpack_bits(valid_a)
        vb = unpack_bits(valid_b)
        parts = jnp.stack([
            _dot(ha, hb), _dot(ha, ob), _dot(oa, hb), _dot(oa, ob),
            _dot(ha, vb), _dot(va, hb), _dot(oa, vb), _dot(va, ob),
            _dot(va, vb)])
        if psum_axis is not None:
            parts = jax.lax.psum(parts, axis_name=psum_axis)
        T11, T12, T21, T22, hv, vh, ov, vo, vv = parts
    else:
        parts = jnp.stack([_dot(ha, hb), _dot(ha, ob),
                           _dot(oa, hb), _dot(oa, ob)])
        if psum_axis is not None:
            parts = jax.lax.psum(parts, axis_name=psum_axis)
        T11, T12, T21, T22 = parts
        hv = jnp.broadcast_to(n_het_a[:, None], T11.shape)
        vh = jnp.broadcast_to(n_het_b[None, :], T11.shape)
        ov = jnp.broadcast_to(n_hom_a[:, None], T11.shape)
        vo = jnp.broadcast_to(n_hom_b[None, :], T11.shape)
        vv = jnp.full(T11.shape, n_samples, jnp.int32)
    T10 = hv - T11 - T12
    T20 = ov - T21 - T22
    T01 = vh - T11 - T21
    T02 = vo - T12 - T22
    T00 = vv - (T01 + T02 + T10 + T11 + T12 + T20 + T21 + T22)
    rows = [
        jnp.stack([T00, T01, T02], axis=-1),
        jnp.stack([T10, T11, T12], axis=-1),
        jnp.stack([T20, T21, T22], axis=-1),
    ]
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


def phased_r2_f32(counts):
    """Approximate r2 (f32) for on-device prefiltering; the host redoes
    the math exactly in f64 on survivors."""
    c = counts.astype(jnp.float32)
    refref, refalt, altref, altalt = (c[..., 0], c[..., 1],
                                      c[..., 2], c[..., 3])
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


def phased_prefilter_mask(counts, pair_mask, min_r2: float, max_r2: float):
    """Conservative device filter mirroring PhasedMath's integer guards
    and the r2 range with an f32 safety margin."""
    c = counts
    t = c.sum(axis=-1)
    m = pair_mask & (t >= 5)
    guard = jnp.where(c[..., 0] < c[..., 3],
                      c[..., 1] + c[..., 2] + c[..., 0],
                      c[..., 3] + c[..., 1] + c[..., 2])
    m &= guard >= 5
    r2 = phased_r2_f32(c)
    lo = jnp.float32(min_r2) * 0.999 - 1e-6
    hi = jnp.float32(max_r2) * 1.001 + 1e-6
    return m & (r2 >= lo) & (r2 <= hi)


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
    """Flat indices of the first `cap` set bits of `mask`, gather-only
    (cumsum + vectorized binary search -- scatter-free, so it is fast on
    TPU where jnp.nonzero's scatter path is not). Slots k >= n_pass hold
    out-of-range garbage; callers must treat only the first n_pass rows
    as live."""
    flat = mask.ravel()
    c = jnp.cumsum(flat.astype(jnp.int32))
    n_pass = c[-1]
    ks = jnp.arange(1, cap + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(c, ks, side="left").astype(jnp.int32)
    return n_pass, idx


def unphased_prefilter_mask(T, pair_mask, min_r2: float, max_r2: float):
    """Conservative device prefilter for the unphased path: an f32
    re-derivation of the reference's cubic-EM estimator
    (reference: ld_engine.cpp:1312-1740) that passes a pair when ANY
    biologically-plausible root yields r2 inside the (widened) range.
    The host recomputes the exact f64 root choice + all filters on
    survivors, so this only needs to be a superset of the keep set.

    T: [..., 3, 3] int32 genotype tables (rows: A genotype 0/1/2 alt).
    """
    Tf = T.astype(jnp.float32)
    n = Tf.sum(axis=(-1, -2))
    m = pair_mask & (n >= 5)          # MINIMUM_ALLOWED_ALLELES gate
    ns = jnp.maximum(n, 1.0)
    rowsum = Tf.sum(axis=-1)
    colsum = Tf.sum(axis=-2)
    p = (2 * rowsum[..., 0] + rowsum[..., 1]) / (2 * ns)
    q = (2 * colsum[..., 0] + colsum[..., 1]) / (2 * ns)
    n11 = 2 * Tf[..., 0, 0] + Tf[..., 0, 1] + Tf[..., 1, 0]
    ndh = Tf[..., 1, 1]

    lo = jnp.float32(min_r2) * 0.98 - 1e-4
    hi = jnp.float32(max_r2) * 1.02 + 1e-4

    def r2_of(f11):
        D = f11 * (1.0 - (p + q) + f11) - (p - f11) * (q - f11)
        denom = p * (1 - p) * q * (1 - q)
        return jnp.where(denom > 0, D * D / jnp.where(denom > 0, denom, 1.0),
                         jnp.float32(np.inf))

    # ---- fold case (no double hets): exact phased table ----
    refref = 2 * Tf[..., 0, 0] + Tf[..., 0, 1] + Tf[..., 1, 0]
    refalt = 2 * Tf[..., 0, 2] + Tf[..., 0, 1] + Tf[..., 1, 2]
    altref = 2 * Tf[..., 2, 0] + Tf[..., 1, 0] + Tf[..., 2, 1]
    altalt = 2 * Tf[..., 2, 2] + Tf[..., 2, 1] + Tf[..., 1, 2]
    fold_counts = jnp.stack([refref, refalt, altref, altalt], axis=-1)
    r2_fold = phased_r2_f32(fold_counts)
    t = fold_counts.sum(axis=-1)
    fold_ok = (t >= 5) & (r2_fold >= lo) & (r2_fold <= hi)

    # ---- EM case: all candidate cubic roots, branchless ----
    a = 4.0 * n
    b = 2.0 * n * (1.0 - 2.0 * p - 2.0 * q) - 2.0 * n11 - ndh
    c = (-n11 * (1.0 - 2.0 * p - 2.0 * q) - ndh * (1.0 - p - q)
         + 2.0 * n * p * q)
    dee = -n11 * p * q
    a_s = jnp.where(a != 0, a, 1.0)
    xN = -b / (3.0 * a_s)
    d2 = (b ** 2 - 3.0 * a_s * c) / (9.0 * a_s ** 2)
    yN = a * xN ** 3 + b * xN ** 2 + c * xN + dee
    diff = yN ** 2 - 4.0 * a ** 2 * d2 ** 3

    # three-real-root branch (valid when diff < 0)
    h = jnp.sqrt(jnp.maximum(4.0 * a ** 2 * d2 ** 3, 1e-30))
    theta = jnp.arccos(jnp.clip(-yN / h, -1.0, 1.0)) / 3.0
    delta = jnp.sqrt(jnp.maximum(d2, 0.0))
    r0 = xN + 2.0 * delta * jnp.cos(theta)
    r1 = xN + 2.0 * delta * jnp.cos(2.0 * np.pi / 3.0 + theta)
    r2_ = xN + 2.0 * delta * jnp.cos(4.0 * np.pi / 3.0 + theta)
    # single-real-root branch (valid when diff > 0)
    s = jnp.sqrt(jnp.maximum(diff, 0.0))
    u = (-yN + s) / (2.0 * a_s)
    v = (-yN - s) / (2.0 * a_s)
    r3 = xN + jnp.cbrt(u) + jnp.cbrt(v)

    three = diff < 0
    minhap = n11 / (2.0 * ns)
    maxhap = (n11 + ndh) / (2.0 * ns)
    tol = 1e-4                        # widened vs the host's 1e-5
    em_ok = jnp.zeros_like(m)
    for root, cond in ((r0, three), (r1, three), (r2_, three),
                       (r3, ~three)):
        plausible = cond & (root >= minhap - tol) & (root <= maxhap + tol)
        rr = r2_of(root)
        em_ok |= plausible & (rr >= lo) & (rr <= hi)

    return m & jnp.where(ndh == 0, fold_ok, em_ok)
