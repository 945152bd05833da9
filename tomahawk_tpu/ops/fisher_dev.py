"""Batched two-sided Fisher exact test on device (f32 + double-single).

TPU-native replacement for the per-record host Fisher of the record
pipeline (native/twk_native.cpp twk_fisher1, mirroring the tail
semantics of the reference's kt_fisher_exact, reference:
lib/fisher_math.cpp:231-267). The host Fisher runs ~1 us/table on one
core, which caps the record-dense pipeline; here the survivor buffer's
tables are processed as one vectorized device pass.

Scale split: the device computes the scale-free BRACKET = P / q where
q = pmf(observed) -- the sum over included cells k of pmf(k)/q. The
bracket is O(support width) in magnitude, f32-safe for any P; the host
multiplies by q computed exactly in f64 from its log-factorial table,
so P keeps f64 dynamic range (P = 1e-300 round-trips).

Tail semantics replicated from twk_fisher1 / kt_fisher_exact:
each side scans outward from the observed cell, skipping cells with
pmf >= lo = 0.99999999*q, includes the stopping cell iff its
pmf < hi = 1.00000001*q, then accumulates the strictly-below cells
until a term falls under 1e-18 of the side's running sum. The
skipped stretch is located by BINARY SEARCH on the monotone flank
beyond the distribution mode instead of walking it cell by cell.

Precision: include/exclude decisions ride log-pmf DIFFERENCES
against the observed cell, computed in double-single arithmetic from
a (hi, lo) f32 split of the f64 log-factorial table -- the shared
constant part cancels exactly, leaving ~1e-9 absolute error. The
reference's 1e-8 tie band is therefore decided correctly except
within a +-6e-9 guard band, where the lane is flagged UNCERTAIN
(bracket < 0) and the host recomputes that record with the exact
native kernel. Tail terms accumulate as f32 ratio chains with
compensated summation: ~1e-6 relative error on the bracket, i.e.
<= 1e-6 absolute on P -- 10x inside the 1e-5 golden tolerance
(TWK_ALLOWED_ROUNDING_ERROR, reference: lib/ld/ld_engine.h:37).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# ln(0.99999999), ln(1.00000001): the reference's tie band around q
LOG_LO = np.float32(-1.0000000082740371e-08)
LOG_HI = np.float32(9.999999917e-09)
# double-single log-pmf differences carry ~1e-9 absolute error; flag
# lanes whose boundary decisions sit within this band of a threshold
GUARD = np.float32(6e-9)


def log_factorial_table(nmax: int) -> np.ndarray:
    """f64 lgamma(k+1) for k in [0, nmax]."""
    from math import lgamma
    out = np.empty(nmax + 1, np.float64)
    for k in range(nmax + 1):
        out[k] = lgamma(k + 1.0)
    return out


def split_ds(v64: np.ndarray):
    """f64 -> (hi, lo) f32 double-single split."""
    hi = v64.astype(np.float32)
    lo = (v64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _ds_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def _ds_neg(h, l):
    return -h, -l


def _gather4_ds(lfh, lfl, i1, i2, i3, i4):
    """ds sum lf[i1]+lf[i2]+lf[i3]+lf[i4] (indices clamped)."""
    L = lfh.shape[0]
    h, l = None, None
    for i in (i1, i2, i3, i4):
        ic = jnp.clip(i, 0, L - 1)
        gh, gl = lfh[ic], lfl[ic]
        if h is None:
            h, l = gh, gl
        else:
            h, l = _ds_add(h, l, gh, gl)
    return h, l


def fisher_bracket(rr, ra, ar, aa, lfh, lfl, max_iter: int = 0):
    """Vectorized bracket = P/q for 2x2 tables
    (REFREF, REFALT, ALTREF, ALTALT) int32 [K].

    Returns f32 [K]: the bracket; exactly -1.0 marks an UNCERTAIN lane
    (tie-band boundary the ds arithmetic cannot resolve -- the host
    must recompute that table with the exact f64 kernel); trivial
    lanes (empty support) return 1.0 and the host overrides P = 1.
    """
    a = rr.astype(jnp.int32)
    n1 = a + ra
    m1 = a + ar
    n = n1 + ar + aa
    n2 = n - n1
    kmin = jnp.maximum(0, m1 - n2)
    kmax = jnp.minimum(n1, m1)
    trivial = (n <= 0) | (kmax <= kmin)

    # observed-cell ds log-pmf part (the k-dependent 4 gathers; the
    # constant part cancels in every difference)
    nn2m1 = n2 - m1
    oh, ol = _gather4_ds(lfh, lfl, a, n1 - a, m1 - a, nn2m1 + a)

    def diff_ds(k):
        """ds (log pmf(k) - log pmf(a)) = obs-part - k-part."""
        kh, kl = _gather4_ds(lfh, lfl, k, n1 - k, m1 - k, nn2m1 + k)
        return _ds_add(oh, ol, *_ds_neg(kh, kl))

    def diff_f32(k):
        h, l = diff_ds(k)
        return h + l

    # distribution mode: f32 product is exact enough to land within
    # +-2 cells; refine by argmax over a 5-cell neighbourhood so the
    # flanks beyond `km` are truly monotone
    km0 = jnp.floor((n1.astype(jnp.float32) + 1.0)
                    * (m1.astype(jnp.float32) + 1.0)
                    / (n.astype(jnp.float32) + 2.0)).astype(jnp.int32)
    km0 = jnp.clip(km0, kmin, kmax)
    km, best = km0, None
    for dlt in (-2, -1, 0, 1, 2):
        kc = jnp.clip(km0 + dlt, kmin, kmax)
        v = diff_f32(kc)
        if best is None:
            km, best = kc, v
        else:
            take = v > best
            km = jnp.where(take, kc, km)
            best = jnp.where(take, v, best)

    K = a.shape[0]
    uncertain = jnp.zeros(K, bool)
    acc_total = jnp.zeros(K, jnp.float32)
    if max_iter <= 0:
        max_iter = 1 << 22   # hard backstop; real stop is the cutoff

    for side in (1, -1):
        if side > 0:
            start = jnp.maximum(a, km)
            end = kmax
        else:
            start = jnp.minimum(a, km)
            end = kmin
        M = (end - start) * side                     # >= 0

        # binary search: largest m in [0, M] with
        # diff(start + side*m) >= LOG_LO (pred(0) holds: the start is
        # the observed cell or the mode, both >= q >= lo*q)
        lo_m = jnp.zeros(K, jnp.int32)
        hi_m = M
        # M <= table support <= len(lf): fixed step count covers it
        n_steps = max(1, int(np.ceil(np.log2(lfh.shape[0] + 2))))

        def bs_step(c, _):
            lo_m, hi_m = c
            mid = (lo_m + hi_m + 1) // 2
            ok = diff_f32(start + side * mid) >= LOG_LO
            return (jnp.where(ok, mid, lo_m),
                    jnp.where(ok, hi_m, mid - 1)), None

        (lo_m, hi_m), _ = jax.lax.scan(bs_step, (lo_m, hi_m), None,
                                       length=n_steps)
        kB = start + side * lo_m
        dB = diff_f32(kB)
        include_B = dB < LOG_HI
        nxt = kB + side
        in_rng = (nxt * side) <= (end * side)
        d_nxt = diff_f32(jnp.clip(nxt, kmin, kmax))
        uncertain |= (jnp.abs(dB - LOG_LO) < GUARD) \
            | (jnp.abs(dB - LOG_HI) < GUARD) \
            | (in_rng & (jnp.abs(d_nxt - LOG_LO) < GUARD))

        tB = jnp.where(include_B, jnp.exp(jnp.minimum(dB, 1.0)),
                       jnp.float32(0.0))

        # strict tail: terms beyond kB, all pmf < lo*q on a monotone
        # flank; f32 ratio chain with compensated (Kahan) accumulation
        pp0 = jnp.where(in_rng & ~trivial,
                        jnp.exp(jnp.minimum(d_nxt, 1.0)),
                        jnp.float32(0.0))
        n1f = n1.astype(jnp.float32)
        m1f = m1.astype(jnp.float32)
        nm = nn2m1.astype(jnp.float32)

        def ratio(kf):
            """pmf(k+side)/pmf(k) in f32 (k = current cell)."""
            if side > 0:
                num = (n1f - kf) * (m1f - kf)
                den = (kf + 1.0) * (nm + kf + 1.0)
            else:
                num = kf * (nm + kf)
                den = (n1f - kf + 1.0) * (m1f - kf + 1.0)
            return num / jnp.where(den != 0, den, 1.0)

        def cond(st):
            k, pp, acc, comp, active, it = st
            return jnp.any(active) & (it < max_iter)

        def body(st):
            k, pp, acc, comp, active, it = st
            kf = k.astype(jnp.float32)
            cont = active & (pp > 0) \
                & (pp > (acc + comp) * jnp.float32(1e-18)) \
                & ((k * side) <= (end * side))
            # Kahan add of pp for continuing lanes
            y = jnp.where(cont, pp, 0.0) - comp
            t = acc + y
            comp = (t - acc) - y
            acc = t
            pp = pp * ratio(kf)
            k = jnp.where(cont, k + side, k)
            return k, pp, acc, comp, cont, it + 1

        # the Kahan accumulator is SEEDED with the boundary term, so
        # acc covers both it and the strict tail (when kB == end the
        # loop never runs and acc == tB)
        st = (nxt, pp0, tB, jnp.zeros(K, jnp.float32),
              in_rng & ~trivial & (pp0 > 0), jnp.int32(0))
        _, _, acc, _, _, _ = jax.lax.while_loop(cond, body, st)
        acc_total = acc_total + acc

    bracket = acc_total
    out = jnp.where(trivial, jnp.float32(1.0),
                    jnp.where(uncertain, jnp.float32(-1.0), bracket))
    # f32 log q for callers that bound P's magnitude on device (the
    # bf16 bracket packing, sweeps.append_fisher_col): the constant
    # lbinom parts that cancel in diffs reassembled once per lane
    L = lfh.shape[0]

    def lf_ds(i):
        ic = jnp.clip(i, 0, L - 1)
        return lfh[ic], lfl[ic]

    ch, cl = lf_ds(n1)
    for i in (n2, m1, n - m1):
        ch, cl = _ds_add(ch, cl, *lf_ds(i))
    nh, nl = lf_ds(n)
    ch, cl = _ds_add(ch, cl, -nh, -nl)
    logq = (ch + cl) - (oh + ol)
    return out, logq


def host_p_from_bracket(counts: np.ndarray, bracket: np.ndarray,
                        lf: np.ndarray, min_p: float = 1.0):
    """Combine the device bracket with the exact f64 q on host:
    P = min(q * bracket, 1). counts: [K, 4] int64
    (REFREF, REFALT, ALTREF, ALTALT). Returns f64 [K] with NaN for
    rows the native kernel must recompute (uncertain lanes, boundary
    cases near a configured min_p threshold)."""
    a = counts[:, 0]
    n1 = a + counts[:, 1]
    m1 = a + counts[:, 2]
    n = n1 + counts[:, 2] + counts[:, 3]
    n2 = n - n1
    kmin = np.maximum(0, m1 - n2)
    kmax = np.minimum(n1, m1)
    trivial = (n <= 0) | (kmax <= kmin)
    with np.errstate(over="ignore", invalid="ignore"):
        logq = (lf[n1] - lf[a] - lf[n1 - a]) \
            + (lf[n2] - lf[m1 - a] - lf[n2 - m1 + a]) \
            - (lf[n] - lf[m1] - lf[n - m1])
        br = bracket.astype(np.float64)
        P = np.minimum(np.exp(logq) * br, 1.0)
    P = np.where(trivial, 1.0, P)
    P = np.where((br < 0) | ~np.isfinite(P), np.nan, P)
    if min_p < 1.0:
        # the keep decision P <= min_p must match the exact kernel at
        # the threshold; hand boundary rows to the native recompute
        P = np.where(np.abs(P - min_p) < 1e-7, np.nan, P)
    return P
