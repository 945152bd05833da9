"""Batched two-sided Fisher exact test on device (gather-free).

TPU-native replacement for the per-record host Fisher of the record
pipeline (native/twk_native.cpp twk_fisher1, mirroring the tail
semantics of the reference's kt_fisher_exact, reference:
lib/fisher_math.cpp:231-267). The host Fisher runs ~1 us/table on one
core, which caps the record-dense pipeline; here the survivor buffer's
tables are processed as one vectorized device pass.

Scale split: the device computes the scale-free BRACKET = P / q where
q = pmf(observed) -- the sum over included cells k of pmf(k)/q. The
bracket is O(support width) in magnitude, f32-safe for any P; the
host multiplies by q computed exactly in f64 from its log-factorial
table, so P keeps f64 dynamic range (P = 1e-300 round-trips).

Algorithm = the native kernel's outward walk, vectorized: each side
scans from the OBSERVED cell (where pmf/q == 1 exactly -- no
logarithm, no table lookup, nothing to seed) with the hypergeometric
ratio recurrence, skipping cells with pmf >= lo = 0.99999999*q,
including the stopping cell iff pmf < hi = 1.00000001*q, then
accumulating the strictly-below tail until a term falls under 1e-18
of the side's running sum. TPU gathers of a log-factorial table cost
~10 ns/lane/lookup, so the earlier binary-search design paid ~100
lookups per lane; the walk needs ZERO -- pure VPU arithmetic.

Precision: the skipped stretch traverses the distribution bulk where
pmf/q reaches e^+700, so the chain value rides a double-single f32
mantissa with an explicit power-of-two exponent (frexp
renormalization). Ratios are formed exactly from integer-valued f32
products (Dekker two-product + double-single division), giving
~2^-45 relative drift per step -- after 10^4 steps still ~1e-9,
enough to decide the reference's 1e-8 tie band exactly outside a
flagged guard band. Flagged lanes (and lanes whose support exceeds
the step cap) return bracket < 0 and the host recomputes them with
the exact native kernel. Tail terms accumulate in f32 with
compensated summation: <= ~1e-6 absolute error on P, 10x inside the
1e-5 golden tolerance (TWK_ALLOWED_ROUNDING_ERROR, reference:
lib/ld/ld_engine.h:37).
"""

import jax
import jax.numpy as jnp
import numpy as np

# the reference's tie band around q, expressed on (pmf/q - 1)
BAND = np.float32(1e-8)
# ds-chain drift guard: lanes whose boundary decision lands within
# this of a band edge are handed to the exact host kernel
GUARD = np.float32(1.2e-9)
# bf16 packing gate: log2 bound under which P < 1e-4 is certain
LOG2_P_GATE = np.float32(-13.28)


def log_factorial_table(nmax: int) -> np.ndarray:
    """f64 lgamma(k+1) for k in [0, nmax] (HOST side: the exact q)."""
    from math import lgamma
    out = np.empty(nmax + 1, np.float64)
    for k in range(nmax + 1):
        out[k] = lgamma(k + 1.0)
    return out


# -- double-single f32 primitives (no FMA dependence) -----------------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split(a):
    """Dekker split into 12-bit halves."""
    c = jnp.float32(4097.0) * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    """Exact a*b as a ds pair (Dekker)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _ds_mul(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    hi = p + e
    lo = e - (hi - p)
    return hi, lo


def _ds_div(nh, nl, dh, dl):
    """(nh+nl)/(dh+dl) as ds; self-correcting, so a ~1-ulp hardware
    divide is fine as the first guess."""
    q1 = nh / dh
    # residual = n - q1*d, in ds
    p, e = _two_prod(q1, dh)
    rh, rl = _two_sum(nh, -p)
    rl = rl + nl - e - q1 * dl
    q2 = (rh + rl) / dh
    hi = q1 + q2
    lo = q2 - (hi - q1)
    return hi, lo


def fisher_bracket(rr, ra, ar, aa, live=None, max_steps: int = 1 << 14):
    """Vectorized bracket = P/q for 2x2 tables
    (REFREF, REFALT, ALTREF, ALTALT) int32 [K].

    Returns (bracket f32 [K], log2_pbound f32 [K]):
    - bracket: the tail sum P/q; exactly -1.0 marks an UNCERTAIN lane
      (tie-band boundary inside the drift guard, or the walk exceeded
      max_steps) -- the host must recompute that table exactly;
      trivial lanes (empty support) return 1.0 and the host overrides
      P = 1.
    - log2_pbound: a device-certain upper bound on log2(P) (via
      P = bracket*q <= bracket / max_k pmf(k)/q), for the bf16
      packing gate.

    `live` (bool [K], optional) masks garbage lanes (survivor-buffer
    slots past a tile's count): they are treated as trivial so they
    cannot stretch the shared trip count.
    """
    a = rr.astype(jnp.int32)
    n1 = a + ra
    m1 = a + ar
    n = n1 + ar + aa
    n2 = n - n1
    kmin = jnp.maximum(0, m1 - n2)
    kmax = jnp.minimum(n1, m1)
    trivial = (n <= 0) | (kmax <= kmin)
    if live is not None:
        trivial |= ~live

    K = a.shape[0]
    f32 = jnp.float32
    n1f = n1.astype(f32)
    m1f = m1.astype(f32)
    nm = (n2 - m1).astype(f32)

    acc_total = jnp.zeros(K, f32)
    uncertain = jnp.zeros(K, bool)
    peak_ex = jnp.zeros(K, jnp.int32)     # max exponent of pmf/q seen

    for side in (1, -1):
        end = kmax if side > 0 else kmin

        def ratio_ds(kf):
            """pmf(k+side)/pmf(k) as ds (k = current cell). All
            operands are integer-valued f32 (< 2^24: exact), so the
            two-products are exact and the ds divide is ~2^-45."""
            if side > 0:
                nh, nl = _two_prod(n1f - kf, m1f - kf)
                dh, dl = _two_prod(kf + 1.0, nm + kf + 1.0)
            else:
                nh, nl = _two_prod(kf, nm + kf)
                dh, dl = _two_prod(n1f - kf + 1.0, m1f - kf + 1.0)
            dz = dh == 0
            dh = jnp.where(dz, 1.0, dh)
            h, l = _ds_div(nh, nl, dh, dl)
            return jnp.where(dz, 0.0, h), jnp.where(dz, 0.0, l)

        # chain state: rel = (mh + ml) * 2^ex == pmf(k)/q, with
        # mh in [0.5, 1) after renormalization
        mh = jnp.full(K, f32(0.5))
        ml = jnp.zeros(K, f32)
        ex = jnp.ones(K, jnp.int32)            # rel(a) = 1 exactly
        k = a
        in_skip = ~trivial
        in_tail = jnp.zeros(K, bool)
        pp = jnp.zeros(K, f32)
        acc = jnp.zeros(K, f32)
        comp = jnp.zeros(K, f32)
        unc = jnp.zeros(K, bool)
        pex = jnp.zeros(K, jnp.int32)

        def band_v(mh, ml, ex):
            """(pmf/q - 1) when |pmf/q - 1| is small; +-inf-ish
            otherwise. Exact near 1 via Sterbenz subtraction; the
            frexp wrap (rel ~ 1 => ex 0 with mh -> 1, or ex 1 with
            mh -> 0.5) is handled per case."""
            v0 = (mh - 1.0) + ml                     # ex == 0
            v1 = (2.0 * mh - 1.0) + 2.0 * ml         # ex == 1
            big = jnp.where(ex > 1, f32(1.0), f32(-1.0))
            return jnp.where(ex == 0, v0, jnp.where(ex == 1, v1, big))

        def step(state):
            (k, mh, ml, ex, in_skip, in_tail, pp, acc, comp, unc,
             pex) = state
            kf = k.astype(f32)
            at_end = k == end

            # ---- skip phase: advance the ds chain one cell ----
            rh, rl = ratio_ds(kf)
            nmh, nml = _ds_mul(mh, ml, rh, rl)
            # renormalize mantissa to [0.5, 1)
            nmh_n, e2 = jnp.frexp(jnp.where(nmh == 0, 1.0, nmh))
            nmh_n = jnp.where(nmh == 0, 0.0, nmh_n)
            nml_n = jnp.where(nmh == 0, 0.0,
                              jnp.ldexp(nml, -e2))
            nex = ex + e2
            v_next = band_v(nmh_n, nml_n, nex)
            # next cell below lo = 0.99999999 (v < -1e-8)?
            next_below = (v_next < -BAND) | (nmh == 0)
            # stop the skip at the boundary cell: next below lo, or
            # the range end reached
            stop = in_skip & (next_below | at_end)
            adv = in_skip & ~stop
            # boundary handling where we stop
            v_here = band_v(mh, ml, ex)
            include_b = v_here < BAND        # pmf(kB) < hi
            t_b = jnp.where(include_b & stop,
                            jnp.ldexp(mh + ml, ex), 0.0)
            near = (jnp.abs(v_here + BAND) < GUARD) \
                | (jnp.abs(v_here - BAND) < GUARD) \
                | (jnp.abs(v_next + BAND) < GUARD)
            unc = unc | (stop & near)
            # seed the tail where we stopped short of the range end
            start_tail = stop & ~at_end
            pp = jnp.where(start_tail,
                           jnp.ldexp(nmh_n + nml_n, nex), pp)
            acc = jnp.where(stop, acc + t_b, acc)

            # ---- tail phase: f32 Kahan accumulation ----
            cont = in_tail & (pp > 0) \
                & (pp > (acc + comp) * f32(1e-18)) \
                & ((k * side) <= (end * side))
            y = jnp.where(cont, pp, 0.0) - comp
            t = acc + y
            comp = jnp.where(cont, (t - acc) - y, comp)
            acc = jnp.where(cont, t, acc)
            rf = rh + rl
            pp = jnp.where(cont, pp * rf, pp)

            # ---- advance state ----
            moved = adv | start_tail | cont
            k = jnp.where(moved, k + side, k)
            mh = jnp.where(adv, nmh_n, mh)
            ml = jnp.where(adv, nml_n, ml)
            ex = jnp.where(adv, nex, ex)
            pex = jnp.where(adv, jnp.maximum(pex, nex), pex)
            in_tail = (in_tail & cont) | start_tail
            in_skip = adv
            return (k, mh, ml, ex, in_skip, in_tail, pp, acc, comp,
                    unc, pex)

        def body(st_it):
            state, it = st_it
            for _ in range(8):
                state = step(state)
            return state, it + 1

        def cond(st_it):
            state, it = st_it
            active = state[4] | state[5]
            return jnp.any(active) & (it < (max_steps // 8 + 2))

        state = (k, mh, ml, ex, in_skip, in_tail, pp, acc, comp, unc,
                 pex)
        state, it = jax.lax.while_loop(cond, body,
                                       (state, jnp.int32(0)))
        (k, mh, ml, ex, in_skip, in_tail, pp, acc, comp, unc,
         pex) = state
        # cap exceeded with lanes still walking: hand them to the host
        unc = unc | in_skip | in_tail
        uncertain |= unc
        acc_total = acc_total + acc
        peak_ex = jnp.maximum(peak_ex, pex)

    bracket = acc_total
    # P = bracket * q and q * (pmf_peak/q) = pmf_peak <= 1, so
    # log2 P <= log2 bracket - peak_ex (peak_ex tracks only the
    # exponent: conservative by < 1 bit)
    log2_pb = jnp.log2(jnp.maximum(bracket, f32(1e-30))) \
        - peak_ex.astype(f32) + 1.0
    out = jnp.where(trivial, f32(1.0),
                    jnp.where(uncertain, f32(-1.0), bracket))
    return out, log2_pb


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
