"""Slow, independent scalar oracles used to validate the vectorized ops.

These are direct implementations of the published algorithms (Wigginton
2005 exact HWE; two-sided Fisher exact via hypergeometric tail scans with
htslib's documented tolerance constants), written from the algorithm
descriptions for cross-checking.
"""

import numpy as np
from scipy.stats import hypergeom


def hwe_oracle(obs_het: int, obs_hom1: int, obs_hom2: int) -> float:
    obs_homc = max(obs_hom1, obs_hom2)
    obs_homr = min(obs_hom1, obs_hom2)
    rare = 2 * obs_homr + obs_het
    genotypes = obs_het + obs_homc + obs_homr
    if genotypes == 0:
        return 1.0
    probs = np.zeros(rare + 1)
    mid = rare * (2 * genotypes - rare) // (2 * genotypes)
    if (rare % 2) != (mid % 2):
        mid += 1
    probs[mid] = 1.0
    total = 1.0
    ch, hr, hc = mid, (rare - mid) // 2, genotypes - mid - (rare - mid) // 2
    while ch > 1:
        probs[ch - 2] = probs[ch] * ch * (ch - 1.0) / \
            (4.0 * (hr + 1.0) * (hc + 1.0))
        total += probs[ch - 2]
        ch -= 2
        hr += 1
        hc += 1
    ch, hr, hc = mid, (rare - mid) // 2, genotypes - mid - (rare - mid) // 2
    while ch <= rare - 2:
        probs[ch + 2] = probs[ch] * 4.0 * hr * hc / \
            ((ch + 2.0) * (ch + 1.0))
        total += probs[ch + 2]
        ch += 2
        hr -= 1
        hc -= 1
    probs /= total
    p = probs[probs <= probs[obs_het]].sum()
    return min(p, 1.0)


def fisher_oracle(n11: int, n12: int, n21: int, n22: int) -> float:
    """Two-sided Fisher exact p with htslib kt_fisher_exact tail logic."""
    n1_ = n11 + n12
    n_1 = n11 + n21
    n = n11 + n12 + n21 + n22
    kmax = min(n_1, n1_)
    kmin = max(0, n1_ + n_1 - n)
    if kmin == kmax:
        return 1.0
    pmf = lambda k: hypergeom.pmf(k, n, n1_, n_1)
    q = pmf(n11)
    # left tail
    left = 0.0
    i = kmin
    p = pmf(i)
    while p < 0.99999999 * q and i <= kmax:
        left += p
        i += 1
        if i > kmax:
            break
        p = pmf(i)
    if i <= kmax and p < 1.00000001 * q:
        left += p
    # right tail
    right = 0.0
    j = kmax
    p = pmf(j)
    while p < 0.99999999 * q and j >= kmin:
        right += p
        j -= 1
        if j < kmin:
            break
        p = pmf(j)
    if j >= kmin and p < 1.00000001 * q:
        right += p
    return min(left + right, 1.0)


def phased_ld_oracle(hap_a: np.ndarray, hap_b: np.ndarray,
                     miss_a=None, miss_b=None):
    """Naive phased LD from two haplotype 0/1 vectors (+ missing masks).
    Returns dict with the 2x2 counts and D, Dprime, R2, chi2."""
    hap_a = np.asarray(hap_a)
    hap_b = np.asarray(hap_b)
    valid = np.ones(len(hap_a), bool)
    if miss_a is not None:
        valid &= ~np.asarray(miss_a, bool)
    if miss_b is not None:
        valid &= ~np.asarray(miss_b, bool)
    a, b = hap_a[valid], hap_b[valid]
    n11 = int(np.sum((a == 0) & (b == 0)))  # ref-ref
    n12 = int(np.sum((a == 0) & (b == 1)))  # ref-alt
    n21 = int(np.sum((a == 1) & (b == 0)))  # alt-ref
    n22 = int(np.sum((a == 1) & (b == 1)))  # alt-alt
    ntot = n11 + n12 + n21 + n22
    if ntot == 0:
        return None
    pA = n11 / ntot   # freq of (refA refB) haplotype
    qA = n12 / ntot
    pB = n21 / ntot
    qB = n22 / ntot
    D = pA * qB - qA * pB
    g0 = (n11 + n12) / ntot
    g1 = (n21 + n22) / ntot
    h0 = (n11 + n21) / ntot
    h1 = (n12 + n22) / ntot
    denom = g0 * g1 * h0 * h1
    r2 = D * D / denom if denom > 0 else 0.0
    if D >= 0:
        dmax = min(g0 * h1, h0 * g1)
    else:
        dmax = -min(g0 * g1, h0 * h1)
    dprime = D / dmax if dmax != 0 else 0.0
    return dict(n11=n11, n12=n12, n21=n21, n22=n22, D=D, R2=r2,
                Dprime=dprime, chi2=ntot * r2)


# ---------------------------------------------------------------------------
# Scalar oracle of the full per-pair LD pipeline (phased + unphased),
# written independently from the algorithm spec for cross-checking the
# vectorized implementation.
# ---------------------------------------------------------------------------

import math

ROUND_EPS = 1e-5


def counts_from_codes(codes_a, codes_b):
    """codes: per-sample (cA<<2|cB) with 0=ref,1=alt,2=missing.
    Returns (hap4, table9): phased 2x2 haplotype counts
    (REFREF, REFALT, ALTREF, ALTALT) over called haplotype pairs, and the
    3x3 genotype table over fully-called samples."""
    import numpy as np
    a1, a2 = codes_a >> 2, codes_a & 3
    b1, b2 = codes_b >> 2, codes_b & 3
    hap = [0, 0, 0, 0]
    for x, y in ((a1, b1), (a2, b2)):
        ok = (x != 2) & (y != 2)
        hap[0] += int(((x == 0) & (y == 0) & ok).sum())
        hap[1] += int(((x == 0) & (y == 1) & ok).sum())
        hap[2] += int(((x == 1) & (y == 0) & ok).sum())
        hap[3] += int(((x == 1) & (y == 1) & ok).sum())
    ga = np.where((a1 != 2) & (a2 != 2), a1 + a2, 255)
    gb = np.where((b1 != 2) & (b2 != 2), b1 + b2, 255)
    T = np.zeros((3, 3), np.int64)
    for i in range(3):
        for j in range(3):
            T[i, j] = int(((ga == i) & (gb == j)).sum())
    return hap, T


def phased_math_oracle(hap, min_r2=0.1, max_r2=100.0, min_dprime=0.0,
                       max_dprime=100.0, min_p=1.0):
    """Returns dict(D, Dprime, R, R2, P, chisq_fisher, cnt) or None."""
    refref, refalt, altref, altalt = [float(x) for x in hap]
    t = refref + refalt + altref + altalt
    if t < 5:
        return None
    if refref < altalt:
        if refalt + altref + refref < 5:
            return None
    else:
        if altalt + refalt + altref < 5:
            return None
    pA, qA, pB, qB = refref / t, altref / t, refalt / t, altalt / t
    if pA * qB - qA * pB == 0:
        return None
    g0 = (refref + refalt) / t
    g1 = (altref + altalt) / t
    h0 = (refref + altref) / t
    h1 = (refalt + altalt) / t
    D = pA * qB - qA * pB
    R2 = D * D / (g0 * g1 * h0 * h1)
    if R2 < min_r2 or R2 > max_r2:
        return None
    dmax = min(g0 * h1, h0 * g1) if D >= 0 else -min(g0 * g1, h0 * h1)
    Dprime = D / dmax
    if Dprime < min_dprime or Dprime > max_dprime:
        return None
    P = fisher_oracle(int(refref), int(refalt), int(altref), int(altalt))
    if P > min_p:
        return None
    return dict(D=D, Dprime=Dprime, R=math.sqrt(R2), R2=R2, P=P,
                chisq_fisher=t * R2,
                cnt=(refref, altref, refalt, altalt))


def _chisq_table_oracle(T, n, f11, p, q):
    f12, f21 = p - f11, q - f11
    f22 = 1 - (f11 + f12 + f21)
    e = [n * f11 ** 2, 2 * n * f11 * f12, n * f12 ** 2,
         2 * n * f11 * f21, 2 * n * f12 * f21 + 2 * n * f11 * f22,
         2 * n * f12 * f22, n * f21 ** 2, 2 * n * f21 * f22, n * f22 ** 2]
    obs = [T[0, 0], T[0, 1], T[0, 2], T[1, 0], T[1, 1], T[1, 2],
           T[2, 0], T[2, 1], T[2, 2]]
    return sum((o - ee) ** 2 / ee if ee > 0 else 0.0
               for o, ee in zip(obs, e))


def unphased_math_oracle(T, min_r2=0.1, max_r2=100.0, min_dprime=0.0,
                         max_dprime=100.0, min_p=1.0):
    """Cubic-EM unphased pipeline; returns dict or None. Also returns
    'multiple_roots' and 'folded' markers."""
    import numpy as np
    T = np.asarray(T, np.int64)
    n = float(T.sum())
    if n < 5:
        return None
    ndh = float(T[1, 1])
    if ndh == 0:
        hap = (2 * T[0, 0] + T[0, 1] + T[1, 0],
               2 * T[0, 2] + T[0, 1] + T[1, 2],
               2 * T[2, 0] + T[1, 0] + T[2, 1],
               2 * T[2, 2] + T[2, 1] + T[1, 2])
        r = phased_math_oracle(hap, min_r2, max_r2, min_dprime,
                               max_dprime, min_p)
        if r is not None:
            r["folded"] = True
        return r
    p = (2 * (T[0].sum()) + T[1].sum()) / (2 * n)
    q = (2 * (T[:, 0].sum()) + T[:, 1].sum()) / (2 * n)
    n11 = 2.0 * T[0, 0] + T[0, 1] + T[1, 0]
    minhap = n11 / (2 * n)
    maxhap = (n11 + ndh) / (2 * n)
    a = 4.0 * n
    b = 2.0 * n * (1 - 2 * p - 2 * q) - 2 * n11 - ndh
    c = -n11 * (1 - 2 * p - 2 * q) - ndh * (1 - p - q) + 2 * n * p * q
    dee = -n11 * p * q
    xN = -b / (3 * a)
    d2 = (b * b - 3 * a * c) / (9 * a * a)
    yN = a * xN ** 3 + b * xN ** 2 + c * xN + dee
    yN2, h2 = yN * yN, 4 * a * a * d2 ** 3
    roots = []
    if yN2 - h2 < 0:
        h = math.sqrt(h2)
        theta = math.acos(max(-1.0, min(1.0, -yN / h))) / 3.0
        delta = math.sqrt(d2)
        roots = [xN + 2 * delta * math.cos(theta),
                 xN + 2 * delta * math.cos(2 * math.pi / 3 + theta),
                 xN + 2 * delta * math.cos(4 * math.pi / 3 + theta)]
    elif yN2 - h2 > 0:
        def cbrt(v):
            return -((-v) ** (1 / 3)) if v < 0 else v ** (1 / 3)
        s = math.sqrt(yN2 - h2)
        roots = [xN + cbrt((1 / (2 * a)) * (-yN + s))
                 + cbrt((1 / (2 * a)) * (-yN - s))]
    else:
        operand = yN / 2.0 * a
        if operand < 0:
            return None   # reference: pow of negative -> NaN -> dropped
        delta = operand ** (1 / 3)
        roots = [xN + delta, xN - 2 * delta]
    cands = [r for r in roots
             if minhap - ROUND_EPS <= r <= maxhap + ROUND_EPS]
    if not cands:
        return None
    chis = [_chisq_table_oracle(T, n, r, p, q) for r in cands]
    f11 = cands[int(np.argmin(chis))]
    # the reference's degenerate yN2 == h2 branch never sets
    # MultipleRoots, even with two admissible roots
    # (ld_engine.cpp:1523-1558 has no SetMultipleRoots call)
    multiple = len(cands) > 1 and yN2 - h2 != 0

    f12, f21 = p - f11, q - f11
    f22 = 1 - (f11 + f12 + f21)
    D = f11 * f22 - f12 * f21
    R2 = D * D / (p * (1 - p) * q * (1 - q))
    if R2 < min_r2 or R2 > max_r2:
        return None
    cnt = [f11 * 2 * n, f21 * 2 * n, f12 * 2 * n, f22 * 2 * n]
    if cnt[0] < cnt[3]:
        if cnt[2] + cnt[1] + cnt[0] < 5:
            return None
    else:
        if cnt[3] + cnt[2] + cnt[1] < 5:
            return None
    dmax = min(p * (1 - q), q * (1 - p)) if D >= 0 else \
        -min(p * q, (1 - p) * (1 - q))
    Dprime = D / dmax
    if Dprime < min_dprime or Dprime > max_dprime:
        return None
    rc = [math.floor(f11 * 2 * n + .5), math.floor(f12 * 2 * n + .5),
          math.floor(f21 * 2 * n + .5), math.floor(f22 * 2 * n + .5)]
    P = fisher_oracle(*rc)
    if P > min_p:
        return None
    return dict(D=D, Dprime=Dprime, R=math.sqrt(R2), R2=R2, P=P,
                chisq_fisher=sum(cnt) * R2, cnt=tuple(cnt),
                multiple_roots=multiple, folded=False)
