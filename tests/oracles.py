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
