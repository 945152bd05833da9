"""Exact test of Hardy-Weinberg equilibrium (Wigginton et al. 2005).

Semantically equivalent to the reference's per-site implementation
(reference: lib/core.cpp:103-201 twk1_t::calculateHardyWeinberg), but
vectorized across sites: instead of the sequential recurrence over het
counts we evaluate the conditional distribution of heterozygote counts
in log-space with gammaln and normalize, which is algebraically the same
distribution.

P(h hets | n genotypes, r rare copies) ∝ n! / (homr! h! homc!) * 2^h
with homr = (r - h)/2, homc = n - h - homr, over h with h ≡ r (mod 2).
"""

import numpy as np
from scipy.special import gammaln


def hwe_exact(n_het, n_hom1, n_hom2, chunk: int = 4096) -> np.ndarray:
    """Two-sided exact HWE p-value for each site.

    Args:
      n_het: observed heterozygote counts, shape [S]
      n_hom1, n_hom2: observed homozygote counts (either order), shape [S]
    Returns:
      p-values, shape [S], float64
    """
    n_het = np.atleast_1d(np.asarray(n_het, np.int64))
    n_hom1 = np.atleast_1d(np.asarray(n_hom1, np.int64))
    n_hom2 = np.atleast_1d(np.asarray(n_hom2, np.int64))
    out = np.ones(n_het.shape, np.float64)
    homc = np.maximum(n_hom1, n_hom2)
    homr = np.minimum(n_hom1, n_hom2)
    rare = 2 * homr + n_het
    genot = n_het + homc + homr

    valid = genot > 0
    idx = np.flatnonzero(valid)
    for s in range(0, len(idx), chunk):
        sel = idx[s:s + chunk]
        out[sel] = _hwe_chunk(n_het[sel], rare[sel], genot[sel])
    return out


def _hwe_chunk(obs_het, rare, genot):
    smax = int(rare.max()) if len(rare) else 0
    # candidate het counts 0..rare with matching parity
    h = np.arange(smax + 1, dtype=np.int64)[None, :]        # [1, H]
    rare_c = rare[:, None].astype(np.int64)
    genot_c = genot[:, None].astype(np.int64)
    homr = (rare_c - h) // 2
    homc = genot_c - h - homr
    ok = (h <= rare_c) & ((h & 1) == (rare_c & 1)) & (homc >= 0)
    hs = np.where(ok, h, 0)
    homr_s = np.where(ok, homr, 0)
    homc_s = np.where(ok, homc, 0)
    logp = (gammaln(genot_c + 1.0)
            - gammaln(hs + 1.0) - gammaln(homr_s + 1.0)
            - gammaln(homc_s + 1.0) + hs * np.log(2.0))
    logp = np.where(ok, logp, -np.inf)
    # normalize per site
    m = logp.max(axis=1, keepdims=True)
    p = np.exp(logp - m)
    p /= p.sum(axis=1, keepdims=True)
    p_obs = np.take_along_axis(p, obs_het[:, None].astype(np.int64),
                               axis=1)
    # two-sided: sum of all outcomes no more probable than the observed
    # (reference: lib/core.cpp:186-195, het_probs[i] > het_probs[obs] skip)
    tail = np.where(p <= p_obs, p, 0.0).sum(axis=1)
    return np.minimum(tail, 1.0)
