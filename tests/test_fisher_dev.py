"""Device Fisher bracket (ops/fisher_dev.py) vs the exact native scan.

The contract: for every lane the device either returns a bracket whose
host-combined P matches the exact kernel within 1e-5 absolute (the
TWK_ALLOWED_ROUNDING_ERROR golden contract, reference:
lib/ld/ld_engine.h:37) or flags itself uncertain (bracket < 0), in
which case the host recomputes with the exact kernel. In practice the
f32 bracket lands ~1e-6 relative.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tomahawk_tpu.ops.fisher_dev import (fisher_bracket,  # noqa: E402
                                         host_p_from_bracket,
                                         log_factorial_table, split_ds)
from tomahawk_tpu.native import fisher_exact, get_lib  # noqa: E402


def _tables(rng, tot, n_rand=1500, n_sym=400, n_small=400):
    cases = []
    for _ in range(n_rand):
        n1 = int(rng.integers(1, tot))
        m1 = int(rng.integers(1, tot))
        kmin, kmax = max(0, n1 + m1 - tot), min(n1, m1)
        a = int(rng.integers(kmin, kmax + 1))
        cases.append((a, n1 - a, m1 - a, tot - n1 - m1 + a))
    # symmetric tables: the mirrored cell carries an EXACT pmf tie,
    # the case the reference's 1e-8 band exists for
    for _ in range(n_sym):
        a = int(rng.integers(0, 500))
        b = int(rng.integers(0, 100))
        d = int(rng.integers(0, 500))
        cases.append((a, b, b, d))
    for _ in range(n_small):
        cases.append(tuple(int(x) for x in rng.integers(0, 6, 4)))
    cases += [(0, 0, 0, 0), (1, 0, 0, 1), (5, 0, 0, 5), (0, 5, 5, 0),
              (tot // 2, 0, 0, tot // 2), (10, 10, 10, 10),
              (0, 0, 0, 5), (3, 0, 0, 0)]
    return np.array(cases, np.int64)


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_fisher_bracket_matches_native():
    rng = np.random.default_rng(0)
    tot = 1000
    C = _tables(rng, tot)
    rr, ra, ar, aa = (C[:, k] for k in range(4))
    lf = log_factorial_table(int(C.sum(axis=1).max()) + 1)
    lfh, lfl = split_ds(lf)
    br, _ = fisher_bracket(
        jnp.asarray(rr, jnp.int32), jnp.asarray(ra, jnp.int32),
        jnp.asarray(ar, jnp.int32), jnp.asarray(aa, jnp.int32),
        jnp.asarray(lfh), jnp.asarray(lfl))
    br = np.asarray(br)
    P = host_p_from_bracket(C, br, lf)
    Pn = fisher_exact(rr, ra, ar, aa)
    unc = np.isnan(P)
    # the uncertain escape hatch must stay rare (it costs a host
    # recompute per row)
    assert unc.mean() < 0.02, unc.mean()
    err = np.abs(P[~unc] - Pn[~unc])
    assert err.max() <= 1e-5, err.max()
    # and in practice much tighter than the golden contract
    rel = err / np.maximum(Pn[~unc], 1e-300)
    assert np.median(rel) < 1e-6


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_fisher_bracket_min_p_banding():
    """With a configured min_p threshold, rows whose device P lands
    within the guard band come back NaN so the native kernel decides
    the keep with the exact value."""
    rng = np.random.default_rng(1)
    tot = 400
    C = _tables(rng, tot, n_rand=800, n_sym=100, n_small=100)
    rr, ra, ar, aa = (C[:, k] for k in range(4))
    lf = log_factorial_table(int(C.sum(axis=1).max()) + 1)
    lfh, lfl = split_ds(lf)
    br, _ = fisher_bracket(
        jnp.asarray(rr, jnp.int32), jnp.asarray(ra, jnp.int32),
        jnp.asarray(ar, jnp.int32), jnp.asarray(aa, jnp.int32),
        jnp.asarray(lfh), jnp.asarray(lfl))
    br = np.asarray(br)
    Pn = fisher_exact(rr, ra, ar, aa)
    min_p = float(np.median(Pn))
    P = host_p_from_bracket(C, br, lf, min_p=min_p)
    sure = ~np.isnan(P)
    # every confidently-returned P makes the same keep decision as the
    # exact kernel
    assert ((P[sure] <= min_p) == (Pn[sure] <= min_p)).all()


def test_trivial_and_degenerate_lanes():
    lf = log_factorial_table(64)
    lfh, lfl = split_ds(lf)
    C = np.array([(0, 0, 0, 0),      # empty
                  (0, 0, 0, 9),      # kmax == kmin
                  (7, 0, 0, 0),
                  (0, 3, 4, 0)], np.int64)
    br, _ = fisher_bracket(
        *(jnp.asarray(C[:, k], jnp.int32) for k in range(4)),
        jnp.asarray(lfh), jnp.asarray(lfl))
    br = np.asarray(br)
    P = host_p_from_bracket(C, br, lf)
    assert P[0] == 1.0 and P[1] == 1.0 and P[2] == 1.0
    assert np.isnan(P[3]) or 0.0 <= P[3] <= 1.0
