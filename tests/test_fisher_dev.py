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
                                         log_factorial_table)
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
    br, log2_pb = fisher_bracket(
        jnp.asarray(rr, jnp.int32), jnp.asarray(ra, jnp.int32),
        jnp.asarray(ar, jnp.int32), jnp.asarray(aa, jnp.int32))
    br, log2_pb = np.asarray(br), np.asarray(log2_pb)
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
    # log2_pbound must be a true upper bound on log2(P) (the bf16
    # packing gate relies on it). Trivial lanes are excluded: their
    # walk never runs and the host overrides P = 1 from the counts
    # before the bracket is ever read.
    n1 = C[:, 0] + C[:, 1]
    m1 = C[:, 0] + C[:, 2]
    n = C.sum(axis=1)
    triv = (n <= 0) | (np.minimum(n1, m1) <= np.maximum(0, n1 + m1 - n))
    ok = ~unc & (Pn > 0) & ~triv
    assert (log2_pb[ok] >= np.log2(Pn[ok]) - 1e-3).all()


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
    br, _ = fisher_bracket(
        jnp.asarray(rr, jnp.int32), jnp.asarray(ra, jnp.int32),
        jnp.asarray(ar, jnp.int32), jnp.asarray(aa, jnp.int32))
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
    C = np.array([(0, 0, 0, 0),      # empty
                  (0, 0, 0, 9),      # kmax == kmin
                  (7, 0, 0, 0),
                  (0, 3, 4, 0)], np.int64)
    br, _ = fisher_bracket(
        *(jnp.asarray(C[:, k], jnp.int32) for k in range(4)))
    br = np.asarray(br)
    P = host_p_from_bracket(C, br, lf)
    assert P[0] == 1.0 and P[1] == 1.0 and P[2] == 1.0
    assert np.isnan(P[3]) or 0.0 <= P[3] <= 1.0


def test_engine_device_fisher_gate(monkeypatch, tmp_path):
    """The in-sweep bracket path (gate forced open) and the gated-off
    path produce the same records, with P within the golden contract;
    non-P fields identical."""
    import os
    from tomahawk_tpu.compute import sweeps
    from tomahawk_tpu.compute.engine import CalcSettings, LdEngine
    from tomahawk_tpu.ops.ld_math import LdFilters
    from tomahawk_tpu.ops.bitpack import (BlockPlanes, _pack_bits,
                                          stack_planes, words_for)

    rng = np.random.default_rng(5)
    n_samples, B, nb = 96, 64, 2
    Wh = words_for(2 * n_samples)
    Ws = words_for(n_samples)
    planes = []
    pos0 = 0
    for b in range(nb):
        base = rng.random((B // 8, 2 * n_samples)) < 0.3
        alt = np.repeat(base, 8, axis=0)
        alt ^= rng.random((B, 2 * n_samples)) < 0.03
        pos = pos0 + np.cumsum(rng.integers(10, 50, B)).astype(np.int32)
        pos0 = int(pos[-1])
        z = np.zeros((B, n_samples), bool)
        planes.append(BlockPlanes(
            n_rec=B, alt_bits=_pack_bits(alt, Wh),
            miss_bits=_pack_bits(np.zeros_like(alt), Wh),
            het_bits=_pack_bits(z, Ws), hom_bits=_pack_bits(z, Ws),
            valid_bits=_pack_bits(~z, Ws),
            pos=pos, rid=np.zeros(B, np.int32),
            ac=alt.sum(axis=1).astype(np.int32),
            an=np.zeros(B, np.int32), n_het=np.zeros(B, np.int32),
            n_hom=np.zeros(B, np.int32), hwe=np.ones(B, np.float32),
            has_missing=np.zeros(B, bool), valid=np.ones(B, bool)))
    stacked = stack_planes(planes)
    pairs = [(i, j, i == j) for i in range(nb) for j in range(i, nb)]
    filt = LdFilters(min_r2=0.05)
    monkeypatch.setenv("TWK_DEVICE_FISHER", "1")

    def run(min_rows):
        monkeypatch.setattr(sweeps, "FISHER_MIN_ROWS", min_rows)
        eng = LdEngine(stacked, n_samples, CalcSettings(min_r2=0.05))
        out = []
        eng.run_phased_pairs(pairs, False, filt,
                             lambda r, rev=None: out.append(r.copy()))
        return np.concatenate(out)

    a = run(1)            # gate forced open: device bracket path
    b = run(1 << 30)      # gate closed: exact host Fisher
    assert len(a) == len(b) > 50
    order = [f for f in a.dtype.names if f != "P"]
    sa, sb = np.sort(a, order=order), np.sort(b, order=order)
    for f in order:
        np.testing.assert_array_equal(sa[f], sb[f], err_msg=f)
    assert np.abs(sa["P"] - sb["P"]).max() <= 1e-5

    # gate open AND a tiny fused cap: overflowing tiles take the
    # repair sweep, whose rows carry no bracket and must resolve
    # through the exact host scan (the validity mask) -- mixed
    # bracket/exact output still within the golden contract
    monkeypatch.setattr(LdEngine, "FUSED_CAP", 8)
    c = run(1)
    monkeypatch.undo()
    sc = np.sort(c, order=order)
    assert len(sc) == len(sb)
    for f in order:
        np.testing.assert_array_equal(sc[f], sb[f], err_msg=f)
    assert np.abs(sc["P"] - sb["P"]).max() <= 1e-5


def test_walk_step_cap_flags_wide_supports():
    """Lanes whose crossing lies beyond max_steps must flag uncertain
    (bracket < 0 -> host recompute), never return a partial sum."""
    from tomahawk_tpu.native import fisher_exact, get_lib
    # strong-LD tables at 40k haplotypes: crossing ~ D*2N cells away
    N = 40000
    rr, ra, ar, aa = 14000, 1000, 1000, N - 16000
    C = np.array([[rr, ra, ar, aa]], np.int64)
    br, _ = fisher_bracket(
        *(jnp.asarray(C[:, k], jnp.int32) for k in range(4)),
        max_steps=1024)
    assert float(np.asarray(br)[0]) == -1.0
    # and with enough steps the same lane resolves within tolerance
    br2, _ = fisher_bracket(
        *(jnp.asarray(C[:, k], jnp.int32) for k in range(4)),
        max_steps=1 << 17)
    b2 = float(np.asarray(br2)[0])
    if b2 >= 0 and get_lib() is not None:
        lf = log_factorial_table(N + 1)
        P = host_p_from_bracket(C, np.asarray(br2), lf)
        Pn = fisher_exact(*(C[:, k] for k in range(4)))
        assert np.isnan(P[0]) or abs(P[0] - Pn[0]) <= 1e-5
