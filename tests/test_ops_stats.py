import numpy as np
import pytest

from tomahawk_tpu.ops.fisher import fisher_exact_two_sided
from tomahawk_tpu.ops.hwe import hwe_exact

from oracles import fisher_oracle, hwe_oracle


def test_hwe_matches_oracle():
    rng = np.random.default_rng(0)
    cases = [(0, 10, 0), (5, 5, 5), (1, 0, 0), (0, 0, 0), (100, 20, 3),
             (57, 14, 50), (2, 1000, 1), (1469, 138, 897)]
    for _ in range(50):
        cases.append(tuple(rng.integers(0, 300, 3)))
    het = np.array([c[0] for c in cases])
    h1 = np.array([c[1] for c in cases])
    h2 = np.array([c[2] for c in cases])
    got = hwe_exact(het, h1, h2)
    want = np.array([hwe_oracle(*c) for c in cases])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_fisher_matches_oracle():
    rng = np.random.default_rng(1)
    cases = [(1, 2, 3, 4), (10, 0, 0, 10), (0, 10, 10, 0), (5, 5, 5, 5),
             (0, 0, 0, 0), (1, 0, 0, 0), (100, 50, 30, 200),
             (2000, 100, 150, 2500), (1, 1000, 1000, 1)]
    for _ in range(60):
        cases.append(tuple(rng.integers(0, 400, 4)))
    a = np.array([c[0] for c in cases])
    b = np.array([c[1] for c in cases])
    c_ = np.array([c[2] for c in cases])
    d = np.array([c[3] for c in cases])
    got = fisher_exact_two_sided(a, b, c_, d)
    want = np.array([fisher_oracle(*cs) for cs in cases])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-300)


def test_fisher_scipy_consistency():
    # sanity-check against scipy on tables without boundary ties
    from scipy.stats import fisher_exact as scipy_fisher
    rng = np.random.default_rng(2)
    tables = rng.integers(1, 60, size=(40, 4))
    got = fisher_exact_two_sided(*tables.T)
    for t, g in zip(tables, got):
        _, p = scipy_fisher(t.reshape(2, 2))
        assert abs(p - g) < 1e-6, (t, p, g)
