"""The native C++ kernels all have pure-numpy fallbacks; these tests
force the fallback paths and check they agree with the native ones."""

import numpy as np
import pytest

import tomahawk_tpu.native as native
from tomahawk_tpu.io.importer import rle_encode
from tomahawk_tpu.io.twk import Twk1Record
from tomahawk_tpu.ops import hwe as hwe_mod
from tomahawk_tpu.ops.bitpack import block_to_planes


@pytest.fixture
def no_native(monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    yield


def _codes(rng, n, miss=0.1):
    ca = rng.integers(0, 2, n).astype(np.uint8)
    cb = rng.integers(0, 2, n).astype(np.uint8)
    m = rng.random(n) < miss
    ca[m] = 2
    cb[m] = 2
    return (ca << 2) | cb


def test_hwe_fallback_matches_native(no_native):
    rng = np.random.default_rng(0)
    n_het = rng.integers(0, 200, 50)
    n_hom1 = rng.integers(0, 300, 50)
    n_hom2 = rng.integers(0, 300, 50)
    got = hwe_mod.hwe_exact(n_het, n_hom1, n_hom2)

    from oracles import hwe_oracle
    for i in range(50):
        want = hwe_oracle(int(n_het[i]), int(n_hom1[i]), int(n_hom2[i]))
        assert got[i] == pytest.approx(want, abs=1e-9), i


def test_rle_fallback_roundtrip(no_native):
    rng = np.random.default_rng(1)
    codes = _codes(rng, 500)
    runs, width = rle_encode(codes, miss=True)
    rec = Twk1Record(gt_missing=True, gt_ptype=width, gt_runs=runs)
    np.testing.assert_array_equal(rec.decode_codes(), codes)


def test_block_to_planes_fallback_matches_native():
    rng = np.random.default_rng(2)
    from tomahawk_tpu.io.twk import Twk1Block
    blk = Twk1Block(rid=0)
    for pos in range(24):
        codes = _codes(rng, 40)
        runs, width = rle_encode(codes, miss=True)
        blk.add(Twk1Record(pos=pos * 10, rid=0, gt_missing=True,
                           gt_ptype=width, gt_runs=runs))
    if not native.available():
        pytest.skip("native lib unavailable; nothing to compare")
    a = block_to_planes(blk, 40, pad_to=32)

    saved = (native._lib, native._tried)
    native._lib, native._tried = None, True
    try:
        b = block_to_planes(blk, 40, pad_to=32)
    finally:
        native._lib, native._tried = saved
    for f in ("alt_bits", "miss_bits", "het_bits", "hom_bits",
              "valid_bits"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), f)


def test_native_code_stats_matches_numpy():
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    codes = _codes(rng, 1000, miss=0.2)
    st = native.code_stats(codes)
    ca, cb = codes >> 2, codes & 3
    full = (ca != 2) & (cb != 2)
    want = [np.sum(full & (ca == 0) & (cb == 0)),
            np.sum(full & (ca == 0) & (cb == 1)),
            np.sum(full & (ca == 1) & (cb == 0)),
            np.sum(full & (ca == 1) & (cb == 1)),
            np.sum(ca == 2) + np.sum(cb == 2),
            np.sum(ca == 1) + np.sum(cb == 1),
            np.sum(ca == 0) + np.sum(cb == 0),
            np.sum(full)]
    np.testing.assert_array_equal(st, want)
