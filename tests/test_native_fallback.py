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


def test_runs_to_planes_matches_pack_bits():
    """The native RLE->plane fill must equal packing the decoded codes."""
    if not native.available():
        pytest.skip("native lib unavailable")
    from tomahawk_tpu.ops.bitpack import _pack_bits, words_for
    rng = np.random.default_rng(5)
    n_samples = 301          # odd, non-multiple of 32
    Wh, Ws = words_for(2 * n_samples), words_for(n_samples)
    for miss_rate in (0.0, 0.15):
        for trial in range(20):
            codes = _codes(rng, n_samples, miss=miss_rate)
            runs, width = rle_encode(codes, miss_rate > 0)
            alt_w = np.zeros(Wh, np.uint32)
            mis_w = _pack_bits(np.zeros((1, 2 * n_samples), np.uint8),
                               Wh, pad_value=1)[0].copy()
            het_w = np.zeros(Ws, np.uint32)
            hom_w = np.zeros(Ws, np.uint32)
            val_w = np.zeros(Ws, np.uint32)
            n = native.runs_to_planes(runs, miss_rate > 0, alt_w, mis_w,
                                      het_w, hom_w, val_w, n_samples)
            assert n == n_samples
            ca, cb = codes >> 2, codes & 3
            alt = np.zeros(2 * n_samples, bool)
            alt[0::2], alt[1::2] = ca == 1, cb == 1
            mis = np.zeros(2 * n_samples, bool)
            mis[0::2], mis[1::2] = ca == 2, cb == 2
            full = (ca != 2) & (cb != 2)
            np.testing.assert_array_equal(
                alt_w, _pack_bits(alt[None], Wh)[0], "alt")
            np.testing.assert_array_equal(
                mis_w, _pack_bits(mis[None], Wh, pad_value=1)[0], "mis")
            np.testing.assert_array_equal(
                val_w, _pack_bits(full[None], Ws)[0], "val")
            np.testing.assert_array_equal(
                het_w, _pack_bits((full & (ca + cb == 1))[None], Ws)[0])
            np.testing.assert_array_equal(
                hom_w, _pack_bits((full & (ca == 1) & (cb == 1))[None],
                                  Ws)[0])


def test_sort_and_formatters_fallback(no_native, tmp_path):
    """sort (gather + radix), view text, decay rows, and the kinship
    matrix all run without the native library and produce the same
    results as the native paths (compared against pre-recorded native
    output where cheap, or structural properties otherwise)."""
    import io
    from tomahawk_tpu.io.twk import TwkReader
    from tomahawk_tpu.io.two import TwoWriter, TWO_DTYPE, TwoReader
    from tomahawk_tpu.post.sort import sort_two
    from tomahawk_tpu.post.decay import positional_decay

    assert native.gather_rows(np.zeros(3, np.int64), [0]) is None
    assert native.format_g6_matrix(np.eye(2)) is None
    assert native.format_decay_rows(
        np.zeros(1, np.int64), np.zeros(1, np.int64),
        np.zeros(1, np.int64), np.zeros(1)) is None

    # build a small .two and sort it on the pure-numpy path
    from test_importer import make_vcf
    from tomahawk_tpu.io.importer import ImportSettings, import_vcf
    vcf = str(tmp_path / "f.vcf")
    make_vcf(vcf, n_samples=12, n_sites=30, seed=3, miss_frac=0.0)
    twk = str(tmp_path / "f.twk")
    import_vcf(ImportSettings(input=vcf, output=twk))
    rng = np.random.default_rng(0)
    recs = np.zeros(500, TWO_DTYPE)
    recs["packA"] = rng.integers(0, 10000, 500).astype(np.uint64) << 2
    recs["packB"] = rng.integers(0, 10000, 500).astype(np.uint64) << 2
    recs["R2"] = rng.random(500)
    with TwkReader(twk) as r:
        hdr = r.header
    two = str(tmp_path / "f.two")
    w = TwoWriter(two, hdr)
    w.add(recs)
    w.close()
    sorted_two = str(tmp_path / "s.two")
    sort_two(two, sorted_two)
    with TwoReader(sorted_two) as r:
        out = r.records()
    key = (out["packA"].astype(np.int64) << 20) | out["packB"].astype(
        np.int64)
    assert (np.diff(key) >= 0).all()
    assert np.array_equal(np.sort(out["R2"]), np.sort(recs["R2"]))

    buf = io.StringIO()
    g = positional_decay(sorted_two, out=buf)
    assert len(buf.getvalue().splitlines()) == len(g)
