import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tomahawk_tpu.io.importer import rle_encode
from tomahawk_tpu.io.twk import Twk1Block, Twk1Record
from tomahawk_tpu.ops.bitpack import block_to_planes, words_for
from tomahawk_tpu.ops.ld_kernels import (compact_tile, pair_mask_tile,
                                         phased_counts_tile,
                                         phased_prefilter_mask,
                                         unphased_counts_tile, unpack_bits)

from oracles import counts_from_codes


def _block_from_codes(code_rows, pad_to=None):
    blk = Twk1Block(rid=0)
    for i, codes in enumerate(code_rows):
        ca, cb = codes >> 2, codes & 3
        miss = bool(np.any((ca == 2) | (cb == 2)))
        runs, width = rle_encode(codes, miss)
        full = (ca != 2) & (cb != 2)
        rec = Twk1Record(
            pos=100 + i * 50, rid=0,
            ac=int((ca == 1).sum() + (cb == 1).sum()),
            an=int((ca == 2).sum() + (cb == 2).sum()),
            n_het=int((((ca == 0) & (cb == 1)) |
                       ((ca == 1) & (cb == 0)))[full].sum()),
            n_hom=int(((ca == 1) & (cb == 1))[full].sum()),
            gt_ptype=width, gt_missing=miss, gt_runs=runs)
        blk.add(rec)
    return block_to_planes(blk, len(code_rows[0]), pad_to=pad_to)


def _random_rows(rng, n_var, n_samples, miss_frac):
    rows = []
    for _ in range(n_var):
        maf = rng.uniform(0.05, 0.5)
        a = (rng.random(n_samples) < maf).astype(np.uint8)
        b = (rng.random(n_samples) < maf).astype(np.uint8)
        codes = (a << 2) | b
        if miss_frac > 0:
            m = rng.random(n_samples) < miss_frac
            codes[m] = (2 << 2) | 2
        rows.append(codes)
    return rows


def test_unpack_bits():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**32, size=(3, 4), dtype=np.uint32)
    bits = np.array(unpack_bits(jnp.asarray(x)))
    for r in range(3):
        for w in range(4):
            for k in range(32):
                assert bits[r, w * 32 + k] == ((int(x[r, w]) >> k) & 1)


@pytest.mark.parametrize("miss_frac", [0.0, 0.1])
def test_phased_counts_vs_oracle(miss_frac):
    rng = np.random.default_rng(1)
    n_samples = 37
    rows_a = _random_rows(rng, 6, n_samples, miss_frac)
    rows_b = _random_rows(rng, 5, n_samples, miss_frac)
    pa = _block_from_codes(rows_a)
    pb = _block_from_codes(rows_b)
    has_missing = miss_frac > 0
    counts = np.array(phased_counts_tile(
        jnp.asarray(pa.alt_bits), jnp.asarray(pa.miss_bits),
        jnp.asarray(pb.alt_bits), jnp.asarray(pb.miss_bits),
        jnp.asarray(pa.ac), jnp.asarray(pb.ac),
        n_samples, has_missing))
    for i, ca in enumerate(rows_a):
        for j, cb in enumerate(rows_b):
            hap, _ = counts_from_codes(ca, cb)
            np.testing.assert_array_equal(counts[i, j], hap,
                                          err_msg=f"pair {i},{j}")


@pytest.mark.parametrize("miss_frac", [0.0, 0.1])
def test_unphased_counts_vs_oracle(miss_frac):
    rng = np.random.default_rng(2)
    n_samples = 41
    rows_a = _random_rows(rng, 5, n_samples, miss_frac)
    rows_b = _random_rows(rng, 4, n_samples, miss_frac)
    pa = _block_from_codes(rows_a)
    pb = _block_from_codes(rows_b)
    T = np.array(unphased_counts_tile(
        jnp.asarray(pa.het_bits), jnp.asarray(pa.hom_bits),
        jnp.asarray(pa.valid_bits),
        jnp.asarray(pb.het_bits), jnp.asarray(pb.hom_bits),
        jnp.asarray(pb.valid_bits),
        jnp.asarray(pa.n_het), jnp.asarray(pa.n_hom),
        jnp.asarray(pb.n_het), jnp.asarray(pb.n_hom),
        n_samples, miss_frac > 0))
    for i, ca in enumerate(rows_a):
        for j, cb in enumerate(rows_b):
            _, T_want = counts_from_codes(ca, cb)
            np.testing.assert_array_equal(T[i, j], T_want,
                                          err_msg=f"pair {i},{j}")


def test_padding_rows_are_inert():
    rng = np.random.default_rng(3)
    n_samples = 20
    rows = _random_rows(rng, 3, n_samples, 0.0)
    p = _block_from_codes(rows, pad_to=8)
    assert p.valid.sum() == 3
    counts = np.array(phased_counts_tile(
        jnp.asarray(p.alt_bits), jnp.asarray(p.miss_bits),
        jnp.asarray(p.alt_bits), jnp.asarray(p.miss_bits),
        jnp.asarray(p.ac), jnp.asarray(p.ac), n_samples, False))
    mask = np.array(pair_mask_tile(
        jnp.asarray(p.valid), jnp.asarray(p.valid),
        jnp.asarray(p.ac), jnp.asarray(p.ac),
        jnp.asarray(p.rid), jnp.asarray(p.rid),
        jnp.asarray(p.pos), jnp.asarray(p.pos), diagonal=True))
    # no pair involving a padding row survives the mask
    assert not mask[3:, :].any()
    assert not mask[:, 3:].any()
    # upper triangle only
    assert not np.tril(mask).any()


def test_compaction_roundtrip():
    rng = np.random.default_rng(4)
    mask = jnp.asarray(rng.random((16, 16)) < 0.2)
    payload = jnp.asarray(
        rng.integers(0, 100, size=(256, 4)).astype(np.int32))
    n_pass, idx, rows = compact_tile(mask, payload, cap=64)
    n_pass = int(n_pass)
    want_idx = np.flatnonzero(np.array(mask).ravel())
    assert n_pass == len(want_idx)
    np.testing.assert_array_equal(np.array(idx)[:n_pass], want_idx)
    np.testing.assert_array_equal(np.array(rows)[:n_pass],
                                  np.array(payload)[want_idx])
    assert (np.array(idx)[n_pass:] == -1).all()


def test_prefilter_never_drops_exact_survivors():
    """The f32 device prefilter must be conservative wrt the f64 filter."""
    from tomahawk_tpu.ops.ld_math import LdFilters, PairMeta, phased_math
    rng = np.random.default_rng(5)
    n_samples = 64
    rows_a = _random_rows(rng, 12, n_samples, 0.0)
    rows_b = _random_rows(rng, 12, n_samples, 0.0)
    pa = _block_from_codes(rows_a)
    pb = _block_from_codes(rows_b)
    counts = phased_counts_tile(
        jnp.asarray(pa.alt_bits), jnp.asarray(pa.miss_bits),
        jnp.asarray(pb.alt_bits), jnp.asarray(pb.miss_bits),
        jnp.asarray(pa.ac), jnp.asarray(pb.ac), n_samples, False)
    pm = pair_mask_tile(jnp.asarray(pa.valid), jnp.asarray(pb.valid),
                        jnp.asarray(pa.ac), jnp.asarray(pb.ac),
                        jnp.asarray(pa.rid), jnp.asarray(pb.rid),
                        jnp.asarray(pa.pos), jnp.asarray(pb.pos),
                        diagonal=False)
    dev_mask = np.array(phased_prefilter_mask(counts, pm, 0.1, 100.0))

    cflat = np.array(counts).reshape(-1, 4).astype(np.int64)
    k = len(cflat)
    z = np.zeros(k, np.int64)
    meta = PairMeta(pos_a=z, pos_b=z + 1, rid_a=z, rid_b=z,
                    ac_a=np.repeat(pa.ac, 12), ac_b=np.tile(pb.ac, 12),
                    an_a=z, an_b=z, hwe_a=np.ones(k), hwe_b=np.ones(k))
    recs, kept = phased_math(cflat, meta, LdFilters(min_r2=0.1))
    kept_set = set(kept.tolist())
    dev_set = set(np.flatnonzero(dev_mask.ravel()).tolist())
    assert kept_set <= dev_set, kept_set - dev_set


def test_flipped_import_unphased_counts_vs_oracle(tmp_path):
    """-f flipped sites store the PRE-flip n_hom in the record (a
    mirrored reference quirk, genotype_encoder.h:251-253 sets it from
    the unflipped summary), but the unphased cell derivation must use
    counts consistent with the flipped genotype planes -- the reference
    recounts from the flipped RLE data and never reads that field."""
    from tomahawk_tpu.io.importer import ImportSettings, import_vcf
    from tomahawk_tpu.io.twk import TwkReader
    from tomahawk_tpu.ops.bitpack import block_to_planes

    rng = np.random.default_rng(7)
    n_samples, n_sites = 30, 8
    lines = ["##fileformat=VCFv4.2",
             "##contig=<ID=20,length=100000>",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(f"S{i}" for i in range(n_samples))]
    all_codes = []
    for s in range(n_sites):
        # alt-major (maf ~ 0.8) so every site flips
        g = (rng.random((n_samples, 2)) < 0.8).astype(int)
        cols = ["|".join(map(str, row)) for row in g]
        lines.append(f"20\t{100 + 50 * s}\t.\tA\tC\t.\tPASS\t.\tGT\t"
                     + "\t".join(cols))
        all_codes.append((g[:, 0] << 2) | g[:, 1])
    vcf = tmp_path / "flip.vcf"
    vcf.write_text("\n".join(lines) + "\n")
    twk = str(tmp_path / "flip.twk")
    import_vcf(ImportSettings(input=str(vcf), output=twk,
                              flip_major_minor=True))

    reader = TwkReader(twk)
    blk = next(iter(reader.blocks()))
    assert all(r.gt_flipped for r in blk.rcds), "no site flipped"
    p = block_to_planes(blk, n_samples)

    # flipped codes are what the archive stores
    flipped = [(np.where(c >> 2 == 0, 1, 0) << 2)
               | np.where((c & 3) == 0, 1, 0) for c in all_codes]
    T = np.array(unphased_counts_tile(
        jnp.asarray(p.het_bits), jnp.asarray(p.hom_bits),
        jnp.asarray(p.valid_bits),
        jnp.asarray(p.het_bits), jnp.asarray(p.hom_bits),
        jnp.asarray(p.valid_bits),
        jnp.asarray(p.n_het), jnp.asarray(p.n_hom),
        jnp.asarray(p.n_het), jnp.asarray(p.n_hom),
        n_samples, False))
    for i in range(n_sites):
        for j in range(n_sites):
            _, T_want = counts_from_codes(flipped[i], flipped[j])
            np.testing.assert_array_equal(T[i, j], T_want,
                                          err_msg=f"pair {i},{j}")


def test_dprime_prefilter_superset_of_keep():
    """The in-sweep D' filter (round-4: device-side survivor
    statistics) must keep a superset of the f64 keep set for any D'
    range, including cancellation-dominated tables it must pass
    through untouched."""
    from tomahawk_tpu.ops.ld_kernels import (dprime_prefilter_cells,
                                             phased_prefilter_cells)
    from tomahawk_tpu.ops.ld_math import LdFilters, PairMeta, phased_math
    rng = np.random.default_rng(11)
    # mixed scale counts incl. large (f32-inexact products) and tiny
    cnt = np.concatenate([
        rng.integers(0, 50, (4000, 4)),
        rng.integers(0, 100_000, (4000, 4)),
        rng.integers(0, 4, (4000, 4)) * rng.integers(0, 50_000, (4000, 4)),
    ]).astype(np.int64)
    k = len(cnt)
    z = np.zeros(k, np.int64)
    meta = PairMeta(pos_a=z, pos_b=z + 1, rid_a=z, rid_b=z,
                    ac_a=cnt[:, 2] + cnt[:, 3], ac_b=cnt[:, 1] + cnt[:, 3],
                    an_a=z, an_b=z, hwe_a=np.ones(k), hwe_b=np.ones(k))
    cells = tuple(jnp.asarray(cnt[:, c].reshape(1, -1), jnp.int32)
                  for c in range(4))
    pm = jnp.ones((1, k), bool)
    for lo, hi in [(0.2, 100.0), (0.0, 0.9), (0.5, 0.8), (-0.5, 0.5)]:
        dev = np.array(phased_prefilter_cells(
            cells, pm, 0.0, 100.0, lo, hi)).ravel()
        filt = LdFilters(min_r2=0.0, min_dprime=lo, max_dprime=hi)
        recs, kept = phased_math(cnt, meta, filt)
        missing = set(kept.tolist()) - set(np.flatnonzero(dev).tolist())
        assert not missing, (lo, hi, sorted(missing)[:5])
        # and it really filters: with a non-trivial range, fewer pairs
        # survive than with the default pass-through
        full = np.array(phased_prefilter_cells(
            cells, pm, 0.0, 100.0)).ravel()
        assert dev.sum() < full.sum()
    # direct superset property of the raw D' mask at (0.3, 0.9)
    dp = np.array(dprime_prefilter_cells(cells, 0.3, 0.9)).ravel()
    assert dp.dtype == bool
    _, kept_dp = phased_math(
        cnt, meta, LdFilters(min_r2=0.0, min_dprime=0.3, max_dprime=0.9))
    assert set(kept_dp.tolist()) <= set(np.flatnonzero(dp).tolist())
