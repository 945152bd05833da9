import numpy as np
import pytest

from tomahawk_tpu.io.buffer import BufferReader, BufferWriter
from tomahawk_tpu.io.header import VcfContig, VcfHeader
from tomahawk_tpu.io.index import Index, IndexEntry, IndexOutput
from tomahawk_tpu.io.twk import Twk1Block, Twk1Record, TwkReader, TwkWriter
from tomahawk_tpu.io.two import (TWO_DTYPE, TwoReader, TwoWriter, pack_pos,
                                 two_records_from_bytes, two_records_to_bytes)
from tomahawk_tpu.io.importer import rle_encode


def test_buffer_roundtrip():
    w = BufferWriter()
    w.u8(7).u16(65535).u32(123456).u64(1 << 60).i32(-5).i64(-(1 << 40))
    w.f64(3.14159).string("hello")
    r = BufferReader(w.getvalue())
    assert r.u8() == 7
    assert r.u16() == 65535
    assert r.u32() == 123456
    assert r.u64() == 1 << 60
    assert r.i32() == -5
    assert r.i64() == -(1 << 40)
    assert r.f64() == 3.14159
    assert r.string() == "hello"
    assert r.eof()


def _header():
    h = VcfHeader()
    h.literals = "##fileformat=VCFv4.2\n##source=test\n"
    h.samples = [f"S{i}" for i in range(10)]
    h.contigs = [VcfContig(idx=0, name="20", n_bases=63025520,
                           extra=[("assembly", "b37")]),
                 VcfContig(idx=1, name="21", n_bases=48129895)]
    return h


def test_header_roundtrip():
    h = _header()
    h2 = VcfHeader.deserialize(h.serialize())
    assert h2.samples == h.samples
    assert h2.literals == h.literals
    assert [c.name for c in h2.contigs] == ["20", "21"]
    assert h2.contigs[0].extra == [("assembly", "b37")]
    assert h2.contigs[1].n_bases == 48129895


def test_index_roundtrip():
    idx = Index(2)
    for i in range(5):
        idx.add(IndexEntry(rid=i % 2, n=500, minpos=i * 1000,
                           maxpos=i * 1000 + 999, b_unc=4096, b_cmp=1024,
                           foff=100 + i * 1000, fend=100 + i * 1000 + 900))
    idx2 = Index.deserialize(idx.serialize())
    assert idx2.n == 5
    assert idx2.total_variants() == 2500
    assert idx2.ent[3].minpos == 3000
    assert len(idx2.ent_meta) == 2
    assert idx2.ent_meta[0].nn == 3


def _random_record(rng, pos, rid=0, n_samples=100, miss=False):
    codes_a = rng.integers(0, 2, n_samples).astype(np.uint8)
    codes_b = rng.integers(0, 2, n_samples).astype(np.uint8)
    if miss:
        m = rng.random(n_samples) < 0.1
        codes_a[m] = 2
    codes = (codes_a << 2) | codes_b
    runs, width = rle_encode(codes, miss)
    rec = Twk1Record(pos=pos, rid=rid, ac=int((codes_a == 1).sum()
                                              + (codes_b == 1).sum()),
                     an=int((codes_a == 2).sum() + (codes_b == 2).sum()),
                     n_het=3, n_hom=2, hwe=0.5, alleles=0x34,
                     gt_ptype=width, gt_missing=miss, gt_runs=runs)
    return rec, codes


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    for miss in (False, True):
        for n in (1, 7, 100, 3000):
            codes_a = rng.integers(0, 3 if miss else 2, n).astype(np.uint8)
            codes_b = rng.integers(0, 3 if miss else 2, n).astype(np.uint8)
            codes = (codes_a << 2) | codes_b
            runs, width = rle_encode(codes, miss)
            rec = Twk1Record(gt_ptype=width, gt_missing=miss, gt_runs=runs)
            out = rec.decode_codes()
            np.testing.assert_array_equal(out, codes)


def test_rle_long_runs_split():
    # constant vector of 10k samples must split at the 8-bit limit
    codes = np.zeros(10000, np.uint8)
    runs, width = rle_encode(codes, False)
    rec = Twk1Record(gt_ptype=width, gt_missing=False, gt_runs=runs)
    assert len(rec.decode_codes()) == 10000


def test_twk_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    h = _header()
    h.samples = [f"S{i}" for i in range(100)]
    path = str(tmp_path / "test.twk")
    blocks = []
    with TwkWriter(path, h) as w:
        for b in range(3):
            blk = Twk1Block(rid=b % 2)
            for i in range(10):
                rec, _ = _random_record(rng, pos=b * 10000 + i * 100,
                                        rid=b % 2, miss=(i % 3 == 0))
                blk.add(rec)
            blocks.append(blk)
            w.write_block(blk)

    with TwkReader(path) as r:
        assert r.header.n_samples == 100
        assert r.index.n == 3
        assert r.index.total_variants() == 30
        for i, blk in enumerate(r.blocks()):
            assert blk.n == 10
            assert blk.rid == blocks[i].rid
            for rec, orig in zip(blk.rcds, blocks[i].rcds):
                assert rec.pos == orig.pos
                assert rec.ac == orig.ac
                assert rec.hwe == orig.hwe
                np.testing.assert_array_equal(rec.decode_codes(),
                                              orig.decode_codes())


def _random_two(rng, n):
    recs = np.zeros(n, TWO_DTYPE)
    recs["controller"] = rng.integers(0, 1 << 14, n)
    recs["ridA"] = rng.integers(0, 2, n)
    recs["ridB"] = rng.integers(0, 2, n)
    recs["packA"] = pack_pos(rng.integers(0, 1 << 28, n))
    recs["packB"] = pack_pos(rng.integers(0, 1 << 28, n))
    recs["cnt"] = rng.random((n, 4))
    recs["R2"] = rng.random(n)
    recs["D"] = rng.random(n) - 0.5
    recs["P"] = rng.random(n)
    return recs


def test_two_block_bytes_roundtrip():
    rng = np.random.default_rng(2)
    recs = _random_two(rng, 17)
    out = two_records_from_bytes(two_records_to_bytes(recs))
    np.testing.assert_array_equal(out, recs)


def test_two_writer_reader(tmp_path):
    rng = np.random.default_rng(3)
    h = _header()
    path = str(tmp_path / "test.two")
    recs = _random_two(rng, 25000)
    with TwoWriter(path, h, block_limit=10000) as w:
        w.add(recs[:7000])
        w.add(recs[7000:])
    with TwoReader(path) as r:
        assert r.n_records == 25000
        assert r.index.n == 3  # 10000+10000+5000
        got = r.records()
        np.testing.assert_array_equal(got, recs)


def test_two_reader_threaded_blocks(tmp_path):
    """blocks(threads>1) pipelines the zstd decode; output must equal
    the serial path block-for-block (order preserved)."""
    import numpy as np
    from tomahawk_tpu.io.header import VcfContig, VcfHeader
    from tomahawk_tpu.io.two import TWO_DTYPE, TwoReader, TwoWriter

    hdr = VcfHeader(samples=["s0"], contigs=[VcfContig(idx=0, name="c")])
    path = str(tmp_path / "t.two")
    w = TwoWriter(path, hdr, block_limit=50)
    rng = np.random.default_rng(4)
    recs = np.zeros(777, TWO_DTYPE)
    recs["ridA"] = rng.integers(0, 2, len(recs))
    recs["packA"] = rng.integers(0, 1 << 20, len(recs))
    recs["R2"] = rng.random(len(recs))
    w.add(recs)
    w.close()

    r = TwoReader(path)
    serial = list(r.blocks())
    threaded = list(r.blocks(threads=4))
    subset = list(r.stream_blocks([1, 3, 5], threads=3))
    assert len(serial) == len(threaded) == 16
    for a, b in zip(serial, threaded):
        assert np.array_equal(a, b)
    for want, got in zip([serial[1], serial[3], serial[5]], subset):
        assert np.array_equal(want, got)
    r.close()
