"""BCF2 reader: byte-level decode checks plus VCF-vs-BCF import parity."""

import gzip
import struct

import numpy as np
import pytest

from tomahawk_tpu.io.bcf import BcfReader, is_bcf, write_bcf
from tomahawk_tpu.io.importer import ImportSettings, import_vcf
from tomahawk_tpu.io.twk import TwkReader
from tomahawk_tpu.io.vcf import VcfReader

from test_importer import make_vcf


def _vcf_to_bcf(vcf_path, bcf_path):
    """Re-encode a text VCF as BCF using the site stream itself."""
    vr = VcfReader(vcf_path)
    header_text = vr.header.literals + "#CHROM\tPOS\tID\tREF\tALT\tQUAL" \
        "\tFILTER\tINFO\tFORMAT\t" + "\t".join(vr.header.samples) + "\n"
    # GT dictionary index: FILTER/INFO/FORMAT ids in order, PASS first
    ids = ["PASS"]
    for line in vr.header.literals.splitlines():
        for kind in ("##FILTER=<", "##INFO=<", "##FORMAT=<"):
            if line.startswith(kind):
                body = line[len(kind):].rstrip(">")
                for kv in body.split(","):
                    if kv.startswith("ID="):
                        name = kv[3:].strip('"')
                        if name not in ids:
                            ids.append(name)
    gt_key = ids.index("GT")

    n = len(vr.header.samples)
    sites = []
    for site in vr.sites():
        ca = (site.codes >> 2).astype(np.int32)
        cb = (site.codes & 3).astype(np.int32)
        # BCF value = (allele+1)<<1 | phase; missing allele -> 0
        # missing allele keeps its phase bit (htslib convention)
        va = np.where(ca == 2, 0, (ca + 1) << 1)
        vb = np.where(cb == 2, site.phase,
                      ((cb + 1) << 1) | site.phase)
        sites.append((site.rid, site.pos, site.ref, site.alt,
                      np.stack([va, vb], axis=1)))
    vr.close()
    write_bcf(bcf_path, header_text, sites, n, gt_key)


def test_is_bcf(tmp_path):
    vcf = str(tmp_path / "a.vcf")
    make_vcf(vcf, n_samples=6, n_sites=4, miss_frac=0.0, seed=1)
    bcf = str(tmp_path / "a.bcf")
    _vcf_to_bcf(vcf, bcf)
    assert is_bcf(bcf)
    assert not is_bcf(vcf)


def test_bcf_sites_match_vcf(tmp_path):
    vcf = str(tmp_path / "b.vcf")
    make_vcf(vcf, n_samples=12, n_sites=25, miss_frac=0.08, seed=2)
    bcf = str(tmp_path / "b.bcf")
    _vcf_to_bcf(vcf, bcf)

    vs = list(VcfReader(vcf).sites())
    bs = list(BcfReader(bcf).sites())
    assert len(vs) == len(bs)
    for v, b in zip(vs, bs):
        assert (v.rid, v.pos, v.ref, v.alt) == (b.rid, b.pos, b.ref, b.alt)
        assert v.is_snp == b.is_snp and v.ploidy_ok == b.ploidy_ok
        np.testing.assert_array_equal(v.codes, b.codes)
        np.testing.assert_array_equal(v.phase, b.phase)


def test_bcf_import_parity(tmp_path):
    """import(VCF) and import(BCF of same data) give identical .twk."""
    vcf = str(tmp_path / "c.vcf")
    make_vcf(vcf, n_samples=20, n_sites=30, miss_frac=0.05, seed=3)
    bcf = str(tmp_path / "c.bcf")
    _vcf_to_bcf(vcf, bcf)

    twk_v = str(tmp_path / "v.twk")
    twk_b = str(tmp_path / "b.twk")
    import_vcf(ImportSettings(input=vcf, output=twk_v, block_size=7,
                              threshold_miss=0.5))
    import_vcf(ImportSettings(input=bcf, output=twk_b, block_size=7,
                              threshold_miss=0.5))

    rv = TwkReader(twk_v)
    rb = TwkReader(twk_b)
    recs_v, recs_b = list(rv.records()), list(rb.records())
    assert len(recs_v) == len(recs_b) > 0
    for a, b in zip(recs_v, recs_b):
        assert (a.rid, a.pos, a.ac, a.an, a.n_het, a.n_hom) == \
            (b.rid, b.pos, b.ac, b.an, b.n_het, b.n_hom)
        assert a.hwe == pytest.approx(b.hwe)
        np.testing.assert_array_equal(a.decode_codes(), b.decode_codes())
    rv.close()
    rb.close()


def test_bcf_int16_gt_width(tmp_path):
    """GT vectors stored as int16 decode identically to int8."""
    vcf = str(tmp_path / "d.vcf")
    make_vcf(vcf, n_samples=8, n_sites=5, miss_frac=0.0, seed=4)
    vr = VcfReader(vcf)
    header_text = vr.header.literals + "#CHROM\tPOS\tID\tREF\tALT\tQUAL" \
        "\tFILTER\tINFO\tFORMAT\t" + "\t".join(vr.header.samples) + "\n"
    sites = []
    want = []
    for site in vr.sites():
        ca = (site.codes >> 2).astype(np.int32)
        cb = (site.codes & 3).astype(np.int32)
        va = np.where(ca == 2, 0, (ca + 1) << 1)
        vb = np.where(cb == 2, site.phase,
                      ((cb + 1) << 1) | site.phase)
        # force int16 storage
        sites.append((site.rid, site.pos, site.ref, site.alt,
                      np.stack([va, vb], axis=1) + 0))
        want.append(site.codes)
    vr.close()

    bcf = str(tmp_path / "d.bcf")
    # monkey-wrench: use width-2 encoding by patching write_bcf's choice
    import tomahawk_tpu.io.bcf as B
    raw = []
    gt_key = 1
    out = bytearray()
    text = header_text.encode() + b"\x00"
    out += b"BCF\x02\x02" + struct.pack("<I", len(text)) + text
    for rid, pos, ref, alt, gt in sites:
        shared = bytearray()
        shared += struct.pack("<iii", rid, pos, 1)
        shared += struct.pack("<f", 0.0)
        shared += struct.pack("<HH", 0, 2)
        shared += struct.pack("<I", 8)[:3] + bytes([1])
        shared += B._typed_string(".") + B._typed_string(ref) + \
            B._typed_string(alt)
        shared += B._typed_ints([])
        indiv = bytearray()
        indiv += B._typed_ints([gt_key])
        indiv += bytes([(2 << 4) | 2])               # 2 per sample, int16
        indiv += np.asarray(gt, np.int16).tobytes()
        out += struct.pack("<II", len(shared), len(indiv))
        out += bytes(shared) + bytes(indiv)
    with gzip.open(bcf, "wb") as fh:
        fh.write(bytes(out))

    got = list(BcfReader(bcf).sites())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g.codes, w)


def test_bcf_import_flip_parity(tmp_path):
    """flip_major_minor through the fused BCF path must keep the real
    per-sample phase (regression: the flip fallback once overwrote it
    with scratch)."""
    import random
    random.seed(9)
    vcf = str(tmp_path / "f.vcf")
    n = 16
    names = "\t".join(f"S{i}" for i in range(n))
    lines = ["##fileformat=VCFv4.2",
             "##contig=<ID=c1,length=100000>",
             '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
             f"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{names}"]
    pos = 100
    for s in range(20):
        pos += random.randint(20, 80)
        maf = 0.8 if s % 2 else 0.3      # alt-major half the time
        gts = "\t".join(
            f"{int(random.random() < maf)}|{int(random.random() < maf)}"
            for _ in range(n))
        lines.append(f"c1\t{pos}\t.\tA\tC\t.\tPASS\t.\tGT\t{gts}")
    open(vcf, "w").write("\n".join(lines) + "\n")
    bcf = str(tmp_path / "f.bcf")
    _vcf_to_bcf(vcf, bcf)
    twk_v = str(tmp_path / "fv.twk")
    twk_b = str(tmp_path / "fb.twk")
    import_vcf(ImportSettings(input=vcf, output=twk_v, block_size=7,
                              flip_major_minor=True))
    import_vcf(ImportSettings(input=bcf, output=twk_b, block_size=7,
                              flip_major_minor=True))
    rv, rb = TwkReader(twk_v), TwkReader(twk_b)
    recs_v, recs_b = list(rv.records()), list(rb.records())
    assert len(recs_v) == len(recs_b) > 0
    flipped = 0
    for a, b in zip(recs_v, recs_b):
        assert (a.rid, a.pos, a.ac, a.gt_flipped, a.gt_phase) == \
            (b.rid, b.pos, b.ac, b.gt_flipped, b.gt_phase)
        np.testing.assert_array_equal(a.decode_codes(), b.decode_codes())
        flipped += a.gt_flipped
    assert flipped > 0, "test data produced no flipped sites"
    rv.close()
    rb.close()


def test_bcf_contig_idx_remap(tmp_path):
    """##contig lines with explicit IDX= in non-appearance order: record
    rids refer to the IDX dictionary (BCF2 spec 6.2.1) and must map
    back to the right contig names."""
    header_text = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
        "##contig=<ID=chrA,length=1000,IDX=5>\n"
        "##contig=<ID=chrB,length=1000,IDX=3>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS0\tS1\n")
    gt = np.array([[2, 4], [4, 4]], np.int32)   # 0|1, 1|1
    # rid 5 = chrA (appearance 0), rid 3 = chrB (appearance 1)
    sites = [(5, 100, "A", "C", gt), (3, 200, "G", "T", gt)]
    bcf = str(tmp_path / "idx.bcf")
    write_bcf(bcf, header_text, sites, 2, gt_key=1)
    rd = BcfReader(bcf)
    got = list(rd.sites())
    names = [rd.header.contigs[s.rid].name for s in got]
    assert names == ["chrA", "chrB"]
    assert [s.pos for s in got] == [100, 200]


def test_bcf_contig_idx_remap_raw_path(tmp_path):
    """Same remap through the fused native scanner path (raw=True)."""
    header_text = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
        "##contig=<ID=chrA,length=1000,IDX=1>\n"
        "##contig=<ID=chrB,length=1000,IDX=0>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS0\tS1\n")
    gt = np.array([[2, 4], [4, 4]], np.int32)
    sites = [(1, 100, "A", "C", gt), (0, 200, "G", "T", gt)]
    bcf = str(tmp_path / "idxraw.bcf")
    write_bcf(bcf, header_text, sites, 2, gt_key=1)
    rd = BcfReader(bcf)
    got = list(rd.sites(raw=True))
    names = [rd.header.contigs[s.rid].name for s in got]
    assert names == ["chrA", "chrB"]


def test_bcf_contig_idx_remap_through_import(tmp_path):
    """The production import path (native chunked fast path included)
    must apply the ##contig IDX= remap — raw chunk rids previously
    bypassed BcfReader._map_rid and landed on the wrong contig."""
    from tomahawk_tpu.io.importer import ImportSettings, import_vcf
    from tomahawk_tpu.io.twk import TwkReader
    header_text = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
        "##contig=<ID=chrA,length=100000,IDX=1>\n"
        "##contig=<ID=chrB,length=100000,IDX=0>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(f"S{i}" for i in range(8)) + "\n")
    rng = np.random.default_rng(3)
    sites = []
    for k in range(12):   # chrA sites carry raw rid 1
        g = ((rng.integers(0, 2, (8, 2)) + 1) << 1).astype(np.int32)
        sites.append((1, 100 + 50 * k, "A", "C", g))
    for k in range(12):   # chrB sites carry raw rid 0
        g = ((rng.integers(0, 2, (8, 2)) + 1) << 1).astype(np.int32)
        sites.append((0, 100 + 50 * k, "G", "T", g))
    bcf = str(tmp_path / "idx.bcf")
    write_bcf(bcf, header_text, sites, 8, gt_key=1)
    twk = str(tmp_path / "idx.twk")
    import_vcf(ImportSettings(input=bcf, output=twk,
                              remove_univariate=False))
    r = TwkReader(twk)
    names = {c.idx: c.name for c in r.header.contigs}
    by_contig = {}
    for blk in r.blocks():
        for rec in blk.rcds:
            by_contig.setdefault(names[rec.rid], []).append(rec.alleles)
    assert set(by_contig) == {"chrA", "chrB"}
    assert len(by_contig["chrA"]) == 12 and len(by_contig["chrB"]) == 12
    # identity, not just counts: chrA sites are A->C, chrB are G->T
    from tomahawk_tpu.io.constants import BASE_MAP
    ac = (BASE_MAP["A"] << 4) | BASE_MAP["C"]
    gt = (BASE_MAP["G"] << 4) | BASE_MAP["T"]
    assert all(a == ac for a in by_contig["chrA"]), "chrA/chrB swapped"
    assert all(a == gt for a in by_contig["chrB"])


def test_bcf_quoted_description_does_not_fabricate_idx(tmp_path):
    """Commas and 'IDX=' inside quoted Description strings must not be
    parsed as dictionary keys (quote-aware ##line splitting)."""
    header_text = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="geno,IDX=7">\n'
        '##contig=<ID=chr1,length=1000,Description="alias,IDX=9">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS0\tS1\n")
    gt = np.array([[2, 4], [4, 4]], np.int32)
    bcf = str(tmp_path / "q.bcf")
    write_bcf(bcf, header_text, [(0, 100, "A", "C", gt)], 2, gt_key=1)
    rd = BcfReader(bcf)
    assert rd._rid_map is None, "quoted IDX= fabricated a contig remap"
    assert rd._gt_key == 1
    got = list(rd.sites())
    assert [s.pos for s in got] == [100]
    assert rd.header.contigs[got[0].rid].name == "chr1"


def test_bcf_escaped_quote_in_description(tmp_path):
    r"""A backslash-escaped quote inside a Description must not
    desynchronize the quote-aware splitter (VCF 4.x allows \" in
    header strings); keys after it still parse."""
    header_text = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,'
        'Description="say \\"hi\\", ok">\n'
        '##contig=<ID=chr1,length=1000>\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS0\tS1\n")
    gt = np.array([[2, 4], [4, 4]], np.int32)
    bcf = str(tmp_path / "esc.bcf")
    write_bcf(bcf, header_text, [(0, 100, "A", "C", gt)], 2, gt_key=1)
    rd = BcfReader(bcf)
    assert rd._gt_key == 1
    assert [s.pos for s in rd.sites()] == [100]


def test_bcf_partial_contig_idx_rejected(tmp_path):
    """IDX= on some but not all ##contig lines is a header error (spec:
    all-or-none), reported at open time with a clear message."""
    from tomahawk_tpu.io.errors import CorruptFileError
    header_text = (
        "##fileformat=VCFv4.2\n"
        "##FORMAT=<ID=GT,Number=1,Type=String>\n"
        "##contig=<ID=chr1,length=1000,IDX=1>\n"
        "##contig=<ID=chr2,length=1000>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS0\tS1\n")
    gt = np.array([[2, 4], [4, 4]], np.int32)
    bcf = str(tmp_path / "partial.bcf")
    write_bcf(bcf, header_text, [(0, 100, "A", "C", gt)], 2, gt_key=1)
    with pytest.raises(CorruptFileError, match="all or none"):
        BcfReader(bcf)
