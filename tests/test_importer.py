import gzip

import numpy as np
import pytest

from tomahawk_tpu.io.importer import ImportSettings, import_vcf
from tomahawk_tpu.io.twk import TwkReader

from oracles import hwe_oracle

VCF_HEADER = """##fileformat=VCFv4.2
##contig=<ID=20,length=63025520>
##contig=<ID=21,length=48129895>
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{samples}
"""


def make_vcf(path, n_samples=50, n_sites=40, seed=0, miss_frac=0.05,
             phased=True, contigs=("20", "21")):
    rng = np.random.default_rng(seed)
    samples = "\t".join(f"S{i}" for i in range(n_samples))
    lines = [VCF_HEADER.format(samples=samples)]
    sep = "|" if phased else "/"
    truth = []
    pos = 100
    for i in range(n_sites):
        chrom = contigs[i * len(contigs) // n_sites]
        pos += int(rng.integers(50, 500))
        maf = rng.uniform(0.05, 0.5)
        a = (rng.random(n_samples) < maf).astype(int)
        b = (rng.random(n_samples) < maf).astype(int)
        gts = []
        codes = []
        for j in range(n_samples):
            if rng.random() < miss_frac:
                gts.append(f".{sep}.")
                codes.append((2 << 2) | 2)
            else:
                gts.append(f"{a[j]}{sep}{b[j]}")
                codes.append((a[j] << 2) | b[j])
        lines.append(f"{chrom}\t{pos}\t.\tA\tC\t100\tPASS\t.\tGT\t"
                     + "\t".join(gts) + "\n")
        truth.append((chrom, pos - 1, np.array(codes, np.uint8)))
    with open(path, "w") as fh:
        fh.writelines(lines)
    return truth


def test_import_roundtrip(tmp_path):
    vcf_path = str(tmp_path / "test.vcf")
    truth = make_vcf(vcf_path, n_samples=60, n_sites=30, miss_frac=0.04)
    out = str(tmp_path / "test.twk")
    settings = ImportSettings(input=vcf_path, output=out,
                              block_size=7, threshold_miss=0.5)
    stats = import_vcf(settings)
    assert stats.n_total == 30

    with TwkReader(out) as r:
        assert r.header.n_samples == 60
        recs = list(r.records())
        kept = {(rec.rid, rec.pos) for rec in recs}
        rid_map = {"20": 0, "21": 1}
        truth_by_key = {(rid_map[c], p): codes for c, p, codes in truth}
        for rec in recs:
            codes = truth_by_key[(rec.rid, rec.pos)]
            np.testing.assert_array_equal(rec.decode_codes(), codes)
            ca, cb = codes >> 2, codes & 3
            assert rec.ac == int((ca == 1).sum() + (cb == 1).sum())
            assert rec.an == int((ca == 2).sum() + (cb == 2).sum())
            full = (ca != 2) & (cb != 2)
            n_het = int((((ca == 0) & (cb == 1)) |
                         ((ca == 1) & (cb == 0)))[full].sum())
            n_hom = int(((ca == 1) & (cb == 1))[full].sum())
            n_rr = int(((ca == 0) & (cb == 0))[full].sum())
            assert rec.n_het == n_het
            assert rec.n_hom == n_hom
            want_hwe = hwe_oracle(n_het, n_rr, n_hom)
            assert abs(rec.hwe - want_hwe) < 1e-9
            assert rec.gt_phase  # phased VCF

        # block structure: max 7 records, single rid per block
        for ent in r.index.ent:
            assert ent.n <= 7


def test_import_filters(tmp_path):
    vcf_path = str(tmp_path / "filt.vcf")
    samples = "\t".join(f"S{i}" for i in range(6))
    body = [VCF_HEADER.format(samples=samples)]
    # invariant site (all hom-ref) -> filtered
    body.append("20\t100\t.\tA\tC\t.\t.\t.\tGT\t" +
                "\t".join(["0|0"] * 6) + "\n")
    # multi-allelic -> filtered
    body.append("20\t200\t.\tA\tC,G\t.\t.\t.\tGT\t" +
                "\t".join(["0|1"] * 6) + "\n")
    # indel -> filtered
    body.append("20\t300\t.\tAT\tC\t.\t.\t.\tGT\t" +
                "\t".join(["0|1"] * 6) + "\n")
    # good site
    body.append("20\t400\t.\tA\tC\t.\t.\t.\tGT\t"
                "0|1\t1|0\t0|0\t1|1\t0|1\t0|0\n")
    # duplicate of previous position -> filtered
    body.append("20\t400\t.\tA\tG\t.\t.\t.\tGT\t"
                "0|1\t1|0\t0|0\t1|1\t0|1\t0|0\n")
    # too much missingness -> filtered
    body.append("20\t500\t.\tA\tC\t.\t.\t.\tGT\t"
                ".|.\t.|.\t.|.\t.|.\t0|1\t0|0\n")
    with open(vcf_path, "w") as fh:
        fh.writelines(body)
    out = str(tmp_path / "filt.twk")
    stats = import_vcf(ImportSettings(input=vcf_path, output=out))
    assert stats.n_total == 6
    assert stats.n_kept == 1
    with TwkReader(out) as r:
        recs = list(r.records())
        assert len(recs) == 1
        assert recs[0].pos == 399


def test_import_unphased_and_gz(tmp_path):
    vcf_path = str(tmp_path / "u.vcf.gz")
    samples = "\t".join(f"S{i}" for i in range(8))
    body = [VCF_HEADER.format(samples=samples)]
    body.append("20\t100\t.\tA\tC\t.\t.\t.\tGT\t"
                "0/1\t1/0\t0/0\t1/1\t0/1\t0/0\t1/1\t0/1\n")
    with gzip.open(vcf_path, "wt") as fh:
        fh.writelines(body)
    out = str(tmp_path / "u.twk")
    stats = import_vcf(ImportSettings(input=vcf_path, output=out))
    assert stats.n_kept == 1
    with TwkReader(out) as r:
        rec = next(r.records())
        assert not rec.gt_phase


def test_undeclared_contig_archive_is_consistent(tmp_path):
    """Body lines on a contig the VCF header never declared: the
    importer appends an implicit contig, and the written archive's
    header must resolve the records' rids (the header is written before
    the blocks, so the writer rebuilds it at close when it grew)."""
    vcf = str(tmp_path / "u.vcf")
    with open(vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n"
                 "##contig=<ID=1,length=1000000>\n"
                 '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
                 "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + "\t".join(f"s{i}" for i in range(8)) + "\n")
        for contig, base in (("1", 100), ("chrX", 500)):
            for k in range(6):
                gts = "\t".join("0|1" if (k + j) % 3 else "1|1"
                                for j in range(8))
                fh.write(f"{contig}\t{base + 40 * k}\t.\tA\tC\t9\tPASS"
                         f"\t.\tGT\t{gts}\n")
    twk = str(tmp_path / "u.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=4))
    with TwkReader(twk) as r:
        names = [c.name for c in r.header.contigs]
        assert "chrX" in names
        recs = list(r.records())
        assert len(recs) == 12
        rids = sorted({x.rid for x in recs})
        for rid in rids:
            assert 0 <= rid < len(names)
        assert names[recs[-1].rid] == "chrX"
        # per-contig rollups cover the implicit contig too
        metas = [m for m in r.index.ent_meta if m.nn > 0]
        assert len(metas) == 2


def test_filter_attribution_no_format_and_no_gt(tmp_path):
    """Reference counter attribution (importer.cpp:273-280): a line
    with FORMAT but no leading GT -> 'No genotypes' [4]; a line with
    no FORMAT column at all -> 'No FORMAT' [5]."""
    n = 6
    samples = "\t".join(f"S{i}" for i in range(n))
    lines = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=20,length=100000>",
        f"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{samples}",
        "20\t100\t.\tA\tC\t.\tPASS\t.\tGT\t" +
        "\t".join(["0|1", "1|1", "0|0"] * (n // 3)),  # kept
        "20\t200\t.\tA\tC\t.\tPASS\t.\tDP\t" +
        "\t".join(["13"] * n),                        # No genotypes
        "20\t300\t.\tA\tC\t.\tPASS\t.",               # No FORMAT
    ]
    vcf = tmp_path / "fmt.vcf"
    vcf.write_text("\n".join(lines) + "\n")
    twk = str(tmp_path / "fmt.twk")
    stats = import_vcf(ImportSettings(input=str(vcf), output=twk))
    assert stats.n_kept == 1
    assert stats.filtered[4] == 1, "FORMAT-without-GT -> 'No genotypes'"
    assert stats.filtered[5] == 1, "missing FORMAT -> 'No FORMAT'"
    assert stats.filtered[3] == 0


def test_import_from_stdin(tmp_path, monkeypatch):
    """import -i - reads the VCF body from stdin (htslib hts_open('-')
    semantics) and must produce the same archive as a file import."""
    import io as _io
    import sys
    vcf = str(tmp_path / "s.vcf")
    make_vcf(vcf, n_samples=12, n_sites=10, miss_frac=0.0, seed=5)
    ref_twk = str(tmp_path / "file.twk")
    import_vcf(ImportSettings(input=vcf, output=ref_twk))

    monkeypatch.setattr(sys, "stdin", _io.StringIO(open(vcf).read()))
    stdin_twk = str(tmp_path / "stdin.twk")
    import_vcf(ImportSettings(input="-", output=stdin_twk))

    from tomahawk_tpu.io.twk import TwkReader
    ra, rb = TwkReader(ref_twk), TwkReader(stdin_twk)
    assert ra.index.n == rb.index.n
    for ba, bb in zip(ra.blocks(), rb.blocks()):
        assert ba.n == bb.n
        for x, y in zip(ba.rcds, bb.rcds):
            assert (x.pos, x.rid, x.ac, x.an) == (y.pos, y.rid, y.ac, y.an)
            assert np.array_equal(x.gt_runs, y.gt_runs)
