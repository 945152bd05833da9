"""Edge cases of the bulk (chunked) importers: every irregular line
must take the exact fallback path and produce the same records as the
pure single-site pipeline."""

import gzip
import os

import numpy as np
import pytest

import tomahawk_tpu.io.importer as imp
from tomahawk_tpu.io.importer import ImportSettings, import_vcf
from tomahawk_tpu.io.twk import TwkReader

HDR = ("##fileformat=VCFv4.2\n"
       "##contig=<ID=1,length=100000>\n"
       "##contig=<ID=2,length=100000>\n"
       '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
       '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="D">\n')


def _vcf(path, lines, n_samples):
    with open(path, "w") as fh:
        fh.write(HDR)
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + "\t".join(f"s{i}" for i in range(n_samples)) + "\n")
        fh.writelines(ln + "\n" for ln in lines)


def _records(path, tmp_path, name, **kw):
    out = str(tmp_path / f"{name}.twk")
    stats = import_vcf(ImportSettings(input=path, output=out, **kw))
    with TwkReader(out) as r:
        return list(r.records()), stats


def _eq(recs_a, recs_b):
    assert len(recs_a) == len(recs_b)
    for x, y in zip(recs_a, recs_b):
        for f in ("pos", "rid", "ac", "an", "n_het", "n_hom", "alleles",
                  "gt_ptype", "gt_phase", "gt_missing"):
            assert getattr(x, f) == getattr(y, f), (f, x.pos)
        assert np.array_equal(x.gt_runs, y.gt_runs), x.pos
        assert abs(x.hwe - y.hwe) < 1e-12


def test_irregular_lines_fall_back_consistently(tmp_path):
    """GT with subfields, multi-digit alleles, haploid rows, no-GT
    FORMAT, multi-allelic, non-SNP, missing calls, duplicate
    positions, and contig switches — chunked output must equal the
    non-chunked single-site path record-for-record."""
    n = 6
    lines = [
        "1\t100\t.\tA\tC\t9\tPASS\t.\tGT\t0|1\t1|1\t0|0\t0|1\t1|0\t0|0",
        # GT:DP subfields break the fixed stride
        "1\t200\t.\tG\tT\t9\tPASS\t.\tGT:DP\t0|1:3\t1|1:5\t0|0:2\t"
        "0|1:9\t1|0:1\t0|0:7",
        # '/' separators and missing calls
        "1\t300\t.\tT\tA\t9\tPASS\t.\tGT\t./.\t0/1\t1/1\t0/0\t0/1\t1/0",
        # multiallelic: dropped as not biallelic
        "1\t400\t.\tA\tC,G\t9\tPASS\t.\tGT\t0|1\t0|2\t0|0\t1|2\t0|0\t0|1",
        # allele index > 1 with single ALT (counts as alt)
        "1\t500\t.\tC\tG\t9\tPASS\t.\tGT\t0|1\t0|1\t0|0\t1|1\t0|0\t0|1",
        # non-SNP ref
        "1\t600\t.\tAT\tG\t9\tPASS\t.\tGT\t0|1\t0|1\t0|0\t1|1\t0|0\t0|1",
        # haploid row: dropped as mixed ploidy
        "1\t700\t.\tA\tG\t9\tPASS\t.\tGT\t0\t0|1\t0|0\t1|1\t0|0\t0|1",
        # duplicate consecutive position
        "1\t800\t.\tA\tG\t9\tPASS\t.\tGT\t0|1\t0|1\t0|0\t1|1\t0|0\t0|1",
        "1\t800\t.\tA\tG\t9\tPASS\t.\tGT\t1|1\t0|1\t0|0\t1|1\t0|0\t0|1",
        # no GT in FORMAT
        "1\t900\t.\tA\tG\t9\tPASS\t.\tDP\t3\t5\t2\t9\t1\t7",
        # contig switch
        "2\t100\t.\tA\tG\t9\tPASS\t.\tGT\t0|1\t0|1\t0|0\t1|1\t0|1\t0|1",
    ]
    vcf = str(tmp_path / "edge.vcf")
    _vcf(vcf, lines, n)

    chunked, st1 = _records(vcf, tmp_path, "chunked", threshold_miss=0.5)

    # compare against the pure single-site path (chunked importer
    # disabled via a subclass that fails import_vcf's exact type check)
    import tomahawk_tpu.io.importer as imp
    from tomahawk_tpu.io.vcf import VcfReader

    class PlainReader(VcfReader):
        pass

    orig_reader = imp.VcfReader

    class _Factory:
        def __call__(self, path):
            return PlainReader(path)

    imp.VcfReader = _Factory()
    try:
        plain, st2 = _records(vcf, tmp_path, "plain", threshold_miss=0.5)
    finally:
        imp.VcfReader = orig_reader
    _eq(chunked, plain)
    assert st1.filtered == st2.filtered

    # and block size must not change record content
    rerun, _ = _records(vcf, tmp_path, "rerun", threshold_miss=0.5,
                        block_size=2)
    _eq(chunked, rerun)

    kept_pos = [r.pos for r in chunked]
    assert kept_pos == [99, 199, 299, 499, 799, 99]
    assert st1.filtered[6] == 1     # not biallelic
    assert st1.filtered[7] == 1     # not SNP
    assert st1.filtered[3] >= 1     # mixed ploidy (haploid row)
    assert st1.filtered[9] == 1     # duplicate position
    # record content spot-checks
    assert chunked[1].pos == 199 and chunked[1].ac == 5
    assert chunked[2].gt_missing and chunked[2].an == 2
    assert chunked[-1].rid == 1


def test_chunk_boundaries_are_invisible(tmp_path, monkeypatch):
    """Tiny read sizes force carry/re-feed paths; output must not
    change."""
    import tomahawk_tpu.io.importer as imp
    from test_importer import make_vcf
    vcf = str(tmp_path / "b.vcf")
    make_vcf(vcf, n_samples=23, n_sites=60, seed=8, miss_frac=0.05,
             contigs=("20", "21"))
    want, _ = _records(vcf, tmp_path, "full", threshold_miss=0.5)

    monkeypatch.setattr(imp, "_CHUNK_BYTES", 777)
    got, _ = _records(vcf, tmp_path, "tiny", threshold_miss=0.5)
    monkeypatch.undo()
    _eq(got, want)


def test_gzip_input_chunked(tmp_path):
    from test_importer import make_vcf
    vcf = str(tmp_path / "g.vcf")
    make_vcf(vcf, n_samples=19, n_sites=40, seed=9, miss_frac=0.03)
    gz = str(tmp_path / "g.vcf.gz")
    with open(vcf, "rb") as fi, gzip.open(gz, "wb") as fo:
        fo.write(fi.read())
    a, _ = _records(vcf, tmp_path, "plain", threshold_miss=0.5)
    b, _ = _records(gz, tmp_path, "gz", threshold_miss=0.5)
    _eq(a, b)


def test_randomized_irregular_lines(tmp_path):
    """Randomized soak of the batch importer: body lines drawn from a
    mix of clean, subfield, missing, multiallelic, non-SNP, haploid,
    duplicate-position and no-GT shapes must produce exactly the plain
    single-site path's records, for several seeds."""
    import tomahawk_tpu.io.importer as imp
    from tomahawk_tpu.io.vcf import VcfReader

    rng = np.random.default_rng(2026)
    n = 9

    def line(contig, pos, kind):
        if kind == "clean":
            gts = "\t".join(f"{rng.integers(0, 2)}|{rng.integers(0, 2)}"
                            for _ in range(n))
            return f"{contig}\t{pos}\t.\tA\tC\t9\tPASS\t.\tGT\t{gts}"
        if kind == "subfield":
            gts = "\t".join(
                f"{rng.integers(0, 2)}/{rng.integers(0, 2)}:"
                f"{rng.integers(0, 99)}" for _ in range(n))
            return f"{contig}\t{pos}\t.\tG\tT\t9\tPASS\t.\tGT:DP\t{gts}"
        if kind == "missing":
            gts = "\t".join("./." if rng.random() < 0.4 else
                            f"{rng.integers(0, 2)}|{rng.integers(0, 2)}"
                            for _ in range(n))
            return f"{contig}\t{pos}\t.\tT\tG\t9\tPASS\t.\tGT\t{gts}"
        if kind == "multi":
            gts = "\t".join(f"{rng.integers(0, 3)}|{rng.integers(0, 3)}"
                            for _ in range(n))
            return f"{contig}\t{pos}\t.\tA\tC,G\t9\tPASS\t.\tGT\t{gts}"
        if kind == "nonsnp":
            gts = "\t".join(f"{rng.integers(0, 2)}|{rng.integers(0, 2)}"
                            for _ in range(n))
            return f"{contig}\t{pos}\t.\tAT\tG\t9\tPASS\t.\tGT\t{gts}"
        if kind == "haploid":
            gts = "\t".join(str(rng.integers(0, 2)) if j == 0 else
                            f"{rng.integers(0, 2)}|{rng.integers(0, 2)}"
                            for j in range(n))
            return f"{contig}\t{pos}\t.\tA\tG\t9\tPASS\t.\tGT\t{gts}"
        return f"{contig}\t{pos}\t.\tA\tG\t9\tPASS\t.\tDP\t" + \
            "\t".join(str(rng.integers(0, 60)) for _ in range(n))

    kinds = ["clean", "clean", "clean", "subfield", "missing", "multi",
             "nonsnp", "haploid", "nogt"]
    for trial in range(4):
        lines = []
        pos = 50
        for contig in ("1", "2"):
            for _ in range(40):
                pos += int(rng.integers(1, 60))
                k = kinds[rng.integers(0, len(kinds))]
                lines.append(line(contig, pos, k))
                if rng.random() < 0.15:     # duplicate position
                    lines.append(line(contig, pos, "clean"))
        vcf = str(tmp_path / f"r{trial}.vcf")
        _vcf(vcf, lines, n)

        chunked, st1 = _records(vcf, tmp_path, f"c{trial}",
                                threshold_miss=0.5)

        class PlainReader(VcfReader):
            pass

        orig = imp.VcfReader
        imp.VcfReader = lambda path: PlainReader(path)
        try:
            plain, st2 = _records(vcf, tmp_path, f"p{trial}",
                                  threshold_miss=0.5)
        finally:
            imp.VcfReader = orig
        _eq(chunked, plain)
        assert st1.filtered == st2.filtered, trial
        assert st1.n_total == st2.n_total and st1.n_kept == st2.n_kept


def test_multiworker_import_identical(tmp_path, monkeypatch):
    """workers > 1 fans chunk parsing out to a spawn pool; record
    streams, filter stats, and block layout must equal the serial run
    exactly for BOTH formats (order-dependent semantics: block cuts,
    duplicate-position filter)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_importer import make_vcf
    from test_bcf import _vcf_to_bcf

    vcf = str(tmp_path / "mw.vcf")
    make_vcf(vcf, n_samples=30, n_sites=400, seed=17, miss_frac=0.05,
             contigs=("20", "21"))
    bcf = str(tmp_path / "mw.bcf")
    _vcf_to_bcf(vcf, bcf)
    # tiny chunks so the pool really sees many submissions
    monkeypatch.setattr(imp, "_CHUNK_BYTES", 4096)
    for path in (vcf, bcf):
        serial, st1 = _records(path, tmp_path,
                               "s" + os.path.basename(path),
                               workers=1, block_size=32)
        pooled, st2 = _records(path, tmp_path,
                               "p" + os.path.basename(path),
                               workers=2, block_size=32)
        _eq(serial, pooled)
        assert st1.filtered == st2.filtered
        assert st1.n_total == st2.n_total and st1.n_kept == st2.n_kept
