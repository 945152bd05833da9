#!/usr/bin/env python
"""Import-rate benchmark: raw VCF vs gzipped VCF vs (BGZF) BCF.

Generates one synthetic cohort, materializes it in all three container
formats, and times `import_vcf` end-to-end (.twk out). The BCF is
re-framed into <=64 KB gzip members like htslib's BGZF, so the
native streaming inflater's member hopping is actually exercised.

Usage: python tools/bench_import.py [n_samples] [n_sites]
Reference baseline: 23.1k sites/s on 8 threads (1KGP3 chr6 BCF,
/root/reference/docs/tutorial.md:97-99).
"""

import gzip
import os
import struct
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_vcf(path, n_samples, n_sites, seed=3):
    rng = np.random.default_rng(seed)
    hdr = ["##fileformat=VCFv4.2",
           "##contig=<ID=chr1,length=300000000>",
           "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"G\">",
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
           + "\t".join(f"S{i}" for i in range(n_samples))]
    # vectorized row assembly: per site build the GT byte block from a
    # lookup of the four "a|b" cell strings
    cells = np.array([b"\t0|0", b"\t0|1", b"\t1|0", b"\t1|1"], "S4")
    pos = 0
    with open(path, "wb") as f:
        f.write(("\n".join(hdr) + "\n").encode())
        for s in range(n_sites):
            pos += int(rng.integers(50, 300))
            maf = min(float(rng.beta(0.5, 2.0)) * 0.5 + 1e-3, 0.5)
            gt = rng.random((n_samples, 2)) < maf
            code = gt[:, 0] * 2 + gt[:, 1]
            row = cells[code].tobytes()
            f.write(f"chr1\t{pos}\t.\tA\tG\t.\tPASS\t.\tGT".encode()
                    + row + b"\n")


def vcf_to_bcf(vcf_path, bcf_path, bgzf: bool):
    from tomahawk_tpu.io.bcf import write_bcf
    from tomahawk_tpu.io.vcf import VcfReader
    vr = VcfReader(vcf_path)
    header_text = vr.header.literals + "#CHROM\tPOS\tID\tREF\tALT\t" \
        "QUAL\tFILTER\tINFO\tFORMAT\t" \
        + "\t".join(vr.header.samples) + "\n"
    ids = ["PASS"]
    for line in header_text.splitlines():
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

    def sites():
        for site in vr.sites():
            ca = (site.codes >> 2).astype(np.int32)
            cb = (site.codes & 3).astype(np.int32)
            va = np.where(ca == 2, 0, (ca + 1) << 1)
            vb = np.where(cb == 2, site.phase,
                          ((cb + 1) << 1) | site.phase)
            yield (site.rid, site.pos, site.ref, site.alt,
                   np.stack([va, vb], axis=1))

    write_bcf(bcf_path, header_text, sites(), n, gt_key)
    vr.close()
    if bgzf:
        raw = gzip.open(bcf_path, "rb").read()
        with open(bcf_path, "wb") as f:
            for i in range(0, len(raw), 65000):
                f.write(gzip.compress(raw[i:i + 65000], 6))


def main():
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 2504
    n_sites = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    from tomahawk_tpu.io.importer import ImportSettings, import_vcf

    d = tempfile.mkdtemp()
    vcf = os.path.join(d, "in.vcf")
    t0 = time.time()
    build_vcf(vcf, n_samples, n_sites)
    print(f"# vcf built in {time.time() - t0:.1f}s "
          f"({os.path.getsize(vcf) >> 20} MB)", file=sys.stderr)
    vcfgz = os.path.join(d, "in.vcf.gz")
    t0 = time.time()
    with open(vcf, "rb") as fi, open(vcfgz, "wb") as fo:
        while True:
            b = fi.read(65000)
            if not b:
                break
            fo.write(gzip.compress(b, 6))        # BGZF-like members
    print(f"# vcf.gz built in {time.time() - t0:.1f}s "
          f"({os.path.getsize(vcfgz) >> 20} MB)", file=sys.stderr)
    bcf = os.path.join(d, "in.bcf")
    t0 = time.time()
    vcf_to_bcf(vcf, bcf, bgzf=True)
    print(f"# bcf (bgzf-framed) built in {time.time() - t0:.1f}s "
          f"({os.path.getsize(bcf) >> 20} MB)", file=sys.stderr)

    for name, path in (("vcf-raw", vcf), ("vcf-gz", vcfgz),
                       ("bcf", bcf)):
        out = os.path.join(d, name + ".twk")
        t0 = time.time()
        import_vcf(ImportSettings(input=path, output=out))
        dt = time.time() - t0
        print(f"{name:8s} {n_sites / dt:10,.0f} sites/s  ({dt:.1f}s, "
              f"{n_samples} samples x {n_sites} sites)")


if __name__ == "__main__":
    main()
