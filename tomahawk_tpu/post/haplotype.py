"""Extract haplotype strings for a region (reference: lib/haplotype.h):
slice the .twk archive on an interval, transpose the variant-major
genotype matrix to haplotype-major, and emit 2N haplotype sequences as
FASTA or a TSV matrix. Missing alleles are emitted as '.'."""

import sys

import numpy as np

from ..io.twk import TwkReader
from .intervals import parse_intervals, blocks_for_intervals


def haplotype(input_path: str, output: str, interval: str,
              fmt: str = "fasta", out_stream=None):
    reader = TwkReader(input_path)
    ivals = parse_intervals([interval], reader.header)
    iv = ivals[0]
    blocks = blocks_for_intervals(reader, [interval])

    cols = []      # per-variant allele codes [2N]
    positions = []
    for b in blocks:
        blk = reader.read_block(b)
        for rec in blk.rcds:
            if rec.rid != iv.rid or not (iv.start <= rec.pos <= iv.end):
                continue
            codes = rec.decode_codes()
            ca, cb = codes >> 2, codes & 0b11
            hap = np.empty(2 * len(codes), np.uint8)
            hap[0::2] = ca
            hap[1::2] = cb
            cols.append(hap)
            positions.append(rec.pos)
    reader.close()

    n_samples = reader.header.n_samples
    stream = out_stream
    close = False
    if stream is None:
        if output in ("-", "", None):
            stream = sys.stdout
        else:
            stream = open(output, "w")
            close = True

    if not cols:
        if close:
            stream.close()
        return 0

    mat = np.stack(cols)            # [V, 2N]
    hapmat = np.ascontiguousarray(mat.T)     # [2N, V]
    # code -> ASCII in one fancy-index over the whole matrix; rows then
    # emit via tobytes (no per-allele Python strings)
    byte_lut = np.frombuffer(b"01.", np.uint8)
    ascii_mat = byte_lut[hapmat]

    if fmt == "fasta":
        for h in range(ascii_mat.shape[0]):
            name = reader.header.samples[h // 2]
            stream.write(f">{name}_{h % 2 + 1}\n"
                         + ascii_mat[h].tobytes().decode() + "\n")
    else:  # tsv matrix: one row per haplotype, one column per variant
        stream.write("haplotype\t" +
                     "\t".join(str(p + 1) for p in positions) + "\n")
        V = ascii_mat.shape[1]
        inter = np.empty((ascii_mat.shape[0], 2 * V), np.uint8)
        inter[:, 0::2] = ord("\t")
        inter[:, 1::2] = ascii_mat
        for h in range(inter.shape[0]):
            name = reader.header.samples[h // 2]
            stream.write(f"{name}_{h % 2 + 1}"
                         + inter[h].tobytes().decode() + "\n")
    if close:
        stream.close()
    return hapmat.shape[1]
