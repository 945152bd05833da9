"""Corrupt-input robustness for every archive type.

The reference error-checks each magic/marker on open (reference:
lib/two_reader.cpp:98-151); these tests require the same property of
our readers, as typed CorruptFileError (a ValueError) — never a bare
AssertionError, struct.error, zstd exception, or numpy shape error —
under (a) truncation at every boundary region and (b) single-byte
corruption at positions covering every file section. A corrupted file
may still parse cleanly (e.g. a flipped bit inside record payload
bytes that stays structurally valid); what must never happen is an
unclean exception type.
"""

import io

import numpy as np
import pytest

from tomahawk_tpu.compute.engine import CalcSettings, compute_ld
from tomahawk_tpu.io.errors import CorruptFileError
from tomahawk_tpu.io.importer import ImportSettings, import_vcf
from tomahawk_tpu.io.twk import TwkReader
from tomahawk_tpu.io.two import TwoReader
from tomahawk_tpu.post.aggregate import Twa, aggregate_two
from tomahawk_tpu.post.sort import sort_two

from test_importer import make_vcf

CLEAN = (CorruptFileError, ValueError, EOFError)


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    import jax
    d = tmp_path_factory.mktemp("corrupt")
    vcf = str(d / "in.vcf")
    make_vcf(vcf, n_samples=30, n_sites=40, seed=5, miss_frac=0.04,
             contigs=("20",))
    twk = str(d / "a.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=8))
    two = str(d / "a.two")
    with jax.default_device(jax.devices("cpu")[0]):
        compute_ld(CalcSettings(input=twk, output=two, min_r2=0.0,
                                min_p=1.0))
    sorted_two = str(d / "s.two")
    sort_two(two, sorted_two)
    twa = str(d / "a.twa")
    aggregate_two(two, twa, agg="r2", reduce="mean", xbins=50, ybins=50)
    return dict(twk=twk, two=two, sorted_two=sorted_two, twa=twa, dir=d)


def read_fully(kind, path):
    if kind == "twk":
        with TwkReader(path) as r:
            for blk in r.blocks():
                for rec in blk.rcds:
                    rec.decode_codes()
    elif kind in ("two", "sorted_two"):
        with TwoReader(path) as r:
            r.records()
    else:
        Twa.open(path)


def corrupt_positions(n: int):
    """Byte positions to fuzz: dense near head and tail (magic, header
    sizes, footer, EOF sentinel), strided through the middle (blocks,
    index)."""
    head = range(0, min(n, 64))
    tail = range(max(0, n - 64), n)
    mid = range(64, max(64, n - 64), max(1, (n - 128) // 200))
    return sorted(set(head) | set(tail) | set(mid))


@pytest.mark.parametrize("kind", ["twk", "two", "sorted_two", "twa"])
def test_single_byte_corruption_is_clean(files, kind):
    path = files[kind]
    raw = open(path, "rb").read()
    tmp = str(files["dir"] / f"fuzz_{kind}.bin")
    n_clean_errors = 0
    for pos in corrupt_positions(len(raw)):
        mutated = bytearray(raw)
        mutated[pos] ^= 0xFF
        with open(tmp, "wb") as fh:
            fh.write(mutated)
        try:
            read_fully(kind, tmp)
        except CLEAN:
            n_clean_errors += 1
        # any other exception type propagates and fails the test
    assert n_clean_errors > 0, "corruption was never detected at all"


@pytest.mark.parametrize("kind", ["twk", "two", "sorted_two", "twa"])
def test_truncation_is_clean(files, kind):
    path = files[kind]
    raw = open(path, "rb").read()
    tmp = str(files["dir"] / f"trunc_{kind}.bin")
    cuts = sorted(set(
        list(range(0, min(len(raw), 40))) +
        list(range(0, len(raw), max(1, len(raw) // 64))) +
        [len(raw) - 1]))
    for cut in cuts:
        with open(tmp, "wb") as fh:
            fh.write(raw[:cut])
        with pytest.raises(CLEAN):
            read_fully(kind, tmp)


def test_wrong_magic_types(files):
    """Opening the wrong file type fails with a magic error, not a
    misparse."""
    with pytest.raises(CLEAN, match="magic"):
        TwkReader(files["two"])
    with pytest.raises(CLEAN, match="magic"):
        TwoReader(files["twk"])
    with pytest.raises(CLEAN, match="magic"):
        Twa.open(files["two"])


def test_error_carries_path_and_offset(files):
    raw = bytearray(open(files["twk"], "rb").read())
    # stomp the first block marker (directly after header section):
    # find it via a clean reader first
    with TwkReader(files["twk"]) as r:
        foff = r.index.ent[0].foff
    raw[foff] ^= 0xFF
    tmp = str(files["dir"] / "marker.twk")
    with open(tmp, "wb") as fh:
        fh.write(raw)
    r = TwkReader(tmp)
    with pytest.raises(CorruptFileError) as ei:
        r.read_block(0)
    assert ei.value.path == tmp
    assert ei.value.offset == foff
    assert "marker" in str(ei.value)


def test_bcf_input_corruption_is_clean(files, tmp_path):
    """Corrupt/truncated BCF inputs fail with clean errors through the
    whole import pipeline (typed errors, ValueError, or gzip's own
    BadGzipFile — never struct.error/IndexError/segfault)."""
    import gzip as _gz
    import numpy as np
    from tomahawk_tpu.io.bcf import write_bcf

    n = 8
    rng = np.random.default_rng(3)
    sites = []
    pos = 50
    for _ in range(12):
        pos += int(rng.integers(5, 50))
        alt = rng.integers(0, 2, (n, 2))
        gt = (alt + 1) << 1 | 1
        sites.append((0, pos, "A", "C", gt))
    hdr = ("##fileformat=VCFv4.2\n##contig=<ID=1,length=100000>\n"
           '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
           + "\t".join(f"s{i}" for i in range(n)))
    bcf = str(tmp_path / "c.bcf")
    write_bcf(bcf, hdr, sites, n, gt_key=1)

    # sanity: clean import works
    import_vcf(ImportSettings(input=bcf,
                              output=str(tmp_path / "ok.twk")))

    raw = _gz.open(bcf, "rb").read()    # decompressed BCF payload
    ok_errors = CLEAN + (OSError,)      # gzip.BadGzipFile is OSError
    tmp = str(tmp_path / "fuzz.bcf")
    n_clean = 0
    for pos_b in corrupt_positions(len(raw)):
        mutated = bytearray(raw)
        mutated[pos_b] ^= 0xFF
        with _gz.open(tmp, "wb") as fh:
            fh.write(bytes(mutated))
        try:
            import_vcf(ImportSettings(
                input=tmp, output=str(tmp_path / "fuzz.twk")))
        except ok_errors:
            n_clean += 1
    for cut in range(0, len(raw), max(1, len(raw) // 32)):
        with _gz.open(tmp, "wb") as fh:
            fh.write(bytes(raw[:cut]))
        try:
            import_vcf(ImportSettings(
                input=tmp, output=str(tmp_path / "fuzz.twk")))
        except ok_errors:
            n_clean += 1
    assert n_clean > 0


def test_corrupt_rle_runs_rejected_by_plane_decode():
    """A crafted run length summing past n_samples must raise a typed
    error instead of writing past the plane rows (the native decoder
    now carries a capacity bound like twk_rle_decode)."""
    import numpy as np
    import pytest
    from tomahawk_tpu.io.errors import CorruptFileError
    from tomahawk_tpu.io.twk import Twk1Block, Twk1Record
    from tomahawk_tpu.ops.bitpack import block_to_planes

    n_samples = 40
    # one run claiming 2^24 ref-ref samples (word = run << 2 | sym)
    runs = np.array([(1 << 24) << 2], np.uint32)
    rec = Twk1Record(pos=100, rid=0, ac=0, an=0, n_het=0, n_hom=0,
                     gt_ptype=4, gt_missing=False, gt_runs=runs)
    blk = Twk1Block(rid=0)
    blk.add(rec)
    with pytest.raises((CorruptFileError, ValueError)):
        block_to_planes(blk, n_samples)
