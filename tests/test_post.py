import io

import numpy as np
import pytest

from tomahawk_tpu.compute.engine import CalcSettings, compute_ld
from tomahawk_tpu.compute.scalc import ScalcSettings, compute_single
from tomahawk_tpu.io.importer import ImportSettings, import_vcf
from tomahawk_tpu.io.twk import TwkReader
from tomahawk_tpu.io.two import TwoReader
from tomahawk_tpu.post.aggregate import Twa, aggregate_two
from tomahawk_tpu.post.concat import concat_two
from tomahawk_tpu.post.decay import decay, positional_decay
from tomahawk_tpu.post.haplotype import haplotype
from tomahawk_tpu.post.relationship import relationship
from tomahawk_tpu.post.sort import sort_two
from tomahawk_tpu.post.stats import stats_two

from test_importer import make_vcf


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Shared import+calc products for the post-processing tests."""
    d = tmp_path_factory.mktemp("post")
    vcf = str(d / "p.vcf")
    make_vcf(vcf, n_samples=40, n_sites=40, miss_frac=0.0, seed=11)
    twk = str(d / "p.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=8))
    two = str(d / "p.two")
    compute_ld(CalcSettings(input=twk, output=two, force_phased=True,
                            min_r2=0.02, batch_pairs=4))
    return d, twk, two


def test_sort(pipeline):
    d, twk, two = pipeline
    out = str(d / "sorted.two")
    n = sort_two(two, out, memory_limit_gb=0.0001)  # force multiple runs
    with TwoReader(two) as r:
        orig = r.records()
    with TwoReader(out) as r:
        got = r.records()
        assert r.index.state == 2  # TWK_IDX_SORTED
    assert n == len(orig) == len(got)
    key = np.lexsort((orig["packB"] >> 2, orig["packA"] >> 2,
                      orig["ridB"], orig["ridA"]))
    np.testing.assert_array_equal(got, orig[key])
    # sorted invariant on the full key (ridA, ridB, Apos)
    pos = (got["packA"] >> 2).astype(np.int64)
    same = (got["ridA"][:-1] == got["ridA"][1:]) & \
           (got["ridB"][:-1] == got["ridB"][1:])
    assert np.all(pos[:-1][same] <= pos[1:][same])


def test_sort_multiple_inputs(pipeline, tmp_path):
    """sort_two over a shard LIST must equal concat-then-sort record
    for record (the streaming merge_shards path, no concat temp)."""
    d, twk, two = pipeline
    cat = str(tmp_path / "cat.two")
    concat_two([two, two, two], cat)
    ref = str(tmp_path / "ref_sorted.two")
    sort_two(cat, ref, memory_limit_gb=0.0001)
    got = str(tmp_path / "multi_sorted.two")
    n = sort_two([two, two, two], got, memory_limit_gb=0.0001)
    with TwoReader(ref) as r:
        a = r.records()
    with TwoReader(got) as r:
        b = r.records()
        assert r.index.state == 2
    assert n == len(a) == len(b)
    np.testing.assert_array_equal(a, b)


def test_sort_multiple_inputs_rejects_mismatched_headers(pipeline,
                                                         tmp_path):
    d, twk, two = pipeline
    vcf2 = str(tmp_path / "other.vcf")
    make_vcf(vcf2, n_samples=24, n_sites=20, miss_frac=0.0, seed=3)
    twk2 = str(tmp_path / "other.twk")
    import_vcf(ImportSettings(input=vcf2, output=twk2, block_size=8))
    two2 = str(tmp_path / "other.two")
    compute_ld(CalcSettings(input=twk2, output=two2, force_phased=True,
                            min_r2=0.02))
    with pytest.raises(ValueError, match="sample list differs"):
        sort_two([two, two2], str(tmp_path / "bad.two"))


def test_concat(pipeline, tmp_path):
    d, twk, two = pipeline
    out = str(tmp_path / "cat.two")
    n = concat_two([two, two], out)
    with TwoReader(two) as r:
        orig = r.records()
    with TwoReader(out) as r:
        got = r.records()
    assert n == 2 * len(orig)
    np.testing.assert_array_equal(got[:len(orig)], orig)
    np.testing.assert_array_equal(got[len(orig):], orig)


def test_stats(pipeline):
    d, twk, two = pipeline
    buf = io.StringIO()
    res = stats_two(two, out=buf)
    with TwoReader(two) as r:
        recs = r.records()
    assert res["r2_cnt"].sum() == len(recs)
    assert res["cmatrix"].sum() == len(recs)
    # flag tally for SAME_CONTIG (bit 1)
    assert res["flags"][1] == int(
        ((recs["controller"] & 2) != 0).sum())


def test_decay(pipeline):
    d, twk, two = pipeline
    buf = io.StringIO()
    sums, cnts = decay(two, max_range=20000, n_bins=10, out=buf)
    with TwoReader(two) as r:
        recs = r.records()
    pos_a = (recs["packA"] >> 2).astype(np.int64)
    pos_b = (recs["packB"] >> 2).astype(np.int64)
    m = (recs["ridA"] == recs["ridB"]) & (pos_a < pos_b)
    assert cnts.sum() == int(m.sum())
    assert abs(sums.sum() - recs["R2"][m].sum()) < 1e-9
    lines = buf.getvalue().splitlines()
    assert lines[0] == "From\tTo\tMean\tFrequency"
    assert len(lines) == 11


def test_positional_decay(pipeline):
    d, twk, two = pipeline
    buf = io.StringIO()
    groups = positional_decay(two, out=buf)
    assert len(groups) >= 1
    assert len(buf.getvalue().splitlines()) == len(groups)


def test_aggregate_roundtrip(pipeline, tmp_path):
    d, twk, two = pipeline
    out = str(tmp_path / "agg.twa")
    twa = aggregate_two(two, out, agg="r2", reduce="count", xbins=32,
                        ybins=32, min_count=1)
    with TwoReader(two) as r:
        recs = r.records()
    assert twa.n_original == len(recs)
    assert twa.data.sum() == len(recs)   # count reduction, min_count=1
    # file round trip
    back = Twa.open(out)
    assert back.x == 32 and back.y == 32
    np.testing.assert_allclose(back.data, twa.data)
    assert back.n_original == len(recs)

    # mean reduction sanity: weighted mean of r2 preserved
    twa_mean = aggregate_two(two, "", agg="r2", reduce="mean", xbins=32,
                             ybins=32, min_count=1)
    tot = (twa_mean.data * twa.data).sum()
    assert abs(tot - recs["R2"].sum()) < 1e-6


def test_haplotype(pipeline, tmp_path):
    d, twk, two = pipeline
    with TwkReader(twk) as r:
        recs = list(r.records())
        n_samples = r.header.n_samples
    lo, hi = recs[0].pos + 1, recs[10].pos + 1
    buf = io.StringIO()
    n_var = haplotype(twk, "-", f"20:{lo}-{hi}", fmt="fasta",
                      out_stream=buf)
    assert n_var == 11
    lines = buf.getvalue().splitlines()
    assert len(lines) == 2 * 2 * n_samples
    assert lines[0].startswith(">S0_0")
    assert len(lines[1]) == n_var
    # verify first variant's alleles across haplotypes: FASTA emits the
    # variant's ref/alt base (reference fasta_lookup semantics)
    from tomahawk_tpu.io.constants import BASE_MAP_INV
    rec0 = recs[0]
    base = {0: BASE_MAP_INV[rec0.alleles >> 4],
            1: BASE_MAP_INV[rec0.alleles & 15], 2: "N"}
    codes = rec0.decode_codes()
    ca = codes >> 2
    assert lines[1][0] == base[int(ca[0])]


def test_relationship(pipeline):
    d, twk, two = pipeline
    buf = io.StringIO()
    kin = relationship(twk, out_stream=buf)
    with TwkReader(twk) as r:
        recs = list(r.records())
        n_samples = r.header.n_samples
    assert kin.shape == (n_samples, n_samples)
    np.testing.assert_allclose(np.diag(kin), 1.0)
    np.testing.assert_allclose(kin, kin.T)
    # brute-force oracle for a few pairs
    gmat = np.zeros((len(recs), n_samples), np.int8)
    for v, rec in enumerate(recs):
        codes = rec.decode_codes()
        ca, cb = codes >> 2, codes & 3
        full = (ca != 2) & (cb != 2)
        gmat[v] = np.where(full & (ca == 0) & (cb == 0), 1,
                           np.where(full & (ca == 1) & (cb == 1), -1, 0))
    V = len(recs)
    for i, j in [(0, 1), (3, 17), (5, 5)]:
        score = V + int((gmat[:, i].astype(int) *
                         gmat[:, j].astype(int)).sum())
        want = 1.0 if i == j else score / (2 * V)
        assert abs(kin[i, j] - want) < 1e-12


def test_scalc(pipeline, tmp_path):
    d, twk, two = pipeline
    with TwkReader(twk) as r:
        recs = list(r.records())
    target = recs[12]
    out = str(tmp_path / "s.two")
    res = compute_single(ScalcSettings(
        input=twk, output=out, interval=f"20:{target.pos + 1}",
        l_surrounding=5000, min_r2=0.02))
    with TwoReader(out) as r:
        got = r.records()
    assert len(got) == res.n_records
    # all fwd records anchored at the target
    fwd = got[(got["packA"] >> 2) == target.pos]
    rev = got[(got["packB"] >> 2) == target.pos]
    assert len(fwd) + len(rev) >= len(got)
    # cross-check against full calc restricted to the target
    with TwoReader(two) as r:
        full = r.records()
    fa = full[((full["packA"] >> 2) == target.pos) &
              (full["ridA"] == target.rid) & (full["ridB"] == target.rid) &
              (np.abs((full["packB"] >> 2).astype(int) - target.pos)
               <= 5000)]
    fa = fa[fa["R2"] >= 0.02]
    keys_full = sorted(int(p) >> 2 for p in fa["packB"])
    keys_scalc = sorted(int(p) >> 2 for p in fwd["packB"])
    assert keys_full == keys_scalc


def test_haplotype_matches_vcf_strings(tmp_path):
    """Full haplotype matrix equals the genotype strings of the source
    VCF, per sample and hap, over the whole region."""
    vcf = str(tmp_path / "h.vcf")
    make_vcf(vcf, n_samples=12, n_sites=20, miss_frac=0.05, seed=21)
    twk = str(tmp_path / "h.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=5,
                              threshold_miss=0.4))
    with TwkReader(twk) as r:
        recs = list(r.records())
        contig = r.header.contigs[0].name
    sub = [x for x in recs if x.rid == 0]
    lo, hi = sub[0].pos + 1, sub[-1].pos + 1

    buf = io.StringIO()
    n_var = haplotype(twk, "-", f"{contig}:{lo}-{hi}", fmt="tsv",
                      numeric=True, out_stream=buf)
    assert n_var == len(sub)
    lines = [ln.split("\t") for ln in buf.getvalue().splitlines()]
    header, rows = lines[0], lines[1:]
    assert [int(p) for p in header[1:]] == [x.pos + 1 for x in sub]

    # rebuild expected codes per variant from the archive (numeric
    # mode: '0'/'1'/'2' with 2 = missing, reference -n semantics)
    by_row = {row[0]: row[1:] for row in rows}
    for v, rec in enumerate(sub):
        codes = rec.decode_codes()
        ca, cb = codes >> 2, codes & 3
        for s in range(12):
            assert by_row[f">S{s}_0"][v] == str(ca[s]), (v, s)
            assert by_row[f">S{s}_1"][v] == str(cb[s]), (v, s)


def test_decay_matches_direct_computation(pipeline):
    d, twk, two = pipeline
    buf = io.StringIO()
    sums, cnts = decay(two, max_range=20000, n_bins=8, out=buf)
    with TwoReader(two) as r:
        recs = r.records()
    pos_a = (recs["packA"] >> 2).astype(np.int64)
    pos_b = (recs["packB"] >> 2).astype(np.int64)
    m = (recs["ridA"] == recs["ridB"]) & (pos_a < pos_b)
    dist = pos_b[m] - pos_a[m]
    bw = 20000 // 8
    want_sum = np.zeros(8)
    want_cnt = np.zeros(8, np.int64)
    for dd, r2 in zip(dist, recs["R2"][m]):
        b = min(dd // bw, 7)
        want_sum[b] += r2
        want_cnt[b] += 1
    np.testing.assert_allclose(sums, want_sum)
    np.testing.assert_array_equal(cnts, want_cnt)


def test_sorted_blocks_never_straddle_contigs(pipeline, tmp_path):
    """The sorted writer must flush at ridA changes (reference merge,
    two_reader.cpp:367-371) so each index entry describes one contig."""
    from tomahawk_tpu.io.two import TWO_DTYPE, TwoWriter
    from tomahawk_tpu.io.constants import TWK_IDX_SORTED
    d, twk, two = pipeline
    with TwoReader(two) as r:
        hdr = r.header
    recs = np.zeros(20, TWO_DTYPE)
    recs["ridA"] = np.repeat([0, 1, 0, 1], 5)  # not sorted by rid on
    recs["ridA"].sort()                        # purpose, then sorted
    recs["packA"] = (np.arange(20, dtype=np.uint32) * 100) << 2
    out = str(tmp_path / "small_blocks.two")
    w = TwoWriter(out, hdr, block_limit=7, state=TWK_IDX_SORTED)
    w.add(recs)          # one batch straddling the 0 -> 1 change
    w.close()
    with TwoReader(out) as r:
        assert r.index.state == 2
        total = 0
        for i, ent in enumerate(r.index.ent):
            blk = r.read_block(i)
            rids = np.unique(blk["ridA"])
            assert len(rids) == 1, f"block {i} straddles contigs {rids}"
            assert ent.rid == rids[0]
            pos = (blk["packA"] >> 2).astype(np.int64)
            assert ent.minpos == pos[0] and ent.maxpos == pos[-1]
            total += len(blk)
        assert total == 20


def test_view_binary_stdout(pipeline, tmp_path, capfdbinary):
    """view -O b with the default '-' output streams the binary
    container to stdout (reference: writer.h:173-174 _OpenStream)."""
    from tomahawk_tpu.post.view import view
    d, twk, two = pipeline
    view(two, output="-", binary=True)
    captured = capfdbinary.readouterr().out
    assert captured.startswith(b"TWO\x01")
    import os
    assert not os.path.exists("-")
    # round-trip through a file to confirm the stream is complete
    p = tmp_path / "roundtrip.two"
    p.write_bytes(captured)
    with TwoReader(str(p)) as r:
        got = r.records()
    with TwoReader(two) as r:
        want = r.records()
    np.testing.assert_array_equal(got, want)


def test_view_interval_prunes_blocks_on_sorted_files(pipeline, tmp_path,
                                                     monkeypatch):
    """Interval view on a SORTED .two must read only index-overlapping
    blocks (the reference's near-real-time ROI query path) and still
    return exactly the records a full scan yields."""
    import io as _io
    from tomahawk_tpu.post.view import view
    from tomahawk_tpu.post.intervals import (interval_block_ids,
                                              parse_intervals)
    d, twk, two = pipeline
    srt = str(tmp_path / "roi.two")
    sort_two(two, srt, run_chunk=50)
    with TwoReader(srt) as r:
        hdr = r.header
        n_blocks = r.index.n
        all_recs = r.records()
    assert n_blocks > 1, "need multiple blocks to prove pruning"
    contig = hdr.contigs[0].name
    pos = np.sort((all_recs["packA"] >> 2)[all_recs["ridA"] == 0])
    lo, hi = int(pos[len(pos) // 3]), int(pos[len(pos) // 2])
    iv = f"{contig}:{lo}-{hi}"

    with TwoReader(srt) as r:
        ids = list(interval_block_ids(r, parse_intervals([iv], hdr)))
        assert 0 < len(ids) < n_blocks, (len(ids), n_blocks)

    out_a, out_b = _io.StringIO(), _io.StringIO()
    view(srt, intervals=[iv], show_header=False, out_stream=out_a)
    # same query via a full scan: unsorted files can't prune
    unsrt = two
    view(unsrt, intervals=[iv], show_header=False, out_stream=out_b)
    assert sorted(out_a.getvalue().splitlines()) == \
        sorted(out_b.getvalue().splitlines())
    assert out_a.getvalue().strip(), "interval produced no records"


def test_interval_block_ids_empty_set_matches_interval_mask(pipeline,
                                                            tmp_path):
    """An empty-but-non-None IntervalSet must mean 'no constraint' for
    block pruning, matching interval_mask's match-all semantics for
    the same value (not 'prune everything')."""
    from tomahawk_tpu.post.intervals import (IntervalSet,
                                             interval_block_ids)
    d, twk, two = pipeline
    srt = str(tmp_path / "empty_ivals.two")
    sort_two(two, srt, run_chunk=50)
    with TwoReader(srt) as r:
        ids = list(interval_block_ids(r, IntervalSet([])))
        assert ids == list(range(r.index.n))


def test_merge_sorted_shards_no_resort(tmp_path):
    """Presorted shards (calc --sort-shards) must k-way merge in one
    pass through merge_sorted_two -- and sort_two must auto-detect the
    sorted state and route there -- with output identical to a full
    re-sort of the concatenated records (round-3 VERDICT task 4;
    reference analogue: phase-2 merge over presorted runs,
    lib/two_reader.cpp:272-421)."""
    from tomahawk_tpu.io.constants import TWK_IDX_SORTED
    from tomahawk_tpu.io.header import VcfContig, VcfHeader
    from tomahawk_tpu.io.two import TWO_DTYPE, TwoReader, TwoWriter
    from tomahawk_tpu.post.sort import merge_sorted_two, sort_two

    rng = np.random.default_rng(3)
    hdr = VcfHeader(samples=["S0"],
                    contigs=[VcfContig(idx=i, name=f"c{i}")
                             for i in range(3)])

    def synth(n):
        recs = np.zeros(n, TWO_DTYPE)
        recs["ridA"] = rng.integers(0, 3, n)
        recs["ridB"] = rng.integers(0, 3, n)
        recs["packA"] = rng.integers(0, 1 << 20, n).astype(np.uint32) << 2
        recs["packB"] = rng.integers(0, 1 << 20, n).astype(np.uint32) << 2
        recs["R2"] = rng.random(n)
        return recs

    shards, parts = [], []
    for k in range(3):
        recs = synth(4000 + 700 * k)
        parts.append(recs)
        p = str(tmp_path / f"s{k}.two")
        w = TwoWriter(p, hdr, block_limit=500)
        w.add(recs)
        w.close()
        q = str(tmp_path / f"s{k}.sorted.two")
        sort_two(p, q)
        shards.append(q)
        assert TwoReader(q).index.state == TWK_IDX_SORTED

    merged = str(tmp_path / "merged.two")
    n = merge_sorted_two(shards, merged)
    assert n == sum(len(p) for p in parts)
    rd = TwoReader(merged)
    assert rd.index.state == TWK_IDX_SORTED
    got = rd.records()

    # sort_two on all-sorted inputs must route to the merge fast path
    # (same output), and a full re-sort of raw shards must agree
    via_sort = str(tmp_path / "via_sort.two")
    assert sort_two(shards, via_sort) == n
    full = str(tmp_path / "full.two")
    raw = [str(tmp_path / f"s{k}.two") for k in range(3)]
    sort_two(raw, full)
    want = TwoReader(full).records()
    alt = TwoReader(via_sort).records()
    for f in got.dtype.names:
        np.testing.assert_array_equal(got[f], want[f], err_msg=f)
        np.testing.assert_array_equal(alt[f], want[f], err_msg=f)


def test_merge_sorted_two_rejects_unsorted(tmp_path):
    from tomahawk_tpu.io.header import VcfContig, VcfHeader
    from tomahawk_tpu.io.two import TWO_DTYPE, TwoWriter
    from tomahawk_tpu.post.sort import merge_sorted_two
    hdr = VcfHeader(samples=["S0"],
                    contigs=[VcfContig(idx=0, name="c0")])
    p = str(tmp_path / "u.two")
    w = TwoWriter(p, hdr)
    w.add(np.zeros(10, TWO_DTYPE))
    w.close()
    with pytest.raises(ValueError, match="not sorted"):
        merge_sorted_two([p], str(tmp_path / "o.two"))
