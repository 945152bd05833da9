"""The fused pallas tile kernel must return exactly what the XLA tile
path returns -- same candidate mask, same prefilter survivors, same raw
contraction parts -- for every table variant, including the chunked
contraction path (sample axes wider than one VMEM block) and the
window / pair-class masks. Runs in pallas interpreter mode so it
exercises the real kernel body on CPU."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tomahawk_tpu.compute import sweeps
from tomahawk_tpu.ops import pallas_tiles as PT

from test_kernels import _block_from_codes, _random_rows


def _stacked_dev(rng, n_blocks, B, n_samples, miss_frac):
    from tomahawk_tpu.ops.bitpack import stack_planes
    planes = []
    for _ in range(n_blocks):
        n_var = rng.integers(B // 2, B + 1)
        rows = _random_rows(rng, int(n_var), n_samples, miss_frac)
        planes.append(_block_from_codes(rows, pad_to=B))
    st = stack_planes(planes)
    return {k: jnp.asarray(v) for k, v in st.items()
            if k in sweeps.DEV_KEYS}


CASES = [
    ("phased", False, 0, "all"),
    ("phased", True, 0, "all"),
    ("unphased", False, 0, "all"),
    ("unphased", True, 0, "all"),
    ("phased", False, 300, "all"),      # window mask
    ("unphased", False, 0, "clean"),    # pair-class mask
    ("phased", True, 0, "dirty"),
]


@pytest.mark.parametrize("table,miss,window,cls", CASES)
def test_pallas_matches_xla(table, miss, window, cls):
    rng = np.random.default_rng(7)
    B, n_samples = 256, 100
    dev = _stacked_dev(rng, 2, B, n_samples, 0.05 if miss else 0.0)
    cfg = sweeps.make_cfg(table, miss, cls, B, n_samples, window,
                          0.05, 100.0)
    for (i, j, diag) in [(0, 0, True), (0, 1, False)]:
        pf_x, m_x, parts_x = sweeps.tile_prefilter(
            dev, jnp.int32(i), jnp.int32(j), jnp.asarray(diag), cfg)
        pf_p, m_p, parts_p = PT.tile_prefilter_pallas(
            dev, jnp.int32(i), jnp.int32(j), jnp.asarray(diag), cfg,
            interpret=True)
        assert np.array_equal(np.asarray(m_x), np.asarray(m_p))
        assert np.array_equal(np.asarray(pf_x), np.asarray(pf_p))
        assert len(parts_x) == len(parts_p)
        for px, pp in zip(parts_x, parts_p):
            assert np.array_equal(np.asarray(px), np.asarray(pp))


def test_pallas_chunked_contraction():
    """2N too wide for one VMEM block takes the accumulating k-grid
    path, with word padding."""
    rng = np.random.default_rng(11)
    B, n_samples = 128, 9000          # Wh = 564 words -> 5 chunks + pad
    BM, nk, wk, wpad = PT.plan_layout(
        128, 564, 3, 4)               # phased+missing layout
    assert nk > 1 and wpad > 564      # really exercises chunk + pad
    dev = _stacked_dev(rng, 1, B, n_samples, 0.02)
    cfg = sweeps.make_cfg("phased", True, "all", B, n_samples, 0,
                          0.1, 100.0)
    pf_x, m_x, parts_x = sweeps.tile_prefilter(
        dev, jnp.int32(0), jnp.int32(0), jnp.asarray(True), cfg)
    pf_p, m_p, parts_p = PT.tile_prefilter_pallas(
        dev, jnp.int32(0), jnp.int32(0), jnp.asarray(True), cfg,
        interpret=True)
    assert np.array_equal(np.asarray(m_x), np.asarray(m_p))
    assert np.array_equal(np.asarray(pf_x), np.asarray(pf_p))
    for px, pp in zip(parts_x, parts_p):
        assert np.array_equal(np.asarray(px), np.asarray(pp))


def test_plan_layout():
    # common 1000-genomes shapes stay single-shot (counts are per side)
    assert PT.plan_layout(4096, 80, 2, 4) == (512, 1, 80, 80)      # unphased
    assert PT.plan_layout(4096, 160, 1, 1) == (512, 1, 160, 160)   # phased
    # the 9-part table and 3-plane unpack drop to 256-row blocks
    assert PT.plan_layout(4096, 80, 3, 9)[0] == 256
    # north-star (100k samples): chunked, no padding (6272 % 128 == 0)
    BM, nk, wk, wpad = PT.plan_layout(4096, 6272, 1, 1)
    assert nk == 49 and wk == 128 and wpad == 6272 and BM >= 256
    # chunk blocks obey the 128-lane trailing-dim rule
    assert wk % 128 == 0 or nk == 1


def test_window_block_skip(monkeypatch):
    """Multi-block grid where whole blocks fall outside the window:
    the kernel skips their contractions but the mask must still match
    the XLA path exactly (the skip is conservative)."""
    monkeypatch.setenv("TWK_PALLAS_MAX_BM", "128")
    rng = np.random.default_rng(3)
    B, n_samples, window = 256, 100, 300
    dev = _stacked_dev(rng, 2, B, n_samples, 0.0)
    # positions 1000 apart: any pair of distinct 128-row blocks is
    # > window apart, so off-diagonal blocks are dead
    pos = (np.arange(B, dtype=np.int32) * 1000)[None, :].repeat(2, axis=0)
    dev["pos"] = jnp.asarray(pos)
    cfg = sweeps.make_cfg("phased", False, "all", B, n_samples, window,
                          0.01, 100.0)
    for (i, j, diag) in [(0, 0, True), (0, 1, False)]:
        pf_x, m_x, parts_x = sweeps.tile_prefilter(
            dev, jnp.int32(i), jnp.int32(j), jnp.asarray(diag), cfg)
        pf_p, m_p, parts_p = PT.tile_prefilter_pallas(
            dev, jnp.int32(i), jnp.int32(j), jnp.asarray(diag), cfg,
            interpret=True)
        assert np.array_equal(np.asarray(m_x), np.asarray(m_p))
        assert np.array_equal(np.asarray(pf_x), np.asarray(pf_p))
        # parts only compare where the mask is live (dead blocks skip
        # the contraction and legitimately hold garbage)
        live = np.asarray(m_p)
        for px, pp in zip(parts_x, parts_p):
            assert np.array_equal(np.asarray(px)[live],
                                  np.asarray(pp)[live])


def test_fused_sweep_pallas_backend():
    """The whole fused sweep (scan + compaction) over the pallas
    backend must produce the same survivor rows as the XLA backend."""
    rng = np.random.default_rng(23)
    B, n_samples = 256, 100
    dev = _stacked_dev(rng, 2, B, n_samples, 0.0)
    pi = jnp.asarray([0, 0, 1], jnp.int32)
    pj = jnp.asarray([0, 1, 1], jnp.int32)
    dg = jnp.asarray([True, False, True])
    live = jnp.asarray([True, True, True])
    outs = {}
    for backend in ("xla", "pallas"):
        cfg = sweeps.make_cfg("unphased", False, "all", B, n_samples, 0,
                              0.05, 100.0, backend=backend)
        if backend == "pallas":
            # interpret mode for CPU: route through the kernel body
            orig = PT.tile_prefilter_pallas
            PT_wrapped = lambda *a, **kw: orig(*a, interpret=True, **kw)
            PT.tile_prefilter_pallas = PT_wrapped
            try:
                outs[backend] = sweeps.fused_sweep(
                    dev, pi, pj, dg, live, cfg=cfg, cap=64, outcap=4096)
            finally:
                PT.tile_prefilter_pallas = orig
        else:
            outs[backend] = sweeps.fused_sweep(
                dev, pi, pj, dg, live, cfg=cfg, cap=64, outcap=4096)
    for a, b in zip(outs["xla"], outs["pallas"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("table,miss", [
    ("phased", False), ("phased", True),
    ("unphased", False), ("unphased", True)])
def test_psum_pallas_matches_xla_on_samples_mesh(table, miss):
    """Samples-sharded mesh: the parts-only pallas kernel contracts
    each shard's local word slice, the psum makes counts global, and
    the jnp epilogue must reproduce the single-device XLA path exactly
    (round-2 weakness 5: sharded meshes used to force the XLA path)."""
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P
    devs = np.array(jax.devices("cpu")[:2]).reshape(1, 2)
    mesh = Mesh(devs, ("pairs", "samples"))

    rng = np.random.default_rng(5)
    B, n_samples = 256, 128      # Wh = 8 words -> 4 per shard
    dev = _stacked_dev(rng, 2, B, n_samples, 0.05 if miss else 0.0)

    cfg_x = sweeps.make_cfg(table, miss, "all", B, n_samples, 0,
                            0.05, 100.0)
    i, j, diag = jnp.int32(0), jnp.int32(1), jnp.asarray(False)
    pf_x, m_x, parts_x = sweeps.tile_prefilter(dev, i, j, diag, cfg_x)

    cfg_p = sweeps.make_cfg(table, miss, "all", B, n_samples, 0,
                            0.05, 100.0, psum_axis="samples",
                            backend="pallas")
    specs = sweeps._dev_specs(P, True, tuple(dev.keys()))
    orig = PT.tile_parts_pallas
    PT.tile_parts_pallas = lambda *a, **kw: orig(*a, interpret=True,
                                                 **kw)
    try:
        fn = jax.shard_map(
            lambda d: sweeps.tile_prefilter(d, i, j, diag, cfg_p),
            mesh=mesh, in_specs=(specs,), out_specs=P(),
            check_vma=False)
        pf_p, m_p, parts_p = fn(dev)
    finally:
        PT.tile_parts_pallas = orig
    assert np.array_equal(np.asarray(m_x), np.asarray(m_p))
    assert np.array_equal(np.asarray(pf_x), np.asarray(pf_p))
    assert len(parts_x) == len(parts_p)
    for px, pp in zip(parts_x, parts_p):
        assert np.array_equal(np.asarray(px), np.asarray(pp))


def test_engine_falls_back_when_pallas_fails(tmp_path):
    """A Mosaic compile failure must degrade the run to the XLA
    backend, not kill it: forcing tile_backend='pallas' on CPU (where
    the kernel cannot lower) still completes and matches the XLA run."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_importer import make_vcf
    from tomahawk_tpu.io.importer import ImportSettings, import_vcf
    from tomahawk_tpu.io.two import TwoReader
    from tomahawk_tpu.compute.engine import CalcSettings, compute_ld

    vcf = str(tmp_path / "in.vcf")
    make_vcf(vcf, n_samples=32, n_sites=140, seed=9, miss_frac=0.0,
             contigs=("20",))
    twk = str(tmp_path / "in.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=128))

    outs = {}
    for backend in ("xla", "pallas"):
        out = str(tmp_path / f"{backend}.two")
        compute_ld(CalcSettings(input=twk, output=out, min_r2=0.0,
                                min_p=1.0, mesh="off", tile_rows=128,
                                tile_backend=backend))
        outs[backend] = TwoReader(out).records()
    a, b = outs["xla"], outs["pallas"]
    assert len(a) == len(b) > 0
    for f in a.dtype.names:
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)


def test_engine_falls_back_on_force_time_failure(tmp_path, monkeypatch):
    """A kernel failure that only surfaces when results are READ (a
    runtime Mosaic error at np.asarray, not at dispatch) must also
    degrade the run to the XLA backend instead of killing it."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_importer import make_vcf
    from tomahawk_tpu.io.importer import ImportSettings, import_vcf
    from tomahawk_tpu.io.two import TwoReader
    from tomahawk_tpu.compute.engine import (CalcSettings, LdEngine,
                                             compute_ld)

    vcf = str(tmp_path / "in.vcf")
    make_vcf(vcf, n_samples=32, n_sites=140, seed=9, miss_frac=0.0,
             contigs=("20",))
    twk = str(tmp_path / "in.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=128))

    ref_out = str(tmp_path / "ref.two")
    compute_ld(CalcSettings(input=twk, output=ref_out, min_r2=0.0,
                            min_p=1.0, mesh="off", tile_rows=128))

    class _Poison:
        def __array__(self, *a, **kw):
            raise RuntimeError("simulated runtime Mosaic failure")

    orig = LdEngine._dispatch_fused

    def poisoned(self, *a, **kw):
        st = orig(self, *a, **kw)
        if self._backend_forced != "xla" and not getattr(
                self, "_poisoned_once", False):
            self._poisoned_once = True
            st = dict(st, n_pass=_Poison())
        return st

    monkeypatch.setattr(LdEngine, "_dispatch_fused", poisoned)
    # on the CPU test backend the engine resolves to "xla" outright;
    # pretend pallas is active so the degrade ladder is eligible,
    # exactly as on TPU hardware
    monkeypatch.setattr(
        LdEngine, "_can_degrade",
        lambda self: self._backend_forced != "xla")
    out = str(tmp_path / "forced.two")
    compute_ld(CalcSettings(input=twk, output=out, min_r2=0.0,
                            min_p=1.0, mesh="off", tile_rows=128))
    a, b = TwoReader(ref_out).records(), TwoReader(out).records()
    assert len(a) == len(b) > 0
    np.testing.assert_array_equal(a, b)
