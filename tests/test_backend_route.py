"""Backend routing: small workloads run on the XLA CPU backend.

The device path pays a fixed compile/dispatch price that tiny inputs
(the reference's RLE-kernel regime, reference: lib/ld/ld_engine.cpp:
1011-1160) never amortize; `calc` routes them to XLA:CPU automatically
and `--backend` overrides the decision. Outputs are identical on both
backends by construction (same jitted program, different XLA target).
"""

import numpy as np
import pytest

from test_importer import make_vcf

from tomahawk_tpu.compute.engine import (CalcSettings, _route_backend,
                                         compute_ld)
from tomahawk_tpu.io.importer import ImportSettings, import_vcf
from tomahawk_tpu.io.two import TwoReader


def _settings(**kw):
    return CalcSettings(**kw)


class TestRouteDecision:
    def test_explicit_cpu_wins(self):
        assert _route_backend(_settings(backend="cpu"), 10**15, 10**6, 1)

    def test_explicit_device_wins(self):
        assert not _route_backend(_settings(backend="device"), 1, 2, 1)

    def test_distributed_routes_like_single_process(self, monkeypatch):
        """Round 4: distributed tile-partition processes route their
        own (per-process) partitions; only a dcn mesh is device-only."""
        import jax
        plat = jax.local_devices()[0].platform
        if plat in ("tpu", "axon"):
            monkeypatch.setenv("TWK_CPU_ROUTE_WORK", "1e9")
            assert _route_backend(_settings(backend="auto"), 10**6, 64, 4)
        # forced cpu is honored in distributed mode
        assert _route_backend(_settings(backend="cpu"), 1, 2, 4)

    def test_dcn_never_routes(self):
        assert not _route_backend(_settings(backend="auto"), 1, 2, 4,
                                  dcn=True)

    def test_dcn_rejects_forced_cpu(self):
        with pytest.raises(ValueError):
            _route_backend(_settings(backend="cpu"), 1, 2, 4, dcn=True)

    def test_explicit_mesh_wins(self):
        assert not _route_backend(
            _settings(backend="auto", mesh="cpu:2x1"), 1, 2, 1)

    def test_auto_small_workload(self, monkeypatch):
        """On an accelerator platform, work below TWK_CPU_ROUTE_WORK
        routes to CPU and work above it stays on the device."""
        import jax
        plat = jax.local_devices()[0].platform
        if plat not in ("tpu", "axon"):
            pytest.skip("auto routing only engages on an accelerator")
        monkeypatch.setenv("TWK_CPU_ROUTE_WORK", "1e9")
        small = _settings(backend="auto")
        assert _route_backend(small, 10**6, 64, 1)       # 1.3e8 < 1e9
        assert not _route_backend(small, 10**9, 5000, 1)  # 1e13 > 1e9


class TestForcedCpuEndToEnd:
    def test_cpu_backend_output_matches(self, tmp_path):
        """calc --backend cpu produces the same records as the default
        path (which in this test environment is already CPU)."""
        vcf = str(tmp_path / "in.vcf")
        make_vcf(vcf, n_samples=40, n_sites=300, seed=11,
                 contigs=("20",))
        twk = str(tmp_path / "in.twk")
        import_vcf(ImportSettings(input=vcf, output=twk, block_size=64))
        out_a = str(tmp_path / "a.two")
        out_b = str(tmp_path / "b.two")
        compute_ld(_settings(input=twk, output=out_a, force_phased=True,
                             min_r2=0.05, mesh="off"))
        compute_ld(_settings(input=twk, output=out_b, force_phased=True,
                             min_r2=0.05, mesh="off", backend="cpu"))
        ra = TwoReader(out_a)
        rb = TwoReader(out_b)
        a = np.concatenate(list(ra.blocks()))
        b = np.concatenate(list(rb.blocks()))
        ra.close()
        rb.close()
        assert len(a) == len(b) and len(a) > 0
        # --backend cpu runs the native tile engine, whose emit
        # granularity (per tile chunk) differs from the sweep engine's
        # (per segment): compare as multisets, like a `sort` would.
        # P differs at f32 noise between the backends (the sweep
        # engine's P rides the in-sweep device bracket, the native
        # tile engine's rides the exact f64 scan) -- compare it to
        # 2e-6 relative, 10x inside the 1e-5 golden contract; all
        # other fields must be bit-identical.
        order = [f for f in a.dtype.names if f != "P"]
        sa = np.sort(a, order=order)
        sb = np.sort(b, order=order)
        for f in order:
            assert np.array_equal(sa[f], sb[f]), f
        np.testing.assert_allclose(sa["P"], sb["P"], rtol=2e-6, atol=0)
