"""Native CPU tile engine vs the XLA sweep engine.

`calc --backend cpu` routes the whole tile plan through
compute/cpu_engine.py (native popcount kernels + the shared filter
ladder); the record MULTISET must equal the XLA engine's exactly for
every mode -- counts are integers and both paths share the native
record assembly, so equality is exact, not toleranced. Order may
differ (the device engine batches fwd/rev per sweep segment, the
native engine per tile chunk; both are valid unsorted calc streams
like the reference's thread-racy output order)."""

import numpy as np
import pytest

from test_importer import make_vcf

from tomahawk_tpu.compute.engine import CalcSettings, compute_ld
from tomahawk_tpu.io.importer import ImportSettings, import_vcf
from tomahawk_tpu.io.two import TwoReader


def _sorted(path):
    r = np.concatenate(list(TwoReader(path).blocks()))
    # P is excluded from the sort key: the sweep engine's P rides the
    # in-sweep f32 device bracket while the native tile engine's is
    # the exact f64 scan, so P carries f32 noise across backends
    return np.sort(r, order=[f for f in r.dtype.names if f != "P"])


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    d = tmp_path_factory.mktemp("cpueng")
    vcf = str(d / "in.vcf")
    make_vcf(vcf, n_samples=48, n_sites=500, seed=21, miss_frac=0.05,
             contigs=("20", "21"))
    twk = str(d / "in.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=64))
    return twk


CASES = [
    dict(force_phased=True),
    dict(forced_unphased=True),
    dict(),                                   # mixed dispatch
    dict(window=True, l_window=30_000),
    dict(force_phased=True, min_r2=0.2, max_r2=0.9, min_dprime=0.1),
    dict(intervals=["20"]),
]


@pytest.mark.parametrize("kw", CASES)
def test_native_matches_xla(archive, tmp_path, kw):
    paths = {}
    for backend in ("device", "cpu"):
        # "device" with TWK_CPU_ROUTE_WORK=0 (conftest) means the XLA
        # engine on the CPU default device -- the reference path here
        out = str(tmp_path / f"{backend}.two")
        base = dict(input=archive, output=out, min_r2=0.02, mesh="off",
                    tile_rows=128, backend=backend)
        base.update(kw)
        compute_ld(CalcSettings(**base))
        paths[backend] = out
    a = _sorted(paths["device"])
    b = _sorted(paths["cpu"])
    assert len(a) == len(b) > 0
    for f in a.dtype.names:
        if f == "P":
            # device-bracket vs exact-scan Fisher: f32 noise, 10x
            # inside the 1e-5 golden contract
            np.testing.assert_allclose(a[f], b[f], rtol=5e-6,
                                       atol=1e-12, err_msg=f)
        else:
            np.testing.assert_array_equal(a[f], b[f], err_msg=f)


def test_native_row_chunking(archive, tmp_path, monkeypatch):
    """Row-chunked tiles (buffer smaller than a tile) emit the same
    records as one-shot tiles."""
    from tomahawk_tpu.compute import cpu_engine

    outs = []
    for rows_cap in (1 << 20, 64):   # 64 -> rows_per = 1 at B = 128
        out = str(tmp_path / f"chunk{rows_cap}.two")
        monkeypatch.setattr(cpu_engine, "_ROWS_BUDGET", rows_cap,
                            raising=True)
        compute_ld(CalcSettings(input=archive, output=out, min_r2=0.02,
                                mesh="off", tile_rows=128,
                                backend="cpu"))
        outs.append(_sorted(out))
    assert np.array_equal(outs[0], outs[1])
