"""Randomized end-to-end configurations vs the brute-force oracle.

Fixed seeds, including configurations that caught real bugs in earlier
revisions (the f32 cubic-discriminant prefilter false negatives at
min_r2 = 0, and the exact-integer D = 0 gate)."""

import pytest

from test_importer import make_vcf
from test_end2end import _expected_records, _check_two
from tomahawk_tpu.io.importer import ImportSettings, import_vcf
from tomahawk_tpu.compute.engine import CalcSettings, compute_ld

CONFIGS = [
    # the config that exposed the f32 cubic prefilter false negatives
    dict(seed=297962, n_samples=129, n_sites=50, miss=0.03, mode="mixed",
         min_r2=0.0, tile_rows=16, window=None, mesh="auto",
         memory_gb=1e-6, block=4),
    dict(seed=523481, n_samples=129, n_sites=50, miss=0.03, mode="phased",
         min_r2=0.05, tile_rows=7, window=None, mesh="auto",
         memory_gb=1e-6, block=9),
    dict(seed=11, n_samples=33, n_sites=35, miss=0.12, mode="unphased",
         min_r2=0.0, tile_rows=4096, window=2500, mesh="off",
         memory_gb=12.0, block=500),
    dict(seed=77, n_samples=64, n_sites=40, miss=0.0, mode="mixed",
         min_r2=0.3, tile_rows=16, window=None, mesh="auto",
         memory_gb=12.0, block=4),
]


@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=[f"seed{c['seed']}" for c in CONFIGS])
def test_random_config_matches_oracle(tmp_path, cfg):
    vcf = str(tmp_path / "s.vcf")
    make_vcf(vcf, n_samples=cfg["n_samples"], n_sites=cfg["n_sites"],
             miss_frac=cfg["miss"], seed=cfg["seed"])
    twk = str(tmp_path / "s.twk")
    import_vcf(ImportSettings(input=vcf, output=twk,
                              block_size=cfg["block"], threshold_miss=0.5))
    two = str(tmp_path / "s.two")
    compute_ld(CalcSettings(
        input=twk, output=two,
        force_phased=cfg["mode"] == "phased",
        forced_unphased=cfg["mode"] == "unphased",
        window=cfg["window"] is not None,
        l_window=cfg["window"] or 1_000_000,
        min_r2=cfg["min_r2"], tile_rows=cfg["tile_rows"],
        mesh=cfg["mesh"], memory_gb=cfg["memory_gb"]))
    want, _ = _expected_records(twk, cfg["mode"], min_r2=cfg["min_r2"],
                                window=cfg["window"])
    _check_two(two, want)
