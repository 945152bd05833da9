"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Validates that the production two-pass sweeps (count + extract) and the
full LdEngine produce identical results when the tile grid is sharded
over a ('pairs', 'samples') mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tomahawk_tpu.compute.engine import CalcSettings, LdEngine, dispatch_pairs
from tomahawk_tpu.compute import sweeps
from tomahawk_tpu.ops.bitpack import stack_planes
from tomahawk_tpu.ops.ld_math import LdFilters
from tomahawk_tpu.parallel.mesh import make_mesh

from conftest import cpu_devices
from test_kernels import _block_from_codes, _random_rows


def _mesh_or_skip(n_pairs, n_samples_shards):
    devs = cpu_devices()
    need = n_pairs * n_samples_shards
    if len(devs) < need:
        pytest.skip(f"need {need} cpu devices, have {len(devs)}")
    return make_mesh(n_pairs, n_samples_shards, devices=devs[:need])


def _stacked(rng, NB=4, B=8, n_samples=4 * 128, miss_rate=0.0):
    planes = []
    for _ in range(NB):
        rows = _random_rows(rng, B, n_samples, miss_rate)
        planes.append(_block_from_codes(rows, pad_to=B))
    return stack_planes(planes)


def _records_for(stacked, n_samples, mesh):
    settings = CalcSettings(min_r2=0.0, min_p=1.0)
    engine = LdEngine(stacked, n_samples, settings, mesh=mesh)
    filt = LdFilters(min_r2=0.0, min_p=1.0)
    NB = stacked["alt_bits"].shape[0]
    pairs = [(i, j, i == j) for i in range(NB) for j in range(i, NB)]
    got = []
    n = dispatch_pairs(engine, pairs, "mixed", filt, got.append, stacked)
    recs = np.concatenate([g for g in got if len(g)]) if got else None
    return n, recs


def _sorted(recs):
    order = np.lexsort((recs["packB"], recs["packA"],
                        recs["ridB"], recs["ridA"]))
    return recs[order]


@pytest.mark.parametrize("n_pairs,n_shards", [(8, 1), (4, 2), (2, 4)])
def test_sharded_engine_matches_single_device(n_pairs, n_shards):
    rng = np.random.default_rng(0)
    n_samples = 4 * 128
    stacked = _stacked(rng, n_samples=n_samples, miss_rate=0.05)
    mesh = _mesh_or_skip(n_pairs, n_shards)

    n1, recs1 = _records_for(stacked, n_samples, mesh=None)
    n2, recs2 = _records_for(stacked, n_samples, mesh=mesh)
    assert n1 == n2
    assert (recs1 is None) == (recs2 is None)
    if recs1 is None:
        return
    assert len(recs1) == len(recs2)
    a, b = _sorted(recs1), _sorted(recs2)
    for f in ("ridA", "ridB", "packA", "packB", "controller"):
        np.testing.assert_array_equal(a[f], b[f])
    for f in ("D", "Dprime", "R2", "P"):
        np.testing.assert_allclose(a[f], b[f], atol=1e-12)


@pytest.mark.parametrize("table", ["phased", "unphased"])
def test_sharded_count_sweep_matches_jit(table):
    rng = np.random.default_rng(1)
    n_samples = 4 * 128
    stacked = _stacked(rng, n_samples=n_samples,
                       miss_rate=0.05 if table == "unphased" else 0.0)
    mesh = _mesh_or_skip(4, 2)

    NB, B = stacked["alt_bits"].shape[:2]
    pair_list = [(i, j, i == j) for i in range(NB) for j in range(i, NB)]
    G = ((len(pair_list) + 3) // 4) * 4
    pair_list += [(0, 0, True)] * (G - len(pair_list))
    pi = np.array([p[0] for p in pair_list], np.int32)
    pj = np.array([p[1] for p in pair_list], np.int32)
    dg = np.array([p[2] for p in pair_list], bool)
    live = np.ones(G, bool)

    has_missing = table == "unphased"
    cfg = sweeps.make_cfg(table, has_missing, "all", B, n_samples,
                          0, 0.0, 100.0)
    dev = {k: jnp.asarray(stacked[k]) for k in sweeps.dev_keys_for(cfg)}
    n_ref, nc_ref = (np.asarray(x) for x in
                     sweeps.jit_count_sweep(cfg)(dev, pi, pj, dg, live))
    n_sh, nc_sh = (np.asarray(x) for x in
                   sweeps.shard_count_sweep(mesh, cfg)(dev, pi, pj, dg,
                                                       live))
    np.testing.assert_array_equal(n_ref, n_sh)
    np.testing.assert_array_equal(nc_ref, nc_sh)
