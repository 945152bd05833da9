"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tomahawk_tpu.ops.bitpack import block_to_planes, stack_planes
from tomahawk_tpu.parallel.mesh import make_mesh, sharded_phased_ld

from conftest import cpu_devices
from test_kernels import _block_from_codes, _random_rows


def _mesh_or_skip(n_pairs, n_samples_shards):
    devs = cpu_devices()
    need = n_pairs * n_samples_shards
    if len(devs) < need:
        pytest.skip(f"need {need} cpu devices, have {len(devs)}")
    return make_mesh(n_pairs, n_samples_shards, devices=devs[:need])


@pytest.mark.parametrize("n_pairs,n_shards", [(8, 1), (4, 2), (2, 4)])
def test_sharded_phased_matches_single_device(n_pairs, n_shards):
    rng = np.random.default_rng(0)
    n_samples = 4 * 128  # word axis divisible across sample shards
    B = 8
    NB = 4
    planes = []
    all_rows = []
    for _ in range(NB):
        rows = _random_rows(rng, B, n_samples, 0.0)
        all_rows.append(rows)
        planes.append(_block_from_codes(rows, pad_to=B))
    stacked = stack_planes(planes)

    mesh = _mesh_or_skip(n_pairs, n_shards)
    W = stacked["alt_bits"].shape[2]
    assert W % n_shards == 0

    # all NB x NB pairs, padded to a multiple of n_pairs
    pair_list = [(i, j, i == j) for i in range(NB) for j in range(i, NB)]
    G = ((len(pair_list) + n_pairs - 1) // n_pairs) * n_pairs
    pair_list += [(0, 0, True)] * (G - len(pair_list))
    pi = np.array([p[0] for p in pair_list], np.int32)
    pj = np.array([p[1] for p in pair_list], np.int32)
    dg = np.array([p[2] for p in pair_list], bool)

    cap = B * B
    fn = sharded_phased_ld(mesh, n_samples, B, cap, min_r2=0.0)
    n, idx, rows, n_cand = fn(
        jnp.asarray(stacked["alt_bits"]), jnp.asarray(stacked["ac"]),
        jnp.asarray(stacked["valid"]), jnp.asarray(stacked["rid"]),
        jnp.asarray(stacked["pos"]), jnp.asarray(pi), jnp.asarray(pj),
        jnp.asarray(dg))
    n = np.asarray(n)
    idx = np.asarray(idx)
    rows = np.asarray(rows)

    # compare against a direct single-device computation
    from tomahawk_tpu.ops.ld_kernels import (pair_mask_tile,
                                             phased_counts_tile,
                                             phased_prefilter_mask)
    for g, (i, j, diag) in enumerate(pair_list):
        counts = np.asarray(phased_counts_tile(
            jnp.asarray(stacked["alt_bits"][i]),
            jnp.asarray(stacked["miss_bits"][i]),
            jnp.asarray(stacked["alt_bits"][j]),
            jnp.asarray(stacked["miss_bits"][j]),
            jnp.asarray(stacked["ac"][i]), jnp.asarray(stacked["ac"][j]),
            n_samples, False))
        mask = np.asarray(pair_mask_tile(
            jnp.asarray(stacked["valid"][i]),
            jnp.asarray(stacked["valid"][j]),
            jnp.asarray(stacked["ac"][i]), jnp.asarray(stacked["ac"][j]),
            jnp.asarray(stacked["rid"][i]), jnp.asarray(stacked["rid"][j]),
            jnp.asarray(stacked["pos"][i]), jnp.asarray(stacked["pos"][j]),
            diagonal=diag))
        pf = np.asarray(phased_prefilter_mask(
            jnp.asarray(counts), jnp.asarray(mask), 0.0, 100.0))
        want_idx = np.flatnonzero(pf.ravel())
        got_n = int(n[g])
        assert got_n == len(want_idx), (g, got_n, len(want_idx))
        np.testing.assert_array_equal(idx[g][:got_n], want_idx)
        np.testing.assert_array_equal(
            rows[g][:got_n], counts.reshape(-1, 4)[want_idx])
