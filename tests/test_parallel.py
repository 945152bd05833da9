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
    # emit hands out scratch views valid only until the next segment
    n = dispatch_pairs(engine, pairs, "mixed", filt,
                       lambda recs, rev=None: got.append(recs.copy()),
                       stacked)
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


def test_band_planes_committed_with_mesh_sharding():
    """A samples-sharded local mesh must hold 1/S of every word plane
    per device (the banding budget stretches S-fold on that
    assumption); metadata vectors are replicated."""
    from jax.sharding import PartitionSpec as P
    rng = np.random.default_rng(2)
    n_samples = 4 * 128
    stacked = _stacked(rng, n_samples=n_samples)
    mesh = _mesh_or_skip(2, 2)
    settings = CalcSettings(min_r2=0.0)
    engine = LdEngine(stacked, n_samples, settings, mesh=mesh)
    alt = engine._band_dev_get("alt_bits", engine._load_bands[0])
    assert alt.sharding.spec == P(None, None, "samples")
    # sharded engine output still matches the single-device run
    n1, r1 = _records_for(stacked, n_samples, None)
    n2, r2 = _records_for(stacked, n_samples, mesh)
    assert n1 == n2
    np.testing.assert_array_equal(_sorted(r1), _sorted(r2))


def test_resolve_mesh_platform_respects_local_only(monkeypatch):
    """'platform:PxS' specs must mesh only local devices when asked:
    global jax.devices(platform) in a distributed run would silently
    build a process-spanning mesh on the non-dcn path. In a single
    process global == local, so assert the GLOBAL listing is never
    consulted at all when local_only=True."""
    from tomahawk_tpu.parallel.distributed import resolve_mesh
    if len(jax.local_devices(backend="cpu")) < 2:
        pytest.skip("need 2 local cpu devices")

    def forbidden(*a, **kw):
        raise AssertionError("resolve_mesh(local_only=True) consulted "
                             "the global jax.devices listing")

    monkeypatch.setattr(jax, "devices", forbidden)
    mesh = resolve_mesh("cpu:2x1", local_only=True)
    local = set(jax.local_devices(backend="cpu"))
    assert all(d in local for d in mesh.devices.flat)


def test_fused_sweep_offset_clamps_at_outcap():
    """The int32 running offset must clamp at outcap: a dense segment
    can exceed 2^31 raw survivors, and a wrapped-negative offset would
    corrupt rows of tiles the host still trusts. With clamping, the
    intact prefix stays exact and everything later is repaired."""
    rng = np.random.default_rng(3)
    n_samples = 4 * 128
    stacked = _stacked(rng, NB=6, B=8, n_samples=n_samples)
    B = 8
    cfg = sweeps.make_cfg("phased", False, "all", B, n_samples,
                          0, 0.0, 100.0)
    dev = {k: jnp.asarray(stacked[k]) for k in sweeps.dev_keys_for(cfg)}
    pair_list = [(i, j, i == j) for i in range(6) for j in range(i, 6)]
    pi = np.array([p[0] for p in pair_list], np.int32)
    pj = np.array([p[1] for p in pair_list], np.int32)
    dg = np.array([p[2] for p in pair_list], bool)
    live = np.ones(len(pair_list), bool)
    cap, outcap = 64, 128   # total survivors far exceed outcap
    n, nc, buf = (np.asarray(x) for x in sweeps.jit_fused_sweep(
        cfg, cap, outcap)(dev, pi, pj, dg, live))
    n_true, _ = (np.asarray(x) for x in
                 sweeps.jit_count_sweep(cfg)(dev, pi, pj, dg, live))
    np.testing.assert_array_equal(n, n_true)
    # the intact prefix (tiles fully below the spill boundary, the same
    # condition the engine host checks) must match a no-spill run
    # row-for-row: a wrapped or mis-clamped offset would corrupt it
    big = 1 << 14
    _, _, ref = (np.asarray(x) for x in sweeps.jit_fused_sweep(
        cfg, cap, big)(dev, pi, pj, dg, live))
    offs = np.cumsum(n.astype(np.int64)) - n
    ok = (n <= cap) & (offs + n <= outcap - cap)
    for t in np.flatnonzero(ok & (n > 0)):
        lo, cnt = int(offs[t]), int(n[t])
        np.testing.assert_array_equal(
            buf[lo:lo + cnt], ref[lo:lo + cnt],
            err_msg=f"tile {t} intact-prefix rows corrupted")
    assert ok[:3].any(), "test data produced no intact-prefix tiles"


def test_survivor_payload_pack_roundtrip():
    """Survivor buffer payload packing: two uint16 parts per int32
    column when counts fit (phased parts <= 2N, unphased <= N);
    unpack_payload must invert it exactly, including parts at the
    count ceiling and the 16-bit sign boundary. Above the ceiling the
    buffer must stay unpacked."""
    rng = np.random.default_rng(5)
    for table in ("phased", "unphased"):
        for miss in (False, True):
            for n_samples in (4 * 128, 70_000):
                cfg = sweeps.make_cfg(table, miss, "all", 8, n_samples,
                                      0, 0.0, 100.0)
                p = sweeps.payload_cols(table, miss)
                lim = (2 if table == "phased" else 1) * n_samples
                packed = sweeps.pack16_ok(cfg)
                assert packed == (lim < (1 << 16))
                assert sweeps.buf_cols(cfg) == \
                    1 + ((p + 1) // 2 if packed else p)
                n = 33
                vals = rng.integers(0, lim + 1, size=(p, n))
                # force boundary values into row 0: the ceiling and
                # the 16-bit sign bit
                vals[:, 0] = lim
                vals[: min(p, 2), 1] = 0x8000 if lim >= 0x8000 else lim
                parts = [jnp.asarray(v, jnp.int32) for v in vals]
                idx = jnp.arange(n, dtype=jnp.int32)
                rec = np.asarray(sweeps._pack_cols(idx, parts, idx, cfg))
                assert rec.shape == (n, sweeps.buf_cols(cfg))
                np.testing.assert_array_equal(rec[:, 0], np.arange(n))
                out = sweeps.unpack_payload(rec[:, 1:], table, miss,
                                            n_samples)
                assert out.dtype == np.int64
                np.testing.assert_array_equal(out, vals.T)


@pytest.mark.parametrize("n_pairs,n_shards", [(2, 1), (2, 2)])
def test_banded_staging_prefetch_on_mesh(n_pairs, n_shards):
    """Banded streaming with the staging worker on a multi-device mesh:
    the worker-thread uploads (device_put with NamedSharding, word
    planes split on the samples axis) must produce the same records as
    the all-resident single-load run."""
    rng = np.random.default_rng(17)
    n_samples = 4 * 128
    stacked = _stacked(rng, NB=6, n_samples=n_samples, miss_rate=0.03)
    # unique positions across supers so the comparison sort has no ties
    stacked["pos"] = (np.arange(6 * 8, dtype=np.int32) * 37).reshape(6, 8)
    mesh = _mesh_or_skip(n_pairs, n_shards)
    n_ref, ref = _records_for(stacked, n_samples, mesh=mesh)

    # split the supers into 3 bands of 2 and run the engine's banded
    # residency loop with async staging of the next load's band
    sub = {}
    for k, v in stacked.items():
        sub[k] = v   # stacked dict: leading axis = super blocks
    bands = [(0, 2), (2, 4), (4, 6)]

    def band_stacked(b):
        lo, hi = bands[b]
        return {k: v[lo:hi] for k, v in stacked.items()}

    settings = CalcSettings(min_r2=0.0, min_p=1.0)
    engine = LdEngine(None, n_samples, settings, mesh=mesh, B=8)
    engine.MAX_RESIDENT_BANDS = 3
    filt = LdFilters(min_r2=0.0, min_p=1.0)
    loads = [((p, q), None) for p in range(3) for q in range(p, 3)]
    got = []
    n = 0
    for li, ((p, q), _) in enumerate(loads):
        engine.stage_wait()
        load = [(p, None if p in engine._band_host else band_stacked(p))]
        if q != p:
            load.append((q, None if q in engine._band_host
                         else band_stacked(q)))
        engine.set_load(load)
        if li + 1 < len(loads):
            for b in set(loads[li + 1][0]):
                if b not in engine._band_host:
                    engine.stage_band_async(b, lambda b=b: band_stacked(b))
        # tiles local to this load: slots 0/1 = band p, 2/3 = band q
        local = []
        for i in range(bands[p][0], bands[p][1]):
            for j in range(bands[q][0], bands[q][1]):
                if q == p and j < i:
                    continue
                si = i - bands[p][0]
                sj = (j - bands[q][0]) + (0 if q == p else 2)
                local.append((si, sj, i == j))
        n += dispatch_pairs(engine, local, "mixed", filt,
                            lambda recs, rev=None: got.append(recs.copy()),
                            engine.stacked)
    engine.stage_close()
    assert engine.stage_stats["n_prefetched"] > 0
    assert n == n_ref
    recs = np.concatenate([g for g in got if len(g)])
    assert len(recs) == len(ref)
    a, b = _sorted(ref), _sorted(recs)
    for f in ("ridA", "ridB", "packA", "packB", "controller"):
        np.testing.assert_array_equal(a[f], b[f])
    for f in ("D", "Dprime", "R2", "P"):
        np.testing.assert_allclose(a[f], b[f], atol=1e-12)


def test_staging_failure_degrades_to_on_demand():
    """A staging provider that raises must not kill the run: stage_wait
    swallows the failure (with a warning) and the band loads on demand
    at the next set_load."""
    rng = np.random.default_rng(23)
    n_samples = 4 * 128
    stacked = _stacked(rng, NB=4, n_samples=n_samples)

    def band_stacked(b):
        return {k: v[2 * b:2 * b + 2] for k, v in stacked.items()}

    settings = CalcSettings(min_r2=0.0, min_p=1.0)
    engine = LdEngine(None, n_samples, settings, mesh=None, B=8)
    engine.MAX_RESIDENT_BANDS = 3

    def boom():
        raise RuntimeError("inflate exploded")

    engine.stage_band_async(1, boom)
    engine.stage_wait()                      # must not raise
    assert 1 not in engine._band_host
    # the band still loads on demand and computes
    engine.set_load([(0, band_stacked(0)), (1, band_stacked(1))])
    filt = LdFilters(min_r2=0.0, min_p=1.0)
    got = []
    n = dispatch_pairs(engine, [(0, 2, False)], "mixed", filt,
                       lambda recs, rev=None: got.append(recs.copy()),
                       engine.stacked)
    engine.stage_close()
    assert n == 64 and len(np.concatenate(got)) > 0


@pytest.mark.parametrize("n_procs", [2, 4, 8])
def test_round_robin_partition_balance(n_procs):
    """Scaling proxy for BASELINE's >= 85% 2-host efficiency target
    (round-3 VERDICT task 3): the round-robin tile partition must land
    per-process CANDIDATE-PAIR counts within 10% of each other on a
    realistic all-vs-all grid (diagonal tiles carry ~half a square
    tile's pairs, which contiguous splits would misbalance)."""
    from tomahawk_tpu.parallel.distributed import partition_tiles
    B = 4096
    n_sup = 40
    pairs = [(i, j, i == j) for i in range(n_sup)
             for j in range(i, n_sup)]

    def cand(tiles):
        return sum(B * (B - 1) // 2 if d else B * B for _, _, d in tiles)

    per_proc = [cand(partition_tiles(pairs, p, n_procs)[0])
                for p in range(n_procs)]
    total = sum(per_proc)
    assert total == cand(pairs)
    spread = (max(per_proc) - min(per_proc)) / (total / n_procs)
    assert spread < 0.10, (per_proc, spread)


def test_round_robin_partition_balance_windowed():
    """Same balance bound in window mode, where tile pair counts vary
    with position: the windowed tile list is banded along the diagonal,
    and round robin still spreads it within 10%."""
    from tomahawk_tpu.compute.balancer import Balancer
    from tomahawk_tpu.parallel.distributed import partition_tiles
    B, n_sup, spacing, window = 4096, 60, 275, 4_000_000
    minpos = {i: i * B * spacing for i in range(n_sup)}
    maxpos = {i: (i + 1) * B * spacing - spacing for i in range(n_sup)}
    rid = {i: 0 for i in range(n_sup)}
    bal = Balancer.build(n_sup)
    tiles = bal.window_pairs(minpos, maxpos, rid, window)
    assert len(tiles) > 2 * n_sup

    def cand(ts):
        return sum(B * (B - 1) // 2 if d else B * B for _, _, d in ts)

    for n_procs in (2, 8):
        per = [cand(partition_tiles(tiles, p, n_procs)[0])
               for p in range(n_procs)]
        spread = (max(per) - min(per)) / (sum(per) / n_procs)
        assert spread < 0.10, (n_procs, per, spread)
