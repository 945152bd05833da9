"""Probe: can a pallas TPU kernel unpack packed uint32 bit-planes in
VMEM and run int8 MXU dots per block?  Times the candidate fused
unphased tile kernel skeleton against the current XLA path."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 4096          # tile rows
W = 80            # packed words (2560 lanes)
L = W * 32
BM = 512          # block rows

rng = np.random.default_rng(0)
het_i = jnp.asarray(rng.integers(0, 2**32, (B, W), dtype=np.uint32))
hom_i = jnp.asarray(rng.integers(0, 2**32, (B, W), dtype=np.uint32))
het_j = jnp.asarray(rng.integers(0, 2**32, (B, W), dtype=np.uint32))
hom_j = jnp.asarray(rng.integers(0, 2**32, (B, W), dtype=np.uint32))


def unpack(x):
    b8 = jax.lax.bitcast_convert_type(x, jnp.uint8)      # [M, W, 4]
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (b8[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(x.shape[0], L).astype(jnp.int8)


def unpack32(x):
    # pallas-safe tiled unpack: pltpu.repeat tiles the word axis, so
    # lane p holds bit p // W of word p % W -- a fixed permutation of
    # the canonical order, which sample-axis contractions cannot see.
    from jax.experimental.pallas import tpu as _pt
    rep = _pt.repeat(x, 32, axis=1)
    sh = jax.lax.broadcasted_iota(jnp.uint32, rep.shape, 1) // jnp.uint32(
        x.shape[-1])
    return ((rep >> sh) & jnp.uint32(1)).astype(jnp.int8)


def kernel(hi_ref, oi_ref, hj_ref, oj_ref, mask_ref):
    ha = unpack32(hi_ref[:])
    oa = unpack32(oi_ref[:])
    hb = unpack32(hj_ref[:])
    ob = unpack32(oj_ref[:])
    dn = (((1,), (1,)), ((), ()))
    t11 = jax.lax.dot_general(ha, hb, dn, preferred_element_type=jnp.int32)
    t12 = jax.lax.dot_general(ha, ob, dn, preferred_element_type=jnp.int32)
    t21 = jax.lax.dot_general(oa, hb, dn, preferred_element_type=jnp.int32)
    t22 = jax.lax.dot_general(oa, ob, dn, preferred_element_type=jnp.int32)
    # toy epilogue standing in for the prefilter math
    f = (t11 * t22 - t12 * t21).astype(jnp.float32)
    mask_ref[:] = (f > 0).astype(jnp.int8)


@jax.jit
def fused(hi, oi, hj, oj):
    grid = (B // BM, B // BM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, W), lambda gi, gj: (gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, W), lambda gi, gj: (gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, W), lambda gi, gj: (gj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, W), lambda gi, gj: (gj, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BM), lambda gi, gj: (gi, gj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, B), jnp.int8),
    )(hi, oi, hj, oj)


@jax.jit
def xla_path(hi, oi, hj, oj):
    ha, oa, hb, ob = unpack(hi), unpack(oi), unpack(hj), unpack(oj)
    dn = (((1,), (1,)), ((), ()))
    t11 = jax.lax.dot_general(ha, hb, dn, preferred_element_type=jnp.int32)
    t12 = jax.lax.dot_general(ha, ob, dn, preferred_element_type=jnp.int32)
    t21 = jax.lax.dot_general(oa, hb, dn, preferred_element_type=jnp.int32)
    t22 = jax.lax.dot_general(oa, ob, dn, preferred_element_type=jnp.int32)
    f = (t11 * t22 - t12 * t21).astype(jnp.float32)
    return (f > 0).astype(jnp.int8)


def bench(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


try:
    m1 = fused(het_i, hom_i, het_j, hom_j)
    m2 = xla_path(het_i, hom_i, het_j, hom_j)
    ok = bool(jnp.array_equal(m1, m2))
    print("pallas ok, matches XLA:", ok)
    print(f"pallas  : {bench(fused, het_i, hom_i, het_j, hom_j)*1e3:.3f} ms")
    print(f"xla     : {bench(xla_path, het_i, hom_i, het_j, hom_j)*1e3:.3f} ms")
except Exception as e:
    print("pallas FAILED:", type(e).__name__)
    print(str(e)[:3000])
