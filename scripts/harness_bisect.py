"""Bisect why mosaic_op_cost2 measures ~5000us where bcast_const measures ~55us.

Differences: TILE (2 vs 8), in-kernel reshape to 4-D, dimension_semantics
(parallel vs arbitrary), extra (K,1,1) VMEM input, m31.mulmod_shoup vs
inline mulhi.
"""
import sys, time, itertools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pplp_tpu.ops.modmath import m31

B, K, N = 256, 4, 4096
C1, C2 = 32, 128
Q = (1 << 30) - (1 << 18) + 1
CH = 16


def mulhi(a, b):
    a0 = a & jnp.uint32(0xFFFF); a1 = a >> 16
    b0 = b & jnp.uint32(0xFFFF); b1 = b >> 16
    mid = a0 * b1 + ((a0 * b0) >> 16)
    mid2 = a1 * b0 + (mid & jnp.uint32(0xFFFF))
    return a1 * b1 + (mid >> 16) + (mid2 >> 16)


def run(tile, reshape4d, semantics, use_m31):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        if reshape4d:
            x = x.reshape(tile, K, C1, C2)
        w = jnp.uint32(123456789)
        ws = jnp.uint32((123456789 << 32) // Q)
        q = jnp.uint32(Q)
        y = x
        for _ in range(CH):
            if use_m31:
                y = m31.mulmod_shoup(y, w, ws, q)
            else:
                y = y * w - mulhi(y, ws) * q
        if reshape4d:
            y = y.reshape(tile, K, N)
        o_ref[...] = y

    spec = pl.BlockSpec((tile, K, N), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))
    f = jax.jit(lambda xx: pl.pallas_call(
        kernel, grid=(B // tile,),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(semantics,)),
    )(xx))
    out = f(x); jax.block_until_ready(out)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(x)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5)
        time.sleep(0.05)
    label = (f"tile={tile} reshape4d={int(reshape4d)} "
             f"{semantics:9s} m31={int(use_m31)}")
    print(f"{label:48s}: {min(ts)*1e6:8.0f} us", flush=True)


for tile in (2, 8):
    for reshape4d in (False, True):
        for semantics in ("arbitrary", "parallel"):
            for use_m31 in (False, True):
                run(tile, reshape4d, semantics, use_m31)
