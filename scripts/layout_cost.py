"""Isolate the Mosaic slowdown: same op chain on different layouts/ranks."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, N = 256, 4, 4096
C1, C2 = 32, 128
Q = (1 << 30) - (1 << 18) + 1
TILE = 8
CH = 16


def run(label, block_shape, transform):
    def kernel(x_ref, o_ref):
        x = transform(x_ref[...])
        y = x
        c = jnp.uint32(123456789)
        for _ in range(CH):
            y = y * c + x
        o_ref[...] = y.reshape(x_ref.shape)

    spec = pl.BlockSpec(block_shape, lambda b: (b,) + (0,) * (len(block_shape) - 1),
                        memory_space=pltpu.VMEM)
    rng = np.random.default_rng(0)
    full_shape = (B,) + block_shape[1:]
    x = jnp.asarray(rng.integers(0, Q, size=full_shape, dtype=np.uint32))
    f = jax.jit(lambda xx: pl.pallas_call(
        kernel, grid=(B // block_shape[0],),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(full_shape, jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(xx))
    out = f(x); jax.block_until_ready(out)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(x)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5)
        time.sleep(0.1)
    print(f"{label:44s}: {min(ts)*1e6:8.0f} us", flush=True)


run("3D block (T,K,4096), no reshape", (TILE, K, N), lambda x: x)
run("3D->4D reshape (T,K,32,128)", (TILE, K, N),
    lambda x: x.reshape(TILE, K, C1, C2))
run("4D native block (T,K,32,128)", (TILE, K, C1, C2), lambda x: x)
run("3D->3D reshape (T*K,32,128)", (TILE, K, N),
    lambda x: x.reshape(TILE * K, C1, C2))
run("3D->2D reshape (T*K*32,128)", (TILE, K, N),
    lambda x: x.reshape(TILE * K * C1, C2))
run("4D native tiny tile (2,K,32,128)", (2, K, C1, C2), lambda x: x)
