"""Measure per-grid-step overhead: copy-only and add-chain kernels at
several tile sizes. If total time ~ grid size (not work), overhead dominates."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pplp_tpu.ops.modmath import m31

B, K, N = 256, 4, 4096
Q = (1 << 30) - (1 << 18) + 1


def bench(label, body, tile):
    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    spec = lambda t: pl.BlockSpec((t, K, N), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))
    f = jax.jit(lambda xx: pl.pallas_call(
        kernel, grid=(B // tile,),
        in_specs=[spec(tile)], out_specs=spec(tile),
        out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(xx))
    out = f(x); jax.block_until_ready(out)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(x)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5)
        time.sleep(0.1)
    print(f"{label:28s} tile={tile:3d} grid={B//tile:4d}: {min(ts)*1e6:8.0f} us",
          flush=True)


CH = 16
w = jnp.uint32(123456789)
ws = jnp.uint32((123456789 << 32) // Q)
qv = jnp.uint32(Q)


def copy(x):
    return x


def addchain(x):
    y = x
    for _ in range(CH):
        y = y + x
    return y


def shoup(x):
    y = x
    for _ in range(CH):
        y = m31.mulmod_shoup(y, w, ws, qv)
    return y


for tile in (2, 8, 32):
    bench("copy", copy, tile)
for tile in (2, 8, 32):
    bench(f"add x{CH}", addchain, tile)
for tile in (2, 8, 32):
    bench(f"shoup scalar x{CH}", shoup, tile)

# XLA reference: same add chain fused by XLA on the full array.
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))
g = jax.jit(addchain)
out = g(x); jax.block_until_ready(out)
ts = []
for _ in range(8):
    t0 = time.perf_counter()
    for _ in range(5):
        out = g(x)
    jax.block_until_ready(out)
    ts.append((time.perf_counter() - t0) / 5)
    time.sleep(0.1)
print(f"XLA add x{CH} fused full array: {min(ts)*1e6:8.0f} us", flush=True)
