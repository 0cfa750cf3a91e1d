"""Per-primitive VPU cost on this chip: which u32 ops are native?"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, N = 256, 4, 4096
Q = (1 << 30) - (1 << 18) + 1
TILE = 8
CH = 16


def bench(label, body):
    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    spec = pl.BlockSpec((TILE, K, N), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))
    f = jax.jit(lambda xx: pl.pallas_call(
        kernel, grid=(B // TILE,),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
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
    best = min(ts)
    per_op_ps = best / CH / (B * K * N) * 1e12
    print(f"{label:32s}: {best*1e6:8.0f} us  ({per_op_ps:6.1f} ps/elem/rep)",
          flush=True)


def mk(body):
    return body


C = 123456789


def mul_u32(x):
    y = x
    for _ in range(CH):
        y = y * x
    return y


def mul_u32_scalar(x):
    y = x
    c = jnp.uint32(C)
    for _ in range(CH):
        y = y * c
    return y


def mul_u16range(x):
    y = x & jnp.uint32(0xFFFF)
    z = x >> 16
    for _ in range(CH):
        y = (y * z) & jnp.uint32(0xFFFF)
    return y


def mul_s32(x):
    y = x.astype(jnp.int32)
    for _ in range(CH):
        y = y * y
    return y.astype(jnp.uint32)


def shift_chain(x):
    y = x
    for _ in range(CH):
        y = (y >> 3) ^ (y << 2)
    return y


def cmp_sel(x):
    y = x
    q = jnp.uint32(Q)
    for _ in range(CH):
        y = jnp.where(y >= q, y - q, y + jnp.uint32(1))
    return y


def f32_mul(x):
    y = x.astype(jnp.float32)
    for _ in range(CH):
        y = y * y + 1.0
    return y.astype(jnp.uint32)


def f32_fma_pair(x):
    # two independent f32 fma chains (ILP probe)
    a = x.astype(jnp.float32)
    b = (x >> 1).astype(jnp.float32)
    for _ in range(CH):
        a = a * 1.5 + 1.0
        b = b * 1.25 + 2.0
    return (a + b).astype(jnp.uint32)


for label, body in [
    ("u32 mul (var*var) x16", mul_u32),
    ("u32 mul (var*scalar) x16", mul_u32_scalar),
    ("u32 mul 16bit-range x16", mul_u16range),
    ("s32 mul x16", mul_s32),
    ("shift^shift x16", shift_chain),
    ("cmp+select x16", cmp_sel),
    ("f32 mul+add x16", f32_mul),
    ("f32 fma pair x16", f32_fma_pair),
]:
    bench(label, body)
