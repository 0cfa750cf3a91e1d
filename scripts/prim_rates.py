"""True per-primitive vector rates on this chip: u32/u16/i32/f32 vec x vec
multiply, add, and MXU matmul throughput. Determines the modmul redesign."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, N = 256, 4, 4096
Q = (1 << 30) - (1 << 18) + 1
TILE = 8
CH = 16


def bench(label, dtype, body, nops=CH):
    def kernel(x_ref, y_ref, o_ref):
        o_ref[...] = body(x_ref[...], y_ref[...])

    spec = pl.BlockSpec((TILE, K, N), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    rng = np.random.default_rng(0)
    if jnp.issubdtype(dtype, jnp.floating):
        x = jnp.asarray(rng.random((B, K, N)), dtype)
        y = jnp.asarray(rng.random((B, K, N)) + 1.0, dtype)
    else:
        info = jnp.iinfo(dtype)
        x = jnp.asarray(rng.integers(1, min(Q, info.max), size=(B, K, N)),
                        dtype)
        y = jnp.asarray(rng.integers(1, min(Q, info.max), size=(B, K, N)),
                        dtype)
    f = jax.jit(lambda a, b: pl.pallas_call(
        kernel, grid=(B // TILE,),
        in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, K, N), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(a, b))
    out = f(x, y); jax.block_until_ready(out)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(x, y)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5)
        time.sleep(0.05)
    best = min(ts)
    rate = B * K * N * nops / best / 1e12
    print(f"{label:36s}: {best*1e6:8.0f} us  {rate:7.3f} T-op/s", flush=True)


def chain_mul(x, y):
    z = x
    for _ in range(CH):
        z = z * y
    return z


def chain_add(x, y):
    z = x
    for _ in range(CH):
        z = z + y
    return z


def chain_mul16(x, y):
    # products of 16-bit halves: the building block of mulhi
    z = x
    xm = x & jnp.array(0xFFFF, x.dtype)
    for _ in range(CH):
        z = (z & jnp.array(0xFFFF, x.dtype)) * xm + y
    return z


for dt, nm in ((jnp.uint32, "u32"), (jnp.int32, "i32"),
               (jnp.float32, "f32"), (jnp.bfloat16, "bf16"),
               (jnp.uint16, "u16"), (jnp.uint8, "u8")):
    try:
        bench(f"{nm} vec*vec mul x16", dt, chain_mul)
    except Exception as e:
        print(f"{nm} mul failed: {type(e).__name__}", flush=True)
for dt, nm in ((jnp.uint32, "u32"), (jnp.float32, "f32")):
    bench(f"{nm} vec+vec add x16", dt, chain_add)
bench("u32 16bit-half mul x16", jnp.uint32, chain_mul16)


# MXU matmul rate: f32 and bf16->f32
def mm_bench(label, dtype, M=512, Kd=512, Nd=512, reps=8):
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((M, Nd), jnp.float32)
        for _ in range(reps):
            acc = acc + jax.lax.dot_general(
                a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[...] = acc

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((M, Kd)), dtype)
    b = jnp.asarray(rng.random((Kd, Nd)), dtype)
    f = jax.jit(lambda x, y: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Nd), jnp.float32),
    )(x, y))
    out = f(a, b); jax.block_until_ready(out)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(a, b)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 10)
        time.sleep(0.05)
    best = min(ts)
    tf = 2 * M * Kd * Nd * reps / best / 1e12
    print(f"{label:36s}: {best*1e6:8.0f} us  {tf:7.2f} TFLOP/s", flush=True)


mm_bench("f32 matmul 512^3 x8 (MXU)", jnp.float32)
mm_bench("bf16 matmul 512^3 x8 (MXU)", jnp.bfloat16)

print(jax.devices()[0].device_kind, jax.devices()[0].platform, flush=True)
