"""Probe MXU: int8 x int8 -> int32 support + rates vs f32/bf16 at several
shapes. Determines the digit decomposition for an MXU-based NTT."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mm_bench(label, in_dtype, acc_dtype, M, K, N, reps=8):
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((M, N), acc_dtype)
        for _ in range(reps):
            acc = acc + jax.lax.dot_general(
                a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
        o_ref[...] = acc

    rng = np.random.default_rng(0)
    if jnp.issubdtype(in_dtype, jnp.floating):
        a = jnp.asarray(rng.random((M, K)), in_dtype)
        b = jnp.asarray(rng.random((K, N)), in_dtype)
    else:
        a = jnp.asarray(rng.integers(-100, 100, (M, K)), in_dtype)
        b = jnp.asarray(rng.integers(-100, 100, (K, N)), in_dtype)
    try:
        f = jax.jit(lambda x, y: pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
        )(x, y))
        out = f(a, b); jax.block_until_ready(out)
    except Exception as e:
        print(f"{label:44s}: FAILED {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(a, b)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 10)
        time.sleep(0.05)
    best = min(ts)
    tops = 2 * M * K * N * reps / best / 1e12
    print(f"{label:44s}: {best*1e6:8.0f} us  {tops:7.2f} T(MAC2)/s",
          flush=True)


def correctness():
    rng = np.random.default_rng(1)
    a = rng.integers(-128, 128, (128, 128)).astype(np.int8)
    b = rng.integers(-128, 128, (128, 128)).astype(np.int8)
    want = a.astype(np.int64) @ b.astype(np.int64)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    f = jax.jit(lambda x, y: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
    )(x, y))
    got = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
    print("int8->int32 exact:", np.array_equal(got, want), flush=True)


correctness()
for M, K, N in ((512, 512, 512), (1024, 1024, 1024), (128, 128, 2048)):
    mm_bench(f"i8xi8->i32 {M}x{K}x{N}", jnp.int8, jnp.int32, M, K, N)
    mm_bench(f"bf16->f32 {M}x{K}x{N}", jnp.bfloat16, jnp.float32, M, K, N)
    mm_bench(f"f32->f32  {M}x{K}x{N}", jnp.float32, jnp.float32, M, K, N)
