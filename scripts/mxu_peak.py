"""Peak MXU rates via plain XLA matmuls (f32 / bf16 / int8->int32),
well-shaped and dependency-free."""
import time
import jax, jax.numpy as jnp, numpy as np
import sys
sys.path.insert(0, "/root/repo")
from pplp_tpu.utils.chipstate import canary_latency, enable_compile_cache

enable_compile_cache()


def bench(label, make, flops):
    f, args = make()
    out = f(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
        time.sleep(0.03)
    best = min(ts)
    print(f"{label:40s}: {best*1e6:9.0f} us  {flops/best/1e12:7.2f} T/s",
          flush=True)


M = K = N = 2048


def mk(dt, acc):
    rng = np.random.default_rng(0)
    if jnp.issubdtype(dt, jnp.floating):
        a = jnp.asarray(rng.random((M, K)), dt)
        b = jnp.asarray(rng.random((K, N)), dt)
    else:
        a = jnp.asarray(rng.integers(-100, 100, (M, K)), dt)
        b = jnp.asarray(rng.integers(-100, 100, (K, N)), dt)
    f = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=acc))
    return f, (a, b)


print("canary:", round(canary_latency() * 1e6), "us", flush=True)
for dt, acc, nm in ((jnp.float32, jnp.float32, "f32"),
                    (jnp.bfloat16, jnp.float32, "bf16->f32"),
                    (jnp.int8, jnp.int32, "i8->i32")):
    bench(f"{nm} {M}x{K}x{N}", lambda dt=dt, acc=acc: mk(dt, acc),
          2 * M * K * N)
print("canary:", round(canary_latency() * 1e6), "us", flush=True)

# batched smaller matmuls closer to the NTT shape: [B,32,128]x[128,128]
B = 1024


def mk_ntt_shape(dt, acc):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-100, 100, (B, 32, 128)), dt)
    b = jnp.asarray(rng.integers(-100, 100, (128, 128)), dt)
    f = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((2,), (0,)), ((), ())), preferred_element_type=acc))
    return f, (a, b)


for dt, acc, nm in ((jnp.int8, jnp.int32, "i8->i32"),
                    (jnp.bfloat16, jnp.float32, "bf16->f32")):
    bench(f"{nm} [1024,32,128]x[128,128]",
          lambda dt=dt, acc=acc: mk_ntt_shape(dt, acc),
          2 * B * 32 * 128 * 128)
print("canary:", round(canary_latency() * 1e6), "us", flush=True)
