"""Test whether one slow kernel poisons subsequent kernels in the process.

Order: FAST kernel -> SLOW kernel (rank-mismatch broadcast shoup) -> FAST
kernel again (fresh compile, different name), -> original FAST fn again.
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pplp_tpu.ops.modmath import m31

B, K, N = 256, 4, 4096
C1, C2 = 32, 128
Q = (1 << 30) - (1 << 18) + 1
TILE = 8
CH = 16
rng = np.random.default_rng(0)
X = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))
QK = jnp.asarray(np.full((K, 1, 1), Q, np.uint32))

spec_x = pl.BlockSpec((TILE, K, N), lambda b: (b, 0, 0),
                      memory_space=pltpu.VMEM)
spec_q = pl.BlockSpec((K, 1, 1), lambda b: (0, 0, 0),
                      memory_space=pltpu.VMEM)


def timeit(label, f, *args):
    out = f(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5)
        time.sleep(0.05)
    print(f"{label:58s}: {min(ts)*1e6:8.0f} us", flush=True)


def fast_kernel(x_ref, o_ref):
    x = x_ref[...]
    w = jnp.uint32(123456789)
    ws = jnp.uint32((123456789 << 32) // Q)
    q = jnp.uint32(Q)
    y = x
    for _ in range(CH):
        y = m31.mulmod_shoup(y, w, ws, q)
    o_ref[...] = y


def fast_kernel2(x_ref, o_ref):
    x = x_ref[...]
    w = jnp.uint32(123456788)
    ws = jnp.uint32((123456788 << 32) // Q)
    q = jnp.uint32(Q)
    y = x
    for _ in range(CH):
        y = m31.mulmod_shoup(y, w, ws, q)
    o_ref[...] = y


def slow_kernel(q_ref, x_ref, o_ref):
    x = x_ref[...].reshape(TILE, K, C1, C2)
    q = q_ref[...]
    w = jnp.uint32(123456789)
    ws = jnp.uint32((123456789 << 32) // Q)
    y = x
    for _ in range(CH):
        y = m31.mulmod_shoup(y, w, ws, q)
    o_ref[...] = y.reshape(TILE, K, N)


mk_fast = lambda k: jax.jit(lambda xx: pl.pallas_call(
    k, grid=(B // TILE,), in_specs=[spec_x], out_specs=spec_x,
    out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
    compiler_params=pltpu.CompilerParams(
        dimension_semantics=("arbitrary",)))(xx))

f_fast = mk_fast(fast_kernel)
f_slow = jax.jit(lambda q, xx: pl.pallas_call(
    slow_kernel, grid=(B // TILE,), in_specs=[spec_q, spec_x],
    out_specs=spec_x,
    out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
    compiler_params=pltpu.CompilerParams(
        dimension_semantics=("arbitrary",)))(q, xx))

timeit("1) fast (literal consts)", f_fast, X)
timeit("2) slow (rank-mismatch bcast)", f_slow, QK, X)
timeit("3) fast again (same compiled fn)", f_fast, X)
timeit("4) fast fresh compile", mk_fast(fast_kernel2), X)
timeit("5) slow again", f_slow, QK, X)
timeit("6) fast again", f_fast, X)
