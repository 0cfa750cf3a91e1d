"""Find the slow construct: broadcasts, carries, slices, where, mul32."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pplp_tpu.ops import modmath as mm
from pplp_tpu.ops.modmath import m31

B, K, C1, C2 = 256, 4, 32, 128
N = C1 * C2
TILE = 2
Q = (1 << 30) - (1 << 18) + 1

def bench(body, extra, label, reps):
    def kernel(q_ref, e_ref, x_ref, o_ref):
        x = x_ref[...].reshape(TILE, K, C1, C2)
        o_ref[...] = body(x, q_ref[...], e_ref[...]).reshape(TILE, K, N)
    vm = pltpu.VMEM
    full = lambda a: pl.BlockSpec(a.shape, lambda b, s=len(a.shape): (0,)*s, memory_space=vm)
    spec_x = pl.BlockSpec((TILE, K, N), lambda b: (b, 0, 0), memory_space=vm)
    qj = jnp.asarray(np.full((K,1,1), Q, np.uint32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))
    f = jax.jit(lambda q, e, xx: pl.pallas_call(
        kernel, grid=(B // TILE,),
        in_specs=[full(qj), full(extra), spec_x], out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(q, e, xx))
    out = f(qj, extra, x); jax.block_until_ready(out)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(qj, extra, x)
        jax.block_until_ready(out)
        ts.append((time.perf_counter()-t0)/5)
        time.sleep(0.15)
    best = min(ts)
    print(f"{label}: {best*1e6:.0f} us total, {best/reps*1e6:.2f} us/rep", flush=True)

rng = np.random.default_rng(1)
wcol = jnp.asarray(rng.integers(1, Q, size=(K,1,1), dtype=np.uint32))
wscol = jnp.asarray(np.asarray([(int(v) << 32)//Q for v in np.asarray(wcol).ravel()], np.uint32).reshape(K,1,1))

CH = 16
def shoup_scalar(x, q, e):
    w = jnp.uint32(123456789); ws = jnp.uint32((123456789 << 32)//Q)
    y = x
    for _ in range(CH):
        y = m31.mulmod_shoup(y, w, ws, q)
    return y
bench(shoup_scalar, wcol, "shoup scalar-const x16", CH)

def shoup_veccol(x, q, e):
    y = x
    for _ in range(CH):
        y = m31.mulmod_shoup(y, e, e, q)  # [K,1,1] broadcast consts
    return y
bench(shoup_veccol, wcol, "shoup [K,1,1]-const x16", CH)

def mul32_chain(x, q, e):
    y = x
    for _ in range(CH):
        lo, hi = mm.mul32(y, x)
        y = lo ^ hi
    return y
bench(mul32_chain, wcol, "mul32(full 64b) x16", CH)

def carry_chain(x, q, e):
    z0 = x; z1 = x
    for _ in range(CH):
        z0 = z0 + x
        c = (z0 < x).astype(jnp.uint32)
        z1 = z1 + c
    return z0 ^ z1
bench(carry_chain, wcol, "carry-add x16", CH)

def reduce64_chain(x, q, e):
    mu = (1 << 64) // Q
    mul_, muh = jnp.uint32(mu & 0xFFFFFFFF), jnp.uint32(mu >> 32)
    y = x
    for _ in range(CH):
        y = m31.reduce64(y, x >> 3, q, mul_, muh)
    return y
bench(reduce64_chain, wcol, "reduce64 x16", CH)

def slice_ops(x, q, e):
    y = x
    for _ in range(CH):
        yi = y[:, 1:2]
        y = y + yi  # broadcast of slice
    return y
bench(slice_ops, wcol, "slice+bcast add x16", CH)

def where_chain(x, q, e):
    y = x
    for _ in range(CH):
        y = jnp.where(y >= q, y - q, y + jnp.uint32(1))
    return y
bench(where_chain, wcol, "where chain x16", CH)
