"""Per-op cost inside a Pallas kernel at the fused kernel's shapes."""
import functools, sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pplp_tpu.ops import modmath as mm
from pplp_tpu.ops.modmath import m31

B = 256
K = 4
C1, C2 = 32, 128
N = C1 * C2
Q = (1 << 30) - (1 << 18) + 1

def make(body, nops, label, tile):
    def kernel(q_ref, x_ref, o_ref):
        q = q_ref[...]
        x = x_ref[...].reshape(tile, K, C1, C2)
        o_ref[...] = body(x, q).reshape(tile, K, N)
    vm = pltpu.VMEM
    full = lambda a: pl.BlockSpec(a.shape, lambda b, s=len(a.shape): (0,)*s, memory_space=vm)
    spec_x = pl.BlockSpec((tile, K, N), lambda b: (b, 0, 0), memory_space=vm)
    qj = jnp.asarray(np.full((K,1,1), Q, np.uint32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))
    f = jax.jit(lambda q, xx: pl.pallas_call(
        kernel, grid=(B // tile,),
        in_specs=[full(qj), spec_x], out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(q, xx))
    out = f(qj, x); jax.block_until_ready(out)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(qj, x)
        jax.block_until_ready(out)
        ts.append((time.perf_counter()-t0)/5)
        time.sleep(0.15)
    best = min(ts)
    nel = B * K * N
    print(f"{label} (tile {tile}): {best*1e6:.0f} us -> "
          f"{nel*nops/best/1e12:.2f} T-op-units/s", flush=True)

CH = 64
def adds(x, q):
    y = x
    for _ in range(CH):
        y = y + x
    return y
def mullos(x, q):
    y = x
    for _ in range(CH):
        y = y * x
    return y
def shoups(x, q):
    w = jnp.uint32(123456789 % Q); ws = jnp.uint32(((123456789 % Q) << 32)//Q)
    y = x
    for _ in range(CH // 4):
        y = m31.mulmod_shoup(y, w, ws, q)
    return y
def barretts(x, q):
    mu = (1 << 64) // Q
    mul, muh = jnp.uint32(mu & 0xFFFFFFFF), jnp.uint32(mu >> 32)
    y = x
    for _ in range(CH // 4):
        y = m31.mulmod(y, x, q, mul, muh)
    return y

for tile in (2, 8):
    make(adds, CH, "add chain", tile)
    make(mullos, CH, "mullo chain", tile)
    make(shoups, CH // 4, "shoup chain", tile)
    make(barretts, CH // 4, "barrett chain", tile)
