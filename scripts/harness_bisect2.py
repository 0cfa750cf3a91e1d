"""Final bisect: q as (K,1,1) VMEM-ref value broadcast against 4-D x.

mosaic_op_cost2 does: x.reshape(T,K,32,128); q = q_ref[...] with q shape
(K,1,1); y*w - mulhi*q broadcasts (K,1,1) -> (1,K,1,1) against 4-D.
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
CH = 16


def run(label, tile, qshape, reshape4d, semantics="parallel"):
    def kernel(q_ref, x_ref, o_ref):
        x = x_ref[...]
        if reshape4d:
            x = x.reshape(tile, K, C1, C2)
        q = q_ref[...]
        w = jnp.uint32(123456789)
        ws = jnp.uint32((123456789 << 32) // Q)
        y = x
        for _ in range(CH):
            y = m31.mulmod_shoup(y, w, ws, q)
        if reshape4d:
            y = y.reshape(tile, K, N)
        o_ref[...] = y

    vm = pltpu.VMEM
    qspec = pl.BlockSpec(qshape, lambda b: (0,) * len(qshape),
                         memory_space=vm)
    spec = pl.BlockSpec((tile, K, N), lambda b: (b, 0, 0), memory_space=vm)
    qj = jnp.asarray(np.full(qshape, Q, np.uint32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))
    f = jax.jit(lambda q, xx: pl.pallas_call(
        kernel, grid=(B // tile,),
        in_specs=[qspec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(semantics,)),
    )(qj, x))
    out = f(qj, x); jax.block_until_ready(out)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(qj, x)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5)
        time.sleep(0.05)
    print(f"{label:56s}: {min(ts)*1e6:8.0f} us", flush=True)


run("q=(1,K,1,1) ref, 4D reshape, tile=2", 2, (1, K, 1, 1), True)
run("q=(1,1) ref, 4D reshape, tile=2", 2, (1, 1), True)
