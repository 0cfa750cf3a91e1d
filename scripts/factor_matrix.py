"""Factorial experiment: tile x dimension_semantics x q-shape, ref-loaded q,
4-D reshape, interleaved twice to detect drift."""
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
rng = np.random.default_rng(0)
X = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))


def build(tile, semantics, qshape):
    def kernel(q_ref, x_ref, o_ref):
        x = x_ref[...].reshape(tile, K, C1, C2)
        q = q_ref[...]
        w = jnp.uint32(123456789)
        ws = jnp.uint32((123456789 << 32) // Q)
        y = x
        for _ in range(CH):
            y = m31.mulmod_shoup(y, w, ws, q)
        o_ref[...] = y.reshape(tile, K, N)

    spec_x = pl.BlockSpec((tile, K, N), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_q = pl.BlockSpec(qshape, lambda b: (0,) * len(qshape),
                          memory_space=pltpu.VMEM)
    qj = jnp.asarray(np.full(qshape, Q, np.uint32))
    f = jax.jit(lambda q, xx: pl.pallas_call(
        kernel, grid=(B // tile,), in_specs=[spec_q, spec_x],
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(semantics,)))(q, xx))
    out = f(qj, X); jax.block_until_ready(out)
    return f, qj


def measure(f, qj):
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(qj, X)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5)
        time.sleep(0.02)
    return min(ts) * 1e6


cfgs = []
for tile in (2, 8):
    for sem in ("arbitrary", "parallel"):
        for qshape in ((K, 1, 1), (1, 1)):
            cfgs.append((tile, sem, qshape))

built = [(c, *build(*c)) for c in cfgs]
for rnd in range(2):
    for (tile, sem, qshape), f, qj in built:
        us = measure(f, qj)
        print(f"r{rnd} tile={tile} {sem:9s} q={str(qshape):12s}: "
              f"{us:8.0f} us", flush=True)
