"""Morph bisect3's slow 'mullo y*x 3D' case into prim_rates' fast case,
one difference at a time, to find the poison."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, N = 256, 4, 4096
Q = (1 << 30) - (1 << 18) + 1
TILE = 8
CH = 16
rng = np.random.default_rng(0)
X = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))
QJ2 = jnp.asarray(np.full((1, 1), Q, np.uint32))
QJ3 = jnp.asarray(np.full((1, K, 1), Q, np.uint32))


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


spec_x = pl.BlockSpec((TILE, K, N), lambda b: (b, 0, 0),
                      memory_space=pltpu.VMEM)


def chain(x):
    y = x
    for _ in range(CH):
        y = y * x
    return y


# A: slow-style — q input first, q loaded, unused
def kA(q_ref, x_ref, o_ref):
    x = x_ref[...]
    q = q_ref[...]
    o_ref[...] = chain(x)


# B: q input first, NOT loaded
def kB(q_ref, x_ref, o_ref):
    o_ref[...] = chain(x_ref[...])


# C: no q input at all
def kC(x_ref, o_ref):
    o_ref[...] = chain(x_ref[...])


# D: q input LAST, loaded, unused
def kD(x_ref, q_ref, o_ref):
    x = x_ref[...]
    q = q_ref[...]
    o_ref[...] = chain(x)


def call(kernel, nin_q, qshape=None, q_first=True):
    specs = []
    if nin_q and q_first:
        specs.append(pl.BlockSpec(qshape, lambda b: (0,) * len(qshape),
                                  memory_space=pltpu.VMEM))
    specs.append(spec_x)
    if nin_q and not q_first:
        specs.append(pl.BlockSpec(qshape, lambda b: (0,) * len(qshape),
                                  memory_space=pltpu.VMEM))
    return jax.jit(lambda *a: pl.pallas_call(
        kernel, grid=(B // TILE,),
        in_specs=specs, out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*a))


timeit("A: q(1,1) first, loaded, unused", call(kA, True, (1, 1)), QJ2, X)
timeit("B: q(1,1) first, not loaded", call(kB, True, (1, 1)), QJ2, X)
timeit("C: no q input", call(kC, False), X)
timeit("D: q(1,1) last, loaded, unused", call(kD, False, (1, 1), False)
       if False else call(kD, True, (1, 1), False), X, QJ2)
timeit("A3: q(1,K,1) first, loaded, unused", call(kA, True, (1, K, 1)),
       QJ3, X)
