"""Map the Mosaic slow-path boundary: which operand shapes/layouts make
u32 multiply chains slow inside a Pallas kernel.

Established: 4-D view + small-ref broadcast = 5000us; literal scalars or
3-D views = ~50us.
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
TILE = 8


def run(label, qshape, reshape4d, body=None):
    def kernel(q_ref, x_ref, o_ref):
        x = x_ref[...]
        if reshape4d:
            x = x.reshape(TILE, K, C1, C2)
        q = q_ref[...]
        if body is not None:
            y = body(x, q)
        else:
            w = jnp.uint32(123456789)
            ws = jnp.uint32((123456789 << 32) // Q)
            y = x
            for _ in range(CH):
                y = m31.mulmod_shoup(y, w, ws, q)
        if reshape4d:
            y = y.reshape(TILE, K, N)
        o_ref[...] = y

    vm = pltpu.VMEM
    qspec = pl.BlockSpec(qshape, lambda b: (0,) * len(qshape),
                         memory_space=vm)
    spec = pl.BlockSpec((TILE, K, N), lambda b: (b, 0, 0), memory_space=vm)
    qj = jnp.asarray(np.full(qshape, Q, np.uint32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))
    f = jax.jit(lambda q, xx: pl.pallas_call(
        kernel, grid=(B // TILE,),
        in_specs=[qspec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
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
    print(f"{label:58s}: {min(ts)*1e6:8.0f} us", flush=True)


def mullo_chain(x, q):
    y = x
    for _ in range(CH):
        y = y * x
    return y * jnp.broadcast_to(q, x.shape).astype(jnp.uint32) \
        if False else y


def mullo_vs_q(x, q):
    y = x
    for _ in range(CH):
        y = y * q
    return y


# shoup chains
run("shoup q=(K,C1,C2) full-width ref, 4D", (K, C1, C2), True)
run("shoup q=(1,K,1,C2) lane-width ref, 4D", (1, K, 1, C2), True)
run("shoup q=(1,K,C1,C2) full ref, 4D", (1, K, C1, C2), True)
run("shoup q=(1,K,1) ref, 3D", (1, K, 1), False)
run("shoup q=(1,1,N) lane ref, 3D", (1, 1, N), False)
# pure mullo chains: vector x broadcast-q
run("mullo y*q q=(1,K,1,1) ref, 4D", (1, K, 1, 1), True, mullo_vs_q)
run("mullo y*q q=(1,K,1,C2) ref, 4D", (1, K, 1, C2), True, mullo_vs_q)
run("mullo y*q q=(1,K,C1,C2) ref, 4D", (1, K, C1, C2), True, mullo_vs_q)
run("mullo y*q q=(1,K,1) ref, 3D", (1, K, 1), False, mullo_vs_q)
run("mullo y*x (vec x vec), 4D", (1, 1), True, mullo_chain)
run("mullo y*x (vec x vec), 3D", (1, 1), False, mullo_chain)
