"""Binary-search which part of mul32/shoup is slow, at TILE 2 and 8."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pplp_tpu.ops import modmath as mm
from pplp_tpu.ops.modmath import m31

B, K, N = 256, 4, 4096
Q = (1 << 30) - (1 << 18) + 1
CH = 16



def run(label, body, tile):
    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    spec = pl.BlockSpec((tile, K, N), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))
    f = jax.jit(lambda xx: pl.pallas_call(
        kernel, grid=(B // tile,),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(xx))
    out = f(x); jax.block_until_ready(out)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(x)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5)
        time.sleep(0.1)
    print(f"{label:40s} tile={tile}: {min(ts)*1e6:8.0f} us", flush=True)


def four_muls(x):
    y = x
    U16 = jnp.uint32(0xFFFF)
    for _ in range(CH):
        a0 = y & U16
        a1 = y >> 16
        b0 = x & U16
        b1 = x >> 16
        y = a0 * b0 + a0 * b1 + a1 * b0 + a1 * b1
    return y


def muls_recombine(x):
    y = x
    U16 = jnp.uint32(0xFFFF)
    for _ in range(CH):
        a0 = y & U16
        a1 = y >> 16
        b0 = x & U16
        b1 = x >> 16
        ll = a0 * b0
        mid = a0 * b1 + a1 * b0
        hh = a1 * b1
        lo = ll + (mid << 16)
        hi = hh + (mid >> 16)
        y = lo ^ hi
    return y


def full_mul32(x):
    y = x
    for _ in range(CH):
        lo, hi = mm.mul32(y, x)
        y = lo ^ hi
    return y


def shoup(x):
    y = x
    w = jnp.uint32(123456789)
    ws = jnp.uint32((123456789 << 32) // Q)
    q = jnp.uint32(Q)
    for _ in range(CH):
        y = m31.mulmod_shoup(y, w, ws, q)
    return y


def carry_only(x):
    y = x
    z1 = x
    for _ in range(CH):
        y = y + x
        c = (y < x).astype(jnp.uint32)
        z1 = z1 + c
    return y ^ z1


for tile in (2, 8):
    run("4 digit-muls (sum)", four_muls, tile)
    run("muls + shift recombine", muls_recombine, tile)
    run("full mul32 (with carries)", full_mul32, tile)
    run("full shoup mulmod", shoup, tile)
    run("carry compare+astype chain", carry_only, tile)
