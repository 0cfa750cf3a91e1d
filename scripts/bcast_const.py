"""Verify the Mosaic slowdown source: per-limb constants as [1,K,1] arrays
broadcast into a [T,K,32,128] (or [T,K,N]) op vs scalar constants.

Hypothesis from round-3 bisect: identical shoup chain is 52us with scalar
constants, ~5000us with array-broadcast constants.
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, N = 256, 4, 4096
Q = (1 << 30) - (1 << 18) + 1
TILE = 8
CH = 16

WS = np.array([123456789, 987654321, 192837465, 564738291], dtype=np.uint32)
QS = np.array([Q, Q - 2, Q - 6, Q - 18], dtype=np.uint32)


def bench(label, kernel_fn, extra_in=()):
    specs = [pl.BlockSpec((TILE, K, N), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)]
    args = []
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, Q, size=(B, K, N), dtype=np.uint32))
    for arr in extra_in:
        specs.append(pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim,
                                  memory_space=pltpu.VMEM))
        args.append(jnp.asarray(arr))
    f = jax.jit(lambda xx, *a: pl.pallas_call(
        kernel_fn, grid=(B // TILE,),
        in_specs=specs, out_specs=specs[0],
        out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(xx, *a))
    out = f(x, *args); jax.block_until_ready(out)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(x, *args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5)
        time.sleep(0.05)
    print(f"{label:52s}: {min(ts)*1e6:8.0f} us", flush=True)


def shoup(y, x, w, ws, q):
    hi = jnp.uint32((jnp.uint64(y) * jnp.uint64(ws)) >> jnp.uint64(32)) \
        if False else mulhi(y, ws)
    t = y * w - hi * q
    return t


def mulhi(a, b):
    a0 = a & jnp.uint32(0xFFFF); a1 = a >> 16
    b0 = b & jnp.uint32(0xFFFF); b1 = b >> 16
    mid = a0 * b1 + ((a0 * b0) >> 16)
    mid2 = a1 * b0 + (mid & jnp.uint32(0xFFFF))
    return a1 * b1 + (mid >> 16) + (mid2 >> 16)


# 1) scalar python-int constants (same for all limbs)
def k_scalar(x_ref, o_ref):
    x = x_ref[...]
    y = x
    w = jnp.uint32(int(WS[0])); ws = jnp.uint32(int(WS[1])); q = jnp.uint32(Q)
    for _ in range(CH):
        y = y * w - mulhi(y, ws) * q
    o_ref[...] = y


# 2) per-limb constants via [1,K,1] array input, broadcast
def k_bcast(x_ref, w_ref, ws_ref, q_ref, o_ref):
    x = x_ref[...]
    y = x
    w = w_ref[...]; ws = ws_ref[...]; q = q_ref[...]
    for _ in range(CH):
        y = y * w - mulhi(y, ws) * q
    o_ref[...] = y


# 3) per-limb constants built in-kernel via iota+select (no captured consts)
def k_const_arr(x_ref, o_ref):
    x = x_ref[...]
    y = x
    kidx = jax.lax.broadcasted_iota(jnp.uint32, (1, K, 1), 1)
    w = jnp.uint32(int(WS[0]))
    ws = jnp.uint32(int(WS[0]) + 3)
    q = jnp.uint32(int(QS[0]))
    wv, wsv, qv = (jnp.full((1, K, 1), w, jnp.uint32),
                   jnp.full((1, K, 1), ws, jnp.uint32),
                   jnp.full((1, K, 1), q, jnp.uint32))
    for k in range(1, K):
        sel = kidx == jnp.uint32(k)
        wv = jnp.where(sel, jnp.uint32(int(WS[k])), wv)
        wsv = jnp.where(sel, jnp.uint32(int(WS[k]) + 3), wsv)
        qv = jnp.where(sel, jnp.uint32(int(QS[k])), qv)
    for _ in range(CH):
        y = y * wv - mulhi(y, wsv) * qv
    o_ref[...] = y


# 4) unrolled per-limb with scalar constants, concat at end
def k_unroll(x_ref, o_ref):
    x = x_ref[...]
    outs = []
    for k in range(K):
        y = x[:, k]
        w = jnp.uint32(int(WS[k])); ws = jnp.uint32(int(WS[k]) + 3)
        q = jnp.uint32(int(QS[k]))
        for _ in range(CH):
            y = y * w - mulhi(y, ws) * q
        outs.append(y)
    o_ref[...] = jnp.stack(outs, axis=1)


# 5) unrolled per-limb writing slices directly
def k_unroll_slice(x_ref, o_ref):
    for k in range(K):
        y = x_ref[:, k]
        w = jnp.uint32(int(WS[k])); ws = jnp.uint32(int(WS[k]) + 3)
        q = jnp.uint32(int(QS[k]))
        for _ in range(CH):
            y = y * w - mulhi(y, ws) * q
        o_ref[:, k] = y


bench("scalar consts (shared)", k_scalar)
bench("unrolled limbs, scalar consts, stack", k_unroll)
bench("unrolled limbs, scalar consts, ref slices", k_unroll_slice)
bench("[1,K,1] consts materialized in kernel", k_const_arr)
bench("[1,K,1] consts via VMEM input refs", k_bcast,
      extra_in=(WS.reshape(1, K, 1), (WS + 3).reshape(1, K, 1),
                QS.reshape(1, K, 1)))
