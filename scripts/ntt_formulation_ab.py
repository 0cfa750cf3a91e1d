"""A/B in-kernel NTT formulations at the fused kernel's working shape.

(a) roll+select (current ntt_vmem style — mulmod on full arrays)
(b) reshape-split (ntt4 style — mulmod on half arrays, lane relayouts)

Both compute a full 12-stage forward NTT on [T, K, 32, 128] tiles.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pplp_tpu.ops import ntt4
from pplp_tpu.ops.modmath import m31
from pplp_tpu.ops.ntt4 import C2
from pplp_tpu.ops.ntt_vmem import _bf_ct, _bf_gs, _vtables, build_vmem_tables
from pplp_tpu.ops.primes import Modulus, get_primes

N = 4096
K = 4
B = 256
TILE = 2
moduli = [Modulus(q) for q in get_primes(30, K, N)]
tb4 = ntt4.build_tables4(moduli, N)
vt = build_vmem_tables(tb4)
c1, logc1 = tb4.c1, tb4.logc1

rng = np.random.default_rng(0)
qs = np.array([m.value for m in moduli], np.uint64)[None, :, None]
x = jnp.asarray((rng.integers(0, 1 << 62, size=(B, K, N)).astype(np.uint64) % qs).astype(np.uint32))
qcol = np.asarray([m.value for m in moduli], np.uint32).reshape(K, 1, 1)


def kernel_roll(q_ref, aw, aws, cw, cws, amf, cmf, twm, twms, x_ref, o_ref):
    q = q_ref[...]
    T = x_ref.shape[0]
    xv = x_ref[...].reshape(T, K, c1, C2)
    awl, awsl, cwl, cwsl = aw[...], aws[...], cw[...], cws[...]
    amfl, cmfl = amf[...], cmf[...]
    for s in range(logc1):
        t = c1 >> (s + 1)
        xv = _bf_ct(xv, awl[:, s], awsl[:, s], amfl[s], t, q, c1, 2)
    xv = m31.mulmod_shoup_lazy(xv, twm[...], twms[...], q)
    for s in range(7):
        t = C2 >> (s + 1)
        xv = _bf_gs(xv, cwl[:, s], cwsl[:, s], cmfl[s], t, q, C2, 3)
    o_ref[...] = m31.csub(xv, q).reshape(T, K, N)


def kernel_reshape(q_ref, twm, twms, *refs):
    # refs: logc1 stage tables (w, ws) pre-shaped [K, h, 1, 1], then 7 lane
    # stage tables (w, ws) pre-shaped [K, 1, 1, t], then x_ref, o_ref.
    a_tabs = refs[: 2 * logc1]
    c_tabs = refs[2 * logc1 : 2 * logc1 + 14]
    x_ref, o_ref = refs[-2], refs[-1]
    q = q_ref[...]
    q4 = q[..., None]
    T = x_ref.shape[0]
    xv = x_ref[...].reshape(T, K, c1, C2)
    # step A: CT-DIT negacyclic down the sublane (c1) axis.
    h, t = 1, c1
    for s in range(logc1):
        t //= 2
        xs = xv.reshape(T, K, h, 2, t, C2)
        u = xs[:, :, :, 0]
        v = xs[:, :, :, 1]
        w = a_tabs[2 * s][...]
        ws = a_tabs[2 * s + 1][...]
        u = m31.csub2q(u, q4 * 2)
        mv = m31.mulmod_shoup_lazy(v, w, ws, q4)
        xv = jnp.stack([u + mv, u - mv + q4 * 2], axis=3).reshape(T, K, c1, C2)
        h *= 2
    xv = m31.mulmod_shoup_lazy(xv, twm[...], twms[...], q)
    # step C: GS-DIF cyclic along the LANE axis (reshape-split on lanes).
    t = C2 // 2
    for s in range(7):
        m = C2 // (2 * t)
        xs = xv.reshape(T, K, c1, m, 2, t)
        u = xs[..., 0, :]
        v = xs[..., 1, :]
        w = c_tabs[2 * s][...]
        ws = c_tabs[2 * s + 1][...]
        a = m31.csub2q(u + v, q4 * 2)
        bmul = m31.mulmod_shoup_lazy(u - v + q4 * 2, w, ws, q4)
        xv = jnp.stack([a, bmul], axis=4).reshape(T, K, c1, C2)
        t //= 2
    o_ref[...] = m31.csub(xv, q).reshape(T, K, N)


def run(kern, args, label):
    vm = pltpu.VMEM
    full = lambda a: pl.BlockSpec(a.shape, lambda b, _s=len(a.shape): (0,) * _s, memory_space=vm)
    spec_x = pl.BlockSpec((TILE, K, N), lambda b: (b, 0, 0), memory_space=vm)
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        grid=(B // TILE,),
        in_specs=[full(v) for v in a[:-1]] + [spec_x],
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((B, K, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(*a))
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5)
        time.sleep(0.2)
    best = min(ts)
    ntr = B * K
    print(f"{label}: best {best*1e6:.0f} us -> {best/ntr*1e9:.0f} ns/limb-transform "
          f"({ntr/best/1e6:.2f}M/s)", flush=True)
    return out


qj = jnp.asarray(qcol)
o1 = run(kernel_roll,
         (qj, vt.aw, vt.aws, vt.cw, vt.cws, vt.amask[0], vt.cmask[0],
          tb4.tw, tb4.tws, x), "roll+select")

a_tabs = []
h = 1
for s in range(logc1):
    a_tabs.append(tb4.w1[:, h: 2 * h].reshape(K, h, 1, 1))
    a_tabs.append(tb4.w1s[:, h: 2 * h].reshape(K, h, 1, 1))
    h *= 2
c_tabs = []
t = C2 // 2
for s in range(7):
    c_tabs.append(tb4.wc[:, s, :t].reshape(K, 1, 1, t))
    c_tabs.append(tb4.wcs[:, s, :t].reshape(K, 1, 1, t))
    t //= 2
o2 = run(kernel_reshape,
         tuple([qj, tb4.tw, tb4.tws] + a_tabs + c_tabs + [x]), "reshape-split")
o1b = run(kernel_roll,
         (qj, vt.aw, vt.aws, vt.cw, vt.cws, vt.amask[0], vt.cmask[0],
          tb4.tw, tb4.tws, x), "roll+select (repeat)")

# cross-check: reshape kernel = ntt4.forward4 up to the flat layout
# (forward4 flattens [C2, c1]; the lane-axis kernel keeps [c1, C2]).
ref = ntt4.forward4(x, tb4).reshape(B, K, C2, c1)
o2v = jnp.swapaxes(o2.reshape(B, K, c1, C2), -1, -2)
print("reshape matches ntt4.forward4:", bool(jnp.array_equal(o2v, ref)))
