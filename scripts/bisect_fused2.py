"""Finer fused-kernel ablation: which construct class burns the time.

Modes (monkeypatched, wrong math but same shapes/traffic):
  full     — unmodified
  nontt    — NTT fwd/inv -> identity
  nttonly  — conversions/floor/sk stubbed
  norelin  — relinearization loop skipped
  nomul    — all mulmods -> one u32 multiply
  noroll   — pltpu.roll -> identity (keeps mulmods/selects)

Run: python scripts/bisect_fused2.py mode1 mode2 ...  (sequential, one
process; compiles cache persistently). Canary latency printed around each
measurement so degraded windows are visible.
"""
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from pplp_tpu.utils.chipstate import canary_latency, enable_compile_cache, timed_windows

enable_compile_cache()

import pplp_tpu.bfv.behz_fused as bf
import pplp_tpu.ops.ntt_vmem as nv
from pplp_tpu.ops.modmath import m31
from pplp_tpu.bfv import BFVContext, EncryptionParameters
from pplp_tpu.bfv.behz import create_relin_keys
from pplp_tpu.bfv.ciphertext import Ciphertext
from pplp_tpu.bfv.keys import KeyGenerator

N, BATCH, TILE = 4096, 256, 4

ORIG = {
    "_ntt_fwd": bf._ntt_fwd,
    "_ntt_inv": bf._ntt_inv,
    "_to_bsk": bf._to_bsk,
    "_fast_floor": bf._fast_floor,
    "_sk_to_q": bf._sk_to_q,
    "mulmod_shoup": m31.mulmod_shoup,
    "mulmod_shoup_lazy": m31.mulmod_shoup_lazy,
    "mulmod": m31.mulmod,
    "roll": nv.pltpu.roll,
}


def restore():
    bf._ntt_fwd = ORIG["_ntt_fwd"]
    bf._ntt_inv = ORIG["_ntt_inv"]
    bf._to_bsk = ORIG["_to_bsk"]
    bf._fast_floor = ORIG["_fast_floor"]
    bf._sk_to_q = ORIG["_sk_to_q"]
    m31.mulmod_shoup = staticmethod(ORIG["mulmod_shoup"])
    m31.mulmod_shoup_lazy = staticmethod(ORIG["mulmod_shoup_lazy"])
    m31.mulmod = staticmethod(ORIG["mulmod"])
    nv.pltpu.roll = ORIG["roll"]


def apply(mode):
    restore()
    if mode == "full":
        pass
    elif mode == "nontt":
        bf._ntt_fwd = lambda x, tabs, q, c1, logc1: x
        bf._ntt_inv = lambda x, tabs, q, c1, logc1: x
    elif mode == "nttonly":
        bf._to_bsk = lambda x_q, kc, mt: jnp.concatenate(
            [x_q, x_q[:, : kc.qb.shape[0] - x_q.shape[1]]], axis=1)
        bf._fast_floor = lambda e_q, e_b, kc: e_b
        bf._sk_to_q = lambda w, kc, l, h: w[:, : kc.qq.shape[0]]
    elif mode == "norelin":
        orig_inv = ORIG["_ntt_inv"]
        counter = {"n": 0}
        # cheap proxy: relin is phase 7; stub _ntt_fwd calls made after the
        # 8 poly transforms by replacing the digit lift path is invasive, so
        # instead stub mulmods ONLY -- not available; approximate by nontt on
        # the relin loop via a flag the kernel lacks. Fallback: skip.
        raise SystemExit("norelin not supported standalone; use nomul/noroll")
    elif mode == "nomul":
        m31.mulmod_shoup = staticmethod(lambda x, w, ws, q: x * w)
        m31.mulmod_shoup_lazy = staticmethod(lambda x, w, ws, q: x * w)
        m31.mulmod = staticmethod(lambda x, y, q, ml, mh: x * y)
    elif mode == "noroll":
        nv.pltpu.roll = lambda x, shift, axis: x
    else:
        raise SystemExit(f"unknown mode {mode}")


def measure(mode):
    apply(mode)
    parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")
    ctx = BFVContext.build(parms, engine="vmem")
    kg = KeyGenerator(ctx, 0)
    rlk = create_relin_keys(ctx, kg.secret_key(), jax.random.key(1))
    fused = bf.FusedMultiplier(ctx, rlk, tile_b=TILE)
    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]

    def ct():
        def poly():
            v = rng.integers(0, 1 << 62, size=(BATCH, ctx.L, N)).astype(
                np.uint64) % qs
            return jnp.asarray(v.astype(np.uint32))
        return Ciphertext((poly(), poly()), "coeff")

    ct1, ct2 = ct(), ct()
    fr = lambda a, b: fused.multiply_relinearize(a, b).polys
    t0 = time.time()
    out = fr(ct1, ct2)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    c0 = canary_latency() * 1e6
    best, med = timed_windows(fr, ct1, ct2, windows=8, inner=2, budget_s=120)
    c1 = canary_latency() * 1e6
    print(
        f"{mode:8s}: best {best*1e3:7.2f} ms/batch  med {med*1e3:7.2f}"
        f"  ({BATCH/best:,.0f}/s)  compile {compile_s:.0f}s"
        f"  canary {c0:.0f}/{c1:.0f} us",
        flush=True,
    )


for mode in sys.argv[1:] or ["full"]:
    measure(mode)
