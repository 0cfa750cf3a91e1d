"""Round-4: phase-level profile of the op-by-op mult+relin paths.

Measures, interleaved in canary-gated windows, at bench shapes (n=4096,
batch=256, tpu profile):
  - full mult+relin, ctx engine 'four' (the r03 headline path)
  - full mult+relin, ctx engine 'vmem' (op-by-op XLA conversions + Pallas NTT)
  - multiply only / relin only (four)
  - component kernels: fwd/inv NTT (four + vmem at Q width), _to_bsk,
    _fast_floor, _sk_to_q

Fixture discipline: NO eager device math — every input is synthetic random
residues (all phases are defined on arbitrary residues), so process startup
costs only jit compiles. Eager fixture chains (mul.multiply outside jit)
issue hundreds of tiny remote compiles and can wedge for an hour.

Usage: python scripts/r4_phase_profile.py [group]
  group: all | full | parts   (default full: just the two full paths)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pplp_tpu.utils.chipstate import enable_compile_cache, timed_windows_multi

enable_compile_cache()

N, BATCH = 4096, 256


def _rand_residues(moduli, shape, seed):
    rng = np.random.default_rng(seed)
    qs = np.array([m.value for m in moduli], np.uint64)
    qs = qs.reshape((1,) * (len(shape) - 2) + (len(moduli), 1))
    v = rng.integers(0, 1 << 62, size=shape).astype(np.uint64) % qs
    return jnp.asarray(v.astype(np.uint32))


def main():
    group = sys.argv[1] if len(sys.argv) > 1 else "full"
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.behz import RnsMultiplier, make_keys_jit, relinearize
    from pplp_tpu.bfv.ciphertext import Ciphertext
    from pplp_tpu.ops import ntt

    parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")
    fns = {}

    for eng in ("four", "vmem"):
        ctx = BFVContext.build(parms, engine=eng)
        t0 = time.time()
        _sk, rlk = make_keys_jit(ctx, 0)
        print(json.dumps({"keys": eng, "s": round(time.time() - t0, 1)}),
              flush=True)
        mul = RnsMultiplier(ctx)
        mk = lambda s, ctx=ctx: _rand_residues(ctx.moduli, (BATCH, ctx.L, N), s)
        ct1 = Ciphertext((mk(1), mk(2)), "coeff")
        ct2 = Ciphertext((mk(3), mk(4)), "coeff")
        if group in ("all", "full"):
            mr = jax.jit(lambda a, b, ctx=ctx, mul=mul, rlk=rlk: relinearize(
                ctx, mul.multiply(a, b), rlk).polys)
            fns[f"mr_{eng}"] = (mr, (ct1, ct2))
        if group in ("all", "parts"):
            poly = ct1.polys[0]
            tq = ctx.tables
            fns[f"ntt_fwd_q_{eng}"] = (jax.jit(
                lambda x, t=tq: ntt.forward(x, t)), (poly,))
            fns[f"ntt_inv_q_{eng}"] = (jax.jit(
                lambda x, t=tq: ntt.inverse(x, t)), (poly,))
            if eng == "four":
                m_only = jax.jit(lambda a, b, mul=mul: mul.multiply(a, b).polys)
                fns["mult_only_four"] = (m_only, (ct1, ct2))
                ct3 = Ciphertext((mk(5), mk(6), mk(7)), "coeff")
                r_only = jax.jit(lambda c, ctx=ctx, rlk=rlk: relinearize(
                    ctx, c, rlk).polys)
                fns["relin_only_four"] = (r_only, (ct3,))
                bskm = mul.base_bsk.moduli
                x_bsk = _rand_residues(bskm, (BATCH, len(bskm), N), 8)
                fns["ntt_fwd_bsk_four"] = (jax.jit(
                    lambda x, t=mul.base_bsk.tables: ntt.forward(x, t)),
                    (x_bsk,))
                fns["to_bsk"] = (jax.jit(mul._to_bsk), (poly,))
                ff = jax.jit(lambda eq, eb, mul=mul: mul._fast_floor(eq, eb))
                fns["fast_floor"] = (ff, (poly, x_bsk))
                fns["sk_to_q"] = (jax.jit(mul._sk_to_q), (x_bsk,))

    for name, (f, args) in fns.items():
        t0 = time.time()
        jax.block_until_ready(f(*args))
        print(json.dumps({"compiled": name,
                          "s": round(time.time() - t0, 1)}), flush=True)

    t0 = time.time()
    timed = timed_windows_multi(fns, windows=6, budget_s=180)
    for k, (best, med) in sorted(timed.items(), key=lambda kv: -kv[1][0]):
        print(json.dumps({k: {
            "best_ms": round(best * 1e3, 3),
            "med_ms": round(med * 1e3, 3),
            "per_s": round(BATCH / best, 1),
        }}), flush=True)
    print(json.dumps({"wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
