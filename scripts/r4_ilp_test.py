"""Does interleaving independent multiply chains in one graph help? (ILP)
Variants: single b256; dual-chain 2x b128; dual-chain 2x b256; donated b256.
Per-element throughput compared."""
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

N = 4096


def main():
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.behz import RnsMultiplier, make_keys_jit, relinearize
    from pplp_tpu.bfv.ciphertext import Ciphertext

    parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")
    ctx = BFVContext.build(parms, engine="four")
    _sk, rlk = make_keys_jit(ctx, 0)
    mul = RnsMultiplier(ctx)
    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]

    def ct(b):
        mk = lambda: jnp.asarray(
            (rng.integers(0, 1 << 62, size=(b, ctx.L, N)).astype(np.uint64)
             % qs).astype(np.uint32))
        return Ciphertext((mk(), mk()), "coeff")

    mr = lambda a, b: relinearize(ctx, mul.multiply(a, b), rlk).polys

    fns = {}
    per_call = {}
    c1, c2 = ct(256), ct(256)
    fns["single_b256"] = (jax.jit(mr), (c1, c2))
    per_call["single_b256"] = 256

    d1, d2, d3, d4 = ct(128), ct(128), ct(128), ct(128)
    dual = jax.jit(lambda a, b, c, d: (mr(a, b), mr(c, d)))
    fns["dual_b128"] = (dual, (d1, d2, d3, d4))
    per_call["dual_b128"] = 256

    e1, e2, e3, e4 = ct(256), ct(256), ct(256), ct(256)
    fns["dual_b256"] = (dual, (e1, e2, e3, e4))
    per_call["dual_b256"] = 512

    quad = jax.jit(lambda a, b, c, d, e, f, g, h: (
        mr(a, b), mr(c, d), mr(e, f), mr(g, h)))
    q64 = tuple(ct(64) for _ in range(8))
    fns["quad_b64"] = (quad, q64)
    per_call["quad_b64"] = 256
    q128 = tuple(ct(128) for _ in range(8))
    fns["quad_b128"] = (quad, q128)
    per_call["quad_b128"] = 512
    tri = jax.jit(lambda a, b, c, d, e, f: (mr(a, b), mr(c, d), mr(e, f)))
    t128 = tuple(ct(128) for _ in range(6))
    fns["tri_b128"] = (tri, t128)
    per_call["tri_b128"] = 384

    for name, (f, args) in fns.items():
        t0 = time.time()
        jax.block_until_ready(f(*args))
        print(json.dumps({"compiled": name, "s": round(time.time() - t0, 1)}),
              flush=True)

    timed = timed_windows_multi(fns, windows=8, budget_s=120)
    for k, (best, med) in sorted(timed.items(),
                                 key=lambda kv: kv[1][0] / per_call[kv[0]]):
        print(json.dumps({k: {
            "best_ms": round(best * 1e3, 3),
            "per_s": round(per_call[k] / best, 1),
            "med_per_s": round(per_call[k] / med, 1),
        }}), flush=True)


if __name__ == "__main__":
    main()
