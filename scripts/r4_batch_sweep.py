"""Throughput vs batch size and NTT engine for the full mult+relin graph."""
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
    fns = {}
    batches = {}
    for eng, blist in (("four", (128, 256, 512, 1024)), ("stage", (256,))):
        ctx = BFVContext.build(parms, engine=eng)
        _sk, rlk = make_keys_jit(ctx, 0)
        mul = RnsMultiplier(ctx)
        rng = np.random.default_rng(0)
        qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]
        for b in blist:
            mk = lambda: jnp.asarray(
                (rng.integers(0, 1 << 62, size=(b, ctx.L, N)).astype(np.uint64)
                 % qs).astype(np.uint32))
            ct1 = Ciphertext((mk(), mk()), "coeff")
            ct2 = Ciphertext((mk(), mk()), "coeff")
            f = jax.jit(lambda a, c, ctx=ctx, mul=mul, rlk=rlk: relinearize(
                ctx, mul.multiply(a, c), rlk).polys)
            name = f"{eng}_b{b}"
            t0 = time.time()
            jax.block_until_ready(f(ct1, ct2))
            print(json.dumps({"compiled": name, "s": round(time.time() - t0, 1)}),
                  flush=True)
            fns[name] = (f, (ct1, ct2))
            batches[name] = b

    timed = timed_windows_multi(fns, windows=8, budget_s=150)
    for k, (best, med) in sorted(timed.items(),
                                 key=lambda kv: kv[1][0] / batches[kv[0]]):
        print(json.dumps({k: {
            "best_ms": round(best * 1e3, 3),
            "per_s": round(batches[k] / best, 1),
            "med_per_s": round(batches[k] / med, 1),
        }}), flush=True)


if __name__ == "__main__":
    main()
