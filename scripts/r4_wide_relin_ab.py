"""A/B: width-2 gadget relin vs per-limb relin in the full mult+relin
graph (dual-chain 2x128 form), amortized windows."""
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


def main():
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.behz import (
        RnsMultiplier, create_relin_keys_wide, make_keys_jit,
        relinearize, relinearize_wide,
    )
    from pplp_tpu.bfv.ciphertext import Ciphertext

    parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")
    ctx = BFVContext.build(parms, engine="four")
    sk, rlk = make_keys_jit(ctx, 0)
    rlk_w, groups = jax.jit(
        lambda key: create_relin_keys_wide(ctx, sk, key)[0]
    )(jax.random.key(2)), None
    from pplp_tpu.bfv.behz import _digit_groups
    groups = _digit_groups(ctx.L, 2)
    mul = RnsMultiplier(ctx)
    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]

    def ct(b):
        mk = lambda: jnp.asarray(
            (rng.integers(0, 1 << 62, size=(b, ctx.L, N)).astype(np.uint64)
             % qs).astype(np.uint32))
        return Ciphertext((mk(), mk()), "coeff")

    mr_std = lambda a, b: relinearize(ctx, mul.multiply(a, b), rlk).polys
    mr_wide = lambda a, b: relinearize_wide(
        ctx, mul.multiply(a, b), rlk_w, groups).polys

    args4 = tuple(ct(128) for _ in range(4))
    fns = {
        "dual_std": (jax.jit(lambda a, b, c, d: (mr_std(a, b), mr_std(c, d))), args4),
        "dual_wide": (jax.jit(lambda a, b, c, d: (mr_wide(a, b), mr_wide(c, d))), args4),
    }
    for name, (f, a) in fns.items():
        t0 = time.time()
        jax.block_until_ready(f(*a))
        print(json.dumps({"compiled": name, "s": round(time.time() - t0, 1)}),
              flush=True)
    timed = timed_windows_multi(fns, windows=8, budget_s=90)
    for k, (best, med) in timed.items():
        print(json.dumps({k: {"best_ms": round(best * 1e3, 3),
                              "per_s": round(BATCH / best, 1),
                              "med_per_s": round(BATCH / med, 1)}}), flush=True)


if __name__ == "__main__":
    main()
