"""Ablate the op-by-op multiply graph: full vs no-NTT vs NTT-only vs pieces.

Monkeypatches are active DURING trace (jit compile inside the builder), per
the gated_profile lesson. Amortized timing (auto inner).
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


def main():
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.behz import RnsMultiplier, make_keys_jit
    from pplp_tpu.bfv.ciphertext import Ciphertext
    from pplp_tpu.ops import ntt

    parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")
    ctx = BFVContext.build(parms, engine="four")
    _sk, rlk = make_keys_jit(ctx, 0)
    mul = RnsMultiplier(ctx)
    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]
    mk = lambda: jnp.asarray(
        (rng.integers(0, 1 << 62, size=(BATCH, ctx.L, N)).astype(np.uint64)
         % qs).astype(np.uint32))
    ct1, ct2 = Ciphertext((mk(), mk()), "coeff"), Ciphertext((mk(), mk()), "coeff")

    orig_fwd, orig_inv = ntt.forward, ntt.inverse
    orig_tobsk = RnsMultiplier._to_bsk
    orig_floor = RnsMultiplier._fast_floor
    orig_sk = RnsMultiplier._sk_to_q

    def fake_tobsk(self, x_q):
        # right shape [., l+1, n], trivial math
        l1 = self.base_bsk.k
        return jnp.concatenate([x_q, x_q[..., : l1 - x_q.shape[-2], :]], axis=-2)

    def fake_floor(self, e_q, e_b):
        return e_b

    def fake_sk(self, w):
        return w[..., : self.base_q.k, :]

    def build(mode):
        if mode == "nontt":
            ntt.forward = lambda x, tb: x
            ntt.inverse = lambda x, tb: x
        elif mode == "nttonly":
            RnsMultiplier._to_bsk = fake_tobsk
            RnsMultiplier._fast_floor = fake_floor
            RnsMultiplier._sk_to_q = fake_sk
        elif mode == "noconv":  # keep NTT + pointwise, stub only to_bsk/sk
            RnsMultiplier._to_bsk = fake_tobsk
            RnsMultiplier._sk_to_q = fake_sk
        try:
            f = jax.jit(lambda a, b: mul.multiply(a, b).polys)
            t0 = time.time()
            jax.block_until_ready(f(ct1, ct2))
            print(json.dumps({"compiled": mode, "s": round(time.time() - t0, 1)}),
                  flush=True)
            return f
        finally:
            ntt.forward, ntt.inverse = orig_fwd, orig_inv
            RnsMultiplier._to_bsk = orig_tobsk
            RnsMultiplier._fast_floor = orig_floor
            RnsMultiplier._sk_to_q = orig_sk

    fns = {}
    for mode in ("full", "nontt", "nttonly", "noconv"):
        fns[mode] = (build(mode), (ct1, ct2))

    timed = timed_windows_multi(fns, windows=8, budget_s=120)
    for k, (best, med) in sorted(timed.items(), key=lambda kv: -kv[1][0]):
        print(json.dumps({k: {"best_ms": round(best * 1e3, 3),
                              "med_ms": round(med * 1e3, 3)}}), flush=True)


if __name__ == "__main__":
    main()
