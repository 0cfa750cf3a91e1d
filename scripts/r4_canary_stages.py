"""What flips a process into the ~25ms-dispatch state? Staged probe.

Stages: import -> tables/keys on device -> big executable loaded ->
first big dispatch -> repeated dispatches -> extra arrays resident ->
second executable -> idle. Canary after each.
"""
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pplp_tpu.utils.chipstate import canary_latency, enable_compile_cache

enable_compile_cache()

N, BATCH = 4096, 256


def c(label):
    print(json.dumps({"stage": label,
                      "canary_us": round(canary_latency() * 1e6)}), flush=True)


def main():
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.behz import RnsMultiplier, make_keys_jit, relinearize
    from pplp_tpu.bfv.ciphertext import Ciphertext

    c("start")
    parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")
    ctx = BFVContext.build(parms, engine="four")
    c("ctx_built")
    _sk, rlk = make_keys_jit(ctx, 0)
    c("keys_done")
    mul = RnsMultiplier(ctx)
    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]
    mk = lambda: jnp.asarray(
        (rng.integers(0, 1 << 62, size=(BATCH, ctx.L, N)).astype(np.uint64)
         % qs).astype(np.uint32))
    ct1, ct2 = Ciphertext((mk(), mk()), "coeff"), Ciphertext((mk(), mk()), "coeff")
    c("cts_resident")
    f = jax.jit(lambda a, b: relinearize(ctx, mul.multiply(a, b), rlk).polys)
    lowered = f.lower(ct1, ct2).compile()
    c("compiled_not_run")
    jax.block_until_ready(f(ct1, ct2))
    c("after_first_dispatch")
    for i in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(ct1, ct2))
        dt = time.perf_counter() - t0
        print(json.dumps({"call_ms": round(dt * 1e3, 2)}), flush=True)
        c(f"after_call_{i}")
    time.sleep(20)
    c("after_idle_20s")
    t0 = time.perf_counter()
    jax.block_until_ready(f(ct1, ct2))
    print(json.dumps({"call_ms_post_idle": round((time.perf_counter() - t0) * 1e3, 2)}),
          flush=True)
    c("after_post_idle_call")


if __name__ == "__main__":
    main()
