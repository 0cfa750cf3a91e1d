"""Decisive probe of the process-local slow-dispatch state.

Sequence (one process):
  1. canary fresh
  2. medium kernel (one NTT fwd, [256,4,4096]) timed inner=1 / inner=8
     back-to-back (does async dispatch pipeline?), and an 8-step
     lax.scan-chained version (one dispatch for 8x the work)
  3. make_keys_jit (flips the state per r4_canary_stages)
  4. same three timings again + canary
If inner=8 and scan recover the fresh per-transform cost, the state is
host-side per-dispatch latency and throughput benches must amortize it.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pplp_tpu.utils.chipstate import canary_latency, enable_compile_cache

enable_compile_cache()

N, BATCH = 4096, 256


def log(**kw):
    print(json.dumps(kw), flush=True)


def timeit(f, args, inner):
    jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.ops import ntt

    log(stage="fresh", canary_us=round(canary_latency() * 1e6))
    parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")
    ctx = BFVContext.build(parms, engine="four")
    tq = ctx.tables
    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]
    x = jnp.asarray((rng.integers(0, 1 << 62, size=(BATCH, 4, N)).astype(np.uint64)
                     % qs).astype(np.uint32))
    fwd = jax.jit(lambda v: ntt.forward(v, tq))

    def scan8(v):
        def body(c, _):
            return ntt.forward(c, tq), None
        out, _ = jax.lax.scan(body, v, None, length=8)
        return out
    scan8 = jax.jit(scan8)

    def phase(tag):
        t1 = timeit(fwd, (x,), 1)
        log(phase=tag, ntt_inner1_ms=round(t1 * 1e3, 2))
        t8 = timeit(fwd, (x,), 8)
        log(phase=tag, ntt_inner8_ms=round(t8 * 1e3, 2))
        ts = timeit(scan8, (x,), 1) / 8.0
        log(phase=tag,
            ntt_scan8_ms=round(ts * 1e3, 2),
            canary_us=round(canary_latency() * 1e6))

    phase("before_keys")
    from pplp_tpu.bfv.behz import make_keys_jit

    _sk, _rlk = make_keys_jit(ctx, 0)
    log(stage="keys_done", canary_us=round(canary_latency() * 1e6))
    phase("after_keys")
    time.sleep(10)
    phase("after_idle10")


if __name__ == "__main__":
    main()
