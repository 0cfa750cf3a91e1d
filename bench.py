"""Benchmark entry point: prints ONE JSON line for the driver.

Current headline metric: batched negacyclic NTT throughput (transforms/s) at
n=8192 over 3 RNS primes (BASELINE.md microbench config[1]). One "transform"
is one length-n forward NTT of one RNS limb.

vs_baseline is measured against a SEAL-4.1-class single-thread CPU NTT at
n=8192 (~25 us/transform => 40,000 transforms/s) — the engine the reference
delegates to (SURVEY.md §6; the reference itself publishes no numbers).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from pplp_tpu.ops import ntt
from pplp_tpu.ops.primes import Modulus, get_primes

BASELINE_TRANSFORMS_PER_S = 40_000.0


def bench_ntt(n=8192, n_limbs=3, batch=1024, iters=20):
    moduli = [Modulus(q) for q in get_primes(30, n_limbs, n)]
    tb = ntt.build_tables(moduli, n)
    q = tb.q[:, None]

    key = jax.random.key(0)
    bits = jax.random.bits(key, (batch, n_limbs, n), jnp.uint32)
    x = bits % q  # mild bias irrelevant for benchmarking

    fwd = jax.jit(lambda v: ntt.forward(v, tb))
    out = fwd(x)
    jax.block_until_ready(out)  # compile + warmup

    t0 = time.perf_counter
    best = float("inf")
    for _ in range(3):
        start = t0()
        y = x
        for _ in range(iters):
            y = fwd(y)
        jax.block_until_ready(y)
        best = min(best, (t0() - start) / iters)
    transforms = batch * n_limbs
    return transforms / best


def main():
    value = bench_ntt()
    print(
        json.dumps(
            {
                "metric": "ntt_transforms_per_s_n8192_3primes",
                "value": round(value, 1),
                "unit": "transforms/s",
                "vs_baseline": round(value / BASELINE_TRANSFORMS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
