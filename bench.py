"""Benchmark entry point: prints ONE JSON line for the driver.

Headline metric (BASELINE.md north star): BFV ciphertext-ciphertext multiplies
per second, n=4096, including relinearization, batched on one chip.

vs_baseline is measured against a SEAL-4.1-class single-thread CPU
multiply+relin at n=4096 (~4 ms => 250/s) — the engine the reference delegates
all crypto to (SURVEY.md §6; the reference itself publishes no numbers).

Secondary metric (printed to stderr for the record): batched NTT transforms/s
at n=8192 over 3 RNS primes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

import jax.numpy as jnp

from pplp_tpu.ops import ntt
from pplp_tpu.ops.primes import Modulus, get_primes

BASELINE_TRANSFORMS_PER_S = 40_000.0
BASELINE_MULTIPLIES_PER_S = 250.0


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


def bench_multiply(n=4096, batch=256, iters=5):
    """Batched BFV multiply + relinearize at n=4096, tpu chain profile."""
    import numpy as np

    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.behz import RnsMultiplier, create_relin_keys, relinearize
    from pplp_tpu.bfv.keys import KeyGenerator

    parms = EncryptionParameters.bfv(n, 1 << 16, profile="tpu")
    # Engine choice (A/B-measured on hardware, docs/benchmarks.md): "four"
    # wins the full fused multiply graph; pallas kernels win only standalone.
    ctx = BFVContext.build(parms, engine="four")
    kg = KeyGenerator(ctx, 0)
    sk = kg.secret_key()
    rlk = create_relin_keys(ctx, sk, jax.random.key(1))
    mul = RnsMultiplier(ctx)

    # Synthetic uniform residue ciphertexts: multiply cost is data-independent.
    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]

    def ct_polys():
        def poly():
            v = rng.integers(0, 1 << 62, size=(batch, ctx.L, n)).astype(np.uint64) % qs
            return jnp.asarray(v.astype(np.uint32))

        from pplp_tpu.bfv.ciphertext import Ciphertext

        return Ciphertext((poly(), poly()), "coeff")

    ct1, ct2 = ct_polys(), ct_polys()

    @jax.jit
    def mult_relin(a, b):
        return relinearize(ctx, mul.multiply(a, b), rlk)

    out = mult_relin(ct1, ct2)
    jax.block_until_ready(out)

    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(iters):
            out = mult_relin(ct1, out)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - start) / iters)
    return batch / best


def bench_proximity_pipeline(n=4096, rows=25, iters=5):
    """100k packed encrypted distance checks (BASELINE config[3]):
    rows x n coefficients, server homo eval + device BEHZ decode."""
    import numpy as np

    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.encryptor import Encryptor
    from pplp_tpu.bfv.keys import KeyGenerator
    from pplp_tpu.parallel.pipeline import build_packed_pipeline, make_packed_inputs

    parms = EncryptionParameters.bfv(n, 1 << 20, profile="tpu")
    ctx = BFVContext.build(parms, engine="four")
    kg = KeyGenerator(ctx, 0)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc = Encryptor(ctx, pk)
    fn = jax.jit(build_packed_pipeline(ctx, sk, 1000, 900, 501, 99))

    total = rows * n  # 102400 checks
    rng = np.random.default_rng(0)
    xa = rng.integers(0, 1 << 20, total).astype(np.uint64)
    ya = rng.integers(0, 1 << 20, total).astype(np.uint64)
    args = make_packed_inputs(ctx, enc, xa, ya, jax.random.key(1))
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return total, best


def bench_dgk(batch=10000, k=2048, t=320, l=16, iters=2):
    """10k-wide DGK homomorphic comparisons (BASELINE config[2]).

    Gated behind PPLP_BENCH_DGK=1: keygen + scan compiles add minutes."""
    import random

    from pplp_tpu.dgk import dgk_gen_keys
    from pplp_tpu.dgk.batched import DGKBatch
    from pplp_tpu.dgk.dgk import dgk_random_num

    priv, pub = dgk_gen_keys(k, t, l, seed=5, init_table=False)
    dbatch = DGKBatch.build(pub)
    rng = random.Random(0)
    ms = [rng.randrange(0, pub.u) for _ in range(batch)]
    rs = [dgk_random_num(int(2.5 * t), rng) for _ in range(batch)]
    cts = dbatch.encrypt_batch(ms, rs)
    f = jax.jit(
        lambda a, b, c: dbatch.blind_distance_batch(a, b, c, 123321, 123654, 37, cts, cts)
    )
    out = f(cts, cts, cts)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(cts, cts, cts)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return batch / best


def main():
    # Total wall budget: the driver runs this at round end; never exceed it.
    budget_s = float(os.environ.get("PPLP_BENCH_BUDGET_S", "420"))
    t_start = time.perf_counter()

    def over_budget(label):
        if time.perf_counter() - t_start > budget_s:
            print(
                json.dumps({"skipped": label, "reason": "bench time budget"}),
                file=sys.stderr,
                flush=True,
            )
            return True
        return False

    # Headline FIRST so a time-capped run still reports it.
    value = bench_multiply()
    print(
        json.dumps(
            {
                "metric": "bfv_ct_mult_relin_per_s_n4096",
                "value": round(value, 1),
                "unit": "mults/s",
                "vs_baseline": round(value / BASELINE_MULTIPLIES_PER_S, 2),
            }
        ),
        flush=True,
    )
    if os.environ.get("PPLP_BENCH_DGK") == "1" and not over_budget("dgk"):
        rate = bench_dgk()
        print(
            json.dumps(
                {
                    "metric": "dgk_comparisons_per_s_k2048",
                    "value": round(rate, 1),
                    "unit": "comparisons/s",
                }
            ),
            file=sys.stderr,
            flush=True,
        )
    if over_budget("ntt"):
        return
    ntt_rate = bench_ntt()
    print(
        json.dumps(
            {
                "metric": "ntt_transforms_per_s_n8192_3primes",
                "value": round(ntt_rate, 1),
                "unit": "transforms/s",
                "vs_baseline": round(ntt_rate / BASELINE_TRANSFORMS_PER_S, 2),
            }
        ),
        file=sys.stderr,
        flush=True,
    )
    if over_budget("proximity_pipeline"):
        return
    checks, secs = bench_proximity_pipeline()
    print(
        json.dumps(
            {
                "metric": "proximity_checks_per_s_packed_n4096",
                "value": round(checks / secs, 1),
                "unit": "checks/s",
                "batch_checks": checks,
                "batch_latency_ms": round(secs * 1e3, 2),
            }
        ),
        file=sys.stderr,
        flush=True,
    )


if __name__ == "__main__":
    main()
