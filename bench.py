"""Benchmark entry point: prints ONE JSON line for the driver.

Headline metric (BASELINE.md north star): BFV ciphertext-ciphertext multiplies
per second, n=4096, including relinearization, batched on one chip.

vs_baseline is measured against the DRIVER-SET north star's per-chip share:
>=1e6 mult+relin/s on a 16-chip v5p => 62,500/s per chip (this bench runs on
one v5e-class chip, so vs_baseline < 1 means short of the per-chip share of
the v5p target). The reference itself publishes no numbers (SURVEY.md §6);
its SEAL-4.1 single-thread CPU engine does ~250 mult+relin/s at n=4096.

Methodology: the bench chip is SHARED and its neighbor bursts for minutes at
up to ~40x slowdown (measured round 2), so every metric takes the best of
many short windows spread over tens of seconds and reports the median too.

Secondary metrics (stderr): DGK batched comparisons (BASELINE config[2]),
batched NTT transforms/s at n=8192, and the 100k-check proximity pipeline
(config[3]).
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
from pplp_tpu.utils.chipstate import enable_compile_cache, timed_windows

enable_compile_cache()

# North-star share: 1e6 /s on v5p-16 => per-chip share.
BASELINE_MULTIPLIES_PER_S = 1_000_000.0 / 16
BASELINE_TRANSFORMS_PER_S = 40_000.0  # SEAL-class single-thread CPU estimate


def bench_ntt(n=8192, n_limbs=3, batch=1024):
    """Best engine wins: the op-by-op 'four' graph vs the vmem Pallas kernel."""
    from pplp_tpu.utils.chipstate import timed_windows_multi

    moduli = [Modulus(q) for q in get_primes(30, n_limbs, n)]
    fns = {}
    for engine in ("stage", "four", "vmem"):
        try:
            tb = ntt.build_tables(moduli, n, engine=engine)
            q = tb.q[:, None]
            key = jax.random.key(0)
            bits = jax.random.bits(key, (batch, n_limbs, n), jnp.uint32)
            x = bits % q  # mild bias irrelevant for benchmarking
            fwd = jax.jit(lambda v, _tb=tb: ntt.forward(v, _tb))
            jax.block_until_ready(fwd(x))
            fns[engine] = (fwd, (x,))
        except Exception as e:  # pragma: no cover - engine-specific fallback
            print(json.dumps({"ntt_engine_error": engine,
                              "err": repr(e)[:120]}),
                  file=sys.stderr, flush=True)
    timed = timed_windows_multi(fns, windows=6, budget_s=90)
    return max(
        (batch * n_limbs / b, batch * n_limbs / m) for b, m in timed.values()
    )


def _synthetic_cts(ctx, batch, n):
    import numpy as np

    from pplp_tpu.bfv.ciphertext import Ciphertext

    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]

    def poly():
        v = rng.integers(0, 1 << 62, size=(batch, ctx.L, n)).astype(np.uint64) % qs
        return jnp.asarray(v.astype(np.uint32))

    return Ciphertext((poly(), poly()), "coeff"), Ciphertext((poly(), poly()), "coeff")


_WARM_FUSED_CODE = """
import sys; sys.path.insert(0, {root!r})
import jax, numpy as np, jax.numpy as jnp
from pplp_tpu.utils.chipstate import enable_compile_cache
enable_compile_cache()
from pplp_tpu.bfv import BFVContext, EncryptionParameters
from pplp_tpu.bfv.behz import create_relin_keys
from pplp_tpu.bfv.behz_fused import FusedMultiplier
from pplp_tpu.bfv.keys import KeyGenerator
import bench
parms = EncryptionParameters.bfv({n}, 1 << 16, profile="tpu")
ctx = BFVContext.build(parms, engine="vmem")
kg = KeyGenerator(ctx, 0)
rlk = create_relin_keys(ctx, kg.secret_key(), jax.random.key(1))
fused = FusedMultiplier(ctx, rlk, tile_b=2)
ct1, ct2 = bench._synthetic_cts(ctx, 256, {n})
jax.block_until_ready(fused.multiply_relinearize(ct1, ct2).polys)
print("warm ok")
"""


def _warm_fused_subprocess(n, timeout_s=None):
    """Compile (or cache-hit) the fused kernel in a child process so a cold
    cache or wedged compile queue cannot hang the driver bench; returns
    False (skip fused) on timeout/failure. In-process environments where the
    subprocess cannot share the chip can disable via PPLP_BENCH_WARM=0."""
    import subprocess

    if os.environ.get("PPLP_BENCH_WARM", "1") == "0":
        return True
    timeout_s = timeout_s or float(os.environ.get("PPLP_BENCH_WARM_S", "480"))
    root = os.path.dirname(os.path.abspath(__file__))
    code = _WARM_FUSED_CODE.format(root=root, n=n)
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s, cwd=root,
            capture_output=True, text=True,
        )
        return r.returncode == 0 and "warm ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def bench_multiply(n=4096, batch=256):
    """Batched BFV multiply + relinearize, best of the two production paths:
    the op-by-op XLA graph (engine 'four') and the fused VMEM Pallas kernel
    (engine 'vmem', behz_fused)."""
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.behz import RnsMultiplier, create_relin_keys, relinearize
    from pplp_tpu.bfv.behz_fused import FusedMultiplier
    from pplp_tpu.bfv.keys import KeyGenerator

    from pplp_tpu.utils.chipstate import timed_windows_multi

    parms = EncryptionParameters.bfv(n, 1 << 16, profile="tpu")
    fns = {}

    # Path A: op-by-op XLA graph.
    ctx = BFVContext.build(parms, engine="four")
    kg = KeyGenerator(ctx, 0)
    rlk = create_relin_keys(ctx, kg.secret_key(), jax.random.key(1))
    mul = RnsMultiplier(ctx)
    ct1, ct2 = _synthetic_cts(ctx, batch, n)
    mr = jax.jit(lambda a, b: relinearize(ctx, mul.multiply(a, b), rlk))
    fns["xla"] = (mr, (ct1, ct2))

    # Path B: fused VMEM kernel. Its Mosaic compile is minutes-long when the
    # persistent cache is cold (v2 form measured 24 min through the tunnel),
    # and the remote compile queue can be wedged by orphaned compiles; guard
    # the driver run by warming it in a subprocess under a hard timeout and
    # skipping the path (xla still reports) if the warmup cannot finish.
    try:
        if not _warm_fused_subprocess(n):
            raise RuntimeError("fused warmup timed out; skipping fused path")
        ctx_v = BFVContext.build(parms, engine="vmem")
        kg_v = KeyGenerator(ctx_v, 0)
        rlk_v = create_relin_keys(ctx_v, kg_v.secret_key(), jax.random.key(1))
        fused = FusedMultiplier(ctx_v, rlk_v, tile_b=2)
        ct1v, ct2v = _synthetic_cts(ctx_v, batch, n)
        fr = lambda a, b: fused.multiply_relinearize(a, b).polys
        fns["fused"] = (fr, (ct1v, ct2v))
    except Exception as e:  # pragma: no cover - fused path is TPU-tuned
        print(json.dumps({"fused_path_error": repr(e)[:200]}), file=sys.stderr)

    # Interleaved gated windows: both paths sample the same contention
    # climate, so the winner is not an artifact of a neighbor burst.
    timed = timed_windows_multi(fns, windows=8)
    results = {k: (batch / b, batch / m) for k, (b, m) in timed.items()}
    winner = max(results, key=lambda k: results[k][0])
    print(
        json.dumps(
            {
                "multiply_paths": {
                    k: {"best": round(v[0], 1), "median": round(v[1], 1)}
                    for k, v in results.items()
                },
                "winner": winner,
            }
        ),
        file=sys.stderr,
        flush=True,
    )
    return results[winner][0]


def bench_proximity_pipeline(n=4096, rows=25):
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
    best, _ = timed_windows(fn, *args, windows=8)
    return total, best


def bench_dgk(batch=10000, k=2048, t=320, l=16):
    """10k-wide DGK homomorphic comparisons (BASELINE config[2])."""
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
    best, _ = timed_windows(f, cts, cts, cts, windows=4, inner=1)
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

    from pplp_tpu.utils.chipstate import canary_latency, wait_healthy

    wait_healthy(max_wait_s=min(90.0, budget_s / 5))
    # Headline FIRST so a time-capped run still reports it.
    value = bench_multiply()
    dev = jax.devices()[0]
    print(
        json.dumps(
            {
                "metric": "bfv_ct_mult_relin_per_s_n4096",
                "value": round(value, 1),
                "unit": "mults/s",
                # Driver target: >=1e6/s on a 16-chip v5p => 62.5k per v5p
                # chip. This bench chip is v5e-class (~2.3x less compute per
                # chip than v5p); vs_baseline is reported against the raw
                # v5p per-chip share, unnormalized.
                "vs_baseline": round(value / BASELINE_MULTIPLIES_PER_S, 3),
                "chip": getattr(dev, "device_kind", str(dev)),
                "canary_us": round(canary_latency() * 1e6),
            }
        ),
        flush=True,
    )
    if not over_budget("dgk") and os.environ.get("PPLP_BENCH_DGK") != "0":
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
    ntt_rate, ntt_med = bench_ntt()
    print(
        json.dumps(
            {
                "metric": "ntt_transforms_per_s_n8192_3primes",
                "value": round(ntt_rate, 1),
                "median": round(ntt_med, 1),
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
