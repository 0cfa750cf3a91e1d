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
many short canary-gated windows and reports the median too. If the headline
measurement never saw a healthy window, it is retried once at the end of the
bench (VERDICT r3: never record a contaminated headline when time remains).

Round-4 structure: the fused Pallas mega-kernel (bfv/behz_fused.py) is
DEMOTED to an experiment — it lost to the op-by-op XLA path in every healthy
measurement across rounds 2-4 and its cold Mosaic compile (~24 min through
the tunnel) repeatedly wedged driver runs (docs/performance_model.md).
The production multiply is the op-by-op BEHZ graph with the XLA four-step
NTT; the headline interleaves the dual-chain (2x128, ILP winner) and
single-chain (256) forms and takes the best. All key setup runs under ONE
jit (behz.make_keys_jit) — eager keygen was hundreds of tunnel round-trips.

Metric order: multiply (headline) -> DGK -> NTT -> proximity, each inside an
explicit share of the wall budget so a slow phase cannot starve the record
(the r03 failure: one doomed warmup ate all four metrics). Proximity goes
last because its eager input prep pays the per-dispatch RTT floor.
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
from pplp_tpu.utils.chipstate import (
    enable_compile_cache,
    fresh_canary_us,
    timed_windows,
    timed_windows_multi,
)

enable_compile_cache()

# North-star share: 1e6 /s on v5p-16 => per-chip share.
BASELINE_MULTIPLIES_PER_S = 1_000_000.0 / 16


def _log(obj, stdout=False):
    print(json.dumps(obj), file=sys.stdout if stdout else sys.stderr, flush=True)


def _synthetic_cts(ctx, batch, n):
    import numpy as np

    from pplp_tpu.bfv.ciphertext import Ciphertext

    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]

    def poly():
        v = rng.integers(0, 1 << 62, size=(batch, ctx.L, n)).astype(np.uint64) % qs
        return jnp.asarray(v.astype(np.uint32))

    return Ciphertext((poly(), poly()), "coeff"), Ciphertext((poly(), poly()), "coeff")


def build_multiply_fns(n=4096, batch=256):
    """Production mult+relin variants, all on the op-by-op BEHZ graph with
    the XLA four-step NTT (the round-4 A/B winner — the Pallas VMEM NTT
    loses on kernel-boundary materialization, the fused mega-kernel is
    demoted; scripts/r4_*.py):

      dual_wide — TWO independent 128-batch chains in one jit call (ILP:
                  overlapping chains measured ~9% faster per element than
                  one 256-batch chain; more chains/bigger batches regress)
                  with the PRODUCTION relinearization (make_keys_jit ->
                  create_relin_keys -> default_relin_width picks the
                  noise-bounded width-2 gadget at these parameters; half
                  the keyswitch NTTs, +5% measured; exactness pinned in
                  tests/test_multiply.py::test_relinearize_wide_gadget)
      dual_b128 — same chains with the classic per-limb gadget (explicit
                  width=1 keys), for the record
      single_b256 — the production single-chain form, for the record
    """
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.behz import (
        RnsMultiplier,
        create_relin_keys,
        make_keys_jit,
        relinearize,
    )

    parms = EncryptionParameters.bfv(n, 1 << 16, profile="tpu")
    fns = {}
    try:
        ctx = BFVContext.build(parms, engine="four")
        sk, rlk = make_keys_jit(ctx, 0)  # rlk: production gadget width
        mul = RnsMultiplier(ctx)
        mr = lambda a, b: relinearize(ctx, mul.multiply(a, b), rlk).polys
        ct1, ct2 = _synthetic_cts(ctx, batch, n)
        fns["single_b256"] = (jax.jit(mr), (ct1, ct2), batch)
        h = batch // 2
        d1, d2 = _synthetic_cts(ctx, h, n)
        d3, d4 = _synthetic_cts(ctx, h, n)
        rlk_w1 = jax.jit(
            lambda key: create_relin_keys(ctx, sk, key, width=1)
        )(jax.random.key(2))
        mr1 = lambda a, b: relinearize(ctx, mul.multiply(a, b), rlk_w1).polys
        dual1 = jax.jit(lambda a, b, c, d: (mr1(a, b), mr1(c, d)))
        fns["dual_b128"] = (dual1, (d1, d2, d3, d4), batch)
        dual_w = jax.jit(lambda a, b, c, d: (mr(a, b), mr(c, d)))
        fns["dual_wide"] = (dual_w, (d1, d2, d3, d4), batch)
    except Exception as e:  # pragma: no cover
        _log({"multiply_engine_error": "four", "err": repr(e)[:160]})
    return fns


def measure_multiply(fns, budget_s=120.0):
    """Interleaved amortized windows -> (value, results, healthy: bool).

    'healthy' comes from a FRESH-subprocess canary (the in-process canary
    only reads this process's dispatch-RTT floor once big graphs have run —
    round-4 finding, docs/performance_model.md)."""
    timed = timed_windows_multi(
        {k: (f, a) for k, (f, a, _) in fns.items()},
        windows=8, budget_s=budget_s,
    )
    results = {
        k: (fns[k][2] / b, fns[k][2] / m) for k, (b, m) in timed.items()
    }
    winner = max(results, key=lambda k: results[k][0])
    canary = fresh_canary_us()
    healthy = 0 <= canary < 1200
    _log(
        {
            "multiply_paths": {
                k: {"best": round(v[0], 1), "median": round(v[1], 1)}
                for k, v in results.items()
            },
            "winner": winner,
            "fresh_canary_us": canary,
        }
    )
    return results[winner][0], results, healthy


def bench_dgk(batch=10000, k=2048, t=320, l=16, budget_s=60.0):
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
    best, _ = timed_windows(f, cts, cts, cts, windows=6, budget_s=budget_s)
    return batch / best


def bench_proximity_pipeline(n=4096, rows=25, budget_s=60.0):
    """100k packed encrypted distance+radius checks WITH BF membership
    (BASELINE config[3] verbatim): rows x n coefficients, server homo eval +
    device BEHZ decode + blinded-key formation + Bloom probe — the full
    protocol tail (`/root/reference/src/demo.cc:154-177`). Returns
    (total_checks, best_s, median_s)."""
    import numpy as np

    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.encryptor import Encryptor
    from pplp_tpu.bfv.keys import make_sk_pk_jit
    from pplp_tpu.parallel.pipeline import (
        build_packed_pipeline_bf,
        make_packed_inputs,
    )
    from pplp_tpu.primitives.bloom import BloomFilter, BloomParameters

    t = 1 << 20
    s_blind, r_blind, w = 501, 99, 0xA5A5
    w_len = w.bit_length()
    parms = EncryptionParameters.bfv(n, t, profile="tpu")
    ctx = BFVContext.build(parms, engine="four")
    # ONE jitted graph each for keys and the three encryptions: eager setup
    # measured 155 s (sk+pk) + 165 s (encrypt_pairs x3) of pure dispatch
    # RTT in this phase and starved the driver wall budget (round 5).
    sk, pk = make_sk_pk_jit(ctx, 0)
    enc = Encryptor(ctx, pk)

    # Server-side filter: keys s*(di+r) reduced mod t (the sound reduction —
    # SURVEY §4 modulus-mismatch note), packed (bd << w_len) | w.
    bp = BloomParameters(
        projected_element_count=r_blind * r_blind,
        false_positive_probability=1e-4,
        random_seed=0xA5A5A5A5,
        index_mode="mixed",
    )
    bp.compute_optimal_parameters()
    bf = BloomFilter(bp)
    di = np.arange(r_blind * r_blind, dtype=np.uint64)
    bd_ins = (np.uint64(s_blind) * (di + np.uint64(r_blind))) % np.uint64(t)
    keys = (bd_ins << np.uint64(w_len)) | np.uint64(w)
    bf.insert_u64_batch(
        (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (keys >> np.uint64(32)).astype(np.uint32),
    )

    fn = jax.jit(
        build_packed_pipeline_bf(ctx, sk, 1000, 900, s_blind, r_blind, w, w_len)
    )
    bits, salts = bf._bits_device(), bf._salts_device()
    ts = jnp.uint32(bf.table_size)

    total = rows * n  # 102400 checks
    rng = np.random.default_rng(0)
    xa = rng.integers(0, 1 << 20, total).astype(np.uint64)
    ya = rng.integers(0, 1 << 20, total).astype(np.uint64)
    c1, c2, c3 = make_packed_inputs(ctx, enc, xa, ya, jax.random.key(1))
    best, med = timed_windows(
        fn, c1, c2, c3, bits, salts, ts, windows=8, budget_s=budget_s
    )
    return total, best, med


def bench_ntt(n=8192, n_limbs=3, batch=10240, budget_s=60.0):
    """NTT transforms/s at the BASELINE-named batch (>=10k rows), measured
    with the round-5 FETCH-BARRIER SLOPE method (chained calls + host fetch
    of a probe value; block_until_ready alone is not a reliable execution
    barrier for single-op graphs on this runtime — chipstate docstring).

    Returns (best/s, median/s, roofline dict). vs_baseline semantics are
    honest achieved-vs-peak: min_sweeps / sweeps_equiv where sweeps_equiv
    is the measured time expressed in full-array HBM passes at the
    MEASURED streaming peak, and min_sweeps=2 is the one-read-one-write
    lower bound of a perfectly fused transform kernel."""
    from pplp_tpu.utils.chipstate import measure_stream_peak_gbps, timed_chain_slope

    reps = 4 if budget_s >= 40 else 2
    peak_gbps, peak_med = measure_stream_peak_gbps(reps=min(reps, 3))
    moduli = [Modulus(q) for q in get_primes(30, n_limbs, n)]
    best = None
    for engine in ("four", "four4"):
        try:
            tb = ntt.build_tables(moduli, n, engine=engine)
            q = tb.q[:, None]
            bits = jax.random.bits(jax.random.key(0), (batch, n_limbs, n), jnp.uint32)
            x = bits % q  # mild bias irrelevant for benchmarking
            # Chunked big-batch form: lax.map over 1024-row blocks in ONE
            # jit call — the monolithic 10240-row graph loses ~42% to
            # working-set locality (+73% measured,
            # scripts/r5_ntt_bigbatch_ab.py; ops/ntt.forward_chunked).
            fwd = jax.jit(lambda v, _tb=tb: ntt.forward_chunked(v, _tb))
            b, m = timed_chain_slope(fwd, x, inners=(4, 12), reps=reps)
        except Exception as e:  # pragma: no cover - engine-specific fallback
            _log({"ntt_engine_error": engine, "err": repr(e)[:160]})
            continue
        if best is None or b < best[1]:
            best = (engine, b, m)
    if best is None:
        raise RuntimeError("no NTT engine compiled")
    engine, b, m = best
    array_bytes = 4 * batch * n_limbs * n
    sweeps = b * peak_gbps * 1e9 / array_bytes
    roofline = {
        "engine": engine,
        "measured_peak_gbps": round(peak_gbps, 1),
        "sweeps_equiv_at_peak": round(sweeps, 1),
        "min_sweeps": 2,
    }
    return batch * n_limbs / b, batch * n_limbs / m, roofline


def main():
    # Total wall budget: the driver runs this at round end; never exceed it.
    budget_s = float(os.environ.get("PPLP_BENCH_BUDGET_S", "540"))
    t_start = time.perf_counter()

    def remaining():
        return budget_s - (time.perf_counter() - t_start)

    from pplp_tpu.utils.chipstate import wait_healthy

    wait_healthy(max_wait_s=min(60.0, budget_s / 7))

    # Headline FIRST so a time-capped run still reports it. Setup compiles
    # are cache-hits after the first driver run on a machine.
    mult_fns = build_multiply_fns()
    value, _, headline_healthy = measure_multiply(
        mult_fns, budget_s=min(110.0, max(45.0, remaining() - 220.0))
    )

    # Emit immediately (a later crash/kill must not cost the headline); the
    # degraded-retry at the end re-emits only if it improves the number.
    def emit_headline(val):
        dev = jax.devices()[0]
        _log(
            {
                "metric": "bfv_ct_mult_relin_per_s_n4096",
                "value": round(val, 1),
                "unit": "mults/s",
                # Driver target: >=1e6/s on a 16-chip v5p => 62.5k per v5p
                # chip. This bench chip is v5e-class (~2.3x less compute per
                # chip than v5p); vs_baseline is against the raw v5p
                # per-chip share, unnormalized.
                "vs_baseline": round(val / BASELINE_MULTIPLIES_PER_S, 3),
                "chip": getattr(dev, "device_kind", str(dev)),
                # Chip state from a fresh subprocess: the in-process canary
                # reads ~25-30ms here regardless of chip state (own RTT
                # floor after big graphs — docs/performance_model.md r4).
                "canary_us": fresh_canary_us(),
            },
            stdout=True,
        )

    emit_headline(value)
    _log({"phase": "multiply_done", "t_elapsed_s": round(budget_s - remaining(), 1)})

    # Secondary metrics each get an explicit slice of what's left; order per
    # VERDICT r3 (DGK and proximity must never be starved again) — the two
    # BASELINE config metrics run BEFORE the NTT microbench, which is the
    # one to squeeze if the wall closes in (round-5: a 580 s driver timeout
    # killed the proximity phase when it ran last).
    if remaining() > 40 and os.environ.get("PPLP_BENCH_DGK") != "0":
        try:
            rate = bench_dgk(budget_s=min(60.0, max(20.0, remaining() - 15)))
            _log(
                {
                    "metric": "dgk_comparisons_per_s_k2048",
                    "value": round(rate, 1),
                    "unit": "comparisons/s",
                    "t_elapsed_s": round(budget_s - remaining(), 1),
                }
            )
        except Exception as e:
            _log({"skipped": "dgk", "reason": repr(e)[:160]})
    else:
        _log({"skipped": "dgk", "reason": "bench time budget"})

    if remaining() > 60:
        try:
            checks, secs, med = bench_proximity_pipeline(
                budget_s=min(60.0, max(20.0, remaining() - 15))
            )
            _log(
                {
                    "metric": "proximity_checks_per_s_packed_n4096",
                    "value": round(checks / secs, 1),
                    "median": round(checks / med, 1),
                    "unit": "checks/s",
                    "includes_bf_probe": True,
                    "batch_checks": checks,
                    "batch_latency_ms": round(secs * 1e3, 2),
                    "t_elapsed_s": round(budget_s - remaining(), 1),
                }
            )
        except Exception as e:
            _log({"skipped": "proximity_pipeline", "reason": repr(e)[:160]})
    else:
        _log({"skipped": "proximity_pipeline", "reason": "bench time budget"})

    if remaining() > 40:
        try:
            ntt_rate, ntt_med, roofline = bench_ntt(
                budget_s=min(60.0, max(20.0, remaining() - 15))
            )
            _log(
                {
                    "metric": "ntt_transforms_per_s_n8192_3primes",
                    "value": round(ntt_rate, 1),
                    "median": round(ntt_med, 1),
                    "unit": "transforms/s",
                    "batch": 10240,
                    # Achieved-vs-measured-peak traffic efficiency: the
                    # BASELINE row asks for speed-of-light; this is the
                    # fraction of the perfectly-fused 2-sweep bound at the
                    # MEASURED streaming peak (docs/performance_model.md).
                    "vs_baseline": round(
                        roofline["min_sweeps"] / roofline["sweeps_equiv_at_peak"], 3
                    ),
                    **roofline,
                    "t_elapsed_s": round(budget_s - remaining(), 1),
                }
            )
        except Exception as e:
            _log({"skipped": "ntt", "reason": repr(e)[:160]})
    else:
        _log({"skipped": "ntt", "reason": "bench time budget"})

    # Contaminated-headline retry: if the first multiply measurement never
    # saw a healthy window and budget remains, measure again now.
    if not headline_healthy and remaining() > 60:
        _log({"headline_retry": "first window degraded"})
        value2, _, _ = measure_multiply(
            mult_fns, budget_s=min(90.0, remaining() - 10)
        )
        if value2 > value:
            emit_headline(value2)


if __name__ == "__main__":
    main()
