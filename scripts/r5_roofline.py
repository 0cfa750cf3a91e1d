"""Round-5: measure the chip's streaming speed-of-light and place the
production graphs on it (VERDICT r4 task 3).

Methodology (validated by scripts/r5_sync_probe.py):

* **Chained calls only** — each call consumes the previous call's output;
  a probe value fetched to the host proves execution happened.
* **Fetch-barrier slope** — per-call device time is the slope of total
  wall time between two chain lengths (e.g. 32 vs 128 calls), each ended
  by a host fetch of a value derived from the final buffer. This cancels
  the ~25-50 ms constant dispatch/RTT overhead that swamps small windows
  on this tunneled runtime (block_until_ready alone measured 0.015-0.6
  ms/call for the SAME kernel across runs — unusable at small N).
* Streaming peak = best of copyadd (1R+1W) / saxpy (2R+1W) at 256 MiB.

Achieved-vs-peak for the production graphs uses the same chained slope for
the NTT, and the interleaved amortized windows for the multiply (per-call
13.4 ms >> overhead, reproducible across rounds and processes).

Run: python scripts/r5_roofline.py  (on the TPU; ~4 min warm)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from pplp_tpu.utils.chipstate import (  # noqa: E402
    enable_compile_cache,
    fresh_canary_us,
    timed_windows,
)

enable_compile_cache()


def log(obj):
    print(json.dumps(obj), flush=True)


def cost_bytes(fn, *args):
    """XLA's own estimate of bytes accessed (documented to overcount HBM:
    it prices every fusion operand, including reuse)."""
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("bytes accessed", 0.0))


def _probe_fn():
    return jax.jit(lambda a: a.ravel()[:8].astype(jnp.uint64).sum())


def chained_slope(fn, x0, inners=(32, 128), reps=5, extra=()):
    """(best, median) per-call seconds by fetch-barrier slope."""
    g = _probe_fn()
    z = fn(x0, *extra)
    int(g(z))  # warm both executables
    slopes = []
    for _ in range(reps):
        ts = {}
        for n in inners:
            z = x0
            t0 = time.perf_counter()
            for _ in range(n):
                z = fn(z, *extra)
            int(g(z))
            ts[n] = time.perf_counter() - t0
        slopes.append((ts[inners[1]] - ts[inners[0]]) / (inners[1] - inners[0]))
        time.sleep(0.25)
    slopes.sort()
    return slopes[0], slopes[len(slopes) // 2]


def bench_streaming():
    results = []
    mib = 256
    elems = mib * (1 << 20) // 4
    x = jnp.arange(elems, dtype=jnp.uint32).reshape(-1, 1024)
    copyadd = jax.jit(lambda a: a + jnp.uint32(1))
    saxpy = jax.jit(lambda a, b: a * jnp.uint32(3) + b)
    for name, fn, nbytes, extra, inners in (
        ("copyadd", copyadd, 2 * 4 * elems, (), (32, 128)),
        ("saxpy", saxpy, 3 * 4 * elems, (x,), (32, 96)),
    ):
        best, med = chained_slope(fn, x, inners=inners, extra=extra)
        rec = {
            "stream": name,
            "mib": mib,
            "ms_call_best": round(best * 1e3, 3),
            "gbps_best": round(nbytes / best / 1e9, 1),
            "gbps_median": round(nbytes / med / 1e9, 1),
        }
        log(rec)
        results.append(rec)
    return results


def bench_ntt_roofline(peak_gbps):
    from pplp_tpu.ops import ntt
    from pplp_tpu.ops.primes import Modulus, get_primes

    n, n_limbs, batch = 8192, 3, 1024
    moduli = [Modulus(q) for q in get_primes(30, n_limbs, n)]
    out = {}
    for engine in ("four", "four4"):
        try:
            tb = ntt.build_tables(moduli, n, engine=engine)
        except Exception as e:
            log({"ntt_engine_error": engine, "err": repr(e)[:120]})
            continue
        q = tb.q[:, None]
        bits = jax.random.bits(jax.random.key(0), (batch, n_limbs, n), jnp.uint32)
        x = bits % q
        jfwd = jax.jit(lambda v, _tb=tb: ntt.forward(v, _tb))
        xla_bytes = cost_bytes(lambda v: ntt.forward(v, tb), x)
        best, med = chained_slope(jfwd, x, inners=(16, 64))
        transforms = batch * n_limbs
        array_bytes = 4 * x.size
        rec = {
            "graph": f"ntt_{engine}_fwd_n8192_b1024x3",
            "ms_best": round(best * 1e3, 2),
            "transforms_per_s": round(transforms / best, 1),
            "transforms_per_s_median": round(transforms / med, 1),
            "xla_bytes": xla_bytes,
            # Equivalent full-array HBM sweeps at the measured peak; a
            # perfectly fused kernel needs 2 (one read + one write).
            "sweeps_at_peak": round(best * peak_gbps * 1e9 / array_bytes, 1),
            "min_sweeps": 2,
        }
        log(rec)
        out[engine] = rec
    return out


def bench_multiply_roofline(peak_gbps):
    from bench import build_multiply_fns

    fns = build_multiply_fns()
    name = "dual_wide" if "dual_wide" in fns else next(iter(fns))
    fn, args, batch = fns[name]
    xla_bytes = cost_bytes(fn, *args)
    jax.block_until_ready(fn(*args))
    best, med = timed_windows(fn, *args, windows=8, budget_s=60.0)
    # Working set granule: one [128, L=4, 4096] u32 poly = 8 MiB.
    poly_bytes = 4 * 128 * 4 * 4096
    rec = {
        "graph": f"mult_relin_{name}_n4096",
        "ms_best": round(best * 1e3, 2),
        "mults_per_s": round(batch / best, 1),
        "xla_bytes": xla_bytes,
        "traffic_at_peak_gb": round(best * peak_gbps, 2),
        "poly_sweeps_at_peak": round(best * peak_gbps * 1e9 / poly_bytes, 1),
    }
    log(rec)
    return rec


def main():
    log({"fresh_canary_us": fresh_canary_us()})
    streams = bench_streaming()
    peak = max(r["gbps_best"] for r in streams)
    log({"measured_peak_gbps": peak})
    ntt_recs = bench_ntt_roofline(peak)
    mul_rec = bench_multiply_roofline(peak)
    log(
        {
            "summary": {
                "measured_peak_gbps": peak,
                "ntt": {
                    k: (v["ms_best"], v["sweeps_at_peak"])
                    for k, v in ntt_recs.items()
                },
                "mult_ms": mul_rec["ms_best"],
                "fresh_canary_us": fresh_canary_us(),
            }
        }
    )


if __name__ == "__main__":
    main()
