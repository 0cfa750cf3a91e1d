"""Shared-chip measurement hygiene: dispatch-amortized timing + compile cache.

The bench TPU in this environment is a remote, shared v5e-class chip behind a
tunnel. Round-4 measurement forensics (scripts/r4_dispatch_floor.py)
overturned the round-2/3 model of its failure modes:

* **Per-dispatch round-trip latency is the dominant artifact.** After a
  process runs its first big graph, EVERY synchronous dispatch
  (call + block_until_ready) pays a ~25-30 ms host<->device round trip —
  in THAT process only; a concurrently started fresh process reads ~0.1 ms.
  The round-2/3 "degraded dispatch windows" were largely this process-local
  state, not neighbor contention. Crucially, async dispatches PIPELINE:
  8 back-to-back calls of a 3.4 ms kernel cost ~3.5 ms each (measured; a
  lax.scan-chained x8 graph gives the same). Throughput timing must
  therefore amortize the RTT over enough back-to-back calls —
  :func:`timed_windows`/:func:`timed_windows_multi` now auto-size ``inner``
  for ~0.25 s of queued work per window.
* **Real neighbor bursts exist too** (fresh-process canary 5-6 ms for
  minutes), inflating device time itself. Best-of-N spaced windows with the
  median reported covers those; in-process canary gating does NOT (the
  canary mostly re-measures the process's own RTT floor) and was removed.
* **Compile stalls**: compiles that normally take seconds can queue for
  minutes behind orphaned compiles, and an in-flight compile RPC can be
  lost entirely (process hangs forever: kill it and rerun — the
  persistent cache makes the retry cheap).

* :func:`canary_latency` / :func:`chip_healthy` — valid ONLY in a process
  that has not yet run big graphs (e.g. bench start, or a fresh subprocess
  probe): there it distinguishes quiet (~0.1 ms) from neighbor-burst
  (~5 ms) states. :func:`fresh_canary_us` spawns such a probe.
* :func:`enable_compile_cache` — turns on JAX's persistent compilation cache
  so each big kernel compiles once per machine, not once per process
  (verified effective on this backend: 1.76 s -> 0.13 s).

The reference has no analogue (single local CPU, `chrono` timers around
stages, ``include/benchmark.h:71-74``); this is TPU-environment plumbing.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

_CANARY = None
_CANARY_X = None


def enable_compile_cache(path: str | None = None) -> None:
    """Enable the persistent compilation cache (idempotent)."""
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_pplp"
    )
    try:
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only config: non-fatal


def _get_canary():
    global _CANARY, _CANARY_X
    if _CANARY is None:
        f = jax.jit(lambda x: (x * jnp.uint32(2654435761) + (x >> 7)).sum())
        x = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
        f(x).block_until_ready()
        _CANARY, _CANARY_X = f, x
    return _CANARY, _CANARY_X


def canary_latency(reps: int = 3) -> float:
    """Median dispatch latency (s) of a tiny resident kernel."""
    f, x = _get_canary()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


# Healthy dispatch on this chip is ~0.07-0.15 ms; degraded is ~5 ms.
HEALTHY_S = 0.0012


def chip_healthy() -> bool:
    return canary_latency() < HEALTHY_S


def wait_healthy(max_wait_s: float = 120.0, poll_s: float = 2.0) -> bool:
    """Block until the chip looks healthy or the wait budget expires."""
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < max_wait_s:
        if chip_healthy():
            return True
        time.sleep(poll_s)
    return False


def fresh_canary_us(timeout_s: float = 30.0) -> int:
    """Chip-state reading from a FRESH subprocess (where the canary is
    valid — this process's own canary only measures its RTT floor once big
    graphs have run). Returns -1 on failure/timeout."""
    import subprocess
    import sys

    code = (
        "from pplp_tpu.utils.chipstate import canary_latency\n"
        "print(round(canary_latency()*1e6))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
        )
        return int(r.stdout.strip().splitlines()[-1])
    except Exception:
        return -1


def _calibrate_inner(per_call_s: float, target_s: float = 0.25,
                     max_inner: int = 256) -> int:
    return max(1, min(max_inner, round(target_s / max(per_call_s, 1e-5))))


def timed_windows_multi(
    fns: dict,
    windows: int = 8,
    inner: int | None = None,
    gap_s: float = 0.25,
    budget_s: float = 150.0,
):
    """Round-robin timing of several variants: {name: (fn, args)}.

    Interleaving means every variant samples the same contention climate —
    serial per-variant measurement can crown a "winner" purely because the
    neighbor burst during the loser's turn (observed on the round-2 bench).

    ``inner=None`` auto-sizes the back-to-back call count per variant so
    each window queues ~0.25 s of device work: async dispatches pipeline, so
    this amortizes the ~25-30 ms per-dispatch round trip that otherwise
    dominates (round-4 finding; a 3.4 ms kernel measures 27 ms at inner=1).
    Returns {name: (best, median)} seconds/call.
    """
    # Budget clock starts BEFORE warmup/calibration so a slow variant set
    # cannot overrun the caller's wall-budget slice (ADVICE r4): the window
    # loop still guarantees >=1 window per variant once reached.
    t_start = time.perf_counter()
    for fn, args in fns.values():  # warmup/compile
        jax.block_until_ready(fn(*args))
    inners = {}
    for name, (fn, args) in fns.items():
        if inner is not None:
            inners[name] = inner
            continue
        t0 = time.perf_counter()
        out = None
        for _ in range(4):
            out = fn(*args)
        jax.block_until_ready(out)
        inners[name] = _calibrate_inner((time.perf_counter() - t0) / 4)
    times = {name: [] for name in fns}
    rounds = 0
    while rounds < windows:
        if time.perf_counter() - t_start > budget_s and all(
            times[n] for n in times
        ):
            break
        for name, (fn, args) in fns.items():
            k = inners[name]
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn(*args)
            jax.block_until_ready(out)
            times[name].append((time.perf_counter() - t0) / k)
        rounds += 1
        time.sleep(gap_s)
    out = {}
    for name, ts in times.items():
        ts.sort()
        out[name] = (ts[0], ts[len(ts) // 2])
    return out


def timed_chain_slope(fn, x0, inners=(16, 64), reps=5, gap_s=0.25, extra=()):
    """(best, median) per-call seconds via the FETCH-BARRIER SLOPE method.

    Round-5 finding (scripts/r5_sync_probe.py): on this runtime,
    ``block_until_ready`` is NOT a reliable execution barrier for small or
    simple programs — repeated same-argument dispatches of a 256 MiB copy
    measured 0.015-0.6 ms/call across runs (35 TB/s..640 GB/s), while a
    probe value FETCHED from the final buffer of a chained sequence always
    gives consistent physics (~640 GB/s streaming). Method:

      * chain calls (z = fn(z, *extra)) so no dispatch can be elided,
      * end each timed window by fetching a scalar derived from the final
        buffer (device->host data cannot arrive before it exists),
      * take the slope of wall time between two chain lengths, cancelling
        the ~25-50 ms constant dispatch/RTT overhead that swamps small
        windows.

    Requires fn's output to be a valid input (same shape/dtype/domain).
    For large multi-op graphs (e.g. the multiply, >10 ms/call) the plain
    ``timed_windows`` amortization agrees with this method; for single-op
    graphs ONLY this method is trustworthy."""
    probe = jax.jit(lambda a: a.ravel()[:8].astype(jnp.uint32).sum())
    z = fn(x0, *extra)
    int(probe(z))  # warm both executables
    slopes = []
    for _ in range(reps):
        ts = {}
        for n in inners:
            z = x0
            t0 = time.perf_counter()
            for _ in range(n):
                z = fn(z, *extra)
            int(probe(z))
            ts[n] = time.perf_counter() - t0
        slopes.append((ts[inners[1]] - ts[inners[0]]) / (inners[1] - inners[0]))
        time.sleep(gap_s)
    slopes.sort()
    return slopes[0], slopes[len(slopes) // 2]


def measure_stream_peak_gbps(mib: int = 256, reps: int = 3) -> tuple[float, float]:
    """Measured streaming speed-of-light (GB/s): best of chained copyadd
    (1R+1W) and saxpy (2R+1W) at ``mib`` working set, fetch-barrier slope.
    Returns (best, median_of_best_kernel)."""
    elems = mib * (1 << 20) // 4
    x = jnp.arange(elems, dtype=jnp.uint32).reshape(-1, 1024)
    copyadd = jax.jit(lambda a: a + jnp.uint32(1))
    saxpy = jax.jit(lambda a, b: a * jnp.uint32(3) + b)
    best = (0.0, 0.0)
    for fn, nbytes, extra, inners in (
        (copyadd, 2 * 4 * elems, (), (32, 128)),
        (saxpy, 3 * 4 * elems, (x,), (32, 96)),
    ):
        b, m = timed_chain_slope(fn, x, inners=inners, reps=reps, extra=extra)
        if nbytes / b / 1e9 > best[0]:
            best = (nbytes / b / 1e9, nbytes / m / 1e9)
    return best


def timed_windows(
    fn,
    *args,
    windows: int = 10,
    inner: int | None = None,
    gap_s: float = 0.25,
    budget_s: float = 90.0,
    gate: bool = False,
):
    """(best, median) seconds/call over spaced measurement windows.

    ``inner=None`` auto-amortizes the per-dispatch round trip (see
    :func:`timed_windows_multi`). ``gate`` is deprecated and ignored: the
    in-process canary cannot distinguish chip state once big graphs have
    run (round-4 finding), so windows are simply spread over time with
    best + median reported — neighbor bursts inflate some windows and the
    best-of-N discards them.
    """
    del gate
    out = fn(*args)
    jax.block_until_ready(out)
    if inner is None:
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn(*args)
        jax.block_until_ready(out)
        inner = _calibrate_inner((time.perf_counter() - t0) / 4)
    times = []
    t_start = time.perf_counter()
    for _ in range(windows):
        if time.perf_counter() - t_start > budget_s and times:
            break
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / inner)
        time.sleep(gap_s)
    times.sort()
    return times[0], times[len(times) // 2]
