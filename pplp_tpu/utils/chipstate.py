"""Shared-chip measurement hygiene: canary gating + persistent compile cache.

The bench TPU in this environment is a remote, shared v5e-class chip behind a
tunnel. Two failure modes corrupt measurements (observed rounds 2-3):

* **Degraded dispatch windows**: for minutes at a time every kernel dispatch
  costs ~5 ms wall regardless of work (a ~40-100x inflation for
  microsecond-scale kernels). Whole benchmark scripts can fall inside one
  window, producing reproducible-looking garbage.
* **Compile stalls**: XLA compiles that normally take seconds can queue for
  minutes.

Countermeasures here:

* :func:`canary_latency` / :func:`chip_healthy` — a tiny resident jitted
  kernel whose dispatch latency distinguishes the two states (healthy
  ~0.1 ms, degraded ~5 ms).
* :func:`timed_windows` — best/median seconds-per-call over several spaced
  windows, where each window is *gated*: if the canary says degraded, the
  window is skipped (with backoff) instead of polluting the sample. A wall
  budget bounds the total wait so driver runs never hang.
* :func:`enable_compile_cache` — turns on JAX's persistent compilation cache
  so each big Pallas kernel compiles once per machine, not once per process
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


def timed_windows_multi(
    fns: dict,
    windows: int = 8,
    inner: int = 2,
    gap_s: float = 0.25,
    budget_s: float = 150.0,
):
    """Round-robin gated timing of several variants: {name: (fn, args)}.

    Interleaving means every variant samples the same contention climate —
    serial per-variant measurement can crown a "winner" purely because the
    neighbor burst during the loser's turn (observed on the round-2 bench).
    Returns {name: (best, median)} seconds/call; degraded windows skipped.
    """
    for fn, args in fns.values():  # warmup/compile
        jax.block_until_ready(fn(*args))
    times = {name: [] for name in fns}
    t_start = time.perf_counter()
    backoff = 1.0
    rounds = 0
    while rounds < windows:
        elapsed = time.perf_counter() - t_start
        if elapsed > budget_s:
            break
        if not chip_healthy():
            if all(times[n] for n in times) and elapsed + backoff > budget_s:
                break
            time.sleep(min(backoff, 8.0))
            backoff *= 1.6
            continue
        backoff = 1.0
        for name, (fn, args) in fns.items():
            t0 = time.perf_counter()
            for _ in range(inner):
                out = fn(*args)
            jax.block_until_ready(out)
            times[name].append((time.perf_counter() - t0) / inner)
        rounds += 1
        time.sleep(gap_s)
    out = {}
    for name, ts in times.items():
        if not ts:  # never healthy: one ungated window
            t0 = time.perf_counter()
            for _ in range(inner):
                o = fns[name][0](*fns[name][1])
            jax.block_until_ready(o)
            ts = [(time.perf_counter() - t0) / inner]
        ts.sort()
        out[name] = (ts[0], ts[len(ts) // 2])
    return out


def timed_windows(
    fn,
    *args,
    windows: int = 10,
    inner: int = 3,
    gap_s: float = 0.25,
    budget_s: float = 90.0,
    gate: bool = True,
):
    """(best, median) seconds/call over gated, spaced measurement windows.

    Windows measured while the canary reports a degraded chip are discarded
    and retried after a backoff, up to ``budget_s`` total wall time. At least
    one window is always recorded (ungated) so a result is produced even if
    the chip never looks healthy.
    """
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    t_start = time.perf_counter()
    backoff = 1.0
    recorded = 0
    while recorded < windows:
        elapsed = time.perf_counter() - t_start
        over = elapsed > budget_s or (elapsed + backoff > budget_s)
        if over and times:
            break
        if gate and not over and not chip_healthy():
            time.sleep(min(backoff, 8.0))
            backoff *= 1.6
            continue
        # Budget exhausted with nothing recorded: measure ungated once.
        backoff = 1.0
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / inner)
        recorded += 1
        time.sleep(gap_s)
    times.sort()
    return times[0], times[len(times) // 2]
