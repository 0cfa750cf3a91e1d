"""Probe whether block_until_ready is a real execution barrier on this
runtime, and measure streaming bandwidth with a host-fetch barrier.

Evidence so far (scripts/r5_roofline.py history): chained 256 MiB copyadd
measured 0.603 ms/call in one run (plausible, ~890 GB/s) and 0.015 ms/call
in the next (impossible, 35 TB/s). Raw T(N) for chained calls + a final
device->host fetch (which cannot return before the data exists) settles it.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from pplp_tpu.utils.chipstate import enable_compile_cache  # noqa: E402

enable_compile_cache()


def log(o):
    print(json.dumps(o), flush=True)


mib = 256
elems = mib * (1 << 20) // 4
x = jnp.arange(elems, dtype=jnp.uint32).reshape(-1, 1024)
f = jax.jit(lambda a: a + jnp.uint32(1))
z = f(x)
jax.block_until_ready(z)
# tiny fetch fn: sum of a 128-slice (reads 512B from the result buffer)
g = jax.jit(lambda a: a[0, :8].astype(jnp.uint64).sum())

for rep in range(3):
    rec = {"rep": rep}
    for n in (1, 8, 32, 128):
        z = x
        t0 = time.perf_counter()
        for _ in range(n):
            z = f(z)
        jax.block_until_ready(z)
        t_block = time.perf_counter() - t0
        # host fetch of a probe value derived from the final buffer:
        v = int(g(z))
        t_fetch = time.perf_counter() - t0
        rec[f"N{n}"] = {
            "block_ms": round(t_block * 1e3, 2),
            "fetch_ms": round(t_fetch * 1e3, 2),
            "per_call_fetch_ms": round(t_fetch / n * 1e3, 3),
            "probe": v,
        }
    log(rec)
    time.sleep(0.3)

# implied bandwidth from the N=128 fetch-barrier slope vs N=32
for rep in range(3):
    ts = {}
    for n in (32, 128):
        z = x
        t0 = time.perf_counter()
        for _ in range(n):
            z = f(z)
        int(g(z))
        ts[n] = time.perf_counter() - t0
    slope = (ts[128] - ts[32]) / 96
    log(
        {
            "slope_ms": round(slope * 1e3, 3),
            "gbps": round(2 * 4 * elems / slope / 1e9, 1),
        }
    )
    time.sleep(0.3)
