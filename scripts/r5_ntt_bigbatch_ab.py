"""Round-5 A/B: NTT at the BASELINE batch (10240 rows) — monolithic vs
lax.map over 1024-row chunks (the batch-1024 shape runs at ~2x the
per-element rate of the monolithic 10240 graph; chunking inside one jit
should recover it if the regression is working-set locality).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from pplp_tpu.ops import ntt  # noqa: E402
from pplp_tpu.ops.primes import Modulus, get_primes  # noqa: E402
from pplp_tpu.utils.chipstate import (  # noqa: E402
    enable_compile_cache,
    fresh_canary_us,
    timed_chain_slope,
)

enable_compile_cache()


def log(o):
    print(json.dumps(o), flush=True)


def main():
    n, n_limbs, batch, chunk = 8192, 3, 10240, 1024
    moduli = [Modulus(q) for q in get_primes(30, n_limbs, n)]
    out = {}
    for engine in ("four", "four4"):
        tb = ntt.build_tables(moduli, n, engine=engine)
        q = tb.q[:, None]
        bits = jax.random.bits(jax.random.key(0), (batch, n_limbs, n), jnp.uint32)
        x = bits % q

        mono = jax.jit(lambda v: ntt.forward(v, tb))

        def chunked(v):
            vc = v.reshape(batch // chunk, chunk, n_limbs, n)
            return jax.lax.map(lambda c: ntt.forward(c, tb), vc).reshape(v.shape)

        cfn = jax.jit(chunked)
        for name, f in (("mono", mono), ("chunked", cfn)):
            b, m = timed_chain_slope(f, x, inners=(4, 12), reps=4)
            out[f"{engine}_{name}"] = {
                "ms": round(b * 1e3, 1),
                "tf_per_s": round(batch * n_limbs / b, 1),
                "tf_per_s_median": round(batch * n_limbs / m, 1),
            }
            log({f"{engine}_{name}": out[f"{engine}_{name}"]})
            time.sleep(0.3)
    out["fresh_canary_us"] = fresh_canary_us()
    log(out)


if __name__ == "__main__":
    main()
