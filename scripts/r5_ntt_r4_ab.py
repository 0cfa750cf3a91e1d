"""Round-5 A/B: radix-4 fused four-step NTT ("four4") vs radix-2 ("four")
inside the FULL dual_wide mult+relin graph (the headline path).

Interleaved amortized windows (same contention climate for both variants).
The graphs are bit-identical in output (tests/test_ntt4.py pins it); only
the number of materialized butterfly sweeps differs.
"""

import json
import sys

import jax

sys.path.insert(0, ".")
from pplp_tpu.utils.chipstate import (  # noqa: E402
    enable_compile_cache,
    fresh_canary_us,
    timed_windows_multi,
)

enable_compile_cache()


def log(o):
    print(json.dumps(o), flush=True)


def build(engine, batch=256, n=4096):
    from bench import _synthetic_cts
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.behz import (
        RnsMultiplier,
        _digit_groups,
        create_relin_keys_wide,
        make_keys_jit,
        relinearize_wide,
    )

    parms = EncryptionParameters.bfv(n, 1 << 16, profile="tpu")
    ctx = BFVContext.build(parms, engine=engine)
    sk, _ = make_keys_jit(ctx, 0)
    mul = RnsMultiplier(ctx)
    groups = _digit_groups(ctx.L, 2)
    rlk_w = jax.jit(lambda key: create_relin_keys_wide(ctx, sk, key)[0])(
        jax.random.key(2)
    )
    mrw = lambda a, b: relinearize_wide(ctx, mul.multiply(a, b), rlk_w, groups).polys
    h = batch // 2
    d1, d2 = _synthetic_cts(ctx, h, n)
    d3, d4 = _synthetic_cts(ctx, h, n)
    fn = jax.jit(lambda a, b, c, d: (mrw(a, b), mrw(c, d)))
    return fn, (d1, d2, d3, d4), batch


def main():
    log({"fresh_canary_us": fresh_canary_us()})
    fns = {}
    for engine in ("four", "four4"):
        fn, args, batch = build(engine)
        fns[engine] = (fn, args)
    timed = timed_windows_multi(fns, windows=8, budget_s=150.0)
    out = {
        k: {"ms": round(b * 1e3, 2), "mults_per_s": round(256 / b, 1),
            "median_per_s": round(256 / m, 1)}
        for k, (b, m) in timed.items()
    }
    out["fresh_canary_us"] = fresh_canary_us()
    log(out)


if __name__ == "__main__":
    main()
