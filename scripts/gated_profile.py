"""Long-running interleaved profile of the multiply paths (+ablations).

Compiles each requested variant once (persistent cache), then measures all
of them round-robin for the remaining wall budget with RTT-amortized
windows (inner=8 back-to-back calls — round 4: a single dispatch pays a
~25-30 ms process-local round trip, and the in-process canary only reads
that floor after warmup, so samples are no longer canary-gated; the
fresh-subprocess canary is logged per round for chip state).
Interleaving keeps cross-variant comparisons within the same contention
climate — the failure mode that poisoned the round-2/3 "Mosaic 4-D cliff"
conclusion (variants measured in different windows looked 100x apart).

Usage: python scripts/gated_profile.py [minutes] [variant ...]
Variants: xla fused nontt nttonly prim
Output: JSONL lines to stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pplp_tpu.utils.chipstate import enable_compile_cache, fresh_canary_us

enable_compile_cache()

N, BATCH, TILE = 4096, 256, 2


def log(**kw):
    print(json.dumps(kw), flush=True)


def build_xla():
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.behz import RnsMultiplier, make_keys_jit, relinearize
    import bench

    parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")
    ctx = BFVContext.build(parms, engine="four")
    _sk, rlk = make_keys_jit(ctx, 0)
    mul = RnsMultiplier(ctx)
    ct1, ct2 = bench._synthetic_cts(ctx, BATCH, N)
    f = jax.jit(lambda a, b: relinearize(ctx, mul.multiply(a, b), rlk))
    return f, (ct1, ct2)


def build_fused(mode):
    import pplp_tpu.bfv.behz_fused as bf
    import jax.numpy as jnp
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.behz import make_keys_jit
    from pplp_tpu.bfv.ciphertext import Ciphertext

    orig = (bf._ntt_fwd, bf._ntt_inv, bf._to_bsk, bf._fast_floor, bf._sk_to_q)
    if mode == "nontt":
        bf._ntt_fwd = lambda x, tabs, q, c1, logc1: x
        bf._ntt_inv = lambda x, tabs, q, c1, logc1: x
    elif mode == "nttonly":
        bf._to_bsk = lambda x_q, kc, mt: jnp.concatenate(
            [x_q, x_q[:, : kc.qb.shape[0] - x_q.shape[1]]], axis=1)
        bf._fast_floor = lambda e_q, e_b, kc: e_b
        bf._sk_to_q = lambda w, kc, l, h: w[:, : kc.qq.shape[0]]

    parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")
    ctx = BFVContext.build(parms, engine="vmem")
    _sk, rlk = make_keys_jit(ctx, 0)
    fused = bf.FusedMultiplier(ctx, rlk, tile_b=TILE)
    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]

    def ct():
        def poly():
            v = rng.integers(0, 1 << 62, size=(BATCH, ctx.L, N)).astype(
                np.uint64) % qs
            return jnp.asarray(v.astype(np.uint32))
        return Ciphertext((poly(), poly()), "coeff")

    args = (ct(), ct())
    f = lambda a, b: fused.multiply_relinearize(a, b).polys
    # Trace+compile WHILE the ablation monkeypatches are active: jax.jit is
    # lazy and resolves bf._ntt_fwd etc. as module globals at first call, so
    # restoring them before the warm call would silently measure the FULL
    # kernel for every ablation mode.
    jax.block_until_ready(f(*args))
    bf._ntt_fwd, bf._ntt_inv, bf._to_bsk, bf._fast_floor, bf._sk_to_q = orig
    return f, args


def build_prim():
    """Calibration: 16-chain shoup mulmod on [BATCH, 4, N] (scalar consts)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from pplp_tpu.ops.modmath import m31

    Q = (1 << 30) - (1 << 18) + 1
    W = 123456789
    WS = (W << 32) // Q

    def kernel(x_ref, o_ref):
        y = x_ref[...]
        for _ in range(16):
            y = m31.mulmod_shoup(y, jnp.uint32(W), jnp.uint32(WS),
                                 jnp.uint32(Q))
        o_ref[...] = y

    spec = pl.BlockSpec((8, 4, N), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, Q, size=(BATCH, 4, N), dtype=np.uint32))
    f = jax.jit(lambda xx: pl.pallas_call(
        kernel, grid=(BATCH // 8,),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BATCH, 4, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(xx))
    return f, (x,)


BUILDERS = {
    "xla": build_xla,
    "fused": lambda: build_fused("full"),
    "nontt": lambda: build_fused("nontt"),
    "nttonly": lambda: build_fused("nttonly"),
    "prim": build_prim,
}


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    names = sys.argv[2:] or ["prim", "xla", "fused", "nontt", "nttonly"]

    variants = {}
    for name in names:
        t0 = time.time()
        f, args = BUILDERS[name]()
        out = f(*args)
        jax.block_until_ready(out)
        log(event="compiled", variant=name, compile_s=round(time.time() - t0, 1))
        variants[name] = (f, args)

    t_end = time.time() + minutes * 60  # measurement budget AFTER compiles
    inner = int(os.environ.get("PPLP_PROFILE_INNER", "8"))
    stop_file = os.environ.get("PPLP_PROFILE_STOP", "/tmp/b3/stop")
    while time.time() < t_end and not os.path.exists(stop_file):
        for name, (f, args) in variants.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(inner):
                out = f(*args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / inner
            log(
                event="sample", variant=name, s_per_call=round(dt, 6),
                per_s=round(BATCH / dt, 1),
            )
            time.sleep(0.5)
        log(event="round_done", fresh_canary_us=fresh_canary_us())
        time.sleep(2.0)


if __name__ == "__main__":
    main()
