"""Round-4 A/B: old (per-poly/per-digit) vs new (stacked) mult+relin graphs,
interleaved in the same windows, with canary tracked per sample — plus an
idle-recovery probe of the canary at the end.

Also answers: is the 'degraded window' process-local (canary stays ~ms in
this process while fresh processes read ~100us)?
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pplp_tpu.utils.chipstate import canary_latency, enable_compile_cache

enable_compile_cache()

N, BATCH = 4096, 256


def build_old_multiply(mul, ctx, rlk):
    """The round-3 graph shapes: per-poly prep, per-j inverse/floor/SK,
    per-digit keyswitch (reconstructed; math identical)."""
    from pplp_tpu.bfv.behz import _tslice_limbs, _tmap
    from pplp_tpu.bfv.ciphertext import Ciphertext
    from pplp_tpu.ops import ntt

    tq, tb = mul.base_q.tables, mul.base_bsk.tables
    p = ctx.prof
    q2 = ctx.tables.q_b(1)
    k = ctx.L

    def multiply_old(ct1, ct2):
        def prep(poly):
            bsk = mul._to_bsk(poly)
            return (ntt.forward(poly, tq), ntt.forward(bsk, tb))

        c0, c1 = (prep(x) for x in ct1.polys)
        d0, d1 = (prep(x) for x in ct2.polys)
        es = []
        for bi, (basis, tbx) in ((0, (mul.base_q, tq)), (1, (mul.base_bsk, tb))):
            a0, a1 = c0[bi], c1[bi]
            b0, b1 = d0[bi], d1[bi]
            e0 = ntt.pointwise_mul(a0, b0, tbx)
            e2 = ntt.pointwise_mul(a1, b1, tbx)
            cross = ntt.pointwise_mul(basis.add(a0, a1), basis.add(b0, b1), tbx)
            e1 = basis.sub(basis.sub(cross, e0), e2)
            es.append(tuple(ntt.inverse(e, tbx) for e in (e0, e1, e2)))
        out_polys = []
        for j in range(3):
            w = mul._fast_floor(es[0][j], es[1][j])
            out_polys.append(mul._sk_to_q(w))
        return Ciphertext(tuple(out_polys), "coeff")

    def relin_old(ct):
        c0p, c1p, c2p = ct.polys
        acc0 = acc1 = None
        mu2 = tuple(m[:, None] for m in ctx.tables.mu)
        for i in range(k):
            digit = _tslice_limbs(c2p, slice(i, i + 1))
            lifted = p.reduce64(
                jnp.broadcast_to(digit, c2p.shape), jnp.zeros_like(c2p),
                ctx.tables.q[:, None], mu2[0], mu2[1],
            )
            d_ntt = ntt.forward(lifted, ctx.tables)
            t0 = p.mulmod_shoup(
                d_ntt, jax.tree.map(lambda a: a[i], rlk.k0),
                jax.tree.map(lambda a: a[i], rlk.k0_shoup), q2)
            t1 = p.mulmod_shoup(
                d_ntt, jax.tree.map(lambda a: a[i], rlk.k1),
                jax.tree.map(lambda a: a[i], rlk.k1_shoup), q2)
            acc0 = t0 if acc0 is None else p.add(acc0, t0, q2)
            acc1 = t1 if acc1 is None else p.add(acc1, t1, q2)
        d0, d1 = ntt.inverse(acc0, ctx.tables), ntt.inverse(acc1, ctx.tables)
        return (p.add(c0p, d0, q2), p.add(c1p, d1, q2))

    return multiply_old, relin_old


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    from pplp_tpu.bfv import BFVContext, EncryptionParameters
    from pplp_tpu.bfv.behz import RnsMultiplier, make_keys_jit, relinearize
    from pplp_tpu.bfv.ciphertext import Ciphertext

    parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")
    variants = {}
    for eng in ("four", "vmem"):
        ctx = BFVContext.build(parms, engine=eng)
        _sk, rlk = make_keys_jit(ctx, 0)
        mul = RnsMultiplier(ctx)
        rng = np.random.default_rng(0)
        qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]
        mk = lambda: jnp.asarray(
            (rng.integers(0, 1 << 62, size=(BATCH, ctx.L, N)).astype(np.uint64)
             % qs).astype(np.uint32))
        ct1, ct2 = Ciphertext((mk(), mk()), "coeff"), Ciphertext((mk(), mk()), "coeff")
        new = jax.jit(lambda a, b, ctx=ctx, mul=mul, rlk=rlk: relinearize(
            ctx, mul.multiply(a, b), rlk).polys)
        variants[f"new_{eng}"] = (new, (ct1, ct2))
        if eng == "four":
            from pplp_tpu.bfv.behz import relinearize as relin_new

            mult_old, relin_old = build_old_multiply(mul, ctx, rlk)
            variants["old_four"] = (
                jax.jit(lambda a, b: relin_old(mult_old(a, b))), (ct1, ct2))
            # Mixed: isolate which stacking (prep vs keyswitch) moves time.
            variants["oldmult_newrelin"] = (
                jax.jit(lambda a, b, ctx=ctx, rlk=rlk: relin_new(
                    ctx, mult_old(a, b), rlk).polys), (ct1, ct2))
            variants["newmult_oldrelin"] = (
                jax.jit(lambda a, b, mul=mul: relin_old(
                    mul.multiply(a, b))), (ct1, ct2))

    for name, (f, args) in variants.items():
        t0 = time.time()
        jax.block_until_ready(f(*args))
        print(json.dumps({"compiled": name, "s": round(time.time() - t0, 1)}),
              flush=True)

    print(json.dumps({"canary_after_warm_us": round(canary_latency() * 1e6)}),
          flush=True)
    inner = int(os.environ.get("PPLP_AB_INNER", "8"))
    t_end = time.time() + minutes * 60
    while time.time() < t_end:
        for name, (f, args) in variants.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(inner):
                out = f(*args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / inner
            print(json.dumps({
                "v": name, "ms": round(dt * 1e3, 2),
                "per_s": round(BATCH / dt, 1),
                "canary_us": round(canary_latency() * 1e6),
            }), flush=True)
        time.sleep(1.0)

    # Idle-recovery probe: does the in-process canary recover after sleeps?
    for idle in (5, 15, 30):
        time.sleep(idle)
        print(json.dumps({"idle_s": idle,
                          "canary_us": round(canary_latency() * 1e6)}),
              flush=True)


if __name__ == "__main__":
    main()
