"""Round-5 A/B: Montgomery CIOS formulations for the DGK 2048-bit pipeline.

Variants (all exact, same REDC math):
  digit   — round-4 production: lax.scan over D digits, shift-by-1 concat
  block   — offset-write block CIOS (scan over D/W blocks, updates at lane
            offsets w..w+D) — first round-5 attempt, measured -4%
  unroll  — the digit step body unrolled W x inside one scan step (same
            aligned [:D] updates + per-digit concat shift, 1/W the scan
            carry traffic)

Chained-slope timing on a [B, D] mont_mul chain (the powmod inner loop's
shape), interleaved across variants.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from pplp_tpu.dgk.modexp import DIGIT_BITS, MASK, MontgomeryCtx, to_digits  # noqa: E402
from pplp_tpu.utils.chipstate import enable_compile_cache, fresh_canary_us  # noqa: E402

enable_compile_cache()


def log(o):
    print(json.dumps(o), flush=True)


def make_variants(mc, B):
    D = mc.D
    n = mc.n
    npr = mc.n_prime

    def step_old(t, a_i):
        B_shape = t.shape[:-1]
        a_i = a_i.reshape(B_shape + (1,))
        p = a_i * b_const
        t = t.at[..., :D].add(p & MASK)
        t = t.at[..., 1:].add(p >> DIGIT_BITS)
        m = (t[..., 0] * npr) & MASK
        q = m[..., None] * n
        t = t.at[..., :D].add(q & MASK)
        t = t.at[..., 1:].add(q >> DIGIT_BITS)
        carry = t[..., 0] >> DIGIT_BITS
        t = jnp.concatenate(
            [t[..., 1:], jnp.zeros(B_shape + (1,), jnp.uint32)], axis=-1
        )
        return t.at[..., 0].add(carry)

    b_const = None  # bound per-call below

    def finish(mc, t):
        t = mc._normalize(t)
        return mc._cond_sub_n(t[..., :D])

    def mont_digit(a, b):
        nonlocal b_const
        b_const = b
        t = jnp.zeros(a.shape[:-1] + (D + 1,), jnp.uint32)
        a_cols = jnp.moveaxis(a, -1, 0)
        t, _ = jax.lax.scan(lambda t, ai: (step_old(t, ai), None), t, a_cols)
        return finish(mc, t)

    def mont_unroll(a, b, W=8):
        nonlocal b_const
        b_const = b
        t = jnp.zeros(a.shape[:-1] + (D + 1,), jnp.uint32)
        a_cols = jnp.moveaxis(a, -1, 0)
        nb, tail = D // W, D % W

        def blk(t, ablk):
            for w in range(W):
                t = step_old(t, ablk[w])
            return t, None

        if nb:
            t, _ = jax.lax.scan(blk, t, a_cols[: nb * W].reshape((nb, W) + a.shape[:-1]))
        for i in range(tail):
            t = step_old(t, a_cols[nb * W + i])
        return finish(mc, t)

    def step_fused(t, a_i):
        """Shift-by-1 CIOS step with NO scatter updates: the new t is one
        fused expression of aligned concats+adds (a single output sweep if
        XLA fuses), vs ~8 materialized .at[] updates in step_old."""
        B_shape = t.shape[:-1]
        p = a_i.reshape(B_shape + (1,)) * b_const          # [B, D]
        m = ((t[..., 0] + (p[..., 0] & MASK)) * npr) & MASK
        q = m[..., None] * n                               # [B, D]
        lo = (p & MASK) + (q & MASK)
        hi = (p >> DIGIT_BITS) + (q >> DIGIT_BITS)
        carry = (t[..., 0] + lo[..., 0]) >> DIGIT_BITS
        z1 = jnp.zeros(B_shape + (1,), jnp.uint32)
        shifted_t = jnp.concatenate([t[..., 1:], z1], -1)
        lo_sh = jnp.concatenate([lo[..., 1:], z1, z1], -1)
        hi_al = jnp.concatenate([hi, z1], -1)
        c0 = jnp.concatenate(
            [carry[..., None], jnp.zeros(B_shape + (D,), jnp.uint32)], -1
        )
        return shifted_t + lo_sh + hi_al + c0

    def mont_fused(a, b, W=8):
        nonlocal b_const
        b_const = b
        t = jnp.zeros(a.shape[:-1] + (D + 1,), jnp.uint32)
        a_cols = jnp.moveaxis(a, -1, 0)
        nb, tail = D // W, D % W

        def blk(t, ablk):
            for w in range(W):
                t = step_fused(t, ablk[w])
            return t, None

        if nb:
            t, _ = jax.lax.scan(blk, t, a_cols[: nb * W].reshape((nb, W) + a.shape[:-1]))
        for i in range(tail):
            t = step_fused(t, a_cols[nb * W + i])
        return finish(mc, t)

    return {
        "digit": mont_digit,
        "block": mc.mont_mul,
        "unroll": mont_unroll,
        "fused": mont_fused,
    }


def main():
    import random

    rng = random.Random(1)
    nbits, B = 2048, 10000
    nmod = rng.getrandbits(nbits) | (1 << (nbits - 1)) | 1
    mc = MontgomeryCtx.build(nmod)
    a = [rng.randrange(nmod) for _ in range(B)]
    c = rng.randrange(nmod)
    A = jnp.asarray(to_digits(a, mc.D))
    C = jnp.asarray(to_digits([c], mc.D))
    variants = make_variants(mc, B)

    # correctness spot check (first 4 lanes, one product)
    from pplp_tpu.dgk.modexp import from_digits

    for name, f in variants.items():
        got = from_digits(np.asarray(jax.jit(f)(A, C))[:4])
        want = [(x * c * pow(1 << (16 * mc.D), -1, nmod)) % nmod for x in a[:4]]
        assert got == want, name
    log({"correct": True, "fresh_canary_us": fresh_canary_us()})

    probe = jax.jit(lambda x: x[:4, :4].sum())
    fns = {k: jax.jit(f) for k, f in variants.items()}
    results = {k: [] for k in fns}
    for rep in range(5):
        for name, f in fns.items():
            ts = {}
            for inner in (4, 16):
                z = A
                t0 = time.perf_counter()
                for _ in range(inner):
                    z = f(z, C)
                int(probe(z))
                ts[inner] = time.perf_counter() - t0
            results[name].append((ts[16] - ts[4]) / 12)
        time.sleep(0.2)
    out = {}
    for name, slopes in results.items():
        slopes.sort()
        out[name] = {
            "ms_best": round(slopes[0] * 1e3, 2),
            "ms_median": round(slopes[len(slopes) // 2] * 1e3, 2),
        }
    out["fresh_canary_us"] = fresh_canary_us()
    log(out)


if __name__ == "__main__":
    main()
