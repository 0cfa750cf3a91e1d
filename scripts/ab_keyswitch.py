"""A/B: batched (stacked-digit) keyswitch vs current per-digit loop."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pplp_tpu.bfv import BFVContext, EncryptionParameters
from pplp_tpu.bfv import behz
from pplp_tpu.bfv.behz import RnsMultiplier, create_relin_keys, relinearize
from pplp_tpu.bfv.ciphertext import Ciphertext
from pplp_tpu.bfv.keys import KeyGenerator
from pplp_tpu.ops import ntt


def keyswitch_batched(ctx, poly, keys):
    """Stack the k gadget digits on a new axis and run ONE forward NTT."""
    p = ctx.prof
    tb = ctx.tables
    q2 = tb.q_b(1)
    k = ctx.L
    assert tb.profile == "m31"
    # digits: [..., k, 1, n] -> broadcast each |poly|_{q_i} into all L limbs.
    dig = poly[..., :, None, :]
    full = jnp.broadcast_to(dig, poly.shape[:-2] + (k, k, poly.shape[-1]))
    mu2 = tuple(m[:, None] for m in tb.mu)
    lifted = p.reduce64(full, jnp.zeros_like(full), tb.q[:, None], mu2[0], mu2[1])
    d_ntt = ntt.forward(lifted, tb)  # [..., k, L, n]
    t0 = p.mulmod_shoup(d_ntt, keys.k0, keys.k0_shoup, q2)
    t1 = p.mulmod_shoup(d_ntt, keys.k1, keys.k1_shoup, q2)
    acc0 = t0[..., 0, :, :]
    acc1 = t1[..., 0, :, :]
    for i in range(1, k):
        acc0 = p.add(acc0, t0[..., i, :, :], q2)
        acc1 = p.add(acc1, t1[..., i, :, :], q2)
    return ntt.inverse(acc0, tb), ntt.inverse(acc1, tb)


def relinearize_batched(ctx, ct, rlk):
    p = ctx.prof
    q2 = ctx.tables.q_b(1)
    c0, c1, c2 = ct.polys
    d0, d1 = keyswitch_batched(ctx, c2, rlk)
    return Ciphertext((p.add(c0, d0, q2), p.add(c1, d1, q2)), "coeff")


def main(n=4096, batch=256, iters=5):
    parms = EncryptionParameters.bfv(n, 1 << 16, profile="tpu")
    ctx = BFVContext.build(parms, engine="four")
    kg = KeyGenerator(ctx, 0)
    sk = kg.secret_key()
    rlk = create_relin_keys(ctx, sk, jax.random.key(1))
    mul = RnsMultiplier(ctx)
    print("L =", ctx.L)

    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]

    def ct_polys():
        def poly():
            v = rng.integers(0, 1 << 62, size=(batch, ctx.L, n)).astype(np.uint64) % qs
            return jnp.asarray(v.astype(np.uint32))

        return Ciphertext((poly(), poly()), "coeff")

    ct1, ct2 = ct_polys(), ct_polys()

    @jax.jit
    def mr_old(a, b):
        return relinearize(ctx, mul.multiply(a, b), rlk)

    @jax.jit
    def mr_new(a, b):
        return relinearize_batched(ctx, mul.multiply(a, b), rlk)

    o1 = mr_old(ct1, ct2)
    o2 = mr_new(ct1, ct2)
    jax.block_until_ready((o1, o2))
    same = all(
        bool(jnp.array_equal(x, y)) for x, y in zip(o1.polys, o2.polys)
    )
    print("numerics equal:", same)
    assert same

    for name, fn in (("old", mr_old), ("new", mr_new)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(ct1, ct2)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{name}: {batch / best:,.0f} mult+relin/s  ({best*1e3:.2f} ms/iter)")


if __name__ == "__main__":
    main()
