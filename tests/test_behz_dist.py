"""Distributed BEHZ multiply+relin: bit-exact vs single device on the
8-device virtual CPU mesh (BASELINE.md multi-host row; VERDICT r1 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

pytestmark = pytest.mark.slow  # heavy module: excluded from the fast tier

from pplp_tpu.bfv import BFVContext, EncryptionParameters
from pplp_tpu.bfv.behz import RnsMultiplier, create_relin_keys, relinearize
from pplp_tpu.bfv.ciphertext import Ciphertext
from pplp_tpu.bfv.keys import KeyGenerator
from pplp_tpu.ops.primes import get_primes
from pplp_tpu.parallel.behz_dist import DistMultiplier


def _ctx(n, nq=3):
    parms = EncryptionParameters.bfv(
        n, 1 << 16, coeff_modulus=get_primes(28, nq, n)
    )
    return BFVContext.build(parms, engine="four")


def _random_ct(ctx, batch, seed):
    rng = np.random.default_rng(seed)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]

    def poly():
        v = rng.integers(0, 1 << 62, size=(batch, ctx.L, ctx.n)).astype(
            np.uint64
        ) % qs
        return jnp.asarray(v.astype(np.uint32))

    return Ciphertext((poly(), poly()), "coeff")


def _assert_bitexact(a: Ciphertext, b: Ciphertext):
    for w, g in zip(a.polys, b.polys):
        assert np.array_equal(np.asarray(w), np.asarray(g))


def test_dist_multiply_relin_coeff8_bitexact():
    ctx = _ctx(4096)
    kg = KeyGenerator(ctx, 31)
    rlk = create_relin_keys(ctx, kg.secret_key(), jax.random.key(2))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("coeff",))
    dist = DistMultiplier(ctx, rlk, mesh)
    mul = RnsMultiplier(ctx)

    ct1, ct2 = _random_ct(ctx, 2, 7), _random_ct(ctx, 2, 8)
    want = relinearize(ctx, mul.multiply(ct1, ct2), rlk)
    got = dist.multiply_relinearize(ct1, ct2)
    _assert_bitexact(want, got)


def test_dist_multiply_relin_dp2_coeff4():
    ctx = _ctx(4096)
    kg = KeyGenerator(ctx, 37)
    rlk = create_relin_keys(ctx, kg.secret_key(), jax.random.key(4))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "coeff"))
    dist = DistMultiplier(ctx, rlk, mesh, batch_axis="dp")
    mul = RnsMultiplier(ctx)

    ct1, ct2 = _random_ct(ctx, 4, 9), _random_ct(ctx, 4, 10)
    want = relinearize(ctx, mul.multiply(ct1, ct2), rlk)
    got = dist.multiply_relinearize(ct1, ct2)
    _assert_bitexact(want, got)


def test_dist_multiply_relin_n32768():
    """The BASELINE.md flagship shape: n=32768 mult+relin, coeff-sharded."""
    ctx = _ctx(32768)
    kg = KeyGenerator(ctx, 41)
    sk = kg.secret_key()
    rlk = create_relin_keys(ctx, sk, jax.random.key(6))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("coeff",))
    dist = DistMultiplier(ctx, rlk, mesh)
    mul = RnsMultiplier(ctx)

    ct1, ct2 = _random_ct(ctx, 1, 11), _random_ct(ctx, 1, 12)
    want = relinearize(ctx, mul.multiply(ct1, ct2), rlk)
    got = dist.multiply_relinearize(ct1, ct2)
    _assert_bitexact(want, got)
