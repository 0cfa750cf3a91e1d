"""CKKS encoder/encrypt/add/decrypt and the aggregation demo."""

import numpy as np
import jax

from pplp_tpu.bfv.keys import KeyGenerator
from pplp_tpu.ckks import (
    CKKSContext,
    CKKSEncoder,
    ckks_add,
    ckks_decrypt,
    ckks_encrypt,
    run_aggregation_demo,
)

N = 1024


def ctx_small():
    return CKKSContext.build(n=N, scale=float(1 << 26))


def test_encode_decode_roundtrip():
    ctx = ctx_small()
    enc = CKKSEncoder(ctx)
    rng = np.random.default_rng(0)
    z = rng.normal(size=ctx.slots) + 1j * rng.normal(size=ctx.slots)
    back = enc.decode(enc.encode(z).astype(np.float64))
    assert np.max(np.abs(back - z)) < 1e-4


def test_encrypt_decrypt_and_add():
    ctx = ctx_small()
    enc = CKKSEncoder(ctx)
    kg = KeyGenerator(ctx.base, 1)
    sk, pk = kg.secret_key(), kg.create_public_key()
    a = np.array([1.5, -2.25, 3.0, 100.125])
    b = np.array([10.0, 20.0, -30.5, 0.25])
    ca = ckks_encrypt(ctx, pk, enc.coeffs_to_rns(enc.encode(a)), jax.random.key(2))
    cb = ckks_encrypt(ctx, pk, enc.coeffs_to_rns(enc.encode(b)), jax.random.key(3))
    got = enc.decode(ckks_decrypt(ctx, sk, ckks_add(ctx, ca, cb)).astype(np.float64))
    assert np.max(np.abs(np.real(got[:4]) - (a + b))) < 1e-3


def test_aggregation_demo():
    res = run_aggregation_demo(values=[23.0, 41.5, 35.0, 58.25], n=N, verbose=False)
    assert res.abs_error < 1e-2
    assert res.true_sum == 157.75
