"""CKKS encoder/encrypt/add/decrypt and the aggregation demo."""

import pytest
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

pytestmark = pytest.mark.slow  # heavy module: excluded from the fast tier

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


def test_networked_aggregation_pair():
    # Two-process-shaped CKKS aggregation over a socketpair (reference C7's
    # client/server split on our framed transport).
    import socket
    import threading

    from pplp_tpu.ckks.netmain import run_aggregation_keyholder, run_aggregation_server
    from pplp_tpu.protocol.transport import Channel

    a, b = socket.socketpair()
    ca, cb = Channel(a), Channel(b)
    values = [18.0, 33.5, 60.25]
    out = {}

    def server():
        run_aggregation_server(cb, n_values=len(values))

    th = threading.Thread(target=server)
    th.start()
    total = run_aggregation_keyholder(ca, values, n=N, scale=float(1 << 26), seed=4)
    th.join(timeout=60)
    assert abs(total - sum(values)) < 1e-2
    ca.close()
    cb.close()


def test_ckks_multiply_rescale():
    from pplp_tpu.ckks.ckks import (
        ckks_create_relin_keys,
        ckks_multiply,
        ckks_rescale,
        restrict_secret_key,
    )
    from pplp_tpu.ops.primes import get_primes

    chain = get_primes(28, 4, N)
    ctx = CKKSContext.build(n=N, scale=float(1 << 26), coeff_modulus=chain)
    enc = CKKSEncoder(ctx)
    kg = KeyGenerator(ctx.base, 2)
    sk, pk = kg.secret_key(), kg.create_public_key()
    rlk = ckks_create_relin_keys(ctx, sk, jax.random.key(3))

    a = np.array([1.5, -2.0, 3.25, 0.5])
    b = np.array([2.0, 4.0, -1.0, 8.0])
    ca = ckks_encrypt(ctx, pk, enc.coeffs_to_rns(enc.encode(a)), jax.random.key(4))
    cb = ckks_encrypt(ctx, pk, enc.coeffs_to_rns(enc.encode(b)), jax.random.key(5))

    prod = ckks_multiply(ctx, ca, cb, rlk=rlk)
    ctx2, prod2 = ckks_rescale(ctx, prod)
    assert ctx2.base.L == 3
    assert abs(ctx2.scale - (1 << 52) / chain[-1]) < 1
    sk2 = restrict_secret_key(ctx2, sk)
    enc2 = CKKSEncoder(ctx2)
    got = enc2.decode(ckks_decrypt(ctx2, sk2, prod2).astype(np.float64))
    assert np.max(np.abs(np.real(got[:4]) - a * b)) < 2e-2
