"""Batched DGK device path vs the scalar host implementation."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from pplp_tpu.dgk import dgk_decrypt, dgk_encrypt, dgk_gen_keys
from pplp_tpu.dgk.batched import DGKBatch
from pplp_tpu.dgk.dgk import dgk_random_num
from pplp_tpu.dgk.modexp import MontgomeryCtx, exp_to_bits, from_digits, to_digits

pytestmark = pytest.mark.slow  # heavy module: excluded from the fast tier

K, T, L = 512, 64, 12


@pytest.fixture(scope="module")
def keys():
    return dgk_gen_keys(K, T, L, seed=7)


def test_montgomery_vs_python_pow():
    rng = random.Random(1)
    n = (rng.getrandbits(384) | (1 << 383)) | 1
    mc = MontgomeryCtx.build(n)
    a = [rng.randrange(0, n) for _ in range(4)]
    e = [rng.getrandbits(96) for _ in range(4)]
    got = from_digits(
        mc.powmod(jnp.asarray(to_digits([3], mc.D)), jnp.asarray(exp_to_bits(e, 96)))
    )
    assert got == [pow(3, x, n) for x in e]
    got = from_digits(mc.powmod_shared_exp(jnp.asarray(to_digits(a, mc.D)), 12345))
    assert got == [pow(x, 12345, n) for x in a]
    got = from_digits(
        mc.mulmod(jnp.asarray(to_digits(a, mc.D)), jnp.asarray(to_digits(a[::-1], mc.D)))
    )
    assert got == [x * y % n for x, y in zip(a, a[::-1])]


def test_batch_encrypt_decrypt_matches_scalar(keys):
    priv, pub = keys
    rng = random.Random(2)
    batch = DGKBatch.build(pub)
    B = 16
    ms = [rng.randrange(0, pub.u) for _ in range(B)]
    rs = [dgk_random_num(2 * T, rng) for _ in range(B)]
    cts = batch.encrypt_batch(ms, rs)
    # Ciphertexts equal the scalar implementation's, value for value.
    scalar = [dgk_encrypt(pub, m, r) for m, r in zip(ms, rs)]
    assert from_digits(np.asarray(cts)) == scalar
    # Batch decrypt recovers everything.
    assert batch.decrypt_batch(priv, cts) == ms


def test_batched_blind_distance_pipeline(keys):
    priv, pub = keys
    rng = random.Random(3)
    batch = DGKBatch.build(pub)
    u = pub.u
    B = 8
    xb, yb, s_blind, r_blind = 140, 110, 37, 15
    xa = [rng.randrange(0, 60) for _ in range(B)]
    ya = [rng.randrange(0, 60) for _ in range(B)]

    rs = lambda: [dgk_random_num(2 * T, rng) for _ in range(B)]
    c1 = batch.encrypt_batch([(x * x + y * y) % u for x, y in zip(xa, ya)], rs())
    c2 = batch.encrypt_batch([(-2 * x) % u for x in xa], rs())
    c3 = batch.encrypt_batch([(-2 * y) % u for y in ya], rs())
    cz = batch.encrypt_batch([(s_blind * (xb * xb + yb * yb)) % u] * B, rs())
    cr = batch.encrypt_batch([(s_blind * r_blind) % u] * B, rs())

    out = batch.blind_distance_batch(c1, c2, c3, xb, yb, s_blind, cz, cr)
    got = batch.decrypt_batch(priv, out)
    for j in range(B):
        d2 = (xa[j] - xb) ** 2 + (ya[j] - yb) ** 2
        assert got[j] == (s_blind * (d2 + r_blind)) % u


def test_device_decrypt_table():
    """Device fingerprint-table decrypt matches the host hash-map path."""
    import jax
    from pplp_tpu.dgk import dgk_gen_keys
    from pplp_tpu.dgk.batched import DGKBatch, DGKDeviceTable
    from pplp_tpu.dgk.dgk import dgk_random_num
    import random

    priv, pub = dgk_gen_keys(K, T, 8, seed=11)
    db = DGKBatch.build(pub)
    dtab = db.build_device_table(priv)
    rng = random.Random(1)
    ms = [rng.randrange(0, pub.u) for _ in range(64)]
    rs = [dgk_random_num(2 * 160, rng) for _ in range(64)]
    cts = db.encrypt_batch(ms, rs)
    host = db.decrypt_batch(priv, cts)
    dev = [int(v) for v in jax.device_get(db.decrypt_batch_device(priv, dtab, cts))]
    assert host == ms
    assert dev == ms


def test_device_decrypt_bsgs(keys):
    """O(sqrt(u))-table device BSGS decrypt matches the hash-map path."""
    import jax
    from pplp_tpu.dgk.batched import DGKBatch
    from pplp_tpu.dgk.dgk import dgk_random_num
    import random

    priv, pub = keys
    db = DGKBatch.build(pub)
    btab = db.build_bsgs_table(priv)
    rng = random.Random(3)
    ms = [rng.randrange(0, pub.u) for _ in range(32)]
    rs = [dgk_random_num(2 * T, rng) for _ in range(32)]
    cts = db.encrypt_batch(ms, rs)
    dev = [int(v) for v in jax.device_get(db.decrypt_batch_device_bsgs(priv, btab, cts))]
    assert dev == ms
