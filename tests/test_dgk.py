"""DGK subsystem tests: provable primes, keygen, enc/dec, PH dlog, protocol."""

import random

import pytest

from pplp_tpu.dgk import dgk_decrypt, dgk_encrypt, dgk_gen_keys, gdsa_prime, maurer, prime_prod
from pplp_tpu.dgk.dgk import dgk_random_num
from pplp_tpu.dgk.ph import bsgs, crt_solve, factorize, pohlig_hellman
from pplp_tpu.dgk.protocol import dgk_example, pplp_dgk, dgk_sweep_main
from pplp_tpu.ops.primes import is_prime

K, T, L = 512, 64, 12  # small-but-real params for CI speed


@pytest.fixture(scope="module")
def keys():
    return dgk_gen_keys(K, T, L, seed=7)


def test_maurer_provable_primes():
    rng = random.Random(1)
    for bits in (16, 24, 48, 80):
        p = maurer(bits, rng)
        assert p.bit_length() == bits
        assert is_prime(p)


def test_prime_prod_and_gdsa():
    rng = random.Random(2)
    q = maurer(40, rng)
    p = gdsa_prime(q, 160, rng)
    assert is_prime(p)
    assert (p - 1) % q == 0
    assert p.bit_length() >= 159
    assert prime_prod(64).bit_length() >= 64


def test_keygen_structure(keys):
    priv, pub = keys
    assert priv.n == priv.p * priv.q == pub.n
    assert (priv.p - 1) % (pub.u * priv.vp) == 0
    assert (priv.q - 1) % (pub.u * priv.vq) == 0
    # h has order dividing vp*vq (and not 1); g^vpq has order u.
    assert pow(pub.h, priv.vpq, pub.n) == 1
    gv = pow(pub.g, priv.vpq, pub.n)
    assert gv != 1 and pow(gv, pub.u, pub.n) == 1


def test_encrypt_decrypt_roundtrip(keys):
    priv, pub = keys
    rng = random.Random(3)
    for _ in range(16):
        m = rng.randrange(0, pub.u)
        c = dgk_encrypt(pub, m, dgk_random_num(2 * T, rng))
        assert dgk_decrypt(priv, c) == m


def test_additive_homomorphism(keys):
    priv, pub = keys
    rng = random.Random(4)
    m1, m2, k_scal = 123, 456, 17
    c1 = dgk_encrypt(pub, m1, dgk_random_num(2 * T, rng))
    c2 = dgk_encrypt(pub, m2, dgk_random_num(2 * T, rng))
    assert dgk_decrypt(priv, c1 * c2 % pub.n) == (m1 + m2) % pub.u
    assert dgk_decrypt(priv, pow(c1, k_scal, pub.n)) == (m1 * k_scal) % pub.u


def test_pohlig_hellman_decrypt_path(keys):
    priv, pub = keys
    rng = random.Random(5)
    gv = pow(pub.g, priv.vpq, priv.n)
    for m in (0, 1, 77, pub.u - 1):
        c = dgk_encrypt(pub, m, dgk_random_num(2 * T, rng))
        cv = pow(c, priv.vpq, priv.n)
        assert pohlig_hellman(gv, cv, priv.n, pub.u) == m


def test_ph_unit_helpers():
    # BSGS in a known group: 2 is a generator mod 101 (order 100).
    p = 101
    for x in (0, 1, 5, 57, 99):
        h = pow(2, x, p)
        assert pohlig_hellman(2, h, p, 100) == x
    assert factorize(100) == {2: 2, 5: 2}
    assert crt_solve([2, 3], [3, 5]) == 8
    assert bsgs(2, pow(2, 9, 101), 101, 100) == 9


def test_dgk_example_smoke():
    assert dgk_example(k=K, t=T, l=L, seed=11)


def test_pplp_dgk_protocol(keys):
    # Message space u is a 12-bit prime (>= 2048). Keep r^2 and d^2 below u
    # so the mod-u reduction cannot wrap: the reference's own benchmark at
    # l=16 runs radii whose r^2 >> u, where every probe collides mod u and
    # the printed verdict is vacuously "near" (timing-only benchmark).
    near = pplp_dgk(radius=44, xa=100, ya=100, xb=140, yb=110,
                    k=K, t=T, l=L, seed=8, keys=keys)
    assert near.is_near  # d^2 = 1700 < 44^2 = 1936 < u
    far = pplp_dgk(radius=31, xa=100, ya=100, xb=140, yb=120,
                   k=K, t=T, l=L, seed=9, keys=keys)
    assert not far.is_near  # d^2 = 2000 > 961, and 2000 < u (no wrap)


def test_dgk_sweep_csv(tmp_path, keys):
    f = tmp_path / "dgk_measure.csv"
    dgk_sweep_main(str(f), radii=[16, 32], seed=10, k=K, t=T, l=L, keys=keys)
    lines = f.read_text().strip().split("\n")
    assert lines[0].startswith("radius ,d_AkGen,d_ApreClac,")
    assert len(lines) == 3


def test_dgk_key_serialization(keys):
    from pplp_tpu.dgk.dgk import load_dgk_keys, save_dgk_keys

    priv, pub = keys
    blob = save_dgk_keys(priv, pub)
    priv2, pub2 = load_dgk_keys(blob)
    assert pub2 == pub
    assert priv2.vpq == priv.vpq and priv2.p == priv.p
    rng = random.Random(6)
    m = 123
    c = dgk_encrypt(pub2, m, dgk_random_num(2 * T, rng))
    assert dgk_decrypt(priv2, c) == m
    # Public-only form omits the secret.
    _none, pub3 = load_dgk_keys(save_dgk_keys(None, pub))
    assert _none is None and pub3 == pub
