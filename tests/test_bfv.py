"""End-to-end BFV engine tests: roundtrip + homomorphism vs clear oracles."""

import numpy as np
import jax
import pytest

from pplp_tpu.bfv import (
    BFVContext,
    Decryptor,
    EncryptionParameters,
    Encryptor,
    Evaluator,
    KeyGenerator,
    Plaintext,
)
from pplp_tpu.ops.primes import get_primes

N = 256


def make_ctx(profile, t):
    if profile == "m31":
        chain = get_primes(28, 2, N) + get_primes(27, 1, N)
    else:
        chain = get_primes(44, 3, N)
    parms = EncryptionParameters.bfv(N, t, coeff_modulus=chain)
    return BFVContext.build(parms)


def roles(ctx, seed=1):
    kg = KeyGenerator(ctx, seed)
    sk = kg.secret_key()
    pk = kg.create_public_key()
    return Encryptor(ctx, pk), Evaluator(ctx), Decryptor(ctx, sk)


@pytest.mark.parametrize("profile", ["m31", "m62"])
def test_make_sk_pk_jit_matches_eager(profile):
    """The one-graph keygen (bench/profile path) is bit-identical to the
    eager KeyGenerator at the same seed."""
    from pplp_tpu.bfv.keys import make_sk_pk_jit

    ctx = make_ctx(profile, 1 << 16)
    kg = KeyGenerator(ctx, 7)
    sk_e, pk_e = kg.secret_key(), kg.create_public_key()
    sk_j, pk_j = make_sk_pk_jit(ctx, 7)
    for a, b in (
        (sk_e.s_ntt, sk_j.s_ntt),
        (pk_e.pk0_ntt, pk_j.pk0_ntt),
        (pk_e.pk1_ntt, pk_j.pk1_ntt),
        (pk_e.pk0_shoup, pk_j.pk0_shoup),
    ):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            assert (np.asarray(x) == np.asarray(y)).all()


@pytest.mark.parametrize("profile", ["m31", "m62"])
@pytest.mark.parametrize("t", [1 << 16, 65537])
def test_encrypt_decrypt_roundtrip(profile, t):
    ctx = make_ctx(profile, t)
    enc, _, dec = roles(ctx)
    rng = np.random.default_rng(0)
    coeffs = [int(v) for v in rng.integers(0, t, size=N)]
    pt = Plaintext(coeffs)
    ct = enc.encrypt(pt, jax.random.key(7))
    assert dec.decrypt(ct) == pt


@pytest.mark.parametrize("profile", ["m31", "m62"])
def test_homomorphic_ops(profile):
    t = 1 << 16
    ctx = make_ctx(profile, t)
    enc, ev, dec = roles(ctx)
    rng = np.random.default_rng(1)
    a = [int(v) for v in rng.integers(0, t, size=N)]
    b = [int(v) for v in rng.integers(0, t, size=N)]
    ca = enc.encrypt(Plaintext(a), jax.random.key(2))
    cb = enc.encrypt(Plaintext(b), jax.random.key(3))

    assert dec.decrypt(ev.add(ca, cb)).coeffs[:N] == [(x + y) % t for x, y in zip(a, b)]
    assert dec.decrypt(ev.sub(ca, cb)).coeffs[:N] == [(x - y) % t for x, y in zip(a, b)]
    assert dec.decrypt(ev.negate(ca)).coeffs[:N] == [(-x) % t for x in a]
    assert dec.decrypt(ev.add_plain(ca, Plaintext(b))).coeffs[:N] == [
        (x + y) % t for x, y in zip(a, b)
    ]
    assert dec.decrypt(ev.sub_plain(ca, Plaintext(b))).coeffs[:N] == [
        (x - y) % t for x, y in zip(a, b)
    ]


@pytest.mark.parametrize("profile", ["m31", "m62"])
def test_multiply_plain_scalar_and_poly(profile):
    # The protocol's hot op: ct * plaintext (demo.cc:155-159 equivalents).
    t = 1 << 16
    ctx = make_ctx(profile, t)
    enc, ev, dec = roles(ctx)
    rng = np.random.default_rng(4)
    a = [int(v) for v in rng.integers(0, t, size=N)]
    ca = enc.encrypt(Plaintext(a), jax.random.key(5))

    # Scalar multiply (constant poly).
    s = 12345
    got = dec.decrypt(ev.multiply_plain(ca, Plaintext(format(s, "X")))).coeffs[:N]
    assert got == [x * s % t for x in a]

    # Small general poly: negacyclic convolution oracle.
    m = [3, 0, 7] + [0] * (N - 3)
    got = dec.decrypt(ev.multiply_plain(ca, Plaintext(m))).coeffs[:N]
    ref = [0] * N
    for i, ai in enumerate(a):
        for j, mj in enumerate(m[:3]):
            k = i + j
            if k < N:
                ref[k] = (ref[k] + ai * mj) % t
            else:
                ref[k - N] = (ref[k - N] - ai * mj) % t
    assert got == ref


def test_hex_plaintext_protocol_path():
    # uint64 -> hex -> Plaintext -> encrypt -> decrypt -> to_string -> uint64,
    # the exact client/demo path (demo.cc:134-168).
    t = 1 << 56
    ctx = make_ctx("m62", t)
    enc, ev, dec = roles(ctx)
    u = 123456789
    pt = Plaintext(format(u, "X"))
    ct = enc.encrypt(pt, jax.random.key(11))
    out = dec.decrypt(ct)
    assert int(out.to_string(), 16) == u

    # Blind-distance pipeline on scalars: s*(u + z - 2xa*xb - 2ya*yb) + s*r.
    xa, ya, xb, yb = 1234, 1212, 1000, 1000
    s_blind, r_blind = 0xDEAD, 0xBEEF
    c1 = enc.encrypt(Plaintext(format(xa * xa + ya * ya, "X")), jax.random.key(12))
    c2 = enc.encrypt(Plaintext(format(2 * xa, "X")), jax.random.key(13))
    c3 = enc.encrypt(Plaintext(format(2 * ya, "X")), jax.random.key(14))
    c1 = ev.add_plain(c1, Plaintext(format(xb * xb + yb * yb, "X")))
    c2 = ev.multiply_plain(c2, Plaintext(format(xb, "X")))
    c3 = ev.multiply_plain(c3, Plaintext(format(yb, "X")))
    c2 = ev.add(c2, c3)
    c1 = ev.sub(c1, c2)
    c1 = ev.multiply_plain(c1, Plaintext(format(s_blind, "X")))
    c1 = ev.add_plain(c1, Plaintext(format(s_blind * r_blind, "X")))
    bd = int(dec.decrypt(c1).to_string(), 16)
    d2 = (xa - xb) ** 2 + (ya - yb) ** 2
    assert bd == (s_blind * (d2 + r_blind)) % t


@pytest.mark.slow
def test_batch_encoder_simd():
    # Prime t = 1 mod 2n: slot-wise add via evaluator add, slot-wise product
    # via ct-ct multiply (SEAL BatchEncoder capability).
    from pplp_tpu.bfv.batch_encoder import BatchEncoder
    from pplp_tpu.bfv.behz import RnsMultiplier
    from pplp_tpu.ops.primes import get_primes

    t = get_primes(20, 1, N)[0]  # 20-bit prime = 1 mod 2N
    ctx = make_ctx("m31", t)
    enc, ev, dec = roles(ctx, seed=9)
    be = BatchEncoder(ctx)
    assert be.slot_count == N

    rng = np.random.default_rng(2)
    a = [int(v) for v in rng.integers(0, t, size=N)]
    b = [int(v) for v in rng.integers(0, t, size=N)]
    pa, pb = be.encode(a), be.encode(b)
    assert be.decode(pa) == a  # roundtrip

    ca = enc.encrypt(pa, jax.random.key(30))
    cb = enc.encrypt(pb, jax.random.key(31))
    got_sum = be.decode(dec.decrypt(ev.add(ca, cb)))
    assert got_sum == [(x + y) % t for x, y in zip(a, b)]

    mul = RnsMultiplier(ctx)
    got_prod = be.decode(dec.decrypt(mul.multiply(ca, cb)))
    assert got_prod == [(x * y) % t for x, y in zip(a, b)]


@pytest.mark.slow
def test_batch_encoder_m62_chain():
    """SIMD batching works on m62 (SEAL-style) ciphertext chains: the encoder
    only needs prime t = 1 mod 2n; the chain profile is independent."""
    import jax
    from pplp_tpu.bfv.batch_encoder import BatchEncoder
    from pplp_tpu.ops.primes import get_primes

    n, t = 256, 65537  # 2n | t-1
    ctx = make_m62_ctx_for_batching(n, t)
    enc_b = BatchEncoder(ctx)
    kg = KeyGenerator(ctx, 71)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    vals = [(7 * i + 3) % t for i in range(n)]
    pt = enc_b.encode(vals)
    ct = enc.encrypt(pt, jax.random.key(72))
    out = enc_b.decode(dec.decrypt(ct))
    assert [int(v) for v in out] == vals


def make_m62_ctx_for_batching(n, t):
    from pplp_tpu.ops.primes import get_primes

    chain = get_primes(36, 3, n)
    return make_ctx_from_chain(n, t, chain)


def make_ctx_from_chain(n, t, chain):
    from pplp_tpu.bfv import BFVContext, EncryptionParameters

    ctx = BFVContext.build(EncryptionParameters.bfv(n, t, coeff_modulus=chain))
    assert ctx.tables.profile == "m62"
    return ctx
