"""BFV ct-ct multiply (BEHZ) + relinearization vs clear negacyclic oracle."""

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
from pplp_tpu.bfv.behz import RnsMultiplier, create_relin_keys, relinearize
from pplp_tpu.ops.primes import get_primes

pytestmark = pytest.mark.slow  # heavy module: excluded from the fast tier

N = 256
T = 1 << 16


def setup(seed=1):
    chain = get_primes(28, 2, N) + get_primes(27, 2, N)
    parms = EncryptionParameters.bfv(N, T, coeff_modulus=chain)
    ctx = BFVContext.build(parms)
    kg = KeyGenerator(ctx, seed)
    sk, pk = kg.secret_key(), kg.create_public_key()
    return ctx, sk, pk, kg


def negacyclic(a, b, mod):
    n = len(a)
    out = [0] * n
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            k = i + j
            if k < n:
                out[k] = (out[k] + ai * bj) % mod
            else:
                out[k - n] = (out[k - n] - ai * bj) % mod
    return out


def test_multiply_scalar_messages():
    ctx, sk, pk, _ = setup()
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    mul = RnsMultiplier(ctx)
    c1 = enc.encrypt(Plaintext(format(1234, "X")), jax.random.key(1))
    c2 = enc.encrypt(Plaintext(format(777, "X")), jax.random.key(2))
    prod = mul.multiply(c1, c2)
    assert prod.size == 3
    got = dec.decrypt(prod)
    assert int(got.to_string() or "0", 16) == (1234 * 777) % T


def test_multiply_poly_messages():
    ctx, sk, pk, _ = setup(2)
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    mul = RnsMultiplier(ctx)
    rng = np.random.default_rng(0)
    a = [int(v) for v in rng.integers(0, T, size=N)]
    b = [int(v) for v in rng.integers(0, T, size=N)]
    ca = enc.encrypt(Plaintext(a), jax.random.key(3))
    cb = enc.encrypt(Plaintext(b), jax.random.key(4))
    got = dec.decrypt(mul.multiply(ca, cb)).coeffs[:N]
    assert got == negacyclic(a, b, T)


def test_relinearize_and_chain():
    ctx, sk, pk, kg = setup(3)
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    ev = Evaluator(ctx)
    mul = RnsMultiplier(ctx)
    rlk = create_relin_keys(ctx, sk, jax.random.key(9))

    a, b = 321, 654
    ca = enc.encrypt(Plaintext(format(a, "X")), jax.random.key(5))
    cb = enc.encrypt(Plaintext(format(b, "X")), jax.random.key(6))
    prod3 = mul.multiply(ca, cb)
    prod2 = relinearize(ctx, prod3, rlk)
    assert prod2.size == 2
    assert int(dec.decrypt(prod2).to_string() or "0", 16) == (a * b) % T

    # Relinearized ciphertexts compose with the rest of the evaluator.
    summed = ev.add(prod2, ca)
    assert int(dec.decrypt(summed).to_string() or "0", 16) == (a * b + a) % T


def test_multiply_batched():
    ctx, sk, pk, _ = setup(4)
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    mul = RnsMultiplier(ctx)
    B = 3
    vals_a = [11, 222, 3333]
    vals_b = [7, 88, 999]

    def pairs(vals):
        import jax.numpy as jnp

        m = np.zeros((B, N), np.uint64)
        m[:, 0] = vals
        return (
            jnp.asarray((m & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((m >> np.uint64(32)).astype(np.uint32)),
        )

    ca = enc.encrypt_pairs(*pairs(vals_a), jax.random.key(7))
    cb = enc.encrypt_pairs(*pairs(vals_b), jax.random.key(8))
    prod = jax.jit(mul.multiply)(ca, cb)
    for i in range(B):
        one = jax.tree.map(lambda x: x[i], prod)
        got = dec.decrypt(one)
        assert int(got.to_string() or "0", 16) == (vals_a[i] * vals_b[i]) % T


def test_multiply_m62_seal_profile_chain():
    # ct-ct multiply + relinearization on a SEAL-style (44-bit prime) chain.
    chain = get_primes(44, 3, N)
    parms = EncryptionParameters.bfv(N, T, coeff_modulus=chain)
    ctx = BFVContext.build(parms)
    assert ctx.tables.profile == "m62"
    kg = KeyGenerator(ctx, 11)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    mul = RnsMultiplier(ctx)
    rlk = create_relin_keys(ctx, sk, jax.random.key(12))

    rng = np.random.default_rng(13)
    a = [int(v) for v in rng.integers(0, T, size=N)]
    b = [int(v) for v in rng.integers(0, T, size=N)]
    ca = enc.encrypt(Plaintext(a), jax.random.key(14))
    cb = enc.encrypt(Plaintext(b), jax.random.key(15))
    prod3 = mul.multiply(ca, cb)
    assert dec.decrypt(prod3).coeffs[:N] == negacyclic(a, b, T)
    prod2 = relinearize(ctx, prod3, rlk)
    assert dec.decrypt(prod2).coeffs[:N] == negacyclic(a, b, T)


def test_relinearize_wide_gadget():
    """Width-2 RNS gadget relin (round-4 perf lever: half the keyswitch
    NTTs): decrypts the product exactly, including an odd-L chain where the
    last digit is a single limb."""
    from pplp_tpu.bfv.behz import create_relin_keys_wide, relinearize_wide

    for nlimbs in (4, 3):
        chain = get_primes(28, 2, N) + get_primes(27, 2, N)
        parms = EncryptionParameters.bfv(N, T, coeff_modulus=chain[:nlimbs])
        ctx = BFVContext.build(parms)
        kg = KeyGenerator(ctx, 7 + nlimbs)
        sk, pk = kg.secret_key(), kg.create_public_key()
        enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
        mul = RnsMultiplier(ctx)
        rlk, groups = create_relin_keys_wide(ctx, sk, jax.random.key(11))
        assert len(groups) == (nlimbs + 1) // 2

        rng = np.random.default_rng(nlimbs)
        a = [int(v) for v in rng.integers(0, T, size=N)]
        b = [int(v) for v in rng.integers(0, T, size=N)]
        ca = enc.encrypt(Plaintext(a), jax.random.key(12))
        cb = enc.encrypt(Plaintext(b), jax.random.key(13))
        prod2 = relinearize_wide(ctx, mul.multiply(ca, cb), rlk, groups)
        assert prod2.size == 2
        assert dec.decrypt(prod2).coeffs[:N] == negacyclic(a, b, T)


def test_relinearize_grouped_m62_and_default_width():
    """ONE production relin config (round-5): create_relin_keys picks the
    noise-bounded gadget width per context, relinearize dispatches on the
    keys' groups — including the m62 profile's width-2 CRT lift; and the
    SEAL n=4096 chain must stay per-limb (a 2^73 digit overflows the
    budget)."""
    from pplp_tpu.bfv.behz import default_relin_width

    # m62 chain with room for width 2: 4 x ~40-bit primes, t=2^16.
    chain = get_primes(40, 4, N)
    parms = EncryptionParameters.bfv(N, T, coeff_modulus=chain)
    ctx = BFVContext.build(parms)
    assert ctx.tables.profile == "m62"
    assert default_relin_width(ctx) == 2
    kg = KeyGenerator(ctx, 21)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    mul = RnsMultiplier(ctx)
    rlk = create_relin_keys(ctx, sk, jax.random.key(31))
    assert rlk.groups == ((0, 1), (2, 3))

    rng = np.random.default_rng(41)
    a = [int(v) for v in rng.integers(0, T, size=N)]
    b = [int(v) for v in rng.integers(0, T, size=N)]
    ca = enc.encrypt(Plaintext(a), jax.random.key(42))
    cb = enc.encrypt(Plaintext(b), jax.random.key(43))
    prod2 = relinearize(ctx, mul.multiply(ca, cb), rlk)
    assert prod2.size == 2
    assert dec.decrypt(prod2).coeffs[:N] == negacyclic(a, b, T)

    # SEAL-profile n=4096-equivalent chain (36+36+37): width 2 would put
    # the keyswitch noise over Delta/2 -> the default must stay per-limb.
    from pplp_tpu.bfv.context import BFVContext as _Ctx

    chain_seal = get_primes(36, 2, N) + get_primes(37, 1, N)
    parms_seal = EncryptionParameters.bfv(N, T, coeff_modulus=chain_seal)
    ctx_seal = _Ctx.build(parms_seal)
    assert default_relin_width(ctx_seal) == 1
