"""NTT engine dispatch: four-step + Pallas(interpret) engines drive the full
BFV stack, and keys serialize engine-independently (coefficient domain)."""

import jax
import numpy as np
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
from pplp_tpu.bfv.serialize import (
    load_public_key,
    load_secret_key,
    save_public_key,
    save_secret_key,
)
from pplp_tpu.ops import ntt
from pplp_tpu.ops.primes import Modulus, get_primes

pytestmark = pytest.mark.slow  # heavy module: excluded from the fast tier

N = 256
T = 1 << 16


def parms():
    return EncryptionParameters.bfv(
        N, T, coeff_modulus=get_primes(28, 2, N) + get_primes(27, 1, N)
    )


@pytest.mark.parametrize("engine", ["four"])
def test_bfv_roundtrip_on_engine(engine):
    ctx = BFVContext.build(parms(), engine=engine)
    kg = KeyGenerator(ctx, 1)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc, dec, ev = Encryptor(ctx, pk), Decryptor(ctx, sk), Evaluator(ctx)
    rng = np.random.default_rng(0)
    a = [int(v) for v in rng.integers(0, T, size=N)]
    ct = enc.encrypt(Plaintext(a), jax.random.key(2))
    assert dec.decrypt(ct).coeffs[:N] == a
    prod = ev.multiply_plain(ct, Plaintext(format(321, "X")))
    assert dec.decrypt(prod).coeffs[:N] == [x * 321 % T for x in a]


def test_cross_engine_key_transfer():
    ctx_a = BFVContext.build(parms(), engine="stage")
    ctx_b = BFVContext.build(parms(), engine="four")
    kg = KeyGenerator(ctx_a, 3)
    sk, pk = kg.secret_key(), kg.create_public_key()
    pk_b = load_public_key(save_public_key(pk, ctx_a), ctx_b)
    sk_b = load_secret_key(save_secret_key(sk, ctx_a), ctx_b)
    enc_b = Encryptor(ctx_b, pk_b)
    dec_b = Decryptor(ctx_b, sk_b)
    pt = Plaintext(format(42424, "X"))  # < t
    ct = enc_b.encrypt(pt, jax.random.key(4))
    assert int(dec_b.decrypt(ct).to_string(), 16) == 42424


def test_multiply_on_four_engine():
    from pplp_tpu.bfv.behz import RnsMultiplier, create_relin_keys, relinearize

    ctx = BFVContext.build(parms(), engine="four")
    kg = KeyGenerator(ctx, 5)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    mul = RnsMultiplier(ctx)
    rlk = create_relin_keys(ctx, sk, jax.random.key(6))
    ca = enc.encrypt(Plaintext(format(111, "X")), jax.random.key(7))
    cb = enc.encrypt(Plaintext(format(222, "X")), jax.random.key(8))
    out = relinearize(ctx, mul.multiply(ca, cb), rlk)
    assert int(dec.decrypt(out).to_string(), 16) == (111 * 222) % T


def test_evaluator_multiply_add_many():
    """Evaluator.multiply/relinearize/add_many convenience surface."""
    import jax
    from pplp_tpu.bfv import (
        BFVContext, Decryptor, EncryptionParameters, Encryptor, Evaluator,
        KeyGenerator, Plaintext,
    )
    from pplp_tpu.ops.primes import get_primes

    n, t = 256, 1 << 16
    chain = get_primes(28, 2, n) + get_primes(27, 2, n)
    ctx = BFVContext.build(EncryptionParameters.bfv(n, t, coeff_modulus=chain))
    kg = KeyGenerator(ctx, 4)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc, dec, ev = Encryptor(ctx, pk), Decryptor(ctx, sk), Evaluator(ctx)
    cts = [
        enc.encrypt(Plaintext(format(v, "X")), jax.random.key(40 + i))
        for i, v in enumerate([11, 22, 33, 44, 55])
    ]
    total = dec.decrypt(ev.add_many(cts))
    assert int(total.to_string() or "0", 16) == 11 + 22 + 33 + 44 + 55

    from pplp_tpu.bfv.keyswitch import create_sp_relin_keys

    spk = create_sp_relin_keys(ctx, kg, jax.random.key(9))
    prod = ev.relinearize(ev.multiply(cts[0], cts[1]), spk)
    assert int(dec.decrypt(prod).to_string() or "0", 16) == 11 * 22


def test_bfv_mod_switch_to_next():
    """mod_switch_to_next keeps the plaintext; smaller chain decrypts."""
    import jax
    from pplp_tpu.bfv import (
        BFVContext, Decryptor, EncryptionParameters, Encryptor, KeyGenerator,
        Plaintext,
    )
    from pplp_tpu.bfv.evaluator import mod_switch_to_next, restrict_secret_key
    from pplp_tpu.ops.primes import get_primes

    n, t = 256, 1 << 16
    chain = get_primes(28, 3, n)
    ctx = BFVContext.build(EncryptionParameters.bfv(n, t, coeff_modulus=chain))
    kg = KeyGenerator(ctx, 8)
    sk, pk = kg.secret_key(), kg.create_public_key()
    ct = Encryptor(ctx, pk).encrypt(Plaintext(format(31337, "X")), jax.random.key(1))
    ctx2, ct2 = mod_switch_to_next(ctx, ct)
    assert ctx2.L == 2
    sk2 = restrict_secret_key(ctx2, sk)
    got = Decryptor(ctx2, sk2).decrypt(ct2)
    assert int(got.to_string() or "0", 16) == 31337
    # And once more down to a single prime.
    ctx3, ct3 = mod_switch_to_next(ctx2, ct2)
    got3 = Decryptor(ctx3, restrict_secret_key(ctx3, sk)).decrypt(ct3)
    assert int(got3.to_string() or "0", 16) == 31337


def test_bfv_mod_switch_to_next_m62():
    """mod_switch_to_next on a SEAL-style wide chain (m62 residue pairs)."""
    import jax
    from pplp_tpu.bfv import (
        BFVContext, Decryptor, EncryptionParameters, Encryptor, KeyGenerator,
        Plaintext,
    )
    from pplp_tpu.bfv.evaluator import mod_switch_to_next, restrict_secret_key
    from pplp_tpu.ops.primes import get_primes

    n, t = 256, 1 << 20  # t must exceed the message: Encryptor rejects coeffs >= t
    chain = get_primes(36, 3, n)
    ctx = BFVContext.build(EncryptionParameters.bfv(n, t, coeff_modulus=chain))
    assert ctx.tables.profile == "m62"
    kg = KeyGenerator(ctx, 21)
    sk, pk = kg.secret_key(), kg.create_public_key()
    ct = Encryptor(ctx, pk).encrypt(Plaintext(format(424242, "X")), jax.random.key(4))
    ctx2, ct2 = mod_switch_to_next(ctx, ct)
    assert ctx2.L == 2 and ctx2.tables.profile == "m62"
    got = Decryptor(ctx2, restrict_secret_key(ctx2, sk)).decrypt(ct2)
    assert int(got.to_string() or "0", 16) == 424242
    ctx3, ct3 = mod_switch_to_next(ctx2, ct2)
    got3 = Decryptor(ctx3, restrict_secret_key(ctx3, sk)).decrypt(ct3)
    assert int(got3.to_string() or "0", 16) == 424242


def test_encrypt_rejects_unreduced_plaintext():
    """SEAL parity: Encryptor::encrypt throws when a plaintext coefficient is
    not reduced mod t (SEAL's is_valid_for check). The round-1 m62 regression
    was exactly this: encrypting 424242 under t=2^16 silently wrapped."""
    import jax
    import pytest
    from pplp_tpu.bfv import (
        BFVContext, EncryptionParameters, Encryptor, KeyGenerator, Plaintext,
    )
    from pplp_tpu.ops.primes import get_primes

    n, t = 64, 1 << 16
    ctx = BFVContext.build(
        EncryptionParameters.bfv(n, t, coeff_modulus=get_primes(28, 2, n))
    )
    kg = KeyGenerator(ctx, 5)
    enc = Encryptor(ctx, kg.create_public_key())
    with pytest.raises(ValueError, match="not reduced"):
        enc.encrypt(Plaintext(format(1 << 16, "X")), jax.random.key(0))
