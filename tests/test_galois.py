"""Galois automorphisms + rotation keys: SEAL rotate_rows/columns semantics."""

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
from pplp_tpu.bfv.batch_encoder import BatchEncoder
from pplp_tpu.bfv.galois import (
    apply_galois,
    apply_galois_plain,
    create_galois_keys,
    galois_elt_from_step,
    rotate_columns,
    rotate_rows,
)
from pplp_tpu.ops.primes import get_primes

N = 256
T = get_primes(20, 1, N)[0]


@pytest.fixture(scope="module")
def setup():
    chain = get_primes(28, 3, N)
    ctx = BFVContext.build(EncryptionParameters.bfv(N, T, coeff_modulus=chain))
    kg = KeyGenerator(ctx, 1)
    sk, pk = kg.secret_key(), kg.create_public_key()
    return ctx, sk, pk


def test_apply_galois_plain_polynomial():
    # sigma_g on x: X -> X^g; on X^i with wraparound sign.
    chain = get_primes(28, 2, N)
    ctx = BFVContext.build(EncryptionParameters.bfv(N, 1 << 16, coeff_modulus=chain))
    from pplp_tpu.ops import ntt

    g = 3
    coeffs = np.zeros((ctx.L, N), np.uint64)
    coeffs[:, 1] = 5  # a = 5 X
    out = ntt.to_numpy(
        apply_galois_plain(ctx, ntt.to_device(coeffs.astype(object), ctx.tables), g),
        ctx.tables,
    )
    expect = np.zeros_like(coeffs)
    expect[:, 3] = 5  # 5 X^3
    assert (out == expect).all()

    # Wraparound: a = X^{n-1}, g=3 -> X^{3n-3} = X^{2n} * X^{n-3} = +X^{n-3}?
    # X^{3(n-1)} mod X^n+1: exponent 3n-3 = 2n + (n-3): X^{2n}=+1 -> +X^{n-3}.
    coeffs = np.zeros((ctx.L, N), np.uint64)
    coeffs[:, N - 1] = 1
    out = ntt.to_numpy(
        apply_galois_plain(ctx, ntt.to_device(coeffs.astype(object), ctx.tables), g),
        ctx.tables,
    )
    assert out[0, N - 3] == 1 and out.sum() == ctx.L


def test_rotate_rows_cyclic(setup):
    ctx, sk, pk = setup
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    be = BatchEncoder(ctx)
    half = N // 2
    row0 = list(range(100, 100 + half))
    row1 = list(range(900, 900 + half))
    ct = enc.encrypt(be.encode(row0 + row1), jax.random.key(2))

    g = galois_elt_from_step(1, N)
    gk = create_galois_keys(ctx, sk, g, jax.random.key(3))
    rotated = rotate_rows(ctx, ct, 1, gk)
    got = be.decode(dec.decrypt(rotated))
    # SEAL semantics: each row rotates cyclically (by one position).
    assert got[:half] == row0[1:] + row0[:1]
    assert got[half:] == row1[1:] + row1[:1]


def test_rotate_columns_swaps_rows(setup):
    ctx, sk, pk = setup
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    be = BatchEncoder(ctx)
    half = N // 2
    row0 = [7] * half
    row1 = [11] * half
    ct = enc.encrypt(be.encode(row0 + row1), jax.random.key(4))
    gk = create_galois_keys(ctx, sk, 2 * N - 1, jax.random.key(5))
    swapped = rotate_columns(ctx, ct, gk)
    got = be.decode(dec.decrypt(swapped))
    assert got[:half] == row1 and got[half:] == row0


def test_negative_step(setup):
    ctx, sk, pk = setup
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    be = BatchEncoder(ctx)
    half = N // 2
    vals = list(range(half)) + [0] * half
    ct = enc.encrypt(be.encode(vals), jax.random.key(6))
    g = galois_elt_from_step(-1, N)
    gk = create_galois_keys(ctx, sk, g, jax.random.key(7))
    got = be.decode(dec.decrypt(apply_galois(ctx, ct, g, gk)))
    assert got[:half] == [half - 1] + list(range(half - 1))


@pytest.mark.slow
def test_rotate_rows_m62_chain():
    """SIMD rotation on a SEAL-style m62 chain: batching + Galois keyswitch
    complete the --profile seal evaluator surface (VERDICT r1 item 9)."""
    import jax
    from pplp_tpu.bfv import (
        BFVContext, Decryptor, EncryptionParameters, Encryptor, KeyGenerator,
    )
    from pplp_tpu.bfv.batch_encoder import BatchEncoder
    from pplp_tpu.bfv.galois import create_galois_keys, galois_elt_from_step, rotate_rows
    from pplp_tpu.ops.primes import get_primes

    n, t = 256, 65537
    chain = get_primes(36, 3, n)
    ctx = BFVContext.build(EncryptionParameters.bfv(n, t, coeff_modulus=chain))
    assert ctx.tables.profile == "m62"
    enc_b = BatchEncoder(ctx)
    kg = KeyGenerator(ctx, 81)
    sk, pk = kg.secret_key(), kg.create_public_key()
    g = galois_elt_from_step(1, n)
    gk = create_galois_keys(ctx, sk, g, jax.random.key(82))
    enc, dec = Encryptor(ctx, pk), Decryptor(ctx, sk)
    vals = [(3 * i + 1) % t for i in range(n)]
    ct = enc.encrypt(enc_b.encode(vals), jax.random.key(83))
    rot = rotate_rows(ctx, ct, 1, gk)
    out = [int(v) for v in enc_b.decode(dec.decrypt(rot))]
    half = n // 2
    want = vals[1:half] + vals[:1] + vals[half + 1:] + vals[half:half + 1]
    assert out == want
