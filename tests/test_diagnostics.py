"""Noise budget + profiling utilities."""

import jax
import numpy as np

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
from pplp_tpu.utils.profiling import StageTimer

N = 256


def test_noise_budget_decreases_with_ops():
    chain = get_primes(28, 3, N)
    ctx = BFVContext.build(EncryptionParameters.bfv(N, 1 << 16, coeff_modulus=chain))
    kg = KeyGenerator(ctx, 1)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc, dec, ev = Encryptor(ctx, pk), Decryptor(ctx, sk), Evaluator(ctx)

    ct = enc.encrypt(Plaintext(format(7, "X")), jax.random.key(2))
    fresh = dec.invariant_noise_budget(ct)
    assert fresh > 20  # ~84-bit q, tiny noise

    noisy = ev.multiply_plain(ct, Plaintext(format(0x7FFF, "X")))
    after = dec.invariant_noise_budget(noisy)
    assert 0 < after < fresh

    # Drive the budget down with repeated scalar multiplies; decryption
    # stays correct while the budget is positive.
    acc = ct
    expect = 7
    t = ctx.t
    for _ in range(3):
        acc = ev.multiply_plain(acc, Plaintext(format(0x7F, "X")))
        expect = expect * 0x7F % t
    if dec.invariant_noise_budget(acc) > 0:
        assert int(dec.decrypt(acc).to_string() or "0", 16) == expect


def test_stage_timer():
    st = StageTimer()
    with st.stage("a"):
        sum(range(1000))
    with st.stage("b"):
        pass
    assert st.ns["a"] > 0 and "b" in st.ns
    assert st.total_ns() >= st.ns["a"]
    lines = []
    st.report(out=lines.append)
    assert any(line.startswith("d_a") for line in lines)
