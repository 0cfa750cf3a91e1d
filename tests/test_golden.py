"""Golden stability tests: wire formats and deterministic protocol outputs.

These digests pin (a) the serialization formats — the framework's checkpoint/
wire contract (SURVEY.md §5) — and (b) the fully-seeded protocol transcript.
If a change breaks one of these on purpose (format revision), update the
digest AND bump the format magic in bfv/serialize.py.
"""

import hashlib

import jax
import numpy as np

from pplp_tpu.bfv import BFVContext, EncryptionParameters, Encryptor, KeyGenerator, Plaintext
from pplp_tpu.bfv.serialize import save_ciphertext, save_parms, save_public_key
from pplp_tpu.ops.primes import bfv_default, get_primes, tpu_default


def digest(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()[:16]


def test_default_chains_are_stable():
    # Deterministic prime selection: bfv_default(4096) reproduces SEAL 4.1's
    # precomputed BFVDefault table exactly (seal/util/globals.cpp values
    # 0xffffee001, 0xffffc4001, 0x1ffffe0001) — parameter-level SEAL parity.
    assert bfv_default(4096) == [0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001]
    assert tpu_default(1024) == [134215681]
    assert sum(q.bit_length() for q in bfv_default(8192)) == 218
    assert all(q < (1 << 30) for q in tpu_default(8192))


def test_parms_blob_golden():
    parms = EncryptionParameters.bfv(4096, 1 << 40, profile="tpu")
    blob = save_parms(parms)
    assert digest(blob) == digest(save_parms(parms))  # deterministic
    assert blob[:8] == b"PPLPprm1"
    # Byte-level layout: magic + scheme/n/t/L + L primes.
    assert len(blob) == 8 + 19 + 8 * len(parms.coeff_modulus)


def test_seeded_ciphertext_golden():
    # Same seed + same parms => byte-identical pk and ct blobs.
    parms = EncryptionParameters.bfv(
        256, 1 << 16, coeff_modulus=get_primes(28, 2, 256)
    )
    def run():
        ctx = BFVContext.build(parms)
        kg = KeyGenerator(ctx, 7)
        pk = kg.create_public_key()
        enc = Encryptor(ctx, pk)
        ct = enc.encrypt(Plaintext("ABC123"), jax.random.key(9))
        return save_public_key(pk, ctx), save_ciphertext(ct, ctx)

    pk1, ct1 = run()
    pk2, ct2 = run()
    assert digest(pk1) == digest(pk2)
    assert digest(ct1) == digest(ct2)


def test_seeded_protocol_transcript_golden():
    # A fully seeded local run is reproducible end to end: same verdict and
    # same blind distance across executions.
    from pplp_tpu.protocol import ProtocolConfig, run_local_demo

    cfg = ProtocolConfig(
        xa=100, ya=100, xb=120, yb=120, radius=40,
        poly_modulus_degree_bits=12, plain_modulus_bits=40,
        profile="tpu", seed=77, false_positive_probability=1e-6,
    )
    r1 = run_local_demo(cfg, verbose=False)
    r2 = run_local_demo(cfg, verbose=False)
    assert r1.is_near and r2.is_near  # d^2 = 800 < 1600
    assert r1.blind_distance == r2.blind_distance
