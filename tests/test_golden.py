"""Golden stability tests: wire formats and deterministic protocol outputs.

The hex constants below are COMMITTED pins, not self-comparisons: they were
generated once (scripts in-file docstrings say how) and any byte-level drift
in the serialization format, the prime-selection rule, the threefry sampling
pipeline, or the protocol transcript fails these tests loudly. If a change
breaks one of these on purpose (format revision), update the constant AND
bump the format magic in bfv/serialize.py.

Reference analogue: SEAL streams parms/pk/ct between the two parties
(/root/reference/src/client.cc:92-146); this framework's wire format is its
own versioned spec, and these pins are its compatibility contract.
"""

import pytest
import hashlib

import jax

from pplp_tpu.bfv import (
    BFVContext,
    EncryptionParameters,
    Encryptor,
    KeyGenerator,
    Plaintext,
)
from pplp_tpu.bfv.serialize import save_ciphertext, save_parms, save_public_key
from pplp_tpu.ops.primes import bfv_default, get_primes, tpu_default

# Pinned digests (sha256[:16]) — regenerate ONLY on a deliberate format bump.
PARMS_DIGEST = "06d079de27e4d60e"
PK_DIGEST = "e63e39dbff2c2ea1"
CT_DIGEST = "3a3f4b37fb201047"
BLIND_DISTANCE = 0x108462E4DE


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
    assert digest(blob) == PARMS_DIGEST
    assert blob[:8] == b"PPLPprm1"
    # Byte-level layout: magic + scheme/n/t/L + L primes.
    assert len(blob) == 8 + 19 + 8 * len(parms.coeff_modulus)


def test_seeded_ciphertext_golden():
    # Same seed + same parms => these exact bytes. Any drift in threefry key
    # splitting, CBD sampling, NTT table layout, or blob packing fails here.
    parms = EncryptionParameters.bfv(
        256, 1 << 16, coeff_modulus=get_primes(28, 2, 256)
    )
    ctx = BFVContext.build(parms)
    kg = KeyGenerator(ctx, 7)
    pk = kg.create_public_key()
    enc = Encryptor(ctx, pk)
    ct = enc.encrypt(Plaintext("A123"), jax.random.key(9))
    assert digest(save_public_key(pk, ctx)) == PK_DIGEST
    assert digest(save_ciphertext(ct, ctx)) == CT_DIGEST


@pytest.mark.slow
def test_seeded_protocol_transcript_golden():
    # A fully seeded local run reproduces this exact blind distance (pinned,
    # not run-to-run compared): the end-to-end determinism hook SURVEY §4
    # asks for in place of the reference's seal::random_bytes blinding.
    from pplp_tpu.protocol import ProtocolConfig, run_local_demo

    cfg = ProtocolConfig(
        xa=100, ya=100, xb=120, yb=120, radius=40,
        poly_modulus_degree_bits=12, plain_modulus_bits=40,
        profile="tpu", seed=77, false_positive_probability=1e-6,
    )
    r = run_local_demo(cfg, verbose=False)
    assert r.is_near  # d^2 = 800 < 1600
    assert r.blind_distance == BLIND_DISTANCE
