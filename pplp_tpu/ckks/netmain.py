"""Networked CKKS aggregation (reference C7's client/server split,
``src/ckks_demo/ckks_{client,server}.cc``): clients connect to an untrusted
aggregator, send encrypted values, the aggregator sums ciphertexts and
returns the encrypted total to the key-holding client.

Wire flow (framed transport, one aggregator, N clients in sequence):

    client0 (key holder) → server : parms ‖ pk blobs
    client_i → server             : ct(value_i)
    server → client0              : ct(sum)
    client0                        : decrypt + decode
"""

from __future__ import annotations

import jax
import numpy as np

from ..bfv.keys import KeyGenerator
from ..bfv.serialize import (
    load_ciphertext,
    load_parms,
    load_public_key,
    save_ciphertext,
    save_parms,
    save_public_key,
)
from ..bfv.context import BFVContext
from ..protocol.transport import Channel
from .ckks import CKKSContext, CKKSEncoder, ckks_add, ckks_decrypt, ckks_encrypt

__all__ = ["run_aggregation_server", "run_aggregation_keyholder", "run_aggregation_contributor"]


def run_aggregation_server(chan: Channel, n_values: int):
    """Untrusted aggregator: receives parms+pk, sums n_values cts."""
    parms = load_parms(chan.recv_frame())
    ctx = BFVContext.build(parms)
    load_public_key(chan.recv_frame(), ctx)  # pk available to contributors
    acc = None
    scale = np.frombuffer(chan.recv_frame(), np.float64)[0]
    cctx = CKKSContext(base=ctx, scale=scale)
    for _ in range(n_values):
        ct = load_ciphertext(chan.recv_frame(), ctx)
        acc = ct if acc is None else ckks_add(cctx, acc, ct)
    chan.send_frame(save_ciphertext(acc, ctx))


def run_aggregation_keyholder(chan: Channel, values, n=2048,
                              scale=float(1 << 30), seed=0) -> float:
    """Key holder drives the round: shares parms/pk, contributes all values
    (stand-in for N contributors on one channel), decrypts the sum."""
    ctx = CKKSContext.build(n=n, scale=scale)
    enc = CKKSEncoder(ctx)
    kg = KeyGenerator(ctx.base, seed)
    sk, pk = kg.secret_key(), kg.create_public_key()
    chan.send_frame(save_parms(ctx.base.parms))
    chan.send_frame(save_public_key(pk, ctx.base))
    chan.send_frame(np.float64(scale).tobytes())
    key = jax.random.key(seed + 1)
    for v in values:
        key, sub = jax.random.split(key)
        m = enc.coeffs_to_rns(enc.encode([v]))
        chan.send_frame(save_ciphertext(ckks_encrypt(ctx, pk, m, sub), ctx.base))
    total_ct = load_ciphertext(chan.recv_frame(), ctx.base)
    coeffs = ckks_decrypt(ctx, sk, total_ct)
    return float(np.real(enc.decode(coeffs.astype(np.float64))[0]))


def run_aggregation_contributor(chan: Channel, value: float, ctx: CKKSContext, pk, key):
    """A non-key-holding contributor: encrypt one value under the shared pk."""
    enc = CKKSEncoder(ctx)
    m = enc.coeffs_to_rns(enc.encode([value]))
    chan.send_frame(save_ciphertext(ckks_encrypt(ctx, pk, m, key), ctx.base))
