"""CKKS aggregation demo: sum encrypted values across parties.

The capability of ``src/ckks_demo/ckks_{client,server}.cc`` — clients encrypt
their ages, an untrusted aggregator homomorphically sums the ciphertexts, the
key holder decrypts the total/average — rebuilt on this framework's engine
(in-process roles; the framed transport from ``protocol.transport`` carries
the same blobs when run as two processes).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from ..bfv.keys import KeyGenerator
from ..bfv.serialize import load_ciphertext, save_ciphertext
from .ckks import CKKSContext, CKKSEncoder, ckks_add, ckks_decrypt, ckks_encrypt

__all__ = ["AggregationResult", "run_aggregation_demo"]


@dataclass
class AggregationResult:
    values: list[float]
    decrypted_sum: float
    true_sum: float

    @property
    def abs_error(self) -> float:
        return abs(self.decrypted_sum - self.true_sum)


def run_aggregation_demo(
    values=None, n=2048, scale=float(1 << 30), seed=0, verbose=True
) -> AggregationResult:
    values = list(values) if values is not None else [23.0, 41.5, 35.0, 58.25]
    ctx = CKKSContext.build(n=n, scale=scale)
    enc = CKKSEncoder(ctx)
    kg = KeyGenerator(ctx.base, seed)
    sk, pk = kg.secret_key(), kg.create_public_key()

    # Each party encrypts its value into slot 0; blobs cross the wire.
    key = jax.random.key(seed + 1)
    blobs = []
    for v in values:
        key, sub = jax.random.split(key)
        m = enc.coeffs_to_rns(enc.encode([v]))
        blobs.append(save_ciphertext(ckks_encrypt(ctx, pk, m, sub), ctx.base))

    # Aggregator: sum ciphertexts without keys.
    acc = load_ciphertext(blobs[0], ctx.base)
    for blob in blobs[1:]:
        acc = ckks_add(ctx, acc, load_ciphertext(blob, ctx.base))

    # Key holder decrypts and decodes slot 0.
    coeffs = ckks_decrypt(ctx, sk, acc)
    total = float(np.real(enc.decode(coeffs.astype(np.float64))[0]))
    true = float(sum(values))
    if verbose:
        print(f"Encrypted aggregation of {len(values)} values")
        print(f"decrypted sum = {total:.4f} (true {true}), "
              f"mean = {total / len(values):.4f}")
    return AggregationResult(values=values, decrypted_sum=total, true_sum=true)
