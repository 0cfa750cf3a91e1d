"""Batched DGK operations: the fused-kernel comparison path.

Where the reference executes one GMP modexp at a time (``dgk.cc:33-75``),
these run B-wide on TPU lanes via ``modexp.MontgomeryCtx``: batch encrypt,
batch decrypt (shared-exponent c^vpq + hash-map table lookup), and the full
blinded-distance comparison pipeline for 10k+ parallel checks
(BASELINE.md config[2]).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .dgk import DGKPrivateKey, DGKPublicKey
from .modexp import MontgomeryCtx, exp_to_bits, from_digits, to_digits

__all__ = ["DGKBatch"]


@dataclass(frozen=True, eq=False)
class DGKBatch:
    pub: DGKPublicKey
    mc: MontgomeryCtx

    @staticmethod
    def build(pub: DGKPublicKey) -> "DGKBatch":
        return DGKBatch(pub=pub, mc=MontgomeryCtx.build(pub.n))

    def _dig(self, ints):
        return jnp.asarray(to_digits(ints, self.mc.D))

    def encrypt_batch(self, ms, rs):
        """[B] messages (< u) + randomness -> [B, D] ciphertext digits.

        c = g^m * h^r mod n; both exponentiations share their base, so each
        scan step squares once ([1,D]) and multiplies lane-wise.
        """
        mc = self.mc
        l_bits = max(int(m).bit_length() for m in ms) or 1
        r_bits = max(int(r).bit_length() for r in rs) or 1
        gm = mc.powmod(self._dig([self.pub.g]), jnp.asarray(exp_to_bits(ms, l_bits)))
        hr = mc.powmod(self._dig([self.pub.h]), jnp.asarray(exp_to_bits(rs, r_bits)))
        return mc.mulmod(gm, hr)

    def decrypt_batch(self, priv: DGKPrivateKey, cts) -> list[int]:
        """[B, D] ciphertext digits -> messages, via shared-exponent c^vpq
        then the hash-map table (host O(1) per lane)."""
        cv = self.mc.powmod_shared_exp(cts, priv.vpq)
        out = []
        for v in from_digits(np.asarray(cv)):
            out.append(priv.rtab[v])
        return out

    # -- the comparison/proximity pipeline ------------------------------

    def blind_distance_batch(self, c1, c2, c3, xb: int, yb: int,
                             s_blind: int, cz, cr):
        """Server side of the DGK pplp flow, batched:
        ((c1 * c2^xb * c3^yb)^s) * cz * cr  over [B, D] ciphertexts."""
        mc = self.mc
        t2 = mc.powmod_shared_exp(c2, xb)
        t3 = mc.powmod_shared_exp(c3, yb)
        acc = mc.mulmod(mc.mulmod(c1, t2), t3)
        acc = mc.powmod_shared_exp(acc, s_blind)
        return mc.mulmod(mc.mulmod(acc, cz), cr)
