"""BFV decryption: x = c0 + c1*s (+ c2*s^2 ...) mod q, m = round(t*x/q) mod t.

The analogue of SEAL's ``Decryptor::decrypt`` used at
``/root/reference/src/demo.cc:164``. The polynomial dot product with secret
powers runs on device (NTT domain); the final CRT-compose + scale-round step
runs on host over python ints (exact; device BEHZ-style t-gamma decrypt is the
planned optimization for batched pipelines).
"""

from __future__ import annotations

import jax
import numpy as np

from ..ops import ntt
from .ciphertext import Ciphertext
from .context import BFVContext
from .keys import SecretKey
from .plaintext import Plaintext

__all__ = ["Decryptor"]


class Decryptor:
    def __init__(self, ctx: BFVContext, sk: SecretKey):
        self.ctx = ctx
        self.sk = sk

    def ct_value_rns(self, a: Ciphertext):
        """Device part: residues of x = sum_i c_i * s^i mod q, [..., L, n]."""
        ctx = self.ctx
        p, q2 = ctx.prof, ctx.tables.q_b(1)
        assert a.domain == "coeff"
        acc_ntt = None
        s_pow = None
        for i, c in enumerate(a.polys[1:], start=1):
            c_ntt = ntt.forward(c, ctx.tables)
            if s_pow is None:
                s_pow = (self.sk.s_ntt, self.sk.s_shoup)
                term = p.mulmod_shoup(c_ntt, s_pow[0], s_pow[1], q2)
            else:
                from .keys import _shoup

                s_next = p.mulmod_shoup(s_pow[0], self.sk.s_ntt, self.sk.s_shoup, q2)
                s_pow = (s_next, _shoup(ctx, s_next))
                term = p.mulmod_shoup(c_ntt, s_pow[0], s_pow[1], q2)
            acc_ntt = term if acc_ntt is None else p.add(acc_ntt, term, q2)
        x = ntt.inverse(acc_ntt, ctx.tables)
        return p.add(a.polys[0], x, q2)

    def decrypt(self, a: Ciphertext) -> Plaintext:
        residues = ntt.to_numpy(self.ct_value_rns(a), self.ctx.tables)
        coeffs = self.ctx.decode_plain_from_ct_value(
            np.asarray(residues, dtype=object)
        )
        return Plaintext(coeffs)

    def invariant_noise_budget(self, a: Ciphertext) -> int:
        """Bits of noise budget left (SEAL's invariant_noise_budget analogue).

        0 means decryption is no longer guaranteed. Computed host-side from
        the centered residual x - round(q*m/t).
        """
        ctx = self.ctx
        residues = ntt.to_numpy(self.ct_value_rns(a), ctx.tables)
        xs = ctx.crt_compose(np.asarray(residues, dtype=object))
        q, t = ctx.q, ctx.t
        worst = 1
        for x in xs:
            m = ((x * t + q // 2) // q) % t
            ideal = (q * m + t // 2) // t
            e = (x - ideal) % q
            if e > q // 2:
                e = q - e
            worst = max(worst, e)
        # invariant noise v ~ t*e/q; budget = -log2(2|v|) = log2(q/(2 t e)).
        ratio = q // (2 * t * worst)
        return max(0, ratio.bit_length() - 1)
