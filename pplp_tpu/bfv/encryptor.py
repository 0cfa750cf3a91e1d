"""Public-key BFV encryption.

c0 = pk0*u + e0 + round(q*m/t),  c1 = pk1*u + e1   (u ternary, e CBD noise)

The analogue of SEAL's ``Encryptor::encrypt`` used at
``/root/reference/src/demo.cc:138-140``. The pk multiply runs in NTT domain
with Shoup companions; the message scaling term is computed on-device
(``BFVContext.scale_plain``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import ntt
from . import sampling
from .ciphertext import Ciphertext
from .context import BFVContext
from .keys import PublicKey
from .plaintext import Plaintext

__all__ = ["Encryptor"]


class Encryptor:
    def __init__(self, ctx: BFVContext, pk: PublicKey):
        self.ctx = ctx
        self.pk = pk

    def encrypt_pairs(self, m_lo, m_hi, key) -> Ciphertext:
        """Encrypt plaintext coeff pairs (u32 lo/hi, [..., n]) mod t."""
        ctx = self.ctx
        key_u, key_e0, key_e1 = jax.random.split(key, 3)
        batch = m_lo.shape[:-1]
        u = sampling.ternary_poly(key_u, ctx, batch)
        e0 = sampling.cbd_poly(key_e0, ctx, batch)
        e1 = sampling.cbd_poly(key_e1, ctx, batch)
        return self._assemble(m_lo, m_hi, u, e0, e1)

    def encrypt_with_randomness(self, plain: Plaintext, u, e0, e1) -> Ciphertext:
        """Encrypt with INJECTED randomness (coeff-domain residue arrays
        [L, n]): the known-answer-vector hook (tests/bfv_oracle.py) — the
        deterministic analogue of SEAL's seeded encryptor."""
        plain.validate_for(self.ctx)
        m_lo, m_hi = plain.pair_u32(self.ctx.n)
        return self._assemble(jnp.asarray(m_lo), jnp.asarray(m_hi), u, e0, e1)

    def _assemble(self, m_lo, m_hi, u, e0, e1) -> Ciphertext:
        ctx = self.ctx
        p = ctx.prof
        q2 = ctx.tables.q_b(1)
        u_ntt = ntt.forward(u, ctx.tables)
        c0 = ntt.inverse(
            p.mulmod_shoup(u_ntt, self.pk.pk0_ntt, self.pk.pk0_shoup, q2),
            ctx.tables,
        )
        c1 = ntt.inverse(
            p.mulmod_shoup(u_ntt, self.pk.pk1_ntt, self.pk.pk1_shoup, q2),
            ctx.tables,
        )
        scaled_m = ctx.scale_plain(m_lo, m_hi)
        c0 = p.add(p.add(c0, e0, q2), scaled_m, q2)
        c1 = p.add(c1, e1, q2)
        return Ciphertext(polys=(c0, c1), domain="coeff")

    def encrypt(self, plain: Plaintext, key) -> Ciphertext:
        plain.validate_for(self.ctx)
        m_lo, m_hi = plain.pair_u32(self.ctx.n)
        return self.encrypt_pairs(jnp.asarray(m_lo), jnp.asarray(m_hi), key)
