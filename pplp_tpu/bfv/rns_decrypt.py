"""Device-side BFV decryption decode (BEHZ t-gamma scale-and-round).

Given x = (c0 + c1 s) mod q as RNS residues, computes m = round(t*x/q) mod t
entirely on device (u32 lanes), replacing the host CRT composition for
t < 2^30:

  y_i  = | gamma*t * x_i * (q/q_i)^{-1} |_{q_i}               (Shoup mult)
  s_m  = | sum_i y_i * c_m[i] |_m,  c_m[i] = |-(q/q_i)*q^{-1}|_m,  m in {t, gamma}
  m    = | (s_t - centered(s_gamma)) * gamma^{-1} |_t

gamma is a ~2^29 prime >> 2k, which makes the correction exact for any
decryptable ciphertext (noise below q/2 with margin).

This is the decrypt path of the batched proximity pipeline (100k checks,
BASELINE.md config[3]); the host big-int path in ``context.py`` remains the
oracle and covers t up to 2^56.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..ops import modmath as mm
from ..ops.primes import is_prime
from .context import BFVContext

__all__ = ["RnsDecoder"]


def _u32s(v):
    return jnp.asarray(np.asarray(v, np.uint32))


def _find_gamma(ctx: BFVContext) -> int:
    g = (1 << 29) - 1
    banned = {m.value for m in ctx.moduli} | {ctx.t}
    while True:
        if is_prime(g) and g not in banned and ctx.q % g != 0:
            return g
        g -= 2


class RnsDecoder:
    def __init__(self, ctx: BFVContext):
        if ctx.t >= 1 << 30:
            raise NotImplementedError(
                "device decode supports t < 2^30; use the host path"
            )
        self.ctx = ctx
        self.profile = ctx.tables.profile
        t = ctx.t
        q = ctx.q
        gamma = _find_gamma(ctx)
        self.gamma = gamma
        qm = [m.value for m in ctx.moduli]

        # y multiplier per limb: |gamma * t * qhat_i^{-1}|_{q_i} (+ Shoup).
        vals = [(gamma * t * pow(q // qi, -1, qi)) % qi for qi in qm]
        if self.profile == "m31":
            self.ymul = (
                _u32s(vals)[:, None],
                _u32s([(v << 32) // qi for v, qi in zip(vals, qm)])[:, None],
            )
        else:
            pair = lambda vs: (
                _u32s([v & 0xFFFFFFFF for v in vs])[:, None],
                _u32s([v >> 32 for v in vs])[:, None],
            )
            self.ymul = (
                pair(vals),
                pair([(v << 64) // qi for v, qi in zip(vals, qm)]),
            )
        # Conversion constants folded with -q^{-1} per target.
        def conv_row(m):
            neg_qinv = pow(-q, -1, m)
            return [((q // qi) * neg_qinv) % m for qi in qm]

        self.c_t = _u32s(conv_row(t))
        self.c_g = _u32s(conv_row(gamma))
        # Barrett mu for t and gamma (both < 2^30).
        mu_t = (1 << 64) // t
        mu_g = (1 << 64) // gamma
        self.t_consts = (jnp.uint32(t), jnp.uint32(mu_t & 0xFFFFFFFF), jnp.uint32(mu_t >> 32))
        self.g_consts = (jnp.uint32(gamma), jnp.uint32(mu_g & 0xFFFFFFFF), jnp.uint32(mu_g >> 32))
        inv_gamma_t = pow(gamma % t, -1, t)
        self.inv_gamma = (jnp.uint32(inv_gamma_t), jnp.uint32((inv_gamma_t << 32) // t))
        self.gamma_mod_t = jnp.uint32(gamma % t)
        self.half_gamma = jnp.uint32(gamma // 2)

    def _accum_mod(self, y, conv, consts):
        """sum_i y[..., i, :] * conv[i] mod m -> [..., n] (exact columns).

        m31: 96-bit accumulation of u32 x u32 products. m62: 128-bit
        accumulation of (lo, hi)-pair x u32 products (comba partials)."""
        mod, mu_lo, mu_hi = consts
        if self.profile == "m31":
            z0 = z1 = z2 = None
            for i in range(self.ctx.L):
                lo, hi = mm.mul32(y[..., i, :], conv[i])
                if z0 is None:
                    z0, z1, z2 = lo, hi, jnp.zeros_like(lo)
                else:
                    z0 = z0 + lo
                    c0 = (z0 < lo).astype(jnp.uint32)
                    z1n = z1 + hi
                    c1 = (z1n < hi).astype(jnp.uint32)
                    z1 = z1n + c0
                    c1 = c1 + (z1 < z1n).astype(jnp.uint32)
                    z2 = z2 + c1
            r12 = mm.m31.reduce64(z1, z2, mod, mu_lo, mu_hi)
            return mm.m31.reduce64(z0, r12, mod, mu_lo, mu_hi)
        ylo, yhi = y
        acc = None
        for i in range(self.ctx.L):
            prod = mm.comba_mul(
                [ylo[..., i, :], yhi[..., i, :]], [conv[i]], out_limbs=3
            )
            prod4 = prod + [jnp.zeros_like(prod[0])]
            acc = prod4 if acc is None else mm.limbs_add(acc, prod4)
        # value = z0 + z1 2^32 + z2 2^64 + z3 2^96, reduced mod m < 2^30 by
        # folding limbs top-down through 64-bit Barrett steps.
        v2 = mm.m31.reduce64(acc[2], acc[3], mod, mu_lo, mu_hi)
        v1 = mm.m31.reduce64(acc[1], v2, mod, mu_lo, mu_hi)
        return mm.m31.reduce64(acc[0], v1, mod, mu_lo, mu_hi)

    def decode_mod_t(self, x):
        """x: [..., L, n] residues of (c0 + c1 s) mod q -> m mod t [..., n]."""
        ctx = self.ctx
        p = ctx.prof
        q2 = ctx.tables.q_b(1)
        y = p.mulmod_shoup(x, *self.ymul, q2)
        s_t = self._accum_mod(y, self.c_t, self.t_consts)
        s_g = self._accum_mod(y, self.c_g, self.g_consts)
        t, mu_lo, mu_hi = self.t_consts
        gam = self.g_consts[0]
        # centered(s_gamma): subtract gamma when s_g > gamma/2. In mod-t terms
        # s_t - s_hat_g = s_t - s_g (+ gamma if centered negative).
        s_g_mod_t = mm.m31.reduce64(s_g, jnp.zeros_like(s_g), t, mu_lo, mu_hi)
        d = mm.m31.sub(s_t, s_g_mod_t, t)
        d_neg = mm.m31.add(d, jnp.broadcast_to(self.gamma_mod_t, d.shape), t)
        d = jnp.where(s_g > self.half_gamma, d_neg, d)
        return mm.m31.mulmod_shoup(d, self.inv_gamma[0], self.inv_gamma[1], t)


@functools.lru_cache(maxsize=8)
def get_decoder(ctx: BFVContext) -> RnsDecoder:
    return RnsDecoder(ctx)
