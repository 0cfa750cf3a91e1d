"""RLWE sampling with explicit counter-based PRNG keys (jax.random).

Replaces SEAL's Blake2-based UniformRandomGenerator with JAX's threaded
threefry keys: every sample site takes an explicit key, making whole-protocol
runs reproducible (the determinism hook the reference lacks — its blinding
draws are non-deterministic ``seal::random_bytes``, ``src/demo.cc:116-118``).

Small polynomials (secret/ternary/noise) are sampled once over Z and lifted to
every RNS limb; uniform R_q polynomials are sampled per limb with enough bits
that modulo bias is negligible (>= 34 bits of margin).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import modmath as mm

__all__ = ["uniform_rq", "ternary_poly", "cbd_poly"]

_CBD_MASK = jnp.uint32((1 << 21) - 1)  # CBD(21): sigma = sqrt(21/2) ~ 3.24


def uniform_rq(key, ctx, batch=()):
    """Uniform element of R_q: independent residues [*batch, L, n]."""
    L, n = ctx.L, ctx.n
    tb = ctx.tables
    if tb.profile == "m31":
        bits = jax.random.bits(key, batch + (2, L, n), jnp.uint32)
        q = tb.q[:, None]
        mu_lo, mu_hi = (m[:, None] for m in tb.mu)
        return mm.m31.reduce64(bits[..., 0, :, :], bits[..., 1, :, :], q, mu_lo, mu_hi)
    bits = jax.random.bits(key, batch + (4, L, n), jnp.uint32)
    q = jax.tree.map(lambda a: a[:, None], tb.q)
    ratio = tuple(m[:, None] for m in tb.mu)
    z = tuple(bits[..., i, :, :] for i in range(4))
    return mm.m62.reduce128(z, q, ratio)


def _lift_small_signed(mag, is_neg, ctx, batch):
    """Lift |x| < 2^31 with sign into every RNS limb: [*batch, L, n]."""
    p = ctx.prof
    L, n = ctx.L, ctx.n
    mag_b = jnp.broadcast_to(mag[..., None, :], batch + (L, n))
    if ctx.tables.profile == "m31":
        pos = mag_b
    else:
        pos = (mag_b, jnp.zeros_like(mag_b))
    q2 = ctx.tables.q_b(1)
    neg = p.neg(pos, q2)
    mask = is_neg[..., None, :]
    return jax.tree.map(lambda a, b: jnp.where(mask, a, b), neg, pos)


def ternary_poly(key, ctx, batch=()):
    """Uniform ternary {-1, 0, 1} polynomial, lifted to all limbs."""
    n = ctx.n
    r = jax.random.bits(key, batch + (n,), jnp.uint32) % 3
    return _lift_small_signed(jnp.where(r == 2, 1, r).astype(jnp.uint32),
                              r == 2, ctx, batch)


def cbd_poly(key, ctx, batch=()):
    """Centered binomial noise, CBD(21) (sigma ~ 3.2, SEAL-like width)."""
    n = ctx.n
    bits = jax.random.bits(key, batch + (2, n), jnp.uint32)
    a = jax.lax.population_count(bits[..., 0, :] & _CBD_MASK)
    b = jax.lax.population_count(bits[..., 1, :] & _CBD_MASK)
    mag = jnp.where(a >= b, a - b, b - a).astype(jnp.uint32)
    return _lift_small_signed(mag, a < b, ctx, batch)
