"""Galois automorphisms and rotation keys (SEAL's apply_galois /
rotate_rows / rotate_columns capability — beyond what the reference uses,
part of the SEAL surface a migrating user expects).

The automorphism sigma_g: a(X) -> a(X^g) mod (X^n + 1), g odd, permutes
coefficients with signs: X^i -> +-X^{(i*g) mod n} (negated when i*g mod 2n
lands in [n, 2n)). On a ciphertext (c0, c1), sigma_g yields an encryption
under s(X^g); a key switch with Galois keys (KSwitchKeys toward sigma_g(s))
returns it to s.

Slot semantics: with the batch encoder's orbit ordering (slot j evaluates at
psi^{3^j}), sigma_3 is a cyclic rotation of the first slot row and
sigma_{2n-1} swaps the two rows — matching SEAL's rotate_rows/columns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ntt
from .behz import KSwitchKeys, create_kswitch_keys, keyswitch_contributions
from .ciphertext import Ciphertext
from .context import BFVContext

__all__ = [
    "apply_galois_plain",
    "create_galois_keys",
    "apply_galois",
    "rotate_rows",
    "rotate_columns",
    "galois_elt_from_step",
]


def galois_elt_from_step(step: int, n: int) -> int:
    """SEAL convention: row rotation by ``step`` uses g = 3^step mod 2n
    (negative steps rotate the other way); columns swap uses g = 2n - 1."""
    m = 2 * n
    if step >= 0:
        return pow(3, step, m)
    return pow(pow(3, -1, m), -step, m)


@functools.lru_cache(maxsize=64)
def _galois_tables(n: int, g: int):
    assert g % 2 == 1
    src = np.zeros(n, np.int64)
    sign = np.zeros(n, np.uint32)  # 1 = negate
    # Output index j receives coefficient from index i where (i*g) mod 2n
    # equals j (positive) or j+n (negated).
    for i in range(n):
        j = (i * g) % (2 * n)
        if j < n:
            src[j] = i
            sign[j] = 0
        else:
            src[j - n] = i
            sign[j - n] = 1
    return jnp.asarray(src, jnp.int32), jnp.asarray(sign)


def apply_galois_plain(ctx: BFVContext, poly, g: int):
    """sigma_g on a coefficient-domain residue poly [..., L, n]."""
    src, sign = _galois_tables(ctx.n, g)
    p = ctx.prof
    q2 = ctx.tables.q_b(1)
    gathered = jax.tree.map(lambda a: a[..., src], poly)
    negated = p.neg(gathered, q2)
    mask = (sign != 0)
    return jax.tree.map(lambda a, b: jnp.where(mask, a, b), negated, gathered)


def create_galois_keys(ctx: BFVContext, sk, g: int, key) -> KSwitchKeys:
    """Key-switch keys toward sigma_g(s)."""
    s_coeff = ntt.inverse(sk.s_ntt, ctx.tables)
    target = ntt.forward(apply_galois_plain(ctx, s_coeff, g), ctx.tables)
    return create_kswitch_keys(ctx, sk, target, key)


def apply_galois(ctx: BFVContext, ct: Ciphertext, g: int, gk) -> Ciphertext:
    """sigma_g on a size-2 ciphertext, keyswitched back to s.

    ``gk`` is either RNS-gadget KSwitchKeys or special-prime SPKeys."""
    from .keyswitch import SPKeys, sp_keyswitch

    assert ct.size == 2 and ct.domain == "coeff"
    p = ctx.prof
    q2 = ctx.tables.q_b(1)
    c0g = apply_galois_plain(ctx, ct.polys[0], g)
    c1g = apply_galois_plain(ctx, ct.polys[1], g)
    if isinstance(gk, SPKeys):
        d0, d1 = sp_keyswitch(ctx, spk=gk, poly=c1g)
    else:
        d0, d1 = keyswitch_contributions(ctx, c1g, gk)
    return Ciphertext((p.add(c0g, d0, q2), d1), "coeff")


def rotate_rows(ctx, ct, step: int, gk: KSwitchKeys) -> Ciphertext:
    return apply_galois(ctx, ct, galois_elt_from_step(step, ctx.n), gk)


def rotate_columns(ctx, ct, gk: KSwitchKeys) -> Ciphertext:
    return apply_galois(ctx, ct, 2 * ctx.n - 1, gk)
