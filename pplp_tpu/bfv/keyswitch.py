"""Special-prime (GHS/hybrid) key switching over Q ∪ {P}.

The RNS-gadget key switch in ``behz.KSwitchKeys`` adds noise proportional to
q_i·B per digit; this module implements the standard special-prime variant
(what SEAL 4.1 does with its ``special modulus``): keys live over the
extended basis QP, the accumulated product carries a factor P, and the final
mod-switch by P divides the digit noise down to O(B):

  key_i = (b_i, a_i) over QP,  b_i = -(a_i s + e_i) + P·g_i·T,
  g_i ≡ 1 mod q_i, 0 mod q_j (j≠i);  so  P·g_i mod q_j = (P mod q_i)·δ_ij,
  P·g_i mod P = 0.

  switch(c) = round( Σ_i NTT([c]_{q_i}) ⊙ key_i / P )  over Q.

Used for BFV relinearization (T = s²) and CKKS multiply (same machinery —
a CKKS ciphertext is RNS residues over the same chains). m31 profile.

Replaces the capability SEAL provides via ``KeyGenerator::create_relin_keys``
with ``sec_level_type``-reserved special prime (the reference's SEAL build
always reserves one: /root/reference/src/demo.cc:76-85 uses BFVDefault whose
last prime is the key-switching prime).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ntt
from ..ops.modmath import m31
from ..ops.primes import Modulus, get_primes
from .ciphertext import Ciphertext
from .context import BFVContext

__all__ = [
    "SPKeys",
    "build_ctx_qp",
    "create_sp_kswitch_keys",
    "create_sp_relin_keys",
    "sp_keyswitch",
    "sp_relinearize",
    "create_sp_galois_keys",
    "apply_galois_sp",
]


def _u32col(vals):
    return jnp.asarray(np.asarray(vals, np.uint32))[:, None]


def _pair_col(vals):
    lo = _u32col([int(v) & 0xFFFFFFFF for v in vals])
    hi = _u32col([int(v) >> 32 for v in vals])
    return lo, hi


def _shoup_col(vals, moduli, profile):
    """Profile-packed per-limb constants with Shoup companions ([K, 1])."""
    if profile == "m31":
        return (
            _u32col(vals),
            _u32col([(int(v) << 32) // m.value for v, m in zip(vals, moduli)]),
        )
    return (
        _pair_col(vals),
        _pair_col([(int(v) << 64) // m.value for v, m in zip(vals, moduli)]),
    )


@dataclass
class SPKeys:
    """Key-switch keys over QP toward a target secret T (s² for relin)."""

    ctx_qp: BFVContext   # basis Q ∪ {P}; P is the last limb
    P: int
    k0: Any              # [k, K, n] NTT-domain b_i rows (K = k+1)
    k0_shoup: Any
    k1: Any
    k1_shoup: Any


def build_ctx_qp(ctx: BFVContext) -> tuple[BFVContext, int]:
    """Extend Q with one special prime P (largest available NTT-friendly
    prime of the chain's profile not already in Q); context over QP.

    m31 chains extend with a <2^30 prime, m62 (SEAL-style) chains with a
    61-bit prime — SEAL's convention of reserving the largest prime as the
    key-switching modulus."""
    bits = 30 if ctx.tables.profile == "m31" else 61
    used = {m.value for m in ctx.moduli}
    pool = [p for p in get_primes(bits, ctx.L + 4, ctx.n) if p not in used]
    P = max(pool)
    parms_qp = ctx.parms.with_coeff_modulus(
        tuple(m.value for m in ctx.moduli) + (P,)
    )
    return BFVContext.build(parms_qp, engine=ctx.tables.engine), P


def create_sp_kswitch_keys(ctx: BFVContext, keygen, target_ntt_qp, key,
                           qp: tuple[BFVContext, int] | None = None) -> SPKeys:
    """Keys toward an arbitrary target T given in NTT domain over QP.

    ``keygen`` is the KeyGenerator that produced the working secret key — the
    secret's ternary coefficients are resampled from its PRNG key so the key
    extends to the P limb exactly. Pass ``qp`` = (ctx_qp, P) to reuse an
    already-built extended context (callers that compute the target over QP
    have one)."""
    from . import sampling
    from .keys import _shoup as sh

    ctx_qp, P = qp if qp is not None else build_ctx_qp(ctx)
    p = ctx_qp.prof
    tb = ctx_qp.tables
    q2 = tb.q_b(1)
    k, K = ctx.L, ctx_qp.L

    # The same PRNG key reproduces the same ternary coefficients on any basis.
    s_qp = ntt.forward(sampling.ternary_poly(keygen._key_s, ctx_qp), tb)
    s_qp_sh = sh(ctx_qp, s_qp)

    # Per-row gadget constants: row i carries (P mod q_i), all others 0.
    Pmod = [P % m.value for m in ctx.moduli] + [0]

    k0_rows, k1_rows = [], []
    for i in range(k):
        key, ka, ke = jax.random.split(key, 3)
        a = sampling.uniform_rq(ka, ctx_qp)
        e_ntt = ntt.forward(sampling.cbd_poly(ke, ctx_qp), tb)
        b = p.neg(p.add(p.mulmod_shoup(a, s_qp, s_qp_sh, q2), e_ntt, q2), q2)
        gi = [Pmod[j] if j == i else 0 for j in range(K)]
        gw, gws = _shoup_col(gi, ctx_qp.moduli, tb.profile)
        b = p.add(b, p.mulmod_shoup(target_ntt_qp, gw, gws, q2), q2)
        k0_rows.append(b)
        k1_rows.append(a)

    return make_sp_keys(ctx, ctx_qp, P, k0_rows, k1_rows)


def make_sp_keys(ctx: BFVContext, ctx_qp: BFVContext, P: int,
                 k0_rows, k1_rows) -> SPKeys:
    """Assemble SPKeys from per-digit NTT-domain rows over QP (also the
    deserialization entry point)."""
    from .keys import _shoup as sh

    stack = lambda rows: jax.tree.map(lambda *xs: jnp.stack(xs), *rows)
    row_shoup = lambda rows: jax.tree.map(
        lambda *xs: jnp.stack(xs), *[sh(ctx_qp, r) for r in rows]
    )
    return SPKeys(
        ctx_qp=ctx_qp,
        P=P,
        k0=stack(k0_rows), k0_shoup=row_shoup(k0_rows),
        k1=stack(k1_rows), k1_shoup=row_shoup(k1_rows),
    )


def create_sp_relin_keys(ctx: BFVContext, keygen, key) -> SPKeys:
    """Relinearization keys: target T = s² over QP."""
    from . import sampling

    qp = build_ctx_qp(ctx)
    ctx_qp = qp[0]
    tb = ctx_qp.tables
    from .keys import _shoup as sh

    s_qp = ntt.forward(sampling.ternary_poly(keygen._key_s, ctx_qp), tb)
    s2 = ctx_qp.prof.mulmod_shoup(s_qp, s_qp, sh(ctx_qp, s_qp), tb.q_b(1))
    return create_sp_kswitch_keys(ctx, keygen, s2, key, qp=qp)


def sp_keyswitch(ctx: BFVContext, spk: SPKeys, poly):
    """poly (coeff domain over Q) -> (d0, d1) coeff domain over Q:
    round(poly·T / 1) contributions to (c0, c1)."""
    from ..ops.modmath import m62
    from .rescale import make_divide_round_last

    ctx_qp = spk.ctx_qp
    tb = ctx_qp.tables
    p = ctx_qp.prof
    q2 = tb.q_b(1)
    k, K = ctx.L, ctx_qp.L

    def lift(digit_slice, full_like):
        """|digit|_{q_i} lifted into every QP limb (generic reduction)."""
        if tb.profile == "m31":
            d = jnp.broadcast_to(digit_slice, full_like.shape)
            return m31.reduce64(
                d, jnp.zeros_like(d), tb.q[:, None],
                *(m[:, None] for m in tb.mu),
            )
        d = tuple(
            jnp.broadcast_to(a, f.shape)
            for a, f in zip(digit_slice, full_like)
        )
        zero = jnp.zeros_like(d[0])
        ratio = tuple(m[:, None] for m in tb.mu)
        return m62.reduce128((d[0], d[1], zero, zero), q2, ratio)

    acc0 = acc1 = None
    for i in range(k):
        digit = jax.tree.map(lambda a: a[..., i : i + 1, :], poly)
        full_like = jax.tree.map(
            lambda a: jnp.broadcast_to(
                a[..., :1, :], a.shape[:-2] + (K, a.shape[-1])
            ),
            poly,
        )
        lifted = lift(digit, full_like)
        d_ntt = ntt.forward(lifted, tb)
        row = lambda tree: jax.tree.map(lambda a: a[i], tree)
        t0 = p.mulmod_shoup(d_ntt, row(spk.k0), row(spk.k0_shoup), q2)
        t1 = p.mulmod_shoup(d_ntt, row(spk.k1), row(spk.k1_shoup), q2)
        acc0 = t0 if acc0 is None else p.add(acc0, t0, q2)
        acc1 = t1 if acc1 is None else p.add(acc1, t1, q2)
    inv0 = ntt.inverse(acc0, tb)
    inv1 = ntt.inverse(acc1, tb)

    # Mod-switch QP -> Q: x -> round(x / P) (shared RNS divide-and-round).
    scale_down = make_divide_round_last(ctx.tables, ctx.moduli, spk.P, K)
    return scale_down(inv0), scale_down(inv1)


def sp_relinearize(ctx: BFVContext, ct: Ciphertext, spk: SPKeys) -> Ciphertext:
    """Size-3 -> size-2 using special-prime switching of c2 (coeff domain)."""
    assert ct.size == 3 and ct.domain == "coeff"
    p = ctx.prof
    q2 = ctx.tables.q_b(1)
    c0, c1, c2 = ct.polys
    d0, d1 = sp_keyswitch(ctx, spk, c2)
    return Ciphertext((p.add(c0, d0, q2), p.add(c1, d1, q2)), "coeff")


def create_sp_galois_keys(ctx: BFVContext, keygen, g: int, key) -> SPKeys:
    """Special-prime Galois keys: target sigma_g(s) over QP."""
    from . import sampling
    from .galois import apply_galois_plain

    qp = build_ctx_qp(ctx)
    ctx_qp = qp[0]
    s_coeff_qp = sampling.ternary_poly(keygen._key_s, ctx_qp)
    target = ntt.forward(
        apply_galois_plain(ctx_qp, s_coeff_qp, g), ctx_qp.tables
    )
    return create_sp_kswitch_keys(ctx, keygen, target, key, qp=qp)


def apply_galois_sp(ctx: BFVContext, ct: Ciphertext, g: int,
                    spk: SPKeys) -> Ciphertext:
    """sigma_g + special-prime key switch back to s (low-noise rotations).

    Thin alias: galois.apply_galois dispatches on the key type."""
    from .galois import apply_galois

    return apply_galois(ctx, ct, g, spk)
