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


@dataclass
class SPKeys:
    """Key-switch keys over QP toward a target secret T (s² for relin)."""

    ctx_qp: BFVContext   # basis Q ∪ {P}; P is the last limb
    P: int
    k0: Any              # [k, K, n] NTT-domain b_i rows (K = k+1)
    k0_shoup: Any
    k1: Any
    k1_shoup: Any
    # Scale-down constants over Q:
    inv_P: Any           # [k, 1] (P^{-1} mod q_j, with Shoup companion)
    inv_P_shoup: Any
    P_mod_q: Any         # [k, 1]
    P_half: int


def build_ctx_qp(ctx: BFVContext) -> tuple[BFVContext, int]:
    """Extend Q with one special prime P (largest available NTT-friendly
    prime below 2^30 not already in Q) and build a context over QP."""
    if ctx.tables.profile != "m31":
        raise NotImplementedError("special-prime key switching: m31 chains only")
    used = {m.value for m in ctx.moduli}
    pool = [p for p in get_primes(30, ctx.L + 4, ctx.n) if p not in used]
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
        gw = _u32col(gi)
        gws = _u32col(
            [(v << 32) // m.value for v, m in zip(gi, ctx_qp.moduli)]
        )
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
    inv_P = [pow(P, -1, m.value) for m in ctx.moduli]
    return SPKeys(
        ctx_qp=ctx_qp,
        P=P,
        k0=stack(k0_rows), k0_shoup=row_shoup(k0_rows),
        k1=stack(k1_rows), k1_shoup=row_shoup(k1_rows),
        inv_P=_u32col(inv_P),
        inv_P_shoup=_u32col(
            [(v << 32) // m.value for v, m in zip(inv_P, ctx.moduli)]
        ),
        P_mod_q=_u32col([P % m.value for m in ctx.moduli]),
        P_half=P // 2,
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
    ctx_qp = spk.ctx_qp
    tb = ctx_qp.tables
    p = ctx_qp.prof
    q2 = tb.q_b(1)
    k, K = ctx.L, ctx_qp.L
    q_col = tb.q[:, None]
    mu_lo, mu_hi = (m[:, None] for m in tb.mu)

    acc0 = acc1 = None
    for i in range(k):
        digit = poly[..., i : i + 1, :]
        lifted = m31.reduce64(
            jnp.broadcast_to(digit, poly.shape[:-2] + (K, poly.shape[-1])),
            jnp.zeros(poly.shape[:-2] + (K, poly.shape[-1]), jnp.uint32),
            q_col, mu_lo, mu_hi,
        )
        d_ntt = ntt.forward(lifted, tb)
        t0 = p.mulmod_shoup(d_ntt, spk.k0[i], spk.k0_shoup[i], q2)
        t1 = p.mulmod_shoup(d_ntt, spk.k1[i], spk.k1_shoup[i], q2)
        acc0 = t0 if acc0 is None else p.add(acc0, t0, q2)
        acc1 = t1 if acc1 is None else p.add(acc1, t1, q2)
    inv0 = ntt.inverse(acc0, tb)
    inv1 = ntt.inverse(acc1, tb)

    # Mod-switch QP -> Q: x -> round(x / P) (centered digit, like rescale).
    ctxq = ctx
    q2q = ctxq.tables.q_b(1)
    qq = ctxq.tables.q[:, None]
    muq = tuple(m[:, None] for m in ctxq.tables.mu)

    def scale_down(x):
        last = x[..., K - 1, :]
        head = x[..., :k, :]
        d = jnp.broadcast_to(last[..., None, :], head.shape)
        d_red = m31.reduce64(d, jnp.zeros_like(d), qq, muq[0], muq[1])
        out = m31.sub(head, d_red, q2q)
        high = jnp.broadcast_to(
            (last > jnp.uint32(spk.P_half))[..., None, :], head.shape
        )
        out = jnp.where(
            high, m31.add(out, jnp.broadcast_to(spk.P_mod_q, out.shape), q2q), out
        )
        return m31.mulmod_shoup(out, spk.inv_P, spk.inv_P_shoup, q2q)

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
