"""Full-RNS BFV ciphertext multiplication (BEHZ variant) + relinearization.

Implements the Bajard–Eynard–Hasan–Zucca integer-only RNS multiply — the
algorithm class SEAL 4.1 uses for ``Evaluator::multiply`` (the capability the
reference gets from SEAL but never exercises in the demo; it is this
framework's north-star throughput op, BASELINE.md: >=1e6 ct-ct mults/s at
n=4096):

  1. extend both ciphertexts from base Q to auxiliary base B_sk via
     m_tilde-scaled fast base conversion + small Montgomery reduction,
  2. tensor the ciphertexts in NTT domain over Q and B_sk,
  3. fast floor: w ~ floor(t * e / q) computed in B_sk,
  4. Shenoy–Kumaresan exact conversion B_sk -> Q.

Everything is u32-lane arithmetic (m31 profile: all primes < 2^30). The base
conversions are per-coefficient mod-matrix contractions accumulated in 96-bit
limbs and Barrett-reduced once per target modulus.

Relinearization uses the RNS gadget g_i (=1 mod q_i, =0 mod q_j): digits are
simply the per-limb residues of c2, so key switching is k NTTs + 2k pointwise
multiplies against NTT-domain relin keys.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import modmath as mm
from ..ops import ntt
from ..ops.primes import Modulus, get_primes, is_prime
from .ciphertext import Ciphertext
from .context import BFVContext

__all__ = ["RnsMultiplier", "RelinKeys", "create_relin_keys", "relinearize"]

M_TILDE_BITS = 16
M_TILDE = 1 << M_TILDE_BITS


def _u32s(vals):
    return jnp.asarray(np.asarray(vals, dtype=np.uint32))


def _shoup32(w, q):
    return (int(w) << 32) // int(q)


def _reduce96(z0, z1, z2, q, mu_lo, mu_hi):
    """(z2*2^64 + z1*2^32 + z0) mod q, q < 2^30."""
    r12 = mm.m31.reduce64(z1, z2, q, mu_lo, mu_hi)
    return mm.m31.reduce64(z0, r12, q, mu_lo, mu_hi)


@dataclass(frozen=True, eq=False)
class _Basis:
    """A prime basis with its NTT tables and per-limb Barrett constants."""

    moduli: tuple[Modulus, ...]
    tables: ntt.NttTables

    @property
    def k(self):
        return len(self.moduli)

    def q_col(self):  # [k, 1] for [..., k, n] activations
        return self.tables.q[:, None]

    def mu_col(self):
        return tuple(m[:, None] for m in self.tables.mu)


def _conv_matrix(src: _Basis, dst_moduli: list[int]) -> tuple:
    """|prod(src)/src_i|_m  as [D, S] u32 with per-(D,S) values."""
    prod = 1
    for m in src.moduli:
        prod *= m.value
    mat = [[(prod // s.value) % d for s in src.moduli] for d in dst_moduli]
    return _u32s(mat)


class RnsMultiplier:
    """BEHZ multiplier bound to one BFVContext (m31 profile only)."""

    def __init__(self, ctx: BFVContext):
        if ctx.tables.profile != "m31":
            raise NotImplementedError(
                "ct-ct multiply currently requires the TPU chain profile "
                "(<2^30 primes); use EncryptionParameters.bfv(..., "
                "profile='tpu')"
            )
        self.ctx = ctx
        n = ctx.n
        t = ctx.t
        k = ctx.L
        q_values = [m.value for m in ctx.moduli]
        q = ctx.q

        # Size the auxiliary base: need prod(B) > 2 * n * t * q (SK bound on
        # |w| ~ t*e/q) with margin for the uncentered sm_mrq (x_hat < 2q).
        need_bits = q.bit_length() + t.bit_length() + n.bit_length() + 6
        l = max(k + 1, (need_bits + 28) // 29)
        # B primes: 30-bit NTT-friendly primes distinct from Q's.
        pool = [p for p in get_primes(30, l + k + 2, n) if p not in q_values]
        b_values = pool[: l]
        msk = pool[l]
        assert len(b_values) == l

        self.base_q = _Basis(ctx.moduli, ctx.tables)
        bsk_moduli = [Modulus(p) for p in b_values + [msk]]
        self.base_bsk = _Basis(
            tuple(bsk_moduli),
            ntt.build_tables(bsk_moduli, n, engine=ctx.tables.engine),
        )
        self.l = l
        self.msk = msk
        M = 1
        for p in b_values:
            M *= p

        qm = [m.value for m in ctx.moduli]
        # --- Q -> B_sk u {m_tilde} conversion constants -------------------
        # y_i = x_i * |m_tilde * (q/q_i)^{-1}|_{q_i}  (merged constant).
        mrg = [
            (M_TILDE * pow(q // qi, -1, qi)) % qi for qi in qm
        ]
        self.mtilde_qhat_inv = (_u32s(mrg)[:, None],
                                _u32s([_shoup32(v, qi) for v, qi in zip(mrg, qm)])[:, None])
        self.conv_q_to_bsk = _conv_matrix(self.base_q, [m.value for m in bsk_moduli])
        self.conv_q_to_mtilde = _u32s([(q // qi) % M_TILDE for qi in qm])
        # sm_mrq constants.
        self.neg_inv_q_mtilde = int(pow(-q, -1, M_TILDE))
        self.q_mod_bsk = _u32s([q % m.value for m in bsk_moduli])[:, None]
        inv_mtilde = [pow(M_TILDE, -1, m.value) for m in bsk_moduli]
        self.inv_mtilde_bsk = (
            _u32s(inv_mtilde)[:, None],
            _u32s([_shoup32(v, m.value) for v, m in zip(inv_mtilde, bsk_moduli)])[:, None],
        )
        # --- fast floor constants ----------------------------------------
        tq = [t % qi for qi in qm]
        self.t_mod_q = (_u32s(tq)[:, None],
                        _u32s([_shoup32(v, qi) for v, qi in zip(tq, qm)])[:, None])
        tb = [t % m.value for m in bsk_moduli]
        self.t_mod_bsk = (_u32s(tb)[:, None],
                          _u32s([_shoup32(v, m.value) for v, m in zip(tb, bsk_moduli)])[:, None])
        invq_b = [pow(q % m.value, -1, m.value) for m in bsk_moduli]
        self.inv_q_bsk = (
            _u32s(invq_b)[:, None],
            _u32s([_shoup32(v, m.value) for v, m in zip(invq_b, bsk_moduli)])[:, None],
        )
        # --- B_sk -> Q (Shenoy-Kumaresan) constants -----------------------
        b_basis_moduli = bsk_moduli[:-1]
        bhat_inv = [pow(M // p.value, -1, p.value) for p in b_basis_moduli]
        self.bhat_inv = (
            _u32s(bhat_inv)[:, None],
            _u32s([_shoup32(v, p.value) for v, p in zip(bhat_inv, b_basis_moduli)])[:, None],
        )
        b_only = _Basis(tuple(b_basis_moduli), self.base_bsk.tables)  # tables unused
        self.conv_b_to_q = _conv_matrix(b_only, qm)
        self.conv_b_to_msk = _conv_matrix(b_only, [msk])
        inv_M_msk = pow(M % msk, -1, msk)
        self.inv_M_msk = (jnp.uint32(inv_M_msk), jnp.uint32(_shoup32(inv_M_msk, msk)))
        Mq = [M % qi for qi in qm]
        self.M_mod_q = (_u32s(Mq)[:, None],
                        _u32s([_shoup32(v, qi) for v, qi in zip(Mq, qm)])[:, None])
        # Residues of m_sk * M, added back where centered alpha is negative.
        self.mskM_mod_q = _u32s([(msk * M) % qi for qi in qm])[:, None]
        self.msk_idx = l  # position of m_sk inside base_bsk

    # ------------------------------------------------------------------

    def _fastbconv(self, y, conv, dst: _Basis | None, dst_q=None, dst_mu=None):
        """sum_i y[..., i, :] * conv[d, i] mod dst_d -> [..., D, n].

        y entries < 2^30, conv < 2^30: accumulate exact 96-bit sums.
        """
        D, S = conv.shape
        z0 = z1 = z2 = None
        for i in range(S):
            yi = y[..., i : i + 1, :]  # [..., 1, n]
            ci = conv[:, i][:, None]  # [D, 1]
            lo, hi = mm.mul32(yi, ci)  # broadcast -> [..., D, n]
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
        if dst is not None:
            dst_q = dst.q_col()
            dst_mu = dst.mu_col()
        return _reduce96(z0, z1, z2, dst_q, dst_mu[0], dst_mu[1])

    def _to_bsk(self, x_q):
        """Base extension Q -> B_sk with m_tilde Montgomery correction.

        x_q: [..., k, n] residues. Returns [..., l+1, n] residues in B_sk.
        """
        p = mm.m31
        bq = self.base_q
        y = p.mulmod_shoup(x_q, *self.mtilde_qhat_inv, bq.q_col())
        x_bsk = self._fastbconv(y, self.conv_q_to_bsk, self.base_bsk)
        # m_tilde component: 16-bit arithmetic, mod = mask.
        mask = jnp.uint32(M_TILDE - 1)
        acc = jnp.zeros_like(y[..., 0, :])
        for i in range(bq.k):
            acc = (acc + (y[..., i, :] & mask) * self.conv_q_to_mtilde[i]) & mask
        r = (acc * jnp.uint32(self.neg_inv_q_mtilde)) & mask
        # x_hat = (x' + q * r) / m_tilde per B_sk modulus.
        lo, hi = mm.mul32(self.q_mod_bsk, r[..., None, :])
        bsk_q = self.base_bsk.q_col()
        bsk_mu = self.base_bsk.mu_col()
        corr = mm.m31.reduce64(lo, hi, bsk_q, bsk_mu[0], bsk_mu[1])
        x_bsk = p.add(x_bsk, corr, bsk_q)
        return p.mulmod_shoup(x_bsk, *self.inv_mtilde_bsk, bsk_q)

    def _fast_floor(self, e_q, e_bsk):
        """floor(t * e / q) (with BEHZ-bounded error) expressed in B_sk."""
        p = mm.m31
        bq, bb = self.base_q, self.base_bsk
        te_q = p.mulmod_shoup(e_q, *self.t_mod_q, bq.q_col())
        te_b = p.mulmod_shoup(e_bsk, *self.t_mod_bsk, bb.q_col())
        # FastBconv(te_q, Q -> B_sk): first scale by qhat_inv.
        qhat_inv = self._qhat_inv_consts()
        y = p.mulmod_shoup(te_q, *qhat_inv, bq.q_col())
        conv = self._fastbconv(y, self._conv_q_to_bsk_plain(), bb)
        return p.mulmod_shoup(p.sub(te_b, conv, bb.q_col()), *self.inv_q_bsk, bb.q_col())

    @functools.cache
    def _qhat_inv_consts(self):
        qm = [m.value for m in self.ctx.moduli]
        q = self.ctx.q
        vals = [pow(q // qi, -1, qi) for qi in qm]
        return (_u32s(vals)[:, None],
                _u32s([_shoup32(v, qi) for v, qi in zip(vals, qm)])[:, None])

    @functools.cache
    def _conv_q_to_bsk_plain(self):
        return _conv_matrix(self.base_q, [m.value for m in self.base_bsk.moduli])

    def _sk_to_q(self, w_bsk):
        """Shenoy-Kumaresan exact conversion B_sk -> Q."""
        p = mm.m31
        bq = self.base_q
        l = self.l
        w_b = w_bsk[..., :l, :]
        w_msk = w_bsk[..., l, :]
        y = p.mulmod_shoup(
            w_b, *self.bhat_inv,
            self.base_bsk.q_col()[:l],
        )
        conv_q = self._fastbconv(y, self.conv_b_to_q, self.base_q)
        msk_mod = self.base_bsk.moduli[l]
        msk_q = self.base_bsk.tables.q[l]
        msk_mu = tuple(m[l] for m in self.base_bsk.tables.mu)
        conv_msk = self._fastbconv(
            y, self.conv_b_to_msk, None,
            dst_q=msk_q, dst_mu=msk_mu,
        )[..., 0, :]
        diff = mm.m31.sub(conv_msk, w_msk, msk_q)
        alpha = mm.m31.mulmod_shoup(diff, *self.inv_M_msk, msk_q)
        # out = conv_q - alpha*M; where alpha represents a negative (centered
        # alpha = alpha - m_sk), add back m_sk*M.
        am = p.mulmod_shoup(alpha[..., None, :], *self.M_mod_q, bq.q_col())
        out = p.sub(conv_q, am, bq.q_col())
        corr = p.add(out, jnp.broadcast_to(self.mskM_mod_q, out.shape), bq.q_col())
        high = (alpha > jnp.uint32(self.msk // 2))[..., None, :]
        return jnp.where(high, corr, out)

    # ------------------------------------------------------------------

    def multiply(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        """BFV multiply: (c0,c1) x (d0,d1) -> size-3 ciphertext in Q."""
        assert ct1.size == 2 and ct2.size == 2
        assert ct1.domain == "coeff" and ct2.domain == "coeff"
        tq, tb = self.base_q.tables, self.base_bsk.tables
        p = mm.m31

        def prep(poly):
            bsk = self._to_bsk(poly)
            return (ntt.forward(poly, tq), ntt.forward(bsk, tb))

        c0, c1 = (prep(x) for x in ct1.polys)
        d0, d1 = (prep(x) for x in ct2.polys)

        es = []
        for basis_i, tbx in ((0, tq), (1, tb)):
            q_col = tbx.q[:, None]
            a0, a1 = c0[basis_i], c1[basis_i]
            b0, b1 = d0[basis_i], d1[basis_i]
            e0 = ntt.pointwise_mul(a0, b0, tbx)
            e2 = ntt.pointwise_mul(a1, b1, tbx)
            # Karatsuba: e1 = (a0+a1)(b0+b1) - e0 - e2 (3 multiplies).
            cross = ntt.pointwise_mul(
                p.add(a0, a1, q_col), p.add(b0, b1, q_col), tbx
            )
            e1 = p.sub(p.sub(cross, e0, q_col), e2, q_col)
            es.append(tuple(ntt.inverse(e, tbx) for e in (e0, e1, e2)))

        out_polys = []
        for j in range(3):
            w = self._fast_floor(es[0][j], es[1][j])
            out_polys.append(self._sk_to_q(w))
        return Ciphertext(tuple(out_polys), "coeff")


# ---------------------------------------------------------------------------
# Relinearization
# ---------------------------------------------------------------------------


@dataclass
class RelinKeys:
    """RNS-gadget key-switching keys: rlk[i] = (b_i, a_i) in NTT domain,
    b_i = -(a_i s + e_i) + g_i s^2 where g_i = 1 mod q_i, 0 mod q_j."""

    k0: Any  # [k, L, n] stacked b_i (with Shoup companions)
    k0_shoup: Any
    k1: Any
    k1_shoup: Any


def create_relin_keys(ctx: BFVContext, sk, key) -> RelinKeys:
    from . import sampling
    from .keys import _shoup

    p = ctx.prof
    q2 = ctx.tables.q_b(1)
    k = ctx.L
    k0_rows, k1_rows = [], []
    s2 = p.mulmod_shoup(sk.s_ntt, sk.s_ntt, sk.s_shoup, q2)
    for i in range(k):
        key, ka, ke = jax.random.split(key, 3)
        a = sampling.uniform_rq(ka, ctx)
        e_ntt = ntt.forward(sampling.cbd_poly(ke, ctx), ctx.tables)
        b = p.neg(p.add(p.mulmod_shoup(a, sk.s_ntt, sk.s_shoup, q2), e_ntt, q2), q2)
        # add g_i * s^2: only limb i gets s^2.
        sel = jnp.zeros((k, 1), jnp.uint32).at[i, 0].set(1)
        gs2 = jax.tree.map(lambda v: v * sel, s2)
        b = p.add(b, gs2, q2)
        k0_rows.append(b)
        k1_rows.append(a)
    stack = lambda rows: jax.tree.map(lambda *xs: jnp.stack(xs), *rows)
    k0 = stack(k0_rows)
    k1 = stack(k1_rows)
    from .keys import _shoup as sh

    # Shoup companions per key row.
    def row_shoup(rows):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[sh(ctx, r) for r in rows])

    return RelinKeys(
        k0=k0, k0_shoup=row_shoup(k0_rows), k1=k1, k1_shoup=row_shoup(k1_rows)
    )


def relinearize(ctx: BFVContext, ct: Ciphertext, rlk: RelinKeys) -> Ciphertext:
    """Size-3 -> size-2: key-switch c2 using the RNS gadget digits |c2|_{q_i}."""
    assert ct.size == 3 and ct.domain == "coeff"
    p = mm.m31 if ctx.tables.profile == "m31" else None
    if p is None:
        raise NotImplementedError("relinearize requires the m31 profile")
    tb = ctx.tables
    q2 = tb.q_b(1)
    mu2 = tuple(m[:, None] for m in tb.mu)
    c0, c1, c2 = ct.polys
    k = ctx.L
    # Digits: lift |c2|_{q_i} to the full basis, NTT once per digit.
    acc0 = acc1 = None
    for i in range(k):
        digit = c2[..., i : i + 1, :]  # [..., 1, n]
        lifted = p.reduce64(
            jnp.broadcast_to(digit, c2.shape), jnp.zeros_like(c2), tb.q[:, None],
            mu2[0], mu2[1],
        )
        d_ntt = ntt.forward(lifted, tb)
        t0 = p.mulmod_shoup(
            d_ntt, jax.tree.map(lambda a: a[i], rlk.k0),
            jax.tree.map(lambda a: a[i], rlk.k0_shoup), q2,
        )
        t1 = p.mulmod_shoup(
            d_ntt, jax.tree.map(lambda a: a[i], rlk.k1),
            jax.tree.map(lambda a: a[i], rlk.k1_shoup), q2,
        )
        acc0 = t0 if acc0 is None else p.add(acc0, t0, q2)
        acc1 = t1 if acc1 is None else p.add(acc1, t1, q2)
    new0 = p.add(c0, ntt.inverse(acc0, tb), q2)
    new1 = p.add(c1, ntt.inverse(acc1, tb), q2)
    return Ciphertext((new0, new1), "coeff")
