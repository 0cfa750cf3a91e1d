"""Single-kernel BEHZ ciphertext multiply + relinearization, VMEM-resident.

Why this exists (measured on hardware, round 2): the op-by-op multiply graph
is HBM-bandwidth bound, not VPU bound. A full mult+relin at n=4096/L=3 sweeps
~19 MB of HBM across ~80 NTT passes, while the integer arithmetic itself is
nearly free at that arithmetic intensity (a Shoup mulmod costs the same wall
time as a bare add on batch-filling arrays). This kernel loads one batch tile
of ciphertexts, runs EVERY phase of the BEHZ multiply — m_tilde base extension
Q -> B_sk, forward NTTs over both bases, Karatsuba tensor product, inverse
NTTs, fast floor, Shenoy–Kumaresan exact conversion — plus the RNS-gadget
relinearization, entirely out of VMEM, and writes back only the final size-2
ciphertext. HBM traffic per multiply drops from ~19 MB to ~300 KB.

Math and constants are identical to behz.RnsMultiplier / behz.relinearize
(same BEHZ variant SEAL 4.1 uses for Evaluator::multiply, the capability the
reference consumes via SEAL — /root/reference/CMakeLists.txt:29); spectra use
the transpose-free vmem NTT ordering, so contexts must be built with
engine="vmem" and relinearization keys generated under that engine.

m31 profile only (q < 2^30): this is the TPU-fast chain the throughput
north-star (BASELINE.md) is scored on.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import modmath as mm
from ..ops.modmath import m31
from ..ops.ntt4 import C2
from ..ops.ntt_vmem import _interpret_default
from ..ops.ntt_vmem import (
    _bf_ct_split, _bf_ct_z, _bf_gs_split, _bf_gs_z,
    _expand_q, _vtables,
)
from .behz import M_TILDE, KSwitchKeys, RnsMultiplier
from .ciphertext import Ciphertext
from .context import BFVContext

__all__ = ["FusedMultiplier"]


def _col(vals):
    """Python ints -> np [K, 1, 1] broadcastable against [T, K, c1, C2]."""
    return np.asarray([int(v) for v in vals], dtype=np.uint32).reshape(-1, 1, 1)


def _conv_arr(conv):
    """[D][S] int table -> np [S, D, 1, 1] (per-source-limb dst columns)."""
    S, D = len(conv[0]), len(conv)
    out = np.zeros((S, D, 1, 1), np.uint32)
    for d in range(D):
        for s in range(S):
            out[s, d, 0, 0] = conv[d][s] & 0xFFFFFFFF
    return out


def _build_const_arrays(mul: RnsMultiplier) -> dict[str, np.ndarray]:
    """Every per-limb constant the kernel needs, as named input arrays."""
    ctx = mul.ctx
    qmods = ctx.moduli
    bmods = mul.base_bsk.moduli
    b_basis = bmods[: mul.l]
    msk = mul.base_msk.moduli[0]

    def shoup(vals, mods):
        w = _col([int(v) % m.value for v, m in zip(vals, mods)])
        ws = _col([((int(v) % m.value) << 32) // m.value
                   for v, m in zip(vals, mods)])
        return w, ws

    d = {}
    d["qq"] = _col([m.value for m in qmods])
    d["mu_q_lo"] = _col([m.mu64 & 0xFFFFFFFF for m in qmods])
    d["mu_q_hi"] = _col([m.mu64 >> 32 for m in qmods])
    d["qb"] = _col([m.value for m in bmods])
    d["mu_b_lo"] = _col([m.mu64 & 0xFFFFFFFF for m in bmods])
    d["mu_b_hi"] = _col([m.mu64 >> 32 for m in bmods])
    d["qb_b"] = _col([m.value for m in b_basis])
    d["q_msk"] = _col([msk.value])
    d["mu_msk_lo"] = _col([msk.mu64 & 0xFFFFFFFF])
    d["mu_msk_hi"] = _col([msk.mu64 >> 32])
    def conv_shoup(conv, mods):
        """[D][S] table -> ([S,D,1,1] consts, [S,D,1,1] Shoup per q_d)."""
        S, D = len(conv[0]), len(conv)
        w = np.zeros((S, D, 1, 1), np.uint32)
        ws = np.zeros((S, D, 1, 1), np.uint32)
        for dd in range(D):
            qd = mods[dd].value
            for s in range(S):
                c = int(conv[dd][s]) % qd
                w[s, dd, 0, 0] = c
                ws[s, dd, 0, 0] = (c << 32) // qd
        return w, ws

    d["mqh_w"], d["mqh_ws"] = shoup(mul.mtilde_qhat_inv_ints, qmods)
    d["conv_q_to_bsk"] = _conv_arr(mul.conv_q_to_bsk)
    d["cqb_w"], d["cqb_ws"] = conv_shoup(mul.conv_q_to_bsk, bmods)
    d["cqbp_w"], d["cqbp_ws"] = conv_shoup(
        [list(r) for r in mul.conv_q_to_bsk_plain()], bmods
    )
    d["cbq_w"], d["cbq_ws"] = conv_shoup(mul.conv_b_to_q, qmods)
    d["cbm_w"], d["cbm_ws"] = conv_shoup(
        mul.conv_b_to_msk, mul.base_msk.moduli
    )
    d["q_mod_bsk"] = _col(mul.q_mod_bsk_ints)
    d["imt_w"], d["imt_ws"] = shoup(mul.inv_mtilde_bsk_ints, bmods)
    d["tq_w"], d["tq_ws"] = shoup(mul.t_mod_q_ints, qmods)
    d["tb_w"], d["tb_ws"] = shoup(mul.t_mod_bsk_ints, bmods)
    d["iqb_w"], d["iqb_ws"] = shoup(mul.inv_q_bsk_ints, bmods)
    d["qhi_w"], d["qhi_ws"] = shoup(mul.qhat_inv_ints, qmods)
    d["conv_q_to_bsk_plain"] = _conv_arr(
        [list(r) for r in mul.conv_q_to_bsk_plain()]
    )
    d["bhat_w"], d["bhat_ws"] = shoup(mul.bhat_inv_b, b_basis)
    d["conv_b_to_q"] = _conv_arr(mul.conv_b_to_q)
    d["conv_b_to_msk"] = _conv_arr(mul.conv_b_to_msk)
    d["imm_w"], d["imm_ws"] = shoup([mul.inv_M_msk_int], [msk])
    d["mmq_w"], d["mmq_ws"] = shoup(mul.M_mod_q_ints, qmods)
    d["mskM_mod_q"] = _col(mul.mskM_mod_q_ints)
    return d


# ---------------------------------------------------------------------------
# In-kernel building blocks. All activations are [T, K, c1, C2]; per-limb
# constants broadcast as [K, 1, 1]. ``kc`` is the namespace of loaded consts.
# ---------------------------------------------------------------------------


def _ntt_fwd(x, tabs, q, c1, logc1):
    """Forward vmem-order NTT over the limb axis; canonical in, lazy (<2q) out.

    One formulation only (the round-2 "v2" split/z form): the round-4 prune
    of the PPLP_NTT_FORM / PPLP_CONV_FORM env matrix (VERDICT r3 #4) — the
    variant forks never produced a winner and a crypto kernel should have
    exactly one production form."""
    aw, aws, cw, cws, amf, cmf, twm, twms = tabs
    qx = _expand_q(q)
    for s in range(logc1):
        t = c1 >> (s + 1)
        x = _bf_ct_split(x, aw[:, s], aws[:, s], t, qx, c1)
    x = m31.mulmod_shoup_lazy(x, twm, twms, q)
    for s in range(7):
        t = C2 >> (s + 1)
        x = _bf_gs_z(x, cw[:, s], cws[:, s], cmf[s], t, q, C2, 3)
    return x  # [0, 2q)


def _ntt_inv(x, tabs, q, c1, logc1):
    """Inverse (consumes _ntt_fwd order); any <4q in, canonical out."""
    iaw, iaws, icw, icws, ami, cmi, itwm, itwms, icwz, icwzs = tabs
    qx = _expand_q(q)
    for s in range(7):
        t = 1 << s
        x = _bf_ct_z(x, icwz[:, s], icwzs[:, s], cmi[s], t, q, C2, 3)
    x = m31.mulmod_shoup_lazy(x, itwm, itwms, q)
    for s in range(logc1):
        t = 1 << s
        x = _bf_gs_split(x, iaw[:, s], iaws[:, s], t, qx, c1)
    return m31.csub(x, q)


def _reduce32u(x, q, mu_hi):
    """x < 2^31 -> canonical mod q via one Barrett step.

    mu_hi = floor(2^32 / q) (the high u32 limb of floor(2^64/q));
    remainder after the estimate is < 2.5q, so two csubs canonicalize."""
    est = mm.mulhi32(x, mu_hi)
    r = x - est * q
    r = m31.csub(r, q)
    return m31.csub(r, q)


def _accum_shoup(y, w, ws, qd, mu_hi):
    """Fast base conversion sum_s y[:, s] * c[s, d] mod q_d via lazy Shoup.

    y: [T, S, c1, C2]; w/ws: [S, D, 1, 1] conv constants (+ Shoup, per
    target modulus); qd/mu_hi: [D, 1, 1]. Returns [T, D, c1, C2].
    Each lazy product is < 2q_d; the S-term sum stays < 2^31 for S <= 32,
    one Barrett step canonicalizes. ~2x fewer vector ops than the 96-bit
    column accumulation (_accum96) for the S<=6 bases BEHZ uses."""
    S = w.shape[0]
    acc = None
    for i in range(S):
        term = m31.mulmod_shoup_lazy(y[:, i : i + 1], w[i], ws[i], qd)
        acc = term if acc is None else acc + term
    return _reduce32u(acc, qd, mu_hi)


def _to_bsk(x_q, kc, mt_ints):
    """Base extension Q -> B_sk with the m_tilde Montgomery correction.

    Mirrors RnsMultiplier._to_bsk (same constants, limb axis at -3)."""
    conv_q_to_mtilde, neg_inv_q_mtilde = mt_ints
    y = m31.mulmod_shoup(x_q, kc.mqh_w, kc.mqh_ws, kc.qq)
    x_bsk = _accum_shoup(y, kc.cqb_w, kc.cqb_ws, kc.qb, kc.mu_b_hi)
    mask = jnp.uint32(M_TILDE - 1)
    acc = None
    for i, cmt in enumerate(conv_q_to_mtilde):
        term = ((y[:, i] & mask) * jnp.uint32(cmt)) & mask
        acc = term if acc is None else (acc + term) & mask
    r = (acc * jnp.uint32(neg_inv_q_mtilde)) & mask
    lo, hi = mm.mul32(kc.q_mod_bsk, r[:, None])
    corr = m31.reduce64(lo, hi, kc.qb, kc.mu_b_lo, kc.mu_b_hi)
    x_bsk = m31.add(x_bsk, corr, kc.qb)
    return m31.mulmod_shoup(x_bsk, kc.imt_w, kc.imt_ws, kc.qb)


def _fast_floor(e_q, e_b, kc):
    te_q = m31.mulmod_shoup(e_q, kc.tq_w, kc.tq_ws, kc.qq)
    te_b = m31.mulmod_shoup(e_b, kc.tb_w, kc.tb_ws, kc.qb)
    y = m31.mulmod_shoup(te_q, kc.qhi_w, kc.qhi_ws, kc.qq)
    conv = _accum_shoup(y, kc.cqbp_w, kc.cqbp_ws, kc.qb, kc.mu_b_hi)
    return m31.mulmod_shoup(
        m31.sub(te_b, conv, kc.qb), kc.iqb_w, kc.iqb_ws, kc.qb
    )


def _sk_to_q(w_bsk, kc, l, msk_half):
    w_b = w_bsk[:, :l]
    w_msk = w_bsk[:, l : l + 1]
    y = m31.mulmod_shoup(w_b, kc.bhat_w, kc.bhat_ws, kc.qb_b)
    conv_q = _accum_shoup(y, kc.cbq_w, kc.cbq_ws, kc.qq, kc.mu_q_hi)
    conv_msk = _accum_shoup(
        y, kc.cbm_w, kc.cbm_ws, kc.q_msk, kc.mu_msk_hi
    )
    diff = m31.sub(conv_msk, w_msk, kc.q_msk)
    alpha = m31.mulmod_shoup(diff, kc.imm_w, kc.imm_ws, kc.q_msk)
    am = m31.mulmod_shoup(
        jnp.broadcast_to(alpha, conv_q.shape), kc.mmq_w, kc.mmq_ws, kc.qq
    )
    out = m31.sub(conv_q, am, kc.qq)
    corr = m31.add(out, jnp.broadcast_to(kc.mskM_mod_q, out.shape), kc.qq)
    high = alpha > jnp.uint32(msk_half)
    return jnp.where(high, corr, out)


def _karatsuba(a0, a1, b0, b1, q, mu_lo, mu_hi):
    """(e0, e1, e2) from lazy (<2q) spectra; canonical outputs."""
    e0 = m31.mulmod(a0, b0, q, mu_lo, mu_hi)
    e2 = m31.mulmod(a1, b1, q, mu_lo, mu_hi)
    cross = m31.mulmod(a0 + a1, b0 + b1, q, mu_lo, mu_hi)  # <4q ops, 64-bit ok
    e1 = m31.sub(m31.sub(cross, e0, q), e2, q)
    return e0, e1, e2


_N_TABS = 36  # twiddle-table refs preceding the const refs in the arg list


def _kernel(const_names, mt_ints, l, msk_half, c1, logc1, kq, do_relin,
            *refs):
    (qaw, qaws, qcw, qcws, qtw, qtws,
     qiaw, qiaws, qicw, qicws, qitw, qitws,
     baw, baws, bcw, bcws, btw, btws,
     biaw, biaws, bicw, bicws, bitw, bitws,
     amf, ami, cmf, cmi,
     k0, k0s, k1, k1s,
     qicwz, qicwzs, bicwz, bicwzs) = refs[:_N_TABS]
    n_const = len(const_names)
    kc = SimpleNamespace(**{
        name: refs[_N_TABS + i][...] for i, name in enumerate(const_names)
    })
    x1_ref, x2_ref, o_ref = refs[_N_TABS + n_const :]

    T = x1_ref.shape[0]
    n = c1 * C2
    qf_tabs = (qaw[...], qaws[...], qcw[...], qcws[...], amf[...], cmf[...],
               qtw[...], qtws[...])
    qi_tabs = (qiaw[...], qiaws[...], qicw[...], qicws[...], ami[...],
               cmi[...], qitw[...], qitws[...], qicwz[...], qicwzs[...])
    bf_tabs = (baw[...], baws[...], bcw[...], bcws[...], amf[...], cmf[...],
               btw[...], btws[...])
    bi_tabs = (biaw[...], biaws[...], bicw[...], bicws[...], ami[...],
               cmi[...], bitw[...], bitws[...], bicwz[...], bicwzs[...])

    x1 = x1_ref[...].reshape(T, 2, kq, c1, C2)
    x2 = x2_ref[...].reshape(T, 2, kq, c1, C2)

    # Phase 1+2: base-extend and transform all four polys.
    spec_q, spec_b = [], []
    for poly in (x1[:, 0], x1[:, 1], x2[:, 0], x2[:, 1]):
        bsk = _to_bsk(poly, kc, mt_ints)
        spec_q.append(_ntt_fwd(poly, qf_tabs, kc.qq, c1, logc1))
        spec_b.append(_ntt_fwd(bsk, bf_tabs, kc.qb, c1, logc1))

    # Phase 3+4: Karatsuba tensor in both bases, back to coefficients.
    eq = _karatsuba(spec_q[0], spec_q[1], spec_q[2], spec_q[3],
                    kc.qq, kc.mu_q_lo, kc.mu_q_hi)
    eb = _karatsuba(spec_b[0], spec_b[1], spec_b[2], spec_b[3],
                    kc.qb, kc.mu_b_lo, kc.mu_b_hi)
    eq = [_ntt_inv(e, qi_tabs, kc.qq, c1, logc1) for e in eq]
    eb = [_ntt_inv(e, bi_tabs, kc.qb, c1, logc1) for e in eb]

    # Phase 5+6: fast floor + Shenoy-Kumaresan back to Q.
    outs = []
    for j in range(3):
        w = _fast_floor(eq[j], eb[j], kc)
        outs.append(_sk_to_q(w, kc, l, msk_half))

    if not do_relin:
        o_ref[...] = jnp.stack(outs, axis=1).reshape(T, 3, kq, n)
        return

    # Phase 7: RNS-gadget relinearization of the degree-2 component.
    k0v = k0[...].reshape(kq, kq, c1, C2)
    k0sv = k0s[...].reshape(kq, kq, c1, C2)
    k1v = k1[...].reshape(kq, kq, c1, C2)
    k1sv = k1s[...].reshape(kq, kq, c1, C2)
    acc0 = acc1 = None
    for i in range(kq):
        dig = jnp.broadcast_to(outs[2][:, i : i + 1], outs[2].shape)
        # dig < q_i < 2^28 < 2^31: one Barrett step lifts it mod each q_j.
        lifted = _reduce32u(dig, kc.qq, kc.mu_q_hi)
        dn = _ntt_fwd(lifted, qf_tabs, kc.qq, c1, logc1)
        t0 = m31.mulmod_shoup(dn, k0v[i], k0sv[i], kc.qq)
        t1 = m31.mulmod_shoup(dn, k1v[i], k1sv[i], kc.qq)
        acc0 = t0 if acc0 is None else m31.add(acc0, t0, kc.qq)
        acc1 = t1 if acc1 is None else m31.add(acc1, t1, kc.qq)
    d0 = _ntt_inv(acc0, qi_tabs, kc.qq, c1, logc1)
    d1 = _ntt_inv(acc1, qi_tabs, kc.qq, c1, logc1)
    out0 = m31.add(outs[0], d0, kc.qq)
    out1 = m31.add(outs[1], d1, kc.qq)

    o_ref[...] = jnp.stack([out0, out1], axis=1).reshape(T, 2, kq, n)


class FusedMultiplier:
    """BEHZ multiply + relinearize as one VMEM-resident Pallas kernel.

    Requires an m31-profile context built with engine="vmem" (spectra and
    relin keys in the transpose-free vmem order). Bit-exact against
    RnsMultiplier.multiply + behz.relinearize on the same context.
    """

    def __init__(self, ctx: BFVContext, rlk: KSwitchKeys, tile_b: int = 4,
                 interpret: bool | None = None):
        assert ctx.tables.profile == "m31", "fused multiplier is m31-only"
        assert ctx.tables.engine == "vmem", (
            "build the context with engine='vmem' so key/ciphertext spectra "
            "use the kernel's NTT ordering"
        )
        self.ctx = ctx
        self.rlk = rlk
        self.tile_b = tile_b
        self.interpret = _interpret_default() if interpret is None else interpret
        self.mul = RnsMultiplier(ctx)
        carrs = _build_const_arrays(self.mul)
        self.const_names = tuple(carrs.keys())
        self.const_arrays = tuple(jnp.asarray(v) for v in carrs.values())
        self.mt_ints = (
            tuple(int(v) for v in self.mul.conv_q_to_mtilde_ints),
            self.mul.neg_inv_q_mtilde,
        )
        self.vt_q = _vtables(ctx.tables.four_step)
        self.vt_b = _vtables(self.mul.base_bsk.tables.four_step)
        self._jit = jax.jit(functools.partial(self._call, True))
        self._jit_norelin = jax.jit(functools.partial(self._call, False))

    def _tables_args(self):
        vq, vb = self.vt_q, self.vt_b
        return (
            vq.aw, vq.aws, vq.cw, vq.cws, vq.base.tw, vq.base.tws,
            vq.iaw, vq.iaws, vq.icw, vq.icws, vq.base.itw, vq.base.itws,
            vb.aw, vb.aws, vb.cw, vb.cws, vb.base.tw, vb.base.tws,
            vb.iaw, vb.iaws, vb.icw, vb.icws, vb.base.itw, vb.base.itws,
            vq.amask[0], vq.amask[1], vq.cmask[0], vq.cmask[1],
            self.rlk.k0, self.rlk.k0_shoup, self.rlk.k1, self.rlk.k1_shoup,
            vq.icwz, vq.icwzs, vb.icwz, vb.icwzs,
        )

    def _call(self, do_relin, x1, x2):
        """x1, x2: [B, 2, L, n] canonical coeff residues -> [B, 2|3, L, n]."""
        ctx = self.ctx
        kq, n = ctx.L, ctx.n
        tb4 = ctx.tables.four_step
        c1, logc1 = tb4.c1, tb4.logc1
        B = x1.shape[0]
        tile = min(self.tile_b, B)
        pad = (-B) % tile
        if pad:
            z = jnp.zeros((pad, 2, kq, n), x1.dtype)
            x1 = jnp.concatenate([x1, z], axis=0)
            x2 = jnp.concatenate([x2, z], axis=0)
        Bp = B + pad
        n_out = 2 if do_relin else 3

        args = self._tables_args() + self.const_arrays
        vm = pltpu.VMEM
        full = lambda a: pl.BlockSpec(
            a.shape, lambda b, _s=len(a.shape): (0,) * _s, memory_space=vm)
        spec_x = pl.BlockSpec((tile, 2, kq, n), lambda b: (b, 0, 0, 0),
                              memory_space=vm)
        spec_o = pl.BlockSpec((tile, n_out, kq, n), lambda b: (b, 0, 0, 0),
                              memory_space=vm)
        out = pl.pallas_call(
            functools.partial(
                _kernel, self.const_names, self.mt_ints, self.mul.l,
                self.mul.msk_half, c1, logc1, kq, do_relin,
            ),
            grid=(Bp // tile,),
            in_specs=[full(a) for a in args] + [spec_x, spec_x],
            out_specs=spec_o,
            out_shape=jax.ShapeDtypeStruct((Bp, n_out, kq, n), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )(*args, x1, x2)
        return out[:B] if pad else out

    def _run(self, jitted, n_out, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        assert ct1.size == 2 and ct2.size == 2
        assert ct1.domain == "coeff" and ct2.domain == "coeff"
        kq, n = self.ctx.L, self.ctx.n
        a = jnp.stack(ct1.polys, axis=-3)  # [..., 2, L, n]
        b = jnp.stack(ct2.polys, axis=-3)
        batch = a.shape[:-3]
        a = a.reshape((-1, 2, kq, n))
        b = b.reshape((-1, 2, kq, n))
        out = jitted(a, b)
        out = out.reshape(batch + (n_out, kq, n))
        return Ciphertext(
            tuple(out[..., i, :, :] for i in range(n_out)), "coeff"
        )

    def multiply_relinearize(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        return self._run(self._jit, 2, ct1, ct2)

    def multiply(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        """Tensor product WITHOUT relinearization: a size-3 ciphertext.

        Mirrors SEAL's separate Evaluator::multiply (the reference consumes
        multiply+relinearize fused and unfused paths via SEAL); also the
        clean measurement of the relin phase share in the fused kernel."""
        return self._run(self._jit_norelin, 3, ct1, ct2)
