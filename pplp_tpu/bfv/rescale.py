"""Shared RNS divide-and-round: x -> round(x / q_last) on the head limbs.

The primitive behind both SEAL capabilities this framework reimplements:
``Evaluator::mod_switch_to_next`` (drop the chain's last prime) and the
special-prime key-switch scale-down (divide the accumulated product by P).
Works on either residue profile (m31 single-u32 lanes, m62 (lo, hi) pairs).

Math: with e the centered remainder of x mod q_last, round(x/q_last) =
(x - e)/q_last; per head limb that is (x_j - |e|_{q_j}) * q_last^{-1} mod q_j,
with a +q_last correction where the remainder is negative (> q_last/2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.modmath import m31, m62

__all__ = ["make_divide_round_last"]


def make_divide_round_last(small_tables, small_moduli, q_last: int, L_big: int):
    """Build fn(poly over L_big limbs) -> poly over the len(small_moduli)
    head limbs, computing round(x / q_last) in RNS.

    ``small_tables``: NttTables of the head-limb context (supplies q/mu and
    the residue profile); ``q_last``: the dropped modulus (python int)."""
    ntb = small_tables
    q2n = ntb.q_b(1)
    k = len(small_moduli)
    inv = [pow(q_last, -1, m.value) for m in small_moduli]
    ql_ints = [q_last % m.value for m in small_moduli]

    if ntb.profile == "m31":
        mu = tuple(m[:, None] for m in ntb.mu)
        inv_w = jnp.asarray(np.asarray(inv, np.uint32))[:, None]
        inv_ws = jnp.asarray(
            np.asarray(
                [(v << 32) // m.value for v, m in zip(inv, small_moduli)],
                np.uint32,
            )
        )[:, None]
        ql_res = jnp.asarray(np.asarray(ql_ints, np.uint32))[:, None]

        def one_poly(poly):
            last = poly[..., L_big - 1, :]
            head = poly[..., :k, :]
            d = jnp.broadcast_to(last[..., None, :], head.shape)
            d_red = m31.reduce64(
                d, jnp.zeros_like(d), ntb.q[:, None], mu[0], mu[1]
            )
            out = m31.sub(head, d_red, q2n)
            high = jnp.broadcast_to(
                (last > jnp.uint32(q_last // 2))[..., None, :], head.shape
            )
            out = jnp.where(
                high, m31.add(out, jnp.broadcast_to(ql_res, out.shape), q2n),
                out,
            )
            return m31.mulmod_shoup(out, inv_w, inv_ws, q2n)

        return one_poly

    # m62: residues are (lo, hi) u32 pairs.
    def col_pair(vals):
        lo = jnp.asarray(
            np.asarray([int(v) & 0xFFFFFFFF for v in vals], np.uint32)
        )[:, None]
        hi = jnp.asarray(np.asarray([int(v) >> 32 for v in vals], np.uint32))[
            :, None
        ]
        return lo, hi

    ratio = tuple(m[:, None] for m in ntb.mu)
    inv_w = col_pair(inv)
    inv_ws = col_pair(
        [(v << 64) // m.value for v, m in zip(inv, small_moduli)]
    )
    ql_res = col_pair(ql_ints)
    # q_last prime (odd): x > q_last//2  <=>  x >= q_last//2 + 1.
    half1 = q_last // 2 + 1
    half1_c = (jnp.uint32(half1 & 0xFFFFFFFF), jnp.uint32(half1 >> 32))

    def one_poly(poly):
        lo, hi = poly
        last = (lo[..., L_big - 1, :], hi[..., L_big - 1, :])
        head = (lo[..., :k, :], hi[..., :k, :])
        d = tuple(
            jnp.broadcast_to(a[..., None, :], h.shape)
            for a, h in zip(last, head)
        )
        zero = jnp.zeros_like(d[0])
        d_red = m62.reduce128((d[0], d[1], zero, zero), q2n, ratio)
        out = m62.sub(head, d_red, q2n)
        corr = m62.add(
            out,
            tuple(jnp.broadcast_to(c, o.shape) for c, o in zip(ql_res, out)),
            q2n,
        )
        high = jnp.broadcast_to(
            m62._geq(last, half1_c)[..., None, :], head[0].shape
        )
        out = tuple(jnp.where(high, c, o) for c, o in zip(corr, out))
        return m62.mulmod_shoup(out, inv_w, inv_ws, q2n)

    return one_poly
