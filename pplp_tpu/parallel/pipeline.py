"""Batched proximity pipeline: one jittable device step over a sharded batch.

This is the framework's "training step" analogue (BASELINE.md config[3]: 100k
encrypted distance+radius checks): for a batch of B independent proximity
queries, run the server's homomorphic blind-distance evaluation AND the
client's decryption dot-product entirely on device:

    bd_ct = s*(c1 + z - xb*c2 - yb*c3) + s*r          (ct x plain ops)
    x     = bd_ct.c0 + bd_ct.c1 * sk                  (decrypt device part)

Inputs/outputs are [B, L, n] residue arrays sharded over ('dp','limb','coeff').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..bfv import Ciphertext, Decryptor, Evaluator, Plaintext
from ..bfv.encryptor import Encryptor
from ..utils.hexcodec import uint64_to_hex_string

__all__ = ["build_batched_pipeline", "make_batch_inputs"]


def _plain_pairs(ctx, value: int):
    lo, hi = Plaintext(uint64_to_hex_string(value % ctx.t), n=ctx.n).pair_u32(ctx.n)
    return jnp.asarray(lo), jnp.asarray(hi)


def build_batched_pipeline(ctx, sk, xb: int, yb: int, s_blind: int, r_blind: int):
    """Returns fn(c1_polys, c2_polys, c3_polys) -> residues [B, L, n].

    The returned function is pure and jittable; ciphertext args are the
    ``polys`` tuples of coefficient-domain ciphertexts.
    """
    ev = Evaluator(ctx)
    dec = Decryptor(ctx, sk)
    z_p = _plain_pairs(ctx, xb * xb + yb * yb)
    xb_p = _plain_pairs(ctx, xb)
    yb_p = _plain_pairs(ctx, yb)
    s_p = _plain_pairs(ctx, s_blind)
    sr_p = _plain_pairs(ctx, s_blind * r_blind)

    def step(c1_polys, c2_polys, c3_polys):
        c1 = Ciphertext(c1_polys, "coeff")
        c2 = Ciphertext(c2_polys, "coeff")
        c3 = Ciphertext(c3_polys, "coeff")
        c1 = ev.add_plain(c1, z_p)
        c2 = ev.multiply_plain(c2, xb_p)
        c3 = ev.multiply_plain(c3, yb_p)
        c1 = ev.sub(c1, ev.add(c2, c3))
        c1 = ev.multiply_plain(c1, s_p)
        c1 = ev.add_plain(c1, sr_p)
        return dec.ct_value_rns(c1)

    return step


def make_batch_inputs(ctx, encryptor: Encryptor, xa, ya, key):
    """Encrypt a batch of client coordinates -> three ciphertext poly tuples.

    xa, ya: int arrays [B]. Returns (c1.polys, c2.polys, c3.polys) with
    [B, L, n]-shaped leaves.
    """
    xa = np.asarray(xa, np.uint64)
    ya = np.asarray(ya, np.uint64)
    B = xa.shape[0]
    n = ctx.n

    def pairs(vals):
        m = np.zeros((B, n), np.uint64)
        m[:, 0] = vals % np.uint64(ctx.t)
        return (
            jnp.asarray((m & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((m >> np.uint64(32)).astype(np.uint32)),
        )

    k1, k2, k3 = jax.random.split(key, 3)
    c1 = encryptor.encrypt_pairs(*pairs(xa * xa + ya * ya), k1)
    c2 = encryptor.encrypt_pairs(*pairs(xa * np.uint64(2)), k2)
    c3 = encryptor.encrypt_pairs(*pairs(ya * np.uint64(2)), k3)
    return c1.polys, c2.polys, c3.polys
