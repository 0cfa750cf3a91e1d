"""CKKS core: canonical-embedding encoder + RLWE encrypt/add/decrypt.

Encoding (host, float64 — like SEAL's CPU-side CKKSEncoder): a slot vector
z in C^{n/2} is evaluated/interpolated at the odd powers of the primitive
2n-th complex root zeta:

    eval_k(m) = sum_j c_j zeta^{j(2k+1)},   k = 0..n-1,

with conjugate symmetry (slot j pairs with n-1-j) making coefficients real.
Interpolation = FFT with a zeta^j pre-twist; coefficients are scaled by
``scale`` and rounded into the RNS basis.

Device side reuses the BFV machinery: keys (`bfv.keys`), uniform/CBD sampling,
NTT tables — a CKKS ciphertext is (c0, c1) with message carried in the low
bits (no Delta scaling; the scale lives in the encoding).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..bfv.ciphertext import Ciphertext
from ..bfv.context import BFVContext
from ..bfv.params import EncryptionParameters
from ..bfv import sampling
from ..ops import ntt

__all__ = ["CKKSContext", "CKKSEncoder", "ckks_encrypt", "ckks_decrypt",
           "ckks_add", "ckks_create_relin_keys"]


@dataclass(frozen=True, eq=False)
class CKKSContext:
    """Thin wrapper: a BFVContext used for its RNS/NTT machinery + a scale."""

    base: BFVContext
    scale: float

    @staticmethod
    @functools.lru_cache(maxsize=4)
    def build(n=4096, scale=float(1 << 30), profile="tpu", coeff_modulus=None):
        if coeff_modulus is None:
            # CKKS needs q >> scale * |values|; three 28-bit primes (~2^84)
            # leave ample headroom for add-only aggregation at scale 2^30.
            from ..ops.primes import get_primes

            coeff_modulus = get_primes(28, 3, n)
        # plain_modulus is unused by CKKS; pick a benign value for validation.
        parms = EncryptionParameters.bfv(
            n, 1 << 20, coeff_modulus=coeff_modulus, profile=profile
        )
        return CKKSContext(base=BFVContext.build(parms), scale=float(scale))

    @property
    def n(self):
        return self.base.n

    @property
    def slots(self):
        return self.base.n // 2


class CKKSEncoder:
    def __init__(self, ctx: CKKSContext):
        self.ctx = ctx
        n = ctx.n
        j = np.arange(n)
        self._twist = np.exp(1j * np.pi * j / n)  # zeta^j

    def encode(self, values) -> np.ndarray:
        """Complex/real slot values [<= n/2] -> integer coefficient vector."""
        ctx = self.ctx
        n = ctx.n
        z = np.zeros(ctx.slots, np.complex128)
        values = np.asarray(values)
        z[: len(values)] = values
        evals = np.zeros(n, np.complex128)
        evals[: ctx.slots] = z
        evals[ctx.slots :] = np.conj(z[::-1])
        t = np.fft.fft(evals) / n  # interpolation: t_j = (1/n) sum E_k w^{-jk}
        coeffs = np.real(t / self._twist) * ctx.scale
        return np.round(coeffs).astype(np.int64)

    def decode(self, coeffs: np.ndarray):
        """Centered integer coefficients -> complex slot values [n/2]."""
        ctx = self.ctx
        t = (np.asarray(coeffs, np.float64) / ctx.scale) * self._twist
        evals = np.fft.ifft(t) * ctx.n
        return evals[: ctx.slots]

    def coeffs_to_rns(self, coeffs: np.ndarray):
        """Signed coeffs -> device residues [L, n]."""
        ctx = self.ctx.base
        rows = [np.mod(coeffs.astype(object), m.value) for m in ctx.moduli]
        return ntt.to_device(np.array(rows, dtype=object), ctx.tables)

    def rns_to_centered(self, residues: np.ndarray) -> list[int]:
        """Host [L, n] residues -> centered python ints in (-q/2, q/2]."""
        ctx = self.ctx.base
        xs = ctx.crt_compose(np.asarray(residues, dtype=object))
        half = ctx.q // 2
        return [x - ctx.q if x > half else x for x in xs]


def ckks_encrypt(ctx: CKKSContext, pk, m_rns, key) -> Ciphertext:
    """(c0, c1) = (pk0 u + e0 + m, pk1 u + e1)."""
    base = ctx.base
    p = base.prof
    q2 = base.tables.q_b(1)
    ku, k0, k1 = jax.random.split(key, 3)
    u_ntt = ntt.forward(sampling.ternary_poly(ku, base), base.tables)
    c0 = ntt.inverse(p.mulmod_shoup(u_ntt, pk.pk0_ntt, pk.pk0_shoup, q2), base.tables)
    c1 = ntt.inverse(p.mulmod_shoup(u_ntt, pk.pk1_ntt, pk.pk1_shoup, q2), base.tables)
    c0 = p.add(p.add(c0, sampling.cbd_poly(k0, base), q2), m_rns, q2)
    c1 = p.add(c1, sampling.cbd_poly(k1, base), q2)
    return Ciphertext((c0, c1), "coeff")


def ckks_add(ctx: CKKSContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    p = ctx.base.prof
    q2 = ctx.base.tables.q_b(1)
    return Ciphertext(
        tuple(p.add(x, y, q2) for x, y in zip(a.polys, b.polys)), "coeff"
    )


def ckks_create_relin_keys(ctx: CKKSContext, sk, key):
    """Relinearization keys for the CKKS path: always the width-1 (per-limb)
    RNS gadget. The BFV production rule (``behz.default_relin_width``)
    measures gadget noise against the Delta/2 = q/2t decryption headroom;
    CKKS has no Delta — keyswitch error lands directly in the fixed-point
    message error — so the smallest digit is the right config here (a
    width-2 digit ~2^56 would swamp a 2^52-scale message; caught by
    tests/test_ckks.py::test_ckks_multiply_rescale when the BFV default
    widened)."""
    from ..bfv.behz import create_relin_keys

    return create_relin_keys(ctx.base, sk, key, width=1)


def ckks_multiply(ctx: CKKSContext, a: Ciphertext, b: Ciphertext, rlk=None) -> Ciphertext:
    """CKKS ct-ct multiply: plain NTT tensor product mod q (no t/q scaling —
    the message scale squares; follow with ``ckks_rescale``). Relinearizes
    when ``rlk`` is given: either bfv.behz.KSwitchKeys (RNS gadget; build
    via :func:`ckks_create_relin_keys` — the BFV-default gadget width is
    noise-unsafe for CKKS) or bfv.keyswitch.SPKeys (special prime; noise ~B —
    use this for multiplicative pipelines)."""
    base = ctx.base
    p = base.prof
    tb = base.tables
    q2 = tb.q_b(1)
    a0, a1 = (ntt.forward(x, tb) for x in a.polys)
    b0, b1 = (ntt.forward(x, tb) for x in b.polys)
    e0 = ntt.pointwise_mul(a0, b0, tb)
    e2 = ntt.pointwise_mul(a1, b1, tb)
    cross = ntt.pointwise_mul(p.add(a0, a1, q2), p.add(b0, b1, q2), tb)
    e1 = p.sub(p.sub(cross, e0, q2), e2, q2)
    polys = tuple(ntt.inverse(e, tb) for e in (e0, e1, e2))
    ct3 = Ciphertext(polys, "coeff")
    if rlk is None:
        return ct3
    from ..bfv.keyswitch import SPKeys, sp_relinearize

    if isinstance(rlk, SPKeys):
        return sp_relinearize(base, ct3, rlk)
    from ..bfv.behz import relinearize

    return relinearize(base, ct3, rlk)


def ckks_rescale(
    ctx: CKKSContext, ct: Ciphertext, current_scale: float | None = None
) -> tuple["CKKSContext", Ciphertext]:
    """Drop the last RNS prime: x -> round(x / q_last).

    Standard RNS rescale: x'_i = (x_i - [x]_{q_last, centered}) * q_last^{-1}
    mod q_i. Returns (smaller context with scale = current_scale / q_last,
    rescaled ciphertext). ``current_scale`` defaults to ctx.scale**2 — the
    post-multiply case this exists for. m31 chains only.
    """
    from ..bfv.evaluator import mod_switch_to_next

    q_last = ctx.base.moduli[-1].value
    new_base, new_ct = mod_switch_to_next(ctx.base, ct)
    scale = ctx.scale * ctx.scale if current_scale is None else current_scale
    return CKKSContext(base=new_base, scale=scale / q_last), new_ct


def restrict_secret_key(ctx_small: CKKSContext, sk):
    """Project a secret key onto a rescaled (fewer-limb) context."""
    from ..bfv.evaluator import restrict_secret_key as _restrict

    return _restrict(ctx_small.base, sk)


def ckks_decrypt(ctx: CKKSContext, sk, ct: Ciphertext) -> np.ndarray:
    """Device dot product with s, host compose -> centered coefficients."""
    from ..bfv.decryptor import Decryptor

    dec = Decryptor(ctx.base, sk)
    residues = ntt.to_numpy(dec.ct_value_rns(ct), ctx.base.tables)
    enc = CKKSEncoder(ctx)
    return np.array(enc.rns_to_centered(residues), dtype=object)
