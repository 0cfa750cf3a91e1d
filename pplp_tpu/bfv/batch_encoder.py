"""Batch encoder: CRT slot packing for prime t = 1 mod 2n (SEAL's
``BatchEncoder`` capability — the SIMD layout SEAL offers alongside the
scalar plaintexts the reference uses).

A plaintext polynomial mod a prime t = 1 mod 2n is isomorphic to n slots of
Z_t via the negacyclic NTT over t itself: encode = inverse NTT of the slot
vector, decode = forward NTT. Slot-wise add then corresponds to evaluator
add, and slot-wise multiply to ct-ct multiply. Reuses the engine's NTT
machinery with a single-modulus chain [t] (m31 profile; t < 2^30).

Slots follow SEAL's 2 x (n/2) matrix layout: row-0 slot j evaluates the
plaintext at psi^(3^j mod 2n), row-1 at psi^(-3^j mod 2n) — so
``galois.rotate_rows`` cyclically rotates each row and ``rotate_columns``
swaps the rows, exactly like SEAL's BatchEncoder + Evaluator::rotate_*.
"""

from __future__ import annotations

import numpy as np

from ..ops import ntt
from ..ops.primes import Modulus, is_prime
from .context import BFVContext
from .plaintext import Plaintext

__all__ = ["BatchEncoder"]


class BatchEncoder:
    def __init__(self, ctx: BFVContext):
        t, n = ctx.t, ctx.n
        if t >= (1 << 30):
            raise NotImplementedError("batching here needs t < 2^30")
        if not is_prime(t) or (t - 1) % (2 * n) != 0:
            raise ValueError(
                "plain_modulus must be a prime = 1 mod 2n for batching "
                "(cf. SEAL qualifiers.using_batching)"
            )
        self.ctx = ctx
        self.slot_count = n
        self._tb = ntt.build_tables([Modulus(t)], n)
        self._perm = self._orbit_permutation(n)

    @staticmethod
    def _orbit_permutation(n: int) -> np.ndarray:
        """perm[j] = spectrum position of slot j (SEAL matrix layout).

        The stage engine's forward NTT puts the evaluation at psi^(2k+1) at
        position brv(k). Row-0 slot j sits at exponent 3^j mod 2n; row-1 at
        2n - 3^j.
        """
        logn = n.bit_length() - 1

        def brv(k):
            r = 0
            for _ in range(logn):
                r = (r << 1) | (k & 1)
                k >>= 1
            return r

        m = 2 * n
        perm = np.zeros(n, np.int64)
        e = 1  # 3^j mod 2n
        for j in range(n // 2):
            k0 = ((e - 1) // 2) % n
            k1 = ((m - e - 1) // 2) % n
            perm[j] = brv(k0)
            perm[n // 2 + j] = brv(k1)
            e = (e * 3) % m
        return perm

    def encode(self, values) -> Plaintext:
        """values: ints [<= n] -> plaintext whose slots hold them."""
        n = self.slot_count
        t = self.ctx.t
        slots = np.zeros(n, np.uint64)
        vals = np.asarray(values, np.uint64)
        slots[: vals.size] = vals % np.uint64(t)
        spec_np = np.zeros(n, np.uint32)
        spec_np[self._perm] = slots.astype(np.uint32)
        import jax.numpy as jnp

        spec = jnp.asarray(spec_np)[None, :]  # [1, n] residues
        coeffs = np.asarray(ntt.inverse(spec, self._tb))[0]
        return Plaintext([int(c) for c in coeffs])

    def decode(self, plain: Plaintext) -> list[int]:
        n = self.slot_count
        coeffs = np.zeros(n, np.uint64)
        for i, c in enumerate(plain.coeffs[:n]):
            coeffs[i] = c
        import jax.numpy as jnp

        x = jnp.asarray(coeffs.astype(np.uint32))[None, :]
        spec = np.asarray(ntt.forward(x, self._tb))[0]
        return [int(v) for v in spec[self._perm]]
