"""Batch encoder: CRT slot packing for prime t = 1 mod 2n (SEAL's
``BatchEncoder`` capability — the SIMD layout SEAL offers alongside the
scalar plaintexts the reference uses).

A plaintext polynomial mod a prime t = 1 mod 2n is isomorphic to n slots of
Z_t via the negacyclic NTT over t itself: encode = inverse NTT of the slot
vector, decode = forward NTT. Slot-wise add then corresponds to evaluator
add, and slot-wise multiply to ct-ct multiply. Reuses the engine's NTT
machinery with a single-modulus chain [t] (m31 profile; t < 2^30).

(SEAL arranges slots as a 2 x n/2 matrix with a Galois permutation; this
encoder uses the plain NTT slot order — a fixed public permutation of
SEAL's, equivalent in capability. Rotations/Galois keys are future work.)
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

    def encode(self, values) -> Plaintext:
        """values: ints [<= n] -> plaintext whose slots hold them."""
        n = self.slot_count
        t = self.ctx.t
        slots = np.zeros(n, np.uint64)
        vals = np.asarray(values, np.uint64)
        slots[: vals.size] = vals % np.uint64(t)
        import jax.numpy as jnp

        spec = jnp.asarray(slots.astype(np.uint32))[None, :]  # [1, n] residues
        coeffs = np.asarray(ntt.inverse(spec, self._tb))[0]
        return Plaintext([int(c) for c in coeffs])

    def decode(self, plain: Plaintext) -> list[int]:
        n = self.slot_count
        coeffs = np.zeros(n, np.uint64)
        for i, c in enumerate(plain.coeffs[:n]):
            coeffs[i] = c
        import jax.numpy as jnp

        x = jnp.asarray(coeffs.astype(np.uint32))[None, :]
        return [int(v) for v in np.asarray(ntt.forward(x, self._tb))[0]]
