"""Ciphertext container: a tuple of R_q polynomials as RNS residue arrays.

Registered as a JAX pytree so ciphertexts flow through jit/vmap/shard_map.
Polynomials live in coefficient domain by default (SEAL BFV convention); the
``domain`` field lets evaluators cache NTT forms without extra transforms.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax

__all__ = ["Ciphertext"]


@jax.tree_util.register_pytree_node_class
@dataclass
class Ciphertext:
    polys: tuple  # k profile-values, each [..., L, n]
    domain: str = "coeff"  # "coeff" | "ntt"

    @property
    def size(self) -> int:
        return len(self.polys)

    def tree_flatten(self):
        return (self.polys,), (self.domain,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(polys=children[0], domain=aux[0])
