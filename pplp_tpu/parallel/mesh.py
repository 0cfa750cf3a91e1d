"""Mesh construction and ciphertext shardings.

A ciphertext batch is laid out [B, L, n] (batch, RNS limb, coefficient) and
sharded over a 3-axis mesh ('dp', 'limb', 'coeff'). RNS limbs never
communicate in NTT/pointwise ops, so 'limb' is pure tensor parallelism; the
'coeff' axis makes XLA insert collectives for the high-stride butterfly stages
(the ICI all-to-all pattern; a Pallas remote-DMA NTT is the planned fast path).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "ct_spec", "ct_sharding", "factor_devices"]


def factor_devices(n: int) -> tuple[int, int, int]:
    """Split n devices into (dp, limb, coeff): 2-way dp and limb when
    available, remaining factor to the coefficient axis (so >=8 devices
    exercise all three parallelism kinds)."""
    dp = 1
    if n % 2 == 0:
        dp, n = 2, n // 2
    limb = 1
    if n % 2 == 0:
        limb, n = 2, n // 2
    return dp, limb, n


def make_mesh(devices=None, dp=None, limb=None, coeff=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    total = len(devices)
    if dp is None or limb is None or coeff is None:
        dp, limb, coeff = factor_devices(total)
    assert dp * limb * coeff == total, "mesh axes must use all devices"
    import numpy as np

    arr = np.asarray(devices).reshape(dp, limb, coeff)
    return Mesh(arr, axis_names=("dp", "limb", "coeff"))


def ct_spec(batched: bool = True) -> P:
    """PartitionSpec for [B, L, n] (or [L, n]) residue arrays."""
    return P("dp", "limb", "coeff") if batched else P("limb", "coeff")


def ct_sharding(mesh: Mesh, batched: bool = True) -> NamedSharding:
    return NamedSharding(mesh, ct_spec(batched))
