"""Transpose-free fused Pallas NTT engine ("vmem"): roundtrip + polymul
equivalence with the stage-sweep engine (same math, internal spectrum order),
plus engine dispatch through ntt.build_tables/forward/inverse.

Runs in Pallas interpret mode on the CPU backend (conftest pins cpu); the
same code path compiles to a Mosaic kernel on TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pplp_tpu.ops import ntt, ntt_vmem
from pplp_tpu.ops.primes import Modulus, get_primes


def _setup(n, engine="vmem", bits=(28, 27)):
    moduli = [Modulus(q) for b in sorted(set(bits))
              for q in get_primes(b, list(bits).count(b), n)]
    tb = ntt.build_tables(moduli, n, engine=engine)
    return moduli, tb


def _rand(rng, moduli, n, batch=()):
    qs = np.array([m.value for m in moduli], np.uint64).reshape(
        (1,) * len(batch) + (-1, 1)
    )
    v = rng.integers(0, 1 << 62, size=batch + (len(moduli), n)).astype(np.uint64) % qs
    return v.astype(np.uint32)


@pytest.mark.parametrize("n", [256, 4096])
def test_roundtrip(n):
    rng = np.random.default_rng(0)
    moduli, tb = _setup(n)
    x = jnp.asarray(_rand(rng, moduli, n, batch=(3,)))
    back = ntt.inverse(ntt.forward(x, tb), tb)
    assert (np.asarray(back) == np.asarray(x)).all()


@pytest.mark.parametrize("n", [256, 1024])
def test_polymul_matches_stage_engine(n):
    rng = np.random.default_rng(1)
    moduli, tb = _setup(n)
    _, tb_s = _setup(n, engine="stage")
    a = jnp.asarray(_rand(rng, moduli, n))
    b = jnp.asarray(_rand(rng, moduli, n))
    got = ntt.negacyclic_polymul(a, b, tb)
    ref = ntt.negacyclic_polymul(a, b, tb_s)
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_odd_batch_tile_fallback():
    """Batch sizes not divisible by 8 fall back to one whole-batch tile."""
    rng = np.random.default_rng(2)
    n = 256
    moduli, tb = _setup(n)
    x = jnp.asarray(_rand(rng, moduli, n, batch=(5,)))
    back = ntt.inverse(ntt.forward(x, tb), tb)
    assert (np.asarray(back) == np.asarray(x)).all()


@pytest.mark.slow
def test_spectrum_order_is_internal_bijection():
    """forward_vmem output is a permutation of the true spectrum: pointwise
    multiply of like-ordered spectra must equal the negacyclic convolution
    (already covered), and the orders differ from the 'four' engine — guard
    that nobody mixes them within one context."""
    rng = np.random.default_rng(3)
    n = 256
    moduli, tb = _setup(n)
    from pplp_tpu.ops import ntt4

    tb4 = tb.four_step
    x = jnp.asarray(_rand(rng, moduli, n))
    a = np.asarray(ntt_vmem.forward_vmem(x, tb4))
    b = np.asarray(ntt4.forward4(x, tb4))
    # Same multiset of values per limb (it is a permutation), orders differ.
    assert all(
        sorted(a[li].tolist()) == sorted(b[li].tolist()) for li in range(len(moduli))
    )
