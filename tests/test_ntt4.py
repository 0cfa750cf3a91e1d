"""Four-step NTT engine: roundtrip + polymul equivalence with the
stage-sweep engine (same math, different internal spectrum order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pplp_tpu.ops import ntt, ntt4
from pplp_tpu.ops.modmath import m31
from pplp_tpu.ops.primes import Modulus, get_primes

pytestmark = pytest.mark.slow  # heavy module: excluded from the fast tier


def _setup(n, bits=(28, 27)):
    moduli = [Modulus(q) for b in sorted(set(bits))
              for q in get_primes(b, list(bits).count(b), n)]
    tb1 = ntt.build_tables(moduli, n)
    tb4 = ntt4.build_tables4(moduli, n)
    return moduli, tb1, tb4


def _rand(rng, moduli, n, batch=()):
    qs = np.array([m.value for m in moduli], np.uint64).reshape(
        (1,) * len(batch) + (-1, 1)
    )
    v = rng.integers(0, 1 << 62, size=batch + (len(moduli), n)).astype(np.uint64) % qs
    return np.asarray(v, np.uint64)


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_roundtrip(n):
    rng = np.random.default_rng(0)
    moduli, tb1, tb4 = _setup(n)
    a = _rand(rng, moduli, n)
    ad = np.asarray(a, np.uint64).astype(np.uint32)
    import jax.numpy as jnp

    x = jnp.asarray(ad)
    back = ntt4.inverse4(ntt4.forward4(x, tb4), tb4)
    assert (np.asarray(back) == ad).all()


@pytest.mark.parametrize("n", [256, 1024])
def test_polymul_matches_stage_engine(n):
    rng = np.random.default_rng(1)
    moduli, tb1, tb4 = _setup(n)
    import jax.numpy as jnp

    a = jnp.asarray(_rand(rng, moduli, n).astype(np.uint32))
    b = jnp.asarray(_rand(rng, moduli, n).astype(np.uint32))

    ref = ntt.negacyclic_polymul(a, b, tb1)

    q2 = tb4.q[:, None]
    mu = tuple(m[:, None] for m in tb4.mu)
    fa = ntt4.forward4(a, tb4)
    fb = ntt4.forward4(b, tb4)
    prod = m31.mulmod(fa, fb, q2, mu[0], mu[1])
    got = ntt4.inverse4(prod, tb4)
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_batched_jit():
    n = 512
    rng = np.random.default_rng(2)
    moduli, tb1, tb4 = _setup(n)
    import jax.numpy as jnp

    x = jnp.asarray(_rand(rng, moduli, n, batch=(3,)).astype(np.uint32))
    f = jax.jit(lambda v: ntt4.inverse4(ntt4.forward4(v, tb4), tb4))
    assert (np.asarray(f(x)) == np.asarray(x)).all()


def test_radix4_bit_identical_to_radix2():
    # The radix-4 fused column sweeps perform the same multiplies in the
    # same order as the radix-2 loops, so spectra and inverses must be
    # BIT-identical (covers odd/even logc1 and the tail-stage paths).
    from pplp_tpu.ops import ntt
    from pplp_tpu.ops.primes import Modulus, get_primes

    for n in (256, 512, 4096):
        moduli = [Modulus(q) for q in get_primes(30, 2, n)]
        t2 = ntt.build_tables(moduli, n, engine="four")
        t4 = ntt.build_tables(moduli, n, engine="four4")
        rng = np.random.default_rng(0)
        q = np.array([m.value for m in moduli], np.uint64)[:, None]
        x = jnp.asarray((rng.integers(0, 1 << 62, (2, 2, n)) % q).astype(np.uint32))
        f2, f4 = ntt.forward(x, t2), ntt.forward(x, t4)
        assert (np.asarray(f2) == np.asarray(f4)).all()
        i2, i4 = ntt.inverse(f2, t2), ntt.inverse(f4, t4)
        assert (np.asarray(i2) == np.asarray(i4)).all()
        assert (np.asarray(i4) == np.asarray(x)).all()
