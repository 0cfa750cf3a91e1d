"""Property tests for 32-bit-limb modular arithmetic vs Python-int oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from pplp_tpu.ops import modmath as mm
from pplp_tpu.ops.primes import get_primes, Modulus

rng = np.random.default_rng(0)


def _rand_u32(shape):
    return rng.integers(0, 1 << 32, size=shape, dtype=np.uint64).astype(np.uint32)


def test_mul32():
    a = _rand_u32(1024)
    b = _rand_u32(1024)
    lo, hi = mm.mul32(jnp.asarray(a), jnp.asarray(b))
    ref = a.astype(object) * b.astype(object)
    got = np.asarray(lo, dtype=object) + (np.asarray(hi, dtype=object) << 32)
    assert (got == ref).all()


@pytest.mark.parametrize("na,nb", [(2, 2), (4, 3), (2, 3), (1, 1)])
def test_comba_mul(na, nb):
    a = [_rand_u32(257) for _ in range(na)]
    b = [_rand_u32(257) for _ in range(nb)]
    out = mm.comba_mul([jnp.asarray(x) for x in a], [jnp.asarray(x) for x in b])
    assert len(out) == na + nb
    to_int = lambda limbs: sum(
        np.asarray(l, dtype=object) << (32 * i) for i, l in enumerate(limbs)
    )
    assert (to_int(out) == to_int(a) * to_int(b)).all()


def test_limbs_add_sub():
    a = [_rand_u32(100) for _ in range(3)]
    b = [_rand_u32(100) for _ in range(3)]
    to_int = lambda limbs: sum(
        np.asarray(l, dtype=object) << (32 * i) for i, l in enumerate(limbs)
    )
    s = mm.limbs_add([jnp.asarray(x) for x in a], [jnp.asarray(x) for x in b])
    assert (to_int(s) == (to_int(a) + to_int(b)) % (1 << 96)).all()
    d = mm.limbs_sub([jnp.asarray(x) for x in a], [jnp.asarray(x) for x in b])
    assert (to_int(d) == (to_int(a) - to_int(b)) % (1 << 96)).all()


@pytest.mark.parametrize("bits", [20, 27, 29, 30])
def test_m31_ops(bits):
    q = get_primes(bits, 1, 1024)[0]
    mod = Modulus(q)
    n = 999
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    y = rng.integers(0, q, size=n, dtype=np.uint64)
    xs = jnp.asarray(x.astype(np.uint32))
    ys = jnp.asarray(y.astype(np.uint32))
    qs = jnp.uint32(q)
    mu_lo = jnp.uint32(mod.mu64 & 0xFFFFFFFF)
    mu_hi = jnp.uint32(mod.mu64 >> 32)

    assert (np.asarray(mm.m31.add(xs, ys, qs)) == (x + y) % q).all()
    assert (
        np.asarray(mm.m31.sub(xs, ys, qs), dtype=object)
        == (x.astype(object) - y.astype(object)) % q
    ).all()
    assert (np.asarray(mm.m31.neg(xs, qs)) == (-x.astype(object)) % q).all()
    got = np.asarray(mm.m31.mulmod(xs, ys, qs, mu_lo, mu_hi), dtype=object)
    assert (got == (x.astype(object) * y.astype(object)) % q).all()

    # Shoup path: fixed multiplicand w.
    w = int(y[0])
    ws = mod.shoup(w, 32)
    got = np.asarray(
        mm.m31.mulmod_shoup(xs, jnp.uint32(w), jnp.uint32(ws), qs), dtype=object
    )
    assert (got == (x.astype(object) * w) % q).all()


@pytest.mark.parametrize("bits", [36, 44, 50, 56, 61])
def test_m62_ops(bits):
    q = get_primes(bits, 1, 4096)[0]
    mod = Modulus(q)
    n = 777
    x = rng.integers(0, q, size=n, dtype=np.uint64).astype(object)
    y = rng.integers(0, q, size=n, dtype=np.uint64).astype(object)

    def pair(v):
        v = np.asarray(v, dtype=object)
        return (
            jnp.asarray((v & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((v >> 32).astype(np.uint32)),
        )

    def unpair(p):
        lo, hi = (np.asarray(a, dtype=object) for a in p)
        return lo + (hi << 32)

    xs, ys = pair(x), pair(y)
    qp = pair([q])
    ratio = tuple(
        jnp.uint32((mod.const_ratio >> (32 * i)) & 0xFFFFFFFF) for i in range(3)
    )

    assert (unpair(mm.m62.add(xs, ys, qp)) == (x + y) % q).all()
    assert (unpair(mm.m62.sub(xs, ys, qp)) == (x - y) % q).all()
    assert (unpair(mm.m62.neg(xs, qp)) == (-x) % q).all()
    assert (unpair(mm.m62.mulmod(xs, ys, qp, ratio)) == (x * y) % q).all()

    w = int(y[0])
    wp = pair([w])
    wsp = pair([mod.shoup(w, 64)])
    assert (unpair(mm.m62.mulmod_shoup(xs, wp, wsp, qp)) == (x * w) % q).all()
