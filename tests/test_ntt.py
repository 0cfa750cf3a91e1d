"""NTT correctness vs naive negacyclic convolution (Python-int oracle)."""

import numpy as np
import jax
import pytest

from pplp_tpu.ops import ntt
from pplp_tpu.ops.primes import get_primes, Modulus


def _chain(bits_list, n):
    out = []
    for b in sorted(set(bits_list)):
        out.extend(get_primes(b, bits_list.count(b), n))
    return [Modulus(q) for q in out]


def _rand_residues(rng, moduli, n):
    """[L, n] object array of residues."""
    return np.array(
        [[int(rng.integers(0, m.value)) for _ in range(n)] for m in moduli],
        dtype=object,
    )


def _naive_negacyclic(a_row, b_row, q):
    n = len(a_row)
    out = [0] * n
    for i, ai in enumerate(a_row):
        for j, bj in enumerate(b_row):
            k = i + j
            if k < n:
                out[k] = (out[k] + ai * bj) % q
            else:
                out[k - n] = (out[k - n] - ai * bj) % q
    return out


@pytest.mark.parametrize("profile_bits,n", [
    ([28, 27], 64),
    ([28, 27], 256),
    ([50, 50], 64),
    pytest.param([36, 61], 128, marks=pytest.mark.slow),
])
def test_roundtrip_and_polymul(profile_bits, n):
    rng = np.random.default_rng(42)
    moduli = _chain(profile_bits, n)
    tb = ntt.build_tables(moduli, n)

    a = _rand_residues(rng, moduli, n)
    b = _rand_residues(rng, moduli, n)

    ad = ntt.to_device(a, tb)
    bd = ntt.to_device(b, tb)

    # Round trip.
    back = ntt.to_numpy(ntt.inverse(ntt.forward(ad, tb), tb), tb)
    assert (back.astype(object) == a).all()

    # Negacyclic product vs naive oracle.
    got = ntt.to_numpy(ntt.negacyclic_polymul(ad, bd, tb), tb).astype(object)
    for li, m in enumerate(moduli):
        ref = _naive_negacyclic(list(a[li]), list(b[li]), m.value)
        assert list(got[li]) == ref, f"limb {li} mismatch"


def test_batched_and_jitted():
    rng = np.random.default_rng(7)
    n = 128
    moduli = _chain([28, 27, 27], n)
    tb = ntt.build_tables(moduli, n)
    batch = 4

    polys = [_rand_residues(rng, moduli, n) for _ in range(batch)]
    stacked = jax.tree.map(
        lambda *xs: np.stack(xs), *[ntt.to_device(p, tb) for p in polys]
    )

    fwd = jax.jit(lambda x: ntt.forward(x, tb))
    inv = jax.jit(lambda x: ntt.inverse(x, tb))
    out = inv(fwd(stacked))
    for i in range(batch):
        one = jax.tree.map(lambda a: a[i], out)
        assert (ntt.to_numpy(one, tb).astype(object) == polys[i]).all()


def test_chunked_matches_monolithic():
    """forward_chunked/inverse_chunked == forward/inverse bit-exact (the
    big-batch bench path: lax.map over chunk blocks inside one jit)."""
    rng = np.random.default_rng(11)
    n = 128
    moduli = _chain([28, 27], n)
    tb = ntt.build_tables(moduli, n)
    batch = 8

    polys = [_rand_residues(rng, moduli, n) for _ in range(batch)]
    stacked = jax.tree.map(
        lambda *xs: np.stack(xs), *[ntt.to_device(p, tb) for p in polys]
    )
    fwd_ref = jax.jit(lambda x: ntt.forward(x, tb))(stacked)
    fwd_chk = jax.jit(lambda x: ntt.forward_chunked(x, tb, chunk=2))(stacked)
    for a, b in zip(jax.tree.leaves(fwd_ref), jax.tree.leaves(fwd_chk)):
        assert (np.asarray(a) == np.asarray(b)).all()
    inv_chk = jax.jit(lambda x: ntt.inverse_chunked(x, tb, chunk=2))(fwd_chk)
    for i in range(batch):
        one = jax.tree.map(lambda a: a[i], inv_chk)
        assert (ntt.to_numpy(one, tb).astype(object) == polys[i]).all()
    # Non-divisible and small batches fall through to the monolithic path.
    odd = jax.tree.map(lambda a: a[:3], stacked)
    f_odd = jax.jit(lambda x: ntt.forward_chunked(x, tb, chunk=2))(odd)
    for a, b in zip(jax.tree.leaves(f_odd), jax.tree.leaves(fwd_ref)):
        assert (np.asarray(a) == np.asarray(b)[:3]).all()


def test_pointwise_linearity():
    # NTT(a) + NTT(b) == NTT(a+b) elementwise mod q.
    rng = np.random.default_rng(3)
    n = 64
    moduli = _chain([29], n)
    tb = ntt.build_tables(moduli, n)
    a = _rand_residues(rng, moduli, n)
    b = _rand_residues(rng, moduli, n)
    fa = ntt.to_numpy(ntt.forward(ntt.to_device(a, tb), tb), tb).astype(object)
    fb = ntt.to_numpy(ntt.forward(ntt.to_device(b, tb), tb), tb).astype(object)
    ab = (a + b) % np.array([[m.value] for m in moduli], dtype=object)
    fab = ntt.to_numpy(ntt.forward(ntt.to_device(ab, tb), tb), tb).astype(object)
    q = np.array([[m.value] for m in moduli], dtype=object)
    assert ((fa + fb) % q == fab).all()
