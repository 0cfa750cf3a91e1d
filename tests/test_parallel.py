"""Sharded pipeline tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pplp_tpu.bfv import BFVContext, Decryptor, EncryptionParameters, Encryptor, Evaluator
from pplp_tpu.bfv.keys import KeyGenerator
from pplp_tpu.ops.primes import get_primes
from pplp_tpu.parallel import build_batched_pipeline, ct_sharding, make_batch_inputs, make_mesh

pytestmark = pytest.mark.slow  # heavy module: excluded from the fast tier

N = 256
T = 1 << 20


def make_ctx():
    chain = get_primes(28, 2, N) + get_primes(27, 2, N)
    parms = EncryptionParameters.bfv(N, T, coeff_modulus=chain)
    return BFVContext.build(parms)


def test_batched_pipeline_matches_protocol_oracle():
    ctx = make_ctx()
    kg = KeyGenerator(ctx, 3)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc = Encryptor(ctx, pk)
    xb, yb, s_blind, r_blind = 1000, 1000, 997, 123
    step = build_batched_pipeline(ctx, sk, xb, yb, s_blind, r_blind)

    xa = np.array([1234, 1000, 77, 1003], np.uint64)
    ya = np.array([1212, 1000, 99, 1001], np.uint64)
    args = make_batch_inputs(ctx, enc, xa, ya, jax.random.key(5))
    res = jax.jit(step)(*args)

    from pplp_tpu.ops import ntt

    for b in range(4):
        one = jax.tree.map(lambda a: a[b], res)
        coeffs = ctx.decode_plain_from_ct_value(
            np.asarray(ntt.to_numpy(one, ctx.tables), dtype=object)
        )
        d2 = (int(xa[b]) - xb) ** 2 + (int(ya[b]) - yb) ** 2
        assert coeffs[0] == (s_blind * (d2 + r_blind)) % T
        assert all(c == 0 for c in coeffs[1:])


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    ctx = make_ctx()
    kg = KeyGenerator(ctx, 11)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc = Encryptor(ctx, pk)
    step = build_batched_pipeline(ctx, sk, 500, 600, 31, 17)
    xa = np.arange(4, dtype=np.uint64) * 100
    ya = np.arange(4, dtype=np.uint64) * 90 + 1
    args = make_batch_inputs(ctx, enc, xa, ya, jax.random.key(6))

    ref = jax.jit(step)(*args)

    mesh = make_mesh(jax.devices(), dp=2, limb=2, coeff=2)
    sh = ct_sharding(mesh)
    sharded_args = jax.tree.map(lambda a: jax.device_put(a, sh), args)
    got = jax.jit(step, out_shardings=sh)(*sharded_args)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_graft_entry_contract():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)


def test_packed_pipeline_100_checks():
    # Coefficient packing: N checks in N/n ciphertext rows; blind distances
    # match the clear oracle for every packed coordinate pair.
    from pplp_tpu.parallel.pipeline import build_packed_pipeline, make_packed_inputs

    ctx = make_ctx()
    kg = KeyGenerator(ctx, 21)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc = Encryptor(ctx, pk)
    xb, yb, s_blind, r_blind = 1000, 900, 501, 99
    fn = jax.jit(build_packed_pipeline(ctx, sk, xb, yb, s_blind, r_blind))

    rng = np.random.default_rng(5)
    total = 2 * N  # two ciphertext rows
    xa = rng.integers(0, 2000, total).astype(np.uint64)
    ya = rng.integers(0, 2000, total).astype(np.uint64)
    args = make_packed_inputs(ctx, enc, xa, ya, jax.random.key(6))
    bd = np.asarray(fn(*args)).reshape(-1)
    for j in range(total):
        d2 = (int(xa[j]) - xb) ** 2 + (int(ya[j]) - yb) ** 2
        assert int(bd[j]) == (s_blind * (d2 + r_blind)) % T


def test_sharded_ct_multiply_matches_single_device():
    # BEHZ multiply under the dp x limb mesh: bit-exact vs single device.
    from pplp_tpu.bfv.behz import RnsMultiplier
    from pplp_tpu.bfv.ciphertext import Ciphertext
    from jax.sharding import NamedSharding, PartitionSpec as P

    ctx = make_ctx()
    mul = RnsMultiplier(ctx)
    rng = np.random.default_rng(31)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]

    def poly():
        v = rng.integers(0, 1 << 62, size=(4, ctx.L, N)).astype(np.uint64) % qs
        return jnp.asarray(v.astype(np.uint32))

    import jax.numpy as jnp_  # noqa: F401

    ct1 = Ciphertext((poly(), poly()), "coeff")
    ct2 = Ciphertext((poly(), poly()), "coeff")
    ref = jax.jit(mul.multiply)(ct1, ct2)

    mesh = make_mesh(jax.devices(), dp=2, limb=4, coeff=1)
    sh = NamedSharding(mesh, P("dp", "limb", None))
    put = lambda ct: Ciphertext(
        tuple(jax.device_put(p, sh) for p in ct.polys), "coeff"
    )
    got = jax.jit(mul.multiply)(put(ct1), put(ct2))
    for a, b in zip(jax.tree.leaves(ref.polys), jax.tree.leaves(got.polys)):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_distributed_ntt_matches_four_step():
    # Explicit all-to-all four-step NTT over the coeff axis == forward4.
    from pplp_tpu.ops import ntt4
    from pplp_tpu.ops.primes import Modulus, get_primes
    from pplp_tpu.parallel.ntt_dist import (
        coeff_view,
        flat_view,
        make_dist_ntt,
        pointwise_mul_dist,
    )
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n, L, B = 2048, 3, 4
    moduli = [Modulus(q) for q in get_primes(28, L, n)]
    tb4 = ntt4.build_tables4(moduli, n)
    rng = np.random.default_rng(17)
    qs = np.array([m.value for m in moduli], np.uint64)[None, :, None]
    x = jnp.asarray(
        (rng.integers(0, 1 << 62, size=(B, L, n)).astype(np.uint64) % qs).astype(
            np.uint32
        )
    )
    y = jnp.asarray(
        (rng.integers(0, 1 << 62, size=(B, L, n)).astype(np.uint64) % qs).astype(
            np.uint32
        )
    )

    mesh = make_mesh(jax.devices(), dp=2, limb=1, coeff=4)
    fwd, inv = make_dist_ntt(tb4, mesh, batch_axis="dp")
    sh_in = NamedSharding(mesh, P("dp", None, None, "coeff"))

    xv = jax.device_put(coeff_view(x, tb4), sh_in)
    spec = jax.jit(fwd)(xv)
    # Same spectrum as the single-device four-step engine.
    ref = ntt4.forward4(x, tb4)
    assert (np.asarray(flat_view(spec)) == np.asarray(ref)).all()

    # Roundtrip through the distributed inverse.
    back = jax.jit(inv)(spec)
    assert (np.asarray(flat_view(back)) == np.asarray(x)).all()

    # Distributed negacyclic polymul vs the stage-engine oracle.
    from pplp_tpu.ops import ntt as ntt_mod

    tb1 = ntt_mod.build_tables(moduli, n)
    want = ntt_mod.negacyclic_polymul(x, y, tb1)
    yv = jax.device_put(coeff_view(y, tb4), sh_in)
    prod = pointwise_mul_dist(jax.jit(fwd)(xv), jax.jit(fwd)(yv), tb4)
    got = flat_view(jax.jit(inv)(prod))
    assert (np.asarray(got) == np.asarray(want)).all()


def test_packed_pipeline_bf_100k_checks():
    # BASELINE config[3] verbatim: 100k encrypted distance+radius checks WITH
    # BF membership, pinned against the host oracle (clear blind distance ->
    # key -> filter probe). Mirrors the reference's protocol tail
    # (/root/reference/src/demo.cc:154-177) with the sound mod-t reduction.
    from pplp_tpu.parallel.pipeline import (
        build_packed_pipeline_bf,
        make_packed_inputs,
    )
    from pplp_tpu.primitives.bloom import BloomFilter, BloomParameters

    ctx = make_ctx()
    kg = KeyGenerator(ctx, 33)
    sk, pk = kg.secret_key(), kg.create_public_key()
    enc = Encryptor(ctx, pk)
    xb, yb, s_blind, r_blind, w = 1000, 900, 501, 99, 0xA5A5
    w_len = w.bit_length()

    bp = BloomParameters(
        projected_element_count=r_blind * r_blind,
        false_positive_probability=1e-4,
        random_seed=0xA5A5A5A5,
        index_mode="mixed",
    )
    assert bp.compute_optimal_parameters()
    bf = BloomFilter(bp)
    di = np.arange(r_blind * r_blind, dtype=np.uint64)
    bd_ins = (np.uint64(s_blind) * (di + np.uint64(r_blind))) % np.uint64(T)
    keys_ins = (bd_ins << np.uint64(w_len)) | np.uint64(w)
    bf.insert_u64_batch(
        (keys_ins & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (keys_ins >> np.uint64(32)).astype(np.uint32),
    )

    total = ((100_000 + N - 1) // N) * N  # >= 100k, whole rows
    rng = np.random.default_rng(7)
    # Mix of near (inside radius) and far coordinates.
    near_frac = rng.random(total) < 0.5
    dx = rng.integers(-r_blind + 1, r_blind, total)
    dy_cap = np.sqrt(np.maximum(r_blind**2 - 1 - dx**2, 0)).astype(np.int64)
    dy = (rng.integers(0, 2**31, total) % (2 * dy_cap + 1)) - dy_cap
    xa = np.where(near_frac, xb + dx, rng.integers(0, 4000, total))
    ya = np.where(near_frac, yb + dy, rng.integers(0, 4000, total))
    xa = xa.astype(np.uint64)
    ya = ya.astype(np.uint64)

    fn = jax.jit(
        build_packed_pipeline_bf(ctx, sk, xb, yb, s_blind, r_blind, w, w_len)
    )
    args = make_packed_inputs(ctx, enc, xa, ya, jax.random.key(8))
    got = np.asarray(
        fn(*args, bf._bits_device(), bf._salts_device(), jnp.uint32(bf.table_size))
    ).reshape(-1)

    # Host oracle: clear blind distance -> packed key -> device batch probe
    # (contains_u64_batch is itself pinned against host scalars in
    # tests/test_primitives.py).
    d2 = (xa.astype(np.int64) - xb) ** 2 + (ya.astype(np.int64) - yb) ** 2
    bd = (np.uint64(s_blind) * ((d2.astype(np.uint64)) + np.uint64(r_blind))) % np.uint64(T)
    keys = (bd << np.uint64(w_len)) | np.uint64(w)
    want = np.asarray(
        bf.contains_u64_batch(
            (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (keys >> np.uint64(32)).astype(np.uint32),
        )
    )
    assert got.shape[0] == total and total >= 100_000
    assert (got == want).all()
    # No false negatives, ever: every truly-near check must flag near.
    assert got[d2 < r_blind * r_blind].all()
    # Host-scalar spot check on a subsample (exact reference probe math).
    idx = rng.choice(total, 64, replace=False)
    for j in idx:
        assert bool(got[j]) == bf.contains_u64(int(keys[j]))
