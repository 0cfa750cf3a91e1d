"""Bloom filter + blinding tests: device batch paths vs exact host semantics."""

import pytest
import numpy as np
import jax.numpy as jnp

from pplp_tpu.primitives import (
    Blinding,
    BloomFilter,
    BloomParameters,
    blind_distance_keys,
    pack_key,
)


def make_bf(count=1000, fpp=1e-4, seed=0xA5A5A5A5):
    p = BloomParameters(
        projected_element_count=count,
        false_positive_probability=fpp,
        random_seed=seed,
    )
    assert p.compute_optimal_parameters()
    return BloomFilter(p)


def test_optimal_parameters_match_reference_math():
    # fpp=1e-4 -> k=13; table sized to byte multiple (bloomfilter.h:98-151).
    p = BloomParameters(
        projected_element_count=10000,
        false_positive_probability=1e-4,
        random_seed=0xA5A5A5A5,
    )
    p.compute_optimal_parameters()
    assert p.number_of_hashes == 13
    assert p.table_size % 8 == 0
    # m ~ -k*n / ln(1 - p^(1/k)) at k=13 for n=10000: ~191700 bits.
    assert 191000 < p.table_size < 193000


def test_host_insert_contains_no_false_negatives():
    bf = make_bf()
    keys = [k * k + 7 for k in range(500)]
    for k in keys:
        bf.insert_u64(k)
    assert all(bf.contains_u64(k) for k in keys)
    misses = sum(bf.contains_u64(k + 10**12) for k in keys)
    assert misses <= 3  # fpp 1e-4: expect ~0


def test_device_batch_matches_host_scalar():
    bf_host = make_bf(count=5000)
    bf_dev = make_bf(count=5000)
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 64, size=3000, dtype=np.uint64)
    for k in keys:
        bf_host.insert_u64(int(k))
    klo = jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    khi = jnp.asarray((keys >> np.uint64(32)).astype(np.uint32))
    bf_dev.insert_u64_batch(klo, khi)
    assert bf_host == bf_dev  # identical bit tables
    got = np.asarray(bf_dev.contains_u64_batch(klo, khi))
    assert got.all()


def test_serialize_roundtrip_wire_format():
    bf = make_bf(count=100, fpp=1e-6, seed=0x12345)
    for k in range(100):
        bf.insert_u64(k * 1000003)
    blob = bf.serialize()
    assert len(blob) == bf.compute_serialization_size()
    # Packed header is 44 bytes (4 + 4*8 + 8 double).
    assert len(blob) == 44 + 4 * bf.salt_count + bf.table_size // 8
    bf2 = BloomFilter.deserialize(blob)
    assert bf2 == bf
    assert all(bf2.contains_u64(k * 1000003) for k in range(100))


def test_set_algebra():
    a, b = make_bf(), make_bf()
    for k in range(100):
        a.insert_u64(k)
    for k in range(50, 150):
        b.insert_u64(k)
    u = make_bf()
    for k in range(100):
        u.insert_u64(k)
    u |= b
    for k in range(150):
        assert u.contains_u64(k)
    a &= b
    for k in range(50, 100):
        assert a.contains_u64(k)


def test_blind_distance_keys_match_reference_loop():
    bl = Blinding.deterministic(99)
    sq_radius = 10000
    got_lo, got_hi = [], []
    for klo, khi, count in blind_distance_keys(bl, sq_radius, chunk=4096):
        got_lo.append(np.asarray(klo)[:count])
        got_hi.append(np.asarray(khi)[:count])
    got = np.concatenate(got_lo).astype(np.uint64) | (
        np.concatenate(got_hi).astype(np.uint64) << np.uint64(32)
    )
    for di in [0, 1, 17, 9999]:
        bd = (bl.s * (di + bl.r)) & ((1 << 64) - 1)
        assert int(got[di]) == pack_key(bd, bl.w, bl.w_len)


def test_end_to_end_proximity_membership():
    # d^2 < r^2 iff the blinded key is in the filter (demo.cc math).
    bl = Blinding.deterministic(5)
    radius = 64
    sq = radius * radius
    p = BloomParameters(
        projected_element_count=sq,
        false_positive_probability=1e-4,
        random_seed=0xA5A5A5A5,
    )
    p.compute_optimal_parameters()
    bf = BloomFilter(p)
    for klo, khi, count in blind_distance_keys(bl, sq):
        bf.insert_u64_batch(klo, khi, count=count)
    for d2 in [0, 1, sq - 1]:
        bd = (bl.s * (d2 + bl.r)) & ((1 << 64) - 1)
        assert bf.contains_u64(pack_key(bd, bl.w, bl.w_len))
    for d2 in [sq, sq + 1, sq + 12345]:
        bd = (bl.s * (d2 + bl.r)) & ((1 << 64) - 1)
        assert not bf.contains_u64(pack_key(bd, bl.w, bl.w_len))


def test_compressible_bloom_filter():
    """Compression keeps all inserted keys resolvable (bloomfilter.h:613)."""
    from pplp_tpu.primitives.bloom import BloomParameters, CompressibleBloomFilter

    params = BloomParameters(
        projected_element_count=500,
        false_positive_probability=1e-4,
        random_seed=0xA5A5A5A5,
    )
    assert params.compute_optimal_parameters()
    bf = CompressibleBloomFilter(params)
    keys = list(range(100, 400))
    for k in keys:
        bf.insert_u64(k)
    orig_size = bf.table_size
    assert bf.compress(50.0)
    assert bf.table_size < orig_size
    assert len(bf.size_list) == 2
    assert all(bf.contains_u64(k) for k in keys)
    # Degenerate requests refused, filter unchanged.
    assert not bf.compress(0.0)
    assert not bf.compress(100.0)
    # Batched device probes follow the size chain too.
    import numpy as np

    klo = np.asarray(keys, np.uint64) & 0xFFFFFFFF
    khi = np.asarray(keys, np.uint64) >> 32
    got = bf.contains_u64_batch(klo.astype(np.uint32), khi.astype(np.uint32))
    assert bool(np.asarray(got).all())


def test_compressible_bloom_serialize_roundtrip():
    from pplp_tpu.primitives.bloom import BloomParameters, CompressibleBloomFilter

    params = BloomParameters(
        projected_element_count=300,
        false_positive_probability=1e-4,
        random_seed=0xA5A5A5A5,
    )
    assert params.compute_optimal_parameters()
    bf = CompressibleBloomFilter(params)
    for k in range(50, 200):
        bf.insert_u64(k)
    assert bf.compress(40.0)
    blob = bf.serialize()
    assert len(blob) == bf.compute_serialization_size()
    bf2 = CompressibleBloomFilter.deserialize(blob)
    assert bf2.size_list == bf.size_list
    assert all(bf2.contains_u64(k) for k in range(50, 200))
    assert bf2 == bf


@pytest.mark.slow
def test_large_radius_bf_regime():
    """The r=2048 regime (4.2M inserts — the reference sweep's tail,
    /root/reference/src/test/test_client.cc:52-69): device batch insert,
    serialize, deserialize, and membership all hold at this scale."""
    r = 2048
    count = r * r  # 4,194,304 keys
    bf = make_bf(count=count, fpp=1e-4)
    rng = np.random.default_rng(7)
    s, w, wlen = 0x9E3779B1, 0x5A5A, 16
    di = np.arange(count, dtype=np.uint64)
    keys = ((np.uint64(s) * (di + np.uint64(r))) << np.uint64(wlen)) | np.uint64(w)
    klo = jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    khi = jnp.asarray((keys >> np.uint64(32)).astype(np.uint32))
    bf.insert_u64_batch(klo, khi)
    # spot membership on a sample + serialize roundtrip at full size
    sample = rng.integers(0, count, size=2000)
    got = np.asarray(bf.contains_u64_batch(klo[sample], khi[sample]))
    assert got.all()
    blob = bf.serialize()
    bf2 = BloomFilter.deserialize(blob)
    probe = rng.integers(0, count, size=200)
    assert all(
        bf2.contains_u64(int(keys[i])) for i in probe
    )


def test_iter_serialized_matches_serialize_and_streams_on_wire():
    # Streamed serialization (round-5, VERDICT r4 task 5): the chunked
    # device-fetch path must produce byte-identical output to serialize(),
    # and Channel.send_frame_stream must frame it identically to a one-shot
    # send_frame.
    import socket
    import threading

    from pplp_tpu.protocol.transport import Channel

    bf_a = make_bf(count=5000)
    bf_b = make_bf(count=5000)
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 1 << 64, size=4000, dtype=np.uint64)
    klo = jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    khi = jnp.asarray((keys >> np.uint64(32)).astype(np.uint32))
    bf_a.insert_u64_batch(klo, khi)
    bf_b.insert_u64_batch(klo, khi)

    stream = b"".join(bf_a.iter_serialized(chunk_bytes=1024))
    assert stream == bf_b.serialize()
    assert len(stream) == bf_a.compute_serialization_size()
    # iter_serialized also refreshed the host cache:
    assert bf_a.serialize() == stream

    s1, s2 = socket.socketpair()
    tx, rx = Channel(s1), Channel(s2)
    got = {}
    th = threading.Thread(target=lambda: got.update(b=rx.recv_frame()))
    th.start()
    sent = tx.send_frame_stream(
        len(stream), (stream[o : o + 777] for o in range(0, len(stream), 777))
    )
    th.join(timeout=30)
    assert sent == len(stream) and got["b"] == stream
    s1.close(), s2.close()
