"""Native C++ transport + Bloom hot paths vs the Python implementations."""

import threading

import numpy as np
import pytest

from pplp_tpu.protocol.native_transport import (
    bf_indices_u64,
    bf_insert_u64,
    native_available,
    native_connect_to_client,
    native_connect_to_server,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for native library"
)


def test_native_frame_roundtrip():
    port = 47113
    payloads = [b"hello", b"x" * 100000, b""]
    out = {}

    def server():
        ch = native_connect_to_client("127.0.0.1", port)
        got = [ch.recv_frame() for _ in payloads]
        ch.send_frame(b"ack" + got[1][:5])
        out["server"] = got
        ch.close()

    th = threading.Thread(target=server)
    th.start()
    import time

    time.sleep(0.2)
    ch = native_connect_to_server("127.0.0.1", port)
    for p in payloads:
        ch.send_frame(p)
    ack = ch.recv_frame()
    ch.close()
    th.join(timeout=10)
    assert out["server"] == payloads
    assert ack == b"ackxxxxx"
    assert ch.bytes_sent == 3 * 128 + sum(len(p) for p in payloads)


def test_native_interop_with_python_channel():
    # Native client <-> Python server: framing must be wire-compatible.
    import socket

    from pplp_tpu.protocol.transport import Channel

    port = 47114
    out = {}

    def pyserver():
        listener = socket.socket()
        listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        listener.bind(("127.0.0.1", port))
        listener.listen(1)
        conn, _ = listener.accept()
        ch = Channel(conn)
        out["msg"] = ch.recv_frame()
        ch.send_frame(b"from-python")
        ch.close()
        listener.close()

    th = threading.Thread(target=pyserver)
    th.start()
    import time

    time.sleep(0.2)
    ch = native_connect_to_server("127.0.0.1", port)
    ch.send_frame(b"from-native")
    reply = ch.recv_frame()
    ch.close()
    th.join(timeout=10)
    assert out["msg"] == b"from-native"
    assert reply == b"from-python"


@pytest.mark.parametrize("mixed", [False, True])
def test_native_bf_matches_python(mixed):
    from pplp_tpu.primitives import BloomFilter, BloomParameters

    p = BloomParameters(
        projected_element_count=500,
        false_positive_probability=1e-4,
        random_seed=0xA5A5A5A5,
        index_mode="mixed" if mixed else "reference",
    )
    p.compute_optimal_parameters()
    bf_py = BloomFilter(p)
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 64, 500, dtype=np.uint64)
    for k in keys:
        bf_py.insert_u64(int(k))

    bf_nat = BloomFilter(p)
    bf_insert_u64(keys, bf_nat.salts, bf_nat.table_size, mixed, bf_nat.bit_table)
    assert (bf_nat.bit_table == bf_py.bit_table).all()

    idx = bf_indices_u64(keys[:5], bf_py.salts, bf_py.table_size, mixed)
    for i, k in enumerate(keys[:5]):
        expected = list(bf_py._indices(int(k).to_bytes(8, "little")))
        assert list(idx[i]) == expected
