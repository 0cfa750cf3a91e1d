"""Round-5 A/B: one-shot vs streamed BF serialize+send at r=4096 scale.

Interleaved reps so both variants sample the same tunnel/chip climate.
"""

import json
import socket
import sys
import threading
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pplp_tpu.primitives.bloom import BloomFilter, BloomParameters  # noqa: E402
from pplp_tpu.protocol.transport import Channel  # noqa: E402
from pplp_tpu.utils.chipstate import enable_compile_cache, fresh_canary_us  # noqa: E402

enable_compile_cache()


def log(o):
    print(json.dumps(o), flush=True)


def build_filter(r):
    count = r * r
    p = BloomParameters(
        projected_element_count=count,
        false_positive_probability=1e-4,
        random_seed=0xA5A5A5A5,
    )
    assert p.compute_optimal_parameters()
    bf = BloomFilter(p)
    chunk = 1 << 22
    for start in range(0, count, chunk):
        di = np.arange(start, min(start + chunk, count), dtype=np.uint64)
        keys = (np.uint64(0x9E3779B1) * (di + np.uint64(r))) << np.uint64(16)
        bf.insert_u64_batch(
            jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((keys >> np.uint64(32)).astype(np.uint32)),
        )
    return bf


def drain(rx, got):
    got["b"] = rx.recv_frame()


def run_stream(bf, chunk_bytes):
    s1, s2 = socket.socketpair()
    tx, rx = Channel(s1), Channel(s2)
    got = {}
    th = threading.Thread(target=drain, args=(rx, got))
    th.start()
    bf._host_dirty = True  # force the device fetch path every rep
    t0 = time.perf_counter()
    tx.send_frame_stream(
        bf.compute_serialization_size(), bf.iter_serialized(chunk_bytes)
    )
    th.join()
    dt = time.perf_counter() - t0
    s1.close(), s2.close()
    return dt, len(got["b"])


def run_oneshot(bf):
    s1, s2 = socket.socketpair()
    tx, rx = Channel(s1), Channel(s2)
    got = {}
    th = threading.Thread(target=drain, args=(rx, got))
    th.start()
    bf._host_dirty = True
    t0 = time.perf_counter()
    tx.send_frame(bf.serialize())
    th.join()
    dt = time.perf_counter() - t0
    s1.close(), s2.close()
    return dt, len(got["b"])


def main():
    r = 4096
    t0 = time.perf_counter()
    bf = build_filter(r)
    log({"built": True, "s": round(time.perf_counter() - t0, 1),
         "table_mb": round(bf.table_size / 8 / 1e6, 1),
         "fresh_canary_us": fresh_canary_us()})
    variants = {
        "oneshot": lambda: run_oneshot(bf),
        "stream_4M": lambda: run_stream(bf, 4 << 20),
        "stream_16M": lambda: run_stream(bf, 16 << 20),
    }
    results = {k: [] for k in variants}
    for rep in range(4):
        for name, f in variants.items():
            dt, nb = f()
            results[name].append(dt)
        time.sleep(0.3)
    out = {
        k: {"s_best": round(min(v), 2),
            "s_median": round(sorted(v)[len(v) // 2], 2)}
        for k, v in results.items()
    }
    out["fresh_canary_us"] = fresh_canary_us()
    log(out)


if __name__ == "__main__":
    main()
