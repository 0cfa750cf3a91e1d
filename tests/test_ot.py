"""OT stack: Chou–Orlandi base OT, IKNP extension, Gilboa Beaver triples —
two real parties over a socketpair."""

import random
import socket
import threading

import numpy as np
import pytest

from pplp_tpu.protocol.transport import Channel
from pplp_tpu.secure2pc import ot


@pytest.fixture(scope="module")
def group():
    return ot.SchnorrGroup.generate(pbits=512, qbits=160, seed=3)


def _pair():
    a, b = socket.socketpair()
    return Channel(a), Channel(b)


def _run_pair(f0, f1):
    out = [None, None]
    err = []

    def wrap(i, f):
        try:
            out[i] = f()
        except Exception as e:  # pragma: no cover
            err.append(e)

    t = threading.Thread(target=wrap, args=(1, f1))
    t.start()
    wrap(0, f0)
    t.join()
    if err:
        raise err[0]
    return out


def test_base_ot(group):
    ca, cb = _pair()
    choices = [0, 1, 1, 0, 1]
    keys, got = _run_pair(
        lambda: ot.base_ot_send(ca, group, len(choices), random.Random(1)),
        lambda: ot.base_ot_recv(cb, group, choices, random.Random(2)),
    )
    for c, (k0, k1), kr in zip(choices, keys, got):
        assert kr == (k1 if c else k0)
        assert k0 != k1


def test_iknp_extension(group):
    ca, cb = _pair()
    m = 300
    rng = np.random.default_rng(0)
    choices = rng.integers(0, 2, m).astype(np.uint8)
    (p0, p1), pads = _run_pair(
        lambda: ot.iknp_send(ca, group, m, random.Random(3)),
        lambda: ot.iknp_recv(cb, group, choices, random.Random(4)),
    )
    for i in range(m):
        assert pads[i] == (p1[i] if choices[i] else p0[i])
        assert p0[i] != p1[i]


def test_gilboa_cross_share(group):
    ca, cb = _pair()
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 32, 17).astype(np.uint32)
    b = rng.integers(0, 1 << 32, 17).astype(np.uint32)
    s0, s1 = _run_pair(
        lambda: ot.gilboa_cross_share(ca, 0, a, group, random.Random(5)),
        lambda: ot.gilboa_cross_share(cb, 1, b, group, random.Random(6)),
    )
    assert ((s0 + s1) == (a * b)).all()


def test_ot_triples(group):
    ca, cb = _pair()
    n = 9
    t0, t1 = _run_pair(
        lambda: ot.ot_triples(ca, 0, n, group, random.Random(7)),
        lambda: ot.ot_triples(cb, 1, n, group, random.Random(8)),
    )
    a = t0[0] + t1[0]
    b = t0[1] + t1[1]
    c = t0[2] + t1[2]
    assert (c == a * b).all()
