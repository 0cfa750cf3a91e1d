"""Networked 2PC (OT triples + interactive Beaver openings) vs clear oracles."""

import random
import socket
import threading

import numpy as np
import pytest

from pplp_tpu.protocol.transport import Channel
from pplp_tpu.secure2pc import ot
from pplp_tpu.secure2pc.circuits import (
    circle_predicate_clear,
    polygon_edge_coeffs,
    polygon_predicate_clear,
)
from pplp_tpu.secure2pc.networked import (
    PartyArith,
    circle_predicate_2pc_networked,
    polygon_predicate_2pc_networked,
)


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


def test_party_arith_mul_open(group):
    ca, cb = _pair()

    def p0():
        pa = PartyArith.setup(ca, 0, 4, group, seed=5)
        x = pa.share_input(np.array([3, 100, 7, 9], np.uint32), random.Random(1))
        y = pa.share_input()
        return pa.open(pa.mul(x, y))

    def p1():
        pb = PartyArith.setup(cb, 1, 4, group, seed=5)
        x = pb.share_input()
        y = pb.share_input(np.array([5, 2, 11, 13], np.uint32), random.Random(2))
        return pb.open(pb.mul(x, y))

    r0, r1 = _run_pair(p0, p1)
    expect = np.array([15, 200, 77, 117], np.uint32)
    assert (r0 == expect).all() and (r1 == expect).all()


def test_circle_networked_matches_oracle(group):
    rng = np.random.default_rng(0)
    B = 5
    x0 = rng.integers(0, 2000, B)
    y0 = rng.integers(0, 2000, B)
    x1 = rng.integers(0, 2000, B)
    y1 = rng.integers(0, 2000, B)
    thr_sq = 1000 * 1000
    ca, cb = _pair()
    r0, r1 = _run_pair(
        lambda: circle_predicate_2pc_networked(ca, 0, x0, y0, thr_sq, group),
        lambda: circle_predicate_2pc_networked(cb, 1, x1, y1, thr_sq, group),
    )
    oracle = circle_predicate_clear(x0, y0, x1, y1, thr_sq)
    assert (r0 == oracle).all() and (r1 == oracle).all()


def test_polygon_networked_matches_oracle(group):
    # A convex quad (counter-clockwise) and points inside/outside.
    a = np.array([0, 1000, 1000, 0])
    b = np.array([0, 0, 1000, 1000])
    xp = np.array([500, 1500, 10, 999])
    yp = np.array([500, 500, 10, 999])
    ca, cb = _pair()
    r0, r1 = _run_pair(
        lambda: polygon_predicate_2pc_networked(ca, 0, point=(xp, yp), group=group),
        lambda: polygon_predicate_2pc_networked(
            cb, 1, edges=polygon_edge_coeffs(a, b), group=group
        ),
    )
    oracle = polygon_predicate_clear(a, b, xp, yp)
    assert (r0 == oracle).all() and (r1 == oracle).all()


def test_circle_networked_yao(group):
    rng = np.random.default_rng(2)
    B = 4
    x0 = rng.integers(0, 2000, B)
    y0 = rng.integers(0, 2000, B)
    x1 = rng.integers(0, 2000, B)
    y1 = rng.integers(0, 2000, B)
    thr_sq = 900 * 900
    ca, cb = _pair()
    r0, r1 = _run_pair(
        lambda: circle_predicate_2pc_networked(
            ca, 0, x0, y0, thr_sq, group, compare="yao"
        ),
        lambda: circle_predicate_2pc_networked(
            cb, 1, x1, y1, thr_sq, group, compare="yao"
        ),
    )
    oracle = circle_predicate_clear(x0, y0, x1, y1, thr_sq)
    assert (r0 == oracle).all() and (r1 == oracle).all()


def test_polygon_networked_yao(group):
    a = np.array([0, 1000, 1000, 0])
    b = np.array([0, 0, 1000, 1000])
    xp = np.array([500, 1500, 10])
    yp = np.array([500, 500, 10])
    ca, cb = _pair()
    r0, r1 = _run_pair(
        lambda: polygon_predicate_2pc_networked(
            ca, 0, point=(xp, yp), group=group, compare="yao"
        ),
        lambda: polygon_predicate_2pc_networked(
            cb, 1, edges=polygon_edge_coeffs(a, b), group=group, compare="yao"
        ),
    )
    oracle = polygon_predicate_clear(a, b, xp, yp)
    assert (r0 == oracle).all() and (r1 == oracle).all()
