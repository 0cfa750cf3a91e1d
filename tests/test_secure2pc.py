"""2PC predicates: circuit result vs the clear-verify oracle (the reference's
dual-computation check, applied as a batched property test)."""

import jax
import numpy as np

from pplp_tpu.secure2pc import (
    circle_predicate_2pc,
    circle_predicate_clear,
    polygon_predicate_2pc,
    polygon_predicate_clear,
    polygon_edge_coeffs,
)
from pplp_tpu.secure2pc.sharing import ArithShare, BeaverDealer, reconstruct, share


def test_sharing_and_beaver():
    key = jax.random.key(0)
    k1, k2, kd = jax.random.split(key, 3)
    x = np.array([5, 1000, 2**31, 0], np.uint32)
    y = np.array([7, 999, 3, 2**32 - 1], np.uint32)
    sx, sy = share(x, k1), share(y, k2)
    assert (np.asarray(reconstruct(sx)) == x).all()
    assert (np.asarray(reconstruct(sx + sy)) == x + y).all()
    assert (np.asarray(reconstruct(sx - sy)) == x - y).all()
    dealer = BeaverDealer(kd)
    assert (np.asarray(reconstruct(dealer.mul(sx, sy))) == x * y).all()
    assert (np.asarray(reconstruct(sx.mul_public(3))) == x * np.uint32(3)).all()


def test_circle_matches_clear_oracle():
    rng = np.random.default_rng(0)
    B = 256
    blen = 15  # reference draws 15-bit coords (circ_y/pplp.cpp:40-41)
    x0, y0, x1, y1 = (rng.integers(0, 1 << blen, B) for _ in range(4))
    thr = 5000
    got = np.asarray(
        circle_predicate_2pc(x0, y0, x1, y1, thr * thr, jax.random.key(1))
    )
    ref = circle_predicate_clear(x0, y0, x1, y1, thr * thr)
    assert (got == ref).all()
    assert ref.any() and (~ref).any()  # both verdicts exercised


def test_circle_yao_bug_reproduction():
    # The circ_y CondSwap bug doubles the X distance and ignores Y:
    # result is thr^2 > 2*(dx)^2.
    x0, y0, x1, y1 = 10, 0, 13, 1000
    got = bool(
        np.asarray(
            circle_predicate_2pc(
                [x0], [y0], [x1], [y1], 5 * 5, jax.random.key(2), yao_bug=True
            )
        )[0]
    )
    assert got is True  # 2*(3^2) = 18 < 25 despite real d^2 ~ 1e6


def test_polygon_matches_clear_oracle():
    radius = 1000
    # Square with vertices (+-r, +-r), CCW as in poly_y/pplp.cpp:26-27.
    a = [radius, -radius, -radius, radius]
    b = [radius, radius, -radius, -radius]
    rng = np.random.default_rng(3)
    xp = rng.integers(-2000, 2000, 512)
    yp = rng.integers(-2000, 2000, 512)
    got = np.asarray(polygon_predicate_2pc(a, b, xp, yp, jax.random.key(4)))
    ref = polygon_predicate_clear(a, b, xp, yp)
    assert (got == ref).all()
    assert ref.any() and (~ref).any()
    # Spot-check the geometric meaning.
    inside = (np.abs(xp) <= radius) & (np.abs(yp) <= radius)
    assert (ref == inside).all()


def test_polygon_bug_reproduction():
    # poly_y bug: edges 1..n-1 test xp twice -> wrong verdicts for points
    # whose yp breaks containment but xp doesn't.
    a = [100, -100, -100, 100]
    b = [100, 100, -100, -100]
    # Outside below the square: only the bottom edge (i=2, y_i != 0) catches
    # it, and that's exactly an edge the bug rewires to xp.
    xp, yp = [0], [-500]
    correct = np.asarray(polygon_predicate_2pc(a, b, xp, yp, jax.random.key(5)))
    buggy = np.asarray(
        polygon_predicate_2pc(a, b, xp, yp, jax.random.key(5), yao_bug=True)
    )
    assert not correct[0]
    assert buggy[0] != correct[0]


def test_edge_coeffs():
    x, y, z = polygon_edge_coeffs([0, 2, 2, 0], [0, 0, 2, 2])
    # Edge 0: (0,0)->(2,0): x=b0-b1=0, y=a1-a0=2, z=0.
    assert x[0] == 0 and y[0] == 2 and z[0] == 0
    # Point (1,1) inside the unit-2 square.
    assert polygon_predicate_clear([0, 2, 2, 0], [0, 0, 2, 2], [1], [1])[0]
    assert not polygon_predicate_clear([0, 2, 2, 0], [0, 0, 2, 2], [3], [1])[0]
