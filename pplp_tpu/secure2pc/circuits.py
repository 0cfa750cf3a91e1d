"""The four pplp 2PC predicate circuits + clear-verify oracles, batched.

Circle (reference ``src/aby/circ_ay/pplp.cpp:112-137``, the correct variant):
  d2 = (x0^2 + x1^2 - 2 x0 x1) + (y0^2 + y1^2 - 2 y0 y1) in arithmetic
  sharing; A2Y boundary; output = GT(thr, d2)  (1 = CLOSE).
  The pure-Yao variant (``circ_y/pplp.cpp:108-137``) computes |max-min| via
  CondSwap first; its recorded bug (ymax/ymin taken from swappedX,
  SURVEY.md §4) is reproducible via ``yao_bug=True``.

Polygon (reference ``src/aby/poly_y/pplp.cpp:115-141``): for each edge,
  orient_i = x_i*xp + y_i*yp + z_i; negativity tested as unsigned
  GT(orient, 0x7fffffff); OR-fold. Output 1 = some edge negative = FAR
  (0 = CLOSE). The recorded bug (edges >= 1 multiply xp where yp is intended)
  is reproducible via ``yao_bug=True``.

All arithmetic is u32 ring arithmetic (ABY bitlen=32) on device arrays, so a
batch of B instances evaluates as one vectorized circuit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sharing import ArithShare, BeaverDealer, open_for_yao, reconstruct, share

__all__ = [
    "circle_predicate_clear",
    "circle_predicate_2pc",
    "polygon_edge_coeffs",
    "polygon_predicate_clear",
    "polygon_predicate_2pc",
]

_MAX_POS = jnp.uint32(0x7FFFFFFF)


def _u32(x):
    return jnp.asarray(np.asarray(x) & 0xFFFFFFFF, jnp.uint32)


# ---------------------------------------------------------------------------
# Circle: squared distance < r^2
# ---------------------------------------------------------------------------


def circle_predicate_clear(x0, y0, x1, y1, thr_sq):
    """Local-verify oracle (circ_y/pplp.cpp:99-101): d^2 < thr^2 -> CLOSE."""
    x0, y0, x1, y1 = (np.asarray(v, np.int64) for v in (x0, y0, x1, y1))
    d2 = (x0 - x1) ** 2 + (y0 - y1) ** 2
    return d2 < np.asarray(thr_sq, np.int64)


def circle_predicate_2pc(x0, y0, x1, y1, thr_sq, key=None, yao_bug=False):
    """2PC circle test: client holds (x0,y0), server (x1,y1), thr public.

    Returns bool array: True = CLOSE (output 1 in the reference).
    """
    key = key if key is not None else jax.random.key(0)
    k0, k1, k2, k3, kd = jax.random.split(key, 5)
    dealer = BeaverDealer(kd)
    sx0, sy0 = share(_u32(x0), k0), share(_u32(y0), k1)
    sx1, sy1 = share(_u32(x1), k2), share(_u32(y1), k3)

    if yao_bug:
        # circ_y variant: CondSwap |max - min| with the swappedX/Y mixup.
        x0v, x1v = open_for_yao(sx0), open_for_yao(sx1)
        y0v, y1v = open_for_yao(sy0), open_for_yao(sy1)
        xmax, xmin = jnp.maximum(x0v, x1v), jnp.minimum(x0v, x1v)
        # Bug (circ_y/pplp.cpp:119-121): ymax/ymin read swappedX.
        ymax, ymin = xmax, xmin
        fx = xmax - xmin
        fy = ymax - ymin
        d2 = fx * fx + fy * fy
        return _u32(thr_sq) > d2

    # circ_ay variant (correct): all in arithmetic sharing, GT after A2Y.
    x00 = dealer.mul(sx0, sx0)
    x11 = dealer.mul(sx1, sx1)
    x01 = dealer.mul(sx0, sx1)
    y00 = dealer.mul(sy0, sy0)
    y11 = dealer.mul(sy1, sy1)
    y01 = dealer.mul(sy0, sy1)
    xx = x00 + x11 - x01 - x01
    yy = y00 + y11 - y01 - y01
    dist = open_for_yao(xx + yy)  # A2Y boundary
    return _u32(thr_sq) > dist


# ---------------------------------------------------------------------------
# Polygon: point-in-convex-polygon via half-plane orientation tests
# ---------------------------------------------------------------------------


def polygon_edge_coeffs(a, b):
    """Edge coefficients from vertex lists (poly_y/pplp.cpp:38-47):
    x_i = b_i - b_{i+1}, y_i = a_{i+1} - a_i, z_i = a_i b_{i+1} - a_{i+1} b_i.
    """
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    an = np.roll(a, -1)
    bn = np.roll(b, -1)
    return b - bn, an - a, a * bn - an * b


def polygon_predicate_clear(a, b, xp, yp):
    """Local-verify oracle (poly_y/pplp.cpp:98-108): all orients >= 0."""
    x, y, z = polygon_edge_coeffs(a, b)
    xp = np.asarray(xp, np.int64)
    yp = np.asarray(yp, np.int64)
    orient = (
        x[:, None] * xp[None, :] + y[:, None] * yp[None, :] + z[:, None]
    )
    return (orient >= 0).all(axis=0)


def polygon_predicate_2pc(a, b, xp, yp, key=None, yao_bug=False):
    """2PC polygon test: server holds edge coeffs, client the point.

    Returns bool array: True = CLOSE (reference output 0 = CLOSE; this
    returns the verdict, not the raw wire bit).
    """
    key = key if key is not None else jax.random.key(0)
    x, y, z = polygon_edge_coeffs(a, b)
    n = len(x)
    kxp, kyp, kd, *kedges = jax.random.split(key, 3 + 3 * n)
    dealer = BeaverDealer(kd)
    sxp = share(_u32(xp), kxp)
    syp = share(_u32(yp), kyp)

    far = None
    for i in range(n):
        kx, ky, kz = kedges[3 * i : 3 * i + 3]
        s_xi = share(jnp.broadcast_to(_u32(x[i]), sxp.s0.shape), kx)
        s_yi = share(jnp.broadcast_to(_u32(y[i]), sxp.s0.shape), ky)
        px = dealer.mul(s_xi, sxp)
        # Bug (poly_y/pplp.cpp:131): edges >= 1 use xp where yp is intended.
        py = dealer.mul(s_yi, sxp if (yao_bug and i >= 1) else syp)
        orient = px + py + _u32(z[i])
        neg = open_for_yao(orient) > _MAX_POS  # unsigned GT 0x7fffffff
        far = neg if far is None else (far | neg)
    return ~far
