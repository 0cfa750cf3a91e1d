"""Two-real-party secure computation over TCP: each party holds ONLY its own
additive share; multiplication consumes OT-generated Beaver triples with
interactive openings. This is the networked counterpart of ``sharing``'s
in-process simulation, completing ABY-parity for the pplp predicates
(reference drives ABY with two processes: src/aby/*/mytest.cpp roles).

Wire format: frames of little-endian u32 arrays over ``protocol.transport``.
Linear gates are local; each ``mul`` costs one round (both parties exchange
the (d, e) opening shares)."""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import numpy as np

from . import ot

__all__ = [
    "PartyArith",
    "circle_predicate_2pc_networked",
    "polygon_predicate_2pc_networked",
]

_U32 = np.uint32


def _rng(seed: int | None, role: int, salt: int) -> random.Random:
    """SystemRandom (os.urandom) unless a TEST-ONLY seed is given."""
    if seed is None:
        return random.SystemRandom()
    return random.Random((seed << 3) + (salt << 1) + role)


def _send_u32(ch, arr: np.ndarray):
    ch.send_frame(np.ascontiguousarray(arr, _U32).tobytes())


def _recv_u32(ch) -> np.ndarray:
    return np.frombuffer(ch.recv_frame(), _U32).copy()


@dataclass
class PartyArith:
    """One party's arithmetic-sharing engine over Z_{2^32}.

    ``triples`` is this party's (a, b, c) share pool from ``ot.ot_triples``
    (flat arrays, consumed in order)."""

    ch: object
    role: int
    triples: tuple[np.ndarray, np.ndarray, np.ndarray]
    _used: int = field(default=0)

    @staticmethod
    def setup(ch, role: int, n_triples: int, group: ot.SchnorrGroup | None = None,
              seed: int | None = None) -> "PartyArith":
        """Generate the triple pool via the OT stack (both parties call this
        with the same n_triples).

        ``seed`` is a TEST-ONLY reproducibility hook: passing one derives all
        protocol randomness from insecure MT19937. Production callers leave
        it None and get os.urandom-backed SystemRandom."""
        group = group or ot.SchnorrGroup.generate(pbits=512, qbits=160, seed=1)
        rng = _rng(seed, role, 1)
        trip = ot.ot_triples(ch, role, n_triples, group, rng)
        return PartyArith(ch=ch, role=role, triples=trip)

    # -- inputs ----------------------------------------------------------

    def share_input(self, x=None, rng: random.Random | None = None) -> np.ndarray:
        """Share an input owned by whoever passes ``x`` (the other party
        passes None). Owner keeps r, sends x - r."""
        if x is not None:
            x = np.asarray(x, _U32)
            rng = rng or random.SystemRandom()
            r = np.array([rng.getrandbits(32) for _ in x], _U32)
            _send_u32(self.ch, (x - r).astype(_U32))
            return r
        return _recv_u32(self.ch)

    def share_public(self, x) -> np.ndarray:
        """A public constant: role 0 holds it, role 1 holds zero."""
        x = np.asarray(x, _U32)
        return x if self.role == 0 else np.zeros_like(x)

    # -- gates -----------------------------------------------------------

    def _next_triple(self, n: int):
        a, b, c = self.triples
        i = self._used
        if i + n > len(a):
            raise RuntimeError("triple pool exhausted")
        self._used = i + n
        return a[i : i + n], b[i : i + n], c[i : i + n]

    def _exchange(self, arr: np.ndarray) -> np.ndarray:
        """Symmetric exchange without simultaneous-send deadlock: role 0
        sends first, role 1 receives first (both sendall-ing at once can
        block forever once frames exceed the socket buffer)."""
        if self.role == 0:
            _send_u32(self.ch, arr)
            return _recv_u32(self.ch)
        other = _recv_u32(self.ch)
        _send_u32(self.ch, arr)
        return other

    def mul(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Beaver multiply: one (d, e)-share exchange round."""
        a, b, c = self._next_triple(len(x))
        d_sh = (x - a).astype(_U32)
        e_sh = (y - b).astype(_U32)
        other = self._exchange(np.concatenate([d_sh, e_sh]))
        d = (d_sh + other[: len(x)]).astype(_U32)
        e = (e_sh + other[len(x) :]).astype(_U32)
        z = (c + d * b + e * a).astype(_U32)
        if self.role == 0:
            z = (z + d * e).astype(_U32)
        return z

    def open(self, x: np.ndarray) -> np.ndarray:
        return (x + self._exchange(np.ascontiguousarray(x, _U32))).astype(_U32)


# ---------------------------------------------------------------------------
# Networked pplp predicates (the ABY mytest.cpp counterparts)
# ---------------------------------------------------------------------------


def circle_predicate_2pc_networked(ch, role: int, my_x, my_y, thr_sq,
                                   group: ot.SchnorrGroup | None = None,
                                   seed: int | None = None,
                                   compare: str = "open") -> np.ndarray:
    """Circle test between two real parties: role 0 = client point(s),
    role 1 = server point(s); thr public. Returns bool[B]: True = CLOSE.

    Mirrors src/aby/circ_ay/pplp.cpp:112-137 (the correct arith+Yao variant):
    d2 in arithmetic sharing; the A2Y comparison runs either by opening the
    blinded distance (``compare="open"``) or inside a garbled circuit
    (``compare="yao"`` — no party sees d2, matching ABY exactly)."""
    my_x = np.atleast_1d(np.asarray(my_x)).astype(np.int64)
    my_y = np.atleast_1d(np.asarray(my_y)).astype(np.int64)
    B = len(my_x)
    party = PartyArith.setup(ch, role, n_triples=2 * B, group=group, seed=seed)
    rng = _rng(seed, role, 2)
    if role == 0:
        sx0 = party.share_input(my_x, rng)
        sy0 = party.share_input(my_y, rng)
        sx1 = party.share_input()
        sy1 = party.share_input()
    else:
        sx0 = party.share_input()
        sy0 = party.share_input()
        sx1 = party.share_input(my_x, rng)
        sy1 = party.share_input(my_y, rng)
    # d2 = (x0-x1)^2 + (y0-y1)^2: differences are linear (local), so the
    # whole distance costs 2 Beaver multiplies, not 6.
    dx = (sx0 - sx1).astype(_U32)
    dy = (sy0 - sy1).astype(_U32)
    d2 = (party.mul(dx, dx) + party.mul(dy, dy)).astype(_U32)
    if compare == "yao":
        from . import yao

        grp = group or ot.SchnorrGroup.generate(pbits=512, qbits=160, seed=1)
        yrng = _rng(seed, role, 3)
        if role == 0:
            return yao.yao_lt_evaluator(ch, d2, grp, yrng)
        return yao.yao_lt_garbler(ch, d2, int(thr_sq), grp, yrng)
    dist = party.open(d2)
    return np.asarray(thr_sq, np.uint32) > dist


def polygon_predicate_2pc_networked(ch, role: int, edges=None, point=None,
                                    group: ot.SchnorrGroup | None = None,
                                    seed: int | None = None,
                                    compare: str = "open") -> np.ndarray:
    """Point-in-convex-polygon between two real parties.

    role 1 (server) passes ``edges`` = (x, y, z) coefficient arrays
    (see circuits.polygon_edge_coeffs); role 0 (client) passes
    ``point`` = (xp, yp) arrays [B]. Returns bool[B]: True = CLOSE.

    Mirrors src/aby/poly_ay/pplp.cpp:115-141 (per-edge orient tests,
    unsigned-GT sign probe, OR-fold)."""
    if role == 0:
        xp, yp = (np.atleast_1d(np.asarray(v)).astype(np.int64) for v in point)
        B = len(xp)
        _send_u32(ch, np.array([B], _U32))
        n_edges = int(_recv_u32(ch)[0])
    else:
        x, y, z = (np.asarray(v, np.int64) for v in edges)
        n_edges = len(x)
        B = int(_recv_u32(ch)[0])
        _send_u32(ch, np.array([n_edges], _U32))
    party = PartyArith.setup(ch, role, n_triples=2 * n_edges * B,
                             group=group, seed=seed)
    rng = _rng(seed, role, 4)
    if role == 0:
        sxp = party.share_input(xp, rng)
        syp = party.share_input(yp, rng)
    else:
        sxp = party.share_input()
        syp = party.share_input()
    far = np.zeros(B, bool)
    orients = []
    for i in range(n_edges):
        if role == 1:
            s_xi = party.share_input(np.full(B, x[i] & 0xFFFFFFFF), rng)
            s_yi = party.share_input(np.full(B, y[i] & 0xFFFFFFFF), rng)
            s_zi = party.share_input(np.full(B, z[i] & 0xFFFFFFFF), rng)
        else:
            s_xi = party.share_input()
            s_yi = party.share_input()
            s_zi = party.share_input()
        orient = (party.mul(s_xi, sxp) + party.mul(s_yi, syp) + s_zi).astype(_U32)
        if compare == "yao":
            orients.append(orient)
            continue
        neg = party.open(orient) > np.uint32(0x7FFFFFFF)
        far |= neg
    if compare == "yao":
        from . import yao

        grp = group or ot.SchnorrGroup.generate(pbits=512, qbits=160, seed=1)
        yrng = _rng(seed, role, 5)
        shares = np.stack(orients, axis=1)  # [B, E]
        if role == 0:
            far = yao.yao_any_negative_evaluator(ch, shares, grp, yrng)
        else:
            far = yao.yao_any_negative_garbler(ch, shares, grp, yrng)
    return ~far
