"""Oblivious transfer: base OT + IKNP extension + Gilboa triple generation.

This replaces the trusted-dealer model in ``sharing.BeaverDealer`` with the
protocol stack the reference gets from the ABY library (OT-extension-based
multiplication triples; /root/reference/src/aby/*/pplp.cpp runs on ABY's
IKNP/KK13 OT): two real parties over the framed TCP ``protocol.transport``
channel.

Components (host-side crypto transport, like ABY's CPU OT engine — the 2PC
compute gates themselves stay vectorized on device in ``sharing``):

* ``SchnorrGroup`` — prime-order-q subgroup of Z_p*, generated with this
  repo's own provable-prime machinery (``dgk.maurer``/``dgk.gdsa``).
* ``base_ot_send/recv`` — Chou–Orlandi "simplest OT" in that group, hashing
  (index, A, B, point) into 16-byte seeds.
* ``iknp_send/recv`` — IKNP extension: 128 base OTs in reversed roles seed a
  PRG-expanded bit matrix; rows hash into per-OT pads (random OT).
* ``cot_*`` — correlated OT over Z_{2^32} derived from random OT.
* ``gilboa_cross_share`` / ``ot_triples`` — N Beaver triples over Z_{2^32}
  from 32 COTs per cross term.

Security notes: PRG and hashes are SHA-256-based (correlation-robust-hash
assumption); the base OT needs ~2^128 work to break at the default
p=2048/q=256 group. This is a faithful protocol implementation, not a
constant-time one.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

import numpy as np

__all__ = [
    "SchnorrGroup",
    "base_ot_send",
    "base_ot_recv",
    "iknp_send",
    "iknp_recv",
    "gilboa_cross_share",
    "ot_triples",
]

KAPPA = 128            # security parameter: base-OT count / matrix width
SEED_BYTES = 16
_M32 = np.uint32(0xFFFFFFFF)


def _h(*parts: bytes) -> bytes:
    h = hashlib.sha256()
    for p in parts:
        h.update(len(p).to_bytes(4, "little"))
        h.update(p)
    return h.digest()


def _int_bytes(v: int, size: int) -> bytes:
    return int(v).to_bytes(size, "little")


def _prg_bits(seed: bytes, nbits: int, tag: bytes) -> np.ndarray:
    """SHA-256 counter-mode PRG -> uint8 bit array [nbits]."""
    nbytes = (nbits + 7) // 8
    out = bytearray()
    ctr = 0
    while len(out) < nbytes:
        out += _h(seed, tag, ctr.to_bytes(4, "little"))
        ctr += 1
    arr = np.frombuffer(bytes(out[:nbytes]), np.uint8)
    return np.unpackbits(arr, bitorder="little")[:nbits]


# ---------------------------------------------------------------------------
# Group + base OT (Chou–Orlandi)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SchnorrGroup:
    """Prime-order subgroup: g has order q in Z_p*."""

    p: int
    q: int
    g: int

    @staticmethod
    def generate(pbits: int = 2048, qbits: int = 256, seed: int = 0) -> "SchnorrGroup":
        from ..dgk.gdsa import gdsa_prime
        from ..dgk.maurer import maurer

        rng = random.Random(seed)
        q = maurer(qbits, rng)
        p = gdsa_prime(q, pbits, rng)
        e = (p - 1) // q
        while True:
            h = rng.randrange(2, p - 1)
            g = pow(h, e, p)
            if g != 1:
                return SchnorrGroup(p=p, q=q, g=g)

    @property
    def nbytes(self) -> int:
        return (self.p.bit_length() + 7) // 8

    def hash_point(self, index: int, A: int, B: int, point: int) -> bytes:
        return _h(
            b"pplp-ot-point",
            _int_bytes(index, 4),
            _int_bytes(A, self.nbytes),
            _int_bytes(B, self.nbytes),
            _int_bytes(point, self.nbytes),
        )[:SEED_BYTES]


def base_ot_send(ch, group: SchnorrGroup, count: int, rng: random.Random):
    """Sender side of `count` base OTs -> list of (k0, k1) seed pairs."""
    p, q, g = group.p, group.q, group.g
    a = rng.randrange(1, q)
    A = pow(g, a, p)
    ch.send_frame(_int_bytes(A, group.nbytes))
    data = ch.recv_frame()
    nb = group.nbytes
    assert len(data) == count * nb
    A_inv_a = pow(pow(A, a, p), -1, p)  # A^{-a}
    keys = []
    for i in range(count):
        B = int.from_bytes(data[i * nb : (i + 1) * nb], "little")
        Ba = pow(B, a, p)
        k0 = group.hash_point(i, A, B, Ba)
        k1 = group.hash_point(i, A, B, Ba * A_inv_a % p)
        keys.append((k0, k1))
    return keys


def base_ot_recv(ch, group: SchnorrGroup, choices, rng: random.Random):
    """Receiver side: choices in {0,1}^count -> list of chosen seeds."""
    p, q, g = group.p, group.q, group.g
    A = int.from_bytes(ch.recv_frame(), "little")
    bs, Bs = [], []
    for c in choices:
        b = rng.randrange(1, q)
        B = pow(g, b, p)
        if c:
            B = B * A % p
        bs.append(b)
        Bs.append(B)
    ch.send_frame(b"".join(_int_bytes(B, group.nbytes) for B in Bs))
    return [
        group.hash_point(i, A, B, pow(A, b, p))
        for i, (b, B) in enumerate(zip(bs, Bs))
    ]


# ---------------------------------------------------------------------------
# IKNP extension (random OT of 16-byte pads)
# ---------------------------------------------------------------------------


def _rows_to_pads(rows: np.ndarray, tag: bytes) -> list[bytes]:
    """Hash each 128-bit row into a 16-byte pad."""
    packed = np.packbits(rows, axis=1, bitorder="little")
    return [
        _h(b"pplp-ot-row", tag, i.to_bytes(4, "little"), packed[i].tobytes())[
            :SEED_BYTES
        ]
        for i in range(rows.shape[0])
    ]


def iknp_send(ch, group: SchnorrGroup, m: int, rng: random.Random):
    """Extension sender: obtains m pad pairs (p0_i, p1_i).

    Plays base-OT *receiver* with a random choice vector s."""
    s = np.array([rng.getrandbits(1) for _ in range(KAPPA)], np.uint8)
    seeds = _base_ot_recv_seeds(ch, group, s.tolist(), rng)
    u_flat = np.unpackbits(
        np.frombuffer(ch.recv_frame(), np.uint8), bitorder="little"
    )[: m * KAPPA]
    u = u_flat.reshape(KAPPA, m)  # column j = PRG(k0_j) ^ PRG(k1_j) ^ r
    q_cols = np.zeros((KAPPA, m), np.uint8)
    for j in range(KAPPA):
        col = _prg_bits(seeds[j], m, b"iknp-col")
        q_cols[j] = col ^ (u[j] & s[j])
    q_rows = q_cols.T  # row i = t_i ^ (r_i * s)
    p0 = _rows_to_pads(q_rows, b"0")
    p1 = _rows_to_pads(q_rows ^ s[None, :], b"0")
    return p0, p1


def iknp_recv(ch, group: SchnorrGroup, choices: np.ndarray, rng: random.Random):
    """Extension receiver: choices [m] in {0,1} -> m chosen pads.

    Plays base-OT *sender* with fresh random seed pairs."""
    m = len(choices)
    r = np.asarray(choices, np.uint8)
    seed_pairs = [
        (rng.getrandbits(128).to_bytes(16, "little"),
         rng.getrandbits(128).to_bytes(16, "little"))
        for _ in range(KAPPA)
    ]
    # Base OT in reverse: we are the sender of seed pairs.
    _base_ot_send_seeds(ch, group, seed_pairs, rng)
    t_cols = np.zeros((KAPPA, m), np.uint8)
    u = np.zeros((KAPPA, m), np.uint8)
    for j, (k0, k1) in enumerate(seed_pairs):
        t0 = _prg_bits(k0, m, b"iknp-col")
        t1 = _prg_bits(k1, m, b"iknp-col")
        t_cols[j] = t0
        u[j] = t0 ^ t1 ^ r
    ch.send_frame(np.packbits(u.reshape(-1), bitorder="little").tobytes())
    return _rows_to_pads(t_cols.T, b"0")


def _base_ot_send_seeds(ch, group, seed_pairs, rng):
    """Run base OT as sender, transferring explicit 16-byte seed pairs
    (one-time-pad encrypt under the Chou–Orlandi derived keys)."""
    keys = base_ot_send(ch, group, len(seed_pairs), rng)
    blob = bytearray()
    for (k0, k1), (s0, s1) in zip(keys, seed_pairs):
        blob += bytes(a ^ b for a, b in zip(k0, s0))
        blob += bytes(a ^ b for a, b in zip(k1, s1))
    ch.send_frame(bytes(blob))


def _base_ot_recv_seeds(ch, group, choices, rng):
    keys = base_ot_recv(ch, group, choices, rng)
    blob = ch.recv_frame()
    out = []
    for i, (c, k) in enumerate(zip(choices, keys)):
        off = (2 * i + (1 if c else 0)) * SEED_BYTES
        enc = blob[off : off + SEED_BYTES]
        out.append(bytes(a ^ b for a, b in zip(k, enc)))
    return out


# ---------------------------------------------------------------------------
# Correlated OT over Z_{2^32} + Gilboa multiplication shares
# ---------------------------------------------------------------------------


def _pads_to_u32(pads: list[bytes]) -> np.ndarray:
    return np.frombuffer(
        b"".join(p[:4] for p in pads), np.uint32
    ).copy()


def gilboa_cross_share(ch, role: int, values: np.ndarray, group: SchnorrGroup,
                       rng: random.Random, bits: int = 32) -> np.ndarray:
    """Additive shares of a*b over Z_{2^32} where role 0 holds a = values
    (the multiplier / OT chooser) and role 1 holds b = values (the
    multiplicand / OT sender). Returns this party's share [N] u32.

    Gilboa: for each bit i of a, a COT transfers x_i vs x_i + (b << i);
    shares are sum(received) and -sum(x_i)."""
    values = np.asarray(values, np.uint32)
    n = len(values)
    m = n * bits
    if role == 1:
        p0, p1 = iknp_send(ch, group, m, rng)
        r0 = _pads_to_u32(p0).reshape(n, bits)
        r1 = _pads_to_u32(p1).reshape(n, bits)
        shifts = np.arange(bits, dtype=np.uint32)
        corr = (values[:, None] << shifts[None, :])  # b << i (mod 2^32)
        # Receiver computes m1 = r1 - u = r0 + corr; m0 = r0.
        u = (r1 - r0 - corr).astype(np.uint32)
        ch.send_frame(u.tobytes())
        return (-r0.sum(axis=1, dtype=np.uint32)).astype(np.uint32)
    # role 0: chooser with bits of a.
    shifts = np.arange(bits, dtype=np.uint32)
    choices = ((values[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
    pads = iknp_recv(ch, group, choices.reshape(-1), rng)
    rt = _pads_to_u32(pads).reshape(n, bits)
    u = np.frombuffer(ch.recv_frame(), np.uint32).reshape(n, bits)
    got = np.where(choices == 1, (rt - u).astype(np.uint32), rt)
    return got.sum(axis=1, dtype=np.uint32)


def ot_triples(ch, role: int, count: int, group: SchnorrGroup,
               rng: random.Random):
    """N Beaver triples over Z_{2^32} between two real parties.

    Each party ends with (a_sh, b_sh, c_sh) u32 arrays with
    (a0+a1)(b0+b1) = c0+c1 (mod 2^32). Two Gilboa passes cover the cross
    terms; diagonal terms are local."""
    a_sh = np.array([rng.getrandbits(32) for _ in range(count)], np.uint32)
    b_sh = np.array([rng.getrandbits(32) for _ in range(count)], np.uint32)
    if role == 0:
        cross0 = gilboa_cross_share(ch, 0, a_sh, group, rng)   # a0 * b1
        cross1 = gilboa_cross_share(ch, 1, b_sh, group, rng)   # a1 * b0
    else:
        cross0 = gilboa_cross_share(ch, 1, b_sh, group, rng)
        cross1 = gilboa_cross_share(ch, 0, a_sh, group, rng)
    c_sh = (a_sh * b_sh + cross0 + cross1).astype(np.uint32)
    return a_sh, b_sh, c_sh
