"""Independent big-integer BFV oracle for known-answer vectors.

CONTEXT (VERDICT r1 item 3): the BASELINE acceptance gate asks for bit-exact
parity against SEAL 4.1. No SEAL binary or source exists in this offline
environment (verified: nothing SEAL-like on the filesystem, zero network
egress), so — as the verdict sanctions — these vectors come from an
independent in-repo oracle: textbook BFV equations over Python ints
(Kronecker-substitution negacyclic polymul), sharing NO code with the
device implementation (no JAX, no RNS limbs, no NTT), with all randomness
INJECTED explicitly. Parameter-level SEAL parity (the exact BFVDefault
moduli) is pinned separately in test_golden.py.

Semantics mirrored exactly (same rounding conventions as the device code and
SEAL 4.1):
  scale_plain(m) = Delta*m + floor(((q mod t)*m + (t+1)//2)/t)
  decrypt(x)     = floor((x*t + q//2)/q) mod t
  mod_switch     = (x - centered(x mod q_last)) / q_last
  multiply       = the BEHZ fast-floor pipeline, digit-exact (m_tilde base
                   extension representative x+delta*q, exact integer floor
                   (t*E - conv)/q, Shenoy-Kumaresan exact conversion)
  relinearize    = RNS-gadget key switch with injected per-digit (a_i, e_i)
"""

from __future__ import annotations

from dataclasses import dataclass


def _kronecker_negacyclic(a: list[int], b: list[int], stride_bits: int) -> list[int]:
    """(a * b) mod (x^n + 1) over Z, via single big-int multiplication."""
    n = len(a)
    assert len(b) == n
    K = stride_bits
    pa = sum(int(v) << (K * i) for i, v in enumerate(a))
    pb = sum(int(v) << (K * i) for i, v in enumerate(b))
    prod = pa * pb
    mask = (1 << K) - 1
    raw = [(prod >> (K * i)) & mask for i in range(2 * n)]
    return [raw[i] - raw[i + n] for i in range(n)]


@dataclass
class OracleBFV:
    n: int
    t: int
    moduli: list[int]

    def __post_init__(self):
        self.q = 1
        for m in self.moduli:
            self.q *= m
        # Kronecker stride: coefficients of raw products are bounded by
        # n * max|a| * max|b|; operands here are < q (or small), so
        # 2*q.bits + n.bits + margin covers every call below.
        self.stride = 2 * self.q.bit_length() + self.n.bit_length() + 8

    # -- ring helpers -------------------------------------------------------

    def polymul(self, a, b, mod=None):
        mod = self.q if mod is None else mod
        am = [v % mod for v in a]
        bm = [v % mod for v in b]
        return [v % mod for v in _kronecker_negacyclic(am, bm, self.stride)]

    def polyadd(self, a, b, mod=None):
        mod = self.q if mod is None else mod
        return [(x + y) % mod for x, y in zip(a, b)]

    def polysub(self, a, b, mod=None):
        mod = self.q if mod is None else mod
        return [(x - y) % mod for x, y in zip(a, b)]

    def polyneg(self, a, mod=None):
        mod = self.q if mod is None else mod
        return [(-x) % mod for x in a]

    # -- scheme -------------------------------------------------------------

    def scale_plain(self, m):
        q, t = self.q, self.t
        delta = q // t
        return [
            (delta * c + ((q % t) * c + (t + 1) // 2) // t) % q for c in m
        ]

    def keygen(self, s, a, e):
        """pk = (-(a*s + e), a); s ternary, e centered noise, a in [0, q)."""
        pk0 = self.polyneg(self.polyadd(self.polymul(a, s), e))
        return pk0, list(a)

    def encrypt(self, pk, m, u, e0, e1):
        pk0, pk1 = pk
        c0 = self.polyadd(
            self.polyadd(self.polymul(pk0, u), e0), self.scale_plain(m)
        )
        c1 = self.polyadd(self.polymul(pk1, u), e1)
        return c0, c1

    def decrypt(self, ct, s):
        q, t = self.q, self.t
        x = list(ct[0])
        s_pow = list(s)
        for c in ct[1:]:
            x = self.polyadd(x, self.polymul(c, s_pow))
            s_pow = self.polymul(s_pow, s)
        return [((v * t + q // 2) // q) % t for v in x]

    def add(self, a, b):
        return tuple(self.polyadd(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        return tuple(self.polysub(x, y) for x, y in zip(a, b))

    def add_plain(self, ct, m):
        return (self.polyadd(ct[0], self.scale_plain(m)),) + tuple(ct[1:])

    def multiply_plain(self, ct, m):
        # centered lift: coefficients >= (t+1)/2 represent negatives.
        thr = (self.t + 1) // 2
        lifted = [c if c < thr else c - self.t for c in m]
        return tuple(self.polymul(c, lifted) for c in ct)

    def mod_switch_to_next(self, ct):
        q_last = self.moduli[-1]
        small = OracleBFV(self.n, self.t, self.moduli[:-1])

        def one(poly):
            out = []
            for x in poly:
                last = x % q_last
                e = last if last <= q_last // 2 else last - q_last
                out.append(((x - e) // q_last) % small.q)
            return out

        return small, tuple(one(p) for p in ct)

    # -- BEHZ multiply (digit-exact mirror of bfv/behz.py) -------------------

    def _to_bsk_rep(self, poly):
        """The m_tilde-corrected base-extension representative x + delta*q
        (delta in {0,1}) as exact integers."""
        M_TILDE = 1 << 16
        q = self.q
        out = []
        for x in poly:
            yhat = 0
            for qi in self.moduli:
                yi = (x * M_TILDE * pow(q // qi, -1, qi)) % qi
                yhat += yi * (q // qi)
            r = (-yhat * pow(q, -1, M_TILDE)) % M_TILDE
            xhat = (yhat + q * r) // M_TILDE
            assert xhat % q == x % q and 0 <= xhat < 2 * q
            out.append(xhat)
        return out

    def multiply(self, ct1, ct2):
        """Size-2 x size-2 -> size-3, exactly as the device BEHZ pipeline."""
        t, q = self.t, self.q
        reps1 = [self._to_bsk_rep(p) for p in ct1]
        reps2 = [self._to_bsk_rep(p) for p in ct2]
        # e_k accumulates products of the x+delta*q representatives: the
        # exact integer value the B_sk-side tensor sees.
        e = [
            _kronecker_negacyclic(reps1[0], reps2[0], self.stride),
            [
                x + y
                for x, y in zip(
                    _kronecker_negacyclic(reps1[0], reps2[1], self.stride),
                    _kronecker_negacyclic(reps1[1], reps2[0], self.stride),
                )
            ],
            _kronecker_negacyclic(reps1[1], reps2[1], self.stride),
        ]

        out = []
        for ej in e:
            poly = []
            for E in ej:
                # negacyclic coefficients can be negative; the RNS pipeline
                # works mod q*B implicitly — normalize to the representative
                # the device arithmetic sees (everything is mod-basis there,
                # and the fast floor below only needs E's residues + exact
                # integer value).
                te = t * E
                conv = 0
                for qi in self.moduli:
                    yi = (te * pow(q // qi, -1, qi)) % qi
                    conv += yi * (q // qi)
                w = (te - conv) // q  # exact: conv == te (mod q)
                poly.append(w % q)  # Shenoy-Kumaresan conversion is exact
            out.append(poly)
        return tuple(out)

    def make_relin_keys(self, s, a_list, e_list):
        """RNS-gadget keys toward s^2 with injected randomness.

        k0_i = -(a_i s + e_i) + g_i s^2, g_i = CRT(delta_ij)."""
        q = self.q
        s2 = self.polymul(s, s)
        keys = []
        for i, qi in enumerate(self.moduli):
            gi = (q // qi) * pow(q // qi, -1, qi) % q
            b = self.polyneg(self.polyadd(self.polymul(a_list[i], s), e_list[i]))
            b = self.polyadd(b, [gi * c % q for c in s2])
            keys.append((b, list(a_list[i])))
        return keys

    def relinearize(self, ct3, keys):
        """Size-3 -> size-2 via the gadget digits |c2|_{q_i}."""
        c0, c1, c2 = ct3
        d0 = [0] * self.n
        d1 = [0] * self.n
        for i, qi in enumerate(self.moduli):
            digit = [c % qi for c in c2]
            d0 = self.polyadd(d0, self.polymul(digit, keys[i][0]))
            d1 = self.polyadd(d1, self.polymul(digit, keys[i][1]))
        return (self.polyadd(c0, d0), self.polyadd(c1, d1))
