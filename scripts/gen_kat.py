"""Generate BFV known-answer vectors from the independent big-int oracle.

Writes tests/fixtures/bfv_kat_*.json.gz. Run once; the fixtures are COMMITTED
and tests/test_seal_vectors.py only loads them (regenerate deliberately if
the scheme spec changes). See tests/bfv_oracle.py for why these stand in for
SEAL-4.1 binaries in this offline environment.
"""

import gzip
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from bfv_oracle import OracleBFV  # noqa: E402
from pplp_tpu.ops.primes import bfv_default, get_primes  # noqa: E402


def gen(name, n, t, moduli, seed):
    rng = random.Random(seed)
    o = OracleBFV(n, t, list(moduli))
    q = o.q

    tern = lambda: [rng.choice((-1, 0, 1)) for _ in range(n)]
    noise = lambda: [rng.randint(-16, 16) for _ in range(n)]
    unif = lambda: [rng.randrange(q) for _ in range(n)]
    msg = lambda: [rng.randrange(t) for _ in range(n)]

    s = tern()
    a = unif()
    e = noise()
    pk = o.keygen(s, a, e)

    m1, m2 = msg(), msg()
    u1, e01, e11 = tern(), noise(), noise()
    u2, e02, e12 = tern(), noise(), noise()
    ct1 = o.encrypt(pk, m1, u1, e01, e11)
    ct2 = o.encrypt(pk, m2, u2, e02, e12)

    relin_a = [unif() for _ in moduli]
    relin_e = [noise() for _ in moduli]
    rlk = o.make_relin_keys(s, relin_a, relin_e)

    ct3 = o.multiply(ct1, ct2)
    ct_rel = o.relinearize(ct3, rlk)
    small, ct_ms = o.mod_switch_to_next(ct1)

    fix = {
        "name": name,
        "n": n,
        "t": t,
        "moduli": list(moduli),
        "seed": seed,
        "s": s, "a": a, "e": e,
        "pk0": pk[0], "pk1": pk[1],
        "m1": m1, "m2": m2,
        "u1": u1, "e01": e01, "e11": e11,
        "u2": u2, "e02": e02, "e12": e12,
        "relin_a": relin_a, "relin_e": relin_e,
        "expected": {
            "ct1": list(ct1), "ct2": list(ct2),
            "decrypt_ct1": o.decrypt(ct1, s),
            "add": list(o.add(ct1, ct2)),
            "sub": list(o.sub(ct1, ct2)),
            "add_plain_m2": list(o.add_plain(ct1, m2)),
            "multiply_plain_m2": list(o.multiply_plain(ct1, m2)),
            "mod_switch_ct1": list(ct_ms),
            "multiply": list(ct3),
            "relinearize": list(ct_rel),
            "decrypt_product": o.decrypt(ct_rel, s),
        },
    }
    # Sanity inside the oracle itself: fresh encryption decrypts exactly.
    assert fix["expected"]["decrypt_ct1"] == m1

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", f"bfv_kat_{name}.json.gz",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        json.dump(fix, f)
    print(f"wrote {path} ({os.path.getsize(path)/1e6:.2f} MB)")


if __name__ == "__main__":
    gen("n64_m31", 64, 1 << 16, get_primes(28, 2, 64) + get_primes(27, 1, 64),
        seed=1001)
    gen("n4096_sealdefault", 4096, 1 << 20, bfv_default(4096), seed=1002)
