"""Benchmark FusedMultiplier vs unfused path at n=4096, tpu profile."""
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from pplp_tpu.bfv import BFVContext, EncryptionParameters
from pplp_tpu.bfv.behz import RnsMultiplier, create_relin_keys, relinearize
from pplp_tpu.bfv.behz_fused import FusedMultiplier
from pplp_tpu.bfv.ciphertext import Ciphertext
from pplp_tpu.bfv.keys import KeyGenerator

N = 4096
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 4

parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")
ctx = BFVContext.build(parms, engine="vmem")
print("L =", ctx.L, "moduli bits:", [m.value.bit_length() for m in ctx.moduli])
kg = KeyGenerator(ctx, 0)
sk = kg.secret_key()
rlk = create_relin_keys(ctx, sk, jax.random.key(1))
fused = FusedMultiplier(ctx, rlk, tile_b=TILE)

rng = np.random.default_rng(0)
qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]
def ct():
    def poly():
        v = rng.integers(0, 1 << 62, size=(BATCH, ctx.L, N)).astype(np.uint64) % qs
        return jnp.asarray(v.astype(np.uint32))
    return Ciphertext((poly(), poly()), "coeff")
ct1, ct2 = ct(), ct()

t0 = time.time()
out = fused.multiply_relinearize(ct1, ct2)
jax.block_until_ready(out.polys)
print(f"first call (compile): {time.time()-t0:.1f}s", flush=True)

# correctness spot-check vs unfused on a small slice
mul = RnsMultiplier(ctx)
sl = Ciphertext(tuple(p[:2] for p in ct1.polys), "coeff")
s2 = Ciphertext(tuple(p[:2] for p in ct2.polys), "coeff")
want = relinearize(ctx, mul.multiply(sl, s2), rlk)
got = fused.multiply_relinearize(sl, s2)
ok = all(np.array_equal(np.asarray(w), np.asarray(g))
         for w, g in zip(want.polys, got.polys))
print("bit-exact vs unfused:", ok, flush=True)
assert ok

times = []
for _ in range(10):
    t0 = time.perf_counter()
    for _ in range(4):
        out = fused.multiply_relinearize(ct1, ct2)
    jax.block_until_ready(out.polys)
    times.append((time.perf_counter() - t0) / 4)
    time.sleep(0.3)
best = min(times)
print(f"fused: best {best*1e3:.2f} ms/batch -> {BATCH/best:,.0f} mult+relin/s "
      f"(median {np.median(times)*1e3:.2f} ms)")
